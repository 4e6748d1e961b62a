"""Fuzz the NumPy bit-parallel kernel against the pure-DP oracle.

Mirrors the reference's randomized test strategy (search_fuzz,
src/search.rs:2605-2710; v1-vs-v2 equivalence, src/pattern_tiling/search.rs:475+):
seeded random patterns/texts, planted mutated copies, all profiles,
multi-limb patterns (>64 chars), overhang configs.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from sassy_ray.kernel import oracle
from sassy_ray.kernel.myers import batch_end_costs, batch_find_minima
from sassy_ray.kernel.profiles import get_profile

DNA = "ACGT"


def rand_seq(rng: random.Random, n: int, alphabet: str = DNA) -> bytes:
    return "".join(rng.choice(alphabet) for _ in range(n)).encode()


def mutate(rng: random.Random, seq: bytes, edits: int) -> bytes:
    s = bytearray(seq)
    for _ in range(edits):
        op = rng.randrange(3)
        pos = rng.randrange(max(1, len(s)))
        if op == 0 and s:
            s[pos] = ord(rng.choice(DNA))
        elif op == 1:
            s.insert(pos, ord(rng.choice(DNA)))
        elif op == 2 and len(s) > 1:
            del s[pos]
    return bytes(s)


def check_case(pattern, text, profile_name, k, alpha=None, max_overhang=None):
    prof = get_profile(profile_name)
    costs, n_arr, max_pos = batch_end_costs([pattern], [text], prof, k, alpha, max_overhang)
    want = oracle.end_costs(pattern, text, prof, k, alpha, max_overhang)
    got = costs[0, : len(want)]
    np.testing.assert_array_equal(
        got,
        want,
        err_msg=f"end costs differ: p={pattern!r} t={text!r} k={k} alpha={alpha} mo={max_overhang}",
    )
    # minima must match the sequential reference walk too
    for all_minima in (False, True):
        pi, pp, pc = batch_find_minima(costs, max_pos, k, all_minima)
        got_m = list(zip(pp.tolist(), pc.tolist()))
        want_m = oracle.find_minima(want, k, all_minima)
        assert got_m == want_m, (
            f"minima differ (all={all_minima}): p={pattern!r} t={text!r} k={k} "
            f"alpha={alpha} mo={max_overhang}\n got {got_m}\nwant {want_m}"
        )


def test_fuzz_dna_short():
    rng = random.Random(42)
    for _ in range(150):
        m = rng.randrange(1, 30)
        n = rng.randrange(0, 120)
        k = rng.randrange(0, 6)
        check_case(rand_seq(rng, m), rand_seq(rng, n), "dna", k)


def test_fuzz_planted_match():
    rng = random.Random(7)
    for _ in range(80):
        m = rng.randrange(5, 60)
        pattern = rand_seq(rng, m)
        edits = rng.randrange(0, max(1, m // 3))
        planted = mutate(rng, pattern, edits)
        pre = rand_seq(rng, rng.randrange(0, 80))
        post = rand_seq(rng, rng.randrange(0, 80))
        text = pre + planted + post
        k = edits
        prof = get_profile("dna")
        costs, _n, max_pos = batch_end_costs([pattern], [text], prof, k)
        pi, pp, pc = batch_find_minima(costs, max_pos, k, False)
        # a match must be recovered within +-k of the planted end
        planted_end = len(pre) + len(planted)
        assert any(abs(int(p) - planted_end) <= k for p in pp), (
            f"planted match lost: pattern={pattern!r} edits={edits}"
        )
        check_case(pattern, text, "dna", k)


def test_fuzz_multilimb():
    rng = random.Random(13)
    for _ in range(25):
        m = rng.randrange(60, 300)
        n = rng.randrange(0, 500)
        k = rng.randrange(0, 12)
        check_case(rand_seq(rng, m), rand_seq(rng, n), "dna", k)


def test_fuzz_iupac_with_n():
    rng = random.Random(99)
    for _ in range(60):
        m = rng.randrange(1, 40)
        n = rng.randrange(0, 150)
        k = rng.randrange(0, 5)
        pat = rand_seq(rng, m, "ACGTN")
        txt = rand_seq(rng, n, "ACGTNRYX")
        check_case(pat, txt, "iupac", k)


def test_fuzz_overhang():
    rng = random.Random(1234)
    for _ in range(80):
        m = rng.randrange(2, 40)
        n = rng.randrange(0, 100)
        k = rng.randrange(0, 5)
        alpha = rng.choice([0.25, 0.5, 0.75, 1.0])
        mo = rng.choice([None, None, 1, 3, 10])
        check_case(rand_seq(rng, m), rand_seq(rng, n), "iupac", k, alpha, mo)


def test_fuzz_ascii():
    rng = random.Random(5)
    words = "the quick brown fox jumps over lazy dog spark ray data engine"
    for _ in range(50):
        m = rng.randrange(1, 25)
        n = rng.randrange(0, 200)
        k = rng.randrange(0, 4)
        pat = rand_seq(rng, m, words)
        txt = rand_seq(rng, n, words)
        check_case(pat, txt, "ascii", k)
        check_case(pat.upper(), txt, "ascii_ci", k)


def test_batch_mixed_lengths():
    """One batch with wildly mixed pattern/text lengths must equal per-pair."""
    rng = random.Random(31337)
    pats = [rand_seq(rng, rng.randrange(1, 150)) for _ in range(40)]
    txts = [rand_seq(rng, rng.randrange(0, 300)) for _ in range(40)]
    k = 4
    prof = get_profile("dna")
    costs, _n, max_pos = batch_end_costs(pats, txts, prof, k)
    for i in range(40):
        want = oracle.end_costs(pats[i], txts[i], prof, k)
        np.testing.assert_array_equal(costs[i, : len(want)], want, err_msg=f"pair {i}")
        assert (costs[i, len(want) :] >= 2**29).all()


# --- hypothesis property tests (shrinking finds minimal counterexamples) ---

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    _dna_text = st.text(alphabet="ACGT", min_size=0, max_size=120)
    _dna_pat = st.text(alphabet="ACGT", min_size=1, max_size=40)

    @given(pat=_dna_pat, txt=_dna_text, k=st.integers(0, 4))
    @settings(max_examples=60, deadline=None)
    def test_property_kernel_equals_oracle(pat, txt, k):
        check_case(pat.encode(), txt.encode(), "dna", k)

    @given(
        pat=st.text(alphabet="ACGTN", min_size=2, max_size=25),
        txt=st.text(alphabet="ACGTNX", min_size=0, max_size=80),
        k=st.integers(0, 3),
        alpha=st.sampled_from([0.25, 0.5, 1.0]),
    )
    @settings(max_examples=40, deadline=None)
    def test_property_overhang(pat, txt, k, alpha):
        check_case(pat.encode(), txt.encode(), "iupac", k, alpha, None)

except ImportError:  # pragma: no cover
    pass


def test_banded_min_costs_matches_dense():
    """The band-narrowed multi-limb scan must agree with the dense skewed
    scan after the k+1 clamp, on near-dup, half-match and random pairs."""
    import numpy as np

    from sassy_ray.kernel.myers import _batch_min_costs_banded, _batch_min_costs_skewed
    from sassy_ray.kernel.profiles import get_profile

    rng = np.random.default_rng(7)
    prof = get_profile("ascii_ci")
    alpha = list(b"abcdefgh")
    for trial in range(25):
        B = int(rng.integers(1, 24))
        k = int(rng.integers(0, 48))
        pats, txts = [], []
        for _ in range(B):
            m = int(rng.integers(65, 420))
            n = int(rng.integers(max(1, m - 40), m + 120))
            t = bytes(rng.choice(alpha, n))
            r = rng.random()
            if r < 0.5:
                s = int(rng.integers(0, max(1, n - m + 1)))
                p = bytearray(t[s : s + m])
                for _ in range(int(rng.integers(0, k + 4))):
                    pos = int(rng.integers(0, len(p)))
                    op = rng.random()
                    if op < 0.4:
                        p[pos] = int(rng.choice(alpha))
                    elif op < 0.7 and len(p) > 66:
                        del p[pos]
                    else:
                        p.insert(pos, int(rng.choice(alpha)))
                p = bytes(p)
                if len(p) < 65:
                    p = p + bytes(rng.choice(alpha, 65 - len(p)))
            elif r < 0.75:
                half = bytes(rng.choice(alpha, m))
                p = t[: m // 2] + half[: m - m // 2]
            else:
                p = bytes(rng.choice(alpha, m))
            pats.append(p)
            txts.append(t)
        ref = np.minimum(_batch_min_costs_skewed(pats, txts, prof), k + 1)
        got = np.minimum(_batch_min_costs_banded(pats, txts, prof, k), k + 1)
        assert np.array_equal(ref, got), f"trial {trial} k={k}"
