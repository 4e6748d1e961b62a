"""Fast Searcher surface tests: parity with the oracle + the reference's
all-alignments unit vectors (search.rs:1760-1980)."""

from __future__ import annotations

import random

import pytest

from sassy_ray.kernel.oracle import OracleSearcher
from sassy_ray.kernel.search import Searcher
from sassy_ray.kernel.types import FWD, RC


def keys(ms):
    return sorted(m.key() for m in ms)


@pytest.mark.parametrize("rc", [False, True])
def test_matches_oracle_fuzz(rc):
    rng = random.Random(4242)
    fast = Searcher("dna", rc=rc)
    slow = OracleSearcher("dna", rc=rc)
    for _ in range(60):
        m = rng.randrange(1, 40)
        n = rng.randrange(0, 150)
        k = rng.randrange(0, 5)
        pat = "".join(rng.choice("ACGT") for _ in range(m)).encode()
        txt = "".join(rng.choice("ACGT") for _ in range(n)).encode()
        assert keys(fast.search(pat, txt, k)) == keys(slow.search(pat, txt, k))
        assert keys(fast.search_all(pat, txt, k)) == keys(slow.search_all(pat, txt, k))


def test_matches_oracle_overhang():
    rng = random.Random(77)
    fast = Searcher("iupac", rc=True, alpha=0.5)
    slow = OracleSearcher("iupac", rc=True, alpha=0.5)
    for _ in range(40):
        m = rng.randrange(2, 30)
        n = rng.randrange(0, 80)
        k = rng.randrange(0, 4)
        pat = "".join(rng.choice("ACGT") for _ in range(m)).encode()
        txt = "".join(rng.choice("ACGTN") for _ in range(n)).encode()
        assert keys(fast.search(pat, txt, k)) == keys(slow.search(pat, txt, k))


def test_matches_oracle_options():
    rng = random.Random(55)
    for opts in (
        dict(only_best_match=True),
        dict(without_trace=True),
        dict(max_n_frac=0.2),
    ):
        fast = Searcher("iupac", rc=True, **opts)
        slow = OracleSearcher("iupac", rc=True, **opts)
        for _ in range(30):
            m = rng.randrange(1, 25)
            n = rng.randrange(0, 100)
            k = rng.randrange(0, 4)
            pat = "".join(rng.choice("ACGT") for _ in range(m)).encode()
            txt = "".join(rng.choice("ACGTN") for _ in range(n)).encode()
            assert keys(fast.search(pat, txt, k)) == keys(slow.search(pat, txt, k)), (
                f"opts={opts} pat={pat} txt={txt} k={k}"
            )


def test_search_many_cartesian():
    s = Searcher("dna", rc=False)
    ms = s.search_many([b"ATG", b"TTT"], [b"CCCCATGCCCCTTT", b"TTTGGG"], 1)
    idx = {(m.pattern_idx, m.text_idx) for m in ms}
    assert (0, 0) in idx and (1, 0) in idx and (1, 1) in idx
    # mode validation mirrors python.rs:99-105
    with pytest.raises(ValueError):
        s.search_many([b"A"], [b"A"], 0, mode="bogus")


def test_search_pairs():
    s = Searcher("dna", rc=False)
    res = s.search_pairs([b"ATG", b"AAA"], [b"CCATGCC", b"TTTTTT"], 1)
    assert len(res[0]) >= 1 and res[0][0].cost == 0
    assert len(res[1]) == 0  # AAA vs TTTTTT at k=1: min cost 3


# --- all-alignments vectors (search.rs:1760-1980) --------------------------


def test_aa_exact():
    groups = Searcher("dna", rc=False).search_all_alignments(b"ACGT", b"ACGT", 0)
    assert len(groups) == 1
    m = groups[0][0]
    assert (m.cost, m.cigar, m.text_start, m.text_end) == (0, "4=", 0, 4)


def test_aa_no_match():
    groups = Searcher("dna", rc=False).search_all_alignments(b"ACGT", b"TTTT", 2)
    assert groups == []


def test_aa_multiple_alignments_one_end():
    groups = Searcher("dna", rc=False).search_all_alignments(b"AT", b"ACT", 1)
    multi = [g for g in groups if len(g) > 1]
    assert len(multi) == 1
    aligns = multi[0]
    assert len(aligns) == 3
    assert all(m.cost == 1 and m.pattern_start == 0 for m in aligns)
    assert len({m.cigar for m in aligns}) == 3


def test_aa_combinatorial_count():
    t, k = 5, 3
    groups = Searcher("dna", rc=False).search_all_alignments(b"A" * (t + k), b"A" * t, k)
    total = sum(len(g) for g in groups)
    assert total == 56  # C(8,3)


def test_aa_homopolymer_prune():
    groups = Searcher("dna", rc=False).search_all_alignments(b"AAAA", b"AAAAAA", 2)
    assert sum(len(g) for g in groups) == 3
    for g in groups:
        assert len(g) == 1
        m = g[0]
        assert m.cost == 0 and m.cigar == "4="
        assert m.text_end - m.text_start == m.pattern_end - m.pattern_start


@pytest.mark.parametrize("rc", [False, True])
def test_aa_no_leading_trailing_deletions(rc):
    groups = Searcher("iupac", rc=rc).search_all_alignments(b"ACGT", b"XACGTX", 1)
    for g in groups:
        for m in g:
            assert not m.cigar.endswith("D"), m.cigar
            # leading deletion would be '1D...' at cigar start
            assert not (m.cigar[0] == "1" and m.cigar[1] == "D"), m.cigar


def test_chunked_search_matches_unchunked():
    """Long-text chunked scan (sassy v1 text-tiling) == plain search."""
    import random

    from sassy_ray.kernel.search import chunked_search

    rng = random.Random(31)
    for trial in range(8):
        rc = trial % 2 == 0
        s = Searcher("dna", rc=rc)
        m = rng.randrange(10, 40)
        pat = "".join(rng.choice("ACGT") for _ in range(m)).encode()
        n = rng.randrange(3000, 12000)
        t = list("".join(rng.choice("ACGT") for _ in range(n)))
        for _ in range(3):  # plant mutated copies
            p2 = list(pat.decode())
            p2[rng.randrange(len(p2))] = rng.choice("ACGT")
            pos = rng.randrange(0, n - m)
            t[pos : pos + m] = p2
        text = "".join(t).encode()
        k = rng.randrange(1, 4)
        want = sorted(x.key() for x in s.search(pat, text, k))
        got = sorted(x.key() for x in chunked_search(s, pat, [text], k, chunk_len=701)[0])
        assert got == want, f"trial {trial}"


# --- Continuation flow control (alignment_iterator.rs:16-23,239-368) -------


def _collect_with(pattern, text, k, cb, rc=False, partial=False):
    out = []

    def callback(complete, m):
        return cb(complete, m, out)

    Searcher("dna", rc=rc).iterate_all_alignments(
        pattern, text, k, partial_matches=partial, callback=callback
    )
    return out


def test_continuation_continue_matches_search_all():
    from sassy_ray import Continuation

    pat, txt, k = b"A" * 8, b"A" * 5, 3
    full = Searcher("dna", rc=False).search_all_alignments(pat, txt, k)
    got = _collect_with(
        pat, txt, k, lambda c, m, out: (out.append(m), Continuation.CONTINUE)[1]
    )
    assert [m.key() for m in got] == [m.key() for g in full for m in g]


def test_continuation_break_one_per_anchor():
    """BREAK after the first complete alignment -> exactly the first (cheapest
    edge-ordered) alignment of each anchor group."""
    from sassy_ray import Continuation

    pat, txt, k = b"A" * 8, b"A" * 5, 3
    full = Searcher("dna", rc=False).search_all_alignments(pat, txt, k)

    def cb(complete, m, out):
        out.append(m)
        return Continuation.BREAK

    got = _collect_with(pat, txt, k, cb)
    assert [m.key() for m in got] == [g[0].key() for g in full]


def test_continuation_prune_at_root_yields_nothing():
    from sassy_ray import Continuation

    def cb(complete, m, out):
        if not complete and m.pattern_start == m.pattern_end:
            return Continuation.PRUNE  # prune the empty root state
        if complete:
            out.append(m)
        return Continuation.CONTINUE

    got = _collect_with(b"AT", b"ACT", 1, cb, partial=True)
    assert got == []


def test_continuation_partial_states_fire():
    from sassy_ray import Continuation

    partials, completes = [], []

    def cb(complete, m, out):
        (completes if complete else partials).append(m)
        return Continuation.CONTINUE

    _collect_with(b"ACGT", b"ACGT", 0, cb, partial=True)
    assert len(completes) == 1
    # root + one state per '=' step before completion
    assert len(partials) == 4
    assert all(m.pattern_start > 0 for m in partials)


def test_continuation_none_return_is_continue():
    got = _collect_with(b"ACGT", b"ACGT", 0, lambda c, m, out: out.append(m))
    assert len(got) == 1 and got[0].cigar == "4="


@pytest.mark.parametrize("rc", [True])
def test_continuation_rc_translated_coords(rc):
    """RC matches reach the callback in forward-text coordinates."""
    from sassy_ray import Continuation
    from sassy_ray.kernel.types import RC

    txt = b"TTTT" + bytes(reversed(b"ACGT".translate(bytes.maketrans(b"ACGT", b"TGCA"))))
    got = _collect_with(b"ACGT", txt, 0, lambda c, m, out: out.append(m), rc=rc)
    rcs = [m for m in got if m.strand == RC]
    assert rcs and all(0 <= m.text_start < m.text_end <= len(txt) for m in rcs)
    groups = Searcher("dna", rc=rc).search_all_alignments(b"ACGT", txt, 0)
    assert sorted(m.key() for m in got) == sorted(m.key() for g in groups for m in g)


def test_search_many_arrays_equivalence():
    """search_many_arrays over an Arrow column must equal search_many over
    the same texts as a list — same matches, same order, field-for-field
    (the zero-copy input + columnar emission path is semantics-neutral)."""
    import numpy as np
    import pyarrow as pa

    from sassy_ray.kernel.search import Searcher

    rng = np.random.default_rng(99)
    dna = "ACGT"
    texts = [
        "".join(rng.choice(list(dna), size=int(rng.integers(0, 300))))
        for _ in range(60)
    ]
    texts[3] = ""  # empty text row
    pats = [
        bytes(rng.choice(list(b"ACGT"), size=int(rng.integers(5, 40))))
        for _ in range(7)
    ]
    for alphabet, rc in (("dna", True), ("ascii", False)):
        s = Searcher(alphabet, rc=rc)
        for k in (1, 3):
            ms = s.search_many(pats, [t.encode() for t in texts], k)
            arr = s.search_many_arrays(pats, pa.array(texts, pa.string()), k)
            assert len(ms) == len(arr["text_idx"])
            for i, m in enumerate(ms):
                assert m.pattern_idx == arr["pattern_idx"][i]
                assert m.text_idx == arr["text_idx"][i]
                assert m.text_start == arr["text_start"][i]
                assert m.text_end == arr["text_end"][i]
                assert m.pattern_start == arr["pattern_start"][i]
                assert m.pattern_end == arr["pattern_end"][i]
                assert m.cost == arr["cost"][i]
                assert (0 if m.strand == "+" else 1) == arr["strand"][i]
                assert (m.cigar or "") == arr["cigar"][i]
