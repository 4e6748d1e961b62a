"""Packed suffix prefilter: no false negatives + end-to-end equivalence.

Mirrors the reference's tiling-vs-v1 equivalence fuzz
(/root/reference/src/pattern_tiling/search.rs:475-521): the prefiltered
multi-pattern paths must produce exactly the matches of the unfiltered
single-pair paths.
"""

import random

import pytest

from sassy_ray.kernel.oracle import OracleSearcher
from sassy_ray.kernel.prefilter import PackedSuffixes, prefilter_hits
from sassy_ray.kernel.profiles import get_profile
from sassy_ray.kernel.search import Searcher, chunked_search, chunked_search_multi


def _rand_dna(rng, n):
    return bytes(rng.choice(b"ACGT") for _ in range(n))


def _key(m):
    return (m.text_start, m.text_end, m.cost, m.strand, m.cigar)


def test_prefilter_no_false_negatives_fuzz():
    rng = random.Random(0)
    prof = get_profile("iupac")
    osr = OracleSearcher("dna", rc=False)
    rows = flagged = 0
    for trial in range(25):
        P, T, k = rng.randint(1, 9), rng.randint(1, 6), rng.randint(0, 4)
        pats = [_rand_dna(rng, rng.randint(3, 40)) for _ in range(P)]
        texts = [bytearray(_rand_dna(rng, rng.randint(5, 300))) for _ in range(T)]
        for _ in range(3):  # plant real matches
            ti, pi = rng.randrange(T), rng.randrange(P)
            t = texts[ti]
            if len(t) > len(pats[pi]):
                pos = rng.randrange(len(t) - len(pats[pi]))
                t[pos : pos + len(pats[pi])] = pats[pi]
        texts = [bytes(t) for t in texts]
        hits = prefilter_hits(PackedSuffixes(pats, prof, k), texts)
        for pi in range(P):
            for ti in range(T):
                rows += 1
                flagged += int(hits[pi, ti])
                if osr.search(pats[pi], texts[ti], k) and not hits[pi, ti]:
                    pytest.fail(f"false negative at trial={trial} pi={pi} ti={ti} k={k}")
    assert flagged < rows  # the filter actually filters


def test_search_many_prefiltered_equals_single_pairs():
    rng = random.Random(1)
    s = Searcher("dna", rc=True)
    for _ in range(10):
        P, T, k = rng.randint(2, 8), rng.randint(1, 5), rng.randint(0, 3)
        pats = [_rand_dna(rng, rng.randint(8, 30)) for _ in range(P)]
        texts = [_rand_dna(rng, rng.randint(40, 400)) for _ in range(T)]
        got = {}
        for m in s.search_many(pats, texts, k):
            got.setdefault((m.pattern_idx, m.text_idx), []).append(_key(m))
        for pi in range(P):
            for ti in range(T):
                want = sorted(_key(m) for m in s.search(pats[pi], texts[ti], k))
                assert sorted(got.get((pi, ti), [])) == want, (pi, ti, k)


def test_chunked_multi_equals_chunked_single():
    rng = random.Random(2)
    s = Searcher("dna", rc=True)
    texts = [_rand_dna(rng, rng.randint(3000, 9000)) for _ in range(3)]
    pats = [_rand_dna(rng, 23) for _ in range(5)]
    # plant matches so the comparison is not vacuous
    for pi, p in enumerate(pats):
        t = bytearray(texts[pi % len(texts)])
        pos = rng.randrange(len(t) - len(p))
        t[pos : pos + len(p)] = p
        texts[pi % len(texts)] = bytes(t)
    k = 2
    multi = chunked_search_multi(s, pats, texts, k)
    # same overlap geometry as the multi scan, so seams line up exactly
    m_max = max(len(p) for p in pats)
    for pi, p in enumerate(pats):
        single = chunked_search(s, p, texts, k)
        for ti in range(len(texts)):
            got = sorted(_key(m) for m in multi[pi][ti])
            want = sorted(_key(m) for m in single[ti])
            assert got == want, (pi, ti)


def test_hierarchical_level2_equivalence():
    """search_many with the 63-char second prefilter level active (long
    patterns, selective level 1) must return exactly the per-pair search
    results — the cascade is a pure filter, no false negatives."""
    import numpy as np

    from sassy_ray.kernel.search import Searcher

    rng = np.random.default_rng(11)
    ab = np.frombuffer(b"ACGT", dtype=np.uint8)
    texts = [bytes(rng.choice(ab, 3000)) for _ in range(12)]
    pats = []
    for i in range(8):
        if i < 4:
            # planted: mutated 200-char substring of some text
            t = texts[i % len(texts)]
            s = int(rng.integers(0, len(t) - 200))
            p = bytearray(t[s : s + 200])
            for _ in range(3):
                p[int(rng.integers(0, len(p)))] = int(rng.choice(ab))
            pats.append(bytes(p))
        else:
            pats.append(bytes(rng.choice(ab, 200)))
    k = 5
    s = Searcher("dna", rc=False)
    got = {(m.pattern_idx, m.text_idx, m.text_start, m.text_end, m.cost, m.cigar)
           for m in s.search_many(pats, texts, k)}
    want = set()
    for pi, p in enumerate(pats):
        for ti, t in enumerate(texts):
            for m in s.search(p, t, k):
                want.add((pi, ti, m.text_start, m.text_end, m.cost, m.cigar))
    assert got == want and len(want) >= 4
