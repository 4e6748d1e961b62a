"""The reference's documented vectors, run against the pure-DP oracle.

Vectors from /root/reference/src/lib.rs:52-137 (doctest), README.md:127-140,
and bin/crispr.rs / n_filter.rs unit tests.  These pin the exact search
semantics (local minima, RC coordinate flip, overhang, N-filter boundaries).
"""

from __future__ import annotations

import pytest

from sassy_ray.kernel.oracle import OracleSearcher


def m_tuple(m):
    return (m.text_start, m.text_end, m.pattern_start, m.pattern_end, m.cost, m.strand, m.cigar)


def test_doctest_fwd():
    s = OracleSearcher("dna", rc=False)
    ms = s.search(b"ATCG", b"CCCATCACCC", 1)
    assert len(ms) == 1
    assert m_tuple(ms[0]) == (3, 7, 0, 4, 1, "+", "3=1X")


def test_doctest_rc():
    s = OracleSearcher("dna", rc=True)
    ms = s.search(b"ATCG", b"CCCATCACCC", 1)
    assert len(ms) == 2
    assert m_tuple(ms[0]) == (3, 7, 0, 4, 1, "+", "3=1X")
    assert m_tuple(ms[1]) == (1, 5, 0, 4, 1, "-", "2=1X1=")


def test_doctest_overhang():
    s = OracleSearcher("iupac", rc=False, alpha=0.5)
    ms = s.search(b"ACGT", b"GTXXXNNN", 1)
    assert len(ms) >= 2
    assert m_tuple(ms[0]) == (0, 2, 2, 4, 1, "+", "2=")
    assert m_tuple(ms[1]) == (5, 8, 0, 3, 0, "+", "3=")


def test_readme_batch():
    # README.md:127-140: patterns ATG and TTT in CCCCATGCCCCTTT, k=1
    s = OracleSearcher("dna", rc=False)
    ms_atg = s.search(b"ATG", b"CCCCATGCCCCTTT", 1)
    assert any(m.text_start == 4 and m.text_end == 7 and m.cost == 0 for m in ms_atg)
    ms_ttt = s.search(b"TTT", b"CCCCATGCCCCTTT", 1)
    assert any(m.cost == 0 and m.text_end == 14 for m in ms_ttt)


def test_search_vs_search_all_overlap():
    # lib.rs:17-27: ABC in XXXABCXXX with k=1 -> search_all has >= 3 end
    # positions, search only the local-min (ABC).
    s = OracleSearcher("ascii", rc=False)
    all_ms = s.search_all(b"ABC", b"XXXABCXXX", 1)
    assert len(all_ms) >= 3
    ms = s.search(b"ABC", b"XXXABCXXX", 1)
    assert len(ms) == 1
    assert m_tuple(ms[0])[:2] == (3, 6)
    assert ms[0].cost == 0
    assert ms[0].cigar == "3="


def test_exact_match_cost0():
    s = OracleSearcher("dna", rc=False)
    ms = s.search(b"ACGT", b"ACGT", 0)
    assert len(ms) == 1
    assert m_tuple(ms[0]) == (0, 4, 0, 4, 0, "+", "4=")


def test_n_matches_everything_iupac():
    s = OracleSearcher("iupac", rc=False)
    ms = s.search(b"NNNN", b"ACGTACGT", 0)
    # every position matches; local minima collapse plateaus
    assert all(m.cost == 0 for m in ms)
    assert len(ms) >= 1


def test_max_n_frac_boundary():
    # crispr.rs:349-360: guide with 3 Ns of 17 chars; threshold 3/17 +- 0.01
    text = b"AAAA" + b"ACGTACGTACGTAC" + b"NNN" + b"AAAA"
    pattern = b"ACGTACGTACGTACNNN"
    frac = 3 / 17
    s_hi = OracleSearcher("iupac", rc=False, max_n_frac=frac + 0.01)
    s_lo = OracleSearcher("iupac", rc=False, max_n_frac=frac - 0.01)
    hits_hi = s_hi.search(pattern, text, 0)
    hits_lo = s_lo.search(pattern, text, 0)
    assert len(hits_hi) >= 1
    assert len(hits_lo) == 0


def test_case_insensitive_dna():
    s = OracleSearcher("dna", rc=False)
    ms = s.search(b"acgt", b"ACGTACGT", 0)
    assert len(ms) == 2
    assert all(m.cost == 0 for m in ms)


def test_rc_cigar_direction():
    # RC match: pattern matches rc(text[start:end]); cigar in pattern direction
    s = OracleSearcher("dna", rc=True)
    text = b"AAAACGATAAAA"  # rc(CGAT)=ATCG at pos 4..8
    ms = s.search(b"ATCG", text, 0)
    rc_ms = [m for m in ms if m.strand == "-"]
    assert len(rc_ms) == 1
    assert (rc_ms[0].text_start, rc_ms[0].text_end) == (4, 8)
    assert rc_ms[0].cigar == "4="


def test_only_best_match():
    s = OracleSearcher("dna", rc=False, only_best_match=True)
    ms = s.search(b"ATG", b"CCATGCCATGCC", 1)
    assert len(ms) == 1
    assert ms[0].cost == 0
    # rightmost of the equal-cost matches
    assert ms[0].text_end == 10


def test_without_trace():
    s = OracleSearcher("dna", rc=False, without_trace=True)
    ms = s.search(b"ATCG", b"CCCATCACCC", 1)
    assert len(ms) == 1
    assert ms[0].text_end == 7
    assert ms[0].cost == 1
    assert ms[0].text_start == -1
    assert ms[0].cigar == ""


def test_filter_fn_pam():
    # exact-PAM endpoint predicate (crispr.rs:198-205): only keep end
    # positions whose last 2 text chars are 'GG'
    s = OracleSearcher("dna", rc=False)

    def pam_filter(pattern, text_till_end, strand):
        return text_till_end.endswith(b"GG")

    ms = s.search_with_fn(b"ACGTGG", b"TTACGTGGTTACGTGGTT", 1, True, pam_filter)
    assert [m.text_end for m in ms] == [8, 16]
    ms_all = s.search_all(b"ACGTGG", b"TTACGTGGTTACGTGGTT", 1)
    assert len(ms_all) > len(ms)  # unfiltered also has GT/GGT ends
