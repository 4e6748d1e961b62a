"""CRISPR pipeline vectors from the reference (bin/crispr.rs:277-365)."""

from __future__ import annotations

import pytest

from sassy_ray.pipelines.crispr import CrisprConfig, crispr_matches

GUIDE = b"TAGCATCAGCTACGNGG"
TARGETS = [
    ("exact", b"TAGCATCAGCTACGAGG"),
    ("pam_mutated", b"TAGCATCAGCTACGACG"),  # C instead of G in PAM
    ("n_frac", b"TNNNATCAGCTACGAGG"),  # 3 N of 17
]


def counts(cfg):
    t = crispr_matches(TARGETS, cfg)
    out = {"exact": 0, "pam_mutated": 0, "n_frac": 0}
    for tid in t.column("text_id").to_pylist():
        out[tid] += 1
    return out


def test_crispr_allow_pam_edits():
    c = counts(CrisprConfig([GUIDE], k=1, pam_length=3, allow_pam_edits=True))
    assert c == {"exact": 2, "pam_mutated": 1, "n_frac": 2}


def test_crispr_exact_pam():
    c = counts(CrisprConfig([GUIDE], k=1, pam_length=3, allow_pam_edits=False))
    assert c == {"exact": 1, "pam_mutated": 0, "n_frac": 1}


def test_crispr_n_frac_boundary():
    thr = 3.0 / 17.0
    c_hi = counts(
        CrisprConfig([GUIDE], k=1, pam_length=3, allow_pam_edits=False, max_n_frac=thr + 0.01)
    )
    assert c_hi["n_frac"] == 1
    c_lo = counts(
        CrisprConfig([GUIDE], k=1, pam_length=3, allow_pam_edits=False, max_n_frac=thr - 0.01)
    )
    assert c_lo["n_frac"] == 0


def test_crispr_pam_validation():
    with pytest.raises(ValueError, match="PAM"):
        CrisprConfig([b"AAACGG", b"AAACCC"], pam_length=3)


def test_crispr_output_schema():
    t = crispr_matches(TARGETS, CrisprConfig([GUIDE], k=1))
    assert t.column_names == [
        "guide",
        "text_id",
        "cost",
        "strand",
        "start",
        "end",
        "match_region",
        "cigar",
    ]
