"""grep/search/filter pipeline tests (S5/S6, ordered output, histogram)."""

from __future__ import annotations

import pyarrow as pa
import pytest

from sassy_ray.pipelines.grep import GrepConfig, grep_matches_batch, run_grep


def texts_batch():
    return pa.table(
        {
            "doc_id": pa.array(["t1", "t2", "t3"]),
            "text": pa.array(["CCCATCACCC", "AAAACGATAAAA", "GGGGGGGG"]),
        }
    )


def test_grep_batch_matches_tsv_shape():
    cfg = GrepConfig(patterns=[("atcg", b"ATCG")], k=1, alphabet="dna", rc=True)
    t = grep_matches_batch(texts_batch(), cfg)
    assert t.column_names == [
        "pat_id",
        "text_id",
        "cost",
        "strand",
        "start",
        "end",
        "match_region",
        "cigar",
    ]
    rows = t.to_pylist()
    # doctest vector: fwd (3,7) + rc (1,5) in t1
    t1 = [r for r in rows if r["text_id"] == "t1"]
    assert {(r["start"], r["end"], r["strand"]) for r in t1} == {(3, 7, "+"), (1, 5, "-")}
    # rc match region reported in pattern orientation (rc of text slice)
    t2 = [r for r in rows if r["text_id"] == "t2" and r["strand"] == "-"]
    assert any(r["match_region"] == "ATCG" for r in t2)


def test_grep_pipeline(ray_session):
    import ray.data as rd

    ds = rd.from_arrow(texts_batch())
    cfg = GrepConfig(patterns=[("atcg", b"ATCG")], k=1, alphabet="dna", rc=True)
    res = run_grep(ds, cfg)
    m = res["matches"].to_pandas()
    # deterministic order
    assert list(m.columns)[:2] == ["pat_id", "text_id"]
    assert (m.sort_values(["text_id", "start", "pat_id"]).reset_index(drop=True) == m).all().all()
    # histogram counts costs
    h = res["histogram"]
    assert set(h["cost"]) <= {0, 1}
    # filter + invert
    kept = res["filtered"].to_pandas()
    assert set(kept["doc_id"]) == {"t1", "t2"}
    cfg_inv = GrepConfig(patterns=[("atcg", b"ATCG")], k=1, alphabet="dna", rc=True, invert=True)
    inv = run_grep(ds, cfg_inv)["filtered"].to_pandas()
    assert set(inv["doc_id"]) == {"t3"}


def test_grep_preserve_order(ray_session):
    """preserve_order: matches stream in INPUT doc order, no global sort."""
    import ray
    import ray.data as rd

    docs = pa.table(
        {
            "doc_id": pa.array([f"d{i:03d}" for i in range(40)]),
            "text": pa.array(["CCCATCACCC"] * 40),
        }
    )
    ds = rd.from_arrow(docs).repartition(8)
    cfg = GrepConfig(
        patterns=[("atcg", b"ATCG")], k=1, alphabet="dna", rc=False, preserve_order=True
    )
    try:
        m = run_grep(ds, cfg)["matches"].to_pandas()
    finally:
        ray.data.DataContext.get_current().execution_options.preserve_order = False
    ids = list(m["text_id"])
    assert ids == sorted(ids)  # input order == doc order here


def test_grep_only_best_and_all():
    cfg_best = GrepConfig(
        patterns=[("p", b"ATG")], k=1, alphabet="dna", rc=False, only_best_match=True
    )
    t = grep_matches_batch(
        pa.table({"doc_id": pa.array(["x"]), "text": pa.array(["CCATGCCATGCC"])}), cfg_best
    )
    assert t.num_rows == 1
    cfg_all = GrepConfig(patterns=[("p", b"ATG")], k=1, alphabet="dna", rc=False, all_minima=True)
    t_all = grep_matches_batch(
        pa.table({"doc_id": pa.array(["x"]), "text": pa.array(["CCATGCCATGCC"])}), cfg_all
    )
    assert t_all.num_rows > 2
