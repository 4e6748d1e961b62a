"""End-to-end ER pipeline tests (FIXTURES F1/F2/F4/F5)."""

from __future__ import annotations

import os

import pyarrow as pa
import pytest

from sassy_ray.pipelines.er import ERConfig, evaluate_clusters, run_er_pipeline
from sassy_ray.sources.docs import add_doc_text, spans_fingerprint, validate_span_order
from sassy_ray.sources.synth import dna_corpus, interleave_flat_documents
from sassy_ray.stages.blocking import BlockingConfig
from sassy_ray.stages.scoring import ScoreConfig


def _dna_cfg(**kw):
    return ERConfig(
        blocking=BlockingConfig(q=8, rc_canonical=True),
        score=ScoreConfig(profile="iupac", rc=True, k_min=4, rel_k=0.12),
        score_concurrency=2,
        **kw,
    )


@pytest.fixture(scope="module")
def dna_docs():
    return dna_corpus(60, seed=42)


def test_er_dna_f1(ray_session, dna_docs):
    import ray.data as rd

    docs, truth = dna_docs
    res = run_er_pipeline(rd.from_arrow(docs), _dna_cfg())
    m = evaluate_clusters(res["clusters"], truth)
    assert m["f1"] >= 0.99, m
    # span invariant: docs dataset untouched
    validate_span_order(docs)


def test_er_ascii_f1(ray_session):
    """The blocked distributed pipeline must reproduce the clusters of
    exhaustive all-pairs kernel scoring (the 'reference clusters' — the
    driver's flat table itself contains cross-id near-duplicates)."""
    import pyarrow.parquet as pq
    import ray.data as rd

    from sassy_ray.pipelines.er import exhaustive_truth

    flat = pq.read_table("/root/testdata/sf0.001/documents.parquet").slice(0, 100)
    docs, _idtruth = interleave_flat_documents(flat, seed=7)
    score = ScoreConfig(profile="ascii_ci", k_min=3, rel_k=0.03, lowercase=True)
    truth = exhaustive_truth(docs, score)
    cfg = ERConfig(blocking=BlockingConfig(q=12), score=score, score_concurrency=2)
    res = run_er_pipeline(rd.from_arrow(docs), cfg)
    m = evaluate_clusters(res["clusters"], truth)
    assert m["f1"] >= 0.99, m


def test_er_checkpoint_resume(ray_session, dna_docs, tmp_path):
    import ray.data as rd

    docs, truth = dna_docs
    ds = rd.from_arrow(docs)
    cfg = _dna_cfg()
    root = str(tmp_path / "ck")

    res1 = run_er_pipeline(ds, cfg, checkpoint_dir=root)
    c1 = res1["clusters"].to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert res1["stats"]["resumed_stages"] == []
    assert os.path.exists(os.path.join(root, "scored", "manifest.json"))

    # simulate failure after scoring: clusters checkpoint removed, rerun must
    # skip the earlier stages and produce byte-identical clusters
    import shutil

    shutil.rmtree(os.path.join(root, "clusters"))
    res2 = run_er_pipeline(ds, cfg, checkpoint_dir=root)
    assert set(res2["stats"]["resumed_stages"]) == {"block_rows", "pairs", "scored"}
    c2 = res2["clusters"].to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert c1.equals(c2)

    # a config change invalidates the fingerprint -> full rerun
    cfg2 = _dna_cfg()
    cfg2.score.k_min = 5
    res3 = run_er_pipeline(ds, cfg2, checkpoint_dir=root)
    assert res3["stats"]["resumed_stages"] == []


def test_er_join_mode(ray_session, dna_docs):
    import ray.data as rd

    docs, truth = dna_docs
    cfg = _dna_cfg(text_mode="join")
    res = run_er_pipeline(rd.from_arrow(docs), cfg)
    m = evaluate_clusters(res["clusters"], truth)
    assert m["f1"] >= 0.99, m


def test_distributed_label_propagation(ray_session):
    """Force the distributed min-label path (driver_edge_limit=0) and check
    components against driver union-find on a chain + islands graph."""
    import ray.data as rd

    from sassy_ray.stages.clustering import connected_components

    edges = [
        {"doc_id_a": f"n{i:03d}", "doc_id_b": f"n{i + 1:03d}"} for i in range(0, 10)
    ] + [{"doc_id_a": "m000", "doc_id_b": "m001"}]
    nodes = [{"doc_id": f"n{i:03d}"} for i in range(11)] + [
        {"doc_id": "m000"},
        {"doc_id": "m001"},
        {"doc_id": "z-solo"},
    ]
    got = (
        connected_components(
            rd.from_items(edges), rd.from_items(nodes), driver_edge_limit=0
        )
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    lab = dict(zip(got.doc_id, got.cluster_id))
    assert all(lab[f"n{i:03d}"] == "n000" for i in range(11))
    assert lab["m000"] == lab["m001"] == "m000"
    assert lab["z-solo"] == "z-solo"


def test_distributed_cc_high_diameter_fuzz(ray_session):
    """Alternating-star must converge in few rounds even on a long chain
    (diameter 200 — hash-min would need ~200 shuffles) and on a random
    graph; verify labels against the driver union-find path."""
    import random

    import ray.data as rd

    from sassy_ray.stages.clustering import connected_components

    rng = random.Random(13)
    edges = [
        {"doc_id_a": f"c{i:04d}", "doc_id_b": f"c{i + 1:04d}"} for i in range(200)
    ]
    # plus a random sparse graph over a second namespace
    for _ in range(300):
        a, b = rng.sample(range(250), 2)
        a, b = min(a, b), max(a, b)
        edges.append({"doc_id_a": f"r{a:04d}", "doc_id_b": f"r{b:04d}"})
    nodes = [{"doc_id": f"c{i:04d}"} for i in range(201)] + [
        {"doc_id": f"r{i:04d}"} for i in range(250)
    ]
    e_ds, n_ds = rd.from_items(edges), rd.from_items(nodes)
    got = (
        connected_components(e_ds, n_ds, driver_edge_limit=0)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    want = (
        connected_components(e_ds, n_ds, driver_edge_limit=10**9)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got.equals(want)


def test_blocking_skew_salting(ray_session):
    """F4: a hot blocking key (many near-identical docs) stays bounded."""
    import ray.data as rd

    from sassy_ray.stages.blocking import minhash_block_rows
    from sassy_ray.stages.pairs import PairGenConfig, make_pairs_dataset

    n = 300
    rows = [
        {"doc_id": f"hot-{i:04d}", "text": "ACGTACGTACGT" * 10}  # identical docs
        for i in range(n)
    ]
    tbl = pa.Table.from_pylist(rows)
    cfg = BlockingConfig(q=8, text_col="text")
    block = rd.from_arrow(tbl).map_batches(
        lambda b: minhash_block_rows(b, cfg), batch_format="pyarrow"
    )
    pcfg = PairGenConfig(salt_cap=32, max_pairs_per_group=500)
    pairs = make_pairs_dataset(block, pcfg).to_pandas()
    # bounded: <= bands * max_pairs_per_group, not O(n^2) = 45k
    assert 0 < len(pairs) <= cfg.bands * pcfg.max_pairs_per_group
    # canonical + deduped
    assert (pairs["doc_id_a"] < pairs["doc_id_b"]).all()
    assert not pairs.duplicated(["doc_id_a", "doc_id_b"]).any()


def test_salting_identity(ray_session, dna_docs):
    """F4: with caps not binding, salted and unsalted configs produce the
    same clusters (salting only bounds work, never changes semantics when
    groups fit)."""
    import ray.data as rd

    docs, truth = dna_docs
    ds = rd.from_arrow(docs)
    from sassy_ray.stages.pairs import PairGenConfig

    base = _dna_cfg()
    salted = _dna_cfg(pairs=PairGenConfig(salt_cap=8, max_pairs_per_group=10_000))
    c1 = (
        run_er_pipeline(ds, base)["clusters"].to_pandas().sort_values("doc_id").reset_index(drop=True)
    )
    c2 = (
        run_er_pipeline(ds, salted)["clusters"]
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    # salting with small caps may split a few buckets; clusters must still
    # reach the F1 bar and in this corpus be identical
    m1 = evaluate_clusters(run_er_pipeline(ds, salted)["clusters"], truth)
    assert m1["f1"] >= 0.99
    assert c1.equals(c2)


def test_pipeline_planted_fuzz(ray_session):
    """Pipeline-level planted-match recovery (search_fuzz transplanted,
    src/search.rs:2605-2710): every planted <=k-mutated duplicate must end
    up co-clustered with its base."""
    import ray.data as rd

    from sassy_ray.sources.synth import dna_corpus, truth_pairs

    docs, truth = dna_corpus(80, seed=1234, max_edits=3)
    res = run_er_pipeline(rd.from_arrow(docs), _dna_cfg())
    pred = res["clusters"].to_pandas()
    lab = dict(zip(pred.doc_id, pred.cluster_id))
    missed = [(a, b) for a, b in truth_pairs(truth) if lab[a] != lab[b]]
    assert len(missed) <= max(1, len(truth_pairs(truth)) // 100), missed[:5]


def test_labeled_docs_span_invariant(ray_session, dna_docs):
    """The flagship output with spans attached preserves the exact span
    sequence (kind, text, media_ref, offset, order) per row."""
    import numpy as np
    import ray.data as rd

    docs, _ = dna_docs
    res = run_er_pipeline(rd.from_arrow(docs), _dna_cfg())
    out = res["labeled_docs"]()
    batches = list(out.iter_batches(batch_size=100_000, batch_format="pyarrow"))
    got = pa.concat_tables(batches).sort_by("doc_id")
    assert "cluster_id" in got.column_names
    want_fp = spans_fingerprint(docs.sort_by("doc_id"))
    got_fp = spans_fingerprint(got)
    np.testing.assert_array_equal(want_fp, got_fp)


def test_span_passthrough(ray_session, dna_docs):
    """The spans column survives the text-concat stage byte-identically."""
    import ray.data as rd

    import numpy as np

    docs, _ = dna_docs
    out = rd.from_arrow(docs).map_batches(add_doc_text, batch_format="pyarrow")
    batches = list(out.iter_batches(batch_size=10_000, batch_format="pyarrow"))
    got_tbl = pa.concat_tables(batches).sort_by("doc_id").select(["doc_id", "spans"])
    want_fp = spans_fingerprint(docs.sort_by("doc_id"))
    got_fp = spans_fingerprint(got_tbl)
    np.testing.assert_array_equal(want_fp, got_fp)


def test_er_empty_and_single_doc(ray_session):
    """Degenerate inputs: empty corpus and a single document."""
    import pyarrow as pa
    import ray.data as rd

    from sassy_ray.sources.synth import DOCS_SCHEMA

    empty = pa.Table.from_pylist([], schema=DOCS_SCHEMA)
    res = run_er_pipeline(rd.from_arrow(empty), ERConfig())
    assert res["clusters"].count() == 0

    one = pa.Table.from_pylist(
        [
            {
                "doc_id": "d1",
                "spans": [{"kind": "text", "text": "hello world", "media_ref": "", "offset": 0}],
            }
        ],
        schema=DOCS_SCHEMA,
    )
    res = run_er_pipeline(rd.from_arrow(one), ERConfig())
    out = res["clusters"].to_pandas()
    assert list(out.doc_id) == ["d1"] and list(out.cluster_id) == ["d1"]


def test_labeled_docs_sharded_attach(ray_session, dna_docs, tmp_path):
    """Partition-aligned label attach: labels written hash-partitioned by
    doc_id (distributed write, no driver concat of the label set), attach
    merges per batch from worker-cached shards.  Must agree bit-for-bit
    with the broadcast attach, preserve the span fingerprint, and resume
    idempotently (second call skips the shard rewrite via the manifest)."""
    import numpy as np
    import ray.data as rd

    docs, _ = dna_docs
    res = run_er_pipeline(rd.from_arrow(docs), _dna_cfg())
    label_dir = str(tmp_path / "label_shards")
    out_sharded = res["labeled_docs"](mode="sharded", label_dir=label_dir, num_shards=8)
    got = pa.concat_tables(
        out_sharded.iter_batches(batch_size=100_000, batch_format="pyarrow")
    ).sort_by("doc_id")
    out_bcast = res["labeled_docs"](mode="broadcast")
    want = pa.concat_tables(
        out_bcast.iter_batches(batch_size=100_000, batch_format="pyarrow")
    ).sort_by("doc_id")
    assert got.column("cluster_id").to_pylist() == want.column("cluster_id").to_pylist()
    np.testing.assert_array_equal(spans_fingerprint(got), spans_fingerprint(docs.sort_by("doc_id")))

    # kill-and-resume: manifest present -> rewrite skipped, result identical
    import json
    import os

    man = os.path.join(label_dir, "manifest.json")
    mtime = os.path.getmtime(man)
    out2 = res["labeled_docs"](mode="sharded", label_dir=label_dir, num_shards=8)
    got2 = pa.concat_tables(
        out2.iter_batches(batch_size=100_000, batch_format="pyarrow")
    ).sort_by("doc_id")
    assert os.path.getmtime(man) == mtime  # no rewrite
    assert got2.column("cluster_id").to_pylist() == want.column("cluster_id").to_pylist()
    with open(man) as f:
        assert json.load(f)["complete"]
