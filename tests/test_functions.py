"""Tests for text-analysis, multimodal, ANN and match-formatting functions."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pytest

from sassy_ray.functions.matches import format_cigar, format_match_region
from sassy_ray.functions.multimodal import (
    DETERMINISTIC_FAKE,
    RAISE,
    MediaDecoder,
    media_refs_from_spans,
    synthesize_media_payloads,
)
from sassy_ray.functions.text import (
    fingerprint_batch,
    lang_id_batch,
    quality_batch,
    token_count_batch,
)
from sassy_ray.kernel.types import Match


def docs_table():
    return pa.table(
        {
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(
                [
                    "the cat and the dog sat on the mat",
                    "der Hund ist nicht der beste und die Katze",
                    "",
                ]
            ),
        }
    )


def test_lang_id():
    out = lang_id_batch(docs_table())
    langs = out.column("pred_lang").to_pylist()
    assert langs[0] == "en"
    assert langs[1] == "de"
    assert langs[2] == "und"


def test_quality():
    out = quality_batch(docs_table())
    assert out.column("n_tokens").to_pylist() == [9, 9, 0]
    assert out.column("n_chars").to_pylist()[0] == 34
    assert out.column("stop_e6").to_pylist()[0] > 300_000


def test_token_counts():
    out = token_count_batch(docs_table())
    assert out.column("ws_tokens").to_pylist() == [9, 9, 0]
    assert out.column("bpe_tokens").to_pylist()[0] == 9


def test_fingerprint_deterministic():
    a = fingerprint_batch(docs_table()).column("fingerprint64").to_pylist()
    b = fingerprint_batch(docs_table()).column("fingerprint64").to_pylist()
    assert a == b
    assert len(set(a)) == 3  # distinct texts -> distinct fingerprints


def test_match_region_rc():
    m = Match(text_start=2, text_end=6, cost=0, strand="-", cigar="4=")
    assert format_match_region(b"AACGATT", m, "dna") == b"ATCG"  # rc of CGAT
    assert format_match_region(b"AACGATT", m, "dna", sam=True) == b"CGAT"
    m2 = Match(text_start=0, text_end=3, cost=1, strand="-", cigar="2=1X")
    assert format_cigar(m2, sam=False) == "2=1X"
    assert format_cigar(m2, sam=True) == "1X2="


def test_media_pipeline():
    from sassy_ray.sources.synth import dna_corpus

    docs, _ = dna_corpus(30, seed=42)
    refs_tbl = media_refs_from_spans(docs)
    refs = sorted(set(refs_tbl.column("media_ref").to_pylist()))
    assert refs and all(r.startswith("media://") for r in refs)
    media = synthesize_media_payloads(refs)
    dec = MediaDecoder(mode=DETERMINISTIC_FAKE, dim=16)
    out = dec(media)
    assert out.column_names == [
        "media_ref", "kind", "features", "n_frames",
        "feat_sum_e6", "feat_min_e6", "feat_max_e6",
    ]
    feats = out.column("features").to_pylist()
    assert all(len(f) == 16 for f in feats)
    # deterministic
    out2 = MediaDecoder(mode=DETERMINISTIC_FAKE, dim=16)(media)
    assert out.equals(out2)
    # video frame sampling stub
    kinds = out.column("kind").to_pylist()
    frames = out.column("n_frames").to_pylist()
    for k, f in zip(kinds, frames):
        assert f >= 1 and (k == "video" or f == 1)


def test_media_raise_mode():
    media = synthesize_media_payloads(["media://x"])
    with pytest.raises(NotImplementedError):
        MediaDecoder(mode=RAISE)(media)


def test_ann_brute_vs_ivf(ray_session):
    import ray.data as rd

    from sassy_ray.functions.ann import brute_force_topk, ivf_topk

    rng = np.random.default_rng(3)
    n, d = 400, 16
    M = rng.standard_normal((n, d))
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array(M.tolist(), pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    q = M[7][None, :]
    ids_b, sims_b, counts_b = brute_force_topk(ds, q, k=5)
    assert ids_b[0][0] == 7 and sims_b[0][0] > 0.999 and counts_b[0] == 5
    ids_i, sims_i, counts_i = ivf_topk(ds, q, k=5, n_centroids=8, nprobe=4)
    # IVF must at least find the identical vector and mostly agree
    assert ids_i[0][0] == 7
    # under-filled probes truncate (never fabricate vec_id-0/sim-0 rows)
    assert counts_i[0] <= 5 and np.all(np.isfinite(sims_i[0][: counts_i[0]]))
    assert len(set(ids_b[0]) & set(ids_i[0])) >= 3


def test_hash_join_broadcast_vs_partitioned(ray_session, monkeypatch):
    """The size-adaptive join's two physical plans must agree bit-for-bit."""
    from sassy_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    bcast = Q.QUERIES["hash_join"](sf).sort_by("o_orderpriority")
    monkeypatch.setenv("SASSY_BROADCAST_JOIN_LIMIT", "0")
    part = Q.QUERIES["hash_join"](sf).sort_by("o_orderpriority")
    assert bcast.equals(part.select(bcast.column_names).cast(bcast.schema))


def test_asof_join_broadcast_vs_partitioned(ray_session, monkeypatch):
    """asof_join_orders' two physical plans (driver broadcast vs user-hash
    partitioned merge_asof) must agree bit-for-bit."""
    from sassy_ray.pipelines import queries as Q

    sf = "/root/testdata/sf0.001"
    bcast = Q.QUERIES["asof_join_orders"](sf).sort_by("event_id")
    monkeypatch.setenv("SASSY_BROADCAST_JOIN_LIMIT", "0")
    part = Q.QUERIES["asof_join_orders"](sf).sort_by("event_id")
    assert bcast.num_rows == part.num_rows > 0
    assert bcast.equals(part.select(bcast.column_names).cast(bcast.schema))


def test_window_ops_block_seams(ray_session, tmp_path):
    """events_sessionize / window_running_revenue boundary correction: with
    a tiny target block size the sorted dataset splits into many blocks, so
    user/customer groups straddle block seams — results must still equal the
    DuckDB window oracle exactly."""
    import duckdb
    import ray.data

    sys_path_tools = "/root/repo/tools"
    import sys

    if sys_path_tools not in sys.path:
        sys.path.insert(0, sys_path_tools)
    from tail_bench import synth_window_tables

    from sassy_ray.pipelines import queries as Q

    sf = str(tmp_path)
    synth_window_tables(sf, n_groups=500, rows_per_group=6, seed=3)
    ctx = ray.data.DataContext.get_current()
    old = ctx.target_max_block_size
    ctx.target_max_block_size = 16 << 10  # ~hundreds of rows per block
    try:
        t1 = Q.QUERIES["events_sessionize"](sf)
        t2 = Q.QUERIES["window_running_revenue"](sf)
    finally:
        ctx.target_max_block_size = old
    con = duckdb.connect()
    for t in ("events", "orders"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
    o1 = con.execute(Q.ORACLE_SQL["events_sessionize"]).arrow()
    o2 = con.execute(Q.ORACLE_SQL["window_running_revenue"]).arrow()

    def norm(t, keys):
        df = t.to_pandas().sort_values(keys).reset_index(drop=True)
        return df[sorted(df.columns)]

    a1 = norm(t1, ["user_id", "session_start"])
    b1 = norm(o1, ["user_id", "session_start"]).astype(a1.dtypes.to_dict())
    assert len(a1) == len(b1) > 0 and a1.equals(b1)
    a2 = norm(t2, ["o_custkey", "o_orderkey"])
    b2 = norm(o2, ["o_custkey", "o_orderkey"]).astype(a2.dtypes.to_dict())
    assert len(a2) == len(b2) > 0 and a2.equals(b2)


def test_embedding_neardup_salted_bounded(ray_session):
    """Scale-proofing of embedding_neardup_pairs: with salt_cap forced tiny,
    candidate pairs must be generated at SUB-bucket granularity (the group a
    task holds is a (bucket, simhash-cell) sub-bucket, ~salt_cap rows, not
    the whole bucket): the candidate count must equal sum-over-sub-buckets
    C(s, 2) under the replicated salt plan, and — because the salt is the
    SimHash of the embedding, not an id-hash — planted near-duplicate pairs
    must survive the split with high recall."""
    import ray.data as rd

    import sassy_ray.functions.ann as A
    from sassy_ray.functions.ann import embedding_neardup_pairs

    rng = np.random.default_rng(5)
    # 40 base vectors, each duplicated with tiny noise -> 40 planted pairs
    base = rng.normal(size=(40, 16))
    dup = base + rng.normal(scale=1e-4, size=base.shape)
    M = np.concatenate([base, dup])
    tbl = pa.table(
        {
            "vec_id": pa.array(np.arange(len(M)), pa.int64()),
            "embedding": pa.array(M.tolist(), pa.list_(pa.float64())),
        }
    )
    ds = rd.from_arrow(tbl).repartition(4)
    C = A.coarse_centroids(ds, 2, seed=1)

    salt_cap = 8
    res_salted = embedding_neardup_pairs(
        ds, tau=0.999, centroids=C, n_centroids=2, salt_cap=salt_cap, seed=1, n_assign=1
    )
    cands = pa.concat_tables(
        res_salted["candidates"].iter_batches(batch_size=4096, batch_format="pyarrow")
    )

    # replicate the salt plan: bucket + simhash cell counts -> b/nb2 -> gkey
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    bkt = np.argmax(Mn @ C.T, axis=1)
    sh = A._simhash_codes(Mn, seed=1 + 23)
    counts2d = np.zeros((2, 1 << A._SALT_BITS), dtype=np.int64)
    np.add.at(counts2d.reshape(-1), (bkt.astype(np.int64) << A._SALT_BITS) + sh, 1)
    assert counts2d.sum(axis=1).max() > salt_cap, "test must actually trigger salting"
    b_arr, nb2_flat, max_nb2 = A._plan_salt(counts2d, salt_cap)
    gkey = A._gkey_rows(bkt, sh, np.arange(len(M), dtype=np.int64), b_arr, nb2_flat, max_nb2)
    sizes = np.bincount(gkey - gkey.min())
    expected_pairs = int(sum(s * (s - 1) // 2 for s in sizes))
    assert cands.num_rows == expected_pairs > 0

    salted = res_salted["pairs_fn"]()
    res_unsalted = embedding_neardup_pairs(
        ds, tau=0.999, centroids=C, n_centroids=2, salt_cap=10_000, seed=1, n_assign=1
    )
    unsalted = res_unsalted["pairs_fn"]()
    sp = set(zip(salted["vec_id_a"].to_pylist(), salted["vec_id_b"].to_pylist()))
    up = set(zip(unsalted["vec_id_a"].to_pylist(), unsalted["vec_id_b"].to_pylist()))
    planted = {(i, i + 40) for i in range(40)}
    # simhash salt: a near-identical pair flips a salt bit only with
    # probability ~angle/pi per bit — recall must stay high, unlike the
    # ~1/nb survival an id-hash salt would give
    assert sp <= up
    assert len(up & planted) >= 38
    assert len(sp & planted) >= 30
    # multi-assignment (default n_assign=2) must not emit duplicate pairs
    res_ma = embedding_neardup_pairs(ds, tau=0.999, centroids=C, n_centroids=2, salt_cap=salt_cap, seed=1)
    ma = res_ma["pairs_fn"]()
    keys = list(zip(ma["vec_id_a"].to_pylist(), ma["vec_id_b"].to_pylist()))
    assert len(keys) == len(set(keys))
    # (with only 2 centroids, n_assign=2 doubles every bucket's count and
    # adds a salt bit, so coverage is not a strict superset here — the real
    # multi-assign recall evidence is the 1M-vector tail bench)
    assert len(set(keys) & planted) >= 25
