"""Equivalence tests for the round-2 fast paths: the vectorized single-task
pair generation vs the shuffle path, the scorer's suffix screen vs the
unscreened kernel, and OPH minhash signature properties."""

import random

import numpy as np
import pyarrow as pa
import pytest


def _block_rows(rng, n_keys=200, max_group=10):
    keys, ids = [], []
    for k in range(n_keys):
        size = rng.choice([1, 1, 1, 2, 2, 3, rng.randint(1, max_group)])
        members = rng.sample(range(1000), size)
        for m in members:
            keys.append(k * 7919 + 13)
            ids.append(f"doc-{m:05d}")
    # duplicated (key, id) rows must not duplicate pairs
    keys += keys[:20]
    ids += ids[:20]
    return pa.table({"block_key": pa.array(keys, pa.int64()), "doc_id": pa.array(ids)})


def _pair_set(ds):
    t = pa.concat_tables(ds.iter_batches(batch_size=65536, batch_format="pyarrow"))
    return set(zip(t.column("doc_id_a").to_pylist(), t.column("doc_id_b").to_pylist()))


def test_pairs_single_task_equals_groupby_path(ray_session):
    import ray.data as rd

    from sassy_ray.stages.pairs import PairGenConfig, make_pairs_dataset

    rng = random.Random(11)
    rows = _block_rows(rng)
    # all three shuffle plans must produce the same pair set: the manual
    # hash exchange (default at >=2 CPUs), the single vectorized task, and
    # the Dataset-groupby scale path
    exchange = make_pairs_dataset(rd.from_arrow(rows).repartition(4), PairGenConfig())
    single = make_pairs_dataset(
        rd.from_arrow(rows).repartition(4), PairGenConfig(exchange_rows_limit=0)
    )
    forced = PairGenConfig(
        single_task_rows_limit=0, single_task_dedup_limit=0, exchange_rows_limit=0
    )
    shuffled = make_pairs_dataset(rd.from_arrow(rows).repartition(4), forced)
    s0, s1, s2 = _pair_set(exchange), _pair_set(single), _pair_set(shuffled)
    assert s0 == s1 == s2 and len(s1) > 50
    for a, b in s1:
        assert a < b  # canonical orientation


def test_scorer_suffix_screen_is_exact():
    """is_match with the 63-char suffix screen == unscreened kernel."""
    from sassy_ray.kernel.myers import batch_best_costs
    from sassy_ray.kernel.profiles import get_profile
    from sassy_ray.stages.scoring import PairScorer, ScoreConfig

    rng = random.Random(12)
    alpha = "abcdefghijklmnopqrstuvwxyz "
    docs = {}
    for i in range(300):
        n = rng.randint(150, 500)
        docs[f"d{i}"] = "".join(rng.choice(alpha) for _ in range(n)).encode()
    ids = list(docs)
    a, b = [], []
    for i in range(600):
        if i % 4 == 0:  # plant near-dups
            d = rng.choice(ids)
            a.append(d)
            b.append(d)
        else:
            a.append(rng.choice(ids))
            b.append(rng.choice(ids))
    batch = pa.table({"doc_id_a": a, "doc_id_b": b})
    cfg = ScoreConfig(profile="ascii_ci", k_min=3, rel_k=0.03)
    out = PairScorer(cfg, docs_ref=docs)(batch)
    # reference: unscreened kernel, same clamping convention
    prof = get_profile("ascii_ci")
    pats, txts, kp = [], [], []
    for x, y in zip(a, b):
        ta, tb = docs[x], docs[y]
        if len(ta) > len(tb):
            ta, tb = tb, ta
        pats.append(ta)
        txts.append(tb)
        kp.append(max(cfg.k_min, int(cfg.rel_k * len(ta))))
    kmax = max(kp)
    want_cost = np.minimum(
        batch_best_costs(pats, txts, prof, kmax), np.asarray(kp, dtype=np.int32) + 1
    )
    got_cost = out.column("cost").to_numpy()
    got_match = out.column("is_match").to_numpy(zero_copy_only=False)
    want_match = want_cost <= np.asarray(kp)
    assert (got_match == want_match).all()
    assert (got_cost == want_cost).all()
    assert got_match.sum() > 100  # planted dups matched


def test_doc_lookup_missing_and_types():
    from sassy_ray.stages.scoring import _DocLookup, _resolve_docs

    lk = _resolve_docs({"a": b"xx", "b": "yy"})
    assert lk.get_many(["b", "missing", "a"]) == [b"yy", b"", b"xx"]
    tbl = pa.table({"doc_id": ["d1", "d2"], "text": ["t1", "t2"]})
    lk2 = _DocLookup.from_table(tbl)
    assert lk2.get_many(["d2", "zz", "d1"]) == [b"t2", b"", b"t1"]


def test_doc_lookup_chunked_zero_copy_paths():
    """The broadcast lookup must give identical answers when its id/text
    columns are MULTI-CHUNK (plasma-backed blocks are never combined into
    the worker heap) and the per-chunk polars hash index must equal the
    combined-column one (polars' hash is row-wise; chunked == combined)."""
    import numpy as np

    from sassy_ray.stages.scoring import _DocLookup, build_hash_index

    ids = [f"doc-{i:05d}" for i in range(3000)]
    txts = [f"text-{i}" for i in range(3000)]
    # three uneven chunks
    cuts = [0, 700, 1900, 3000]
    id_col = pa.chunked_array(
        [pa.array(ids[a:b]) for a, b in zip(cuts, cuts[1:])]
    )
    tx_col = pa.chunked_array(
        [pa.array(txts[a:b]) for a, b in zip(cuts, cuts[1:])]
    )
    h_chunked = build_hash_index(id_col)
    h_combined = build_hash_index(id_col.combine_chunks())
    assert h_chunked and h_combined
    assert (h_chunked[0] == h_combined[0]).all()
    assert (h_chunked[1] == h_combined[1]).all()

    lk = _DocLookup(id_col, tx_col)
    probe = ["doc-02900", "missing", "doc-00000", "doc-00699", "doc-00700"]
    got = lk.take_arrow(pa.array(probe)).to_pylist()
    assert got == ["text-2900", "", "text-0", "text-699", "text-700"]
    assert isinstance(lk.texts, pa.ChunkedArray)  # corpus stayed chunked
    # nulls preserved with fill=None (label-attach contract)
    got2 = lk.take_arrow(pa.array(probe), fill=None)
    assert got2.null_count == 1
    # pre-attached index (the driver-broadcast path) short-circuits build
    lk3 = _DocLookup(id_col, tx_col)
    lk3._hidx = h_combined
    assert lk3.take_arrow(pa.array(probe)).to_pylist() == got
    # index_in fallback (hash index disabled) agrees
    lk4 = _DocLookup(id_col, tx_col)
    lk4._hidx = False
    assert lk4.take_arrow(pa.array(probe)).to_pylist() == got
    assert np.asarray(h_chunked[0]).dtype == np.int64


def test_gather_equals_arrow_take_fuzz():
    """_gather (manual chunk-resolving take) must equal pc.take on the
    combined column for random chunk layouts and index patterns —
    duplicates, repeats within one chunk, chunk-sorted (fast path that
    skips the reorder take) and reverse-sorted probes."""
    import numpy as np
    import pyarrow.compute as pc

    from sassy_ray.stages.scoring import _gather

    rng = np.random.default_rng(17)
    vals = pa.array([f"v{i:04d}" for i in range(2500)])
    for trial in range(20):
        ncuts = int(rng.integers(1, 9))
        cuts = np.unique(rng.integers(0, 2500, size=ncuts)).tolist()
        bounds = [0] + cuts + [2500]
        col = pa.chunked_array(
            [vals.slice(a, b - a) for a, b in zip(bounds, bounds[1:]) if b > a]
        )
        n = int(rng.integers(0, 400))
        rows = rng.integers(0, 2500, size=n).astype(np.int64)
        if trial % 4 == 1:
            rows = np.sort(rows)  # chunk-sorted: no-reorder fast path
        elif trial % 4 == 2:
            rows = np.sort(rows)[::-1].copy()
        want = pc.take(vals, pa.array(rows, pa.int64())).to_pylist()
        got = _gather(col, rows).to_pylist()
        assert got == want, f"trial {trial}: layout {bounds}"
        offs = np.cumsum([0] + [len(c) for c in col.chunks])
        got2 = _gather(col, rows, offs).to_pylist()
        assert got2 == want
        # native C gather (sliced chunks exercise the per-chunk offset
        # rebase); meta is None when the native kernel is unavailable —
        # then this just re-checks the Arrow path
        from sassy_ray.stages.scoring import _chunk_meta

        meta = _chunk_meta(col)
        got3 = _gather(col, rows, offs, meta).to_pylist()
        assert got3 == want, f"trial {trial} (C gather): layout {bounds}"
    # plain (non-chunked) Array passthrough
    assert _gather(vals, np.array([3, 1, 1, 2499], np.int64)).to_pylist() == [
        "v0003",
        "v0001",
        "v0001",
        "v2499",
    ]


def test_gather_native_meta_variants():
    """C-gather corner cases: large_string offsets (int64), empty strings,
    an all-empty chunk, and a null chunk (meta must refuse)."""
    import numpy as np
    import pyarrow.compute as pc

    from sassy_ray.kernel import native as _native
    from sassy_ray.stages.scoring import _chunk_meta, _gather

    col = pa.chunked_array(
        [
            pa.array(["", "a", "bb"], pa.large_string()),
            pa.array(["", ""], pa.large_string()),
            pa.array(["cccc", ""], pa.large_string()),
        ]
    )
    meta = _chunk_meta(col)
    if _native.available():
        assert meta is not None and meta["big"]
    rows = np.array([0, 2, 3, 4, 5, 6, 1, 0], np.int64)
    want = pc.take(col.combine_chunks(), pa.array(rows)).to_pylist()
    assert _gather(col, rows, None, meta).to_pylist() == want
    assert _gather(col, rows, None, meta).type == pa.large_string()
    # binary type round-trips too
    bcol = pa.chunked_array([pa.array([b"xy", b""], pa.binary()), pa.array([b"z"], pa.binary())])
    bmeta = _chunk_meta(bcol)
    assert _gather(bcol, np.array([2, 0, 1], np.int64), None, bmeta).to_pylist() == [b"z", b"xy", b""]
    # nulls anywhere -> no fast path
    ncol = pa.chunked_array([pa.array(["a", None])])
    assert _chunk_meta(ncol) is None


def test_fasta_gz_whole_file_fallback(ray_session, tmp_path):
    """gz inputs are not range-seekable: plan must be one whole-file chunk
    and still parse correctly."""
    import gzip

    from sassy_ray.sources.fasta import plan_chunks, read_fasta

    payload = b">a\nACGT\n>b\nGGGG\n" * 50_000  # ~0.8 MB compressed poorly
    p = tmp_path / "big.fa.gz"
    p.write_bytes(gzip.compress(payload))
    plan = plan_chunks(str(p), chunk_bytes=64 * 1024)
    assert len(plan) == 1 and plan[0]["end"] == -1
    assert read_fasta(str(p)).count() == 100_000


def test_oph_minhash_properties():
    from sassy_ray.stages.blocking import BlockingConfig, band_keys, minhash_signatures

    rng = random.Random(13)
    cfg = BlockingConfig(q=12, num_perm=16, bands=8)
    base = "".join(rng.choice("abcdefgh ") for _ in range(400))
    near = base[:200] + "X" + base[201:]  # 1 edit
    far = "".join(rng.choice("abcdefgh ") for _ in range(400))
    sigs = minhash_signatures([base.encode(), base.encode(), near.encode(), far.encode()], cfg)
    # identical docs -> identical signatures
    assert (sigs[0] == sigs[1]).all()
    # near-dup shares most buckets; random doc shares few
    share_near = (sigs[0] == sigs[2]).mean()
    share_far = (sigs[0] == sigs[3]).mean()
    assert share_near > 0.6 > share_far
    # near-dup co-blocks on at least one band key
    keys = band_keys(sigs, cfg)
    assert len(set(keys[0]) & set(keys[2])) >= 1
    assert len(set(keys[0]) & set(keys[3])) == 0
    # short doc (< q) still gets a full deterministic signature
    s2 = minhash_signatures([b"abc"], cfg)
    s3 = minhash_signatures([b"abc"], cfg)
    assert (s2 == s3).all()


def test_derived_exchange_limit_scales_with_memory():
    """The exchange-vs-groupby gate must scale with per-node memory, never
    sit on a fixed row count: the known-good sizes (224M rows on the
    94 GB/32-CPU box) clear it, a part's budgeted working set stays within
    a quarter of the per-CPU heap, and tiny nodes get a tiny limit."""
    from sassy_ray.stages.pairs import derived_exchange_limit

    big = derived_exchange_limit(32, 94e9)
    assert big > 224_000_000  # the 28M-doc corpus that exposed the fixed gate
    # per-part working set within budget: rows/64 parts x 30 B x 4
    assert (big / 64) * 30 * 4 <= (94e9 / 32) * 0.25 * 1.001
    # the limit tracks PER-CPU heap (a part must fit one worker)
    assert derived_exchange_limit(32, 9.4e9) == big // 10
    small = derived_exchange_limit(4, 1e9)
    assert small < big / 10
    assert derived_exchange_limit(1, 0.0) == 0  # degenerate: groupby route
