"""The flagship entity-resolution pipeline (north rule).

    read docs -> concat spans -> minhash blocking -> candidate pairs
    -> actor-pool pair scoring (Myers kernel) -> match edges
    -> transitive clustering -> (doc_id, cluster_id)

Every stage is a Ray Data transform; stateful scoring is an actor pool;
shuffles: groupby(block_key), groupby(pair key), per-round groupby(node)
(SURVEY.md §7.4).  With ``checkpoint_dir`` set, each stage writes a parquet
checkpoint + manifest and reruns skip completed stages (stages/checkpoint.py).

Text resolution for scoring: 'broadcast' ships a doc_id->text dict through
the object store once (``ray.put``) and each scorer actor reads it in
``__init__`` — no shuffle; 'join' uses two hash-partitioned Dataset.join
passes — the 10^12-doc path where the corpus doesn't fit a worker.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from sassy_ray.sources.docs import add_doc_text
from sassy_ray.stages.blocking import BlockingConfig, minhash_block_rows
from sassy_ray.stages.checkpoint import StageCheckpoint
from sassy_ray.stages.clustering import connected_components
from sassy_ray.stages.pairs import PairGenConfig, make_pairs_dataset
from sassy_ray.stages.scoring import PairScorer, ScoreConfig

__all__ = ["ERConfig", "run_er_pipeline", "evaluate_clusters"]


class ERConfig:
    def __init__(
        self,
        blocking: BlockingConfig | None = None,
        pairs: PairGenConfig | None = None,
        score: ScoreConfig | None = None,
        text_mode: str = "broadcast",  # 'broadcast' | 'join'
        score_concurrency: int | tuple = 4,
        score_batch_size: int = 8192,
        max_cc_iters: int = 25,
        join_partitions: int = 32,
        input_blocks: int = 32,
        score_mode: str = "tasks",  # 'tasks' (warm workers) | 'actors'
        # edge count above which clustering runs the DISTRIBUTED star-round
        # exchange instead of the driver DSU fast path; lowered to 0 to
        # force the 10^12-scale route at test sizes (queries.er_clusters_
        # scale_paths, the forced-distributed CC tests)
        cc_driver_edge_limit: int = 2_000_000,
    ) -> None:
        self.cc_driver_edge_limit = cc_driver_edge_limit
        self.score_mode = score_mode
        self.join_partitions = join_partitions
        self.input_blocks = input_blocks
        self.blocking = blocking or BlockingConfig()
        self.pairs = pairs or PairGenConfig()
        self.score = score or ScoreConfig()
        self.text_mode = text_mode
        self.score_concurrency = score_concurrency
        self.score_batch_size = score_batch_size
        self.max_cc_iters = max_cc_iters

    def fingerprint(self) -> str:
        return "|".join(
            [
                self.blocking.fingerprint(),
                self.pairs.fingerprint(),
                self.score.fingerprint(),
                self.text_mode,
            ]
        )


def _ckpt(checkpoint_dir, stage, fp):
    return StageCheckpoint(checkpoint_dir, stage, fp) if checkpoint_dir else None


def _maybe(stage_fn, ck, stats=None, name=None):
    """Run a stage unless its checkpoint is complete.  Stage outputs are
    pinned (checkpoint parquet or materialize) because each is consumed by
    more than one downstream op — without pinning the lazy graph re-executes
    the whole prefix per consumer.  These intermediates (block rows, pairs,
    scored edges) are orders of magnitude smaller than the corpus."""
    import time

    if ck is not None and ck.complete():
        return ck.load(), True
    t0 = time.time()
    ds = stage_fn()
    t1 = time.time()
    if ck is not None:
        ds = ck.save(ds)
    else:
        ds = ds.materialize()
    if stats is not None and name:
        stats.setdefault("stage_sec", {})[name] = round(time.time() - t0, 3)
    if os.environ.get("SASSY_ER_PROF"):
        import sys

        print(
            f"[er] {name}: fn {t1 - t0:.2f}s save/mat {time.time() - t1:.2f}s",
            file=sys.stderr,
        )
    return ds, False


def run_er_pipeline(docs_ds, cfg: ERConfig | None = None, checkpoint_dir: str | None = None):
    """docs Dataset (doc_id, spans) -> dict(clusters=Dataset, stats=dict)."""
    import ray

    cfg = cfg or ERConfig()
    fp = cfg.fingerprint()
    stats: dict = {"resumed_stages": []}

    # spread the input across blocks so every stage parallelizes (from_arrow
    # on one table yields ONE block; at real scale read_parquet handles
    # this).  Skip the repartition when the caller already supplies enough
    # blocks — splitting a single 100s-of-MB block is a serial cost.
    if cfg.input_blocks:
        try:
            nb = docs_ds.num_blocks()
        except Exception:
            nb = 1
        if nb is None or nb < max(2, cfg.input_blocks // 2):
            docs_ds = docs_ds.repartition(cfg.input_blocks)
    # consumed by both the blocking stage and the broadcast text lookup
    import time as _time

    _prof = bool(os.environ.get("SASSY_ER_PROF"))
    _t0 = _time.time()
    # (doc_id, text) ONLY: every consumer (blocking, broadcast proj, join
    # path) reads just these two columns, and the wide spans payload would
    # otherwise be pinned a second time alongside the input
    texts_ds = (
        docs_ds.map_batches(add_doc_text, batch_format="pyarrow")
        .select_columns(["doc_id", "text"])
        .materialize()
    )
    if _prof:
        import sys as _sys

        print(f"[er] texts mat {_time.time() - _t0:.2f}s", file=_sys.stderr)

    # --- blocking ---------------------------------------------------------
    bcfg = cfg.blocking

    def _block():
        return texts_ds.map_batches(
            lambda b: minhash_block_rows(b, bcfg), batch_format="pyarrow"
        )

    ck = _ckpt(checkpoint_dir, "block_rows", fp)
    block_rows, resumed = _maybe(_block, ck, stats, "block_rows")
    if resumed:
        stats["resumed_stages"].append("block_rows")

    # --- candidate pairs --------------------------------------------------
    ck = _ckpt(checkpoint_dir, "pairs", fp)
    pairs_ds, resumed = _maybe(lambda: make_pairs_dataset(block_rows, cfg.pairs), ck, stats, "pairs")
    if resumed:
        stats["resumed_stages"].append("pairs")

    # --- scoring ----------------------------------------------------------
    scorer_kwargs: dict = {"cfg": cfg.score}
    if cfg.text_mode == "broadcast":
        # broadcast the id->text side as the already-materialized Arrow block
        # refs — no driver-side copy; workers concat zero-copy from plasma
        # and build their dict once (scoring._resolve_docs cache).
        # Normalization (lowercase) happens in parallel, not per scored pair.
        proj = texts_ds.select_columns(["doc_id", "text"])
        if cfg.score.lowercase:
            proj = proj.map_batches(
                lambda b: pa.table(
                    {"doc_id": b.column("doc_id"), "text": pc.utf8_lower(b.column("text"))}
                ),
                batch_format="pyarrow",
            )
            scorer_kwargs["pre_lowercased"] = True
        _t0 = _time.time()
        doc_refs = proj.materialize().to_arrow_refs()
        scorer_kwargs["docs_ref"] = doc_refs
        if _prof:
            import sys as _sys

            print(f"[er] broadcast proj mat {_time.time() - _t0:.2f}s", file=_sys.stderr)
        # sorted-hash id index built ONCE driver-side and broadcast: every
        # scorer worker otherwise pays the polars hash + argsort of the
        # whole id column itself (~0.5 s per worker at 2.4M docs) before
        # its first batch.  The id chunks read zero-copy from plasma; only
        # the (hs, order) int64 arrays ship (16 B/doc, one plasma copy).
        try:
            from sassy_ray.stages.scoring import build_hash_index

            chunks = [
                c for t in ray.get(list(doc_refs)) for c in t.column("doc_id").chunks
            ]
            hidx = build_hash_index(pa.chunked_array(chunks)) if chunks else False
            if hidx:
                scorer_kwargs["docs_hidx"] = ray.put(hidx)
        except Exception:
            pass
        join_input = pairs_ds
    elif cfg.text_mode == "join":
        txt = texts_ds.select_columns(["doc_id", "text"])
        # cap by cluster CPUs: a hash-join spawns aggregator actors per
        # partition, and over-subscribing a small node deadlocks the pool
        cpus = int(ray.cluster_resources().get("CPU", 8))
        nparts = max(2, min(cfg.join_partitions, cpus))
        a = txt.map_batches(
            lambda b: pa.table({"doc_id_a": b.column("doc_id"), "text_a": b.column("text")}),
            batch_format="pyarrow",
        )
        b_ = txt.map_batches(
            lambda b: pa.table({"doc_id_b": b.column("doc_id"), "text_b": b.column("text")}),
            batch_format="pyarrow",
        )
        join_input = pairs_ds.join(a, join_type="inner", num_partitions=nparts, on=("doc_id_a",))
        join_input = join_input.join(
            b_, join_type="inner", num_partitions=nparts, on=("doc_id_b",)
        )
    else:
        raise ValueError(f"unknown text_mode {cfg.text_mode!r}")

    def _score():
        # adaptive batch size: cfg.score_batch_size is the dispatch-amortizing
        # ceiling, but when the (already materialized) pair count is small
        # enough that it yields under 2 batches per CPU the stage tail-lags —
        # pack at least 2 even waves instead.  2048 floor: kernel dispatch
        # stops amortizing below that (CLAUDE.md measured economics).
        bs = cfg.score_batch_size
        try:
            n_pairs = pairs_ds.count()
            workers = int(ray.cluster_resources().get("CPU", 8))
            if cfg.score_mode == "actors":
                # the actor pool is capped at score_concurrency — sizing
                # waves by total CPUs would undersize batches (more, smaller
                # waves than the pool can overlap)
                conc = cfg.score_concurrency
                cap = max(conc) if isinstance(conc, tuple) else conc
                workers = min(workers, int(cap))
            bs = max(2048, min(bs, -(-n_pairs // (2 * max(1, workers)))))
        except Exception:
            pass
        if cfg.score_mode == "actors":
            return join_input.map_batches(
                PairScorer,
                fn_constructor_kwargs=scorer_kwargs,
                batch_format="pyarrow",
                batch_size=bs,
                concurrency=cfg.score_concurrency,
            )
        # stateless tasks in warm workers: same kernel, no actor spin-up;
        # the broadcast ref resolves plasma-locally once per worker
        from sassy_ray.stages.scoring import score_pairs_batch

        return join_input.map_batches(
            score_pairs_batch,
            fn_kwargs=scorer_kwargs,
            batch_format="pyarrow",
            batch_size=bs,
        )

    ck = _ckpt(checkpoint_dir, "scored", fp)
    scored, resumed = _maybe(_score, ck, stats, "scored")
    if resumed:
        stats["resumed_stages"].append("scored")

    # --- edges + clustering ----------------------------------------------
    edges = scored.map_batches(
        lambda b: b.filter(b.column("is_match")), batch_format="pyarrow"
    ).select_columns(["doc_id_a", "doc_id_b"])
    # project off the MATERIALIZED texts_ds, not docs_ds: the latter is the
    # lazy input prefix (repartition over the wide spans payload) and
    # consuming it again here re-executes that whole prefix (the
    # consumed-twice trap) just to read 8-byte ids
    nodes = texts_ds.select_columns(["doc_id"])

    ck = _ckpt(checkpoint_dir, "clusters", fp)
    clusters, resumed = _maybe(
        lambda: connected_components(
            edges,
            nodes,
            max_iters=cfg.max_cc_iters,
            driver_edge_limit=cfg.cc_driver_edge_limit,
        ),
        ck,
        stats,
        "clusters",
    )
    if resumed:
        stats["resumed_stages"].append("clusters")

    def labeled_docs(mode: str = "auto", label_dir: str | None = None, num_shards: int = 32):
        """Docs with cluster_id attached and the spans column passed through
        BYTE-IDENTICALLY (the per-row invariant: kind, text, media_ref,
        order preserved — BASELINE.json input_hint).  No shuffle ever
        touches the wide rows (Ray's hash join cannot carry nested
        list<struct> payloads, and shuffling them would be wasteful anyway).

        Two attach paths:
        * 'sharded' (the 10^12-doc path; default whenever the pipeline has a
          checkpoint_dir or a label_dir is given): the labels are written
          hash-partitioned by doc_id NEXT TO the doc shards
          (write_label_shards, idempotent) and each batch attaches from the
          worker-cached shards its ids hash into — no driver-side concat of
          the label set, no ray.put broadcast.
        * 'broadcast': the (doc_id, cluster_id) table ships through plasma
          once and every batch attaches by vectorized index_in — right when
          the label set fits a worker (tests/bench scale)."""
        if mode == "auto":
            mode = "sharded" if (label_dir or checkpoint_dir) else "broadcast"
        if mode == "sharded":
            if label_dir is None:
                assert checkpoint_dir, "sharded attach needs label_dir or checkpoint_dir"
                label_dir = os.path.join(checkpoint_dir, "label_shards")
            write_label_shards(clusters, label_dir, num_shards, fingerprint=fp)
            return attach_labels_sharded(docs_ds, label_dir, num_shards)

        lab_tbl = pa.concat_tables(
            clusters.iter_batches(batch_size=65536, batch_format="pyarrow")
        ).combine_chunks()
        lab_ref = ray.put(lab_tbl)

        def attach(batch: pa.Table) -> pa.Table:
            lt = ray.get(lab_ref)
            taken = pc.take(
                lt.column("cluster_id").combine_chunks(),
                pc.index_in(batch.column("doc_id"), value_set=lt.column("doc_id").combine_chunks()),
            )
            # unlabeled docs are their own cluster (lut.get(d, d) semantics)
            label = pc.coalesce(taken, pc.cast(batch.column("doc_id"), pa.string()))
            return batch.append_column("cluster_id", label)

        return docs_ds.map_batches(attach, batch_format="pyarrow")

    return {
        "clusters": clusters,
        "scored": scored,
        "pairs": pairs_ds,
        "stats": stats,
        "labeled_docs": labeled_docs,
    }


_FNV_OFF = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)
_U64_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def hash_doc_ids_mod(ids, mod: int) -> np.ndarray:
    """Vectorized FNV-1a over a string column, mod ``mod`` — the shard key
    for partition-aligned label placement.  Stable across processes and
    engines; no per-row Python (the per-character loop runs max-id-length
    times over the whole column)."""
    arr = ids.combine_chunks() if isinstance(ids, pa.ChunkedArray) else ids
    arr = arr.cast(pa.string())
    n = len(arr)
    if n == 0:
        return np.zeros(0, np.int64)
    if arr.offset != 0 or arr.null_count:
        arr = pa.concat_arrays([pa.array(arr.to_pylist(), pa.string())])
    off_dt = np.int64 if pa.types.is_large_string(arr.type) else np.int32
    bufs = arr.buffers()
    off = np.frombuffer(bufs[1], off_dt, n + 1).astype(np.int64)
    data = np.frombuffer(bufs[2], np.uint8, int(off[-1]))
    lens = np.diff(off)
    ml = int(lens.max()) if n else 0
    mat = np.zeros((n, max(1, ml)), np.uint8)
    rows = np.repeat(np.arange(n), lens)
    cols = np.arange(len(data)) - np.repeat(off[:-1], lens)
    mat[rows, cols] = data
    h = np.full(n, _FNV_OFF, np.uint64)
    for j in range(ml):
        hj = ((h ^ mat[:, j]) * _FNV_PRIME) & _U64_MASK
        np.copyto(h, hj, where=j < lens)
    return (h % np.uint64(mod)).astype(np.int64)


def write_label_shards(
    clusters_ds, out_dir: str, num_shards: int = 32, fingerprint: str = ""
) -> None:
    """Write (doc_id, cluster_id) hash-partitioned by doc_id — hive dirs
    ``label_shard=N`` NEXT TO the doc shards (the stages/checkpoint.py
    layout).  A distributed write: each map task appends the shard key
    vectorized and Ray writes partitioned parquet; nothing is concatenated
    on the driver.  Idempotent: a manifest matching BOTH the shard count and
    the config+input ``fingerprint`` (same StageCheckpoint semantics) skips
    the rewrite (kill-and-resume); changed docs/config rewrite."""
    import json

    man_path = os.path.join(out_dir, "manifest.json")
    try:
        with open(man_path) as f:
            man = json.load(f)
        if (
            man.get("complete")
            and man.get("num_shards") == num_shards
            and man.get("fingerprint", "") == fingerprint
        ):
            return
    except (OSError, json.JSONDecodeError):
        pass
    import shutil

    tmp = out_dir + ".tmp"
    shutil.rmtree(tmp, ignore_errors=True)

    def add_shard(t: pa.Table) -> pa.Table:
        return t.append_column(
            "label_shard", pa.array(hash_doc_ids_mod(t.column("doc_id"), num_shards))
        )

    clusters_ds.map_batches(add_shard, batch_format="pyarrow").write_parquet(
        tmp, partition_cols=["label_shard"]
    )
    with open(os.path.join(tmp, "manifest.json"), "w") as f:
        json.dump(
            {"complete": True, "num_shards": num_shards, "fingerprint": fingerprint}, f
        )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.replace(tmp, out_dir)


# per-worker shard cache: each worker process loads a label shard at most
# once; when doc shards are hash-aligned with label shards (the 10^12
# layout) a task touches exactly one entry.  Keyed by the manifest's
# (fingerprint, mtime) token so a same-session rewrite of the shards
# invalidates warm workers' cached tables.
_LABEL_SHARD_CACHE: dict = {}


def _label_dir_token(label_dir: str) -> tuple:
    import json

    man_path = os.path.join(label_dir, "manifest.json")
    try:
        with open(man_path) as f:
            man = json.load(f)
        return (man.get("fingerprint", ""), os.stat(man_path).st_mtime_ns)
    except (OSError, json.JSONDecodeError):
        return ("", 0)


def _load_label_shard(label_dir: str, shard: int, token: tuple = ("", 0)):
    key = (label_dir, shard, token)
    hit = _LABEL_SHARD_CACHE.get(key)
    if hit is None:
        import pyarrow.parquet as pq

        path = os.path.join(label_dir, f"label_shard={shard}")
        if os.path.isdir(path):
            hit = pq.read_table(path, columns=["doc_id", "cluster_id"])
        else:  # shard received no labels
            hit = pa.table(
                {"doc_id": pa.array([], pa.string()), "cluster_id": pa.array([], pa.string())}
            )
        hit = pa.table(
            {
                "doc_id": pc.cast(hit.column("doc_id"), pa.string()).combine_chunks(),
                "cluster_id": pc.cast(hit.column("cluster_id"), pa.string()).combine_chunks(),
            }
        )
        _LABEL_SHARD_CACHE[key] = hit
    return hit


def attach_labels_sharded(docs_ds, label_dir: str, num_shards: int = 32):
    """Attach cluster_id to docs from hash-partitioned label shards: per
    batch, load (worker-cached) only the shards its doc_ids hash into and
    merge with one vectorized index_in.  No driver-side concat of the label
    set, no ray.put of the labels, spans pass through untouched."""

    token = _label_dir_token(label_dir)  # driver-read once; closed over

    def attach(batch: pa.Table) -> pa.Table:
        shard = hash_doc_ids_mod(batch.column("doc_id"), num_shards)
        tables = [_load_label_shard(label_dir, int(s), token) for s in np.unique(shard)]
        lookup = (
            pa.concat_tables(tables) if tables else _load_label_shard(label_dir, 0, token)
        )
        ids = pc.cast(batch.column("doc_id"), pa.string())
        taken = pc.take(
            lookup.column("cluster_id").combine_chunks(),
            pc.index_in(ids, value_set=lookup.column("doc_id").combine_chunks()),
        )
        label = pc.coalesce(taken, ids)  # unlabeled docs are their own cluster
        return batch.append_column("cluster_id", label)

    return docs_ds.map_batches(attach, batch_format="pyarrow")


class DSU:
    """Driver-side union-find (for exhaustive truth + small edge sets)."""

    def __init__(self, items):
        self.parent = {x: x for x in items}

    def find(self, x):
        p = self.parent
        while p[x] != x:
            p[x] = p[p[x]]
            x = p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            self.parent[rb] = ra


def exhaustive_truth(docs_table: pa.Table, score: ScoreConfig, chunk: int = 4096) -> pa.Table:
    """Reference clusters: score ALL doc pairs with the exact kernel (no
    blocking) and take the transitive closure.  This is the oracle the
    blocked+distributed pipeline must reproduce (north rule: F1>=0.99 against
    the reference's clusters) — single-process, test/bench scale only."""
    from sassy_ray.kernel.myers import batch_best_costs
    from sassy_ray.kernel.profiles import get_profile
    from sassy_ray.sources.docs import concat_spans

    ids = docs_table.column("doc_id").to_pylist()
    texts = [t.encode() for t in concat_spans(docs_table.column("spans")).to_pylist()]
    if score.lowercase:
        texts = [t.lower() for t in texts]
    prof = get_profile(score.profile)
    n = len(ids)
    dsu = DSU(ids)
    pairs = [(i, j) for i in range(n) for j in range(i + 1, n)]
    for s in range(0, len(pairs), chunk):
        part = pairs[s : s + chunk]
        pats, txts, kp = [], [], []
        for i, j in part:
            a, b = texts[i], texts[j]
            if len(a) > len(b):
                a, b = b, a
            pats.append(a)
            txts.append(b)
            kp.append(max(score.k_min, int(score.rel_k * len(a))))
        kmax = max(kp)
        cost = batch_best_costs(pats, txts, prof, kmax)
        if score.rc and prof.supports_rc:
            rc = batch_best_costs([prof.reverse_complement(p) for p in pats], txts, prof, kmax)
            cost = np.minimum(cost, rc)
        for (i, j), c, kk in zip(part, cost.tolist(), kp):
            if c <= kk:
                dsu.union(ids[i], ids[j])
    return pa.table(
        {
            "doc_id": pa.array(ids),
            "cluster_id": pa.array([dsu.find(d) for d in ids]),
        }
    )


def evaluate_clusters(clusters_ds, truth_table: pa.Table) -> dict:
    """Pairwise precision/recall/F1 of predicted clusters vs ground truth."""
    pred = clusters_ds.to_pandas()
    true = truth_table.to_pandas()

    def pairs_of(df, id_col, cl_col):
        out = set()
        for _cl, grp in df.groupby(cl_col):
            ids = sorted(grp[id_col])
            for i in range(len(ids)):
                for j in range(i + 1, len(ids)):
                    out.add((ids[i], ids[j]))
        return out

    p_pred = pairs_of(pred, "doc_id", "cluster_id")
    p_true = pairs_of(true, "doc_id", "cluster_id")
    tp = len(p_pred & p_true)
    prec = tp / len(p_pred) if p_pred else 1.0
    rec = tp / len(p_true) if p_true else 1.0
    f1 = 2 * prec * rec / (prec + rec) if prec + rec else 0.0
    return {
        "precision": prec,
        "recall": rec,
        "f1": f1,
        "pred_pairs": len(p_pred),
        "true_pairs": len(p_true),
        "tp": tp,
    }
