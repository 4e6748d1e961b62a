"""Measure the DISTRIBUTED tails of the ER machinery (the 10^12-doc paths).

At sandbox scale both paths are normally cold: ``make_pairs_dataset`` takes
the single-task fast path below ``single_task_rows_limit`` block rows and
``connected_components`` runs driver union-find below ``driver_edge_limit``
edges.  This bench zeroes the thresholds so the shuffle paths run hot on a
multi-million-row synthetic input, and reports measured rows/s for each —
the numbers BASELINE.md cites for the scale route.

Usage: python tools/tail_bench.py [--rows 4000000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pyarrow as pa


def synth_block_rows(n_rows: int, seed: int = 11) -> pa.Table:
    """(block_key, doc_id) rows with a realistic skew: ~70% of docs are
    singletons in their block, duplicate clusters of size 2-8 share block
    keys, plus a handful of hot keys near the salt cap."""
    rng = np.random.default_rng(seed)
    n_docs = n_rows // 2  # each doc lands in ~2 blocks
    doc_idx = rng.integers(0, n_docs, size=n_rows)
    # cluster structure: docs with the same doc_idx // span share block keys
    span = 4
    base_key = (doc_idx // span).astype(np.int64)
    # 8 bands' worth of key space so co-blocking is partial, like real LSH
    band = rng.integers(0, 8, size=n_rows)
    block_key = base_key * 8 + band
    # hot keys: route 0.1% of rows into 16 shared buckets
    hot = rng.random(n_rows) < 0.001
    block_key[hot] = rng.integers(0, 16, size=int(hot.sum()))
    doc_ids = np.char.add("d", doc_idx.astype("U12"))
    return pa.table(
        {
            "block_key": pa.array(block_key, pa.int64()),
            "doc_id": pa.array(doc_ids, pa.string()),
        }
    )


def synth_demux_reads(
    n_reads: int, n_barcodes: int = 96, bc_len: int = 24, read_len: int = 400, seed: int = 3
):
    """Vectorized demux bench corpus (bench-only; the correctness corpus is
    the seeded per-read synthesizer in sources/synth.py): fixed-length random
    DNA reads with one barcode planted at offset 4 with <= 3 substitutions."""
    rng = np.random.default_rng(seed)
    dna = np.frombuffer(b"ACGT", np.uint8)
    mat = dna[rng.integers(0, 4, size=(n_reads, read_len))]
    bcs = dna[rng.integers(0, 4, size=(n_barcodes, bc_len))]
    which = rng.integers(0, n_barcodes, size=n_reads)
    planted = bcs[which].copy()
    n_edit = rng.integers(0, 4, size=n_reads)
    for e in range(1, 4):
        rows = np.nonzero(n_edit >= e)[0]
        planted[rows, rng.integers(0, bc_len, size=len(rows))] = dna[
            rng.integers(0, 4, size=len(rows))
        ]
    mat[:, 4 : 4 + bc_len] = planted
    offs = np.arange(0, (n_reads + 1) * read_len, read_len, dtype=np.int32)
    texts = pa.StringArray.from_buffers(
        n_reads, pa.py_buffer(offs.tobytes()), pa.py_buffer(mat.tobytes())
    )
    ids = np.char.add("r", np.arange(n_reads).astype("U9"))
    reads = pa.table({"read_id": pa.array(ids, pa.string()), "text": texts})
    return reads, [(f"bc-{i:03d}", bcs[i].tobytes()) for i in range(n_barcodes)]


def synth_grep_docs(n_docs: int, doc_len: int, pat_len: int = 23, seed: int = 7):
    """Long-text grep bench corpus: random DNA docs with the query pattern
    planted (<= 2 substitutions) at a random offset in ~10% of docs — the
    reference's flagship v1 shape (one short query scanned over long texts,
    lib.rs:259-263 normalization: text MB / sec)."""
    rng = np.random.default_rng(seed)
    dna = np.frombuffer(b"ACGT", np.uint8)
    # uint8 draws: the default int64 stream spent ~10 min generating the
    # 3.2 GB corpus (25.6 GB of random words); this is ~seconds
    mat = dna[rng.integers(0, 4, size=(n_docs, doc_len), dtype=np.uint8)]
    pat = dna[rng.integers(0, 4, size=pat_len, dtype=np.uint8)]
    hit_rows = np.nonzero(rng.random(n_docs) < 0.10)[0]
    offs_hit = rng.integers(0, doc_len - pat_len, size=len(hit_rows))
    planted = np.broadcast_to(pat, (len(hit_rows), pat_len)).copy()
    n_sub = rng.integers(0, 3, size=len(hit_rows))
    for e in range(1, 3):
        rows = np.nonzero(n_sub >= e)[0]
        planted[rows, rng.integers(0, pat_len, size=len(rows))] = dna[
            rng.integers(0, 4, size=len(rows))
        ]
    for j, (r, o) in enumerate(zip(hit_rows, offs_hit)):
        mat[r, o : o + pat_len] = planted[j]
    offs = np.arange(0, (n_docs + 1) * doc_len, doc_len, dtype=np.int64)
    texts = pa.LargeStringArray.from_buffers(
        n_docs, pa.py_buffer(offs.tobytes()), pa.py_buffer(mat.tobytes())
    )
    ids = np.char.add("d", np.arange(n_docs).astype("U9"))
    return (
        pa.table({"doc_id": pa.array(ids, pa.string()), "text": texts}),
        pat.tobytes(),
    )


def synth_window_tables(out_dir: str, n_groups: int, rows_per_group: int, seed: int = 5) -> None:
    """events + orders parquet with ``n_groups`` distinct users/customers —
    the regime where a per-group map_groups dies and the sort+block-pass
    window implementations must hold."""
    import pyarrow.parquet as pq

    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(seed)
    n = n_groups * rows_per_group
    user = np.repeat(np.arange(n_groups, dtype=np.int64), rows_per_group)
    base = np.int64(1_600_000_000_000_000)  # epoch us
    ts = base + rng.integers(0, 90 * 86_400_000_000, size=n)
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(np.arange(n, dtype=np.int64)),
                "ts": pc_cast_ts(ts),
                "user_id": pa.array(user),
            }
        ),
        os.path.join(out_dir, "events.parquet"),
        row_group_size=1 << 20,
    )
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(np.arange(n, dtype=np.int64)),
                "o_custkey": pa.array(user),
                "o_orderdate": pc_cast_ts(base + rng.integers(0, 90, size=n) * 86_400_000_000),
                "o_totalprice": pa.array(rng.uniform(10, 500000, size=n)),
            }
        ),
        os.path.join(out_dir, "orders.parquet"),
        row_group_size=1 << 20,
    )


def pc_cast_ts(us: np.ndarray) -> pa.Array:
    return pa.array(us, pa.int64()).cast(pa.timestamp("us"))


def run_window_tails(n_groups: int, rows_per_group: int) -> dict:
    """rows/s of events_sessionize + window_running_revenue at >=1M groups."""
    from sassy_ray.pipelines import queries as Q

    out_dir = f"/tmp/sassy_window_bench_{n_groups}"
    if not os.path.exists(os.path.join(out_dir, "orders.parquet")):
        synth_window_tables(out_dir, n_groups, rows_per_group)
    n = n_groups * rows_per_group
    res = {}
    for name in ("events_sessionize", "window_running_revenue"):
        t0 = time.time()
        out = Q.QUERIES[name](out_dir)
        nrows = out.num_rows
        dt = time.time() - t0
        res[f"{name}_sec"] = round(dt, 2)
        res[f"{name}_rows_per_s"] = round(n / dt)
        print(
            f"{name}: {n} input rows / {n_groups} groups -> {nrows} rows "
            f"in {dt:.1f}s ({n / dt / 1e3:.0f}k rows/s)",
            file=sys.stderr,
        )
    return res


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument(
        "--windows",
        action="store_true",
        help="bench the sessionize/window sort+block-pass tails at 1M+ groups",
    )
    ap.add_argument("--groups", type=int, default=1_200_000)
    ap.add_argument("--rows-per-group", type=int, default=4)
    ap.add_argument(
        "--demux",
        action="store_true",
        help="bench the distributed barcode-demux pipeline (96x24bp, k=3)",
    )
    ap.add_argument("--reads", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=3, help="demux edit threshold")
    ap.add_argument(
        "--neardup",
        action="store_true",
        help="bench embedding_neardup_pairs at --vectors scale; reports the "
        "max rows any single pair task held (the 100-TB memory bound)",
    )
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=32)
    ap.add_argument(
        "--crispr",
        action="store_true",
        help="bench the CRISPR off-target pipeline at the reference eval "
        "shape (312 x 23bp guides, shared exact PAM, k=--k)",
    )
    ap.add_argument(
        "--grep",
        action="store_true",
        help="bench the distributed single-pattern long-text grep pipeline "
        "(the reference's flagship v1 text-tiling shape)",
    )
    ap.add_argument("--docs", type=int, default=2000)
    ap.add_argument("--doc-len", type=int, default=100_000)
    ap.add_argument("--pat-len", type=int, default=23)
    ap.add_argument(
        "--unpacked",
        action="store_true",
        help="A/B knob: disable text-lane packing in every worker "
        "(SASSY_PACKED_ROWS_MIN_B) to measure the unpacked scan loop",
    )
    args = ap.parse_args()

    if args.unpacked:
        # must be in the environment BEFORE ray.init so the raylet's workers
        # inherit it (kernel/myers reads it at import)
        os.environ["SASSY_PACKED_ROWS_MIN_B"] = str(10**9)

    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=args.cpus,
            include_dashboard=False,
            logging_level="ERROR",
        )
    if args.windows:
        res = run_window_tails(args.groups, args.rows_per_group)
        print(
            json.dumps(
                {
                    "metric": "window_tails",
                    "groups": args.groups,
                    "rows": args.groups * args.rows_per_group,
                    "num_cpus": args.cpus,
                    **res,
                }
            )
        )
        ray.shutdown()
        return

    import ray.data as rd

    if args.demux:
        from sassy_ray.pipelines.demux import DemuxConfig, run_demux

        reads, barcodes = synth_demux_reads(args.reads)
        ds = rd.from_arrow(reads).repartition(max(8, args.cpus)).materialize()
        t0 = time.time()
        out = run_demux(ds, DemuxConfig(barcodes, k=args.k)).materialize()
        dt = time.time() - t0
        n_assigned = out.count()
        mb = args.reads * 400 / 1e6
        n_bc = len(barcodes)
        print(
            f"demux(distributed): {args.reads} reads x {n_bc} barcodes (k={args.k}) in "
            f"{dt:.1f}s = {args.reads / dt / 1e3:.1f}k reads/s, "
            f"{mb * n_bc / dt:.0f} MB/s pattern-scan aggregate "
            f"(kernel_bench normalization: text MB x patterns), {n_assigned} assigned",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": "demux_distributed",
                    "k": args.k,
                    "reads": args.reads,
                    "num_cpus": args.cpus,
                    "sec": round(dt, 2),
                    "reads_per_s": round(args.reads / dt),
                    "text_mb_per_s": round(mb / dt, 1),
                    "pattern_scan_mb_per_s": round(mb * n_bc / dt, 1),
                    "assigned": int(n_assigned),
                }
            )
        )
        ray.shutdown()
        return

    if args.neardup:
        import sassy_ray.functions.ann as A

        rng = np.random.default_rng(17)
        n, dim = args.vectors, args.dim
        M = rng.normal(size=(n, dim)).astype(np.float64)
        # plant ~1000 near-dup pairs (vector i copied to i + n//2 with noise)
        n_plant = 1000
        M[n // 2 : n // 2 + n_plant] = M[:n_plant] + rng.normal(scale=1e-3, size=(n_plant, dim))
        tbl = pa.table(
            {
                "vec_id": pa.array(np.arange(n), pa.int64()),
                "embedding": pa.array(M.tolist(), pa.list_(pa.float64())),
            }
        )
        ds = rd.from_arrow(tbl).repartition(max(8, args.cpus)).materialize()
        t0 = time.time()
        res = A.embedding_neardup_pairs(ds, tau=0.99, n_rows=n)
        pairs = res["pairs_fn"]()
        dt = time.time() - t0
        # replicate the salt assignment driver-side to report the true max
        # rows any single map_groups task held (the scale guarantee)
        n_cent = min(65536, max(16, -(-n // 4096)))
        C = A.coarse_centroids(ds, n_cent, 42, "vec_id")
        Mn = M / np.maximum(np.linalg.norm(M, axis=1, keepdims=True), 1e-12)
        S = Mn @ C.T
        bkt2 = np.argpartition(-S, 1, axis=1)[:, :2]  # top-2 multi-assign
        counts = np.bincount(bkt2[:, 0], minlength=n_cent)
        sh = A._simhash_codes(Mn, seed=42 + 23)
        counts2d = np.zeros((n_cent, 1 << A._SALT_BITS), dtype=np.int64)
        np.add.at(
            counts2d.reshape(-1),
            ((bkt2.astype(np.int64) << A._SALT_BITS) + sh[:, None]).reshape(-1),
            1,
        )
        b_arr, nb2_flat, max_nb2 = A._plan_salt(counts2d, 256)
        gkey = A._gkey_rows(
            bkt2.reshape(-1),
            np.repeat(sh, 2),
            np.repeat(np.arange(n, dtype=np.int64), 2),
            b_arr,
            nb2_flat,
            max_nb2,
        )
        max_task_rows = int(np.bincount(gkey - gkey.min()).max())
        got = set(zip(pairs["vec_id_a"].to_pylist(), pairs["vec_id_b"].to_pylist()))
        planted = {(i, i + n // 2) for i in range(n_plant)}
        recall = len(got & planted) / n_plant
        print(
            f"neardup(salted): {n} vectors dim={dim} -> {pairs.num_rows} pairs >= tau "
            f"in {dt:.1f}s ({n / dt / 1e3:.0f}k vec/s); n_centroids={n_cent}, "
            f"max rows in any pair task = {max_task_rows} (bucket max would be "
            f"{int(counts.max())} unsalted); planted-pair recall {recall:.2f}",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": "embedding_neardup_tail",
                    "vectors": n,
                    "dim": dim,
                    "num_cpus": args.cpus,
                    "sec": round(dt, 2),
                    "vectors_per_s": round(n / dt),
                    "pairs_out": int(pairs.num_rows),
                    "n_centroids": n_cent,
                    "max_task_rows": max_task_rows,
                    "max_bucket_rows_unsalted": int(counts.max()),
                    "planted_recall": round(recall, 3),
                }
            )
        )
        ray.shutdown()
        return

    if args.crispr:
        # the reference's flagship off-target eval shape
        # (evals/src/sassy2/output-xeon-256/off_target_results.csv: 312 x
        # 23bp guides over the 3.1 GB CHM13 genome, k=3): shared exact PAM,
        # IUPAC profile, rc, endpoint PAM filter (allow_pam_edits=False is
        # the reference CLI default)
        from sassy_ray.pipelines.crispr import CrisprConfig, run_crispr

        docs_tbl, _ = synth_grep_docs(args.docs, args.doc_len, args.pat_len)
        rng = np.random.default_rng(11)
        dna = np.frombuffer(b"ACGT", np.uint8)
        guides = [
            dna[rng.integers(0, 4, size=20, dtype=np.uint8)].tobytes() + b"AGG"
            for _ in range(312)
        ]
        # plant mutated guide sites in ~2% of docs so matches exist
        texts = docs_tbl.column("text").to_pylist()
        hit_rows = rng.integers(0, len(texts), size=max(1, len(texts) // 50))
        for r in hit_rows:
            g = bytearray(guides[int(rng.integers(0, len(guides)))])
            for _ in range(int(rng.integers(0, 3))):
                g[int(rng.integers(0, 20))] = dna[int(rng.integers(0, 4))]
            o = int(rng.integers(0, len(texts[r]) - len(g)))
            t = texts[r]
            texts[r] = t[:o] + bytes(g).decode() + t[o + len(g):]
        docs_tbl = docs_tbl.set_column(
            docs_tbl.column_names.index("text"), "text", pa.array(texts)
        )
        ds = rd.from_arrow(docs_tbl).repartition(max(8, args.cpus)).materialize()
        cfg = CrisprConfig(guides, k=args.k, pam_length=3, allow_pam_edits=False)
        t0 = time.time()
        matches, n_matches = run_crispr(ds, cfg)
        dt = time.time() - t0
        mb = args.docs * args.doc_len / 1e6
        print(
            json.dumps(
                {
                    "metric": "crispr_distributed",
                    "guides": len(guides),
                    "docs": args.docs,
                    "doc_len": args.doc_len,
                    "k": args.k,
                    "num_cpus": args.cpus,
                    "sec": round(dt, 2),
                    "text_mb_per_s": round(mb / dt, 1),
                    "pattern_scan_mb_per_s": round(mb * len(guides) / dt, 1),
                    "matches": int(n_matches),
                }
            )
        )
        ray.shutdown()
        return

    if args.grep:
        from sassy_ray.pipelines.grep import GrepConfig, run_grep

        docs_tbl, pat = synth_grep_docs(args.docs, args.doc_len, args.pat_len)
        # ~4 waves of batches per CPU so the scan stage stays even; each
        # batch still clears the text-lane packing crossover
        # (16 docs x 100 kb / 512-char chunk rows ~ 3.1k rows/strand)
        bs = max(4, args.docs // (args.cpus * 4))
        ds = rd.from_arrow(docs_tbl).repartition(max(8, args.cpus)).materialize()
        t0 = time.time()
        res = run_grep(ds, GrepConfig([("p0", pat)], k=3), batch_size=bs)
        n_matches = res["matches"].count()
        dt = time.time() - t0
        mb = args.docs * args.doc_len / 1e6
        mode = "unpacked" if args.unpacked else "packed"
        print(
            f"grep(distributed,{mode}): 1x{args.pat_len}bp over {args.docs} docs x "
            f"{args.doc_len} bp ({mb:.0f} MB) k=3 rc in {dt:.1f}s = "
            f"{mb / dt:.0f} MB/s aggregate ({mb / dt / args.cpus * 1e3:.0f} kB/s/core "
            f"x {args.cpus}), {n_matches} matches",
            file=sys.stderr,
        )
        print(
            json.dumps(
                {
                    "metric": "grep_distributed",
                    "mode": mode,
                    "docs": args.docs,
                    "doc_len": args.doc_len,
                    "pat_len": args.pat_len,
                    "num_cpus": args.cpus,
                    "sec": round(dt, 2),
                    "text_mb_per_s": round(mb / dt, 1),
                    "matches": int(n_matches),
                }
            )
        )
        ray.shutdown()
        return

    from sassy_ray.stages.clustering import connected_components
    from sassy_ray.stages.pairs import PairGenConfig, make_pairs_dataset

    tbl = synth_block_rows(args.rows)
    n_parts = max(8, args.cpus)
    block_rows = rd.from_arrow(tbl).repartition(n_parts).materialize()

    # --- distributed pair generation + partitioned exact dedup -------------
    cfg = PairGenConfig(single_task_rows_limit=0, single_task_dedup_limit=0)
    t0 = time.time()
    pairs = make_pairs_dataset(block_rows, cfg).materialize()
    t_pairs = time.time() - t0
    n_pairs = pairs.count()
    print(
        f"pairs(distributed): {args.rows} block rows -> {n_pairs} deduped pairs "
        f"in {t_pairs:.1f}s ({args.rows / t_pairs / 1e3:.0f}k block rows/s)",
        file=sys.stderr,
    )

    # --- distributed min-label propagation ---------------------------------
    nodes = block_rows.map_batches(
        lambda b: pa.table({"doc_id": pc_unique(b.column("doc_id"))}),
        batch_format="pyarrow",
    ).materialize()
    t0 = time.time()
    comps = connected_components(pairs, nodes, driver_edge_limit=0).materialize()
    t_cc = time.time() - t0
    n_labeled = comps.count()
    n_clusters = comps.map_batches(
        lambda b: pa.table({"c": pc_unique(b.column("cluster_id"))}),
        batch_format="pyarrow",
    ).count()  # upper bound across blocks; fine for a bench line
    print(
        f"label-prop(distributed): {n_pairs} edges / {n_labeled} node rows in "
        f"{t_cc:.1f}s ({n_pairs / t_cc / 1e3:.0f}k edges/s), ~{n_clusters} labels",
        file=sys.stderr,
    )

    print(
        json.dumps(
            {
                "metric": "distributed_tails",
                "rows": args.rows,
                "num_cpus": args.cpus,
                "pairs_out": int(n_pairs),
                "pairs_sec": round(t_pairs, 2),
                "pairs_block_rows_per_s": round(args.rows / t_pairs),
                "labelprop_sec": round(t_cc, 2),
                "labelprop_edges_per_s": round(n_pairs / t_cc),
            }
        )
    )
    ray.shutdown()


def pc_unique(arr):
    import pyarrow.compute as pc

    return pc.unique(arr.combine_chunks() if isinstance(arr, pa.ChunkedArray) else arr)


if __name__ == "__main__":
    main()
