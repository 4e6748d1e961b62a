"""Kernel micro-bench: single-core scan throughput (text-tiling path) and
ER pair-scoring throughput.  No Ray — pure kernel numbers, comparable to
BASELINE.md's 'kernel scan throughput' row.

Usage: python tools/kernel_bench.py [scan|pairs|multi|tiled|demux|pairs_long|all]
"""

from __future__ import annotations

import os
import random
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def mk_dna(n: int, seed: int) -> bytes:
    rng = np.random.default_rng(seed)
    return rng.choice(np.frombuffer(b"ACGT", dtype=np.uint8), size=n).tobytes()


def bench_scan(n_texts=64, text_len=100_000, m=23, k=3, reps=3):
    from sassy_ray.kernel.search import Searcher, chunked_search

    texts = [mk_dna(text_len, 100 + i) for i in range(n_texts)]
    pat = mk_dna(m, 7)
    s = Searcher("dna", rc=True)
    chunked_search(s, pat, texts[:2], k)  # warm
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        res = chunked_search(s, pat, texts, k)
        best = min(best, time.time() - t0)
    total = n_texts * text_len
    nm = sum(len(r) for r in res)
    print(f"scan: {total/1e6:.1f} MB in {best:.2f}s = {total/best/1e6:.1f} MB/s/core ({nm} matches)")


def bench_multi(n_texts=16, text_len=100_000, n_pats=32, m=23, k=3, reps=3):
    """Multi-pattern scan (the prefilter target workload)."""
    from sassy_ray.kernel.search import Searcher
    from sassy_ray.pipelines.grep import GrepConfig, grep_matches_batch
    import pyarrow as pa

    texts = [mk_dna(text_len, 200 + i) for i in range(n_texts)]
    pats = [(f"p{i}", mk_dna(m, 300 + i)) for i in range(n_pats)]
    cfg = GrepConfig(patterns=pats, k=k, alphabet="dna", rc=True)
    batch = pa.table({"doc_id": [str(i) for i in range(n_texts)],
                      "text": [t.decode() for t in texts]})
    grep_matches_batch(batch.slice(0, 2), cfg)  # warm
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        out = grep_matches_batch(batch, cfg)
        best = min(best, time.time() - t0)
    total = n_texts * text_len * n_pats  # pattern-scan bytes (sassy convention)
    print(f"multi: {n_pats} pats x {n_texts*text_len/1e6:.1f} MB in {best:.2f}s = "
          f"{total/best/1e6:.1f} MB/s/core pattern-scan ({out.num_rows} matches)")


def bench_tiled(n_texts=4, text_len=100_000, n_pats=312, m=23, k=3, reps=5):
    """CRISPR-like cartesian shape: many <=32-char patterns x few long
    texts — the pattern-tiled 64/32-job group kernels (the reference v2's
    transposed layout).  Kernel-only (NativeBatch.run_minima), one strand."""
    from sassy_ray.kernel import native
    from sassy_ray.kernel.profiles import get_profile

    if not native.available():
        print("tiled: native kernel unavailable")
        return
    prof = get_profile("dna")
    pats = [mk_dna(m, 400 + i) for i in range(n_pats)]
    texts = [mk_dna(text_len, 500 + i) for i in range(n_texts)]
    nb = native.NativeBatch(pats, texts, prof, k)
    pat_ids = nb.pat_row if nb.pat_row is not None else np.arange(n_pats, dtype=np.int64)
    job_p = np.ascontiguousarray(np.tile(pat_ids, n_texts))
    job_t = np.ascontiguousarray(np.repeat(np.arange(n_texts, dtype=np.int64), n_pats))
    nb.run_minima(False, job_p[:n_pats], job_t[:n_pats], n_pats)  # warm
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        r = nb.run_minima(False, job_p, job_t, len(job_p))
        best = min(best, time.time() - t0)
    total = n_texts * text_len * n_pats
    print(f"tiled: {n_pats} pats x {n_texts*text_len/1e6:.1f} MB in {best:.2f}s = "
          f"{total/best/1e6:.1f} MB/s/core pattern-scan ({len(r[0])} hits)")


def bench_demux(n_reads=2000, read_len=400, n_bars=96, m=24, k=3, reps=3):
    """Barcode-demux shape (the reference's flagship v2 workload:
    96 x 24bp barcodes over short reads, k=3 — nanopore_results.csv).
    Short texts, many patterns: the transposed packed path's home turf."""
    from sassy_ray.kernel.search import Searcher

    rng = np.random.default_rng(5)
    reads = [mk_dna(read_len, 700 + i) for i in range(n_reads)]
    bars = [mk_dna(m, 800 + i) for i in range(n_bars)]
    # plant each barcode in ~2 reads so the match path is exercised
    planted = []
    for bi, b in enumerate(bars):
        for r in rng.choice(n_reads, size=2, replace=False):
            off = int(rng.integers(0, read_len - m))
            reads[r] = reads[r][:off] + b + reads[r][off + m :]
    s = Searcher("dna", rc=True)
    s.search_many(bars, reads[:64], k)  # warm
    best = 1e9
    nm = 0
    for _ in range(reps):
        t0 = time.time()
        ms = s.search_many(bars, reads, k)
        best = min(best, time.time() - t0)
        nm = len(ms)
    total = n_reads * read_len * n_bars
    print(f"demux: {n_bars} bars x {n_reads} reads ({read_len}bp, k={k}) in {best:.2f}s = "
          f"{total/best/1e6:.1f} MB/s/core pattern-scan ({nm} matches)")


def bench_pairs(n_pairs=4096, tlen=300, k=17, reps=3, label="pairs"):
    from sassy_ray.kernel.myers import batch_best_costs
    from sassy_ray.kernel.profiles import get_profile

    rng = random.Random(1)
    prof = get_profile("ascii_ci")
    pats, txts = [], []
    for i in range(n_pairs):
        base = mk_dna(tlen, 500 + i)
        pats.append(base)
        txts.append(base[: tlen // 2] + mk_dna(tlen // 2, 900 + i))
    batch_best_costs(pats[:64], txts[:64], prof, k)
    best = 1e9
    for _ in range(reps):
        t0 = time.time()
        c = batch_best_costs(pats, txts, prof, k)
        best = min(best, time.time() - t0)
    print(f"{label}: {n_pairs} pairs ({tlen} ch, k={k}) in {best:.2f}s = {n_pairs/best:.0f} pairs/s/core")


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("scan", "all"):
        bench_scan()
    if which in ("multi", "all"):
        bench_multi()
    if which in ("tiled", "all"):
        bench_tiled()
    if which in ("demux", "all"):
        bench_demux()
    if which in ("pairs", "all"):
        bench_pairs()
    if which in ("pairs_long", "all"):
        bench_pairs(tlen=600, k=21, label="pairs_long")
