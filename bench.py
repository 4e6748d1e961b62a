"""Benchmark harness (driver contract).

Runs the headline pipelines over $GRAFT_SF_DIR (default /root/testdata/sf0.1)
with ray.init(address="local", num_cpus=$RAY_GRAFT_CPUS or 32) and prints ONE
JSON line:

    {"metric": "...", "value": <headline sec>, "unit": "sec",
     "queries": {...}, "sf": ..., "num_cpus": N, ...}

``--scaling`` runs the headline in two fresh processes (8 and 32 CPUs by
default) on the same input and reports both throughputs + scaling efficiency
(the sandbox's stand-in for the N vs 4N node cluster criterion).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
import warnings

warnings.filterwarnings("ignore")

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
# deterministic corpus multiplier: replicates the flat documents table with
# offset doc_ids before deriving the interleaved corpus, so the headline ER
# run is compute-bound rather than overhead-bound
REPLICAS = int(os.environ.get("GRAFT_BENCH_REPLICAS", "3"))


def run_bench() -> dict:
    import ray

    ray.init(
        address="local",
        num_cpus=NUM_CPUS,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    import pyarrow.parquet as pq

    import ray.data as rd
    from sassy_ray.pipelines.er import ERConfig, run_er_pipeline
    from sassy_ray.sources.synth import interleave_flat_documents
    from sassy_ray.stages.blocking import BlockingConfig
    from sassy_ray.stages.scoring import ScoreConfig

    # warm the page cache (measure compute+shuffle, not first disk read)
    flat = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    _ = flat.num_rows

    timings: dict[str, float] = {}

    # ---- headline: the ER pipeline over the derived interleaved corpus ----
    t0 = time.time()
    import pyarrow as pa
    import pyarrow.compute as pc

    if REPLICAS > 1:
        parts = []
        for r in range(REPLICAS):
            ids = pc.add(flat.column("doc_id"), pa.scalar(r * 10_000_000, pa.int64()))
            parts.append(flat.set_column(0, "doc_id", ids))
        flat = pa.concat_tables(parts)
    docs, _truth = interleave_flat_documents(flat, seed=7)
    timings["corpus_synth"] = round(time.time() - t0, 3)

    sc = max(2, NUM_CPUS - 2)
    cfg = ERConfig(
        blocking=BlockingConfig(q=12, bands=8, num_perm=16),
        score=ScoreConfig(profile="ascii_ci", k_min=3, rel_k=0.03, lowercase=True),
        score_concurrency=sc,
        score_batch_size=2048,
    )
    t0 = time.time()
    res = run_er_pipeline(rd.from_arrow(docs), cfg)
    n_clusters = res["clusters"].count()
    er_sec = time.time() - t0
    timings["er_pipeline"] = round(er_sec, 3)
    n_pairs = res["pairs"].count()
    total_text_bytes = sum(
        len(s["text"]) for row in docs.to_pylist() for s in row["spans"]
    )

    # ---- representative operator benches ---------------------------------
    from sassy_ray.pipelines import queries as Q

    for name in ("q1_pricing_summary", "hash_join", "events_window", "ann_topk", "search_approx"):
        t0 = time.time()
        out = Q.QUERIES[name](SF_DIR)
        if hasattr(out, "count"):
            out.count()
        timings[name] = round(time.time() - t0, 3)

    ray.shutdown()

    return {
        "metric": "er_pipeline_sec",
        "value": round(er_sec, 3),
        "unit": "sec",
        "queries": timings,
        "sf": SF_DIR,
        "num_cpus": NUM_CPUS,
        "docs": int(docs.num_rows),
        "candidate_pairs": int(n_pairs),
        "clusters": int(n_clusters),
        "pairs_per_sec": round(n_pairs / er_sec, 1),
        "corpus_text_mb": round(total_text_bytes / 1e6, 2),
    }


def run_scaling() -> None:
    # N vs 4N parallelism levels.  4 vs 16 by default: 32 concurrent NumPy
    # kernel processes saturate this node's memory bandwidth, which would
    # measure the hardware ceiling rather than the pipeline's scaling.
    lo, hi = int(os.environ.get("SCALE_LO", "4")), int(os.environ.get("SCALE_HI", "16"))

    def one(ncpu: int) -> dict:
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu))
        env.setdefault("GRAFT_BENCH_REPLICAS", "8")
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env,
            capture_output=True,
            text=True,
            check=True,
        ).stdout
        return json.loads(out.strip().splitlines()[-1])

    r_lo = one(lo)
    r_hi = one(hi)
    thr_lo = r_lo["candidate_pairs"] / r_lo["value"]
    thr_hi = r_hi["candidate_pairs"] / r_hi["value"]
    eff = (thr_hi / thr_lo) / (hi / lo)
    print(
        json.dumps(
            {
                "metric": "scaling_efficiency",
                "value": round(eff, 3),
                "unit": "ratio",
                "sec_lo": r_lo["value"],
                "sec_hi": r_hi["value"],
                "pairs_per_sec_lo": round(thr_lo, 1),
                "pairs_per_sec_hi": round(thr_hi, 1),
                "cpus": [lo, hi],
                "sf": SF_DIR,
            }
        )
    )


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        run_scaling()
    else:
        print(json.dumps(run_bench()))
