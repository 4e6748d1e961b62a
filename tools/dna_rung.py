"""DNA ER rung: the RC + overhang duplicate semantics (the reference's home
domain) at multi-100k-doc scale — exercises rc_canonical MinHash blocking,
the iupac profile, and the scored stage's fused both-strands NativeBatch
path end-to-end.  The ascii rungs (tools/robustness.py) never run RC.

Corpus: `sources/synth.dna_corpus` shards built in parallel Ray tasks (the
generator is per-row Python — fine per 2k-doc shard), ids prefixed per
shard.  Ground truth at this size is lineage-free (near-dup constructions),
so the recorded evidence is throughput + cluster count; the SEMANTICS are
pinned by the sf-scale hash gate (er_clusters_dna) and the F1=1.0 tests.

Usage: python tools/dna_rung.py [--shards 250] [--docs-per-shard 2000] [--cpus 32]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _build_shard(shard: int, n_docs: int):
    import pyarrow.compute as pc

    from sassy_ray.sources.synth import dna_corpus

    docs, _truth = dna_corpus(n_docs=n_docs, seed=1000 + shard)
    ids = pc.binary_join_element_wise(
        f"s{shard:04d}:", pc.cast(docs.column("doc_id"), "string"), ""
    )
    return docs.set_column(docs.column_names.index("doc_id"), "doc_id", ids)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--shards", type=int, default=250)
    ap.add_argument("--docs-per-shard", type=int, default=2000)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    import ray

    ray.init(
        address="local",
        num_cpus=args.cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import ray.data as rd
    from ray.data import DataContext

    from sassy_ray.pipelines.er import ERConfig, run_er_pipeline
    from sassy_ray.stages.blocking import BlockingConfig
    from sassy_ray.stages.scoring import ScoreConfig

    DataContext.get_current().enable_progress_bars = False

    build = ray.remote(_build_shard)
    t0 = time.time()
    blocks = ray.get([build.remote(s, args.docs_per_shard) for s in range(args.shards)])
    t_corpus = time.time() - t0
    n_docs = sum(b.num_rows for b in blocks)
    text_mb = sum(b.nbytes for b in blocks) / 1e6
    print(f"corpus: {n_docs} DNA docs / {text_mb:.0f} MB in {t_corpus:.1f}s", file=sys.stderr)

    # same semantics as the hash-verified er_clusters_dna query
    cfg = ERConfig(
        blocking=BlockingConfig(q=8, rc_canonical=True),
        score=ScoreConfig(profile="iupac", rc=True, k_min=4, rel_k=0.12),
        score_concurrency=max(2, args.cpus - 2),
        score_batch_size=8192,
    )
    t0 = time.time()
    res = run_er_pipeline(rd.from_arrow(blocks), cfg)
    n_clusters = res["clusters"].count()
    er_sec = time.time() - t0
    n_pairs = int(res["pairs"].count())
    print(
        json.dumps(
            {
                "metric": "dna_rung",
                "docs": int(n_docs),
                "corpus_text_mb": round(text_mb, 1),
                "er_sec": round(er_sec, 1),
                "candidate_pairs": n_pairs,
                "clusters": int(n_clusters),
                "pairs_per_sec": round(n_pairs / er_sec, 1) if n_pairs else None,
                "stage_sec": res["stats"].get("stage_sec", {}),
                "num_cpus": args.cpus,
                "rc": True,
                "profile": "iupac",
            }
        )
    )
    ray.shutdown()


if __name__ == "__main__":
    main()
