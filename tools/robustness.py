"""Second robustness rung (SURVEY §4 / north rule): multi-million-doc ER
through the full CHECKPOINTED pipeline with a hard mid-stage kill + resume.

Builds a content-distinct replica corpus (~12.5k docs / ~54k candidate pairs
per replica of the sf0.1 flat table; 560 replicas ~= 7M docs / ~30M pairs),
runs `run_er_pipeline(checkpoint_dir=...)`, and — in orchestrate mode —
SIGKILLs the whole run's process group once the `pairs` checkpoint manifest
is complete and the scored stage is underway, then re-launches the same run.
The resume must skip `block_rows` + `pairs` (their manifests match the
config fingerprint) and re-run only the interrupted `scored` stage onward.

Usage:
  python tools/robustness.py [--replicas 560] [--cpus 32]         # kill+resume
  python tools/robustness.py --phase run ...                      # one attempt
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _permute_lut(seed: int):
    """Seeded letter permutation as a 256-byte LUT (content-distinct
    replicas; same construction as bench.py's corpus multiplier)."""
    import random
    import string

    import numpy as np

    letters = string.ascii_lowercase
    dst = list(letters)
    random.Random(seed).shuffle(dst)
    lut = np.arange(256, dtype=np.uint8)
    for a, b in zip(letters + letters.upper(), "".join(dst) + "".join(dst).upper()):
        lut[ord(a)] = ord(b)
    return lut


def _build_replica(flat, r: int):
    """One content-distinct interleaved replica (pure function — runs as a
    Ray task so a 560-replica corpus builds in parallel, not serially on
    the driver)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from sassy_ray.sources.synth import interleave_flat_documents

    ids = pc.add(flat.column("doc_id"), pa.scalar(r * 10_000_000, pa.int64()))
    rep = flat.set_column(0, "doc_id", ids)
    if r > 0:
        col = rep.column("text").combine_chunks()
        bufs = col.buffers()
        off_dt = np.int64 if pa.types.is_large_string(col.type) else np.int32
        n_bytes = int(np.frombuffer(bufs[1], dtype=off_dt, count=len(col) + 1)[-1])
        data = np.frombuffer(bufs[2], dtype=np.uint8, count=n_bytes)
        lut = _permute_lut(1000 + r)
        permuted = pa.Array.from_buffers(
            col.type, len(col), [bufs[0], bufs[1], pa.py_buffer(lut[data].tobytes())]
        )
        rep = rep.set_column(rep.column_names.index("text"), "text", permuted)
    docs_r, _truth = interleave_flat_documents(rep, seed=7)
    return docs_r


def phase_run(replicas: int, cpus: int, ckpt: str) -> None:
    import ray

    ray.init(
        address="local",
        num_cpus=cpus,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    import pyarrow.parquet as pq
    import ray.data as rd
    from ray.data import DataContext

    from sassy_ray.pipelines.er import ERConfig, run_er_pipeline
    from sassy_ray.stages.blocking import BlockingConfig
    from sassy_ray.stages.scoring import ScoreConfig

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    flat = pq.read_table(os.path.join(SF_DIR, "documents.parquet"))
    flat_ref = ray.put(flat)
    build = ray.remote(_build_replica)
    t0 = time.time()
    blocks = ray.get([build.remote(flat_ref, r) for r in range(replicas)])
    t_corpus = time.time() - t0
    n_docs = sum(b.num_rows for b in blocks)
    text_mb = sum(b.nbytes for b in blocks) / 1e6
    print(f"corpus: {n_docs} docs / {text_mb:.0f} MB in {t_corpus:.1f}s", file=sys.stderr)

    cfg = ERConfig(
        blocking=BlockingConfig(q=12, bands=8, num_perm=16),
        score=ScoreConfig(profile="ascii_ci", k_min=3, rel_k=0.03, lowercase=True),
        score_concurrency=max(2, cpus - 2),
        score_batch_size=8192,
    )
    t0 = time.time()
    res = run_er_pipeline(rd.from_arrow(blocks), cfg, checkpoint_dir=ckpt)
    n_clusters = res["clusters"].count()
    er_sec = time.time() - t0
    stats = res["stats"]
    n_pairs = int(res["pairs"].count())
    print(
        json.dumps(
            {
                "metric": "robustness_rung",
                "docs": int(n_docs),
                "corpus_text_mb": round(text_mb, 1),
                "corpus_build_sec": round(t_corpus, 1),
                "er_sec": round(er_sec, 1),
                "candidate_pairs": n_pairs,
                "clusters": int(n_clusters),
                "pairs_per_sec": round(n_pairs / er_sec, 1) if n_pairs else None,
                "stage_sec": stats.get("stage_sec", {}),
                "resumed_stages": stats.get("resumed_stages", []),
                "num_cpus": cpus,
                "replicas": replicas,
            }
        )
    )
    ray.shutdown()


def orchestrate(replicas: int, cpus: int, ckpt: str, kill_delay: float) -> None:
    import shutil

    shutil.rmtree(ckpt, ignore_errors=True)
    args = [
        sys.executable,
        os.path.abspath(__file__),
        "--phase",
        "run",
        "--replicas",
        str(replicas),
        "--cpus",
        str(cpus),
        "--ckpt",
        ckpt,
    ]
    # ---- attempt 1: killed mid-scored-stage -------------------------------
    child = subprocess.Popen(
        args, start_new_session=True, stdout=subprocess.PIPE, stderr=subprocess.DEVNULL
    )
    pairs_manifest = os.path.join(ckpt, "pairs", "manifest.json")
    t0 = time.time()
    killed_at = None
    while child.poll() is None:
        time.sleep(5)
        try:
            with open(pairs_manifest) as f:
                if json.load(f).get("complete"):
                    # pairs checkpoint durable; scored stage (minutes) is now
                    # underway — wait into it, then kill the process GROUP
                    # (driver + raylet + every worker: a real node loss)
                    time.sleep(kill_delay)
                    killed_at = round(time.time() - t0, 1)
                    os.killpg(os.getpgid(child.pid), signal.SIGKILL)
                    break
        except (OSError, json.JSONDecodeError):
            continue
    child.wait()
    if killed_at is None:
        print(
            "WARN: run finished before the kill could land — rerun with a "
            "larger --replicas",
            file=sys.stderr,
        )
    else:
        print(f"killed attempt 1 at t={killed_at}s (mid-scored)", file=sys.stderr)
    time.sleep(10)  # let the killed session's sockets/plasma dir clear

    # ---- attempt 2: resume -------------------------------------------------
    out = subprocess.run(args, capture_output=True, text=True, check=True)
    res = json.loads(out.stdout.strip().splitlines()[-1])
    res["killed_attempt1_at_sec"] = killed_at
    resumed = set(res.get("resumed_stages", []))
    res["resume_ok"] = {"block_rows", "pairs"} <= resumed
    print(json.dumps(res))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicas", type=int, default=560)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--ckpt", default="/tmp/sassy_robust_ckpt")
    ap.add_argument("--kill-delay", type=float, default=45.0)
    ap.add_argument("--phase", choices=["run", "orchestrate"], default="orchestrate")
    args = ap.parse_args()
    if args.phase == "run":
        phase_run(args.replicas, args.cpus, args.ckpt)
    else:
        orchestrate(args.replicas, args.cpus, args.ckpt, args.kill_delay)


if __name__ == "__main__":
    main()
