"""Per-stage checkpointing with lineage manifests (resume-from-failure).

Each pipeline stage writes its output as a parquet directory plus a
``manifest.json`` recording: stage name, config+input fingerprint, row count
and the completion flag.  On rerun, a stage whose manifest matches its
fingerprint is *skipped* and its output read back — the batch-pipeline
meaning of "resumable from checkpoint" (north rule).  Writes are atomic:
data lands in ``<dir>.tmp`` and is renamed into place after the manifest.

(The north star names Lance as the table format; this environment has no
lance wheel, so the layout is parquet directories with identical semantics —
swap the writer for ``write_lance`` where available.)
"""

from __future__ import annotations

import json
import os
import shutil

__all__ = ["StageCheckpoint"]


class StageCheckpoint:
    def __init__(self, root: str, stage: str, fingerprint: str) -> None:
        self.root = root
        self.stage = stage
        self.fingerprint = fingerprint
        self.dir = os.path.join(root, stage)
        self.manifest_path = os.path.join(self.dir, "manifest.json")

    def complete(self) -> bool:
        try:
            with open(self.manifest_path) as f:
                man = json.load(f)
            return bool(man.get("complete")) and man.get("fingerprint") == self.fingerprint
        except (OSError, json.JSONDecodeError):
            return False

    def manifest(self) -> dict:
        with open(self.manifest_path) as f:
            return json.load(f)

    def load(self):
        import ray.data as rd

        return rd.read_parquet(os.path.join(self.dir, "data"))

    def save(self, ds, counters: dict | None = None):
        """Write ds + manifest atomically; returns the PINNED (materialized)
        Dataset, not a disk re-read: the stage executes once into the object
        store, the parquet streams from those blocks (no recompute), and the
        downstream stages consume the plasma copy — a fresh run never pays
        the read-back that resume pays.  Beyond-heap outputs are the object
        store's spill problem, same as any pinned intermediate; on resume
        ``load()`` still reads the durable parquet."""
        out = ds.materialize()
        tmp = self.dir + ".tmp"
        shutil.rmtree(tmp, ignore_errors=True)
        os.makedirs(os.path.join(tmp, "data"), exist_ok=True)
        out.write_parquet(os.path.join(tmp, "data"))
        man = {
            "stage": self.stage,
            "fingerprint": self.fingerprint,
            "rows": out.count(),
            "files": sorted(os.listdir(os.path.join(tmp, "data"))),
            "counters": counters or {},
            "complete": True,
        }
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(man, f, indent=2)
        shutil.rmtree(self.dir, ignore_errors=True)
        os.replace(tmp, self.dir)
        return out
