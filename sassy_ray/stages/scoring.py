"""Pair-scoring stage: actor-pool map_batches running the batch Myers kernel.

``PairScorer`` is a callable CLASS for ``map_batches(..., concurrency=N)``:
state (the profile tables + the broadcast doc_id->text lookup) is resolved
once per actor in ``__init__`` (mirroring the reference's per-thread Searcher
+ encoded-pattern state, /root/reference/src/search.rs:226-256,404-423);
``__call__`` scores one Arrow batch of pairs vectorized.

Two text-resolution modes:
- ``docs_ref``: a ``ray.put`` object ref of {doc_id: text} — broadcast joins
  the small side once per actor, zero shuffle (right for corpora whose id->
  text map fits a worker; the blocking/scoring path for bench + tests);
- pre-joined columns ``text_a``/``text_b`` in the batch (produced by the
  partitioned hash join in er.py's 'join' mode) — the 10^12-doc scale path.

Match rule: pattern = shorter text, searched semi-globally in the longer
(free ends absorb truncation); a pair matches iff best edit cost <= k(pair)
= max(k_min, floor(rel_k * len(shorter))).  With ``rc=True`` the reverse
complement is tried too (DNA corpora).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from sassy_ray.kernel.myers import batch_best_costs
from sassy_ray.kernel.profiles import get_profile

__all__ = ["ScoreConfig", "PairScorer"]


class ScoreConfig:
    def __init__(
        self,
        profile: str = "ascii_ci",
        k_min: int = 3,
        rel_k: float = 0.12,
        rc: bool = False,
        lowercase: bool = False,
    ) -> None:
        self.profile = profile
        self.k_min = k_min
        self.rel_k = rel_k
        self.rc = rc
        self.lowercase = lowercase

    def fingerprint(self) -> str:
        return f"score({self.profile},k_min={self.k_min},rel_k={self.rel_k},rc={self.rc})"


class PairScorer:
    def __init__(self, cfg: ScoreConfig, docs_ref=None) -> None:
        self.cfg = cfg
        self.prof = get_profile(cfg.profile)
        self.docs: dict[str, bytes] | None = None
        if docs_ref is not None:
            import ray

            self.docs = ray.get(docs_ref)

    def _texts(self, batch: pa.Table, col: str, id_col: str) -> list[bytes]:
        if col in batch.column_names:
            vals = batch.column(col).to_pylist()
            return [(v or "").encode() for v in vals]
        assert self.docs is not None, f"no {col} column and no docs_ref broadcast"
        ids = batch.column(id_col).to_pylist()
        return [self.docs.get(d, b"") for d in ids]

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        ta = self._texts(batch, "text_a", "doc_id_a")
        tb = self._texts(batch, "text_b", "doc_id_b")
        if cfg.lowercase:
            ta = [t.lower() for t in ta]
            tb = [t.lower() for t in tb]
        n = len(ta)
        if n == 0:
            return pa.table(
                {
                    "doc_id_a": pa.array([], pa.string()),
                    "doc_id_b": pa.array([], pa.string()),
                    "cost": pa.array([], pa.int32()),
                    "k": pa.array([], pa.int32()),
                    "is_match": pa.array([], pa.bool_()),
                }
            )
        pats, txts = [], []
        min_len = np.empty(n, dtype=np.int64)
        for i in range(n):
            a, b = ta[i], tb[i]
            if len(a) <= len(b):
                pats.append(a)
                txts.append(b)
            else:
                pats.append(b)
                txts.append(a)
            min_len[i] = len(pats[-1])
        k_pair = np.maximum(cfg.k_min, (cfg.rel_k * min_len).astype(np.int64)).astype(np.int32)
        k_max = int(k_pair.max())
        cost = batch_best_costs(pats, txts, self.prof, k_max)
        if cfg.rc and self.prof.supports_rc:
            rc_pats = [self.prof.reverse_complement(p) for p in pats]
            rc_cost = batch_best_costs(rc_pats, txts, self.prof, k_max)
            cost = np.minimum(cost, rc_cost)
        is_match = cost <= k_pair
        return pa.table(
            {
                "doc_id_a": batch.column("doc_id_a"),
                "doc_id_b": batch.column("doc_id_b"),
                "cost": pa.array(cost, pa.int32()),
                "k": pa.array(k_pair, pa.int32()),
                "is_match": pa.array(is_match),
            }
        )
