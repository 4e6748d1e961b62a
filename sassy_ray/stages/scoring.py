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
        emit_matches: bool = False,
    ) -> None:
        self.profile = profile
        self.k_min = k_min
        self.rel_k = rel_k
        self.rc = rc
        self.lowercase = lowercase
        # emit_matches: also trace the best match (coords + cigar) for
        # matched pairs — opt-in, traceback costs ~ms per matched pair
        self.emit_matches = emit_matches

    def fingerprint(self) -> str:
        return (f"score({self.profile},k_min={self.k_min},rel_k={self.rel_k},"
                f"rc={self.rc},em={self.emit_matches})")


# per-worker cache of the deserialized broadcast lookup: plasma zero-copies
# the Arrow payload, but the python dict must be built once per process —
# never once per task/batch
_BCAST_CACHE: dict[str, dict] = {}


def _tbl_to_dict(obj: pa.Table) -> dict[str, bytes]:
    return dict(
        zip(
            obj.column("doc_id").to_pylist(),
            (t.encode() for t in obj.column("text").to_pylist()),
        )
    )


def _resolve_docs(docs_ref) -> dict[str, bytes]:
    if isinstance(docs_ref, dict):
        return docs_ref
    if isinstance(docs_ref, list):  # list of block ObjectRefs (to_arrow_refs)
        key = "|".join(r.hex() for r in docs_ref[:4]) + f":{len(docs_ref)}"
    else:
        key = docs_ref.hex() if hasattr(docs_ref, "hex") else str(id(docs_ref))
    hit = _BCAST_CACHE.get(key)
    if hit is None:
        import ray

        if isinstance(docs_ref, list):
            blocks = ray.get(docs_ref)
            hit = {}
            for b in blocks:
                hit.update(_tbl_to_dict(b))
        else:
            obj = ray.get(docs_ref)
            hit = _tbl_to_dict(obj) if isinstance(obj, pa.Table) else obj
        _BCAST_CACHE.clear()
        _BCAST_CACHE[key] = hit
    return hit


def score_pairs_batch(
    batch: pa.Table, cfg: ScoreConfig, docs_ref=None, pre_lowercased: bool = False
) -> pa.Table:
    """Stateless-task variant of the scorer: runs in Ray's pre-started warm
    workers (no actor spin-up).  The broadcast lookup resolves through a
    per-worker cache (one plasma fetch + one dict build per process).  Use
    the actor-pool ``PairScorer`` when per-worker state is genuinely
    expensive to build."""
    return PairScorer(cfg, docs_ref, pre_lowercased)(batch)


class PairScorer:
    def __init__(self, cfg: ScoreConfig, docs_ref=None, pre_lowercased: bool = False) -> None:
        self.cfg = cfg
        self.prof = get_profile(cfg.profile)
        self.pre_lowercased = pre_lowercased
        self.docs: dict[str, bytes] | None = None
        if docs_ref is not None:
            self.docs = _resolve_docs(docs_ref)

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
        if cfg.lowercase and not self.pre_lowercased:
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
        # bucket by limb count: a batch's kernel cost is B x max(L); mixing a
        # 64-char pattern with a 560-char one makes everyone pay 9 limbs
        order = sorted(range(n), key=lambda i: len(pats[i]))
        cost = np.empty(n, dtype=np.int32)
        i = 0
        while i < n:
            L0 = (len(pats[order[i]]) + 63) // 64
            j = i
            while j < n and (len(pats[order[j]]) + 63) // 64 == L0:
                j += 1
            idx = order[i:j]
            sub_p = [pats[x] for x in idx]
            sub_t = [txts[x] for x in idx]
            c = batch_best_costs(sub_p, sub_t, self.prof, k_max)
            if cfg.rc and self.prof.supports_rc:
                rc_p = [self.prof.reverse_complement(p) for p in sub_p]
                c = np.minimum(c, batch_best_costs(rc_p, sub_t, self.prof, k_max))
            cost[idx] = c
            i = j
        is_match = cost <= k_pair
        out = {
            "doc_id_a": batch.column("doc_id_a"),
            "doc_id_b": batch.column("doc_id_b"),
            "cost": pa.array(cost, pa.int32()),
            "k": pa.array(k_pair, pa.int32()),
            "is_match": pa.array(is_match),
        }
        if cfg.emit_matches:
            # full Match coordinates for the matched pairs (sassy parity:
            # best match of the shorter doc inside the longer, traced)
            from sassy_ray.kernel.search import Searcher

            searcher = Searcher(
                cfg.profile, rc=cfg.rc, only_best_match=True, case_sensitive=False
            )
            starts = np.full(n, -1, dtype=np.int64)
            ends = np.full(n, -1, dtype=np.int64)
            strands = [""] * n
            cigars = [""] * n
            hit = np.nonzero(is_match)[0]
            if len(hit):
                res = searcher.search_pairs(
                    [pats[i] for i in hit], [txts[i] for i in hit], k_max
                )
                for hi_, ms in zip(hit.tolist(), res):
                    best = min(ms, key=lambda m: (m.cost, -m.text_end), default=None)
                    if best is not None:
                        starts[hi_] = best.text_start
                        ends[hi_] = best.text_end
                        strands[hi_] = best.strand
                        cigars[hi_] = best.cigar
            out["text_start"] = pa.array(starts)
            out["text_end"] = pa.array(ends)
            out["strand"] = pa.array(strands)
            out["cigar"] = pa.array(cigars)
        return pa.table(out)
