"""CRISPR off-target search pipeline (the reference's ``sassy crispr``).

Semantics (bin/crispr.rs:144-269):
- guides end with a PAM of ``pam_length`` chars; all guides must share it
  (":67-122");
- per (guide, text): with ``allow_pam_edits`` run ``search_all``; otherwise
  ``search_with_fn`` with all_minima=True and the exact-PAM endpoint filter —
  Fwd: text[:end] ends with PAM (IUPAC match), Rc: with complement(PAM)
  (":198-205"; rc search works on complemented pattern vs reversed text);
- IUPAC profile, RC by default, ``max_n_frac`` filtering;
- output: the 8-col match table with ``guide`` as pat_id, plus a total-found
  counter (":168,226-235" -> ``ds.count()``).

Ray shape: stateless ``map_batches`` over the texts dataset; the guide set
is tiny and ships inside the task closure (the reference's J1 broadcast).
"""

from __future__ import annotations

import pyarrow as pa

from sassy_ray.functions.matches import matches_to_table
from sassy_ray.kernel.profiles import get_profile
from sassy_ray.kernel.search import Searcher
from sassy_ray.kernel.types import FWD

__all__ = ["CrisprConfig", "crispr_matches_batch", "run_crispr"]


class CrisprConfig:
    def __init__(
        self,
        guides: list[bytes],
        k: int = 1,
        pam_length: int = 3,
        allow_pam_edits: bool = True,
        max_n_frac: float = 1.0,
        rc: bool = True,
    ) -> None:
        if not guides:
            raise ValueError("No guide sequences provided")
        guides = [g if isinstance(g, bytes) else g.encode() for g in guides]
        pam = guides[0][-pam_length:]
        for g in guides:
            if g[-pam_length:] != pam:
                raise ValueError(
                    f"One of the guide sequences has a PAM different than the provided PAM: "
                    f"provided {pam.decode()}, detected {g[-pam_length:].decode()}"
                )
        self.guides = guides
        self.pam = pam
        self.k = k
        self.pam_length = pam_length
        self.allow_pam_edits = allow_pam_edits
        self.max_n_frac = max_n_frac
        self.rc = rc


def _searcher(cfg: CrisprConfig) -> Searcher:
    return Searcher("iupac", rc=cfg.rc, max_n_frac=cfg.max_n_frac)


def _pam_filter(cfg: CrisprConfig):
    prof = get_profile("iupac")
    pam = cfg.pam
    pam_compl = prof.complement(pam)

    def flt(pattern: bytes, text_till_end: bytes, strand: str) -> bool:
        if len(text_till_end) < cfg.pam_length:
            return False
        sl = text_till_end[-cfg.pam_length :]
        want = pam if strand == FWD else pam_compl
        import numpy as np

        a = np.frombuffer(sl, dtype=np.uint8)
        b = np.frombuffer(want, dtype=np.uint8)
        return bool(prof.match_matrix[a, b].all())

    return flt


def crispr_matches(texts: list[tuple[str, bytes]], cfg: CrisprConfig) -> pa.Table:
    """(text_id, seq) list -> 8-col match table (guide as pat_id).

    One suffix-prefiltered cartesian kernel batch for the whole guide set
    (Searcher._search_cartesian) instead of a Python loop of single-pair
    searches — the guides x texts product is the hot axis here."""
    searcher = _searcher(cfg)
    flt = None if cfg.allow_pam_edits else _pam_filter(cfg)
    seqs = [seq for _, seq in texts]
    res = searcher._search_cartesian(cfg.guides, seqs, cfg.k, all_minima=True, filter_fn=flt)
    rows = []
    for ti, (text_id, seq) in enumerate(texts):
        for gi, guide in enumerate(cfg.guides):
            for m in res.get((gi, ti), ()):
                rows.append((guide.decode(), text_id, seq, m))
    t = matches_to_table(rows, "iupac")
    return t.rename_columns(["guide"] + t.column_names[1:])


def crispr_matches_batch(batch: pa.Table, cfg: CrisprConfig, id_col="doc_id", text_col="text") -> pa.Table:
    ids = [str(x) for x in batch.column(id_col).to_pylist()]
    seqs = [(t or "").encode() for t in batch.column(text_col).to_pylist()]
    return crispr_matches(list(zip(ids, seqs)), cfg)


def run_crispr(texts_ds, cfg: CrisprConfig, id_col="doc_id", text_col="text"):
    """texts Dataset -> (matches Dataset, total_found)."""
    out = texts_ds.map_batches(
        lambda b: crispr_matches_batch(b, cfg, id_col, text_col),
        batch_format="pyarrow",
        batch_size=256,
    ).materialize()
    return out, out.count()
