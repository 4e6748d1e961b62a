"""The reference's ``sassy grep|search|filter`` as a Ray Data pipeline.

One code path with preset writers (bin/grep.rs:330-356):
- ``search``: emit the 8-col match table, deterministically ordered by
  (text_id, start) — the batch-id reorder buffer of the reference
  (bin/grep.rs:544-572) becomes a post-sort (SURVEY.md §4: we prefer
  post-sort over preserve_order);
- ``filter``: re-emit matching (or ``invert``ed non-matching) document rows
  with ALL columns preserved (S6; spans survive untouched);
- cost histogram aggregate (grep.rs:309-328) = groupby("cost").count().

The pattern set is broadcast (tiny side of the cartesian product, J1); the
per-batch scorer is the batch Myers kernel via ``Searcher.search_many``.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from sassy_ray.functions.matches import matches_to_table
from sassy_ray.kernel.search import CHUNK_LEN, Searcher, chunked_search

__all__ = ["GrepConfig", "run_grep", "grep_matches_batch"]


class GrepConfig:
    def __init__(
        self,
        patterns: list[tuple[str, bytes]],
        k: int = 1,
        alphabet: str = "dna",
        rc: bool = True,
        alpha: float | None = None,
        max_overhang: int | None = None,
        max_n_frac: float | None = None,
        all_minima: bool = False,
        only_best_match: bool = False,
        without_trace: bool = False,
        sam: bool = False,
        invert: bool = False,
        case_sensitive: bool = True,
        preserve_order: bool = False,
    ) -> None:
        self.patterns = [(pid, s if isinstance(s, bytes) else s.encode()) for pid, s in patterns]
        self.k = k
        self.alphabet = alphabet
        self.rc = rc
        self.alpha = alpha
        self.max_overhang = max_overhang
        self.max_n_frac = max_n_frac
        self.all_minima = all_minima
        self.only_best_match = only_best_match
        self.without_trace = without_trace
        self.sam = sam
        self.invert = invert
        self.case_sensitive = case_sensitive
        # streaming-ordered output without a global sort (the reference's
        # reorder buffer, bin/grep.rs:544-572): Ray Data preserves row order
        # inside blocks; preserve_order pins the BLOCK order to input order
        self.preserve_order = preserve_order

    def make_searcher(self) -> Searcher:
        return Searcher(
            self.alphabet,
            rc=self.rc,
            alpha=self.alpha,
            max_overhang=self.max_overhang,
            max_n_frac=self.max_n_frac,
            only_best_match=self.only_best_match,
            without_trace=self.without_trace,
            case_sensitive=self.case_sensitive,
        )


class _LazyTexts:
    """Per-index bytes view over an Arrow binary array: texts stay in the
    Arrow buffers and only MATCHED rows ever materialize Python bytes (the
    emission side slices a match region out of them).  The scan side reads
    the same buffers zero-copy."""

    def __init__(self, arr: pa.Array):
        self.arr = arr

    def __len__(self) -> int:
        return len(self.arr)

    def __getitem__(self, i: int) -> bytes:
        return self.arr[i].as_py()


def grep_matches_batch(
    batch: pa.Table, cfg: GrepConfig, id_col: str = "doc_id", text_col: str = "text"
) -> pa.Table:
    import pyarrow.compute as _pc

    from sassy_ray.kernel.native import _arrow_binary

    searcher = cfg.make_searcher()
    ids = [str(x) for x in batch.column(id_col).to_pylist()]
    tarr = _arrow_binary(batch.column(text_col))
    seqs = _LazyTexts(tarr)
    pat_seqs = [s for _, s in cfg.patterns]
    max_len = int(_pc.max(_pc.binary_length(tarr)).as_py() or 0) if len(tarr) else 0
    long_texts = max_len > 2 * CHUNK_LEN
    if long_texts and not cfg.all_minima:
        # genome-scale texts: ONE overlapping-chunk scan for the whole
        # pattern set (kernel/search.chunked_search_multi); the Arrow array
        # feeds the fused C chunk builder straight from its buffers
        from sassy_ray.kernel.search import chunked_search_multi

        per = chunked_search_multi(searcher, pat_seqs, tarr, cfg.k)
        rows = []
        for pi in range(len(pat_seqs)):
            for ti in range(len(seqs)):
                if per[pi][ti]:
                    seq = seqs[ti]
                    rows.extend((cfg.patterns[pi][0], ids[ti], seq, m) for m in per[pi][ti])
    elif cfg.all_minima:
        rows = []
        for ti in range(len(seqs)):
            seq = seqs[ti]
            for pi, pseq in enumerate(pat_seqs):
                for m in searcher.search_all(pseq, seq, cfg.k):
                    rows.append((cfg.patterns[pi][0], ids[ti], seq, m))
    else:
        ms = searcher.search_many(pat_seqs, tarr, cfg.k)
        rows = [(cfg.patterns[m.pattern_idx][0], ids[m.text_idx], seqs[m.text_idx], m) for m in ms]
    return matches_to_table(rows, "iupac" if cfg.alphabet == "dna" else cfg.alphabet, cfg.sam)


def _matched_ids_batch(batch, cfg, id_col, text_col) -> pa.Table:
    t = grep_matches_batch(batch, cfg, id_col, text_col)
    ids = pc.unique(t.column("text_id"))
    return pa.table({"text_id": ids})


def run_grep(
    texts_ds,
    cfg: GrepConfig,
    id_col: str = "doc_id",
    text_col: str = "text",
    batch_size: int = 256,
):
    """Returns dict(matches=Dataset ordered, histogram=Table, filtered=Dataset).

    Ordering: default = deterministic global post-sort; with
    ``cfg.preserve_order`` the matches stream out in INPUT order instead
    (no sort, no all-to-all) — the reference's ``preserve_order`` path.
    """
    if cfg.preserve_order:
        import ray

        # scope the global DataContext flag to this materialize: later
        # pipelines in the same session must not silently inherit
        # order-preserving execution (throughput penalty)
        opts = ray.data.DataContext.get_current().execution_options
        prev_order = opts.preserve_order
        opts.preserve_order = True
        try:
            matches = texts_ds.map_batches(
                lambda b: grep_matches_batch(b, cfg, id_col, text_col),
                batch_format="pyarrow",
                batch_size=batch_size,
            ).materialize()
        finally:
            opts.preserve_order = prev_order
    else:
        matches = texts_ds.map_batches(
            lambda b: grep_matches_batch(b, cfg, id_col, text_col),
            batch_format="pyarrow",
            batch_size=batch_size,
        ).materialize()
    if not cfg.preserve_order:
        matches = matches.sort(["text_id", "start", "pat_id"])
    hist = (
        matches.groupby("cost")
        .count()
        .to_pandas()
        .rename(columns={"count()": "n"})
        .sort_values("cost")
        .reset_index(drop=True)
    )

    # semi/anti join of documents against matched ids (J3, S6): broadcast the
    # distinct matched-id Arrow array, vectorized is_in per batch
    import ray

    matched_keys = pc.unique(
        pa.concat_tables(
            matches.select_columns(["text_id"]).iter_batches(
                batch_size=65536, batch_format="pyarrow"
            )
        ).column("text_id")
    )
    matched_ref = ray.put(matched_keys)

    def flt(b: pa.Table) -> pa.Table:
        keys = ray.get(matched_ref)
        mask = pc.is_in(pc.cast(b.column(id_col), pa.string()), value_set=keys)
        return b.filter(pc.invert(mask) if cfg.invert else mask)

    filtered = texts_ds.map_batches(flt, batch_format="pyarrow")
    return {"matches": matches, "histogram": hist, "filtered": filtered}
