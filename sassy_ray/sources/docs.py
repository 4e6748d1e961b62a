"""Documents-table utilities: span concat, validation, invariant fingerprint.

The per-row invariant required of every stage (BASELINE.json input_hint):
output rows preserve span-sequence equality — kind, text, media_ref, order —
with the input.  ``spans_fingerprint`` gives a vectorized per-row hash used by
tests and checkpoint manifests to assert it.

Span concatenation mirrors the reference's record model: a document's
"sequence" is the concatenation of its text spans in offset order
(cf. TextRecord, /root/reference/bin/input_iterator.rs:24-28 — here one
interleaved doc plays the role of one FASTA record).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = ["concat_spans", "add_doc_text", "spans_fingerprint", "validate_span_order"]


def _spans_list_array(spans: pa.ChunkedArray | pa.Array) -> pa.ListArray:
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    if isinstance(spans, pa.LargeListArray):
        return spans
    return spans


def concat_spans(spans: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Concatenate each row's text spans in stored (offset) order.

    Media spans carry text="" by schema, so joining the raw text field over
    the full list is exactly the text-only concatenation — fully vectorized
    (no per-row Python).
    """
    arr = _spans_list_array(spans)
    flat = arr.flatten()
    texts = flat.field("text")
    offsets = arr.offsets
    text_lists = pa.ListArray.from_arrays(offsets, texts)
    return pc.binary_join(text_lists, "")


def add_doc_text(batch: pa.Table, out_col: str = "text") -> pa.Table:
    """map_batches-ready: append the concatenated span text as a column,
    passing the spans column through untouched (zero-copy)."""
    return batch.append_column(out_col, concat_spans(batch.column("spans")))


def spans_fingerprint(batch: pa.Table) -> np.ndarray:
    """Per-row uint64 hash of the exact span sequence (kind, text, media_ref,
    offset, order) — used to assert the span invariant across stages."""
    arr = _spans_list_array(batch.column("spans"))
    flat = arr.flatten()
    joined = pc.binary_join_element_wise(
        flat.field("kind"),
        flat.field("text"),
        flat.field("media_ref"),
        pc.cast(flat.field("offset"), pa.string()),
        "\x1f",
    )
    offsets = arr.offsets
    rows = pc.binary_join(pa.ListArray.from_arrays(offsets, joined), "\x1e")
    import zlib

    return np.array(
        [zlib.crc32(s) for s in rows.cast(pa.binary()).to_pylist()], dtype=np.uint64
    )


def validate_span_order(batch: pa.Table) -> None:
    """Assert offsets are strictly increasing within each row."""
    arr = _spans_list_array(batch.column("spans"))
    flat = arr.flatten()
    off = flat.field("offset").to_numpy(zero_copy_only=False)
    bounds = arr.offsets.to_numpy()
    if len(off) < 2:
        return
    d = np.diff(off)
    # a non-increase is allowed only where the next element starts a new row
    boundary = np.zeros(len(d), dtype=bool)
    starts = bounds[1:-1] - 1  # index into d of each row boundary
    starts = starts[(starts >= 0) & (starts < len(d))]
    boundary[starts] = True
    if ((d <= 0) & ~boundary).any():
        raise ValueError("span offsets not strictly increasing within a row")
