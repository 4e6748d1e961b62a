"""Text-analysis transforms for training-data pipelines.

All are vectorized ``map_batches`` bodies over the documents table:
- ``lang_id_batch``: character n-gram heuristic language ID;
- ``quality_batch``: length / punctuation / stopword / token features;
- ``token_count_batch``: whitespace + BPE-ish regex token counts;
- ``fingerprint_batch``: 64-bit rolling-hash document fingerprint.
"""

from __future__ import annotations

import re

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

__all__ = [
    "lang_id_batch",
    "quality_batch",
    "token_count_batch",
    "fingerprint_batch",
    "md5_fingerprint_batch",
]

# tiny per-language marker sets (function words / frequent char bigrams);
# deterministic heuristic, no model files
_LANG_MARKERS = {
    "en": {"the", "and", "of", "to", "in", "is", "it", "that"},
    "de": {"der", "die", "das", "und", "nicht", "ist", "ich"},
    "fr": {"le", "la", "les", "et", "est", "une", "que"},
    "es": {"el", "los", "las", "es", "una", "que", "por"},
    "zh": set(),  # CJK detected by codepoint range below
}

_WORD_RE = re.compile(r"[a-zA-Z]+")
# BPE-ish tokenizer: words, numbers, or single non-space symbols
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")
_PUNCT = set(".,;:!?()[]{}\"'`")


def lang_id_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Marker-word language ID.  ``score_e6`` is integer-exact
    (matches * 1e6 // distinct words) so the DuckDB SQL twin reproduces it
    bit-for-bit — no float rounding-mode hazards."""
    texts = batch.column(text_col).to_pylist()
    langs, scores = [], []
    for t in texts:
        t = t or ""
        if any("一" <= ch <= "鿿" for ch in t[:200]):
            langs.append("zh")
            scores.append(1_000_000)
            continue
        words = set(w.lower() for w in _WORD_RE.findall(t))
        best, best_n = "und", 0
        for lang, markers in _LANG_MARKERS.items():
            n = len(words & markers)
            if n > best_n:
                best, best_n = lang, n
        langs.append(best)
        scores.append(best_n * 1_000_000 // max(1, len(words)))
    return batch.append_column("pred_lang", pa.array(langs)).append_column(
        "score_e6", pa.array(scores, pa.int64())
    )


def quality_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Quality features with integer-exact e6 ratios (x * 1e6 // denom) —
    bit-reproducible in the SQL oracle."""
    texts = batch.column(text_col).to_pylist()
    n = len(texts)
    n_chars = np.zeros(n, dtype=np.int64)
    n_tokens = np.zeros(n, dtype=np.int64)
    punct_e6 = np.zeros(n, dtype=np.int64)
    stop_e6 = np.zeros(n, dtype=np.int64)
    wordlen_e6 = np.zeros(n, dtype=np.int64)
    stop = _LANG_MARKERS["en"]
    for i, t in enumerate(texts):
        t = t or ""
        n_chars[i] = len(t)
        toks = t.split()
        n_tokens[i] = len(toks)
        punct_e6[i] = sum(c in _PUNCT for c in t) * 1_000_000 // max(1, len(t))
        stop_e6[i] = sum(w.lower() in stop for w in toks) * 1_000_000 // max(1, len(toks))
        wordlen_e6[i] = sum(len(w) for w in toks) * 1_000_000 // max(1, len(toks))
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "n_chars": pa.array(n_chars),
            "n_tokens": pa.array(n_tokens),
            "punct_e6": pa.array(punct_e6),
            "stop_e6": pa.array(stop_e6),
            "wordlen_e6": pa.array(wordlen_e6),
        }
    )


def token_count_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    texts = batch.column(text_col).to_pylist()
    ws = [len((t or "").split()) for t in texts]
    bpe = [len(_BPE_RE.findall(t or "")) for t in texts]
    return pa.table(
        {
            "doc_id": batch.column("doc_id"),
            "ws_tokens": pa.array(ws, pa.int64()),
            "bpe_tokens": pa.array(bpe, pa.int64()),
        }
    )


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit rolling polynomial fingerprint, one vector op per doc:
    h = sum(byte_i * B^(n-1-i)) mod 2^64."""
    texts = [(t or "").encode() for t in batch.column(text_col).to_pylist()]
    out = np.empty(len(texts), dtype=np.uint64)
    B = 1099511628211
    maxlen = max((len(t) for t in texts), default=1)
    pows = np.empty(maxlen, dtype=np.uint64)
    acc = 1
    for i in range(maxlen - 1, -1, -1):
        pows[i] = acc
        acc = (acc * B) % (1 << 64)
    for i, t in enumerate(texts):
        if not t:
            out[i] = 0
            continue
        arr = np.frombuffer(t, dtype=np.uint8).astype(np.uint64)
        out[i] = (arr * pows[maxlen - len(arr) :]).sum(dtype=np.uint64)
    return pa.table(
        {"doc_id": batch.column("doc_id"), "fingerprint64": pa.array(out, pa.uint64())}
    )


def md5_fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """64-bit content fingerprint: first 8 bytes of md5(utf8 text), big-
    endian — reproducible as SQL (parse the first 16 md5 hex chars)."""
    import hashlib

    out = np.fromiter(
        (
            int.from_bytes(hashlib.md5((t or "").encode()).digest()[:8], "big")
            for t in batch.column(text_col).to_pylist()
        ),
        dtype=np.uint64,
        count=len(batch),
    )
    return pa.table(
        {"doc_id": batch.column("doc_id"), "fingerprint64": pa.array(out, pa.uint64())}
    )
