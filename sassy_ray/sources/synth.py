"""Deterministic synthesis of the interleaved-documents corpus (FIXTURES F1/F2).

The driver fixes the ER input shape (BASELINE.json input_hint):

    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

No such table ships with the testdata, so we synthesise it deterministically
(seeded; no external data) in two modes:

- ``interleave_flat_documents``: derives span docs from the driver's flat
  ``documents.parquet`` (ASCII text), planting 0-3 near-duplicate variants per
  base doc with <=k seeded character edits — ground-truth cluster = base doc.
- ``dna_corpus``: standalone DNA corpus exercising the RC and overhang cases
  (planted mutations mirror the reference's search_fuzz scheme,
  /root/reference/src/search.rs:2634-2656).

Every generated doc is reproducible from (seed, doc_id) alone, independent of
generation order — the property that makes 10^12-doc scale-out trivially
shardable.
"""

from __future__ import annotations

import random

import numpy as np
import pyarrow as pa

__all__ = [
    "SPANS_TYPE",
    "DOCS_SCHEMA",
    "interleave_flat_documents",
    "dna_corpus",
    "barcoded_reads",
    "truth_pairs",
]

SPANS_TYPE = pa.list_(
    pa.struct(
        [
            ("kind", pa.string()),
            ("text", pa.string()),
            ("media_ref", pa.string()),
            ("offset", pa.int32()),
        ]
    )
)

DOCS_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", SPANS_TYPE)])
TRUTH_SCHEMA = pa.schema([("doc_id", pa.string()), ("cluster_id", pa.string())])

DNA = "ACGT"


def _edit(rng: random.Random, s: str, alphabet: str, n_edits: int) -> str:
    b = list(s)
    for _ in range(n_edits):
        op = rng.randrange(3)
        pos = rng.randrange(max(1, len(b)))
        if op == 0 and b:
            b[pos] = rng.choice(alphabet)
        elif op == 1:
            b.insert(pos, rng.choice(alphabet))
        elif op == 2 and len(b) > 1:
            del b[pos]
    return "".join(b)


def _split_spans(rng: random.Random, text: str) -> list[dict]:
    """Split text into 1-5 text spans and interleave 0-2 media spans."""
    n_text = rng.randint(1, min(5, max(1, len(text) // 30 + 1)))
    cuts = sorted(rng.sample(range(1, max(2, len(text))), min(n_text - 1, max(0, len(text) - 1))))
    pieces = []
    prev = 0
    for c in cuts + [len(text)]:
        pieces.append(text[prev:c])
        prev = c
    spans = [{"kind": "text", "text": p, "media_ref": ""} for p in pieces if p]
    for _ in range(rng.randint(0, 2)):
        pos = rng.randrange(len(spans) + 1)
        spans.insert(
            pos,
            {"kind": "media", "text": "", "media_ref": f"media://{rng.getrandbits(64):016x}"},
        )
    for i, s in enumerate(spans):
        s["offset"] = i
    return spans


def _doc_rng(seed: int, doc_key: str) -> random.Random:
    return random.Random(f"{seed}:{doc_key}")


_RC = str.maketrans("ACGT", "TGCA")


def _make_rows(
    base_id: str,
    text: str,
    alphabet: str,
    seed: int,
    max_dups: int,
    max_edits: int,
    rc_prob: float,
    truncate_prob: float,
) -> tuple[list[dict], list[dict]]:
    rows, truth = [], []
    rng = _doc_rng(seed, base_id)
    rows.append({"doc_id": base_id, "spans": _split_spans(rng, text)})
    truth.append({"doc_id": base_id, "cluster_id": base_id})
    for j in range(rng.randint(0, max_dups)):
        vid = f"{base_id}-d{j}"
        vrng = _doc_rng(seed, vid)
        vtext = text
        if vrng.random() < truncate_prob:  # overhang case
            side = vrng.randrange(2)
            cut = vrng.randint(1, max(1, len(vtext) // 10))
            vtext = vtext[cut:] if side == 0 else vtext[: len(vtext) - cut]
        vtext = _edit(vrng, vtext, alphabet, vrng.randint(0, max_edits))
        if alphabet == DNA and vrng.random() < rc_prob:  # RC case
            vtext = vtext.translate(_RC)[::-1]
        rows.append({"doc_id": vid, "spans": _split_spans(vrng, vtext)})
        truth.append({"doc_id": vid, "cluster_id": base_id})
    return rows, truth


def _to_tables(rows: list[dict], truth: list[dict]) -> tuple[pa.Table, pa.Table]:
    docs = pa.Table.from_pylist(rows, schema=DOCS_SCHEMA)
    tr = pa.Table.from_pylist(truth, schema=TRUTH_SCHEMA)
    return docs, tr


def interleave_flat_documents(
    flat: pa.Table,
    seed: int = 42,
    max_dups: int = 3,
    max_edits: int = 3,
    truncate_prob: float = 0.15,
) -> tuple[pa.Table, pa.Table]:
    """Driver documents.parquet -> (interleaved docs, truth) tables."""
    ids = flat.column("doc_id").to_pylist()
    texts = flat.column("text").to_pylist()
    alphabet = "abcdefghijklmnopqrstuvwxyz "
    # the driver's flat table contains byte-identical texts under different
    # doc_ids; content-identical bases share one true cluster (canonical =
    # lowest doc_id with that text)
    canon: dict[str, int] = {}
    for i, t in zip(ids, texts):
        canon.setdefault(t, i)
    rows, truth = [], []
    for i, t in zip(ids, texts):
        r, tr = _make_rows(
            f"doc-{i:08d}", t, alphabet, seed, max_dups, max_edits, rc_prob=0.0,
            truncate_prob=truncate_prob,
        )
        rows.extend(r)
        cluster = f"doc-{canon[t]:08d}"
        truth.extend({**row, "cluster_id": cluster} for row in tr)
    return _to_tables(rows, truth)


def dna_corpus(
    n_docs: int = 200,
    seed: int = 42,
    min_len: int = 30,
    max_len: int = 400,
    max_dups: int = 3,
    max_edits: int = 3,
    rc_prob: float = 0.15,
    truncate_prob: float = 0.15,
) -> tuple[pa.Table, pa.Table]:
    """Standalone DNA corpus with RC + overhang duplicate cases."""
    rows, truth = [], []
    for i in range(n_docs):
        base_id = f"doc-{i:08d}"
        rng = _doc_rng(seed, base_id + ":text")
        text = "".join(rng.choice(DNA) for _ in range(rng.randint(min_len, max_len)))
        r, tr = _make_rows(
            base_id, text, DNA, seed, max_dups, max_edits, rc_prob, truncate_prob
        )
        rows.extend(r)
        truth.extend(tr)
    return _to_tables(rows, truth)


def barcoded_reads(
    n_reads: int = 500,
    n_barcodes: int = 24,
    bc_len: int = 24,
    seed: int = 777,
    min_len: int = 120,
    max_len: int = 400,
    max_edits: int = 3,
    rc_prob: float = 0.3,
    unbarcoded_prob: float = 0.1,
) -> tuple[pa.Table, list[tuple[str, bytes]], pa.Table]:
    """Deterministic nanopore-demux-shaped corpus (the reference's flagship
    v2 eval: barcodes planted near read ends, evals nanopore_results.csv).

    Each read is random DNA with (prob 1-unbarcoded_prob) ONE barcode planted
    with <= max_edits seeded edits: forward near the read start (0-8 adapter
    chars before it) or, with ``rc_prob``, reverse-complemented near the read
    end.  Returns (reads, barcodes, truth): reads = (read_id, text); barcodes
    = [(bc_id, seq)]; truth = (read_id, bc_id|'', strand) of the plant.
    Every read reproducible from (seed, read_id) alone (shardable at scale).
    """
    barcodes: list[tuple[str, bytes]] = []
    for b in range(n_barcodes):
        rng = _doc_rng(seed, f"bc-{b:03d}")
        seq = "".join(rng.choice(DNA) for _ in range(bc_len))
        barcodes.append((f"bc-{b:03d}", seq.encode()))
    read_ids, texts, t_bc, t_strand = [], [], [], []
    for i in range(n_reads):
        rid = f"read-{i:08d}"
        rng = _doc_rng(seed, rid)
        body = "".join(rng.choice(DNA) for _ in range(rng.randint(min_len, max_len)))
        bc_id, strand = "", ""
        if rng.random() >= unbarcoded_prob:
            bi = rng.randrange(n_barcodes)
            bc_id = barcodes[bi][0]
            planted = _edit(rng, barcodes[bi][1].decode(), DNA, rng.randint(0, max_edits))
            adapter = "".join(rng.choice(DNA) for _ in range(rng.randint(0, 8)))
            if rng.random() < rc_prob:
                strand = "-"
                body = body + planted.translate(_RC)[::-1] + adapter
            else:
                strand = "+"
                body = adapter + planted + body
        read_ids.append(rid)
        texts.append(body)
        t_bc.append(bc_id)
        t_strand.append(strand)
    reads = pa.table({"read_id": pa.array(read_ids), "text": pa.array(texts)})
    truth = pa.table(
        {
            "read_id": pa.array(read_ids),
            "bc_id": pa.array(t_bc),
            "strand": pa.array(t_strand),
        }
    )
    return reads, barcodes, truth


def truth_pairs(truth: pa.Table) -> set[tuple[str, str]]:
    """All true duplicate pairs (canonical order) from the truth table."""
    by_cluster: dict[str, list[str]] = {}
    for d, c in zip(truth.column("doc_id").to_pylist(), truth.column("cluster_id").to_pylist()):
        by_cluster.setdefault(c, []).append(d)
    out: set[tuple[str, str]] = set()
    for members in by_cluster.values():
        members.sort()
        for i in range(len(members)):
            for j in range(i + 1, len(members)):
                out.add((members[i], members[j]))
    return out
