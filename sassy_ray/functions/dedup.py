"""Near-duplicate detection families over the documents table — distributed.

All three reuse the ER machinery (blocking -> salted pair gen -> vectorized
verify -> connected components); only the signature and the verify predicate
differ:

- MinHash-LSH + exact shingle-Jaccard verify;
- SimHash (64-bit) + Hamming<=d verify via 16-bit band buckets;
- n-gram Jaccard is the verify step of the MinHash path (exposed standalone).

Verification runs inside ``map_batches`` with the doc texts broadcast (same
pattern as ER pair scoring) — no driver-side loops.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from sassy_ray.stages.blocking import BlockingConfig, minhash_block_rows
from sassy_ray.stages.clustering import connected_components
from sassy_ray.stages.pairs import PairGenConfig, make_pairs_dataset

__all__ = ["minhash_neardup_clusters", "simhash_neardup_clusters", "jaccard_verify_batch"]


def _shingles(text: str, q: int) -> set:
    if len(text) < q:
        return {text}
    return {text[i : i + q] for i in range(len(text) - q + 1)}


def jaccard_verify_batch(batch: pa.Table, docs_ref, q: int = 12, tau: float = 0.5) -> pa.Table:
    """(doc_id_a, doc_id_b) pairs -> + jaccard + is_match columns."""
    import ray

    from sassy_ray.stages.scoring import _resolve_docs

    docs = _resolve_docs(docs_ref)
    a_ids = batch.column("doc_id_a").to_pylist()
    b_ids = batch.column("doc_id_b").to_pylist()
    jac = np.zeros(len(a_ids))
    for i, (a, b) in enumerate(zip(a_ids, b_ids)):
        sa = _shingles(docs.get(a, b"").decode(), q)
        sb = _shingles(docs.get(b, b"").decode(), q)
        inter = len(sa & sb)
        jac[i] = inter / max(1, len(sa) + len(sb) - inter)
    return pa.table(
        {
            "doc_id_a": batch.column("doc_id_a"),
            "doc_id_b": batch.column("doc_id_b"),
            "jaccard": pa.array(np.round(jac, 6)),
            "is_match": pa.array(jac >= tau),
        }
    )


def _text_ds_to_broadcast(ds, id_col: str, text_col: str):
    import ray

    tbl = pa.concat_tables(
        ds.map_batches(
            lambda b: pa.table(
                {"doc_id": b.column(id_col).cast(pa.string()), "text": b.column(text_col)}
            ),
            batch_format="pyarrow",
        ).iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    return ray.put(tbl)


def minhash_neardup_clusters(
    ds,
    q: int = 12,
    tau: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    bands: int = 16,
    num_perm: int = 32,
):
    """documents Dataset -> (doc_id, cluster_id) near-dup clusters.

    shingle -> minhash -> band groupby -> salted pairs -> exact Jaccard
    verify (broadcast texts) -> connected components.
    """
    str_ds = ds.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column(id_col).cast(pa.string()), "text": b.column(text_col)}
        ),
        batch_format="pyarrow",
    ).materialize()
    cfg = BlockingConfig(q=q, bands=bands, num_perm=num_perm)
    block = str_ds.map_batches(lambda b: minhash_block_rows(b, cfg), batch_format="pyarrow")
    pairs = make_pairs_dataset(block, PairGenConfig())
    docs_ref = _text_ds_to_broadcast(str_ds, "doc_id", "text")
    verified = pairs.map_batches(
        lambda b: jaccard_verify_batch(b, docs_ref, q, tau),
        batch_format="pyarrow",
        batch_size=8192,
    )
    edges = verified.map_batches(
        lambda b: b.filter(b.column("is_match")), batch_format="pyarrow"
    ).select_columns(["doc_id_a", "doc_id_b"])
    nodes = str_ds.select_columns(["doc_id"])
    return connected_components(edges, nodes)


def simhash_batch(batch: pa.Table, text_col: str = "text", seed: int = 42) -> pa.Table:
    """64-bit SimHash over word tokens, vectorized per batch."""
    texts = batch.column(text_col).to_pylist()
    out = np.zeros(len(texts), dtype=np.uint64)
    for i, t in enumerate(texts):
        toks = (t or "").split()
        if not toks:
            continue
        hs = pd.util.hash_pandas_object(pd.Series(toks), index=False).to_numpy().astype(np.uint64)
        bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1)).astype(
            np.int64
        )
        acc = np.where(bits.sum(axis=0) * 2 > len(toks), 1, 0).astype(np.uint64)
        out[i] = np.bitwise_or.reduce(acc << np.arange(64, dtype=np.uint64))
    return pa.table(
        {
            "doc_id": batch.column("doc_id").cast(pa.string()),
            "simhash": pa.array(out, pa.uint64()),
        }
    )


def simhash_neardup_clusters(
    ds, max_hamming: int = 3, id_col: str = "doc_id", text_col: str = "text"
):
    """SimHash near-dup via 4x16-bit band buckets + Hamming verify."""
    str_ds = ds.map_batches(
        lambda b: pa.table(
            {"doc_id": b.column(id_col).cast(pa.string()), "text": b.column(text_col)}
        ),
        batch_format="pyarrow",
    ).materialize()
    sh = str_ds.map_batches(lambda b: simhash_batch(b, "text"), batch_format="pyarrow").materialize()

    def explode_bands(b: pa.Table) -> pa.Table:
        h = b.column("simhash").to_numpy()
        ids = b.column("doc_id")
        keys, out_idx = [], []
        for band in range(4):
            part = (h >> np.uint64(16 * band)) & np.uint64(0xFFFF)
            keys.append(part.astype(np.uint64) | (np.uint64(band) << np.uint64(32)))
            out_idx.append(np.arange(len(h)))
        return pa.table(
            {
                "block_key": pa.array(np.concatenate(keys), pa.uint64()),
                "doc_id": ids.take(pa.array(np.concatenate(out_idx))),
            }
        )

    block = sh.map_batches(explode_bands, batch_format="pyarrow")
    pairs = make_pairs_dataset(block, PairGenConfig())

    import ray

    sh_tbl = pa.concat_tables(sh.iter_batches(batch_size=65536, batch_format="pyarrow"))
    sh_ref = ray.put(sh_tbl)

    _POP = np.array([bin(x).count("1") for x in range(65536)], dtype=np.int64)

    def verify(b: pa.Table) -> pa.Table:
        tbl = ray.get(sh_ref)
        lut = dict(zip(tbl.column("doc_id").to_pylist(), tbl.column("simhash").to_numpy()))
        a = np.array([lut[x] for x in b.column("doc_id_a").to_pylist()], dtype=np.uint64)
        bb = np.array([lut[x] for x in b.column("doc_id_b").to_pylist()], dtype=np.uint64)
        x = a ^ bb
        ham = (
            _POP[(x & np.uint64(0xFFFF)).astype(np.int64)]
            + _POP[((x >> np.uint64(16)) & np.uint64(0xFFFF)).astype(np.int64)]
            + _POP[((x >> np.uint64(32)) & np.uint64(0xFFFF)).astype(np.int64)]
            + _POP[((x >> np.uint64(48)) & np.uint64(0xFFFF)).astype(np.int64)]
        )
        return pa.table(
            {
                "doc_id_a": b.column("doc_id_a"),
                "doc_id_b": b.column("doc_id_b"),
                "hamming": pa.array(ham),
                "is_match": pa.array(ham <= max_hamming),
            }
        )

    verified = pairs.map_batches(verify, batch_format="pyarrow", batch_size=8192)
    edges = verified.map_batches(
        lambda b: b.filter(b.column("is_match")), batch_format="pyarrow"
    ).select_columns(["doc_id_a", "doc_id_b"])
    return connected_components(edges, str_ds.select_columns(["doc_id"]))
