"""Barcode demux pipeline: planted-barcode recovery + oracle equivalence.

The reference's flagship v2 eval shape (nanopore demux,
evals/src/sassy2/nanopore_results.csv): barcodes planted near read ends,
per-read best assignment.
"""

import numpy as np
import pyarrow as pa

from sassy_ray.kernel.oracle import OracleSearcher
from sassy_ray.pipelines.demux import DemuxConfig, demux_batch, run_demux
from sassy_ray.sources.synth import barcoded_reads


def _best_by_oracle(reads: pa.Table, barcodes, k):
    """Independent per-read argmin over pure-DP matches."""
    osr = OracleSearcher("dna", rc=True)
    out = {}
    for rid, text in zip(
        reads.column("read_id").to_pylist(), reads.column("text").to_pylist()
    ):
        cands = []
        for bid, bseq in barcodes:
            for m in osr.search(bseq, text.encode(), k):
                cands.append((m.cost, m.text_start, bid, m.strand, m.text_end))
        if cands:
            out[rid] = min(cands)
    return out


def test_demux_batch_matches_oracle():
    reads, barcodes, _truth = barcoded_reads(n_reads=60, n_barcodes=8, seed=123)
    cfg = DemuxConfig(barcodes, k=3)
    got = demux_batch(reads, cfg)
    want = _best_by_oracle(reads, barcodes, 3)
    got_map = {
        r["read_id"]: (r["cost"], r["start"], r["barcode"], r["strand"], r["end"])
        for r in got.to_pylist()
    }
    assert got_map == want


def test_demux_recovers_planted_barcodes():
    reads, barcodes, truth = barcoded_reads(n_reads=80, n_barcodes=12, seed=5)
    got = demux_batch(reads, DemuxConfig(barcodes, k=3))
    got_map = {r["read_id"]: (r["barcode"], r["strand"]) for r in got.to_pylist()}
    planted = {
        r["read_id"]: (r["bc_id"], r["strand"])
        for r in truth.to_pylist()
        if r["bc_id"]
    }
    # every planted barcode must be found (<=3 edits at k=3); the assignment
    # may occasionally prefer a coincidental cheaper hit, so require >=95%
    # agreement and 100% recall of assignment itself
    assert set(planted) <= set(got_map)
    agree = sum(got_map[rid] == bc for rid, bc in planted.items())
    assert agree / len(planted) >= 0.95


def test_run_demux_distributed(ray_session):
    import ray.data as rd

    reads, barcodes, _truth = barcoded_reads(n_reads=50, n_barcodes=6, seed=9)
    cfg = DemuxConfig(barcodes, k=3)
    ds = rd.from_arrow(reads).repartition(4)
    got = run_demux(ds, cfg, batch_size=8).to_pandas()
    # distributed output == single-batch output, globally ordered by read_id
    local = demux_batch(reads, cfg).to_pandas().sort_values("read_id").reset_index(drop=True)
    assert got.reset_index(drop=True).equals(local)
    assert list(got["read_id"]) == sorted(got["read_id"])


def test_demux_tiebreak_total_order():
    # two identical barcodes under different ids: the lexicographically
    # smaller barcode id must win at equal (cost, start)
    bc = b"ACGTACGTACGTACGTACGTACGT"
    reads = pa.table(
        {"read_id": ["r0"], "text": ["TTTT" + bc.decode() + "TTTTTTTT"]}
    )
    got = demux_batch(reads, DemuxConfig([("bc-b", bc), ("bc-a", bc)], k=1))
    assert got.column("barcode").to_pylist() == ["bc-a"]
    assert got.column("cost").to_pylist() == [0]
