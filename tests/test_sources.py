"""FASTA/FASTQ source, validation, pretty printer, CachedRev."""

from __future__ import annotations

import gzip

import pytest

from sassy_ray.functions.pretty import pretty_print_match
from sassy_ray.kernel.profiles import get_profile
from sassy_ray.kernel.search import CachedRev, Searcher
from sassy_ray.sources.fasta import parse_fasta_bytes


def test_fasta_multiline():
    t = parse_fasta_bytes(b">r1 desc more\nACGT\nACGT\n>r2\nTTTT\n")
    assert t.to_pylist() == [
        {"id": "r1", "seq": "ACGTACGT", "quality": ""},
        {"id": "r2", "seq": "TTTT", "quality": ""},
    ]


def test_fastq_gz():
    data = gzip.compress(b"@q1\nACGT\n+\nIIII\n@q2\nGGGG\n+\nFFFF\n")
    t = parse_fasta_bytes(data)
    assert t.column("quality").to_pylist() == ["IIII", "FFFF"]


def test_read_fasta_dataset(ray_session, tmp_path):
    from sassy_ray.sources.fasta import read_fasta

    p = tmp_path / "x.fa"
    p.write_text(">a\nACGTACGT\n>b\nTTTTT\n")
    ds = read_fasta(str(p))
    rows = sorted(ds.to_pandas().itertuples(index=False), key=lambda r: r.id)
    assert [r.seq for r in rows] == ["ACGTACGT", "TTTTT"]


def test_read_fasta_chunked_large(ray_session, tmp_path):
    """A large FASTA splits into many record-aligned byte-range chunks and
    still yields exactly the whole-file records (incl. a multi-MB sequence
    spanning many chunks)."""
    import random

    from sassy_ray.sources.fasta import parse_fasta_bytes, plan_chunks, read_fasta

    rng = random.Random(5)
    recs = []
    for i in range(300):
        n = rng.randint(50, 40_000) if i != 150 else 3_000_000
        seq = "".join(rng.choice("ACGT") for _ in range(1000))
        seq = (seq * (n // 1000 + 1))[:n]
        recs.append((f"r{i:04d}", seq))
    p = tmp_path / "big.fa"
    with open(p, "w") as f:
        for rid, seq in recs:
            f.write(f">{rid} extra meta\n")
            for s in range(0, len(seq), 80):
                f.write(seq[s : s + 80] + "\n")
    plan = plan_chunks(str(p))
    assert len(plan) > 4  # actually split
    got = read_fasta(str(p)).to_pandas().sort_values("id").reset_index(drop=True)
    assert len(got) == len(recs)
    want = {rid: seq for rid, seq in recs}
    for rid, seq in zip(got["id"], got["seq"]):
        assert want[rid] == seq


def test_read_fastq_chunked(ray_session, tmp_path):
    """Chunked FASTQ range reads reproduce the whole-file parse."""
    import random

    from sassy_ray.sources.fasta import read_fasta

    rng = random.Random(6)
    lines = []
    for i in range(5000):
        n = rng.randint(30, 120)
        seq = "".join(rng.choice("ACGT") for _ in range(n))
        # qualities deliberately include '@' and '+' (legal Phred chars)
        qual = "".join(rng.choice("@+IF5#") for _ in range(n))
        lines.append(f"@q{i:05d}\n{seq}\n+\n{qual}\n")
    p = tmp_path / "big.fq"
    p.write_text("".join(lines))
    got = read_fasta(str(p), chunk_bytes=64 * 1024).to_pandas()
    assert len(got) == 5000
    assert sorted(got["id"]) == [f"q{i:05d}" for i in range(5000)]


def test_valid_seq():
    dna = get_profile("dna")
    assert dna.valid_seq(b"ACGTacgt")
    assert not dna.valid_seq(b"ACGTN")
    iupac = get_profile("iupac")
    assert iupac.valid_seq(b"ACGTNRYSWKMBDHVX")
    assert not iupac.valid_seq(b"ACGT1")


def test_cached_rev_and_pretty():
    s = Searcher("dna", rc=True)
    text = CachedRev(b"CCCATCACCC")
    ms = s.search(b"ATCG", text, 1)
    assert len(ms) == 2
    out = pretty_print_match(b"ATCG", b"CCCATCACCC", ms[0])
    lines = out.splitlines()
    assert lines[1] == "ATCG"
    assert lines[2] == "|||."
    assert lines[3] == "ATCA"
    out_rc = pretty_print_match(b"ATCG", b"CCCATCACCC", ms[1])
    assert "cost=1" in out_rc.splitlines()[0]
