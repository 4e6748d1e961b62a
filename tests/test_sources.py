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

def test_stream_gz_fasta_multi_chunk(ray_session, tmp_path):
    """A gz FASTA stream-decompresses in bounded chunks: many record-aligned
    tables come out (no whole-file inflate), and records are byte-identical
    to the plain-file chunked path."""
    import random

    from sassy_ray.sources.fasta import read_fasta, stream_gz_records

    rng = random.Random(7)
    recs = []
    for i in range(400):
        n = rng.randint(50, 30_000) if i != 200 else 900_000
        seq = "".join(rng.choice("ACGT") for _ in range(500))
        seq = (seq * (n // 500 + 1))[:n]
        recs.append((f"g{i:04d}", seq))
    raw = []
    for rid, seq in recs:
        raw.append(f">{rid} meta\n")
        for s in range(0, len(seq), 70):
            raw.append(seq[s : s + 70] + "\n")
    payload = "".join(raw).encode()
    plain = tmp_path / "g.fa"
    plain.write_bytes(payload)
    gz = tmp_path / "g.fa.gz"
    gz.write_bytes(gzip.compress(payload))

    # generator yields MANY record-aligned tables, not one whole-file parse
    tables = list(stream_gz_records(str(gz), chunk_bytes=256 * 1024))
    assert len(tables) > 4
    assert sum(t.num_rows for t in tables) == len(recs)

    got = read_fasta(str(gz), chunk_bytes=256 * 1024).to_pandas()
    want = read_fasta(str(plain), chunk_bytes=256 * 1024).to_pandas()
    got = got.sort_values("id").reset_index(drop=True)
    want = want.sort_values("id").reset_index(drop=True)
    assert got.equals(want)


def test_stream_gz_fastq(ray_session, tmp_path):
    """gz FASTQ streaming keeps strict 4-line record alignment even when
    quality lines contain '@'/'+' bytes."""
    import random

    from sassy_ray.sources.fasta import read_fasta

    rng = random.Random(8)
    lines = []
    for i in range(3000):
        n = rng.randint(30, 120)
        seq = "".join(rng.choice("ACGT") for _ in range(n))
        qual = "".join(rng.choice("@+IF5#") for _ in range(n))
        lines.append(f"@s{i:05d}\n{seq}\n+\n{qual}\n")
    payload = "".join(lines).encode()
    gz = tmp_path / "s.fq.gz"
    gz.write_bytes(gzip.compress(payload))
    got = read_fasta(str(gz), chunk_bytes=32 * 1024).to_pandas()
    assert len(got) == 3000
    assert sorted(got["id"]) == [f"s{i:05d}" for i in range(3000)]
    assert (got.sort_values("id")["quality"].str.len().to_numpy()
            == got.sort_values("id")["seq"].str.len().to_numpy()).all()
