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
