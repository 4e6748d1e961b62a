"""FASTA/FASTQ sources (reference S1/S2: needletail reader + batching).

``read_fasta`` parses FASTA or FASTQ (gz-aware) into a Dataset of
``(id, seq[, quality])`` rows via ``read_binary_files`` + a vectorized
parser ``flat_map``-style batch fn.  Ray's block formation replaces the
reference's ~1 MiB ``InputIterator`` batching (bin/input_iterator.rs:56-206);
records per block are bounded with ``target_max_block_size`` rather than a
hand-rolled batcher.
"""

from __future__ import annotations

import gzip
import io

import pyarrow as pa

__all__ = ["parse_fasta_bytes", "read_fasta"]


def parse_fasta_bytes(data: bytes) -> pa.Table:
    """Parse FASTA or FASTQ payload -> (id, seq, quality) table."""
    if data[:2] == b"\x1f\x8b":
        data = gzip.decompress(data)
    ids: list[str] = []
    seqs: list[str] = []
    quals: list[str] = []
    if data.lstrip().startswith(b"@"):  # FASTQ
        lines = data.split(b"\n")
        i = 0
        while i + 3 < len(lines) + 1 and i < len(lines):
            header = lines[i].strip()
            if not header:
                i += 1
                continue
            if not header.startswith(b"@"):
                raise ValueError(f"bad FASTQ header: {header[:30]!r}")
            ids.append(header[1:].split()[0].decode())
            seqs.append(lines[i + 1].strip().decode())
            quals.append(lines[i + 3].strip().decode() if i + 3 < len(lines) else "")
            i += 4
    else:  # FASTA (multi-line sequences)
        cur_id = None
        cur: list[bytes] = []
        for line in data.split(b"\n"):
            line = line.strip()
            if not line:
                continue
            if line.startswith(b">"):
                if cur_id is not None:
                    ids.append(cur_id)
                    seqs.append(b"".join(cur).decode())
                    quals.append("")
                cur_id = line[1:].split()[0].decode()
                cur = []
            else:
                cur.append(line)
        if cur_id is not None:
            ids.append(cur_id)
            seqs.append(b"".join(cur).decode())
            quals.append("")
    return pa.table(
        {
            "id": pa.array(ids, pa.string()),
            "seq": pa.array(seqs, pa.string()),
            "quality": pa.array(quals, pa.string()),
        }
    )


def read_fasta(paths):
    """paths (file or dir) -> Dataset(id, seq, quality)."""
    import ray.data as rd

    ds = rd.read_binary_files(paths, include_paths=True)

    def parse(batch: pa.Table) -> pa.Table:
        tables = [parse_fasta_bytes(b) for b in batch.column("bytes").to_pylist()]
        return pa.concat_tables(tables) if tables else parse_fasta_bytes(b"")

    return ds.map_batches(parse, batch_format="pyarrow")
