"""FASTA/FASTQ sources (reference S1/S2: needletail reader + batching).

``read_fasta`` parses FASTA or FASTQ (gz-aware) into a Dataset of
``(id, seq, quality)`` rows.  Large plain files are split into
record-aligned ~1 MiB byte-range chunks PLANNED FROM FILE SIZE ONLY — each
Ray task seeks into its range, scans forward to the first record boundary
it owns, and parses through the end of its last owned record (ownership =
the chunk containing the record's header start byte).  A 3 GB genome
therefore parallelizes across ~3000 tasks instead of one whole-file parse
(the reference's ~1 MiB ``InputIterator`` batching,
bin/input_iterator.rs:56-206, re-expressed as a chunk plan + map_batches).

Gzip members are not range-seekable, so a ``.gz`` input keeps one
*decompress* task — but that task STREAMS: it inflates ``chunk_bytes`` at a
time and yields a record-aligned table per chunk (``stream_gz_records``),
so peak memory is O(chunk) rather than O(file) and downstream stages
pipeline on the yielded blocks instead of waiting for one whole-file parse
(the reference streams gz through needletail the same way,
bin/input_iterator.rs:65-71).

FASTQ boundary detection inside a chunk uses the standard heuristic
(a line starting ``@`` whose +2 line starts ``+`` and whose seq/qual line
lengths agree) — '@' and '+' are legal quality characters, so a bare
line-start test would misfire.
"""

from __future__ import annotations

import gzip
import os

import pyarrow as pa

__all__ = [
    "parse_fasta_bytes",
    "read_fasta",
    "plan_chunks",
    "parse_chunk",
    "stream_gz_records",
]

DEFAULT_CHUNK_BYTES = 1 << 20


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


# ---------------------------------------------------------------------------
# chunked range reads
# ---------------------------------------------------------------------------


def _expand_paths(paths) -> list[str]:
    if isinstance(paths, (str, os.PathLike)):
        paths = [paths]
    out: list[str] = []
    for p in paths:
        p = os.fspath(p)
        if os.path.isdir(p):
            out.extend(
                os.path.join(p, f) for f in sorted(os.listdir(p)) if not f.startswith(".")
            )
        else:
            out.append(p)
    return out


def _is_gzip(path: str) -> bool:
    """Sniff the 2-byte gzip magic — a gzipped file WITHOUT a .gz extension
    must not be byte-range chunked (ranges of a gzip stream parse as
    garbage, silently yielding wrong records)."""
    try:
        with open(path, "rb") as f:
            return f.read(2) == b"\x1f\x8b"
    except OSError:
        return False


def plan_chunks(paths, chunk_bytes: int = DEFAULT_CHUNK_BYTES) -> list[dict]:
    """Byte-range chunk plan from file sizes only (no data read on the
    driver, except a 2-byte gzip-magic sniff on large files).  gz files and
    small files become single whole-file chunks."""
    plan: list[dict] = []
    for path in _expand_paths(paths):
        size = os.path.getsize(path)
        if path.endswith(".gz") or size <= 2 * chunk_bytes or _is_gzip(path):
            plan.append({"path": path, "start": 0, "end": -1})
            continue
        start = 0
        while start < size:
            end = min(size, start + chunk_bytes)
            plan.append({"path": path, "start": start, "end": end})
            start = end
    return plan


def _find_fastq_record(data: bytes, lo: int, hi: int) -> int:
    """First FASTQ record start in line positions [lo, hi), else -1."""
    pos = lo
    n = len(data)
    while 0 <= pos < hi:
        if data[pos : pos + 1] == b"@":
            l1 = data.find(b"\n", pos)
            l2 = data.find(b"\n", l1 + 1) if l1 != -1 else -1
            l3 = data.find(b"\n", l2 + 1) if l2 != -1 else -1
            if l2 != -1 and data[l2 + 1 : l2 + 2] == b"+":
                l4 = data.find(b"\n", l3 + 1) if l3 != -1 else -1
                seq_len = l2 - l1 - 1
                qual_len = (l4 if l4 != -1 else n) - l3 - 1
                if l3 == -1 or seq_len == qual_len:
                    return pos
        nl = data.find(b"\n", pos)
        if nl == -1:
            return -1
        pos = nl + 1
    return -1


def parse_chunk(path: str, start: int, end: int) -> pa.Table:
    """Parse the records whose header starts inside [start, end) of the file
    (end == -1 -> whole file)."""
    if end == -1:
        with open(path, "rb") as f:
            return parse_fasta_bytes(f.read())
    size = os.path.getsize(path)
    with open(path, "rb") as f:
        if start > 0:
            f.seek(start - 1)
            prev = f.read(1)
        else:
            prev = b"\n"
        data = f.read(end - start)
        own = end - start  # header starts before this offset are owned

        # peek format from the file head (chunk 0 carries it; later chunks
        # re-peek the first byte of the file)
        if start == 0:
            head = data[:1]
        else:
            f2 = open(path, "rb")
            head = f2.read(1)
            f2.close()
        fastq = head == b"@"
        marker = b"\n@" if fastq else b"\n>"

        # extend until the first record boundary AT/AFTER the owned region is
        # visible (the last owned record may run past the chunk end)
        def next_boundary(d: bytes, from_pos: int) -> int:
            if fastq:
                return _find_fastq_record(d, _next_line(d, from_pos), len(d))
            i = d.find(marker, max(0, from_pos - 1))
            return i + 1 if i != -1 else -1

        def _next_line(d: bytes, p: int) -> int:
            if p == 0:
                return 0
            nl = d.find(b"\n", p - 1)
            return nl + 1 if nl != -1 else len(d)

        cut = next_boundary(data, own)
        while cut == -1 and start + len(data) < size:
            more = f.read(max(end - start, 1 << 20))
            if not more:
                break
            data += more
            cut = next_boundary(data, own)

        # first OWNED record start
        if not fastq:
            if data[:1] == b">" and prev == b"\n":
                first = 0
            else:
                i = data.find(marker, 0, own)
                first = i + 1 if i != -1 else -1
        else:
            lo = 0 if prev == b"\n" else _next_line(data, 1)
            first = _find_fastq_record(data, lo, own)
        if first == -1 or first >= own:
            return parse_fasta_bytes(b"")
        return parse_fasta_bytes(data[first : cut if cut != -1 else len(data)])


def _cut_complete_records(buf: bytes, fastq: bool, at_eof: bool):
    """Split ``buf`` into (complete-records payload, carry).

    FASTA: complete records end where the LAST header in the buffer starts
    (that final record may still be growing).  FASTQ: records are strictly
    4 lines, so emit the longest 4-line-multiple prefix of complete lines.
    At EOF everything is complete.
    """
    if at_eof:
        return buf, b""
    if not fastq:
        i = buf.rfind(b"\n>")
        if i == -1:
            # zero or one header seen so far: keep buffering
            return b"", buf
        return buf[: i + 1], buf[i + 1 :]
    # FASTQ: count terminated lines, keep a multiple of 4
    nlines = buf.count(b"\n")
    keep = nlines - (nlines % 4)
    if keep == 0:
        return b"", buf
    pos = -1
    for _ in range(keep):
        pos = buf.index(b"\n", pos + 1)
    return buf[: pos + 1], buf[pos + 1 :]


def stream_gz_records(path: str, chunk_bytes: int = DEFAULT_CHUNK_BYTES):
    """Stream-decompress a gzip FASTA/FASTQ and yield record-aligned
    ``pa.Table`` chunks.  Peak memory is O(chunk_bytes + longest record),
    never O(inflated file) — the whole-file ``gzip.decompress`` fallback
    this replaces held a 3 GB genome in one task's heap."""
    with gzip.open(path, "rb") as f:
        head = f.read(1)
        fastq = head == b"@"
        buf = head
        while True:
            piece = f.read(chunk_bytes)
            at_eof = not piece
            buf += piece
            out, buf = _cut_complete_records(buf, fastq, at_eof)
            if out:
                yield parse_fasta_bytes(out)
            if at_eof:
                break


def read_fasta(paths, chunk_bytes: int = DEFAULT_CHUNK_BYTES):
    """paths (file or dir) -> Dataset(id, seq, quality); large plain files
    stream as record-aligned byte-range chunks, one Ray task each; gz files
    stream-decompress in one task that yields record-aligned blocks."""
    import ray.data as rd

    plan = plan_chunks(paths, chunk_bytes)
    # one metadata row per block so every chunk is its own task
    ds = rd.from_items(plan, override_num_blocks=max(1, len(plan)))

    def parse(batch: pa.Table):
        yielded = False
        for p, s, e in zip(
            batch.column("path").to_pylist(),
            batch.column("start").to_pylist(),
            batch.column("end").to_pylist(),
        ):
            if int(e) == -1 and (p.endswith(".gz") or _is_gzip(p)):
                for tbl in stream_gz_records(p, chunk_bytes):
                    yielded = True
                    yield tbl
            else:
                yielded = True
                yield parse_chunk(p, int(s), int(e))
        if not yielded:
            yield parse_fasta_bytes(b"")  # keep a stable empty schema

    # one task per chunk row: the chunk plan IS the parallelism plan
    return ds.map_batches(parse, batch_format="pyarrow", batch_size=1)
