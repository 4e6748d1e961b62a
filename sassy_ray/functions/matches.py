"""Match output formatting — the reference's TSV writer semantics.

8-column match row (bin/grep.rs:467-471, README.md:227-239):
    pat_id, text_id, cost, strand, start, end, match_region, cigar
- ``match_region``: text slice; reverse-complemented for '-' strand unless
  ``sam`` mode (bin/grep.rs:738-746);
- ``cigar``: pattern-direction, reversed for '-' strand in ``sam`` mode
  (bin/grep.rs:749-757).
"""

from __future__ import annotations

import pyarrow as pa

from sassy_ray.kernel.profiles import get_profile
from sassy_ray.kernel.types import RC, Match, cigar_ops, cigar_to_string

__all__ = ["format_match_region", "format_cigar", "matches_to_table", "MATCH_SCHEMA"]

MATCH_SCHEMA = pa.schema(
    [
        ("pat_id", pa.string()),
        ("text_id", pa.string()),
        ("cost", pa.int32()),
        ("strand", pa.string()),
        ("start", pa.int64()),
        ("end", pa.int64()),
        ("match_region", pa.string()),
        ("cigar", pa.string()),
    ]
)


def format_match_region(text: bytes, m: Match, alphabet: str, sam: bool = False) -> bytes:
    sl = text[max(0, m.text_start) : m.text_end]
    if m.strand == RC and not sam:
        return get_profile(alphabet).reverse_complement(sl)
    return sl


def format_cigar(m: Match, sam: bool = False) -> str:
    if m.strand == RC and sam:
        return cigar_to_string(cigar_ops(m.cigar)[::-1])
    return m.cigar


def matches_to_table(
    rows: list[tuple[str, str, bytes, Match]], alphabet: str, sam: bool = False
) -> pa.Table:
    """(pat_id, text_id, text, Match) tuples -> the 8-col Arrow table."""
    cols: dict[str, list] = {k: [] for k in MATCH_SCHEMA.names}
    for pat_id, text_id, text, m in rows:
        cols["pat_id"].append(pat_id)
        cols["text_id"].append(text_id)
        cols["cost"].append(m.cost)
        cols["strand"].append(m.strand)
        cols["start"].append(m.text_start)
        cols["end"].append(m.text_end)
        cols["match_region"].append(format_match_region(text, m, alphabet, sam).decode())
        cols["cigar"].append(format_cigar(m, sam))
    return pa.table(
        {name: pa.array(cols[name], MATCH_SCHEMA.field(name).type) for name in MATCH_SCHEMA.names}
    )
