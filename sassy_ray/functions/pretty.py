"""Pretty-print a match alignment (the reference's stdout renderer,
/root/reference/src/pretty_print.rs:13-230 — debug utility, not a stage).

Renders three lines — pattern, connector, text slice — with '|' for matches,
'.' for substitutions and gaps for indels, walked from the CIGAR in pattern
direction; RC matches render against rc(text[start:end]) per the Match
contract (search.rs:27-31).
"""

from __future__ import annotations

from sassy_ray.kernel.profiles import get_profile
from sassy_ray.kernel.types import RC, Match, cigar_ops

__all__ = ["pretty_print_match"]


def pretty_print_match(pattern: bytes, text: bytes, m: Match, alphabet: str = "dna") -> str:
    region = text[max(0, m.text_start) : m.text_end]
    if m.strand == RC:
        region = get_profile(alphabet).reverse_complement(region)
    p = pattern[m.pattern_start : m.pattern_end].decode(errors="replace")
    t = region.decode(errors="replace")
    top, mid, bot = [], [], []
    pi = ti = 0
    for op in cigar_ops(m.cigar):
        if op == "=":
            top.append(p[pi]); mid.append("|"); bot.append(t[ti]); pi += 1; ti += 1
        elif op == "X":
            top.append(p[pi]); mid.append("."); bot.append(t[ti]); pi += 1; ti += 1
        elif op == "I":
            top.append(p[pi]); mid.append(" "); bot.append("-"); pi += 1
        elif op == "D":
            top.append("-"); mid.append(" "); bot.append(t[ti]); ti += 1
    header = (
        f"{m.strand} cost={m.cost} text[{m.text_start}:{m.text_end}] "
        f"pattern[{m.pattern_start}:{m.pattern_end}] {m.cigar}"
    )
    return "\n".join([header, "".join(top), "".join(mid), "".join(bot)])
