"""Match record + CIGAR helpers.

Mirrors the reference's ``Match`` struct (``/root/reference/src/search.rs:20-62``):
all indices 0-based, ``text_end``/``pattern_end`` exclusive; for RC matches the
coordinates are in *forward-text* space and the pattern matches
``rc(text[text_start:text_end])``; the CIGAR is always read in pattern
direction with ops ``=`` match, ``X`` sub, ``I`` extra-in-pattern,
``D`` extra-in-text.
"""

from __future__ import annotations

from dataclasses import dataclass, field

FWD = "+"
RC = "-"

# sentinel for without_trace coordinates (reference uses usize::MAX)
UNSET = -1


def cigar_to_string(ops: list[str]) -> str:
    """Run-length encode a list of single-char ops: ['=','=','X'] -> '2=1X'."""
    out = []
    i = 0
    n = len(ops)
    while i < n:
        j = i
        while j < n and ops[j] == ops[i]:
            j += 1
        out.append(f"{j - i}{ops[i]}")
        i = j
    return "".join(out)


def cigar_ops(cigar: str) -> list[str]:
    """Expand '2=1X' -> ['=','=','X']."""
    out: list[str] = []
    num = ""
    for ch in cigar:
        if ch.isdigit():
            num += ch
        else:
            out.extend(ch * int(num or "1"))
            num = ""
    return out


@dataclass
class Match:
    pattern_idx: int = 0
    text_idx: int = 0
    text_start: int = UNSET
    text_end: int = UNSET
    pattern_start: int = UNSET
    pattern_end: int = UNSET
    cost: int = 0
    strand: str = FWD
    cigar: str = ""
    _ops: list[str] = field(default_factory=list, repr=False, compare=False)

    def key(self) -> tuple:
        return (
            self.pattern_idx,
            self.text_idx,
            self.text_start,
            self.text_end,
            self.pattern_start,
            self.pattern_end,
            self.cost,
            self.strand,
            self.cigar,
        )

    def to_path(self) -> list[tuple[int, int]]:
        """Expand the cigar to (pattern_pos, text_pos) coordinates
        (reference ``Match::to_path``, search.rs:80-103)."""
        if self.strand == RC:
            tpos, sign = self.text_end - 1, -1
        else:
            tpos, sign = self.text_start, 1
        ppos = self.pattern_start
        path = [(ppos, tpos)]
        for op in cigar_ops(self.cigar):
            if op in "=X":
                ppos += 1
                tpos += sign
            elif op == "I":
                ppos += 1
            elif op == "D":
                tpos += sign
            path.append((ppos, tpos))
        path.pop()
        return path
