"""Alphabet profiles: char equality, complement, validation.

Reproduces the observable semantics of the reference profiles
(``/root/reference/src/profiles/ascii.rs:13-184``,
``/root/reference/src/profiles/dna.rs:14-135``,
``/root/reference/src/profiles/iupac.rs:13-316``) as NumPy lookup tables:

- ``match_matrix``: 256x256 bool — ``match_matrix[a, b]`` iff byte ``a``
  matches byte ``b`` under the profile.
- ``complement_lut`` / ``rc`` — byte-level complement (reverse-complement =
  ``complement_lut[seq][::-1]``).
- ``valid_lut`` — per-byte validity for ``valid_seq``.
"""

from __future__ import annotations

import numpy as np

__all__ = ["Profile", "get_profile", "PROFILES", "reverse_complement"]

_ALL = np.arange(256, dtype=np.uint8)


def _iupac_code32() -> np.ndarray:
    """4-bit nibble codes indexed by ``byte & 0x1F``; 255 = invalid.

    Invalid chars AND-match everything (255 & x != 0), exactly like the
    reference's ``encode_char`` (iupac.rs:146-148, 281-316).
    """
    A, C, T, G = 1, 2, 4, 8
    t = np.full(32, 255, dtype=np.uint16)

    def s(ch: str, v: int) -> None:
        t[ord(ch) & 0x1F] = v

    s("A", A)
    s("C", C)
    s("T", T)
    s("U", T)
    s("G", G)
    s("N", A | C | T | G)
    s("R", A | G)
    s("Y", C | T)
    s("S", G | C)
    s("W", A | T)
    s("K", G | T)
    s("M", A | C)
    s("B", C | G | T)
    s("D", A | G | T)
    s("H", A | C | T)
    s("V", A | C | G)
    s("X", 0)
    return t


def _pairs_to_lut(pairs: dict[str, str], default_identity: bool) -> np.ndarray:
    lut = _ALL.copy() if default_identity else _ALL.copy()
    for a, b in pairs.items():
        lut[ord(a)] = ord(b)
    return lut


_DNA_RC_PAIRS = {"A": "T", "C": "G", "T": "A", "G": "C"}
_IUPAC_RC_PAIRS = {
    **_DNA_RC_PAIRS,
    "a": "t",
    "c": "g",
    "t": "a",
    "g": "c",
    "R": "Y",
    "Y": "R",
    "S": "S",
    "W": "W",
    "K": "M",
    "M": "K",
    "B": "V",
    "D": "H",
    "H": "D",
    "V": "B",
    "N": "N",
    "X": "X",
    "r": "y",
    "y": "r",
    "s": "s",
    "w": "w",
    "k": "m",
    "m": "k",
    "b": "v",
    "d": "h",
    "h": "d",
    "v": "b",
    "n": "n",
    "x": "x",
}


class Profile:
    """One alphabet's semantics, as dense byte-level lookup tables."""

    def __init__(
        self,
        name: str,
        match_matrix: np.ndarray,
        valid_lut: np.ndarray,
        complement_lut: np.ndarray | None,
        supports_overhang: bool,
        n_lut: np.ndarray | None = None,
        canon_lut: np.ndarray | None = None,
    ) -> None:
        self.name = name
        self.match_matrix = match_matrix  # (256, 256) bool
        self.valid_lut = valid_lut  # (256,) bool
        self.complement_lut = complement_lut  # (256,) uint8 or None
        self.supports_overhang = supports_overhang
        self.supports_rc = complement_lut is not None
        # equality-class shortcut: when set, match_matrix[a, b] ==
        # (canon_lut[a] == canon_lut[b]) — lets the native PEQ builder run
        # O(m) per pattern instead of O(m x alphabet).  None for profiles
        # whose match relation is not an equivalence (IUPAC nibble-AND).
        self.canon_lut = canon_lut  # (256,) uint8 or None
        # bytes that count as 'N' for the N-fraction filter (n_filter.rs:27-29:
        # case-insensitive 'N', all profiles)
        if n_lut is None:
            n_lut = np.zeros(256, dtype=bool)
            n_lut[ord("N")] = n_lut[ord("n")] = True
        self.n_lut = n_lut

    # -- scalar-ish helpers (used by oracle + pair utilities) ---------------

    def is_match(self, a: int, b: int) -> bool:
        return bool(self.match_matrix[a, b])

    def matches(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Vectorized is_match for same-shape uint8 arrays."""
        return self.match_matrix[a, b]

    def valid_seq(self, seq: bytes | np.ndarray) -> bool:
        arr = np.frombuffer(seq, dtype=np.uint8) if isinstance(seq, (bytes, bytearray)) else seq
        return bool(self.valid_lut[arr].all()) if arr.size else True

    def complement(self, seq: bytes) -> bytes:
        if self.complement_lut is None:
            raise ValueError(f"profile {self.name!r} does not support complement")
        arr = np.frombuffer(seq, dtype=np.uint8)
        return self.complement_lut[arr].tobytes()

    def reverse_complement(self, seq: bytes) -> bytes:
        if self.complement_lut is None:
            raise ValueError(f"profile {self.name!r} does not support reverse_complement")
        arr = np.frombuffer(seq, dtype=np.uint8)
        return self.complement_lut[arr][::-1].tobytes()

    def peq_table(self, pattern: bytes) -> np.ndarray:
        """Bit-parallel pattern-eq table: (256, n_limbs) uint64.

        ``peq[c] >> j & 1`` iff pattern[j + 64*limb] matches text byte c.
        """
        p = np.frombuffer(pattern, dtype=np.uint8)
        m = len(p)
        nl = max(1, -(-m // 64))
        bits = self.match_matrix[p[None, :], _ALL[:, None]]  # (256, m)
        padded = np.zeros((256, nl * 64), dtype=bool)
        padded[:, :m] = bits
        packed = np.packbits(padded, axis=1, bitorder="little")
        return packed.view(np.uint64).reshape(256, nl)


def _make_ascii(case_sensitive: bool) -> Profile:
    if case_sensitive:
        mm = _ALL[:, None] == _ALL[None, :]
    else:
        # eq_ignore_ascii_case: lowercase only within A-Z (ascii.rs:47-53)
        def low(x: np.ndarray) -> np.ndarray:
            is_up = (x >= ord("A")) & (x <= ord("Z"))
            return np.where(is_up, x | 0x20, x).astype(np.uint8)

        la = low(_ALL)
        mm = la[:, None] == la[None, :]
    valid = np.ones(256, dtype=bool)
    canon = _ALL.copy() if case_sensitive else la.copy()
    # overhang is Iupac-only in the reference (profiles.rs:63-65, iupac.rs:218)
    return Profile(
        "ascii" if case_sensitive else "ascii_ci",
        mm,
        valid,
        complement_lut=None,
        supports_overhang=False,
        canon_lut=canon,
    )


def _make_dna() -> Profile:
    # is_match: (a | 0x20) == (b | 0x20)  (dna.rs:48-50)
    la = (_ALL | 0x20).astype(np.uint8)
    mm = la[:, None] == la[None, :]
    lowered = np.frombuffer(b"acgt", dtype=np.uint8)
    valid = np.isin(la, lowered)
    lut = _pairs_to_lut(_DNA_RC_PAIRS, True)  # uppercase only, like dna.rs RC table
    return Profile("dna", mm, valid, lut, supports_overhang=False, canon_lut=la.copy())


def _make_iupac() -> Profile:
    code = _iupac_code32()
    codes = code[_ALL & 0x1F]  # (256,) uint16, 255 = invalid (matches all)
    mm = (codes[:, None] & codes[None, :]) != 0
    upper = (_ALL & ~np.uint8(0x20)).astype(np.uint8)
    valid = (upper > ord("@")) & (upper < ord("Z")) & (code[_ALL & 0x1F] != 255)
    # NB valid_seq (iupac.rs:195-199) requires an A-Y letter AND a known code.
    lut = _pairs_to_lut(_IUPAC_RC_PAIRS, True)
    return Profile("iupac", mm, valid, lut, supports_overhang=True)


PROFILES: dict[str, Profile] = {
    "ascii": _make_ascii(True),
    "ascii_ci": _make_ascii(False),
    "dna": _make_dna(),
    "iupac": _make_iupac(),
}


def get_profile(name: str) -> Profile:
    try:
        return PROFILES[name.lower()]
    except KeyError:
        raise ValueError(f"Unsupported alphabet: {name}") from None


def reverse_complement(seq: bytes) -> bytes:
    """IUPAC reverse-complement (the reference's public helper, iupac.rs:224)."""
    return PROFILES["iupac"].reverse_complement(seq)
