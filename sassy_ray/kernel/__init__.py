"""Pure-compute kernels (no Ray dependency).

- ``profiles``: alphabet semantics (ascii / dna / iupac) — char equality,
  complement, validation.  Mirrors ``/root/reference/src/profiles*``.
- ``oracle``: O(nm) DP reference implementation — ground truth for tests.
  Mirrors the semantics of ``/root/reference/src/search.rs`` +  ``trace.rs``.
- ``myers``: NumPy bit-parallel Myers kernel (the production scorer).
- ``search``: the user-facing ``Searcher`` mirroring the reference's Python
  binding surface (``/root/reference/src/python.rs:27-233``).
"""
