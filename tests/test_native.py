"""Native (C) kernel vs NumPy kernel equivalence.

The compiled scan engine (kernel/_native.c via kernel/native.py) must be
bit-for-bit interchangeable with the NumPy batch kernels: same candidate
positions, same costs, same per-pair ordering, for every mode the engine
dispatches (minima walk / all-minima / best-cost), any limb count, with and
without overhang.  The rest of the suite pins the native path against the
pure-DP oracle transitively (native is the default when a compiler exists);
this file pins the two implementations against EACH OTHER so a regression
in either is caught even if the default flips.
"""

from __future__ import annotations

import random

import numpy as np
import pytest

from sassy_ray.kernel import myers, native
from sassy_ray.kernel.profiles import get_profile

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C compiler / SASSY_NATIVE=0"
)


class force_numpy:
    """Temporarily hide the compiled library so myers.* runs pure NumPy."""

    def __enter__(self):
        self._lib = native._lib
        native._lib = None
        return self

    def __exit__(self, *exc):
        native._lib = self._lib
        return False


def _rnd(rng, n, ab=b"ACGT"):
    return bytes(rng.choice(ab) for _ in range(n))


def _keyed(t):
    return sorted(zip(t[0].tolist(), t[1].tolist(), t[2].tolist()))


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("profname", ["dna", "ascii_ci", "iupac"])
def test_scan_minima_equivalence(seed, profname):
    rng = random.Random(seed)
    prof = get_profile(profname)
    ab = b"ACGT" if profname != "ascii_ci" else bytes(range(97, 123)) + b"  "
    pats = [_rnd(rng, rng.randint(1, 150), ab) for _ in range(101)]
    txts = [_rnd(rng, rng.randint(0, 400), ab) for _ in range(101)]
    for k in (0, 3, 9, 25):
        for all_min in (False, True):
            costs, _n, max_pos = myers.batch_end_costs(pats, txts, prof, k)
            ref = myers.batch_find_minima(costs, max_pos, k, all_min)
            nat = native.scan_pairs(pats, txts, prof, k, all_min)
            assert _keyed(ref) == _keyed(nat), (k, all_min)


@pytest.mark.parametrize("alpha,mo", [(0.5, None), (0.3, 7), (1.0, None), (0.0, None)])
def test_scan_minima_overhang_equivalence(alpha, mo):
    rng = random.Random(42)
    prof = get_profile("iupac")
    pats = [_rnd(rng, rng.randint(1, 90)) for _ in range(60)]
    txts = [_rnd(rng, rng.randint(0, 200)) for _ in range(60)]
    k = 4
    costs, _n, max_pos = myers.batch_end_costs(pats, txts, prof, k, alpha, mo)
    for all_min in (False, True):
        ref = myers.batch_find_minima(costs, max_pos, k, all_min)
        nat = native.scan_pairs(pats, txts, prof, k, all_min, alpha, mo)
        assert _keyed(ref) == _keyed(nat), (alpha, mo, all_min)


@pytest.mark.parametrize("seed", [3, 4])
def test_best_costs_equivalence(seed):
    rng = random.Random(seed)
    prof = get_profile("ascii_ci")
    ab = bytes(range(97, 123)) + b"    "
    pats = [_rnd(rng, rng.randint(1, 700), ab) for _ in range(150)]
    txts = []
    for p in pats:
        if rng.random() < 0.5:
            b = bytearray(p)
            for _ in range(rng.randint(0, 30)):
                b[rng.randrange(len(b))] = rng.choice(ab)
            txts.append(bytes(b))
        else:
            txts.append(_rnd(rng, rng.randint(0, 700), ab))
    for k in (2, 17, 40, 80):
        nat = myers.batch_best_costs(pats, txts, prof, k)
        with force_numpy():
            ref = myers.batch_best_costs(pats, txts, prof, k)
        assert (nat == ref).all(), (k, np.nonzero(nat != ref)[0][:5])


def test_best_costs_overhang_equivalence():
    rng = random.Random(9)
    prof = get_profile("iupac")
    pats = [_rnd(rng, rng.randint(1, 90)) for _ in range(60)]
    txts = [_rnd(rng, rng.randint(0, 200)) for _ in range(60)]
    for alpha, mo in ((0.5, None), (0.25, 11)):
        nat = myers.batch_best_costs(pats, txts, prof, 5, alpha, mo)
        with force_numpy():
            ref = myers.batch_best_costs(pats, txts, prof, 5, alpha, mo)
        assert (nat == ref).all(), (alpha, mo)


def test_searcher_end_to_end_equivalence():
    """Full Searcher surface (cartesian dispatch, RC flip, traceback) gives
    identical matches with and without the compiled kernel."""
    from sassy_ray.kernel.search import Searcher

    rng = random.Random(7)
    pats = [_rnd(rng, rng.randint(6, 40)) for _ in range(24)]
    txts = [_rnd(rng, rng.randint(0, 500)) for _ in range(64)]
    # plant hits
    for i in range(0, 60, 3):
        t = bytearray(txts[i])
        p = bytearray(pats[i % len(pats)])
        if len(p) > 4:
            p[rng.randrange(len(p))] = rng.choice(b"ACGT")
        txts[i] = bytes(t[: len(t) // 2]) + bytes(p) + bytes(t[len(t) // 2 :])

    def run():
        s = Searcher("dna", rc=True)
        ms = s.search_many(pats, txts, 3)
        return [
            (m.pattern_idx, m.text_idx, m.text_start, m.text_end, m.cost,
             m.strand, m.cigar)
            for m in ms
        ]

    nat = run()
    with force_numpy():
        ref = run()
    assert sorted(nat) == sorted(ref)
    assert len(nat) > 0  # the planted hits actually exercised the paths


def test_run_minima_job_major_order():
    """run_minima output must be job-major with ascending positions per job
    (the cartesian grouping in search._native_cartesian relies on it)."""
    rng = random.Random(11)
    prof = get_profile("dna")
    pats = [_rnd(rng, 8) for _ in range(40)]
    txts = [_rnd(rng, rng.randint(0, 200)) for _ in range(40)]
    ji, jp, _jc = native.scan_pairs(pats, txts, prof, 6, True)
    assert (np.diff(ji) >= 0).all()
    same = np.diff(ji) == 0
    assert (np.diff(jp)[same] > 0).all()


def test_minhash_rows_matches_numpy():
    """The C OPH minhash bucket-min pass (blocking's hot loop) must be
    bit-identical to _shingle_hashes + np.minimum.at across row lengths
    (incl. < q), q values, bucket counts, and both rc modes."""
    from sassy_ray.stages import blocking as B

    rng = np.random.default_rng(1234)
    for _ in range(25):
        n_docs = int(rng.integers(1, 40))
        texts = [
            bytes(rng.choice(list(b"ACGTacgtxyz "), size=int(rng.integers(0, 60))))
            for _ in range(n_docs)
        ]
        q = int(rng.integers(2, 14))
        P = int(2 ** rng.integers(1, 6))
        lens = np.array([len(t) for t in texts], dtype=np.int64)
        buf = np.frombuffer(b"".join(texts), dtype=np.uint8)
        starts = np.concatenate([[0], np.cumsum(lens)])
        for rc in (False, True):
            cfg = B.BlockingConfig(q=q, num_perm=P, bands=P, rc_canonical=rc)
            got = B.minhash_signatures_buf(buf, starts, cfg)
            with force_numpy():
                ref = B.minhash_signatures_buf(buf, starts, cfg)
            assert np.array_equal(got, ref), (q, P, rc)


def test_rows_from_offsets_matches_numpy_scatter():
    """The C padded-rows builder (`sassy_rows_from_offsets`, used by
    myers._rows_matrix on Arrow string input) must equal the NumPy
    index-scatter fallback for random row layouts: empty rows, empty
    batches, min_width padding wider than every row, and sliced arrays
    (nonzero Arrow offset)."""
    import pyarrow as pa

    rng = np.random.default_rng(77)
    for trial in range(30):
        n = int(rng.integers(0, 50))
        texts = [
            bytes(rng.integers(1, 255, size=int(rng.integers(0, 90)), dtype=np.uint8))
            for _ in range(n)
        ]
        arr = pa.array(texts, pa.large_binary() if trial % 2 else pa.binary())
        if n > 4 and trial % 3 == 0:
            arr = arr.slice(2, n - 3)  # exercise the arr.offset != 0 rebase
        min_width = int(rng.integers(1, 140))
        got_mat, got_lens = myers._rows_matrix(arr, min_width=min_width)
        with force_numpy():
            ref_mat, ref_lens = myers._rows_matrix(arr, min_width=min_width)
        assert np.array_equal(got_lens, ref_lens), trial
        assert got_mat.shape == ref_mat.shape, trial
        assert np.array_equal(got_mat, ref_mat), trial


def test_chunk_rows_coded_builder_equivalence():
    """The fused C chunk builder (`sassy_chunk_remap` via chunk_rows_coded)
    must reproduce search._build_chunk_rows_tr exactly — same row starts,
    lengths, ownership — for both strands, across text-length edge cases
    (empty, shorter than overlap, == chunk_len, multi-chunk with and without
    a short tail).  'auto' mode is checked through the codes_ab inverse map
    (decoded bytes == raw rows); 'never' mode byte-for-byte."""
    from sassy_ray.kernel.search import _build_chunk_rows_tr

    rng = np.random.default_rng(5)
    for trial in range(25):
        chunk_len = int(rng.integers(40, 200))
        overlap = int(rng.integers(1, chunk_len // 2))
        n = int(rng.integers(0, 14))
        ab = b"ACGT" if trial % 2 else bytes(range(32, 127))
        lens = [
            int(rng.choice([0, 1, overlap, chunk_len - 1, chunk_len, chunk_len + 1,
                            2 * chunk_len - overlap, int(rng.integers(0, 5 * chunk_len))]))
            for _ in range(n)
        ]
        texts = [bytes(rng.choice(list(ab), size=l).astype(np.uint8)) for l in lens]
        ref_rows, ref_owner = _build_chunk_rows_tr(texts, overlap, chunk_len)
        rev = [t[::-1] for t in texts]
        ref_rev, _ = _build_chunk_rows_tr(rev, overlap, chunk_len)
        for mode in ("auto", "never"):
            for emit_rc in (False, True):
                rows, owner = native.chunk_rows_coded(
                    texts, chunk_len, overlap, emit_rc, 2, 23, remap=mode
                )
                assert owner == ref_owner, (trial, mode, emit_rc)
                nf = len(ref_owner)
                assert np.array_equal(rows.lens[:nf], ref_rows.lens), (trial, mode)
                got_fwd = [rows[i] for i in range(nf)]
                exp_fwd = [ref_rows[i] for i in range(nf)]
                assert got_fwd == exp_fwd, (trial, mode, emit_rc)
                if emit_rc:
                    assert len(rows) == 2 * nf
                    got_rc = [rows[nf + i] for i in range(nf)]
                    exp_rc = [ref_rev[i] for i in range(nf)]
                    assert got_rc == exp_rc, (trial, mode)
                if mode == "never":
                    assert rows.codes_ab is None
                    assert np.array_equal(rows.mat[:nf], ref_rows.mat)


def test_chunked_search_fused_vs_numpy():
    """End-to-end: chunked_search / chunked_search_multi through the fused
    C builder (pre-remapped rows, fused rc reversal) must give identical
    matches to the pure-NumPy fallback path, including traceback cigars,
    across seam-straddling planted hits, rc, only_best and ascii (identity
    alphabet) inputs."""
    from sassy_ray.kernel.search import Searcher, chunked_search, chunked_search_multi

    rng = random.Random(3)
    pat = _rnd(rng, 23)
    texts = []
    for i in range(12):
        t = bytearray(_rnd(rng, rng.randint(0, 700)))
        if len(t) > 60:  # plant a hit, sometimes near the chunk seam
            p = bytearray(pat)
            p[rng.randrange(len(p))] = rng.choice(b"ACGT")
            pos = rng.choice([5, 80, 95, 100, 105, max(0, len(t) - 30)])
            pos = min(pos, len(t))
            t[pos:pos] = p
        texts.append(bytes(t))

    def key(ms_per_text):
        return [
            sorted((m.text_start, m.text_end, m.cost, m.strand, m.cigar) for m in ms)
            for ms in ms_per_text
        ]

    for rc, only_best in ((True, False), (True, True), (False, False)):
        s = Searcher("dna", rc=rc, only_best_match=only_best)
        nat = key(chunked_search(s, pat, texts, 3, chunk_len=100))
        with force_numpy():
            ref = key(chunked_search(s, pat, texts, 3, chunk_len=100))
        assert nat == ref, (rc, only_best)
        assert any(nat), (rc, only_best)

    # ascii texts: identity-alphabet route through the fused builder
    apat = b"hello world"
    atexts = [b" " * 90 + b"hxllo world" + b"_" * 90, b"hello world", b""]
    sa = Searcher("ascii")
    nat = key(chunked_search(sa, apat, atexts, 2, chunk_len=64))
    with force_numpy():
        ref = key(chunked_search(sa, apat, atexts, 2, chunk_len=64))
    assert nat == ref and any(nat)

    # multi-pattern: fused rows feed the native cartesian scan
    pats = [pat, _rnd(rng, 9), _rnd(rng, 31), _rnd(rng, 40)]
    s = Searcher("dna", rc=True)
    nat = chunked_search_multi(s, pats, texts, 3, chunk_len=120)
    with force_numpy():
        ref = chunked_search_multi(s, pats, texts, 3, chunk_len=120)
    flat_nat = [
        (pi, ti, m.text_start, m.text_end, m.cost, m.strand, m.cigar)
        for pi, per in enumerate(nat) for ti, ms in enumerate(per) for m in ms
    ]
    flat_ref = [
        (pi, ti, m.text_start, m.text_end, m.cost, m.strand, m.cigar)
        for pi, per in enumerate(ref) for ti, ms in enumerate(per) for m in ms
    ]
    assert sorted(flat_nat) == sorted(flat_ref)
    assert flat_nat


def test_chunked_search_multi_arrow_input():
    """chunked_search_multi accepts an Arrow string/binary column and gives
    byte-identical matches to the list[bytes] form — including nulls (read
    as empty), a sliced array (nonzero offset) and a ChunkedArray — without
    a to_pylist round-trip on the native path."""
    import pyarrow as pa

    from sassy_ray.kernel.search import Searcher, chunked_search_multi

    rng = random.Random(1)
    texts = [bytearray(_rnd(rng, rng.randint(200, 6000))) for _ in range(14)]
    pats = [_rnd(rng, 23) for _ in range(4)]
    for i, t in enumerate(texts):
        p = bytearray(pats[i % 4])
        p[3] = ord("A")
        pos = rng.randrange(0, len(t) - 23)
        t[pos : pos + 23] = p
    blist = [bytes(t) for t in texts] + [b""]

    def flat(per):
        return sorted(
            (pi, ti, m.text_start, m.text_end, m.cost, m.strand, m.cigar)
            for pi, pp in enumerate(per)
            for ti, ms in enumerate(pp)
            for m in ms
        )

    s = Searcher("dna", rc=True)
    ref = flat(chunked_search_multi(s, pats, blist, 3, chunk_len=150))
    assert ref

    plain = pa.array([t.decode() for t in blist[:-1]] + [None], pa.string())
    sliced = pa.array(["xx"] + [t.decode() for t in blist[:-1]] + [None]).slice(1, len(blist))
    chunked = pa.chunked_array(
        [[t.decode() for t in blist[:7]], [t.decode() for t in blist[7:-1]] + [None]]
    )
    for arr in (plain, sliced, chunked):
        assert flat(chunked_search_multi(s, pats, arr, 3, chunk_len=150)) == ref

    # P=1 routes through _verify_pairs (not the cartesian scan) — the
    # production single-pattern grep shape over coded rows
    ref1 = flat(chunked_search_multi(s, pats[:1], blist, 3, chunk_len=150))
    assert flat(chunked_search_multi(s, pats[:1], plain, 3, chunk_len=150)) == ref1
    with force_numpy():
        assert flat(chunked_search_multi(s, pats[:1], blist, 3, chunk_len=150)) == ref1
    assert ref1


def test_scorer_sel2_path_equivalence():
    """PairScorer's C side-select rows path (no if_else / per-chunk take)
    must produce identical (cost, k, is_match) to both the legacy
    take-based native path (forced via emit-shaped config knobs) and the
    pure-NumPy fallback, over random mixed-length pairs with orientation
    flips, empty strings, and per-pair k."""
    import pyarrow as pa

    from sassy_ray.stages.scoring import PairScorer, ScoreConfig

    rng = random.Random(33)
    words = ["lorem", "ipsum", "dolor", "sit", "amet", "zyx", ""]
    rows_a, rows_b = [], []
    for i in range(700):
        base = " ".join(rng.choice(words) for _ in range(rng.randint(0, 60)))
        if rng.random() < 0.5:
            # near-dup: edit a few chars
            b = list(base)
            for _ in range(rng.randint(0, 4)):
                if b:
                    b[rng.randrange(len(b))] = rng.choice("abcXYZ ")
            other = "".join(b)
        else:
            other = " ".join(rng.choice(words) for _ in range(rng.randint(0, 80)))
        if rng.random() < 0.5:
            rows_a.append(base), rows_b.append(other)
        else:
            rows_a.append(other), rows_b.append(base)
    batch = pa.table(
        {
            "doc_id_a": pa.array([f"a{i}" for i in range(len(rows_a))]),
            "doc_id_b": pa.array([f"b{i}" for i in range(len(rows_b))]),
            "text_a": pa.array(rows_a),
            "text_b": pa.array(rows_b),
        }
    )
    cfg = ScoreConfig(profile="ascii_ci", k_min=2, rel_k=0.05, lowercase=True)
    got = PairScorer(cfg)(batch)  # sel2 path (native, no rc, no emit)

    # legacy take path: emit_matches disables sel2 but adds columns — use
    # a scorer whose inputs defeat str_buf_meta instead (sliced arrays)
    batch_sliced = pa.table(
        {
            "doc_id_a": batch.column("doc_id_a"),
            "doc_id_b": batch.column("doc_id_b"),
            "text_a": pa.concat_arrays(
                [pa.array(["PAD"]), batch.column("text_a").combine_chunks()]
            ).slice(1, len(rows_a)),
            "text_b": batch.column("text_b"),
        }
    )
    legacy = PairScorer(cfg)(batch_sliced)
    assert got.equals(legacy)

    with force_numpy():
        fallback = PairScorer(cfg)(batch)
    assert got.equals(fallback)


def test_scorer_rc_fused_strands_equivalence():
    """DNA rc=True scorer: the fused both-strands-one-NativeBatch path
    (interleaved job lists over a shared text matrix) must equal the pure
    NumPy fallback, including pairs where the RC strand is the better
    score, empty strings, and orientation flips."""
    import pyarrow as pa

    from sassy_ray.kernel.profiles import get_profile
    from sassy_ray.stages.scoring import PairScorer, ScoreConfig

    rng = random.Random(77)
    prof = get_profile("dna")
    rows_a, rows_b = [], []
    for i in range(500):
        base = _rnd(rng, rng.randint(0, 120)).decode()
        roll = rng.random()
        if roll < 0.35:
            b = list(base)
            for _ in range(rng.randint(0, 3)):
                if b:
                    b[rng.randrange(len(b))] = rng.choice("ACGT")
            other = "".join(b)
        elif roll < 0.7 and base:
            # RC near-dup: only the reverse complement should match
            other = prof.reverse_complement(base.encode()).decode()
            if rng.random() < 0.5 and other:
                lo = list(other)
                lo[rng.randrange(len(lo))] = rng.choice("ACGT")
                other = "".join(lo)
        else:
            other = _rnd(rng, rng.randint(0, 150)).decode()
        if rng.random() < 0.5:
            rows_a.append(base), rows_b.append(other)
        else:
            rows_a.append(other), rows_b.append(base)
    batch = pa.table(
        {
            "doc_id_a": pa.array([f"a{i}" for i in range(len(rows_a))]),
            "doc_id_b": pa.array([f"b{i}" for i in range(len(rows_b))]),
            "text_a": pa.array(rows_a),
            "text_b": pa.array(rows_b),
        }
    )
    cfg = ScoreConfig(profile="dna", k_min=2, rel_k=0.08, rc=True)
    got = PairScorer(cfg)(batch)
    with force_numpy():
        want = PairScorer(cfg)(batch)
    assert got.equals(want)
    # and through the legacy (non-sel2) rows source: sliced input arrays
    batch2 = pa.table(
        {
            "doc_id_a": batch.column("doc_id_a"),
            "doc_id_b": batch.column("doc_id_b"),
            "text_a": pa.concat_arrays(
                [pa.array(["ACGT"]), batch.column("text_a").combine_chunks()]
            ).slice(1, len(rows_a)),
            "text_b": batch.column("text_b"),
        }
    )
    assert PairScorer(cfg)(batch2).equals(want)


@pytest.mark.parametrize("seed", [0, 1])
def test_tiled_cartesian_equivalence(seed):
    """The pattern-tiled 32-job AVX2 path (same-text job groups, <= 32-char
    patterns, 32-bit lanes) vs the per-job scalar walk: the cartesian
    demux/CRISPR shape emits P consecutive same-text jobs, which is exactly
    the group shape the tiled dispatcher engages on.  Modes 0 and 1, with
    text-boundary straddles (P not a multiple of 32) and planted matches."""
    rng = np.random.default_rng(seed)
    prof = get_profile("dna")
    for P, T, k in ((37, 4, 3), (64, 2, 1), (33, 3, 5)):
        pats = [
            rng.choice(list(b"ACGT"), size=int(rng.integers(max(1, k), 33))).astype(np.uint8).tobytes()
            for _ in range(P)
        ]
        txts = [
            rng.choice(list(b"ACGT"), size=int(rng.integers(40, 400))).astype(np.uint8).tobytes()
            for _ in range(T)
        ]
        t0 = bytearray(txts[0])
        t0[5 : 5 + len(pats[0])] = pats[0]  # planted exact hit
        txts[0] = bytes(t0)
        for all_min in (False, True):
            nb = native.NativeBatch(pats, txts, prof, k)
            pat_ids = nb.pat_row if nb.pat_row is not None else np.arange(P, dtype=np.int64)
            job_p = np.ascontiguousarray(np.tile(pat_ids, T))
            job_t = np.ascontiguousarray(np.repeat(np.arange(T, dtype=np.int64), P))
            got = nb.run_minima(all_min, job_p, job_t, len(job_p))
            # scalar twin: one job per call (J=1 never reaches any group path)
            exp = []
            for jj in range(len(job_p)):
                ji, jp, jc = nb.run_minima(
                    all_min,
                    np.ascontiguousarray(job_p[jj : jj + 1]),
                    np.ascontiguousarray(job_t[jj : jj + 1]),
                    1,
                )
                exp.extend((jj, int(p_), int(c)) for _j, p_, c in zip(ji, jp, jc))
            assert _keyed(got) == sorted(exp), (P, T, k, all_min)


def test_tiled_shared_pattern_equivalence():
    """The shared-pattern 32-job AVX2 path (one <= 32-char pattern over many
    texts — the grep / chunked-scan shape) vs the NumPy kernel."""
    rng = np.random.default_rng(7)
    for m, k in ((23, 3), (8, 1), (32, 5)):
        pat = rng.choice(list(b"ACGT"), size=m).astype(np.uint8).tobytes()
        txts = [
            rng.choice(list(b"ACGT"), size=int(rng.integers(1, 500))).astype(np.uint8).tobytes()
            for _ in range(75)
        ]
        for i in range(0, 75, 6):
            if len(txts[i]) > m + 2:
                t0 = bytearray(txts[i])
                pos = int(rng.integers(0, len(t0) - m))
                t0[pos : pos + m] = pat
                txts[i] = bytes(t0)
        pats = [pat] * len(txts)
        for all_min in (False, True):
            nat = native.scan_pairs(pats, txts, prof := get_profile("dna"), k, all_min)
            with force_numpy():
                ref = myers.batch_scan_minima(pats, txts, prof, k, all_min)
            assert _keyed(ref) == _keyed(nat), (m, k, all_min)


def test_reverse_rows_matches_numpy():
    """C per-row byte reversal vs the NumPy take_along_axis body, ragged
    lengths incl. zero-length rows."""
    rng = np.random.default_rng(0)
    from sassy_ray.kernel.myers import TextRows

    for _ in range(10):
        n = int(rng.integers(1, 40))
        w = int(rng.integers(1, 150))
        lens = rng.integers(0, w + 1, size=n).astype(np.int64)
        mat = np.zeros((n, w), np.uint8)
        for i in range(n):
            mat[i, : lens[i]] = rng.integers(1, 255, size=lens[i])
        got = TextRows(mat, lens).reversed()
        with force_numpy():
            exp = TextRows(mat, lens).reversed()
        assert np.array_equal(got.mat, exp.mat)
        assert np.array_equal(got.lens, exp.lens)


def test_traceback_c_matches_numpy():
    """C fill+walk+RLE vs the NumPy batch_traceback: identical starts,
    costs and cigar strings (same =X>D>I preference), incl. planted exact
    matches, zero-length windows and multi-profile match matrices."""
    from sassy_ray.kernel import trace

    rng = np.random.default_rng(5)
    for profname in ("dna", "ascii_ci"):
        prof = get_profile(profname)
        ab = b"ACGT" if profname == "dna" else b"abcdef "
        pats, texts, ends, k = [], [], [], 3
        for _ in range(80):
            m = int(rng.integers(1, 40))
            p = rng.choice(list(ab), size=m).astype(np.uint8).tobytes()
            tl = int(rng.integers(1, 200))
            t = rng.choice(list(ab), size=tl).astype(np.uint8).tobytes()
            if rng.random() < 0.5 and tl > m:
                pos = int(rng.integers(0, tl - m))
                t = t[:pos] + p + t[pos + m :]
            pats.append(p)
            texts.append(t)
            ends.append(int(rng.integers(0, tl + 1)))
        got = trace.batch_traceback(pats, texts, ends, prof, k)
        with force_numpy():
            exp = trace.batch_traceback(pats, texts, ends, prof, k)
        for g, e in zip(got, exp):
            assert (g.text_start, g.text_end, g.cost, g.cigar) == (
                e.text_start,
                e.text_end,
                e.cost,
                e.cigar,
            )
