"""Multimodal (image/audio/video) stages — Ray-side plumbing with stub codecs.

Media payloads are opaque ``binary`` columns with typed metadata; decode /
feature-extract / resize / frame-sample run as actor-pool ``map_batches``
stages (codec state loaded once per actor in ``__init__``).  The actual
codec libraries are not in this container, so the decode step is STUBBED:
``DETERMINISTIC_FAKE`` derives reproducible pseudo-pixels from the payload
hash (tests + bench), ``RAISE`` raises NotImplementedError (production
placeholder).  Everything Ray-side — schema, batch sizing, actor signature,
output layout — is real and tested.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

__all__ = [
    "MEDIA_SCHEMA",
    "MediaDecoder",
    "media_refs_from_spans",
    "synthesize_media_payloads",
]

MEDIA_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("kind", pa.string()),  # image | audio | video
        ("payload", pa.binary()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)

DETERMINISTIC_FAKE = "deterministic_fake"
RAISE = "raise"


def media_refs_from_spans(batch: pa.Table) -> pa.Table:
    """Explode media spans -> (doc_id, media_ref) rows (vectorized)."""
    import pyarrow.compute as pc

    spans = batch.column("spans")
    if isinstance(spans, pa.ChunkedArray):
        spans = spans.combine_chunks()
    flat = spans.flatten()
    kinds = flat.field("kind")
    refs = flat.field("media_ref")
    offsets = spans.offsets.to_numpy()
    n_per_row = np.diff(offsets)
    doc_ids = batch.column("doc_id").to_pylist()
    parent = np.repeat(np.arange(len(doc_ids)), n_per_row)
    mask = pc.equal(kinds, "media").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "doc_id": pa.array([doc_ids[i] for i in parent[mask]]),
            "media_ref": refs.filter(pa.array(mask)),
        }
    )


def synthesize_media_payloads(refs: list[str], seed: int = 42) -> pa.Table:
    """Deterministic fake media table for tests/bench: payload bytes derive
    from the ref hash; kind/dimensions derive from the first hash byte."""
    rows = {k: [] for k in MEDIA_SCHEMA.names}
    kinds = ["image", "audio", "video"]
    for r in refs:
        h = hashlib.sha256(f"{seed}:{r}".encode()).digest()
        kind = kinds[h[0] % 3]
        size = 256 + h[1]
        payload = (h * ((size // len(h)) + 1))[:size]
        rows["media_ref"].append(r)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["width"].append(16 + h[2] % 64 if kind != "audio" else 0)
        rows["height"].append(16 + h[3] % 64 if kind != "audio" else 0)
        rows["duration_ms"].append(1000 + h[4] * 16 if kind != "image" else 0)
    return pa.table({n: pa.array(rows[n], MEDIA_SCHEMA.field(n).type) for n in MEDIA_SCHEMA.names})


class MediaDecoder:
    """Actor-pool decode + feature-extract stage.

    ``map_batches(MediaDecoder, fn_constructor_kwargs=..., concurrency=N,
    batch_size=B)``: small batches — media rows are wide (binary payloads),
    so B*payload must fit the worker heap (SURVEY/bench guidance).

    Output: one row per input with a fixed-width feature vector
    (``list<float32>[dim]``), decoded dims, and frame count — the shape a
    real CLIP/spectrogram extractor would produce.
    """

    def __init__(self, mode: str = DETERMINISTIC_FAKE, dim: int = 32, target_size: int = 16):
        if mode not in (DETERMINISTIC_FAKE, RAISE):
            raise ValueError(f"unknown mode {mode!r}")
        self.mode = mode
        self.dim = dim
        self.target = target_size
        # per-actor state: the "model" — a fixed seeded projection matrix,
        # built ONCE per actor (the ST1/ST2 pattern).  The float64 copy
        # backs the e6 feature fingerprints (float64 on both the engine and
        # the SQL-oracle side makes the rounding hash-stable); float32 is
        # the pipeline's feature payload dtype.
        rng = np.random.default_rng(1234)
        self.proj64 = rng.standard_normal((256, dim))
        self.proj = self.proj64.astype(np.float32)

    def _decode(self, payload: bytes, kind: str, w: int, h: int) -> np.ndarray:
        if self.mode == RAISE:
            raise NotImplementedError(
                "real media codecs are not available in this environment; "
                "swap MediaDecoder(mode=...) for a PIL/ffmpeg-backed decoder"
            )
        # deterministic fake decode: payload bytes -> byte histogram
        # (float64 throughout: the e6 fingerprints must round identically
        # to the SQL oracle's double arithmetic)
        arr = np.frombuffer(payload, dtype=np.uint8)
        hist = np.bincount(arr, minlength=256).astype(np.float64)
        return hist / max(1.0, hist.sum())

    def __call__(self, batch: pa.Table) -> pa.Table:
        feats = []
        frames = []
        sums, mins, maxs = [], [], []
        for payload, kind, w, h, dur in zip(
            batch.column("payload").to_pylist(),
            batch.column("kind").to_pylist(),
            batch.column("width").to_pylist(),
            batch.column("height").to_pylist(),
            batch.column("duration_ms").to_pylist(),
        ):
            hist = self._decode(payload, kind, w, h)
            f64 = hist.astype(np.float64) @ self.proj64
            feats.append(f64.astype(np.float32))
            # e6 feature fingerprints (half-away rounding, DuckDB parity)
            def e6(x: float) -> int:
                return int(np.sign(x) * np.floor(abs(x) * 1e6 + 0.5))

            sums.append(e6(float(f64.sum())))
            mins.append(e6(float(f64.min())))
            maxs.append(e6(float(f64.max())))
            # frame-sample stub: one frame per second for video, else 1
            frames.append(max(1, dur // 1000) if kind == "video" else 1)
        return pa.table(
            {
                "media_ref": batch.column("media_ref"),
                "kind": batch.column("kind"),
                "features": pa.array([f.tolist() for f in feats], pa.list_(pa.float32())),
                "n_frames": pa.array(frames, pa.int32()),
                "feat_sum_e6": pa.array(sums, pa.int64()),
                "feat_min_e6": pa.array(mins, pa.int64()),
                "feat_max_e6": pa.array(maxs, pa.int64()),
            }
        )
