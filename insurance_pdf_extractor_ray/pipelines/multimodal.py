"""Multimodal column plumbing: decode / feature-extract over binary payloads.

Media spans carry an opaque reference (``media_ref``) or, in a materialized
asset table, raw ``binary`` payload + typed metadata.  The image/audio codec
libraries are NOT in this container, so the decode kernels are STUBS — a
deterministic fake behind ``use_fake=True`` (default) or
``NotImplementedError`` otherwise — while the Ray-side plumbing (schema,
small batch sizes for large payloads, actor-pool signature, output layout)
is real and tested.
"""

from __future__ import annotations

import hashlib
import numpy as np
import pyarrow as pa
import ray.data

ASSET_SCHEMA = pa.schema(
    [
        ("media_ref", pa.string()),
        ("doc_id", pa.string()),
        ("kind", pa.string()),         # image | audio | video
        ("payload", pa.binary()),
        ("mime", pa.string()),
        ("width", pa.int32()),
        ("height", pa.int32()),
        ("duration_ms", pa.int32()),
    ]
)


# magic-byte signatures per media family (public file signatures; the
# F3 analog of the reference's content-sniff gate, file_helpers.py:15-50)
_MAGIC = {
    "image": [b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF8"],
    "audio": [b"RIFF", b"ID3", b"\xff\xfb", b"OggS"],
    "video": [b"\x00\x00\x00\x18ftyp", b"\x00\x00\x00\x20ftyp", b"\x1a\x45\xdf\xa3"],
}


def sniff_media_kind(payload: bytes) -> str:
    """Best-effort media family from magic bytes ('unknown' if none match)."""
    if payload:
        for kind, magics in _MAGIC.items():
            for m in magics:
                if payload.startswith(m):
                    return kind
    return "unknown"


def media_consistency_gate(
    ds: ray.data.Dataset, keep_inconsistent: bool = True,
) -> ray.data.Dataset:
    """F3 analog (reference file_helpers.py:15-50 magic-bytes sniff): adds
    ``sniffed_kind`` and ``kind_consistent`` — a media row whose payload's
    magic bytes disagree with its declared ``kind`` is flagged (crawl-scale
    inputs are malformed constantly; tag-and-keep by default so the quarantine
    is queryable, ``keep_inconsistent=False`` drops them)."""

    def gate(batch: pa.Table) -> pa.Table:
        sniffed = [sniff_media_kind(p) for p in batch.column("payload").to_pylist()]
        declared = batch.column("kind").to_pylist()
        ok = [s == d for s, d in zip(sniffed, declared)]
        out = batch.append_column("sniffed_kind", pa.array(sniffed, pa.string()))
        out = out.append_column("kind_consistent", pa.array(ok, pa.bool_()))
        if not keep_inconsistent:
            out = out.filter(pa.array(ok))
        return out

    return ds.map_batches(gate, batch_format="pyarrow")


def fake_assets_for_docs(doc_media_refs, seed: int = 42,
                         corrupt_frac: float = 0.0) -> pa.Table:
    """Deterministic fake asset table for a list of (doc_id, media_ref).

    Payloads carry the correct magic bytes for their declared kind so the
    consistency gate passes; ``corrupt_frac`` plants a deterministic fraction
    of kind/payload mismatches to exercise it."""
    rows = {k: [] for k in ("media_ref", "doc_id", "kind", "payload", "mime",
                            "width", "height", "duration_ms")}
    for doc_id, ref in doc_media_refs:
        h = hashlib.blake2b(f"{seed}:{ref}".encode(), digest_size=8).digest()
        rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
        kind = ["image", "audio", "video"][rng.randint(0, 3)]
        if corrupt_frac > 0 and rng.random_sample() < corrupt_frac:
            wrong = [k for k in ("image", "audio", "video") if k != kind]
            magic = _MAGIC[wrong[rng.randint(0, 2)]][0]
        else:
            magic = _MAGIC[kind][0]
        payload = magic + rng.bytes(rng.randint(64, 256))
        rows["media_ref"].append(ref)
        rows["doc_id"].append(doc_id)
        rows["kind"].append(kind)
        rows["payload"].append(payload)
        rows["mime"].append({"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind])
        rows["width"].append(int(rng.randint(16, 4096)) if kind != "audio" else 0)
        rows["height"].append(int(rng.randint(16, 4096)) if kind != "audio" else 0)
        rows["duration_ms"].append(int(rng.randint(100, 600000)) if kind != "image" else 0)
    return pa.table(rows, schema=ASSET_SCHEMA)


class MediaDecodeStage:
    """Actor-pool decode/feature stage.

    Real deployments load the codec model here (once per actor).  In this
    container ``use_fake=True`` derives deterministic pseudo-features from the
    payload bytes; ``use_fake=False`` raises NotImplementedError at call time
    (the decode kernel is the only stubbed piece — batching, schema and
    resource sizing are production-shaped).

    Large payloads => keep ``batch_size`` small (payload_bytes x batch_size x
    concurrency must fit the worker heap; see module docstring).
    """

    FEATURE_DIM = 8

    def __init__(self, use_fake: bool = True, target_size: int = 64):
        self.use_fake = use_fake
        self.target_size = target_size

    def _decode_features(self, payload: bytes, kind: str) -> np.ndarray:
        if not self.use_fake:
            raise NotImplementedError(
                "media decode requires codec libs not present in this container"
            )
        # deterministic fake: blake2b(payload) -> FEATURE_DIM floats in [0,1)
        digest = hashlib.blake2b(payload or b"", digest_size=self.FEATURE_DIM * 4).digest()
        ints = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
        return ints / 2**32

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        feats, thumb_w, thumb_h = [], [], []
        for p, k, w, h in zip(payloads, kinds, widths, heights):
            feats.append(self._decode_features(p, k))
            if k == "image" and w and h:
                scale = self.target_size / max(w, h)
                thumb_w.append(max(1, int(w * min(1.0, scale))))
                thumb_h.append(max(1, int(h * min(1.0, scale))))
            else:
                thumb_w.append(0)
                thumb_h.append(0)
        cols = {"media_ref": batch.column("media_ref"),
                "doc_id": batch.column("doc_id"),
                "kind": batch.column("kind"),
                "features": pa.array([list(f) for f in feats], pa.list_(pa.float64())),
                "thumb_w": pa.array(thumb_w, pa.int32()),
                "thumb_h": pa.array(thumb_h, pa.int32())}
        # consistency-gate columns (media_consistency_gate) flow through
        for extra in ("sniffed_kind", "kind_consistent"):
            if extra in batch.column_names:
                cols[extra] = batch.column(extra)
        return pa.table(cols)


def decode_media(
    ds: ray.data.Dataset, use_fake: bool = True,
    concurrency=(1, 4), batch_size: int = 32,
) -> ray.data.Dataset:
    """Asset table -> per-asset features (small batches: binary payloads)."""
    return ds.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs=dict(use_fake=use_fake),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def media_refs_from_docs(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Explode (doc_id, spans) -> (doc_id, media_ref) for media spans."""

    def explode(batch: pa.Table) -> pa.Table:
        out_doc, out_ref = [], []
        for doc_id, spans in zip(batch.column("doc_id").to_pylist(),
                                 batch.column("spans").to_pylist()):
            for s in spans or []:
                if s["kind"] == "media" and s["media_ref"]:
                    out_doc.append(doc_id)
                    out_ref.append(s["media_ref"])
        return pa.table({"doc_id": pa.array(out_doc, pa.string()),
                         "media_ref": pa.array(out_ref, pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow")


class FrameSampleStage:
    """Actor-pool frame sampler for video assets — the frame-sample stage of
    a multimodal training pipeline (one decoded keyframe every ``every_ms``,
    capped at ``max_frames`` per clip).

    Real deployments open the container/codec here (once per actor, PyAV /
    ffmpeg-style) and seek to the sampled timestamps; this container has no
    codec libs, so ``use_fake=True`` derives one deterministic pseudo-frame
    feature per sampled timestamp from (payload, ts) — schema, explode
    layout, batching and actor signature are the production shape
    (``use_fake=False`` raises NotImplementedError at call time).

    Output one row per sampled frame: (media_ref, doc_id, frame_idx, ts_ms,
    features).  Non-video rows emit no frames.  Explode factor is bounded by
    ``max_frames``, so a batch of B clips emits <= B x max_frames rows —
    size ``batch_size`` against payload bytes x explode factor.
    """

    FEATURE_DIM = 8

    def __init__(self, use_fake: bool = True, every_ms: int = 1000,
                 max_frames: int = 32):
        self.use_fake = use_fake
        self.every_ms = int(every_ms)
        self.max_frames = int(max_frames)

    def _frame_feature(self, payload: bytes, ts_ms: int) -> np.ndarray:
        if not self.use_fake:
            raise NotImplementedError(
                "frame decode requires codec libs not present in this container"
            )
        digest = hashlib.blake2b(
            (payload or b"") + int(ts_ms).to_bytes(8, "little"),
            digest_size=self.FEATURE_DIM * 4).digest()
        return np.frombuffer(digest, dtype=np.uint32).astype(np.float64) / 2**32

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        docs = batch.column("doc_id").to_pylist()
        kinds = batch.column("kind").to_pylist()
        payloads = batch.column("payload").to_pylist()
        durs = batch.column("duration_ms").to_pylist()
        o_ref, o_doc, o_idx, o_ts, o_f = [], [], [], [], []
        for ref, doc, kind, p, dur in zip(refs, docs, kinds, payloads, durs):
            if kind != "video" or not dur or dur <= 0:
                continue
            ts = np.arange(0, int(dur), self.every_ms)[: self.max_frames]
            for i, t in enumerate(ts):
                o_ref.append(ref)
                o_doc.append(doc)
                o_idx.append(i)
                o_ts.append(int(t))
                o_f.append(self._frame_feature(p, int(t)))
        return pa.table({
            "media_ref": pa.array(o_ref, pa.string()),
            "doc_id": pa.array(o_doc, pa.string()),
            "frame_idx": pa.array(o_idx, pa.int32()),
            "ts_ms": pa.array(o_ts, pa.int64()),
            "features": pa.array([list(f) for f in o_f],
                                 pa.list_(pa.float64())),
        })


def frame_sample(
    ds: ray.data.Dataset, use_fake: bool = True, every_ms: int = 1000,
    max_frames: int = 32, concurrency=(1, 4), batch_size: int = 32,
) -> ray.data.Dataset:
    """Asset table -> sampled video frames (see FrameSampleStage)."""
    return ds.map_batches(
        FrameSampleStage,
        fn_constructor_kwargs=dict(use_fake=use_fake, every_ms=every_ms,
                                   max_frames=max_frames),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
