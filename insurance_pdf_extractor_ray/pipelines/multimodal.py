"""Multimodal columns: decode / feature-extract / frame-sample over binary
payloads, as actor-pool ``map_batches`` stages.

Media spans carry an opaque reference (``media_ref``) or, in a materialized
asset table, a raw ``binary`` payload + typed metadata.  Two decode modes:

* **Real codecs** (``use_fake=False``, the first-class path): payloads are
  genuine PNG / WAV / AVI byte streams decoded by the pure-stdlib codecs in
  ``functions/codecs.py`` (zlib-inflated, CRC-checked PNG with all five
  scanline filters; PCM16 WAV; RIFF/AVI containers with uncompressed DIB
  frames).  Features, thumbnail dims and durations are computed from the
  *decoded arrays*; malformed payloads are tagged ``decode_ok=False`` and
  kept (crawl inputs are malformed constantly — tag-and-keep, like F1's
  validation side-channel).  Reference analog: real byte-stream parsing at
  /root/reference/app/services/pdf_processor.py:364-377.
* **Legacy fake** (``use_fake=True``): deterministic blake2b pseudo-features
  from the raw bytes — kept for schema/plumbing tests that predate the real
  codecs and for payload formats with no in-container codec (JPEG/MP4/Ogg).

Large payloads => keep ``batch_size`` small (payload_bytes x batch_size x
concurrency must fit the worker heap).
"""

from __future__ import annotations

import hashlib
from struct import error as struct_error
from typing import List, Tuple
from wave import Error as wave_error
from zlib import error as zlib_error

import numpy as np
import pyarrow as pa
import ray.data

from ..functions import codecs

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
# F3 analog of the reference's content-sniff gate, file_helpers.py:15-50).
# RIFF is container-level — the subtype at bytes 8:12 disambiguates
# WAV (audio) from AVI (video).
_MAGIC = {
    "image": [b"\x89PNG\r\n\x1a\n", b"\xff\xd8\xff", b"GIF8"],
    "audio": [b"ID3", b"\xff\xfb", b"OggS"],
    "video": [b"\x00\x00\x00\x18ftyp", b"\x00\x00\x00\x20ftyp", b"\x1a\x45\xdf\xa3"],
}


def sniff_media_kind(payload: bytes) -> str:
    """Best-effort media family from magic bytes ('unknown' if none match)."""
    if payload:
        if payload[:4] == b"RIFF":
            sub = payload[8:12]
            if sub == b"AVI ":
                return "video"
            # 'WAVE' and legacy synthetic payloads (bare RIFF magic) -> audio
            return "audio"
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


# ---------------------------------------------------------------------------
# Legacy fake asset generator (magic prefix + random bytes; pseudo-features)
# ---------------------------------------------------------------------------

_FAKE_MAGIC = {
    "image": b"\x89PNG\r\n\x1a\n",
    "audio": b"RIFF",
    "video": b"\x00\x00\x00\x18ftyp",
}


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
            magic = _FAKE_MAGIC[wrong[rng.randint(0, 2)]]
        else:
            magic = _FAKE_MAGIC[kind]
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


# ---------------------------------------------------------------------------
# Real asset generator + first-principles goldens
# ---------------------------------------------------------------------------


def _asset_spec(ref: str, seed: int) -> dict:
    """Deterministic content spec for one media ref: kind + source arrays.

    Tiny sizes on purpose — the point is real codec bytes, not volume."""
    h = hashlib.blake2b(f"{seed}:{ref}".encode(), digest_size=8).digest()
    rng = np.random.RandomState(int.from_bytes(h[:4], "big"))
    kind = ["image", "audio", "video"][rng.randint(0, 3)]
    if kind == "image":
        hh, ww = int(rng.randint(8, 48)), int(rng.randint(8, 48))
        arr = rng.randint(0, 256, size=(hh, ww, 3)).astype(np.uint8)
        return {"kind": kind, "image": arr}
    if kind == "audio":
        n, rate = int(rng.randint(800, 8000)), 16000
        t = np.arange(n)
        freq = float(rng.randint(100, 2000))
        wavef = (6000 * np.sin(2 * np.pi * freq * t / rate)
                 + rng.randint(-500, 500, size=n)).astype(np.int16)
        return {"kind": kind, "samples": wavef.reshape(n, 1), "rate": rate}
    n_frames, fps = int(rng.randint(4, 12)), int(rng.randint(2, 12))
    hh, ww = int(rng.randint(8, 24)), int(rng.randint(8, 24))
    frames = rng.randint(0, 256, size=(n_frames, hh, ww, 3)).astype(np.uint8)
    return {"kind": kind, "frames": frames, "fps": fps}


def _spec_payload(spec: dict) -> bytes:
    if spec["kind"] == "image":
        return codecs.encode_png(spec["image"])
    if spec["kind"] == "audio":
        return codecs.encode_wav(spec["samples"], spec["rate"])
    return codecs.encode_avi(spec["frames"], spec["fps"])


def _corrupt(payload: bytes, ref: str, seed: int, kind: str) -> bytes:
    """Deterministic single-byte flip that every codec here DETECTS.

    PNG carries per-chunk CRCs, so any body flip is caught; RIFF formats
    (WAV/AVI) have no checksum — a data-byte flip would decode 'successfully'
    with wrong samples — so for those the flip hits the RIFF subtype tag,
    which the container parser rejects structurally."""
    h = hashlib.blake2b(f"corrupt:{seed}:{ref}".encode(), digest_size=4).digest()
    if kind == "image":
        pos = 16 + int.from_bytes(h, "big") % max(1, len(payload) - 24)
    else:
        pos = 8 + int.from_bytes(h, "big") % 4
    b = bytearray(payload)
    b[pos] ^= 0xFF
    return bytes(b)


def _plant_flags(ref: str, seed: int, mismatch_frac: float,
                 corrupt_frac: float) -> Tuple[bool, bool]:
    # flags straight from independent hash words — NOT sequential RNG draws
    # (MT19937's first outputs after a fresh 32-bit seed are visibly
    # non-uniform; measured: min second-draw 0.17 over 40 seeds)
    h = hashlib.blake2b(f"plant:{seed}:{ref}".encode(), digest_size=8).digest()
    u1 = int.from_bytes(h[:4], "big") / 2**32
    u2 = int.from_bytes(h[4:], "big") / 2**32
    return u1 < mismatch_frac, u2 < corrupt_frac


_OTHER_KIND = {"image": "audio", "audio": "video", "video": "image"}
_MIME = {"image": "image/png", "audio": "audio/wav", "video": "video/x-msvideo"}


def real_assets_for_docs(doc_media_refs, seed: int = 42,
                         mismatch_frac: float = 0.0,
                         corrupt_frac: float = 0.0) -> pa.Table:
    """Asset table with REAL codec payloads for a list of (doc_id, media_ref).

    ``mismatch_frac`` deterministically mislabels the declared ``kind`` (the
    payload stays valid — the consistency gate catches the lie by magic
    bytes); ``corrupt_frac`` flips one payload byte so decode fails
    (CRC/structure error -> ``decode_ok=False`` downstream)."""
    rows = {k: [] for k in ("media_ref", "doc_id", "kind", "payload", "mime",
                            "width", "height", "duration_ms")}
    for doc_id, ref in doc_media_refs:
        spec = _asset_spec(ref, seed)
        kind = spec["kind"]
        payload = _spec_payload(spec)
        mismatch, corrupt = _plant_flags(ref, seed, mismatch_frac, corrupt_frac)
        declared = _OTHER_KIND[kind] if mismatch else kind
        if corrupt:
            payload = _corrupt(payload, ref, seed, kind)
        if kind == "image":
            w, hgt, dur = spec["image"].shape[1], spec["image"].shape[0], 0
        elif kind == "audio":
            w = hgt = 0
            dur = int(round(len(spec["samples"]) * 1000.0 / spec["rate"]))
        else:
            _n, fh, fw = spec["frames"].shape[:3]
            w, hgt = fw, fh
            dur = int(round(_n * 1000.0 / spec["fps"]))
        rows["media_ref"].append(ref)
        rows["doc_id"].append(doc_id)
        rows["kind"].append(declared)
        rows["payload"].append(payload)
        rows["mime"].append(_MIME[declared])
        rows["width"].append(int(w))
        rows["height"].append(int(hgt))
        rows["duration_ms"].append(int(dur))
    return pa.table(rows, schema=ASSET_SCHEMA)


def _q9(v: float) -> int:
    return int(np.floor(v * 1e9 + 0.5))


# canonical digest of an undecodable payload — sniff can't always recover the
# source kind from a structurally-corrupted container, so failures collapse
# to one form; the golden pins exactly WHICH refs must fail
_CORRUPT_DIGEST = "!corrupt"


def _feature_digest(kind: str, consistent: bool, w: int, h: int, dur_ms: int,
                    tw: int, th: int, feats) -> str:
    q = ",".join(str(_q9(float(f))) for f in feats)
    return f"{kind}|c{int(consistent)}|{w}x{h}|{dur_ms}|t{tw}x{th}|{q}"


def media_decode_golden(doc_media_refs, seed: int = 42,
                        mismatch_frac: float = 0.0,
                        corrupt_frac: float = 0.0,
                        target_size: int = 64) -> pa.Table:
    """First-principles golden for :func:`decode_media` over
    :func:`real_assets_for_docs` — features computed from the SOURCE arrays
    (never encoded), so equality with the engine's decode output proves the
    encode->decode round trip is lossless, per asset, corpus-wide.  The
    digest also pins the consistency-gate verdict (kind mislabels) and the
    decode-failure verdict (planted corruptions)."""
    refs, digests = [], []
    for _doc_id, ref in doc_media_refs:
        spec = _asset_spec(ref, seed)
        kind = spec["kind"]
        mismatch, corrupt = _plant_flags(ref, seed, mismatch_frac, corrupt_frac)
        if corrupt:
            digest = _CORRUPT_DIGEST
        elif kind == "image":
            arr = spec["image"]
            th = codecs.resize_nearest(arr, target_size)
            digest = _feature_digest(
                kind, not mismatch, arr.shape[1], arr.shape[0], 0,
                th.shape[1], th.shape[0], codecs.image_features(arr))
        elif kind == "audio":
            dur = int(round(len(spec["samples"]) * 1000.0 / spec["rate"]))
            digest = _feature_digest(
                kind, not mismatch, 0, 0, dur, 0, 0,
                codecs.audio_features(spec["samples"], spec["rate"]))
        else:
            fr = spec["frames"]
            dur = int(round(len(fr) * 1000.0 / spec["fps"]))
            digest = _feature_digest(
                kind, not mismatch, fr.shape[2], fr.shape[1], dur, 0, 0,
                codecs.video_features(fr[0], len(fr), float(spec["fps"])))
        refs.append(ref)
        digests.append(digest)
    return pa.table({"media_ref": pa.array(refs, pa.string()),
                     "decode_digest": pa.array(digests, pa.string())})


def frame_sample_golden(doc_media_refs, seed: int = 42,
                        every_ms: int = 1000, max_frames: int = 32) -> pa.Table:
    """First-principles golden for :func:`frame_sample`: per video ref the
    (frame_idx, ts_ms, quantized features) sequence a real AVI player would
    produce — frame-at-timestamp via the fps clock on the SOURCE arrays."""
    refs, digests = [], []
    for _doc_id, ref in doc_media_refs:
        spec = _asset_spec(ref, seed)
        if spec["kind"] != "video":
            continue
        fr, fps = spec["frames"], spec["fps"]
        dur = int(round(len(fr) * 1000.0 / fps))
        parts = []
        for i, ts in enumerate(range(0, dur, every_ms)):
            if i >= max_frames:
                break
            fidx = min(int(ts * fps // 1000), len(fr) - 1)
            q = ",".join(str(_q9(float(f)))
                         for f in codecs.image_features(fr[fidx]))
            parts.append(f"{i}:{ts}:{fidx}:{q}")
        refs.append(ref)
        digests.append(";".join(parts))
    return pa.table({"media_ref": pa.array(refs, pa.string()),
                     "frame_digest": pa.array(digests, pa.string())})


# ---------------------------------------------------------------------------
# Decode stage
# ---------------------------------------------------------------------------


class MediaDecodeStage:
    """Actor-pool decode/feature stage.

    ``use_fake=False`` (real mode): payloads are decoded by the real codecs
    (PNG/WAV/AVI, functions/codecs.py) — dimensions, durations, features and
    thumbnail sizes come from the decoded arrays, and undecodable payloads
    are tagged ``decode_ok=False`` with zeroed features (tag-and-keep).
    ``use_fake=True`` (legacy): blake2b pseudo-features from raw bytes, for
    pre-codec asset tables and unsupported formats.

    Setup state (none heavy here, but the codec dispatch table and target
    size) binds once per actor in ``__init__``; per-asset decode is
    inherently per-row over opaque binaries — the numpy kernels inside each
    decode are the vectorized interior.  Large payloads => small
    ``batch_size`` (see module docstring)."""

    FEATURE_DIM = codecs.FEATURE_DIM

    def __init__(self, use_fake: bool = True, target_size: int = 64):
        self.use_fake = use_fake
        self.target_size = target_size

    # -- legacy pseudo-features ------------------------------------------------
    def _fake_features(self, payload: bytes) -> np.ndarray:
        digest = hashlib.blake2b(payload or b"", digest_size=self.FEATURE_DIM * 4).digest()
        ints = np.frombuffer(digest, dtype=np.uint32).astype(np.float64)
        return ints / 2**32

    # -- real decode ------------------------------------------------------------
    def _decode_real(self, payload: bytes):
        """payload -> (ok, kind, w, h, dur_ms, features, thumb_w, thumb_h)."""
        zero = np.zeros(self.FEATURE_DIM)
        kind = sniff_media_kind(payload or b"")
        try:
            if kind == "image":
                arr = codecs.decode_png(payload)
                th = codecs.resize_nearest(arr, self.target_size)
                return (True, kind, arr.shape[1], arr.shape[0], 0,
                        codecs.image_features(arr), th.shape[1], th.shape[0])
            if kind == "audio":
                samples, rate = codecs.decode_wav(payload)
                dur = int(round(len(samples) * 1000.0 / rate))
                return (True, kind, 0, 0, dur,
                        codecs.audio_features(samples, rate), 0, 0)
            if kind == "video":
                r = codecs.AviReader(payload)
                first = r.decode_frame(0)
                return (True, kind, r.width, r.height, r.duration_ms,
                        codecs.video_features(first, r.n_frames, r.fps), 0, 0)
        except (ValueError, EOFError, struct_error, wave_error, zlib_error):
            pass
        return (False, kind, 0, 0, 0, zero, 0, 0)

    def __call__(self, batch: pa.Table) -> pa.Table:
        payloads = batch.column("payload").to_pylist()
        kinds = batch.column("kind").to_pylist()
        widths = batch.column("width").to_pylist()
        heights = batch.column("height").to_pylist()
        n = batch.num_rows
        feats: List[np.ndarray] = []
        thumb_w, thumb_h = [], []
        ok_col, w_col, h_col, dur_col = [], [], [], []
        if self.use_fake:
            for p, k, w, h in zip(payloads, kinds, widths, heights):
                feats.append(self._fake_features(p))
                if k == "image" and w and h:
                    scale = self.target_size / max(w, h)
                    thumb_w.append(max(1, int(w * min(1.0, scale))))
                    thumb_h.append(max(1, int(h * min(1.0, scale))))
                else:
                    thumb_w.append(0)
                    thumb_h.append(0)
            ok_col = [True] * n
            w_col, h_col = widths, heights
            dur_col = batch.column("duration_ms").to_pylist()
        else:
            for p in payloads:
                ok, _k, w, h, dur, f, tw, th = self._decode_real(p)
                ok_col.append(ok)
                w_col.append(w)
                h_col.append(h)
                dur_col.append(dur)
                feats.append(f)
                thumb_w.append(tw)
                thumb_h.append(th)
        cols = {"media_ref": batch.column("media_ref"),
                "doc_id": batch.column("doc_id"),
                "kind": batch.column("kind"),
                "decode_ok": pa.array(ok_col, pa.bool_()),
                "width": pa.array([int(v) for v in w_col], pa.int32()),
                "height": pa.array([int(v) for v in h_col], pa.int32()),
                "duration_ms": pa.array([int(v) for v in dur_col], pa.int32()),
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
    concurrency=(1, 4), batch_size: int = 32, target_size: int = 64,
) -> ray.data.Dataset:
    """Asset table -> per-asset features (small batches: binary payloads)."""
    return ds.map_batches(
        MediaDecodeStage,
        fn_constructor_kwargs=dict(use_fake=use_fake, target_size=target_size),
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

    ``use_fake=False`` (real mode): the AVI container is parsed per asset
    (``codecs.AviReader``); each sampled timestamp seeks to its frame via the
    stream's dwScale/dwRate clock, the DIB frame is decoded and featured with
    the shared image kernel — exactly a PyAV/ffmpeg sampler's shape, on the
    in-container codec.  Undecodable clips emit no frames.
    ``use_fake=True`` (legacy): deterministic pseudo-frame features from
    (payload, ts) using the declared ``duration_ms``.

    Output one row per sampled frame: (media_ref, doc_id, frame_idx, ts_ms,
    features).  Non-video rows emit no frames.  Explode factor is bounded by
    ``max_frames``, so a batch of B clips emits <= B x max_frames rows —
    size ``batch_size`` against payload bytes x explode factor.
    """

    FEATURE_DIM = codecs.FEATURE_DIM

    def __init__(self, use_fake: bool = True, every_ms: int = 1000,
                 max_frames: int = 32):
        self.use_fake = use_fake
        self.every_ms = int(every_ms)
        self.max_frames = int(max_frames)

    def _fake_frame_feature(self, payload: bytes, ts_ms: int) -> np.ndarray:
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
        o_ref, o_doc, o_idx, o_src, o_ts, o_f = [], [], [], [], [], []
        for ref, doc, kind, p, dur in zip(refs, docs, kinds, payloads, durs):
            if self.use_fake:
                if kind != "video" or not dur or dur <= 0:
                    continue
                ts = np.arange(0, int(dur), self.every_ms)[: self.max_frames]
                for i, t in enumerate(ts):
                    o_ref.append(ref)
                    o_doc.append(doc)
                    o_idx.append(i)
                    o_src.append(i)
                    o_ts.append(int(t))
                    o_f.append(self._fake_frame_feature(p, int(t)))
            else:
                if sniff_media_kind(p or b"") != "video":
                    continue
                try:
                    r = codecs.AviReader(p)
                except (ValueError, struct_error):
                    continue  # undecodable clip: no frames (tag-and-keep
                    # happens in decode_media; the sampler just skips)
                real_dur = r.duration_ms
                ts = np.arange(0, int(real_dur), self.every_ms)[: self.max_frames]
                for i, t in enumerate(ts):
                    src = r.frame_index_at(int(t))
                    try:
                        frame = r.decode_frame(src)
                    except ValueError:
                        continue
                    o_ref.append(ref)
                    o_doc.append(doc)
                    o_idx.append(i)
                    o_src.append(src)
                    o_ts.append(int(t))
                    o_f.append(codecs.image_features(frame))
        return pa.table({
            "media_ref": pa.array(o_ref, pa.string()),
            "doc_id": pa.array(o_doc, pa.string()),
            "frame_idx": pa.array(o_idx, pa.int32()),
            "src_frame": pa.array(o_src, pa.int32()),
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


def decode_digests(ds: ray.data.Dataset) -> ray.data.Dataset:
    """decode_media(real, gated) output -> (media_ref, decode_digest) — the
    engine side of the :func:`media_decode_golden` diff.  Requires the
    ``sniffed_kind``/``kind_consistent`` columns, i.e. run
    :func:`media_consistency_gate` before :func:`decode_media`."""

    def dig(batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = []
        for r in rows:
            if not r["decode_ok"]:
                out.append(_CORRUPT_DIGEST)
            else:
                out.append(_feature_digest(
                    r["sniffed_kind"], bool(r["kind_consistent"]),
                    int(r["width"]), int(r["height"]), int(r["duration_ms"]),
                    int(r["thumb_w"]), int(r["thumb_h"]), r["features"]))
        return pa.table({"media_ref": pa.array([r["media_ref"] for r in rows],
                                               pa.string()),
                         "decode_digest": pa.array(out, pa.string())})

    return ds.map_batches(dig, batch_format="pyarrow")


def frame_digests(ds: ray.data.Dataset) -> ray.data.Dataset:
    """frame_sample(real) output -> (media_ref, frame_digest): per-clip
    ordered '{idx}:{ts}:{frame}:{qfeatures}' join — engine side of
    :func:`frame_sample_golden`.  One groupby(media_ref) — clip-bounded."""

    def per_clip(group: pa.Table) -> pa.Table:
        rows = sorted(group.to_pylist(), key=lambda r: r["frame_idx"])
        parts = [f"{r['frame_idx']}:{r['ts_ms']}:{r['src_frame']}:"
                 + ",".join(str(_q9(float(f))) for f in r["features"])
                 for r in rows]
        return pa.table({"media_ref": pa.array([rows[0]["media_ref"]], pa.string()),
                         "frame_digest": pa.array([";".join(parts)], pa.string())})

    from ..dsutil import bucketed_segments_map

    return bucketed_segments_map(
        ds, "media_ref", per_clip, min_rows=1,
        empty_out=pa.table({"media_ref": pa.array([], pa.string()),
                            "frame_digest": pa.array([], pa.string())}))


# ---------------------------------------------------------------------------
# audio analysis (real WAV decode -> spectral/energy features)
# ---------------------------------------------------------------------------


def _audio_feature_kernel(samples: np.ndarray, rate: int) -> dict:
    """Shared feature math for decoded WAV samples and source arrays.

    The WAV round trip is lossless PCM16, so running this on the DECODED
    samples (engine) and on the SOURCE arrays (golden) must agree
    bit-for-bit — no tolerance needed.  Features: duration, RMS energy,
    zero-crossing rate, FFT-argmax dominant frequency (DC excluded;
    resolution rate/n), peak amplitude."""
    mono = samples[:, 0].astype(np.float64)
    n = int(mono.shape[0])
    dur_ms = int(round(n * 1000.0 / rate)) if n else 0
    rms = float(np.sqrt(np.mean(mono * mono))) if n else 0.0
    zc = int(np.count_nonzero(np.signbit(mono[1:])
                              != np.signbit(mono[:-1]))) if n > 1 else 0
    dom_hz = 0.0
    if n > 1:
        spec = np.abs(np.fft.rfft(mono))
        spec[0] = 0.0
        dom_hz = float(int(np.argmax(spec)) * rate / n)
    peak = int(np.max(np.abs(samples[:, 0].astype(np.int64)))) if n else 0
    return {
        "n_samples": n, "rate": int(rate), "duration_ms": dur_ms,
        "rms_q9": _q9(rms), "zcr_q9": _q9(zc / n if n else 0.0),
        "dom_freq_q9": _q9(dom_hz), "peak_i": peak,
    }


_AUDIO_FEATURE_COLS = ["n_samples", "rate", "duration_ms", "rms_q9",
                       "zcr_q9", "dom_freq_q9", "peak_i"]


class AudioFeatureStage:
    """Actor stage: asset rows -> one feature row per decodable WAV.

    Non-audio payloads (by magic-byte sniff, not the declared kind — a
    mislabeled PNG must not reach the WAV parser) and undecodable payloads
    are dropped; the golden pins exactly which refs must survive."""

    def __init__(self):
        pass  # the codec is stdlib `wave`; nothing to warm up

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_ref": []}
        out.update({c: [] for c in _AUDIO_FEATURE_COLS})
        refs = batch.column("media_ref").to_pylist()
        payloads = batch.column("payload").to_pylist()
        for ref, payload in zip(refs, payloads):
            if sniff_media_kind(payload) != "audio":
                continue
            try:
                samples, rate = codecs.decode_wav(payload)
            except (ValueError, EOFError, wave_error):
                continue
            feats = _audio_feature_kernel(samples, rate)
            out["media_ref"].append(ref)
            for c in _AUDIO_FEATURE_COLS:
                out[c].append(feats[c])
        return pa.table({
            "media_ref": pa.array(out["media_ref"], pa.string()),
            **{c: pa.array(out[c], pa.int64())
               for c in _AUDIO_FEATURE_COLS},
        })


def audio_features(
    assets: ray.data.Dataset, concurrency=(1, 8), batch_size: int = 64,
) -> ray.data.Dataset:
    """Audio feature extraction over an asset table (real WAV decode)."""
    return assets.map_batches(
        AudioFeatureStage, batch_format="pyarrow",
        concurrency=concurrency, batch_size=batch_size)


def audio_features_golden(doc_media_refs, seed: int = 42) -> pa.Table:
    """First-principles twin of :func:`audio_features` over CLEAN assets:
    features recomputed from the source sample arrays before encoding."""
    seen = set()
    rows = []
    for _doc_id, ref in doc_media_refs:
        if ref in seen:
            continue
        seen.add(ref)
        spec = _asset_spec(ref, seed)
        if spec["kind"] != "audio":
            continue
        feats = _audio_feature_kernel(spec["samples"], spec["rate"])
        rows.append({"media_ref": ref, **feats})
    rows.sort(key=lambda r: r["media_ref"])
    return pa.table({
        "media_ref": pa.array([r["media_ref"] for r in rows], pa.string()),
        **{c: pa.array([r[c] for r in rows], pa.int64())
           for c in _AUDIO_FEATURE_COLS},
    })


# ---------------------------------------------------------------------------
# video analysis (real AVI decode -> scene-cut detection)
# ---------------------------------------------------------------------------


def _scene_cut_kernel(frames: np.ndarray, threshold: float) -> dict:
    """Scene-cut detection over decoded frames: a cut lands wherever the
    mean absolute per-pixel difference between consecutive frames reaches
    ``threshold`` (0..255 scale).  Runs identically on decoded AVI frames
    (engine) and source arrays (golden) — the DIB round trip is lossless
    uint8, so cut indices and quantized diffs are bit-exact."""
    n = int(frames.shape[0])
    if n < 2:
        return {"n_frames": n, "n_cuts": 0, "cuts": "", "diffs_q3": ""}
    d = np.abs(frames[1:].astype(np.float64)
               - frames[:-1].astype(np.float64)).mean(axis=(1, 2, 3))
    cuts = (np.flatnonzero(d >= threshold) + 1).tolist()
    diffs_q3 = ",".join(str(int(np.floor(v * 1e3 + 0.5))) for v in d)
    return {"n_frames": n, "n_cuts": len(cuts),
            "cuts": ",".join(map(str, cuts)), "diffs_q3": diffs_q3}


class SceneCutStage:
    """Actor stage: asset rows -> one scene-cut row per decodable AVI."""

    def __init__(self, threshold: float = 8.0):
        self.threshold = float(threshold)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out = {"media_ref": [], "n_frames": [], "fps_q3": [],
               "n_cuts": [], "cuts": [], "diffs_q3": []}
        for ref, payload in zip(batch.column("media_ref").to_pylist(),
                                batch.column("payload").to_pylist()):
            if sniff_media_kind(payload) != "video":
                continue
            try:
                frames, fps = codecs.decode_avi_frames(payload)
            except (ValueError, EOFError, struct_error):
                continue
            k = _scene_cut_kernel(frames, self.threshold)
            out["media_ref"].append(ref)
            out["fps_q3"].append(int(np.floor(fps * 1e3 + 0.5)))
            for c in ("n_frames", "n_cuts", "cuts", "diffs_q3"):
                out[c].append(k[c])
        return pa.table({
            "media_ref": pa.array(out["media_ref"], pa.string()),
            "n_frames": pa.array(out["n_frames"], pa.int64()),
            "fps_q3": pa.array(out["fps_q3"], pa.int64()),
            "n_cuts": pa.array(out["n_cuts"], pa.int64()),
            "cuts": pa.array(out["cuts"], pa.string()),
            "diffs_q3": pa.array(out["diffs_q3"], pa.string()),
        })


def scene_cuts(
    assets: ray.data.Dataset, threshold: float = 8.0,
    concurrency=(1, 8), batch_size: int = 32,
) -> ray.data.Dataset:
    """Scene-cut detection over an asset table (real AVI decode)."""
    return assets.map_batches(
        SceneCutStage, fn_constructor_kwargs=dict(threshold=threshold),
        batch_format="pyarrow", concurrency=concurrency,
        batch_size=batch_size)


def scene_cuts_golden(doc_media_refs, threshold: float = 8.0,
                      seed: int = 42) -> pa.Table:
    """First-principles twin of :func:`scene_cuts` over CLEAN assets."""
    seen = set()
    rows = []
    for _doc_id, ref in doc_media_refs:
        if ref in seen:
            continue
        seen.add(ref)
        spec = _asset_spec(ref, seed)
        if spec["kind"] != "video":
            continue
        k = _scene_cut_kernel(spec["frames"], threshold)
        rows.append({"media_ref": ref,
                     "fps_q3": int(np.floor(spec["fps"] * 1e3 + 0.5)), **k})
    rows.sort(key=lambda r: r["media_ref"])
    return pa.table({
        "media_ref": pa.array([r["media_ref"] for r in rows], pa.string()),
        "n_frames": pa.array([r["n_frames"] for r in rows], pa.int64()),
        "fps_q3": pa.array([r["fps_q3"] for r in rows], pa.int64()),
        "n_cuts": pa.array([r["n_cuts"] for r in rows], pa.int64()),
        "cuts": pa.array([r["cuts"] for r in rows], pa.string()),
        "diffs_q3": pa.array([r["diffs_q3"] for r in rows], pa.string()),
    })


# ---------------------------------------------------------------------------
# doc-asset connected components (docs linked by shared media assets)
# ---------------------------------------------------------------------------


def doc_asset_components(refs: ray.data.Dataset,
                         max_rounds: int = 12) -> ray.data.Dataset:
    """Connected components over the doc <- shares-an-asset -> doc relation:
    ``refs`` is (doc_id, media_ref) rows (media_refs_from_docs output);
    returns (doc_id, component) for every doc carrying media, where
    ``component`` is the min doc_id reachable through shared assets
    (web-pipeline analog: pages embedding the same image/video are mirror
    candidates).

    Scale shape: ONE media_ref-keyed exchange emits star edges per shared
    asset (each doc in a group pairs with the group min — O(group) edges,
    connectivity-preserving), then distributed min-label propagation
    (dedup.dup_components_distributed) resolves components without any
    driver-resident state; singleton docs ride along as self-edges, so the
    output covers every input doc."""
    from .dedup import dup_components_distributed

    def star_partition(part: pa.Table) -> pa.Table:
        """Star edges for every asset of the partition in one pass: sort by
        (media_ref, doc_id), dedup (ref, doc) repeats with a run mask, then
        every non-first row of a ref segment pairs with the segment's first
        doc; singleton segments emit a self-edge."""
        import numpy as np
        import pyarrow.compute as pc

        dtype = part.column("doc_id").type
        n = part.num_rows
        if n == 0:
            return pa.table({"id_a": pa.array([], dtype),
                             "id_b": pa.array([], dtype)})
        part = part.take(pc.sort_indices(part, sort_keys=[
            ("media_ref", "ascending"), ("doc_id", "ascending")]))
        r = part.column("media_ref").to_numpy(zero_copy_only=False)
        d = part.column("doc_id").to_numpy(zero_copy_only=False)
        keep = np.r_[True, (r[1:] != r[:-1]) | (d[1:] != d[:-1])]
        sel = np.flatnonzero(keep)
        part = part.take(pa.array(sel, pa.int64()))
        r = r[sel]
        m = len(sel)
        new_ref = np.r_[True, r[1:] != r[:-1]]
        starts = np.flatnonzero(new_ref)
        seg = np.cumsum(new_ref) - 1
        counts = np.diff(np.append(starts, m))
        others = np.flatnonzero(~new_ref)              # non-root rows
        singles = starts[counts == 1]                  # self-edge roots
        a_idx = np.concatenate([starts[seg[others]], singles])
        b_idx = np.concatenate([others, singles])
        docs = part.column("doc_id")
        return pa.table({"id_a": docs.take(pa.array(a_idx, pa.int64())),
                         "id_b": docs.take(pa.array(b_idx, pa.int64()))})

    from ..dsutil import keyed_partition_map

    edges = keyed_partition_map(refs, "media_ref", star_partition)
    comp = dup_components_distributed(edges, "id_a", "id_b",
                                      max_rounds=max_rounds)

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(["doc_id", "component"])

    return comp.map_batches(rename, batch_format="pyarrow")
