"""Perceptual audio near-dup over REAL decoded WAV payloads.

The acoustic member of the perceptual near-dup family (imagededup /
videodedup): every audio asset is decoded (real PCM16 WAV codec,
functions/codecs.py), fingerprinted with a 64-bit temporal energy-gradient
hash — the audio analog of dHash: 65 evenly-sampled windows, one bit per
"did mean absolute energy rise between consecutive windows" — and
near-duplicates (Hamming distance <= ``max_hamming``) are found with the
shared banded-Hamming LSH (pipelines/fingerprint.py).

The fingerprint compares INTEGER per-window |x| sums of equal-``n`` clips,
so it is exactly invariant to positive gain scaling (every window sum
scales by the same factor; strict comparisons are unchanged) and to
polarity inversion (|x|), as well as to any lossless re-encode — which is
what makes the planted-twin golden first-principles: a gain-scaled twin is
a guaranteed Hamming-0 near-dup of its base, while distinct random clips
(different carrier frequency + noise) stay far apart.

Scale shape: decode+fingerprint is a zero-shuffle actor stage (samples
never leave the worker; the exchange carries 8-byte hashes); see
fingerprint.banded_hamming_groups for the grouping contract.

Reference analog: binary-payload parsing into typed per-document structure,
/root/reference/app/services/pdf_processor.py:364-377.
"""

from __future__ import annotations

import wave
from typing import Tuple

import numpy as np
import pyarrow as pa
import ray.data

from ..functions import codecs
from .fingerprint import banded_hamming_groups

FP_WINDOWS = 64  # bits per fingerprint (65 window boundaries)


def audio_fingerprint64(samples: np.ndarray) -> int:
    """64-bit temporal energy-gradient hash of decoded PCM16 samples.

    Mono-mixes by summing channels (|sum| keeps gain linearity), splits the
    clip into 65 windows via the floor map ``floor(i * n / 65)`` (the same
    integer-sampling rule dhash64 uses), takes the exact int64 sum of |x|
    per window, and emits one bit per consecutive-window strict increase.
    Pure integer arithmetic end to end — no float ties to drift."""
    x = samples.astype(np.int64)
    if x.ndim == 2:
        x = x.sum(axis=1)
    n = x.shape[0]
    w = FP_WINDOWS + 1
    bounds = (np.arange(w + 1) * (n / w)).astype(np.int64)
    csum = np.concatenate([[0], np.cumsum(np.abs(x))])
    e = csum[bounds[1:]] - csum[bounds[:-1]]
    bits = (e[1:] > e[:-1])
    return int.from_bytes(np.packbits(bits).tobytes(), "big")


def assets_with_audio_dups(doc_media_refs, seed: int = 42,
                           gain: int = 2) -> Tuple[pa.Table, pa.Table]:
    """(asset_table, golden_groups): the real asset table plus, for every
    audio asset, a planted near-duplicate twin — the SAME clip with every
    sample scaled by ``gain`` and re-encoded (the energy-gradient
    fingerprint is exactly invariant to positive gain, so the twin is a
    guaranteed Hamming-0 near-dup of its base).  The golden maps each base
    clip and its twin to the base ref and every untwinned clip to itself —
    first principles, no LSH involved."""
    from .multimodal import ASSET_SCHEMA, _asset_spec, real_assets_for_docs

    base = real_assets_for_docs(doc_media_refs, seed=seed)
    rows = {c: base.column(c).to_pylist() for c in base.column_names}
    g_ref, g_grp = [], []
    seen = set()
    for doc_id, ref in doc_media_refs:
        if ref in seen:
            continue
        seen.add(ref)
        spec = _asset_spec(ref, seed)
        if spec["kind"] != "audio":
            continue
        samples, rate = spec["samples"], spec["rate"]
        scaled = samples.astype(np.int64) * gain
        if np.abs(scaled).max() > np.iinfo(np.int16).max:
            raise ValueError("gain would clip PCM16 — pick a smaller gain")
        twin_ref = f"{ref}#g{gain}"
        rows["media_ref"].append(twin_ref)
        rows["doc_id"].append(doc_id)
        rows["kind"].append("audio")
        rows["payload"].append(
            codecs.encode_wav(scaled.astype(np.int16), rate))
        rows["mime"].append("audio/wav")
        rows["width"].append(0)
        rows["height"].append(0)
        rows["duration_ms"].append(
            int(round(samples.shape[0] * 1000.0 / rate)))
        g_ref.extend([ref, twin_ref])
        g_grp.extend([ref, ref])

    assets = pa.table(rows, schema=ASSET_SCHEMA)
    order = np.argsort(np.array(g_ref))
    golden = pa.table({
        "media_ref": pa.array([g_ref[i] for i in order], pa.string()),
        "group": pa.array([g_grp[i] for i in order], pa.string()),
    })
    return assets, golden


class AudioFingerprintStage:
    """Actor stage: asset batch -> (media_ref, sig) for decodable WAVs
    (sniffed by container magic; undecodable payloads emit nothing)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .multimodal import sniff_media_kind

        refs_out, sigs = [], []
        for ref, payload in zip(batch.column("media_ref").to_pylist(),
                                batch.column("payload").to_pylist()):
            if sniff_media_kind(payload) != "audio":
                continue
            try:
                samples, _rate = codecs.decode_wav(payload)
            except (ValueError, EOFError, wave.Error):
                continue
            if samples.shape[0] < FP_WINDOWS + 1:
                continue  # shorter than one sample per window: no signal
            refs_out.append(ref)
            sigs.append(audio_fingerprint64(samples).to_bytes(8, "big"))
        return pa.table({"media_ref": pa.array(refs_out, pa.string()),
                         "sig": pa.array(sigs, pa.binary())})


def audio_fingerprints(assets: ray.data.Dataset, batch_size: int = 32,
                       concurrency=(1, 8)) -> ray.data.Dataset:
    return assets.map_batches(AudioFingerprintStage, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency)


def near_dup_audio_groups(
    assets: ray.data.Dataset,
    max_hamming: int = 3,
    bands: int = 4,
    bucket_cap: int = 2048,
) -> ray.data.Dataset:
    """(media_ref, group) for every decodable audio clip; ``group`` is the
    lexicographic-min media_ref of the near-dup component."""
    return banded_hamming_groups(audio_fingerprints(assets),
                                 max_hamming=max_hamming, bands=bands,
                                 bucket_cap=bucket_cap)
