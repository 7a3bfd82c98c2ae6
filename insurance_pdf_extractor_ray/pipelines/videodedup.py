"""Perceptual video near-dup over REAL decoded AVI payloads.

The temporal extension of the image near-dup family (pipelines/imagededup.py):
every video asset is container-parsed and frame-decoded (real RIFF/AVI + DIB
codec, functions/codecs.py), fingerprinted with a K-frame dHash signature
(dhash64 of K evenly-sampled frames), and near-duplicates (max per-frame
Hamming distance <= ``max_hamming`` across the aligned signature) are found
with banded LSH over the FIRST sampled frame's hash — the same pigeonhole
argument image/SimHash dedup use: two signatures within overall distance
``bands - 1`` are within that distance on frame 0, so they agree exactly on
at least one band of it and only band-bucket collisions are ever compared.

Frame sampling uses the floor map ``idx = floor(i * n / K)`` — the same
integer-sampling rule dhash64 itself uses — so the signature is exactly
invariant to frame-wise integer nearest upscaling and to any lossless
re-encode, which is what makes the planted-twin golden first-principles.

Scale shape: decode+signature is a zero-shuffle actor stage (pixels never
leave the worker; the map side of the exchange carries K*8-byte signatures);
the only exchange is the band-bucket groupby; candidate pairs are verified
with exact Hamming inside the bucket group and deduped by one keyed combine.
The final connected-components step runs on the driver over the verified-pair
set (dup-bounded — swap in dedup.dup_components_distributed for billion-pair
regimes, exactly like jaccard_component_dedup).

Reference analog: binary-payload parsing into typed per-document structure,
/root/reference/app/services/pdf_processor.py:364-377.
"""

from __future__ import annotations

from struct import error as struct_error
from typing import Tuple

import numpy as np
import pyarrow as pa
import ray.data

from ..functions import codecs

SIG_FRAMES = 4  # K: frames sampled per video signature


def _signature(frames: np.ndarray, k: int = SIG_FRAMES) -> bytes:
    """K*8-byte big-endian concatenation of dhash64 over K evenly-sampled
    frames (floor map; videos shorter than K repeat frames, deterministic)."""
    n = int(frames.shape[0])
    idx = (np.arange(k) * (n / k)).astype(np.int64)
    return b"".join(codecs.dhash64(frames[int(i)]).to_bytes(8, "big")
                    for i in idx)


def assets_with_video_dups(doc_media_refs, seed: int = 42,
                           scale: int = 2) -> Tuple[pa.Table, pa.Table]:
    """(asset_table, golden_groups): the real asset table plus, for every
    video asset, a planted near-duplicate twin — the SAME clip with every
    frame upscaled ``scale``x by pixel repetition and re-encoded (the K-frame
    dHash signature is exactly invariant to integer nearest upscaling, so the
    twin is a guaranteed Hamming-0 near-dup of its base while distinct random
    clips stay far apart).  The golden maps each base clip and its twin to
    the base ref and every untwinned clip to itself — first principles, no
    LSH involved."""
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
        if spec["kind"] != "video":
            continue
        frames, fps = spec["frames"], spec["fps"]
        up = np.repeat(np.repeat(frames, scale, axis=1), scale, axis=2)
        twin_ref = f"{ref}#up{scale}"
        rows["media_ref"].append(twin_ref)
        rows["doc_id"].append(doc_id)
        rows["kind"].append("video")
        rows["payload"].append(codecs.encode_avi(up, fps))
        rows["mime"].append("video/avi")
        rows["width"].append(int(up.shape[2]))
        rows["height"].append(int(up.shape[1]))
        rows["duration_ms"].append(
            int(round(up.shape[0] * 1000.0 / fps)))
        g_ref.extend([ref, twin_ref])
        g_grp.extend([ref, ref])

    assets = pa.table(rows, schema=ASSET_SCHEMA)
    order = np.argsort(np.array(g_ref))
    golden = pa.table({
        "media_ref": pa.array([g_ref[i] for i in order], pa.string()),
        "group": pa.array([g_grp[i] for i in order], pa.string()),
    })
    return assets, golden


class VideoSignatureStage:
    """Actor stage: asset batch -> (media_ref, sig) for decodable AVIs
    (sniffed by container magic; undecodable payloads emit nothing)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .multimodal import sniff_media_kind

        refs_out, sigs = [], []
        for ref, payload in zip(batch.column("media_ref").to_pylist(),
                                batch.column("payload").to_pylist()):
            if sniff_media_kind(payload) != "video":
                continue
            try:
                frames, _fps = codecs.decode_avi_frames(payload)
            except (ValueError, EOFError, struct_error):
                continue
            if frames.shape[0] == 0:
                continue
            refs_out.append(ref)
            sigs.append(_signature(frames))
        return pa.table({"media_ref": pa.array(refs_out, pa.string()),
                         "sig": pa.array(sigs, pa.binary())})


def video_signatures(assets: ray.data.Dataset, batch_size: int = 32,
                     concurrency=(1, 8)) -> ray.data.Dataset:
    return assets.map_batches(VideoSignatureStage, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency)


def near_dup_video_groups(
    assets: ray.data.Dataset,
    max_hamming: int = 3,
    bands: int = 4,
    bucket_cap: int = 2048,
) -> ray.data.Dataset:
    """(media_ref, group) for every decodable video; ``group`` is the
    lexicographic-min media_ref of the near-dup component (singletons map to
    themselves).  Complete for signature pairs whose max per-frame Hamming
    distance is within ``bands - 1``; ``max_hamming`` must be < ``bands``
    for the pigeonhole guarantee (frame-0 distance <= max distance).
    Grouping is the shared banded-Hamming LSH (pipelines/fingerprint.py)."""
    from .fingerprint import banded_hamming_groups

    return banded_hamming_groups(video_signatures(assets),
                                 max_hamming=max_hamming, bands=bands,
                                 bucket_cap=bucket_cap)
