"""Perceptual image near-dup over REAL decoded payloads.

The multimodal counterpart of the text near-dup family (MinHash/SimHash,
pipelines/dedup.py): every image asset is decoded (real PNG codec,
functions/codecs.py), fingerprinted with a 64-bit difference hash, and
near-duplicates (Hamming distance <= ``max_hamming``) are found with banded
LSH — the pigeonhole argument SimHash dedup uses: split the 64-bit hash
into ``bands`` contiguous chunks; two hashes within Hamming distance
``bands - 1`` of each other agree exactly on at least one band, so only
band-bucket collisions are ever compared.

Scale shape: decode+hash is a zero-shuffle actor stage; the band-bucket
groupby's map side carries 8-byte hashes (never pixels); candidate pairs
are verified with exact Hamming inside the bucket group and deduped by one
keyed combine.  Components and group assignment are fully distributed
(``fingerprint.grouped_refs_from_pairs``: min-label rounds + a root left
join) — nothing corpus-sized lands on the driver.
"""

from __future__ import annotations

from typing import Tuple

import numpy as np
import pyarrow as pa
import ray.data

from ..functions import codecs


def _u64_to_i64(h: int) -> int:
    return int(np.array([h], np.uint64).view(np.int64)[0])


def assets_with_image_dups(doc_media_refs, seed: int = 42,
                           scale: int = 2) -> Tuple[pa.Table, pa.Table]:
    """(asset_table, golden_groups): the real asset table plus, for every
    image asset, a planted near-duplicate twin — the SAME picture upscaled
    ``scale``x by pixel repetition and re-encoded (dhash64 is exactly
    invariant to integer nearest upscaling, so the twin is a guaranteed
    Hamming-0 near-dup of its base while distinct random images stay far
    apart).  The golden maps each base image and its twin to the base ref
    and every untwinned image to itself — first principles, no LSH."""
    from .multimodal import _asset_spec, real_assets_for_docs

    base = real_assets_for_docs(doc_media_refs, seed=seed)
    rows = {c: base.column(c).to_pylist() for c in base.column_names}
    g_ref, g_grp = [], []
    for doc_id, ref in doc_media_refs:
        spec = _asset_spec(ref, seed)
        if spec["kind"] != "image":
            continue
        arr = spec["image"]
        twin_ref = f"{ref}#up{scale}"
        up = np.repeat(np.repeat(arr, scale, axis=0), scale, axis=1)
        rows["media_ref"].append(twin_ref)
        rows["doc_id"].append(doc_id)
        rows["kind"].append("image")
        rows["payload"].append(codecs.encode_png(up))
        rows["mime"].append("image/png")
        rows["width"].append(int(up.shape[1]))
        rows["height"].append(int(up.shape[0]))
        rows["duration_ms"].append(0)
        g_ref.extend([ref, twin_ref])
        g_grp.extend([ref, ref])
    from .multimodal import ASSET_SCHEMA

    assets = pa.table(rows, schema=ASSET_SCHEMA)
    order = np.argsort(np.array(g_ref))
    golden = pa.table({
        "media_ref": pa.array([g_ref[i] for i in order], pa.string()),
        "group": pa.array([g_grp[i] for i in order], pa.string()),
    })
    return assets, golden


class ImageDHashStage:
    """Actor stage: asset batch -> (media_ref, dhash) for decodable images
    (sniffed by magic, decoded by the real codec; others emit nothing)."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        refs_out, hashes = [], []
        for ref, payload in zip(batch.column("media_ref").to_pylist(),
                                batch.column("payload").to_pylist()):
            if not (payload or b"").startswith(codecs.PNG_SIG):
                continue
            try:
                arr = codecs.decode_png(payload)
            except ValueError:
                continue
            refs_out.append(ref)
            hashes.append(_u64_to_i64(codecs.dhash64(arr)))
        return pa.table({"media_ref": pa.array(refs_out, pa.string()),
                         "dhash": pa.array(hashes, pa.int64())})


def image_dhashes(assets: ray.data.Dataset, batch_size: int = 32,
                  concurrency=(1, 8)) -> ray.data.Dataset:
    return assets.map_batches(ImageDHashStage, batch_format="pyarrow",
                              batch_size=batch_size, concurrency=concurrency)


def near_dup_image_groups(
    assets: ray.data.Dataset,
    max_hamming: int = 3,
    bands: int = 4,
    bucket_cap: int = 2048,
) -> ray.data.Dataset:
    """Dataset of (media_ref, group) for every decodable image; ``group``
    is the lexicographic-min media_ref of the near-dup component (singletons
    map to themselves).  Complete for pairs within Hamming ``bands - 1``;
    ``max_hamming`` must be < ``bands`` for the pigeonhole guarantee."""
    if max_hamming >= bands:
        raise ValueError("banded LSH is only complete for max_hamming < bands")
    # materialize: consumed by BOTH the pair pipeline and the final ref scan
    # (a lazy Dataset would re-run the decode stage twice)
    hashes = image_dhashes(assets).materialize()
    band_bits = 64 // bands
    mask = (1 << band_bits) - 1

    def to_buckets(batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        hs = batch.column("dhash").to_numpy(zero_copy_only=False).view(np.uint64)
        out_key, out_ref, out_h = [], [], []
        for b in range(bands):
            band = ((hs >> np.uint64(b * band_bits))
                    & np.uint64(mask)).astype(np.int64)
            out_key.extend((np.int64(b) << np.int64(band_bits)) + band)
            out_ref.extend(refs)
            out_h.extend(batch.column("dhash").to_pylist())
        return pa.table({"bucket": pa.array(out_key, pa.int64()),
                         "media_ref": pa.array(out_ref, pa.string()),
                         "dhash": pa.array(out_h, pa.int64())})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        refs = group.column("media_ref").to_pylist()[:bucket_cap]
        hs = group.column("dhash").to_pylist()[:bucket_cap]
        a_out, b_out = [], []
        for i in range(len(refs)):
            for j in range(i + 1, len(refs)):
                if refs[i] == refs[j]:
                    continue
                if codecs.hamming64(hs[i], hs[j]) <= max_hamming:
                    lo, hi = sorted((refs[i], refs[j]))
                    a_out.append(lo)
                    b_out.append(hi)
        return pa.table({"a": pa.array(a_out, pa.string()),
                         "b": pa.array(b_out, pa.string())})

    from ray.data.aggregate import Count

    from ..dsutil import bucketed_segments_map
    from .fingerprint import grouped_refs_from_pairs

    pairs = (bucketed_segments_map(
                 hashes.map_batches(to_buckets, batch_format="pyarrow"),
                 "bucket", bucket_pairs,
                 empty_out=pa.table({"a": pa.array([], pa.string()),
                                     "b": pa.array([], pa.string())}))
             .groupby(["a", "b"]).aggregate(Count(alias_name="_n")))

    return grouped_refs_from_pairs(hashes.select_columns(["media_ref"]),
                                   pairs)
