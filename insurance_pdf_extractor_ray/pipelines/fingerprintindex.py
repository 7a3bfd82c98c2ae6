"""Incremental perceptual near-dup dedup against an at-rest fingerprint index.

The multimodal member of the incremental-dedup family (exact: dedup.py,
MinHash: minhashindex.py, embeddings: embindex.py): a continuous media
ingest asks "is this image/clip a perceptual near-dup of anything kept in
any PREVIOUS batch?" without re-decoding or re-shuffling the accumulated
corpus.  Works over the SIGNATURE rows the batch family already produces
(imagededup.image_dhashes / videodedup.video_signatures /
audiodedup.audio_fingerprints — ``(media_ref, sig binary)``, one or more
big-endian 64-bit perceptual hashes per row), so one index implementation
serves every modality.  Signature widths must match WITHIN an index — run
one index per modality, they are not cross-comparable anyway.

At-rest state under ``index_dir`` is ONE bucketed layout (``bands/``):
(band_key int64, media_ref, sig) hash-bucketed on band_key — ``bands``
rows per kept asset.  Unlike minhashindex there is NO separate signature
table: a perceptual signature is 8-32 bytes (vs ~1 KB for 128-perm
MinHash), so carrying it on every band row costs less than the second
co-located join a split layout would need.

Probe scale shape (zero all-to-all exchange):
  1. the increment's (band_key, media_ref, sig) rows — bands of the FIRST
     8-byte chunk, same pigeonhole contract as
     fingerprint.banded_hamming_groups — are written into a matching
     bucket layout (map pass);
  2. within-increment dups: per-bucket local run-split by band_key,
     pairwise aligned-max-Hamming verify, DROP THE LARGER ref of every
     verified pair — keeps every near-dup component's lexicographic min
     (for chain components this may also keep non-adjacent local minima;
     exact component semantics remain the batch path's job);
  3. cross-increment dups: ``bucketed_join`` on band_key — one local Arrow
     join task per co-located bucket pair, the index never moves — then a
     vectorized XOR-popcount Hamming verify against the carried index
     signatures.

Recall is the banded pigeonhole guarantee (complete for pairs within
``bands - 1`` on chunk 0); verification is exact Hamming, so precision is
exact.  Commit protocol mirrors the family: data first, index last
(``fingerprint_index_append`` after the kept rows are durably sunk).
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

from .bucketed import _read_bucket, bucketed_join, layout_of, write_bucketed
from .dedup import MAX_BROADCAST_ROWS, filter_by_ids
from .fingerprint import sig_hamming

_BANDS = "bands"


def _band_rows(sigs: ray.data.Dataset, bands: int) -> ray.data.Dataset:
    """(band_key, media_ref, sig) — ``bands`` rows per signature, keyed on
    contiguous bit-bands of the first 8-byte chunk (same key formula as
    fingerprint.banded_hamming_groups, so thresholds are comparable)."""
    band_bits = 64 // bands
    mask = (1 << band_bits) - 1

    def explode(batch: pa.Table) -> pa.Table:
        refs = batch.column("media_ref").to_pylist()
        raw = batch.column("sig").to_pylist()
        f0 = np.array([int.from_bytes(s[:8], "big") for s in raw], np.uint64)
        out_key, out_ref, out_sig = [], [], []
        for b in range(bands):
            band = ((f0 >> np.uint64(b * band_bits))
                    & np.uint64(mask)).astype(np.int64)
            out_key.extend((np.int64(b) << np.int64(band_bits)) + band)
            out_ref.extend(refs)
            out_sig.extend(raw)
        return pa.table({"band_key": pa.array(out_key, pa.int64()),
                         "media_ref": pa.array(out_ref, pa.string()),
                         "sig": pa.array(out_sig, pa.binary())})

    return sigs.map_batches(explode, batch_format="pyarrow")


def _hamming_max(a_col, b_col) -> np.ndarray:
    """Vectorized max per-8-byte-chunk Hamming distance for aligned binary
    columns: XOR as uint64 words, popcount via unpackbits."""
    A = np.stack([np.frombuffer(b, np.uint64) for b in a_col.to_pylist()])
    B = np.stack([np.frombuffer(b, np.uint64) for b in b_col.to_pylist()])
    x = (A ^ B).view(np.uint8)
    n, k = A.shape
    return np.unpackbits(x, axis=1).reshape(n, k, 64).sum(axis=2).max(axis=1)


def _local_band_dups(bands_path: str, max_hamming: int,
                     bucket_cap: int) -> ray.data.Dataset:
    """Within-increment dup refs from the increment's own band layout: one
    task per bucket, local run-split by band_key, pairwise verify, larger
    ref of every verified pair — no shuffle."""
    n = layout_of(bands_path)["n_buckets"]
    empty = pa.table({"media_ref": pa.array([], pa.string())})

    def one(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("bucket").to_pylist():
            t = _read_bucket(bands_path, b, None)
            if t is None or t.num_rows < 2:
                continue
            t = t.sort_by("band_key").combine_chunks()
            keys = t.column("band_key").to_numpy(zero_copy_only=False)
            bounds = np.flatnonzero(np.diff(keys)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(keys)]))
            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                g = t.slice(s, e - s)
                refs = g.column("media_ref").to_pylist()[:bucket_cap]
                ss = g.column("sig").to_pylist()[:bucket_cap]
                drop = set()
                for i in range(len(refs)):
                    for j in range(i + 1, len(refs)):
                        if refs[i] == refs[j]:
                            continue
                        if sig_hamming(ss[i], ss[j]) <= max_hamming:
                            drop.add(max(refs[i], refs[j]))
                if drop:
                    out.append(pa.table({
                        "media_ref": pa.array(sorted(drop), pa.string())}))
        if not out:
            return empty
        return pa.concat_tables(out)

    buckets = ray.data.from_items([{"bucket": i} for i in range(n)])
    return buckets.map_batches(one, batch_size=1, batch_format="pyarrow")


def fingerprint_dedup_incremental(
    sigs_new: ray.data.Dataset,
    index_dir: str,
    max_hamming: int = 3,
    bands: int = 4,
    n_buckets: int = 32,
    bucket_cap: int = 2048,
    tmp_dir: Optional[str] = None,
    max_broadcast: int = MAX_BROADCAST_ROWS,
) -> ray.data.Dataset:
    """Near-dup-dedup one signature increment against the at-rest index.

    ``sigs_new``: (media_ref, sig) rows from any modality's fingerprint
    stage.  Returns the KEPT rows — commit them with
    :func:`fingerprint_index_append` once the assets themselves are durably
    sunk.  ``bands`` must match across increments (band keys are only
    comparable under the same split); ``max_hamming`` < ``bands``."""
    if max_hamming >= bands:
        raise ValueError("banded LSH is only complete for max_hamming < bands")
    tmp = tmp_dir or tempfile.mkdtemp(prefix="ipe_fpinc_")
    bands_idx = os.path.join(index_dir, _BANDS)
    have_index = os.path.exists(os.path.join(bands_idx, "_layout.json"))
    if have_index:
        n_buckets = layout_of(bands_idx)["n_buckets"]

    bands_new = os.path.join(tmp, "bands_new")
    write_bucketed(_band_rows(sigs_new, bands), bands_new, "band_key",
                   n_buckets)

    dups = _local_band_dups(bands_new, max_hamming, bucket_cap)

    if have_index:
        cand = bucketed_join(bands_new, bands_idx, join_type="inner")

        def verify(t: pa.Table) -> pa.Table:
            if ("sig_r" not in t.column_names or t.num_rows == 0):
                return pa.table({"media_ref": pa.array([], pa.string())})
            hit = _hamming_max(t.column("sig"), t.column("sig_r")) \
                <= max_hamming
            return pa.table({
                "media_ref": t.column("media_ref").filter(pa.array(hit))})

        dups = dups.union(cand.map_batches(verify, batch_format="pyarrow"))

    return filter_by_ids(sigs_new, "media_ref", dups, keep_matching=False,
                         max_broadcast=max_broadcast)


def fingerprint_index_append(index_dir: str, kept_sigs: ray.data.Dataset,
                             bands: int = 4, n_buckets: int = 32) -> None:
    """Commit one increment: append its band rows into the index layout
    (map pass; ``write_bucketed`` appends fragments into existing
    ``_bucket=i/`` dirs).  Call AFTER the kept assets are durably written —
    data first, index last."""
    bands_idx = os.path.join(index_dir, _BANDS)
    if os.path.exists(os.path.join(bands_idx, "_layout.json")):
        n_buckets = layout_of(bands_idx)["n_buckets"]
    write_bucketed(_band_rows(kept_sigs, bands), bands_idx, "band_key",
                   n_buckets)
