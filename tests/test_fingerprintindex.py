"""Incremental perceptual near-dup index (pipelines/fingerprintindex.py):
within-increment drop-larger semantics, cross-increment probe against the
at-rest band layout, append accumulation, and an e2e pass over real decoded
PNG dHashes."""

import tempfile

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.fingerprintindex import (
    fingerprint_dedup_incremental,
    fingerprint_index_append,
)


def _sig(h: int, k: int = 1) -> bytes:
    return b"".join(int(h).to_bytes(8, "big") for _ in range(k))


def _sigs(rows) -> ray.data.Dataset:
    return ray.data.from_arrow(pa.table({
        "media_ref": pa.array([r[0] for r in rows], pa.string()),
        "sig": pa.array([r[1] for r in rows], pa.binary()),
    }))


def _kept_refs(ds) -> list:
    return sorted(r["media_ref"] for r in
                  ds.select_columns(["media_ref"]).take_all())


# far-apart 64-bit patterns (pairwise Hamming >> 3)
FAR = [0x0000000000000000, 0xFFFFFFFFFFFFFFFF,
       0xAAAAAAAAAAAAAAAA, 0x0F0F0F0F0F0F0F0F]


class TestFingerprintIncremental:
    def test_three_increment_lifecycle(self, ray_session):
        idx = tempfile.mkdtemp(prefix="ipe_fpidx_")

        # increment 1: three far-apart signatures -> all kept
        inc1 = _sigs([("a", _sig(FAR[0])), ("b", _sig(FAR[1])),
                      ("c", _sig(FAR[2]))])
        kept1 = fingerprint_dedup_incremental(inc1, idx, n_buckets=4)
        assert _kept_refs(kept1) == ["a", "b", "c"]
        fingerprint_index_append(idx, kept1, n_buckets=4)

        # increment 2: twin of a (cross-increment dup), a within-increment
        # pair (d kept, e dropped — larger ref of the verified pair), and a
        # fresh f
        near_d = FAR[3] ^ 0b1  # Hamming 1 from FAR[3]
        inc2 = _sigs([("a_twin", _sig(FAR[0] ^ 0b11)),   # Hamming 2 from a
                      ("d", _sig(FAR[3])), ("e", _sig(near_d)),
                      ("f", _sig(0x3333333333333333))])
        kept2 = fingerprint_dedup_incremental(inc2, idx, n_buckets=4)
        assert _kept_refs(kept2) == ["d", "f"]
        fingerprint_index_append(idx, kept2, n_buckets=4)

        # increment 3: twin of d (indexed in increment 2) -> dropped;
        # genuinely new g -> kept
        inc3 = _sigs([("d_twin", _sig(FAR[3] ^ 0b100)),
                      ("g", _sig(0x5A5A5A5A5A5A5A5A))])
        kept3 = fingerprint_dedup_incremental(inc3, idx, n_buckets=4)
        assert _kept_refs(kept3) == ["g"]

    def test_multichunk_signature_max_hamming(self, ray_session):
        # 2-chunk signatures: chunk 0 identical (bands collide), chunk 1
        # distance 5 > max_hamming -> NOT a dup
        idx = tempfile.mkdtemp(prefix="ipe_fpidx_")
        inc1 = _sigs([("x", _sig(FAR[0]) + _sig(FAR[1]))])
        fingerprint_index_append(
            idx, fingerprint_dedup_incremental(inc1, idx, n_buckets=2),
            n_buckets=2)
        far_chunk1 = FAR[1] ^ 0b11111  # Hamming 5 on chunk 1
        near_chunk1 = FAR[1] ^ 0b101   # Hamming 2 on chunk 1
        inc2 = _sigs([("y", _sig(FAR[0]) + _sig(far_chunk1)),
                      ("z", _sig(FAR[0]) + _sig(near_chunk1))])
        kept2 = fingerprint_dedup_incremental(inc2, idx, n_buckets=2)
        assert _kept_refs(kept2) == ["y"]  # z is within 3 on BOTH chunks

    def test_bands_guard(self, ray_session):
        with pytest.raises(ValueError):
            fingerprint_dedup_incremental(
                _sigs([]), tempfile.mkdtemp(), max_hamming=4, bands=4)

    def test_e2e_real_png_dhashes(self, ray_session):
        # real codec path: base images indexed, integer-upscaled twins probe
        from insurance_pdf_extractor_ray.pipelines.imagededup import (
            assets_with_image_dups, image_dhashes)

        refs = [(f"doc_{i}", f"media/fpidx_{i}.bin") for i in range(60)]
        assets, golden = assets_with_image_dups(refs)
        is_twin = pa.compute.match_substring(
            assets.column("media_ref"), "#up")
        base = assets.filter(pa.compute.invert(is_twin))
        twins = assets.filter(is_twin)

        def sigs_of(tbl):
            ds = image_dhashes(ray.data.from_arrow(tbl))

            def pack(b: pa.Table) -> pa.Table:
                hs = b.column("dhash").to_numpy(zero_copy_only=False)
                return pa.table({
                    "media_ref": b.column("media_ref"),
                    "sig": pa.array([int(h).to_bytes(8, "big", signed=True)
                                     for h in hs], pa.binary())})

            return ds.map_batches(pack, batch_format="pyarrow")

        idx = tempfile.mkdtemp(prefix="ipe_fpidx_")
        kept1 = fingerprint_dedup_incremental(sigs_of(base), idx)
        n_images = len([r for r in golden.column("group").to_pylist()]) // 2
        assert len(_kept_refs(kept1)) == n_images  # every base image kept
        fingerprint_index_append(idx, kept1)

        kept2 = fingerprint_dedup_incremental(sigs_of(twins), idx)
        assert _kept_refs(kept2) == []  # every twin found in the index
