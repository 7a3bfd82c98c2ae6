"""Perceptual image near-dup (dHash + banded Hamming LSH) over real PNGs."""

import numpy as np
import pytest
import ray.data

from insurance_pdf_extractor_ray.functions.codecs import (
    decode_png,
    dhash64,
    encode_png,
    hamming64,
)
from insurance_pdf_extractor_ray.pipelines.imagededup import (
    assets_with_image_dups,
    image_dhashes,
    near_dup_image_groups,
)

pytestmark = pytest.mark.usefixtures("ray_session")

REFS = [(f"doc-{i}", f"media://doc-{i}/0") for i in range(48)]


class TestDHash:
    def test_upscale_invariance(self):
        rng = np.random.RandomState(5)
        for _ in range(10):
            arr = rng.randint(0, 256, size=(rng.randint(8, 40),
                                            rng.randint(8, 40), 3),
                              dtype=np.uint8)
            for s in (2, 3):
                up = np.repeat(np.repeat(arr, s, axis=0), s, axis=1)
                assert dhash64(arr) == dhash64(up), (arr.shape, s)

    def test_lossless_reencode_invariance(self):
        rng = np.random.RandomState(6)
        arr = rng.randint(0, 256, size=(20, 30, 3), dtype=np.uint8)
        assert dhash64(decode_png(encode_png(arr))) == dhash64(arr)

    def test_distinct_images_far(self):
        rng = np.random.RandomState(7)
        hs = [dhash64(rng.randint(0, 256, size=(16, 16, 3), dtype=np.uint8))
              for _ in range(40)]
        dists = [hamming64(hs[i], hs[j])
                 for i in range(40) for j in range(i + 1, 40)]
        assert min(dists) > 10  # random images are nowhere near the threshold

    def test_small_perturbation_nearby(self):
        # brightening one region flips few gradient signs -> small distance
        rng = np.random.RandomState(8)
        y, x = np.mgrid[0:32, 0:32]
        base = ((x * 7 + y * 3) % 256).astype(np.uint8)[:, :, None].repeat(3, 2)
        pert = base.copy()
        pert[:4, :4] = np.minimum(255, pert[:4, :4].astype(int) + 30).astype(np.uint8)
        assert 0 < hamming64(dhash64(base), dhash64(pert)) <= 6


class TestNearDupGroups:
    def test_groups_match_planted_golden(self):
        assets, golden = assets_with_image_dups(REFS)
        got = near_dup_image_groups(ray.data.from_arrow(assets),
                                    max_hamming=3, bands=4)
        assert sorted(got.take_all(), key=lambda r: r['media_ref']) == golden.to_pylist()
        groups = golden.column("group").to_pylist()
        assert len(set(groups)) < len(groups)  # real dup pairs exist

    def test_layout_independence(self):
        assets, golden = assets_with_image_dups(REFS)
        got = near_dup_image_groups(
            ray.data.from_arrow(assets).repartition(7),
            max_hamming=3, bands=4)
        assert sorted(got.take_all(), key=lambda r: r['media_ref']) == golden.to_pylist()

    def test_bands_guard(self):
        assets, _ = assets_with_image_dups(REFS[:4])
        with pytest.raises(ValueError, match="max_hamming < bands"):
            near_dup_image_groups(ray.data.from_arrow(assets),
                                  max_hamming=4, bands=4)

    def test_hashes_only_for_decodable_images(self):
        assets, _ = assets_with_image_dups(REFS)
        hs = image_dhashes(ray.data.from_arrow(assets)).take_all()
        kinds = dict(zip(assets.column("media_ref").to_pylist(),
                         assets.column("kind").to_pylist()))
        assert hs and all(kinds[r["media_ref"]] == "image" for r in hs)


class TestGroupedRefsPaths:
    def test_broadcast_and_distributed_paths_agree(self, ray_session):
        """grouped_refs_from_pairs: the bounded union-find+broadcast path
        and the min-label+join path produce identical groups."""
        import pyarrow as pa
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.fingerprint import (
            grouped_refs_from_pairs)

        refs = ray.data.from_arrow(pa.table({
            "media_ref": pa.array([f"m{i}" for i in range(8)], pa.string())}))
        # chain m0-m1-m2 (transitive) + pair m5-m6; m3/m4/m7 singletons
        pairs = ray.data.from_arrow(pa.table({
            "a": pa.array(["m0", "m1", "m5"], pa.string()),
            "b": pa.array(["m1", "m2", "m6"], pa.string()),
        }))
        want = {"m0": "m0", "m1": "m0", "m2": "m0", "m3": "m3", "m4": "m4",
                "m5": "m5", "m6": "m5", "m7": "m7"}
        fast = {r["media_ref"]: r["group"] for r in
                grouped_refs_from_pairs(refs, pairs).take_all()}
        slow = {r["media_ref"]: r["group"] for r in
                grouped_refs_from_pairs(refs, pairs,
                                        max_broadcast_pairs=0).take_all()}
        assert fast == want and slow == want

    def test_broadcast_path_preserves_arrow_type(self, ray_session):
        """A large_string media_ref column keeps its type through the
        broadcast branch (group coalesces to the input column's type,
        matching the distributed branch's contract)."""
        import pyarrow as pa
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.fingerprint import (
            grouped_refs_from_pairs)

        refs = ray.data.from_arrow(pa.table({
            "media_ref": pa.array([f"m{i}" for i in range(4)],
                                  pa.large_string())}))
        pairs = ray.data.from_arrow(pa.table({
            "a": pa.array(["m0"], pa.string()),
            "b": pa.array(["m1"], pa.string()),
        }))
        out = grouped_refs_from_pairs(refs, pairs)
        tbl = pa.concat_tables(ray.get(out.to_arrow_refs()))
        assert tbl.schema.field("group").type == pa.large_string()
        got = {str(r["media_ref"]): str(r["group"])
               for r in tbl.to_pylist()}
        assert got == {"m0": "m0", "m1": "m0", "m2": "m2", "m3": "m3"}
