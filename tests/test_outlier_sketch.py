"""Mahalanobis embedding outliers and Count-Min inner-product join-size
estimation."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.similarity import (
    mahalanobis_outliers)
from insurance_pdf_extractor_ray.pipelines.sketches import (
    count_min_estimate, count_min_inner_product, count_min_table)

pytestmark = pytest.mark.usefixtures("ray_session")


class TestMahalanobisOutliers:
    def test_planted_outliers_surface(self):
        rng = np.random.RandomState(41)
        n, d = 500, 8
        m = rng.randn(n, d).astype(np.float32)
        # plant 3 far-out rows
        for vid, scale in ((7, 30.0), (123, 25.0), (400, 20.0)):
            m[vid] = (np.ones(d) * scale).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(m.tolist(), pa.list_(pa.float32())),
        })
        out = mahalanobis_outliers(
            ray.data.from_arrow(tbl).repartition(4), top_k=5)
        top = out.column("vec_id").to_pylist()
        assert set(top[:3]) == {7, 123, 400}

    def test_layout_independence(self):
        rng = np.random.RandomState(42)
        m = rng.randn(200, 6).astype(np.float32)
        tbl = pa.table({
            "vec_id": pa.array(range(200), pa.int64()),
            "embedding": pa.array(m.tolist(), pa.list_(pa.float32())),
        })
        a = mahalanobis_outliers(ray.data.from_arrow(tbl).repartition(1),
                                 top_k=10)
        b = mahalanobis_outliers(ray.data.from_arrow(tbl).repartition(7),
                                 top_k=10)
        assert a.equals(b)  # quantized int sums + int scores commute


class TestCountMinInnerProduct:
    def test_upper_bounds_exact_selfjoin(self):
        rng = np.random.RandomState(43)
        keys = rng.zipf(1.3, 40_000).astype(np.int64)
        tbl = pa.table({"k": pa.array(keys, pa.int64())})
        ds = ray.data.from_arrow(tbl).repartition(5)
        cm = count_min_table(ds, "k", width=1024, depth=4)
        est = count_min_inner_product(cm, cm, width=1024, depth=4)
        _, counts = np.unique(keys, return_counts=True)
        exact = int((counts.astype(np.int64) ** 2).sum())
        assert est >= exact                       # one-sided
        assert est <= exact * 1.5                 # tight at this width

    def test_cross_sketch_disjoint_keys_near_zero(self):
        a = pa.table({"k": pa.array(np.arange(0, 1000, dtype=np.int64))})
        b = pa.table({"k": pa.array(np.arange(100000, 101000,
                                              dtype=np.int64))})
        w, d = 2048, 4
        cma = count_min_table(ray.data.from_arrow(a), "k", width=w, depth=d)
        cmb = count_min_table(ray.data.from_arrow(b), "k", width=w, depth=d)
        est = count_min_inner_product(cma, cmb, width=w, depth=d)
        # true join size is 0; collisions keep the estimate tiny
        assert est < 1000

    def test_identical_streams_match_point_queries(self):
        keys = np.repeat(np.arange(10, dtype=np.int64), 5)
        tbl = pa.table({"k": pa.array(keys)})
        cm = count_min_table(ray.data.from_arrow(tbl), "k",
                             width=4096, depth=4)
        est = count_min_estimate(cm, np.arange(10), width=4096, depth=4)
        assert est.tolist() == [5] * 10
        ip = count_min_inner_product(cm, cm, width=4096, depth=4)
        assert ip == 10 * 25  # no collisions at this width
