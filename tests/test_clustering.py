"""Distributed Lloyd k-means: convergence, determinism, partition independence."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.clustering import (
    init_centroids_by_hash,
    kmeans_lloyd,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _blobs(seed=3, n_per=300, d=8):
    rng = np.random.RandomState(seed)
    centers = rng.rand(3, d) * 20
    pts = np.concatenate(
        [centers[i] + rng.randn(n_per, d) * 0.3 for i in range(3)])
    ids = np.arange(len(pts), dtype=np.int64)
    return pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array(pts.tolist(), pa.list_(pa.float64())),
    }), centers


def test_recovers_separated_blobs():
    tbl, centers = _blobs()
    ds = ray.data.from_arrow(tbl).repartition(4)
    cents, sizes, inertia = kmeans_lloyd(ds, k=3, iters=8, seed=1)
    assert sorted(sizes.tolist()) == [300, 300, 300]
    # every fitted centroid lands within 0.2 of a true center
    for c in cents:
        assert min(np.linalg.norm(c - t) for t in centers) < 0.2
    assert inertia < 300 * 3 * 0.3 ** 2 * 8 * 2  # loose noise bound


def test_partition_and_batch_independent():
    tbl, _ = _blobs(seed=9)
    a = kmeans_lloyd(ray.data.from_arrow(tbl).repartition(2),
                     k=3, iters=4, seed=5)
    b = kmeans_lloyd(ray.data.from_arrow(tbl).repartition(7),
                     k=3, iters=4, seed=5)
    assert (a[0] == b[0]).all()          # bit-identical centroids
    assert (a[1] == b[1]).all()
    assert a[2] == b[2]


def test_init_is_order_independent():
    tbl, _ = _blobs(seed=4)
    perm = np.random.RandomState(0).permutation(tbl.num_rows)
    shuffled = tbl.take(pa.array(perm, pa.int64()))
    i1 = init_centroids_by_hash(ray.data.from_arrow(tbl), "embedding",
                                "vec_id", k=3, seed=2)
    i2 = init_centroids_by_hash(
        ray.data.from_arrow(shuffled).repartition(5), "embedding",
        "vec_id", k=3, seed=2)
    assert (i1 == i2).all()


def test_empty_cluster_keeps_centroid():
    # k=3 over 2 distinct points: one cluster stays empty, its centroid
    # must not become NaN
    tbl = pa.table({
        "vec_id": pa.array([0, 1, 2, 3], pa.int64()),
        "embedding": pa.array([[0.0, 0.0], [0.0, 0.0],
                               [9.0, 9.0], [9.0, 9.0]],
                              pa.list_(pa.float64())),
    })
    cents, sizes, _ = kmeans_lloyd(ray.data.from_arrow(tbl), k=3,
                                   iters=3, seed=0)
    assert not np.isnan(cents).any()
    assert sizes.sum() == 4
