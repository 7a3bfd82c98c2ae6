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


class TestSemanticDedup:
    """SemDeDup greedy-leader semantics vs a numpy brute-force reference."""

    @staticmethod
    def _brute_greedy(ids, X, tau):
        order = np.argsort(ids)
        ids, X = np.asarray(ids)[order], X[order]
        U = X / np.linalg.norm(X, axis=1, keepdims=True)
        kept, dropped = [], []
        for i in range(len(ids)):
            if kept and (np.asarray([U[j] for j in kept]) @ U[i] >= tau).any():
                dropped.append(int(ids[i]))
            else:
                kept.append(i)
        return dropped

    def _run(self, tbl, tau, n_clusters, repartition=None):
        from insurance_pdf_extractor_ray.pipelines.clustering import (
            semantic_dedup_drop_ids,
        )

        ds = ray.data.from_arrow(tbl)
        if repartition:
            ds = ds.repartition(repartition)
        out = semantic_dedup_drop_ids(ds, "embedding", "vec_id",
                                      n_clusters=n_clusters, tau=tau)
        return [r["vec_id"] for r in out.take_all()]

    def test_single_cluster_equals_brute_force(self):
        tbl, _ = _blobs(seed=7, n_per=40)
        X = np.asarray(tbl.column("embedding").to_pylist())
        ids = tbl.column("vec_id").to_pylist()
        want = sorted(self._brute_greedy(ids, X, 0.9))
        assert self._run(tbl, 0.9, n_clusters=1) == want
        assert len(want) > 0  # blobs at 0.9 must actually prune something

    def test_chain_collapses_to_leader_only(self):
        # b ~ a and c ~ b but c !~ a: greedy keeps a, drops b, KEEPS c
        # (c is only compared against kept rows)
        a = np.array([1.0, 0.0])
        b = np.array([np.cos(0.3), np.sin(0.3)])
        c = np.array([np.cos(0.6), np.sin(0.6)])
        tau = float(np.cos(0.4))  # a·b >= tau, b·c >= tau, a·c < tau
        tbl = pa.table({
            "vec_id": pa.array([0, 1, 2], pa.int64()),
            "embedding": pa.array([a.tolist(), b.tolist(), c.tolist()],
                                  pa.list_(pa.float64())),
        })
        assert self._run(tbl, tau, n_clusters=1) == [1]

    def test_layout_independent(self):
        tbl, _ = _blobs(seed=9, n_per=50)
        assert (self._run(tbl, 0.9, n_clusters=3)
                == self._run(tbl, 0.9, n_clusters=3, repartition=7))
