"""Inner-product threshold graph (exact integer-dot edges) and distributed
triangle counting / clustering coefficients."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.graph import (ip_threshold_graph,
                                                         triangle_stats)

pytestmark = pytest.mark.usefixtures("ray_session")


def _stats(edges_tbl, parts=3):
    rows = triangle_stats(
        ray.data.from_arrow(edges_tbl).repartition(parts)).take_all()
    return {r["node"]: (r["degree"], r["triangles"], r["clustering"])
            for r in rows}


class TestTriangleStats:
    def test_k4_plus_pendant(self):
        edges = pa.table({"u": pa.array([0, 0, 0, 1, 1, 2, 0], pa.int64()),
                          "v": pa.array([1, 2, 3, 2, 3, 3, 4], pa.int64())})
        by = _stats(edges)
        assert by[0] == (4, 3, pytest.approx(0.5))
        for n in (1, 2, 3):
            assert by[n] == (3, 3, pytest.approx(1.0))
        deg, tri, cc = by[4]
        assert (deg, tri) == (1, 0) and np.isnan(cc)

    def test_triangle_free_graph(self):
        # C4 cycle: no triangles, every clustering coefficient 0
        edges = pa.table({"u": pa.array([0, 1, 2, 0], pa.int64()),
                          "v": pa.array([1, 2, 3, 3], pa.int64())})
        by = _stats(edges)
        for n in range(4):
            assert by[n] == (2, 0, pytest.approx(0.0))

    def test_matches_dense_adjacency_count(self):
        rng = np.random.RandomState(17)
        n = 60
        a = np.triu(rng.rand(n, n) < 0.15, 1)
        u, v = np.nonzero(a)
        edges = pa.table({"u": pa.array(u.astype(np.int64)),
                          "v": pa.array(v.astype(np.int64))})
        by = _stats(edges, parts=5)
        adj = (a | a.T).astype(np.int64)
        tri_per_node = np.diag(adj @ adj @ adj) // 2
        deg = adj.sum(axis=1)
        for node, (d, t, _) in by.items():
            assert d == deg[node]
            assert t == tri_per_node[node]


class TestIpThresholdGraph:
    def _clustered(self, n=90, d=8, seed=3):
        rng = np.random.RandomState(seed)
        centers = rng.randn(3, d) * 3
        pts = np.vstack([centers[i % 3] + rng.randn(d) * 0.1
                         for i in range(n)]).astype(np.float32)
        pts /= np.linalg.norm(pts, axis=1, keepdims=True)
        return pa.table({
            "vec_id": pa.array(range(n), pa.int64()),
            "embedding": pa.array(pts.tolist(), pa.list_(pa.float32())),
        })

    def test_edges_match_brute_force_quantized(self):
        tbl = self._clustered()
        ds = ray.data.from_arrow(tbl).repartition(4)
        edges = ip_threshold_graph(ds, "embedding", "vec_id",
                                   tau=0.8).take_all()
        got = {(r["u"], r["v"]) for r in edges}
        m = np.array(tbl.column("embedding").to_pylist(), np.float64)
        q = (-np.floor(-(m * (1 << 20)) + 0.5)).astype(np.int64)
        sim = q @ q.T
        tau_q = round(0.8 * (1 << 20) * (1 << 20))
        iu, ju = np.triu_indices(len(m), 1)
        want = {(int(a), int(b)) for a, b in zip(iu, ju)
                if sim[a, b] >= tau_q}
        assert got == want and len(want) > 100

    def test_cluster_structure_has_high_clustering(self):
        tbl = self._clustered()
        edges = ip_threshold_graph(ray.data.from_arrow(tbl).repartition(2),
                                   "embedding", "vec_id", tau=0.8)
        rows = triangle_stats(edges).take_all()
        cc = [r["clustering"] for r in rows
              if r["degree"] >= 2 and not np.isnan(r["clustering"])]
        assert len(cc) > 50 and float(np.mean(cc)) > 0.8  # near-cliques

    def test_vertex_cap_guard(self):
        tbl = self._clustered(n=30)
        with pytest.raises(ValueError, match="capped"):
            ip_threshold_graph(ray.data.from_arrow(tbl), "embedding",
                               "vec_id", tau=0.5, max_vertices=10)
