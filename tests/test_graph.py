"""PageRank over Dataset edge lists vs numpy power iteration."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.graph import pagerank

pytestmark = pytest.mark.usefixtures("ray_session")


def _numpy_pagerank(edges, n_iter, damping=0.85):
    nodes = sorted({a for a, _ in edges} | {b for _, b in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out_deg = np.zeros(n)
    for a, _ in edges:
        out_deg[idx[a]] += 1
    r = np.full(n, 1.0 / n)
    for _ in range(n_iter):
        nr = np.full(n, (1 - damping) / n)
        for a, b in edges:
            nr[idx[b]] += damping * r[idx[a]] / out_deg[idx[a]]
        r = nr
    return dict(zip(nodes, r))


def test_pagerank_matches_power_iteration():
    raw = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 3)]
    sym = raw + [(b, a) for a, b in raw]
    tbl = pa.table({"src": pa.array([a for a, _ in sym], pa.int64()),
                    "dst": pa.array([b for _, b in sym], pa.int64())})
    out = pagerank(ray.data.from_arrow(tbl).repartition(3),
                   n_iter=4).take_all()
    got = {r["id"]: r["rank"] for r in out}
    want = _numpy_pagerank(sym, n_iter=4)
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=1e-12)
    # ranks of a stochastic-ish iteration stay a probability-mass-like sum
    assert sum(got.values()) == pytest.approx(1.0, abs=1e-9)


def test_pagerank_empty_edges():
    tbl = pa.table({"src": pa.array([], pa.int64()),
                    "dst": pa.array([], pa.int64())})
    assert pagerank(ray.data.from_arrow(tbl)).take_all() == []
