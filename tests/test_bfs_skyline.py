"""bfs_hops min-distance labels and the 2-D skyline kernel."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.graph import bfs_hops

pytestmark = pytest.mark.usefixtures("ray_session")


def _edges(pairs):
    return ray.data.from_arrow(pa.table({
        "u": pa.array([a for a, _ in pairs], pa.int64()),
        "v": pa.array([b for _, b in pairs], pa.int64()),
    }))


def test_bfs_path_graph_hops():
    # 0-1-2-3-4-5-6 path; seed {0}; max_hops=4 reaches node 4
    e = _edges([(i, i + 1) for i in range(6)])
    out = {r["node"]: r["hop"] for r in bfs_hops(e, [0], max_hops=4).to_pylist()}
    assert out == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}


def test_bfs_multi_seed_min_hop_and_disconnected():
    # two components: 0-1-2 and 10-11; seeds 0 and 2 -> node 1 is hop 1
    # (min over seeds); 10/11 unreachable; isolated seed 99 at hop 0
    e = _edges([(0, 1), (1, 2), (10, 11)])
    out = {r["node"]: r["hop"]
           for r in bfs_hops(e, [0, 2, 99], max_hops=3).to_pylist()}
    assert out == {0: 0, 1: 1, 2: 0, 99: 0}


def test_bfs_undirected_both_directions():
    # edge stored as (5, 3); seed 3 must reach 5
    e = _edges([(5, 3)])
    out = {r["node"]: r["hop"] for r in bfs_hops(e, [3], max_hops=2).to_pylist()}
    assert out == {3: 0, 5: 1}


def test_skyline_matches_bruteforce():
    from __ray_entry__ import _skyline_2d

    rng = np.random.RandomState(4)
    x = rng.randint(0, 50, 400).astype(np.int64)
    y = rng.randint(0, 50, 400).astype(np.int64)
    gx, gy = _skyline_2d(x, y)
    got = set(zip(gx.tolist(), gy.tolist()))

    pts = set(zip(x.tolist(), y.tolist()))
    want = {(a, b) for (a, b) in pts
            if not any((c >= a and d >= b and (c > a or d > b))
                       for (c, d) in pts)}
    assert got == want
    # output sorted by x ascending
    assert list(gx) == sorted(gx)


def test_skyline_duplicates_and_empty():
    from __ray_entry__ import _skyline_2d

    x = np.array([3, 3, 1], np.int64)
    y = np.array([7, 7, 9], np.int64)
    gx, gy = _skyline_2d(x, y)
    assert list(zip(gx, gy)) == [(1, 9), (3, 7)]
    e = np.array([], np.int64)
    gx, gy = _skyline_2d(e, e)
    assert len(gx) == 0
