"""merge_intervals_by_key vs the gaps-and-islands SQL rewrite."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.intervals import (
    merge_intervals_by_key,
    merge_intervals_sql,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_merge_simple():
    tbl = pa.table({
        "k": pa.array([1, 1, 1, 2], pa.int64()),
        "s": pa.array([0, 5, 20, 0], pa.int64()),
        "e": pa.array([10, 12, 25, 3], pa.int64()),
    })
    out = merge_intervals_by_key(ray.data.from_arrow(tbl), "k", "s", "e")
    got = sorted((r["k"], r["s"], r["e"], r["n_rows"])
                 for r in out.take_all())
    assert got == [(1, 0, 12, 2), (1, 20, 25, 1), (2, 0, 3, 1)]


def test_touching_intervals_merge_and_gap_param():
    tbl = pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "s": pa.array([0, 10, 25], pa.int64()),
        "e": pa.array([10, 20, 30], pa.int64()),
    })
    ds = ray.data.from_arrow(tbl)
    out0 = sorted((r["s"], r["e"]) for r in
                  merge_intervals_by_key(ds, "k", "s", "e").take_all())
    assert out0 == [(0, 20), (25, 30)]  # touching merges, gap 5 does not
    out5 = sorted((r["s"], r["e"]) for r in
                  merge_intervals_by_key(ds, "k", "s", "e",
                                         min_gap=5).take_all())
    assert out5 == [(0, 30)]


def test_contained_interval_extends_running_end():
    # [0,100] then [5,10] then [50,60]: all one island even though the
    # middle interval's end regresses
    tbl = pa.table({
        "k": pa.array([7, 7, 7], pa.int64()),
        "s": pa.array([0, 5, 50], pa.int64()),
        "e": pa.array([100, 10, 60], pa.int64()),
    })
    out = merge_intervals_by_key(
        ray.data.from_arrow(tbl).repartition(2), "k", "s", "e").take_all()
    assert [(r["s"], r["e"], r["n_rows"]) for r in out] == [(0, 100, 3)]


def test_matches_sql_rewrite_random():
    rng = np.random.RandomState(23)
    n = 5000
    s = rng.randint(0, 10_000, n).astype(np.int64)
    tbl = pa.table({
        "k": pa.array(rng.randint(0, 20, n), pa.int64()),
        "s": pa.array(s),
        "e": pa.array(s + rng.randint(1, 300, n)),
    })
    out = merge_intervals_by_key(
        ray.data.from_arrow(tbl).repartition(6), "k", "s", "e")
    got = sorted((r["k"], r["s"], r["e"], r["n_rows"])
                 for r in out.take_all())
    con = duckdb.connect()
    con.register("iv", tbl)
    want = con.execute(
        merge_intervals_sql("iv", "k", "s", "e") +
        " ORDER BY k, s, e").fetchall()
    assert got == [tuple(w) for w in want]
