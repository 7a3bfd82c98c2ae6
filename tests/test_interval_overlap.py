"""Interval × interval overlap join vs DuckDB, across epoch sizes (the
replication/dedup logic must be invariant to the bucket width)."""

import duckdb
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.joins import interval_overlap_join

pytestmark = pytest.mark.usefixtures("ray_session")

LEFT = pa.table({
    "l_id": pa.array(list(range(6)), pa.int64()),
    "ls": pa.array([0, 10, 20, 35, 50, 90], pa.int64()),
    "le": pa.array([5, 30, 25, 40, 80, 95], pa.int64()),
})
RIGHT = pa.table({
    "r_id": pa.array(list(range(5)), pa.int64()),
    "rs": pa.array([3, 24, 41, 60, 200], pa.int64()),
    "re": pa.array([12, 37, 45, 70, 210], pa.int64()),
})


def _want():
    con = duckdb.connect()
    con.register("l", LEFT)
    con.register("r", RIGHT)
    return sorted(map(tuple, con.execute("""
        SELECT l_id, r_id FROM l JOIN r
        ON ls <= re AND rs <= le ORDER BY 1, 2
    """).fetchall()))


@pytest.mark.parametrize("epoch", [1, 7, 16, 1000])
def test_matches_sql_across_epochs(epoch):
    out = interval_overlap_join(
        ray.data.from_arrow(LEFT).repartition(3),
        ray.data.from_arrow(RIGHT).repartition(2),
        "ls", "le", "rs", "re", epoch=epoch)
    got = sorted((r["l_id"], r["r_id"]) for r in out.take_all())
    assert got == _want()
    # replication across epochs must not duplicate pairs
    assert len(got) == len(set(got))


def test_by_key_restricts_pairs():
    lt = LEFT.append_column("k", pa.array([0, 0, 1, 1, 0, 1], pa.int64()))
    rt = RIGHT.append_column("k", pa.array([0, 1, 0, 0, 1], pa.int64()))
    out = interval_overlap_join(
        ray.data.from_arrow(lt), ray.data.from_arrow(rt),
        "ls", "le", "rs", "re", epoch=8, by="k")
    got = sorted((r["l_id"], r["r_id"]) for r in out.take_all())
    con = duckdb.connect()
    con.register("l", lt)
    con.register("r", rt)
    want = sorted(map(tuple, con.execute("""
        SELECT l_id, r_id FROM l JOIN r
        ON l.k = r.k AND ls <= re AND rs <= le
    """).fetchall()))
    assert got == want and 0 < len(got) < len(_want())


def test_disjoint_name_guard():
    with pytest.raises(ValueError):
        interval_overlap_join(
            ray.data.from_arrow(LEFT), ray.data.from_arrow(LEFT),
            "ls", "le", "ls", "le", epoch=8)
