"""Global row_number / NTILE vs DuckDB window functions."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.ordering import (
    ntile,
    ntile_bucket,
    with_row_number,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _tbl(n=7777):
    rng = np.random.RandomState(4)
    return pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.uniform(0, 100, n).round(2), pa.float64()),
    })


def test_row_number_matches_duckdb():
    tbl = _tbl()
    out = with_row_number(ray.data.from_arrow(tbl).repartition(9),
                          ["v", "id"], out_col="rn").take_all()
    got = sorted((r["id"], r["rn"]) for r in out)
    con = duckdb.connect()
    con.register("t", tbl)
    want = sorted(con.execute(
        "SELECT id, row_number() OVER (ORDER BY v, id) FROM t").fetchall())
    assert got == [tuple(w) for w in want]


def test_row_number_descending_and_zero_based():
    tbl = _tbl(100)
    out = with_row_number(ray.data.from_arrow(tbl), ["v"],
                          descending=[True], out_col="rn",
                          one_based=False).take_all()
    by_rn = sorted(out, key=lambda r: r["rn"])
    assert by_rn[0]["rn"] == 0
    vs = [r["v"] for r in by_rn]
    assert vs == sorted(vs, reverse=True)


@pytest.mark.parametrize("n,k", [(100, 10), (103, 10), (7, 10), (7777, 13)])
def test_ntile_bucket_matches_sql_definition(n, k):
    con = duckdb.connect()
    want = np.array([r[0] for r in con.execute(
        f"SELECT ntile({k}) OVER (ORDER BY i) FROM range({n}) t(i)"
    ).fetchall()])
    got = ntile_bucket(np.arange(n), n, k)
    assert (got == want).all()


def test_ntile_dataset_end_to_end():
    tbl = _tbl(500)
    out = ntile(ray.data.from_arrow(tbl).repartition(5), ["v", "id"],
                k=4).take_all()
    con = duckdb.connect()
    con.register("t", tbl)
    want = dict(con.execute(
        "SELECT id, ntile(4) OVER (ORDER BY v, id) FROM t").fetchall())
    assert {r["id"]: r["tile"] for r in out} == want
