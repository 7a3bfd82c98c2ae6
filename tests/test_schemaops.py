"""union_by_name: schema-evolution union vs DuckDB UNION ALL BY NAME."""

import duckdb
import pyarrow as pa
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.schemaops import (
    align_to_schema,
    unify_schemas_by_name,
    union_by_name,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_unify_first_seen_order_and_promotion():
    a = pa.schema([("x", pa.int64()), ("y", pa.string())])
    b = pa.schema([("z", pa.float64()), ("x", pa.float64())])
    u = unify_schemas_by_name([a, b])
    assert u.names == ["x", "y", "z"]
    assert u.field("x").type == pa.float64()  # int64 promoted


def test_align_null_fills_and_reorders():
    target = pa.schema([("a", pa.int64()), ("b", pa.string())])
    t = pa.table({"b": pa.array(["p", "q"])})
    out = align_to_schema(t, target)
    assert out.column_names == ["a", "b"]
    assert out.column("a").null_count == 2
    assert out.column("a").type == pa.int64()


def test_union_by_name_matches_duckdb():
    gen1 = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "v": pa.array([1.5, 2.5], pa.float64()),
    })
    gen2 = pa.table({
        "tag": pa.array(["a", "b", "c"], pa.string()),
        "id": pa.array([3, 4, 5], pa.int64()),
    })
    out = union_by_name([ray.data.from_arrow(gen1),
                         ray.data.from_arrow(gen2)])
    got = sorted(
        (r["id"], r["v"], r["tag"]) for r in out.take_all())
    con = duckdb.connect()
    con.register("g1", gen1)
    con.register("g2", gen2)
    want = con.execute(
        "SELECT id, v, tag FROM (SELECT * FROM g1 UNION ALL BY NAME "
        "SELECT * FROM g2) ORDER BY id").fetchall()
    assert got == [tuple(w) for w in want]
    assert out.schema().names == ["id", "v", "tag"]


def test_grouping_sets_matches_duckdb():
    from insurance_pdf_extractor_ray.pipelines.sketches import (
        grouping_sets_counts,
    )

    tbl = pa.table({
        "a": pa.array(["x", "x", "y", "y", "y"], pa.string()),
        "b": pa.array(["p", "q", "p", "p", "q"], pa.string()),
    })
    out = grouping_sets_counts(
        ray.data.from_arrow(tbl), ["a", "b"],
        sets=[("a",), ("b",), ()])
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute("""
        SELECT a, b, COUNT(*) AS n FROM t
        GROUP BY GROUPING SETS ((a), (b), ())
        ORDER BY (a IS NULL), a, (b IS NULL), b
    """).fetchall()
    got = list(zip(out.column("a").to_pylist(),
                   out.column("b").to_pylist(),
                   out.column("n").to_pylist()))
    assert sorted(got, key=lambda t: tuple((x is None, x) for x in t)) == \
        sorted([tuple(w) for w in want],
               key=lambda t: tuple((x is None, x) for x in t))
