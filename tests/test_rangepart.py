"""Range-partitioned layout: balance, routing vs SQL boundary rule, pruning."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from insurance_pdf_extractor_ray.pipelines.rangepart import (
    parts_for_range,
    partition_stats,
    read_range,
    write_range_partitioned,
)

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def layout(tmp_path_factory):
    rng = np.random.default_rng(17)
    v = np.concatenate([rng.normal(100, 30, 8000),
                        rng.uniform(500, 600, 1000)])
    t = pa.table({"id": pa.array(np.arange(len(v)), pa.int64()),
                  "v": pa.array(v, pa.float64())})
    path = str(tmp_path_factory.mktemp("rp") / "layout")
    b = write_range_partitioned(ray.data.from_arrow(t).repartition(5),
                                path, "v", 8)
    return t, path, b


def test_routing_matches_sql_rule_and_balance(layout):
    t, path, b = layout
    stats = sorted((r["part"], r["n"], r["mn"], r["mx"])
                   for r in partition_stats(path).take_all())
    con = duckdb.connect()
    con.register("t", t)
    qs = ", ".join(str(i / 8) for i in range(1, 8))
    want = sorted(tuple(r) for r in con.execute(f"""
        WITH b AS (SELECT unnest(quantile_disc(v, [{qs}])) AS bv FROM t),
        p AS (SELECT v, (SELECT count(*) FROM b WHERE bv < v) AS part FROM t)
        SELECT part, count(*) AS n, min(v), max(v) FROM p GROUP BY part
    """).fetchall())
    assert stats == want
    counts = [n for _, n, _, _ in stats]
    assert max(counts) - min(counts) <= 2          # balanced up to rank ties
    # partitions are value-disjoint and ordered
    for (_, _, _, mx0), (_, _, mn1, _) in zip(stats, stats[1:]):
        assert mx0 <= mn1


def test_pruned_range_read(layout):
    t, path, b = layout
    lo, hi = 520.0, 580.0
    parts = parts_for_range(path, lo, hi)
    assert len(parts) <= 2                          # dense cluster -> 1-2 parts
    got = sorted(r["v"] for r in read_range(path, lo, hi).take_all())
    v = t.column("v").to_numpy()
    want = sorted(v[(v >= lo) & (v <= hi)].tolist())
    assert got == want and len(got) > 100
