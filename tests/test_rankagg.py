"""rankagg pipeline (grouped top-k, distinct counts, exact quantiles) vs DuckDB."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.rankagg import (
    distinct_count_by,
    grouped_top_k,
    quantiles_by,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _events(n=5000, seed=7):
    rng = np.random.RandomState(seed)
    return pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(rng.choice(["click", "view", "purchase", "login"], n),
                               pa.string()),
        "user_id": pa.array(rng.randint(0, 200, n), pa.int64()),
        # cents-quantized values: the quantiles_by exactness domain
        "value": pa.array(np.round(rng.exponential(50.0, n), 2), pa.float64()),
    })


@pytest.fixture(scope="module")
def evt():
    return _events()


@pytest.fixture(scope="module")
def con(evt):
    c = duckdb.connect()
    c.register("events", evt)
    return c


def _collect(ds):
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables, promote_options="permissive")


def test_grouped_top_k_matches_row_number(evt, con):
    out = _collect(grouped_top_k(
        ray.data.from_arrow(evt).repartition(16),
        "event_type", order_by=["value", "event_id"], descending=[True, False], k=3,
        columns=["event_type", "event_id", "value"],
    ))
    got = sorted(zip(out.column("event_type").to_pylist(),
                     out.column("event_id").to_pylist(),
                     out.column("value").to_pylist()))
    want = sorted(map(tuple, con.execute("""
        SELECT event_type, event_id, value FROM (
          SELECT event_type, event_id, value,
                 row_number() OVER (PARTITION BY event_type
                                    ORDER BY value DESC, event_id ASC) rn
          FROM events) WHERE rn <= 3
    """).fetchall()))
    assert got == want


def test_grouped_top_k_k_larger_than_group(con):
    tbl = pa.table({"g": pa.array(["a", "a", "b"], pa.string()),
                    "v": pa.array([1.0, 2.0, 3.0], pa.float64()),
                    "id": pa.array([0, 1, 2], pa.int64())})
    out = _collect(grouped_top_k(ray.data.from_arrow(tbl), "g",
                                 order_by=["v", "id"], descending=[True, False], k=10))
    assert out.num_rows == 3


def test_distinct_count_by_matches_sql(evt, con):
    out = _collect(distinct_count_by(
        ray.data.from_arrow(evt).repartition(16), "event_type", "user_id"))
    got = dict(zip(out.column("event_type").to_pylist(),
                   out.column("n_distinct").to_pylist()))
    want = dict(con.execute(
        "SELECT event_type, COUNT(DISTINCT user_id) FROM events GROUP BY event_type"
    ).fetchall())
    assert got == want


def test_distinct_count_ignores_nulls(con):
    tbl = pa.table({"g": pa.array(["a", "a", "a", "b"], pa.string()),
                    "u": pa.array([1, 1, None, None], pa.int64())})
    out = _collect(distinct_count_by(ray.data.from_arrow(tbl), "g", "u"))
    got = dict(zip(out.column("g").to_pylist(), out.column("n_distinct").to_pylist()))
    # SQL COUNT(DISTINCT) ignores nulls entirely: group b has zero counted rows
    # and (like SQL GROUP BY over existing groups) still appears via the pair
    # table only if it has any non-null value — b has none, so it's absent.
    assert got == {"a": 1}


def test_quantiles_by_matches_percentile_cont(evt, con):
    out = _collect(quantiles_by(
        ray.data.from_arrow(evt).repartition(16), "event_type", "value",
        qs=(0.5, 0.9), names=("p50", "p90")))
    got = {t: (round(a, 9), round(b, 9))
           for t, a, b in zip(out.column("event_type").to_pylist(),
                              out.column("p50").to_pylist(),
                              out.column("p90").to_pylist())}
    want = {t: (round(a, 9), round(b, 9)) for t, a, b in con.execute("""
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY value),
               percentile_cont(0.9) WITHIN GROUP (ORDER BY value)
        FROM events GROUP BY event_type
    """).fetchall()}
    assert got == want


def test_quantiles_single_value_group():
    tbl = pa.table({"g": pa.array(["a"] * 5, pa.string()),
                    "v": pa.array([2.5] * 5, pa.float64())})
    out = _collect(quantiles_by(ray.data.from_arrow(tbl), "g", "v", qs=(0.0, 0.5, 1.0),
                                names=("p0", "p50", "p100")))
    r = out.to_pylist()[0]
    assert r["p0"] == r["p50"] == r["p100"] == 2.5
    assert r["n"] == 5


def test_quantiles_binned_within_bin_width(evt, con):
    from insurance_pdf_extractor_ray.pipelines.rankagg import quantiles_by_binned

    lo, hi, n_bins = 0.0, 1000.0, 8192
    out = _collect(quantiles_by_binned(
        ray.data.from_arrow(evt).repartition(8), "event_type", "value",
        lo=lo, hi=hi, n_bins=n_bins, qs=(0.5, 0.9), names=("p50", "p90")))
    approx = {t: (a, b) for t, a, b in zip(out.column("event_type").to_pylist(),
                                           out.column("p50").to_pylist(),
                                           out.column("p90").to_pylist())}
    exact = {t: (a, b) for t, a, b in con.execute("""
        SELECT event_type,
               percentile_cont(0.5) WITHIN GROUP (ORDER BY value),
               percentile_cont(0.9) WITHIN GROUP (ORDER BY value)
        FROM events GROUP BY event_type
    """).fetchall()}
    width = (hi - lo) / n_bins
    for t, (p50, p90) in exact.items():
        assert abs(approx[t][0] - p50) <= width
        assert abs(approx[t][1] - p90) <= width


class TestDenseRank:
    def test_matches_duckdb_and_partition_independent(self):
        from insurance_pdf_extractor_ray.pipelines.rankagg import dense_rank_by

        rng = np.random.RandomState(11)
        t = pa.table({
            "k": pa.array([f"k{i}" for i in rng.randint(0, 3, 2000)]),
            "v": pa.array(rng.randint(0, 40, 2000).astype("float64")),
        })
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute("""
            SELECT k, v, drank FROM (
              SELECT DISTINCT k, v,
                     DENSE_RANK() OVER (PARTITION BY k ORDER BY v DESC) AS drank
              FROM t) WHERE drank <= 10 ORDER BY k, drank
        """).fetch_arrow_table()
        for parts in (2, 9):
            mine = dense_rank_by(ray.data.from_arrow(t).repartition(parts),
                                 "k", "v", descending=True, max_rank=10)
            rows = sorted(mine.take_all(), key=lambda r: (r["k"], r["drank"]))
            assert rows == want.to_pylist()


class TestLatestByKey:
    def test_compaction_matches_window(self):
        from insurance_pdf_extractor_ray.pipelines.rankagg import latest_by_key

        rng = np.random.RandomState(12)
        t = pa.table({
            "k": pa.array(rng.randint(0, 50, 1500)),
            "seq": pa.array(np.arange(1500)),
            "val": pa.array(rng.rand(1500)),
        })
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute("""
            SELECT k, seq, val FROM t
            QUALIFY row_number() OVER (PARTITION BY k ORDER BY seq DESC) = 1
            ORDER BY k
        """).fetch_arrow_table()
        out = latest_by_key(ray.data.from_arrow(t).repartition(8), "k",
                            ["seq"], [True], columns=["k", "seq", "val"])
        rows = sorted(out.take_all(), key=lambda r: r["k"])
        assert rows == want.to_pylist()
