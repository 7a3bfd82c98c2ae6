"""Event-path mining, Gini concentration, and winsorized per-key means."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.behavior import path_ngrams
from insurance_pdf_extractor_ray.pipelines.statagg import (
    gini_of_counts, winsorized_mean_by_key)

pytestmark = pytest.mark.usefixtures("ray_session")


class TestPathNgrams:
    def _events(self):
        rng = np.random.RandomState(13)
        n = 3000
        return pa.table({
            "user_id": pa.array(rng.randint(0, 50, n), pa.int64()),
            "ts": pa.array(rng.randint(0, 10**9, n), pa.int64()),
            "event_id": pa.array(range(n), pa.int64()),
            "event_type": pa.array(
                rng.choice(["view", "click", "buy"], n), pa.string()),
        })

    def test_matches_sql_window(self):
        tbl = self._events()
        con = duckdb.connect()
        con.register("t", tbl)
        want = con.execute("""
            WITH s AS (SELECT user_id, event_type,
                         LEAD(event_type, 1) OVER w AS e2,
                         LEAD(event_type, 2) OVER w AS e3
                       FROM t WINDOW w AS (PARTITION BY user_id
                                           ORDER BY ts, event_id))
            SELECT event_type || '>' || e2 || '>' || e3 AS path,
                   COUNT(*) AS n
            FROM s WHERE e3 IS NOT NULL
            GROUP BY 1 ORDER BY n DESC, path ASC LIMIT 10
        """).fetchall()
        out = path_ngrams(ray.data.from_arrow(tbl).repartition(4),
                          "user_id", "ts", "event_type", n=3,
                          tiebreak="event_id", top_k=10)
        got = list(zip(out.column("path").to_pylist(),
                       out.column("n_paths").to_pylist()))
        assert got == [tuple(r) for r in want]

    def test_short_sequences_emit_nothing(self):
        tbl = pa.table({
            "user_id": pa.array([1, 1, 2], pa.int64()),
            "ts": pa.array([1, 2, 1], pa.int64()),
            "event_id": pa.array([0, 1, 2], pa.int64()),
            "event_type": pa.array(["a", "b", "c"], pa.string()),
        })
        out = path_ngrams(ray.data.from_arrow(tbl), "user_id", "ts",
                          "event_type", n=3, tiebreak="event_id")
        assert out.num_rows == 0
        out2 = path_ngrams(ray.data.from_arrow(tbl), "user_id", "ts",
                           "event_type", n=2, tiebreak="event_id")
        assert dict(zip(out2.column("path").to_pylist(),
                        out2.column("n_paths").to_pylist())) == {"a>b": 1}


class TestGini:
    def test_uniform_counts_zero(self):
        tbl = pa.table({"k": pa.array([1, 1, 2, 2, 3, 3], pa.int64())})
        out = gini_of_counts(ray.data.from_arrow(tbl).repartition(2), "k")
        assert out.column("gini")[0].as_py() == pytest.approx(0.0, abs=1e-12)
        assert out.column("n_keys")[0].as_py() == 3
        assert out.column("total")[0].as_py() == 6

    def test_concentration_raises_gini(self):
        even = pa.table({"k": pa.array([0, 1, 2, 3] * 10, pa.int64())})
        skew = pa.table({"k": pa.array([0] * 37 + [1, 2, 3], pa.int64())})
        g_even = gini_of_counts(ray.data.from_arrow(even), "k")
        g_skew = gini_of_counts(ray.data.from_arrow(skew), "k")
        assert (g_skew.column("gini")[0].as_py()
                > g_even.column("gini")[0].as_py() + 0.5)

    def test_matches_closed_form(self):
        rng = np.random.RandomState(7)
        ks = rng.zipf(1.5, 2000).astype(np.int64)
        tbl = pa.table({"k": pa.array(ks)})
        out = gini_of_counts(ray.data.from_arrow(tbl).repartition(5), "k")
        _, counts = np.unique(ks, return_counts=True)
        x = np.sort(counts.astype(np.float64))
        i = np.arange(1, len(x) + 1)
        want = (2 * (i * x).sum()) / (len(x) * x.sum()) - (len(x) + 1) / len(x)
        assert out.column("gini")[0].as_py() == pytest.approx(want, abs=1e-12)


class TestWinsorizedMean:
    def test_matches_duckdb(self):
        rng = np.random.RandomState(21)
        n = 4000
        tbl = pa.table({
            "k": pa.array(rng.choice(["a", "b", "c"], n), pa.string()),
            "v": pa.array(np.concatenate(
                [rng.randn(n - 10), rng.randn(10) * 1000]), pa.float64()),
        })
        con = duckdb.connect()
        con.register("t", tbl)
        want = con.execute("""
            WITH q AS (SELECT k, quantile_cont(v, 0.05) AS lo,
                              quantile_cont(v, 0.95) AS hi
                       FROM t GROUP BY 1)
            SELECT t.k, COUNT(*) AS n,
                   round(AVG(CASE WHEN v < q.lo THEN q.lo
                                  WHEN v > q.hi THEN q.hi ELSE v END), 6)
            FROM t JOIN q USING (k) GROUP BY 1 ORDER BY 1
        """).fetchall()
        out = winsorized_mean_by_key(
            ray.data.from_arrow(tbl).repartition(5), "k", "v")
        got = [(r["k"], r["n"],
                np.floor(r["wmean"] * 1e6 + 0.5) / 1e6 if r["wmean"] >= 0
                else -np.floor(-r["wmean"] * 1e6 + 0.5) / 1e6)
               for r in out.to_pylist()]
        assert got == [tuple(r) for r in want]

    def test_outlier_resistance(self):
        vals = np.concatenate([np.full(98, 10.0), [1e9, -1e9]])
        tbl = pa.table({"k": pa.array(["x"] * 100),
                        "v": pa.array(vals, pa.float64())})
        out = winsorized_mean_by_key(ray.data.from_arrow(tbl), "k", "v")
        assert abs(out.column("wmean")[0].as_py() - 10.0) < 1.0


class TestWeightedMedian:
    def test_matches_duckdb_and_layouts(self):
        from insurance_pdf_extractor_ray.pipelines.statagg import (
            weighted_median_by_key)

        rng = np.random.RandomState(3)
        n = 10000
        tbl = pa.table({
            "k": pa.array(rng.choice(["a", "b", "c"], n)),
            "v": pa.array(rng.randn(n), pa.float64()),
            "w": pa.array(rng.randint(1, 50, n).astype(np.int64)),
        })
        con = duckdb.connect()
        con.register("t", tbl)
        want = con.execute("""
            WITH c AS (SELECT k, v, w,
                         SUM(w) OVER (PARTITION BY k ORDER BY v) AS cw,
                         SUM(w) OVER (PARTITION BY k) AS tw FROM t)
            SELECT k, MIN(v) FROM c WHERE cw >= tw/2.0
            GROUP BY k ORDER BY k
        """).fetchall()
        for parts in (1, 6):
            got = weighted_median_by_key(
                ray.data.from_arrow(tbl).repartition(parts), "k", "v", "w")
            g = list(zip(got.column("k").to_pylist(),
                         got.column("wmedian").to_pylist()))
            assert g == [tuple(r) for r in want]

    def test_heavy_weight_dominates(self):
        from insurance_pdf_extractor_ray.pipelines.statagg import (
            weighted_median_by_key)

        tbl = pa.table({
            "k": pa.array(["x"] * 4),
            "v": pa.array([1.0, 2.0, 3.0, 4.0], pa.float64()),
            "w": pa.array([1, 1, 100, 1], pa.int64()),
        })
        got = weighted_median_by_key(ray.data.from_arrow(tbl), "k", "v", "w")
        assert got.column("wmedian").to_pylist() == [3.0]
