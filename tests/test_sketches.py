"""HLL / Misra-Gries heavy hitters / ROLLUP vs exact answers."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.sketches import (
    heavy_hitters,
    hll_distinct,
    hll_distinct_by,
    rollup_counts,
)

pytestmark = pytest.mark.usefixtures("ray_session")


class TestHLL:
    def test_accuracy_and_partition_independence(self):
        rng = np.random.RandomState(0)
        vals = [f"v{i}" for i in rng.randint(0, 50_000, 200_000)]
        exact = len(set(vals))
        tbl = pa.table({"x": pa.array(vals, pa.string())})
        est9 = hll_distinct(ray.data.from_arrow(tbl).repartition(9), "x")
        est2 = hll_distinct(ray.data.from_arrow(tbl).repartition(2), "x")
        assert est9 == est2  # register max-merge is layout-independent
        assert abs(est9 - exact) / exact < 0.05

    def test_small_range_linear_counting(self):
        tbl = pa.table({"x": pa.array([f"u{i}" for i in range(40)])})
        est = hll_distinct(ray.data.from_arrow(tbl), "x")
        assert est == 40  # linear-counting regime is near-exact

    def test_per_key_within_error(self):
        rng = np.random.RandomState(1)
        tbl = pa.table({
            "k": pa.array(rng.choice(["a", "b", "c"], 90_000), pa.string()),
            "x": pa.array([f"u{i}" for i in rng.randint(0, 4000, 90_000)]),
        })
        out = hll_distinct_by(ray.data.from_arrow(tbl).repartition(6),
                              "k", "x").take_all()
        con = duckdb.connect()
        con.register("t", tbl)
        want = dict(con.execute(
            "SELECT k, count(DISTINCT x) FROM t GROUP BY 1").fetchall())
        assert len(out) == 3
        for r in out:
            assert abs(r["approx_distinct"] - want[r["k"]]) / want[r["k"]] < 0.05


class TestHeavyHitters:
    def test_exact_counts_and_no_false_negatives(self):
        rng = np.random.RandomState(2)
        vals = (["hot1"] * 5000 + ["hot2"] * 3000 + ["warm"] * 999
                + [f"cold{i}" for i in range(90_000)])
        rng.shuffle(vals)
        tbl = pa.table({"x": pa.array(vals, pa.string())})
        out = heavy_hitters(ray.data.from_arrow(tbl).repartition(7), "x",
                            threshold=1000, k=512)
        got = dict(zip(out.column("value").to_pylist(),
                       out.column("n").to_pylist()))
        # warm (999) is under the threshold; counts are EXACT
        assert got == {"hot1": 5000, "hot2": 3000}

    def test_matches_having_clause(self):
        rng = np.random.RandomState(3)
        tbl = pa.table({"x": pa.array(
            [f"u{i}" for i in rng.zipf(1.4, 50_000) % 2000], pa.string())})
        out = heavy_hitters(ray.data.from_arrow(tbl).repartition(5), "x",
                            threshold=500, k=2048)
        got = sorted(zip(out.column("value").to_pylist(),
                         out.column("n").to_pylist()))
        con = duckdb.connect()
        con.register("t", tbl)
        want = sorted(con.execute(
            "SELECT x, count(*) FROM t GROUP BY 1 HAVING count(*) >= 500"
        ).fetchall())
        assert got == [tuple(w) for w in want]

    def test_guarantee_line_enforced(self):
        tbl = pa.table({"x": pa.array([f"v{i % 50}" for i in range(10_000)])})
        with pytest.raises(ValueError, match="guarantee line"):
            heavy_hitters(ray.data.from_arrow(tbl), "x", threshold=2, k=16)


class TestRollup:
    def test_matches_duckdb_rollup(self):
        rng = np.random.RandomState(4)
        tbl = pa.table({
            "a": pa.array(rng.choice(["p", "q", "r"], 3000), pa.string()),
            "b": pa.array(rng.choice(["x", "y"], 3000), pa.string()),
        })
        out = rollup_counts(ray.data.from_arrow(tbl).repartition(4),
                            ["a", "b"])
        got = sorted(zip(out.column("a").to_pylist(),
                         out.column("b").to_pylist(),
                         out.column("n").to_pylist()), key=str)
        con = duckdb.connect()
        con.register("t", tbl)
        want = sorted((tuple(w) for w in con.execute(
            "SELECT a, b, count(*) FROM t GROUP BY ROLLUP(a, b)"
        ).fetchall()), key=str)
        assert got == want
        # grand total row present exactly once
        assert sum(1 for a, b, _ in got if a is None and b is None) == 1


class TestHistogram:
    def test_clamping_and_empty_bins(self):
        from insurance_pdf_extractor_ray.pipelines.sketches import histogram_fixed

        tbl = pa.table({"v": pa.array([-5.0, 0.0, 4.9, 5.0, 99.0, 200.0],
                                      pa.float64())})
        out = histogram_fixed(ray.data.from_arrow(tbl).repartition(3),
                              "v", lo=0.0, hi=100.0, bins=20)
        ns = out.column("n").to_pylist()
        assert len(ns) == 20 and sum(ns) == 6
        assert ns[0] == 3   # -5 clamps in, 0 and 4.9 belong
        assert ns[1] == 1   # 5.0
        assert ns[19] == 2  # 99 + 200 clamped
        assert out.column("lo_edge").to_pylist()[1] == 5.0


class TestCube:
    def test_matches_duckdb_cube(self):
        from insurance_pdf_extractor_ray.pipelines.sketches import cube_counts

        rng = np.random.RandomState(5)
        t = pa.table({
            "a": pa.array([f"a{i}" for i in rng.randint(0, 4, 3000)]),
            "b": pa.array([f"b{i}" for i in rng.randint(0, 6, 3000)]),
        })
        mine = cube_counts(ray.data.from_arrow(t).repartition(7), ["a", "b"])
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(
            "SELECT a, b, COUNT(*) AS n FROM t GROUP BY CUBE(a, b)"
            " ORDER BY a NULLS LAST, b NULLS LAST").fetch_arrow_table()
        mines = sorted(mine.to_pylist(),
                       key=lambda r: ((r["a"] is None, r["a"]),
                                      (r["b"] is None, r["b"])))
        wants = sorted(want.to_pylist(),
                       key=lambda r: ((r["a"] is None, r["a"]),
                                      (r["b"] is None, r["b"])))
        assert mines == wants


class TestOrderStatistics:
    """Exact sort-free order statistics / quantiles vs DuckDB."""

    def _data(self, seed=7, n=20_000):
        rng = np.random.default_rng(seed)
        # heavy ties + outliers + a dense cluster: stresses the equal-value
        # bin stop and the narrow-interval passes
        v = np.concatenate([
            rng.normal(0, 1, n // 2),
            np.repeat(3.5, n // 4),
            rng.uniform(1e6, 1e6 + 1e-3, n // 8),
            rng.standard_cauchy(n - n // 2 - n // 4 - n // 8) * 100,
        ])
        rng.shuffle(v)
        return pa.table({"v": pa.array(v, pa.float64())})

    def test_order_statistics_exact(self):
        from insurance_pdf_extractor_ray.pipelines.sketches import (
            order_statistics,
        )
        t = self._data()
        v = np.sort(t.column("v").to_numpy())
        ks = [0, 1, 17, len(v) // 2, len(v) - 2, len(v) - 1]
        # tiny exact_threshold forces several refinement passes
        got = order_statistics(ray.data.from_arrow(t).repartition(7), "v",
                               ks, bins=32, exact_threshold=64)
        for k in ks:
            assert got[k] == v[k], (k, got[k], v[k])

    def test_quantiles_cont_matches_duckdb(self):
        from insurance_pdf_extractor_ray.pipelines.sketches import (
            quantiles_global,
        )
        t = self._data(seed=11)
        qs = [0.0, 0.1, 0.25, 0.5, 0.9, 0.99, 1.0]
        got = quantiles_global(ray.data.from_arrow(t).repartition(5), "v",
                               qs, bins=64, exact_threshold=128)
        con = duckdb.connect()
        con.register("t", t)
        for q, g in zip(qs, got):
            w = con.execute(
                f"SELECT quantile_cont(v, {q}) FROM t").fetchone()[0]
            assert abs(g - w) <= 1e-9 * max(1.0, abs(w)), (q, g, w)

    def test_quantiles_disc_matches_duckdb(self):
        from insurance_pdf_extractor_ray.pipelines.sketches import (
            quantiles_global,
        )
        t = self._data(seed=13)
        qs = [0.01, 0.5, 0.75, 1.0]
        got = quantiles_global(ray.data.from_arrow(t).repartition(4), "v",
                               qs, kind="disc", bins=64, exact_threshold=128)
        con = duckdb.connect()
        con.register("t", t)
        for q, g in zip(qs, got):
            w = con.execute(
                f"SELECT quantile_disc(v, {q}) FROM t").fetchone()[0]
            assert g == w, (q, g, w)


class TestCountMin:
    def test_overestimate_only_and_layout_independence(self):
        from insurance_pdf_extractor_ray.pipelines.sketches import (
            count_min_estimate, count_min_table)

        rng = np.random.RandomState(3)
        keys = rng.zipf(1.4, 60_000).astype(np.int64)
        tbl = pa.table({"k": pa.array(keys, pa.int64())})
        cm7 = count_min_table(ray.data.from_arrow(tbl).repartition(7), "k",
                              width=256, depth=4)
        cm2 = count_min_table(ray.data.from_arrow(tbl).repartition(2), "k",
                              width=256, depth=4)
        assert cm7.equals(cm2)  # integer sums commute -> layout-independent
        q = np.unique(keys)[:200]
        est = count_min_estimate(cm7, q, width=256, depth=4)
        exact = np.array([(keys == k).sum() for k in q], np.int64)
        assert (est >= exact).all()  # one-sided error
        # e/width guarantee: err <= (e/w)*N w.h.p.; allow the full bound
        assert (est - exact).max() <= np.e / 256 * len(keys) * 3

    def test_wide_sketch_is_exact_for_sparse_keys(self):
        from insurance_pdf_extractor_ray.pipelines.sketches import (
            count_min_estimate, count_min_table)

        keys = np.repeat(np.arange(20, dtype=np.int64), [i + 1 for i in range(20)])
        tbl = pa.table({"k": pa.array(keys, pa.int64())})
        cm = count_min_table(ray.data.from_arrow(tbl), "k",
                             width=4096, depth=4)
        est = count_min_estimate(cm, np.arange(20), width=4096, depth=4)
        assert est.tolist() == [i + 1 for i in range(20)]

    def test_matches_sql_rederivation(self):
        from insurance_pdf_extractor_ray.pipelines.sketches import (
            _CM_P, _CM_PARAMS, count_min_estimate, count_min_table)

        rng = np.random.RandomState(4)
        keys = rng.randint(0, 500, 30_000).astype(np.int64)
        tbl = pa.table({"k": pa.array(keys, pa.int64())})
        w, d = 128, 3
        cm = count_min_table(ray.data.from_arrow(tbl).repartition(5), "k",
                             width=w, depth=d)
        q = np.arange(40, dtype=np.int64)
        est = count_min_estimate(cm, q, width=w, depth=d)
        con = duckdb.connect()
        con.register("t", tbl)
        params = ", ".join(f"({i}, {a}, {b})"
                           for i, (a, b) in enumerate(_CM_PARAMS[:d]))
        got = con.execute(f"""
            WITH params(i, a, b) AS (VALUES {params}),
            slots AS (SELECT p.i, ((p.a * (t.k % {_CM_P}) + p.b) % {_CM_P})
                             % {w} AS bucket, COUNT(*) AS c
                      FROM t CROSS JOIN params p GROUP BY 1, 2),
            qs AS (SELECT q.v AS k, p.i,
                          ((p.a * (q.v % {_CM_P}) + p.b) % {_CM_P}) % {w}
                            AS bucket
                   FROM (SELECT unnest(range(40)) AS v) q
                   CROSS JOIN params p)
            SELECT qs.k, MIN(s.c) FROM qs
            JOIN slots s ON s.i = qs.i AND s.bucket = qs.bucket
            GROUP BY 1 ORDER BY 1
        """).fetchall()
        assert [int(v) for _, v in got] == est.tolist()
