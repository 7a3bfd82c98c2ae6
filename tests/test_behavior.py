"""Behavioral analytics (pivot / funnel / cohort) vs hand-computed and
DuckDB-derived expectations."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.behavior import (
    cohort_retention,
    funnel_counts,
    pivot_counts,
)

pytestmark = pytest.mark.usefixtures("ray_session")

US_PER_DAY = 86_400_000_000


def _events(rows):
    """rows: (user, day_float, type) → events table (ts in us)."""
    return pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([int(r[1] * US_PER_DAY) for r in rows],
                       pa.int64()).cast(pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows], pa.string()),
    })


class TestPivot:
    def test_counts_and_absent_cells(self):
        tbl = pa.table({
            "k": pa.array(["a", "a", "b", "a", "b"]),
            "c": pa.array(["x", "y", "x", "x", "z"]),
        })
        out = pivot_counts(ray.data.from_arrow(tbl).repartition(3),
                           "k", "c", ["x", "y"], prefix="n_").take_all()
        got = {r["k"]: (r["n_x"], r["n_y"]) for r in out}
        # 'z' outside the domain is dropped; absent (b, y) cell is 0
        assert got == {"a": (2, 1), "b": (1, 0)}

    def test_matches_duckdb_filter_counts(self):
        rng = np.random.RandomState(3)
        tbl = pa.table({
            "k": pa.array(rng.randint(0, 50, 5000), pa.int64()),
            "c": pa.array(rng.choice(["p", "q", "r"], 5000), pa.string()),
        })
        out = pivot_counts(ray.data.from_arrow(tbl).repartition(8),
                           "k", "c", ["p", "q", "r"]).take_all()
        got = sorted((r["k"], r["p"], r["q"], r["r"]) for r in out)
        con = duckdb.connect()
        con.register("t", tbl)
        want = con.execute("""
            SELECT k, count(*) FILTER (c='p'), count(*) FILTER (c='q'),
                   count(*) FILTER (c='r')
            FROM t GROUP BY k ORDER BY k""").fetchall()
        assert got == [tuple(w) for w in want]


class TestFunnel:
    def test_strictly_after_semantics(self):
        rows = [
            # u1 completes all three in order
            (1, 0.1, "view"), (1, 0.2, "click"), (1, 0.3, "purchase"),
            # u2: click BEFORE view — completes only the view step
            (2, 0.2, "view"), (2, 0.1, "click"),
            # u3: click at the SAME instant as view — strictly-after fails
            (3, 0.5, "view"), (3, 0.5, "click"),
            # u4 never views
            (4, 0.1, "click"), (4, 0.2, "purchase"),
            # u5: view → click, purchase before click
            (5, 0.1, "view"), (5, 0.3, "click"), (5, 0.2, "purchase"),
        ]
        out = funnel_counts(ray.data.from_arrow(_events(rows)).repartition(4),
                            "user_id", "ts", "event_type",
                            ["view", "click", "purchase"])
        assert out.column("step").to_pylist() == ["view", "click", "purchase"]
        assert out.column("n_users").to_pylist() == [4, 2, 1]

    def test_min_ts_not_any_path(self):
        # u1 clicks twice; min click is before the purchase, so purchase
        # counts even though a later click exists
        rows = [(1, 0.1, "view"), (1, 0.2, "click"), (1, 0.9, "click"),
                (1, 0.5, "purchase")]
        out = funnel_counts(ray.data.from_arrow(_events(rows)),
                            "user_id", "ts", "event_type",
                            ["view", "click", "purchase"])
        assert out.column("n_users").to_pylist() == [1, 1, 1]


class TestCohort:
    def _check(self, tbl, max_offset=7):
        got = cohort_retention(
            ray.data.from_arrow(tbl).repartition(6), "user_id", "ts",
            max_offset=max_offset).take_all()
        got = sorted((r["cohort_day"], r["day_offset"], r["n_users"])
                     for r in got)
        con = duckdb.connect()
        con.register("t", tbl)
        want = con.execute(f"""
            WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS c
                       FROM t GROUP BY 1),
            a AS (SELECT DISTINCT e.user_id, f.c,
                         datediff('day', f.c, date_trunc('day', e.ts)) AS o
                  FROM t e JOIN f USING (user_id))
            SELECT strftime(c, '%Y-%m-%d'), o, count(*) FROM a
            WHERE o BETWEEN 0 AND {max_offset} GROUP BY 1, 2 ORDER BY 1, 2
        """).fetchall()
        assert got == [tuple(w) for w in want]

    def test_small_literal(self):
        rows = [(1, 0.5, "x"), (1, 1.5, "x"), (1, 9.5, "x"),  # d9 > horizon
                (2, 1.2, "x"), (2, 1.8, "x"),  # same-day repeat → distinct 1
                (3, 3.0, "x"), (3, 5.0, "x")]
        tbl = _events(rows).drop_columns(["event_type"])
        self._check(tbl)

    def test_random_vs_duckdb_both_join_paths(self):
        rng = np.random.RandomState(11)
        n = 4000
        tbl = pa.table({
            "user_id": pa.array(rng.randint(0, 120, n), pa.int64()),
            "ts": pa.array((rng.uniform(0, 20, n) * US_PER_DAY).astype(
                np.int64)).cast(pa.timestamp("us")),
        })
        self._check(tbl)
        # shuffle-join path: force broadcast_max below the user count
        got_b = cohort_retention(ray.data.from_arrow(tbl), "user_id", "ts",
                                 max_offset=7).take_all()
        got_s = cohort_retention(ray.data.from_arrow(tbl), "user_id", "ts",
                                 max_offset=7, broadcast_max=5).take_all()
        key = lambda r: (r["cohort_day"], r["day_offset"])
        assert sorted(((r["cohort_day"], r["day_offset"], r["n_users"])
                       for r in got_b)) == \
               sorted(((r["cohort_day"], r["day_offset"], r["n_users"])
                       for r in got_s))


class TestUnpivot:
    def test_melt_matches_duckdb_unpivot(self):
        from insurance_pdf_extractor_ray.pipelines.behavior import unpivot

        tbl = pa.table({
            "id": pa.array([1, 2, 3], pa.int64()),
            "a": pa.array([10, 20, 30], pa.int64()),
            "b": pa.array([-1, -2, -3], pa.int64()),
        })
        out = unpivot(ray.data.from_arrow(tbl).repartition(2), ["id"],
                      ["a", "b"]).take_all()
        got = sorted((r["id"], r["variable"], r["value"]) for r in out)
        con = duckdb.connect()
        con.register("t", tbl)
        want = sorted(tuple(w) for w in con.execute(
            "SELECT id, name, value FROM (UNPIVOT t ON a, b"
            " INTO NAME name VALUE value)").fetchall())
        assert got == want

    def test_labels_and_nulls_survive(self):
        from insurance_pdf_extractor_ray.pipelines.behavior import unpivot

        tbl = pa.table({"id": pa.array([7], pa.int64()),
                        "x": pa.array([None], pa.int64()),
                        "y": pa.array([5], pa.int64())})
        out = unpivot(ray.data.from_arrow(tbl), ["id"], ["x", "y"],
                      var_labels=["ex", "why"]).take_all()
        got = {(r["variable"]): r["value"] for r in out}
        assert got == {"ex": None, "why": 5}


class TestCooccurrencePairs:
    def test_matches_duckdb_self_join(self):
        from insurance_pdf_extractor_ray.pipelines.behavior import (
            cooccurrence_pairs,
        )

        rng = np.random.RandomState(11)
        items = ["view", "click", "buy", "share", "save"]
        n = 600
        tbl = pa.table({
            "user_id": pa.array(rng.randint(0, 40, n), pa.int64()),
            "event_type": pa.array(rng.choice(items, n), pa.string()),
        })
        out = cooccurrence_pairs(
            ray.data.from_arrow(tbl).repartition(6), "user_id",
            "event_type").take_all()
        got = sorted((r["item_a"], r["item_b"], r["n"]) for r in out)
        con = duckdb.connect()
        con.register("ev", tbl)
        want = sorted(tuple(w) for w in con.execute("""
            WITH d AS (SELECT DISTINCT user_id, event_type FROM ev)
            SELECT a.event_type, b.event_type, count(*) FROM d a
            JOIN d b ON a.user_id = b.user_id
                AND a.event_type < b.event_type
            GROUP BY 1, 2""").fetchall())
        assert got == want

    def test_repeat_events_count_once_and_nulls_drop(self):
        from insurance_pdf_extractor_ray.pipelines.behavior import (
            cooccurrence_pairs,
        )

        tbl = pa.table({
            "user_id": pa.array([1, 1, 1, 1, 2], pa.int64()),
            "event_type": pa.array(["a", "a", "b", None, "a"], pa.string()),
        })
        out = cooccurrence_pairs(ray.data.from_arrow(tbl), "user_id",
                                 "event_type").take_all()
        assert [(r["item_a"], r["item_b"], r["n"]) for r in out] == [
            ("a", "b", 1)]


class TestTransitionCounts:
    def test_matches_duckdb_lag(self):
        from insurance_pdf_extractor_ray.pipelines.behavior import (
            transition_counts,
        )

        rng = np.random.RandomState(13)
        n = 500
        tbl = pa.table({
            "eid": pa.array(range(n), pa.int64()),
            "user_id": pa.array(rng.randint(0, 25, n), pa.int64()),
            "etype": pa.array(rng.choice(["a", "b", "c"], n), pa.string()),
            "ts": pa.array(rng.randint(0, 10_000, n), pa.int64()),
        })
        out = transition_counts(
            ray.data.from_arrow(tbl).repartition(5), "user_id", "etype",
            "ts", order_tiebreak="eid").take_all()
        got = sorted((r["from_item"], r["to_item"], r["n"]) for r in out)
        con = duckdb.connect()
        con.register("ev", tbl)
        want = sorted(tuple(w) for w in con.execute("""
            WITH m AS (SELECT etype, lag(etype) OVER (PARTITION BY user_id
                         ORDER BY ts, eid) AS prev FROM ev)
            SELECT prev, etype, count(*) FROM m
            WHERE prev IS NOT NULL GROUP BY 1, 2""").fetchall())
        assert got == want

    def test_single_event_user_emits_nothing(self):
        from insurance_pdf_extractor_ray.pipelines.behavior import (
            transition_counts,
        )

        tbl = pa.table({"user_id": pa.array([1], pa.int64()),
                        "etype": pa.array(["a"], pa.string()),
                        "ts": pa.array([0], pa.int64())})
        out = transition_counts(ray.data.from_arrow(tbl), "user_id",
                                "etype", "ts").take_all()
        assert out == []
