"""Window aggregations vs DuckDB oracle on events."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.windows import (
    session_windows,
    sliding_window,
    tumbling_window,
)

SF = "/root/testdata/sf0.001"
HOUR = 3_600_000_000
pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


def _cmp(rows, want_df, cols):
    got = pd.DataFrame(rows)[cols].sort_values(cols).reset_index(drop=True)
    want = want_df[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(got, want, check_dtype=False, rtol=1e-9)


def test_tumbling(con):
    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    rows = tumbling_window(ds, "ts", HOUR, "value").take_all()
    want = con.execute(
        "SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start, "
        "count(*) AS n, sum(value) AS total FROM events GROUP BY 1"
    ).fetchdf()
    _cmp(rows, want, ["window_start", "n", "total"])


def test_tumbling_keyed(con):
    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["ts", "value", "event_type"])
    rows = tumbling_window(ds, "ts", 6 * HOUR, "value", key_col="event_type").take_all()
    want = con.execute(
        "SELECT event_type, (epoch_us(ts) // 21600000000) * 21600000000 AS window_start, "
        "count(*) AS n, sum(value) AS total FROM events GROUP BY 1, 2"
    ).fetchdf()
    _cmp(rows, want, ["event_type", "window_start", "n", "total"])


def test_sliding(con):
    ds = ray.data.read_parquet(f"{SF}/events.parquet", columns=["ts", "value"])
    rows = sliding_window(ds, "ts", 2 * HOUR, HOUR, "value").take_all()
    want = con.execute(
        "SELECT (epoch_us(ts) // 3600000000) * 3600000000 - i * 3600000000 AS window_start, "
        "count(*) AS n, sum(value) AS total FROM events, range(2) AS t(i) GROUP BY 1"
    ).fetchdf()
    _cmp(rows, want, ["window_start", "n", "total"])
    # every event contributes to exactly 2 windows
    assert sum(r["n"] for r in rows) == 2 * con.execute("SELECT count(*) FROM events").fetchone()[0]


def test_sessions(con):
    ds = ray.data.read_parquet(f"{SF}/events.parquet",
                               columns=["user_id", "ts", "event_id"])
    rows = session_windows(ds, "user_id", "ts", gap_us=600_000_000,
                           tiebreak_col="event_id").take_all()
    want = con.execute("""
        WITH d AS (SELECT user_id, event_id, epoch_us(ts) AS e FROM events),
        m AS (SELECT user_id, event_id, e,
                     CASE WHEN e - lag(e) OVER (PARTITION BY user_id ORDER BY e, event_id)
                              > 600000000 THEN 1 ELSE 0 END AS brk FROM d),
        s AS (SELECT user_id, e,
                     sum(brk) OVER (PARTITION BY user_id ORDER BY e, event_id
                                    ROWS UNBOUNDED PRECEDING) AS session_id FROM m)
        SELECT user_id, session_id, count(*) AS n, min(e) AS start_us, max(e) AS end_us
        FROM s GROUP BY user_id, session_id
    """).fetchdf()
    _cmp(rows, want, ["user_id", "session_id", "n", "start_us", "end_us"])
    # sessions respect the gap: no intra-session hole > gap is checkable only
    # per-event; at least assert sessions are disjoint and ordered per user
    by_user = {}
    for r in sorted(rows, key=lambda r: (r["user_id"], r["session_id"])):
        prev = by_user.get(r["user_id"])
        if prev is not None:
            assert r["start_us"] - prev > 600_000_000
        by_user[r["user_id"]] = r["end_us"]


def test_salted_sessions_match_plain(ray_session):
    """session_windows_salted must reproduce session_windows exactly even
    when epoch boundaries split sessions (epoch barely above the gap)."""
    import os

    import ray.data

    from insurance_pdf_extractor_ray.pipelines.windows import (
        session_windows,
        session_windows_salted,
    )

    ds = ray.data.read_parquet("/root/testdata/sf0.001/events.parquet",
                               columns=["user_id", "ts", "event_id"])
    gap = 600_000_000
    plain = sorted(
        ((r["user_id"], r["session_id"], r["n"], r["start_us"], r["end_us"])
         for r in session_windows(ds, "user_id", "ts", gap_us=gap,
                                  tiebreak_col="event_id").take_all()))
    for epoch in (gap + 1, 3_600_000_000, 86_400_000_000):
        salted = sorted(
            ((r["user_id"], r["session_id"], r["n"], r["start_us"], r["end_us"])
             for r in session_windows_salted(
                 ds, "user_id", "ts", gap_us=gap, epoch_us=epoch,
                 tiebreak_col="event_id").take_all()))
        assert salted == plain, epoch


class TestRollingByKey:
    def test_matches_duckdb_window(self):
        import duckdb

        from insurance_pdf_extractor_ray.pipelines.windows import rolling_by_key

        rng = np.random.RandomState(6)
        n = 5000
        tbl = pa.table({
            "id": pa.array(np.arange(n), pa.int64()),
            "k": pa.array(rng.randint(0, 40, n), pa.int64()),
            "ts": pa.array(rng.randint(0, 10**9, n), pa.int64()),
            "v": pa.array(rng.uniform(0, 100, n).round(3), pa.float64()),
        })
        out = rolling_by_key(ray.data.from_arrow(tbl).repartition(7),
                             "k", "ts", "v", window=4,
                             order_tiebreak="id").take_all()
        got = {r["id"]: (r["roll_n"], round(r["roll_avg"], 9)) for r in out}
        con = duckdb.connect()
        con.register("t", tbl)
        want = {r[0]: (r[1], round(r[2], 9)) for r in con.execute("""
            SELECT id, count(*) OVER w, avg(v) OVER w FROM t
            WINDOW w AS (PARTITION BY k ORDER BY ts, id
                         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
        """).fetchall()}
        assert set(got) == set(want)
        for i in got:
            assert got[i][0] == want[i][0]
            assert abs(got[i][1] - want[i][1]) < 1e-9

    def test_window_one_is_identity(self):
        from insurance_pdf_extractor_ray.pipelines.windows import rolling_by_key

        tbl = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                        "ts": pa.array([10, 20, 30], pa.int64()),
                        "v": pa.array([1.0, 2.0, 5.0], pa.float64())})
        out = rolling_by_key(ray.data.from_arrow(tbl), "k", "ts", "v",
                             window=1).take_all()
        for r in out:
            assert r["roll_n"] == 1 and r["roll_avg"] == r["v"]


class TestLagByKey:
    def test_lag_and_lead_match_duckdb(self):
        from insurance_pdf_extractor_ray.pipelines.windows import lag_by_key

        rng = np.random.RandomState(8)
        n = 3000
        tbl = pa.table({
            "id": pa.array(np.arange(n), pa.int64()),
            "k": pa.array(rng.randint(0, 25, n), pa.int64()),
            "ts": pa.array(rng.randint(0, 10**7, n), pa.int64()),
            "v": pa.array(rng.uniform(0, 9, n).round(3), pa.float64()),
        })
        con = duckdb.connect()
        con.register("t", tbl)
        for off, fn in [(1, "lag(v, 1)"), (2, "lag(v, 2)"), (-1, "lead(v, 1)")]:
            out = lag_by_key(ray.data.from_arrow(tbl).repartition(5),
                             "k", "ts", "v", offset=off,
                             order_tiebreak="id").take_all()
            got = {r["id"]: r["lag_value"] for r in out}
            want = dict(con.execute(
                f"SELECT id, {fn} OVER (PARTITION BY k ORDER BY ts, id) FROM t"
            ).fetchall())
            assert got == want, f"offset {off}"


class TestZscore:
    def test_zero_variance_is_null_and_values_match(self):
        from insurance_pdf_extractor_ray.pipelines.analytics import zscore_by

        tbl = pa.table({
            "k": pa.array(["a"] * 4 + ["flat"] * 3, pa.string()),
            "v": pa.array([1.0, 2.0, 3.0, 6.0, 5.0, 5.0, 5.0], pa.float64()),
        })
        out = zscore_by(ray.data.from_arrow(tbl).repartition(2), "k", "v") \
            .take_all()
        flat = [r for r in out if r["k"] == "flat"]
        assert all(r["zscore"] is None for r in flat)
        a = sorted((r["v"], r["zscore"]) for r in out if r["k"] == "a")
        import duckdb as dk
        con = dk.connect()
        con.register("t", tbl)
        want = sorted(con.execute("""
            SELECT v, (v - avg(v) OVER (PARTITION BY k))
                      / stddev_pop(v) OVER (PARTITION BY k)
            FROM t WHERE k = 'a'""").fetchall())
        for (gv, gz), (wv, wz) in zip(a, want):
            assert gv == wv and abs(gz - wz) < 1e-9


class TestDebounceByKey:
    def test_matches_duckdb_lag_filter(self):
        from insurance_pdf_extractor_ray.pipelines.windows import (
            debounce_by_key,
        )

        rng = np.random.RandomState(17)
        n = 800
        tbl = pa.table({
            "eid": pa.array(range(n), pa.int64()),
            "k": pa.array(rng.randint(0, 30, n), pa.int64()),
            "sig": pa.array(rng.choice(["x", "y"], n), pa.string()),
            "ts": pa.array(rng.randint(0, 5_000, n), pa.int64()),
        })
        out = debounce_by_key(ray.data.from_arrow(tbl).repartition(6),
                              "k", "ts", "sig", gap=100,
                              order_tiebreak="eid").take_all()
        got = sorted(r["eid"] for r in out)
        con = duckdb.connect()
        con.register("ev", tbl)
        want = sorted(w[0] for w in con.execute("""
            WITH m AS (SELECT eid, sig,
                         lag(sig) OVER (PARTITION BY k ORDER BY ts, eid)
                           AS psig,
                         ts - lag(ts) OVER (PARTITION BY k ORDER BY ts, eid)
                           AS gap
                       FROM ev)
            SELECT eid FROM m
            WHERE psig IS DISTINCT FROM sig OR gap > 100""").fetchall())
        assert got == want

    def test_burst_keeps_first_non_cascading(self):
        from insurance_pdf_extractor_ray.pipelines.windows import (
            debounce_by_key,
        )

        # three rapid repeats: row2 dropped (vs row1), row3 dropped (vs raw
        # predecessor row2), a later repeat past the gap survives
        tbl = pa.table({
            "eid": pa.array([1, 2, 3, 4], pa.int64()),
            "k": pa.array([0, 0, 0, 0], pa.int64()),
            "sig": pa.array(["x", "x", "x", "x"], pa.string()),
            "ts": pa.array([0, 10, 20, 500], pa.int64()),
        })
        out = debounce_by_key(ray.data.from_arrow(tbl), "k", "ts", "sig",
                              gap=100).take_all()
        assert sorted(r["eid"] for r in out) == [1, 4]


# --- expanding_by_key (running totals) ---------------------------------------

from insurance_pdf_extractor_ray.pipelines.windows import expanding_by_key  # noqa: E402


def test_expanding_matches_duckdb_running_total(con):
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        f"{SF}/events.parquet",
        columns=["user_id", "ts", "event_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        return b.append_column(
            "cents",
            pc.round(pc.multiply(b.column("value"), 100.0)).cast(pa.int64()))

    out = expanding_by_key(
        ds.map_batches(cents, batch_format="pyarrow"),
        "user_id", "ts", "cents", order_tiebreak="event_id")
    want = con.execute("""
        SELECT event_id,
               SUM(CAST(round(value*100) AS BIGINT)) OVER w AS cum_sum,
               COUNT(*) OVER w AS cum_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING)
    """).df()
    _cmp(out.select_columns(["event_id", "cum_sum", "cum_n"]).take_all(),
         want, ["event_id", "cum_sum", "cum_n"])


def test_expanding_float_accumulates_left_to_right():
    tbl = pa.table({
        "k": pa.array([1] * 4, pa.int64()),
        "ts": pa.array([1, 2, 3, 4], pa.int64()),
        "v": pa.array([0.5, 0.25, 0.125, 1.0], pa.float64()),
    })
    out = expanding_by_key(ray.data.from_arrow(tbl).repartition(2),
                           "k", "ts", "v")
    got = sorted((r["ts"], r["cum_sum"], r["cum_n"]) for r in out.take_all())
    assert got == [(1, 0.5, 1), (2, 0.75, 2), (3, 0.875, 3), (4, 1.875, 4)]


# --- range_rolling_by_key (time-RANGE frames) ---------------------------------

from insurance_pdf_extractor_ray.pipelines.windows import range_rolling_by_key  # noqa: E402


def test_range_rolling_matches_duckdb(con):
    import pyarrow.compute as pc

    ds = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["user_id", "ts", "event_id", "value"])

    def cents(b: pa.Table) -> pa.Table:
        return b.append_column(
            "cents",
            pc.round(pc.multiply(b.column("value"), 100.0)).cast(pa.int64()))

    out = range_rolling_by_key(
        ds.map_batches(cents, batch_format="pyarrow"),
        "user_id", "ts", "cents", range_us=HOUR)
    want = con.execute("""
        SELECT event_id,
               SUM(CAST(round(value*100) AS BIGINT)) OVER w AS rr_sum,
               COUNT(*) OVER w AS rr_n
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
    """).df()
    _cmp(out.select_columns(["event_id", "rr_sum", "rr_n"]).take_all(),
         want, ["event_id", "rr_sum", "rr_n"])


def test_range_rolling_includes_peers():
    # two rows at the identical timestamp must see each other (RANGE peers)
    tbl = pa.table({
        "k": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([0, 100, 100], pa.int64()),
        "v": pa.array([1, 2, 3], pa.int64()),
    })
    out = range_rolling_by_key(ray.data.from_arrow(tbl), "k", "ts", "v",
                               range_us=50).take_all()
    by_ts = sorted((r["ts"], r["rr_sum"], r["rr_n"]) for r in out)
    assert by_ts == [(0, 1, 1), (100, 5, 2), (100, 5, 2)]


class TestRollingDistinctDays:
    def test_matches_duckdb_band_join(self):
        import duckdb

        from insurance_pdf_extractor_ray.pipelines.windows import (
            rolling_distinct_days,
        )

        rng = np.random.default_rng(5)
        n = 5000
        day_us = 86_400_000_000
        ts = (rng.integers(0, 40, n) * day_us
              + rng.integers(0, day_us, n)).astype(np.int64)
        # leave day gaps so the existing-day filter is exercised
        ts = ts[(ts // day_us) % 9 != 4]
        users = rng.integers(0, 120, len(ts)).astype(np.int64)
        t = pa.table({"ts": pa.array(ts, pa.timestamp("us")),
                      "user_id": pa.array(users, pa.int64())})
        out = rolling_distinct_days(
            ray.data.from_arrow(t).repartition(6), "ts", "user_id",
            window_days=7)
        got = sorted((r["day"], r["n_distinct"]) for r in out.take_all())
        con = duckdb.connect()
        con.register("t", t)
        want = sorted(tuple(r) for r in con.execute("""
            WITH e AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
                              user_id FROM t),
                 days AS (SELECT DISTINCT day FROM e)
            SELECT d.day, count(DISTINCT e.user_id)
            FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day
        """).fetchall())
        assert got == want and len(got) > 20
