"""Analytics aggregates vs DuckDB oracle on the events testdata table."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines import analytics

SF = "/root/testdata/sf0.001"
pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture(scope="module")
def events():
    return ray.data.read_parquet(f"{SF}/events.parquet")


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    return c


def test_global_stats(events, con):
    got = analytics.global_stats(events, "value").to_pylist()[0]
    want = con.execute(
        "SELECT count(*) n, sum(value) total, avg(value) avg, min(value) min, max(value) max FROM events"
    ).fetchone()
    assert got["n"] == want[0]
    assert got["total"] == pytest.approx(want[1])
    assert got["avg"] == pytest.approx(want[2])
    assert got["min"] == want[3] and got["max"] == want[4]


def test_stats_by(events, con):
    got = analytics.stats_by(events, "event_type", "value").take_all()
    want = con.execute(
        "SELECT event_type, count(*) n, sum(value) total, avg(value) avg "
        "FROM events GROUP BY event_type ORDER BY total DESC"
    ).fetchall()
    assert [r["event_type"] for r in got] == [w[0] for w in want]
    for r, w in zip(got, want):
        assert r["n"] == w[1] and r["total"] == pytest.approx(w[2])


def test_daily_trends(events, con):
    got = analytics.daily_trends(events, "ts", "value").take_all()
    want = con.execute(
        "SELECT strftime(ts, '%Y-%m-%d') date, count(*) n, sum(value) total "
        "FROM events GROUP BY 1 ORDER BY date DESC"
    ).fetchall()
    assert len(got) == len(want)
    for r, w in zip(got, want):
        assert r["date"] == w[0] and r["n"] == w[1] and r["total"] == pytest.approx(w[2])


def test_daily_trends_cutoff(events, con):
    got = analytics.daily_trends(events, "ts", "value", cutoff_date="2024-01-05").take_all()
    n = con.execute(
        "SELECT count(DISTINCT strftime(ts, '%Y-%m-%d')) FROM events "
        "WHERE strftime(ts, '%Y-%m-%d') >= '2024-01-05'"
    ).fetchone()[0]
    assert len(got) == n
    assert all(r["date"] >= "2024-01-05" for r in got)


def test_top_k(events, con):
    got = analytics.top_k(events, "value", k=10, tiebreak="event_id").take_all()
    want = con.execute(
        "SELECT event_id, value FROM events ORDER BY value DESC, event_id LIMIT 10"
    ).fetchall()
    assert [(r["event_id"], r["value"]) for r in got] == want


def test_breakdown_pct(events, con):
    got = analytics.breakdown_with_pct(events, "event_type").to_pylist()
    want = con.execute(
        "SELECT event_type, count(*) n, round(100.0*count(*)/(SELECT count(*) FROM events), 2) pct "
        "FROM events GROUP BY event_type ORDER BY n DESC, event_type"
    ).fetchall()
    assert [(r["event_type"], r["n"], r["pct"]) for r in got] == want


def test_trend_and_prediction_helpers():
    daily = [{"total": 200.0}] * 7 + [{"total": 100.0}] * 7
    assert analytics.trend_classification(daily) == "increasing"
    daily = [{"total": 100.0}] * 14
    assert analytics.trend_classification(daily) == "stable"
    pred = analytics.cost_prediction(0.001, 1000)
    assert pred == {"predicted_cost": 1.0, "lower_bound": 0.8, "upper_bound": 1.2}


def test_most_used(events, con):
    got = analytics.most_used(events, "event_type")
    want = con.execute(
        "SELECT event_type FROM events GROUP BY event_type ORDER BY count(*) DESC, event_type LIMIT 1"
    ).fetchone()[0]
    assert got == want


def test_cumulative_daily_matches_window_sql():
    from insurance_pdf_extractor_ray.pipelines.analytics import cumulative_daily

    rng = np.random.RandomState(32)
    base = np.datetime64("2024-03-01T00:00:00", "us")
    ts = base + (rng.randint(0, 20, 3000) * 86_400_000_000
                 + rng.randint(0, 86_400_000_000, 3000)).astype("timedelta64[us]")
    t = pa.table({"ts": pa.array(ts), "value": pa.array(rng.rand(3000) * 10)})
    mine = cumulative_daily(ray.data.from_arrow(t).repartition(6), "ts", "value")
    con = duckdb.connect()
    con.register("t", t)
    want = con.execute("""
        SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date,
               CAST(SUM(COUNT(*)) OVER (ORDER BY CAST(ts AS DATE)) AS BIGINT) AS cum_n,
               SUM(SUM(value)) OVER (ORDER BY CAST(ts AS DATE)) AS cum_total
        FROM t GROUP BY CAST(ts AS DATE) ORDER BY date""").fetchall()
    got = mine.to_pylist()
    assert [r["date"] for r in got] == [w[0] for w in want]
    assert [r["cum_n"] for r in got] == [w[1] for w in want]
    for r, w in zip(got, want):
        assert abs(r["cum_total"] - w[2]) < 1e-6


def test_entropy_by_matches_duckdb():
    rng = np.random.RandomState(3)
    tbl = pa.table({
        "source": pa.array(rng.choice(["s1", "s2", "s3"], 400), pa.string()),
        "lang": pa.array(rng.choice(["en", "fr", "de", "es"], 400),
                         pa.string()),
    })
    out = analytics.entropy_by(
        ray.data.from_arrow(tbl).repartition(4), "source", "lang")
    got = {r["source"]: r["entropy"] for r in out.to_pylist()}
    con = duckdb.connect()
    con.register("d", tbl)
    want = dict(con.execute("""
        SELECT source, ROUND(-SUM(p * ln(p)), 6) FROM (
          SELECT source, COUNT(*) * 1.0
                 / SUM(COUNT(*)) OVER (PARTITION BY source) AS p
          FROM d GROUP BY source, lang)
        GROUP BY source""").fetchall())
    assert got == want


def test_entropy_by_single_value_group_is_zero():
    tbl = pa.table({"source": pa.array(["a", "a"], pa.string()),
                    "lang": pa.array(["en", "en"], pa.string())})
    out = analytics.entropy_by(ray.data.from_arrow(tbl), "source", "lang")
    assert out.to_pylist() == [{"source": "a", "entropy": 0.0}]


def test_decayed_sum_by_matches_duckdb():
    rng = np.random.RandomState(29)
    n = 400
    tbl = pa.table({
        "k": pa.array(rng.randint(0, 20, n), pa.int64()),
        "ts": pa.array(rng.randint(0, 10**7, n), pa.int64()).cast(
            pa.timestamp("us")),
        "v": pa.array(rng.rand(n) * 100, pa.float64()),
    })
    out = analytics.decayed_sum_by(
        ray.data.from_arrow(tbl).repartition(4), "k", "ts", "v",
        tau_us=1e6, t0_us=0, nd=6)
    got = {r["k"]: r["decayed_sum"] for r in out.to_pylist()}
    con = duckdb.connect()
    con.register("e", tbl)
    want = dict(con.execute("""
        SELECT k, ROUND(SUM(v * exp(epoch_us(ts) / 1000000.0))
                        * exp(-MAX(epoch_us(ts)) / 1000000.0), 6)
        FROM e GROUP BY k""").fetchall())
    assert set(got) == set(want)
    for k in got:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


# --- gap_fill_days ------------------------------------------------------------

def test_gap_fill_zero_fills_missing_calendar_days(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data
    from insurance_pdf_extractor_ray.pipelines.analytics import gap_fill_days

    day = 86_400_000_000
    # days 0, 0, 3, 5 present -> 1,2,4 must appear with zero counts
    ts = pa.array(np.array([0, 1000, 3 * day, 5 * day + 7], np.int64),
                  pa.timestamp("us"))
    ds = ray.data.from_arrow(pa.table({"ts": ts})).repartition(2)
    out = gap_fill_days(ds, "ts", count_alias="n")
    assert out.column("date").to_pylist() == [
        "1970-01-01", "1970-01-02", "1970-01-03",
        "1970-01-04", "1970-01-05", "1970-01-06"]
    assert out.column("n").to_pylist() == [2, 0, 0, 1, 0, 1]


def test_gap_fill_empty_input(ray_session):
    import pyarrow as pa
    import ray.data
    from insurance_pdf_extractor_ray.pipelines.analytics import gap_fill_days

    ds = ray.data.from_arrow(pa.table({
        "ts": pa.array([], pa.timestamp("us"))}))
    out = gap_fill_days(ds, "ts")
    assert out.num_rows == 0 and out.column_names == ["date", "n_events"]
