"""Join operators (pipelines/joins.py): broadcast hash/anti/semi join."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.joins import (
    broadcast_anti_join,
    broadcast_join,
    broadcast_semi_join,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _big():
    # small blocks so some blocks contain ONLY unmatched keys
    return ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 100, 101, 102], pa.int64()),
        "v": pa.array(list("abcdef"), pa.string()),
    })).repartition(6)


def _small():
    return ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["one", "two", "three"], pa.string()),
        "weight": pa.array([1.0, 2.0, 3.0], pa.float64()),
    }))


def test_inner_broadcast_join():
    out = broadcast_join(_big(), _small(), on="k").take_all()
    assert sorted((r["k"], r["name"]) for r in out) == [
        (1, "one"), (2, "two"), (3, "three")]


def test_left_join_all_miss_batch_keeps_types():
    """A block whose keys all miss must still emit correctly-typed null
    columns (null-type inference would break block unification)."""
    ds = broadcast_join(_big(), _small(), on="k", how="left")
    tbl = pa.concat_tables([t for t in ray.get(ds.to_arrow_refs()) if t.num_rows])
    assert tbl.schema.field("name").type == pa.string()
    assert tbl.schema.field("weight").type == pa.float64()
    rows = {r["k"]: r for r in tbl.to_pylist()}
    assert rows[100]["name"] is None and rows[100]["weight"] is None
    assert rows[2]["name"] == "two" and rows[2]["weight"] == 2.0
    assert len(rows) == 6


def test_anti_and_semi_join():
    anti = broadcast_anti_join(_big(), "k", {1, 2, 3}).take_all()
    assert sorted(r["k"] for r in anti) == [100, 101, 102]
    semi = broadcast_semi_join(_big(), "k", {1, 2, 3}).take_all()
    assert sorted(r["k"] for r in semi) == [1, 2, 3]


# ---------------------------------------------------------------------------
# asof_join
# ---------------------------------------------------------------------------

def _asof_sides(n=4000, seed=11):
    import numpy as np

    rng = np.random.RandomState(seed)
    ts = np.sort(rng.randint(0, 1_000_000, n)).astype("int64")
    types = rng.choice(["click", "view", "purchase"], n)
    tbl = pa.table({
        "event_id": pa.array(np.arange(n), pa.int64()),
        "user_id": pa.array(rng.randint(0, 50, n), pa.int64()),
        "ts_us": pa.array(ts, pa.int64()),
        "event_type": pa.array(types, pa.string()),
    })
    left = tbl.filter(pa.compute.not_equal(tbl.column("event_type"), "click"))
    right = tbl.filter(pa.compute.equal(tbl.column("event_type"), "click"))
    return left, right


def test_asof_join_matches_duckdb():
    import duckdb

    from insurance_pdf_extractor_ray.pipelines.joins import asof_join

    left, right = _asof_sides()
    out = asof_join(
        ray.data.from_arrow(left).repartition(8),
        ray.data.from_arrow(right).repartition(8),
        by="user_id", on="ts_us", value_col="ts_us", out_col="last_click_ts",
    )
    tbl = pa.concat_tables([t for t in ray.get(out.to_arrow_refs()) if t.num_rows])
    got = sorted(zip(tbl.column("event_id").to_pylist(),
                     tbl.column("last_click_ts").to_pylist()))

    con = duckdb.connect()
    con.register("l", left)
    con.register("r", right)
    want = sorted(map(tuple, con.execute("""
        SELECT l.event_id, r.ts_us AS last_click_ts
        FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
    """).fetchall()))
    assert got == want


def test_asof_join_inner_drops_unmatched():
    from insurance_pdf_extractor_ray.pipelines.joins import asof_join

    left = pa.table({"k": pa.array([1, 2], pa.int64()),
                     "t": pa.array([10, 20], pa.int64())})
    right = pa.table({"k": pa.array([1], pa.int64()),
                      "t": pa.array([5], pa.int64())})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    by="k", on="t", value_col="t", out_col="rt", how="inner").take_all()
    assert [(r["k"], r["rt"]) for r in out] == [(1, 5)]


def test_asof_join_tie_matches():
    """right ts equal to left ts matches (the SQL >= bound)."""
    from insurance_pdf_extractor_ray.pipelines.joins import asof_join

    left = pa.table({"k": pa.array([1], pa.int64()),
                     "t": pa.array([10], pa.int64())})
    right = pa.table({"k": pa.array([1, 1], pa.int64()),
                      "t": pa.array([10, 3], pa.int64())})
    out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                    by="k", on="t", value_col="t", out_col="rt").take_all()
    assert out[0]["rt"] == 10


def test_asof_salted_identical_to_plain_across_epochs():
    """The salted path must be output-identical to the plain path (and thus
    to DuckDB) for every epoch size, including epochs smaller than typical
    gaps (forcing heavy carry use) and one giant epoch (degenerating to the
    plain layout)."""
    from insurance_pdf_extractor_ray.pipelines.joins import asof_join, asof_join_salted

    left, right = _asof_sides(n=2000, seed=23)
    plain = asof_join(
        ray.data.from_arrow(left).repartition(6),
        ray.data.from_arrow(right).repartition(6),
        by="user_id", on="ts_us", value_col="ts_us", out_col="m",
    ).take_all()
    want = sorted((r["event_id"], r["m"]) for r in plain)

    for epoch in (1_000, 50_000, 10_000_000):
        got = asof_join_salted(
            ray.data.from_arrow(left).repartition(6),
            ray.data.from_arrow(right).repartition(6),
            by="user_id", on="ts_us", value_col="ts_us", out_col="m",
            epoch=epoch,
        ).take_all()
        got = sorted((r["event_id"], r["m"]) for r in got)
        assert got == want, f"epoch={epoch}"


def test_asof_salted_inner_and_no_right():
    from insurance_pdf_extractor_ray.pipelines.joins import asof_join_salted

    left = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                     "t": pa.array([10, 300, 5], pa.int64())})
    right = pa.table({"k": pa.array([1], pa.int64()),
                      "t": pa.array([7], pa.int64())})
    out = asof_join_salted(ray.data.from_arrow(left), ray.data.from_arrow(right),
                           by="k", on="t", value_col="t", out_col="rt",
                           epoch=100, how="inner").take_all()
    # k=1 t=10 matches in-epoch; k=1 t=300 matches via carry (epoch 3 vs 0);
    # k=2 has no right rows at all -> dropped by inner
    assert sorted((r["k"], r["t"], r["rt"]) for r in out) == [(1, 10, 7), (1, 300, 7)]


# ---------------------------------------------------------------------------
# range_join
# ---------------------------------------------------------------------------

def test_range_join_matches_duckdb_between():
    import duckdb
    import numpy as np

    from insurance_pdf_extractor_ray.pipelines.joins import range_join

    rng = np.random.RandomState(5)
    n_p, n_i = 3000, 120
    pts = pa.table({
        "pid": pa.array(np.arange(n_p), pa.int64()),
        "k": pa.array(rng.randint(0, 8, n_p), pa.int64()),
        "t": pa.array(rng.randint(0, 100_000, n_p).astype("int64"), pa.int64()),
    })
    start = rng.randint(0, 95_000, n_i).astype("int64")
    length = rng.randint(100, 20_000, n_i).astype("int64")  # spans many buckets
    ivs = pa.table({
        "iid": pa.array(np.arange(n_i), pa.int64()),
        "k": pa.array(rng.randint(0, 8, n_i), pa.int64()),
        "s": pa.array(start, pa.int64()),
        "e": pa.array(start + length, pa.int64()),
    })
    for epoch in (1_000, 7_919, 1_000_000):
        out = range_join(
            ray.data.from_arrow(pts).repartition(6),
            ray.data.from_arrow(ivs).repartition(4),
            on="t", start_col="s", end_col="e", epoch=epoch, by="k",
            interval_cols=["iid", "s", "e"],
        )
        tbl = pa.concat_tables([t for t in ray.get(out.to_arrow_refs()) if t.num_rows])
        got = sorted(zip(tbl.column("pid").to_pylist(), tbl.column("iid").to_pylist()))

        con = duckdb.connect()
        con.register("p", pts)
        con.register("i", ivs)
        want = sorted(map(tuple, con.execute("""
            SELECT p.pid, i.iid FROM p JOIN i
            ON p.k = i.k AND p.t BETWEEN i.s AND i.e
        """).fetchall()))
        assert got == want, f"epoch={epoch}"


def test_range_join_no_by_key():
    from insurance_pdf_extractor_ray.pipelines.joins import range_join

    pts = pa.table({"pid": pa.array([0, 1], pa.int64()),
                    "t": pa.array([5, 50], pa.int64())})
    ivs = pa.table({"iid": pa.array([10, 11], pa.int64()),
                    "s": pa.array([0, 40], pa.int64()),
                    "e": pa.array([9, 45], pa.int64())})
    out = range_join(ray.data.from_arrow(pts), ray.data.from_arrow(ivs),
                     on="t", start_col="s", end_col="e", epoch=10,
                     interval_cols=["iid"]).take_all()
    assert sorted((r["pid"], r["iid"]) for r in out) == [(0, 10)]


class TestStarAggregate:
    def test_matches_three_way_join_sql(self):
        from insurance_pdf_extractor_ray.pipelines.joins import star_aggregate

        rng = np.random.RandomState(31)
        fact = pa.table({
            "fk": pa.array(rng.randint(0, 40, 4000)),
            "m": pa.array(rng.rand(4000) * 100),
        })
        bridge = pa.table({
            "bk": pa.array(np.arange(40)),
            "mid": pa.array(rng.randint(0, 6, 40)),
        })
        leaf = pa.table({
            "lk": pa.array(np.arange(6)),
            "name": pa.array([f"g{i}" for i in range(6)]),
        })
        out = star_aggregate(
            ray.data.from_arrow(fact).repartition(5), "fk", "m",
            ray.data.from_arrow(bridge), "bk",
            dims=[(ray.data.from_arrow(leaf), "mid", "lk", ["name"])],
            group_by=["name"], num_partitions=4)
        mine = sorted(out.take_all(), key=lambda r: r["name"])
        con = duckdb.connect()
        con.register("f", fact)
        con.register("b", bridge)
        con.register("l", leaf)
        want = con.execute("""
            SELECT name, SUM(m) AS total, COUNT(*) AS n FROM f
            JOIN b ON fk = bk JOIN l ON mid = lk
            GROUP BY name ORDER BY name""").fetchall()
        for mrow, (name, total, n) in zip(mine, want):
            assert mrow["name"] == name
            assert abs(mrow["total"] - total) < 1e-6
            assert mrow["n"] == n


def test_range_join_keyless_many_match():
    from insurance_pdf_extractor_ray.pipelines.joins import range_join

    pts = pa.table({"pid": pa.array([1, 2, 3], pa.int64()),
                    "t": pa.array([5, 15, 95], pa.int64())})
    ivl = pa.table({"iid": pa.array([10, 20], pa.int64()),
                    "s": pa.array([0, 10], pa.int64()),
                    "e": pa.array([20, 100], pa.int64())})
    out = range_join(ray.data.from_arrow(pts).repartition(2),
                     ray.data.from_arrow(ivl), on="t", start_col="s",
                     end_col="e", epoch=10,
                     interval_cols=["iid"]).take_all()
    got = sorted((r["pid"], r["iid"]) for r in out)
    # point 1 in [0,20] only; point 2 in both; point 3 in [10,100] only
    assert got == [(1, 10), (2, 10), (2, 20), (3, 20)]


class TestShuffleAntiJoin:
    def test_matches_not_exists_sql(self):
        from insurance_pdf_extractor_ray.pipelines.joins import shuffle_anti_join

        rng = np.random.RandomState(47)
        left = pa.table({
            "k": pa.array(rng.randint(0, 50, 3000), pa.int64()),
            "v": pa.array(rng.rand(3000)),
        })
        right = pa.table({
            "rk": pa.array(rng.randint(25, 60, 800), pa.int64()),
        })
        out = shuffle_anti_join(
            ray.data.from_arrow(left).repartition(4),
            ray.data.from_arrow(right).repartition(3),
            on="k", right_on="rk", num_partitions=4).take_all()
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        want = con.execute(
            "SELECT k, v FROM l WHERE NOT EXISTS "
            "(SELECT 1 FROM r WHERE rk = k) ORDER BY k, v").fetchall()
        got = sorted((r["k"], r["v"]) for r in out)
        assert got == [(k, v) for k, v in want]

    def test_null_left_keys_kept(self):
        from insurance_pdf_extractor_ray.pipelines.joins import shuffle_anti_join

        left = pa.table({"k": pa.array([1, None, 3], pa.int64()),
                         "v": pa.array([10, 20, 30], pa.int64())})
        right = pa.table({"k": pa.array([1, None], pa.int64())})
        out = shuffle_anti_join(ray.data.from_arrow(left),
                                ray.data.from_arrow(right), on="k",
                                num_partitions=2).take_all()
        assert sorted(r["v"] for r in out) == [20, 30]
