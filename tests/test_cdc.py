"""CDC apply_changes vs DuckDB MERGE-equivalent SQL."""

import duckdb
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.cdc import apply_changes

pytestmark = pytest.mark.usefixtures("ray_session")

BASE = pa.table({
    "k": pa.array([1, 2, 3, 4], pa.int64()),
    "bal": pa.array([10.0, 20.0, 30.0, 40.0], pa.float64()),
    "name": pa.array(["a", "b", "c", "d"], pa.string()),
})
# k=1 updated twice (latest wins), k=2 deleted, k=3 untouched,
# k=4 deleted then re-upserted, k=9 inserted
CHG = pa.table({
    "k": pa.array([1, 1, 2, 4, 4, 9], pa.int64()),
    "ts": pa.array([1, 5, 2, 1, 6, 3], pa.int64()),
    "op": pa.array(["upsert", "upsert", "delete", "delete", "upsert",
                    "upsert"], pa.string()),
    "v": pa.array([11.0, 12.0, 0.0, 0.0, 44.0, 99.0], pa.float64()),
})


def _apply():
    out = apply_changes(
        ray.data.from_arrow(BASE).repartition(2),
        ray.data.from_arrow(CHG).repartition(3),
        "k", "k", order_by=["ts"], op_col="op",
        payload_map={"v": "bal"}, delete_op="delete")
    return sorted(((r["k"], r["bal"], r["name"]) for r in out.take_all()))


def test_upsert_delete_insert_passthrough():
    assert _apply() == [
        (1, 12.0, "a"),   # latest upsert wins
        (3, 30.0, "c"),   # untouched
        (4, 44.0, "d"),   # delete then later upsert -> upsert wins
        (9, 99.0, None),  # insert: unmapped base cols null
    ]


def test_matches_duckdb_merge_sql():
    con = duckdb.connect()
    con.register("base", BASE)
    con.register("chg", CHG)
    want = sorted(tuple(r) for r in con.execute("""
        WITH latest AS (
          SELECT k, op, v FROM (
            SELECT k, op, v, row_number() OVER (PARTITION BY k
              ORDER BY ts DESC) AS rn FROM chg) WHERE rn = 1)
        SELECT COALESCE(b.k, l.k),
               CASE WHEN l.k IS NOT NULL THEN l.v ELSE b.bal END,
               b.name
        FROM base b FULL OUTER JOIN latest l ON b.k = l.k
        WHERE l.op IS DISTINCT FROM 'delete'
    """).fetchall())
    assert _apply() == want


# --- bucketed apply (zero base exchange) ------------------------------------


class TestApplyChangesBucketed:
    def _bucketed_apply(self, tmp_path, n_buckets=5):
        from insurance_pdf_extractor_ray.pipelines.bucketed import write_bucketed
        from insurance_pdf_extractor_ray.pipelines.cdc import (
            apply_changes_bucketed,
        )

        base_path = str(tmp_path / "base")
        write_bucketed(ray.data.from_arrow(BASE).repartition(2),
                       base_path, "k", n_buckets)
        out = apply_changes_bucketed(
            base_path, ray.data.from_arrow(CHG).repartition(3), "k",
            order_by=["ts"], op_col="op", payload_map={"v": "bal"},
            delete_op="delete", chg_path=str(tmp_path / "chg"))
        return sorted(((r["k"], r["bal"], r["name"])
                       for r in out.take_all()))

    def test_matches_shuffle_path(self, tmp_path, ray_session):
        # identical semantics to apply_changes, incl. empty buckets
        # (5 buckets over 4 base keys guarantees at least one empty one)
        assert self._bucketed_apply(tmp_path) == _apply()

    def test_no_change_buckets_pass_through(self, tmp_path, ray_session):
        from insurance_pdf_extractor_ray.pipelines.bucketed import write_bucketed
        from insurance_pdf_extractor_ray.pipelines.cdc import (
            apply_changes_bucketed,
        )

        base_path = str(tmp_path / "b2")
        write_bucketed(ray.data.from_arrow(BASE), base_path, "k", 3)
        # a change log touching NO base bucket's keys: pure inserts
        chg = pa.table({
            "k": pa.array([100], pa.int64()),
            "ts": pa.array([1], pa.int64()),
            "op": pa.array(["upsert"], pa.string()),
            "v": pa.array([7.0], pa.float64()),
        })
        out = apply_changes_bucketed(
            base_path, ray.data.from_arrow(chg), "k", order_by=["ts"],
            op_col="op", payload_map={"v": "bal"}, delete_op="delete",
            chg_path=str(tmp_path / "c2"))
        got = sorted((r["k"], r["bal"]) for r in out.take_all())
        assert got == [(1, 10.0), (2, 20.0), (3, 30.0), (4, 40.0),
                       (100, 7.0)]

    def test_string_keys(self, tmp_path, ray_session):
        from insurance_pdf_extractor_ray.pipelines.bucketed import write_bucketed
        from insurance_pdf_extractor_ray.pipelines.cdc import (
            apply_changes, apply_changes_bucketed,
        )

        base = pa.table({
            "k": pa.array(["x", "y", "z"], pa.string()),
            "bal": pa.array([1.0, 2.0, 3.0], pa.float64()),
        })
        chg = pa.table({
            "k": pa.array(["y", "w", "z", "z"], pa.string()),
            "ts": pa.array([1, 1, 1, 2], pa.int64()),
            "op": pa.array(["upsert", "upsert", "upsert", "delete"],
                           pa.string()),
            "v": pa.array([22.0, 44.0, 33.0, 0.0], pa.float64()),
        })
        base_path = str(tmp_path / "b3")
        write_bucketed(ray.data.from_arrow(base), base_path, "k", 4)
        out = apply_changes_bucketed(
            base_path, ray.data.from_arrow(chg), "k", order_by=["ts"],
            op_col="op", payload_map={"v": "bal"}, delete_op="delete",
            chg_path=str(tmp_path / "c3"))
        got = sorted((r["k"], r["bal"]) for r in out.take_all())
        want_ds = apply_changes(
            ray.data.from_arrow(base), ray.data.from_arrow(chg), "k", "k",
            order_by=["ts"], op_col="op", payload_map={"v": "bal"},
            delete_op="delete")
        want = sorted((r["k"], r["bal"]) for r in want_ds.take_all())
        assert got == want == [("w", 44.0), ("x", 1.0), ("y", 22.0)]


# --- SCD type-2 intervals ---------------------------------------------------

from insurance_pdf_extractor_ray.pipelines.cdc import scd2_intervals  # noqa: E402

SCD_LOG = pa.table({
    "k": pa.array([1, 1, 1, 1, 2, 2, 3], pa.int64()),
    "ts": pa.array([10, 20, 30, 40, 5, 6, 7], pa.int64()),
    "seq": pa.array([1, 2, 3, 4, 1, 2, 1], pa.int64()),
    # k=1: a, a (collapse), b, a  -> three intervals
    # k=2: x, x (collapse)        -> one open interval
    # k=3: single row             -> one open interval
    "state": pa.array(["a", "a", "b", "a", "x", "x", "y"], pa.string()),
})


def _scd2(tbl=SCD_LOG):
    out = scd2_intervals(ray.data.from_arrow(tbl).repartition(3),
                         "k", "ts", ["state"], order_tiebreak="seq")
    return sorted(((r["k"], r["state"], r["valid_from"], r["valid_to"])
                   for r in out.take_all()),
                  key=lambda t: (t[0], t[2]))


def test_scd2_collapses_runs_and_chains_intervals():
    assert _scd2() == [
        (1, "a", 10, 30),   # run of two 'a' collapsed; closed by 'b'
        (1, "b", 30, 40),
        (1, "a", 40, None), # back to 'a' = NEW interval (not merged)
        (2, "x", 5, None),
        (3, "y", 7, None),
    ]


def test_scd2_matches_duckdb_lag_lead():
    con = duckdb.connect()
    con.register("log", SCD_LOG)
    want = sorted((tuple(r) for r in con.execute("""
        WITH o AS (
          SELECT k, ts, seq, state,
                 LAG(state) OVER (PARTITION BY k ORDER BY ts, seq) AS prev
          FROM log),
        c AS (SELECT k, ts, seq, state FROM o
              WHERE prev IS NULL OR state <> prev)
        SELECT k, state, ts,
               LEAD(ts) OVER (PARTITION BY k ORDER BY ts, seq)
        FROM c
    """).fetchall()), key=lambda t: (t[0], t[2]))
    assert _scd2() == want


def test_scd2_null_payload_is_distinct_from_semantics():
    tbl = pa.table({
        "k": pa.array([1, 1, 1, 1], pa.int64()),
        "ts": pa.array([1, 2, 3, 4], pa.int64()),
        "seq": pa.array([1, 2, 3, 4], pa.int64()),
        "state": pa.array(["a", None, None, "a"], pa.string()),
    })
    # a -> null (change), null -> null (collapse), null -> a (change)
    assert _scd2(tbl) == [
        (1, "a", 1, 2),
        (1, None, 2, 4),
        (1, "a", 4, None),
    ]


class TestSnapshotDiff:
    def test_classify_and_dropout(self, ray_session):
        import duckdb

        from insurance_pdf_extractor_ray.pipelines.cdc import snapshot_diff

        old = pa.table({
            "k": pa.array([1, 2, 3, 4, 5], pa.int64()),
            "s": pa.array(["a", "b", None, "d", "e"], pa.string()),
            "v": pa.array([10, 20, 30, None, 50], pa.int64()),
        })
        new = pa.table({
            "k": pa.array([2, 3, 4, 5, 6], pa.int64()),
            "s": pa.array(["B", None, "d", "e", "f"], pa.string()),
            "v": pa.array([20, 30, None, 50, 60], pa.int64()),
        })
        out = snapshot_diff(ray.data.from_arrow(old).repartition(2),
                            ray.data.from_arrow(new).repartition(3),
                            "k", ["s", "v"], num_partitions=2)
        got = sorted((r["k"], r["change"], r["old_s"], r["new_s"],
                      r["old_v"], r["new_v"]) for r in out.take_all())
        # k=1 delete, k=2 update (s changed), k=3/4/5 identical (null-safe)
        # drop out, k=6 insert
        assert got == [
            (1, "delete", "a", None, 10, None),
            (2, "update", "b", "B", 20, 20),
            (6, "insert", None, "f", None, 60),
        ]
        con = duckdb.connect()
        con.register("o", old)
        con.register("n", new)
        want = sorted(tuple(r) for r in con.execute("""
            SELECT coalesce(o.k, n.k) AS k,
                   CASE WHEN o.k IS NULL THEN 'insert'
                        WHEN n.k IS NULL THEN 'delete'
                        ELSE 'update' END AS change,
                   o.s, n.s, o.v, n.v
            FROM o FULL OUTER JOIN n ON o.k = n.k
            WHERE NOT (o.k IS NOT NULL AND n.k IS NOT NULL
                       AND o.s IS NOT DISTINCT FROM n.s
                       AND o.v IS NOT DISTINCT FROM n.v)
        """).fetchall())
        assert got == want


class TestMergeAggregateBucketed:
    def _partials(self, rows):
        import pyarrow as pa
        import ray.data

        return ray.data.from_arrow(pa.table({
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "n": pa.array([r[1] for r in rows], pa.int64()),
            "s": pa.array([r[2] for r in rows], pa.int64()),
        })).repartition(2)

    def _view(self, tmp_path, rows, n_buckets=4):
        from insurance_pdf_extractor_ray.pipelines.bucketed import (
            write_bucketed,
        )

        return write_bucketed(self._partials(rows), str(tmp_path / "view"),
                              "k", n_buckets)

    def test_adds_inserts_and_passthrough(self, tmp_path):
        from insurance_pdf_extractor_ray.pipelines.cdc import (
            merge_aggregate_bucketed,
        )

        view = self._view(tmp_path, [(1, 2, 10), (2, 1, 5), (3, 4, 40)])
        inc = self._partials([(1, 1, 7), (1, 1, 3), (9, 1, 100)])
        out = merge_aggregate_bucketed(view, inc, "k", ["n", "s"])
        got = {r["k"]: (r["n"], r["s"]) for r in out.take_all()}
        assert got == {1: (4, 20),      # 2+1+1 / 10+7+3
                       2: (1, 5),       # untouched passthrough
                       3: (4, 40),      # untouched passthrough
                       9: (1, 100)}     # brand-new key inserts

    def test_equals_full_recompute_over_increments(self, tmp_path):
        import numpy as np

        from insurance_pdf_extractor_ray.pipelines.bucketed import (
            write_bucketed,
        )
        from insurance_pdf_extractor_ray.pipelines.cdc import (
            merge_aggregate_bucketed,
        )

        rng = np.random.RandomState(11)
        all_rows = [(int(k), 1, int(v)) for k, v in
                    zip(rng.randint(0, 40, 300), rng.randint(0, 1000, 300))]
        base, inc1, inc2 = all_rows[:100], all_rows[100:200], all_rows[200:]
        view = self._view(tmp_path, base, n_buckets=5)
        mid = merge_aggregate_bucketed(view, self._partials(inc1),
                                       "k", ["n", "s"])
        view2 = write_bucketed(mid, str(tmp_path / "view2"), "k", 5)
        out = merge_aggregate_bucketed(view2, self._partials(inc2),
                                       "k", ["n", "s"])
        got = {r["k"]: (r["n"], r["s"]) for r in out.take_all()}
        want: dict = {}
        for k, n, s in all_rows:
            a, b = want.get(k, (0, 0))
            want[k] = (a + n, b + s)
        assert got == want

    def test_empty_increment_is_identity(self, tmp_path):
        from insurance_pdf_extractor_ray.pipelines.cdc import (
            merge_aggregate_bucketed,
        )

        view = self._view(tmp_path, [(1, 2, 10), (7, 1, 5)])
        out = merge_aggregate_bucketed(view, self._partials([]),
                                       "k", ["n", "s"])
        got = {r["k"]: (r["n"], r["s"]) for r in out.take_all()}
        assert got == {1: (2, 10), 7: (1, 5)}
