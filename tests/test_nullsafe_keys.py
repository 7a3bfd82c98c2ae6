"""Null-key semantics across the partition-map kernels.

SQL (and Ray's own groupby) put all null keys in ONE group.  The converted
kernels compare adjacent sorted keys via numpy, where a null int64/timestamp
becomes NaN/NaT and ``NaN != NaN`` is True — which would split the null
group into per-row segments.  These tests pin the null-safe behavior
(``dsutil.adjacent_change`` / ``run_starts``) for every affected operator.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")


def _rows(ds):
    return ds.take_all()


class TestAdjacentChange:
    def test_null_runs_and_changes(self):
        from insurance_pdf_extractor_ray.dsutil import adjacent_change, run_starts

        col = pa.array([None, None, 1, 1, None, 2], pa.int64())
        # sorted-column semantics aren't required by the helper; it just
        # compares adjacent values null-safely
        assert adjacent_change(col).tolist() == [False, True, False, True, True]
        assert run_starts(col).tolist() == [True, False, True, False, True, True]

    def test_string_and_float(self):
        from insurance_pdf_extractor_ray.dsutil import adjacent_change

        s = pa.array(["a", "a", None, None, "b"])
        assert adjacent_change(s).tolist() == [False, True, False, True]
        f = pa.array([1.5, 1.5, None, 2.5], pa.float64())
        assert adjacent_change(f).tolist() == [False, True, True]

    def test_empty_and_singleton(self):
        from insurance_pdf_extractor_ray.dsutil import adjacent_change, run_starts

        assert adjacent_change(pa.array([], pa.int64())).tolist() == []
        assert run_starts(pa.array([7], pa.int64())).tolist() == [True]


class TestSessionWindowsNullKey:
    def test_null_key_is_one_group(self):
        from insurance_pdf_extractor_ray.pipelines.windows import session_windows

        # null-key events at t=0,5,100 with gap 10 -> sessions {0,5} and {100}
        t = pa.table({
            "k": pa.array([None, None, None, 1, 1], pa.int64()),
            "ts": pa.array([0, 5_000_000, 100_000_000, 0, 50_000_000],
                           pa.timestamp("us")),
        })
        out = _rows(session_windows(ray.data.from_arrow(t).repartition(2),
                                    "k", "ts", gap_us=10_000_000))
        null_rows = sorted([r for r in out if r["k"] is None],
                           key=lambda r: r["session_id"])
        assert [(r["session_id"], r["n"]) for r in null_rows] == [(0, 2), (1, 1)]
        one_rows = sorted([r for r in out if r["k"] == 1],
                          key=lambda r: r["session_id"])
        assert [(r["session_id"], r["n"]) for r in one_rows] == [(0, 1), (1, 1)]


class TestLagByKeyNullKey:
    def test_lag_within_null_group(self):
        from insurance_pdf_extractor_ray.pipelines.windows import lag_by_key

        t = pa.table({
            "k": pa.array([None, None, 1], pa.int64()),
            "ts": pa.array([1, 2, 1], pa.int64()),
            "v": pa.array([10, 20, 30], pa.int64()),
        })
        out = _rows(lag_by_key(ray.data.from_arrow(t), "k", "ts", "v"))
        by = {(r["k"], r["ts"]): r["lag_value"] for r in out}
        assert by[(None, 1)] is None
        assert by[(None, 2)] == 10          # previous row of the SAME null group
        assert by[(1, 1)] is None


class TestMergeIntervalsNullKey:
    def test_null_key_intervals_merge(self):
        from insurance_pdf_extractor_ray.pipelines.intervals import (
            merge_intervals_by_key)

        t = pa.table({
            "k": pa.array([None, None, 2], pa.int64()),
            "s": pa.array([0, 5, 0], pa.int64()),
            "e": pa.array([10, 20, 3], pa.int64()),
        })
        out = _rows(merge_intervals_by_key(ray.data.from_arrow(t),
                                           "k", "s", "e"))
        null_rows = [r for r in out if r["k"] is None]
        assert len(null_rows) == 1          # [0,10] and [5,20] overlap -> one
        assert (null_rows[0]["s"], null_rows[0]["e"]) == (0, 20)


class TestStataggNullKey:
    def test_entropy_by_key_null_group(self):
        from insurance_pdf_extractor_ray.pipelines.statagg import entropy_by_key

        t = pa.table({
            "k": pa.array([None, None, None, None, 7], pa.int64()),
            "cat": pa.array(["a", "a", "b", "b", "a"]),
        })
        out = _rows(entropy_by_key(ray.data.from_arrow(t), "k", "cat"))
        null_rows = [r for r in out if r["k"] is None]
        assert len(null_rows) == 1
        assert null_rows[0]["n_cats"] == 2
        assert abs(null_rows[0]["entropy"] - 1.0) < 1e-12

    def test_ohlc_by_key_null_group(self):
        from insurance_pdf_extractor_ray.pipelines.statagg import ohlc_by_key

        t = pa.table({
            "k": pa.array([None, None, 3], pa.int64()),
            "ts": pa.array([1, 2, 1], pa.int64()),
            "tie": pa.array([0, 0, 0], pa.int64()),
            "v": pa.array([10.0, 30.0, 5.0], pa.float64()),
        })
        out = _rows(ohlc_by_key(ray.data.from_arrow(t), "k", "ts", "tie", "v"))
        null_rows = [r for r in out if r["k"] is None]
        assert len(null_rows) == 1
        r = null_rows[0]
        assert (r["open"], r["close"], r["n"]) == (10.0, 30.0, 2)


class TestRankaggNullKey:
    def test_grouped_top_k_null_group(self):
        from insurance_pdf_extractor_ray.pipelines.rankagg import grouped_top_k

        t = pa.table({
            "k": pa.array([None, None, None, 5], pa.int64()),
            "v": pa.array([3, 1, 2, 9], pa.int64()),
        })
        out = _rows(grouped_top_k(ray.data.from_arrow(t), "k", ["v"],
                                  k=2, descending=[True]))
        null_vs = sorted(r["v"] for r in out if r["k"] is None)
        assert null_vs == [2, 3]            # top-2 of the ONE null group

    def test_dense_rank_null_group(self):
        from insurance_pdf_extractor_ray.pipelines.rankagg import dense_rank_by

        t = pa.table({
            "k": pa.array([None, None, None], pa.int64()),
            "v": pa.array([10, 20, 20], pa.int64()),
        })
        out = _rows(dense_rank_by(ray.data.from_arrow(t), "k", "v",
                                  descending=False))
        ranks = {r["v"]: r["drank"] for r in out}
        assert ranks == {10: 1, 20: 2}      # one group -> ranks 1,2 (not all 1)


class TestBucketedSegmentsNullBucket:
    def test_null_bucket_forms_one_segment(self, ray_session):
        from insurance_pdf_extractor_ray.dsutil import bucketed_segments_map

        t = pa.table({
            "b": pa.array([None, None, 1, 2], pa.int64()),
            "v": pa.array([1, 2, 3, 4], pa.int64()),
        })
        empty = pa.table({"b": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})

        def per_bucket(seg: pa.Table) -> pa.Table:
            return pa.table({"b": seg.column("b").slice(0, 1),
                             "n": pa.array([seg.num_rows], pa.int64())})

        out = _rows(bucketed_segments_map(
            ray.data.from_arrow(t), "b", per_bucket, empty, min_rows=2))
        # the two null-bucket rows form ONE surviving segment; 1 and 2 are
        # singletons and are dropped
        assert len(out) == 1
        assert out[0]["b"] is None and out[0]["n"] == 2


class TestAsofFloatOn:
    def test_float_on_not_truncated(self):
        """Fractional on-values: 1.7 must match the right row at 1.5, not be
        truncated to 1 (which would also match a right row at exactly 1.0
        under 'nearest' distance arithmetic)."""
        import duckdb

        from insurance_pdf_extractor_ray.pipelines.joins import asof_join

        left = pa.table({
            "k": pa.array([1, 1, 1, 1], pa.int64()),
            "t": pa.array([0.4, 1.7, 2.49, 2.51], pa.float64()),
        })
        right = pa.table({
            "k": pa.array([1, 1, 1], pa.int64()),
            "t": pa.array([0.5, 1.5, 3.5], pa.float64()),
            "rv": pa.array([5, 15, 35], pa.int64()),
        })
        for direction, sql in [
            ("backward", "SELECT l.k, l.t, (SELECT r.rv FROM r WHERE r.k=l.k "
                         "AND r.t <= l.t ORDER BY r.t DESC LIMIT 1) FROM l"),
            ("forward", "SELECT l.k, l.t, (SELECT r.rv FROM r WHERE r.k=l.k "
                        "AND r.t >= l.t ORDER BY r.t LIMIT 1) FROM l"),
            ("nearest", "SELECT l.k, l.t, (SELECT r.rv FROM r WHERE r.k=l.k "
                        "ORDER BY abs(r.t-l.t), (r.t > l.t) LIMIT 1) FROM l"),
        ]:
            out = asof_join(ray.data.from_arrow(left),
                            ray.data.from_arrow(right), "k", "t", "rv",
                            direction=direction)
            got = {(r["k"], r["t"]): r["right_rv"] for r in out.take_all()}
            con = duckdb.connect()
            con.register("l", left)
            con.register("r", right)
            want = {(k, t): v for k, t, v in con.execute(sql).fetchall()}
            con.close()
            assert got == want, direction

    def test_null_by_key_is_one_group(self):
        from insurance_pdf_extractor_ray.pipelines.joins import asof_join

        left = pa.table({
            "k": pa.array([None, None], pa.int64()),
            "t": pa.array([10, 1], pa.int64()),
        })
        right = pa.table({
            "k": pa.array([None], pa.int64()),
            "t": pa.array([5], pa.int64()),
            "rv": pa.array([50], pa.int64()),
        })
        out = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                        "k", "t", "rv", direction="backward")
        got = {r["t"]: r["right_rv"] for r in out.take_all()}
        assert got == {10: 50, 1: None}


class TestDistinctRowsTiebreak:
    def test_survivor_deterministic_with_tiebreak(self):
        from insurance_pdf_extractor_ray.dsutil import distinct_rows_by

        t = pa.table({
            "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "v": pa.array([30, 10, 20, 5, 4], pa.int64()),
        })
        out = _rows(distinct_rows_by(
            ray.data.from_arrow(t).repartition(3), "k", tiebreak_cols="v"))
        got = {r["k"]: r["v"] for r in out}
        assert got == {1: 10, 2: 4}         # min v survives per key


class TestBehaviorNullKey:
    def test_transition_counts_null_key(self):
        from insurance_pdf_extractor_ray.pipelines.behavior import (
            transition_counts)

        t = pa.table({
            "k": pa.array([None, None, 9], pa.int64()),
            "ts": pa.array([1, 2, 1], pa.int64()),
            "item": pa.array(["a", "b", "c"]),
        })
        out = _rows(transition_counts(ray.data.from_arrow(t), "k", "item",
                                      "ts"))
        got = {(r["from_item"], r["to_item"]): r["n"] for r in out}
        assert got == {("a", "b"): 1}       # the null-key run yields a->b


class TestAdjacentChangeProperty:
    def test_matches_python_reference_on_random_nullable_ints(self):
        """Property: adjacent_change == elementwise null-safe != over
        random nullable int columns (hypothesis-style sweep, fixed seeds)."""
        import numpy as np

        from insurance_pdf_extractor_ray.dsutil import adjacent_change

        rng = np.random.default_rng(7)
        for trial in range(50):
            n = int(rng.integers(0, 40))
            vals = [None if rng.random() < 0.3 else int(rng.integers(0, 5))
                    for _ in range(n)]
            col = pa.array(vals, pa.int64())
            got = adjacent_change(col).tolist()
            want = [vals[i + 1] != vals[i] for i in range(max(n - 1, 0))]
            assert got == want, (trial, vals)

    def test_matches_python_reference_on_random_nullable_strings(self):
        import numpy as np

        from insurance_pdf_extractor_ray.dsutil import adjacent_change

        rng = np.random.default_rng(11)
        pool = ["a", "b", "", "longer-string"]
        for trial in range(50):
            n = int(rng.integers(0, 40))
            vals = [None if rng.random() < 0.3
                    else pool[int(rng.integers(0, len(pool)))]
                    for _ in range(n)]
            col = pa.array(vals, pa.string())
            got = adjacent_change(col).tolist()
            want = [vals[i + 1] != vals[i] for i in range(max(n - 1, 0))]
            assert got == want, (trial, vals)

    def test_timestamp_nulls(self):
        from insurance_pdf_extractor_ray.dsutil import adjacent_change

        col = pa.array([0, None, None, 5], pa.timestamp("us"))
        assert adjacent_change(col).tolist() == [True, False, True]
