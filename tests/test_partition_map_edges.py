"""Edge hardening for the dsutil partition-map primitives (session 8+):
empty inputs, single rows, all-one-key, and null keys through every
converted operator family.  Guards the ADVICE-r2 failure class (empty /
zero-column blocks poisoning downstream consumers)."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from insurance_pdf_extractor_ray.dsutil import (
    bucketed_segments_map,
    count_by,
    distinct_rows_by,
    keyed_partition_map,
    sum_by,
)


def _ds(tbl: pa.Table, n_blocks: int = 2) -> ray.data.Dataset:
    return ray.data.from_arrow(tbl).repartition(n_blocks)


EVENTS = pa.table({
    "k": pa.array([1, 1, 2, 2, 2, 3], pa.int64()),
    "ts": pa.array([10, 20, 5, 5, 30, 7], pa.int64()),
    "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0], pa.float64()),
})

EMPTY = EVENTS.slice(0, 0)


class TestKeyedPartitionMapEdges:
    def test_single_row(self):
        out = keyed_partition_map(
            _ds(EVENTS.slice(0, 1), 1), "k", lambda t: t).take_all()
        assert len(out) == 1 and out[0]["k"] == 1

    def test_all_one_key(self):
        one = pa.table({"k": pa.array([7] * 5, pa.int64()),
                        "ts": pa.array(range(5), pa.int64()),
                        "v": pa.array([0.0] * 5, pa.float64())})
        out = keyed_partition_map(_ds(one), "k", lambda t: t).take_all()
        assert len(out) == 5

    def test_null_keys_one_partition(self):
        t = pa.table({"k": pa.array([None, None, 1], pa.int64()),
                      "ts": pa.array([1, 2, 3], pa.int64()),
                      "v": pa.array([1.0, 2.0, 3.0], pa.float64())})
        seen = keyed_partition_map(
            _ds(t), "k",
            lambda part: pa.table(
                {"n": pa.array([part.num_rows], pa.int64()),
                 "nulls": pa.array(
                     [part.column("k").null_count], pa.int64())})).take_all()
        # both null rows landed in ONE partition call
        assert sorted(r["nulls"] for r in seen if r["nulls"]) == [2]

    def test_string_keys(self):
        t = pa.table({"k": pa.array(["a", "b", "a"]),
                      "v": pa.array([1, 2, 3], pa.int64())})
        out = distinct_rows_by(_ds(t), "k").take_all()
        assert sorted(r["k"] for r in out) == ["a", "b"]


class TestAggHelpers:
    def test_count_by_matches_arrow(self):
        out = {(r["k"],): r["n"] for r in count_by(_ds(EVENTS), "k").take_all()}
        assert out == {(1,): 2, (2,): 3, (3,): 1}

    def test_count_by_composite(self):
        out = count_by(_ds(EVENTS), ["k", "ts"]).take_all()
        assert {(r["k"], r["ts"]): r["n"] for r in out}[(2, 5)] == 2

    def test_sum_by_int_exact(self):
        t = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                      "x": pa.array([10, 20, 30], pa.int64())})
        out = {r["k"]: r["s"] for r in sum_by(_ds(t), "k", "x").take_all()}
        assert out == {1: 30, 2: 30}

    def test_distinct_rows_by_null_key_kept_once(self):
        t = pa.table({"k": pa.array([None, None, 5], pa.int64()),
                      "x": pa.array([1, 1, 2], pa.int64())})
        out = distinct_rows_by(_ds(t), ["k", "x"]).take_all()
        assert len(out) == 2  # (null,1) kept once, (5,2)


class TestBucketedSegmentsEdges:
    def test_all_singletons_yields_empty_out(self):
        t = pa.table({"b": pa.array([1, 2, 3], pa.int64()),
                      "x": pa.array([1, 2, 3], pa.int64())})
        empty = pa.table({"x": pa.array([], pa.int64())})
        out = bucketed_segments_map(
            _ds(t), "b", lambda g: g.select(["x"]), empty_out=empty,
            min_rows=2).take_all()
        assert out == []

    def test_min_rows_one_processes_all(self):
        t = pa.table({"b": pa.array([1, 2, 2], pa.int64()),
                      "x": pa.array([1, 2, 3], pa.int64())})
        empty = pa.table({"n": pa.array([], pa.int64())})
        out = bucketed_segments_map(
            _ds(t), "b",
            lambda g: pa.table({"n": pa.array([g.num_rows], pa.int64())}),
            empty_out=empty, min_rows=1).take_all()
        assert sorted(r["n"] for r in out) == [1, 2]


class TestConvertedOperatorsDegenerate:
    """Converted operators on empty / tiny inputs must not crash and must
    keep typed schemas downstream."""

    def test_merge_intervals_single_row(self):
        from insurance_pdf_extractor_ray.pipelines.intervals import (
            merge_intervals_by_key,
        )

        t = pa.table({"k": pa.array([1], pa.int64()),
                      "s": pa.array([5], pa.int64()),
                      "e": pa.array([9], pa.int64())})
        out = merge_intervals_by_key(_ds(t, 1), "k", "s", "e").take_all()
        assert out == [{"k": 1, "s": 5, "e": 9, "n_rows": 1}]

    def test_session_windows_ties_and_singletons(self):
        from insurance_pdf_extractor_ray.pipelines.windows import (
            session_windows,
        )

        t = pa.table({"k": pa.array([1, 1, 2], pa.int64()),
                      "ts": pa.array([100, 100, 7], pa.int64())})
        out = session_windows(_ds(t), "k", "ts", gap_us=10).take_all()
        by_k = {r["k"]: r for r in out}
        assert by_k[1]["n"] == 2 and by_k[1]["session_id"] == 0
        assert by_k[2]["n"] == 1

    def test_grouped_top_k_k_larger_than_group(self):
        from insurance_pdf_extractor_ray.pipelines.rankagg import (
            grouped_top_k,
        )

        out = grouped_top_k(_ds(EVENTS), "k", ["ts"], [True], k=10).take_all()
        assert len(out) == EVENTS.num_rows

    def test_asof_join_empty_right(self):
        from insurance_pdf_extractor_ray.pipelines.joins import asof_join

        left = _ds(pa.table({"k": pa.array([1, 2], pa.int64()),
                             "on": pa.array([5, 6], pa.int64())}), 1)
        # no repartition: Ray drops the schema of a repartitioned empty
        # dataset, and a schemaless side is rejected with a clear error
        right = ray.data.from_arrow(
            pa.table({"k": pa.array([], pa.int64()),
                      "on": pa.array([], pa.int64())}))
        out = asof_join(left, right, by="k", on="on",
                        value_col="on").take_all()
        assert len(out) == 2 and all(r["right_on"] is None for r in out)

    def test_asof_join_nearest_tie_prefers_backward(self):
        from insurance_pdf_extractor_ray.pipelines.joins import asof_join

        left = _ds(pa.table({"k": pa.array([1], pa.int64()),
                             "on": pa.array([10], pa.int64())}), 1)
        right = _ds(pa.table({"k": pa.array([1, 1], pa.int64()),
                              "on": pa.array([8, 12], pa.int64())}), 1)
        out = asof_join(left, right, by="k", on="on", value_col="on",
                        direction="nearest").take_all()
        assert out[0]["right_on"] == 8  # distance 2 both ways -> backward

    def test_funnel_counts_no_matching_events(self):
        from insurance_pdf_extractor_ray.pipelines.behavior import (
            funnel_counts,
        )

        t = pa.table({"u": pa.array([1, 2], pa.int64()),
                      "ts": pa.array([1, 2], pa.int64()),
                      "et": pa.array(["x", "y"])})
        out = funnel_counts(_ds(t), "u", "ts", "et", ["view", "click"])
        assert out.column("n_users").to_pylist() == [0, 0]

    def test_entropy_by_key_single_category(self):
        from insurance_pdf_extractor_ray.pipelines.statagg import (
            entropy_by_key,
        )

        t = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                      "c": pa.array(["a", "a", "a"])})
        out = entropy_by_key(_ds(t), "k", "c").take_all()
        assert out[0]["entropy"] == 0.0 and out[0]["n_cats"] == 1

    def test_expanding_float_left_to_right(self):
        from insurance_pdf_extractor_ray.pipelines.windows import (
            expanding_by_key,
        )

        vals = [0.1, 0.2, 0.3, 0.4]
        t = pa.table({"k": pa.array([1] * 4, pa.int64()),
                      "ts": pa.array(range(4), pa.int64()),
                      "v": pa.array(vals, pa.float64())})
        out = sorted(expanding_by_key(_ds(t, 1), "k", "ts", "v").take_all(),
                     key=lambda r: r["ts"])
        expect = np.cumsum(np.array(vals))  # strict left-to-right
        got = [r["cum_sum"] for r in out]
        assert got == list(expect)
