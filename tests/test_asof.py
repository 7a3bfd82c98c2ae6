"""asof_join direction variants (backward/forward/nearest) vs DuckDB."""

import pyarrow as pa
import pytest
import ray
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")

class TestAsofDirections:
    def _data(self):
        left = pa.table({
            "k": pa.array([1, 1, 1, 2, 2], pa.int64()),
            "t": pa.array([10, 25, 40, 5, 100], pa.int64()),
        })
        right = pa.table({
            "k": pa.array([1, 1, 1, 2], pa.int64()),
            "t": pa.array([8, 30, 31, 50], pa.int64()),
            "rv": pa.array([80, 300, 310, 500], pa.int64()),
        })
        return left, right

    def _run(self, direction):
        from insurance_pdf_extractor_ray.pipelines.joins import asof_join

        left, right = self._data()
        out = asof_join(ray.data.from_arrow(left).repartition(2),
                        ray.data.from_arrow(right), "k", "t", "rv",
                        direction=direction)
        return {(r["k"], r["t"]): r["right_rv"] for r in out.take_all()}

    def test_forward_matches_duckdb(self):
        import duckdb

        left, right = self._data()
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        want = {(k, t): v for k, t, v in con.execute("""
            SELECT l.k, l.t,
                   (SELECT r.rv FROM r WHERE r.k = l.k AND r.t >= l.t
                    ORDER BY r.t LIMIT 1) AS rv
            FROM l""").fetchall()}
        assert self._run("forward") == want

    def test_nearest_matches_duckdb(self):
        import duckdb

        left, right = self._data()
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        # nearest by |dt|, backward wins ties (dt <= 0 first)
        want = {(k, t): v for k, t, v in con.execute("""
            SELECT l.k, l.t,
                   (SELECT r.rv FROM r WHERE r.k = l.k
                    ORDER BY abs(r.t - l.t), (r.t > l.t), r.t
                    LIMIT 1) AS rv
            FROM l""").fetchall()}
        assert self._run("nearest") == want

    def test_backward_unchanged(self):
        got = self._run("backward")
        assert got == {(1, 10): 80, (1, 25): 80, (1, 40): 310,
                       (2, 5): None, (2, 100): 500}
