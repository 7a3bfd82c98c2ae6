"""Column profiling vs DuckDB."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.profile import profile_columns

pytestmark = pytest.mark.usefixtures("ray_session")


def _tbl():
    rng = np.random.RandomState(4)
    n = 4000
    vals = rng.exponential(10, n)
    vals[rng.rand(n) < 0.1] = np.nan
    return pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "cat": pa.array(rng.choice(["a", "b", "c", None], n), pa.string()),
        "v": pa.array([None if np.isnan(x) else float(x) for x in vals],
                      pa.float64()),
    })


def test_profile_counts_match_duckdb():
    tbl = _tbl()
    out = profile_columns(ray.data.from_arrow(tbl).repartition(8))
    rows = {r["column"]: r for r in out.to_pylist()}

    con = duckdb.connect()
    con.register("t", tbl)
    for c in ("id", "cat", "v"):
        n, nn, nd = con.execute(
            f"SELECT COUNT(*), COUNT({c}), COUNT(DISTINCT {c}) FROM t").fetchone()
        assert rows[c]["n"] == n
        assert rows[c]["n_null"] == n - nn
        assert rows[c]["n_distinct"] == nd

    # numeric min/max/mean on 'id'
    assert rows["id"]["min_str"] == "0"
    assert rows["id"]["max_str"] == "3999"
    assert rows["id"]["mean_num"] == pytest.approx(3999 / 2)
    # string length stats present for 'cat'
    assert rows["cat"]["avg_len"] == pytest.approx(1.0)


def test_profile_skip_distinct():
    tbl = _tbl()
    out = profile_columns(ray.data.from_arrow(tbl), columns=["id"], distinct=False)
    r = out.to_pylist()[0]
    assert r["n_distinct"] is None
    assert r["n"] == 4000


def test_quality_audit_counts_per_rule():
    import pyarrow.compute as _pc

    from insurance_pdf_extractor_ray.pipelines.profile import quality_audit

    tbl = pa.table({
        "text": pa.array(["ok", "", None, "fine"], pa.string()),
        "n": pa.array([2, 0, 5, 99], pa.int64()),
    })
    rules = [
        ("empty", lambda b: _pc.or_kleene(_pc.is_null(b.column("text")),
                                          _pc.equal(b.column("text"), ""))),
        ("big_n", lambda b: _pc.greater(b.column("n"), 10)),
    ]
    out = quality_audit(ray.data.from_arrow(tbl).repartition(2), rules)
    got = {r["rule"]: (r["violations"], r["total"])
           for r in out.to_pylist()}
    assert got == {"empty": (2, 4), "big_n": (1, 4)}
