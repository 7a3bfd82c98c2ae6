"""statagg / fuzzy / bagops / fixed-k sampling vs DuckDB on synthetic data."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.bagops import except_all, salted_sum
from insurance_pdf_extractor_ray.pipelines.fuzzy import _lev_le1, fuzzy_pairs
from insurance_pdf_extractor_ray.pipelines.sampling import stratified_fixed_k
from insurance_pdf_extractor_ray.pipelines.statagg import (
    corr_by_key,
    median_by_key,
    string_agg_by_key,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _tbl(n=4000, seed=11):
    rng = np.random.RandomState(seed)
    x = rng.normal(10.0, 3.0, n)
    return pa.table({
        "id": pa.array(np.arange(n), pa.int64()),
        "k": pa.array(rng.choice(["a", "b", "c"], n), pa.string()),
        "x": pa.array(x, pa.float64()),
        # y correlated with x per construction
        "y": pa.array(0.5 * x + rng.normal(0, 1.0, n), pa.float64()),
    })


@pytest.fixture(scope="module")
def tbl():
    return _tbl()


@pytest.fixture(scope="module")
def con(tbl):
    c = duckdb.connect()
    c.register("t", tbl)
    return c


def _sorted_df(x) -> pd.DataFrame:
    if isinstance(x, ray.data.Dataset):
        x = x.to_pandas()
    elif isinstance(x, pa.Table):
        x = x.to_pandas()
    return x[sorted(x.columns)].sort_values(
        sorted(x.columns), kind="mergesort").reset_index(drop=True)


def test_corr_by_key_matches_duckdb(tbl, con):
    mine = corr_by_key(ray.data.from_arrow(tbl), "k", "x", "y")
    want = con.execute("""
        SELECT k, corr(x, y) AS corr, covar_samp(x, y) AS covar_samp
        FROM t GROUP BY 1""").fetchdf()
    pd.testing.assert_frame_equal(_sorted_df(mine), _sorted_df(want),
                                  check_dtype=False, rtol=1e-9)


def test_corr_degenerate_group():
    # constant x in one group -> zero variance -> NaN corr, covar 0
    t = pa.table({"k": ["g", "g", "g"], "x": [1.0, 1.0, 1.0],
                  "y": [1.0, 2.0, 3.0]})
    out = corr_by_key(ray.data.from_arrow(t), "k", "x", "y").to_pandas()
    assert np.isnan(out["corr"].iloc[0])
    assert out["covar_samp"].iloc[0] == pytest.approx(0.0)


def test_median_by_key_continuous(tbl, con):
    mine = median_by_key(ray.data.from_arrow(tbl), "k", "x", out_col="med")
    want = con.execute(
        "SELECT k, median(x) AS med FROM t GROUP BY 1").fetchdf()
    pd.testing.assert_frame_equal(_sorted_df(mine), _sorted_df(want),
                                  check_dtype=False, rtol=1e-12)


def test_median_odd_even_groups():
    # odd group -> middle element; even group -> average of the two middles
    t = pa.table({"k": ["o"] * 3 + ["e"] * 4,
                  "v": [3.0, 1.0, 2.0, 40.0, 10.0, 20.0, 30.0]})
    out = median_by_key(ray.data.from_arrow(t), "k", "v").to_pandas()
    got = dict(zip(out["k"], out["median"]))
    assert got == {"o": 2.0, "e": 25.0}


def test_string_agg_by_key_ordered(tbl, con):
    ds = ray.data.from_arrow(tbl)
    mine = string_agg_by_key(ds, "k", "id", ["id"], sep="|", out_col="s")
    want = con.execute("""
        SELECT k, string_agg(CAST(id AS VARCHAR), '|' ORDER BY id) AS s
        FROM t GROUP BY 1""").fetchdf()
    pd.testing.assert_frame_equal(_sorted_df(mine), _sorted_df(want),
                                  check_dtype=False)


def test_lev_le1_cases():
    assert _lev_le1("abc", "abc")
    assert _lev_le1("abc", "abd")      # substitution
    assert _lev_le1("abc", "abcd")     # insertion at end
    assert _lev_le1("abc", "xabc")     # insertion at front
    assert _lev_le1("abc", "ac")       # deletion
    assert not _lev_le1("abc", "adc_x")
    assert not _lev_le1("abc", "axy")
    assert not _lev_le1("abcd", "dcba")


def test_fuzzy_pairs_ragged_strings():
    # mixed lengths exercise the non-uniform fallback; expected pairs by hand
    names = ["kitten", "sitten", "mitten", "kitte", "cat", "cart", "dog"]
    t = pa.table({"id": pa.array(np.arange(len(names)), pa.int64()),
                  "name": pa.array(names, pa.string())})
    out = fuzzy_pairs(ray.data.from_arrow(t), "id", "name").to_pandas()
    got = set(map(tuple, out[["id_a", "id_b"]].to_numpy()))
    want = {(0, 1), (0, 2), (1, 2),   # *itten substitutions
            (0, 3),                   # kitten/kitte deletion
            (4, 5)}                   # cat/cart insertion
    assert got == want


def test_fuzzy_pairs_vs_duckdb_uniform(con):
    # uniform-length ASCII names exercise the vectorized deletion path
    names = [f"name{str(i).zfill(4)}" for i in range(300)]
    t = pa.table({"id": pa.array(np.arange(300), pa.int64()),
                  "name": pa.array(names, pa.string())})
    c = duckdb.connect()
    c.register("s", t)
    want = c.execute("""
        SELECT a.id AS id_a, b.id AS id_b FROM s a, s b
        WHERE a.id < b.id AND levenshtein(a.name, b.name) <= 1""").fetchdf()
    mine = fuzzy_pairs(ray.data.from_arrow(t), "id", "name")
    pd.testing.assert_frame_equal(_sorted_df(mine), _sorted_df(want),
                                  check_dtype=False)


def test_except_all_multiplicity():
    a = ray.data.from_arrow(pa.table({"v": [1, 1, 1, 2, 3]}))
    b = ray.data.from_arrow(pa.table({"v": [1, 3, 3, 4]}))
    out = sorted(r["v"] for r in except_all(a, b, ["v"]).take_all())
    assert out == [1, 1, 2]  # 3x1 - 1x1 = 2; 2 unmatched; 3 cancelled; 4 ignored


def test_salted_sum_equals_plain_groupby(tbl, con):
    ds = ray.data.from_arrow(tbl)
    mine = salted_sum(ds, "k", "x", "id", salt=8, alias="total").to_pandas()
    want = con.execute(
        "SELECT k, SUM(x) AS total FROM t GROUP BY 1").fetchdf()
    pd.testing.assert_frame_equal(_sorted_df(mine), _sorted_df(want),
                                  check_dtype=False, rtol=1e-9)


def test_fixed_k_partition_independent(tbl):
    ds1 = ray.data.from_arrow(tbl)
    ds2 = ray.data.from_arrow(tbl).repartition(13)
    s1 = _sorted_df(stratified_fixed_k(ds1, "k", "id", 10, seed=3)
                    .select_columns(["k", "id"]))
    s2 = _sorted_df(stratified_fixed_k(ds2, "k", "id", 10, seed=3)
                    .select_columns(["k", "id"]))
    pd.testing.assert_frame_equal(s1, s2)
    assert s1.groupby("k").size().eq(10).all()


def test_fixed_k_small_stratum():
    t = pa.table({"k": ["a"] * 3 + ["b"] * 50,
                  "id": pa.array(np.arange(53), pa.int64())})
    out = stratified_fixed_k(ray.data.from_arrow(t), "k", "id", 10).to_pandas()
    sizes = out.groupby("k").size()
    assert sizes["a"] == 3 and sizes["b"] == 10


def test_intersect_all_multiplicity():
    from insurance_pdf_extractor_ray.pipelines.bagops import intersect_all

    a = ray.data.from_arrow(pa.table({"v": [1, 1, 1, 2, 3]})).repartition(3)
    b = ray.data.from_arrow(pa.table({"v": [1, 1, 3, 3, 4]})).repartition(2)
    out = sorted(r["v"] for r in intersect_all(a, b, ["v"]).take_all())
    assert out == [1, 1, 3]  # min(3,2)=2 ones; 2 unmatched; min(1,2)=1 three


def test_cume_dist_matches_duckdb(ray_session):
    import duckdb
    import numpy as np
    import pyarrow as pa
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.statagg import percent_rank_by

    rng = np.random.RandomState(8)
    tbl = pa.table({
        "k": pa.array(rng.randint(0, 4, 900), pa.int64()),
        "v": pa.array(rng.randint(0, 50, 900), pa.int64()),
        "id": pa.array(np.arange(900), pa.int64()),
    })
    out = percent_rank_by(ray.data.from_arrow(tbl).repartition(3),
                          "k", "v", "id", out_col="cd", kind="cume_dist")
    got = {r["id"]: r["cd"] for r in out.take_all()}
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        "SELECT id, cume_dist() OVER (PARTITION BY k ORDER BY v, id) "
        "FROM t").fetchall()
    for i, cd in want:
        assert abs(got[i] - cd) < 1e-12, (i, got[i], cd)


class TestMadByKey:
    def test_matches_duckdb_mad(self):
        import duckdb

        from insurance_pdf_extractor_ray.pipelines.statagg import mad_by_key

        t = pa.table({
            "k": pa.array(["a"] * 5 + ["b"] * 4 + ["c"], pa.string()),
            "v": pa.array([1.0, 2.0, 3.0, 100.0, -7.5,
                           10.0, 20.0, 30.0, 40.0, 5.0], pa.float64()),
        })
        out = mad_by_key(ray.data.from_arrow(t).repartition(3), "k", "v")
        got = sorted((r["k"], round(r["mad"], 9)) for r in out.take_all())
        con = duckdb.connect()
        con.register("t", t)
        want = sorted((k, round(m, 9)) for k, m in con.execute(
            "SELECT k, mad(v) FROM t GROUP BY k").fetchall())
        assert got == want
        # singleton group -> mad 0; outlier 100 must not blow up 'a'
        d = dict(got)
        assert d["c"] == 0.0 and d["a"] <= 3.0


class TestRegrByKey:
    def test_matches_duckdb_regr(self):
        import duckdb

        from insurance_pdf_extractor_ray.pipelines.statagg import regr_by_key

        rng = np.random.default_rng(3)
        n = 4000
        t = pa.table({
            "k": pa.array(rng.choice(["a", "b", "c"], n).tolist(), pa.string()),
            "x": pa.array(rng.normal(0, 2, n), pa.float64()),
        })
        y = 3.0 * t.column("x").to_numpy() + rng.normal(0, 0.5, n) + 1.0
        t = t.append_column("y", pa.array(y, pa.float64()))
        # plus a constant-x group (slope/r2 null) and a perfect-fit group
        extra = pa.table({
            "k": pa.array(["cx"] * 3 + ["pf"] * 3, pa.string()),
            "x": pa.array([5.0, 5.0, 5.0, 1.0, 2.0, 3.0], pa.float64()),
            "y": pa.array([1.0, 2.0, 3.0, 2.0, 4.0, 6.0], pa.float64()),
        })
        t = pa.concat_tables([t, extra])

        out = regr_by_key(ray.data.from_arrow(t).repartition(5), "k", "x", "y")
        got = {r["k"]: r for r in out.take_all()}
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(
            "SELECT k, regr_slope(y, x), regr_intercept(y, x), regr_r2(y, x),"
            " regr_count(y, x) FROM t GROUP BY k").fetchall()
        assert len(got) == len(want)
        for k, sl, ic, r2, n_ in want:
            g = got[k]
            for a, b in ((g["slope"], sl), (g["intercept"], ic), (g["r2"], r2)):
                if b is None:
                    assert a is None or np.isnan(a), (k, a, b)
                else:
                    assert abs(a - b) < 1e-9 * max(1.0, abs(b)), (k, a, b)
            assert g["n"] == n_


class TestSkewKurtByKey:
    def test_matches_duckdb(self):
        import duckdb

        from insurance_pdf_extractor_ray.pipelines.statagg import (
            skew_kurt_by_key,
        )

        rng = np.random.default_rng(9)
        n = 6000
        t = pa.table({
            "k": pa.array(rng.choice(["a", "b", "c"], n).tolist(), pa.string()),
            "v": pa.array(np.concatenate([
                rng.normal(0, 1, n // 2),
                rng.exponential(2.0, n - n // 2)]), pa.float64()),
        })
        tiny = pa.table({"k": pa.array(["t2"] * 2 + ["t3"] * 3, pa.string()),
                         "v": pa.array([1.0, 2.0, 1.0, 2.0, 5.0], pa.float64())})
        t = pa.concat_tables([t, tiny])
        got = {r["k"]: r for r in skew_kurt_by_key(
            ray.data.from_arrow(t).repartition(5), "k", "v").take_all()}
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute(
            "SELECT k, skewness(v), kurtosis(v), count(*) FROM t GROUP BY k"
        ).fetchall()
        for k, sk, ku, n_ in want:
            g = got[k]
            for a, b in ((g["skewness"], sk), (g["kurtosis"], ku)):
                if b is None:
                    assert a is None or np.isnan(a), (k, a, b)
                else:
                    assert abs(a - b) < 1e-7 * max(1.0, abs(b)), (k, a, b)
            assert g["n"] == n_
