"""skew_join hybrid paths + percent_rank_by vs DuckDB."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.joins import skew_join
from insurance_pdf_extractor_ray.pipelines.statagg import percent_rank_by

pytestmark = pytest.mark.usefixtures("ray_session")


def _skewed(n=6000, seed=3):
    rng = np.random.RandomState(seed)
    # zipf-ish: key 0 is pathologically hot, long tail beyond
    keys = np.minimum(rng.zipf(1.3, n) - 1, 499)
    return pa.table({
        "k": pa.array(keys, pa.int64()),
        "x": pa.array(np.arange(n), pa.int64()),
    })


@pytest.fixture(scope="module")
def fact():
    return _skewed()


@pytest.fixture(scope="module")
def dim():
    return pa.table({
        "dk": pa.array(np.arange(0, 450), pa.int64()),  # 450..499 unmatched
        "seg": pa.array([f"s{i % 7}" for i in range(450)], pa.string()),
    })


def _sorted(df):
    if not isinstance(df, pd.DataFrame):
        df = df.to_pandas()
    cols = sorted(df.columns)
    return df[cols].sort_values(cols, kind="mergesort").reset_index(drop=True)


def _oracle(fact, dim, how):
    c = duckdb.connect()
    c.register("f", fact)
    c.register("d", dim)
    j = "JOIN" if how == "inner" else "LEFT JOIN"
    return c.execute(f"SELECT k, x, seg FROM f {j} d ON k = dk").fetchdf()


@pytest.mark.parametrize("how", ["inner", "left"])
@pytest.mark.parametrize("threshold", [30, 10_000])  # mixed | no-hot
def test_skew_join_matches_plain_join(fact, dim, how, threshold):
    out = skew_join(ray.data.from_arrow(fact), ray.data.from_arrow(dim),
                    on="k", right_on="dk", how=how, hot_threshold=threshold)
    pd.testing.assert_frame_equal(_sorted(out.to_pandas()),
                                  _sorted(_oracle(fact, dim, how)),
                                  check_dtype=False)


def test_skew_join_all_hot(dim):
    # every key above threshold -> pure broadcast path, no shuffle join
    fact = pa.table({"k": pa.array([1] * 50 + [2] * 50, pa.int64()),
                     "x": pa.array(np.arange(100), pa.int64())})
    out = skew_join(ray.data.from_arrow(fact), ray.data.from_arrow(dim),
                    on="k", right_on="dk", how="inner", hot_threshold=40)
    pd.testing.assert_frame_equal(_sorted(out.to_pandas()),
                                  _sorted(_oracle(fact, dim, "inner")),
                                  check_dtype=False)


def test_percent_rank_by_matches_duckdb():
    rng = np.random.RandomState(9)
    t = pa.table({
        "g": pa.array(rng.choice(["a", "b"], 2000), pa.string()),
        "v": pa.array(rng.normal(0, 1, 2000), pa.float64()),
        "id": pa.array(np.arange(2000), pa.int64()),
    })
    out = percent_rank_by(ray.data.from_arrow(t), "g", "v", "id",
                          out_col="pr").to_pandas()
    c = duckdb.connect()
    c.register("t", t)
    want = c.execute("""
        SELECT g, v, id, percent_rank() OVER (
            PARTITION BY g ORDER BY v, id) AS pr FROM t""").fetchdf()
    pd.testing.assert_frame_equal(
        _sorted(out).round(12), _sorted(want).round(12), check_dtype=False)


def test_percent_rank_singleton_group():
    t = pa.table({"g": ["solo"], "v": [1.5], "id": [0]})
    out = percent_rank_by(ray.data.from_arrow(t), "g", "v", "id").to_pandas()
    assert out["percent_rank"].iloc[0] == 0.0
