"""evalstats (ROC AUC / calibration / association / Benford) vs exact
reference computations and DuckDB on synthetic data."""

import math

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.evalstats import (
    benford_first_digit,
    calibration_bins,
    categorical_association,
    roc_auc,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _scores(n=5000, seed=7, quantize=None):
    rng = np.random.RandomState(seed)
    lab = rng.rand(n) < 0.3
    # positives score higher on average; heavy ties when quantized
    s = np.where(lab, rng.normal(1.0, 1.0, n), rng.normal(0.0, 1.0, n))
    if quantize:
        s = np.round(s * quantize) / quantize
    return pa.table({
        "score": pa.array(s, pa.float64()),
        "cls": pa.array(np.where(lab, "pos", "neg"), pa.string()),
    })


def _auc_reference(tbl: pa.Table) -> float:
    """O(n log n) exact AUC with ½-credit ties (rank-sum formula)."""
    import pandas as pd
    df = tbl.to_pandas()
    ranks = df["score"].rank(method="average")
    pos = df["cls"] == "pos"
    n1, n0 = int(pos.sum()), int((~pos).sum())
    u = ranks[pos].sum() - n1 * (n1 + 1) / 2
    return u / (n1 * n0)


@pytest.mark.parametrize("quantize", [None, 4])
def test_roc_auc_exact(quantize):
    tbl = _scores(quantize=quantize)
    ds = ray.data.from_arrow(tbl).repartition(7)
    out = roc_auc(ds, "score", "cls", "pos")
    assert out.column("n_pos")[0].as_py() == 1543  # seed-fixed
    got = out.column("auc")[0].as_py()
    assert got == pytest.approx(_auc_reference(tbl), abs=1e-12)
    assert 0.7 < got < 0.9


def test_roc_auc_degenerate():
    tbl = pa.table({"score": pa.array([1.0, 2.0]),
                    "cls": pa.array(["pos", "pos"])})
    with pytest.raises(ValueError):
        roc_auc(ray.data.from_arrow(tbl), "score", "cls", "pos")


def test_roc_auc_all_tied():
    # every score identical -> AUC must be exactly 0.5
    tbl = pa.table({"score": pa.array([3.0] * 40),
                    "cls": pa.array(["pos"] * 10 + ["neg"] * 30)})
    out = roc_auc(ray.data.from_arrow(tbl).repartition(5),
                  "score", "cls", "pos")
    assert out.column("auc")[0].as_py() == 0.5


def test_calibration_bins_vs_duckdb():
    rng = np.random.RandomState(3)
    p = rng.rand(3000)
    lab = rng.rand(3000) < p  # perfectly calibrated by construction
    tbl = pa.table({"p": pa.array(p, pa.float64()),
                    "cls": pa.array(np.where(lab, "pos", "neg"))})
    out = calibration_bins(ray.data.from_arrow(tbl).repartition(5),
                           "p", "cls", "pos", n_bins=10)
    con = duckdb.connect()
    con.register("t", tbl)
    exp = con.execute("""
        SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin,
               COUNT(*) AS n, AVG(p) AS mean_p,
               AVG(CASE WHEN cls = 'pos' THEN 1.0 ELSE 0.0 END) AS frac_pos
        FROM t GROUP BY 1 ORDER BY 1
    """).fetch_arrow_table()
    assert out.column("bin").to_pylist() == exp.column("bin").to_pylist()
    assert out.column("n").to_pylist() == exp.column("n").to_pylist()
    np.testing.assert_allclose(out.column("mean_p").to_numpy(),
                               exp.column("mean_p").to_numpy(), atol=1e-12)
    np.testing.assert_allclose(out.column("frac_pos").to_numpy(),
                               exp.column("frac_pos").to_numpy(), atol=1e-12)
    # calibrated data: frac_pos tracks mean_p
    diff = np.abs(out.column("mean_p").to_numpy()
                  - out.column("frac_pos").to_numpy())
    assert diff.max() < 0.12


def test_categorical_association_exact():
    # hand-checkable 2x2 table: x fully determines y
    x = ["a"] * 50 + ["b"] * 50
    y = ["u"] * 50 + ["v"] * 50
    out = categorical_association(
        ray.data.from_arrow(pa.table({"x": x, "y": y})).repartition(4),
        "x", "y")
    assert out.column("n")[0].as_py() == 100
    assert out.column("mi_nats")[0].as_py() == pytest.approx(math.log(2))
    assert out.column("chi2")[0].as_py() == pytest.approx(100.0)
    assert out.column("cramers_v")[0].as_py() == pytest.approx(1.0)


def test_categorical_association_independent():
    # independent uniform columns -> MI near 0, V near 0
    rng = np.random.RandomState(5)
    tbl = pa.table({"x": rng.choice(["a", "b", "c"], 20000),
                    "y": rng.choice(["u", "v"], 20000)})
    out = categorical_association(ray.data.from_arrow(tbl), "x", "y")
    assert out.column("mi_nats")[0].as_py() < 1e-3
    assert out.column("cramers_v")[0].as_py() < 0.05


def test_benford_first_digit():
    # log-uniform magnitudes follow Benford closely
    rng = np.random.RandomState(9)
    v = 10 ** rng.uniform(0, 5, 30000)
    out = benford_first_digit(
        ray.data.from_arrow(pa.table({"v": pa.array(v)})).repartition(6),
        "v")
    assert out.column("digit").to_pylist() == list(range(1, 10))
    assert sum(out.column("n").to_pylist()) == 30000
    obs = np.array(out.column("observed_p").to_pylist())
    exp = np.array(out.column("expected_p").to_pylist())
    assert np.abs(obs - exp).max() < 0.01
    # digit extraction itself is exact: 999.995 rounds to 100000 cents -> 1
    tiny = benford_first_digit(
        ray.data.from_arrow(pa.table({"v": pa.array([999.995, 0.07, -3.0,
                                                     0.0, 20.0])})), "v")
    assert tiny.column("n").to_pylist() == [1, 1, 0, 0, 0, 0, 1, 0, 0]
