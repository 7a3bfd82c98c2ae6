"""ohlc_by_key selection semantics and table_fingerprint layout-invariance."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.profile import table_fingerprint
from insurance_pdf_extractor_ray.pipelines.statagg import ohlc_by_key

pytestmark = pytest.mark.usefixtures("ray_session")


def _events(n=5000, seed=13):
    rng = np.random.RandomState(seed)
    return pa.table({
        "key": pa.array(rng.randint(0, 12, n), pa.int64()),
        "ts": pa.array(rng.randint(0, 10_000, n), pa.int64()),
        "eid": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(rng.uniform(1, 500, n).round(3), pa.float64()),
    })


def test_ohlc_matches_pandas():
    t = _events()
    ds = ray.data.from_arrow(t).repartition(7)
    got = {r["key"]: r for r in
           ohlc_by_key(ds, "key", "ts", "eid", "v").take_all()}

    df = t.to_pandas().sort_values(["key", "ts", "eid"])
    for k, g in df.groupby("key"):
        r = got[k]
        assert r["open"] == g["v"].iloc[0]
        assert r["close"] == g["v"].iloc[-1]
        assert r["high"] == g["v"].max()
        assert r["low"] == g["v"].min()
        assert r["n"] == len(g)
        assert r["vol_q"] == int(np.floor(g["v"].to_numpy() * 1000 + 0.5)
                                 .astype(np.int64).sum())
    assert set(got) == set(df["key"].unique())


def test_ohlc_open_close_tiebreak_on_equal_ts():
    t = pa.table({
        "key": pa.array([1, 1, 1], pa.int64()),
        "ts": pa.array([5, 5, 5], pa.int64()),
        "eid": pa.array([30, 10, 20], pa.int64()),
        "v": pa.array([3.0, 1.0, 2.0], pa.float64()),
    })
    r = ohlc_by_key(ray.data.from_arrow(t).repartition(3),
                    "key", "ts", "eid", "v").take_all()[0]
    assert r["open"] == 1.0 and r["close"] == 3.0   # eid order breaks ties


def test_fingerprint_invariant_under_layout():
    t = _events(3000)
    cols = ["key", "ts", "eid"]
    d1 = table_fingerprint(ray.data.from_arrow(t), cols)
    # shuffled rows, different partitioning -> identical digest
    perm = np.random.RandomState(0).permutation(3000)
    t2 = t.take(pa.array(perm))
    d2 = table_fingerprint(ray.data.from_arrow(t2).repartition(11), cols)
    assert d1 == d2
    assert len(d1) == 16 and int(d1, 16) >= 0


def test_fingerprint_detects_single_row_change():
    t = _events(1000)
    d1 = table_fingerprint(ray.data.from_arrow(t), ["key", "ts", "eid"])
    df = t.to_pandas()
    df.loc[500, "ts"] += 1
    d2 = table_fingerprint(ray.data.from_arrow(pa.Table.from_pandas(df)),
                           ["key", "ts", "eid"])
    assert d1 != d2

def test_ohlc_string_key_with_empty_batches():
    # String-keyed OHLC: the empty-batch partial and the key column in the
    # non-empty partial must both follow the input key dtype (regression:
    # the empty-batch schema hardcoded int64 and broke schema unification).
    t = pa.table({
        "key": pa.array(["a", "b", "a", "b", "c"], pa.string()),
        "ts": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "eid": pa.array([10, 11, 12, 13, 14], pa.int64()),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0], pa.float64()),
    })
    # repartition well past num_rows so some blocks are empty
    rows = {r["key"]: r for r in
            ohlc_by_key(ray.data.from_arrow(t).repartition(12),
                        "key", "ts", "eid", "v").take_all()}
    assert rows["a"]["open"] == 1.0 and rows["a"]["close"] == 3.0
    assert rows["b"]["open"] == 2.0 and rows["b"]["close"] == 4.0
    assert rows["c"]["n"] == 1


def test_fingerprint_rejects_null_int_column():
    t = pa.table({
        "key": pa.array([1, None, 3], pa.int64()),
        "ts": pa.array([1, 2, 3], pa.int64()),
    })
    with pytest.raises(Exception, match="null"):
        table_fingerprint(ray.data.from_arrow(t), ["key", "ts"])
