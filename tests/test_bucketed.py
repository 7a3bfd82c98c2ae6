"""Bucketed layout + zero-shuffle co-located join; durable string hash."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.functions.hashing import durable_hash64_column
from insurance_pdf_extractor_ray.pipelines.bucketed import (
    _bucket_of,
    bucketed_join,
    layout_of,
    write_bucketed,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_durable_hash_properties():
    vals = ["", "a", "b", "ab", "ba", "a" * 300, "naïve", "日本語", None]
    h1 = durable_hash64_column(pa.array(vals, pa.string()))
    # deterministic across calls and chunkings
    h2 = durable_hash64_column(pa.chunked_array([
        pa.array(vals[:4], pa.string()), pa.array(vals[4:], pa.string())]))
    np.testing.assert_array_equal(h1, h2)
    # null hashes like empty; non-trivial values all distinct
    assert h1[-1] == h1[0]
    assert len(set(h1[1:8].tolist())) == 7
    # order matters (polynomial, not a bag hash)
    assert h1[3] != h1[4]


def test_durable_hash_sliced_array():
    # offsets handling: a sliced Arrow array must hash like the fresh copy
    arr = pa.array(["xx", "yy", "zz", "ww"], pa.string())
    np.testing.assert_array_equal(
        durable_hash64_column(arr.slice(1, 2)),
        durable_hash64_column(pa.array(["yy", "zz"], pa.string())))


def test_bucket_of_int_and_string_ranges():
    ints = pa.chunked_array([pa.array(np.arange(1000), pa.int64())])
    strs = pa.chunked_array([pa.array([f"k{i}" for i in range(1000)])])
    for col in (ints, strs):
        b = _bucket_of(col, 16)
        assert b.min() >= 0 and b.max() < 16
        # roughly uniform: no bucket more than 3x the mean
        assert np.bincount(b, minlength=16).max() < 3 * (1000 / 16)


def test_bucketed_join_matches_pandas(tmp_path):
    rng = np.random.RandomState(5)
    left = pa.table({
        "k": pa.array(rng.randint(0, 400, 3000), pa.int64()),
        "lv": pa.array(np.arange(3000), pa.int64()),
    })
    right = pa.table({
        "rk": pa.array(np.arange(0, 500), pa.int64()),
        "rv": pa.array([f"v{i}" for i in range(500)], pa.string()),
    })
    write_bucketed(ray.data.from_arrow(left), str(tmp_path / "l"), "k", 8)
    write_bucketed(ray.data.from_arrow(right), str(tmp_path / "r"), "rk", 8)
    assert layout_of(str(tmp_path / "l")) == {"key": "k", "n_buckets": 8}
    out = bucketed_join(str(tmp_path / "l"), str(tmp_path / "r")).to_pandas()
    want = (left.to_pandas().merge(right.to_pandas(), left_on="k", right_on="rk")
            .drop(columns=["rk"]))
    key = ["k", "lv", "rv"]
    pd.testing.assert_frame_equal(
        out[key].sort_values(key).reset_index(drop=True),
        want[key].sort_values(key).reset_index(drop=True))


def test_bucketed_join_string_key_and_mismatch(tmp_path):
    t = pa.table({"name": pa.array([f"doc{i}" for i in range(200)]),
                  "x": pa.array(np.arange(200), pa.int64())})
    write_bucketed(ray.data.from_arrow(t), str(tmp_path / "a"), "name", 4)
    write_bucketed(ray.data.from_arrow(t), str(tmp_path / "b"), "name", 4)
    out = bucketed_join(str(tmp_path / "a"), str(tmp_path / "b")).to_pandas()
    assert len(out) == 200 and "x_r" in out.columns  # unique string key; right x suffixed
    write_bucketed(ray.data.from_arrow(t), str(tmp_path / "c"), "name", 8)
    with pytest.raises(ValueError, match="bucket count mismatch"):
        bucketed_join(str(tmp_path / "a"), str(tmp_path / "c"))


class TestPointLookup:
    def _layout(self, tmp_path, ray_session):
        import pyarrow as pa
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.bucketed import (
            write_bucketed,
        )

        t = pa.table({"k": pa.array(range(100), pa.int64()),
                      "v": pa.array([f"v{i}" for i in range(100)])})
        p = str(tmp_path / "pl")
        write_bucketed(ray.data.from_arrow(t), p, "k", 8)
        return p

    def test_single_and_multi_value(self, tmp_path, ray_session):
        import pyarrow as pa

        from insurance_pdf_extractor_ray.pipelines.bucketed import (
            point_lookup,
        )

        p = self._layout(tmp_path, ray_session)
        one = point_lookup(p, 42)
        assert one.num_rows == 1 and one.column("v")[0].as_py() == "v42"
        multi = point_lookup(p, [3, 42, 99], columns=["v"])
        assert sorted(multi.column("v").to_pylist()) == ["v3", "v42", "v99"]
        assert multi.column_names == ["v"]
        missing = point_lookup(p, [12345])
        assert missing.num_rows == 0
        assert set(missing.column_names) == {"k", "v"}
        _ = pa  # fixture import symmetry

    def test_prunes_to_touched_buckets(self, tmp_path, ray_session, monkeypatch):
        from insurance_pdf_extractor_ray.pipelines import bucketed

        p = self._layout(tmp_path, ray_session)
        reads = []
        orig = bucketed._read_bucket

        def spy(path, b, columns):
            reads.append(b)
            return orig(path, b, columns)

        monkeypatch.setattr(bucketed, "_read_bucket", spy)
        bucketed.point_lookup(p, [7])
        assert len(set(reads)) == 1  # exactly one bucket touched
