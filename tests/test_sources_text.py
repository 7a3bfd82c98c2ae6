"""CSV / JSONL source readers — roundtrip through the text formats."""

import os
import tempfile

import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.sources.io import read_csv, read_jsonl

pytestmark = pytest.mark.usefixtures("ray_session")

TBL = pa.table({
    "id": pa.array([1, 2, 3, 4], pa.int64()),
    "k": pa.array(["a", "b", "a", "c"], pa.string()),
    "n": pa.array([10, 20, 30, 40], pa.int64()),
})


def test_csv_roundtrip_with_pruning():
    d = tempfile.mkdtemp(prefix="ipe_csv_")
    ray.data.from_arrow(TBL).repartition(2).write_csv(d)
    back = read_csv(d).take_all()
    assert sorted((r["id"], r["k"], r["n"]) for r in back) == [
        (1, "a", 10), (2, "b", 20), (3, "a", 30), (4, "c", 40)]
    pruned = read_csv(d, columns=["id", "n"]).take_all()
    assert set(pruned[0].keys()) == {"id", "n"}
    assert sum(r["n"] for r in pruned) == 100


def test_jsonl_roundtrip_with_pruning():
    d = tempfile.mkdtemp(prefix="ipe_jsonl_")
    ray.data.from_arrow(TBL).repartition(2).write_json(d)
    back = read_jsonl(d).take_all()
    assert sorted((r["id"], r["k"], r["n"]) for r in back) == [
        (1, "a", 10), (2, "b", 20), (3, "a", 30), (4, "c", 40)]
    pruned = read_jsonl(d, columns=["k"]).take_all()
    assert sorted(r["k"] for r in pruned) == ["a", "a", "b", "c"]


class TestLancePosture:
    """The .lance read branch must be testable in-environment: with no
    lance wheel it fails fast with guidance to the canonical
    bucketed-parquet layout; with one it round-trips (gated)."""

    def test_missing_wheel_error_or_roundtrip(self, tmp_path, ray_session):
        import importlib.util

        import pyarrow as pa
        import pytest
        import ray.data

        from insurance_pdf_extractor_ray.sources.io import read_table

        if importlib.util.find_spec("lance") is None:
            with pytest.raises(ImportError, match="bucketed-parquet"):
                read_table(str(tmp_path / "t.lance"))
        else:  # pragma: no cover - exercised only where lance is installed
            import lance

            t = pa.table({"a": pa.array([1, 2, 3], pa.int64())})
            lance.write_dataset(t, str(tmp_path / "t.lance"))
            got = read_table(str(tmp_path / "t.lance")).take_all()
            assert sorted(r["a"] for r in got) == [1, 2, 3]
