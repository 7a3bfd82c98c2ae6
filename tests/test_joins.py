"""Join operators (pipelines/joins.py): broadcast hash/anti/semi join."""

import pyarrow as pa
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.joins import (
    broadcast_anti_join,
    broadcast_join,
    broadcast_semi_join,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _big():
    # small blocks so some blocks contain ONLY unmatched keys
    return ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 100, 101, 102], pa.int64()),
        "v": pa.array(list("abcdef"), pa.string()),
    })).repartition(6)


def _small():
    return ray.data.from_arrow(pa.table({
        "k": pa.array([1, 2, 3], pa.int64()),
        "name": pa.array(["one", "two", "three"], pa.string()),
        "weight": pa.array([1.0, 2.0, 3.0], pa.float64()),
    }))


def test_inner_broadcast_join():
    out = broadcast_join(_big(), _small(), on="k").take_all()
    assert sorted((r["k"], r["name"]) for r in out) == [
        (1, "one"), (2, "two"), (3, "three")]


def test_left_join_all_miss_batch_keeps_types():
    """A block whose keys all miss must still emit correctly-typed null
    columns (null-type inference would break block unification)."""
    ds = broadcast_join(_big(), _small(), on="k", how="left")
    tbl = pa.concat_tables([t for t in ray.get(ds.to_arrow_refs()) if t.num_rows])
    assert tbl.schema.field("name").type == pa.string()
    assert tbl.schema.field("weight").type == pa.float64()
    rows = {r["k"]: r for r in tbl.to_pylist()}
    assert rows[100]["name"] is None and rows[100]["weight"] is None
    assert rows[2]["name"] == "two" and rows[2]["weight"] == 2.0
    assert len(rows) == 6


def test_anti_and_semi_join():
    anti = broadcast_anti_join(_big(), "k", {1, 2, 3}).take_all()
    assert sorted(r["k"] for r in anti) == [100, 101, 102]
    semi = broadcast_semi_join(_big(), "k", {1, 2, 3}).take_all()
    assert sorted(r["k"] for r in semi) == [1, 2, 3]
