"""global_shuffle determinism + SQL parity; compact_table round trip."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.sampling import (
    global_shuffle,
    shuffle_sql_order,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_shuffle_matches_sql_total_order():
    tbl = pa.table({
        "id": pa.array(np.arange(2000, dtype=np.int64)),
        "v": pa.array(np.arange(2000) * 2),
    })
    out = global_shuffle(ray.data.from_arrow(tbl).repartition(4),
                         "id", seed=7)
    got = [r["id"] for r in out.take_all()]
    con = duckdb.connect()
    con.register("t", tbl)
    want = [r[0] for r in con.execute(
        f"SELECT id FROM t ORDER BY {shuffle_sql_order('id', 7)}"
    ).fetchall()]
    assert got == want
    assert got != sorted(got)  # actually shuffled


def test_shuffle_seeds_differ_and_reproduce():
    tbl = pa.table({"id": pa.array(np.arange(500, dtype=np.int64))})
    ds = ray.data.from_arrow(tbl)
    a1 = [r["id"] for r in global_shuffle(ds, "id", seed=1).take_all()]
    a2 = [r["id"] for r in global_shuffle(ds, "id", seed=1).take_all()]
    b = [r["id"] for r in global_shuffle(ds, "id", seed=2).take_all()]
    assert a1 == a2
    assert a1 != b
    assert sorted(b) == list(range(500))


def test_compact_table(tmp_path):
    from insurance_pdf_extractor_ray.sources.io import compact_table

    src = tmp_path / "frag"
    src.mkdir()
    for i in range(30):
        pq.write_table(
            pa.table({"x": pa.array(np.arange(i * 100, i * 100 + 100))}),
            src / f"part-{i:03d}.parquet")
    out = tmp_path / "compacted"
    manifest = compact_table(str(src), str(out),
                             min_rows_per_file=1000,
                             max_rows_per_file=1500)
    assert manifest["rows"] == 3000
    assert manifest["files_in"] == 30
    assert manifest["files_out"] <= 4
    back = ray.data.read_parquet(str(out))
    vals = sorted(r["x"] for r in back.take_all())
    assert vals == list(range(3000))
