"""Z-order (Morton) clustering: key correctness vs SQL, locality effect."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.zorder import (
    cluster_by_zorder,
    morton_interleave,
    zorder_key_batch,
    zorder_sql_expr,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_morton_interleave_known_bits():
    # x=0b11, y=0b01 -> interleaved (x lane = even bits): 0b0111 = 7
    x = np.array([0b11], dtype=np.uint64)
    y = np.array([0b01], dtype=np.uint64)
    assert morton_interleave([x, y], bits=2)[0] == 0b0111
    # single column degenerates to identity (mod 2^bits)
    z = morton_interleave([np.array([5, 9], dtype=np.uint64)], bits=3)
    assert list(z) == [5, 1]


def test_zorder_key_matches_sql_expr():
    rng = np.random.RandomState(7)
    tbl = pa.table({
        "a": pa.array(rng.randint(0, 1 << 20, 500), pa.int64()),
        "b": pa.array(rng.randint(0, 1 << 20, 500), pa.int64()),
    })
    keyed = zorder_key_batch(tbl, ["a", "b"], bits=16)
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        f"SELECT {zorder_sql_expr(['a', 'b'], 16)} AS z FROM t"
    ).fetchnumpy()["z"]
    got = keyed.column("__z").to_numpy()
    assert (got == want).all()


def test_cluster_by_zorder_improves_both_dims():
    # after z-ordering, per-block min/max ranges on BOTH dims must be far
    # tighter than under a single-column sort's worst dim
    rng = np.random.RandomState(11)
    n = 20_000
    tbl = pa.table({
        "a": pa.array(rng.randint(0, 1 << 14, n), pa.int64()),
        "b": pa.array(rng.randint(0, 1 << 14, n), pa.int64()),
    })
    ds = ray.data.from_arrow(tbl).repartition(8)
    out = cluster_by_zorder(ds, ["a", "b"], bits=14)
    assert set(out.schema().names) == {"a", "b"}

    # fixed-size contiguous chunks of the z-sorted order cover small
    # rectangles in (a, b) — independent of Ray's runtime block boundaries
    rows = out.take_all()
    base = float(1 << 14)
    chunk = n // 16
    for col in ("a", "b"):
        vals = np.array([r[col] for r in rows])
        spans = [float(vals[i:i + chunk].max() - vals[i:i + chunk].min())
                 for i in range(0, n, chunk)]
        avg_span = sum(spans) / len(spans)
        assert avg_span < 0.6 * base, (col, avg_span)


def test_cluster_keep_key_sorted():
    tbl = pa.table({
        "a": pa.array([3, 0, 1, 2], pa.int64()),
        "b": pa.array([0, 3, 2, 1], pa.int64()),
    })
    out = cluster_by_zorder(ray.data.from_arrow(tbl), ["a", "b"], bits=2,
                            keep_key=True)
    z = [r["__z"] for r in out.take_all()]
    assert z == sorted(z)
