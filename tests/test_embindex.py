"""Incremental embedding near-dup dedup against the at-rest sign-bucket index."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.embindex import (
    embedding_dedup_incremental,
    embedding_index_append,
)

pytestmark = pytest.mark.usefixtures("ray_session")

DIM = 16


def _unit(seed):
    v = np.random.RandomState(seed).standard_normal(DIM)
    return (v / np.linalg.norm(v)).astype(np.float32)


def _tbl(ids, vecs):
    return pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array([list(map(float, v)) for v in vecs],
                              pa.list_(pa.float32())),
    })


def _run(tbl, index_dir, tmp_path, tag, threshold=0.95):
    kept, rows = embedding_dedup_incremental(
        ray.data.from_arrow(tbl).repartition(2), str(index_dir),
        "embedding", "vec_id", threshold=threshold, n_planes=8,
        n_buckets=8, tmp_dir=str(tmp_path / f"t{tag}"))
    return sorted(r["vec_id"] for r in kept.take_all()), rows


def test_cross_increment_and_in_batch(tmp_path):
    e0, e1, e2 = _unit(1), _unit(2), _unit(3)
    idx = tmp_path / "idx"
    k1, r1 = _run(_tbl([0, 1], [e0, e1]), idx, tmp_path, "a")
    assert k1 == [0, 1]
    embedding_index_append(str(idx), r1, n_buckets=8)

    # scaled copies share the unit vector -> same sign bucket, cosine 1
    k2, r2 = _run(_tbl([10, 11, 12, 13],
                       [e0 * 3.0, e2, e2 * 0.5, e1 * 7.0]),
                  idx, tmp_path, "b")
    assert 10 not in k2   # dup of indexed 0
    assert 13 not in k2   # dup of indexed 1
    assert 11 in k2       # fresh direction kept
    assert 12 not in k2   # in-batch dup of 11 (min id wins)
    embedding_index_append(str(idx), r2, n_buckets=8)

    # third increment catches dups of increment-2 keeps
    k3, _ = _run(_tbl([20, 21], [e2 * 2.0, _unit(99)]), idx, tmp_path, "c")
    assert 20 not in k3 and 21 in k3


def test_first_increment_in_batch_only(tmp_path):
    e = _unit(5)
    k, _ = _run(_tbl([0, 1, 2], [e, e * 2.0, _unit(6)]),
                tmp_path / "i0", tmp_path, "s")
    assert k == [0, 2]


def test_matches_batch_lsh_on_disjoint_groups(tmp_path):
    from insurance_pdf_extractor_ray.pipelines.dedup import embedding_dup_ids

    vecs, ids = [], []
    k = 0
    for g in range(5):
        base = _unit(100 + g)
        for copy in range(3):
            vecs.append(base * (1.0 + copy))  # same direction
            ids.append(k)
            k += 1
    tbl = _tbl(ids, vecs)
    batch_dups = sorted(
        r["vec_id"] for r in embedding_dup_ids(
            ray.data.from_arrow(tbl), "embedding", "vec_id",
            threshold=0.95, n_planes=8).take_all())

    idx = tmp_path / "i2"
    k1, r1 = _run(pa.Table.from_arrays(
        [tbl.column(0).slice(0, 6), tbl.column(1).slice(0, 6)],
        names=tbl.column_names), idx, tmp_path, "h1")
    embedding_index_append(str(idx), r1, n_buckets=8)
    k2, _ = _run(pa.Table.from_arrays(
        [tbl.column(0).slice(6), tbl.column(1).slice(6)],
        names=tbl.column_names), idx, tmp_path, "h2")
    dropped = sorted(set(ids) - set(k1 + k2))
    assert dropped == batch_dups
