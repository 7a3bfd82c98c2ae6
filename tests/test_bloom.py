"""Bloom-filter semi-join: no false negatives, exactness, null semantics."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.bloom import (
    _BloomProbe,
    _positions,
    bloom_semi_join,
    build_bloom,
)

pytestmark = pytest.mark.usefixtures("ray_session")

SF = "/root/testdata/sf0.001"


def test_build_merges_blocks_and_probe_has_no_false_negatives():
    keys = list(range(0, 2000, 3))  # 667 members
    small = ray.data.from_arrow(
        pa.table({"k": pa.array(keys, pa.int64())})).repartition(5)
    bits = build_bloom(small, "k", m_bits=1 << 16, k=5)
    probe = _BloomProbe.__new__(_BloomProbe)
    probe.bits, probe.key_col, probe.m_bits, probe.k = bits, "k", 1 << 16, 5
    batch = pa.table({"k": pa.array(list(range(2000)), pa.int64())})
    survived = set(probe(batch).column("k").to_pylist())
    assert set(keys) <= survived  # every member passes, always
    # filter does real work: most non-members are gone at this m/n
    assert len(survived - set(keys)) < 200


def test_positions_deterministic_and_in_range():
    u = np.arange(100, dtype=np.uint64)
    p1 = _positions(u, 1 << 12, 7)
    p2 = _positions(u, 1 << 12, 7)
    assert (p1 == p2).all() and p1.shape == (7, 100)
    assert (p1 < (1 << 12)).all()


def test_exact_semi_join_matches_duckdb_in():
    con = duckdb.connect()
    want = sorted(r[0] for r in con.execute(
        f"""SELECT o_orderkey FROM '{SF}/orders.parquet'
            WHERE o_custkey IN (
              SELECT c_custkey FROM '{SF}/customer.parquet'
              WHERE c_mktsegment = 'BUILDING')""").fetchall())
    orders = ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    cust = (ray.data.read_parquet(
        f"{SF}/customer.parquet", columns=["c_custkey", "c_mktsegment"])
        .filter(expr="c_mktsegment == 'BUILDING'")
        .select_columns(["c_custkey"]))
    out = bloom_semi_join(orders, cust, on="o_custkey",
                          right_on="c_custkey", m_bits=1 << 14, k=5)
    got = sorted(r["o_orderkey"] for r in out.take_all())
    assert got == want
    assert out.schema().names == ["o_orderkey", "o_custkey"]


def test_null_probe_keys_never_match():
    big = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None, 2, None, 3], pa.int64()),
        "v": pa.array(list("abcde")),
    }))
    small = ray.data.from_arrow(pa.table({"k": pa.array([1, 3, None],
                                                        pa.int64())}))
    out = bloom_semi_join(big, small, on="k", m_bits=1 << 10, k=3,
                          num_partitions=2)
    assert sorted((r["k"], r["v"]) for r in out.take_all()) == \
        [(1, "a"), (3, "e")]


def test_inexact_mode_is_superset_and_member_complete():
    big = ray.data.from_arrow(pa.table({"k": pa.array(range(500), pa.int64())}))
    small = ray.data.from_arrow(pa.table({"k": pa.array(range(0, 500, 7),
                                                        pa.int64())}))
    got = {r["k"] for r in bloom_semi_join(
        big, small, on="k", m_bits=1 << 13, k=5, exact=False).take_all()}
    assert set(range(0, 500, 7)) <= got
