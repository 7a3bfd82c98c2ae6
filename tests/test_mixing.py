"""Mixture interleave vs the exact DuckDB UNION ALL re-derivation."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.mixing import (
    mixture_interleave,
    mixture_sql,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(n=6000):
    rng = np.random.RandomState(5)
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "source": pa.array(rng.choice(["cc", "wiki", "code", "other"], n),
                           pa.string()),
    })


WEIGHTS = {"wiki": 2.5, "cc": 0.3, "code": 1.0}  # 'other' unlisted → dropped


def _run(tbl, **kw):
    out = mixture_interleave(ray.data.from_arrow(tbl).repartition(7),
                             "source", "doc_id", WEIGHTS, **kw).take_all()
    return sorted((r["doc_id"], r["epoch"], r["source"], r["shard"])
                  for r in out)


def test_matches_sql_rederivation():
    tbl = _docs()
    got = _run(tbl, seed=42, n_shards=16)
    con = duckdb.connect()
    con.register("docs", tbl)
    sql = mixture_sql("docs", "source", "doc_id", WEIGHTS, seed=42,
                      n_shards=16, columns="doc_id, source")
    want = sorted((r[0], r[2], r[1], r[3]) for r in con.execute(sql).fetchall())
    assert got == want


def test_epoch_semantics():
    tbl = _docs()
    got = _run(tbl, seed=42)
    per_src_epochs = {}
    n_src = {}
    for s in ["wiki", "cc", "code"]:
        n_src[s] = sum(1 for r in tbl.column("source").to_pylist() if r == s)
    for did, epoch, src, _ in got:
        per_src_epochs.setdefault(src, {}).setdefault(epoch, 0)
        per_src_epochs[src][epoch] += 1
    # wiki: epochs 0 and 1 are FULL copies, epoch 2 is a ~0.5 subsample
    assert per_src_epochs["wiki"][0] == n_src["wiki"]
    assert per_src_epochs["wiki"][1] == n_src["wiki"]
    assert 0.4 < per_src_epochs["wiki"][2] / n_src["wiki"] < 0.6
    # code: exactly one full epoch
    assert per_src_epochs["code"] == {0: n_src["code"]}
    # cc: one fractional epoch ~0.3
    assert set(per_src_epochs["cc"]) == {0}
    assert 0.2 < per_src_epochs["cc"][0] / n_src["cc"] < 0.4
    # unlisted source never appears
    assert all(src != "other" for _, _, src, _ in got)


def test_partition_independent_and_sharded():
    tbl = _docs(2000)
    a = _run(tbl, seed=9, n_shards=8)
    b = sorted((r["doc_id"], r["epoch"], r["source"], r["shard"])
               for r in mixture_interleave(
                   ray.data.from_arrow(tbl).repartition(1),
                   "source", "doc_id", WEIGHTS, seed=9,
                   n_shards=8).take_all())
    assert a == b
    shards = {s for _, _, _, s in a}
    assert shards == set(range(8))
    # repeated epochs of the same doc land on different shards (mixing)
    by_doc = {}
    for did, e, _, s in a:
        by_doc.setdefault(did, set()).add(s)
    multi = [v for v in by_doc.values() if len(v) > 1]
    assert len(multi) > 100  # overwhelmingly decorrelated across epochs


class TestUnimaxPlan:
    def test_plan_matches_duckdb_and_executes(self, ray_session):
        import duckdb

        from insurance_pdf_extractor_ray.pipelines.mixing import (
            mixture_interleave,
            unimax_plan,
        )

        t = pa.table({
            "id": pa.array(list(range(1300)), pa.int64()),
            "src": pa.array(["big"] * 1000 + ["mid"] * 250 + ["tiny"] * 50,
                            pa.string()),
        })
        plan = unimax_plan(ray.data.from_arrow(t), "src", tau=2.0,
                           max_epochs=4.0)
        got = sorted(zip(plan.column("source").to_pylist(),
                         plan.column("n").to_pylist(),
                         plan.column("weight").to_pylist(),
                         plan.column("full_epochs").to_pylist()))
        con = duckdb.connect()
        con.register("t", t)
        want = sorted(tuple(r) for r in con.execute("""
            WITH c AS (SELECT src AS source, count(*) AS n FROM t GROUP BY 1),
            s AS (SELECT sum(pow(n, 0.5)) AS z, sum(n) AS total FROM c)
            SELECT source, n,
                   round(least(total * pow(n, 0.5) / z / n, 4.0), 6)
                     AS weight,
                   CAST(floor(round(least(total * pow(n, 0.5) / z / n, 4.0),
                                    6)) AS BIGINT) AS full_epochs
            FROM c, s
        """).fetchall())
        assert got == want
        weights = dict(zip(plan.column("source").to_pylist(),
                           plan.column("weight").to_pylist()))
        # temperature flattens: tiny up-weighted above 1, big below 1
        assert weights["tiny"] > 1.0 > weights["big"]
        # executing the plan lands within 2% of the budget per source
        out = mixture_interleave(ray.data.from_arrow(t), "src", "id",
                                 weights, seed=3)
        import collections
        kept = collections.Counter(r["src"] for r in out.take_all())
        for s, n0 in (("big", 1000), ("mid", 250), ("tiny", 50)):
            assert abs(kept[s] - weights[s] * n0) <= max(0.02 * n0 * weights[s], 6)
