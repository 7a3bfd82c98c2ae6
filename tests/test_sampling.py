"""Deterministic sampling vs the exact DuckDB predicate."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.sampling import (
    assign_split,
    hash_sample,
    sample_sql_predicate,
    stratified_hash_sample,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _tbl(n=20_000):
    rng = np.random.RandomState(1)
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "source": pa.array(rng.choice(["cc", "wiki", "code"], n), pa.string()),
    })


def test_hash_sample_matches_sql_predicate():
    tbl = _tbl()
    got = hash_sample(ray.data.from_arrow(tbl).repartition(8),
                      "doc_id", rate=0.25, seed=7).take_all()
    got_ids = sorted(r["doc_id"] for r in got)
    con = duckdb.connect()
    con.register("t", tbl)
    want = [r[0] for r in con.execute(
        f"SELECT doc_id FROM t WHERE {sample_sql_predicate('doc_id', 0.25, 7)}"
        " ORDER BY doc_id").fetchall()]
    assert got_ids == want
    assert 0.2 < len(got_ids) / tbl.num_rows < 0.3


def test_partition_independence():
    """Identical keep set regardless of block layout — the resume guarantee."""
    tbl = _tbl(5000)
    a = {r["doc_id"] for r in hash_sample(
        ray.data.from_arrow(tbl).repartition(2), "doc_id", 0.1, seed=3).take_all()}
    b = {r["doc_id"] for r in hash_sample(
        ray.data.from_arrow(tbl).repartition(37), "doc_id", 0.1, seed=3).take_all()}
    assert a == b


def test_stratified_rates():
    tbl = _tbl()
    out = stratified_hash_sample(
        ray.data.from_arrow(tbl).repartition(8), "source", "doc_id",
        rates={"cc": 0.1, "wiki": 1.0}, default_rate=0.0, seed=0).take_all()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], set()).add(r["doc_id"])
    n_wiki_total = sum(1 for s in tbl.column("source").to_pylist() if s == "wiki")
    assert len(by_src["wiki"]) == n_wiki_total          # rate 1.0 keeps all
    assert "code" not in by_src                          # default 0.0 drops all
    n_cc_total = sum(1 for s in tbl.column("source").to_pylist() if s == "cc")
    assert 0.05 < len(by_src["cc"]) / n_cc_total < 0.15  # ~10%


def test_assign_split_partitions_exactly():
    tbl = _tbl(10_000)
    out = assign_split(ray.data.from_arrow(tbl), "doc_id",
                       test_rate=0.1, val_rate=0.05, seed=11).take_all()
    counts = {}
    for r in out:
        counts[r["split"]] = counts.get(r["split"], 0) + 1
    assert sum(counts.values()) == 10_000
    assert 800 < counts["test"] < 1200
    assert 350 < counts["val"] < 650
    # splits are disjoint by construction; determinism across reruns
    again = assign_split(ray.data.from_arrow(tbl), "doc_id",
                         test_rate=0.1, val_rate=0.05, seed=11).take_all()
    assert {r["doc_id"]: r["split"] for r in out} == \
           {r["doc_id"]: r["split"] for r in again}


class TestWeightedSample:
    def test_partition_independent_and_matches_sql(self):
        from insurance_pdf_extractor_ray.pipelines.sampling import (
            weighted_sample_k,
            weighted_sql_rank,
        )

        rng = np.random.RandomState(21)
        t = pa.table({
            "id": pa.array(np.arange(5000)),
            "w": pa.array(rng.randint(1, 100, 5000).astype("float64")),
        })
        s1 = sorted(r["id"] for r in weighted_sample_k(
            ray.data.from_arrow(t), "id", "w", 50, seed=3).take_all())
        s2 = sorted(r["id"] for r in weighted_sample_k(
            ray.data.from_arrow(t).repartition(11), "id", "w", 50,
            seed=3).take_all())
        assert s1 == s2
        con = duckdb.connect()
        con.register("t", t)
        want = sorted(r[0] for r in con.execute(
            "SELECT id FROM t QUALIFY row_number() OVER (ORDER BY "
            + weighted_sql_rank("id", "w", seed=3) + ") <= 50").fetchall())
        assert s1 == want

    def test_weights_bias_inclusion(self):
        from insurance_pdf_extractor_ray.pipelines.sampling import weighted_sample_k

        # half the ids have 50x the weight; they should dominate the sample
        n = 2000
        w = np.where(np.arange(n) < n // 2, 50.0, 1.0)
        t = pa.table({"id": pa.array(np.arange(n)), "w": pa.array(w)})
        got = [r["id"] for r in weighted_sample_k(
            ray.data.from_arrow(t), "id", "w", 200, seed=0).take_all()]
        heavy = sum(1 for i in got if i < n // 2)
        assert heavy > 170
