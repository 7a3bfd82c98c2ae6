"""Entity-resolution components (fuzzy edges -> transitive closure) vs a
DuckDB recursive-CTE oracle."""

import duckdb
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.fuzzy import entity_components

pytestmark = pytest.mark.usefixtures("ray_session")

CUST = pa.table({
    "id": pa.array(list(range(1, 9)), pa.int64()),
    "name": pa.array(["abcd", "abce", "abcf", "zzzz", "zzzy",
                      "qqqq", "abcd", "abcg"], pa.string()),
    "blk": pa.array([0, 0, 0, 1, 1, 0, 0, 1], pa.int64()),
})


def _oracle(block: bool):
    con = duckdb.connect()
    con.register("c", CUST)
    blk = "AND a.blk = b.blk" if block else ""
    return sorted(tuple(r) for r in con.execute(f"""
        WITH RECURSIVE pairs AS (
          SELECT a.id AS id_a, b.id AS id_b FROM c a, c b
          WHERE a.id < b.id {blk} AND levenshtein(a.name, b.name) <= 1),
        edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                  UNION ALL SELECT id_b, id_a FROM pairs),
        reach AS (SELECT src AS id, src AS r FROM edges
                  UNION
                  SELECT e.dst, reach.r FROM reach
                  JOIN edges e ON reach.id = e.src)
        SELECT id, MIN(r) FROM reach GROUP BY id""").fetchall())


def _got(**kw):
    ds = ray.data.from_arrow(CUST).repartition(3)
    out = entity_components(ds, "id", "name", **kw).take_all()
    return sorted((r["id"], r["root"]) for r in out)


def test_unblocked_matches_recursive_cte():
    assert _got() == _oracle(block=False)


def test_blocked_matches_recursive_cte():
    assert _got(block_col="blk") == _oracle(block=True)


def test_distributed_label_propagation_same_answer():
    assert _got(distributed=True) == _got(distributed=False)
