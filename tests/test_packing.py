"""Sequence packing vs a DuckDB window-cumsum re-derivation."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.packing import pack_sequences

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs(n=3000, seed=9):
    rng = np.random.RandomState(seed)
    lens = rng.randint(0, 900, n).astype("int64")  # includes zero-length docs
    return pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "n_tokens": pa.array(lens, pa.int64()),
    })


def _oracle(tbl, seq_len):
    con = duckdb.connect()
    con.register("d", tbl)
    return sorted(map(tuple, con.execute(f"""
        WITH c AS (
          SELECT doc_id, n_tokens,
                 CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS BIGINT) AS start_tok
          FROM d
        )
        SELECT doc_id, unnest(generate_series(start_tok // {seq_len},
                              (start_tok + n_tokens - 1) // {seq_len})) AS seq_id,
               start_tok, start_tok + n_tokens AS end_tok
        FROM c WHERE n_tokens > 0
    """).fetchall()))


@pytest.mark.parametrize("seq_len,bucket", [(2048, 500), (512, 100_000), (128, 64)])
def test_pack_matches_window_cumsum(seq_len, bucket):
    tbl = _docs()
    out = pack_sequences(ray.data.from_arrow(tbl).repartition(8),
                         "doc_id", "n_tokens", seq_len=seq_len,
                         bucket=bucket).take_all()
    got = sorted((r["doc_id"], r["seq_id"], r["start_tok"], r["end_tok"])
                 for r in out)
    assert got == _oracle(tbl, seq_len)


def test_pack_partition_independent():
    tbl = _docs(800)
    a = pack_sequences(ray.data.from_arrow(tbl).repartition(2),
                       "doc_id", "n_tokens", 256, bucket=50).take_all()
    b = pack_sequences(ray.data.from_arrow(tbl).repartition(31),
                       "doc_id", "n_tokens", 256, bucket=200).take_all()
    key = lambda rows: sorted((r["doc_id"], r["seq_id"]) for r in rows)
    assert key(a) == key(b)
