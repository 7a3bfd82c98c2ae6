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


class TestChunkText:
    def test_char_exact_vs_substr_including_unicode(self):
        from insurance_pdf_extractor_ray.pipelines.packing import chunk_text

        texts = ["hello world, this is a doc", "xy", "", "héllo wörld ünïcode!",
                 "a" * 37]
        t = pa.table({"doc_id": pa.array(range(len(texts))),
                      "text": pa.array(texts)})
        out = chunk_text(ray.data.from_arrow(t).repartition(3),
                         "doc_id", "text", size=10, overlap=4)
        mine = sorted(out.take_all(),
                      key=lambda r: (r["doc_id"], r["chunk_id"]))
        con = duckdb.connect()
        con.register("t", t)
        want = con.execute("""
            WITH s AS (SELECT doc_id, text, unnest(generate_series(
                0, CAST(length(text) AS BIGINT) - 1, 6)) AS gs FROM t)
            SELECT doc_id, CAST(gs / 6 AS BIGINT) AS chunk_id,
                   substr(text, CAST(gs AS BIGINT) + 1, 10) AS chunk_text
            FROM s ORDER BY 1, 2
        """).fetch_arrow_table().to_pylist()
        assert mine == want
        # empty doc emits nothing; every doc covered to its last char
        assert all(r["doc_id"] != 2 for r in mine)

    def test_overlap_continuity(self):
        from insurance_pdf_extractor_ray.pipelines.packing import chunk_text

        t = pa.table({"doc_id": pa.array([1]), "text": pa.array(["abcdefghij"])})
        rows = sorted(chunk_text(ray.data.from_arrow(t), "doc_id", "text",
                                 size=6, overlap=2).take_all(),
                      key=lambda r: r["chunk_id"])
        chunks = [r["chunk_text"] for r in rows]
        assert chunks == ["abcdef", "efghij", "ij"]
        for a, b in zip(chunks, chunks[1:]):
            assert a[-2:] == b[:2]
