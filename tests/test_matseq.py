"""materialize_sequences vs a DuckDB re-derivation over word arrays."""

import duckdb
import pyarrow as pa
import pytest
import ray
import ray.data

from insurance_pdf_extractor_ray.pipelines.packing import (
    materialize_sequences,
)

pytestmark = pytest.mark.usefixtures("ray_session")

DOCS = pa.table({
    "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    "text": pa.array([
        "a b c d e",             # 5 tokens
        "f g",                   # straddles seq 0/1 boundary at L=6
        "",                      # empty: no contribution
        "h i j k l m n o p",     # 9 tokens: spans multiple seqs
        "q",
    ], pa.string()),
})

L = 6

SQL = f"""
WITH d AS (
  SELECT doc_id, regexp_extract_all(text, '\\S+') AS w,
         len(regexp_extract_all(text, '\\S+')) AS n FROM t
), cum AS (
  SELECT doc_id, w, n,
         CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           AS start_tok
  FROM d
), pairs AS (
  SELECT doc_id, w, n, start_tok,
         unnest(generate_series(start_tok // {L},
                                (start_tok + n - 1) // {L})) AS seq_id
  FROM cum WHERE n > 0
), slices AS (
  SELECT seq_id, doc_id,
         array_to_string(w[greatest(seq_id * {L} - start_tok, 0) + 1 :
                           least((seq_id + 1) * {L} - start_tok, n)],
                         ' ') AS piece,
         least((seq_id + 1) * {L} - start_tok, n)
           - greatest(seq_id * {L} - start_tok, 0) AS ntok
  FROM pairs)
SELECT seq_id, string_agg(piece, ' ' ORDER BY doc_id) AS seq_text,
       sum(ntok) AS n_tokens, count(*) AS n_docs
FROM slices GROUP BY seq_id ORDER BY seq_id
"""


def test_matches_duckdb():
    out = materialize_sequences(
        ray.data.from_arrow(DOCS).repartition(3), "doc_id", "text",
        seq_len=L, bucket=2, num_partitions=2)
    got = sorted((r["seq_id"], r["seq_text"], r["n_tokens"], r["n_docs"])
                 for r in out.take_all())
    con = duckdb.connect()
    con.register("t", DOCS)
    want = [tuple(r) for r in con.execute(SQL).fetchall()]
    assert got == want
    # every sequence except the last is exactly L tokens
    assert all(n == L for _, _, n, _ in got[:-1])
    full = " ".join(x for x in DOCS.column("text").to_pylist() if x)
    assert " ".join(s for _, s, _, _ in got) == full
