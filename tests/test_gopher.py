"""Gopher-style repetition signals vs a DuckDB re-derivation over n-gram
STRINGS (engine uses rolling hashes internally)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from insurance_pdf_extractor_ray.pipelines.textpipe import gopher_repetition

pytestmark = pytest.mark.usefixtures("ray_session")

DOCS = pa.table({
    "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
    "text": pa.array([
        "home about contact " * 40,            # nav menu repeated: fails
        "a perfectly ordinary sentence with mostly distinct words in it",
        "spam spam spam spam spam spam",       # unigram dup: fails
        "",                                    # empty
        "one two",                             # too short for trigrams
    ], pa.string()),
})

SQL = """
WITH wn AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw FROM t
), uni AS (
  SELECT doc_id, count(DISTINCT x) AS nd FROM wn, unnest(w) AS u(x)
  GROUP BY doc_id
), bi AS (
  SELECT doc_id, max(CASE WHEN c >= 2 THEN c ELSE 0 END) AS m FROM (
    SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g, count(*) AS c
    FROM wn, unnest(generate_series(1, nw - 1)) AS s(i) WHERE nw >= 2
    GROUP BY doc_id, g) GROUP BY doc_id
), tri AS (
  SELECT doc_id, max(CASE WHEN c >= 2 THEN c ELSE 0 END) AS m FROM (
    SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g, count(*) AS c
    FROM wn, unnest(generate_series(1, nw - 2)) AS s(i) WHERE nw >= 3
    GROUP BY doc_id, g) GROUP BY doc_id)
SELECT wn.doc_id, wn.nw AS n_words,
  CASE WHEN wn.nw > 0 THEN round(1 - uni.nd * 1.0 / wn.nw, 6) ELSE 0 END
    AS frac_dup_unigrams,
  round(coalesce(bi.m * 2.0 / wn.nw, 0), 6) AS frac_top_bigram,
  round(coalesce(tri.m * 3.0 / wn.nw, 0), 6) AS frac_top_trigram
FROM wn LEFT JOIN uni USING (doc_id) LEFT JOIN bi USING (doc_id)
LEFT JOIN tri USING (doc_id) ORDER BY doc_id
"""


def test_matches_duckdb():
    out = gopher_repetition(ray.data.from_arrow(DOCS).repartition(3))
    got = sorted((r["doc_id"], r["n_words"], r["frac_dup_unigrams"],
                  r["frac_top_bigram"], r["frac_top_trigram"])
                 for r in out.take_all())
    con = duckdb.connect()
    con.register("t", DOCS)
    want = [tuple(r) for r in con.execute(SQL).fetchall()]
    assert got == want


def test_keep_flags():
    out = {r["doc_id"]: r["keep"] for r in
           gopher_repetition(ray.data.from_arrow(DOCS)).take_all()}
    assert not out[0] and not out[2]       # nav spam + unigram spam fail
    assert out[1] and out[3] and out[4]    # normal, empty, short pass


def test_nfc_normalize_matches_duckdb():
    from insurance_pdf_extractor_ray.pipelines.textpipe import nfc_normalize

    t = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "café au lait",         # combining acute -> composed
            "plain ascii only",
            "Ångström",       # ring + diaeresis
            "",
        ], pa.string()),
    })
    out = {r["doc_id"]: (r["text_nfc"], r["changed"]) for r in
           nfc_normalize(ray.data.from_arrow(t).repartition(2)).take_all()}
    con = duckdb.connect()
    con.register("t", t)
    want = dict(con.execute(
        "SELECT doc_id, nfc_normalize(text) FROM t").fetchall())
    for did, (got, changed) in out.items():
        assert got == want[did], did
        assert changed == (got != t.column("text")[did].as_py())
    assert out[0][1] and out[2][1] and not out[1][1] and not out[3][1]
