"""Substring (k-word window) dedup vs a DuckDB re-derivation over window
STRINGS — the engine's rolling hashes never leave the pipeline, so a match
also bounds hash-collision impact."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from insurance_pdf_extractor_ray.pipelines.substrdedup import (
    dup_span_clean,
    dup_window_hashes,
)

pytestmark = pytest.mark.usefixtures("ray_session")

# hand-built corpus: docs 0/1 share an 8-word run, doc 2 repeats it twice
# INSIDE itself only (must NOT count as corpus-dup at min_docs=2 w/o doc 0/1),
# doc 3 short, doc 4 empty, doc 5 unique.
SHARED = "alpha beta gamma delta epsilon zeta eta theta"
DOCS = pa.table({
    "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
    "text": pa.array([
        f"unique lead-in words here {SHARED} trailing tail words",
        f"other open {SHARED} and a different ending run",
        f"{SHARED} middle filler {SHARED}",
        "too short for windows",
        "",
        "entirely unique document with its own eight word run present",
    ], pa.string()),
})


def _sql(k: int) -> str:
    return f"""
WITH wn AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw FROM documents
), wins AS (
  SELECT doc_id, i, array_to_string(w[i:i+{k - 1}], ' ') AS gram
  FROM wn, unnest(generate_series(1, nw - {k} + 1)) AS t(i) WHERE nw >= {k}
), dup AS (
  SELECT gram FROM wins GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
), dpos AS (
  SELECT doc_id, i FROM wins WHERE gram IN (SELECT gram FROM dup)
), wordrows AS (
  SELECT doc_id, t.i AS pos, w[t.i] AS word
  FROM wn, unnest(generate_series(1, nw)) AS t(i)
), covered AS (
  SELECT wr.doc_id, wr.pos, wr.word,
         EXISTS (SELECT 1 FROM dpos d WHERE d.doc_id = wr.doc_id
                 AND wr.pos BETWEEN d.i AND d.i + {k - 1}) AS cov
  FROM wordrows wr)
SELECT wn.doc_id, wn.nw AS n_words, greatest(wn.nw - {k} + 1, 0) AS n_windows,
       (SELECT count(*) FROM dpos d WHERE d.doc_id = wn.doc_id) AS n_dup_windows,
       (SELECT count(*) FROM covered c
        WHERE c.doc_id = wn.doc_id AND c.cov) AS n_dropped_words,
       coalesce((SELECT string_agg(c.word, ' ' ORDER BY c.pos) FROM covered c
                 WHERE c.doc_id = wn.doc_id AND NOT c.cov), '') AS clean_text
FROM wn ORDER BY doc_id"""


def _run(k=8, **kw):
    ds = ray.data.from_arrow(DOCS).repartition(3)
    out = dup_span_clean(ds, "text", "doc_id", k=k, **kw).to_pandas()
    return out.sort_values("doc_id").reset_index(drop=True)


@pytest.fixture(scope="module")
def expected():
    con = duckdb.connect()
    con.register("documents", DOCS)
    df = con.execute(_sql(8)).fetchdf()
    for c in df.columns:
        if c != "clean_text":
            df[c] = df[c].astype("int64")
    return df


def test_broadcast_path_matches_duckdb(expected):
    import pandas as pd

    pd.testing.assert_frame_equal(_run(), expected, check_dtype=False)


def test_join_path_matches_duckdb(expected):
    import pandas as pd

    out = _run(num_partitions=2)
    pd.testing.assert_frame_equal(out[list(expected.columns)], expected,
                                  check_dtype=False)


def test_semantics_literals(expected):
    """Doc 2's internal repeat is NOT a corpus-dup by itself — its drops come
    only from sharing SHARED with docs 0/1; doc 5 is untouched; empty/short
    docs survive with zero windows."""
    out = _run()
    by_id = out.set_index("doc_id")
    assert by_id.loc[5, "n_dup_windows"] == 0
    assert by_id.loc[5, "n_dropped_words"] == 0
    assert by_id.loc[3, "n_windows"] == 0
    assert by_id.loc[4, "n_words"] == 0 and by_id.loc[4, "clean_text"] == ""
    # the shared run is cut from every doc containing it
    for d in (0, 1, 2):
        assert "alpha beta gamma delta" not in by_id.loc[d, "clean_text"]
    # unique lead-ins survive
    assert by_id.loc[0, "clean_text"].startswith("unique lead in words here")


def test_min_docs_threshold():
    """SHARED lives in docs 0/1/2 — cut at min_docs<=3, kept at min_docs=4
    (doc 2's internal repeat adds occurrences but not distinct docs)."""
    assert _run(min_docs=4)["n_dropped_words"].sum() == 0
    assert _run(min_docs=3)["n_dropped_words"].sum() > 0


def test_dup_window_hashes_layout_independent():
    """Same dup-hash set whatever the block layout (per-batch partial
    distinct-doc counts must sum exactly)."""
    a = dup_window_hashes(ray.data.from_arrow(DOCS), "text", k=8)
    b = dup_window_hashes(ray.data.from_arrow(DOCS).repartition(6), "text", k=8)
    ha = sorted(r["__wh"] for r in a.take_all())
    hb = sorted(r["__wh"] for r in b.take_all())
    assert ha == hb and len(ha) > 0


class TestNgramDecontaminate:
    """Corpus docs 0-3 vs an eval set sharing SHARED — flags must match a
    DuckDB re-derivation over window strings, on both paths."""

    CORPUS = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            f"benchmark leak here {SHARED} trailing words",
            "totally clean document with nothing shared at all here",
            f"{SHARED} twice in one doc {SHARED}",
            "short",
        ], pa.string()),
    })
    EVAL = pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array([
            f"an eval prompt containing {SHARED} verbatim",
            "another eval doc with no overlap whatsoever present here now",
        ], pa.string()),
    })

    def _want(self, k=8, min_hits=1):
        con = duckdb.connect()
        con.register("corpus", self.CORPUS)
        con.register("ev", self.EVAL)
        return con.execute(f"""
WITH cw AS (
  SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw FROM corpus
), ew AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
         len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw FROM ev
), evg AS (
  SELECT DISTINCT array_to_string(w[i:i+{k-1}], ' ') AS gram
  FROM ew, unnest(generate_series(1, nw - {k} + 1)) AS t(i) WHERE nw >= {k}
), cg AS (
  SELECT doc_id, array_to_string(w[i:i+{k-1}], ' ') AS gram
  FROM cw, unnest(generate_series(1, nw - {k} + 1)) AS t(i) WHERE nw >= {k}
), hits AS (
  SELECT doc_id, count(*) AS n FROM cg
  WHERE gram IN (SELECT gram FROM evg) GROUP BY doc_id)
SELECT c.doc_id, greatest(c.nw - {k} + 1, 0) AS n_windows,
       coalesce(h.n, 0) AS n_eval_hits,
       coalesce(h.n, 0) >= {min_hits} AS contaminated
FROM cw c LEFT JOIN hits h USING (doc_id) ORDER BY doc_id
""").fetchall()

    def _got(self, **kw):
        from insurance_pdf_extractor_ray.pipelines.substrdedup import (
            ngram_decontaminate,
        )
        out = ngram_decontaminate(
            ray.data.from_arrow(self.CORPUS).repartition(3),
            ray.data.from_arrow(self.EVAL), "text", "doc_id", **kw)
        return sorted(
            ((r["doc_id"], r["n_windows"], r["n_eval_hits"],
              r["contaminated"]) for r in out.take_all()))

    def test_broadcast_matches_duckdb(self):
        got = self._got(k=8)
        assert got == [tuple(r) for r in self._want(k=8)]
        # sanity: doc 0 and 2 contaminated, 1 and 3 clean
        flags = {d: c for d, _, _, c in got}
        assert flags[0] and flags[2] and not flags[1] and not flags[3]

    def test_join_path_identical(self):
        assert self._got(k=8, num_partitions=2) == self._got(k=8)

    def test_min_hits_threshold(self):
        # doc 0 has exactly 1 hit window; doc 2 has 2 occurrences of SHARED
        got = {d: c for d, _, _, c in self._got(k=8, min_hits=2)}
        assert not got[0] and got[2]
