"""Readability, per-doc character entropy, and grouped category entropy —
each vs its exact DuckDB re-derivation (entropy() is DuckDB's own log2
Shannon aggregate)."""

import math

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.statagg import entropy_by_key
from insurance_pdf_extractor_ray.pipelines.textpipe import (char_entropy,
                                                            readability)

pytestmark = pytest.mark.usefixtures("ray_session")

DOCS = pa.table({
    "doc_id": pa.array(range(7), pa.int64()),
    "text": pa.array([
        "Hello world. How are you?! Fine...",
        "xyz 7 42",                      # no sentence enders -> clamp 1
        "",                              # excluded everywhere
        "aaaaaa",                        # zero entropy
        "The quick brown fox jumps over the lazy dog. It runs! Far?",
        "naïve café — ünïcode test. Ünïcode again!",
        "!!! ??? ...",                   # punctuation only: no words
    ], pa.string()),
})


def _r6(v: float) -> float:
    return math.floor(v * 1e6 + 0.5) / 1e6 if v >= 0 else None


class TestReadability:
    SQL = """
        SELECT doc_id,
          len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w,
          greatest(len(regexp_extract_all(text, '[.!?]+')), 1) AS s,
          len(regexp_extract_all(lower(text), '[aeiouy]+')) AS syl,
          CAST(-floor(-((206.835 - 1.015*(w*1.0/s) - 84.6*(syl*1.0/w))
                        *1000000) + 0.5) AS BIGINT) AS mu
        FROM t
        WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0
        ORDER BY doc_id
    """

    def test_matches_sql_and_excludes_wordless(self):
        con = duckdb.connect()
        con.register("t", DOCS)
        want = con.execute(self.SQL).fetchall()
        rows = readability(ray.data.from_arrow(DOCS).repartition(3),
                           "text", "doc_id").take_all()
        rows.sort(key=lambda r: r["doc_id"])
        got = [(r["doc_id"], r["n_words"], r["n_sentences"],
                r["n_syllables"], r["fre_micro"]) for r in rows]
        assert got == [tuple(r) for r in want]
        ids = [d for d, *_ in got]
        assert 2 not in ids and 6 not in ids  # empty + punctuation-only

    def test_human_band_ordering(self):
        # simple prose should score far above vowel-dense junk
        tbl = pa.table({
            "doc_id": pa.array([0, 1], pa.int64()),
            "text": pa.array([
                "The cat sat. The dog ran. It was fun.",
                "onomatopoeia euouae audiovisualization " * 5,
            ], pa.string()),
        })
        rows = readability(ray.data.from_arrow(tbl), "text",
                           "doc_id").take_all()
        by = {r["doc_id"]: r["fre_micro"] for r in rows}
        assert by[0] > by[1]


class TestCharEntropy:
    def test_matches_duckdb_entropy(self):
        con = duckdb.connect()
        con.register("t", DOCS)
        want = con.execute("""
            WITH c AS (SELECT doc_id,
                         unnest(regexp_split_to_array(text, '')) AS ch
                       FROM t WHERE text <> '')
            SELECT doc_id, COUNT(*), round(entropy(ch), 6)
            FROM c GROUP BY 1 ORDER BY 1
        """).fetchall()
        rows = char_entropy(ray.data.from_arrow(DOCS).repartition(3),
                            "text", "doc_id").take_all()
        rows.sort(key=lambda r: r["doc_id"])
        got = [(r["doc_id"], r["n_chars_h"], _r6(r["char_entropy"]))
               for r in rows]
        assert got == [tuple(r) for r in want]

    def test_bounds_and_degenerates(self):
        rows = char_entropy(ray.data.from_arrow(DOCS), "text",
                            "doc_id").take_all()
        by = {r["doc_id"]: r for r in rows}
        assert 2 not in by                       # empty excluded
        assert by[3]["char_entropy"] == 0.0      # single repeated char
        for r in rows:  # H <= log2(distinct) <= log2(n)
            assert 0.0 <= r["char_entropy"] <= math.log2(r["n_chars_h"]) + 1e-9

    def test_layout_independence(self):
        a = char_entropy(ray.data.from_arrow(DOCS).repartition(1),
                         "text", "doc_id").take_all()
        b = char_entropy(ray.data.from_arrow(DOCS).repartition(5),
                         "text", "doc_id").take_all()
        key = lambda r: r["doc_id"]
        assert sorted(a, key=key) == sorted(b, key=key)


class TestEntropyByKey:
    def test_matches_duckdb_grouped_entropy(self):
        rng = np.random.RandomState(11)
        n = 5000
        tbl = pa.table({
            "k": pa.array(rng.randint(0, 40, n), pa.int64()),
            "cat": pa.array(rng.choice(["a", "b", "c", "d", "e"],
                                       n, p=[.5, .2, .15, .1, .05]),
                            pa.string()),
        })
        con = duckdb.connect()
        con.register("t", tbl)
        want = con.execute("""
            SELECT k, round(entropy(cat), 6), COUNT(DISTINCT cat)
            FROM t GROUP BY 1 ORDER BY 1
        """).fetchall()
        out = entropy_by_key(ray.data.from_arrow(tbl).repartition(7),
                             "k", "cat").take_all()
        out.sort(key=lambda r: r["k"])
        got = [(r["k"], _r6(r["entropy"]), r["n_cats"]) for r in out]
        assert got == [tuple(r) for r in want]

    def test_single_category_zero(self):
        tbl = pa.table({"k": pa.array([1, 1, 1], pa.int64()),
                        "cat": pa.array(["x", "x", "x"], pa.string())})
        out = entropy_by_key(ray.data.from_arrow(tbl), "k", "cat").take_all()
        assert out[0]["entropy"] == 0.0 and out[0]["n_cats"] == 1
