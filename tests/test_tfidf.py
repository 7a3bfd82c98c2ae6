"""TF-IDF pipeline vs a DuckDB re-derivation with the same tokenizer."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.tfidf import (
    doc_freq,
    term_freq,
    tfidf_table,
    tokenize,
    top_term_per_doc,
)

pytestmark = pytest.mark.usefixtures("ray_session")

DOCS = pa.table({
    "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
    "text": pa.array([
        "The cat sat on the mat. THE CAT!",
        "a dog chased the cat across the yard",
        "numbers 42 and 42 and 7 repeat: 42",
        "",
    ], pa.string()),
})


def _collect(ds):
    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    return pa.concat_tables(tables) if tables else None


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    c.register("documents", DOCS)
    return c


def test_tokenize_matches_regexp_extract_all(con):
    toks = _collect(tokenize(ray.data.from_arrow(DOCS).repartition(4), "text", "doc_id"))
    got = sorted(zip(toks.column("doc_id").to_pylist(),
                     toks.column("token").to_pylist()))
    want = sorted(map(tuple, con.execute("""
        SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
        FROM documents
    """).fetchall()))
    assert got == want


def test_tf_df_match_sql(con):
    tf = term_freq(tokenize(ray.data.from_arrow(DOCS), "text", "doc_id"), "doc_id")
    got_tf = sorted((r["doc_id"], r["token"], r["tf"]) for r in tf.take_all())
    want_tf = sorted(map(tuple, con.execute("""
        SELECT doc_id, token, COUNT(*) FROM (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) token
          FROM documents) GROUP BY doc_id, token
    """).fetchall()))
    assert got_tf == want_tf

    df = doc_freq(term_freq(tokenize(ray.data.from_arrow(DOCS), "text", "doc_id"),
                            "doc_id"))
    got_df = sorted((r["token"], r["df"]) for r in df.take_all())
    want_df = sorted(map(tuple, con.execute("""
        SELECT token, COUNT(DISTINCT doc_id) FROM (
          SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) token
          FROM documents) GROUP BY token
    """).fetchall()))
    assert got_df == want_df


def test_tfidf_values():
    out = _collect(tfidf_table(ray.data.from_arrow(DOCS), "text", "doc_id"))
    rows = {(r["doc_id"], r["token"]): r for r in out.to_pylist()}
    # 'the' appears 3x in doc 0 (The/the/THE), in 2 of 4 docs
    r = rows[(0, "the")]
    assert r["tf"] == 3 and r["df"] == 2
    assert r["tfidf"] == pytest.approx(3 * np.log(4 / 2))
    # '42' appears 3x only in doc 2
    r = rows[(2, "42")]
    assert r["tf"] == 3 and r["df"] == 1
    assert r["tfidf"] == pytest.approx(3 * np.log(4.0))


def test_top_term_per_doc_integer_order(con):
    out = _collect(top_term_per_doc(ray.data.from_arrow(DOCS).repartition(4),
                                    "text", "doc_id"))
    got = {r["doc_id"]: r["token"] for r in out.to_pylist()}
    want = dict(con.execute("""
        SELECT doc_id, token FROM (
          SELECT doc_id, token,
                 row_number() OVER (PARTITION BY doc_id
                                    ORDER BY tf DESC, df ASC, token ASC) rn
          FROM (
            SELECT tf.doc_id, tf.token, tf.tf, df.df FROM
              (SELECT doc_id, token, COUNT(*) tf FROM (
                 SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) token
                 FROM documents) GROUP BY doc_id, token) tf
              JOIN
              (SELECT token, COUNT(DISTINCT doc_id) df FROM (
                 SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) token
                 FROM documents) GROUP BY token) df
              USING (token)))
        WHERE rn = 1
    """).fetchall())
    assert got == want
    assert 3 not in got  # empty doc has no terms


def test_ngram_overlap_tag_matches_sql():
    from insurance_pdf_extractor_ray.pipelines.tfidf import ngram_overlap_tag

    docs = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([
            "one two three four five six",
            "zzz one two three four five six yyy",   # contains doc0's 6-gram
            "totally different words here entirely now",
            "one two three four",                     # too short for 6-grams? len 4 < 6 -> 0
        ], pa.string()),
    })
    evald = docs.filter(pa.compute.equal(docs.column("doc_id"), 0))
    out = ngram_overlap_tag(
        ray.data.from_arrow(docs).repartition(3),
        ray.data.from_arrow(evald), "text", "doc_id", n=6).take_all()
    got = {r["doc_id"]: r["n_overlap"] for r in out}

    con = duckdb.connect()
    con.register("d", docs)
    con.register("ev", evald)
    want = dict(con.execute("""
        WITH tok AS (SELECT doc_id, regexp_extract_all(lower(text), '\\S+') ts FROM d),
        g AS (SELECT doc_id, array_to_string(ts[i:i+5], ' ') AS gram
              FROM tok, unnest(generate_series(1, len(ts) - 5)) AS t(i)),
        etok AS (SELECT regexp_extract_all(lower(text), '\\S+') ts FROM ev),
        eg AS (SELECT DISTINCT array_to_string(ts[i:i+5], ' ') AS gram
               FROM etok, unnest(generate_series(1, len(ts) - 5)) AS t(i))
        SELECT tok.doc_id,
               COALESCE((SELECT COUNT(*) FROM g
                         WHERE g.doc_id = tok.doc_id
                           AND g.gram IN (SELECT gram FROM eg)), 0)
        FROM tok
    """).fetchall())
    assert got == want
    assert got[0] == 1 and got[1] == 1 and got[2] == 0 and got[3] == 0


def test_vocab_counts_matches_sql(con):
    from insurance_pdf_extractor_ray.pipelines.tfidf import vocab_counts

    rng = np.random.RandomState(2)
    words = ["alpha", "beta", "gamma", "delta", "x9", "longword"]
    texts = [" ".join(rng.choice(words, rng.randint(0, 30)))
             for _ in range(500)]
    tbl = pa.table({"doc_id": pa.array(range(500), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = vocab_counts(ray.data.from_arrow(tbl).repartition(8),
                       "text", "doc_id", k=4).take_all()
    got = sorted((r["token"], r["n"]) for r in out)
    con.register("vdocs", tbl)
    want = sorted(con.execute("""
        SELECT token, count(*) FROM (
          SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
          FROM vdocs) GROUP BY 1 ORDER BY 2 DESC, 1 LIMIT 4
    """).fetchall())
    assert got == [tuple(w) for w in want]


class TestBM25:
    def _corpus(self):
        rng = np.random.RandomState(7)
        words = ["spark", "shuffle", "window", "merge", "scan", "row",
                 "table", "agg"]
        texts = [" ".join(rng.choice(words, rng.randint(1, 60)))
                 for _ in range(300)]
        return pa.table({"doc_id": pa.array(range(300), pa.int64()),
                         "text": pa.array(texts, pa.string())})

    def test_matches_sql(self):
        from insurance_pdf_extractor_ray.pipelines.tfidf import bm25_search

        tbl = self._corpus()
        got = bm25_search(ray.data.from_arrow(tbl).repartition(6),
                          "text", "doc_id",
                          query_terms=["spark", "window"], k=10)
        con2 = duckdb.connect()
        con2.register("docs", tbl)
        want = con2.execute("""
            WITH dl AS (SELECT doc_id,
                          len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                          AS dl FROM docs),
            stats AS (SELECT count(*) AS n_docs,
                             sum(dl)*1.0/count(*) AS avgdl FROM dl),
            toks AS (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS token FROM docs),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
                   WHERE token IN ('spark', 'window') GROUP BY 1, 2),
            df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
            SELECT t.doc_id,
                   round(sum(ln((s.n_docs - d.df + 0.5)/(d.df + 0.5) + 1.0)
                             * t.tf*2.2/(t.tf + 1.2*(0.25 + 0.75*l.dl/s.avgdl))), 6)
                   AS score
            FROM tf t JOIN df d USING (token) JOIN dl l USING (doc_id)
            CROSS JOIN stats s
            GROUP BY t.doc_id ORDER BY score DESC, t.doc_id LIMIT 10
        """).fetchall()
        assert got.column("doc_id").to_pylist() == [w[0] for w in want]
        for g, w in zip(got.column("score").to_pylist(), want):
            assert abs(g - w[1]) < 1e-9

    def test_rare_term_outranks_common(self):
        from insurance_pdf_extractor_ray.pipelines.tfidf import bm25_search

        # 'rare' in one doc, 'common' everywhere: the rare-term doc must win
        texts = ["common rare"] + ["common filler"] * 50
        tbl = pa.table({"doc_id": pa.array(range(51), pa.int64()),
                        "text": pa.array(texts, pa.string())})
        got = bm25_search(ray.data.from_arrow(tbl), "text", "doc_id",
                          query_terms=["rare", "common"], k=3)
        assert got.column("doc_id").to_pylist()[0] == 0


def test_ngram_counts_matches_sql(con):
    from insurance_pdf_extractor_ray.pipelines.tfidf import ngram_counts

    rng = np.random.RandomState(5)
    words = ["red", "blue", "green", "car", "boat"]
    texts = [" ".join(rng.choice(words, rng.randint(0, 12)))
             for _ in range(300)]
    tbl = pa.table({"doc_id": pa.array(range(300), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = ngram_counts(ray.data.from_arrow(tbl).repartition(8),
                       "text", "doc_id", n=2, k=10).take_all()
    got = sorted((r["ngram"], r["n"]) for r in out)
    con2 = duckdb.connect()
    con2.register("ndocs", tbl)
    want = sorted(tuple(w) for w in con2.execute("""
        WITH w AS (SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                   FROM ndocs),
        b AS (SELECT unnest(list_transform(generate_series(1, len(ws) - 1),
                i -> ws[i] || ' ' || ws[i + 1])) AS g FROM w)
        SELECT g, count(*) FROM b GROUP BY 1
        ORDER BY 2 DESC, 1 LIMIT 10""").fetchall())
    assert got == [tuple(w) for w in want]


def test_ngram_counts_no_cross_document_windows(con):
    from insurance_pdf_extractor_ray.pipelines.tfidf import ngram_counts

    tbl = pa.table({"doc_id": pa.array([0, 1], pa.int64()),
                    "text": pa.array(["one two", "three four"], pa.string())})
    out = ngram_counts(ray.data.from_arrow(tbl), "text", "doc_id",
                       n=2, k=10).take_all()
    grams = sorted(r["ngram"] for r in out)
    assert grams == ["one two", "three four"]


class TestUnigramLogprob:
    """Integer micro-nat quantization BEFORE the reduction — engine and SQL
    must agree bit-for-bit, whatever the block layout."""

    SQL = """
        WITH toks AS (SELECT doc_id,
                        unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                        AS token FROM documents),
        cnt AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
        tot AS (SELECT count(*) AS n FROM toks),
        lp AS (SELECT token, CAST(-floor(-ln(c * 1.0 / (SELECT n FROM tot))
                                          * 1000000 + 0.5) AS BIGINT) AS micro
               FROM cnt)
        SELECT t.doc_id, count(*) AS n_tokens, sum(lp.micro) AS logprob_micro
        FROM toks t JOIN lp USING (token) GROUP BY t.doc_id ORDER BY doc_id
    """

    def _got(self, **kw):
        from insurance_pdf_extractor_ray.pipelines.tfidf import unigram_logprob

        out = unigram_logprob(ray.data.from_arrow(DOCS).repartition(3),
                              "text", "doc_id", **kw)
        return sorted((r["doc_id"], r["n_tokens"], r["logprob_micro"])
                      for r in out.take_all())

    def test_matches_sql(self, con):
        want = sorted(map(tuple, con.execute(self.SQL).fetchall()))
        assert self._got() == want
        # empty doc 3 excluded on both sides
        assert all(d != 3 for d, _, _ in want)

    def test_join_path_identical(self):
        assert self._got(vocab_broadcast_max=0) == self._got()

    def test_rare_tokens_score_lower(self):
        got = {d: lp / nt for d, nt, lp in self._got()}
        # doc 2 is mostly rare numerals; doc 0 repeats common words
        assert got[2] < got[0]


class TestDsir:
    """DSIR importance weights: SQL-exact unigram form; hashed scale form."""

    TARGET = pa.table({
        "doc_id": pa.array([100, 101], pa.int64()),
        "text": pa.array([
            "insurance policy premium deductible coverage",
            "policy coverage claim premium insurer",
        ], pa.string()),
    })
    CORPUS = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array([
            "insurance policy coverage premium claim",   # target-like
            "dog cat fish bird hamster",                 # off-target
            "policy dog coverage cat",                   # mixed
        ], pa.string()),
    })

    def _weights(self, fn, **kw):
        out = fn(ray.data.from_arrow(self.CORPUS).repartition(2),
                 ray.data.from_arrow(self.TARGET), "text", "doc_id", **kw)
        return {r["doc_id"]: r["dsir_micro"] for r in out.take_all()}

    def test_unigram_ranks_target_like_docs_higher(self):
        from insurance_pdf_extractor_ray.pipelines.tfidf import dsir_logweight

        w = self._weights(dsir_logweight)
        assert w[0] > w[2] > w[1]

    def test_unigram_matches_brute_force(self):
        import math

        from insurance_pdf_extractor_ray.pipelines.tfidf import dsir_logweight

        src: dict = {}
        tgt: dict = {}
        for t in self.CORPUS.column("text").to_pylist():
            for tok in t.split():
                src[tok] = src.get(tok, 0) + 1
        for t in self.TARGET.column("text").to_pylist():
            for tok in t.split():
                tgt[tok] = tgt.get(tok, 0) + 1
        vocab = set(src) | set(tgt)
        stot = sum(src.values()) + len(vocab)
        ttot = sum(tgt.values()) + len(vocab)

        def micro(tok):
            x = (math.log((tgt.get(tok, 0) + 1) / ttot)
                 - math.log((src.get(tok, 0) + 1) / stot)) * 1e6
            return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

        want = {}
        for d, t in zip(self.CORPUS.column("doc_id").to_pylist(),
                        self.CORPUS.column("text").to_pylist()):
            want[d] = sum(micro(tok) for tok in t.split())
        assert self._weights(dsir_logweight) == want

    def test_hashed_ranks_and_layout_stability(self):
        from insurance_pdf_extractor_ray.pipelines.tfidf import (
            dsir_logweight_hashed,
        )

        w = self._weights(dsir_logweight_hashed, n_buckets=1 << 14)
        assert w[0] > w[2] > w[1]
        # bucket collisions only perturb, never break determinism
        out2 = dsir_logweight_hashed(
            ray.data.from_arrow(self.CORPUS).repartition(3),
            ray.data.from_arrow(self.TARGET).repartition(2),
            "text", "doc_id", n_buckets=1 << 14)
        assert {r["doc_id"]: r["dsir_micro"] for r in out2.take_all()} == w


class TestBigramLogprob:
    SQL = """
        WITH w AS (SELECT doc_id,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                   FROM t),
        tok AS (SELECT unnest(ws) AS token FROM w),
        v AS (SELECT COUNT(DISTINCT token) AS v FROM tok),
        b AS (SELECT doc_id, unnest(list_transform(
                generate_series(1, len(ws) - 1),
                i -> ws[i] || ' ' || ws[i + 1])) AS bigram FROM w),
        cb AS (SELECT bigram, COUNT(*) AS c FROM b GROUP BY 1),
        ctx AS (SELECT string_split(bigram, ' ')[1] AS tok1, SUM(c) AS cc
                FROM cb GROUP BY 1),
        mu AS (SELECT cb.bigram,
                 CAST(-floor(-(ln((cb.c + 1.0) / (ctx.cc + v.v))
                              * 1000000) + 0.5) AS BIGINT) AS mu
               FROM cb, ctx, v
               WHERE string_split(cb.bigram, ' ')[1] = ctx.tok1)
        SELECT b.doc_id, COUNT(*) AS n, CAST(SUM(mu.mu) AS BIGINT) AS lp
        FROM b JOIN mu USING (bigram) GROUP BY 1 ORDER BY 1
    """

    def _want(self, tbl):
        con = duckdb.connect()
        con.register("t", tbl)
        return con.execute(self.SQL).fetchall()

    def _got(self, tbl, **kw):
        from insurance_pdf_extractor_ray.pipelines.tfidf import bigram_logprob

        rows = bigram_logprob(ray.data.from_arrow(tbl).repartition(3),
                              "text", "doc_id", **kw).take_all()
        rows.sort(key=lambda r: r["doc_id"])
        return [(r["doc_id"], r["n_bigrams"], r["bigram_lp_micro"])
                for r in rows]

    def test_matches_sql_and_drops_short_docs(self):
        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
            "text": pa.array([
                "the cat sat on the mat the cat ran",
                "a dog chased the cat across the yard the dog won",
                "one",  # single token: no bigrams -> excluded
                "",     # empty -> excluded
                "numbers 42 and 42 and 7 repeat 42",
            ], pa.string()),
        })
        got = self._got(tbl)
        assert got == self._want(tbl)
        assert [d for d, _, _ in got] == [0, 1, 4]

    def test_join_path_matches_broadcast_path(self):
        rng = np.random.RandomState(7)
        words = np.array(["alpha", "beta", "gamma", "delta", "eps"])
        texts = [" ".join(rng.choice(words, rng.randint(2, 12)))
                 for _ in range(120)]
        tbl = pa.table({"doc_id": pa.array(range(120), pa.int64()),
                        "text": pa.array(texts, pa.string())})
        broad = self._got(tbl)
        joined = self._got(tbl, vocab_broadcast_max=0)
        assert broad == joined == self._want(tbl)
