"""Dedup pipelines: exact vs DuckDB oracle; near-dup on a planted corpus."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines import dedup

SF = "/root/testdata/sf0.001"
pytestmark = pytest.mark.usefixtures("ray_session")


def _near_dup_corpus():
    """60 docs: 20 unique bases; each base has 2 near-copies (1-word change)
    -> 40 expected drops under keep-first."""
    rng = np.random.RandomState(7)
    words = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()
    ids, texts = [], []
    k = 0
    for b in range(20):
        base = " ".join(words[rng.randint(0, len(words))] for _ in range(60))
        for copy in range(3):
            t = base
            if copy:
                toks = t.split()
                toks[copy * 5] = "zulu"
                t = " ".join(toks)
            ids.append(k)
            texts.append(t)
            k += 1
    return pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)})


def test_exact_dedup_oracle():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    # plant real duplicates: union the table with a relabeled copy of itself
    dup = ds.map_batches(
        lambda t: t.set_column(t.schema.get_field_index("doc_id"),
                               "doc_id", pa.compute.add(t.column("doc_id"), 100000)),
        batch_format="pyarrow",
    )
    both = ds.union(dup)
    got = dedup.exact_dedup(both, "text", "doc_id").take_all()
    con = duckdb.connect()
    want = con.execute(
        f"""WITH unioned AS (SELECT * FROM '{SF}/documents.parquet'
                          UNION ALL
                          SELECT doc_id+100000 AS doc_id, text, lang, source, n_chars
                          FROM '{SF}/documents.parquet')
            SELECT min(doc_id) FROM unioned GROUP BY text ORDER BY 1"""
    ).fetchall()
    assert sorted(r["doc_id"] for r in got) == [w[0] for w in want]


def test_exact_dedup_strict_matches_fast():
    tbl = _near_dup_corpus()
    # make exact duplicates by doubling
    both = ray.data.from_arrow(tbl).union(
        ray.data.from_arrow(tbl.set_column(0, "doc_id", pa.compute.add(tbl.column("doc_id"), 1000)))
    )
    fast = sorted(r["doc_id"] for r in dedup.exact_dedup(both, "text", "doc_id").take_all())
    strict = sorted(r["doc_id"] for r in dedup.exact_dedup(both, "text", "doc_id", strict=True).take_all())
    assert fast == strict == list(range(60))


def test_minhash_dedup_finds_planted_near_dups():
    tbl = _near_dup_corpus()
    ds = ray.data.from_arrow(tbl)
    dup_ids = sorted(r["doc_id"] for r in
                     dedup.minhash_dup_ids(ds, "text", "doc_id", threshold=0.5,
                                           concurrency=2).take_all())
    # expected: copies (ids not divisible by 3) flagged; bases kept
    expected = [i for i in range(60) if i % 3 != 0]
    assert dup_ids == expected
    kept = dedup.minhash_dedup(ds, "text", "doc_id", threshold=0.5, concurrency=2)
    assert sorted(r["doc_id"] for r in kept.take_all()) == [i for i in range(60) if i % 3 == 0]


def test_minhash_flags_are_true_near_dups_on_testdata():
    """The driver's documents table plants real near-dups; every MinHash flag
    must correspond to a genuinely similar partner (no false positives)."""
    from insurance_pdf_extractor_ray.functions.hashing import jaccard
    from insurance_pdf_extractor_ray.functions.textstats import word_ngrams

    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    flagged = [r["doc_id"] for r in
               dedup.minhash_dup_ids(ds, "text", "doc_id", threshold=0.8,
                                     concurrency=2).take_all()]
    assert flagged  # the corpus does contain planted near-dups
    import pyarrow.parquet as pq

    texts = {r["doc_id"]: r["text"]
             for r in pq.read_table(f"{SF}/documents.parquet").to_pylist()}
    shingles = {d: word_ngrams(t, 3) for d, t in texts.items()}
    for d in flagged[:10]:
        best = max(jaccard(shingles[d], shingles[o]) for o in texts if o != d)
        assert best >= 0.7, (d, best)


def test_simhash_dup_ids():
    # longer docs with a 1-word change (~0.5%): SimHash's home turf
    rng = np.random.RandomState(13)
    words = ("alpha bravo charlie delta echo foxtrot golf hotel india juliet "
             "kilo lima mike november oscar papa quebec romeo sierra tango").split()
    ids, texts = [], []
    for b in range(15):
        base = " ".join(words[rng.randint(0, len(words))] for _ in range(200))
        for copy in range(2):
            t = base
            if copy:
                toks = t.split()
                toks[50] = "zulu"
                t = " ".join(toks)
            ids.append(b * 2 + copy)
            texts.append(t)
    ds = ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, pa.int64()),
                                       "text": pa.array(texts)}))
    dup_ids = sorted(r["doc_id"] for r in
                     dedup.simhash_dup_ids(ds, "text", "doc_id", max_hamming=7,
                                           ngram=3, num_bands=8,
                                           concurrency=2).take_all())
    expected = set(range(1, 30, 2))  # every copy, never a base
    assert not set(dup_ids) - expected
    assert len(set(dup_ids) & expected) >= len(expected) * 0.8


def test_jaccard_pairs_exact_verify():
    tbl = _near_dup_corpus()
    ds = ray.data.from_arrow(tbl)
    pairs = dedup.jaccard_dup_pairs(ds, "text", "doc_id", threshold=0.5,
                                    concurrency=2).take_all()
    for p in pairs:
        assert p["id_a"] // 3 == p["id_b"] // 3  # only within-base pairs
        assert 0.5 <= p["jaccard"] <= 1.0
    # every base should yield at least one verified pair
    bases = {p["id_a"] // 3 for p in pairs}
    assert len(bases) == 20


def test_component_dedup_transitive():
    """A~B and B~C but A~C below threshold: components still collapse all
    three to one survivor (bucket-level keep-first could keep two)."""
    # chain: each neighbor differs by 6 words of 40 (~72% trigram overlap);
    # ends differ by 12 words (~50%)
    base = [f"w{i}" for i in range(40)]
    def variant(start):
        toks = list(base)
        for j in range(start, start + 6):
            toks[j] = f"z{j}"
        return " ".join(toks)
    texts = [" ".join(base), variant(5), variant(11)]
    tbl = pa.table({"doc_id": pa.array([0, 1, 2], pa.int64()),
                    "text": pa.array(texts)})
    ds = ray.data.from_arrow(tbl)
    # 32 bands of 4 rows: band-match probability ~0.998 at J~0.65 (16x8
    # would miss ~60% of such pairs); the exact-Jaccard verify still rejects
    # the 0.46 pair
    kept = dedup.jaccard_component_dedup(ds, "text", "doc_id", threshold=0.55,
                                         num_bands=32, concurrency=2).take_all()
    assert sorted(r["doc_id"] for r in kept) == [0]

    comp = dedup.dup_components(
        dedup.jaccard_dup_pairs(ds, "text", "doc_id", threshold=0.55,
                                num_bands=32, concurrency=2))
    assert set(comp.values()) == {0}


def test_embedding_dup_ids():
    rng = np.random.RandomState(11)
    base = rng.standard_normal((30, 16)).astype(np.float32)
    noisy = base + rng.standard_normal((30, 16)).astype(np.float32) * 0.01
    embs = np.concatenate([base, noisy])
    ids = list(range(60))
    tbl = pa.table({"vec_id": pa.array(ids, pa.int64()),
                    "embedding": pa.array([list(v) for v in embs], pa.list_(pa.float32()))})
    ds = ray.data.from_arrow(tbl)
    dup = sorted(r["vec_id"] for r in
                 dedup.embedding_dup_ids(ds, "embedding", "vec_id",
                                         threshold=0.99, n_planes=6, concurrency=2).take_all())
    # each noisy copy (ids 30..59) should be flagged vs its base when the
    # sign-bucket matches; expect high recall, zero false positives
    assert not set(dup) & set(range(30))
    assert len(dup) >= 20


class TestScaleSafePaths:
    """Round-2 scale defaults: shuffle-join winners, distributed id filtering,
    min-label-propagation components — each must agree with the small path."""

    def _docs(self):
        import pyarrow as pa

        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(10), pa.int64()),
            "text": pa.array(["a", "b", "a", "c", "b", "d", "a", "e", "c", "f"]),
        }))

    def test_exact_dedup_join_path_agrees(self, ray_session):
        ds = self._docs()
        broadcast = sorted(r["doc_id"] for r in dedup.exact_dedup(ds, "text", "doc_id").take_all())
        joined = sorted(r["doc_id"] for r in dedup.exact_dedup(
            ds, "text", "doc_id", max_broadcast=2).take_all())
        assert broadcast == joined == [0, 1, 3, 5, 7, 9]

    def test_filter_by_ids_both_paths(self, ray_session):
        import pyarrow as pa

        ds = self._docs()
        ids = ray.data.from_arrow(pa.table({"doc_id": pa.array([3, 5, 7], pa.int64())}))
        for kwargs in ({}, {"max_broadcast": 1}):  # broadcast vs left_anti join
            anti = sorted(r["doc_id"] for r in dedup.filter_by_ids(
                ds, "doc_id", ids, **kwargs).take_all())
            assert anti == [0, 1, 2, 4, 6, 8, 9], kwargs
        semi = sorted(r["doc_id"] for r in dedup.filter_by_ids(
            ds, "doc_id", ids, keep_matching=True).take_all())
        assert semi == [3, 5, 7]

    def test_filter_by_ids_empty_id_set(self, ray_session):
        import pyarrow as pa

        ds = self._docs()
        empty = ray.data.from_arrow(pa.table({"doc_id": pa.array([], pa.int64())}))
        assert dedup.filter_by_ids(ds, "doc_id", empty).count() == 10
        assert dedup.filter_by_ids(ds, "doc_id", empty, keep_matching=True).count() == 0

    def test_dup_components_distributed_agrees(self, ray_session):
        import pyarrow as pa

        # chain 1-2-3-4 (diameter 3: exercises multi-round propagation) + pair
        pairs = ray.data.from_arrow(pa.table({
            "id_a": pa.array([1, 2, 3, 10], pa.int64()),
            "id_b": pa.array([2, 3, 4, 11], pa.int64()),
        }))
        labels = {r["id"]: r["root"]
                  for r in dedup.dup_components_distributed(pairs).take_all()}
        assert labels == dedup.dup_components(pairs)
        assert labels == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    def test_jaccard_component_dedup_distributed_agrees(self, ray_session):
        import pyarrow as pa

        txts = (["the quick brown fox jumps over the lazy dog " * 5] * 3
                + ["completely different content here " * 5] * 2
                + [f"unique text {i} with many extra words appended" for i in range(5)])
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(10), pa.int64()), "text": pa.array(txts)}))
        kept_b = sorted(r["doc_id"] for r in dedup.jaccard_component_dedup(
            ds, "text", "doc_id", distributed=False).take_all())
        kept_d = sorted(r["doc_id"] for r in dedup.jaccard_component_dedup(
            ds, "text", "doc_id", distributed=True).take_all())
        assert kept_b == kept_d
        assert 0 in kept_b and 1 not in kept_b and 2 not in kept_b

    def test_jaccard_component_dedup_auto_switch(self, ray_session):
        """distributed=None picks the path by pair count vs max_broadcast:
        max_broadcast=0 forces every real pair list onto the distributed
        min-label path through the PUBLIC default entry point."""
        import pyarrow as pa

        txts = (["the quick brown fox jumps over the lazy dog " * 5] * 3
                + [f"unique text {i} with many extra words appended" for i in range(4)])
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(7), pa.int64()), "text": pa.array(txts)}))
        kept_auto = sorted(r["doc_id"] for r in dedup.jaccard_component_dedup(
            ds, "text", "doc_id", max_broadcast=0).take_all())
        kept_b = sorted(r["doc_id"] for r in dedup.jaccard_component_dedup(
            ds, "text", "doc_id", distributed=False).take_all())
        assert kept_auto == kept_b
        assert 0 in kept_auto and 1 not in kept_auto and 2 not in kept_auto

    def test_jaccard_pairs_join_mode_agrees(self, ray_session):
        import pyarrow as pa

        txts = (["the quick brown fox jumps over the lazy dog today " * 4] * 3
                + ["an entirely different body of text for this doc " * 4] * 2
                + [f"unique filler number {i} with several more words here"
                   for i in range(5)])
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(10), pa.int64()), "text": pa.array(txts)}))
        def norm(pairs):
            return sorted((r["id_a"], r["id_b"], round(r["jaccard"], 9))
                          for r in pairs.take_all())
        inline = norm(dedup.jaccard_dup_pairs(ds, "text", "doc_id", verify="inline"))
        joined = norm(dedup.jaccard_dup_pairs(ds, "text", "doc_id", verify="join"))
        assert inline == joined
        assert (0, 1, 1.0) in inline and (3, 4, 1.0) in inline


# ---------------------------------------------------------------------------
# embedding_dup_ids_exact (all-pairs baseline)
# ---------------------------------------------------------------------------

class TestEmbeddingExact:
    def _table(self):
        import numpy as np

        rng = np.random.RandomState(3)
        base = rng.standard_normal((40, 16)).astype(np.float32)
        # plant near-dups: rows 30..34 are tiny perturbations of rows 0..4
        base[30:35] = base[0:5] + rng.standard_normal((5, 16)).astype(np.float32) * 0.01
        return pa.table({
            "vec_id": pa.array(np.arange(40), pa.int64()),
            "embedding": pa.array([list(map(float, r)) for r in base],
                                  pa.list_(pa.float32())),
        })

    def test_matches_duckdb_exists(self):
        import duckdb

        from insurance_pdf_extractor_ray.pipelines.dedup import embedding_dup_ids_exact

        tbl = self._table()
        out = embedding_dup_ids_exact(
            ray.data.from_arrow(tbl).repartition(5), "embedding", "vec_id",
            threshold=0.95).take_all()
        got = [r["vec_id"] for r in out]

        con = duckdb.connect()
        con.register("e", tbl)
        want = [r[0] for r in con.execute("""
            SELECT a.vec_id FROM e a
            WHERE EXISTS (SELECT 1 FROM e b WHERE b.vec_id < a.vec_id
                          AND list_cosine_similarity(a.embedding, b.embedding) >= 0.95)
            ORDER BY a.vec_id
        """).fetchall()]
        assert got == want
        assert set(got) >= {30, 31, 32, 33, 34}

    def test_agrees_with_lsh_path_on_planted(self):
        """LSH path is approximate; on well-separated planted dups both paths
        flag the planted ids."""
        from insurance_pdf_extractor_ray.pipelines.dedup import (
            embedding_dup_ids,
            embedding_dup_ids_exact,
        )

        tbl = self._table()
        exact = {r["vec_id"] for r in embedding_dup_ids_exact(
            ray.data.from_arrow(tbl), "embedding", "vec_id", threshold=0.95).take_all()}
        lsh = {r["vec_id"] for r in embedding_dup_ids(
            ray.data.from_arrow(tbl), "embedding", "vec_id",
            threshold=0.95, n_planes=4).take_all()}
        # greedy-canon partners are always smaller-id, and bucketing only
        # removes pairs: the LSH set is a subset of the exact set
        assert lsh <= exact
        assert {30, 31, 32, 33, 34} <= exact


class TestIncrementalDedup:
    def test_three_batches_match_global_dedup(self, tmp_path):
        """Running 3 ingest batches through the incremental path keeps exactly
        the same rows as one global exact_dedup over the union."""
        import os

        import pyarrow.parquet as pq

        from insurance_pdf_extractor_ray.pipelines.dedup import (
            exact_dedup,
            exact_dedup_incremental,
        )

        rng = np.random.RandomState(17)
        texts = [f"value-{v}" for v in rng.randint(0, 120, 600)]
        full = pa.table({
            "doc_id": pa.array(np.arange(600), pa.int64()),
            "text": pa.array(texts, pa.string()),
        })
        index_dir = str(tmp_path / "idx")
        kept_ids = []
        for b in range(3):
            batch = full.slice(b * 200, 200)
            kept, new_index = exact_dedup_incremental(
                ray.data.from_arrow(batch).repartition(4), index_dir,
                "text", "doc_id")
            rows = kept.take_all()
            kept_ids.extend(r["doc_id"] for r in rows)
            # commit the batch's index fragment
            tbls = [t for t in ray.get(new_index.to_arrow_refs()) if t.num_rows]
            os.makedirs(f"{index_dir}/b{b}", exist_ok=True)
            if tbls:
                pq.write_table(pa.concat_tables(tbls), f"{index_dir}/b{b}/part.parquet")

        want = sorted(r["doc_id"] for r in exact_dedup(
            ray.data.from_arrow(full), "text", "doc_id").take_all())
        assert sorted(kept_ids) == want

    def test_first_batch_without_index(self, tmp_path):
        from insurance_pdf_extractor_ray.pipelines.dedup import exact_dedup_incremental

        tbl = pa.table({"doc_id": pa.array([2, 0, 1], pa.int64()),
                        "text": pa.array(["a", "a", "b"], pa.string())})
        kept, idx = exact_dedup_incremental(
            ray.data.from_arrow(tbl), str(tmp_path / "none"), "text", "doc_id")
        assert sorted(r["doc_id"] for r in kept.take_all()) == [0, 1]
        assert idx.count() == 2


class TestMinhashCrossJoin:
    """Cross-corpus near-dup join: planted pair found, disjoint pair not,
    identical docs link at est=1.0, layout-independent."""

    BASE = ("the quick brown fox jumps over the lazy dog and then runs far "
            "away into the deep dark forest tonight while everyone sleeps")

    def _corpora(self):
        left = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([
                self.BASE,
                self.BASE.replace("dog", "cat"),   # near-dup of BASE
                "completely different words about spark shuffles and joins "
                "never resembling anything in the evaluation corpus at all",
            ], pa.string()),
        })
        right = pa.table({
            "doc_id": pa.array([100, 101], pa.int64()),
            "text": pa.array([
                self.BASE,
                "another unrelated evaluation document about window functions",
            ], pa.string()),
        })
        return left, right

    def _run(self, rep=None):
        from insurance_pdf_extractor_ray.pipelines.dedup import (
            minhash_cross_join,
        )

        left, right = self._corpora()
        lds = ray.data.from_arrow(left)
        if rep:
            lds = lds.repartition(rep)
        out = minhash_cross_join(lds, ray.data.from_arrow(right),
                                 "text", "doc_id", threshold=0.6)
        return sorted((r["l_id"], r["r_id"], r["est"])
                      for r in out.take_all())

    def test_planted_pairs(self):
        got = self._run()
        pairs = [(l, r) for l, r, _ in got]
        assert (0, 100) in pairs          # identical
        assert (1, 100) in pairs          # near-dup (one word changed)
        assert all(l != 2 for l, _, _ in got)   # disjoint doc never links
        assert all(r != 101 for _, r, _ in got)
        est = dict(((l, r), e) for l, r, e in got)
        assert est[(0, 100)] == 1.0
        assert 0.6 <= est[(1, 100)] < 1.0

    def test_layout_independent(self):
        assert self._run() == self._run(rep=3)


class TestKeepBestDedup:
    """exact_dedup_keep_best: max-score winner, min-id ties, both
    application paths."""

    def _docs(self):
        # key groups: 'a' x3 (scores 5,9,9 -> id 6 wins: max score 9, min id
        # among ties), 'b' x2 (scores 2,7 -> id 4), singletons keep selves
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(8), pa.int64()),
            "key": pa.array(["a", "b", "a", "c", "b", "d", "a", "e"]),
            "score": pa.array([5, 2, 9, 1, 7, 3, 9, 8], pa.int64()),
        }))

    def test_winner_is_max_score_min_id(self, ray_session):
        kept = sorted(r["doc_id"] for r in dedup.exact_dedup_keep_best(
            self._docs(), "key", "doc_id", "score").take_all())
        assert kept == [2, 3, 4, 5, 7]

    def test_join_path_agrees(self, ray_session):
        kept = sorted(r["doc_id"] for r in dedup.exact_dedup_keep_best(
            self._docs(), "key", "doc_id", "score",
            max_broadcast=2).take_all())
        assert kept == [2, 3, 4, 5, 7]

    def test_matches_window_oracle_on_documents(self, ray_session):
        ds = ray.data.read_parquet(f"{SF}/documents.parquet")
        kept = sorted(r["doc_id"] for r in dedup.exact_dedup_keep_best(
            ds, "lang", "doc_id", "n_chars").take_all())
        con = duckdb.connect()
        want = [w[0] for w in con.execute(
            f"""SELECT doc_id FROM (
                  SELECT doc_id, row_number() OVER (
                    PARTITION BY lang ORDER BY n_chars DESC, doc_id) rn
                  FROM '{SF}/documents.parquet') WHERE rn = 1
                ORDER BY 1""").fetchall()]
        assert kept == want
