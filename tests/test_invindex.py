"""Inverted-index BM25 must be bit-identical to the corpus-scan path, and
its reads must prune to the query terms' buckets."""

import glob
import os

import pyarrow as pa
import pytest
import ray
import ray.data

from insurance_pdf_extractor_ray.pipelines.invindex import (
    _STATS_FILE,
    build_inverted_index,
    bm25_search_indexed,
)
from insurance_pdf_extractor_ray.pipelines.tfidf import bm25_search

pytestmark = pytest.mark.usefixtures("ray_session")

DOCS = pa.table({
    "doc_id": pa.array(list(range(8)), pa.int64()),
    "text": pa.array([
        "spark shuffle window spark spark",
        "window window agg join",
        "the quick brown fox",
        "spark agg agg agg agg",
        "shuffle shuffle shuffle",
        "",
        "join join window shuffle spark",
        "unrelated words entirely here",
    ], pa.string()),
})


@pytest.fixture(scope="module")
def index_dir(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("invidx"))
    build_inverted_index(ray.data.from_arrow(DOCS).repartition(3),
                         "text", "doc_id", root, n_buckets=16)
    return root


def _scan(terms, k=10):
    return bm25_search(ray.data.from_arrow(DOCS), "text", "doc_id", terms, k=k)


class TestIndexedBm25:
    def test_identical_to_scan_path(self, index_dir):
        for terms in (["spark"], ["spark", "window"],
                      ["shuffle", "agg", "join"], ["quick", "fox"]):
            assert bm25_search_indexed(index_dir, terms, k=10).equals(
                _scan(terms)), terms

    def test_absent_term_empty(self, index_dir):
        out = bm25_search_indexed(index_dir, ["zzzmissing"], k=10)
        assert out.num_rows == 0
        assert out.column_names == ["doc_id", "score"]

    def test_stats_sidecar_exact(self, index_dir):
        import json

        st = json.load(open(os.path.join(index_dir, _STATS_FILE)))
        # 8 docs, token totals counted over the same [a-z0-9]+ rule
        assert st["n_docs"] == 8
        assert st["sum_dl"] == sum(
            len(t.split()) for t in DOCS.column("text").to_pylist())

    def test_postings_are_exact_tf(self, index_dir):
        import pyarrow.parquet as pq

        files = glob.glob(os.path.join(index_dir, "_bucket=*", "*.parquet"))
        t = pa.concat_tables(pq.read_table(f) for f in files)
        d = {(r["token"], r["doc_id"]): r["tf"] for r in t.to_pylist()}
        assert d[("spark", 0)] == 3 and d[("agg", 3)] == 4
        # dl denormalized onto every posting row
        dl = {r["doc_id"]: r["dl"] for r in t.to_pylist()}
        assert dl[0] == 5 and dl[3] == 5

    def test_bucket_pruning(self, index_dir):
        """A single-term query must touch only that term's bucket dir."""
        from insurance_pdf_extractor_ray.pipelines.bucketed import (
            _bucket_of,
            layout_of,
        )

        layout = layout_of(index_dir)
        b = _bucket_of(pa.chunked_array([pa.array(["spark"])]),
                       layout["n_buckets"])[0]
        all_buckets = {
            int(p.split("=")[1]) for p in
            glob.glob(os.path.join(index_dir, "_bucket=*"))}
        assert len(all_buckets) > 1  # layout actually spreads tokens
        assert int(b) in all_buckets
