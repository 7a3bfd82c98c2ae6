"""Golden-diff verification surface (pipelines/goldencheck.py).

The flagship's correctness gate: distributed cell-level diff of engine
output vs the first-principles goldens.  These tests prove the diff finds
planted mismatches (so an empty diff is evidence, not vacuous truth) and
that the real pipeline diffs clean against the corpus goldens.
"""

import pyarrow as pa
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.goldencheck import (
    golden_diff,
    normalize_diff,
    span_digests,
)


@pytest.mark.usefixtures("ray_session")
class TestGoldenDiff:
    def _mk(self, rows):
        return ray.data.from_arrow(pa.Table.from_pylist(rows))

    def test_identical_is_empty(self):
        a = self._mk([{"doc_id": "d1", "x": "1", "y": "a"},
                      {"doc_id": "d2", "x": "2", "y": "b"}])
        b = self._mk([{"doc_id": "d2", "x": "2", "y": "b"},
                      {"doc_id": "d1", "x": "1", "y": "a"}])
        out = normalize_diff(golden_diff(a, b))
        assert out.num_rows == 0
        assert out.column_names == ["doc_id", "column", "got", "want"]

    def test_planted_cell_mismatch_found(self):
        a = self._mk([{"doc_id": "d1", "x": "1"}, {"doc_id": "d2", "x": "WRONG"}])
        b = self._mk([{"doc_id": "d1", "x": "1"}, {"doc_id": "d2", "x": "2"}])
        out = normalize_diff(golden_diff(a, b))
        assert out.to_pylist() == [
            {"doc_id": "d2", "column": "x", "got": "WRONG", "want": "2"}
        ]

    def test_missing_and_extra_rows_reported(self):
        a = self._mk([{"doc_id": "d1", "x": "1"}, {"doc_id": "d3", "x": "3"}])
        b = self._mk([{"doc_id": "d1", "x": "1"}, {"doc_id": "d2", "x": "2"}])
        out = normalize_diff(golden_diff(a, b))
        got = {(r["doc_id"], r["column"], r["got"], r["want"]) for r in out.to_pylist()}
        assert got == {("d2", "__presence__", "0", "1"),
                       ("d3", "__presence__", "1", "0")}

    def test_duplicate_key_reported(self):
        a = self._mk([{"doc_id": "d1", "x": "1"}, {"doc_id": "d1", "x": "1"}])
        b = self._mk([{"doc_id": "d1", "x": "1"}])
        out = normalize_diff(golden_diff(a, b))
        assert out.to_pylist() == [
            {"doc_id": "d1", "column": "__multiplicity__", "got": "2", "want": "1"}
        ]

    def test_non_string_columns_compared_as_strings(self):
        a = self._mk([{"doc_id": "d1", "n": 5}])
        b = self._mk([{"doc_id": "d1", "n": 6}])
        out = normalize_diff(golden_diff(a, b))
        assert out.to_pylist() == [
            {"doc_id": "d1", "column": "n", "got": "5", "want": "6"}
        ]


@pytest.mark.usefixtures("ray_session")
class TestSpanDigests:
    SPAN_T = pa.list_(pa.struct([("kind", pa.string()), ("text", pa.string()),
                                 ("media_ref", pa.string()), ("offset", pa.int32())]))

    def _docs(self, spans_by_doc):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array(list(spans_by_doc.keys()), pa.string()),
            "spans": pa.array(list(spans_by_doc.values()), self.SPAN_T),
        }))

    def test_order_and_content_sensitive(self):
        s1 = [{"kind": "text", "text": "a", "media_ref": "", "offset": 0},
              {"kind": "text", "text": "b", "media_ref": "", "offset": 1}]
        s2 = list(reversed(s1))
        s3 = [{"kind": "text", "text": "a", "media_ref": "", "offset": 0},
              {"kind": "text", "text": "X", "media_ref": "", "offset": 1}]
        ds = self._docs({"d1": s1, "d2": s2, "d3": s3, "d4": s1})
        rows = {r["doc_id"]: r["span_digest"]
                for r in span_digests(ds, "spans").take_all()}
        assert rows["d1"] == rows["d4"]
        assert rows["d1"] != rows["d2"]
        assert rows["d1"] != rows["d3"]

    def test_empty_spans_distinct_digest(self):
        ds = self._docs({"d1": [], "d2": [
            {"kind": "text", "text": "", "media_ref": "", "offset": 0}]})
        rows = {r["doc_id"]: r["span_digest"]
                for r in span_digests(ds, "spans").take_all()}
        assert rows["d1"] != rows["d2"]


@pytest.mark.usefixtures("ray_session")
def test_flagship_diffs_clean_against_goldens(corpus_600):
    """extract_pipeline output == expected_fields golden for all 600 docs /
    12 families — the distributed equivalent of test_extract_golden."""
    from insurance_pdf_extractor_ray.config import FIELD_ORDER
    from insurance_pdf_extractor_ray.pipelines.extraction import (
        extract_pipeline,
        flatten_fields,
    )

    engine = flatten_fields(extract_pipeline(str(corpus_600 / "documents.parquet")))
    golden = ray.data.read_parquet(
        str(corpus_600 / "expected_fields.parquet"),
        columns=["doc_id"] + FIELD_ORDER + ["status"])
    out = normalize_diff(golden_diff(engine, golden))
    assert out.num_rows == 0, out.to_pylist()[:5]

    spans_engine = span_digests(extract_pipeline(str(corpus_600 / "documents.parquet")),
                                "spans_out")
    spans_golden = span_digests(
        ray.data.read_parquet(str(corpus_600 / "expected_spans.parquet")), "spans")
    out2 = normalize_diff(golden_diff(spans_engine, spans_golden))
    assert out2.num_rows == 0, out2.to_pylist()[:5]
