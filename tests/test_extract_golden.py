"""Golden-fixture tests: single-threaded extractor vs generator expectations.

Tier-2 of the test plan (SURVEY.md §5): deterministic synthetic interleaved
span documents with hand-derived expected 18-field records and expected output
span sequences; the per-row invariant is span-sequence equality
(kind, text, media_ref, order) per BASELINE.json input_hint.
"""

import pytest

from insurance_pdf_extractor_ray.sources import synth
from insurance_pdf_extractor_ray.stages.extract import FieldExtractor
from insurance_pdf_extractor_ray.stages.validate import validate_record


def _merged_spans(spec):
    spans = [
        {"kind": k, "text": t, "media_ref": m, "offset": o}
        for chunk in spec.row_chunks
        for (k, t, m, o) in chunk
    ]
    spans.sort(key=lambda s: s["offset"])
    return spans


@pytest.fixture(scope="module")
def extractor():
    return FieldExtractor()


@pytest.mark.parametrize("family_offset", range(12))
def test_family_golden(extractor, family_offset):
    """50 docs per family: fields, status, warnings and span-sequence equality."""
    for i in range(family_offset, 600, 12):
        spec = synth.build_doc(i)
        r = extractor.extract_doc(_merged_spans(spec))
        assert r["status"] == spec.expected_status, (i, spec.family)
        assert r["warnings"] == spec.expected_warnings, (i, spec.family)
        for f, want in spec.expected_fields.items():
            assert r["fields"][f] == want, (i, spec.family, f)
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in r["spans_out"]]
        assert got == spec.expected_spans, (i, spec.family)


def test_multistate_carrier_list():
    """fields.yaml:40-43: per-state premium breakdown -> stringified rounded
    list ['NY - <carrier> - 553', ...] overrides the plain carrier name."""
    multi = [i for i in range(0, 600, 12) if (i // 12) % 3 == 1]
    assert multi
    ex = FieldExtractor()
    for i in multi[:10]:
        spec = synth.build_doc(i)
        got = ex.extract_doc(_merged_spans(spec))["fields"]["issuing_carrier"]
        assert got == spec.expected_fields["issuing_carrier"]
        assert got.startswith("['") and got.endswith("']")
        entries = eval(got)  # noqa: S307 - test-only, our own literal
        assert all(len(e.split(" - ")) == 3 for e in entries)
        assert all("." not in e.split(" - ")[2] for e in entries)  # rounded


def test_validation_failed_record_shape():
    # missing_required family (index 7 mod 12): reference-intended partial record
    spec = synth.build_doc(7)
    assert spec.family == "missing_required"
    r = FieldExtractor().extract_doc(_merged_spans(spec))
    assert r["fields"]["quote_number"] == "VALIDATION_FAILED"
    assert r["fields"]["named_insured_name"] == "VALIDATION_FAILED"
    assert r["fields"]["policy_effective_date"] == "EMPTY VALUE"
    assert r["status"] == "partial_success"
    assert r["validation_errors"] and "quote_number" in r["validation_errors"][0]
    assert r["failed_fields"] == ["quote_number"]


def test_confidence_scores_semantics():
    # pdf_processor.py:403-445 heuristic on a real extraction
    spec = synth.build_doc(0)
    r = FieldExtractor().extract_doc(_merged_spans(spec))
    conf = {c["key"]: c["value"] for c in r["confidence"]}
    # EMPTY fields -> 0.0
    assert conf["additional_named_insured_name"] == 0.0
    # quote number: base .5 + len>5 .2 + in-text .2 + field bonus .1 = 1.0
    # (float-sum order matches the reference, so 0.5+0.2+0.2+0.1 ~ 0.99999...)
    assert conf["quote_number"] == pytest.approx(1.0)
    # dates: .5 + .2(len>5) + .2(in text) + .1(slash) = 1.0
    assert conf["policy_effective_date"] == pytest.approx(1.0)


def test_validate_record_standalone():
    raw = {f: "EMPTY VALUE" for f in synth.FIELD_ORDER}
    raw.update(
        quote_number="  Q-1 ",
        policy_effective_date="2024-01-01",
        policy_expiration_date="01/01/2025",
        named_insured_name="A Co",
        named_insured_address="1 St",
        issuing_carrier="C",
        tria="true",
        commission="12",
    )
    fields, errors, warnings, status = validate_record(raw)
    assert status == "success" and not errors
    assert fields["quote_number"] == "Q-1"  # stripped (extraction.py:65)
    assert fields["policy_effective_date"] == "01/01/2024"  # normalized
    assert fields["tria"] == "Included"
    assert fields["commission"] == "12.0%"


def test_label_map_extension():
    """§2.11 user-extension surface: a custom label alias wired through the
    extractor constructor (the engine analog of editing fields.yaml)."""
    from insurance_pdf_extractor_ray.config import LABEL_TO_FIELD

    custom = {**LABEL_TO_FIELD, "policy ref": "quote_number"}
    ex = FieldExtractor(label_map=custom)
    spans = [{"kind": "text",
              "text": "Policy Ref: XR-77\nNamed Insured: C\nAddress: 1 A St\n"
                      "Issuing Carrier: X\nPolicy Effective Date: 01/01/2024\n"
                      "Policy Expiration Date: 01/01/2025",
              "media_ref": "", "offset": 0}]
    r = ex.extract_doc(spans)
    assert r["fields"]["quote_number"] == "XR-77"
    # default extractor ignores the unknown label
    assert FieldExtractor().extract_doc(spans)["fields"]["quote_number"] == "EMPTY VALUE"


def test_doc_gates():
    """F1/F4 (pdf_processor.py:343-385): empty doc and oversize -> error row;
    short text sample -> image-based warning."""
    ex = FieldExtractor()
    r = ex.extract_doc([])
    assert r["status"] == "error" and r["validation_errors"] == ["Document contains no spans"]
    assert all(v == "EMPTY VALUE" for v in r["fields"].values())

    r = ex.extract_doc([{"kind": "text", "text": "hi", "media_ref": "", "offset": 0}])
    assert r["status"] == "success"
    assert r["warnings"] == ["Document may be image-based or have little text content"]

    big = [{"kind": "text", "text": "x" * (FieldExtractor.MAX_DOC_BYTES + 1),
            "media_ref": "", "offset": 0}]
    r = ex.extract_doc(big)
    assert r["status"] == "error" and "exceeds maximum" in r["validation_errors"][0]


def test_skew_tail_docs_have_100x_spans():
    skew = [i for i in range(4000) if len(_merged_spans(synth.build_doc(i))) > 150]
    assert skew, "expected a ~0.1% skew tail in the first 4000 docs"
    for i in skew[:2]:
        spec = synth.build_doc(i)
        assert len(spec.row_chunks) >= 4  # skew docs are split across rows


class TestDocInfo:
    """M14 doc-info projection: title / preview / n_spans / n_chars."""

    def test_title_and_preview(self):
        from insurance_pdf_extractor_ray.stages.extract import FieldExtractor

        ex = FieldExtractor()
        spans = [
            {"kind": "heading", "text": "WORKERS COMPENSATION INSURANCE QUOTE",
             "media_ref": "", "offset": 0},
            {"kind": "text", "text": "Quote Number: WC-1", "media_ref": "", "offset": 1},
            {"kind": "text", "text": "x" * 600, "media_ref": "", "offset": 2},
        ]
        r = ex.extract_doc(spans)
        assert r["title"] == "WORKERS COMPENSATION INSURANCE QUOTE"
        assert len(r["preview"]) == 500
        assert r["preview"].startswith("WORKERS COMPENSATION")

    def test_no_heading_no_title(self):
        from insurance_pdf_extractor_ray.stages.extract import FieldExtractor

        ex = FieldExtractor()
        r = ex.extract_doc([{"kind": "text", "text": "Quote Number: A",
                             "media_ref": "", "offset": 0}])
        assert r["title"] == ""
        assert r["preview"] == "Quote Number: A"

    def test_batch_matches_single_doc_path(self, ray_session, corpus_600):
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.extraction import (
            doc_info,
            extract_pipeline,
        )
        from insurance_pdf_extractor_ray.sources import synth
        from insurance_pdf_extractor_ray.stages.extract import FieldExtractor

        out = doc_info(extract_pipeline(
            str(corpus_600 / "documents.parquet"))).take_all()
        rows = {r["doc_id"]: r for r in out}
        ex = FieldExtractor()
        for i in (0, 7, 10, 23):  # spot-check vs the single-doc path
            spec = synth.build_doc(i)
            spans = sorted((s for c in spec.row_chunks for s in c), key=lambda s: s[3])
            ref = ex.extract_doc([{"kind": k, "text": t, "media_ref": m, "offset": o}
                                  for (k, t, m, o) in spans])
            got = rows[spec.doc_id]
            assert got["title"] == ref["title"]
            assert got["preview"] == ref["preview"]
            assert got["n_spans"] == ref["n_spans"]
