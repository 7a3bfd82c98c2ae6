"""Real-PDF ingestion: writer/parser round trip, malformed-input tagging,
and the golden e2e — generated PDF -> parse -> extract_pipeline -> 18
fields equal the first-principles expected record (reference analog:
pypdf parse at app/services/pdf_processor.py:364-377 over reportlab
fixtures, tests/utils/mock_generators.py:11-48)."""

import hashlib

import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.functions.pdfcodec import (
    PdfDocument,
    build_pdf,
    parse_pdf,
)
from insurance_pdf_extractor_ray.pipelines.pdfingest import (
    pdf_extract_pipeline,
    pdf_to_docs,
    pdfs_for_docs,
)
from insurance_pdf_extractor_ray.sources.synth import build_doc, expected_tables


def _doc_spans(idx):
    spec = build_doc(idx)
    spans = sorted((s for chunk in spec.row_chunks for s in chunk),
                   key=lambda s: s[3])
    return spec, [(k, t, m) for (k, t, m, _o) in spans]


def _skew_indices(n):
    out = []
    i = 0
    while len(out) < n:
        did = f"doc-{i:09d}"
        if int.from_bytes(hashlib.blake2b(did.encode(), digest_size=2)
                          .digest(), "big") % 1000 == 7:
            out.append(i)
        i += 1
    return out


class TestRoundTrip:
    def test_all_families(self):
        # one full family cycle + multi-page skew docs; 'table' spans
        # legitimately collapse to 'text' (a real PDF carries no table kind)
        norm = lambda lst: [("text" if k == "table" else k, t, m)
                            for (k, t, m) in lst]
        for idx in list(range(24)) + _skew_indices(3):
            _spec, src = _doc_spans(idx)
            assert norm(parse_pdf(build_pdf(src))) == norm(src), idx

    def test_multipage_structure(self):
        idx = _skew_indices(1)[0]  # ~200 spans -> several pages
        _spec, src = _doc_spans(idx)
        doc = PdfDocument(build_pdf(src))
        assert len(doc.page_numbers()) >= 4

    def test_media_refs_survive(self):
        _spec, src = _doc_spans(9)  # media_interleaved family
        out = parse_pdf(build_pdf(src))
        want = [m for (k, _t, m) in src if k == "media"]
        got = [m for (k, _t, m) in out if k == "media"]
        assert want and got == want

    def test_image_xobject_decodes(self):
        _spec, src = _doc_spans(9)
        doc = PdfDocument(build_pdf(src))
        pnums = doc.page_numbers()
        xo = {}
        for p in pnums:
            xo.update(doc.page_xobjects(p))
        assert xo
        img = doc.xobject_image(next(iter(xo.values())))
        assert img.shape == (6, 8, 3) and img.dtype.name == "uint8"

    def test_heading_and_escapes(self):
        spans = [("heading", "TITLE (DRAFT) 50\\50", ""),
                 ("text", "Line\twith\ttabs", "")]
        assert parse_pdf(build_pdf(spans)) == spans

    def test_malformed_raises(self):
        with pytest.raises(ValueError):
            parse_pdf(b"not a pdf at all")
        good = build_pdf([("text", "hello", "")])
        with pytest.raises(ValueError):
            parse_pdf(good[: len(good) // 2])


class TestPipeline:
    def test_parse_stage_tags_errors(self, ray_session):
        tbl = pdfs_for_docs([0, 1])
        broken = pa.table({"doc_id": pa.array(["doc-broken"], pa.string()),
                           "filename": pa.array(["doc-broken.pdf"], pa.string()),
                           "pdf": pa.array([b"%PDF-1.4 garbage"], pa.binary())})
        ds = ray.data.from_arrow(pa.concat_tables([tbl, broken]))
        rows = {r["doc_id"]: r for r in pdf_to_docs(ds).take_all()}
        assert rows["doc-broken"]["error"] != "" and rows["doc-broken"]["spans"] == []
        assert rows["doc-000000000"]["error"] == ""
        assert len(rows["doc-000000000"]["spans"]) > 5

    def test_file_gates(self, ray_session):
        """F2 extension / F3 magic / F4 size / M15 sanitize over the PDF
        table (reference: extraction.py:96-97, file_helpers.py:15-78,
        validators.py:259-281)."""
        from insurance_pdf_extractor_ray.pipelines.pdfingest import file_gates

        idx = list(range(60))
        tbl = pdfs_for_docs(idx)
        blobs = tbl.column("pdf").to_pylist()
        blobs[10] = b"%BAD-" + blobs[10][5:]  # F3 violation
        tbl = tbl.set_column(2, "pdf", pa.array(blobs, pa.binary()))
        rows = {r["doc_id"]: r
                for r in file_gates(ray.data.from_arrow(tbl)).take_all()}
        assert len(rows) == 60
        assert not rows["doc-000000003"]["ext_ok"]          # .docx (i%17==3)
        assert rows["doc-000000011"]["ext_ok"]              # ' final.PDF' passes F2
        assert not rows["doc-000000010"]["magic_ok"]
        assert rows["doc-000000005"]["safe_name"].endswith(".pdf")
        assert "<" not in rows["doc-000000005"]["safe_name"]
        assert all(r["size_ok"] for r in rows.values())     # default 10MB cap
        # drop mode quarantines exactly the violators
        kept = file_gates(ray.data.from_arrow(tbl), drop_failed=True).count()
        n_bad = sum(1 for r in rows.values()
                    if not (r["ext_ok"] and r["magic_ok"] and r["size_ok"]))
        assert kept == 60 - n_bad and n_bad >= 4

    def test_golden_e2e_fields(self, ray_session):
        """The done-criterion: generated PDF -> extract_pipeline -> all 18
        fields + status equal the expected record, for two full family
        cycles."""
        from insurance_pdf_extractor_ray.config import FIELD_ORDER
        from insurance_pdf_extractor_ray.pipelines.extraction import flatten_fields
        from insurance_pdf_extractor_ray.pipelines.goldencheck import golden_diff

        idx = list(range(24))
        pdfs = ray.data.from_arrow(pdfs_for_docs(idx))
        engine = flatten_fields(pdf_extract_pipeline(pdfs))
        golden = expected_tables(idx)[0].select(
            ["doc_id"] + FIELD_ORDER + ["status"])
        diff = golden_diff(engine, ray.data.from_arrow(golden),
                           key="doc_id").take_all()
        assert diff == []


class TestPdfInfo:
    """PDF document-information dictionary (reference get_pdf_info,
    pdf_processor.py:458-497)."""

    def test_info_roundtrip(self):
        from insurance_pdf_extractor_ray.functions.pdfcodec import (
            build_pdf, parse_pdf, pdf_info)

        spans = [("heading", "Policy Schedule", ""),
                 ("text", "body (line) \\ one\nline two", "")]
        meta = {"title": "Policy (A) Schedule", "author": "agent-7",
                "subject": "insurance policy", "creator": "ipe-synth",
                "producer": "engine", "creation_date": "D:20240301090000",
                "modification_date": "D:20240302100000"}
        blob = build_pdf(spans, info=meta)
        assert parse_pdf(blob) == spans          # spans unaffected by /Info
        got = pdf_info(blob)
        assert got["metadata"] == meta
        assert got["num_pages"] == 1
        assert got["size_bytes"] == len(blob)
        assert got["first_page_preview"].startswith("Policy Schedule")
        assert got["estimated_text_length"] == \
            len("Policy Schedule\nbody (line) \\ one\nline two")

    def test_no_info_and_error_envelopes(self):
        from insurance_pdf_extractor_ray.functions.pdfcodec import (
            build_pdf, pdf_info)

        plain = pdf_info(build_pdf([("text", "hello", "")]))
        assert "metadata" not in plain and plain["num_pages"] == 1
        bad = pdf_info(b"%PDF-garbage")
        assert bad["num_pages"] == 0 and "error" in bad
        assert bad["size_bytes"] == len(b"%PDF-garbage")

    def test_fixture_metadata_golden(self, ray_session):
        """Generated fixtures carry deterministic /Info (title == first
        heading), every-13th doc omits it, and the distributed stage
        reproduces the scalar projection for every doc."""
        from insurance_pdf_extractor_ray.functions.pdfcodec import pdf_info
        from insurance_pdf_extractor_ray.pipelines.pdfingest import (
            pdf_info_table)
        from insurance_pdf_extractor_ray.sources.synth import build_doc

        idx = list(range(40))
        tbl = pdfs_for_docs(idx)
        rows = {r["doc_id"]: r for r in
                pdf_info_table(ray.data.from_arrow(tbl)).take_all()}
        assert len(rows) == 40
        blobs = dict(zip(tbl.column("doc_id").to_pylist(),
                         tbl.column("pdf").to_pylist()))
        for i in idx:
            spec = build_doc(i, 42)
            r = rows[spec.doc_id]
            scalar = pdf_info(blobs[spec.doc_id])
            if i % 13 == 4:
                assert r["title"] == "" and r["author"] == ""
                assert "metadata" not in scalar
            else:
                spans = sorted((s for c in spec.row_chunks for s in c),
                               key=lambda s: s[3])
                first_heading = next(
                    (t for (k, t, _m, _o) in spans if k == "heading"), "")
                assert r["title"] == (first_heading or spec.doc_id)
                assert r["author"] == f"agent-{i % 53}"
                assert r["creation_date"] == scalar["metadata"][
                    "creation_date"]
            assert r["num_pages"] == scalar["num_pages"] >= 1
            assert r["first_page_preview"] == scalar["first_page_preview"]
            assert r["error"] == ""
