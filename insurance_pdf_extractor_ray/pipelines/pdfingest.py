"""Real-PDF ingestion: binary PDF documents -> the span model -> extraction.

The reference ingests actual PDF bytes (one per request) and parses them
with pypdf before prompting the LLM
(/root/reference/app/services/pdf_processor.py:364-377, pages at :458-483);
its fixtures are reportlab-generated one-line-per-field PDFs
(/root/reference/tests/utils/mock_generators.py:11-48).  This pipeline is
the distributed analog: a table of ``(doc_id, pdf: binary)`` rows is parsed
by an actor-pool stage (``functions/pdfcodec.py`` — a real xref-driven
object-graph parser, FlateDecode streams, text + image XObjects) into the
canonical ``(doc_id, spans)`` input the extraction pipeline consumes.

Scale shape: parsing is per-document CPU work with zero shuffle; payloads
are binary, so batches stay small (same memory contract as multimodal
decode).  The PDF writer side exists to synthesize real fixtures at any
scale — generation is embarrassingly parallel per doc index.
"""

from __future__ import annotations

from typing import List, Tuple

import pyarrow as pa
import ray.data

from ..functions.pdfcodec import build_pdf, parse_pdf
from ..schema import SPANS_TYPE


def pdf_info_for_doc(index: int, doc_id: str, spans) -> dict:
    """Deterministic document-information dictionary for a fixture doc:
    title mirrors the first heading (the reference metadata field with a
    content twin), the rest derive from the doc index."""
    first_heading = next((t for (k, t, _m, _o) in spans
                          if k == "heading"), "")
    return {
        "title": first_heading or doc_id,
        "author": f"agent-{index % 53}",
        "subject": "insurance policy schedule",
        "creator": "ipe-synth",
        "producer": "insurance_pdf_extractor_ray",
        "creation_date": f"D:2024{index % 12 + 1:02d}"
                         f"{index % 28 + 1:02d}090000",
        "modification_date": f"D:2024{index % 12 + 1:02d}"
                             f"{index % 28 + 1:02d}1{index % 6}0000",
    }


def pdf_bytes_for_doc(index: int, seed: int = 42) -> Tuple[str, bytes]:
    """One deterministic real-PDF fixture: the synthetic doc spec rendered
    through the real writer (doc order restored first — PDFs are physically
    ordered even when the span table is chunk-shuffled), with a real /Info
    document-information dictionary (every 13th doc omits it, so the
    no-metadata envelope stays exercised like the reference's optional
    ``pdf_reader.metadata``)."""
    from ..sources.synth import build_doc

    spec = build_doc(index, seed)
    spans = sorted((s for chunk in spec.row_chunks for s in chunk),
                   key=lambda s: s[3])
    info = None if index % 13 == 4 \
        else pdf_info_for_doc(index, spec.doc_id, spans)
    return spec.doc_id, build_pdf([(k, t, m) for (k, t, m, _o) in spans],
                                  info=info)


def filename_for_doc(index: int) -> str:
    """Deterministic source filename for a doc, with planted violations:
    a wrong extension every 17th doc (F2), characters needing sanitization
    every 23rd (M15), and case/space variants every 29th."""
    from ..sources.synth import doc_id_for

    base = doc_id_for(index)
    if index % 17 == 3:
        return f"{base}_quote.docx"
    if index % 23 == 5:
        return f"{base}<v:2>.pdf"
    if index % 29 == 11:
        return f"{base} final.PDF"
    return f"{base}_quote.pdf"


def pdfs_for_docs(indices, seed: int = 42) -> pa.Table:
    ids, names, blobs = [], [], []
    for i in indices:
        doc_id, blob = pdf_bytes_for_doc(int(i), seed)
        ids.append(doc_id)
        names.append(filename_for_doc(int(i)))
        blobs.append(blob)
    return pa.table({"doc_id": pa.array(ids, pa.string()),
                     "filename": pa.array(names, pa.string()),
                     "pdf": pa.array(blobs, pa.binary())})


PDF_MAGIC = b"%PDF-"


def file_gates(ds: ray.data.Dataset, cap_bytes: int = 10 * 2**20,
               drop_failed: bool = False) -> ray.data.Dataset:
    """Pre-parse file gates over a (doc_id, filename, pdf) table — the
    reference's request-admission checks, vectorized and tag-and-keep:

    * ``ext_ok``   — F2 '.pdf' extension gate (case-insensitive),
      /root/reference/app/api/routes/extraction.py:96-97
    * ``magic_ok`` — F3 '%PDF-' magic-bytes sniff,
      /root/reference/app/utils/file_helpers.py:15-50
    * ``size_ok``  — F4 byte-size cap (10 MB default),
      /root/reference/app/utils/file_helpers.py:53-78, config.py:39
    * ``safe_name``— M15 sanitized filename,
      /root/reference/app/utils/validators.py:259-281

    ``drop_failed=True`` keeps only rows passing all three predicates (the
    reference rejects the request; at scale we quarantine)."""
    import pyarrow.compute as pc

    from ..functions.normalize import sanitize_filename

    def gate(batch: pa.Table) -> pa.Table:
        names = batch.column("filename")
        ext_ok = pc.ends_with(pc.utf8_lower(names), pattern=".pdf")
        blobs = batch.column("pdf").to_pylist()
        magic_ok = pa.array([(b or b"")[:5] == PDF_MAGIC for b in blobs],
                            pa.bool_())
        size_ok = pc.less_equal(pc.binary_length(batch.column("pdf")),
                                pa.scalar(cap_bytes))
        safe = pa.array([sanitize_filename(n) for n in names.to_pylist()],
                        pa.string())
        out = (batch.append_column("ext_ok", ext_ok)
                    .append_column("magic_ok", magic_ok)
                    .append_column("size_ok", size_ok.cast(pa.bool_()))
                    .append_column("safe_name", safe))
        if drop_failed:
            keep = pc.and_(pc.and_(ext_ok, magic_ok), size_ok)
            out = out.filter(keep)
        return out

    return ds.map_batches(gate, batch_format="pyarrow")


class PdfParseStage:
    """Actor-pool parse stage: (doc_id, pdf) -> (doc_id, spans).

    Parse state (compiled token regexes) is module-level-compiled once per
    process; the stage itself is stateless per batch.  Unparseable payloads
    are routed to an ``error`` column (tag-and-keep, like F1's validation
    side channel) with an empty span list."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id").to_pylist()
        blobs = batch.column("pdf").to_pylist()
        span_lists: List[list] = []
        errors: List[str] = []
        for blob in blobs:
            try:
                parsed = parse_pdf(blob)
                span_lists.append(
                    [{"kind": k, "text": t, "media_ref": m, "offset": i}
                     for i, (k, t, m) in enumerate(parsed)])
                errors.append("")
            except Exception as e:  # noqa: BLE001 - tag-and-keep (crawl reality)
                span_lists.append([])
                errors.append(f"{type(e).__name__}: {e}")
        return pa.table({"doc_id": pa.array(ids, pa.string()),
                         "spans": pa.array(span_lists, SPANS_TYPE),
                         "error": pa.array(errors, pa.string())})


def pdf_to_docs(ds: ray.data.Dataset, batch_size: int = 64,
                concurrency=(1, 8), drop_errors: bool = False) -> ray.data.Dataset:
    """(doc_id, pdf) Dataset -> (doc_id, spans[, error]) span-model Dataset."""
    out = ds.map_batches(PdfParseStage, batch_format="pyarrow",
                         batch_size=batch_size, concurrency=concurrency)
    if drop_errors:
        out = out.filter(expr="error == ''")
    return out.drop_columns(["error"]) if drop_errors else out


_INFO_META_COLS = ("title", "author", "subject", "creator", "producer",
                   "creation_date", "modification_date")


class PdfInfoStage:
    """Actor-pool metadata stage: (doc_id, pdf) -> the reference's
    ``get_pdf_info`` projection (pdf_processor.py:458-497) as flat columns
    — page count, sizes, the seven /Info metadata fields ('' when the PDF
    carries no /Info, mirroring pypdf's optional ``reader.metadata``),
    first-page preview and estimated text length; parse failures surface
    in ``error`` with the reference's zero-page envelope."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..functions.pdfcodec import pdf_info

        infos = [pdf_info(blob) for blob in batch.column("pdf").to_pylist()]
        cols = {
            "doc_id": batch.column("doc_id"),
            "num_pages": pa.array([i["num_pages"] for i in infos],
                                  pa.int32()),
            "size_bytes": pa.array([i["size_bytes"] for i in infos],
                                   pa.int64()),
            "size_mb": pa.array([i["size_mb"] for i in infos],
                                pa.float64()),
        }
        for k in _INFO_META_COLS:
            cols[k] = pa.array([i.get("metadata", {}).get(k, "")
                                for i in infos], pa.string())
        cols["first_page_preview"] = pa.array(
            [i.get("first_page_preview", "") for i in infos], pa.string())
        cols["estimated_text_length"] = pa.array(
            [i.get("estimated_text_length", 0) for i in infos], pa.int64())
        cols["error"] = pa.array([i.get("error", "") for i in infos],
                                 pa.string())
        return pa.table(cols)


def pdf_info_table(ds: ray.data.Dataset, batch_size: int = 64,
                   concurrency=(1, 8)) -> ray.data.Dataset:
    """(doc_id, pdf) Dataset -> per-doc PDF info/metadata table (M14's
    binary-path twin: the span-path ``extraction.doc_info`` projects
    n_spans/n_chars/title/preview from extractor output; this projects the
    real /Info metadata + page stats straight from the bytes)."""
    return ds.map_batches(PdfInfoStage, batch_format="pyarrow",
                          batch_size=batch_size, concurrency=concurrency)


def pdf_extract_pipeline(ds: ray.data.Dataset, **extract_kwargs) -> ray.data.Dataset:
    """Full binary path: PDFs -> span model -> extraction output."""
    from .extraction import extract_pipeline

    docs = pdf_to_docs(ds, drop_errors=True)
    return extract_pipeline(docs, **extract_kwargs)
