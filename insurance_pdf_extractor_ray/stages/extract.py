"""The stateful field-extractor stage (actor pool for ``map_batches``).

Replaces the reference's Gemini call (gemini.py:85-134) with a deterministic
layout/rules extractor per the north-star spec: labeled-line parsing over the
document's span sequence (the reference's mock corpus style,
tests/utils/mock_generators.py:18-39), boilerplate stripping via shallow
text-density features, state-exclusion detection
(config/fields.yaml:92-95), then the reference-exact validation +
confidence + failed-fields enrichment
(extraction.py:183-233, pdf_processor.py:387-445).

Everything the reference holds as warm process state (compiled patterns, the
field catalog, prompt/config caches — gemini.py:22-46, prompt_manager.py:19-47,
config.py:52-88) lives in ``__init__`` here: built once per actor, reused for
every batch.  Use as::

    ds.map_batches(FieldExtractor, concurrency=(2, 8),
                   batch_format="pyarrow", batch_size=256)
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional

import pyarrow as pa

from ..config import FIELD_ORDER, LABEL_TO_FIELD
from ..functions.confidence import calculate_confidence_scores, extract_failed_fields
from ..functions.normalize import US_STATES, clean_text_field
from ..schema import CONFIDENCE_TYPE, FIELDS_STRUCT, SPAN_STRUCT, SPANS_TYPE
from .boilerplate import is_boilerplate
from .validate import validate_record

EMPTY = "EMPTY VALUE"


class FieldExtractor:
    """Callable-class stage: stateful setup in ``__init__``, work in ``__call__``."""

    def __init__(self, label_map: Optional[Dict[str, str]] = None, strip_boilerplate: bool = True):
        # compiled once per actor (reference holds these as process singletons)
        self.label_map = dict(LABEL_TO_FIELD if label_map is None else label_map)
        self.line_re = re.compile(r"^\s*([^:]{1,60}):\s*(.*)$")
        # 'ID-Excluded' literal form, then prose form 'XX ... is excluded'
        self.excl_literal_re = re.compile(r"\b([A-Z]{2})-Excluded\b")
        # case-sensitive state group so lowercase bigrams ('is', 'of') never
        # shadow the real state code under a case-insensitive scan
        self.excl_prose_re = re.compile(r"\b([A-Z]{2})\b[^\n]*?\bis [Ee]xcluded\b")
        self.strip_boilerplate = strip_boilerplate
        self.text_kinds = frozenset(["text", "heading", "table"])

    # -- per-document core ----------------------------------------------------
    def extract_doc(self, spans: List[dict]) -> Dict:
        """Extract one document from its offset-ordered span dicts.

        Returns the full output-row dict (fields, status, errors, warnings,
        failed_fields, confidence, spans_out, n_spans, n_chars).
        """
        raw: Dict[str, str] = {f: EMPTY for f in FIELD_ORDER}
        kept: List[dict] = []
        text_parts: List[str] = []

        for span in spans:
            kind = span["kind"]
            text = span["text"] or ""
            if kind in self.text_kinds:
                if self.strip_boilerplate and is_boilerplate(text):
                    continue
                text_parts.append(text)
                for line in text.split("\n"):
                    m = self.line_re.match(line)
                    if m:
                        label = clean_text_field(m.group(1)).lower()
                        fieldname = self.label_map.get(label)
                        if fieldname is not None and raw[fieldname] == EMPTY:
                            value = clean_text_field(m.group(2))
                            raw[fieldname] = value
                    if raw["workers_comp_exclusion_description"] == EMPTY:
                        lit = self.excl_literal_re.search(line)
                        if lit and lit.group(1) in US_STATES:
                            raw["workers_comp_exclusion_description"] = f"{lit.group(1)}-Excluded"
                        else:
                            pro = self.excl_prose_re.search(line)
                            if pro and pro.group(1) in US_STATES:
                                raw["workers_comp_exclusion_description"] = f"{pro.group(1)}-Excluded"
            kept.append(span)

        # 'Quote Number:' with empty value must override the EMPTY default so
        # required-field validation fires (extraction.py:60-65); the line
        # parser above writes "" in that case only if the label matched —
        # raw stays EMPTY when the label never appears, mirroring the
        # prompt contract (config/prompts.yaml example: EMPTY VALUE for absent).
        response_text = "\n".join(text_parts)

        fields, errors, warnings, status = validate_record(raw)
        confidence = calculate_confidence_scores(fields, response_text)
        failed = extract_failed_fields(errors) if errors else []

        spans_out = []
        n_chars = 0
        for span in kept:
            kind = span["kind"]
            if kind in self.text_kinds:
                txt = clean_text_field(span["text"] or "")
            else:
                txt = span["text"] or ""
            n_chars += len(txt)
            spans_out.append(
                {"kind": kind, "text": txt, "media_ref": span["media_ref"] or "",
                 "offset": len(spans_out)}
            )

        return {
            "fields": fields, "status": status, "validation_errors": errors,
            "warnings": warnings, "failed_fields": failed,
            "confidence": [{"key": k, "value": v} for k, v in confidence.items()],
            "spans_out": spans_out, "n_spans": len(spans_out), "n_chars": n_chars,
        }

    # -- batch interface ------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_ids = batch.column("doc_id").to_pylist()
        span_col = batch.column("spans")
        spans_lists = span_col.to_pylist()

        out = {
            "doc_id": doc_ids, "fields": [], "status": [],
            "validation_errors": [], "warnings": [], "failed_fields": [],
            "confidence": [], "spans_out": [], "n_spans": [], "n_chars": [],
        }
        for spans in spans_lists:
            r = self.extract_doc(spans or [])
            for k in ("fields", "status", "validation_errors", "warnings",
                      "failed_fields", "confidence", "spans_out", "n_spans", "n_chars"):
                out[k].append(r[k])

        return pa.table(
            {
                "doc_id": pa.array(out["doc_id"], pa.string()),
                "fields": pa.array(out["fields"], FIELDS_STRUCT),
                "status": pa.array(out["status"], pa.string()),
                "validation_errors": pa.array(out["validation_errors"], pa.list_(pa.string())),
                "warnings": pa.array(out["warnings"], pa.list_(pa.string())),
                "failed_fields": pa.array(out["failed_fields"], pa.list_(pa.string())),
                "confidence": pa.array(out["confidence"], CONFIDENCE_TYPE),
                "spans_out": pa.array(out["spans_out"], SPANS_TYPE),
                "n_spans": pa.array(out["n_spans"], pa.int32()),
                "n_chars": pa.array(out["n_chars"], pa.int64()),
            }
        )


_ = SPAN_STRUCT  # re-exported for tests
