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
from ..schema import FIELDS_STRUCT, SPAN_STRUCT
from .boilerplate import boilerplate_mask, is_boilerplate
from .validate import validate_record

EMPTY = "EMPTY VALUE"


class FieldExtractor:
    """Callable-class stage: stateful setup in ``__init__``, work in ``__call__``."""

    # document gates (F1/F4 of SURVEY.md §2.2, pdf_processor.py:343-385):
    # size cap and empty-doc are errors (reference raises FileProcessingError
    # -> request error; we tag-and-keep with status='error'); a short text
    # sample is a warning (reference only logs it — surfaced on the row here
    # so it's queryable at scale).
    MAX_DOC_BYTES = 10 * 1024 * 1024  # max_file_size_mb=10 (config.py:39)
    MIN_TEXT_SAMPLE = 10
    # M14 doc-info projection (get_pdf_info, pdf_processor.py:447-494): the
    # reference returns page count + PDF-metadata title + a <=500-char text
    # preview; the span-model analogs are n_spans, the first heading span,
    # and the first 500 cleaned text chars (no author field in span tables)
    PREVIEW_CHARS = 500

    def __init__(self, label_map: Optional[Dict[str, str]] = None, strip_boilerplate: bool = True,
                 rules_version: Optional[str] = None,
                 version_tag: Optional[str] = None):
        # compiled once per actor (reference holds these as process singletons).
        # The alias table is version-managed (ruleversions.py, the reference's
        # prompt_manager.py analog); an explicit label_map wins ('custom'
        # unless version_tag names it — the driver-resolved registered-
        # version path).
        from ..ruleversions import resolve_rules

        self.label_map, self.rules_version = resolve_rules(
            label_map, rules_version, version_tag)
        self.line_re = re.compile(r"^\s*([^:]{1,60}):\s*(.*)$")
        # 'ID-Excluded' literal form, then prose form 'XX ... is excluded'
        self.excl_literal_re = re.compile(r"\b([A-Z]{2})-Excluded\b")
        # case-sensitive state group so lowercase bigrams ('is', 'of') never
        # shadow the real state code under a case-insensitive scan
        self.excl_prose_re = re.compile(r"\b([A-Z]{2})\b[^\n]*?\bis [Ee]xcluded\b")
        # per-state premium breakdown line: 'NY - <carrier> - $553.00'
        # (fields.yaml:40-43 / prompts.yaml example: when present,
        # issuing_carrier becomes the stringified rounded list)
        self.state_premium_re = re.compile(
            r"^\s*([A-Z]{2}) - (.+?) - \$?([\d,]+(?:\.\d+)?)\s*$"
        )
        self.strip_boilerplate = strip_boilerplate
        self.text_kinds = frozenset(["text", "heading", "table"])
        self._empty_raw = {f: EMPTY for f in FIELD_ORDER}

    # -- per-document core (single-doc reference path; same code as batch) ----
    def extract_doc(self, spans: List[dict]) -> Dict:
        """Extract one document from its offset-ordered span dicts.

        Returns the full output-row dict (fields, status, errors, warnings,
        failed_fields, confidence, spans_out, n_spans, n_chars).  Delegates to
        :meth:`extract_doc_arrays` — the identical hot path the batch
        interface uses — so the two can't drift.

        Note: a 'Quote Number:' line with an empty value overrides the EMPTY
        default so required-field validation fires (extraction.py:60-65); raw
        stays EMPTY when a label never appears, mirroring the prompt contract
        (config/prompts.yaml example output: EMPTY VALUE for absent fields).
        """
        kinds = [s["kind"] for s in spans]
        texts = [s["text"] or "" for s in spans]
        medias = [s["media_ref"] or "" for s in spans]
        raw, response_text, kept = self.extract_doc_arrays(kinds, texts, medias)

        gate_errors, gate_warnings = self.doc_gates(kinds, texts, response_text)
        if gate_errors:
            fields = dict(self._empty_raw)
            errors, warnings, status = gate_errors, [], "error"
        else:
            fields, errors, warnings, status = validate_record(raw)
            warnings = warnings + gate_warnings
        confidence = calculate_confidence_scores(fields, response_text)
        failed = extract_failed_fields(errors) if errors else []

        spans_out = []
        n_chars = 0
        title = ""
        preview_parts: List[str] = []
        preview_len = 0
        for i in kept:
            kind = kinds[i]
            txt = clean_text_field(texts[i]) if kind in self.text_kinds else texts[i]
            n_chars += len(txt)
            if kind in self.text_kinds:
                if not title and kind == "heading" and txt:
                    title = txt
                if preview_len < self.PREVIEW_CHARS:
                    preview_parts.append(txt)
                    preview_len += len(txt) + 1
            spans_out.append(
                {"kind": kind, "text": txt, "media_ref": medias[i],
                 "offset": len(spans_out)}
            )

        return {
            "fields": fields, "status": status, "validation_errors": errors,
            "warnings": warnings, "failed_fields": failed,
            "confidence": [{"key": k, "value": v} for k, v in confidence.items()],
            "spans_out": spans_out, "n_spans": len(spans_out), "n_chars": n_chars,
            "title": title,
            "preview": "\n".join(preview_parts)[: self.PREVIEW_CHARS],
            "rules_version": self.rules_version,
        }

    # -- vectorized document core --------------------------------------------
    def extract_doc_arrays(self, kinds, texts, medias, boiler=None):
        """Same semantics as :meth:`extract_doc` over parallel span arrays
        (already offset-ordered).  Returns (raw_fields_dict, response_text,
        kept_indices) — the hot inner loop with no dict-per-span overhead.
        ``boiler`` is an optional precomputed per-span boilerplate mask
        (``boilerplate_mask`` over the whole batch — bit-identical to the
        scalar test, ~40x cheaper on span-heavy docs)."""
        raw: Dict[str, str] = dict(self._empty_raw)
        kept = []
        text_parts: List[str] = []
        state_premiums: List[str] = []
        label_map = self.label_map
        line_match = self.line_re.match
        excl_unset = True
        for i in range(len(kinds)):
            kind = kinds[i]
            if kind in self.text_kinds:
                text = texts[i] or ""
                if self.strip_boilerplate and (
                        boiler[i] if boiler is not None
                        else is_boilerplate(text)):
                    continue
                text_parts.append(text)
                for line in text.split("\n"):
                    m = line_match(line)
                    if m:
                        label = clean_text_field(m.group(1)).lower()
                        fieldname = label_map.get(label)
                        if fieldname is not None and raw[fieldname] == EMPTY:
                            raw[fieldname] = clean_text_field(m.group(2))
                    if " - " in line:
                        sp = self.state_premium_re.match(line)
                        if sp and sp.group(1) in US_STATES:
                            amt = int(round(float(sp.group(3).replace(",", ""))))
                            state_premiums.append(f"{sp.group(1)} - {sp.group(2)} - {amt}")
                    # cheap substring gate before the two exclusion regex
                    # scans — filler lines never contain 'xcluded' (70% of
                    # oversized-doc line-loop time was these two searches)
                    if excl_unset and "xcluded" in line:
                        lit = self.excl_literal_re.search(line)
                        if lit and lit.group(1) in US_STATES:
                            raw["workers_comp_exclusion_description"] = f"{lit.group(1)}-Excluded"
                            excl_unset = False
                        else:
                            pro = self.excl_prose_re.search(line)
                            if pro and pro.group(1) in US_STATES:
                                raw["workers_comp_exclusion_description"] = f"{pro.group(1)}-Excluded"
                                excl_unset = False
            kept.append(i)
        if state_premiums:
            # per-state breakdown wins over the plain carrier name
            raw["issuing_carrier"] = str(state_premiums)
        return raw, "\n".join(text_parts), kept

    def doc_gates(self, kinds, texts, response_text: str):
        """F1/F4 gates: returns (gate_errors, gate_warnings)."""
        if len(kinds) == 0:
            return (["Document contains no spans"], [])
        # cheap char count first; UTF-8 expands at most 4x, so only docs that
        # could possibly exceed the byte cap pay for the exact encode
        chars = sum(len(t) for t in texts if t)
        if chars * 4 > self.MAX_DOC_BYTES:
            size = sum(len(t.encode("utf-8")) for t in texts if t)
            if size > self.MAX_DOC_BYTES:
                return ([f"Document size {size} bytes exceeds maximum "
                         f"{self.MAX_DOC_BYTES} bytes"], [])
        if len(response_text.strip()) < self.MIN_TEXT_SAMPLE:
            return ([], ["Document may be image-based or have little text content"])
        return ([], [])

    # -- batch interface ------------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        doc_ids = batch.column("doc_id")
        span_col = batch.column("spans")
        if isinstance(span_col, pa.ChunkedArray):
            span_col = span_col.combine_chunks()
        lengths = span_col.value_lengths().fill_null(0).to_numpy()
        flat = span_col.flatten()  # StructArray (slice-safe)
        kinds_a = flat.field(0).to_numpy(zero_copy_only=False)
        texts_a = flat.field(1).to_numpy(zero_copy_only=False)
        medias_a = flat.field(2).to_numpy(zero_copy_only=False)
        # one vectorized boilerplate pass over every span in the batch
        # (numpy byte kernels; bit-identical to the scalar test) — the
        # per-span Python scorer was 70% of oversized-doc extraction time
        boiler_a = (boilerplate_mask(flat.field(1))
                    if self.strip_boilerplate else None)
        # vectorized clean_text_field fast-path test: spans the dirty mask
        # clears pass through unchanged, the rest take the scalar cleaner
        from ..functions.normalize import dirty_text_mask

        dirty_a = dirty_text_mask(flat.field(1))

        import numpy as np

        starts = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(lengths, out=starts[1:])

        field_cols: Dict[str, List[str]] = {f: [] for f in FIELD_ORDER}
        statuses: List[str] = []
        errors_l: List[List[str]] = []
        warnings_l: List[List[str]] = []
        failed_l: List[List[str]] = []
        conf_keys: List[str] = []
        conf_vals: List[float] = []
        conf_offsets = [0]
        so_kind: List[str] = []
        so_text: List[str] = []
        so_media: List[str] = []
        so_off: List[int] = []
        so_offsets = [0]
        n_spans_c: List[int] = []
        n_chars_c: List[int] = []
        titles: List[str] = []
        previews: List[str] = []

        for r in range(n):
            lo, hi = starts[r], starts[r + 1]
            kinds = kinds_a[lo:hi]
            texts = texts_a[lo:hi]
            medias = medias_a[lo:hi]
            raw, response_text, kept = self.extract_doc_arrays(
                kinds, texts, medias,
                boiler=None if boiler_a is None else boiler_a[lo:hi])
            gate_errors, gate_warnings = self.doc_gates(kinds, texts, response_text)
            if gate_errors:
                fields = dict(self._empty_raw)
                errors, warnings, status = gate_errors, [], "error"
            else:
                fields, errors, warnings, status = validate_record(raw)
                warnings = warnings + gate_warnings
            confidence = calculate_confidence_scores(fields, response_text)
            failed = extract_failed_fields(errors) if errors else []

            for f in FIELD_ORDER:
                field_cols[f].append(fields[f])
            statuses.append(status)
            errors_l.append(errors)
            warnings_l.append(warnings)
            failed_l.append(failed)
            conf_keys.extend(confidence.keys())
            conf_vals.extend(confidence.values())
            conf_offsets.append(len(conf_keys))

            chars = 0
            pos = 0
            title = ""
            preview_parts: List[str] = []
            preview_len = 0
            for i in kept:
                kind = kinds[i]
                if kind in self.text_kinds:
                    txt = (texts[i] or "") if not dirty_a[lo + i] \
                        else clean_text_field(texts[i] or "")
                    if not title and kind == "heading" and txt:
                        title = txt
                    if preview_len < self.PREVIEW_CHARS:
                        preview_parts.append(txt)
                        preview_len += len(txt) + 1
                else:
                    txt = texts[i] or ""
                chars += len(txt)
                so_kind.append(kind)
                so_text.append(txt)
                so_media.append(medias[i] or "")
                so_off.append(pos)
                pos += 1
            so_offsets.append(len(so_kind))
            n_spans_c.append(pos)
            n_chars_c.append(chars)
            titles.append(title)
            previews.append("\n".join(preview_parts)[: self.PREVIEW_CHARS])

        fields_arr = pa.StructArray.from_arrays(
            [pa.array(field_cols[f], pa.string()) for f in FIELD_ORDER],
            fields=list(FIELDS_STRUCT),
        )
        conf_arr = pa.ListArray.from_arrays(
            pa.array(conf_offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [pa.array(conf_keys, pa.string()), pa.array(conf_vals, pa.float64())],
                names=["key", "value"],
            ),
        )
        spans_out_arr = pa.ListArray.from_arrays(
            pa.array(so_offsets, pa.int32()),
            pa.StructArray.from_arrays(
                [pa.array(so_kind, pa.string()), pa.array(so_text, pa.string()),
                 pa.array(so_media, pa.string()), pa.array(so_off, pa.int32())],
                fields=list(SPAN_STRUCT),
            ),
        )
        return pa.table(
            {
                "doc_id": doc_ids,
                "fields": fields_arr,
                "status": pa.array(statuses, pa.string()),
                "validation_errors": pa.array(errors_l, pa.list_(pa.string())),
                "warnings": pa.array(warnings_l, pa.list_(pa.string())),
                "failed_fields": pa.array(failed_l, pa.list_(pa.string())),
                "confidence": conf_arr,
                "spans_out": spans_out_arr,
                "n_spans": pa.array(n_spans_c, pa.int32()),
                "n_chars": pa.array(n_chars_c, pa.int64()),
                "title": pa.array(titles, pa.string()),
                "preview": pa.array(previews, pa.string()),
                "rules_version": pa.array([self.rules_version] * n, pa.string()),
            }
        )

