"""Canonical Arrow schemas for the engine.

Input shape (authoritative: /root/repo/BASELINE.json ``input_hint``):
    doc_id: string
    spans:  list<struct<kind:string, text:string, media_ref:string, offset:int32>>

Output shape: one row per document with the 18-field record
(/root/reference/app/models/extraction.py:12-46), status, errors/warnings,
confidence map, and the cleaned output span sequence.

Nulls inside the field struct are always the literal string "EMPTY VALUE"
(reference sentinel, storage.py:557-560) — never Arrow null.
"""

from __future__ import annotations

import pyarrow as pa

from .config import FIELD_ORDER

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

SPANS_TYPE = pa.list_(SPAN_STRUCT)

INPUT_SCHEMA = pa.schema([("doc_id", pa.string()), ("spans", SPANS_TYPE)])

FIELDS_STRUCT = pa.struct([(name, pa.string()) for name in FIELD_ORDER])

CONFIDENCE_TYPE = pa.list_(pa.struct([("key", pa.string()), ("value", pa.float64())]))

OUTPUT_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("fields", FIELDS_STRUCT),
        ("status", pa.string()),  # success | partial_success (pdf_processor.py:113)
        ("validation_errors", pa.list_(pa.string())),
        ("warnings", pa.list_(pa.string())),
        ("failed_fields", pa.list_(pa.string())),
        ("confidence", CONFIDENCE_TYPE),
        ("spans_out", SPANS_TYPE),
        ("n_spans", pa.int32()),
        ("n_chars", pa.int64()),
        ("title", pa.string()),       # M14: first heading span
        ("preview", pa.string()),     # M14: <=500-char text preview
        ("rules_version", pa.string()),  # §2.11: rule-table version that produced the row
    ]
)

# Long-format exploded field table (reference extraction_fields, storage.py:79-92)
FIELDS_LONG_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("field_name", pa.string()),
        ("field_value", pa.string()),
        ("confidence", pa.float64()),
        ("is_failed", pa.bool_()),
    ]
)


def empty_output_table() -> pa.Table:
    return OUTPUT_SCHEMA.empty_table()
