"""Layout ingestion: word-box tables -> canonical span documents.

The PDF-analog of the HTML path: a table of per-word geometry
``(doc_id, word, x0, y0, x1, y1)`` is clustered into lines/blocks and
table-detected (functions/layout.py), producing ``(doc_id, spans)`` rows for
the flagship extractor.  Word rows of one doc are brought together with the
same hash-partition groupby the reassembly uses.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.layout import WordBox, words_to_spans
from ..schema import SPANS_TYPE


def words_to_docs(
    ds: ray.data.Dataset,
    y_tol: float = 4.0,
    block_gap: float = 28.0,
    col_gap: float = 40.0,
) -> ray.data.Dataset:
    """(doc_id, word, x0..y1) rows -> (doc_id, spans) docs."""

    def parse_group(group: pa.Table) -> pa.Table:
        doc_id = group.column("doc_id")[0].as_py()
        words = [
            WordBox(w, x0, y0, x1, y1)
            for w, x0, y0, x1, y1 in zip(
                group.column("word").to_pylist(),
                group.column("x0").to_pylist(),
                group.column("y0").to_pylist(),
                group.column("x1").to_pylist(),
                group.column("y1").to_pylist(),
            )
        ]
        spans = words_to_spans(words, y_tol, block_gap, col_gap)
        return pa.table({"doc_id": pa.array([doc_id], pa.string()),
                         "spans": pa.array([spans], SPANS_TYPE)})

    from ..dsutil import bucketed_segments_map

    return bucketed_segments_map(
        ds, "doc_id", parse_group, min_rows=1,
        empty_out=pa.table({"doc_id": pa.array([], pa.string()),
                            "spans": pa.array([], SPANS_TYPE)}))
