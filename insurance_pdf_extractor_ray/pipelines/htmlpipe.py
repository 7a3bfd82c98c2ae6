"""HTML ingestion pipelines: raw HTML column -> main content / span docs.

The HTML analog of the PDF path: boilerplate-strip via text-density scoring
(functions/html.py), emitting either plain main-content text or the engine's
canonical interleaved span shape for the extraction pipeline.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.html import extract_main_content, html_to_spans
from ..schema import SPANS_TYPE


def main_content(ds: ray.data.Dataset, html_col: str, id_col: str) -> ray.data.Dataset:
    """(id, html) -> (id, text): boilerplate-stripped main content."""

    def run(batch: pa.Table) -> pa.Table:
        texts = [extract_main_content(h or "") for h in batch.column(html_col).to_pylist()]
        return pa.table({id_col: batch.column(id_col),
                         "text": pa.array(texts, pa.string())})

    return ds.map_batches(run, batch_format="pyarrow")


def html_to_docs(ds: ray.data.Dataset, html_col: str, id_col: str) -> ray.data.Dataset:
    """(id, html) -> (doc_id, spans): canonical input for extract_pipeline."""

    def run(batch: pa.Table) -> pa.Table:
        ids = [str(i) for i in batch.column(id_col).to_pylist()]
        span_lists = [html_to_spans(h or "") for h in batch.column(html_col).to_pylist()]
        return pa.table({"doc_id": pa.array(ids, pa.string()),
                         "spans": pa.array(span_lists, SPANS_TYPE)})

    return ds.map_batches(run, batch_format="pyarrow")
