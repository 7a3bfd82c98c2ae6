"""The flagship extraction pipeline.

    read (Lance/Parquet, pruned columns)
      -> map_batches(precombine)          # per-batch partial merge (combiner —
                                          #   the salted/skew-taming pre-aggregation)
      -> groupby(doc_id).map_groups(merge)  # the reassembly shuffle: one row per
                                          #   doc, spans sorted by offset
      -> map_batches(FieldExtractor, actor pool)  # stateful extraction+validation

Mirrors the reference lifecycle (SURVEY.md §3.1) minus the HTTP shell: the
pypdf page iteration becomes the offset-ordered span sequence; the Gemini
stage becomes the deterministic extractor actor; the per-request SQLite sink
becomes partitioned Parquet/Lance fragments.

Scale notes (100 TB):
  * The only all-to-all exchange is the ``groupby(doc_id)``.  ``precombine``
    merges same-doc rows inside each input block first, so the shuffle moves
    one partially-merged row per (doc, block) — the classic partial-aggregate
    answer to skewed/oversized docs (a 100x-span doc sharded over K blocks
    ships K combined rows, not K*100 spans rows).
  * When the input table is already bucketed by ``hash(doc_id)`` at write time
    (the Lance layout we write), pass ``assume_colocated=True`` to skip the
    global shuffle entirely and merge within blocks.
  * Column pruning at the read: only ``doc_id`` and ``spans`` leave storage.
"""

from __future__ import annotations

from typing import Optional, Tuple, Union

import numpy as np
import pyarrow as pa
import ray.data

from ..schema import SPANS_TYPE
from ..sources.io import read_table
from ..stages.extract import FieldExtractor


def _merge_rows_to_doc(doc_id: str, span_lists) -> dict:
    """Merge one doc's span-list rows and sort by offset."""
    spans = [s for lst in span_lists if lst is not None for s in lst]
    spans.sort(key=lambda s: s["offset"])
    return {"doc_id": doc_id, "spans": spans}


def precombine(batch: pa.Table) -> pa.Table:
    """Partial merge of same-doc rows within a batch (combiner before shuffle)."""
    doc_ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=object)
    if len(doc_ids) == 0 or len(np.unique(doc_ids)) == len(doc_ids):
        return batch  # fast path: no intra-batch duplicates, zero-copy passthrough
    span_lists = batch.column("spans").to_pylist()
    merged = {}
    order = []
    for did, spans in zip(doc_ids, span_lists):
        if did not in merged:
            merged[did] = []
            order.append(did)
        merged[did].append(spans)
    rows = [_merge_rows_to_doc(d, merged[d]) for d in order]
    return pa.table(
        {
            "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
            "spans": pa.array([r["spans"] for r in rows], SPANS_TYPE),
        }
    )


def merge_group(group: pa.Table) -> pa.Table:
    """Reassembly: merge all rows of one doc, sort spans by offset."""
    doc_id = group.column("doc_id")[0].as_py()
    row = _merge_rows_to_doc(doc_id, group.column("spans").to_pylist())
    return pa.table(
        {"doc_id": pa.array([row["doc_id"]], pa.string()),
         "spans": pa.array([row["spans"]], SPANS_TYPE)}
    )


def sort_spans_batch(batch: pa.Table) -> pa.Table:
    """Colocated fast path: rows are whole docs already; just sort each span list."""
    span_lists = batch.column("spans").to_pylist()
    fixed = [sorted(lst or [], key=lambda s: s["offset"]) for lst in span_lists]
    return pa.table(
        {"doc_id": batch.column("doc_id"), "spans": pa.array(fixed, SPANS_TYPE)}
    )


def reassemble(ds: ray.data.Dataset, assume_colocated: bool = False) -> ray.data.Dataset:
    """Rebuild one offset-ordered row per doc_id (the reassembly shuffle)."""
    ds = ds.map_batches(precombine, batch_format="pyarrow")
    if assume_colocated:
        # valid only when all rows of a doc share a block (bucketed layout)
        return ds.map_batches(sort_spans_batch, batch_format="pyarrow")
    return ds.groupby("doc_id").map_groups(merge_group, batch_format="pyarrow")


def extract_pipeline(
    source: Union[str, ray.data.Dataset],
    concurrency: Optional[Union[int, Tuple[int, int]]] = None,
    batch_size: int = 256,
    assume_colocated: bool = False,
    strip_boilerplate: bool = True,
) -> ray.data.Dataset:
    """Full pipeline: path or Dataset -> extracted/validated output Dataset."""
    ds = read_table(source, columns=["doc_id", "spans"]) if isinstance(source, str) else source
    ds = reassemble(ds, assume_colocated=assume_colocated)
    if concurrency is None:
        # autoscaling actor pool sized to the cluster (callable classes
        # require an explicit concurrency in Ray >= 2.9)
        import ray

        n_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (1, max(2, n_cpus))
    return ds.map_batches(
        FieldExtractor,
        fn_constructor_kwargs={"strip_boilerplate": strip_boilerplate},
        batch_format="pyarrow",
        batch_size=batch_size,
        concurrency=concurrency,
    )


def flatten_fields(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Project the fields struct up to top-level columns (doc_id, 18 fields, status)."""

    def up(batch: pa.Table) -> pa.Table:
        fields = batch.column("fields")
        cols = {"doc_id": batch.column("doc_id")}
        for i, f in enumerate(fields.type):
            # combine_chunks: field() on ChunkedArray
            fc = fields.combine_chunks() if isinstance(fields, pa.ChunkedArray) else fields
            cols[f.name] = fc.field(i)
        cols["status"] = batch.column("status")
        return pa.table(cols)

    return ds.map_batches(up, batch_format="pyarrow")
