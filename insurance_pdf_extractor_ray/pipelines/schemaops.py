"""Schema-evolution operators: align and union datasets by column NAME.

Real corpora arrive as parquet generations with drifting schemas (columns
added, dropped, reordered).  ``Dataset.union`` requires identical schemas;
this module computes the unified by-name schema once on the driver (schemas
are metadata — no data moves) and aligns every batch map-side: missing
columns become typed nulls, shared columns are cast to the promoted type,
column order is canonicalized.  Zero shuffle — union of aligned streams.

Reference analog: the extraction-results store tolerates old rows lacking
later-added fields (``app/services/storage.py`` selects by name with NULL
defaults); this is the same contract applied at ingest.
"""

from __future__ import annotations

from typing import List, Sequence

import pyarrow as pa
import ray.data


def unify_schemas_by_name(schemas: Sequence[pa.Schema]) -> pa.Schema:
    """First-seen column order; shared names must agree on type or be
    promotable (int -> float, anything -> its superset via
    ``pa.unify_schemas`` promotion rules)."""
    stripped = [pa.schema([(f.name, f.type) for f in s]) for s in schemas]
    return pa.unify_schemas(stripped, promote_options="permissive")


def align_to_schema(t: pa.Table, target: pa.Schema) -> pa.Table:
    """Project one batch onto ``target``: cast shared columns, null-fill
    missing ones, canonical order.  Vectorized (Arrow cast / nulls)."""
    cols = []
    for field in target:
        if field.name in t.column_names:
            col = t.column(field.name)
            if col.type != field.type:
                col = col.cast(field.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(t.num_rows, field.type))
    return pa.table(cols, names=[f.name for f in target])


def union_by_name(datasets: List[ray.data.Dataset]) -> ray.data.Dataset:
    """UNION ALL BY NAME over heterogeneous-schema datasets.

    Driver work is schema-only; every batch is aligned in its own map task
    and the streams are unioned without materialization or shuffle.
    """
    assert datasets, "union_by_name needs at least one dataset"
    target = unify_schemas_by_name(
        [d.schema().base_schema for d in datasets])
    aligned = [
        d.map_batches(lambda t, tgt=target: align_to_schema(t, tgt),
                      batch_format="pyarrow")
        for d in datasets
    ]
    out = aligned[0]
    for d in aligned[1:]:
        out = out.union(d)
    return out
