"""Small Dataset-level utilities shared by the pipelines.

``drop_empty_blocks`` works around a Ray Data 2.49 sharp edge: groupby /
map_groups hash shuffles emit empty ZERO-COLUMN placeholder blocks (the
streaming executor's "RefBundle with a different schema ... new schema: ."
warning).  Those blocks break downstream ``Dataset.join`` (pyarrow acero
raises "No match ... for key field reference" on the schemaless partition)
and can poison schema-sensitive consumers.  map_batches can't fix them —
Ray skips the UDF for empty blocks — so the only reliable cure is to rebuild
the dataset from its non-empty block refs.  Metadata-only: no block data
ever moves to the driver.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import ray.data


def drop_empty_blocks(
    ds: ray.data.Dataset, empty_schema: Optional[pa.Schema] = None
) -> ray.data.Dataset:
    """Materialize ``ds`` and rebuild it from only its non-empty blocks.

    If every block is empty, returns a one-empty-block dataset with
    ``empty_schema`` (required in that case to keep downstream ops typed).
    Intended for aggregate-small datasets that feed a ``Dataset.join`` —
    the materialize is a no-op there (the data already fits the store).
    """
    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        if empty_schema is None:
            raise ValueError("all blocks empty and no empty_schema given")
        return ray.data.from_arrow(empty_schema.empty_table())
    return ray.data.from_arrow_refs(refs)
