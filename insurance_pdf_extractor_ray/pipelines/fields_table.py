"""Long-format field table: the reference's ``extraction_fields`` explosion.

Behavioral spec: /root/reference/app/services/storage.py:79-92,278-298 (J2 in
SURVEY.md §2.5): each extraction row explodes into one row per field
``(doc_id, field_name, field_value, confidence, is_failed)``; the reverse
direction is ``groupby(doc_id)``.

Vectorized: the struct column is flattened with Arrow take/repeat kernels —
no per-row Python in the explosion itself.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from ..config import FIELD_ORDER

EMPTY = "EMPTY VALUE"


def explode_fields(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Extraction output -> long table (doc_id, field_name, field_value,
    confidence, is_failed)."""

    n_fields = len(FIELD_ORDER)

    def explode(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        if n == 0:
            return pa.table(
                {"doc_id": pa.array([], pa.string()),
                 "field_name": pa.array([], pa.string()),
                 "field_value": pa.array([], pa.string()),
                 "confidence": pa.array([], pa.float64()),
                 "is_failed": pa.array([], pa.bool_())}
            )
        doc_ids = batch.column("doc_id")
        fields = batch.column("fields")
        if isinstance(fields, pa.ChunkedArray):
            fields = fields.combine_chunks()
        # repeat doc_id n_fields times: indices [0,0,..,1,1,..]
        idx = np.repeat(np.arange(n), n_fields)
        out_doc = doc_ids.take(pa.array(idx))
        out_name = pa.array(np.tile(np.array(FIELD_ORDER, dtype=object), n), pa.string())
        # interleave field values: column-major per row
        value_cols = [fields.field(i).to_numpy(zero_copy_only=False) for i in range(n_fields)]
        values = np.empty(n * n_fields, dtype=object)
        for j, col in enumerate(value_cols):
            values[j::n_fields] = col
        out_val = pa.array(values, pa.string())

        # confidence map -> dense per-field vector
        conf_lists = batch.column("confidence").to_pylist()
        failed_lists = batch.column("failed_fields").to_pylist()
        conf = np.zeros(n * n_fields, dtype=np.float64)
        failed = np.zeros(n * n_fields, dtype=bool)
        pos = {f: i for i, f in enumerate(FIELD_ORDER)}
        for r, (cl, fl) in enumerate(zip(conf_lists, failed_lists)):
            base = r * n_fields
            for item in cl or []:
                p = pos.get(item["key"])
                if p is not None:
                    conf[base + p] = item["value"]
            for fname in fl or []:
                p = pos.get(fname)
                if p is not None:
                    failed[base + p] = True
        return pa.table(
            {"doc_id": out_doc, "field_name": out_name, "field_value": out_val,
             "confidence": pa.array(conf), "is_failed": pa.array(failed)}
        )

    return ds.map_batches(explode, batch_format="pyarrow")


def field_success_flags(long_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Derive the A6 success flag: not failed and value not in (null, EMPTY).

    storage.py:557-560 — conditional-SUM predicate as a vectorized column.
    """
    import pyarrow.compute as pc

    def flag(batch: pa.Table) -> pa.Table:
        v = batch.column("field_value")
        ok = pc.and_(
            pc.invert(batch.column("is_failed")),
            pc.and_(v.is_valid(), pc.not_equal(v, EMPTY)),
        )
        return batch.append_column("success_flag", ok.cast(pa.int64()))

    return long_ds.map_batches(flag, batch_format="pyarrow")
