"""Z-order (Morton) clustering — multi-column data layout locality.

Sorting by a single column clusters reads on that column only; range scans
filtered on a *second* column still touch every file.  The standard engine
answer (Delta/Iceberg ``OPTIMIZE ZORDER BY``) is a space-filling curve: each
row's filter columns are bit-interleaved into one integer whose ordering
preserves locality in ALL dimensions at once, and the table is sorted by it.
Files then carry tight min/max ranges on every z-ordered column, so the
reader's row-group pruning works for any of them.

This module computes the curve key vectorized (numpy bit-spread, no per-row
Python) and delegates the actual placement to ONE distributed sort — the
same all-to-all any clustering pass fundamentally requires.  The key is a
pure function of the row, so the op is deterministic and restart-safe.

Columns are used modulo ``2^bits`` (caller picks ``bits`` to cover the
column's domain or accepts bucket-wrap, exactly like coarse z-ordering on a
truncated key in production table formats).
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def morton_interleave(cols: Sequence[np.ndarray], bits: int) -> np.ndarray:
    """Bit-interleave k uint64 arrays, ``bits`` low bits each -> uint64.

    Output bit ``i*k + j`` is bit ``i`` of column ``j`` (column 0 owns the
    least-significant lane, the convention DuckDB-side oracles can replicate
    with shift/mask arithmetic).  k*bits must fit in 63 bits so the value
    survives an int64 round-trip.
    """
    k = len(cols)
    assert k >= 1 and k * bits <= 63
    out = np.zeros(len(cols[0]), dtype=np.uint64)
    mask = np.uint64(1)
    for j, c in enumerate(cols):
        c = c.astype(np.uint64) & np.uint64((1 << bits) - 1)
        for i in range(bits):
            out |= ((c >> np.uint64(i)) & mask) << np.uint64(i * k + j)
    return out


def zorder_key_batch(batch: pa.Table, cols: Sequence[str], bits: int,
                     out_col: str = "__z") -> pa.Table:
    """Append the Morton key column to one Arrow batch (vectorized)."""
    arrays = []
    for c in cols:
        col = batch.column(c)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        arrays.append(pc.fill_null(col, 0).cast(pa.int64())
                        .to_numpy(zero_copy_only=False)
                        .astype(np.int64).view(np.uint64))
    z = morton_interleave(arrays, bits).view(np.int64)
    return batch.append_column(out_col, pa.array(z, pa.int64()))


def cluster_by_zorder(
    ds: ray.data.Dataset,
    cols: Sequence[str],
    bits: int = 16,
    keep_key: bool = False,
    tiebreak: Optional[str] = None,
) -> ray.data.Dataset:
    """Re-cluster a dataset along a Morton curve over ``cols``.

    Map-side key computation (zero extra shuffle) + ONE distributed sort by
    the key — afterwards each output block covers a compact hyper-rectangle
    of the col space, so Parquet row-group min/max stats prune scans
    filtered on ANY of ``cols``.  ``keep_key=True`` retains the ``__z``
    column (useful for bucketed writes keyed on ``__z >> s``).
    """
    cols = list(cols)
    keyed = ds.map_batches(
        lambda b: zorder_key_batch(b, cols, bits), batch_format="pyarrow")
    sort_cols = ["__z"] + ([tiebreak] if tiebreak else [])
    out = keyed.sort(sort_cols)
    if keep_key:
        return out
    names = [n for n in ds.schema().names]
    return out.map_batches(lambda t: t.select(names), batch_format="pyarrow")


def zorder_sql_expr(cols: Sequence[str], bits: int) -> str:
    """ANSI-SQL expression computing the identical Morton key (bit-for-bit)
    — lets a DuckDB oracle replicate the engine's curve with shift/mask
    arithmetic only."""
    k = len(cols)
    terms = []
    for j, c in enumerate(cols):
        for i in range(bits):
            terms.append(
                f"((({c} >> {i}) & 1) << {i * k + j})")
    return " | ".join(terms)
