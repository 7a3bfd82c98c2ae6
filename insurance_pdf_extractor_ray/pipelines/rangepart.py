"""Balanced range-partitioned at-rest layout — the Terasort partition step.

``bucketed.py`` co-locates by key HASH (point lookups, equi-joins);
this module lays data out by VALUE RANGE so range scans prune whole
partitions and downstream per-partition work is load-balanced: partition
boundaries are the exact (i/n)-quantile_disc order statistics, computed
sort-free by histogram rank-refinement (``sketches.order_statistics`` —
zero shuffles, driver state O(bins)), so partitions are row-balanced by
construction up to ties.  Heavy ties can produce duplicate boundaries and
therefore empty partitions — the documented trade of exact-value
boundaries.

Row routing: part = searchsorted(boundaries, v, side='left'), i.e. the
count of boundaries strictly below v — part 0 holds v <= b0, part i holds
b_{i-1} < v <= b_i, the last part holds v > b_{n-2}.  SQL-checkable as
``(SELECT count(*) FROM boundaries WHERE bv < v)``.

One tagging pass writes Hive-style ``_part=i/`` Parquet dirs (resumable
per partition, same contract as ``bucketed.write_bucketed``) plus a
manifest with the boundaries, so readers prune without touching data.
"""

from __future__ import annotations

import glob
import json
import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from .sketches import quantiles_global


def write_range_partitioned(
    ds: ray.data.Dataset,
    path: str,
    col: str,
    n_parts: int,
    bins: int = 2048,
) -> List[float]:
    """Write ``ds`` range-partitioned on ``col`` into ``path/_part=i/`` and
    return the n_parts-1 boundary values (also persisted in the manifest)."""
    qs = [i / n_parts for i in range(1, n_parts)]
    boundaries = quantiles_global(ds, col, qs, kind="disc", bins=bins)
    b = np.asarray(boundaries, np.float64)

    def tag(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        part = np.searchsorted(b, v, side="left")
        return batch.append_column("_part", pa.array(part, pa.int64()))

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        path, partition_cols=["_part"])
    with open(os.path.join(path, "_layout.json"), "w") as f:
        json.dump({"col": col, "n_parts": n_parts,
                   "boundaries": [float(x) for x in boundaries]}, f)
    return list(boundaries)


def layout_of(path: str) -> dict:
    with open(os.path.join(path, "_layout.json")) as f:
        return json.load(f)


def _part_files(path: str, part: int) -> List[str]:
    return sorted(glob.glob(os.path.join(path, f"_part={part}", "*.parquet")))


def parts_for_range(path: str, lo: Optional[float], hi: Optional[float]) -> List[int]:
    """Partition ids whose value range can intersect [lo, hi] — manifest
    arithmetic only, no data touched."""
    lay = layout_of(path)
    b = lay["boundaries"]
    n = lay["n_parts"]
    first = 0 if lo is None else int(np.searchsorted(b, lo, side="left"))
    last = n - 1 if hi is None else int(np.searchsorted(b, hi, side="left"))
    return list(range(first, min(last, n - 1) + 1))


def read_range(
    path: str,
    lo: Optional[float] = None,
    hi: Optional[float] = None,
    columns: Optional[List[str]] = None,
) -> ray.data.Dataset:
    """Pruned range scan: reads ONLY the partitions that can hold values in
    [lo, hi] (then applies the exact residual filter) — scan cost scales
    with the selected range, not the table."""
    import pyarrow.compute as pc

    lay = layout_of(path)
    col = lay["col"]
    files: List[str] = []
    for p in parts_for_range(path, lo, hi):
        files.extend(_part_files(path, p))
    if not files:
        return ray.data.from_arrow(pa.table({}))
    ds = ray.data.read_parquet(files, columns=columns)

    def residual(batch: pa.Table) -> pa.Table:
        m = np.ones(batch.num_rows, dtype=bool)
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        if lo is not None:
            m &= v >= lo
        if hi is not None:
            m &= v <= hi
        return batch.filter(pa.array(m))

    return ds.map_batches(residual, batch_format="pyarrow")


def partition_stats(path: str) -> ray.data.Dataset:
    """Per-partition (part, n, mn, mx) over the layout column — one task per
    partition reading only that partition's files (the pruned-read shape)."""
    lay = layout_of(path)
    col, n = lay["col"], lay["n_parts"]

    def stats(batch: pa.Table) -> pa.Table:
        out = {"part": [], "n": [], "mn": [], "mx": []}
        for p in batch.column("part").to_pylist():
            files = _part_files(path, p)
            if not files:
                continue
            t = pa.concat_tables([pq.read_table(f, columns=[col])
                                  for f in files])
            v = t.column(col).to_numpy(zero_copy_only=False)
            out["part"].append(p)
            out["n"].append(len(v))
            out["mn"].append(float(v.min()))
            out["mx"].append(float(v.max()))
        return pa.table({"part": pa.array(out["part"], pa.int64()),
                         "n": pa.array(out["n"], pa.int64()),
                         "mn": pa.array(out["mn"], pa.float64()),
                         "mx": pa.array(out["mx"], pa.float64())})

    return ray.data.from_items(
        [{"part": i} for i in range(n)]).map_batches(
        stats, batch_format="pyarrow")
