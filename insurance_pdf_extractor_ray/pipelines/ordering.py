"""Global positional operators — row_number, rank partitions (NTILE).

Ray Data's Dataset API has no notion of a row's GLOBAL position after a
sort: ``sort`` orders blocks, but no per-batch callback knows how many rows
precede its block.  These operators add that with the minimal raw-Ray
drop-down the guide allows for "what the Dataset API genuinely can't
express":

  sort (Ray-native, all-to-all)                          — shuffle 1 of 1
  → per-block row counts: one tiny remote task per block  (reads only
    ``num_rows`` off the zero-copy Arrow block; returns an int)
  → driver prefix-sum over the per-block counts           (O(#blocks) ints —
    scale-safe: 100 TB at 128 MB blocks is ~10^6 ints)
  → one remote task per block appends its offset range    (zero-copy append
    of an arange column; blocks never move)
  → ``from_arrow_refs`` re-wraps the same objects as a Dataset

No row ever touches the driver and nothing is re-shuffled — the cost over a
plain sort is two metadata-sized task waves.

``ntile`` assigns SQL's NTILE(k) bucket from the row number and the (known)
total — the curriculum-sharding primitive: order by a quality score, split
into k equal tiers, write tier-partitioned.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import ray
import ray.data


@ray.remote
def _nrows(tbl: pa.Table) -> int:
    return tbl.num_rows


@ray.remote
def _append_range(tbl: pa.Table, start: int, out_col: str,
                  one_based: bool) -> pa.Table:
    base = start + (1 if one_based else 0)
    return tbl.append_column(
        out_col, pa.array(np.arange(base, base + tbl.num_rows), pa.int64()))


def with_row_number(
    ds: ray.data.Dataset,
    sort_keys: Sequence[str],
    descending: Optional[Sequence[bool]] = None,
    out_col: str = "row_number",
    one_based: bool = True,
) -> ray.data.Dataset:
    """``row_number() OVER (ORDER BY sort_keys)`` — pass a tiebreak column to
    make the order total (same contract as ``analytics.top_k``).

    One Ray-native sort, then two metadata-weight task waves (counts, then
    zero-copy range append); blocks stay where the sort put them.
    """
    sort_keys = list(sort_keys)
    desc = list(descending) if descending is not None else [False] * len(sort_keys)
    ordered = ds.sort(sort_keys, descending=desc).materialize()
    refs = ordered.to_arrow_refs()
    counts = ray.get([_nrows.remote(r) for r in refs])
    offsets = np.concatenate(([0], np.cumsum(counts)[:-1]))
    out_refs = [
        _append_range.remote(r, int(off), out_col, one_based)
        for r, off in zip(refs, offsets)
    ]
    return ray.data.from_arrow_refs(out_refs)


def ntile_bucket(rn0: np.ndarray, total: int, k: int) -> np.ndarray:
    """SQL NTILE(k) bucket (1-based) from 0-based row numbers: the first
    ``total % k`` buckets get ``ceil(total/k)`` rows, the rest get floor."""
    base, rem = divmod(total, k)
    big = rem * (base + 1)  # rows covered by the oversized buckets
    return np.where(
        rn0 < big,
        rn0 // (base + 1) + 1,
        rem + (rn0 - big) // max(base, 1) + 1,
    ).astype(np.int64)


def ntile(
    ds: ray.data.Dataset,
    sort_keys: Sequence[str],
    k: int,
    descending: Optional[Sequence[bool]] = None,
    out_col: str = "tile",
) -> ray.data.Dataset:
    """``NTILE(k) OVER (ORDER BY sort_keys)`` — equal-size tier assignment
    (quality-curriculum sharding).  Built on ``with_row_number``; the total
    row count comes from the already-materialized sorted Dataset's metadata
    (no extra pass)."""
    numbered = with_row_number(ds, sort_keys, descending=descending,
                               out_col="_rn0", one_based=False)
    total = numbered.count()

    def assign(batch: pa.Table) -> pa.Table:
        rn0 = batch.column("_rn0").to_numpy(zero_copy_only=False)
        out = batch.append_column(
            out_col, pa.array(ntile_bucket(rn0, total, k), pa.int64()))
        return out.drop_columns(["_rn0"])

    return numbered.map_batches(assign, batch_format="pyarrow")
