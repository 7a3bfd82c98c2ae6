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


@ray.remote
def _group_counts(tbl: pa.Table, group_cols: List[str]):
    """Per-group row counts within one sorted block — group-count-sized
    (the block is contiguous in group order after the sort, but a plain
    value_counts is simpler and still metadata-weight)."""
    import polars as pl

    if tbl.num_rows == 0:
        return []
    g = (pl.from_arrow(tbl.select(group_cols)).group_by(group_cols)
         .agg(pl.len().alias("_n")))
    keys = g.select(group_cols).rows()
    return list(zip(keys, g.get_column("_n").to_list()))


@ray.remote
def _append_group_rn(tbl: pa.Table, group_cols: List[str],
                     starts: dict, totals: dict, out_col: str,
                     total_col: Optional[str]) -> pa.Table:
    """Append the per-group 0-based row number (and optionally the group
    total) given this block's per-group start offsets.  The block is
    sorted by (group, sort_keys), so each group's rows are one contiguous
    run — offsets are a run-length walk, no per-row Python."""
    import polars as pl

    if tbl.num_rows == 0:
        out = tbl.append_column(out_col, pa.array([], pa.int64()))
        if total_col:
            out = out.append_column(total_col, pa.array([], pa.int64()))
        return out
    keys = pl.from_arrow(tbl.select(group_cols)).rows()
    # contiguous runs of identical keys
    rn = np.empty(tbl.num_rows, np.int64)
    tot = np.empty(tbl.num_rows, np.int64) if total_col else None
    i = 0
    while i < tbl.num_rows:
        j = i
        k = keys[i]
        while j < tbl.num_rows and keys[j] == k:
            j += 1
        base = starts[k]
        rn[i:j] = np.arange(base, base + (j - i))
        if total_col:
            tot[i:j] = totals[k]
        i = j
    out = tbl.append_column(out_col, pa.array(rn, pa.int64()))
    if total_col:
        out = out.append_column(total_col, pa.array(tot, pa.int64()))
    return out


def grouped_row_number(
    ds: ray.data.Dataset,
    group_cols: Sequence[str],
    sort_keys: Sequence[str],
    descending: Optional[Sequence[bool]] = None,
    out_col: str = "group_rn",
    total_col: Optional[str] = None,
) -> ray.data.Dataset:
    """``row_number() OVER (PARTITION BY group_cols ORDER BY sort_keys)``
    (0-based), optionally with the group's total count in ``total_col`` —
    the primitive behind exact stratified splits, per-group percentile
    gates and curriculum sharding within strata.

    Same shape as :func:`with_row_number`: ONE Ray-native sort over
    (group_cols, sort_keys), then two metadata-weight task waves — wave 1
    ships per-(block, group) counts to the driver (O(#blocks × #groups
    touched per block) tuples; group keys are strata — languages, sources,
    splits — bounded, not per-row), wave 2 appends each block's offset
    ranges in place.  Blocks never move after the sort.
    """
    gcols = list(group_cols)
    desc = ([False] * len(gcols)) + (list(descending) if descending
                                     else [False] * len(sort_keys))
    ordered = ds.sort(gcols + list(sort_keys), descending=desc).materialize()
    refs = ordered.to_arrow_refs()
    per_block = ray.get([_group_counts.remote(r, gcols) for r in refs])
    run: dict = {}
    starts_per_block = []
    for counts in per_block:
        starts_per_block.append({k: run.get(k, 0) for k, _ in counts})
        for k, n in counts:
            run[k] = run.get(k, 0) + n
    out_refs = [
        _append_group_rn.remote(r, gcols, st, run, out_col, total_col)
        for r, st in zip(refs, starts_per_block)
    ]
    return ray.data.from_arrow_refs(out_refs)
