"""Ranking / distinct / quantile aggregations — the window-function family.

The reference's analytics stop at plain GROUP BY (SURVEY.md §2.6); a
training-data engine also needs the per-group ranking and distribution
operators SQL expresses with window functions.  Each is built scale-first:

* ``grouped_top_k`` — ``row_number() OVER (PARTITION BY key ORDER BY ...)``
  ``<= k``.  Map-side partial top-k per key inside each batch (so the shuffle
  carries at most ``k`` rows per key per block), then one keyed shuffle whose
  groups are bounded by ``k × blocks`` — never by the raw key cardinality.
* ``distinct_count_by`` — ``COUNT(DISTINCT col) GROUP BY key``.  Map-side
  pair dedup, one shuffle on the *(key, col)* composite (so a hot key's rows
  spread over its distinct values — no single-reducer hot spot), then a
  second, much smaller shuffle over the already-distinct pairs.
* ``quantiles_by`` — exact ``percentile_cont`` per key via a distinct-value
  histogram: one shuffle on *(key, value)* with counts, then per-key
  interpolation over the (tiny) sorted histogram.  Partitioning assumption:
  the *distinct value set* per key is bounded (true for quantized measures —
  prices in cents, durations in ms).  For unbounded continuous values use a
  fixed-width binning first (documented, approximate) — exactness is only
  claimed for quantized domains.

All interiors are Arrow/numpy-vectorized; nothing materializes the input.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum


def _per_key_head(tbl: pa.Table, key: str, order_by: List[str],
                  descending: List[bool], k: int) -> pa.Table:
    """Rows ranked ``< k`` within each key after ordering — vectorized.

    Sorts by (key, *order_by*) then keeps positions whose index-within-run
    is < k; run arithmetic is pure numpy (no per-key loop).
    """
    if tbl.num_rows == 0:
        return tbl
    sort_keys = [(key, "ascending")] + [
        (c, "descending" if d else "ascending") for c, d in zip(order_by, descending)
    ]
    idx = pc.sort_indices(tbl, sort_keys=sort_keys)
    tbl = tbl.take(idx)
    from ..dsutil import run_starts

    # index within each equal-key run (null-safe: one null-key run)
    change = run_starts(tbl.column(key))
    run_id = np.cumsum(change) - 1
    run_start = np.flatnonzero(change)
    within = np.arange(len(change)) - run_start[run_id]
    return tbl.filter(pa.array(within < k))


def grouped_top_k(
    ds: ray.data.Dataset,
    key: str,
    order_by: Sequence[str],
    descending: Sequence[bool],
    k: int,
    columns: Optional[List[str]] = None,
) -> ray.data.Dataset:
    """Top-``k`` rows per ``key`` under a total order (pass a tiebreak column
    in ``order_by`` to make it total — same contract as ``analytics.top_k``).

    Equivalent SQL: ``row_number() OVER (PARTITION BY key ORDER BY ...) <= k``.
    """
    order_by = list(order_by)
    descending = list(descending)
    if columns:
        ds = ds.select_columns(sorted(set(columns) | {key, *order_by}))

    def partial(batch: pa.Table) -> pa.Table:
        return _per_key_head(batch, key, order_by, descending, k)

    # _per_key_head is multi-key vectorized, so the reduce side runs one
    # call per hash PARTITION (dsutil.keyed_partition_map) instead of one
    # Python dispatch per key — same exchange, O(P) not O(keys) overhead.
    from ..dsutil import keyed_partition_map

    out = keyed_partition_map(
        ds.map_batches(partial, batch_format="pyarrow"),
        key,
        lambda part: _per_key_head(part, key, order_by, descending, k),
    )
    if columns:
        out = out.select_columns(columns)
    return out


def distinct_count_by(
    ds: ray.data.Dataset,
    key: str,
    distinct_col: str,
    alias: str = "n_distinct",
) -> ray.data.Dataset:
    """``SELECT key, COUNT(DISTINCT distinct_col) GROUP BY key``.

    Stage 1 dedups (key, distinct_col) pairs map-side (cheap shuffle-volume
    cut on repetitive data), stage 2 is a composite-key shuffle producing
    globally-distinct pairs, stage 3 counts pairs per key — input to stage 3
    is one row per distinct pair, so the second shuffle is small by
    construction.  Nulls in ``distinct_col`` are ignored (SQL semantics).
    """

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        batch = batch.select([key, distinct_col]).filter(
            pc.is_valid(batch.column(distinct_col))
        )
        return batch.group_by([key, distinct_col]).aggregate([])

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow")
    # global pair dedup: one row per (key, distinct_col)
    uniq = pairs.groupby([key, distinct_col]).aggregate(Count(alias_name="_c"))
    return uniq.groupby(key).aggregate(Count(alias_name=alias))


def _percentile_cont(values: np.ndarray, counts: np.ndarray, q: float) -> float:
    """Exact ``percentile_cont(q)`` over a sorted distinct-value histogram —
    the linear interpolation SQL defines: h=(n-1)q, interpolate between the
    h-floor-th and h-ceil-th order statistics."""
    n = int(counts.sum())
    if n == 0:
        return float("nan")
    h = (n - 1) * q
    lo = int(np.floor(h))
    hi = int(np.ceil(h))
    cum = np.cumsum(counts)
    v_lo = values[np.searchsorted(cum, lo + 1)]
    v_hi = values[np.searchsorted(cum, hi + 1)]
    return float(v_lo) + (h - lo) * (float(v_hi) - float(v_lo))


def quantiles_by(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    qs: Sequence[float] = (0.5, 0.9),
    names: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Exact per-key ``percentile_cont`` over a quantized value domain.

    One shuffle on the *(key, value)* composite builds per-key distinct-value
    histograms (map-side ``Count`` pre-combine keeps the exchange at one row
    per distinct pair per block); the per-key interpolation then runs over
    histograms whose size is the key's *distinct-value* count — bounded for
    quantized measures regardless of row count.  Nulls ignored.
    """
    qs = list(qs)
    names = list(names) if names else [f"p{int(q * 100)}" for q in qs]

    def drop_null(batch: pa.Table) -> pa.Table:
        return batch.filter(pc.is_valid(batch.column(value_col)))

    hist = (
        ds.select_columns([key, value_col])
        .map_batches(drop_null, batch_format="pyarrow")
        .groupby([key, value_col])
        .aggregate(Count(alias_name="_c"))
    )

    def interp_partition(part: pa.Table) -> pa.Table:
        """All keys of the partition: one (key, value) sort, then numpy-slice
        interpolation per key segment (histograms are distinct-value-bounded,
        so the per-segment loop is tiny)."""
        ktype = part.column(key).type
        if part.num_rows == 0:
            return pa.table({key: pa.array([], ktype),
                             "n": pa.array([], pa.int64()),
                             **{nm: pa.array([], pa.float64())
                                for nm in names}})
        part = part.take(pc.sort_indices(part, sort_keys=[
            (key, "ascending"), (value_col, "ascending")]))
        from ..dsutil import run_starts

        values = part.column(value_col).to_numpy(zero_copy_only=False) \
                     .astype(np.float64)
        counts = part.column("_c").to_numpy(zero_copy_only=False)
        m = part.num_rows
        starts = np.flatnonzero(run_starts(part.column(key)))
        bounds = np.append(starts, m)
        totals = np.add.reduceat(counts, starts)
        out_q = {nm: np.empty(len(starts), np.float64) for nm in names}
        for i in range(len(starts)):
            lo_i, hi_i = bounds[i], bounds[i + 1]
            v, c = values[lo_i:hi_i], counts[lo_i:hi_i]
            for q, nm in zip(qs, names):
                out_q[nm][i] = _percentile_cont(v, c, q)
        return pa.table({
            key: part.column(key).take(pa.array(starts, pa.int64())),
            "n": pa.array(totals.astype(np.int64), pa.int64()),
            **{nm: pa.array(out_q[nm], pa.float64()) for nm in names}})

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(hist, key, interp_partition)


def quantiles_by_binned(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int = 16_384,
    qs: Sequence[float] = (0.5, 0.9),
    names: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Approximate per-key quantiles for UNBOUNDED continuous domains: values
    are quantized to ``n_bins`` fixed-width bins over [lo, hi] map-side, then
    the exact-histogram machinery runs on the (bounded) bin table.  Error is
    ≤ one bin width (hi-lo)/n_bins on each reported quantile; values outside
    [lo, hi] clamp to the edge bins.  Use ``quantiles_by`` when the domain is
    already quantized — this variant exists so the per-key state stays
    bounded even for arbitrary float measures.
    """
    width = (hi - lo) / n_bins

    def to_bins(batch: pa.Table) -> pa.Table:
        batch = batch.select([key, value_col]).filter(
            pc.is_valid(batch.column(value_col)))
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(np.float64)
        b = np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)
        # bin center as the representative value
        center = lo + (b + 0.5) * width
        return pa.table({key: batch.column(key),
                         value_col: pa.array(center, pa.float64())})

    return quantiles_by(
        ds.map_batches(to_bins, batch_format="pyarrow"),
        key, value_col, qs=qs, names=names,
    )


def dense_rank_by(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    descending: bool = True,
    max_rank: Optional[int] = None,
    alias: str = "drank",
) -> ray.data.Dataset:
    """``DENSE_RANK() OVER (PARTITION BY key ORDER BY value)`` over the
    DISTINCT (key, value) pairs — one row per distinct pair with its dense
    rank, optionally truncated to ``max_rank``.

    Dense rank depends only on the distinct value set per key, so the
    operator never ranks raw rows: map-side pair dedup (same trick as
    :func:`distinct_count_by`) collapses repeats before the ONE composite
    (key, value) shuffle, and the per-key ranking then runs over the
    distinct-value histogram — bounded by value cardinality, not row count.
    Callers needing ranks on the raw rows can broadcast-join this (small)
    result back (``pipelines/joins.py:broadcast_join``).
    """

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        batch = batch.select([key, value_col]).filter(
            pc.is_valid(batch.column(value_col)))
        return batch.group_by([key, value_col]).aggregate([])

    pairs = ds.map_batches(distinct_pairs, batch_format="pyarrow")
    uniq = pairs.groupby([key, value_col]).aggregate(Count(alias_name="_c"))

    def rank_partition(part: pa.Table) -> pa.Table:
        order = "descending" if descending else "ascending"
        idx = pc.sort_indices(part, sort_keys=[
            (key, "ascending"), (value_col, order)])
        g = part.take(idx).select([key, value_col])
        n = g.num_rows
        if n == 0:
            return g.append_column(alias, pa.array([], pa.int64()))
        from ..dsutil import run_starts

        new_key = run_starts(g.column(key))  # null-safe key change
        starts = np.flatnonzero(new_key)
        seg = np.cumsum(new_key) - 1
        # distinct pairs => every row is a new rank within the key
        ranks = np.arange(n, dtype=np.int64) - starts[seg] + 1
        g = g.append_column(alias, pa.array(ranks, pa.int64()))
        if max_rank is not None:
            g = g.filter(pa.array(ranks <= max_rank))
        return g

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(uniq, key, rank_partition)


def latest_by_key(
    ds: ray.data.Dataset,
    key: str,
    order_by: Sequence[str],
    descending: Sequence[bool],
    columns: Optional[List[str]] = None,
) -> ray.data.Dataset:
    """Log compaction: the single latest row per ``key`` under a total order
    — the "upsert log → current state" primitive (reference analog:
    re-processing a document appends a new extraction row to the store,
    reference ``app/services/storage.py:167``, and readers want the latest
    row per document; SURVEY §2.5).

    Delegates to :func:`grouped_top_k` with ``k=1``: each block keeps at
    most ONE candidate row per key before the shuffle, so the exchange
    volume is #keys × #blocks rows regardless of how many updates a key
    has — the compaction itself never materializes a key's history.
    Pass a unique tiebreak column in ``order_by`` to make the order total.
    """
    return grouped_top_k(ds, key, order_by, descending, k=1, columns=columns)
