"""Join/lookup operators (SURVEY.md §2.5).

The reference's joins are point lookups stitched on FKs
(storage.py:308-344,610-628).  At scale:

  * broadcast hash join for a small side — the dimension table is collected
    once, ``ray.put`` once, and read inside every map task (never re-shipped
    per batch); no shuffle at all;
  * broadcast anti-join (J3's semi-join delete) the same way;
  * for two big sides use ``Dataset.join`` (hash shuffle join) — wrapped here
    for a consistent API.
"""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data


class _BroadcastLookup:
    """map_batches actor: resolves the broadcast lookup dict once per actor."""

    def __init__(self, lookup_ref, key: str, add_cols: List[str], how: str,
                 col_types: Dict[str, pa.DataType]):
        self.lookup: Dict = ray.get(lookup_ref)
        self.key, self.add_cols, self.how = key, add_cols, how
        self.col_types = col_types

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key).to_pylist()
        hits = [self.lookup.get(k) for k in keys]
        if self.how == "inner":
            mask = pa.array([h is not None for h in hits])
            batch = batch.filter(mask)
            hits = [h for h in hits if h is not None]
        for col in self.add_cols:
            vals = [None if h is None else h[col] for h in hits]
            # explicit type from the small side's schema: an all-miss batch
            # would otherwise infer null type and break block unification
            batch = batch.append_column(col, pa.array(vals, type=self.col_types[col]))
        return batch


def broadcast_join(
    big: ray.data.Dataset,
    small: ray.data.Dataset,
    on: str,
    right_on: Optional[str] = None,
    add_cols: Optional[List[str]] = None,
    how: str = "inner",
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Join a big Dataset against a small one without shuffling the big side.

    ``small`` is materialized on the driver (must be dimension-table sized),
    broadcast once via ``ray.put``, and probed per batch.
    ``how``: 'inner' drops unmatched big rows; 'left' keeps them with nulls.
    """
    right_on = right_on or on
    schema = small.schema().base_schema
    rows = small.take_all()
    if add_cols is None:
        add_cols = [f.name for f in schema if f.name != right_on]
    col_types = {c: schema.field(c).type for c in add_cols}
    lookup = {r[right_on]: {c: r[c] for c in add_cols} for r in rows}
    ref = ray.put(lookup)
    return big.map_batches(
        _BroadcastLookup,
        fn_constructor_kwargs=dict(lookup_ref=ref, key=on, add_cols=add_cols,
                                   how=how, col_types=col_types),
        batch_format="pyarrow", concurrency=concurrency,
    )


class _BroadcastAnti:
    def __init__(self, keys_ref, key: str, keep_matching: bool):
        self.keys = ray.get(keys_ref)
        self.key, self.keep_matching = key, keep_matching

    def __call__(self, batch: pa.Table) -> pa.Table:
        vals = batch.column(self.key).to_pylist()
        if self.keep_matching:
            mask = [v in self.keys for v in vals]
        else:
            mask = [v not in self.keys for v in vals]
        return batch.filter(pa.array(mask))


def broadcast_anti_join(
    ds: ray.data.Dataset, key: str, exclude_keys, concurrency=(1, 8)
) -> ray.data.Dataset:
    """Drop rows whose ``key`` is in ``exclude_keys`` (J3 semi-join delete,
    storage.py:610-628) — key set broadcast once."""
    ref = ray.put(frozenset(exclude_keys))
    return ds.map_batches(
        _BroadcastAnti,
        fn_constructor_kwargs=dict(keys_ref=ref, key=key, keep_matching=False),
        batch_format="pyarrow", concurrency=concurrency,
    )


def broadcast_semi_join(
    ds: ray.data.Dataset, key: str, include_keys, concurrency=(1, 8)
) -> ray.data.Dataset:
    """Keep only rows whose ``key`` is in ``include_keys``."""
    ref = ray.put(frozenset(include_keys))
    return ds.map_batches(
        _BroadcastAnti,
        fn_constructor_kwargs=dict(keys_ref=ref, key=key, keep_matching=True),
        batch_format="pyarrow", concurrency=concurrency,
    )


def shuffle_join(
    left: ray.data.Dataset, right: ray.data.Dataset,
    on: str, right_on: Optional[str] = None,
    join_type: str = "inner", num_partitions: int = 32,
) -> ray.data.Dataset:
    """Big-big hash shuffle join (Dataset.join wrapper)."""
    return left.join(
        right, join_type=join_type, num_partitions=num_partitions,
        on=(on,), right_on=((right_on or on),),
    )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    value_col: str,
    out_col: Optional[str] = None,
    how: str = "left",
) -> ray.data.Dataset:
    """Big-big backward as-of join: for each left row, the right row with the
    greatest ``on`` ≤ the left row's ``on``, matching per ``by`` key —
    SQL ``ASOF JOIN ... ON l.by = r.by AND l.on >= r.on``.

    One keyed shuffle: both sides are tagged and unioned, then a single
    ``groupby(by).map_groups`` sorts each key's rows once and answers every
    left row with one vectorized ``np.searchsorted`` — no per-row Python, no
    second shuffle.  Ties (right ``on`` equal to left ``on``) match, mirroring
    the SQL ``>=`` bound; duplicate right timestamps are safe because only
    ``value_col`` (typically the matched ``on`` itself) is emitted.

    Partitioning assumption: one ``by`` key's rows (both sides) fit one
    worker — the same contract as ``session_windows``; salt hot keys with a
    coarse ``on`` epoch and carry each epoch's last right row forward if a
    key exceeds it.
    """
    out_col = out_col or f"right_{value_col}"
    l_schema = left.schema()
    left_cols = l_schema.names
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_keep = [by, on, value_col]

    r_schema = right.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))
    # unified shuffle schema: every left column + any right-only join column
    r_extra = [c for c in r_keep if c not in left_cols]
    all_cols = left_cols + r_extra

    def tag_left(batch: pa.Table) -> pa.Table:
        cols = {name: (batch.column(name) if name in left_cols
                       else pa.nulls(batch.num_rows, r_types[name]))
                for name in all_cols}
        return pa.table(cols).append_column(
            "_side", pa.array([0] * batch.num_rows, pa.int8()))

    def tag_right(batch: pa.Table) -> pa.Table:
        # align to one block schema (typed nulls for other-side-only columns)
        # so the union carries a single schema through the shuffle
        cols = {name: (batch.column(name) if name in r_keep
                       else pa.nulls(batch.num_rows, l_types[name]))
                for name in all_cols}
        return pa.table(cols).append_column(
            "_side", pa.array([1] * batch.num_rows, pa.int8()))

    both = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.map_batches(tag_right, batch_format="pyarrow")
    )

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        ons = group.column(on).to_numpy(zero_copy_only=False)
        l_tbl = group.filter(pa.array(side == 0)).drop_columns(["_side"])
        r_mask = side == 1
        l_on = ons[side == 0]
        r_on = ons[r_mask]
        if len(r_on) == 0:
            matched = pa.nulls(l_tbl.num_rows, group.column(value_col).type)
        else:
            order = np.argsort(r_on, kind="stable")
            r_on_sorted = r_on[order]
            # index of greatest right on <= left on; -1 = no match
            pos = np.searchsorted(r_on_sorted, l_on, side="right") - 1
            r_vals = group.filter(pa.array(r_mask)).column(value_col).take(
                pa.array(order[np.maximum(pos, 0)])
            )
            matched = pc.if_else(pa.array(pos >= 0), r_vals,
                                 pa.scalar(None, group.column(value_col).type))
        out = l_tbl.select(left_cols).append_column(out_col, matched)
        if how == "inner":
            out = out.filter(pc.is_valid(out.column(out_col)))
        return out

    return both.groupby(by).map_groups(merge, batch_format="pyarrow")
