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

import pyarrow as pa
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
