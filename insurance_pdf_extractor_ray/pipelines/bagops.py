"""Multiset (bag) set-operations and skew-hardened aggregation.

``except_all`` — SQL ``EXCEPT ALL`` (bag difference, multiplicity-aware):
the dataset-diff primitive for continuous-ingest pipelines ("which rows of
yesterday's corpus did today's crawl drop, counting duplicates").  The trick
is signed multiplicities: tag side A rows +1 and side B rows −1, pre-combine
the signed counts map-side inside each batch, ONE keyed shuffle sums them,
and each key re-emits max(Σ, 0) copies via a vectorized ``np.repeat``.  The
shuffle carries one row per distinct key per block — never the raw bags.

``salted_sum`` — two-phase aggregation with an explicit salt for hot keys.
Ray Data's groupby already pre-combines map-side, but a single pathological
key still lands its final combine on ONE reducer; salting splits that key
across ``salt`` reducers first (phase 1: group by (key, salt % S)), then a
second, tiny shuffle (phase 2: at most ``keys × S`` rows) folds the salted
partials.  Results are identical to a plain GROUP BY — the oracle IS the
unsalted SQL.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Sum


def except_all(
    ds_a: ray.data.Dataset,
    ds_b: ray.data.Dataset,
    cols: Sequence[str],
) -> ray.data.Dataset:
    """Bag difference A ∖ B over ``cols`` (SQL ``EXCEPT ALL``): each distinct
    row value appears max(count_A − count_B, 0) times."""
    cols = list(cols)

    def tagged(sign: int):
        def partial(batch: pa.Table) -> pa.Table:
            g = batch.select(cols).group_by(cols).aggregate([([], "count_all")])
            g = g.rename_columns(cols + ["_m"])
            m = pc.multiply(g.column("_m").cast(pa.int64()), pa.scalar(sign, pa.int64()))
            return g.set_column(len(cols), "_m", m)
        return partial

    signed = ds_a.select_columns(cols).map_batches(
        tagged(+1), batch_format="pyarrow").union(
        ds_b.select_columns(cols).map_batches(tagged(-1), batch_format="pyarrow"))
    summed = signed.groupby(cols).aggregate(Sum("_m", alias_name="_m"))

    def emit(batch: pa.Table) -> pa.Table:
        m = batch.column("_m").to_numpy(zero_copy_only=False)
        reps = np.maximum(m, 0).astype(np.int64)
        idx = np.repeat(np.arange(batch.num_rows), reps)
        return batch.select(cols).take(pa.array(idx, pa.int64()))

    return summed.map_batches(emit, batch_format="pyarrow")


def salted_sum(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    salt_col: str,
    salt: int = 16,
    alias: str = "total",
) -> ray.data.Dataset:
    """``SELECT key, SUM(value) GROUP BY key`` with an explicit hot-key salt:
    phase 1 groups by (key, ``salt_col`` % salt) so one hot key spreads over
    ``salt`` reducers; phase 2 folds the ≤ keys×salt salted partials."""

    def add_salt(batch: pa.Table) -> pa.Table:
        s = batch.column(salt_col).to_numpy(zero_copy_only=False)
        return (batch.select([key, value]).append_column(
            "_salt", pa.array((s % salt).astype(np.int64), pa.int64())))

    salted = ds.map_batches(add_salt, batch_format="pyarrow")
    p1 = salted.groupby([key, "_salt"]).aggregate(Sum(value, alias_name="_p"))
    return p1.groupby(key).aggregate(Sum("_p", alias_name=alias))


def intersect_all(
    ds_a: ray.data.Dataset,
    ds_b: ray.data.Dataset,
    cols: Sequence[str],
) -> ray.data.Dataset:
    """Bag intersection A ∩ B over ``cols`` (SQL ``INTERSECT ALL``): each
    distinct row value appears min(count_A, count_B) times.

    Same map-side pre-combine shape as :func:`except_all`, but min() is not
    expressible as one signed sum — each side's per-batch distinct counts
    go into its OWN column (``_a`` or ``_b``, zero-filled on the other
    side), ONE keyed shuffle sums both columns, and the emit step repeats
    each key min(Σa, Σb) times via a vectorized ``np.repeat``.  The shuffle
    again carries one row per distinct key per block, never the raw bags.
    (Reference analog: set-membership reconciliation between run manifests,
    reference ``scripts/analyze_results.py`` / SURVEY §2.8.)
    """
    cols = list(cols)

    def tagged(side: str):
        other = "_b" if side == "_a" else "_a"

        def partial(batch: pa.Table) -> pa.Table:
            g = batch.select(cols).group_by(cols).aggregate([([], "count_all")])
            g = g.rename_columns(cols + [side])
            g = g.set_column(g.schema.get_field_index(side), side,
                             g.column(side).cast(pa.int64()))
            zero = pa.array(np.zeros(g.num_rows, dtype=np.int64), pa.int64())
            return g.append_column(other, zero).select(cols + ["_a", "_b"])

        return partial

    counted = ds_a.select_columns(cols).map_batches(
        tagged("_a"), batch_format="pyarrow").union(
        ds_b.select_columns(cols).map_batches(tagged("_b"), batch_format="pyarrow"))
    summed = counted.groupby(cols).aggregate(
        Sum("_a", alias_name="_a"), Sum("_b", alias_name="_b"))

    def emit(batch: pa.Table) -> pa.Table:
        a = batch.column("_a").to_numpy(zero_copy_only=False)
        b = batch.column("_b").to_numpy(zero_copy_only=False)
        reps = np.minimum(a, b).astype(np.int64)
        idx = np.repeat(np.arange(batch.num_rows), reps)
        return batch.select(cols).take(pa.array(idx, pa.int64()))

    return summed.map_batches(emit, batch_format="pyarrow")
