"""Change-data-capture apply: fold an upsert/delete change log into a base
table — the lakehouse MERGE INTO / SCD-type-1 primitive.

Reference analog: re-processing a document overwrites its stored extraction
row (reference ``app/services/storage.py:167-204`` upsert-on-conflict); this
module generalizes that to a *batch* of changes applied to a corpus-scale
base in one pass.

Scale shape: the change log is first compacted to its latest row per key
(``rankagg.latest_by_key`` — <=1 candidate per key per block crosses that
shuffle), then ONE keyed full-outer join against the base resolves every key:
deleted keys drop, changed keys take the change payload, untouched base rows
pass through, and never-seen keys insert.  Nothing is driver-resident; both
shuffles are keyed on the same column so a bucketed-by-key base layout
(``bucketed.py``) can elide the join exchange entirely.
"""

from __future__ import annotations

import os
from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _join_partitions
from .rankagg import latest_by_key


def apply_changes(
    base: ray.data.Dataset,
    changes: ray.data.Dataset,
    key_col: str,
    change_key_col: str,
    order_by: Sequence[str],
    op_col: str,
    payload_map: Dict[str, str],
    delete_op: str = "delete",
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Apply ``changes`` to ``base`` and return the new state of the table.

    For each key, the latest change row (under ``order_by``, descending,
    ties broken by later entries — pass a unique column last to make the
    order total) decides the outcome: ``op == delete_op`` removes the key;
    any other op upserts, writing each change column in ``payload_map``
    (change col -> base col) and nulling unmapped base columns for brand-new
    keys.  Keys without changes keep their base row.
    """
    P = num_partitions or _join_partitions()
    chg_cols = [change_key_col, op_col] + list(payload_map)
    latest = latest_by_key(changes, change_key_col,
                           order_by=list(order_by),
                           descending=[True] * len(order_by),
                           columns=chg_cols)

    rename = {change_key_col: "__k", op_col: "__op",
              **{c: f"__p_{c}" for c in payload_map}}

    def ren(t: pa.Table) -> pa.Table:
        t = t.select(chg_cols)
        return t.rename_columns([rename[c] for c in t.column_names])

    latest = latest.map_batches(ren, batch_format="pyarrow")
    # latest_by_key's groupby can emit empty zero-column blocks at small
    # scales; the acero hash join below rejects a block without "__k"
    chg_schema = changes.schema()
    chg_types = dict(zip(chg_schema.names, chg_schema.types))
    from ..dsutil import drop_empty_blocks

    latest = drop_empty_blocks(latest, empty_schema=pa.schema(
        [("__k", chg_types[change_key_col]), ("__op", chg_types[op_col])]
        + [(f"__p_{c}", chg_types[c]) for c in payload_map]))

    base_schema = base.schema()
    base_names = base_schema.names
    base_types = dict(zip(base_schema.names, base_schema.types))
    inv_payload = {b: c for c, b in payload_map.items()}

    joined = base.join(latest, join_type="full_outer", num_partitions=P,
                       on=(key_col,), right_on=("__k",))

    def resolve(t: pa.Table) -> pa.Table:
        return _resolve_changes(t, base_names, base_types, key_col,
                                inv_payload, delete_op)

    return joined.map_batches(resolve, batch_format="pyarrow")


def _resolve_changes(t: pa.Table, base_names: Sequence[str],
                     base_types: Dict[str, pa.DataType], key_col: str,
                     inv_payload: Dict[str, str], delete_op: str) -> pa.Table:
    """Vectorized delete/upsert/passthrough resolution over the full-outer
    join of base rows with the latest change per key (__k/__op/__p_* side)."""
    op = t.column("__op")
    # delete: latest op says so; null op (no change) keeps the row
    t = t.filter(pc.fill_null(pc.invert(pc.equal(op, delete_op)), True))
    has_chg = pc.is_valid(t.column("__op"))
    cols = {}
    for c in base_names:
        if c == key_col:
            # the full-outer join may coalesce the right key into the
            # left key column (no "__k" in the output) — handle both
            if "__k" in t.column_names:
                cols[c] = pc.coalesce(
                    t.column(c), t.column("__k").cast(base_types[c]))
            else:
                cols[c] = t.column(c)
        elif c in inv_payload:
            newv = t.column(f"__p_{inv_payload[c]}").cast(base_types[c])
            cols[c] = pc.if_else(has_chg, newv, t.column(c))
        else:
            cols[c] = t.column(c)  # inserts get nulls here
    return pa.table(cols)


def _latest_local(t: pa.Table, key: str, order_by: Sequence[str]) -> pa.Table:
    """Latest row per key within one in-memory table: one sort_indices
    (key asc, order_by desc — pass a unique column last for a total order)
    + a vectorized first-occurrence mask.  No hashing, no Python per row."""
    sort_keys = [(key, "ascending")] + [(c, "descending") for c in order_by]
    t = t.take(pc.sort_indices(t, sort_keys=sort_keys))
    n = t.num_rows
    if n <= 1:
        return t
    k = t.column(key).combine_chunks()
    cur, prev = k.slice(1, n - 1), k.slice(0, n - 1)
    same = pc.fill_null(pc.equal(cur, prev), False).to_numpy(
        zero_copy_only=False)
    keep = np.ones(n, dtype=bool)
    keep[1:] = ~same
    return t.filter(pa.array(keep))


def apply_changes_bucketed(
    base_path: str,
    changes: ray.data.Dataset,
    change_key_col: str,
    order_by: Sequence[str],
    op_col: str,
    payload_map: Dict[str, str],
    delete_op: str = "delete",
    chg_path: Optional[str] = None,
) -> ray.data.Dataset:
    """``apply_changes`` over a hash-bucketed base layout (bucketed.py) with
    ZERO base exchange — the 100-TB MERGE INTO shape.

    The base (the big side) never moves: the change log makes ONE map pass
    into a matching ``_bucket=i/`` layout (same durable key hash, same
    bucket count — no shuffle, each task appends to the dirs it touches),
    then one task per bucket compacts its changes to the latest row per key
    locally and resolves them against the co-located base bucket with a
    local Arrow hash join.  Buckets with no changes pass the base through
    untouched.  Output semantics are identical to ``apply_changes`` (same
    resolve kernel); to persist the next state re-tag with
    ``write_bucketed(out, next_path, key, n_buckets)`` — a map pass, still
    no shuffle, since the durable hash is deterministic.
    """
    import glob as _glob
    import tempfile

    import pyarrow.parquet as pq

    from .bucketed import _bucket_of, _read_bucket, layout_of

    lay = layout_of(base_path)
    key_col, n_buckets = lay["key"], lay["n_buckets"]
    chg_cols = list(dict.fromkeys(
        [change_key_col, op_col] + list(payload_map) + list(order_by)))

    chg_path = chg_path or tempfile.mkdtemp(prefix="ipe_cdc_chg_")

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.select(chg_cols)
        return batch.append_column(
            "_bucket", pa.array(_bucket_of(batch.column(change_key_col),
                                           n_buckets), pa.int64()))

    changes.map_batches(tag, batch_format="pyarrow").write_parquet(
        chg_path, partition_cols=["_bucket"])

    sample = sorted(_glob.glob(
        os.path.join(base_path, "_bucket=*", "*.parquet")))
    if not sample:
        raise ValueError(f"no bucket files under {base_path}")
    base_schema = pq.read_schema(sample[0])
    base_names = list(base_schema.names)
    base_types = dict(zip(base_schema.names, base_schema.types))
    inv_payload = {b: c for c, b in payload_map.items()}
    latest_cols = [change_key_col, op_col] + list(payload_map)
    latest_names = ["__k", "__op"] + [f"__p_{c}" for c in payload_map]

    def merge_one(batch: pa.Table) -> pa.Table:
        out: List[pa.Table] = []
        for b in batch.column("bucket").to_pylist():
            ta = _read_bucket(base_path, b, None)
            tc = _read_bucket(chg_path, b, None)
            if tc is None or tc.num_rows == 0:
                if ta is not None:
                    out.append(ta)
                continue
            latest = _latest_local(tc, change_key_col, list(order_by))
            latest = latest.select(latest_cols).rename_columns(latest_names)
            if ta is None:
                ta = base_schema.empty_table()
            j = ta.join(latest, keys=[key_col], right_keys=["__k"],
                        join_type="full outer")
            out.append(_resolve_changes(j, base_names, base_types, key_col,
                                        inv_payload, delete_op))
        if not out:
            return base_schema.empty_table()
        return pa.concat_tables(out, promote_options="default")

    buckets = ray.data.from_items([{"bucket": i} for i in range(n_buckets)])
    return buckets.map_batches(merge_one, batch_size=1,
                               batch_format="pyarrow")


def scd2_intervals(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    payload_cols: Sequence[str],
    order_tiebreak: Optional[str] = None,
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> ray.data.Dataset:
    """Build SCD-type-2 validity intervals from a change log.

    Per key, ordered by (``ts_col``[, tiebreak]): consecutive rows whose
    *entire* payload repeats the previous row's payload are collapsed
    (``IS DISTINCT FROM`` semantics — two nulls are not a change), and each
    surviving change becomes one dimension row valid from its own timestamp
    until the next change's timestamp (``valid_to`` null = current row).

    Equivalent SQL: filter on ``payload IS DISTINCT FROM LAG(payload) OVER
    (PARTITION BY key ORDER BY ts)`` then ``LEAD(ts)`` over the survivors.
    Run-collapse with a single LAG is exact here because payload equality is
    transitive: of a run of identical payloads only the first row survives.

    ONE keyed shuffle; interior is a sort + k vectorized shifted compares +
    one shifted take.  Same per-key memory contract as ``session_windows``
    (salt hot keys upstream if one key's history exceeds worker memory).
    """
    payload_cols = list(payload_cols)

    def per_partition(part: pa.Table) -> pa.Table:
        sort_keys = [(key_col, "ascending"), (ts_col, "ascending")]
        if order_tiebreak:
            sort_keys.append((order_tiebreak, "ascending"))
        part = part.take(pc.sort_indices(part, sort_keys=sort_keys))
        n = part.num_rows
        keys_np = part.column(key_col).to_numpy(zero_copy_only=False)
        keep = np.ones(n, dtype=bool)
        if n > 1:
            same_all = keys_np[1:] == keys_np[:-1]  # only within one key
            for c in payload_cols:
                col = part.column(c).combine_chunks()
                cur, prev = col.slice(1, n - 1), col.slice(0, n - 1)
                eq = pc.fill_null(pc.equal(cur, prev), False)
                both_null = pc.and_(pc.is_null(cur), pc.is_null(prev))
                same = pc.or_(eq, both_null)
                same_all &= same.to_numpy(zero_copy_only=False)
            keep[1:] = ~same_all
        part = part.filter(pa.array(keep))
        m = part.num_rows
        kf = part.column(key_col).to_numpy(zero_copy_only=False)
        # LEAD(ts) within the key: the next row only counts if it is the
        # same key; last-of-key rows get a typed null
        idx = np.arange(1, m + 1, dtype=np.int64)
        invalid = idx >= m
        src = np.where(invalid, 0, idx)
        if m:
            invalid |= kf[src] != kf
        take_idx = pa.array(np.where(invalid, 0, idx), pa.int64(),
                            mask=invalid)
        out = {key_col: part.column(key_col)}
        for c in payload_cols:
            out[c] = part.column(c)
        out[valid_from] = part.column(ts_col)
        out[valid_to] = part.column(ts_col).take(take_idx)
        return pa.table(out)

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(ds, key_col, per_partition)


def snapshot_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key_col: str,
    payload_cols: Sequence[str],
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Change-data-feed between two keyed snapshots (Delta CDF / table-diff
    analog): one row per key whose state differs, ``change`` in
    {'insert','update','delete'} with ``old_*`` / ``new_*`` payload columns.
    Keys present in both snapshots with IS-NOT-DISTINCT-FROM-equal payloads
    (null-safe) drop out.

    Scale shape: ONE keyed full-outer join (same-key bucketed layouts elide
    the exchange, see bucketed.py); classification is a vectorized null-safe
    compare per batch — nothing driver-resident at any snapshot size.
    """
    P = num_partitions or _join_partitions()
    pay = list(payload_cols)

    def tag(side: str, key_out: str):
        def fn(t: pa.Table) -> pa.Table:
            cols = {key_out: t.column(key_col)}
            for c in pay:
                cols[f"__{side}_{c}"] = t.column(c)
            cols[f"__{side}"] = pa.array(np.ones(t.num_rows, np.int8))
            return pa.table(cols)
        return fn

    o = old.select_columns([key_col] + pay).map_batches(
        tag("o", key_col), batch_format="pyarrow")
    nw = new.select_columns([key_col] + pay).map_batches(
        tag("n", "__k"), batch_format="pyarrow")
    joined = o.join(nw, join_type="full_outer", num_partitions=P,
                    on=(key_col,), right_on=("__k",))

    _sch = old.schema()
    key_type = dict(zip(_sch.names, _sch.types))[key_col]

    def classify(t: pa.Table) -> pa.Table:
        has_o = pc.is_valid(t.column("__o")).to_numpy(zero_copy_only=False)
        has_n = pc.is_valid(t.column("__n")).to_numpy(zero_copy_only=False)
        eq_all = np.ones(t.num_rows, dtype=bool)
        for c in pay:
            a = t.column(f"__o_{c}")
            b = t.column(f"__n_{c}")
            both_null = pc.and_(pc.is_null(a), pc.is_null(b))
            eq = pc.or_(pc.fill_null(pc.equal(a, b), False), both_null)
            eq_all &= eq.to_numpy(zero_copy_only=False)
        keep = ~(has_o & has_n & eq_all)
        change = np.where(~has_o, "insert", np.where(~has_n, "delete",
                                                     "update"))
        if "__k" in t.column_names:
            keyc = pc.coalesce(t.column(key_col),
                               t.column("__k").cast(key_type))
        else:
            keyc = t.column(key_col)
        cols = {key_col: keyc,
                "change": pa.array(change, pa.string())}
        for c in pay:
            cols[f"old_{c}"] = t.column(f"__o_{c}")
            cols[f"new_{c}"] = t.column(f"__n_{c}")
        return pa.table(cols).filter(pa.array(keep))

    return joined.map_batches(classify, batch_format="pyarrow")


def merge_aggregate_bucketed(
    view_path: str,
    increment: ray.data.Dataset,
    key_col: str,
    add_cols: Sequence[str],
    inc_path: Optional[str] = None,
) -> ray.data.Dataset:
    """Incremental maintenance of an ADDITIVE aggregate view (counts /
    integer sums per key) over a hash-bucketed at-rest layout — the
    materialized-view sibling of :func:`apply_changes_bucketed`: the view
    equals a full GROUP BY recompute over base ∪ increment, but the base
    aggregate NEVER rescans or reshuffles.

    ``increment`` rows are partial contributions ``(key_col, *add_cols)``
    with int64 additive columns (raw events map to partials with n=1 /
    per-row fixed-point sums — integer addition is commutative/associative,
    so the merged view is partition-, retry- and order-independent, which
    is what lets an SQL oracle assert view == full recompute exactly).

    Shape: ONE map pass over the increment — per-batch per-key local
    pre-combine, then append into the view's ``_bucket=i/`` dirs (same
    durable key hash, no shuffle) — then one task per bucket combines its
    increment partials locally and adds them onto the co-located base
    bucket rows (one local Arrow combine; never a distributed join).  Untouched
    buckets pass through unread-increment.  Persist the next state with
    ``bucketed.write_bucketed`` (a map pass — the durable hash is
    deterministic).
    """
    import glob as _glob
    import tempfile

    import pyarrow.parquet as pq

    from .bucketed import _bucket_of, _read_bucket, layout_of

    lay = layout_of(view_path)
    view_key, n_buckets = lay["key"], lay["n_buckets"]
    cols = [key_col] + list(add_cols)
    inc_path = inc_path or tempfile.mkdtemp(prefix="ipe_aggv_inc_")

    def tag(batch: pa.Table) -> pa.Table:
        batch = batch.select(cols)
        # local pre-combine: one partial row per key per batch
        raw = batch.group_by([key_col]).aggregate(
            [(c, "sum") for c in add_cols])
        g = pa.table(
            {key_col: raw.column(key_col),
             **{c: raw.column(f"{c}_sum").cast(pa.int64())
                for c in add_cols}})
        return g.append_column(
            "_bucket", pa.array(_bucket_of(g.column(key_col), n_buckets),
                                pa.int64()))

    increment.map_batches(tag, batch_format="pyarrow").write_parquet(
        inc_path, partition_cols=["_bucket"])

    sample = sorted(_glob.glob(
        os.path.join(view_path, "_bucket=*", "*.parquet")))
    if not sample:
        raise ValueError(f"no bucket files under {view_path}")
    view_schema = pq.read_schema(sample[0])

    def merge_one(batch: pa.Table) -> pa.Table:
        out: List[pa.Table] = []
        for b in batch.column("bucket").to_pylist():
            tv = _read_bucket(view_path, b, None)
            ti = _read_bucket(inc_path, b, None)
            if ti is None or ti.num_rows == 0:
                if tv is not None:
                    out.append(tv.select([view_key] + list(add_cols)))
                continue
            if tv is None:
                tv = view_schema.empty_table()
            # combine increment partials + base rows in one local combine
            both = pa.concat_tables([
                tv.select([view_key] + list(add_cols)),
                pa.table({view_key: ti.column(key_col),
                          **{c: ti.column(c).cast(pa.int64())
                             for c in add_cols}})],
                promote_options="default")
            g = both.group_by([view_key]).aggregate(
                [(c, "sum") for c in add_cols])
            out.append(pa.table(
                {view_key: g.column(view_key),
                 **{c: g.column(f"{c}_sum").cast(pa.int64())
                    for c in add_cols}}))
        if not out:
            return view_schema.empty_table()
        return pa.concat_tables(out, promote_options="default")

    buckets = ray.data.from_items([{"bucket": i} for i in range(n_buckets)])
    return buckets.map_batches(merge_one, batch_size=1,
                               batch_format="pyarrow")
