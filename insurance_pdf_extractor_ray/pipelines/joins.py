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
    """Broadcast probe kernel: resolves the small-side TABLE once per
    worker (dsutil.cached_broadcast); per-batch probe is one Arrow
    ``index_in`` + column ``take`` —
    no per-row Python."""

    def __init__(self, small_ref, key: str, add_cols: List[str], how: str):
        from ..dsutil import cached_broadcast

        self.small_keys, self.small_tbl = cached_broadcast(small_ref)
        self.key, self.add_cols, self.how = key, add_cols, how

    def __call__(self, batch: pa.Table) -> pa.Table:
        keys = batch.column(self.key)
        if isinstance(keys, pa.ChunkedArray):
            keys = keys.combine_chunks()
        idx = pc.index_in(keys, value_set=self.small_keys)  # null = miss
        if self.how == "inner":
            hit = pc.is_valid(idx)
            batch = batch.filter(hit)
            idx = idx.filter(hit)
        for col in self.add_cols:
            # take with null indices yields typed nulls — left-join semantics
            # and stable per-batch schema (no null-type inference) for free
            batch = batch.append_column(col, self.small_tbl.column(col).take(idx))
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

    ``small`` is collected once (must be dimension-table sized), broadcast as
    an Arrow table via ``ray.put`` (zero-copy from the object store in every
    worker), and probed per batch with vectorized ``index_in``.
    ``how``: 'inner' drops unmatched big rows; 'left' keeps them with nulls.
    """
    right_on = right_on or on
    schema = small.schema().base_schema
    if add_cols is None:
        add_cols = [f.name for f in schema if f.name != right_on]
    small_tbl = pa.concat_tables(
        [t for t in ray.get(small.to_arrow_refs()) if t.num_rows])
    keys_arr = small_tbl.column(right_on)
    if isinstance(keys_arr, pa.ChunkedArray):
        keys_arr = keys_arr.combine_chunks()
    ref = ray.put((keys_arr, small_tbl.select(add_cols).combine_chunks()))

    # plain tasks, not an actor pool: a pool pays spin-up per execution and
    # caps probe width at its max size; the per-worker broadcast cache
    # keeps the deserialize-once property (see dsutil.cached_broadcast)
    def lookup(batch: pa.Table) -> pa.Table:
        return _BroadcastLookup(ref, on, add_cols, how)(batch)

    return big.map_batches(
        lookup, batch_format="pyarrow",
        concurrency=concurrency if isinstance(concurrency, int) else None,
    )


class _BroadcastAnti:
    """Vectorized membership filter: one Arrow ``is_in`` per batch against
    the broadcast key array."""

    def __init__(self, keys_ref, key: str, keep_matching: bool):
        from ..dsutil import cached_broadcast

        self.keys: pa.Array = cached_broadcast(keys_ref)
        self.key, self.keep_matching = key, keep_matching

    def __call__(self, batch: pa.Table) -> pa.Table:
        # null keys are never members: semi drops them, anti keeps them
        mask = pc.fill_null(pc.is_in(batch.column(self.key),
                                     value_set=self.keys), False)
        if not self.keep_matching:
            mask = pc.invert(mask)
        return batch.filter(mask)


def _keys_array(keys) -> pa.Array:
    if isinstance(keys, pa.Array):
        return keys
    if isinstance(keys, pa.ChunkedArray):
        return keys.combine_chunks()
    return pa.array(list(keys))


def broadcast_anti_join(
    ds: ray.data.Dataset, key: str, exclude_keys, concurrency=(1, 8)
) -> ray.data.Dataset:
    """Drop rows whose ``key`` is in ``exclude_keys`` (J3 semi-join delete,
    storage.py:610-628) — key set broadcast once."""
    ref = ray.put(_keys_array(exclude_keys))

    def anti(batch: pa.Table) -> pa.Table:
        return _BroadcastAnti(ref, key, keep_matching=False)(batch)

    return ds.map_batches(
        anti, batch_format="pyarrow",
        concurrency=concurrency if isinstance(concurrency, int) else None,
    )


def broadcast_semi_join(
    ds: ray.data.Dataset, key: str, include_keys, concurrency=(1, 8)
) -> ray.data.Dataset:
    """Keep only rows whose ``key`` is in ``include_keys``."""
    ref = ray.put(_keys_array(include_keys))

    def semi(batch: pa.Table) -> pa.Table:
        return _BroadcastAnti(ref, key, keep_matching=True)(batch)

    return ds.map_batches(
        semi, batch_format="pyarrow",
        concurrency=concurrency if isinstance(concurrency, int) else None,
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
    direction: str = "backward",
) -> ray.data.Dataset:
    """Big-big as-of join: for each left row, the right row with the
    greatest ``on`` ≤ the left row's ``on`` (``direction="backward"``, the
    SQL ``ASOF JOIN ... ON l.by = r.by AND l.on >= r.on``), the smallest
    ``on`` ≥ it (``"forward"``), or whichever of the two is closer
    (``"nearest"``, backward on exact-distance ties).

    One keyed shuffle: both sides are tagged and unioned, then ONE
    vectorized call per hash partition (``dsutil.keyed_partition_map``)
    sorts the partition by (by, on) once and answers every left row of
    every key with a single composite-key ``np.searchsorted`` sweep — no
    per-row or per-key Python, no second shuffle.  Ties (right ``on`` equal
    to left ``on``) match, mirroring the SQL ``>=`` bound; duplicate right
    timestamps are safe because only ``value_col`` (typically the matched
    ``on`` itself) is emitted.

    Partitioning assumption: a hash partition's rows (both sides) fit one
    worker — the same contract as Ray's own groupby shuffle.  For hot keys
    beyond that use ``asof_join_salted`` (epoch-salted shuffle + carry
    rows; proven output-identical).
    """
    out_col = out_col or f"right_{value_col}"
    l_schema = left.schema()
    left_cols = l_schema.names
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_keep = [by, on, value_col]

    r_schema = right.schema()
    if r_schema is None:
        # Ray loses the schema of some fully-empty datasets (e.g. after
        # repartition); surface that clearly instead of an AttributeError
        raise ValueError(
            "asof_join: right side has no schema (empty schemaless "
            "dataset) — pass the unrepartitioned dataset or one with rows")
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

    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction: {direction}")

    def merge_partition(part: pa.Table) -> pa.Table:
        """Every ``by`` key of the partition in ONE vectorized pass: sort by
        (by, on) once, then composite-key ``np.searchsorted`` — right rows
        of key k occupy the contiguous band ``seg*BIG + (on - on_min)``, so
        a single binary-search sweep answers all keys (segment-ordinal ×
        range-offset monotonization; falls back to a per-segment sweep if
        the composite would overflow int64, which real timestamp ranges
        never hit)."""
        vtype = part.column(value_col).type
        if part.num_rows == 0:
            out = pa.table({c: pa.array([], l_types[c]) for c in left_cols})
            return out.append_column(out_col, pa.array([], vtype))
        part = part.take(pc.sort_indices(
            part, sort_keys=[(by, "ascending"), (on, "ascending")]))
        n = part.num_rows
        side = part.column("_side").to_numpy(zero_copy_only=False)
        if part.column(on).null_count:
            # a null on-value has no place in the order: nulls would
            # become NaN/NaT below and break the searchsorted total order
            # (silently wrong matches) — fail loudly instead
            raise ValueError(
                f"asof_join: null values in on column {on!r}; filter or "
                "fill them before joining")
        ons = part.column(on).to_numpy(zero_copy_only=False)
        if ons.dtype.kind == "M":  # timestamps: integer view so the
            ons = ons.view(np.int64)  # nearest-distance arithmetic works
        if ons.dtype.kind == "f":
            # float on-values: keep exact float64 (an int64 cast would
            # truncate 1.7 -> 1 and misplace boundary matches); the
            # composite-key fast path below is skipped for floats.
            on_is_float = True
            ons = ons.astype(np.float64, copy=False)
        else:
            on_is_float = False
            ons = ons.astype(np.int64, copy=False)
        from ..dsutil import run_starts

        # null-safe segment ids (a null-key run is one group)
        seg = np.cumsum(run_starts(part.column(by))) - 1
        lidx = np.flatnonzero(side == 0)
        ridx = np.flatnonzero(side == 1)
        l_tbl = part.take(pa.array(lidx, pa.int64()))
        if len(ridx) == 0 or len(lidx) == 0:
            matched = pa.nulls(l_tbl.num_rows, vtype)
        else:
            use_composite = not on_is_float
            if use_composite:
                on_min = int(ons.min())
                span = int(ons.max()) - on_min + 2
                n_seg = int(seg[-1]) + 1
                use_composite = n_seg * span < (1 << 62)
            if use_composite:
                comp = seg * np.int64(span) + (ons - np.int64(on_min))
                comp_r, comp_l = comp[ridx], comp[lidx]
            else:  # float on-values or pathological int range: exact
                # lexicographic (seg, on) record compare — no truncation
                comp = np.rec.fromarrays([seg, ons])
                comp_r, comp_l = comp[ridx], comp[lidx]
            r_seg = seg[ridx]
            l_seg = seg[lidx]
            nr = len(ridx)
            # backward: greatest right (seg, on) <= left's; key-guarded
            back = np.searchsorted(comp_r, comp_l, side="right") - 1
            back_ok = (back >= 0) & (r_seg[np.maximum(back, 0)] == l_seg)
            if direction == "backward":
                pos, ok = back, back_ok
            else:
                fwd = np.searchsorted(comp_r, comp_l, side="left")
                fwd_ok = (fwd < nr) & (r_seg[np.minimum(fwd, nr - 1)] == l_seg)
                if direction == "forward":
                    pos, ok = fwd, fwd_ok
                else:  # nearest: backward wins exact-distance ties
                    r_on = ons[ridx]
                    l_on = ons[lidx]
                    db = np.where(back_ok,
                                  l_on - r_on[np.maximum(back, 0)], np.inf)
                    dfw = np.where(fwd_ok,
                                   r_on[np.minimum(fwd, nr - 1)] - l_on,
                                   np.inf)
                    use_back = db <= dfw
                    pos = np.where(use_back, back, np.minimum(fwd, nr - 1))
                    ok = np.where(use_back, back_ok, fwd_ok)
            safe = np.where(ok, pos, 0)
            r_vals = part.column(value_col).take(
                pa.array(ridx[safe], pa.int64()))
            matched = pc.if_else(pa.array(ok), r_vals, pa.scalar(None, vtype))
        out = l_tbl.select(left_cols).append_column(out_col, matched)
        if how == "inner":
            out = out.filter(pc.is_valid(out.column(out_col)))
        return out

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(both, by, merge_partition)


def asof_join_salted(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    by: str,
    on: str,
    value_col: str,
    epoch: int,
    out_col: Optional[str] = None,
    how: str = "left",
) -> ray.data.Dataset:
    """Hot-key-safe ``asof_join``: shuffle on *(by, on // epoch)* instead of
    ``by``, so one key's rows spread over its time epochs — no group ever
    exceeds one epoch of one key.

    The cross-epoch dependency ("the match may be in an earlier epoch") is
    carried by a synthetic right row per *(key, left-epoch)*: the latest right
    event from any strictly-earlier epoch, computed from per-epoch right
    summaries (one row per *(key, epoch)* — bounded by distinct-epoch
    cardinality, never by row count) and injected into the big shuffle as an
    extra right-side row.  The in-group merge is then *identical* to the plain
    path, so outputs match ``asof_join`` exactly (proven in
    ``test_joins.py::test_asof_salted_*`` across epoch sizes).

    Tie semantics for duplicate right ``on`` at an epoch's maximum: the carry
    row takes the greatest ``value_col`` (deterministic); the plain path's
    pick among exact duplicates is input-order — identical whenever right
    *(by, on)* pairs are unique or ``value_col is on`` (the canonical use).
    """
    out_col = out_col or f"right_{value_col}"
    l_schema = left.schema()
    left_cols = l_schema.names
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_keep = [by, on, value_col]
    r_schema = right.schema()
    r_types = dict(zip(r_schema.names, r_schema.types))
    r_extra = [c for c in r_keep if c not in left_cols]
    all_cols = left_cols + r_extra
    on_type = r_types[on]
    val_type = r_types[value_col]
    by_type = r_types[by]

    def _epoch_of(arr: pa.ChunkedArray) -> np.ndarray:
        return np.floor_divide(arr.to_numpy(zero_copy_only=False), epoch)

    # --- small side: per-(key, epoch) right summaries (map-side combined) ---
    def right_summary(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({by: pa.array([], by_type),
                             "_epoch": pa.array([], pa.int64()),
                             on: pa.array([], on_type),
                             value_col: pa.array([], val_type)})
        ep = _epoch_of(batch.column(on))
        tbl = pa.table({by: batch.column(by),
                        "_epoch": pa.array(ep, pa.int64()),
                        on: batch.column(on),
                        value_col: batch.column(value_col)})
        # last row per (key, epoch) under (on asc, value asc) = argmax with
        # deterministic value tiebreak
        sort_cols = list(dict.fromkeys([by, "_epoch", on, value_col]))
        idx = pc.sort_indices(tbl, sort_keys=[(c, "ascending") for c in sort_cols])
        tbl = tbl.take(idx)
        k = tbl.column(by).to_numpy(zero_copy_only=False)
        e = tbl.column("_epoch").to_numpy(zero_copy_only=False)
        last = np.ones(len(k), dtype=bool)
        last[:-1] = (k[:-1] != k[1:]) | (e[:-1] != e[1:])
        return tbl.filter(pa.array(last))

    def last_per_key_epoch(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            return part
        sort_cols = list(dict.fromkeys([by, "_epoch", on, value_col]))
        part = part.take(pc.sort_indices(
            part, sort_keys=[(c, "ascending") for c in sort_cols]))
        k = part.column(by).to_numpy(zero_copy_only=False)
        e = part.column("_epoch").to_numpy(zero_copy_only=False)
        last = np.ones(n, dtype=bool)
        last[:-1] = (k[:-1] != k[1:]) | (e[:-1] != e[1:])
        return part.filter(pa.array(last))

    from ..dsutil import distinct_rows_by, keyed_partition_map

    summaries = keyed_partition_map(
        right.select_columns(list(dict.fromkeys(r_keep)))
        .map_batches(right_summary, batch_format="pyarrow"),
        [by, "_epoch"], last_per_key_epoch)

    # --- distinct (key, epoch) pairs the LEFT touches (map-side dedup) ---
    def left_epochs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({by: pa.array([], by_type),
                             "_epoch": pa.array([], pa.int64())})
        ep = _epoch_of(batch.column(on))
        t = pa.table({by: batch.column(by), "_epoch": pa.array(ep, pa.int64())})
        return t.group_by([by, "_epoch"]).aggregate([])

    l_epochs = distinct_rows_by(
        left.select_columns([by, on])
        .map_batches(left_epochs, batch_format="pyarrow"),
        [by, "_epoch"]).select_columns([by, "_epoch"])

    # --- forward-fill right summaries onto left epochs, per key ---
    def sum_tag(kind: int):
        def _t(batch: pa.Table) -> pa.Table:
            cols = {by: batch.column(by), "_epoch": batch.column("_epoch")}
            if kind == 1:
                cols[on] = batch.column(on)
                cols[value_col] = batch.column(value_col)
            else:
                cols[on] = pa.nulls(batch.num_rows, on_type)
                cols[value_col] = pa.nulls(batch.num_rows, val_type)
            cols["_kind"] = pa.array([kind] * batch.num_rows, pa.int8())
            return pa.table(cols)
        return _t

    merged_small = summaries.map_batches(sum_tag(1), batch_format="pyarrow").union(
        l_epochs.map_batches(sum_tag(0), batch_format="pyarrow"))

    def carry_rows(group: pa.Table) -> pa.Table:
        """For each left epoch, the latest right summary from a strictly
        earlier epoch — emitted as a synthetic right row tagged with the left
        epoch.  Group size = distinct epochs of one key."""
        idx = pc.sort_indices(group, sort_keys=[("_epoch", "ascending"),
                                                ("_kind", "ascending")])
        group = group.take(idx)
        kind = group.column("_kind").to_numpy(zero_copy_only=False)
        eps = group.column("_epoch").to_numpy(zero_copy_only=False)
        # prefix "latest right summary index before this row", strictly
        # earlier epoch: walk once (epoch count per key, not row count)
        n = group.num_rows
        ons_np = group.column(on).to_numpy(zero_copy_only=False)
        vals = group.column(value_col)
        out_idx: List[int] = []
        out_ep: List[int] = []
        last_right = -1            # summary from a previous epoch
        cur_right = -1             # summary inside the current epoch
        cur_epoch = None
        for i in range(n):
            if cur_epoch is not None and eps[i] != cur_epoch:
                if cur_right >= 0:
                    last_right = cur_right
                cur_right = -1
            cur_epoch = eps[i]
            if kind[i] == 1:
                cur_right = i
            else:  # left epoch needing a carry
                if last_right >= 0:
                    out_idx.append(last_right)
                    out_ep.append(int(eps[i]))
        if not out_idx:
            return pa.table({by: pa.array([], by_type),
                             "_epoch": pa.array([], pa.int64()),
                             on: pa.array([], on_type),
                             value_col: pa.array([], val_type)})
        picked = group.take(pa.array(out_idx))
        return pa.table({by: picked.column(by),
                         "_epoch": pa.array(out_ep, pa.int64()),
                         on: picked.column(on),
                         value_col: picked.column(value_col)})

    from ..dsutil import bucketed_segments_map

    _carry_empty = pa.table({by: pa.array([], by_type),
                             "_epoch": pa.array([], pa.int64()),
                             on: pa.array([], on_type),
                             value_col: pa.array([], val_type)})
    carries = bucketed_segments_map(merged_small, by, carry_rows,
                                    empty_out=_carry_empty, min_rows=1)

    # --- big shuffle: left + right + carry rows keyed (by, epoch) ---
    def tag(side: int, from_right_schema: bool):
        def _t(batch: pa.Table) -> pa.Table:
            cols = {}
            for name in all_cols:
                if side == 0:
                    cols[name] = (batch.column(name) if name in left_cols
                                  else pa.nulls(batch.num_rows, r_types[name]))
                else:
                    cols[name] = (batch.column(name) if name in r_keep
                                  else pa.nulls(batch.num_rows, l_types[name]))
            if side == 2:
                ep = batch.column("_epoch")
            else:
                ep = pa.array(_epoch_of(batch.column(on)), pa.int64())
            out = pa.table(cols)
            out = out.append_column("_epoch", ep)
            return out.append_column("_side",
                                     pa.array([side] * batch.num_rows, pa.int8()))
        return _t

    both = (
        left.map_batches(tag(0, False), batch_format="pyarrow")
        .union(right.map_batches(tag(1, True), batch_format="pyarrow"))
        .union(carries.map_batches(tag(2, True), batch_format="pyarrow"))
    )

    def merge(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        ons = group.column(on).to_numpy(zero_copy_only=False)
        l_tbl = group.filter(pa.array(side == 0)).drop_columns(["_side", "_epoch"])
        r_mask = side >= 1           # in-epoch right rows AND the carry row
        l_on = ons[side == 0]
        r_on = ons[r_mask]
        if len(r_on) == 0:
            matched = pa.nulls(l_tbl.num_rows, group.column(value_col).type)
        else:
            order = np.argsort(r_on, kind="stable")
            r_on_sorted = r_on[order]
            pos = np.searchsorted(r_on_sorted, l_on, side="right") - 1
            r_vals = group.filter(pa.array(r_mask)).column(value_col).take(
                pa.array(order[np.maximum(pos, 0)]))
            matched = pc.if_else(pa.array(pos >= 0), r_vals,
                                 pa.scalar(None, group.column(value_col).type))
        out = l_tbl.select(left_cols).append_column(out_col, matched)
        if how == "inner":
            out = out.filter(pc.is_valid(out.column(out_col)))
        return out

    _merge_empty_cols = {c: pa.array([], l_types[c]) for c in left_cols}
    _merge_empty_cols[out_col] = pa.array([], val_type)
    return bucketed_segments_map(both, [by, "_epoch"], merge,
                                 empty_out=pa.table(_merge_empty_cols),
                                 min_rows=1)


def range_join(
    points: ray.data.Dataset,
    intervals: ray.data.Dataset,
    on: str,
    start_col: str,
    end_col: str,
    epoch: int,
    by: Optional[str] = None,
    interval_cols: Optional[List[str]] = None,
) -> ray.data.Dataset:
    """Point-in-interval join: one output row per (point, interval) pair with
    ``start_col <= point.on <= end_col`` (and equal ``by`` key if given) —
    SQL ``JOIN ... ON p.on BETWEEN i.start AND i.end``.

    Scale shape: each interval is replicated to every ``epoch``-sized time
    bucket it overlaps (``(end-start)/epoch + 1`` copies — pick ``epoch``
    near the typical interval length so replication stays O(1)); points go to
    exactly one bucket; one keyed shuffle on *(by?, bucket)* then a
    vectorized in-group candidate mask.  No group ever holds more than one
    epoch of one key.  The in-group mask is |points| x |intervals| per
    bucket — bounded by the epoch choice, the documented contract.
    """
    interval_cols = interval_cols or [start_col, end_col]
    p_schema = points.schema()
    p_cols = p_schema.names
    p_types = dict(zip(p_schema.names, p_schema.types))
    i_schema = intervals.schema()
    i_types = dict(zip(i_schema.names, i_schema.types))
    i_keep = list(dict.fromkeys(
        ([by] if by else []) + [start_col, end_col] + interval_cols))
    shuffle_cols = list(dict.fromkeys(p_cols + i_keep))

    def tag_points(batch: pa.Table) -> pa.Table:
        cols = {c: (batch.column(c) if c in p_cols
                    else pa.nulls(batch.num_rows, i_types[c]))
                for c in shuffle_cols}
        ons = batch.column(on).to_numpy(zero_copy_only=False)
        out = pa.table(cols)
        out = out.append_column("_bucket", pa.array(ons // epoch, pa.int64()))
        return out.append_column("_side", pa.array([0] * batch.num_rows, pa.int8()))

    def tag_intervals(batch: pa.Table) -> pa.Table:
        s = batch.column(start_col).to_numpy(zero_copy_only=False)
        e = batch.column(end_col).to_numpy(zero_copy_only=False)
        b0 = s // epoch
        b1 = e // epoch
        reps = (b1 - b0 + 1).astype(np.int64)
        idx = np.repeat(np.arange(batch.num_rows), reps)
        # bucket sequence for each replica: b0[i], b0[i]+1, ..., b1[i]
        offs = np.arange(len(idx)) - np.repeat(np.cumsum(reps) - reps, reps)
        buckets = b0[idx] + offs
        rep = batch.take(pa.array(idx))
        cols = {c: (rep.column(c) if c in i_keep
                    else pa.nulls(rep.num_rows, p_types[c]))
                for c in shuffle_cols}
        out = pa.table(cols)
        out = out.append_column("_bucket", pa.array(buckets, pa.int64()))
        return out.append_column("_side", pa.array([1] * rep.num_rows, pa.int8()))

    both = points.map_batches(tag_points, batch_format="pyarrow").union(
        intervals.select_columns(i_keep).map_batches(
            tag_intervals, batch_format="pyarrow"))

    out_int_cols = [c for c in interval_cols if c != by]

    def match(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        p_tbl = group.filter(pa.array(side == 0))
        i_tbl = group.filter(pa.array(side == 1))
        empty = {c: pa.array([], p_types[c]) for c in p_cols}
        empty.update({c: pa.array([], i_types[c]) for c in out_int_cols})
        if p_tbl.num_rows == 0 or i_tbl.num_rows == 0:
            return pa.table(empty)
        t = p_tbl.column(on).to_numpy(zero_copy_only=False)
        s = i_tbl.column(start_col).to_numpy(zero_copy_only=False)
        e = i_tbl.column(end_col).to_numpy(zero_copy_only=False)
        hit = (s[None, :] <= t[:, None]) & (t[:, None] <= e[None, :])
        pi, ii = np.nonzero(hit)
        p_sel = p_tbl.take(pa.array(pi))
        i_sel = i_tbl.take(pa.array(ii))
        cols = {c: p_sel.column(c) for c in p_cols}
        cols.update({c: i_sel.column(c) for c in out_int_cols})
        return pa.table(cols)

    keys = [by, "_bucket"] if by else ["_bucket"]
    from ..dsutil import bucketed_segments_map

    _empty = {c: pa.array([], p_types[c]) for c in p_cols}
    _empty.update({c: pa.array([], i_types[c]) for c in out_int_cols})
    return bucketed_segments_map(both, keys, match,
                                 empty_out=pa.table(_empty))


def skew_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: Optional[str] = None,
    how: str = "inner",
    hot_threshold: int = 100_000,
    mg_k: int = 4096,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Hybrid skew-aware join: hot left keys take the broadcast path, the
    long tail takes the hash shuffle — the standard cure for the one-reducer
    hot spot a plain shuffle join hits on power-law keys (user ids, domains).

      1. detect hot keys with the exact Misra-Gries heavy-hitter pass over
         the LEFT key column (bounded summaries, no full-cardinality state);
      2. the right rows matching hot keys (≤ heavy-hitter count × right
         multiplicity — small because hot keys are FEW by definition) are
         broadcast-joined against the hot left rows: those rows never enter
         a shuffle, so the hottest key adds map-side work only;
      3. everything else goes through ``Dataset.join`` as usual;
      4. union — both paths emit left columns + right value columns.

    ``how``: 'inner' or 'left'.  ``hot_threshold`` is the per-key row count
    above which a key is handled on the broadcast path; it must stay above
    the MG guarantee line n/(mg_k+1) (the detector raises otherwise).
    Assumes the right side is key-unique (dimension semantics), like
    ``broadcast_join``.
    """
    from .sketches import heavy_hitters

    right_on = right_on or on
    hot_tbl, left_total = heavy_hitters(
        left.select_columns([on]), on, threshold=hot_threshold, k=mg_k,
        with_total=True)
    hot_keys = hot_tbl.column("value").combine_chunks() if hot_tbl.num_rows \
        else pa.array([], left.schema().base_schema.field(on).type)
    right_cols = [f.name for f in right.schema().base_schema
                  if f.name != right_on]
    hot_rows = int(pc.sum(hot_tbl.column("n")).as_py() or 0)
    all_hot = hot_rows >= left_total  # exact counts: cold side is empty
    no_hot = hot_tbl.num_rows == 0

    def split(want_hot: bool):
        def f(batch: pa.Table) -> pa.Table:
            m = pc.fill_null(pc.is_in(batch.column(on), value_set=hot_keys),
                             False)
            return batch.filter(m if want_hot else pc.invert(m))
        return f

    def hot_path():
        hot_right = right.map_batches(
            lambda b: b.filter(pc.fill_null(
                pc.is_in(b.column(right_on), value_set=hot_keys), False)),
            batch_format="pyarrow")
        return broadcast_join(
            left.map_batches(split(True), batch_format="pyarrow"),
            hot_right, on=on, right_on=right_on, add_cols=right_cols, how=how)

    def cold_path(cold_left):
        jt = "inner" if how == "inner" else "left_outer"
        cold_j = cold_left.join(
            right, join_type=jt,
            num_partitions=num_partitions or _skew_partitions(),
            on=(on,), right_on=(right_on,))

        def align(batch: pa.Table) -> pa.Table:
            # Dataset.join keeps the right key column; drop it so both paths
            # share one schema (left cols + right value cols)
            if right_on != on and right_on in batch.column_names:
                batch = batch.drop_columns([right_on])
            return batch

        return cold_j.map_batches(align, batch_format="pyarrow")

    # degenerate ends (exact, from the heavy-hitter counts): a fully-empty
    # join side would reach the shuffle aggregator schema-less and fail —
    # and the single-path plan is cheaper anyway
    if all_hot:
        return hot_path()
    if no_hot:
        return cold_path(left)
    return hot_path().union(
        cold_path(left.map_batches(split(False), batch_format="pyarrow")))


def _skew_partitions() -> int:
    from .dedup import _join_partitions

    return _join_partitions()


def star_aggregate(
    fact: ray.data.Dataset,
    fact_key: str,
    measure: str,
    bridge: ray.data.Dataset,
    bridge_key: str,
    dims: List[tuple],
    group_by: List[str],
    num_partitions: Optional[int] = None,
    total_alias: str = "total",
    count_alias: str = "n",
) -> ray.data.Dataset:
    """Star/snowflake rollup — SUM(measure) + COUNT per dimension attribute
    reached through a bridge table and a chain of leaf dimensions
    (``SELECT attrs, SUM(m), COUNT(*) FROM fact JOIN bridge JOIN dims...``).

    The scale plan, in order of what it avoids shipping:
      1. AGGREGATE BELOW THE JOIN: the fact is first reduced to one row per
         ``fact_key`` (map-side partial + one keyed shuffle) — the join
         input is key-cardinality-sized, never fact-sized.
      2. The bridge (mid-size dimension, e.g. customers) joins hash-shuffle
         on that same key (``Dataset.join``, partitions capped to cluster
         CPUs — see dedup._join_partitions rationale).
      3. Leaf dimensions in ``dims`` — each ``(ds, on, right_on,
         add_cols)`` — are genuinely small at EVERY scale (countries,
         regions, configs) and broadcast once via ``ray.put``; probes are
         vectorized ``index_in`` (zero shuffle).
      4. The final rollup groups the (still key-cardinality-sized) stream
         by ``group_by`` — a tiny shuffle.
    Reference analog: the per-dimension statistics joins of
    ``app/services/storage.py:435-584`` (token-usage and field stats by
    document attributes), widened to a proper multiway star.
    """
    from ray.data.aggregate import Count, Sum

    from .dedup import _join_partitions

    per_key = fact.groupby(fact_key).aggregate(
        Sum(measure, alias_name="_m"), Count(alias_name="_n"))
    joined = shuffle_join(
        per_key, bridge, on=fact_key, right_on=bridge_key,
        num_partitions=num_partitions or _join_partitions())
    for dim, on, right_on, add_cols in dims:
        joined = broadcast_join(joined, dim, on=on, right_on=right_on,
                                add_cols=list(add_cols))
    return joined.groupby(list(group_by)).aggregate(
        Sum("_m", alias_name=total_alias), Sum("_n", alias_name=count_alias))


def shuffle_anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: str,
    right_on: Optional[str] = None,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Big-big ANTI join: rows of ``left`` whose key appears NOWHERE in
    ``right`` — SQL ``NOT EXISTS`` / ``NOT IN`` (with non-null keys).

    ``broadcast_anti_join`` needs the exclude-key set on the driver; this
    variant keeps both sides distributed: the right side is first reduced
    map-side to its distinct keys (per-batch ``group_by`` combiner, then one
    keyed count — shuffle volume is #distinct keys, not #rows), a marker
    column is attached, and ONE hash-shuffle ``left_outer`` join + null-
    marker filter yields the anti semantics.  Null left keys are kept (they
    match nothing), mirroring ``broadcast_anti_join``.

    Partitioning note: ``num_partitions`` defaults to the CPU-bounded
    ``dedup._join_partitions()`` — oversizing it beyond cluster CPUs starves
    the join's aggregator actors (observed hang at small CPU counts).
    """
    from .dedup import _join_partitions

    r_on = right_on or on

    def distinct_keys(batch: pa.Table) -> pa.Table:
        t = batch.select([r_on]).filter(pc.is_valid(batch.column(r_on)))
        return t.group_by([r_on]).aggregate([])

    keys = (right.map_batches(distinct_keys, batch_format="pyarrow")
                 .groupby(r_on).count())
    # Dataset.join would collide if the marker shared a left column name
    marker = "__aj_n"
    keys = keys.map_batches(
        lambda t: t.rename_columns([r_on, marker]), batch_format="pyarrow")
    joined = left.join(
        keys, join_type="left_outer",
        num_partitions=num_partitions or _join_partitions(),
        on=(on,), right_on=(r_on,))
    left_cols = list(left.schema().names)

    def keep_misses(t: pa.Table) -> pa.Table:
        return t.filter(pc.is_null(t.column(marker))).select(left_cols)

    return joined.map_batches(keep_misses, batch_format="pyarrow")


def interval_overlap_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    l_start: str,
    l_end: str,
    r_start: str,
    r_end: str,
    epoch: int,
    by: Optional[str] = None,
) -> ray.data.Dataset:
    """Interval × interval OVERLAP join (closed intervals): one output row
    per (left, right) pair with ``l_start <= r_end AND r_start <= l_end``
    (and equal ``by`` key if given) — the stream-stream / session-overlap
    join ``range_join`` cannot express (both sides are ranges).

    Scale shape mirrors ``range_join``: BOTH sides replicate to every
    ``epoch``-sized bucket they overlap, one keyed shuffle on *(by?,
    bucket)*, vectorized in-bucket candidate mask.  A pair that overlaps in
    time coexists in every bucket of the intersection of its bucket ranges —
    it is emitted ONLY in the first one (``max(l_start, r_start) // epoch ==
    bucket``), so no distinct pass is needed to dedup the replication.
    Column names of the two sides must be disjoint (rename upstream).
    """
    l_schema = left.schema()
    r_schema = right.schema()
    l_cols = l_schema.names
    r_cols = [c for c in r_schema.names if c != by]
    overlap_names = set(l_cols) & set(r_cols)
    if overlap_names:
        raise ValueError(f"column names must be disjoint: {overlap_names}")
    l_types = dict(zip(l_schema.names, l_schema.types))
    r_types = dict(zip(r_schema.names, r_schema.types))
    shuffle_cols = list(dict.fromkeys(l_cols + r_cols))

    def tag(other_types, start_col, end_col, side_id):
        def fn(batch: pa.Table) -> pa.Table:
            s = batch.column(start_col).to_numpy(zero_copy_only=False)
            e = batch.column(end_col).to_numpy(zero_copy_only=False)
            b0 = s // epoch
            reps = (e // epoch - b0 + 1).astype(np.int64)
            idx = np.repeat(np.arange(batch.num_rows), reps)
            offs = np.arange(len(idx)) - np.repeat(np.cumsum(reps) - reps, reps)
            rep = batch.take(pa.array(idx))
            cols = {c: (rep.column(c) if c in rep.column_names
                        else pa.nulls(rep.num_rows, other_types[c]))
                    for c in shuffle_cols}
            out = pa.table(cols)
            out = out.append_column(
                "_bucket", pa.array(b0[idx] + offs, pa.int64()))
            return out.append_column(
                "_side", pa.array(np.full(rep.num_rows, side_id, np.int8())))
        return fn

    both = left.map_batches(
        tag(r_types, l_start, l_end, 0),
        batch_format="pyarrow").union(right.map_batches(
            tag(l_types, r_start, r_end, 1),
            batch_format="pyarrow"))

    def match(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lt = group.filter(pa.array(side == 0))
        rt = group.filter(pa.array(side == 1))
        empty = {c: pa.array([], l_types[c]) for c in l_cols}
        empty.update({c: pa.array([], r_types[c]) for c in r_cols})
        if lt.num_rows == 0 or rt.num_rows == 0:
            return pa.table(empty)
        bucket = group.column("_bucket")[0].as_py()
        ls = lt.column(l_start).to_numpy(zero_copy_only=False)
        le = lt.column(l_end).to_numpy(zero_copy_only=False)
        rs = rt.column(r_start).to_numpy(zero_copy_only=False)
        re_ = rt.column(r_end).to_numpy(zero_copy_only=False)
        hit = ((ls[:, None] <= re_[None, :]) & (rs[None, :] <= le[:, None])
               & (np.maximum(ls[:, None] // epoch, rs[None, :] // epoch)
                  == bucket))
        li, ri = np.nonzero(hit)
        l_sel = lt.take(pa.array(li))
        r_sel = rt.take(pa.array(ri))
        cols = {c: l_sel.column(c) for c in l_cols}
        cols.update({c: r_sel.column(c) for c in r_cols})
        return pa.table(cols)

    keys = [by, "_bucket"] if by else ["_bucket"]
    from ..dsutil import bucketed_segments_map

    _empty = {c: pa.array([], l_types[c]) for c in l_cols}
    _empty.update({c: pa.array([], r_types[c]) for c in r_cols})
    return bucketed_segments_map(both, keys, match,
                                 empty_out=pa.table(_empty))


def scalar_band_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    value_col: str,
    id_col: str,
    eps_q: int = 1,
    quant: float = 1000.0,
    num_partitions: Optional[int] = None,
    self_pairs: bool = False,
) -> ray.data.Dataset:
    """Scalar similarity (band) join: pairs whose values differ by at most
    ``eps_q`` quantized units — |q(a) − q(b)| ≤ eps_q with
    ``q(v) = half-round(v · quant)`` int64.  SQL twin:
    ``ON abs(qa - qb) <= eps_q`` (integer-exact; no float BETWEEN
    boundary flicker).

    Scale shape — the banded-bucket trick (same family as the epoch-bucket
    interval join above): each left row lands in ONE bucket
    ``q // (eps_q + 1)``; each right row is exploded into its bucket and
    both neighbors.  |qa − qb| ≤ eps_q forces the buckets within 1 of each
    other, so one hash-shuffle equi-join on the bucket covers every
    candidate EXACTLY ONCE (the 3 exploded bucket values are distinct),
    then a vectorized |diff| filter keeps the true pairs.  Cost: the right
    side ships 3x — the honest price of a band predicate as an equi-join;
    no corpus-squared comparison anywhere.

    ``self_pairs=False`` (self-join convention) keeps only ``id_a < id_b``.
    Output: ``(id_a, id_b, q_a, q_b)``.
    """
    from .dedup import _join_partitions

    from ..dsutil import drop_empty_blocks

    width = eps_q + 1
    P = num_partitions or _join_partitions()

    def q_of(batch: pa.Table) -> np.ndarray:
        v = batch.column(value_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        return np.where(v >= 0, np.floor(v * quant + 0.5),
                        -np.floor(-v * quant + 0.5)).astype(np.int64)

    def tag_left(batch: pa.Table) -> pa.Table:
        q = q_of(batch)
        return pa.table({"id_a": batch.column(id_col).cast(pa.int64()),
                         "q_a": pa.array(q, pa.int64()),
                         "_bkt": pa.array(q // width, pa.int64())})

    def tag_right(batch: pa.Table) -> pa.Table:
        q = q_of(batch)
        b = q // width
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        rep_id = np.repeat(ids, 3)
        rep_q = np.repeat(q, 3)
        rep_b = (np.repeat(b, 3)
                 + np.tile(np.array([-1, 0, 1], np.int64), len(b)))
        return pa.table({"id_b": pa.array(rep_id, pa.int64()),
                         "q_b": pa.array(rep_q, pa.int64()),
                         "_bkt": pa.array(rep_b, pa.int64())})

    lt = left.select_columns([id_col, value_col]).map_batches(
        tag_left, batch_format="pyarrow")
    rt = right.select_columns([id_col, value_col]).map_batches(
        tag_right, batch_format="pyarrow")
    j = lt.join(rt, join_type="inner", num_partitions=P, on=("_bkt",))
    j = drop_empty_blocks(j, empty_schema=pa.schema(
        [("id_a", pa.int64()), ("q_a", pa.int64()), ("_bkt", pa.int64()),
         ("id_b", pa.int64()), ("q_b", pa.int64())]))

    def band(batch: pa.Table) -> pa.Table:
        qa = batch.column("q_a").to_numpy(zero_copy_only=False)
        qb = batch.column("q_b").to_numpy(zero_copy_only=False)
        ia = batch.column("id_a").to_numpy(zero_copy_only=False)
        ib = batch.column("id_b").to_numpy(zero_copy_only=False)
        keep = np.abs(qa - qb) <= eps_q
        if not self_pairs:
            keep &= ia < ib
        t = batch.filter(pa.array(keep))
        return t.select(["id_a", "id_b", "q_a", "q_b"])

    return j.map_batches(band, batch_format="pyarrow")
