"""Window aggregations over event-time columns (batch analog of streaming).

Ray Data has no event-time windows/watermarks; these operators implement the
batch equivalents (ray_guide.md 'Streaming-shaped workloads'):

  * tumbling: window_start = floor(ts/width)*width — a vectorized derived
    column + groupby (A3's daily trend is the 1-day special case).
  * sliding: width = m*slide; each row belongs to m windows — vectorized
    row replication then the same groupby.
  * session: per-key gap-splitting over the ts-sorted group
    (groupby(key).map_groups; ordering restored inside the group, never
    assumed from block order).

All timestamps are treated as UTC-naive microseconds (Arrow and DuckDB
agree on epoch_us), so results are oracle-comparable exactly.

Caveat: window starts use integer division, which truncates toward zero in
Arrow but floors in SQL ``//`` — identical for post-1970 timestamps; for
pre-epoch (negative) event times, shift to a non-negative base first.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from ..dsutil import adjacent_change, run_starts


def _ts_us(batch: pa.Table, ts_col: str) -> pa.Array:
    col = batch.column(ts_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    return col.cast(pa.timestamp("us")).cast(pa.int64())


def tumbling_window(
    ds: ray.data.Dataset,
    ts_col: str,
    width_us: int,
    value_col: str,
    key_col: Optional[str] = None,
) -> ray.data.Dataset:
    """Count + sum per [window_start, window_start+width) (optionally per key)."""

    def add_window(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch, ts_col)
        start = pc.multiply(pc.divide(us, width_us), width_us)  # int floor-div
        cols = {"window_start": start, value_col: batch.column(value_col)}
        if key_col:
            cols[key_col] = batch.column(key_col)
        return pa.table(cols)

    keys = ["window_start"] if key_col is None else [key_col, "window_start"]
    return (
        ds.map_batches(add_window, batch_format="pyarrow")
        .groupby(keys)
        .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="total"))
    )


def sliding_window(
    ds: ray.data.Dataset,
    ts_col: str,
    width_us: int,
    slide_us: int,
    value_col: str,
) -> ray.data.Dataset:
    """Overlapping windows: width must be a multiple of slide; each row lands
    in ``width/slide`` windows (vectorized replication, then groupby)."""
    assert width_us % slide_us == 0, "width must be a multiple of slide"
    m = width_us // slide_us

    def explode(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch, ts_col).to_numpy()
        vals = batch.column(value_col).to_numpy(zero_copy_only=False)
        base = (us // slide_us) * slide_us
        # windows containing ts: start in {base - i*slide | i in 0..m-1}
        starts = (base[:, None] - np.arange(m, dtype=np.int64)[None, :] * slide_us).ravel()
        rep_vals = np.repeat(vals, m)
        return pa.table({"window_start": pa.array(starts, pa.int64()),
                         value_col: pa.array(rep_vals)})

    return (
        ds.map_batches(explode, batch_format="pyarrow")
        .groupby("window_start")
        .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="total"))
    )


def session_windows(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    gap_us: int,
    tiebreak_col: Optional[str] = None,
) -> ray.data.Dataset:
    """Per-key sessions: a new session starts when the gap to the previous
    event exceeds ``gap_us``.  Returns (key, session_id, n, start_us, end_us);
    session_id is 0-based per key in event-time order.

    Partitioning: ONE ``hash(key) % P`` exchange (``dsutil.
    keyed_partition_map``) with one vectorized call per PARTITION — a
    partition (≈ rows / P) must fit one worker, the same worst case as
    Ray's own groupby shuffle.  For hot keys whose stream dwarfs a
    partition, salt the key with a coarse time epoch (e.g. day) first and
    merge sessions across epoch boundaries in a second, much smaller pass
    (:func:`session_windows_salted`).
    """

    def sessionize(part: pa.Table) -> pa.Table:
        n = part.num_rows
        ktype = part.column(key_col).type
        if n == 0:
            z = np.zeros(0, dtype=np.int64)
            return pa.table({
                key_col: pa.array([], ktype),
                "session_id": pa.array(z, pa.int64()),
                "n": pa.array(z, pa.int64()),
                "start_us": pa.array(z, pa.int64()),
                "end_us": pa.array(z, pa.int64()),
            })
        # all keys of the partition in one pass: sort by
        # (key, ts[, tiebreak]), session breaks = key change OR gap > gap_us
        sort_keys = [(key_col, "ascending"), (ts_col, "ascending")]
        if tiebreak_col is not None:
            sort_keys.append((tiebreak_col, "ascending"))
        part = part.take(pc.sort_indices(part, sort_keys=sort_keys))
        us = _ts_us(part, ts_col).to_numpy()
        new_key = run_starts(part.column(key_col))  # null-safe key change
        brk = new_key.copy()
        brk[1:] |= np.diff(us) > gap_us
        first = np.flatnonzero(brk)                 # first row of each session
        last = np.append(first[1:] - 1, n - 1)      # last row of each session
        counts = np.diff(np.append(first, n))
        # session_id restarts at 0 per key: island ordinal minus the ordinal
        # of the key's first island (islands of one key are contiguous)
        iid = np.arange(len(first), dtype=np.int64)
        base = np.maximum.accumulate(np.where(new_key[first], iid, 0))
        key_arr = part.column(key_col).take(pa.array(first, pa.int64()))
        return pa.table({
            key_col: key_arr,
            "session_id": pa.array(iid - base, pa.int64()),
            "n": pa.array(counts, pa.int64()),
            "start_us": pa.array(us[first], pa.int64()),
            "end_us": pa.array(us[last], pa.int64()),
        })

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(ds, key_col, sessionize)


def session_windows_salted(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    gap_us: int,
    epoch_us: int,
    tiebreak_col: Optional[str] = None,
) -> ray.data.Dataset:
    """Hot-key-safe sessions: identical output to :func:`session_windows`,
    but no single worker ever holds more than one (key, epoch) slice.

    Phase 1 salts the key with a coarse time epoch (``ts // epoch_us``) and
    sessionizes within each (key, epoch) group.  An epoch boundary can split
    a true session in two, so phase 2 re-groups by key over the SESSION rows
    (events-per-epoch fewer, sessions far fewer still) and merges adjacent
    sessions whose inter-gap is <= ``gap_us`` — exactly reconstructing the
    single-pass result, then renumbering session_id in event-time order.
    Pick ``epoch_us >> gap_us`` (e.g. a day for a 10-minute gap) so phase 2
    stays tiny.
    """
    assert epoch_us > gap_us, "epoch must exceed the session gap"

    def add_epoch(batch: pa.Table) -> pa.Table:
        us = _ts_us(batch, ts_col)
        epoch = pc.divide(us, epoch_us)
        cols = {key_col: batch.column(key_col), "__us": us, "__epoch": epoch}
        if tiebreak_col is not None:
            cols[tiebreak_col] = batch.column(tiebreak_col)
        return pa.table(cols)

    def sessionize_local(part: pa.Table) -> pa.Table:
        n = part.num_rows
        ktype = part.column(key_col).type
        if n == 0:
            z = np.zeros(0, dtype=np.int64)
            return pa.table({key_col: pa.array([], ktype),
                             "start_us": pa.array(z), "end_us": pa.array(z),
                             "n": pa.array(z)})
        sort_keys = [(key_col, "ascending"), ("__epoch", "ascending"),
                     ("__us", "ascending")]
        if tiebreak_col is not None:
            sort_keys.append((tiebreak_col, "ascending"))
        part = part.take(pc.sort_indices(part, sort_keys=sort_keys))
        us = part.column("__us").to_numpy()
        ep = part.column("__epoch").to_numpy(zero_copy_only=False)
        brk = run_starts(part.column(key_col))  # null-safe key change
        brk[1:] |= (ep[1:] != ep[:-1]) | (np.diff(us) > gap_us)
        first = np.flatnonzero(brk)
        last = np.append(first[1:] - 1, n - 1)
        counts = np.diff(np.append(first, n))
        return pa.table({
            key_col: part.column(key_col).take(pa.array(first, pa.int64())),
            "start_us": pa.array(us[first], pa.int64()),
            "end_us": pa.array(us[last], pa.int64()),
            "n": pa.array(counts, pa.int64()),
        })

    def merge_sessions(part: pa.Table) -> pa.Table:
        n = part.num_rows
        ktype = part.column(key_col).type
        if n == 0:
            z = np.zeros(0, dtype=np.int64)
            return pa.table({key_col: pa.array([], ktype),
                             "session_id": pa.array(z), "n": pa.array(z),
                             "start_us": pa.array(z), "end_us": pa.array(z)})
        part = part.take(pc.sort_indices(
            part, sort_keys=[(key_col, "ascending"),
                             ("start_us", "ascending"),
                             ("end_us", "ascending")]))
        starts = part.column("start_us").to_numpy()
        ends = part.column("end_us").to_numpy()
        ns = part.column("n").to_numpy()
        new_key = run_starts(part.column(key_col))  # null-safe key change
        # adjacent local sessions merge when the inter-gap closes; local
        # sessions never overlap (they come from disjoint epoch slices)
        brk = new_key.copy()
        brk[1:] |= (starts[1:] - ends[:-1]) > gap_us
        first = np.flatnonzero(brk)
        last = np.append(first[1:] - 1, n - 1)
        counts = np.add.reduceat(ns, first)
        iid = np.arange(len(first), dtype=np.int64)
        base = np.maximum.accumulate(np.where(new_key[first], iid, 0))
        return pa.table({
            key_col: part.column(key_col).take(pa.array(first, pa.int64())),
            "session_id": pa.array(iid - base, pa.int64()),
            "n": pa.array(counts, pa.int64()),
            "start_us": pa.array(starts[first], pa.int64()),
            "end_us": pa.array(ends[last], pa.int64()),
        })

    from ..dsutil import keyed_partition_map

    local = keyed_partition_map(
        ds.map_batches(add_epoch, batch_format="pyarrow"),
        [key_col, "__epoch"], sessionize_local)
    return keyed_partition_map(local, key_col, merge_sessions)


def rolling_by_key(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    window: int,
    order_tiebreak: Optional[str] = None,
    out_prefix: str = "roll_",
) -> ray.data.Dataset:
    """Per-key rolling aggregate over the last ``window`` rows in time order —
    SQL ``AVG/SUM(value) OVER (PARTITION BY key ORDER BY ts[, tiebreak]
    ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)``.

    ONE keyed shuffle; the per-key interior re-sorts the group by
    (ts, tiebreak) and computes the sliding sum as ``window`` shifted adds —
    left-to-right accumulation identical to the SQL definition, no cumsum
    cancellation error.  Emits ``roll_sum`` / ``roll_avg`` / ``roll_n``.
    Partitioning assumption: one key's rows fit in worker memory (the same
    contract as ``session_windows``; salt hot keys upstream if violated).
    """

    def per_partition(part: pa.Table) -> pa.Table:
        sort_keys = [(key_col, "ascending"), (ts_col, "ascending")]
        if order_tiebreak:
            sort_keys.append((order_tiebreak, "ascending"))
        part = part.take(pc.sort_indices(part, sort_keys=sort_keys))
        v = part.column(value_col).to_numpy(zero_copy_only=False) \
                .astype(np.float64)
        n = len(v)
        seg = np.zeros(n, dtype=np.int64)
        if n > 1:
            seg[1:] = np.cumsum(adjacent_change(part.column(key_col)))
        s = np.zeros(n, dtype=np.float64)
        cnt = np.zeros(n, dtype=np.int64)
        for lag in range(window - 1, 0, -1):  # oldest term first
            ok = seg[lag:] == seg[:-lag]      # term must be the same key's
            s[lag:] += np.where(ok, v[:-lag], 0.0)
            cnt[lag:] += ok
        s += v
        cnt += 1
        out = part.append_column(f"{out_prefix}sum", pa.array(s, pa.float64()))
        out = out.append_column(f"{out_prefix}n", pa.array(cnt, pa.int64()))
        return out.append_column(f"{out_prefix}avg",
                                 pa.array(s / cnt, pa.float64()))

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(ds, key_col, per_partition)


def expanding_by_key(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    order_tiebreak: Optional[str] = None,
    out_prefix: str = "cum_",
) -> ray.data.Dataset:
    """Per-key expanding (running-total) window — SQL ``SUM(value) OVER
    (PARTITION BY key ORDER BY ts[, tiebreak] ROWS UNBOUNDED PRECEDING)``
    plus the matching running count.

    ONE keyed shuffle; interior is a sort + one ``np.cumsum``.  Integer
    values accumulate in int64 (exact, matches SQL bit-for-bit); floats in
    float64 left-to-right (same order as the SQL frame definition — for a
    hash-stable result against a SQL oracle feed an integer column, e.g.
    cents).  Same per-key memory contract as ``session_windows``.
    """

    def per_partition(part: pa.Table) -> pa.Table:
        sort_keys = [(key_col, "ascending"), (ts_col, "ascending")]
        if order_tiebreak:
            sort_keys.append((order_tiebreak, "ascending"))
        part = part.take(pc.sort_indices(part, sort_keys=sort_keys))
        v = part.column(value_col).to_numpy(zero_copy_only=False)
        n = part.num_rows
        new_key = run_starts(part.column(key_col))  # null-safe key change
        starts = np.flatnonzero(new_key)
        seg = np.cumsum(new_key) - 1 if n else np.zeros(0, np.int64)
        if np.issubdtype(v.dtype, np.integer):
            # segmented cumsum via base subtraction — exact in int64
            total = np.cumsum(v.astype(np.int64))
            base = (total[starts] - v[starts]) if n else total
            cum_arr = pa.array(total - base[seg], pa.int64())
        else:
            # float: keep strict left-to-right per-key order (the documented
            # contract) — cumsum per segment slice, not the subtraction trick
            vf = v.astype(np.float64)
            cum = np.empty(n, dtype=np.float64)
            bounds = np.append(starts, n)
            for i in range(len(starts)):
                lo, hi = bounds[i], bounds[i + 1]
                cum[lo:hi] = np.cumsum(vf[lo:hi])
            cum_arr = pa.array(cum, pa.float64())
        # running count restarts per key: position minus key-start position
        pos = np.arange(n, dtype=np.int64)
        run_n = pos - (starts[seg] if n else pos) + 1
        out = part.append_column(f"{out_prefix}sum", cum_arr)
        return out.append_column(f"{out_prefix}n", pa.array(run_n, pa.int64()))

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(ds, key_col, per_partition)


def lag_by_key(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    offset: int = 1,
    order_tiebreak: Optional[str] = None,
    out_col: str = "lag_value",
) -> ray.data.Dataset:
    """Per-key LAG/LEAD — SQL ``LAG(value, offset) OVER (PARTITION BY key
    ORDER BY ts[, tiebreak])`` (negative ``offset`` = LEAD).  One keyed
    shuffle; the interior is a sort + vectorized shift.  Same per-key
    memory contract as ``session_windows``."""

    def per_partition(part: pa.Table) -> pa.Table:
        sort_keys = [(key_col, "ascending"), (ts_col, "ascending")]
        if order_tiebreak:
            sort_keys.append((order_tiebreak, "ascending"))
        part = part.take(pc.sort_indices(part, sort_keys=sort_keys))
        n = part.num_rows
        idx = np.arange(n, dtype=np.int64) - offset
        invalid = (idx < 0) | (idx >= n)
        # shifting across a key boundary is out-of-partition in SQL -> null
        # (null-safe segment ids: a null-key run is ONE partition)
        if n:
            seg = np.cumsum(run_starts(part.column(key_col))) - 1
            src = np.where(invalid, 0, idx)
            invalid |= seg[src] != seg
        take_idx = pa.array(np.where(invalid, 0, idx), pa.int64(),
                            mask=invalid)  # null index -> null output
        shifted = part.column(value_col).take(take_idx)
        return part.append_column(out_col, shifted)

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(ds, key_col, per_partition)


def debounce_by_key(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    signal_col: str,
    gap: int,
    order_tiebreak: Optional[str] = None,
) -> ray.data.Dataset:
    """Drop a row when it repeats the key's previous ``signal_col`` value
    within ``gap`` microseconds — the sensor / clickstream de-bounce (log
    de-duplication that exact dedup can't express because the *timestamps*
    differ).  Keeps the first row of every burst.

    SQL: ``WHERE NOT (LAG(signal) = signal AND ts - LAG(ts) <= gap)`` over
    ``PARTITION BY key ORDER BY ts[, tiebreak]``.  ONE keyed shuffle; the
    interior is a sort + two vectorized shifted compares.  Note the SQL
    semantics are *non-cascading*: each row compares against its raw
    predecessor, so of three rapid repeats the 1st and 3rd survive (row 3's
    predecessor is row 2, dropped or not).  ONE ``hash(key) % P`` exchange
    with one vectorized call per partition (``dsutil.keyed_partition_map``);
    per-partition memory contract, same as ``session_windows``.
    """

    def per_partition(part: pa.Table) -> pa.Table:
        sort_keys = [(key_col, "ascending"), (ts_col, "ascending")]
        if order_tiebreak:
            sort_keys.append((order_tiebreak, "ascending"))
        part = part.take(pc.sort_indices(part, sort_keys=sort_keys))
        n = part.num_rows
        if n <= 1:
            return part
        sig = part.column(signal_col).combine_chunks()
        ts = part.column(ts_col).combine_chunks().cast(pa.int64())
        same = pc.equal(sig.slice(1, n - 1), sig.slice(0, n - 1))
        close = pc.less_equal(
            pc.subtract(ts.slice(1, n - 1), ts.slice(0, n - 1)), gap)
        drop = pc.and_kleene(same, close)  # null signal/ts -> null -> keep
        drop_np = np.asarray(
            drop.fill_null(False).to_numpy(zero_copy_only=False))
        # a row never debounces against the previous KEY's last row
        # (null-safe: a null-key run is one key)
        same_key = ~adjacent_change(part.column(key_col))
        keep = np.ones(n, dtype=bool)
        keep[1:] = ~(drop_np & same_key)
        return part.filter(pa.array(keep))

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(ds, key_col, per_partition)


def range_rolling_by_key(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    range_us: int,
    out_prefix: str = "rr_",
) -> ray.data.Dataset:
    """Per-key TIME-RANGE rolling aggregate — SQL ``SUM(value) OVER
    (PARTITION BY key ORDER BY ts RANGE BETWEEN range_us PRECEDING AND
    CURRENT ROW)`` plus the matching frame row count.

    Unlike ``rolling_by_key`` (a ROWS frame: last *k* rows), the RANGE frame
    holds every row whose timestamp lies in ``[cur_ts - range_us, cur_ts]``
    — including *peers* (later rows sharing the current timestamp), per the
    SQL standard's RANGE/CURRENT ROW semantics.  Frames are therefore
    identical for tied timestamps, so no tiebreak column is needed and the
    result is deterministic regardless of within-tie order.

    ONE keyed shuffle; the per-key interior is a sort + two binary-search
    sweeps (``searchsorted``) against one prefix-sum array — O(n log n) per
    key, no per-row Python.  Integer values accumulate in int64 (exact,
    bit-matches a SQL oracle); the same per-key memory contract as
    ``session_windows`` applies (salt hot keys upstream if violated).
    """

    def per_partition(part: pa.Table) -> pa.Table:
        part = part.take(pc.sort_indices(
            part, sort_keys=[(key_col, "ascending"), (ts_col, "ascending")]))
        ts = part.column(ts_col).cast(pa.int64()) \
                 .to_numpy(zero_copy_only=False)
        v = part.column(value_col).to_numpy(zero_copy_only=False)
        n = len(v)
        integral = np.issubdtype(v.dtype, np.integer)
        acc = v.astype(np.int64 if integral else np.float64)
        csum = np.concatenate(([0], np.cumsum(acc)))
        new_key = run_starts(part.column(key_col))  # null-safe key change
        starts = np.flatnonzero(new_key)
        bounds = np.append(starts, n)
        lo = np.empty(n, dtype=np.int64)
        hi = np.empty(n, dtype=np.int64)
        # searchsorted per key segment (ts is sorted only within a key);
        # pure numpy slice ops — no per-row Python, ~µs per key
        for i in range(len(starts)):
            a, b = bounds[i], bounds[i + 1]
            seg_ts = ts[a:b]
            lo[a:b] = a + np.searchsorted(seg_ts, seg_ts - range_us,
                                          side="left")
            hi[a:b] = a + np.searchsorted(seg_ts, seg_ts, side="right")
        s = csum[hi] - csum[lo]
        out = part.append_column(
            f"{out_prefix}sum",
            pa.array(s, pa.int64() if integral else pa.float64()))
        return out.append_column(
            f"{out_prefix}n", pa.array(hi - lo, pa.int64()))

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(ds, key_col, per_partition)


def rolling_distinct_days(
    ds: ray.data.Dataset,
    ts_col: str,
    id_col: str,
    window_days: int = 7,
    out_col: str = "n_distinct",
) -> ray.data.Dataset:
    """Trailing-window COUNT(DISTINCT id) per day — the DAU/WAU/MAU
    primitive: for every day present in the data, the number of distinct
    ids seen in the ``window_days`` days ending on it.  SQL has no
    ``COUNT(DISTINCT) OVER RANGE``; the relational form is a day×event
    band self-join, which explodes at corpus scale.

    Scale shape: per-batch DISTINCT (day, id) pre-reduction, map-side
    ×``window_days`` bounded explode of those pairs to the target days they
    serve (targets filtered against the broadcast day set — day count is
    calendar-bounded, never row-scaled), ONE keyed shuffle to dedup
    (target, id) pairs with a second tiny keyed count.  Shuffle volume is
    O(distinct pairs × window), independent of raw event count.
    """
    day_us = 86_400_000_000

    def to_pairs(batch: pa.Table) -> pa.Table:
        ts = pc.cast(batch.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        day = ts // day_us
        pairs = np.unique(np.stack([day, ids.astype(np.int64)], axis=1),
                          axis=0)
        return pa.table({"_day": pa.array(pairs[:, 0], pa.int64()),
                         "_id": pa.array(pairs[:, 1], pa.int64())})

    # consumed twice (day-set pass + explode) — materialize the pre-reduced
    # pair stream so the diamond doesn't re-execute the upstream read
    pairs = ds.select_columns([ts_col, id_col]).map_batches(
        to_pairs, batch_format="pyarrow").materialize()

    # calendar-bounded day set: per-block unique partials, driver union
    # (#blocks x #days ints — never row-scaled), broadcast once
    import ray as _ray

    def day_partial(batch: pa.Table) -> pa.Table:
        d = np.unique(batch.column("_day").to_numpy(zero_copy_only=False))
        return pa.table({"d": pa.array([d], pa.list_(pa.int64()))})

    dayset: set = set()
    for r in pairs.map_batches(day_partial, batch_format="pyarrow").take_all():
        dayset.update(int(x) for x in r["d"])
    days_ref = _ray.put(np.array(sorted(dayset), np.int64))

    def explode(batch: pa.Table) -> pa.Table:
        dayset = _ray.get(days_ref)
        d = batch.column("_day").to_numpy(zero_copy_only=False)
        i = batch.column("_id").to_numpy(zero_copy_only=False)
        n = len(d)
        reps = np.repeat(np.arange(n), window_days)
        tgt = d[reps] + np.tile(np.arange(window_days, dtype=np.int64), n)
        keep = np.isin(tgt, dayset)
        return pa.table({"_tgt": pa.array(tgt[keep], pa.int64()),
                         "_id": pa.array(i[reps][keep], pa.int64())})

    exploded = pairs.map_batches(explode, batch_format="pyarrow")
    # dedup (target, id) then count per target: the dedup shuffle also
    # colocates each target's pairs, so the count is a per-group size
    distinct = exploded.groupby(["_tgt", "_id"]).count()

    def count_rows(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["_tgt"]).aggregate([([], "count_all")])
        return g.rename_columns(["_tgt", "_c"])

    agg = (distinct.map_batches(count_rows, batch_format="pyarrow")
           .groupby("_tgt").aggregate(Sum("_c", alias_name=out_col)))

    def finish(batch: pa.Table) -> pa.Table:
        return pa.table({"day": batch.column("_tgt"),
                         out_col: pc.cast(batch.column(out_col), pa.int64())})

    return agg.map_batches(finish, batch_format="pyarrow")
