"""Behavioral / event-sequence analytics — pivot, funnel, cohort retention.

The reference's analytics are single-table GROUP BYs (SURVEY.md §2.6,
reference ``app/services/storage.py:461-549``); production event pipelines
also need the sequence-aware operators (who did A *then* B, which signup
cohort came back on day N) and the wide pivot layout BI tools consume.
Each is built scale-first:

* ``pivot_counts`` — ``count(*) FILTER (WHERE col = v)`` per row key.  The
  count matrix is pre-aggregated map-side (one (row, col, n) row per pair per
  batch), globally combined with ONE keyed shuffle over the pair table, and
  only the *pivoted* result — |row keys| × |col values| cells — ever exists
  as a wide table.  The column domain is an explicit argument so every block
  carries an identical schema (Ray block unification needs fixed columns).
* ``funnel_counts`` — ordered-step completion (min ts of step k strictly
  after the user's step k-1 time).  One shuffle on the user key; the
  per-user interior is a K-step numpy scan over that user's (ts, type)
  arrays.  Partitioning assumption: one user's events fit in memory (same
  contract as ``windows.session_windows``; salt hot users upstream if not).
* ``cohort_retention`` — users grouped by first-active day, distinct-user
  counts at day offsets 0..H.  First-activity is a pre-combined keyed
  min; the cohort map joins back via the repo's standard size policy
  (broadcast ≤ ``broadcast_max`` users, hash-shuffle join above); distinct
  counting shuffles the already-deduped (cohort, offset, user) triple so no
  single reducer sees a hot cohort's raw rows.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Min, Sum

BROADCAST_USERS_MAX = 2_000_000


# ---------------------------------------------------------------------------
# pivot
# ---------------------------------------------------------------------------

def pivot_counts(
    ds: ray.data.Dataset,
    row_key: str,
    col_key: str,
    col_values: Sequence[str],
    prefix: str = "",
) -> ray.data.Dataset:
    """Wide pivot: one row per ``row_key``, one count column per value in
    ``col_values`` (SQL ``count(*) FILTER (WHERE col_key = v)``).

    ``col_values`` is the explicit column domain — values outside it are
    dropped, absent (row, col) cells are 0.  Keeping the domain an argument
    (not discovered from data) is what makes the operator streamable: every
    output block has the same schema regardless of which values its rows saw.
    """
    col_values = list(col_values)

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.select([row_key, col_key]).filter(
            pc.is_in(batch.column(col_key), value_set=pa.array(col_values)))
        batch = batch.append_column(
            "_n", pa.array(np.ones(batch.num_rows, dtype=np.int64)))
        return batch.group_by([row_key, col_key]).aggregate([("_n", "sum")]) \
                    .rename_columns([row_key, col_key, "_n"])

    pairs = ds.map_batches(partial, batch_format="pyarrow")

    names = [f"{prefix}{v}" for v in col_values]

    # the ONLY shuffle: partial (row, col, n) pairs group by row key; the
    # widen step sums duplicate cols from different blocks while pivoting —
    # per-PARTITION input is bounded by |col_values| × #blocks × keys/P;
    # all row keys of a partition widen in |col_values| masked reduceats
    def widen_partition(part: pa.Table) -> pa.Table:
        ktype = part.column(row_key).type
        m = part.num_rows
        if m == 0:
            return pa.table({row_key: pa.array([], ktype),
                             **{nm: pa.array([], pa.int64())
                                for nm in names}})
        part = part.take(pc.sort_indices(
            part, sort_keys=[(row_key, "ascending")]))
        from ..dsutil import run_starts

        ns = part.column("_n").to_numpy(zero_copy_only=False).astype(np.int64)
        starts = np.flatnonzero(run_starts(part.column(row_key)))
        out: dict = {row_key: part.column(row_key).take(
            pa.array(starts, pa.int64()))}
        col_arr = part.column(col_key)
        for v, name in zip(col_values, names):
            mask = pc.equal(col_arr, v).to_numpy(zero_copy_only=False)
            out[name] = pa.array(
                np.add.reduceat(np.where(mask, ns, 0), starts), pa.int64())
        return pa.table(out)

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(pairs, row_key, widen_partition)


# ---------------------------------------------------------------------------
# funnel
# ---------------------------------------------------------------------------

def funnel_counts(
    ds: ray.data.Dataset,
    user_col: str,
    ts_col: str,
    type_col: str,
    steps: Sequence[str],
) -> pa.Table:
    """How many users completed each ordered-step prefix of ``steps``.

    A user completes step k when an event of type ``steps[k]`` exists
    STRICTLY after their step k-1 completion time (min-ts semantics, the
    standard product-analytics funnel).  Returns the K-row table
    ``(step_idx, step, n_users)`` with n_users monotone non-increasing.

    Shape: irrelevant event types are dropped map-side (shuffle carries only
    funnel-step rows), ONE keyed shuffle on the user, a vectorized per-user
    scan emits (user, n_completed), and a tiny groupby + K-element driver
    suffix-sum finishes.  Per-user state is that user's funnel events only.
    """
    steps = list(steps)
    step_set = pa.array(steps)

    def prune(batch: pa.Table) -> pa.Table:
        batch = batch.select([user_col, ts_col, type_col])
        return batch.filter(pc.is_in(batch.column(type_col), value_set=step_set))

    def per_partition(part: pa.Table) -> pa.Table:
        """All users of the partition at once: K vectorized sweeps (one per
        funnel step), each a masked ``np.minimum.reduceat`` over the
        user-sorted rows — no per-user Python."""
        n = part.num_rows
        ktype = part.column(user_col).type
        if n == 0:
            return pa.table({user_col: pa.array([], ktype),
                             "n_completed": pa.array([], pa.int64())})
        part = part.take(pc.sort_indices(
            part, sort_keys=[(user_col, "ascending")]))
        ts = part.column(ts_col).cast(pa.int64()) \
                 .to_numpy(zero_copy_only=False)
        from ..dsutil import run_starts

        type_arr = part.column(type_col)
        new_key = run_starts(part.column(user_col))  # null-safe key change
        starts = np.flatnonzero(new_key)
        seg = np.cumsum(new_key) - 1
        n_users = len(starts)
        lo64, hi64 = np.iinfo(np.int64).min, np.iinfo(np.int64).max
        prev = np.full(n_users, lo64, np.int64)   # "-inf": first step passes
        done = np.zeros(n_users, np.int64)
        alive = np.ones(n_users, bool)
        for s in steps:
            m = pc.equal(type_arr, s).to_numpy(zero_copy_only=False)
            cand = np.where(m & (ts > prev[seg]) & alive[seg], ts, hi64)
            step_min = np.minimum.reduceat(cand, starts)
            alive &= step_min < hi64
            prev = np.where(alive, step_min, prev)
            done += alive
        return pa.table({
            user_col: part.column(user_col).take(pa.array(starts, pa.int64())),
            "n_completed": pa.array(done, pa.int64()),
        })

    def partial_hist(batch: pa.Table) -> pa.Table:
        # K+1 possible values: a per-batch histogram collapses the user table
        # before it ever leaves the workers (no second shuffle)
        return batch.group_by("n_completed").aggregate([(user_col, "count")]) \
                    .rename_columns(["n_completed", "n"])

    from ..dsutil import keyed_partition_map

    completed = (
        keyed_partition_map(ds.map_batches(prune, batch_format="pyarrow"),
                            user_col, per_partition)
        .map_batches(partial_hist, batch_format="pyarrow")
        .take_all()
    )
    by_done: dict = {}
    for r in completed:  # tiny: ≤ (K+1) × #blocks rows
        by_done[r["n_completed"]] = by_done.get(r["n_completed"], 0) + r["n"]
    # n_users reaching >= step i  ==  suffix sum of the completion histogram
    n_users = [sum(v for d, v in by_done.items() if d >= i)
               for i in range(1, len(steps) + 1)]
    return pa.table({
        "step_idx": pa.array(range(1, len(steps) + 1), pa.int64()),
        "step": pa.array(steps, pa.string()),
        "n_users": pa.array(n_users, pa.int64()),
    })


# ---------------------------------------------------------------------------
# cohort retention
# ---------------------------------------------------------------------------

def _day_i64(batch: pa.Table, ts_col: str) -> np.ndarray:
    """Timestamp column → int64 days since epoch (UTC calendar day)."""
    us = batch.column(ts_col).cast(pa.int64()).to_numpy(zero_copy_only=False)
    return us // 86_400_000_000


def cohort_retention(
    ds: ray.data.Dataset,
    user_col: str,
    ts_col: str,
    max_offset: int = 7,
    broadcast_max: int = BROADCAST_USERS_MAX,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """(cohort_day, day_offset, n_users): distinct users active ``day_offset``
    days after their first-ever active day, for offsets 0..``max_offset``.

    cohort_day is the ISO date string of the user's first activity.  The
    first-activity table is user-cardinality: it broadcasts when provably
    under ``broadcast_max`` rows and hash-shuffle joins otherwise (the repo's
    standard small-side policy, same as ``dedup.filter_by_ids``).
    """

    def user_day(batch: pa.Table) -> pa.Table:
        days = _day_i64(batch, ts_col)
        t = pa.table({user_col: batch.column(user_col),
                      "day": pa.array(days, pa.int64())})
        # map-side combine: one (user, min day) row per batch
        return t.group_by(user_col).aggregate([("day", "min")]) \
                .rename_columns([user_col, "day"])

    pairs = ds.select_columns([user_col, ts_col]).map_batches(
        user_day, batch_format="pyarrow")
    first = pairs.groupby(user_col).aggregate(Min("day", alias_name="cohort"))
    first = first.materialize()  # user-cardinality, feeds count + join
    n_users_total = first.count()

    if n_users_total <= broadcast_max:
        lookup = {r[user_col]: r["cohort"] for r in first.take_all()}
        ref = ray.put(lookup)

        def attach(batch: pa.Table) -> pa.Table:
            lk = ray.get(ref)
            days = _day_i64(batch, ts_col)
            users = batch.column(user_col).to_pylist()
            cohort = np.fromiter((lk[u] for u in users), dtype=np.int64,
                                 count=batch.num_rows)
            off = days - cohort
            t = pa.table({user_col: batch.column(user_col),
                          "cohort": pa.array(cohort, pa.int64()),
                          "day_offset": pa.array(off, pa.int64())})
            return t.filter(pc.and_(pc.greater_equal(t.column("day_offset"), 0),
                                    pc.less_equal(t.column("day_offset"),
                                                  max_offset)))

        tagged = ds.select_columns([user_col, ts_col]).map_batches(
            attach, batch_format="pyarrow")
    else:
        def with_day(batch: pa.Table) -> pa.Table:
            return pa.table({user_col: batch.column(user_col),
                             "day": pa.array(_day_i64(batch, ts_col),
                                             pa.int64())})

        ev = ds.select_columns([user_col, ts_col]).map_batches(
            with_day, batch_format="pyarrow")
        from .dedup import _join_partitions

        from ..dsutil import drop_empty_blocks

        # first-activity groupby can emit empty zero-column blocks the
        # hash join rejects (layout-dependent) — rebuild before joining
        joined = ev.join(drop_empty_blocks(first), join_type="inner",
                         num_partitions=num_partitions or _join_partitions(),
                         on=(user_col,))

        def offset(batch: pa.Table) -> pa.Table:
            off = (batch.column("day").to_numpy(zero_copy_only=False)
                   - batch.column("cohort").to_numpy(zero_copy_only=False))
            t = pa.table({user_col: batch.column(user_col),
                          "cohort": batch.column("cohort"),
                          "day_offset": pa.array(off, pa.int64())})
            return t.filter(pc.and_(pc.greater_equal(t.column("day_offset"), 0),
                                    pc.less_equal(t.column("day_offset"),
                                                  max_offset)))

        tagged = joined.map_batches(offset, batch_format="pyarrow")

    def dedup_triples(batch: pa.Table) -> pa.Table:
        return batch.group_by(["cohort", "day_offset", user_col]).aggregate([])

    def cell_hist(batch: pa.Table) -> pa.Table:
        # globally-unique triples → per-batch (cohort, offset) histogram;
        # cells are bounded (#days × offsets), so the final combine is a
        # driver-side sum over #cells × #blocks rows, not a third shuffle
        return batch.group_by(["cohort", "day_offset"]).aggregate(
            [(user_col, "count")]).rename_columns(
                ["cohort", "day_offset", "n"])

    partials = (
        tagged.map_batches(dedup_triples, batch_format="pyarrow")
        .groupby(["cohort", "day_offset", user_col]).aggregate(
            Count(alias_name="_c"))
        .map_batches(cell_hist, batch_format="pyarrow")
        .take_all()
    )
    cells: dict = {}
    for r in partials:
        k = (r["cohort"], r["day_offset"])
        cells[k] = cells.get(k, 0) + r["n"]
    days = np.array([k[0] for k in cells], dtype=np.int64)
    iso = pc.strftime(pa.array(days * 86_400_000_000).cast(pa.timestamp("us")),
                      format="%Y-%m-%d")
    out = pa.table({
        "cohort_day": iso,
        "day_offset": pa.array([k[1] for k in cells], pa.int64()),
        "n_users": pa.array([cells[k] for k in cells], pa.int64()),
    })
    return ray.data.from_arrow(out)


def unpivot(
    ds: ray.data.Dataset,
    id_cols: Sequence[str],
    value_cols: Sequence[str],
    var_name: str = "variable",
    value_name: str = "value",
    var_labels: Optional[Sequence[str]] = None,
) -> ray.data.Dataset:
    """Melt wide → long (SQL UNPIVOT): each input row emits one row per
    ``value_cols`` entry.  Pure vectorized ``map_batches`` replication —
    zero shuffle, streams at any scale.  ``var_labels`` renames the emitted
    variable values (defaults to the column names)."""
    id_cols = list(id_cols)
    value_cols = list(value_cols)
    labels = list(var_labels) if var_labels else value_cols
    if len(labels) != len(value_cols):
        raise ValueError("var_labels must match value_cols")

    def melt(batch: pa.Table) -> pa.Table:
        n = batch.num_rows
        m = len(value_cols)
        rep = pa.array(np.repeat(np.arange(n), m))
        out: dict = {c: batch.column(c).take(rep) for c in id_cols}
        out[var_name] = pa.array(np.tile(np.asarray(labels, dtype=object), n),
                                 pa.string())
        vals = pa.concat_arrays([
            batch.column(c).combine_chunks().cast(
                batch.column(value_cols[0]).type)
            for c in value_cols])
        # vals is column-major (c0 rows, c1 rows, ...); reorder row-major
        # (row0 c0, row0 c1, ...) with one vectorized take
        order = np.arange(n * m).reshape(m, n).T.reshape(-1)
        out[value_name] = vals.take(pa.array(order))
        return pa.table(out)

    return ds.map_batches(melt, batch_format="pyarrow")


def cooccurrence_pairs(
    ds: ray.data.Dataset,
    key_col: str,
    item_col: str,
    alias: str = "n",
) -> ray.data.Dataset:
    """Item co-occurrence — for every unordered item pair, in how many keys
    (users/sessions/baskets) both items appear.  The market-basket /
    related-content primitive.

    Scale shape: (1) map-side distinct (key, item) pairs + ONE composite
    shuffle dedups globally (the hot-key spread trick of
    ``rankagg.distinct_count_by``); (2) per-key pair explode inside
    ``map_groups`` — the group is a key's DISTINCT item set, bounded by
    item-vocabulary size, never by the key's event count, and pairs are
    built with vectorized triu indices; (3) a final keyed count over
    (item_a, item_b), input one row per (key, pair).  Assumes per-key
    distinct-item cardinality is bounded (true for type/category vocabs);
    for unbounded item spaces cap or bucket the per-key set first.
    """

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        batch = batch.select([key_col, item_col]).filter(
            pc.is_valid(batch.column(item_col)))
        return batch.group_by([key_col, item_col]).aggregate([])

    from ..dsutil import distinct_rows_by, keyed_partition_map

    uniq = distinct_rows_by(
        ds.map_batches(distinct_pairs, batch_format="pyarrow"),
        [key_col, item_col])

    from ..dsutil import count_by

    pairs = keyed_partition_map(
        uniq, key_col,
        lambda part: _explode_pairs_partition(part, key_col, item_col))
    return count_by(pairs, ["item_a", "item_b"], alias)


def _explode_pairs_partition(part: pa.Table, key_col: str,
                             item_col: str) -> pa.Table:
    """Within-key unordered item pairs for EVERY key of one partition in a
    single pass: sort by (key, item), then per-segment ``triu`` index
    blocks (cached by segment size — per-key sets are vocabulary-bounded)
    offset into the global row space.  No per-key table slicing."""
    itype = part.column(item_col).type
    if part.num_rows == 0:
        return pa.table({"item_a": pa.array([], itype),
                         "item_b": pa.array([], itype)})
    part = part.take(pc.sort_indices(
        part, sort_keys=[(key_col, "ascending"), (item_col, "ascending")]))
    from ..dsutil import run_starts

    n = part.num_rows
    new_key = run_starts(part.column(key_col))  # null-safe key change
    starts = np.flatnonzero(new_key)
    counts = np.diff(np.append(starts, n))
    cache: dict = {}
    ii_all, jj_all = [], []
    for s, c in zip(starts, counts):
        if c < 2:
            continue
        ij = cache.get(c)
        if ij is None:
            ij = np.triu_indices(int(c), k=1)
            cache[c] = ij
        ii_all.append(ij[0] + s)
        jj_all.append(ij[1] + s)
    if not ii_all:
        return pa.table({"item_a": pa.array([], itype),
                         "item_b": pa.array([], itype)})
    items = part.column(item_col)
    ii = pa.array(np.concatenate(ii_all), pa.int64())
    jj = pa.array(np.concatenate(jj_all), pa.int64())
    return pa.table({"item_a": items.take(ii), "item_b": items.take(jj)})


def transition_counts(
    ds: ray.data.Dataset,
    key_col: str,
    item_col: str,
    ts_col: str,
    order_tiebreak: Optional[str] = None,
    alias: str = "n",
) -> ray.data.Dataset:
    """Markov transition counts — for each (from_item, to_item), how many
    times an item immediately follows another within a key's time-ordered
    stream.  SQL ``LAG(item) OVER (PARTITION BY key ORDER BY ts[, tiebreak])``
    + GROUP BY (prev, item).

    Scale shape: ONE keyed shuffle; the per-key interior sorts the group,
    shifts the item array once, and emits its (from, to) PARTIAL counts —
    groups ship a bounded |vocab|^2 table out of the shuffle, never their
    row stream.  A final tiny keyed combine sums partials.  Same per-key
    memory contract as ``session_windows``.
    """

    def per_partition(part: pa.Table) -> pa.Table:
        sort_keys = [(key_col, "ascending"), (ts_col, "ascending")]
        if order_tiebreak:
            sort_keys.append((order_tiebreak, "ascending"))
        part = part.take(pc.sort_indices(part, sort_keys=sort_keys))
        items = part.column(item_col).combine_chunks()
        n = len(items)
        if n < 2:
            return pa.table({"from_item": pa.array([], items.type),
                             "to_item": pa.array([], items.type),
                             "_n": pa.array([], pa.int64())})
        # adjacency only counts within a key's run (key-change rows mask
        # out; null-safe — a null-key run is one key)
        from ..dsutil import adjacent_change

        same_key = pa.array(~adjacent_change(part.column(key_col)))
        t = pa.table({"from_item": items.slice(0, n - 1),
                      "to_item": items.slice(1, n)}).filter(same_key)
        if t.num_rows == 0:
            return pa.table({"from_item": pa.array([], items.type),
                             "to_item": pa.array([], items.type),
                             "_n": pa.array([], pa.int64())})
        g = t.group_by(["from_item", "to_item"]).aggregate([([], "count_all")])
        return g.rename_columns(["from_item", "to_item", "_n"]).set_column(
            2, "_n", g.column("count_all").cast(pa.int64()))

    from ..dsutil import keyed_partition_map

    from ..dsutil import sum_by

    partials = keyed_partition_map(ds, key_col, per_partition)
    return sum_by(partials, ["from_item", "to_item"], "_n", alias)


def path_ngrams(
    ds: ray.data.Dataset,
    key: str,
    ts_col: str,
    cat_col: str,
    n: int = 3,
    tiebreak: Optional[str] = None,
    top_k: int = 20,
) -> pa.Table:
    """Top-k length-``n`` event paths ("view>click>purchase") mined from
    per-key time-ordered sequences — the sequential-pattern sibling of
    :func:`transition_counts` (which is the n=2 special case).

    Pass a ``tiebreak`` column (e.g. the event id) whenever timestamps can
    tie: path extraction reads the ORDER, so unlike gap statistics it is
    NOT tie-order invariant.

    Shape: one keyed shuffle groups each key's events; inside a group the
    window join is vectorized (one sort + ``binary_join_element_wise``
    over ``n`` shifted slices); each group emits its DISTINCT-path counts,
    and ONE path-keyed combine of those bounded partials feeds the final
    (tiny) top-k sort.
    """
    from ray.data.aggregate import Sum

    def per_partition(part: pa.Table) -> pa.Table:
        sort_keys = [(key, "ascending"), (ts_col, "ascending")]
        if tiebreak:
            sort_keys.append((tiebreak, "ascending"))
        part = part.take(pc.sort_indices(part, sort_keys=sort_keys))
        m = part.num_rows - n + 1
        if m <= 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "_n": pa.array([], pa.int64())})
        cat = part.column(cat_col).combine_chunks()
        parts = [cat.slice(i, m) for i in range(n)]
        joined = pc.binary_join_element_wise(*parts, ">")
        # a window is a real path only when all n rows share the key
        # (null-safe segment ids: a null-key run is one key)
        from ..dsutil import run_starts

        seg = np.cumsum(run_starts(part.column(key))) - 1
        valid = seg[:m] == seg[n - 1:]
        g = (pa.table({"path": joined}).filter(pa.array(valid))
             .group_by("path").aggregate([([], "count_all")]))
        return pa.table({"path": g.column("path"),
                         "_n": g.column("count_all").cast(pa.int64())})

    from ..dsutil import keyed_partition_map

    cols = [key, ts_col, cat_col] + ([tiebreak] if tiebreak else [])
    counts = (keyed_partition_map(ds.select_columns(cols), key, per_partition)
              .groupby("path").aggregate(Sum("_n", alias_name="n_paths")))
    rows = counts.take_all()
    rows.sort(key=lambda r: (-r["n_paths"], r["path"]))
    rows = rows[:top_k]
    return pa.table({
        "path": pa.array([r["path"] for r in rows], pa.string()),
        "n_paths": pa.array([r["n_paths"] for r in rows], pa.int64()),
    })


def rfm_segments(
    ds: ray.data.Dataset,
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    k: int = 5,
) -> ray.data.Dataset:
    """RFM segmentation — per-user Recency / Frequency / Monetary quintile
    scores, the classic audience-curation layout (reference analog: the
    per-model GROUP BY stats of ``app/services/storage.py:461-479``, widened
    to per-entity rank tiers).

    Per user: ``recency_days`` (whole days between the user's last event and
    the corpus max timestamp), ``frequency`` (event count), ``m_cents``
    (half-rounded value cents — integer-exact sum).  Scores are SQL
    ``NTILE(k)`` tiers, 1 = best, with ``user_col`` as the tiebreak so every
    rank is total-ordered:

      r_score ~ ORDER BY last_ts DESC, user   (most recent first)
      f_score ~ ORDER BY frequency DESC, user
      m_score ~ ORDER BY m_cents DESC, user

    Shape: one keyed shuffle to user grain (map-side partial aggregates),
    then three :func:`ordering.ntile` waves over the user-cardinality
    table — each one Ray-native sort plus two metadata-weight task passes,
    nothing user-scale on the driver.
    """
    from ray.data.aggregate import Max

    from .ordering import ntile

    def partial(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.timestamp("us")).cast(pa.int64())
        v = batch.column(value_col).cast(pa.float64()).to_numpy(
            zero_copy_only=False)
        cents = np.where(v >= 0, np.floor(v * 100 + 0.5),
                         -np.floor(-v * 100 + 0.5)).astype(np.int64)
        return pa.table({user_col: batch.column(user_col),
                         "_ts_us": ts,
                         "_cents": pa.array(cents, pa.int64())})

    per_user = (ds.select_columns([user_col, ts_col, value_col])
                .map_batches(partial, batch_format="pyarrow")
                .groupby(user_col).aggregate(
                    Max("_ts_us", alias_name="last_ts_us"),
                    Count(alias_name="frequency"),
                    Sum("_cents", alias_name="m_cents"))).materialize()
    max_ts = per_user.max("last_ts_us")

    def derive(batch: pa.Table) -> pa.Table:
        last = batch.column("last_ts_us").to_numpy(zero_copy_only=False)
        days = (int(max_ts) - last) // 86_400_000_000
        return batch.append_column("recency_days",
                                   pa.array(days.astype(np.int64), pa.int64()))

    scored = per_user.map_batches(derive, batch_format="pyarrow")
    scored = ntile(scored, ["last_ts_us", user_col], k,
                   descending=[True, False], out_col="r_score")
    scored = ntile(scored, ["frequency", user_col], k,
                   descending=[True, False], out_col="f_score")
    scored = ntile(scored, ["m_cents", user_col], k,
                   descending=[True, False], out_col="m_score")

    def finish(batch: pa.Table) -> pa.Table:
        r = batch.column("r_score").to_numpy(zero_copy_only=False)
        f = batch.column("f_score").to_numpy(zero_copy_only=False)
        m = batch.column("m_score").to_numpy(zero_copy_only=False)
        return batch.append_column(
            "rfm", pa.array(r * 100 + f * 10 + m, pa.int64())
        ).drop_columns(["last_ts_us"])

    return scored.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# market-basket association rules (support + lift)
# ---------------------------------------------------------------------------

def association_lift(
    ds: ray.data.Dataset,
    key_col: str,
    item_col: str,
    min_support: int = 2,
    min_lift_pct: int = 0,
    broadcast_items_max: int = 4_000_000,
) -> ray.data.Dataset:
    """Market-basket association pairs with SUPPORT and LIFT — for every
    unordered item pair {a, b}: n_ab (baskets containing both), the item
    supports c_a / c_b, and lift = n_ab·N / (c_a·c_b) where N is the basket
    count.  The classic Apriori-at-depth-2 / related-items primitive, the
    step beyond raw co-occurrence counts (``cooccurrence_pairs``).

    Scale shape: ONE distinct-(basket, item) shuffle is the only pass over
    the raw stream and is shared by all three statistics — pair counts ride
    the bounded per-basket triu explode of ``cooccurrence_pairs``; item
    supports and the basket count are tiny keyed combines off the same
    deduped table.  The item-support map is vocabulary-bounded by contract
    (``broadcast_items_max`` guard) and broadcast via ``ray.put`` once —
    lift is then a zero-shuffle vectorized lookup over the pair stream
    (sorted-id ``np.searchsorted``, no Python dict in the hot path).

    Thresholds are integer-exact so an SQL oracle re-derives the kept set
    without float-boundary flicker: ``min_support`` on n_ab and
    ``min_lift_pct`` as ``100·n_ab·N >= min_lift_pct·c_a·c_b`` (int64; at
    ~10^9 baskets × 10^6-support pairs the product approaches the int64
    edge — pass ``min_lift_pct=0`` and filter on the emitted floats
    downstream there).
    """
    base = ds.select_columns([key_col, item_col])

    def distinct_pairs(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(item_col)))
        return batch.group_by([key_col, item_col]).aggregate([])

    from ..dsutil import distinct_rows_by

    uniq = distinct_rows_by(
        base.map_batches(distinct_pairs, batch_format="pyarrow"),
        [key_col, item_col]).materialize()

    from ..dsutil import count_by

    supports = count_by(uniq, item_col, "_s").take_all()
    if len(supports) > broadcast_items_max:
        raise ValueError(
            f"item vocabulary {len(supports)} exceeds broadcast cap "
            f"{broadcast_items_max}; bucket the item space first")
    sup_ids = np.array([r[item_col] for r in supports], np.int64)
    sup_n = np.array([r["_s"] for r in supports], np.int64)
    order = np.argsort(sup_ids)
    sup_ref = ray.put((sup_ids[order], sup_n[order]))
    n_baskets = int(distinct_rows_by(
        uniq.select_columns([key_col]), key_col).count())

    from ..dsutil import keyed_partition_map

    pairs = count_by(keyed_partition_map(
        uniq, key_col,
        lambda part: _explode_pairs_partition(part, key_col, item_col)),
        ["item_a", "item_b"], "n_ab")

    def with_lift(batch: pa.Table, sup=sup_ref, N=n_baskets,
                  msup=min_support, mlift=min_lift_pct) -> pa.Table:
        ids, cnts = ray.get(sup)
        a = batch.column("item_a").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        b = batch.column("item_b").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        nab = batch.column("n_ab").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ca = cnts[np.searchsorted(ids, a)]
        cb = cnts[np.searchsorted(ids, b)]
        keep = nab >= msup
        if mlift:
            keep &= 100 * nab * N >= mlift * ca * cb
        lift = nab[keep].astype(np.float64) * N / (
            ca[keep].astype(np.float64) * cb[keep])
        return pa.table({
            "item_a": pa.array(a[keep], pa.int64()),
            "item_b": pa.array(b[keep], pa.int64()),
            "n_ab": pa.array(nab[keep], pa.int64()),
            "c_a": pa.array(ca[keep], pa.int64()),
            "c_b": pa.array(cb[keep], pa.int64()),
            "lift": pa.array(lift, pa.float64()),
        })

    return pairs.map_batches(with_lift, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# multi-touch attribution
# ---------------------------------------------------------------------------

def attribution_linear(
    ds: ray.data.Dataset,
    user_col: str,
    ts_col: str,
    type_col: str,
    value_col: str,
    conversion_type: str,
    touch_types: Sequence[str],
    window_us: int,
    scale: int = 1_000_000,
) -> pa.Table:
    """Linear (equal-weight) multi-touch attribution — each conversion's
    value is split equally across the converting user's touch events in the
    ``window_us`` lookback (touch ts in ``(conv_ts - window, conv_ts]``);
    conversions with no in-window touch credit the ``'direct'`` channel.
    Credits are fixed-point micro-units rounded PER (conversion, channel) —
    ``floor(value·n_ch/k·scale + 0.5)`` — so channel totals are exact int64
    sums an SQL oracle reproduces without float-reduction-order drift.

    Scale shape: ONE user-keyed shuffle; the per-user interior sorts the
    group once and answers every conversion's per-channel in-window touch
    count with two vectorized ``np.searchsorted`` probes per channel (no
    per-conversion scan), emitting only channel-count-bounded partial sums.
    Same one-user-fits-in-memory contract as ``funnel_counts`` /
    ``session_windows``; salt hot users upstream if violated.  The final
    combine is channel-bounded (tiny).
    """
    from ray.data.aggregate import Sum as _Sum

    touch_list = list(touch_types)
    channels = touch_list + ["direct"]
    cols = [user_col, ts_col, type_col, value_col]

    def per_partition(part: pa.Table) -> pa.Table:
        """All users of one partition: sort by (user, ts) once, then loop
        user SEGMENTS with pure numpy-slice searchsorted probes — no
        per-user table slicing or Ray dispatch."""
        if part.num_rows == 0:
            return pa.table({"channel": pa.array([], pa.string()),
                             "_credit": pa.array([], pa.int64())})
        part = part.take(pc.sort_indices(part, sort_keys=[
            (user_col, "ascending"), (ts_col, "ascending")]))
        ts = part.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        typ = part.column(type_col).to_numpy(zero_copy_only=False)
        from ..dsutil import run_starts

        val = part.column(value_col).to_numpy(zero_copy_only=False)
        nrows = len(ts)
        starts = np.flatnonzero(run_starts(part.column(user_col)))
        bounds = np.append(starts, nrows)
        credit_tot = np.zeros(len(touch_list) + 1, np.int64)  # + direct
        for u in range(len(starts)):
            a, b = bounds[u], bounds[u + 1]
            uts, utyp, uval = ts[a:b], typ[a:b], val[a:b]
            is_conv = utyp == conversion_type
            cts, cval = uts[is_conv], uval[is_conv]
            if not len(cts):
                continue
            per_touch = []
            for t in touch_list:
                tts = uts[utyp == t]
                lo = np.searchsorted(tts, cts - window_us, side="right")
                hi = np.searchsorted(tts, cts, side="right")
                per_touch.append(hi - lo)
            counts = np.stack(per_touch) if per_touch else np.zeros(
                (0, len(cts)), np.int64)
            k = counts.sum(axis=0)
            covered = k > 0
            for i in range(len(touch_list)):
                n_ch = counts[i][covered]
                credit = np.floor(
                    (cval[covered] * n_ch) / k[covered] * scale + 0.5
                ).astype(np.int64)
                credit_tot[i] += int(credit.sum())
            direct = np.floor(cval[~covered] * scale + 0.5).astype(np.int64)
            credit_tot[-1] += int(direct.sum())
        return pa.table({
            "channel": pa.array(touch_list + ["direct"], pa.string()),
            "_credit": pa.array(credit_tot, pa.int64()),
        })

    from ..dsutil import keyed_partition_map

    partials = keyed_partition_map(ds.select_columns(cols), user_col,
                                   per_partition)
    agg = {r["channel"]: r["credit_i"] for r in partials.groupby(
        "channel").aggregate(_Sum("_credit", alias_name="credit_i"))
        .take_all()}
    got = [agg.get(c, 0) for c in channels]
    return pa.table({
        "channel": pa.array(channels, pa.string()),
        "credit_i": pa.array(got, pa.int64()),
    })
