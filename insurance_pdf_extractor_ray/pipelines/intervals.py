"""Per-key interval algebra: merge overlapping/touching intervals.

The gaps-and-islands primitive — collapse a set of (key, start, end) rows
into maximal disjoint covering intervals per key.  Reference analog: the
extraction service coalesces retry attempts of one document into a single
logical processing window before billing (``app/services/storage.py``
groups rows per document regardless of attempt count); at corpus scale the
same shape answers "merged outage windows", "user active periods",
"coalesced span coverage".

Scale shape: ONE ``hash(key) % P`` exchange (``dsutil.keyed_partition_map``
— one vectorized call per PARTITION, not per key); the interior is a
lexsort + a segmented prefix-max scan + ``reduceat`` folds — no per-row or
per-key Python.  Memory contract is per-partition (≈ rows / P), the same
worst case as Ray's own groupby shuffle.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data


def merge_intervals_by_key(
    ds: ray.data.Dataset,
    key_col: str,
    start_col: str,
    end_col: str,
    min_gap: int = 0,
    count_alias: str = "n_rows",
) -> ray.data.Dataset:
    """Merge per-key intervals whose gap to the running coverage is
    <= ``min_gap`` (0 = overlap-or-touch merges, the SQL-standard islands
    definition).  Emits one row per merged island: key, island start
    (min start), island end (max end), and the number of source rows.

    Deterministic regardless of input order: islands are a pure function
    of the interval *set* (sort inside the group breaks ties by end).
    Start/end are int64 (cast timestamps to epoch-us upstream).
    """

    def per_partition(part: pa.Table) -> pa.Table:
        """All keys of one hash partition in ONE vectorized pass: lexsort by
        (key, start, end), then island detection with a key-boundary guard.
        The within-key running coverage end is a SEGMENTED prefix max
        (Hillis–Steele doubling scan — log2(n) vectorized passes, exact in
        int64), replacing the per-group ``np.maximum.accumulate``."""
        n = part.num_rows
        if n == 0:
            ktype = part.column(key_col).type
            return pa.table({
                key_col: pa.array([], ktype),
                start_col: pa.array([], pa.int64()),
                end_col: pa.array([], pa.int64()),
                count_alias: pa.array([], pa.int64()),
            })
        part = part.take(pc.sort_indices(
            part, sort_keys=[(key_col, "ascending"),
                             (start_col, "ascending"),
                             (end_col, "ascending")]))
        s = part.column(start_col).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
        e = part.column(end_col).cast(pa.int64()) \
                .to_numpy(zero_copy_only=False)
        from ..dsutil import run_starts

        new_key = run_starts(part.column(key_col))  # null-safe key change
        # segmented prefix max of e within each key run
        run_end = e.copy()
        seg = np.cumsum(new_key) - 1
        lo = np.iinfo(np.int64).min
        shift = 1
        while shift < n:
            ok = seg[shift:] == seg[:-shift]
            np.maximum(run_end[shift:],
                       np.where(ok, run_end[:-shift], lo),
                       out=run_end[shift:])
            shift <<= 1
        # row i starts a new island iff it opens a new key or its start
        # clears every prior end within the key
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = new_key[1:] | (s[1:] > run_end[:-1] + min_gap)
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], n)
        island_start = s[starts]
        island_end = np.maximum.reduceat(e, starts)
        key = part.column(key_col).take(pa.array(starts, pa.int64()))
        return pa.table({
            key_col: key,
            start_col: pa.array(island_start, pa.int64()),
            end_col: pa.array(island_end, pa.int64()),
            count_alias: pa.array(ends - starts, pa.int64()),
        })

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(ds, key_col, per_partition)


def merge_intervals_sql(table: str, key: str, start: str, end: str,
                        min_gap: int = 0,
                        count_alias: str = "n_rows") -> str:
    """ANSI-SQL (window-function) equivalent of ``merge_intervals_by_key``
    for a DuckDB oracle — classic gaps-and-islands rewrite."""
    return f"""
        WITH flagged AS (
          SELECT {key} AS k, {start} AS s, {end} AS e,
                 CASE WHEN {start} > COALESCE(MAX({end}) OVER (
                        PARTITION BY {key} ORDER BY {start}, {end}
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        {start} - {min_gap} - 1) + {min_gap}
                      THEN 1 ELSE 0 END AS brk
          FROM {table}
        ), grouped AS (
          SELECT *, SUM(brk) OVER (PARTITION BY k ORDER BY s, e
                                   ROWS UNBOUNDED PRECEDING) AS island
          FROM flagged
        )
        SELECT k AS {key}, MIN(s) AS {start}, MAX(e) AS {end},
               COUNT(*) AS {count_alias}
        FROM grouped GROUP BY k, island
    """
