"""Per-key interval algebra: merge overlapping/touching intervals.

The gaps-and-islands primitive — collapse a set of (key, start, end) rows
into maximal disjoint covering intervals per key.  Reference analog: the
extraction service coalesces retry attempts of one document into a single
logical processing window before billing (``app/services/storage.py``
groups rows per document regardless of attempt count); at corpus scale the
same shape answers "merged outage windows", "user active periods",
"coalesced span coverage".

Scale shape: ONE keyed shuffle (``groupby(key).map_groups``); the per-key
interior is a sort + ``np.maximum.accumulate`` running end + one
``np.add.reduceat`` fold per island — no per-row Python.  The same per-key
memory contract as ``session_windows`` applies (a key's intervals must fit
one worker; salt upstream if violated).
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

    def per_key(group: pa.Table) -> pa.Table:
        group = group.take(pc.sort_indices(
            group, sort_keys=[(start_col, "ascending"),
                              (end_col, "ascending")]))
        s = group.column(start_col).cast(pa.int64()) \
                 .to_numpy(zero_copy_only=False)
        e = group.column(end_col).cast(pa.int64()) \
                 .to_numpy(zero_copy_only=False)
        run_end = np.maximum.accumulate(e)
        # row i starts a new island iff its start clears every prior end
        brk = np.empty(len(s), dtype=bool)
        brk[0] = True
        brk[1:] = s[1:] > run_end[:-1] + min_gap
        starts = np.flatnonzero(brk)
        ends = np.append(starts[1:], len(s))
        island_start = s[starts]
        island_end = np.maximum.reduceat(e, starts)
        key = group.column(key_col).take(pa.array(starts, pa.int64()))
        return pa.table({
            key_col: key,
            start_col: pa.array(island_start, pa.int64()),
            end_col: pa.array(island_end, pa.int64()),
            count_alias: pa.array(ends - starts, pa.int64()),
        })

    return ds.groupby(key_col).map_groups(per_key, batch_format="pyarrow")


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
