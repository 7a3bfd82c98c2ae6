"""Hash-bucketed storage layout + zero-shuffle co-located joins (SMB-style).

`Dataset.join` is an all-to-all exchange — at 100 TB, joining two corpora
that are joined REPEATEDLY (documents × scores, spans × metadata, crawl ×
dedup verdicts) should not re-shuffle both sides every run.  The public
sort-merge-bucket idea: pay one hash-partitioned write per side, then every
subsequent join is *embarrassingly parallel* — one task per bucket reads the
two matching bucket directories and joins them locally with the Arrow
(Acero) hash-join kernel.  No driver-side data, no exchange, resumable per
bucket.

Invariants the layout guarantees (and ``bucketed_join`` relies on):
  * the SAME deterministic key hash on both sides (int keys: the Knuth
    multiplicative hash; strings: the engine's stable 64-bit hash) — equal
    keys land in equal bucket ids;
  * ``n_buckets`` recorded in the layout (a join across mismatched bucket
    counts refuses rather than silently dropping rows);
  * Parquet partition dirs (``_bucket=i/``) so a failed write resumes per
    bucket and readers prune to single buckets for point lookups.

Bucket tasks stream through the normal Dataset path (`from_items` over
bucket ids → ``map_batches``), so concurrency, backpressure and spill are
Ray Data's problem, not ours.
"""

from __future__ import annotations

import glob
import json
import os
from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ..functions.hashing import durable_hash64_column

_KNUTH64 = np.uint64(0x9E3779B97F4A7C15)  # 2^64 / phi — public splitmix piece


def _bucket_of(col: pa.ChunkedArray, n_buckets: int) -> np.ndarray:
    """Deterministic DURABLE bucket id per value — identical for both join
    sides and across jobs/environments (layouts persist)."""
    if pa.types.is_integer(col.type):
        v = col.to_numpy(zero_copy_only=False).astype(np.uint64)
        h = (v * _KNUTH64) >> np.uint64(33)
    else:
        h = durable_hash64_column(col)
    return (h % np.uint64(n_buckets)).astype(np.int64)


def write_bucketed(
    ds: ray.data.Dataset,
    path: str,
    key: str,
    n_buckets: int,
) -> str:
    """Write ``ds`` hash-partitioned on ``key`` into ``path/_bucket=i/``
    Parquet dirs + a tiny layout manifest.  One pass, no shuffle — each task
    appends its rows to the partition dirs it touches."""

    def tag(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "_bucket", pa.array(_bucket_of(batch.column(key), n_buckets),
                                pa.int64()))

    ds.map_batches(tag, batch_format="pyarrow").write_parquet(
        path, partition_cols=["_bucket"])
    # an empty dataset writes no fragments (not even the directory): the
    # layout manifest must still exist so joins against it resolve to empty
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_layout.json"), "w") as f:
        json.dump({"key": key, "n_buckets": n_buckets}, f)
    return path


def _read_bucket(path: str, bucket: int, columns: Optional[List[str]]) -> pa.Table:
    files = sorted(glob.glob(os.path.join(path, f"_bucket={bucket}", "*.parquet")))
    if not files:
        return None
    return pa.concat_tables([pq.read_table(f, columns=columns) for f in files])


def layout_of(path: str) -> dict:
    with open(os.path.join(path, "_layout.json")) as f:
        return json.load(f)


def bucketed_join(
    path_a: str,
    path_b: str,
    join_type: str = "inner",
    columns_a: Optional[List[str]] = None,
    columns_b: Optional[List[str]] = None,
) -> ray.data.Dataset:
    """Join two bucketed layouts on their layout keys with ZERO shuffle —
    one Arrow hash-join task per co-located bucket pair.

    Refuses mismatched bucket counts (a silent mismatch would drop rows).
    ``columns_*`` prune the per-bucket reads just like a pruned scan.
    """
    la, lb = layout_of(path_a), layout_of(path_b)
    if la["n_buckets"] != lb["n_buckets"]:
        raise ValueError(
            f"bucket count mismatch: {la['n_buckets']} vs {lb['n_buckets']}"
            " — rewrite one side with write_bucketed at the other's count")
    key_a, key_b = la["key"], lb["key"]
    n = la["n_buckets"]

    def join_one(batch: pa.Table) -> pa.Table:
        out = []
        for bucket in batch.column("bucket").to_pylist():
            ta = _read_bucket(path_a, bucket, columns_a)
            tb = _read_bucket(path_b, bucket, columns_b)
            if ta is None or (tb is None and join_type == "inner"):
                continue
            if tb is None:
                tb = pa.table({key_b: pa.array([], ta.column(key_a).type)})
            # disambiguate non-key right columns colliding with left names
            # (SQL's "t2.x AS x_r"): Arrow join refuses duplicate fields
            clash = (set(ta.column_names) & set(tb.column_names)) - {key_b}
            if clash:
                tb = tb.rename_columns([
                    c + "_r" if c in clash else c for c in tb.column_names])
            out.append(ta.join(tb, keys=[key_a], right_keys=[key_b],
                               join_type=join_type))
        if not out:
            return pa.table({})
        return pa.concat_tables(out, promote_options="default")

    buckets = ray.data.from_items([{"bucket": i} for i in range(n)])
    return buckets.map_batches(join_one, batch_size=1, batch_format="pyarrow")


def point_lookup(
    path: str,
    values,
    columns: Optional[List[str]] = None,
) -> pa.Table:
    """Serve point queries from a bucketed layout WITHOUT a cluster scan:
    each requested key value hashes straight to its bucket dir, so the read
    touches at most ``len(values)`` buckets (deduplicated) regardless of
    layout size — the same pruning a storage index gives a serving tier.
    Runs on the caller (driver or task): lookups are metadata-light and
    latency-bound, not throughput work for the cluster.

    ``values``: one key value or a list of them, matching the layout key's
    type.  Returns the concatenated matching rows (possibly empty) with
    ``columns`` pruned like a scan."""
    lay = layout_of(path)
    key, n = lay["key"], lay["n_buckets"]
    if not isinstance(values, (list, tuple)):
        values = [values]
    if not values:
        raise ValueError("point_lookup needs at least one value")
    arr = pa.chunked_array([pa.array(values)])
    buckets = sorted(set(_bucket_of(arr, n).tolist()))
    cols = None if columns is None else sorted(set(columns) | {key})
    out = []
    for b in buckets:
        t = _read_bucket(path, b, cols)
        if t is None:
            continue
        mask = pa.compute.is_in(t.column(key),
                                value_set=pa.array(values,
                                                   t.column(key).type))
        t = t.filter(mask)
        if columns is not None:
            t = t.select(columns)
        out.append(t)  # keep zero-row tables too: they carry the schema
    if not out:
        # no touched bucket exists on disk: derive the schema from any file
        files = sorted(glob.glob(os.path.join(path, "_bucket=*",
                                              "*.parquet")))
        if files:
            schema = pq.read_schema(files[0])
            cols_out = columns or [c for c in schema.names]
            return pa.table({c: pa.array([], schema.field(c).type)
                             for c in cols_out})
        return pa.table({key: pa.array([], arr.type)})
    return pa.concat_tables(out, promote_options="default")
