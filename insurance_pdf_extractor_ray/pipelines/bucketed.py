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


def _hash64_full(col: pa.ChunkedArray) -> np.ndarray:
    """Full-width 64-bit per-row content hash (naming, not bucketing)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        return col.to_numpy(zero_copy_only=False).astype(np.uint64) * _KNUTH64
    return durable_hash64_column(col)


def _content_seed(part: pa.Table) -> int:
    """Order-independent digest of a fragment's integer/string columns —
    used for idempotent fragment naming: a retried task re-writing the same
    rows produces the same filename and ``os.replace`` makes the second
    write a no-op.  Two fragments in the same bucket dir coalesce ONLY if
    they agree on every hashed column for every row (i.e. they are the same
    rows); binary columns (signatures) are skipped because the hashed
    columns already identify the row."""
    h = np.zeros(part.num_rows, np.uint64)
    mul = np.uint64(0x100000001B3)  # FNV prime — column mixing
    for name in part.column_names:
        t = part.schema.field(name).type
        if (pa.types.is_integer(t) or pa.types.is_string(t)
                or pa.types.is_large_string(t)):
            h = h * mul ^ _hash64_full(part.column(name))
    seed = int(np.bitwise_xor.reduce(h)) if part.num_rows else 0
    return (seed ^ (part.num_rows * int(_KNUTH64))) & 0xFFFFFFFFFFFFFFFF


def write_fragment_bucketed(rows: pa.Table, path: str, key: str,
                            n_buckets: int, tag: Optional[str] = None) -> int:
    """Write one in-task table hash-partitioned into ``path/_bucket=i/``
    dirs — the task-side building block of :func:`write_bucketed_multi`
    and of fused bucket passes that emit re-keyed rows.

    ``tag`` names the fragments (``<tag>.parquet``) when the caller has a
    natural idempotency token (e.g. the source bucket id of a per-bucket
    task: one such task writes at most one fragment per destination
    bucket); otherwise names derive from row content via
    :func:`_content_seed`.  Both schemes are idempotent under task retry.
    Returns rows written.  The caller owns the ``_layout.json`` manifest.
    """
    if rows.num_rows == 0:
        return 0
    b = _bucket_of(rows.column(key), n_buckets)
    order = np.argsort(b, kind="stable")
    rows = rows.take(pa.array(order))
    b = b[order]
    bounds = np.flatnonzero(np.diff(b)) + 1
    starts = np.concatenate(([0], bounds))
    ends = np.concatenate((bounds, [len(b)]))
    written = 0
    for s, e in zip(starts, ends):
        part = rows.slice(s, e - s)
        d = os.path.join(path, f"_bucket={int(b[s])}")
        os.makedirs(d, exist_ok=True)
        name = (tag if tag is not None
                else f"{_content_seed(part):016x}") + ".parquet"
        final = os.path.join(d, name)
        tmp = final + f".tmp-{os.getpid()}"
        # dictionary encoding on effectively-random 64-bit keys/ids costs
        # ~2x write time for zero compression win (measured: 0.17 -> 0.09 s
        # per 800k-row block, files slightly SMALLER without it); bucket
        # readers consume whole files, so row-group statistics buy nothing
        pq.write_table(part, tmp, use_dictionary=False,
                       write_statistics=False)
        os.replace(tmp, final)
        written += part.num_rows
    return written


def write_layout_manifest(path: str, key: str, n_buckets: int) -> None:
    """The tiny per-layout manifest ``bucketed_join``/``layout_of`` read.
    Must exist even for an all-empty layout so joins resolve to empty."""
    os.makedirs(path, exist_ok=True)
    with open(os.path.join(path, "_layout.json"), "w") as f:
        json.dump({"key": key, "n_buckets": n_buckets}, f)


def write_bucketed_multi(ds, targets, n_buckets: int) -> int:
    """Write SEVERAL bucketed layouts from one Dataset in ONE execution.

    ``targets``: list of ``(path, key, project)`` where ``project`` is an
    optional per-batch ``pa.Table -> pa.Table`` projection (None =
    identity).  Every Ray Data execution carries seconds of fixed wave
    latency; staging flows that derive two or three layouts from the same
    rows (the incremental MinHash index stages bands + sigs from one sign
    pass) pay it once here instead of once per layout.  Fragments append
    into existing ``_bucket=i/`` dirs (same append contract as repeated
    :func:`write_bucketed` calls) with content-derived idempotent names.
    Returns total rows written across targets.
    """
    tl = list(targets)

    def write_batch(batch: pa.Table) -> pa.Table:
        written = 0
        for path, key, project in tl:
            t = project(batch) if project is not None else batch
            written += write_fragment_bucketed(t, path, key, n_buckets)
        return pa.table({"rows": pa.array([written], pa.int64())})

    # drive the execution with a driver-side fetch of the tiny per-batch
    # stub rows — NOT ds.sum(): an Aggregate is an all-to-all operator
    # whose fixed exchange latency (and operator resource reservation,
    # which throttles the heavy write map on narrow clusters) costs far
    # more than these one-row stubs are worth
    parts = ds.map_batches(write_batch, batch_size=None,
                           batch_format="pyarrow").take_all()
    total = int(sum(r["rows"] for r in parts))
    for path, key, _ in tl:
        write_layout_manifest(path, key, n_buckets)
    return total


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
