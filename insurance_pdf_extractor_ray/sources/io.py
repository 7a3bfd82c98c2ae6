"""Dataset readers/writers.

The at-scale storage format is Lance (zero-copy Arrow scans, column pruning,
fragment-level parallelism); this sandbox has no ``lance`` wheel, so the
reader transparently falls back to Parquet — same Arrow schemas, same
pipelines.  Maps reference operators S1/S5/S6/S7
(/root/reference/app/api/routes/extraction.py:96-101,
app/services/storage.py:167-433, app/api/routes/storage.py:122-210).
"""

from __future__ import annotations

import os
from typing import List, Optional

import ray.data


def read_table(path: str, columns: Optional[List[str]] = None,
               predicate=None) -> ray.data.Dataset:
    """Read a Lance or Parquet table as a streaming Dataset.

    ``columns`` prunes at the scan (never load what a 2-column transform
    doesn't need); ``predicate`` (a ``pyarrow.dataset`` expression, e.g.
    ``pc.field("o_totalprice") > 4e5``) pushes the row filter into the scan
    so non-matching row groups are skipped on their Parquet min/max stats —
    rows that can't match never leave storage.  ``path`` may be a
    ``.lance`` dataset dir, a parquet file, or a directory of parquet files.
    """
    if path.endswith(".lance"):
        import importlib.util

        if importlib.util.find_spec("lance") is None:
            raise ImportError(
                "path names a .lance dataset but the 'lance' wheel is not "
                "installed in this environment; write the table as a "
                "parquet directory instead — the engine's bucketed-parquet "
                "layout (sources/io.py:write_bucketed) is the canonical "
                "at-rest substrate here and reproduces the colocation "
                "properties the Lance design provides")
        return ray.data.read_lance(path, columns=columns)
    if predicate is not None:
        return ray.data.read_parquet(path, columns=columns, filter=predicate)
    return ray.data.read_parquet(path, columns=columns)


def sf_table(sf_dir: str, name: str, columns: Optional[List[str]] = None) -> ray.data.Dataset:
    """Read one of the standard testdata tables from an sf directory."""
    return read_table(os.path.join(sf_dir, f"{name}.parquet"), columns=columns)


def write_table(ds: ray.data.Dataset, path: str, partition_cols: Optional[List[str]] = None) -> None:
    """Write a Dataset as Parquet (dir of files — resumable, never one giant file)."""
    os.makedirs(path, exist_ok=True)
    if partition_cols:
        ds.write_parquet(path, partition_cols=partition_cols)
    else:
        ds.write_parquet(path)


def write_bucketed(
    ds: ray.data.Dataset, path: str, key: str, num_buckets: int = 64,
    seed: int = 42,
) -> None:
    """Write a table hash-bucketed by ``key``: ``path/bucket=<i>/...parquet``.

    All rows of one key land in one bucket directory.  Downstream, run each
    bucket as its own partition (``state.checkpoint.run_partitioned`` with
    :func:`bucket_partitions`): the reassembly exchange then happens INSIDE a
    bucket-sized pipeline — no corpus-wide shuffle, per-bucket resume, and a
    failed run skips finished buckets.  (Reading the whole layout as one
    Dataset does NOT make ``mode='colocated'`` safe by itself: block and
    batch boundaries within a bucket can still split a doc.)  Bucket
    assignment uses the seed-fixed polars hash — stable across workers
    within one environment; do not mix layouts written by different polars
    versions.
    """
    import numpy as np
    import pyarrow as pa

    from ..functions.hashing import stable_hash64_column

    B = np.uint64(num_buckets)

    def add_bucket(batch: pa.Table) -> pa.Table:
        h = stable_hash64_column(batch.column(key), seed=seed)
        return batch.append_column(
            "bucket", pa.array((h % B).astype(np.int32), pa.int32()))

    os.makedirs(path, exist_ok=True)
    ds.map_batches(add_bucket, batch_format="pyarrow").write_parquet(
        path, partition_cols=["bucket"])


def bucket_partitions(path: str) -> List[List[str]]:
    """File groups for ``run_partitioned``: one partition per bucket dir of a
    ``write_bucketed`` layout — each partition contains every row of its
    keys, so per-partition reassembly is exact with no cross-partition
    exchange."""
    import glob as _glob

    bucket_dirs = sorted(_glob.glob(os.path.join(path, "bucket=*")))
    if not bucket_dirs:
        raise FileNotFoundError(f"no bucket=* dirs under {path}")
    return [sorted(_glob.glob(os.path.join(d, "*.parquet"))) for d in bucket_dirs]


def read_bucketed(path: str, columns: Optional[List[str]] = None) -> ray.data.Dataset:
    """Read a ``write_bucketed`` layout as one streaming Dataset (bucket
    membership is encoded in the directory structure; the ``bucket`` column
    is re-materialized by the hive partitioning)."""
    import glob as _glob

    bucket_dirs = sorted(_glob.glob(os.path.join(path, "bucket=*")))
    if not bucket_dirs:
        return ray.data.read_parquet(path, columns=columns)
    return ray.data.read_parquet(bucket_dirs, columns=columns)


def read_csv(path: str, columns: Optional[List[str]] = None
             ) -> ray.data.Dataset:
    """Read CSV file(s) as a streaming Dataset (crawl dumps, vendor drops).

    Column pruning happens via Arrow's CSV convert options so unwanted
    columns are dropped at parse time, not in a later projection."""
    if columns:
        from pyarrow import csv as pacsv

        return ray.data.read_csv(
            path, convert_options=pacsv.ConvertOptions(
                include_columns=list(columns)))
    return ray.data.read_csv(path)


def read_jsonl(path: str, columns: Optional[List[str]] = None
               ) -> ray.data.Dataset:
    """Read newline-delimited JSON as a streaming Dataset — the lingua
    franca of crawl corpora.  Arrow's JSON reader infers the schema per
    file; prune after parse (JSONL has no columnar projection)."""
    ds = ray.data.read_json(path)
    if columns:
        ds = ds.select_columns(list(columns))
    return ds


def export_json(ds: ray.data.Dataset, path: str) -> None:
    """JSON export sink (reference S7, app/api/routes/storage.py:122-210)."""
    os.makedirs(path, exist_ok=True)
    ds.write_json(path)


def export_csv(ds: ray.data.Dataset, path: str) -> None:
    """CSV export sink (reference S7, app/api/routes/analytics.py:276-350)."""
    os.makedirs(path, exist_ok=True)
    ds.write_csv(path)


def compact_table(
    in_path: str,
    out_path: str,
    min_rows_per_file: int = 200_000,
    max_rows_per_file: int = 1_000_000,
) -> dict:
    """Small-file compaction: rewrite a parquet directory so every output
    file holds ``min..max`` rows.

    Crawl/extract sinks produce one fragment per task (state/checkpoint.py
    writes data-first fragments); after many incremental runs a partition
    accumulates thousands of tiny files whose per-file open/footer cost
    dominates reads.  Compaction is pure streaming — read blocks in, write
    size-bounded files out, no shuffle, no driver materialization — so it
    scales to any partition count; run it per-partition for resumability.

    Returns a manifest dict: files/rows before and after.
    """
    import glob as _glob

    ds = ray.data.read_parquet(in_path)
    n_in = len(_glob.glob(os.path.join(in_path, "*.parquet")))
    rows = ds.count()
    os.makedirs(out_path, exist_ok=True)
    ds.write_parquet(out_path, min_rows_per_file=min_rows_per_file,
                     max_rows_per_file=max_rows_per_file)
    n_out = len(_glob.glob(os.path.join(out_path, "*.parquet")))
    return {"rows": rows, "files_in": n_in, "files_out": n_out}
