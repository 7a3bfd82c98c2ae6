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


def read_table(path: str, columns: Optional[List[str]] = None) -> ray.data.Dataset:
    """Read a Lance or Parquet table as a streaming Dataset.

    ``columns`` prunes at the scan (never load what a 2-column transform
    doesn't need).  ``path`` may be a ``.lance`` dataset dir, a parquet file,
    or a directory of parquet files.
    """
    if path.endswith(".lance"):
        try:
            return ray.data.read_lance(path, columns=columns)
        except ImportError:
            raise ImportError("lance is not installed in this environment; use parquet")
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


def export_json(ds: ray.data.Dataset, path: str) -> None:
    """JSON export sink (reference S7, app/api/routes/storage.py:122-210)."""
    os.makedirs(path, exist_ok=True)
    ds.write_json(path)


def export_csv(ds: ray.data.Dataset, path: str) -> None:
    """CSV export sink (reference S7, app/api/routes/analytics.py:276-350)."""
    os.makedirs(path, exist_ok=True)
    ds.write_csv(path)
