"""Resumable partitioned runs: per-partition manifests with lineage + metrics.

Ray Data has no job-level checkpoint; this implements the bespoke design of
SURVEY.md §4/§7.9: input fragments are grouped into partitions; each partition
runs as its own streaming pipeline and writes

    <out>/part-<i>/...parquet        (the data)
    <out>/_manifest/part-<i>.json    (lineage: input files, row counts,
                                      config hash, wall time — fsync'd LAST)

A resumed run skips every partition whose manifest is committed; a partition
killed mid-write leaves no manifest, its directory is truncated and re-run.
Idempotent under partial re-execution by construction (data first, manifest
last).  Mirrors (and upgrades) the reference's per-request durable insert
(storage.py:167-306) which has no idempotency key at all.
"""

from __future__ import annotations

import glob
import hashlib
import json
import os
import shutil
import time
from typing import Callable, Dict, List, Optional

import ray.data


def _config_hash(config: Dict) -> str:
    return hashlib.blake2b(
        json.dumps(config, sort_keys=True).encode(), digest_size=8
    ).hexdigest()


def partition_inputs(input_dir: str, num_partitions: int) -> List[List[str]]:
    """Deterministically group input parquet fragments into partitions."""
    files = sorted(glob.glob(os.path.join(input_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet fragments under {input_dir}")
    num_partitions = min(num_partitions, len(files))
    parts: List[List[str]] = [[] for _ in range(num_partitions)]
    for i, f in enumerate(files):
        parts[i % num_partitions].append(f)
    return parts


def committed_partitions(out_dir: str) -> Dict[int, Dict]:
    """Read committed manifests (partition id -> manifest)."""
    man_dir = os.path.join(out_dir, "_manifest")
    out: Dict[int, Dict] = {}
    if not os.path.isdir(man_dir):
        return out
    for p in glob.glob(os.path.join(man_dir, "part-*.json")):
        try:
            with open(p) as f:
                m = json.load(f)
            out[int(m["partition"])] = m
        except (json.JSONDecodeError, KeyError, ValueError):
            continue  # torn manifest: treat as uncommitted
    return out


def run_partitioned(
    input_dir: str,
    out_dir: str,
    pipeline: Callable[[ray.data.Dataset], ray.data.Dataset],
    num_partitions: int = 16,
    config: Optional[Dict] = None,
    resume: bool = True,
    partitions: Optional[List[List[str]]] = None,
) -> Dict:
    """Run ``pipeline`` over each input partition with manifest checkpointing.

    Returns run summary {partitions_run, partitions_skipped, rows}.
    NOTE: partitioning by input fragment assumes rows of one doc live in one
    fragment (the layout our writers produce).  For externally-sharded docs,
    pass ``partitions=sources.io.bucket_partitions(path)`` over a
    ``write_bucketed`` layout — each bucket holds every row of its keys, so
    the reassembly exchange runs INSIDE a bucket-sized partition (no
    corpus-wide shuffle, per-bucket resume) — or run the shuffle inside a
    single partition spanning the shards.
    """
    config = config or {}
    chash = _config_hash(config)
    man_dir = os.path.join(out_dir, "_manifest")
    os.makedirs(man_dir, exist_ok=True)
    parts = partitions if partitions is not None else partition_inputs(input_dir, num_partitions)
    done = committed_partitions(out_dir) if resume else {}

    ran, skipped, total_rows = 0, 0, 0
    for i, files in enumerate(parts):
        man_path = os.path.join(man_dir, f"part-{i}.json")
        prev = done.get(i)
        # a partition is committed only if BOTH the config and its exact file
        # assignment match — re-running with a different partition count or
        # after adding input fragments changes file assignments, and skipping
        # on config_hash alone would silently drop/duplicate rows
        if (prev is not None and prev.get("config_hash") == chash
                and prev.get("input_files") == files):
            skipped += 1
            total_rows += prev.get("rows", 0)
            continue
        part_dir = os.path.join(out_dir, f"part-{i}")
        # partial output from a killed attempt: truncate before re-running
        shutil.rmtree(part_dir, ignore_errors=True)
        os.makedirs(part_dir, exist_ok=True)

        t0 = time.time()
        ds = ray.data.read_parquet(files)
        out = pipeline(ds)
        out.write_parquet(part_dir)
        import pyarrow.parquet as pq

        rows = sum(
            pq.ParquetFile(f).metadata.num_rows
            for f in glob.glob(os.path.join(part_dir, "*.parquet"))
        )
        manifest = {
            "partition": i,
            "input_files": files,
            "rows": rows,
            "config_hash": chash,
            # lineage: rule-table version is first-class in the manifest so a
            # resume under a different version is visibly invalidated (§2.11)
            "rules_version": config.get("rules_version"),
            "wall_time_sec": round(time.time() - t0, 3),
            "committed_at": time.strftime("%Y-%m-%dT%H:%M:%S"),
        }
        # data first, manifest last (atomic rename + fsync)
        tmp = man_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(manifest, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, man_path)
        ran += 1
        total_rows += rows
    return {"partitions_run": ran, "partitions_skipped": skipped, "rows": total_rows}
