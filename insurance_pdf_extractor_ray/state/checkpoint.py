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


def run_metrics(out_dir: str):
    """Per-partition lineage + metrics from committed manifests, as a table.

    The operational read side of :func:`run_partitioned`: one row per
    committed partition with its row count, wall time, input-file count,
    config hash and rule-table version — the artifact a cluster operator
    watches during a 10^12-doc run (straggler partitions surface as wall
    outliers; a version-mixed resume surfaces as >1 distinct
    ``rules_version``).  Manifest-dir-sized: never touches the data files.
    """
    import pyarrow as pa

    rows = sorted(committed_partitions(out_dir).items())
    return pa.table({
        "partition": pa.array([i for i, _ in rows], pa.int32()),
        "rows": pa.array([m.get("rows", 0) for _, m in rows], pa.int64()),
        "n_input_files": pa.array([len(m.get("input_files", [])) for _, m in rows],
                                  pa.int32()),
        "wall_time_sec": pa.array([float(m.get("wall_time_sec", 0.0))
                                   for _, m in rows], pa.float64()),
        "config_hash": pa.array([m.get("config_hash", "") for _, m in rows],
                                pa.string()),
        "rules_version": pa.array([m.get("rules_version") for _, m in rows],
                                  pa.string()),
        "committed_at": pa.array([m.get("committed_at", "") for _, m in rows],
                                 pa.string()),
    })


def compact_partitions(out_dir: str, target_rows_per_file: int = 1_000_000,
                       min_files: int = 2) -> Dict:
    """Merge each committed partition's small parquet files into few large
    ones — the small-file compaction every long-running partitioned sink
    needs (a 10^12-doc run writing per-task fragments produces millions of
    KB-sized files that crush any later scan's scheduler).

    Exactly-once safe: the compacted copy is written to a shadow directory,
    its row count verified against the partition's MANIFEST (not the
    possibly-damaged data), then swapped in atomically (``os.replace`` of
    the directory); manifests are untouched, so resume semantics are
    unchanged and a kill mid-compaction leaves either the old or the new
    layout, never a mix.  Partitions already at ``<= min_files`` files are
    skipped.  Returns {compacted, skipped, files_before, files_after}.
    """
    import pyarrow.parquet as pq

    compacted = skipped = before = after = 0
    for i, manifest in sorted(committed_partitions(out_dir).items()):
        part_dir = os.path.join(out_dir, f"part-{i}")
        files = sorted(glob.glob(os.path.join(part_dir, "*.parquet")))
        before += len(files)
        if len(files) <= min_files:
            skipped += 1
            after += len(files)
            continue
        shadow = part_dir + ".compact"
        shutil.rmtree(shadow, ignore_errors=True)
        ds = ray.data.read_parquet(files)
        ds.repartition(max(1, -(-manifest.get("rows", 1)
                                // target_rows_per_file))) \
            .write_parquet(shadow)
        new_files = glob.glob(os.path.join(shadow, "*.parquet"))
        new_rows = sum(pq.ParquetFile(f).metadata.num_rows
                       for f in new_files)
        if new_rows != manifest.get("rows"):
            shutil.rmtree(shadow, ignore_errors=True)
            raise RuntimeError(
                f"compaction row mismatch on partition {i}: "
                f"{new_rows} != manifest {manifest.get('rows')}")
        old = part_dir + ".old"
        shutil.rmtree(old, ignore_errors=True)
        os.replace(part_dir, old)
        os.replace(shadow, part_dir)
        shutil.rmtree(old, ignore_errors=True)
        compacted += 1
        after += len(new_files)
    return {"compacted": compacted, "skipped": skipped,
            "files_before": before, "files_after": after}
