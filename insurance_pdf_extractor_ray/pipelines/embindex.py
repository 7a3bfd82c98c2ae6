"""Incremental embedding near-dup dedup against an at-rest sign-bucket index.

The vector sibling of ``minhashindex``: a continuous ingest stream asks "is
this embedding within cosine ``threshold`` of anything kept before?" without
re-projecting or re-shuffling the accumulated corpus.  Unlike MinHash, each
doc has exactly ONE sign bucket (random-hyperplane signature,
``dedup.SignBucketStage`` — SAME seed across increments so keys are
comparable) and the unit vector IS the verification payload, so the index
is a single bucketed layout ``index_dir/embs`` keyed on the sign bucket:
(bucket uint64, id, unit binary = packed float32 — Acero joins carry binary
but not list columns) — one row per kept doc.

Increment scale shape (zero all-to-all exchange):
  1. one actor-pool map pass signs + unit-normalizes the increment;
  2. its rows are written into a matching bucket layout (map pass);
  3. within-increment dups: per-bucket LOCAL greedy canonical-set kernel
     (the batch path's semantics) over the increment's own layout;
  4. cross-increment dups: ``bucketed_join`` on the sign bucket — one local
     Arrow join task per co-located bucket pair, the index never moves —
     then a vectorized row-wise cosine against the carried unit vectors.

Recall is per-bucket exactly as in ``dedup.embedding_dup_ids`` (lower
``n_planes`` or union multiple seeds to raise it); verification is exact
cosine, so precision is exact.  Commit protocol: data first, index last
(``embedding_index_append`` after the kept rows are durably sunk).
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from .bucketed import _read_bucket, bucketed_join, layout_of, write_bucketed
from .dedup import MAX_BROADCAST_ROWS, SignBucketStage, filter_by_ids

_EMBS = "embs"


#: per-worker-process stage cache (see minhashindex._STAGE_CACHE): cached
#: tasks fuse with the read and skip actor-pool spin-up on every execution
_STAGE_CACHE: dict = {}


def _sign_rows(ds: ray.data.Dataset, emb_col: str, id_col: str,
               n_planes: int, seed: int, concurrency=None) -> ray.data.Dataset:
    key = (emb_col, id_col, n_planes, seed)

    def sign(batch: pa.Table) -> pa.Table:
        st = _STAGE_CACHE.get(key)
        if st is None:
            st = _STAGE_CACHE[key] = SignBucketStage(
                emb_col=emb_col, id_col=id_col, n_planes=n_planes, seed=seed)
        return st(batch)

    signed = ds.select_columns([id_col, emb_col]).map_batches(
        sign, batch_format="pyarrow")

    # unit vectors ride the layout as fixed-width float32 BYTES: Acero hash
    # joins (the probe) reject list-typed non-key columns but carry binary
    def pack(t: pa.Table) -> pa.Table:
        from .similarity import embedding_matrix

        m = embedding_matrix(t.column("unit"), dtype=np.float32)
        return pa.table({
            "bucket": t.column("bucket"),
            id_col: t.column(id_col),
            "unit": pa.array([m[i].tobytes() for i in range(len(m))],
                             pa.binary()),
        })

    return signed.map_batches(pack, batch_format="pyarrow")


def _unit_matrix(col: pa.ChunkedArray) -> np.ndarray:
    rows = [np.frombuffer(b, np.float32) for b in col.to_pylist()]
    return np.stack(rows) if rows else np.empty((0, 0), np.float32)


def _greedy_bucket_dups(group: pa.Table, id_col: str, threshold: float,
                        cap: int = 4096) -> pa.Table:
    """Greedy canonical set within one sign bucket (same semantics as
    dedup.embedding_dup_ids): ids ascending, drop a row whose cosine vs an
    already-canonical row reaches ``threshold``."""
    n = min(group.num_rows, cap)
    empty = pa.table({id_col: pa.array([], group.column(id_col).type)})
    if n < 2:
        return empty
    ids = group.column(id_col).to_pylist()[:n]
    unit = _unit_matrix(group.column("unit").slice(0, n))
    order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
    sims = unit @ unit.T
    canon, dups = [], []
    for i in order:
        if canon and np.max(sims[i, canon]) >= threshold:
            dups.append(ids[i])
        else:
            canon.append(i)
    if not dups:
        return empty
    return pa.table({id_col: pa.array(sorted(set(dups)),
                                      group.column(id_col).type)})


def _local_sign_dups(path: str, id_col: str, id_type: pa.DataType,
                     threshold: float) -> ray.data.Dataset:
    """Within-increment dups from the increment's own layout: one task per
    bucket dir, local sort + run-split on the sign-bucket column, greedy
    kernel per sign bucket — no shuffle."""
    n = layout_of(path)["n_buckets"]
    empty = pa.table({id_col: pa.array([], id_type)})

    def one(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("bucket_id").to_pylist():
            t = _read_bucket(path, b, None)
            if t is None or t.num_rows < 2:
                continue
            t = t.sort_by("bucket").combine_chunks()
            keys = t.column("bucket").to_numpy(zero_copy_only=False)
            bounds = np.flatnonzero(np.diff(keys)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(keys)]))
            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                d = _greedy_bucket_dups(t.slice(s, e - s), id_col, threshold)
                if d.num_rows:
                    out.append(d)
        if not out:
            return empty
        return pa.concat_tables(out)

    buckets = ray.data.from_items([{"bucket_id": i} for i in range(n)])
    return buckets.map_batches(one, batch_size=1, batch_format="pyarrow")


def embedding_dedup_incremental(
    new_ds: ray.data.Dataset,
    index_dir: str,
    emb_col: str,
    id_col: str,
    threshold: float = 0.95,
    n_planes: int = 12,
    seed: int = 42,
    n_buckets: int = 32,
    concurrency=(1, 8),
    tmp_dir: Optional[str] = None,
    max_broadcast: int = MAX_BROADCAST_ROWS,
) -> Tuple[ray.data.Dataset, ray.data.Dataset]:
    """Near-dup-dedup one embedding increment against the at-rest index.

    Returns ``(kept, rows_kept)``: the surviving rows of ``new_ds``, and
    their (bucket, id, unit) rows to commit with
    :func:`embedding_index_append` once ``kept`` is durably sunk.
    ``n_planes``/``seed`` must match across increments."""
    tmp = tmp_dir or tempfile.mkdtemp(prefix="ipe_embinc_")
    embs_idx = os.path.join(index_dir, _EMBS)
    have_index = os.path.exists(os.path.join(embs_idx, "_layout.json"))
    if have_index:
        n_buckets = layout_of(embs_idx)["n_buckets"]

    id_type = dict(zip(new_ds.schema().names, new_ds.schema().types))[id_col]

    rows_new = os.path.join(tmp, "rows_new")
    write_bucketed(
        _sign_rows(new_ds, emb_col, id_col, n_planes, seed, concurrency),
        rows_new, "bucket", n_buckets)

    dups = _local_sign_dups(rows_new, id_col, id_type, threshold)

    if have_index:
        ver = bucketed_join(rows_new, embs_idx, join_type="inner")
        old_unit = "unit_r"  # clash renames of the right id/unit columns

        def cos(t: pa.Table) -> pa.Table:
            if old_unit not in t.column_names or t.num_rows == 0:
                return pa.table({id_col: pa.array([], id_type)})
            a = _unit_matrix(t.column("unit"))
            b = _unit_matrix(t.column(old_unit))
            hit = (a * b).sum(axis=1) >= threshold
            return pa.table({id_col: t.column(id_col).filter(pa.array(hit))})

        dups = dups.union(ver.map_batches(cos, batch_format="pyarrow"))

    # pin the dup-id set once (dup-bounded): both filter calls below
    # consume it, and a lazy union would re-run the local-dup pass and
    # the index verify join once per consumer (same pin the MinHash
    # incremental path carries); the pinned bare id column also lets
    # filter_by_ids skip its own re-materialize
    dups = dups.materialize()
    kept = filter_by_ids(new_ds, id_col, dups, keep_matching=False,
                         max_broadcast=max_broadcast)
    import glob as _glob

    files = sorted(_glob.glob(os.path.join(rows_new, "_bucket=*",
                                           "*.parquet")))
    if not files:
        empty = ray.data.from_arrow(pa.table({
            "bucket": pa.array([], pa.uint64()),
            id_col: pa.array([], id_type),
            "unit": pa.array([], pa.binary())}))
        return kept, empty
    rows = ray.data.read_parquet(files)
    if "_bucket" in rows.schema().names:
        rows = rows.drop_columns(["_bucket"])
    rows_kept = filter_by_ids(rows, id_col, dups, keep_matching=False,
                              max_broadcast=max_broadcast)
    return kept, rows_kept


def embedding_index_append(index_dir: str, rows_kept: ray.data.Dataset,
                           n_buckets: int = 32) -> None:
    """Commit one increment: append its (bucket, id, unit) rows into the
    index layout.  Call AFTER ``kept`` is durably written."""
    embs_idx = os.path.join(index_dir, _EMBS)
    if os.path.exists(os.path.join(embs_idx, "_layout.json")):
        n_buckets = layout_of(embs_idx)["n_buckets"]
    write_bucketed(rows_kept, embs_idx, "bucket", n_buckets)
