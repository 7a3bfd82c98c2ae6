"""Small Dataset-level utilities shared by the pipelines.

``drop_empty_blocks`` works around a Ray Data 2.49 sharp edge: groupby /
map_groups hash shuffles emit empty ZERO-COLUMN placeholder blocks (the
streaming executor's "RefBundle with a different schema ... new schema: ."
warning).  Those blocks break downstream ``Dataset.join`` (pyarrow acero
raises "No match ... for key field reference" on the schemaless partition)
and can poison schema-sensitive consumers.  map_batches can't fix them —
Ray skips the UDF for empty blocks — so the only reliable cure is to rebuild
the dataset from its non-empty block refs.  Metadata-only: no block data
ever moves to the driver.
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import ray.data


#: per-worker-process cache of deserialized broadcast payloads, keyed by
#: object-ref hex.  Broadcast map stages used to be actor POOLS so the
#: payload deserialized once per actor — but a pool pays its spin-up
#: (~2-3 s, measured) on EVERY execution and caps width at its max size;
#: plain tasks + this cache keep the deserialize-once property (numpy /
#: Arrow payloads are zero-copy plasma views anyway) while fusing with the
#: upstream read at full cluster width.  Tiny LRU: payloads are bounded by
#: the callers' broadcast caps, and a worker only ever sees a handful.
_BROADCAST_CACHE: dict = {}


def cached_broadcast(ref):
    """``ray.get(ref)``, deserialized at most once per worker process."""
    key = ref.hex()
    hit = _BROADCAST_CACHE.get(key)
    if hit is None:
        import ray as _ray

        if len(_BROADCAST_CACHE) >= 8:
            _BROADCAST_CACHE.pop(next(iter(_BROADCAST_CACHE)))
        hit = _BROADCAST_CACHE[key] = _ray.get(ref)
    return hit


def drop_empty_blocks(
    ds: ray.data.Dataset, empty_schema: Optional[pa.Schema] = None
) -> ray.data.Dataset:
    """Materialize ``ds`` and rebuild it from only its non-empty blocks.

    If every block is empty, returns a one-empty-block dataset with
    ``empty_schema`` (required in that case to keep downstream ops typed).
    Intended for aggregate-small datasets that feed a ``Dataset.join`` —
    the materialize is a no-op there (the data already fits the store).
    """
    mat = ds.materialize()
    refs = []
    for bundle in mat.iter_internal_ref_bundles():
        for ref, meta in zip(bundle.block_refs, bundle.metadata):
            if meta.num_rows:
                refs.append(ref)
    if not refs:
        if empty_schema is None:
            raise ValueError("all blocks empty and no empty_schema given")
        return ray.data.from_arrow(empty_schema.empty_table())
    return ray.data.from_arrow_refs(refs)


def adjacent_change(col) -> "np.ndarray":
    """Length ``n-1`` bool mask: True where row ``i+1`` differs from row
    ``i`` of an Arrow column — NULL-SAFE (null == null is *not* a change;
    null vs value is).  Use this instead of
    ``keys_np[1:] != keys_np[:-1]`` for any nullable numeric / timestamp
    key: ``to_numpy(zero_copy_only=False)`` maps those nulls to NaN/NaT and
    ``NaN != NaN`` is True, which would split one SQL null group into
    per-row segments.  (String keys become ``None`` in object arrays, where
    ``None != None`` is False — but this helper is safe for every type.)"""
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n <= 1:
        return np.zeros(max(n - 1, 0), dtype=bool)
    if pa.types.is_null(col.type):
        return np.zeros(n - 1, dtype=bool)  # all-null column: one run
    cur, prev = col.slice(1, n - 1), col.slice(0, n - 1)
    eq = pc.fill_null(pc.equal(cur, prev), False)
    both_null = pc.and_(pc.is_null(cur), pc.is_null(prev))
    same = pc.or_(eq, both_null).to_numpy(zero_copy_only=False)
    return ~same


def run_starts(col) -> "np.ndarray":
    """Length ``n`` bool mask: True at row 0 and at every null-safe value
    change (see :func:`adjacent_change`) — the first row of each run of a
    sorted column."""
    import numpy as np

    n = len(col)
    out = np.empty(n, dtype=bool)
    if n == 0:
        return out
    out[0] = True
    out[1:] = adjacent_change(col)
    return out


_KNUTH64 = 0x9E3779B97F4A7C15  # splitmix/Fibonacci multiplier (odd, bijective)


def _partition_hash(col) -> "np.ndarray":
    """uint64 partition hash of one key column: multiplicative mix for
    integer types (nulls -> 0), the repo's stable string hash otherwise.
    In-job stable only (polars-backed for strings) — never persist."""
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if pa.types.is_integer(col.type):
        filled = pc.fill_null(col, 0)
        if pa.types.is_unsigned_integer(col.type):
            v = filled.cast(pa.uint64()).to_numpy(zero_copy_only=False) \
                      .astype(np.uint64)
        else:
            v = filled.cast(pa.int64()).to_numpy(zero_copy_only=False) \
                      .view(np.uint64).copy()
        v *= np.uint64(_KNUTH64)
        v ^= v >> np.uint64(31)
        return v
    from .functions.hashing import stable_hash64_column

    if not (pa.types.is_string(col.type) or pa.types.is_large_string(col.type)
            or pa.types.is_binary(col.type)):
        col = col.cast(pa.string())
    return stable_hash64_column(col)


def keyed_partition_map(
    ds: ray.data.Dataset,
    key_cols,
    fn,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """ONE ``hash(key) % P`` exchange that hands ``fn`` each partition as a
    SINGLE Arrow table of complete groups — the cheap alternative to
    ``groupby(key).map_groups(per_group_fn)`` when the kernel is multi-key
    vectorized (lexsort + run masks / reduceat interiors).

    ``groupby(key).map_groups`` pays one Python dispatch + one table slice
    per GROUP; at 10^4+ keys that dominates wall time (measured: ~1.6 s of a
    3.7 s interval-merge at 1M rows / 10k keys).  Here the same keyed shuffle
    runs on a single int64 ``__part`` column and ``fn`` is invoked once per
    PARTITION (P ≈ cluster CPUs), so per-call overhead is O(P) not O(keys).

    Contracts: ``fn`` receives rows of every key hashed to the partition,
    un-ordered (sort inside), without the ``__part`` column, and must handle
    the multi-key case; per-PARTITION (≈ input_rows / P) memory replaces the
    per-key contract — same worst case as Ray's own groupby shuffle, which
    materializes partition-sized sort runs anyway.  Null keys hash to one
    fixed partition (SQL null-group semantics preserved downstream).

    Scheduling pitfall: when ``ds`` ends in a COMPUTE-HEAVY map, Ray's
    operator resource reservation can throttle that map on narrow clusters
    because the downstream sort reserves a resource share (measured: a
    shingling map ran ~1-wide at 4 CPUs, 3.5x total slowdown).  If the
    mapped rows are much smaller than their input, ``.materialize()`` the
    map output before calling this (see ``dedup.minhash_dup_ids``); cheap
    maps are unaffected.
    """
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    key_cols = list(key_cols)
    if num_partitions is None:
        import ray as _ray

        n_cpus = (int(_ray.cluster_resources().get("CPU", 8))
                  if _ray.is_initialized() else 8)
        # scale with the CLUSTER (2 partitions per core keeps wave slack);
        # the 4096 ceiling only bounds scheduler overhead on very large
        # clusters — per-partition memory = rows/P, so jobs where that
        # still exceeds a worker should pass num_partitions explicitly
        num_partitions = max(2, min(2 * n_cpus, 4096))
    P = num_partitions

    def add_part(batch: pa.Table) -> pa.Table:
        import numpy as np

        h = _partition_hash(batch.column(key_cols[0]))
        for c in key_cols[1:]:
            h = h * np.uint64(_KNUTH64) + _partition_hash(batch.column(c))
        part = (h % np.uint64(P)).astype(np.int64)
        return batch.append_column("__part", pa.array(part, pa.int64()))

    def run(part_tbl: pa.Table) -> pa.Table:
        return fn(part_tbl.drop_columns(["__part"]))

    return (ds.map_batches(add_part, batch_format="pyarrow")
              .groupby("__part")
              .map_groups(run, batch_format="pyarrow"))


def distinct_rows_by(
    ds: ray.data.Dataset,
    key_cols,
    num_partitions: Optional[int] = None,
    tiebreak_cols=None,
) -> ray.data.Dataset:
    """``DISTINCT ON (key_cols)``, one row per key — the partition-map
    replacement for ``groupby(keys).map_groups(lambda g: g.slice(0, 1))``,
    which pays a Python dispatch per key.  ONE hash exchange; interior is a
    sort + first-occurrence run mask.

    Determinism: the KEY columns of the output are always deterministic.
    The survivor's NON-key columns are arbitrary (they depend on shuffle
    arrival order) unless ``tiebreak_cols`` is given, in which case the
    survivor is the first row under an ascending sort of
    ``key_cols + tiebreak_cols`` — pass a total-ordering tiebreak (e.g. a
    unique id) for a fully deterministic row."""
    import numpy as np
    import pyarrow.compute as pc

    if isinstance(key_cols, str):
        key_cols = [key_cols]
    key_cols = list(key_cols)
    if isinstance(tiebreak_cols, str):
        tiebreak_cols = [tiebreak_cols]
    sort_cols = key_cols + list(tiebreak_cols or [])

    def first_per_key(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n <= 1:
            return part
        part = part.take(pc.sort_indices(
            part, sort_keys=[(k, "ascending") for k in sort_cols]))
        keep = np.zeros(n, dtype=bool)
        keep[0] = True
        for k in key_cols:
            keep[1:] |= adjacent_change(part.column(k))
        return part.filter(pa.array(keep))

    return keyed_partition_map(ds, key_cols, first_per_key,
                               num_partitions=num_partitions)


def count_by(
    ds: ray.data.Dataset,
    key_cols,
    alias: str = "n",
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """``SELECT keys, COUNT(*) GROUP BY keys`` as a partition map: per-batch
    Arrow ``group_by`` partials (map-side combine), ONE hash exchange on the
    keys, one local Arrow combine per partition.  Substantially faster than
    Ray's multi-key ``Aggregate`` for composite keys (measured ~3x on
    million-row pair tables) and returns exactly one row per key."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    key_cols = list(key_cols)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(key_cols).group_by(key_cols, use_threads=False) \
                 .aggregate([([], "count_all")])
        return g.rename_columns(key_cols + ["__n"]).set_column(
            len(key_cols), "__n", g.column("count_all").cast(pa.int64()))

    def final(part: pa.Table) -> pa.Table:
        g = part.group_by(key_cols, use_threads=False).aggregate(
            [("__n", "sum")])
        return g.rename_columns(key_cols + [alias]).set_column(
            len(key_cols), alias, g.column("__n_sum").cast(pa.int64()))

    return keyed_partition_map(ds.map_batches(partial,
                                              batch_format="pyarrow"),
                               key_cols, final,
                               num_partitions=num_partitions)


def sum_by(
    ds: ray.data.Dataset,
    key_cols,
    value_col: str,
    alias: str = "s",
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """``SELECT keys, SUM(value) GROUP BY keys`` with the same partial +
    partition-map shape as :func:`count_by`.  Integer values combine in
    int64 (exact, order-independent); float sums are pairwise-then-keyed
    (use integers for hash-stable oracles, the repo-wide convention)."""
    if isinstance(key_cols, str):
        key_cols = [key_cols]
    key_cols = list(key_cols)

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(key_cols + [value_col]) \
                 .group_by(key_cols, use_threads=False) \
                 .aggregate([(value_col, "sum")])
        return g.rename_columns(key_cols + ["__s"])

    def final(part: pa.Table) -> pa.Table:
        g = part.group_by(key_cols, use_threads=False).aggregate(
            [("__s", "sum")])
        return g.rename_columns(key_cols + [alias])

    return keyed_partition_map(ds.map_batches(partial,
                                              batch_format="pyarrow"),
                               key_cols, final,
                               num_partitions=num_partitions)


def bucketed_segments_map(
    ds: ray.data.Dataset,
    bucket_col: str,
    per_bucket,
    empty_out: pa.Table,
    min_rows: int = 2,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Replace ``groupby(bucket).map_groups(per_bucket)`` when buckets are
    MANY and TINY (LSH band buckets: mostly singletons, a few collision
    groups).  One hash exchange; each partition sorts by the bucket id once,
    drops every segment smaller than ``min_rows`` VECTORIZED (singletons
    never reach Python), and calls ``per_bucket`` on zero-copy table slices
    of the surviving segments only.  ``empty_out`` is a zero-row table with
    ``per_bucket``'s output schema (used when a partition has no surviving
    bucket).  ``per_bucket`` sees the bucket column, same as map_groups."""
    import numpy as np
    import pyarrow.compute as pc

    bucket_cols = ([bucket_col] if isinstance(bucket_col, str)
                   else list(bucket_col))

    def part_fn(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            return empty_out
        part = part.take(pc.sort_indices(
            part, sort_keys=[(c, "ascending") for c in bucket_cols]))
        new = np.zeros(n, dtype=bool)
        new[0] = True
        for c in bucket_cols:
            new[1:] |= adjacent_change(part.column(c))
        starts = np.flatnonzero(new)
        counts = np.diff(np.append(starts, n))
        outs = []
        for s, c in zip(starts[counts >= min_rows], counts[counts >= min_rows]):
            t = per_bucket(part.slice(int(s), int(c)))
            if t.num_rows:
                outs.append(t)
        if not outs:
            return empty_out
        return pa.concat_tables(outs, promote_options="default")

    return keyed_partition_map(ds, bucket_col, part_fn,
                               num_partitions=num_partitions)
