"""Deduplication pipelines (exact + near-dup) for large-scale corpora.

Not present in the reference (SURVEY.md §2.8 notes the gap); these are the
training-data-pipeline operators the engine needs at 100 TB, built on public
schemes: exact hash dedup, MinHash+LSH (Broder), SimHash (Charikar), n-gram
Jaccard verification, and embedding near-dup via random-projection bucketing.

Scale design:
  * every pipeline hash-partitions by a *stable* key (blake2b — never
    Python's randomized hash), so bucketing is reproducible across workers;
  * candidate generation is always bucketed (LSH bands / sign-bands) — no
    O(n^2) comparisons ever leave a bucket;
  * keep-first semantics use the minimum ``id_col`` as the canonical winner,
    which is deterministic and needs no global coordination;
  * the only shuffles are groupbys on short keys (hash, band_key), with
    signatures computed map-side once in a stateful actor.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import (
    MinHasher,
    shingle_hashes_many,
    simhash64_many,
    stable_hash64_column,
)
from ..functions.textstats import word_ngrams

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


#: rows above which the winner set is no longer broadcast to every task but
#: semi-joined with a hash shuffle (a corpus-cardinality set on the driver is
#: the classic 10^9-row OOM)
MAX_BROADCAST_ROWS = 2_000_000

#: colliding-set size below which minhash verify/distinct runs driver-side
#: (bounded: rows x ~1 KB signature ≈ 50 MB max on the driver)
SMALL_VERIFY_ROWS = 50_000


def _join_partitions() -> int:
    """Partition count for Dataset.join: the hash-shuffle aggregator actors
    occupy scheduling slots, so never exceed the cluster CPU count (a
    num_partitions > CPUs join starves itself at small cluster sizes)."""
    import ray as _ray

    n_cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    return max(2, min(n_cpus, 128))


#: target rows per hash-join partition when the input size is known — the
#: other half of the partition-count tradeoff: each aggregator actor costs a
#: scheduling slot and ~1s of spawn/teardown, so a row-bounded join should
#: spawn only as many as its data fills (measured: a 262k-pair join at 32
#: partitions on 32 CPUs runs 4x slower than at 8 partitions)
JOIN_ROWS_PER_PARTITION = 250_000


def join_partitions_for(*row_counts: int) -> int:
    """Size-aware partition count for Dataset.join: enough partitions that
    the LARGER side stays near JOIN_ROWS_PER_PARTITION per aggregator, never
    more than the CPU cap of :func:`_join_partitions`.  Use whenever a join
    input's row count is already known (e.g. just materialized) — at corpus
    scale the count/quotient exceeds the CPU cap so behavior is unchanged;
    at small scale it stops the aggregator-actor storm."""
    n = max([1, *row_counts])
    need = -(-n // JOIN_ROWS_PER_PARTITION)  # ceil
    return max(2, min(_join_partitions(), need))


def exact_dedup(
    ds: ray.data.Dataset, col: str, id_col: str,
    num_partitions: Optional[int] = None, strict: bool = False,
    max_broadcast: int = MAX_BROADCAST_ROWS,
) -> ray.data.Dataset:
    """Keep one row per distinct ``col`` value — the row with min ``id_col``.

    Path selection (scale-safe by default): groupby a 64-bit stable hash of
    the value and take ``Min(id)`` (the shuffle moves only (hash, id) pairs —
    not the payload).  The winner-id set is then applied either as

      * a broadcast semi-join (``ray.put`` once, vectorized ``np.isin`` per
        batch) — only when the input row count PROVES the winner set fits
        (``<= max_broadcast`` rows; input count is parquet-metadata-cheap for
        read datasets), or
      * a hash shuffle join (``Dataset.join``) sized to the cluster — the
        default at corpus scale, where a driver-resident winner set would be
        corpus-cardinality (one id per distinct value).

    Pass ``num_partitions`` to force the join path with an explicit size.
    A 64-bit collision would merge two distinct values (~n^2/2^65 odds —
    ~3e-2 expected collisions at 10^12 rows); ``strict=True`` uses the
    value-rechecking group-scan path instead.
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        h = pa.array(stable_hash64_column(batch.column(col)), pa.uint64())
        return batch.append_column("__h", h)

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    if strict:
        # equal VALUES co-locate under the hash partitioning, so one
        # (value, id) sort + a first-occurrence run mask keeps the min-id
        # row per distinct value for every hash of the partition at once —
        # value equality is re-checked on the actual strings, so a 64-bit
        # hash collision cannot merge two distinct values
        def keep_first_partition(part: pa.Table) -> pa.Table:
            import pyarrow.compute as _pc2

            n = part.num_rows
            if n <= 1:
                return part.drop_columns(["__h"])
            part = part.take(_pc2.sort_indices(part, sort_keys=[
                (col, "ascending"), (id_col, "ascending")]))
            c = part.column(col).combine_chunks()
            cur, prev = c.slice(1, n - 1), c.slice(0, n - 1)
            same = _pc2.fill_null(_pc2.equal(cur, prev), False)
            both_null = _pc2.and_(_pc2.is_null(cur), _pc2.is_null(prev))
            dup = _pc2.or_(same, both_null).to_numpy(zero_copy_only=False)
            keep = np.ones(n, dtype=bool)
            keep[1:] = ~dup
            return part.filter(pa.array(keep)).drop_columns(["__h"])

        from ..dsutil import keyed_partition_map

        return keyed_partition_map(hashed, "__h", keep_first_partition)

    from ray.data.aggregate import Min

    winners = hashed.select_columns(["__h", id_col]).groupby("__h").aggregate(
        Min(id_col, alias_name="__keep")
    ).select_columns(["__keep"])

    use_join = num_partitions is not None or ds.count() > max_broadcast
    if use_join:
        kept = hashed.join(
            winners, join_type="inner",
            num_partitions=num_partitions or _join_partitions(),
            on=(id_col,), right_on=("__keep",),
        )
        return kept.drop_columns(["__h"])

    import ray as _ray

    winner_rows = winners.take_all()
    keys = frozenset(r["__keep"] for r in winner_rows)
    numeric_keys = None
    if keys and not any(isinstance(k, str) for k in keys):
        numeric_keys = np.sort(np.fromiter(keys, dtype=np.int64,
                                           count=len(keys)))
    ref = _ray.put(numeric_keys if numeric_keys is not None else keys)

    # plain tasks + per-worker payload cache, not an actor pool: pools pay
    # spin-up per execution and cap the filter at their max width (see
    # dsutil.cached_broadcast / filter_by_ids)
    def keep_winners(batch: pa.Table) -> pa.Table:
        from ..dsutil import cached_broadcast

        ks = cached_broadcast(ref)
        ids = batch.column(id_col)
        if isinstance(ks, np.ndarray):
            vals = ids.to_numpy(zero_copy_only=False)
            mask = pa.array(np.isin(vals, ks, assume_unique=False))
        else:
            mask = pa.array([v in ks for v in ids.to_pylist()])
        return batch.filter(mask).drop_columns(["__h"])

    return hashed.map_batches(keep_winners, batch_format="pyarrow")


def exact_dedup_keep_best(
    ds: ray.data.Dataset, col: str, id_col: str, score_col: str,
    num_partitions: Optional[int] = None,
    max_broadcast: int = MAX_BROADCAST_ROWS,
) -> ray.data.Dataset:
    """Keep one row per distinct ``col`` value — the row with MAX
    ``score_col``, ties broken by min ``id_col``.

    The quality-aware twin of :func:`exact_dedup`: crawl pipelines usually
    want the longest / highest-quality variant of a duplicate cluster, not
    the lowest-id one (e.g. keep the full article over its truncated
    syndication copy).  Same scale shape — the shuffle moves only
    (hash, id, score) triples, never the payload:

      1. per-hash ``Max(score)`` (one keyed aggregate),
      2. join the triples back, keep rows at the max, per-hash ``Min(id)``
         (second keyed aggregate resolves score ties deterministically),
      3. apply the winner-id set via :func:`filter_by_ids`'s
         broadcast-or-join path.

    ``score_col`` may be any orderable numeric column.  A 64-bit hash
    collision merges two distinct values (odds as in :func:`exact_dedup`).
    """
    from ray.data.aggregate import Max, Min

    from ..dsutil import drop_empty_blocks

    def add_hash(batch: pa.Table) -> pa.Table:
        # int64 reinterpretation of the 64-bit hash (bijective wraparound):
        # the Dataset.join hash exchange handles uint64 keys by falling back
        # to Python ints, which overflow Arrow conversion
        h = pa.array(stable_hash64_column(batch.column(col))
                     .view(np.int64), pa.int64())
        return batch.append_column("__h", h)

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")
    triples = hashed.select_columns(["__h", id_col, score_col])
    score_t = ds.schema().base_schema.field(score_col).type
    id_t = ds.schema().base_schema.field(id_col).type
    mx = drop_empty_blocks(
        triples.groupby("__h").aggregate(Max(score_col, alias_name="__ms"))
        .map_batches(lambda t: t.rename_columns(["__hm", "__ms"]),
                     batch_format="pyarrow"),
        empty_schema=pa.schema([("__hm", pa.int64()), ("__ms", score_t)]))
    at_max = drop_empty_blocks(
        triples, empty_schema=pa.schema(
            [("__h", pa.int64()), (id_col, id_t), (score_col, score_t)])) \
        .join(mx, join_type="inner",
              num_partitions=num_partitions or _join_partitions(),
              on=("__h",), right_on=("__hm",)) \
        .filter(expr=f"{score_col} == __ms")
    winners = at_max.groupby("__h").aggregate(
        Min(id_col, alias_name="__keep"))
    return filter_by_ids(ds, id_col, winners, ids_col="__keep",
                         keep_matching=True, max_broadcast=max_broadcast,
                         num_partitions=num_partitions)


# ---------------------------------------------------------------------------
# scale-aware id filtering (shared by all dup-id consumers)
# ---------------------------------------------------------------------------


def filter_by_ids(
    ds: ray.data.Dataset, id_col: str,
    ids: ray.data.Dataset, ids_col: Optional[str] = None,
    keep_matching: bool = False,
    max_broadcast: int = MAX_BROADCAST_ROWS,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Semi/anti-join ``ds`` against an id Dataset, scale-aware.

    The id side is materialized once (it is dup-set-sized — object-store
    resident and spillable, never a driver list), then either

      * broadcast (``ray.put`` one frozenset/np array, vectorized ``np.isin``
        per batch) when it has ``<= max_broadcast`` rows, or
      * applied as a native hash-shuffle ``left_semi`` / ``left_anti`` join —
        the path that stays bounded on a 30-60%-duplicate web crawl where
        the dup-id set is itself corpus-scale.
    """
    from ray.data.dataset import MaterializedDataset

    from ..dsutil import drop_empty_blocks

    ids_col = ids_col or id_col
    if isinstance(ids, MaterializedDataset) and \
            ids.schema().names == [ids_col]:
        # already pinned and already the bare id column: re-materializing
        # would burn one fixed-latency execution per call for a no-op
        # projection (callers like the incremental dedup paths pin the dup
        # set once and filter two datasets against it)
        mat = ids
    else:
        mat = ids.select_columns([ids_col]).materialize()
    n = mat.count()
    if n == 0:
        # nothing to match: anti keeps everything, semi keeps nothing
        return ds if not keep_matching else ds.limit(0)
    if n > max_broadcast:
        # groupby-derived id sets carry empty zero-column blocks that break
        # the pyarrow hash join; compact them away first (metadata-only)
        return ds.join(
            drop_empty_blocks(mat),
            join_type=("left_semi" if keep_matching else "left_anti"),
            num_partitions=num_partitions or _join_partitions(),
            on=(id_col,), right_on=(ids_col,),
        )

    import ray as _ray

    vals = [r[ids_col] for r in mat.take_all()]
    numeric = bool(vals) and not any(isinstance(v, str) for v in vals)
    payload = (np.sort(np.asarray(vals, dtype=np.int64)) if numeric
               else frozenset(vals))
    ref = _ray.put(payload)
    keep = keep_matching

    # plain tasks + per-worker payload cache, NOT an actor pool: a pool
    # pays its spin-up on every execution and caps the filter's width at
    # its max size (measured: the kept pass of the incremental dedup drill
    # ran SLOWER at 16 CPUs than at 4 under the old (1, 8) pool)
    def bfilter(batch: pa.Table) -> pa.Table:
        from ..dsutil import cached_broadcast

        keys = cached_broadcast(ref)
        col = batch.column(id_col)
        if isinstance(keys, np.ndarray):
            hit = np.isin(col.to_numpy(zero_copy_only=False), keys)
        else:
            hit = np.fromiter((v in keys for v in col.to_pylist()),
                              dtype=bool, count=len(col))
        return batch.filter(pa.array(hit if keep else ~hit))

    return ds.map_batches(bfilter, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


class MinHashStage:
    """Actor stage: shingle -> MinHash signature -> LSH band keys.

    Permutation coefficients are built once per actor in ``__init__``.
    """

    def __init__(self, col: str, id_col: str, num_perm: int = 128,
                 num_bands: int = 16, ngram: int = 3, seed: int = 42):
        self.col, self.id_col = col, id_col
        self.hasher = MinHasher(num_perm=num_perm, seed=seed)
        self.num_bands = num_bands
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.col).to_pylist()
        ids = batch.column(self.id_col)
        # numeric shingle pipeline: polars tokenize+word-hash, rolling
        # combine, chunked mix — no shingle strings ever materialize
        hashes, lengths = shingle_hashes_many(texts, self.ngram)
        sigs = self.hasher.signature_from_hashes(hashes, lengths)  # (n, perm)
        keys = self.hasher.band_keys_many(sigs, self.num_bands)    # (n, bands)
        n = len(texts)
        B = self.num_bands
        rep = np.repeat(np.arange(n), B)
        sig_bytes = [s.tobytes() for s in sigs]
        return pa.table(
            {"band_key": pa.array(keys.ravel(), pa.uint64()),
             self.id_col: ids.take(pa.array(rep)),
             "sig": pa.array([sig_bytes[i] for i in rep], pa.binary())}
        )


class MinHashDocStage(MinHashStage):
    """Stage emitting ONE row per doc: (id, sig bytes, bands fixed-size
    list) — the per-band explode happens in a cheap downstream projection
    so the corpus-wide band exchange can carry 16-byte rows while the 1 KB
    signature stays one-per-doc (see ``minhash_dup_ids``).
    ``bands_only`` skips the signature-bytes serialization for the
    corpus-wide pass (the sig would be ~1 KB/doc of immediately-discarded
    allocation there)."""

    def _sign(self, batch: pa.Table):
        texts = batch.column(self.col).to_pylist()
        hashes, lengths = shingle_hashes_many(texts, self.ngram)
        sigs = self.hasher.signature_from_hashes(hashes, lengths)
        keys = self.hasher.band_keys_many(sigs, self.num_bands)  # (n, B)
        bands = pa.FixedSizeListArray.from_arrays(
            pa.array(keys.ravel(), pa.uint64()), self.num_bands)
        return sigs, bands

    def bands_only(self, batch: pa.Table) -> pa.Table:
        _, bands = self._sign(batch)
        return pa.table({self.id_col: batch.column(self.id_col),
                         "bands": bands})

    def __call__(self, batch: pa.Table) -> pa.Table:
        sigs, bands = self._sign(batch)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "sig": pa.array([s.tobytes() for s in sigs], pa.binary()),
            "bands": bands,
        })


def _bucket_dups(group: pa.Table, id_col: str, threshold: float,
                 max_bucket: int = 2048) -> pa.Table:
    """Within one LSH bucket: mark every non-min doc whose estimated Jaccard
    vs the bucket's current canonical doc >= threshold as a duplicate.

    A group may legitimately carry the SAME id on several rows — the
    incremental path's sig join emits one row per keeper signature, and a
    doc whose shrunk rows straddled a batch boundary keeps two (see
    ``minhashindex._shrink_sig_rows``).  Those repeats are skipped: a doc
    estimates Jaccard 1.0 against itself and would otherwise be dropped as
    a duplicate of itself (data loss, not just wasted work)."""
    n = group.num_rows
    empty = pa.table({id_col: pa.array([], group.column(id_col).type)})
    if n < 2:
        return empty
    if n > max_bucket:
        group = group.slice(0, max_bucket)  # salt/cap degenerate buckets
        n = max_bucket
    ids = group.column(id_col).to_pylist()
    sigs = [np.frombuffer(b, dtype=np.uint64) for b in group.column("sig").to_pylist()]
    order = sorted(range(n), key=lambda i: ids[i])
    order = [i for k, i in enumerate(order)
             if k == 0 or ids[i] != ids[order[k - 1]]]
    canon = [order[0]]
    dups = []
    for i in order[1:]:
        is_dup = False
        for c in canon:
            est = float(np.mean(sigs[i] == sigs[c]))
            if est >= threshold:
                is_dup = True
                break
        if is_dup:
            dups.append(ids[i])
        else:
            canon.append(i)
    if not dups:
        return empty
    return pa.table({id_col: pa.array(sorted(set(dups)), group.column(id_col).type)})


#: per-worker-process stage cache for the task-based minhash path — the
#: compiled state (permutation coefficients) builds once per worker and
#: every task reuses it, the same build-once semantics as an actor pool
#: without the pool's autoscaling ramp (extraction.py's measured pattern)
_MINHASH_STAGE_CACHE: dict = {}


_GENERIC_STAGE_CACHE: dict = {}


def _stage_task(cls, **kwargs):
    """Per-worker cached stage instance wrapped as a plain map task — the
    build-once semantics of an actor pool without its per-execution
    spin-up (~2-3 s, measured) or width cap (pools ran signing stages
    at most 8-wide regardless of cluster size).  ``kwargs`` must be
    hashable; behavior must depend only on them."""
    key = (cls.__qualname__, tuple(sorted(kwargs.items())))

    def run(batch: pa.Table) -> pa.Table:
        st = _GENERIC_STAGE_CACHE.get(key)
        if st is None:
            st = _GENERIC_STAGE_CACHE[key] = cls(**kwargs)
        return st(batch)

    return run


def _cached_minhash_stage(col: str, id_col: str, num_perm: int,
                          num_bands: int, ngram: int) -> "MinHashDocStage":
    key = (col, id_col, num_perm, num_bands, ngram)
    st = _MINHASH_STAGE_CACHE.get(key)
    if st is None:
        st = _MINHASH_STAGE_CACHE[key] = MinHashDocStage(
            col=col, id_col=id_col, num_perm=num_perm,
            num_bands=num_bands, ngram=ngram)
    return st


def minhash_dup_ids(
    ds: ray.data.Dataset, col: str, id_col: str,
    threshold: float = 0.8, num_perm: int = 128, num_bands: int = 16,
    ngram: int = 3, concurrency=(1, 8),
    max_broadcast: int = MAX_BROADCAST_ROWS,
) -> ray.data.Dataset:
    """IDs judged near-duplicates (keep-first by min id within LSH buckets).

    Scale shape (round 4): the corpus-wide band exchange carries 16-byte
    (band_key, id) rows, streamed by fused read->shingle->band TASKS with
    per-worker cached state (no actor ramp, nothing corpus-sized
    materialized — the previous shape shipped each doc's num_perm*8-byte
    signature on every band row: 3.3 GB exchanged for a 60 MB corpus, and
    a 6.5 GB signature materialize at 6.4M docs).  Docs colliding in >= 1
    band (candidate-bounded) get their signatures RECOMPUTED by a second,
    id-filtered pass over the source — deterministic (fixed seed), and
    hashing the tiny colliding subset costs less than storing 1 KB/doc for
    the whole corpus.  Output is identical to the one-shot path: the same
    >= 2-row buckets reach the same ``_bucket_dups`` verdicts.
    ``concurrency`` is kept for API compatibility (the task-based stages
    schedule like any map)."""
    from ..dsutil import (bucketed_segments_map, distinct_rows_by,
                          drop_empty_blocks)

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    B = num_bands

    def band_rows(batch: pa.Table) -> pa.Table:
        st = _cached_minhash_stage(col, id_col, num_perm, num_bands, ngram)
        t = st.bands_only(batch)
        bands = t.column("bands")
        if isinstance(bands, pa.ChunkedArray):
            bands = bands.combine_chunks()
        rep = np.repeat(np.arange(t.num_rows, dtype=np.int64), B)
        return pa.table({"band_key": bands.flatten(),
                         id_col: t.column(id_col).take(pa.array(rep))})

    # materialize the band rows BEFORE the exchange: with a compute-heavy
    # map feeding an all-to-all in one streaming graph, Ray's operator
    # resource reservation throttles the map on narrow clusters (measured
    # at 4 CPUs / 6.4M docs: the fused map ran ~1-wide, 436 s streamed vs
    # 125 s with the barrier; at 16 CPUs the gap vanishes).  Band rows are
    # 16 bytes x num_bands per doc — ~1/60 of the text they derive from —
    # and the sort materializes the same rows internally anyway, so the
    # extra object-store cost is a transient 2x of the small side.
    bands_ds = ds.select_columns([id_col, col]).map_batches(
        band_rows, batch_format="pyarrow").materialize()
    collide_empty = pa.table({"band_key": pa.array([], pa.uint64()),
                              id_col: pa.array([], id_type)})
    # compact away the exchange's empty output blocks (metadata-only):
    # every downstream stage pays per-BLOCK task/sample latency, and the
    # colliding set is candidate-bounded — often 100x fewer rows than
    # blocks otherwise
    colliding = drop_empty_blocks(
        bucketed_segments_map(bands_ds, "band_key", lambda g: g,
                              empty_out=collide_empty).materialize(),
        empty_schema=collide_empty.schema)
    n_collide = colliding.count()
    if n_collide == 0:  # no band collisions anywhere: no duplicates
        return ray.data.from_arrow(pa.table({id_col: pa.array([], id_type)}))
    # candidate-bounded exchanges get row-count-sized partitioning: Ray's
    # sort shuffle has seconds of FIXED cost per partition wave, so a
    # 16k-row exchange must not fan out to 2x-CPUs reduce tasks
    P_small = max(2, min(-(-n_collide // 50_000), 4096))

    def sig_rows(batch: pa.Table) -> pa.Table:
        st = _cached_minhash_stage(col, id_col, num_perm, num_bands, ngram)
        return st(batch).select([id_col, "sig"])

    # signatures of colliding docs only (duplicate ids in the filter list
    # are fine — is_in semantics — so no distinct exchange is spent here)
    sig_sub = filter_by_ids(ds.select_columns([id_col, col]), id_col,
                            colliding.select_columns([id_col]),
                            keep_matching=True,
                            max_broadcast=max_broadcast) \
        .map_batches(sig_rows, batch_format="pyarrow").materialize()

    if n_collide <= SMALL_VERIFY_ROWS:
        # tiny tail: the remaining work is a join + two exchanges over a
        # PROVABLY bounded set (<= 50k rows x ~1 KB sig = ~50 MB) whose
        # distributed form costs seconds of pure exchange latency — run
        # the identical verify/distinct driver-side (same groups, same
        # _bucket_dups verdicts)
        import pyarrow.compute as pc
        import ray as _ray

        col_tbl = pa.concat_tables(
            [t for t in _ray.get(colliding.to_arrow_refs()) if t.num_rows])
        sig_tbl = pa.concat_tables(
            [t for t in _ray.get(sig_sub.to_arrow_refs()) if t.num_rows])
        idx = pc.index_in(col_tbl.column(id_col),
                          value_set=sig_tbl.column(id_col).combine_chunks())
        tbl = col_tbl.append_column(
            "sig", sig_tbl.column("sig").combine_chunks().take(
                idx.combine_chunks()))
        tbl = tbl.take(pc.sort_indices(
            tbl, sort_keys=[("band_key", "ascending")]))
        keys = tbl.column("band_key").to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, keys[1:] != keys[:-1]])
        ends = np.r_[starts[1:], len(keys)]
        outs = []
        for s, e in zip(starts, ends):
            if e - s >= 2:
                d = _bucket_dups(tbl.slice(int(s), int(e - s)), id_col,
                                 threshold)
                if d.num_rows:
                    outs.append(d)
        if outs:
            ids = pc.unique(pa.concat_tables(outs).column(id_col)
                            .combine_chunks())
            out_tbl = pa.table({id_col: ids.take(pc.sort_indices(ids))})
        else:
            out_tbl = pa.table({id_col: pa.array([], id_type)})
        return ray.data.from_arrow(out_tbl)
    if sig_sub.count() <= max_broadcast:
        from .joins import broadcast_join

        joined = broadcast_join(colliding, sig_sub, on=id_col,
                                add_cols=["sig"], how="inner")
    else:
        from ..dsutil import drop_empty_blocks

        joined = colliding.join(
            drop_empty_blocks(sig_sub), join_type="inner",
            num_partitions=join_partitions_for(n_collide),
            on=(id_col,))
    dup = bucketed_segments_map(
        joined, "band_key", lambda g: _bucket_dups(g, id_col, threshold),
        empty_out=pa.table({id_col: pa.array([], id_type)}),
        num_partitions=P_small)
    # a doc can be flagged in several bands -> distinct
    return distinct_rows_by(dup, id_col, num_partitions=P_small)


def minhash_dedup(
    ds: ray.data.Dataset, col: str, id_col: str, threshold: float = 0.8,
    max_broadcast: int = MAX_BROADCAST_ROWS, **kwargs,
) -> ray.data.Dataset:
    """Filter near-duplicates out of ``ds``.

    Dup-id application is scale-aware (:func:`filter_by_ids`): broadcast
    below ``max_broadcast`` ids, hash-shuffle ``left_anti`` join above — on a
    30-60%-duplicate web crawl the dup-id set is corpus-scale and must never
    land on the driver.
    """
    dup = minhash_dup_ids(ds, col, id_col, threshold, **kwargs)
    return filter_by_ids(ds, id_col, dup, keep_matching=False,
                         max_broadcast=max_broadcast)


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


class SimHashStage:
    """Actor stage: token -> 64-bit SimHash; emits one row per band.

    With ``num_bands`` equal-width bands, any pair within Hamming distance
    ``num_bands - 1`` is guaranteed to share >= 1 band (pigeonhole).  More
    bands -> higher recall but coarser buckets (band width 64/num_bands bits);
    size it to the target ``max_hamming``.
    """

    def __init__(self, col: str, id_col: str, ngram: int = 1, num_bands: int = 4):
        assert 64 % num_bands == 0, "num_bands must divide 64"
        self.col, self.id_col, self.ngram = col, id_col, ngram
        self.num_bands = num_bands
        self.width = 64 // num_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.col).to_pylist()
        ids = batch.column(self.id_col)
        sigs = simhash64_many([word_ngrams(t or "", self.ngram) for t in texts])
        n = len(texts)
        B = self.num_bands
        mask = np.uint64((1 << self.width) - 1)
        t_idx = np.arange(B, dtype=np.uint64)
        with np.errstate(over="ignore"):
            bands = (sigs[:, None] >> (np.uint64(self.width) * t_idx[None, :])) & mask
            keys = (t_idx[None, :] << np.uint64(56)) | bands  # (n, B)
        rep = np.repeat(np.arange(n), B)
        return pa.table(
            {"band_key": pa.array(keys.ravel(), pa.uint64()),
             self.id_col: ids.take(pa.array(rep)),
             "sig": pa.array(np.repeat(sigs, B), pa.uint64())}
        )


def simhash_dup_ids(
    ds: ray.data.Dataset, col: str, id_col: str, max_hamming: int = 3,
    ngram: int = 1, num_bands: int = 4, concurrency=(1, 8),
) -> ray.data.Dataset:
    """IDs whose SimHash is within ``max_hamming`` of a smaller-id doc."""

    def bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({id_col: pa.array([], group.column(id_col).type)})
        if n < 2:
            return empty
        ids = group.column(id_col).to_pylist()
        sigs = group.column("sig").to_pylist()
        order = sorted(range(min(n, 2048)), key=lambda i: ids[i])
        canon, dups = [order[0]], []
        for i in order[1:]:
            if any(bin(sigs[i] ^ sigs[c]).count("1") <= max_hamming for c in canon):
                dups.append(ids[i])
            else:
                canon.append(i)
        if not dups:
            return empty
        return pa.table({id_col: pa.array(sorted(set(dups)), group.column(id_col).type)})

    sigs = ds.select_columns([id_col, col]).map_batches(
        _stage_task(SimHashStage, col=col, id_col=id_col, ngram=ngram,
                    num_bands=num_bands),
        batch_format="pyarrow",
    )
    from ..dsutil import bucketed_segments_map, distinct_rows_by

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    dup = bucketed_segments_map(
        sigs, "band_key", bucket,
        empty_out=pa.table({id_col: pa.array([], id_type)}))
    return distinct_rows_by(dup, id_col)


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verify inside LSH buckets)
# ---------------------------------------------------------------------------


def jaccard_dup_pairs(
    ds: ray.data.Dataset, col: str, id_col: str, threshold: float = 0.8,
    ngram: int = 3, num_perm: int = 128, num_bands: int = 16,
    concurrency=(1, 8), verify: str = "inline",
) -> ray.data.Dataset:
    """Candidate pairs from MinHash LSH, verified with EXACT n-gram Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b.

    ``verify``:
      * ``"inline"`` — text travels with the band rows and verification
        happens inside the bucket.  One shuffle, but every doc's text is
        replicated ``num_bands`` times through the exchange — fine at
        moderate scale, a 16x shuffle-volume tax on a 100 TB corpus.
      * ``"join"`` — the scale path: candidate (id_a, id_b) pairs come from
        signature-only buckets (8-byte keys through the shuffle), then the
        pair list (dup-candidate-sized, << corpus) joins each side's text
        back and verification runs per batch.  Two extra hash joins, zero
        text amplification.
    """
    if verify == "join":
        return _jaccard_pairs_join(ds, col, id_col, threshold, ngram,
                                   num_perm, num_bands, concurrency)

    class Stage(MinHashStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch)
            texts = batch.column(self.col).to_pylist()
            ids = batch.column(self.id_col).to_pylist()
            text_of = {i: (t or "") for i, t in zip(ids, texts)}
            col_txt = pa.array([text_of[i] for i in out.column(self.id_col).to_pylist()], pa.string())
            return out.append_column("__text", col_txt)

    def verify(group: pa.Table) -> pa.Table:
        n = min(group.num_rows, 512)
        ids = group.column(id_col).to_pylist()[:n]
        texts = group.column("__text").to_pylist()[:n]
        shingle_sets = [set(word_ngrams(t, ngram)) for t in texts]
        out_a, out_b, out_j = [], [], []
        for i in range(n):
            for j in range(i + 1, n):
                a, b = shingle_sets[i], shingle_sets[j]
                if not a and not b:
                    continue
                inter = len(a & b)
                jac = inter / (len(a) + len(b) - inter) if (a or b) else 1.0
                if jac >= threshold:
                    lo, hi = sorted((ids[i], ids[j]))
                    out_a.append(lo)
                    out_b.append(hi)
                    out_j.append(jac)
        return pa.table(
            {"id_a": pa.array(out_a, group.column(id_col).type),
             "id_b": pa.array(out_b, group.column(id_col).type),
             "jaccard": pa.array(out_j, pa.float64())}
        )

    sigs = ds.select_columns([id_col, col]).map_batches(
        _stage_task(Stage, col=col, id_col=id_col, num_perm=num_perm,
                    num_bands=num_bands, ngram=ngram),
        batch_format="pyarrow",
    )
    from ..dsutil import bucketed_segments_map, distinct_rows_by

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    pairs = bucketed_segments_map(
        sigs, "band_key", verify,
        empty_out=pa.table({"id_a": pa.array([], id_type),
                            "id_b": pa.array([], id_type),
                            "jaccard": pa.array([], pa.float64())}))
    # same pair can surface from several bands -> distinct on (id_a, id_b)
    return distinct_rows_by(pairs, ["id_a", "id_b"])


def _jaccard_pairs_join(
    ds: ray.data.Dataset, col: str, id_col: str, threshold: float,
    ngram: int, num_perm: int, num_bands: int, concurrency,
) -> ray.data.Dataset:
    """verify='join' path of :func:`jaccard_dup_pairs`: signature-only
    bucketing, candidate pairs as bare ids, texts joined back for the exact
    verify — no per-band text replication through the shuffle."""
    from ..dsutil import drop_empty_blocks

    P = _join_partitions()
    id_type = ds.schema().base_schema.field(id_col).type
    pair_schema = pa.schema([("id_a", id_type), ("id_b", id_type)])

    sigs = ds.select_columns([id_col, col]).map_batches(
        _stage_task(MinHashStage, col=col, id_col=id_col, num_perm=num_perm,
                    num_bands=num_bands, ngram=ngram),
        batch_format="pyarrow",
    )

    def cand(group: pa.Table) -> pa.Table:
        n = min(group.num_rows, 512)
        ids = sorted(group.column(id_col).to_pylist()[:n])
        out_a, out_b = [], []
        for i in range(len(ids)):
            for j in range(i + 1, len(ids)):
                if ids[i] != ids[j]:
                    out_a.append(ids[i])
                    out_b.append(ids[j])
        return pa.table({"id_a": pa.array(out_a, id_type),
                         "id_b": pa.array(out_b, id_type)})

    from ..dsutil import bucketed_segments_map, distinct_rows_by

    pairs = bucketed_segments_map(
        sigs, "band_key", cand,
        empty_out=pa.table({"id_a": pa.array([], id_type),
                            "id_b": pa.array([], id_type)}))
    pairs = distinct_rows_by(pairs, ["id_a", "id_b"])
    pairs = drop_empty_blocks(pairs, empty_schema=pair_schema)

    texts = ds.select_columns([id_col, col])
    j1 = pairs.join(texts, join_type="inner", num_partitions=P,
                    on=("id_a",), right_on=(id_col,)).map_batches(
        lambda t: pa.table({"id_a": t.column("id_a"), "id_b": t.column("id_b"),
                            "__ta": t.column(col)}),
        batch_format="pyarrow")
    j1 = drop_empty_blocks(
        j1, empty_schema=pa.schema([("id_a", id_type), ("id_b", id_type),
                                    ("__ta", pa.string())]))
    j2 = j1.join(texts, join_type="inner", num_partitions=P,
                 on=("id_b",), right_on=(id_col,))

    def verify_pair(batch: pa.Table) -> pa.Table:
        out_a, out_b, out_j = [], [], []
        for a, b, ta, tb in zip(batch.column("id_a").to_pylist(),
                                batch.column("id_b").to_pylist(),
                                batch.column("__ta").to_pylist(),
                                batch.column(col).to_pylist()):
            sa = set(word_ngrams(ta or "", ngram))
            sb = set(word_ngrams(tb or "", ngram))
            if not sa and not sb:
                continue
            inter = len(sa & sb)
            jac = inter / (len(sa) + len(sb) - inter)
            if jac >= threshold:
                out_a.append(a)
                out_b.append(b)
                out_j.append(jac)
        return pa.table({"id_a": pa.array(out_a, id_type),
                         "id_b": pa.array(out_b, id_type),
                         "jaccard": pa.array(out_j, pa.float64())})

    return j2.map_batches(verify_pair, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# connected components over dup pairs (cluster-level keep-first)
# ---------------------------------------------------------------------------


def dup_components(pairs: ray.data.Dataset, id_a: str = "id_a", id_b: str = "id_b"):
    """Union-find over a duplicate-pair edge list -> {id: component_root}.

    Bucket-level keep-first can split a transitive dup chain (A~B in one
    bucket, B~C in another); components merge them.  Driver-resident path for
    edge lists that fit (:func:`dup_components_distributed` is the
    groupby-rounds alternative for edge lists beyond driver memory).
    Root = min id of the component (deterministic keep-first winner).
    """
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.select_columns([id_a, id_b]).take_all():
        a, b = r[id_a], r[id_b]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # root at the smaller id so the winner is deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    return {x: find(x) for x in parent}


def dup_components_distributed(
    pairs: ray.data.Dataset, id_a: str = "id_a", id_b: str = "id_b",
    max_rounds: int = 12, num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Min-label propagation over the dup-pair edge list -> Dataset(id, root).

    The distributed alternative to :func:`dup_components` for edge lists
    beyond driver memory: labels start as each node's own id; each round every
    edge pushes the smaller endpoint label across, and ``groupby(id).min``
    re-aggregates.  Labels are monotonically non-increasing, so the rounds
    converge in O(max component diameter); iteration stops early when a round
    changes nothing (checked with an inner join — all Dataset-side, nothing
    driver-resident).  LSH dup components are short chains in practice, so a
    handful of rounds suffices; ``max_rounds`` caps pathological graphs.
    """
    edges = pairs.select_columns([id_a, id_b]).map_batches(
        lambda t: pa.table({"src": pa.concat_arrays([
                                t.column(id_a).combine_chunks(),
                                t.column(id_b).combine_chunks()]),
                            "dst": pa.concat_arrays([
                                t.column(id_b).combine_chunks(),
                                t.column(id_a).combine_chunks()])}),
        batch_format="pyarrow",
    ).materialize()  # edge list reused every round; dup-pairs-sized
    # size the per-round joins by the (known, just-materialized) edge count —
    # label-propagation rounds on a small dup graph must not each spawn a
    # CPU-count aggregator-actor pool
    P = num_partitions or join_partitions_for(edges.count() * 2)
    id_type = edges.schema().base_schema.field("src").type

    from ray.data.aggregate import Min

    from ..dsutil import drop_empty_blocks

    label_schema = pa.schema([("id", id_type), ("label", id_type)])

    # initial labels: own id (over every node that appears in an edge).
    # drop_empty_blocks: the groupby shuffle emits empty zero-column blocks
    # that would break the pyarrow hash join below
    labels = drop_empty_blocks(
        edges.map_batches(
            lambda t: pa.table({"id": t.column("src"), "label": t.column("src")}),
            batch_format="pyarrow",
        ).groupby("id").aggregate(Min("label", alias_name="label")),
        empty_schema=label_schema,
    )

    for _ in range(max_rounds):
        # push each node's current label to its neighbors
        msgs = edges.join(labels, join_type="inner", num_partitions=P,
                          on=("src",), right_on=("id",))
        msgs = msgs.map_batches(
            lambda t: pa.table({"id": t.column("dst"), "label": t.column("label")}),
            batch_format="pyarrow",
        )
        new_labels = drop_empty_blocks(
            labels.union(msgs).groupby("id").aggregate(
                Min("label", alias_name="label")
            ),
            empty_schema=label_schema,
        )
        changed = labels.join(
            new_labels, join_type="inner", num_partitions=P,
            on=("id",), right_on=("id",), right_suffix="_new",
        ).map_batches(
            lambda t: t.filter(pa.compute.invert(pa.compute.equal(
                t.column("label"), t.column("label_new")))),
            batch_format="pyarrow",
        ).count()
        labels = new_labels
        if changed == 0:
            break
    return labels.rename_columns(["id", "root"])


def jaccard_component_dedup(
    ds: ray.data.Dataset, col: str, id_col: str, threshold: float = 0.8,
    max_broadcast: int = MAX_BROADCAST_ROWS, distributed: Optional[bool] = None,
    **kwargs,
) -> ray.data.Dataset:
    """Near-dup removal with transitive closure: LSH candidates -> exact
    Jaccard verify -> connected components -> keep each component's min id.

    Component computation is driver union-find while the pair list fits
    (``<= max_broadcast`` pairs), else the min-label-propagation rounds of
    :func:`dup_components_distributed`; pass ``distributed`` to force a path.
    The drop-id application is scale-aware either way (:func:`filter_by_ids`).
    """
    pairs = jaccard_dup_pairs(ds, col, id_col, threshold=threshold, **kwargs)
    pairs = pairs.materialize()  # reused: count + components
    if distributed is None:
        distributed = pairs.count() > max_broadcast

    if distributed:
        labels = dup_components_distributed(pairs)
        drop_ds = labels.map_batches(
            lambda t: t.filter(pa.compute.invert(pa.compute.equal(
                t.column("id"), t.column("root")))).select(["id"]),
            batch_format="pyarrow",
        )
        return filter_by_ids(ds, id_col, drop_ds, ids_col="id",
                             keep_matching=False, max_broadcast=max_broadcast)

    comp = dup_components(pairs)
    drop = frozenset(x for x, root in comp.items() if x != root)
    ref = ray.put(drop)

    def keep_roots(batch: pa.Table) -> pa.Table:
        from ..dsutil import cached_broadcast

        dropset = cached_broadcast(ref)
        mask = pa.array([v not in dropset
                         for v in batch.column(id_col).to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(keep_roots, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# embedding near-dup (random-projection bucketing + exact cosine)
# ---------------------------------------------------------------------------


class SignBucketStage:
    """Random-hyperplane sign signature (per-actor fixed projection matrix)."""

    def __init__(self, emb_col: str, id_col: str, n_planes: int = 16,
                 dim: Optional[int] = None, seed: int = 42):
        self.emb_col, self.id_col = emb_col, id_col
        self.n_planes, self.seed = n_planes, seed
        self.planes = None  # lazily sized from the first batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .similarity import embedding_matrix

        embs = embedding_matrix(batch.column(self.emb_col), dtype=np.float32)
        if self.planes is None:
            rng = np.random.RandomState(self.seed)
            self.planes = rng.standard_normal((embs.shape[1], self.n_planes)).astype(np.float32)
        signs = (embs @ self.planes) > 0  # (n, planes)
        keys = np.zeros(len(embs), dtype=np.uint64)
        for b in range(self.n_planes):
            keys |= signs[:, b].astype(np.uint64) << np.uint64(b)
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        unit = embs / norms[:, None]
        return pa.table(
            {"bucket": pa.array(keys, pa.uint64()),
             self.id_col: batch.column(self.id_col),
             "unit": pa.array(list(unit), pa.list_(pa.float32()))}
        )


def embedding_dup_ids(
    ds: ray.data.Dataset, emb_col: str, id_col: str,
    threshold: float = 0.95, n_planes: int = 12, concurrency=(1, 8),
) -> ray.data.Dataset:
    """IDs whose embedding cosine vs a smaller-id doc in the same sign-bucket
    exceeds ``threshold``.  Recall is per-bucket (raise recall by lowering
    ``n_planes`` or running multiple plane seeds and unioning)."""

    def bucket(group: pa.Table) -> pa.Table:
        n = min(group.num_rows, 4096)
        empty = pa.table({id_col: pa.array([], group.column(id_col).type)})
        if n < 2:
            return empty
        ids = group.column(id_col).to_pylist()[:n]
        from .similarity import embedding_matrix

        unit = embedding_matrix(group.column("unit").slice(0, n), dtype=np.float32)
        order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
        sims = unit @ unit.T
        canon: List[int] = []
        dups = []
        for i in order:
            if canon and np.max(sims[i, canon]) >= threshold:
                dups.append(ids[i])
            else:
                canon.append(i)
        if not dups:
            return empty
        return pa.table({id_col: pa.array(sorted(set(dups)), group.column(id_col).type)})

    sigs = ds.select_columns([id_col, emb_col]).map_batches(
        _stage_task(SignBucketStage, emb_col=emb_col, id_col=id_col,
                    n_planes=n_planes),
        batch_format="pyarrow",
    )
    from ..dsutil import bucketed_segments_map

    sch = ds.schema()
    id_type = dict(zip(sch.names, sch.types))[id_col]
    return bucketed_segments_map(
        sigs, "bucket", bucket,
        empty_out=pa.table({id_col: pa.array([], id_type)}))


def embedding_dup_ids_exact(
    ds: ray.data.Dataset, emb_col: str, id_col: str, threshold: float = 0.95,
) -> ray.data.Dataset:
    """IDs having ANY smaller-id partner with cosine >= ``threshold`` — the
    exact all-pairs baseline (SQL-oracle-equivalent: EXISTS a smaller-id row
    with list_cosine_similarity >= t).

    The full unit-normalized matrix is broadcast once (``ray.put``) and every
    batch scores against it with one matmul — the ``knn_brute_force`` shape.
    This is the *baseline* path: broadcast is corpus-sized, so it is bounded
    by available object-store memory (fine to ~10M x 128d float32 = 5 GB);
    the scale path is ``embedding_dup_ids`` (sign-bucket LSH, nothing
    corpus-sized anywhere).  Unlike the LSH path's greedy canonical-set
    semantics, this is the simple pairwise predicate, so results are
    set-identical across any partitioning.
    """
    from .similarity import embedding_matrix

    ref_tbl = pa.concat_tables(
        [ray.get(r) for r in ds.select_columns([id_col, emb_col]).to_arrow_refs()]
    )
    all_ids = np.asarray(ref_tbl.column(id_col).to_pylist())
    m = embedding_matrix(ref_tbl.column(emb_col), dtype=np.float64)
    norms = np.linalg.norm(m, axis=1)
    norms[norms == 0] = 1.0
    unit_all_ref = ray.put((all_ids, np.ascontiguousarray(m / norms[:, None])))

    def score(batch: pa.Table) -> pa.Table:
        ids_ref, unit_all = ray.get(unit_all_ref)
        rows = embedding_matrix(batch.column(emb_col), dtype=np.float64)
        rn = np.linalg.norm(rows, axis=1)
        rn[rn == 0] = 1.0
        rows = rows / rn[:, None]
        sims = rows @ unit_all.T                      # (batch, corpus)
        ids = np.asarray(batch.column(id_col).to_pylist())
        smaller = ids[:, None] > ids_ref[None, :]     # partner must have smaller id
        hit = ((sims >= threshold) & smaller).any(axis=1)
        out = batch.select([id_col]).filter(pa.array(hit))
        return out

    out = ds.select_columns([id_col, emb_col]).map_batches(
        score, batch_format="pyarrow")
    return out.sort(id_col)


def exact_dedup_incremental(
    new_ds: ray.data.Dataset,
    index_dir: str,
    col: str,
    id_col: str,
    num_partitions: Optional[int] = None,
) -> "tuple[ray.data.Dataset, ray.data.Dataset]":
    """Continuous-ingest exact dedup: drop new rows whose ``col`` value was
    already seen in any previous batch, without re-reading previous payloads.

    The at-rest state is a hash *index* — parquet of one ``__h`` (uint64
    stable hash) per previously-kept value, appended per ingest batch — so
    each increment costs O(|new| + |index|) hash I/O, never a re-scan of the
    accumulated corpus text.  Returns ``(kept, new_index)``:

      * ``kept`` — new rows that are neither in the index NOR duplicated
        within the new batch (in-batch ties keep min ``id_col``);
      * ``new_index`` — the ``__h`` table for ``kept`` — append it under
        ``index_dir`` (e.g. ``write_table(new_index, f"{index_dir}/b{n}")``)
        to commit the batch.

    Anti-join runs as a hash ``Dataset.join`` (both sides ship only 8-byte
    hashes), so no driver-resident set at any corpus size.  First batch:
    pass an ``index_dir`` with no parquet under it.
    """
    import glob as _glob
    import os as _os

    def add_hash(batch: pa.Table) -> pa.Table:
        h = pa.array(stable_hash64_column(batch.column(col)), pa.uint64())
        return batch.append_column("__h", h)

    # in-batch winners first (min id per value), the plain exact_dedup shape;
    # then one hash column for the against-index anti-join
    in_batch = exact_dedup(new_ds, col, id_col, num_partitions=num_partitions)
    in_batch = in_batch.map_batches(add_hash, batch_format="pyarrow")

    have_index = bool(_glob.glob(_os.path.join(index_dir, "**", "*.parquet"),
                                 recursive=True))
    if have_index:
        seen = ray.data.read_parquet(index_dir, columns=["__h"])
        if num_partitions is None:
            # the upstream in-batch dedup keeps an actor-pool stage alive
            # while the join's aggregator actors start: leave it 2 slots or
            # the two pools deadlock at small CPU counts (seen at 4 CPUs)
            num_partitions = max(2, _join_partitions() - 2)
        kept_h = in_batch.join(seen, join_type="left_anti",
                               num_partitions=num_partitions, on=("__h",))
    else:
        kept_h = in_batch
    # both returns derive from kept_h: pin it once (bounded by the ingest
    # increment, not the corpus) so the join lineage doesn't execute twice —
    # a second concurrent execution can deadlock against the first one's
    # still-draining actor pools at small CPU counts
    kept_h = kept_h.materialize()
    new_index = kept_h.select_columns(["__h"])
    return kept_h.drop_columns(["__h"]), new_index


def minhash_cross_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    col: str,
    id_col: str,
    threshold: float = 0.8,
    num_perm: int = 128,
    num_bands: int = 16,
    ngram: int = 3,
    max_bucket: int = 2048,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Set-similarity JOIN between two corpora: (left_id, right_id, est)
    pairs whose estimated n-gram Jaccard >= ``threshold`` — fuzzy
    decontamination (which corpus docs are near-dups of an eval document)
    and cross-crawl near-dup linkage, where ``minhash_dup_ids`` only answers
    the within-corpus question and ``tfidf.ngram_overlap_tag`` only the
    EXACT-n-gram one.

    Same scale machinery as within-corpus MinHash: signatures map-side in
    the shared actor stage (SAME seed on both sides, so signatures are
    comparable), band keys bucket the union, ONE keyed shuffle; inside a
    bucket the (left x right) estimate matrix is one vectorized equality
    reduction, degenerate buckets capped at ``max_bucket`` rows per side.
    Pairs colliding in several bands dedup with a (l, r)-keyed groupby —
    estimates are band-independent, so keep-first is exact.
    """

    def sigs_of(d: ray.data.Dataset, side: int) -> ray.data.Dataset:
        s = d.select_columns([id_col, col]).map_batches(
            _stage_task(MinHashStage, col=col, id_col=id_col,
                        num_perm=num_perm,
                        num_bands=num_bands, ngram=ngram),
            batch_format="pyarrow",
        )
        return s.map_batches(
            lambda t, _s=side: t.append_column(
                "_side", pa.array(np.full(t.num_rows, _s, np.int8()))),
            batch_format="pyarrow")

    both = sigs_of(left, 0).union(sigs_of(right, 1))

    def match(group: pa.Table) -> pa.Table:
        side = group.column("_side").to_numpy(zero_copy_only=False)
        lt = group.filter(pa.array(side == 0)).slice(0, max_bucket)
        rt = group.filter(pa.array(side == 1)).slice(0, max_bucket)
        empty = pa.table({
            "l_id": pa.array([], group.column(id_col).type),
            "r_id": pa.array([], group.column(id_col).type),
            "est": pa.array([], pa.float64())})
        if lt.num_rows == 0 or rt.num_rows == 0:
            return empty
        L = np.stack([np.frombuffer(b, dtype=np.uint64)
                      for b in lt.column("sig").to_pylist()])
        R = np.stack([np.frombuffer(b, dtype=np.uint64)
                      for b in rt.column("sig").to_pylist()])
        est = (L[:, None, :] == R[None, :, :]).mean(axis=2)
        li, ri = np.nonzero(est >= threshold)
        if len(li) == 0:
            return empty
        return pa.table({
            "l_id": lt.column(id_col).take(pa.array(li)),
            "r_id": rt.column(id_col).take(pa.array(ri)),
            "est": pa.array(est[li, ri], pa.float64()),
        })

    from ..dsutil import bucketed_segments_map, distinct_rows_by

    lsch = left.schema()
    lid_type = dict(zip(lsch.names, lsch.types))[id_col]
    pairs = bucketed_segments_map(
        both, "band_key", match,
        empty_out=pa.table({"l_id": pa.array([], lid_type),
                            "r_id": pa.array([], lid_type),
                            "est": pa.array([], pa.float64())}))
    # same pair can surface from several bands; est is band-independent
    return distinct_rows_by(pairs, ["l_id", "r_id"])
