"""Fuzzy (edit-distance) pair matching — the string analog of near-dup
detection (entity resolution over names/titles at crawl scale).

The naive form is an O(n²) cross join with ``levenshtein(a, b) <= 1`` — dead
at any scale.  This module uses the *deletion-neighborhood* blocking scheme
(FastSS / SymSpell family, public algorithm): for k=1,

    Lev(u, v) <= 1  ⟺  D(u) ∩ D(v) ≠ ∅

where D(s) = {s} ∪ {s with one character deleted}.  (⇐ only gives
Lev <= 2, so candidates are verified exactly.)  The distributed shape:

  flat-map each string to |s|+1 deletion-variant HASHES (vectorized byte
  matrix for uniform-length ASCII batches; the variant string itself never
  leaves the task — only its uint64 hash ships)
  → ONE groupby on ``hash % P`` (P coarse buckets ≈ 4×CPUs, so the group
    overhead is per-BUCKET, not per-variant — a per-variant map_groups costs
    one Python/pandas round trip per tiny group and is ~20× slower)
  → inside each bucket: sort by variant hash, vectorized run detection,
    all-pairs-within-run generated per run-size class with one
    ``triu_indices`` broadcast per class, then exact Lev<=1 verification
    (byte-matrix mismatch count for equal-length pairs, scalar fallback for
    the ragged remainder)
  → global pair dedup via a second, much smaller groupby.

Hash collisions between different variants only ADD candidates; the exact
verification removes them, so correctness never depends on the hash.
Shuffle volume is Σ|s| rows of (uint64, id, string) — linear in corpus
characters, not quadratic in rows.  A per-variant cap bounds the
pathological case (many identical strings); capped runs drop pairs beyond
the cap — dedup exact-identical strings first if that matters.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..functions.hashing import durable_hash64_column


def _deletion_variants_uniform(vals_s: np.ndarray, length: int) -> list:
    """All single-deletion variants of equal-length ASCII strings as numpy
    byte arrays — one column drop per deleted position, no per-row Python."""
    mat = vals_s.view("S1").reshape(len(vals_s), length)
    out = []
    for i in range(length):
        kept = np.delete(mat, i, axis=1).copy()
        out.append(kept.view(f"S{length - 1}").ravel())
    return out


def _lev_le1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 — O(|a|) scan, no DP table."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def _verify_pairs(sa: np.ndarray, sb: np.ndarray) -> np.ndarray:
    """Vectorized Lev<=1 mask over candidate string pairs (object arrays).

    Equal-length ASCII pairs verify as byte-matrix mismatch counts, one
    length class at a time; everything else falls back to the scalar scan
    (rare: only cross-length candidates and non-ASCII)."""
    n = len(sa)
    ok = np.zeros(n, dtype=bool)
    la = np.fromiter((len(s) for s in sa), dtype=np.int64, count=n)
    lb = np.fromiter((len(s) for s in sb), dtype=np.int64, count=n)
    same = la == lb
    for length in np.unique(la[same]):
        sel = np.flatnonzero(same & (la == length))
        if length == 0:
            ok[sel] = True
            continue
        try:
            ma = np.asarray(sa[sel]).astype(f"S{length}").view("S1").reshape(
                len(sel), length)
            mb = np.asarray(sb[sel]).astype(f"S{length}").view("S1").reshape(
                len(sel), length)
            ok[sel] = (ma != mb).sum(axis=1) <= 1
        except UnicodeEncodeError:
            for i in sel:
                ok[i] = _lev_le1(sa[i], sb[i])
    for i in np.flatnonzero(~same):
        ok[i] = _lev_le1(sa[i], sb[i])
    return ok


def fuzzy_pairs(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    bucket_cap: int = 256,
    n_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """All unordered pairs (id_a < id_b) whose ``text_col`` values are within
    Levenshtein distance 1 — Dataset(id_a, id_b).

    Exact (deletion-neighborhood blocking is complete for k=1 + exact
    verification); ``bucket_cap`` bounds the per-variant fan-out against
    adversarial inputs; ``n_buckets`` is the shuffle width (default scales
    with the cluster)."""
    import ray as _ray

    if n_buckets is None:
        n_cpus = int(_ray.cluster_resources().get("CPU", 8)) \
            if _ray.is_initialized() else 8
        n_buckets = max(64, 4 * n_cpus)

    def variants(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table({"_vh": pa.array([], pa.uint64()),
                             id_col: pa.array([], pa.int64()),
                             "_s": pa.array([], pa.string())})
        text_arr = pa.array(texts, pa.string())
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
        hash_parts = [durable_hash64_column(text_arr)]  # identity variant
        id_parts = [ids]
        uniform = lens.min() == lens.max() and lens[0] > 0
        if uniform:
            try:  # ASCII-only fast path; non-ASCII raises at the S-cast
                vals_s = np.asarray(texts).astype(f"S{int(lens[0])}")
            except UnicodeEncodeError:
                uniform = False
        if uniform:
            for var in _deletion_variants_uniform(vals_s, int(lens[0])):
                hash_parts.append(durable_hash64_column(
                    pa.array(var, pa.binary())))
                id_parts.append(ids)
        else:  # ragged fallback: per-string Python deletions
            vv, vi = [], []
            for i, t in enumerate(texts):
                for j in range(len(t)):
                    vv.append(t[:j] + t[j + 1:])
                    vi.append(ids[i])
            hash_parts.append(durable_hash64_column(pa.array(vv, pa.string())))
            id_parts.append(np.asarray(vi, dtype=np.int64))
        vh = np.concatenate(hash_parts)
        out_ids = np.concatenate(id_parts)
        reps = np.empty(len(hash_parts), dtype=np.int64)
        reps[0] = n
        for i, p in enumerate(id_parts[1:], 1):
            reps[i] = len(p)
        # the source string rides along for exact verification
        if uniform:  # every part is one full column of the batch
            s_idx = np.tile(np.arange(n), len(hash_parts))
        else:  # identity part, then len(t) deletion rows per string
            s_idx = np.concatenate([
                np.arange(n), np.repeat(np.arange(n), lens)])
        s_col = text_arr.take(pa.array(s_idx, pa.int64()))
        return pa.table({
            "_vh": pa.array(vh, pa.uint64()),
            id_col: pa.array(out_ids, pa.int64()),
            "_s": s_col,
            "_b": pa.array((vh % np.uint64(n_buckets)).astype(np.int64),
                           pa.int64()),
        })

    var_ds = ds.select_columns([id_col, text_col]).map_batches(
        variants, batch_format="pyarrow")

    def bucket_pairs(group: pa.Table) -> pa.Table:
        empty = pa.table({"id_a": pa.array([], pa.int64()),
                          "id_b": pa.array([], pa.int64())})
        if group.num_rows < 2:
            return empty
        vh = group.column("_vh").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False)
        ss = np.asarray(group.column("_s").to_pylist(), dtype=object)
        # one row per (variant, id): identical strings repeat ids per variant
        order = np.lexsort((ids, vh))
        vh, ids, ss = vh[order], ids[order], ss[order]
        keep = np.empty(len(vh), dtype=bool)
        keep[0] = True
        keep[1:] = (vh[1:] != vh[:-1]) | (ids[1:] != ids[:-1])
        vh, ids, ss = vh[keep], ids[keep], ss[keep]
        # run detection + per-variant cap
        change = np.empty(len(vh), dtype=bool)
        change[0] = True
        change[1:] = vh[1:] != vh[:-1]
        run_id = np.cumsum(change) - 1
        run_start = np.flatnonzero(change)
        within = np.arange(len(vh)) - run_start[run_id]
        cap = within < bucket_cap
        vh, ids, ss, run_id = vh[cap], ids[cap], ss[cap], run_id[cap]
        change = np.empty(len(vh), dtype=bool)
        if not len(vh):
            return empty
        change[0] = True
        change[1:] = vh[1:] != vh[:-1]
        starts = np.flatnonzero(change)
        sizes = np.diff(np.append(starts, len(vh)))
        a_parts, b_parts = [], []
        for s in np.unique(sizes[sizes >= 2]):
            runs = starts[sizes == s]
            ia, ib = np.triu_indices(int(s), k=1)
            a_parts.append((runs[:, None] + ia[None, :]).ravel())
            b_parts.append((runs[:, None] + ib[None, :]).ravel())
        if not a_parts:
            return empty
        ai = np.concatenate(a_parts)
        bi = np.concatenate(b_parts)
        ok = _verify_pairs(ss[ai], ss[bi])
        ai, bi = ai[ok], bi[ok]
        id_a = np.minimum(ids[ai], ids[bi])
        id_b = np.maximum(ids[ai], ids[bi])
        # a pair can recur within the bucket via several shared variants
        uniq = np.unique(np.stack([id_a, id_b], axis=1), axis=0)
        return pa.table({"id_a": pa.array(uniq[:, 0], pa.int64()),
                         "id_b": pa.array(uniq[:, 1], pa.int64())})

    pairs = var_ds.groupby("_b").map_groups(bucket_pairs,
                                            batch_format="pyarrow")

    # global pair dedup (pairs may also recur ACROSS buckets): Ray's
    # composite-key Aggregate costs ~20x a sort-partitioned distinct —
    # distinct_rows_by is exactly that shape (one exchange, one sorted
    # first-occurrence mask per partition)
    from ..dsutil import distinct_rows_by

    return distinct_rows_by(pairs, ["id_a", "id_b"])


def entity_components(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    block_col: Optional[str] = None,
    max_broadcast: int = 2_000_000,
    distributed: Optional[bool] = None,
) -> ray.data.Dataset:
    """Entity resolution: cluster ids whose ``text_col`` values chain together
    within Levenshtein distance 1 — Dataset(id, root) with ``root`` = the
    component's min id.  The record-linkage counterpart of
    ``dedup.jaccard_component_dedup`` (same closure semantics, edit-distance
    edges).

    Edges come from :func:`fuzzy_pairs` (deletion-neighborhood blocking — no
    cross join).  ``block_col`` optionally restricts edges to same-block pairs
    (e.g. same region/nation): the pair list is re-joined against the
    (id, block) dim — two keyed joins over the *pair* list, which is
    edge-bounded, never corpus-squared.  Components use driver union-find
    while the edge list fits (``<= max_broadcast`` pairs), else the all-
    Dataset min-label-propagation rounds of
    ``dedup.dup_components_distributed``; pass ``distributed`` to force.
    """
    from .dedup import (dup_components, dup_components_distributed,
                        join_partitions_for)

    from ..dsutil import drop_empty_blocks

    id_type = ds.schema().base_schema.field(id_col).type
    # fuzzy_pairs' map_groups interior can emit empty zero-column blocks;
    # the downstream hash-shuffle joins (block filter, label propagation)
    # choke on the schema mismatch — rebuild from non-empty blocks first
    pairs = drop_empty_blocks(
        fuzzy_pairs(ds.select_columns([id_col, text_col]), id_col, text_col),
        empty_schema=pa.schema([("id_a", id_type), ("id_b", id_type)]))
    # materialize BEFORE the block joins: the edge list is reused (count +
    # closure) and its known size lets the joins spawn only as many
    # aggregator actors as the data fills (size-aware partitioning)
    pairs = pairs.materialize()
    n_pairs = pairs.count()
    if block_col is not None:
        P = join_partitions_for(n_pairs)
        blk_type = ds.schema().base_schema.field(block_col).type
        dim = ds.select_columns([id_col, block_col])
        pairs = pairs.join(dim, join_type="inner", num_partitions=P,
                           on=("id_a",), right_on=(id_col,),
                           right_suffix="_ra")
        # join partitions that received no rows come back as zero-column
        # blocks, which the NEXT hash join's per-partition pyarrow join
        # rejects (intermittent, layout-dependent) — rebuild between joins
        pairs = drop_empty_blocks(
            pairs, empty_schema=pa.schema([
                ("id_a", id_type), ("id_b", id_type),
                (id_col, id_type), (block_col, blk_type)]))
        pairs = pairs.join(dim, join_type="inner", num_partitions=P,
                           on=("id_b",), right_on=(id_col,),
                           right_suffix="_rb")
        pairs = drop_empty_blocks(
            pairs, empty_schema=pa.schema([
                ("id_a", id_type), ("id_b", id_type),
                (id_col, id_type), (block_col, blk_type),
                (id_col + "_rb", id_type), (block_col + "_rb", blk_type)]))
        pairs = pairs.map_batches(
            lambda t: t.filter(pc.equal(t.column(block_col),
                                        t.column(block_col + "_rb")))
                       .select(["id_a", "id_b"]),
            batch_format="pyarrow")

    if block_col is not None:
        pairs = pairs.materialize()  # re-materialize the block-filtered edges
    if distributed is None:
        distributed = pairs.count() > max_broadcast
    if distributed:
        return dup_components_distributed(pairs)
    comp = dup_components(pairs)
    ids = sorted(comp)
    return ray.data.from_arrow(pa.table({
        "id": pa.array(ids),
        "root": pa.array([comp[i] for i in ids]),
    }))
