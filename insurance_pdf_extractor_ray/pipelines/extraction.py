"""The flagship extraction pipeline.

    read (Lance/Parquet, pruned columns)
      -> map_batches(precombine)          # per-batch partial merge (combiner —
                                          #   the salted/skew-taming pre-aggregation)
      -> reassembly exchange              # mode="shuffle" (groupby hash(doc_id)%P),
                                          #   "colocated" (bucketed layout, no shuffle),
                                          #   or "auto" (shuffle only split docs)
      -> extraction                       # compute="tasks" (fused, per-worker cached
                                          #   state; default) or "actors" (pool)

Mirrors the reference lifecycle (SURVEY.md §3.1) minus the HTTP shell: the
pypdf page iteration becomes the offset-ordered span sequence; the Gemini
stage becomes the deterministic extractor actor; the per-request SQLite sink
becomes partitioned Parquet/Lance fragments.

Scale notes (100 TB):
  * The only all-to-all exchange is the ``groupby(doc_id)``.  ``precombine``
    merges same-doc rows inside each input block first, so the shuffle moves
    one partially-merged row per (doc, block) — the classic partial-aggregate
    answer to skewed/oversized docs (a 100x-span doc sharded over K blocks
    ships K combined rows, not K*100 spans rows).
  * When the input table is already bucketed by ``hash(doc_id)`` at write time
    (the Lance layout we write), pass ``assume_colocated=True`` to skip the
    global shuffle entirely and merge within blocks.
  * Column pruning at the read: only ``doc_id`` and ``spans`` leave storage.
"""

from __future__ import annotations

import os
from typing import Optional, Tuple, Union

import numpy as np
import pyarrow as pa
import ray.data

from ..sources.io import read_table
from ..stages.extract import FieldExtractor


def _merge_rows_vectorized(doc_ids: np.ndarray, span_col: pa.ListArray) -> pa.Table:
    """Merge rows sharing a doc_id into one row each, spans sorted by offset.

    Fully Arrow/numpy: flatten all spans, lexsort by (doc-code, offset),
    rebuild the list array from group boundaries.  First-appearance order of
    docs is preserved.
    """
    uniq, first_idx, inverse = np.unique(doc_ids, return_index=True, return_inverse=True)
    # remap so codes follow first-appearance order (stable output)
    appearance = np.argsort(first_idx, kind="stable")
    rank = np.empty_like(appearance)
    rank[appearance] = np.arange(len(uniq))
    codes = rank[inverse]  # per-row doc code in appearance order

    lengths = span_col.value_lengths().fill_null(0).to_numpy()
    flat = span_col.flatten()
    span_codes = np.repeat(codes, lengths)
    span_offs = flat.field(3).to_numpy(zero_copy_only=False)
    order = np.lexsort((span_offs, span_codes))
    sorted_flat = flat.take(pa.array(order))

    counts = np.bincount(span_codes, minlength=len(uniq))
    offsets = np.zeros(len(uniq) + 1, dtype=np.int32)
    np.cumsum(counts, out=offsets[1:])
    spans_arr = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), sorted_flat)
    out_ids = uniq[appearance]
    return pa.table({"doc_id": pa.array(out_ids, pa.string()), "spans": spans_arr})


def precombine(batch: pa.Table) -> pa.Table:
    """Partial merge of same-doc rows within a batch (combiner before shuffle)."""
    span_col = batch.column("spans")
    if isinstance(span_col, pa.ChunkedArray):
        span_col = span_col.combine_chunks()
    doc_ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=object)
    if len(doc_ids) == 0 or len(np.unique(doc_ids)) == len(doc_ids):
        return batch  # fast path: no intra-batch duplicates, zero-copy passthrough
    return _merge_rows_vectorized(doc_ids, span_col)


def merge_group(group: pa.Table) -> pa.Table:
    """Reassembly: merge all rows of one doc, sort spans by offset."""
    span_col = group.column("spans")
    if isinstance(span_col, pa.ChunkedArray):
        span_col = span_col.combine_chunks()
    if group.num_rows == 1:
        # common case: already one row; just sort its spans by offset
        flat = span_col.flatten()
        order = pa.compute.sort_indices(flat.field(3))
        sorted_flat = flat.take(order)
        spans_arr = pa.ListArray.from_arrays(
            pa.array([0, len(sorted_flat)], pa.int32()), sorted_flat
        )
        return pa.table({"doc_id": group.column("doc_id"), "spans": spans_arr})
    doc_ids = np.asarray(group.column("doc_id").to_pylist(), dtype=object)
    return _merge_rows_vectorized(doc_ids, span_col)


def sort_spans_batch(batch: pa.Table) -> pa.Table:
    """Colocated fast path: rows are whole docs already; sort each span list
    by offset (vectorized via the same lexsort path)."""
    span_col = batch.column("spans")
    if isinstance(span_col, pa.ChunkedArray):
        span_col = span_col.combine_chunks()
    doc_ids = np.asarray(batch.column("doc_id").to_pylist(), dtype=object)
    if len(doc_ids) == 0:
        return batch
    return _merge_rows_vectorized(doc_ids, span_col)


def _default_partitions() -> int:
    import ray as _ray

    n_cpus = int(_ray.cluster_resources().get("CPU", 8)) if _ray.is_initialized() else 8
    # measured sweet spot: P ~ 2x CPUs; too many partitions inflates
    # sort-shuffle overhead faster than it buys parallelism.
    # NOTE small-corpus regime: if a partition lands under Ray's map-input
    # bundling floor (DataContext.target_min_block_size, 1 MB default), the
    # downstream merge+extract tasks get coalesced below cluster width —
    # lower the floor in the HARNESS when benchmarking tiny inputs (see
    # bench.py); at >= 128 MB partitions the floor never binds.
    return min(256, max(16, 2 * n_cpus))


def _shuffle_merge(ds: ray.data.Dataset, num_partitions: int) -> ray.data.Dataset:
    """groupby(hash(doc_id) %% P) + one vectorized merge per partition."""
    from ..functions.hashing import stable_hash64_column

    P = num_partitions

    def add_part(batch: pa.Table) -> pa.Table:
        h = stable_hash64_column(batch.column("doc_id"))
        part = pa.array((h % np.uint64(P)).astype(np.int32), pa.int32())
        return batch.append_column("__part", part)

    def merge_partition(group: pa.Table) -> pa.Table:
        doc_ids = np.asarray(group.column("doc_id").to_pylist(), dtype=object)
        if len(doc_ids) == 0:
            return group.drop_columns(["__part"])
        span_col = group.column("spans")
        if isinstance(span_col, pa.ChunkedArray):
            span_col = span_col.combine_chunks()
        return _merge_rows_vectorized(doc_ids, span_col)

    return (
        ds.map_batches(add_part, batch_format="pyarrow")
        .groupby("__part")
        .map_groups(merge_partition, batch_format="pyarrow")
    )


#: split-hash sets above this size fall back to the full shuffle — shipping a
#: larger broadcast set costs more than just shuffling everything
MAX_SPLIT_BROADCAST = 2_000_000

#: weight-outlier routing (auto mode): rows with at least this many spans are
#: CANDIDATE heavy docs; the actual threshold is
#: max(floor, factor x corpus mean spans/row), so a uniformly-heavy corpus
#: routes nothing while a concentrated 100x tail is spread by the exchange.
#: Measured: 500 oversized (~1400-span) docs concentrated in 2 input files
#: made auto mode 4x slower than the full shuffle (one straggler task owned
#: every heavy doc); routing them through the exchange restores parity.
HEAVY_SPANS_FLOOR = 256
HEAVY_SPANS_FACTOR = 16


def _heavy_doc_hashes(pre: ray.data.Dataset) -> np.ndarray:
    """Weight-outlier detector over the materialized precombined frontier:
    doc-id hashes of rows whose span count >= max(HEAVY_SPANS_FLOOR,
    HEAVY_SPANS_FACTOR x corpus mean spans/row).

    One zero-shuffle pass: each batch ships its batch totals plus the
    (hash, len) pairs of floor-exceeding CANDIDATES only (one binary blob —
    outlier-bounded, never corpus-sized); the driver computes the relative
    threshold from the totals and prunes the candidate list.  Auto mode
    unions the result with the split-doc set so the streaming branch is
    weight-homogeneous — a block that concentrates the oversized tail no
    longer serializes one straggler task.
    """
    from ..functions.hashing import stable_hash64_column

    def partial(batch: pa.Table) -> pa.Table:
        lens = batch.column("spans").combine_chunks().value_lengths() \
            .fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64)
        h = stable_hash64_column(batch.column("doc_id")).view(np.int64)
        cand = lens >= HEAVY_SPANS_FLOOR
        blob = np.concatenate([h[cand], lens[cand]]).tobytes()
        return pa.table({
            "blob": pa.array([blob], pa.binary()),
            "n": pa.array([len(lens)], pa.int64()),
            "s": pa.array([int(lens.sum())], pa.int64()),
        })

    rows = pre.map_batches(partial, batch_format="pyarrow").take_all()
    n = sum(r["n"] for r in rows)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    mean = sum(r["s"] for r in rows) / n
    thr = max(HEAVY_SPANS_FLOOR, HEAVY_SPANS_FACTOR * mean)
    hs, ls = [], []
    for r in rows:
        arr = np.frombuffer(r["blob"], dtype=np.int64)
        k = len(arr) // 2
        hs.append(arr[:k])
        ls.append(arr[k:])
    h = np.concatenate(hs)
    l = np.concatenate(ls)
    return np.unique(h[l >= thr])


#: below this row count the split-doc detector collects per-batch hash blobs
#: to the driver (8 bytes/row — 400 MB at the hard cap, one cheap pass, no
#: shuffle); above it, the distributed groupby-count path runs instead.
#: The cap also shrinks with actually-available driver memory (<= ~10% of
#: free RAM at 8 B/row) so a shared or small driver switches to the
#: distributed path earlier instead of OOMing.
MAX_DRIVER_DETECT_ROWS = 50_000_000


def _driver_detect_cap() -> int:
    try:
        avail = os.sysconf("SC_AVPHYS_PAGES") * os.sysconf("SC_PAGE_SIZE")
    except (ValueError, OSError, AttributeError):
        return MAX_DRIVER_DETECT_ROWS
    return int(min(MAX_DRIVER_DETECT_ROWS, max(1_000_000, avail // 80)))


def _split_doc_hashes(raw: ray.data.Dataset) -> np.ndarray:
    """Split-doc detector over the RAW input: per-row doc-id hashes
    (vectorized), multiplicity count, keep only hashes with count > 1.
    Returns the (small) sorted int64 split-hash array.

    Size-adaptive: under ``MAX_DRIVER_DETECT_ROWS`` each batch ships one
    binary blob of its hashes and the driver runs a single np.unique — one
    pruned pass, no shuffle (~2 s cheaper than a groupby at 50k docs).
    Above it, a per-batch partial (hash, count) combine feeds ONE tiny
    groupby on 8-byte keys, so only multi-row docs' hashes ever reach the
    driver — never a corpus-scale collection (~8 TB at the 10^12-doc north
    star if collected naively).

    The decision is purely content-based (how many ROWS a doc has in the
    input as given), never batching-based — "seen in two batches" would
    misclassify docs on a re-executed lineage whose batch boundaries moved
    (caught at 24k docs).  Callers that need the multiplicities to be
    execution-stable (reassemble's auto mode filters the SAME dataset by
    the result) must pass a MATERIALIZED dataset, which freezes them.
    """
    from ray.data.aggregate import Sum

    from ..functions.hashing import stable_hash64_column

    # don't re-project an already-doc_id-only source: a select_columns node
    # on top of a pruned read blocks Ray's metadata-only count() shortcut
    # (measured 1.6 s vs 0.03 s at 50k docs — the whole detector budget);
    # a materialized input counts from its own metadata either way
    from ray.data.dataset import MaterializedDataset

    pruned = (raw if raw.schema().names == ["doc_id"]
              else raw.select_columns(["doc_id"]))
    n_rows = (raw.count() if isinstance(raw, MaterializedDataset)
              else pruned.count())
    if n_rows <= _driver_detect_cap():
        def blob(batch: pa.Table) -> pa.Table:
            h = stable_hash64_column(batch.column("doc_id")).view(np.int64)
            return pa.table({"blob": pa.array([h.tobytes()], pa.binary())})

        blobs = pruned.map_batches(blob, batch_format="pyarrow").take_all()
        if not blobs:
            return np.empty(0, dtype=np.int64)
        allh = np.concatenate([np.frombuffer(b["blob"], dtype=np.int64)
                               for b in blobs])
        uniq, counts = np.unique(allh, return_counts=True)
        return uniq[counts > 1]

    def partial(batch: pa.Table) -> pa.Table:
        # hashes reinterpreted as int64 (bijective): Ray's shuffle machinery
        # mishandles uint64 values above int64 max (pickled-object fallback)
        h = stable_hash64_column(batch.column("doc_id")).view(np.int64)
        uniq, counts = np.unique(h, return_counts=True)
        return pa.table({"__h": pa.array(uniq, pa.int64()),
                         "__c": pa.array(counts, pa.int64())})

    agg = (
        pruned
        .map_batches(partial, batch_format="pyarrow")
        .groupby("__h")
        .aggregate(Sum("__c", alias_name="c"))
    )

    def keep_multi(batch: pa.Table) -> pa.Table:
        if "c" not in batch.column_names:  # zero-column empty shuffle block
            return pa.table({"__h": pa.array([], pa.int64())})
        m = batch.filter(pa.compute.greater(batch.column("c"), 1))
        return pa.table({"__h": m.column("__h").cast(pa.int64())})

    rows = agg.map_batches(keep_multi, batch_format="pyarrow").take_all()
    return np.sort(np.array([r["__h"] for r in rows], dtype=np.int64))


def reassemble(
    ds: ray.data.Dataset,
    assume_colocated: bool = False,
    num_partitions: Optional[int] = None,
    mode: Optional[str] = None,
) -> ray.data.Dataset:
    """Rebuild one offset-ordered row per doc_id (the reassembly exchange).

    Modes:
      * ``"shuffle"`` (default): groupby ``hash(doc_id) % P`` — general,
        always correct; rows are pre-combined map-side first (the
        partial-aggregate answer to skewed/oversized docs), and ONE
        vectorized lexsort merge handles each of the P partitions (no
        per-doc Python calls).
      * ``"colocated"``: all rows of a doc share a block (bucketed write
        layout) — skip the shuffle, merge within blocks.
      * ``"auto"``: materialize the precombined frontier, detect the docs
        that STILL have >1 row there (their spans crossed a batch boundary
        — multiplicities are frozen by the materialize, so this is exact),
        shuffle ONLY those rows (usually a tiny fraction) and stream
        everything else — adaptive shuffle avoidance.  If the split set
        itself is huge (> MAX_SPLIT_BROADCAST) the input is heavily
        fragmented and auto degrades gracefully to the full shuffle.
    """
    mode = mode or ("colocated" if assume_colocated else "shuffle")
    pre = ds.map_batches(precombine, batch_format="pyarrow")
    if num_partitions is None:
        num_partitions = _default_partitions()

    if mode == "colocated":
        return pre.map_batches(sort_spans_batch, batch_format="pyarrow")
    if mode == "shuffle":
        return _shuffle_merge(pre, num_partitions)
    if mode != "auto":
        raise ValueError(f"unknown reassemble mode: {mode}")
    whole, frag = _auto_parts(pre, num_partitions)
    return whole if frag is None else whole.union(frag)


def _auto_parts(
    pre: ray.data.Dataset, num_partitions: int,
) -> Tuple[ray.data.Dataset, Optional[ray.data.Dataset]]:
    """Auto-mode reassembly split into its two streams: (whole, frag).

    ``whole`` is the shuffle-free branch (docs already complete on the
    precombined frontier, weight-outliers excluded); ``frag`` is the
    exchanged branch (split docs + weight outliers), or None when nothing
    routes / the fallback collapsed everything into one stream.  Callers
    that apply a downstream per-batch stage should size the two branches'
    batches differently: ``frag`` blocks are few-row but span-heavy, so a
    row-count batch_size bundles them into one straggler task (measured:
    521 routed 1400-span docs -> ONE 37 s extract task at batch_size=4096;
    block-sized batches restore partition-wide parallelism).
    """
    import ray as _ray

    from ..functions.hashing import stable_hash64_column

    # the whole/frag branches below are a Dataset diamond — without this,
    # each branch re-reads and re-precombines the WHOLE corpus (measured 2x
    # auto-mode wall time at 50k docs).  Materializing the precombined
    # frontier costs one object-store-resident (spillable) copy; that is
    # the price of shuffle avoidance, still far below the full exchange it
    # replaces.  It also FREEZES per-doc multiplicities, so the detector
    # can run on the frontier itself (docs with one row here are complete
    # whatever the raw layout was) instead of a separate raw-source pass —
    # one fewer execution, and strictly more precise: a doc whose raw rows
    # all landed in one precombine batch is already merged and streams.
    pre = pre.materialize()
    split = _split_doc_hashes(pre)
    if len(split) > MAX_SPLIT_BROADCAST:
        return _shuffle_merge(pre, num_partitions), None
    # weight outliers route through the exchange too: the streaming branch
    # keeps the input's block layout, so a block concentrating the oversized
    # tail would otherwise serialize one straggler task (see
    # _heavy_doc_hashes; measured 4x at 1% docs x 100x spans in 2 files)
    route = np.union1d(split, _heavy_doc_hashes(pre))
    if len(route) == 0:
        return pre.map_batches(sort_spans_batch, batch_format="pyarrow"), None
    if len(route) > MAX_SPLIT_BROADCAST:
        return _shuffle_merge(pre, num_partitions), None
    ref = _ray.put(route)  # sorted hash array, broadcast once

    def make_filter(keep_split: bool):
        def f(batch: pa.Table) -> pa.Table:
            s = _ray.get(ref)
            h = stable_hash64_column(batch.column("doc_id")).view(np.int64)
            hit = np.isin(h, s)
            return batch.filter(pa.array(hit if keep_split else ~hit))

        return f

    whole = pre.map_batches(make_filter(False), batch_format="pyarrow") \
               .map_batches(sort_spans_batch, batch_format="pyarrow")
    frag = _shuffle_merge(pre.map_batches(make_filter(True), batch_format="pyarrow"),
                          num_partitions)
    return whole, frag


# per-worker-process extractor cache for the task-based compute path:
# the compiled state (regex tables, label map) is built once per worker
# process and reused by every task that lands there — the same
# build-once-per-worker semantics as an actor pool, without the actor
# pool's drawbacks on this stage (breaks operator fusion with the
# upstream merge, forces an extra object-store hop, and ramps up slowly).
_EXTRACTOR_CACHE: dict = {}


def _cached_extractor(strip_boilerplate: bool, version_tag: str,
                      label_map: dict) -> FieldExtractor:
    # keyed by the version NAME: the map was resolved once on the driver
    # (so user-REGISTERED versions ship to workers) and a version name is
    # immutable within a job by contract
    key = (strip_boilerplate, version_tag)
    ex = _EXTRACTOR_CACHE.get(key)
    if ex is None:
        ex = _EXTRACTOR_CACHE[key] = FieldExtractor(
            label_map=label_map, strip_boilerplate=strip_boilerplate,
            version_tag=version_tag,
        )
    return ex


def extract_pipeline(
    source: Union[str, ray.data.Dataset],
    concurrency: Optional[Union[int, Tuple[int, int]]] = None,
    batch_size: Optional[int] = 4096,
    assume_colocated: bool = False,
    strip_boilerplate: bool = True,
    compute: str = "tasks",
    mode: Optional[str] = None,
    rules_version: Optional[str] = None,
) -> ray.data.Dataset:
    """Full pipeline: path or Dataset -> extracted/validated output Dataset.

    ``compute="tasks"`` (default) runs extraction as stateless tasks with a
    per-worker-process cached extractor — fuses with the upstream merge, no
    extra object-store hop.  ``compute="actors"`` uses an autoscaling actor
    pool (the right choice when per-worker state is heavyweight, e.g. a
    model; here the state is a few compiled regexes).  Measured on 2M docs /
    32 CPUs: tasks 54.8k docs/s vs actors ~34k.
    """
    # resolve the rule table ON THE DRIVER so user-registered versions
    # (rule_manager.register_version — driver-local state) reach workers as
    # a materialized map; workers never consult their own manager singleton
    from ..ruleversions import resolve_rules

    resolved_map, resolved_tag = resolve_rules(None, rules_version)

    ds = read_table(source, columns=["doc_id", "spans"]) if isinstance(source, str) else source
    frag = None
    if mode == "auto":
        # keep the two auto streams separate through extraction: the frag
        # branch is few-row/span-heavy, so the row-count batch_size that is
        # right for the whole branch bundles it into one straggler task
        # (see _auto_parts) — it extracts with block-sized batches instead
        # (one task per exchanged partition).
        pre = ds.map_batches(precombine, batch_format="pyarrow")
        ds, frag = _auto_parts(pre, _default_partitions())
    else:
        ds = reassemble(ds, assume_colocated=assume_colocated, mode=mode)

    if compute == "tasks":
        def extract_batch(batch: pa.Table) -> pa.Table:
            return _cached_extractor(strip_boilerplate, resolved_tag,
                                     resolved_map)(batch)

        out = ds.map_batches(extract_batch, batch_format="pyarrow", batch_size=batch_size)
        if frag is not None:
            out = out.union(frag.map_batches(
                extract_batch, batch_format="pyarrow", batch_size=None))
        return out

    if concurrency is None:
        # callable classes require an explicit concurrency in Ray >= 2.9
        import ray

        n_cpus = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
        concurrency = (1, max(2, n_cpus))
    kw = dict(
        fn_constructor_kwargs={"strip_boilerplate": strip_boilerplate,
                               "label_map": resolved_map,
                               "version_tag": resolved_tag},
        batch_format="pyarrow",
        concurrency=concurrency,
    )
    out = ds.map_batches(FieldExtractor, batch_size=batch_size, **kw)
    if frag is not None:
        out = out.union(frag.map_batches(FieldExtractor, batch_size=None, **kw))
    return out


def doc_info(ds: ray.data.Dataset) -> ray.data.Dataset:
    """M14 doc-info projection (reference ``get_pdf_info``,
    pdf_processor.py:447-494): per-doc (doc_id, n_spans, n_chars, title,
    preview) from the extractor output — page-count analog, metadata-title
    analog (first heading span) and the <=500-char text preview."""
    return ds.select_columns(["doc_id", "n_spans", "n_chars", "title", "preview"])


def flatten_fields(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Project the fields struct up to top-level columns (doc_id, 18 fields, status)."""

    def up(batch: pa.Table) -> pa.Table:
        fields = batch.column("fields")
        cols = {"doc_id": batch.column("doc_id")}
        for i, f in enumerate(fields.type):
            # combine_chunks: field() on ChunkedArray
            fc = fields.combine_chunks() if isinstance(fields, pa.ChunkedArray) else fields
            cols[f.name] = fc.field(i)
        cols["status"] = batch.column("status")
        return pa.table(cols)

    return ds.map_batches(up, batch_format="pyarrow")
