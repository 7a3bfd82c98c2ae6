"""Exact substring (k-word window) duplicate-span detection and removal.

The training-data operator from "Deduplicating Training Data Makes Language
Models Better" (Lee et al., 2022): find word windows that occur in multiple
documents and cut the covered words out of every document, keeping the
unique remainder.  Unlike document-level dedup (``dedup.exact_dedup`` /
``minhash_dedup``), this removes boilerplate *inside* otherwise-unique pages
— the dominant duplication mode in web crawls.

Lee et al. build a corpus-wide suffix array; at a fixed window length ``k``
the same duplicated-span set is computed with hash machinery that fits Ray
Data's shuffle model exactly:

  pass 1  map_batches: per-doc k-word window hashes (rolling polynomial over
          polars word hashes — window strings never materialize), pre-reduced
          per batch to (window_hash, distinct-docs-in-batch) pairs; docs never
          span batches, so summing the partials IS the global distinct-doc
          count.                                   — shuffle 1 (window table)
  → dup   groupby(hash).sum >= min_docs            — dup-hash Dataset,
          object-store resident, never a driver list above the bound
  pass 2  re-stream the corpus and cut covered words:
          * broadcast path (dup set provably <= max_broadcast rows):
            ``ray.put`` one sorted uint64 array, vectorized ``np.isin`` +
            difference-array cover mask per batch — zero further shuffles;
          * join path (crawl-scale dup sets): explode (doc, pos, hash) window
            rows, native ``left_semi`` join against the dup Dataset, per-doc
            position lists via one keyed groupby, ``left_outer`` join back
            onto the document stream — three keyed shuffles, nothing
            driver-resident.  Window-row volume is O(corpus words × 24 B);
            that is the honest cost of hash-formulated substring dedup (the
            suffix-array formulation trades it for a global sort).

Window identity is a 64-bit rolling hash of the lowercase ``[a-z0-9]+`` word
stream — collisions merge distinct windows at ~|windows|²/2⁶⁵ odds (≈3e-3
expected at 10¹¹ windows); the SQL oracle re-derives everything from the
actual window strings, so the driver check also bounds collision impact.

Reference repo has no counterpart (its corpus is per-request PDFs); this is
part of the beyond-reference training-data family (SURVEY.md §6).
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from .dedup import MAX_BROADCAST_ROWS, _join_partitions

#: rolling-hash multiplier (odd golden ratio — same family as
#: functions.hashing._SHINGLE_C but over the [a-z0-9]+ token rule)
_WIN_C = np.uint64(0x9E3779B97F4A7C15)
_WORD_HASH_SEED = 42


def _batch_windows(texts):
    """Vectorized per-batch tokenizer over lowercase [a-z0-9]+ tokens.

    Returns ``(word_counts, flat_words, word_hash)``: per-doc word counts
    (int64), the concatenated token array (pa.Array), and the per-word
    uint64 hashes.  Window construction happens in :func:`_roll` so both
    passes share one tokenizer (one polars pass per batch, no per-row
    Python).
    """
    import polars as pl

    s = pl.Series([t or "" for t in texts], dtype=pl.String)
    toks = s.str.to_lowercase().str.extract_all(r"[a-z0-9]+")
    counts = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
    flat = toks.explode().drop_nulls()
    word_hash = flat.hash(seed=_WORD_HASH_SEED).to_numpy().astype(np.uint64)
    return counts, flat.to_arrow().cast(pa.string()), word_hash


def _roll(word_hash: np.ndarray, counts: np.ndarray, k: int):
    """(win_hash, win_doc, win_start) for every k-word window that lies
    entirely inside one document (docs shorter than k yield none)."""
    total = int(counts.sum())
    W = total - k + 1
    if W <= 0:
        e = np.empty(0, dtype=np.uint64)
        return e, np.empty(0, np.int64), np.empty(0, np.int64)
    did = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    with np.errstate(over="ignore"):
        wh = np.zeros(W, dtype=np.uint64)
        for j in range(k):
            wh = wh * _WIN_C + word_hash[j : j + W]
    valid = did[:W] == did[k - 1 :]
    starts = np.arange(W, dtype=np.int64)[valid]
    # int64 two's-complement view: Ray Data groupby/join keys must stay in
    # int64 range (uint64 > 2^63-1 round-trips through Python ints and gets
    # pickled into extension blocks, breaking schema stability)
    return wh[valid].view(np.int64), did[:W][valid], starts


def dup_window_hashes(
    ds: ray.data.Dataset, text_col: str, k: int = 8, min_docs: int = 2,
) -> ray.data.Dataset:
    """Dataset of ``{"__wh": uint64}`` — hashes of k-word windows that occur
    in at least ``min_docs`` DISTINCT documents.

    Map-side pre-reduction: each batch ships one (hash, n_docs_in_batch) row
    per distinct (window, doc) pair — the shuffle moves the window table,
    not the window stream.  A whole row is one document, so per-batch
    distinct-doc partial counts sum to the exact global distinct-doc count.
    """

    def partial(batch: pa.Table) -> pa.Table:
        counts, _, word_hash = _batch_windows(
            batch.column(text_col).to_pylist())
        wh, wd, _ = _roll(word_hash, counts, k)
        if len(wh) == 0:
            return pa.table({"__wh": pa.array([], pa.int64()),
                             "_d": pa.array([], pa.int64())})
        order = np.lexsort((wd, wh))
        ws, dsid = wh[order], wd[order]
        first = np.ones(len(ws), dtype=bool)
        first[1:] = (ws[1:] != ws[:-1]) | (dsid[1:] != dsid[:-1])
        uw = ws[first]
        uniq, ndocs = np.unique(uw, return_counts=True)
        return pa.table({"__wh": pa.array(uniq, pa.int64()),
                         "_d": pa.array(ndocs, pa.int64())})

    agg = (ds.select_columns([text_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("__wh").aggregate(Sum("_d", alias_name="_n")))
    return (agg.filter(expr=f"_n >= {int(min_docs)}")
            .select_columns(["__wh"]))


def _clean_from_positions(batch: pa.Table, text_col: str, id_col: str,
                          k: int, starts_global: np.ndarray,
                          counts: np.ndarray, flat_words: pa.Array,
                          n_dup_per_doc: np.ndarray) -> pa.Table:
    """Shared cut kernel: given global start offsets of duplicated windows,
    cover-mask the concatenated word stream (difference array — windows never
    cross documents, so no per-doc reset is needed) and rebuild per-doc clean
    text with one Arrow list-join."""
    total = int(counts.sum())
    cover = np.zeros(total + 1, dtype=np.int64)
    if len(starts_global):
        np.add.at(cover, starts_global, 1)
        np.subtract.at(cover, starts_global + k, 1)
    covered = np.cumsum(cover[:total]) > 0

    ends = np.cumsum(counts)
    doc_starts = ends - counts
    cs = np.concatenate(([0], np.cumsum(covered.astype(np.int64))))
    dropped = cs[ends] - cs[doc_starts]

    kept_counts = counts - dropped
    offsets = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int64)
    kept_words = flat_words.filter(pa.array(~covered)) if total else flat_words
    la = pa.LargeListArray.from_arrays(pa.array(offsets, pa.int64()),
                                       kept_words.cast(pa.large_string()))
    clean = pc.binary_join(la, pa.scalar(" ", pa.large_string()))

    n_windows = np.maximum(counts - k + 1, 0)
    return pa.table({
        id_col: batch.column(id_col),
        "n_words": pa.array(counts, pa.int64()),
        "n_windows": pa.array(n_windows, pa.int64()),
        "n_dup_windows": pa.array(n_dup_per_doc, pa.int64()),
        "n_dropped_words": pa.array(dropped, pa.int64()),
        "clean_text": clean.cast(pa.string()),
    })


def dup_span_clean(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    k: int = 8,
    min_docs: int = 2,
    max_broadcast: int = MAX_BROADCAST_ROWS,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Cut corpus-duplicated k-word spans out of every document.

    Output per doc: ``n_words``, ``n_windows`` (strict k-windows),
    ``n_dup_windows`` (window positions whose window occurs in >=
    ``min_docs`` distinct docs), ``n_dropped_words`` (words covered by at
    least one duplicated window), and ``clean_text`` (the uncovered words,
    space-joined — token-normalized on both engine and oracle side).

    Path selection mirrors ``dedup.filter_by_ids``: broadcast the dup-hash
    array only when its row count proves it fits; above the bound, window
    rows semi-join the dup Dataset and per-doc position lists ride a keyed
    groupby + left_outer join back onto the corpus stream.  Pass
    ``num_partitions`` to force the join path (tests do, to prove the two
    paths identical).
    """
    dup = dup_window_hashes(ds, text_col, k=k, min_docs=min_docs).materialize()
    n_dup = dup.count()
    docs = ds.select_columns([id_col, text_col])
    force_join = num_partitions is not None

    if not force_join and n_dup <= max_broadcast:
        arr = (np.sort(np.concatenate(
            [ray.get(r).column("__wh").to_numpy(zero_copy_only=False)
             for r in dup.to_arrow_refs()]).astype(np.int64))
            if n_dup else np.empty(0, np.int64))
        ref = ray.put(arr)

        # plain task fn, not an actor pool: the per-worker state is one
        # ray.get of an object-store ref (cached by plasma), so actor
        # startup seconds buy nothing — same call shape as
        # clustering._partial_sums
        def clean(batch: pa.Table, dup_ref) -> pa.Table:
            dup_arr = ray.get(dup_ref)
            counts, flat, word_hash = _batch_windows(
                batch.column(text_col).to_pylist())
            wh, wd, ws = _roll(word_hash, counts, k)
            hit = np.isin(wh, dup_arr)
            n_dup_doc = np.bincount(wd[hit], minlength=len(counts)
                                    ).astype(np.int64)
            return _clean_from_positions(
                batch, text_col, id_col, k, ws[hit], counts, flat, n_dup_doc)

        return docs.map_batches(clean, fn_args=(ref,),
                                batch_format="pyarrow")

    # ---- join path: nothing driver-resident ----
    from ..dsutil import drop_empty_blocks

    nparts = num_partitions or _join_partitions()

    def explode_wins(batch: pa.Table) -> pa.Table:
        counts, _, word_hash = _batch_windows(
            batch.column(text_col).to_pylist())
        wh, wd, gstart = _roll(word_hash, counts, k)
        # per-doc window start offset (0-based within the doc)
        doc_starts = np.cumsum(counts) - counts
        pos = gstart - doc_starts[wd]
        ids = batch.column(id_col).take(pa.array(wd))
        return pa.table({id_col: ids,
                         "__pos": pa.array(pos, pa.int64()),
                         "__wh": pa.array(wh, pa.int64())})

    wins = docs.map_batches(explode_wins, batch_format="pyarrow")
    dup_pos = wins.join(drop_empty_blocks(dup), join_type="left_semi",
                        num_partitions=nparts, on=("__wh",))

    def collect_positions(group: pa.Table) -> pa.Table:
        # positions packed into one binary blob per doc: Arrow hash joins
        # reject list-typed payload columns, but binary passes through
        key = group.column(id_col)[0].as_py()
        pos = np.sort(group.column("__pos").to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        return pa.table({id_col: pa.array([key], group.schema.field(id_col).type),
                         "__posblob": pa.array([pos.tobytes()], pa.binary())})

    from ..dsutil import bucketed_segments_map

    _pos_empty = pa.table({id_col: pa.array([], docs.schema()
                                            .base_schema.field(id_col).type),
                           "__posblob": pa.array([], pa.binary())})
    poslists = bucketed_segments_map(
        dup_pos.select_columns([id_col, "__pos"]), id_col,
        collect_positions, empty_out=_pos_empty, min_rows=1)
    joined = docs.join(drop_empty_blocks(poslists), join_type="left_outer",
                       num_partitions=nparts, on=(id_col,))

    def apply_pos(batch: pa.Table) -> pa.Table:
        counts, flat, _ = _batch_windows(batch.column(text_col).to_pylist())
        doc_starts = np.cumsum(counts) - counts
        pl_col = batch.column("__posblob")
        starts, docidx = [], []
        for i in range(batch.num_rows):
            v = pl_col[i].as_py()
            if v:
                pos = np.frombuffer(v, dtype=np.int64)
                starts.append(pos + doc_starts[i])
                docidx.append(np.full(len(pos), i, dtype=np.int64))
        gl = (np.concatenate(starts) if starts else np.empty(0, np.int64))
        di = (np.concatenate(docidx) if docidx else np.empty(0, np.int64))
        n_dup_doc = np.bincount(di, minlength=batch.num_rows).astype(np.int64)
        return _clean_from_positions(batch, text_col, id_col, k, gl,
                                     counts, flat, n_dup_doc)

    return joined.map_batches(apply_pos, batch_format="pyarrow")


def ngram_decontaminate(
    ds: ray.data.Dataset,
    eval_ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    k: int = 8,
    min_hits: int = 1,
    eval_text_col: Optional[str] = None,
    max_broadcast: int = MAX_BROADCAST_ROWS,
    num_partitions: Optional[int] = None,
    passthrough: bool = False,
) -> ray.data.Dataset:
    """Exact n-gram decontamination: flag every corpus document sharing at
    least ``min_hits`` k-word windows with ANY document of ``eval_ds`` —
    the benchmark-leakage gate (GPT-3 App. C / PaLM-style 8–13-gram
    overlap), the exact twin of the fuzzy ``dedup.minhash_cross_join``.

    Output one row per corpus doc: ``(id, n_windows, n_eval_hits,
    contaminated)`` where ``n_eval_hits`` counts window POSITIONS whose
    k-gram occurs anywhere in the eval corpus.  Flag-don't-drop so callers
    can audit before filtering (compose with ``filter(~contaminated)``).

    Scale shape: the eval side reduces to its distinct window-hash Dataset
    (:func:`dup_window_hashes` with ``min_docs=1`` — one keyed shuffle over
    the EVAL corpus only, which is benchmarks-sized, not crawl-sized).
    Corpus pass mirrors :func:`dup_span_clean`: broadcast the hash array
    when its row count proves it fits (``np.isin`` per batch, zero corpus
    shuffles), else explode corpus window rows and ``left_semi``-join the
    eval-hash Dataset (nothing driver-resident).  Window identity is the
    same 64-bit rolling hash; the SQL oracle re-derives from window strings,
    bounding collision impact.  ``passthrough=True`` retains every input
    column alongside the flags (gate-in-pipeline composition, no join back).
    """
    from ray.data.aggregate import Count

    evh = dup_window_hashes(eval_ds, eval_text_col or text_col,
                            k=k, min_docs=1).materialize()
    n_ev = evh.count()
    docs = ds if passthrough else ds.select_columns([id_col, text_col])
    force_join = num_partitions is not None

    def _flag_table(batch: pa.Table, counts: np.ndarray,
                    n_hits: np.ndarray) -> pa.Table:
        n_windows = np.maximum(counts - k + 1, 0)
        cols = ({c: batch.column(c) for c in batch.column_names}
                if passthrough else {id_col: batch.column(id_col)})
        cols.update({
            "n_windows": pa.array(n_windows, pa.int64()),
            "n_eval_hits": pa.array(n_hits, pa.int64()),
            "contaminated": pa.array(n_hits >= min_hits, pa.bool_()),
        })
        return pa.table(cols)

    if not force_join and n_ev <= max_broadcast:
        arr = (np.sort(np.concatenate(
            [ray.get(r).column("__wh").to_numpy(zero_copy_only=False)
             for r in evh.to_arrow_refs()]).astype(np.int64))
            if n_ev else np.empty(0, np.int64))
        ref = ray.put(arr)

        def flag(batch: pa.Table, ev_ref) -> pa.Table:
            ev = ray.get(ev_ref)
            counts, _, word_hash = _batch_windows(
                batch.column(text_col).to_pylist())
            wh, wd, _ = _roll(word_hash, counts, k)
            hit = np.isin(wh, ev)
            n_hits = np.bincount(wd[hit], minlength=len(counts)
                                 ).astype(np.int64)
            return _flag_table(batch, counts, n_hits)

        return docs.map_batches(flag, fn_args=(ref,), batch_format="pyarrow")

    # ---- join path: nothing driver-resident ----
    from ..dsutil import drop_empty_blocks

    nparts = num_partitions or _join_partitions()

    def explode_wins(batch: pa.Table) -> pa.Table:
        counts, _, word_hash = _batch_windows(
            batch.column(text_col).to_pylist())
        wh, wd, _ = _roll(word_hash, counts, k)
        ids = batch.column(id_col).take(pa.array(wd))
        return pa.table({id_col: ids, "__wh": pa.array(wh, pa.int64())})

    wins = docs.map_batches(explode_wins, batch_format="pyarrow")
    hits = (wins.join(drop_empty_blocks(evh), join_type="left_semi",
                      num_partitions=nparts, on=("__wh",))
            .groupby(id_col).aggregate(Count(alias_name="_nh")))

    def base(batch: pa.Table) -> pa.Table:
        counts, _, _ = _batch_windows(batch.column(text_col).to_pylist())
        cols = ({c: batch.column(c) for c in batch.column_names}
                if passthrough else {id_col: batch.column(id_col)})
        cols["n_windows"] = pa.array(np.maximum(counts - k + 1, 0), pa.int64())
        return pa.table(cols)

    basetab = docs.map_batches(base, batch_format="pyarrow")
    joined = basetab.join(drop_empty_blocks(hits), join_type="left_outer",
                          num_partitions=nparts, on=(id_col,))

    def finish(batch: pa.Table) -> pa.Table:
        nh = pc.coalesce(batch.column("_nh"),
                         pa.scalar(0, batch.schema.field("_nh").type))
        nh = pc.cast(nh, pa.int64())
        cols = {c: batch.column(c) for c in batch.column_names
                if c != "_nh"} if passthrough else {
                id_col: batch.column(id_col),
                "n_windows": batch.column("n_windows")}
        cols["n_eval_hits"] = nh
        cols["contaminated"] = pc.greater_equal(
            nh, pa.scalar(min_hits, pa.int64()))
        return pa.table(cols)

    return joined.map_batches(finish, batch_format="pyarrow")


def boilerplate_stats(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    k: int = 8,
    min_docs: int = 2,
) -> pa.Table:
    """Corpus-health scalar metrics for duplicated k-word spans (the
    "boilerplate mass" a substring-dedup pass would remove): total strict
    k-windows, window POSITIONS whose window occurs in >= ``min_docs``
    distinct docs, distinct duplicated windows, and docs touched.

    Two streaming passes over the corpus (the dup-hash Dataset from pass 1
    is broadcast into pass 2's counting map — same shape as
    :func:`dup_span_clean`'s broadcast path but reduced to four counters,
    so the driver holds scalars, not spans)."""
    dup = dup_window_hashes(ds, text_col, k=k, min_docs=min_docs).materialize()
    n_dup_windows = dup.count()
    arr = (np.sort(np.concatenate(
        [ray.get(r).column("__wh").to_numpy(zero_copy_only=False)
         for r in dup.to_arrow_refs()]).astype(np.int64))
        if n_dup_windows else np.empty(0, np.int64))
    ref = ray.put(arr)

    def count_hits(batch: pa.Table, dup_ref) -> pa.Table:
        dup_arr = ray.get(dup_ref)
        counts, _, word_hash = _batch_windows(
            batch.column(text_col).to_pylist())
        wh, wd, _ = _roll(word_hash, counts, k)
        hit = np.isin(wh, dup_arr)
        docs_touched = int(np.unique(wd[hit]).size)
        return pa.table({
            "n_windows": pa.array([len(wh)], pa.int64()),
            "n_dup_positions": pa.array([int(hit.sum())], pa.int64()),
            "n_docs": pa.array([batch.num_rows], pa.int64()),
            "n_docs_touched": pa.array([docs_touched], pa.int64()),
        })

    tot = {"n_windows": 0, "n_dup_positions": 0, "n_docs": 0,
           "n_docs_touched": 0}
    for r in (ds.select_columns([id_col, text_col])
              .map_batches(count_hits, fn_args=(ref,),
                           batch_format="pyarrow").take_all()):
        for c in tot:
            tot[c] += r[c]
    return pa.table({
        "n_windows": pa.array([tot["n_windows"]], pa.int64()),
        "n_dup_windows": pa.array([int(n_dup_windows)], pa.int64()),
        "n_dup_positions": pa.array([tot["n_dup_positions"]], pa.int64()),
        "n_docs_touched": pa.array([tot["n_docs_touched"]], pa.int64()),
    })


def source_overlap_matrix(
    ds: ray.data.Dataset,
    text_col: str,
    group_col: str,
    k: int = 8,
    max_groups: int = 63,
) -> pa.Table:
    """Cross-source duplication matrix: for every pair of ``group_col``
    values (sources), the number of DISTINCT k-word windows that occur in
    both — the corpus-curation signal for "which feeds copy from each
    other" (mirror detection, syndication, license leakage).

    Shape (all vectorized, nothing corpus-scale on the driver):

      pass 1  per-batch distinct (window_hash, group) pairs
              → ``groupby([wh, gid]).count()``      — shuffle 1 (pair table)
      pass 2  pairs → (wh, 1 << gid) bit rows
              → ``groupby(wh).Sum``                 — shuffle 2; the Sum IS
              a bitwise OR because pass 1 made each (wh, gid) unique
      pass 3  per-batch mask histogram → pair expansion (≤ C(G,2) rows per
              batch) → group-pair-sized driver combine.

    Groups are indexed into bits of an int64, hence ``max_groups`` ≤ 63 —
    the operator targets SOURCE-level granularity (feeds, crawls, dumps),
    not per-document keys.  Window identity is the same 64-bit rolling hash
    as :func:`dup_window_hashes` (collision odds documented in the module
    header; the SQL oracle re-derives from window strings).
    """
    from ray.data.aggregate import Count

    groups = sorted({r[group_col] for r in ds.select_columns([group_col])
                     .map_batches(lambda t: pa.table(
                         {group_col: t.column(group_col).unique()}),
                         batch_format="pyarrow").take_all()})
    if len(groups) > max_groups:
        raise ValueError(
            f"source_overlap_matrix indexes groups into int64 bits: "
            f"{len(groups)} groups > {max_groups}; pre-bucket the key")
    gid = {g: i for i, g in enumerate(groups)}
    gid_ref = ray.put(gid)

    def windows(batch: pa.Table, ref) -> pa.Table:
        gmap = ray.get(ref)
        counts, _, word_hash = _batch_windows(
            batch.column(text_col).to_pylist())
        wh, wd, _ = _roll(word_hash, counts, k)
        gcol = batch.column(group_col).to_pylist()
        g = np.array([gmap[v] for v in gcol], np.int64)[wd] if len(wd) else \
            np.empty(0, np.int64)
        if len(wh) == 0:
            return pa.table({"__wh": pa.array([], pa.int64()),
                             "__g": pa.array([], pa.int64())})
        order = np.lexsort((g, wh))
        ws, gs = wh[order], g[order]
        first = np.ones(len(ws), dtype=bool)
        first[1:] = (ws[1:] != ws[:-1]) | (gs[1:] != gs[:-1])
        return pa.table({"__wh": pa.array(ws[first], pa.int64()),
                         "__g": pa.array(gs[first], pa.int64())})

    import functools

    pairs = (ds.select_columns([text_col, group_col])
             .map_batches(functools.partial(windows, ref=gid_ref),
                          batch_format="pyarrow")
             .groupby(["__wh", "__g"]).count())  # global distinct (wh, g)
    masks = (pairs.map_batches(
        lambda t: pa.table({
            "__wh": t.column("__wh"),
            "__bit": pc.shift_left(
                pa.array(np.ones(t.num_rows, np.int64)),
                t.column("__g").cast(pa.int64()))}),
        batch_format="pyarrow")
        .groupby("__wh").aggregate(Sum("__bit", alias_name="__mask")))

    G = len(groups)

    def pair_partials(batch: pa.Table) -> pa.Table:
        m = batch.column("__mask").to_numpy(zero_copy_only=False)
        um, cnt = np.unique(m, return_counts=True)
        out_a, out_b, out_n = [], [], []
        for mask, n in zip(um.tolist(), cnt.tolist()):
            bits = [i for i in range(G) if mask >> i & 1]
            for x in range(len(bits)):
                for y in range(x + 1, len(bits)):
                    out_a.append(bits[x])
                    out_b.append(bits[y])
                    out_n.append(n)
        return pa.table({"__a": pa.array(out_a, pa.int64()),
                         "__b": pa.array(out_b, pa.int64()),
                         "n_shared": pa.array(out_n, pa.int64())})

    cells = masks.map_batches(pair_partials,
                              batch_format="pyarrow").take_all()
    agg: dict = {}
    for r in cells:  # <= C(G,2) per batch
        kk = (r["__a"], r["__b"])
        agg[kk] = agg.get(kk, 0) + r["n_shared"]
    keys = sorted(agg)
    return pa.table({
        "src_a": pa.array([groups[a] for a, _ in keys], pa.string()),
        "src_b": pa.array([groups[b] for _, b in keys], pa.string()),
        "n_shared": pa.array([agg[kk] for kk in keys], pa.int64())})


def containment_pairs(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    k: int = 3,
    rare_max: int = 8,
    ratio_num: int = 1,
    ratio_den: int = 4,
    n_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """Doc pairs whose shared RARE k-word windows cover >= ratio_num/ratio_den
    of the smaller doc's rare-window set — near-superset / quotation
    detection (the containment counterpart of resemblance-based MinHash).

    Rarity IS the scale bound: only windows occurring in <= ``rare_max``
    docs generate pairs, so the pair explosion is capped at C(rare_max, 2)
    per window instead of C(df, 2) — boilerplate windows (high df) never
    fan out.  The predicate is integer-exact
    (``shared * ratio_den >= ratio_num * min(n_a, n_b)``).

    Shape:
      1. per-batch DISTINCT (window_hash, doc) rows       — map-side
      2. ONE coarse-bucket shuffle (hash % n_buckets); inside each bucket a
         vectorized run scan emits per-doc rare-window count partials AND
         per-run triu pairs (per-size-class broadcast, no Python per pair)
      3. pair-keyed combine + two doc-keyed joins for the denominators.

    Window identity is the 64-bit rolling hash (collision odds as in the
    module header); the SQL oracle re-derives from window strings.
    Returns Dataset(id_a, id_b, shared, min_windows).
    """
    from ..dsutil import drop_empty_blocks
    from .joins import shuffle_join

    if n_buckets is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        n_buckets = max(64, 4 * n_cpus)

    def windows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        counts, _, word_hash = _batch_windows(batch.column(text_col).to_pylist())
        wh, wd, _ = _roll(word_hash, counts, k)
        if len(wh) == 0:
            return pa.table({"_b": pa.array([], pa.int64()),
                             "_wh": pa.array([], pa.int64()),
                             "_doc": pa.array([], pa.int64())})
        d = ids[wd]
        order = np.lexsort((d, wh))
        w, dd = wh[order], d[order]
        first = np.ones(len(w), dtype=bool)
        first[1:] = (w[1:] != w[:-1]) | (dd[1:] != dd[:-1])
        w, dd = w[first], dd[first]
        bkt = (w.view(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
        return pa.table({"_b": pa.array(bkt, pa.int64()),
                         "_wh": pa.array(w, pa.int64()),
                         "_doc": pa.array(dd, pa.int64())})

    def bucket_stage(group: pa.Table) -> pa.Table:
        w = group.column("_wh").to_numpy(zero_copy_only=False)
        d = group.column("_doc").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, w))
        w, d = w[order], d[order]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        sizes = np.diff(np.r_[starts, len(w)])
        size_of_row = np.repeat(sizes, sizes)
        rare_docs = d[size_of_row <= rare_max]
        out_k, out_a, out_b, out_n = [], [], [], []
        if len(rare_docs):
            t = pa.table({"a": pa.array(rare_docs, pa.int64())})
            g = t.group_by("a").aggregate([([], "count_all")])
            na = g.column("a").to_numpy(zero_copy_only=False)
            nn = g.column("count_all").to_numpy(zero_copy_only=False)
            out_k.append(np.zeros(len(na), np.int64))
            out_a.append(na)
            out_b.append(np.zeros(len(na), np.int64))
            out_n.append(nn.astype(np.int64))
        pair_a, pair_b = [], []
        for s in np.unique(sizes[(sizes >= 2) & (sizes <= rare_max)]):
            run_starts = starts[sizes == s]
            mem = d[run_starts[:, None] + np.arange(s)]
            iu, ju = np.triu_indices(int(s), 1)
            pair_a.append(mem[:, iu].ravel())
            pair_b.append(mem[:, ju].ravel())
        if pair_a:
            pa_arr = np.concatenate(pair_a)
            pb_arr = np.concatenate(pair_b)
            t = pa.table({"a": pa.array(pa_arr, pa.int64()),
                          "b": pa.array(pb_arr, pa.int64())})
            g = t.group_by(["a", "b"]).aggregate([([], "count_all")])
            out_k.append(np.ones(g.num_rows, np.int64))
            out_a.append(g.column("a").to_numpy(zero_copy_only=False))
            out_b.append(g.column("b").to_numpy(zero_copy_only=False))
            out_n.append(g.column("count_all").to_numpy(
                zero_copy_only=False).astype(np.int64))
        if not out_k:
            return pa.table({"_k": pa.array([], pa.int64()),
                             "a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "_k": pa.array(np.concatenate(out_k), pa.int64()),
            "a": pa.array(np.concatenate(out_a), pa.int64()),
            "b": pa.array(np.concatenate(out_b), pa.int64()),
            "n": pa.array(np.concatenate(out_n), pa.int64()),
        })

    tagged = (ds.select_columns([id_col, text_col])
              .map_batches(windows, batch_format="pyarrow")
              .groupby("_b")
              .map_groups(bucket_stage, batch_format="pyarrow")
              .materialize())

    count_schema = pa.schema([("doc", pa.int64()), ("n_rare", pa.int64())])
    nw = drop_empty_blocks(
        tagged.filter(expr="_k == 0")
        .map_batches(lambda t: pa.table({"doc": t.column("a"),
                                         "n_rare": t.column("n")}),
                     batch_format="pyarrow")
        .groupby("doc").aggregate(Sum("n_rare", alias_name="n_rare")),
        empty_schema=count_schema)
    pair_schema = pa.schema([("a", pa.int64()), ("b", pa.int64()),
                             ("shared", pa.int64())])
    pairs = drop_empty_blocks(
        tagged.filter(expr="_k == 1")
        .map_batches(lambda t: t.select(["a", "b", "n"]).rename_columns(
            ["a", "b", "shared"]), batch_format="pyarrow")
        .groupby(["a", "b"]).aggregate(Sum("shared", alias_name="shared")),
        empty_schema=pair_schema)

    from .dedup import join_partitions_for

    # Materialize both sides before counting so the aggregation pipelines
    # execute exactly once (count reads cached metadata; the joins reuse
    # the same blocks instead of re-running the groupbys).
    pairs = pairs.materialize()
    nw = nw.materialize()
    P = join_partitions_for(pairs.count(), nw.count())
    j1 = shuffle_join(pairs, nw, on="a", right_on="doc", num_partitions=P)

    def keep_na(t: pa.Table) -> pa.Table:
        return pa.table({"a": t.column("a"), "b": t.column("b"),
                         "shared": t.column("shared"),
                         "n_a": t.column("n_rare")})

    j1 = drop_empty_blocks(
        j1.map_batches(keep_na, batch_format="pyarrow"),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("shared", pa.int64()), ("n_a", pa.int64())]))
    j2 = shuffle_join(j1, nw, on="b", right_on="doc", num_partitions=P)

    def finish(t: pa.Table) -> pa.Table:
        sh = t.column("shared").to_numpy(zero_copy_only=False)
        na = t.column("n_a").to_numpy(zero_copy_only=False)
        nb = t.column("n_rare").to_numpy(zero_copy_only=False)
        mn = np.minimum(na, nb)
        keep = sh * ratio_den >= ratio_num * mn
        return pa.table({
            "id_a": t.column("a").filter(pa.array(keep)),
            "id_b": t.column("b").filter(pa.array(keep)),
            "shared": pa.array(sh[keep], pa.int64()),
            "min_windows": pa.array(mn[keep], pa.int64()),
        })

    return j2.map_batches(finish, batch_format="pyarrow")


def set_similarity_pairs(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    k: int = 5,
    tau_num: int = 1,
    tau_den: int = 2,
    n_buckets: Optional[int] = None,
) -> ray.data.Dataset:
    """EXACT set-similarity join: all doc pairs whose DISTINCT k-word-shingle
    sets have Jaccard >= tau_num/tau_den — the prefix-filtering join of
    Chaudhuri/Ganti/Kaushik (SSJoin) as distributed by Vernica, Carey &
    Li (SIGMOD 2010), re-expressed over Ray Data.

    Prefix filter (exact, no candidates lost): under ONE global token order
    (df asc, hash asc), two sets with J >= τ must share a token within each
    set's first ``n - ceil(τ·n) + 1`` tokens.  Only prefix tokens are
    exploded into the candidate shuffle — rare tokens first, so the blocking
    groups stay small exactly where the data is dense.

    Shape:
      1. per-batch DISTINCT (shingle_hash, doc) + a zero-shuffle per-doc
         sorted full-array table (each doc lives in one input row)
      2. df combine (shingle-keyed)  → join df back (shingle-keyed)
         → doc-bucketed prefix selection (vectorized run scan; integer-exact
         ceil via -(-num·n // den))
      3. prefix-token-bucketed run scan → candidate pairs → pair-distinct
      4. two pair-keyed array joins + per-pair sorted-array intersection
         (per-candidate verification IS the output-size lower bound);
         integer-exact predicate ``den·shared >= num·(n_a + n_b - shared)``.

    Shingle identity is the 64-bit rolling hash (collision odds in the
    module header); the SQL oracle re-derives from shingle strings.
    Returns Dataset(id_a, id_b, shared, union_size).
    """
    from ..dsutil import drop_empty_blocks
    from .joins import shuffle_join

    if n_buckets is None:
        n_cpus = int(ray.cluster_resources().get("CPU", 8)) \
            if ray.is_initialized() else 8
        n_buckets = max(64, 4 * n_cpus)

    def sh_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        counts, _, word_hash = _batch_windows(batch.column(text_col).to_pylist())
        wh, wd, _ = _roll(word_hash, counts, k)
        if len(wh) == 0:
            return pa.table({"_wh": pa.array([], pa.int64()),
                             "_doc": pa.array([], pa.int64())})
        d = ids[wd]
        order = np.lexsort((d, wh))
        w, dd = wh[order], d[order]
        first = np.ones(len(w), dtype=bool)
        first[1:] = (w[1:] != w[:-1]) | (dd[1:] != dd[:-1])
        return pa.table({"_wh": pa.array(w[first], pa.int64()),
                         "_doc": pa.array(dd[first], pa.int64())})

    def array_rows(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        counts, _, word_hash = _batch_windows(batch.column(text_col).to_pylist())
        wh, wd, _ = _roll(word_hash, counts, k)
        docs, arrs, ns = [], [], []
        if len(wh):
            order = np.lexsort((wh, wd))
            w, dd = wh[order], wd[order]
            starts = np.flatnonzero(np.r_[True, dd[1:] != dd[:-1]])
            bounds = np.r_[starts, len(dd)]
            for i, s in enumerate(starts):
                e = bounds[i + 1]
                u = np.unique(w[s:e])          # sorted distinct hashes
                docs.append(int(ids[dd[s]]))
                arrs.append(u.astype(np.int64))
                ns.append(len(u))
        # int64 arrays ship as binary payloads: Arrow's hash join
        # rejects list-typed non-key fields, and bytes round-trip zero-copy
        # via np.frombuffer on the verify side
        return pa.table({
            "doc": pa.array(docs, pa.int64()),
            "arr": pa.array([a.tobytes() for a in arrs], pa.binary()),
            "n": pa.array(ns, pa.int64()),
        })

    sh = ds.select_columns([id_col, text_col]) \
        .map_batches(sh_rows, batch_format="pyarrow").materialize()
    arrays = drop_empty_blocks(
        ds.select_columns([id_col, text_col])
          .map_batches(array_rows, batch_format="pyarrow"),
        empty_schema=pa.schema([("doc", pa.int64()),
                                ("arr", pa.binary()),
                                ("n", pa.int64())]))

    from .dedup import join_partitions_for

    n_sh = sh.count()   # sh is materialized: metadata-only
    df = sh.groupby("_wh").aggregate(Count(alias_name="_df"))
    P = join_partitions_for(n_sh)
    joined = shuffle_join(sh, df, on="_wh", num_partitions=P)

    def to_doc_bucket(t: pa.Table) -> pa.Table:
        d = t.column("_doc").to_numpy(zero_copy_only=False)
        b = (d.view(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("_db", pa.array(b, pa.int64()))

    def prefix_select(group: pa.Table) -> pa.Table:
        d = group.column("_doc").to_numpy(zero_copy_only=False)
        w = group.column("_wh").to_numpy(zero_copy_only=False)
        f = group.column("_df").to_numpy(zero_copy_only=False)
        order = np.lexsort((w, f, d))
        d, w = d[order], w[order]
        starts = np.flatnonzero(np.r_[True, d[1:] != d[:-1]])
        sizes = np.diff(np.r_[starts, len(d)])
        n_of = np.repeat(sizes, sizes)
        # within-doc index
        idx = np.arange(len(d)) - np.repeat(starts, sizes)
        # prefix length p = n - ceil(tau*n) + 1 (integer-exact ceil)
        p_of = n_of - (-(tau_num * n_of) // tau_den) + 1
        keep = idx < p_of
        return pa.table({"_wh": pa.array(w[keep], pa.int64()),
                         "_doc": pa.array(d[keep], pa.int64())})

    prefixes = (joined.map_batches(to_doc_bucket, batch_format="pyarrow")
                .groupby("_db").map_groups(prefix_select,
                                           batch_format="pyarrow"))

    def to_tok_bucket(t: pa.Table) -> pa.Table:
        w = t.column("_wh").to_numpy(zero_copy_only=False)
        b = (w.view(np.uint64) % np.uint64(n_buckets)).astype(np.int64)
        return t.append_column("_tb", pa.array(b, pa.int64()))

    def candidate_pairs(group: pa.Table) -> pa.Table:
        w = group.column("_wh").to_numpy(zero_copy_only=False)
        d = group.column("_doc").to_numpy(zero_copy_only=False)
        order = np.lexsort((d, w))
        w, d = w[order], d[order]
        starts = np.flatnonzero(np.r_[True, w[1:] != w[:-1]])
        sizes = np.diff(np.r_[starts, len(w)])
        pair_a, pair_b = [], []
        for s in np.unique(sizes[sizes >= 2]):
            run_starts = starts[sizes == s]
            mem = d[run_starts[:, None] + np.arange(s)]
            iu, ju = np.triu_indices(int(s), 1)
            pair_a.append(mem[:, iu].ravel())
            pair_b.append(mem[:, ju].ravel())
        if not pair_a:
            return pa.table({"a": pa.array([], pa.int64()),
                             "b": pa.array([], pa.int64())})
        aa = np.concatenate(pair_a)
        bb = np.concatenate(pair_b)
        t = pa.table({"a": pa.array(aa, pa.int64()),
                      "b": pa.array(bb, pa.int64())})
        g = t.group_by(["a", "b"]).aggregate([])
        return g

    from ..dsutil import distinct_rows_by

    cands = drop_empty_blocks(
        distinct_rows_by(
            prefixes.map_batches(to_tok_bucket, batch_format="pyarrow")
            .groupby("_tb").map_groups(candidate_pairs,
                                       batch_format="pyarrow"),
            ["a", "b"]),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64())]))

    # Materialize BOTH sides before counting: .count() on a lazy Dataset
    # would execute the candidate/aggregation pipeline once for the count
    # and shuffle_join would re-execute it — the most expensive stage
    # running twice.  Materialized, the count reads cached block metadata
    # and the joins consume the same blocks.
    cands = cands.materialize()
    arrays = arrays.materialize()
    Pv = join_partitions_for(cands.count(), arrays.count())
    j1 = shuffle_join(cands, arrays, on="a", right_on="doc",
                      num_partitions=Pv)
    j1 = drop_empty_blocks(
        j1.map_batches(lambda t: pa.table(
            {"a": t.column("a"), "b": t.column("b"),
             "arr_a": t.column("arr"), "n_a": t.column("n")}),
            batch_format="pyarrow"),
        empty_schema=pa.schema([("a", pa.int64()), ("b", pa.int64()),
                                ("arr_a", pa.binary()),
                                ("n_a", pa.int64())]))
    j2 = shuffle_join(j1, arrays, on="b", right_on="doc",
                      num_partitions=Pv)

    def verify(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"id_a": pa.array([], pa.int64()),
                             "id_b": pa.array([], pa.int64()),
                             "shared": pa.array([], pa.int64()),
                             "union_size": pa.array([], pa.int64())})
        aa = t.column("a").to_numpy(zero_copy_only=False)
        bb = t.column("b").to_numpy(zero_copy_only=False)
        na = t.column("n_a").to_numpy(zero_copy_only=False)
        nb = t.column("n").to_numpy(zero_copy_only=False)
        arr_a = t.column("arr_a").to_pylist()
        arr_b = t.column("arr").to_pylist()
        shared = np.empty(len(aa), np.int64)
        for i in range(len(aa)):   # per-CANDIDATE work = verification floor
            shared[i] = len(np.intersect1d(
                np.frombuffer(arr_a[i], np.int64),
                np.frombuffer(arr_b[i], np.int64), assume_unique=True))
        union = na + nb - shared
        keep = tau_den * shared >= tau_num * union
        return pa.table({
            "id_a": pa.array(aa[keep], pa.int64()),
            "id_b": pa.array(bb[keep], pa.int64()),
            "shared": pa.array(shared[keep], pa.int64()),
            "union_size": pa.array(union[keep], pa.int64()),
        })

    return j2.map_batches(verify, batch_format="pyarrow")
