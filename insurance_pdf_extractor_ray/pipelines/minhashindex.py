"""Incremental MinHash/LSH near-dup dedup against an at-rest BUCKETED index.

``dedup.minhash_dedup`` answers the within-corpus question; a continuous
crawl needs the cross-increment one — "is this new doc a near-dup of
anything kept in any PREVIOUS batch?" — without re-shingling or re-shuffling
the accumulated corpus.  Reference analog: re-uploading the same quote PDF
should not create a second record (storage.py upsert-on-conflict), fuzzily.

At-rest state under ``index_dir`` (two ``bucketed.py`` layouts):

  * ``bands/``  — (band_key uint64, id) hash-bucketed ON band_key:
    16 + |id| bytes per (doc, band).
  * ``sigs/``   — (id, sig binary) one row per kept doc, hash-bucketed ON
    id: num_perm * 8 bytes per doc.  Signatures are stored ONCE, not per
    band row — at 10^10 docs the bands table is ~2 TB and sigs ~10 TB,
    versus ~160 TB if signatures rode every band row.

Probe scale shape (the point of this module): an increment incurs ZERO
all-to-all exchange —

  1. one map pass shingles/signs the increment (MinHashStage, SAME seed
     as the index so signatures are comparable), shrinks signatures to
     one per doc and pins the slim rows; ONE multi-target execution then
     stages the SAME two slim layouts as the index: (band_key, id) at
     16+|id| bytes/row bucketed on band_key, and one (id, sig) row per
     doc bucketed on id — signatures never ride the band rows (the
     staging analog of the batch path's "recompute sigs only for
     colliding docs": at 1.2M docs/increment this is ~1.7 GB of staging
     vs 18.7 GB when sigs rode every band row, and the disk-bound stages
     were what broke 4-vs-16-CPU scaling);
  2. ONE fused bucket pass per band bucket finds in-batch band groups
     with >= 2 members (collision-bounded) AND joins the co-located
     index bucket locally into distinct (new, old) candidate pairs —
     16-byte rows only, index never moves;
  3. ONE fused bucket pass per sig bucket fetches the new side's
     signatures for both consumers — collide rows regrouped by band_key
     for the batch path's ``_bucket_dups`` chain kernel, candidate pairs
     re-bucketed on the OLD id — reading each increment sig bucket
     exactly once;
  4. candidates verify against ``sigs/`` by co-located join (buckets
     with no candidates skip the read), and in-batch dups come from the
     chain kernel per regrouped band — no groupby shuffle anywhere.

  Each Ray Data execution carries seconds of fixed wave latency
  regardless of data size; the fused passes above hold an increment to
  six executions (sign+pin, stage x1, fused pass x2, dup union, kept
  filter) plus a one-execution index append, which is what keeps small
  increments cheap and 4-vs-16-CPU scaling honest.

Commit protocol mirrors ``exact_dedup_incremental``: the function returns
``(kept, sig_rows_kept)`` and the caller appends with
``minhash_index_append`` AFTER durably sinking ``kept`` (data first, index
last — a crashed increment re-runs without poisoning the index).
"""

from __future__ import annotations

import os
import tempfile
from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray.data

from .bucketed import (
    _read_bucket,
    bucketed_join,
    layout_of,
    write_bucketed_multi,
    write_fragment_bucketed,
    write_layout_manifest,
)
from .dedup import (
    MAX_BROADCAST_ROWS,
    MinHashStage,
    _bucket_dups,
    filter_by_ids,
)

_BANDS, _SIGS = "bands", "sigs"


def _phase_timer():
    """Env-gated (``IPE_MHINC_TIMING=1``) phase wall-clock logger for the
    incremental path — each phase below ends in an eager execution, so
    driver-side timestamps genuinely bound per-phase cost."""
    import sys
    import time as _time

    if not os.environ.get("IPE_MHINC_TIMING"):
        return lambda label: None
    state = {"t": _time.time()}

    def mark(label: str) -> None:
        now = _time.time()
        print(f"[mhinc-phase] {label}: {now - state['t']:.2f}s",
              file=sys.stderr, flush=True)
        state["t"] = now

    return mark


#: per-worker-process stage cache: incremental ingest consumes the signing
#: lineage several times (bands write, kept-sig recompute, index append) —
#: an actor pool would pay its spin-up on EVERY execution (~2-3 s each,
#: measured), while cached tasks fuse with the upstream read and reuse the
#: compiled permutation state, the same trick as extraction's
#: _cached_extractor
_STAGE_CACHE: dict = {}


def _sig_rows(ds: ray.data.Dataset, col: str, id_col: str, num_perm: int,
              num_bands: int, ngram: int, seed: int,
              concurrency=None) -> ray.data.Dataset:
    """(band_key, id, sig) rows — one per (doc, band)."""
    key = (col, id_col, num_perm, num_bands, ngram, seed)

    def sign(batch: pa.Table) -> pa.Table:
        st = _STAGE_CACHE.get(key)
        if st is None:
            st = _STAGE_CACHE[key] = MinHashStage(
                col=col, id_col=id_col, num_perm=num_perm,
                num_bands=num_bands, ngram=ngram, seed=seed)
        return st(batch)

    return ds.select_columns([id_col, col]).map_batches(
        sign, batch_format="pyarrow")


def _shrink_sig_rows(sig_rows: ray.data.Dataset,
                     id_col: str) -> ray.data.Dataset:
    """Null every signature except one per doc in (band_key, id, sig)
    stage output: a doc's band rows are contiguous within stage-output
    batches, so a local first-occurrence mask finds the keeper without a
    keyed groupby — the row set is unchanged (band rows survive), only
    the num_bands-fold signature duplication goes.  Idempotent (a second
    pass keeps the same keeper).  A doc whose rows straddle a batch
    boundary keeps an extra sig — id-keyed joins then emit a duplicate
    candidate, which collapses at the dup-id distinct, costing bytes,
    never correctness."""
    import pyarrow.compute as pc

    def shrink(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        first = np.ones(len(ids), dtype=bool)
        first[1:] = ids[1:] != ids[:-1]
        sig = t.column("sig")
        if isinstance(sig, pa.ChunkedArray):
            sig = sig.combine_chunks()
        masked = pc.if_else(pa.array(first), sig,
                            pa.nulls(len(ids), sig.type))
        return t.set_column(t.schema.get_field_index("sig"), "sig", masked)

    return sig_rows.map_batches(shrink, batch_format="pyarrow")


def _pick_valid(t: pa.Table, id_col: str) -> pa.Table:
    """(id, sig) once per doc from shrunk rows (the non-null keepers)."""
    import pyarrow.compute as pc

    return t.filter(pc.is_valid(t.column("sig"))).select([id_col, "sig"])


def _stage_collide_and_cand(
    bands_new: str,
    bands_idx: Optional[str],
    collide_by_id: str,
    cand_by_new: Optional[str],
    id_col: str,
    n_buckets: int,
) -> None:
    """ONE bucket pass over the increment's slim band layout derives BOTH
    downstream staging layouts:

      * rows of in-batch band groups with >= 2 members, re-bucketed on id
        (collision-bounded — random 64-bit band keys almost never collide
        unless docs share shingles), and
      * distinct (new, old) candidate pairs from a LOCAL Arrow join against
        the co-located index band bucket, re-bucketed on the new id
        (``bands_idx=None`` on the first increment skips this side).

    The two derivations read the same bucket and previously ran as two
    separate executions (a bucket map + a ``bucketed_join``) — every Ray
    Data execution carries seconds of fixed wave latency, which dominated
    per-increment cost at small increments and capped 4-vs-16-CPU scaling.
    Fragments are named by source bucket (one task writes at most one
    fragment per destination bucket per layout), so retries are idempotent.
    """

    def one(batch: pa.Table) -> pa.Table:
        rows_out = 0
        for b in batch.column("bucket").to_pylist():
            t = _read_bucket(bands_new, b, ["band_key", id_col])
            if t is None or t.num_rows == 0:
                continue
            if t.num_rows >= 2:
                tt = t.sort_by("band_key").combine_chunks()
                keys = tt.column("band_key").to_numpy(zero_copy_only=False)
                first = np.ones(len(keys), dtype=bool)
                first[1:] = keys[1:] != keys[:-1]
                starts = np.flatnonzero(first)
                runs = np.diff(np.append(starts, len(keys)))
                multi = np.repeat(runs >= 2, runs)
                if multi.any():
                    rows_out += write_fragment_bucketed(
                        tt.filter(pa.array(multi)), collide_by_id, id_col,
                        n_buckets, tag=f"src{b:05d}")
            if bands_idx is not None:
                ti = _read_bucket(bands_idx, b, ["band_key", id_col])
                if ti is not None and ti.num_rows:
                    import polars as pl

                    j = t.join(
                        ti.select(["band_key", id_col])
                          .rename_columns(["band_key", "__old"]),
                        keys=["band_key"], join_type="inner")
                    if j.num_rows:
                        # local distinct: the same (new, old) pair arrives
                        # once per shared band; trimming here bounds the
                        # sig fetch
                        pairs = pl.from_arrow(pa.table({
                            "__new": j.column(id_col),
                            "__old": j.column("__old")})).unique().to_arrow()
                        rows_out += write_fragment_bucketed(
                            pairs, cand_by_new, "__new", n_buckets,
                            tag=f"src{b:05d}")
        return pa.table({"rows": pa.array([rows_out], pa.int64())})

    n = layout_of(bands_new)["n_buckets"]
    buckets = ray.data.from_items([{"bucket": i} for i in range(n)])
    # take_all over one stub row per bucket, NOT .sum(): an Aggregate adds
    # an all-to-all exchange whose fixed latency and resource reservation
    # throttle the bucket tasks on narrow clusters
    buckets.map_batches(one, batch_size=1, batch_format="pyarrow").take_all()
    write_layout_manifest(collide_by_id, id_col, n_buckets)
    if cand_by_new is not None:
        write_layout_manifest(cand_by_new, "__new", n_buckets)


def _stage_sig_joins(
    sigs_new: str,
    collide_by_id: str,
    cand_by_new: Optional[str],
    collide_by_band: str,
    cand_by_old: Optional[str],
    id_col: str,
    n_buckets: int,
) -> None:
    """ONE bucket pass fetches the NEW side's signatures for BOTH consumers
    — in-batch collide rows (re-bucketed on band_key for the chain kernel)
    and index candidate pairs (re-bucketed on the OLD id for the
    index-side verify) — reading each ``sigs_new`` bucket exactly once.
    Previously two separate ``bucketed_join`` executions read the same sig
    buckets twice and paid the fixed wave latency twice."""

    def one(batch: pa.Table) -> pa.Table:
        rows_out = 0
        for b in batch.column("bucket").to_pylist():
            sig_t = _read_bucket(sigs_new, b, None)
            if sig_t is None or sig_t.num_rows == 0:
                continue
            c1 = _read_bucket(collide_by_id, b, None)
            if c1 is not None and c1.num_rows:
                j = c1.join(sig_t, keys=[id_col], join_type="inner")
                rows_out += write_fragment_bucketed(
                    j, collide_by_band, "band_key", n_buckets,
                    tag=f"src{b:05d}")
            if cand_by_new is not None:
                c2 = _read_bucket(cand_by_new, b, None)
                if c2 is not None and c2.num_rows:
                    j2 = c2.join(sig_t, keys=["__new"], right_keys=[id_col],
                                 join_type="inner")
                    rows_out += write_fragment_bucketed(
                        j2, cand_by_old, "__old", n_buckets,
                        tag=f"src{b:05d}")
        return pa.table({"rows": pa.array([rows_out], pa.int64())})

    n = layout_of(sigs_new)["n_buckets"]
    buckets = ray.data.from_items([{"bucket": i} for i in range(n)])
    buckets.map_batches(one, batch_size=1, batch_format="pyarrow").take_all()
    write_layout_manifest(collide_by_band, "band_key", n_buckets)
    if cand_by_old is not None:
        write_layout_manifest(cand_by_old, "__old", n_buckets)


def _local_band_dups(bands_path: str, id_col: str, id_type: pa.DataType,
                     threshold: float, max_bucket: int) -> ray.data.Dataset:
    """Within-increment near-dup ids from a (band_key, id, sig) bucketed
    layout: one task per bucket, local sort + run-split by band_key, the
    batch path's ``_bucket_dups`` kernel per band — no shuffle."""
    n = layout_of(bands_path)["n_buckets"]
    empty = pa.table({id_col: pa.array([], id_type)})

    def one(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("bucket").to_pylist():
            t = _read_bucket(bands_path, b, None)
            if t is None or t.num_rows < 2:
                continue
            t = t.sort_by("band_key").combine_chunks()
            keys = t.column("band_key").to_numpy(zero_copy_only=False)
            bounds = np.flatnonzero(np.diff(keys)) + 1
            starts = np.concatenate(([0], bounds))
            ends = np.concatenate((bounds, [len(keys)]))
            for s, e in zip(starts, ends):
                if e - s < 2:
                    continue
                d = _bucket_dups(t.slice(s, e - s), id_col, threshold,
                                 max_bucket)
                if d.num_rows:
                    out.append(d)
        if not out:
            return empty
        return pa.concat_tables(out)

    buckets = ray.data.from_items([{"bucket": i} for i in range(n)])
    return buckets.map_batches(one, batch_size=1, batch_format="pyarrow")


def minhash_dedup_incremental(
    new_ds: ray.data.Dataset,
    index_dir: str,
    col: str,
    id_col: str,
    threshold: float = 0.8,
    num_perm: int = 128,
    num_bands: int = 16,
    ngram: int = 3,
    seed: int = 42,
    n_buckets: int = 32,
    max_bucket: int = 2048,
    concurrency=(1, 8),
    tmp_dir: Optional[str] = None,
    max_broadcast: int = MAX_BROADCAST_ROWS,
) -> Tuple[ray.data.Dataset, ray.data.Dataset]:
    """Near-dup-dedup one ingest increment against the at-rest index.

    Returns ``(kept, sig_rows_kept)``: rows of ``new_ds`` that are neither
    near-dups of any indexed doc nor of an earlier (min-id) doc in the same
    increment, and their (band_key, id, sig) rows — signatures shrunk to
    one non-null per doc — to commit with :func:`minhash_index_append`
    once ``kept`` is durably sunk.

    ``n_buckets`` only matters for the FIRST increment (it fixes the index
    layout); afterwards the index's own layout wins.  ``seed``/``num_perm``/
    ``num_bands``/``ngram`` must match across increments — signatures are
    only comparable under identical permutations.

    If ``write_stop_bands`` froze degenerate bands, their rows drop before
    the increment's layout is written; a doc whose EVERY band is frozen
    (pure boilerplate) is kept and left unindexed — by construction it has
    no discriminative band to be found under later.
    """
    mark = _phase_timer()
    tmp = tmp_dir or tempfile.mkdtemp(prefix="ipe_mhinc_")
    bands_idx = os.path.join(index_dir, _BANDS)
    sigs_idx = os.path.join(index_dir, _SIGS)
    have_index = os.path.exists(os.path.join(bands_idx, "_layout.json"))
    if have_index:
        n_buckets = layout_of(bands_idx)["n_buckets"]

    id_type = dict(zip(new_ds.schema().names, new_ds.schema().types))[id_col]

    # 1-2. sign the increment into TWO slim at-rest staging layouts (these
    # ARE the materialization — every later consumer reads a layout, not
    # lineage): bands_new carries (band_key, id) at 16+|id| bytes/row, and
    # sigs_new one (id, sig) row per doc — the SAME sigs-stored-once rule
    # as the index itself.  Signatures never ride the band exchange:
    # measured at 1.2M docs/increment, the old sig-per-band-row staging
    # wrote and re-read 18.7 GB where these two layouts total ~1.7 GB, and
    # the disk-bound stages were what broke 4-vs-16-CPU scaling.
    # Frozen stop bands (write_stop_bands) drop here, BEFORE the layouts:
    # neither the in-batch kernel nor the candidate join ever sees them.
    sig_rows = _sig_rows(new_ds, col, id_col, num_perm, num_bands, ngram,
                         seed, concurrency)
    stop = _stop_band_keys(index_dir)
    if stop is not None:
        import ray as _ray

        stop_ref = _ray.put(stop)

        def drop_stop(t: pa.Table) -> pa.Table:
            s = _ray.get(stop_ref)
            keys = t.column("band_key").to_numpy(zero_copy_only=False)
            return t.filter(pa.array(~np.isin(keys, s)))

        sig_rows = sig_rows.map_batches(drop_stop, batch_format="pyarrow")
    # sign ONCE: shrink to one sig per doc (16+|id| bytes per band row +
    # one sig/doc) and PIN — both later consumers (the staging multi-write
    # below and the returned append rows) read this increment-bounded copy
    # instead of re-running the shingle/sign pass (which a lazy lineage
    # would do once per consumer; each pass measured ~8 s per 1.2M docs
    # at 16 CPUs)
    slim = _shrink_sig_rows(sig_rows, id_col).materialize()
    mark("sign+shrink+pin")
    bands_new = os.path.join(tmp, "bands_new")
    sigs_new = os.path.join(tmp, "sigs_new")
    # ONE execution writes both staging layouts off the pin (each Ray Data
    # execution carries seconds of fixed wave latency; per-increment fixed
    # waves were what capped 4-vs-16-CPU scaling of this path)
    write_bucketed_multi(slim, [
        (bands_new, "band_key",
         lambda t: t.select(["band_key", id_col])),
        (sigs_new, id_col, lambda t: _pick_valid(t, id_col)),
    ], n_buckets)
    mark("stage-multi-write")

    # 3+5a. one fused bucket pass: in-batch colliding band rows (re-keyed
    # on id) AND distinct index candidate pairs (re-keyed on the new id)
    # from a local join against the co-located index bucket
    collide_by_id = os.path.join(tmp, "collide_by_id")
    cand_by_new = os.path.join(tmp, "cand_by_new") if have_index else None
    _stage_collide_and_cand(bands_new, bands_idx if have_index else None,
                            collide_by_id, cand_by_new, id_col, n_buckets)
    mark("collide+cand-pass")

    # 5b. one fused bucket pass fetches the new side's signatures for both
    # consumers: collide rows regrouped by band_key for the chain kernel,
    # candidate pairs re-keyed on the OLD id for the index-side verify —
    # signatures are fetched ONLY for colliding/candidate docs
    # (collision-bounded), mirroring the batch path's "recompute sigs only
    # for colliding docs" rule
    collide_by_band = os.path.join(tmp, "collide_by_band")
    cand_path = os.path.join(tmp, "cand") if have_index else None
    _stage_sig_joins(sigs_new, collide_by_id, cand_by_new,
                     collide_by_band, cand_path, id_col, n_buckets)
    mark("sig-join-pass")

    dups = _local_band_dups(collide_by_band, id_col, id_type, threshold,
                            max_bucket)

    if have_index:
        # 4. verify against sigs/ — candidate-empty buckets skip the read
        ver = bucketed_join(cand_path, sigs_idx, join_type="inner")

        def est(t: pa.Table) -> pa.Table:
            if "sig" not in t.column_names or t.num_rows == 0:
                return pa.table({id_col: pa.array([], id_type)})
            A = np.stack([np.frombuffer(b, np.uint64)
                          for b in t.column("sig").to_pylist()])
            B = np.stack([np.frombuffer(b, np.uint64)
                          for b in t.column("sig_r").to_pylist()])
            keep = (A == B).mean(axis=1) >= threshold
            return pa.table({id_col: t.column("__new").filter(pa.array(keep))})

        dups = dups.union(ver.map_batches(est, batch_format="pyarrow"))

    # pin the dup-id set once (dup-bounded): both filter calls below
    # consume it, and a lazy union would re-run the whole collide/verify
    # join pipeline per consumer
    dups = dups.materialize()
    mark("dups-union-pin")
    kept = filter_by_ids(new_ds, id_col, dups, keep_matching=False,
                         max_broadcast=max_broadcast)
    # the returned append rows derive from the SAME pinned shrunk copy —
    # no recompute pass (the pre-r5 code re-signed the whole increment
    # here), no layout re-read (band buckets scatter a doc's rows; the
    # pin preserves stage-output contiguity, which append's local
    # first-occurrence compaction relies on).  filter_by_ids drops whole
    # docs, so the keeper-sig row of every surviving doc survives.
    sig_rows_kept = filter_by_ids(slim, id_col, dups, keep_matching=False,
                                  max_broadcast=max_broadcast)
    return kept, sig_rows_kept


def minhash_index_append(index_dir: str, sig_rows_kept: ray.data.Dataset,
                         id_col: str, n_buckets: int = 32) -> None:
    """Commit one increment: append its band rows and per-doc signatures
    into the index layouts in one streaming pass (fragments append into
    existing ``_bucket=i/`` dirs with content-derived names, so re-running
    a crashed increment's append coalesces instead of duplicating rows).
    Call AFTER ``kept`` is durably written — data first, index last."""
    bands_idx = os.path.join(index_dir, _BANDS)
    sigs_idx = os.path.join(index_dir, _SIGS)
    if os.path.exists(os.path.join(bands_idx, "_layout.json")):
        n_buckets = layout_of(bands_idx)["n_buckets"]

    # SHRINK first (idempotent: minhash_dedup_incremental already returns
    # shrunk rows; raw rows from an external producer shrink here) so the
    # sigs layout never stores a signature per band row, then append both
    # index layouts in ONE execution — the multi-write consumes the
    # lineage exactly once, so no pin is needed and the whole commit is a
    # single streaming pass (was: a materialize plus two writes, three
    # fixed-latency executions per increment).
    slim = _shrink_sig_rows(sig_rows_kept, id_col)
    write_bucketed_multi(slim, [
        (bands_idx, "band_key",
         lambda t: t.select(["band_key", id_col])),
        (sigs_idx, id_col, lambda t: _pick_valid(t, id_col)),
    ], n_buckets)


def compact_bucketed(path: str) -> int:
    """Rewrite each ``_bucket=i/`` dir of a bucketed layout as ONE parquet
    fragment — repeated incremental appends leave many small files, and
    probe cost is per-fragment I/O.  Embarrassingly parallel (one task per
    bucket), resumable (a bucket is either compacted or untouched — the
    new fragment is written before the old ones are removed), no shuffle.
    Returns the number of buckets rewritten."""
    import glob as _glob

    import pyarrow.parquet as pq

    n = layout_of(path)["n_buckets"]

    def one(batch: pa.Table) -> pa.Table:
        done = 0
        for b in batch.column("bucket").to_pylist():
            d = os.path.join(path, f"_bucket={b}")
            files = sorted(_glob.glob(os.path.join(d, "*.parquet")))
            if len(files) < 2:
                continue
            t = pa.concat_tables([pq.read_table(f) for f in files])
            out = os.path.join(d, "compacted.parquet")
            pq.write_table(t, out + ".tmp")
            os.replace(out + ".tmp", out)  # new fragment durable first
            for f in files:
                if f != out:
                    os.remove(f)
            done += 1
        return pa.table({"n": pa.array([done], pa.int64())})

    buckets = ray.data.from_items([{"bucket": i} for i in range(n)])
    parts = buckets.map_batches(one, batch_size=1,
                                batch_format="pyarrow").take_all()
    return int(sum(r["n"] for r in parts))


def band_stats(index_dir: str, top: int = 50) -> pa.Table:
    """Occupancy audit of the bands layout: the ``top`` most-populated
    band keys with their row counts — per-bucket local counting, tiny
    driver-side merge (top x buckets rows).  Degenerate bands (boilerplate
    shingles every doc shares) are THE skew hazard of LSH at crawl scale:
    their buckets grow O(corpus) and every probe pays candidates against
    them."""
    bands = os.path.join(index_dir, _BANDS)
    n = layout_of(bands)["n_buckets"]

    def one(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("bucket").to_pylist():
            t = _read_bucket(bands, b, ["band_key"])
            if t is None or t.num_rows == 0:
                continue
            keys = t.column("band_key").to_numpy(zero_copy_only=False)
            uniq, counts = np.unique(keys, return_counts=True)
            k = min(top, len(uniq))
            sel = np.argpartition(counts, -k)[-k:]
            out.append(pa.table({"band_key": pa.array(uniq[sel], pa.uint64()),
                                 "n": pa.array(counts[sel], pa.int64())}))
        if not out:
            return pa.table({"band_key": pa.array([], pa.uint64()),
                             "n": pa.array([], pa.int64())})
        return pa.concat_tables(out)

    buckets = ray.data.from_items([{"bucket": i} for i in range(n)])
    # a band key lives in exactly ONE bucket (the layout hashes it there),
    # so per-bucket counts are already global — no re-aggregation needed
    rows = buckets.map_batches(one, batch_size=1,
                               batch_format="pyarrow").take_all()
    # explicit uint64 arrays: from_pylist would infer int64 and overflow on
    # band keys above int64.max
    t = pa.table({
        "band_key": pa.array([r["band_key"] for r in rows], pa.uint64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })
    return t.sort_by([("n", "descending"), ("band_key", "ascending")]).slice(0, top)


def write_stop_bands(index_dir: str, max_band_rows: int) -> int:
    """Freeze degenerate bands: record every band key whose index bucket
    exceeds ``max_band_rows`` in ``stop_bands.json``.  Future probes and
    appends drop those band rows up front (recall for pathological
    boilerplate bands is already served by the OTHER num_bands-1 bands),
    bounding candidate fan-out the same way ``max_bucket`` bounds the
    batch path's in-bucket work.  Returns how many bands were frozen.

    The over-threshold filter runs INSIDE each bucket task — only
    degenerate keys (by definition few) ever reach the driver."""
    import json as _json

    bands = os.path.join(index_dir, _BANDS)
    n = layout_of(bands)["n_buckets"]

    def one(batch: pa.Table) -> pa.Table:
        out = []
        for b in batch.column("bucket").to_pylist():
            t = _read_bucket(bands, b, ["band_key"])
            if t is None or t.num_rows <= max_band_rows:
                continue
            keys = t.column("band_key").to_numpy(zero_copy_only=False)
            uniq, counts = np.unique(keys, return_counts=True)
            hot = uniq[counts > max_band_rows]
            if len(hot):
                out.append(pa.table({"band_key": pa.array(hot, pa.uint64())}))
        if not out:
            return pa.table({"band_key": pa.array([], pa.uint64())})
        return pa.concat_tables(out)

    buckets = ray.data.from_items([{"bucket": i} for i in range(n)])
    rows = buckets.map_batches(one, batch_size=1,
                               batch_format="pyarrow").take_all()
    keys = sorted(int(r["band_key"]) for r in rows)
    with open(os.path.join(index_dir, "stop_bands.json"), "w") as f:
        _json.dump({"max_band_rows": max_band_rows, "band_keys": keys}, f)
    return len(keys)


def _stop_band_keys(index_dir: str) -> Optional[np.ndarray]:
    p = os.path.join(index_dir, "stop_bands.json")
    if not os.path.exists(p):
        return None
    import json as _json

    with open(p) as f:
        keys = _json.load(f)["band_keys"]
    return np.sort(np.array(keys, dtype=np.uint64)) if keys else None
