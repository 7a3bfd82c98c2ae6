"""Sequence packing — concat-and-chunk documents into fixed token budgets.

The pretraining layout step: documents are laid end-to-end in ``id_col``
order and cut every ``seq_len`` tokens; a document overlapping a cut belongs
to every sequence it touches.  Deterministic by construction (pure function
of ids and lengths — no first-fit bin state), so output is identical across
partitionings, retries and cluster sizes, and SQL-checkable with a window
cumsum.

Distributed shape — no global ordered scan:
  1. bucket docs by ``id // bucket`` and aggregate per-bucket token sums
     (one small keyed shuffle, output = one row per bucket);
  2. driver cumsum over the bucket sums (bucket-count-sized, not
     corpus-sized) -> broadcast base-offset table;
  3. one ``groupby(bucket).map_groups``: inside a bucket, offsets are the
     bucket base + an in-bucket cumsum by id (vectorized), then each doc
     explodes to its touched sequence range.

Pick ``bucket`` so one bucket's docs fit a worker (same contract as every
keyed map_groups in this engine); the broadcast table is #buckets rows.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Sum


def pack_sequences(
    ds: ray.data.Dataset,
    id_col: str,
    len_col: str,
    seq_len: int,
    bucket: int = 100_000,
) -> ray.data.Dataset:
    """One row per (doc, sequence) the doc occupies: (id, seq_id, start_tok,
    end_tok) with token offsets global over ``id_col`` order.  Zero-length
    docs are dropped (they occupy no tokens)."""

    def add_bucket(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return pa.table({
            id_col: batch.column(id_col),
            len_col: batch.column(len_col),
            "_bucket": pa.array(ids // bucket, pa.int64()),
        })

    with_b = ds.select_columns([id_col, len_col]).map_batches(
        add_bucket, batch_format="pyarrow")

    # per-bucket token sums -> driver cumsum -> broadcast base offsets
    sums = with_b.groupby("_bucket").aggregate(
        Sum(len_col, alias_name="_tok")).take_all()
    sums.sort(key=lambda r: r["_bucket"])
    bases = {}
    acc = 0
    for r in sums:
        bases[r["_bucket"]] = acc
        acc += int(r["_tok"])
    bases_ref = ray.put(bases)

    def explode(group: pa.Table) -> pa.Table:
        base = ray.get(bases_ref)[group.column("_bucket")[0].as_py()]
        order = pc.sort_indices(group, sort_keys=[(id_col, "ascending")])
        group = group.take(order)
        ids = group.column(id_col)
        lens = group.column(len_col).to_numpy(zero_copy_only=False).astype(np.int64)
        ends = base + np.cumsum(lens)
        starts = ends - lens
        nz = lens > 0
        s0 = starts[nz] // seq_len
        s1 = (ends[nz] - 1) // seq_len
        reps = (s1 - s0 + 1).astype(np.int64)
        idx = np.repeat(np.flatnonzero(nz), reps)
        offs = np.arange(len(idx)) - np.repeat(np.cumsum(reps) - reps, reps)
        seq_ids = s0[np.repeat(np.arange(len(s0)), reps)] + offs
        return pa.table({
            id_col: ids.take(pa.array(idx)),
            "seq_id": pa.array(seq_ids, pa.int64()),
            "start_tok": pa.array(starts[idx], pa.int64()),
            "end_tok": pa.array(ends[idx], pa.int64()),
        })

    return with_b.groupby("_bucket").map_groups(explode, batch_format="pyarrow")


def chunk_text(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    size: int,
    overlap: int = 0,
) -> ray.data.Dataset:
    """Sliding-window text chunking — the retrieval-indexing layout step
    (cut each document into ``size``-char windows advancing by
    ``size − overlap``), dual of :func:`pack_sequences`' concat-and-chunk.

    One row per (doc, chunk): (id, chunk_id, chunk_text) with
    chunk_id·stride the character start offset; the last chunk is short
    rather than padded, empty docs emit no chunks.  Pure per-row function ⇒
    zero shuffle, streams at any scale; the interior is all vectorized
    polars (len/int_ranges/explode/slice — no Python over rows), and
    offsets are CHARACTERS in both the engine (polars ``str.slice``) and
    the SQL oracle (``substr``), so outputs are hash-comparable even on
    non-ASCII text.
    """
    if overlap >= size:
        raise ValueError("overlap must be < size")
    stride = size - overlap

    def explode_chunks(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select([id_col, text_col]))
        df = df.with_columns(
            pl.col(text_col).str.len_chars().cast(pl.Int64).alias("_n"))
        df = df.with_columns(
            ((pl.col("_n") - 1) // stride + 1).clip(0).alias("_k"))
        df = (df.with_columns(pl.int_ranges(0, pl.col("_k")).alias("chunk_id"))
              .explode("chunk_id")
              .filter(pl.col("chunk_id").is_not_null()))
        df = df.with_columns(
            pl.col(text_col).str.slice(pl.col("chunk_id") * stride, size)
            .alias("chunk_text"))
        return df.select([id_col, "chunk_id", "chunk_text"]).to_arrow()

    return ds.select_columns([id_col, text_col]).map_batches(
        explode_chunks, batch_format="pyarrow")


def materialize_sequences(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    seq_len: int,
    bucket: int = 100_000,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """The last mile of concat-and-chunk packing: actual per-sequence
    training TEXT.  :func:`pack_sequences` gives each doc its global token
    offsets; here every (doc, sequence) row cuts its word slice out of the
    doc and the slices concatenate in ``id_col`` order per sequence —
    output one row per sequence: (seq_id, seq_text, n_tokens, n_docs).

    Tokens are whitespace runs (the oracle-verified doc_token_stats rule);
    pieces rejoin with single spaces on both engine and SQL side, so
    sequence text is hash-comparable.  Shape: pack (bucketed prefix sums) →
    ONE keyed join of the (doc, seq) rows back onto the doc text → a
    vectorized polars slice per row → ONE seq-keyed groupby whose groups
    hold <= ceil(seq_len/1)+1 docs' pieces (a sequence is seq_len tokens —
    groups are budget-bounded, never corpus-scale).  Moving corpus text
    through two keyed exchanges is the honest cost of materializing
    training rows; the offsets-only layout stays available from
    pack_sequences when the loader can slice lazily.
    """
    from .dedup import _join_partitions
    from .pretrain import count_ws_tokens

    nparts = num_partitions or _join_partitions()
    toks = count_ws_tokens(ds, text_col, id_col)
    packed = pack_sequences(toks, id_col, "n_tokens", seq_len=seq_len,
                            bucket=bucket)
    joined = packed.join(ds.select_columns([id_col, text_col]),
                         join_type="inner", num_partitions=nparts,
                         on=(id_col,))

    def slice_piece(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(
            [id_col, "seq_id", "start_tok", "end_tok", text_col]))
        df = df.with_columns(
            pl.col(text_col).cast(pl.String).str.extract_all(r"\S+")
            .alias("_w"))
        n = pl.col("end_tok") - pl.col("start_tok")
        lo = (pl.col("seq_id") * seq_len - pl.col("start_tok")).clip(0)
        hi_excl = ((pl.col("seq_id") + 1) * seq_len
                   - pl.col("start_tok")).clip(upper_bound=n)
        df = df.with_columns(
            pl.col("_w").list.slice(lo, hi_excl - lo)
            .list.join(" ").alias("piece"),
            (hi_excl - lo).cast(pl.Int64).alias("_ntok"))
        return df.select([id_col, "seq_id", "piece", "_ntok"]).to_arrow()

    pieces = joined.map_batches(slice_piece, batch_format="pyarrow")

    def concat(part: pa.Table) -> pa.Table:
        # all sequences of the partition at once: one Rust-side sorted
        # string-join / sum / count per seq_id
        import polars as pl

        df = pl.from_arrow(part.select(["seq_id", id_col, "piece", "_ntok"]))
        out = (df.sort(["seq_id", id_col])
                 .group_by("seq_id", maintain_order=True)
                 .agg(pl.col("piece").str.join(" ").alias("seq_text"),
                      pl.col("_ntok").sum().alias("n_tokens"),
                      pl.len().cast(pl.Int64).alias("n_docs")))
        return out.to_arrow().cast(pa.schema([
            ("seq_id", pa.int64()), ("seq_text", pa.string()),
            ("n_tokens", pa.int64()), ("n_docs", pa.int64())]))

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(pieces, "seq_id", concat)


def padding_efficiency(
    ds: ray.data.Dataset,
    text_col: str = "text",
    bucket: int = 64,
    max_len: int = 512,
) -> ray.data.Dataset:
    """Length-bucketed padding-waste plan — what dynamic batching by
    length buckets costs vs. concat-packing (:func:`pack_sequences`).

    Each doc's whitespace-token length n (clipped to ``max_len``) lands in
    bucket ``ceil(n / bucket) * bucket``; padding it to the bucket edge
    wastes ``bucket_len - n`` positions.  Output per bucket: ``n_docs``,
    ``sum_tokens``, ``sum_padding`` — the numbers a batching policy trades
    off (bigger buckets = fewer batch shapes, more pad waste).

    One vectorized zero-shuffle pass with per-batch per-bucket partials,
    then a bucket-count-sized groupby sum.  All-integer output.
    """
    import polars as pl

    from ray.data.aggregate import Sum

    def plan(batch: pa.Table) -> pa.Table:
        s = pl.from_arrow(batch.column(text_col).cast(pa.large_string()))
        n = s.str.count_matches(r"\S+").fill_null(0).to_numpy().astype(
            np.int64)
        n = np.minimum(n, max_len)
        n = n[n > 0]
        blen = -(-n // bucket) * bucket
        t = pa.table({"bucket_len": pa.array(blen, pa.int64()),
                      "n": pa.array(n, pa.int64()),
                      "pad": pa.array(blen - n, pa.int64())})
        df = pl.from_arrow(t).group_by("bucket_len").agg(
            pl.len().alias("n_docs"),
            pl.col("n").sum().alias("sum_tokens"),
            pl.col("pad").sum().alias("sum_padding"))
        out = df.to_arrow()
        return pa.table({c: out.column(c).cast(pa.int64())
                         for c in ("bucket_len", "n_docs", "sum_tokens",
                                   "sum_padding")})

    return (ds.select_columns([text_col])
            .map_batches(plan, batch_format="pyarrow")
            .groupby("bucket_len").aggregate(
                Sum("n_docs", alias_name="n_docs"),
                Sum("sum_tokens", alias_name="sum_tokens"),
                Sum("sum_padding", alias_name="sum_padding")))
