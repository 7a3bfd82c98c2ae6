"""Corpus-level TF-IDF — document frequency, term scoring, top term per doc.

A training-data pipeline needs corpus statistics that join *back* onto the
per-document stream (the reference's analytics never leave one table —
SURVEY.md §2.6).  Shape, scale-first:

  tokenize (map_batches, vectorized)                 — no shuffle
  → tf  = groupby(doc_id, token).count()             — shuffle 1 (composite)
  → df  = tf.groupby(token).count()                  — shuffle 2, input is
           already one row per (doc, token): |pairs| ≪ |tokens|
  → tf ⋈ df on token                                 — broadcast when the
           vocabulary is provably small, hash-shuffle join otherwise (same
           size-threshold policy as ``dedup.filter_by_ids``)
  → top term per doc                                 — ``rankagg.grouped_top_k``
           on (tf desc, df asc, token asc): integer-ordered, so the ranking
           is reduction-order-proof; the float score is a decoration.

Tokenization is lowercase ``[a-z0-9]+`` runs — mirrored exactly by the SQL
oracle's ``regexp_extract_all(lower(text), '[a-z0-9]+')``.
"""

from __future__ import annotations

import math
from typing import Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count

from .rankagg import grouped_top_k

BROADCAST_VOCAB_MAX = 2_000_000


def tokenize(ds: ray.data.Dataset, text_col: str, id_col: str) -> ray.data.Dataset:
    """Explode documents into (id, token) rows: lowercase [a-z0-9]+ runs.

    Vectorized: one polars lowercase + extract_all + explode per batch (no
    per-row Python string handling), numpy repeat for the id column.
    """

    def explode(batch: pa.Table) -> pa.Table:
        import polars as pl

        texts = pl.from_arrow(batch.column(text_col).cast(pa.large_string()))
        toks = texts.str.to_lowercase().str.extract_all(r"[a-z0-9]+")
        counts = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = toks.explode().drop_nulls()  # empty docs explode to one null
        out_ids = batch.column(id_col).take(
            pa.array(np.repeat(np.arange(len(counts)), counts)))
        tok_arr = flat.to_arrow().cast(pa.string())
        return pa.table({id_col: out_ids, "token": tok_arr})

    return ds.select_columns([id_col, text_col]).map_batches(
        explode, batch_format="pyarrow")


def term_freq(tokens: ray.data.Dataset, id_col: str) -> ray.data.Dataset:
    """(id, token, tf) — one shuffle on the composite key; map-side combining
    is Ray Data's groupby partial aggregation."""
    return tokens.groupby([id_col, "token"]).aggregate(Count(alias_name="tf"))


def doc_freq(tf: ray.data.Dataset) -> ray.data.Dataset:
    """(token, df) from the tf table — the input is already one row per
    (doc, token), so Count == COUNT(DISTINCT doc)."""
    return tf.groupby("token").aggregate(Count(alias_name="df"))


def tfidf_table(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    n_docs: Optional[int] = None,
    vocab_broadcast_max: int = BROADCAST_VOCAB_MAX,
    persist_tf: bool = True,
) -> ray.data.Dataset:
    """(id, token, tf, df, tfidf) with tfidf = tf · ln(n_docs / df).

    ``n_docs`` defaults to ``ds.count()`` (metadata-cheap on parquet reads).
    The df side broadcasts when the vocabulary is under
    ``vocab_broadcast_max`` rows; above that it hash-shuffle joins — the df
    table is vocabulary-sized, not corpus-sized, so the broadcast bound is a
    real memory bound, not a guess about the data.

    ``tf`` feeds BOTH df and the join (a diamond): by default it is pinned
    once in the object store (spillable) so the tokenize+groupby lineage
    doesn't re-execute per consumer.  When object-store capacity is tighter
    than compute (pair table ≈ tokens × 3 columns), pass
    ``persist_tf=False`` to trade one recompute of the tf lineage for zero
    resident state.
    """
    if n_docs is None:
        n_docs = ds.count()
    tf = term_freq(tokenize(ds, text_col, id_col), id_col)
    if persist_tf:
        tf = tf.materialize()
    df = doc_freq(tf).materialize()  # vocabulary-sized

    # vocabulary size decides the join strategy (same policy as
    # dedup.filter_by_ids: broadcast only under a provable bound)
    n_vocab = df.count()
    if n_vocab <= vocab_broadcast_max:
        lookup = {r["token"]: r["df"] for r in df.take_all()}
        ref = ray.put(lookup)

        def add_df(batch: pa.Table) -> pa.Table:
            lk = ray.get(ref)
            dfs = np.fromiter((lk[t] for t in batch.column("token").to_pylist()),
                              dtype=np.int64, count=batch.num_rows)
            return batch.append_column("df", pa.array(dfs, pa.int64()))

        joined = tf.map_batches(add_df, batch_format="pyarrow")
    else:
        joined = tf.join(df, join_type="inner", num_partitions=64, on=("token",))

    def score(batch: pa.Table) -> pa.Table:
        tfv = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dfv = batch.column("df").to_numpy(zero_copy_only=False).astype(np.float64)
        s = tfv * np.log(float(n_docs) / dfv)
        return batch.append_column("tfidf", pa.array(s, pa.float64()))

    return joined.map_batches(score, batch_format="pyarrow")


def top_term_per_doc(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    n_docs: Optional[int] = None,
) -> ray.data.Dataset:
    """One row per doc: its most characteristic term — ordered by (tf desc,
    df asc, token asc), a total integer order (float-tie-proof); the tfidf
    score column is informational."""
    scored = tfidf_table(ds, text_col, id_col, n_docs=n_docs)
    return grouped_top_k(
        scored, id_col,
        order_by=["tf", "df", "token"], descending=[True, False, False], k=1,
    )


def ngram_overlap_tag(
    ds: ray.data.Dataset,
    eval_ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    n: int = 8,
    out_col: str = "n_overlap",
) -> ray.data.Dataset:
    """Decontamination: per doc, how many of its word ``n``-grams appear in
    the evaluation set.

    The eval side is benchmark-sized by contract, so its n-gram set is built
    once and broadcast (``ray.put``) — the corpus side streams with zero
    shuffle.  N-grams are windows over the lowercase ``\\S+`` token stream,
    represented as rolling-polynomial uint64 hashes on BOTH sides
    (``hashing.shingle_hashes_many`` — shingle strings never materialize, no
    per-gram Python in the hot path); counts therefore equal the
    string-n-gram counts up to 64-bit collisions (~|grams|²/2⁶⁵), and the SQL
    oracle re-derives them from the actual strings.  Filter on
    ``out_col == 0`` to drop contaminated docs, or keep the count for graded
    policies.
    """
    from ..functions.hashing import shingle_hashes_many

    def _doc_grams(texts):
        """(hashes, per-doc counts) with short docs (< n words) contributing
        ZERO grams — shingle_hashes_many gives short docs one partial
        shingle, which window semantics excludes."""
        import polars as pl

        hashes, lens = shingle_hashes_many(texts, ngram=n)
        wc = (pl.Series([t or "" for t in texts], dtype=pl.String)
              .str.count_matches(r"\S+").to_numpy().astype(np.int64))
        keep = np.repeat(wc >= n, lens)
        lens = np.where(wc >= n, lens, 0)
        return hashes[keep], lens

    eval_tbls = [ray.get(r) for r in
                 eval_ds.select_columns([text_col]).to_arrow_refs()]
    eval_texts = [t for tbl in eval_tbls if tbl.num_rows
                  for t in tbl.column(text_col).to_pylist()]
    eval_hashes, _ = _doc_grams(eval_texts)
    ref = ray.put(np.unique(eval_hashes))

    def tag(batch: pa.Table) -> pa.Table:
        grams = ray.get(ref)
        hashes, lens = _doc_grams(batch.column(text_col).to_pylist())
        hit = np.isin(hashes, grams).astype(np.int64)
        cs = np.concatenate(([0], np.cumsum(hit)))
        ends = np.cumsum(lens)
        starts = ends - lens
        counts = cs[ends] - cs[starts]
        return batch.append_column(out_col, pa.array(counts, pa.int64()))

    return ds.map_batches(tag, batch_format="pyarrow")
