"""Corpus-level TF-IDF — document frequency, term scoring, top term per doc.

A training-data pipeline needs corpus statistics that join *back* onto the
per-document stream (the reference's analytics never leave one table —
SURVEY.md §2.6).  Shape, scale-first:

  tokenize + tf (ONE fused map_batches)              — no shuffle: a doc is
           one row, so per-batch (doc, token) counts are the global term
           frequencies (``doc_term_freq``)
  → df  = tf.groupby(token).count()                  — shuffle 1, input is
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
from typing import Optional, Sequence

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
    """(id, token, tf) from an already-exploded token Dataset — one shuffle
    on the composite key.  Prefer :func:`doc_term_freq` when you still hold
    the document Dataset: it gets the same table with ZERO shuffle."""
    return tokens.groupby([id_col, "token"]).aggregate(Count(alias_name="tf"))


def doc_term_freq(ds: ray.data.Dataset, text_col: str,
                  id_col: str) -> ray.data.Dataset:
    """(id, token, tf) with ZERO shuffle.

    A document is exactly one row and a row never splits across batches, so
    per-batch (id, token) counts ARE the global term frequencies — the
    composite-key shuffle of :func:`term_freq` buys nothing.  Tokenize and
    count are fused into one UDF so no block-splitting can separate a
    document from its tokens.  Measured 1M docs: the tf stage drops from a
    ~90M-token-row exchange to nothing.
    """

    def fn(batch: pa.Table) -> pa.Table:
        import polars as pl

        texts = pl.from_arrow(batch.column(text_col).cast(pa.large_string()))
        toks = texts.str.to_lowercase().str.extract_all(r"[a-z0-9]+")
        counts = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = toks.explode().drop_nulls().to_arrow().cast(pa.string())
        ids = batch.column(id_col).take(
            pa.array(np.repeat(np.arange(len(counts)), counts)))
        t = pa.table({id_col: ids, "token": flat})
        g = t.group_by([id_col, "token"]).aggregate([([], "count_all")])
        return pa.table({id_col: g.column(id_col),
                         "token": g.column("token"),
                         "tf": g.column("count_all").cast(pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow")


def _explode_tokens(col) -> tuple:
    """(per-doc token counts int64, flat token pa.Array) — the shared
    vectorized tokenizer (lowercase [a-z0-9]+, one polars pass)."""
    import polars as pl

    texts = pl.from_arrow(col.cast(pa.large_string()))
    toks = texts.str.to_lowercase().str.extract_all(r"[a-z0-9]+")
    lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
    flat = toks.explode().drop_nulls().to_arrow().cast(pa.string())
    return lens, flat


def _token_count_partial(text_col: str):
    """Batch fn: per-batch DISTINCT-token counts (token, _n) — ships the
    batch vocabulary, not the token stream, into the counts shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        _, flat = _explode_tokens(batch.column(text_col))
        g = pa.table({"token": flat}).group_by("token").aggregate(
            [([], "count_all")])
        return pa.table({"token": g.column("token"),
                         "_n": g.column("count_all").cast(pa.int64())})

    return fn


def _dict_lookup_int64(flat: pa.Array, lookup: dict) -> np.ndarray:
    """Vectorized per-occurrence int64 lookup: dictionary-encode the token
    array, resolve the (few) UNIQUE values through the Python dict, scatter
    by index — O(unique) Python instead of O(occurrences)."""
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    enc = flat.dictionary_encode()
    uniq = enc.dictionary.to_pylist()
    vals = np.fromiter((lookup[u] for u in uniq), dtype=np.int64,
                       count=len(uniq))
    idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
    return vals[idx] if len(idx) else np.empty(0, np.int64)


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
    tf = doc_term_freq(ds, text_col, id_col)
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
        from .dedup import _join_partitions

        from ..dsutil import drop_empty_blocks

        joined = tf.join(drop_empty_blocks(df), join_type="inner",
                         num_partitions=_join_partitions(), on=("token",))

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


def vocab_counts(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    k: Optional[int] = 100,
) -> ray.data.Dataset:
    """Global top-``k`` vocabulary: (token, n) by corpus frequency, token-asc
    tiebreak.  Map-side per-batch counting collapses each block to its
    distinct tokens BEFORE the shuffle (the exchange is vocabulary-sized per
    block, not token-stream-sized); the global combine is one keyed groupby
    sum; the top-k is a sort-limit over the vocabulary table."""

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.append_column(
            "_n", pa.array(np.ones(batch.num_rows, dtype=np.int64)))
        return batch.group_by("token").aggregate([("_n", "sum")]) \
                    .rename_columns(["token", "_n"])

    from ray.data.aggregate import Sum

    counts = (
        tokenize(ds, text_col, id_col)
        .select_columns(["token"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("token")
        .aggregate(Sum("_n", alias_name="n"))
    )
    if k is None:
        return counts
    return counts.sort(["n", "token"], descending=[True, False]).limit(k)


def bm25_search(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    query_terms: Sequence[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """BM25 top-``k`` documents for a bag-of-words query.

    score(d) = Σ_t idf(t) · tf(t,d)·(k1+1) / (tf(t,d) + k1·(1-b+b·|d|/avgdl))
    with idf(t) = ln((N - df + 0.5)/(df + 0.5) + 1)  (the Robertson/Sparck
    Jones form Lucene uses).

    Scale shape: the token stream is filtered to the query vocabulary
    MAP-SIDE, so the only shuffle (tf groupby on (doc, token)) carries just
    query-term occurrences — |query| ≪ vocabulary makes this near-free at
    any corpus size.  Document length and corpus stats come from a separate
    zero-shuffle counting pass (dl is exact per row because each document is
    one row).  df/N/avgdl are query-vocabulary-sized and broadcast.  Returns
    the k-row (id, score) table ordered by (score desc, id asc), score
    rounded to 6 dp so rankings are reduction-order-stable.
    """
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Max as _Max
    from ray.data.aggregate import Sum as _Sum

    query_terms = sorted({t.lower() for t in query_terms})
    qset = pa.array(query_terms, pa.string())

    # corpus stats: N docs and mean token count — one streaming pass
    def doc_len(batch: pa.Table) -> pa.Table:
        import polars as pl

        texts = pl.from_arrow(batch.column(text_col).cast(pa.large_string()))
        dl = texts.str.to_lowercase().str.count_matches(r"[a-z0-9]+") \
                  .fill_null(0).to_numpy().astype(np.int64)
        return pa.table({"dl": pa.array(dl, pa.int64())})

    stats = (ds.select_columns([text_col])
             .map_batches(doc_len, batch_format="pyarrow")
             .aggregate(_Sum("dl", alias_name="sum_dl"),
                        _Count(alias_name="n_docs")))
    n_docs = int(stats["n_docs"])
    avgdl = float(stats["sum_dl"]) / float(n_docs)

    # (doc, token, dl) for query terms only — filtered before the shuffle
    def explode_query(batch: pa.Table) -> pa.Table:
        import polars as pl

        texts = pl.from_arrow(batch.column(text_col).cast(pa.large_string()))
        toks = texts.str.to_lowercase().str.extract_all(r"[a-z0-9]+")
        lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = toks.explode().drop_nulls().to_arrow().cast(pa.string())
        rep = pa.array(np.repeat(np.arange(len(lens)), lens))
        t = pa.table({
            id_col: batch.column(id_col).take(rep),
            "token": flat,
            "dl": pa.array(np.repeat(lens, lens), pa.int64()),
        })
        return t.filter(pc.is_in(t.column("token"), value_set=qset))

    tf = (ds.select_columns([id_col, text_col])
          .map_batches(explode_query, batch_format="pyarrow")
          .groupby([id_col, "token"])
          .aggregate(_Count(alias_name="tf"), _Max("dl", alias_name="dl")))
    tf = tf.materialize()  # query-vocabulary-bounded; feeds df and scoring

    df = {r["token"]: r["df"] for r in
          tf.groupby("token").aggregate(_Count(alias_name="df")).take_all()}

    def score(batch: pa.Table) -> pa.Table:
        tfs = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dls = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        dfs = np.fromiter((df[t] for t in batch.column("token").to_pylist()),
                          dtype=np.float64, count=batch.num_rows)
        idf = np.log((n_docs - dfs + 0.5) / (dfs + 0.5) + 1.0)
        s = idf * tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        return pa.table({id_col: batch.column(id_col),
                         "score": pa.array(s, pa.float64())})

    def round6(batch: pa.Table) -> pa.Table:
        # DuckDB-ROUND-exact half-away rounding, so the (score, id) order is
        # reduction-order-stable across engines
        v = batch.column("score").to_numpy(zero_copy_only=False)
        r = np.where(v >= 0, np.floor(v * 1e6 + 0.5) / 1e6,
                     -np.floor(-v * 1e6 + 0.5) / 1e6)
        return pa.table({id_col: batch.column(id_col),
                         "score": pa.array(r, pa.float64())})

    per_doc = (tf.map_batches(score, batch_format="pyarrow")
               .groupby(id_col).aggregate(_Sum("score", alias_name="score"))
               .map_batches(round6, batch_format="pyarrow"))
    # distributed top-k: never collects the per-doc score table
    rows = per_doc.sort(["score", id_col],
                        descending=[True, False]).limit(k).take_all()
    return pa.table({
        id_col: pa.array([r[id_col] for r in rows], pa.int64()),
        "score": pa.array([r["score"] for r in rows], pa.float64()),
    })


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


def unigram_logprob(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    vocab_broadcast_max: int = BROADCAST_VOCAB_MAX,
) -> ray.data.Dataset:
    """Corpus-LM quality score: per doc, the sum of unigram log-probabilities
    of its tokens under the corpus's own unigram distribution (the cheap end
    of the perplexity-filter family — CCNet/Gopher score docs with a language
    model; the unigram corpus model needs no external artifact).

    Output: ``(id, n_tokens, logprob_micro)`` where ``logprob_micro`` is the
    int64 sum of per-token ``round_half_away(ln(count(tok)/total) * 1e6)`` —
    log-probs are quantized to integer micro-nats BEFORE the reduction, so
    the result is reduction-order-proof and engine/SQL hash-exact (a float
    mean would differ in the last ulp between reduction orders).  Docs with
    zero tokens are excluded (mirrors SQL ``GROUP BY`` over the token
    explode).  Mean log-prob = logprob_micro / 1e6 / n_tokens.

    Scale shape: counting pre-reduces to per-batch DISTINCT-token counts
    before its only (vocabulary-sized) shuffle; scoring is ONE fused
    zero-shuffle pass over the document stream — per batch: token explode,
    dictionary-encode, one dict lookup per UNIQUE token, vectorized scatter
    + segmented int64 sums.  Nothing doc- or pair-shaped ever shuffles
    (measured 1M docs: 198 s with a tf exchange + doc-keyed combine → 13 s).
    Above ``vocab_broadcast_max`` the ratio map cannot broadcast: the
    fallback pays the honest tf ⋈ counts hash join + doc-keyed combine.
    """
    from ray.data.aggregate import Sum as _Sum

    cnt = (ds.select_columns([text_col])
           .map_batches(_token_count_partial(text_col),
                        batch_format="pyarrow")
           .groupby("token").aggregate(_Sum("_n", alias_name="c"))
           ).materialize()
    total = int(cnt.sum("c"))
    n_vocab = cnt.count()

    def micro_of(c: np.ndarray) -> np.ndarray:
        # ln(c/total) <= 0: half-AWAY rounding (DuckDB round semantics)
        x = np.log(c.astype(np.float64) / float(total)) * 1e6
        return (-np.floor(-x + 0.5)).astype(np.int64)

    if n_vocab > vocab_broadcast_max:
        # honest fallback: pair-table join + doc-keyed combine
        from .dedup import _join_partitions

        from ..dsutil import drop_empty_blocks

        tf = doc_term_freq(ds, text_col, id_col)
        joined = tf.join(drop_empty_blocks(cnt), join_type="inner",
                         num_partitions=_join_partitions(), on=("token",))

        def score_joined(batch: pa.Table) -> pa.Table:
            c = batch.column("c").to_numpy(zero_copy_only=False)
            tfv = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.int64)
            return pa.table({id_col: batch.column(id_col),
                             "n_tokens": pa.array(tfv, pa.int64()),
                             "_lp": pa.array(micro_of(c) * tfv, pa.int64())})

        return (joined.map_batches(score_joined, batch_format="pyarrow")
                .groupby(id_col).aggregate(
                    _Sum("n_tokens", alias_name="n_tokens"),
                    _Sum("_lp", alias_name="logprob_micro")))

    toks, cs = [], []
    for t in (ray.get(r) for r in cnt.to_arrow_refs()):
        if t.num_rows:
            toks.extend(t.column("token").to_pylist())
            cs.append(t.column("c").to_numpy(zero_copy_only=False))
    micro = micro_of(np.concatenate(cs) if cs else np.empty(0, np.int64))
    ref = ray.put(dict(zip(toks, micro.tolist())))

    def score(batch: pa.Table, micro_ref) -> pa.Table:
        lk = ray.get(micro_ref)
        lens, flat = _explode_tokens(batch.column(text_col))
        m = _dict_lookup_int64(flat, lk)
        csum = np.concatenate(([0], np.cumsum(m)))
        ends = np.cumsum(lens)
        out = pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(lens, pa.int64()),
            "logprob_micro": pa.array(csum[ends] - csum[ends - lens],
                                      pa.int64()),
        })
        return out.filter(pa.array(lens > 0))

    return ds.select_columns([id_col, text_col]).map_batches(
        score, fn_args=(ref,), batch_format="pyarrow")


def dsir_logweight(
    ds: ray.data.Dataset,
    target: ray.data.Dataset,
    text_col: str,
    id_col: str,
    vocab_broadcast_max: int = BROADCAST_VOCAB_MAX,
) -> ray.data.Dataset:
    """DSIR-style importance weights (Xie et al., 2023): per corpus doc, the
    log importance ratio of a TARGET distribution over the corpus's own,
    under add-1-smoothed unigram models —

        log w(d) = Σ_tok  ln p_target(tok) − ln p_corpus(tok)

    with p(tok) = (count + 1) / (total + |V|), V the union vocabulary.
    Rank by the weight (or Gumbel-perturb it) to resample a raw crawl toward
    a high-quality target set.  (The paper hashes n-grams into buckets; the
    unigram form keeps the operator SQL-oracle-exact — the hashed variant
    changes only the feature map, not the pipeline shape.)

    Output ``(id, n_tokens, dsir_micro)``: int64 micro-nats quantized per
    DISTINCT token before the reduction — reduction-order-proof, hash-exact
    vs the oracle (same contract as :func:`unigram_logprob`).

    Scale shape: both model fits pre-reduce to per-batch DISTINCT-token
    counts before their vocabulary-sized combines; scoring is ONE fused
    zero-shuffle pass over the document stream (dictionary-encoded lookups,
    segmented int64 sums — same shape as :func:`unigram_logprob`).  The
    ratio map broadcasts under ``vocab_broadcast_max``; above it use
    :func:`dsir_logweight_hashed`.  Docs with zero tokens are excluded.
    """
    from ray.data.aggregate import Sum as _Sum

    def counts_of(d: ray.data.Dataset) -> dict:
        cnt = (d.select_columns([text_col])
               .map_batches(_token_count_partial(text_col),
                            batch_format="pyarrow")
               .groupby("token").aggregate(_Sum("_n", alias_name="c")))
        out: dict = {}
        for t in (ray.get(r) for r in cnt.materialize().to_arrow_refs()):
            if t.num_rows:
                out.update(zip(t.column("token").to_pylist(),
                               t.column("c").to_pylist()))
        return out

    src_counts = counts_of(ds)
    tgt_counts = counts_of(target)
    vocab = sorted(set(src_counts) | set(tgt_counts))
    v = len(vocab)
    s_tot = float(sum(src_counts.values()) + v)
    t_tot = float(sum(tgt_counts.values()) + v)
    cs = np.array([src_counts.get(tok, 0) + 1 for tok in vocab], np.float64)
    ct = np.array([tgt_counts.get(tok, 0) + 1 for tok in vocab], np.float64)
    x = (np.log(ct / t_tot) - np.log(cs / s_tot)) * 1e6
    micro = np.where(x >= 0, np.floor(x + 0.5), -np.floor(-x + 0.5)
                     ).astype(np.int64)
    if v > vocab_broadcast_max:
        raise ValueError(
            "union vocabulary exceeds the broadcast bound — use "
            "dsir_logweight_hashed (fixed-size hashed feature map, the "
            "paper's own formulation) for corpora whose raw vocabulary "
            "cannot broadcast")
    ref = ray.put(dict(zip(vocab, micro.tolist())))

    def score(batch: pa.Table, micro_ref) -> pa.Table:
        lk = ray.get(micro_ref)
        lens, flat = _explode_tokens(batch.column(text_col))
        m = _dict_lookup_int64(flat, lk)
        csum = np.concatenate(([0], np.cumsum(m)))
        ends = np.cumsum(lens)
        out = pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(lens, pa.int64()),
            "dsir_micro": pa.array(csum[ends] - csum[ends - lens], pa.int64()),
        })
        return out.filter(pa.array(lens > 0))

    return ds.select_columns([id_col, text_col]).map_batches(
        score, fn_args=(ref,), batch_format="pyarrow")


def dsir_logweight_hashed(
    ds: ray.data.Dataset,
    target: ray.data.Dataset,
    text_col: str,
    id_col: str,
    n_buckets: int = 8192,
) -> ray.data.Dataset:
    """DSIR with the paper's hashed feature map — the unbounded-vocabulary
    scale path of :func:`dsir_logweight`.

    Tokens hash into ``n_buckets`` fixed features (durable 64-bit string
    hash mod buckets), so BOTH model-fitting passes reduce to one
    ``n_buckets``-long int64 count vector per batch, exact-int-summed on the
    driver: constant-size state however large the corpus or its vocabulary
    (the |V| driver dict of the unigram form never exists).  Scoring is one
    zero-shuffle corpus pass: per batch, token→bucket→micro-nat lookup into
    the broadcast ratio vector, segmented int64 sums per doc.  Same add-1
    smoothing and micro-nat quantization contract as the unigram form (with
    V = n_buckets), so results are bit-deterministic across layouts.
    """
    from ..functions.hashing import durable_hash64_column

    nb = np.uint64(n_buckets)

    def _explode(batch: pa.Table):
        import polars as pl

        texts = pl.from_arrow(batch.column(text_col).cast(pa.large_string()))
        toks = texts.str.to_lowercase().str.extract_all(r"[a-z0-9]+")
        lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = toks.explode().drop_nulls().to_arrow().cast(pa.string())
        b = (durable_hash64_column(flat) % nb).astype(np.int64)
        return lens, b

    def bucket_partial(batch: pa.Table) -> pa.Table:
        _, b = _explode(batch)
        counts = np.bincount(b, minlength=n_buckets).astype(np.int64)
        return pa.table({"counts": pa.array([counts.tobytes()], pa.binary())})

    def _fit(d: ray.data.Dataset) -> np.ndarray:
        total = np.zeros(n_buckets, dtype=np.int64)
        parts = d.select_columns([text_col]).map_batches(
            bucket_partial, batch_format="pyarrow").take_all()
        for r in parts:  # exact ints: any order reduces identically
            total += np.frombuffer(r["counts"], dtype=np.int64)
        return total

    cs = _fit(ds).astype(np.float64) + 1.0
    ct = _fit(target).astype(np.float64) + 1.0
    x = (np.log(ct / ct.sum()) - np.log(cs / cs.sum())) * 1e6
    micro = np.where(x >= 0, np.floor(x + 0.5),
                     -np.floor(-x + 0.5)).astype(np.int64)
    ref = ray.put(micro)

    def score(batch: pa.Table, micro_ref) -> pa.Table:
        mvec = ray.get(micro_ref)
        lens, b = _explode(batch)
        w = mvec[b]
        cs_ = np.concatenate(([0], np.cumsum(w)))
        ends = np.cumsum(lens)
        starts = ends - lens
        out = pa.table({
            id_col: batch.column(id_col),
            "n_tokens": pa.array(lens, pa.int64()),
            "dsir_micro": pa.array(cs_[ends] - cs_[starts], pa.int64()),
        })
        return out.filter(pa.array(lens > 0))

    return ds.select_columns([id_col, text_col]).map_batches(
        score, fn_args=(ref,), batch_format="pyarrow")


def ngram_counts(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    n: int = 2,
    k: Optional[int] = 100,
    min_count: int = 0,
) -> ray.data.Dataset:
    """Global top-``k`` word n-grams (token windows WITHIN a document, space-
    joined) by corpus frequency — the language-model / contamination-check
    counterpart of :func:`vocab_counts`.

    Same scale shape as vocab_counts: n-grams are built and pre-counted
    map-side (each block ships its distinct n-grams, not its token stream),
    one keyed combine, sort-limit over the n-gram table.  The window join is
    fully vectorized: per-batch token explode (polars extract_all), then n
    shifted Arrow slices joined with ``binary_join_element_wise`` under a
    same-document numpy mask — no Python over tokens.
    """
    from ray.data.aggregate import Sum

    def explode_ngrams(batch: pa.Table) -> pa.Table:
        import polars as pl

        texts = pl.from_arrow(batch.column(text_col).cast(pa.large_string()))
        toks = texts.str.to_lowercase().str.extract_all(r"[a-z0-9]+")
        counts = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = toks.explode().drop_nulls().to_arrow().cast(pa.string())
        doc_of = np.repeat(np.arange(len(counts)), counts)
        m = len(flat) - (n - 1)
        if m <= 0:
            return pa.table({"ngram": pa.array([], pa.string()),
                             "_n": pa.array([], pa.int64())})
        # windows whose n tokens all come from the same document
        same = doc_of[: m] == doc_of[n - 1:]
        parts = [flat.slice(j, m) for j in range(n)]
        grams = pc.binary_join_element_wise(*parts, " ")
        grams = grams.filter(pa.array(same))
        t = pa.table({"ngram": grams})
        g = t.group_by("ngram").aggregate([([], "count_all")])
        return g.rename_columns(["ngram", "_n"]).set_column(
            1, "_n", g.column("count_all").cast(pa.int64()))

    counts = (ds.select_columns([id_col, text_col])
              .map_batches(explode_ngrams, batch_format="pyarrow")
              .groupby("ngram")
              .aggregate(Sum("_n", alias_name="n")))
    if min_count > 1:
        counts = counts.filter(expr=f"n >= {int(min_count)}")
    if k is None:
        return counts
    return counts.sort(["n", "ngram"], descending=[True, False]).limit(k)


def _explode_bigrams(col) -> tuple:
    """(per-doc bigram counts int64, flat 'w1 w2' pa.Array) — vectorized
    within-document token-window join (same kernel as ngram_counts n=2)."""
    lens, flat = _explode_tokens(col)
    n_bi = np.maximum(lens - 1, 0)
    m = len(flat) - 1
    if m <= 0:
        return n_bi, pa.array([], pa.string())
    doc_of = np.repeat(np.arange(len(lens)), lens)
    same = doc_of[:m] == doc_of[1:]
    grams = pc.binary_join_element_wise(flat.slice(0, m), flat.slice(1, m), " ")
    return n_bi, grams.filter(pa.array(same))


def bigram_logprob(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    vocab_broadcast_max: int = BROADCAST_VOCAB_MAX,
) -> ray.data.Dataset:
    """Corpus-bigram LM quality score per doc — one rung up the
    perplexity-filter ladder from :func:`unigram_logprob`.

    Per doc: ``Σ_i ln((c(w_{i-1} w_i) + 1) / (ctx(w_{i-1}) + V))`` with
    add-one (Laplace) smoothing, where ``c`` is the corpus bigram count,
    ``ctx(w)`` the number of corpus bigrams starting with ``w`` and ``V``
    the distinct-unigram vocabulary size.  Each distinct bigram's log term
    is quantized to integer micro-nats BEFORE the reduction (same
    reduction-order-proof trick as unigram_logprob), so the per-doc sum is
    engine/SQL hash-exact.  Docs with < 2 tokens are excluded (mirrors SQL
    GROUP BY over the bigram explode).

    Output: ``(id, n_bigrams, bigram_lp_micro)``.

    Scale shape: bigram counting pre-reduces to per-batch DISTINCT-bigram
    counts before its only (bigram-vocabulary-sized) shuffle; context
    counts derive from the bounded bigram table (one vocab-sized combine);
    scoring is one fused zero-shuffle pass (explode, dictionary-encode, one
    dict probe per UNIQUE bigram, segmented int64 sums).  Above
    ``vocab_broadcast_max`` distinct bigrams the micro map cannot
    broadcast; the fallback pays the honest per-doc-bigram-tf ⋈ counts
    join + doc-keyed combine.
    """
    from ray.data.aggregate import Sum as _Sum

    def bigram_count_partial(batch: pa.Table) -> pa.Table:
        _, grams = _explode_bigrams(batch.column(text_col))
        g = pa.table({"bigram": grams}).group_by("bigram").aggregate(
            [([], "count_all")])
        return pa.table({"bigram": g.column("bigram"),
                         "_n": g.column("count_all").cast(pa.int64())})

    cb = (ds.select_columns([text_col])
          .map_batches(bigram_count_partial, batch_format="pyarrow")
          .groupby("bigram").aggregate(_Sum("_n", alias_name="c"))
          ).materialize()

    # V: distinct unigram vocabulary (bounded count, no token stream shuffle)
    v_vocab = (ds.select_columns([text_col])
               .map_batches(_token_count_partial(text_col),
                            batch_format="pyarrow")
               .groupby("token").aggregate(_Sum("_n", alias_name="c"))
               ).count()

    def first_tok(col: pa.ChunkedArray) -> pa.ChunkedArray:
        return pc.list_element(pc.split_pattern(col, " "), 0)

    n_bigram_vocab = cb.count()
    if n_bigram_vocab > vocab_broadcast_max:
        # honest fallback: context table + two hash joins + doc-keyed combine
        from .dedup import _join_partitions

        def add_first(batch: pa.Table) -> pa.Table:
            return batch.append_column("_ctx_tok", first_tok(
                pa.chunked_array([batch.column("bigram")])))

        cbf = cb.map_batches(add_first, batch_format="pyarrow")
        ctx = cbf.groupby("_ctx_tok").aggregate(_Sum("c", alias_name="cc"))

        def doc_bigram_tf(batch: pa.Table) -> pa.Table:
            n_bi, grams = _explode_bigrams(batch.column(text_col))
            ids = batch.column(id_col).take(
                pa.array(np.repeat(np.arange(len(n_bi)), n_bi)))
            t = pa.table({id_col: ids, "bigram": grams})
            g = t.group_by([id_col, "bigram"]).aggregate([([], "count_all")])
            return pa.table({id_col: g.column(id_col),
                             "bigram": g.column("bigram"),
                             "tf": g.column("count_all").cast(pa.int64())})

        tf = ds.select_columns([id_col, text_col]).map_batches(
            doc_bigram_tf, batch_format="pyarrow")
        # groupby-derived join sides and the first join's output can carry
        # empty zero-column blocks; the NEXT hash join's per-partition
        # pyarrow join rejects them (intermittent, layout-dependent) —
        # rebuild from non-empty blocks around each join (same class as
        # fuzzy.entity_components' chained block joins)
        from ..dsutil import drop_empty_blocks

        id_type = ds.schema().base_schema.field(id_col).type
        cbf = drop_empty_blocks(cbf, empty_schema=pa.schema(
            [("bigram", pa.string()), ("c", pa.int64()),
             ("_ctx_tok", pa.string())]))
        ctx = drop_empty_blocks(ctx, empty_schema=pa.schema(
            [("_ctx_tok", pa.string()), ("cc", pa.int64())]))
        j = tf.join(cbf, join_type="inner", on=("bigram",),
                    num_partitions=_join_partitions())
        j = drop_empty_blocks(j, empty_schema=pa.schema(
            [(id_col, id_type), ("bigram", pa.string()),
             ("tf", pa.int64()), ("c", pa.int64()),
             ("_ctx_tok", pa.string())]))
        j = j.join(ctx, join_type="inner", on=("_ctx_tok",),
                   num_partitions=_join_partitions())

        def score_joined(batch: pa.Table) -> pa.Table:
            c = batch.column("c").to_numpy(zero_copy_only=False)
            cc = batch.column("cc").to_numpy(zero_copy_only=False)
            tfv = batch.column("tf").to_numpy(zero_copy_only=False)
            x = np.log((c + 1.0) / (cc + float(v_vocab))) * 1e6
            mu = (-np.floor(-x + 0.5)).astype(np.int64)
            return pa.table({id_col: batch.column(id_col),
                             "n_bigrams": pa.array(tfv.astype(np.int64)),
                             "_lp": pa.array(mu * tfv, pa.int64())})

        return (j.map_batches(score_joined, batch_format="pyarrow")
                .groupby(id_col).aggregate(
                    _Sum("n_bigrams", alias_name="n_bigrams"),
                    _Sum("_lp", alias_name="bigram_lp_micro")))

    # broadcast path: bigram -> micro-nat map, built from the bounded table
    grams_all, cs = [], []
    for t in (ray.get(r) for r in cb.to_arrow_refs()):
        if t.num_rows:
            grams_all.append(t.column("bigram").combine_chunks())
            cs.append(t.column("c").to_numpy(zero_copy_only=False))
    if grams_all:
        flat_grams = pa.concat_arrays(
            [g if isinstance(g, pa.Array) else g.combine_chunks()
             for g in grams_all])
        c_arr = np.concatenate(cs).astype(np.float64)
        firsts = pc.list_element(
            pc.split_pattern(flat_grams, " "), 0)
        # context counts: segment-sum c by first token (vectorized)
        enc = firsts.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        cc_per_first = np.zeros(len(enc.dictionary), np.float64)
        np.add.at(cc_per_first, idx, c_arr)
        x = np.log((c_arr + 1.0) / (cc_per_first[idx] + float(v_vocab))) * 1e6
        mu = (-np.floor(-x + 0.5)).astype(np.int64)
        lk = dict(zip(flat_grams.to_pylist(), mu.tolist()))
    else:
        lk = {}
    ref = ray.put(lk)

    def score(batch: pa.Table, mu_ref) -> pa.Table:
        lkd = ray.get(mu_ref)
        n_bi, grams = _explode_bigrams(batch.column(text_col))
        m = _dict_lookup_int64(grams, lkd)
        csum = np.concatenate(([0], np.cumsum(m)))
        ends = np.cumsum(n_bi)
        keep = n_bi > 0
        return pa.table({
            id_col: batch.column(id_col).filter(pa.array(keep)),
            "n_bigrams": pa.array(n_bi[keep], pa.int64()),
            "bigram_lp_micro": pa.array(
                (csum[ends] - csum[ends - n_bi])[keep], pa.int64()),
        })

    import functools

    return ds.select_columns([id_col, text_col]).map_batches(
        functools.partial(score, mu_ref=ref), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# BPE merge induction (Sennrich et al. 2016) over a distributed word count
# ---------------------------------------------------------------------------

def _bpe_encode(symbols) -> str:
    """Double-space encoding: '  s1  s2  ...  sn  '.  The merge pattern
    ' l  r ' anchors on the INNER spaces of the separators, so a plain
    left-to-right non-overlapping ``str.replace`` — identical semantics in
    Python and SQL ``replace`` — applies one merge pass exactly like the
    greedy symbol-scan, including the 'a a a a' run case (each match leaves
    the neighbouring separator's other space for the next match)."""
    return "  " + "  ".join(symbols) + "  "


def _bpe_symbols(s: str):
    return [x for x in s.split(" ") if x]


def bpe_train(
    ds: ray.data.Dataset,
    text_col: str,
    num_merges: int = 8,
    min_count: int = 1,
    max_vocab: int = 1_000_000,
) -> pa.Table:
    """Byte-pair-encoding merge induction — the tokenizer-training step of
    an LLM data pipeline, as one distributed pass + a vocabulary-bounded
    driver loop (the classic algorithm operates on the DISTINCT-word
    frequency table, Sennrich et al. 2016; the corpus-scale work is the
    word count, which pre-reduces map-side and shuffles once).

    Per merge round: adjacent symbol pairs are counted with multiplicity
    (every index pair, overlaps included — Sennrich's ``zip(s, s[1:])``),
    weighted by word frequency; the winner is (max count, then
    lexicographically smallest pair); the merge applies greedily
    left-to-right.  Ties and the run case ('a a a a' + merge (a,a) →
    [aa, aa]) are pinned by tests against an independent scan
    implementation AND the unrolled-SQL oracle twin (which uses the same
    double-space string encoding — see ``_bpe_encode``).

    Driver state is O(vocab), guarded by ``max_vocab`` (top-frequency
    truncation, deterministic (count desc, word asc) order).  Returns
    (rank, left, right, merged, pair_count); stops early when no pair
    reaches ``min_count``.
    """
    from ray.data.aggregate import Sum as _Sum

    counts_ds = (ds.select_columns([text_col])
                 .map_batches(_token_count_partial(text_col),
                              batch_format="pyarrow")
                 .groupby("token").aggregate(_Sum("_n", alias_name="c")))
    n_vocab = counts_ds.count()
    if n_vocab > max_vocab:
        rows = (counts_ds.sort(["c", "token"], descending=[True, False])
                .limit(max_vocab).take_all())
    else:
        rows = counts_ds.take_all()
    words = [(_bpe_encode(r["token"]), int(r["c"])) for r in rows]

    merges = []
    for rank in range(num_merges):
        pair_counts: dict = {}
        for s, c in words:
            syms = _bpe_symbols(s)
            for a, b in zip(syms, syms[1:]):
                pair_counts[(a, b)] = pair_counts.get((a, b), 0) + c
        if not pair_counts:
            break
        best = min(pair_counts.items(), key=lambda kv: (-kv[1], kv[0]))
        (l, r), pc_best = best
        if pc_best < min_count:
            break
        pat = " " + l + "  " + r + " "
        rep = " " + l + r + " "
        words = [(s.replace(pat, rep), c) for s, c in words]
        merges.append((rank, l, r, l + r, pc_best))

    return pa.table({
        "rank": pa.array([m[0] for m in merges], pa.int64()),
        "left": pa.array([m[1] for m in merges], pa.string()),
        "right": pa.array([m[2] for m in merges], pa.string()),
        "merged": pa.array([m[3] for m in merges], pa.string()),
        "pair_count": pa.array([m[4] for m in merges], pa.int64()),
    })


def bpe_apply_token_counts(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    merges: "pa.Table",
) -> ray.data.Dataset:
    """Apply a learned BPE merge table (from :func:`bpe_train`) and count
    the resulting pieces per document — the train→apply tokenizer round
    trip, and the honest token-budget estimator for packing/pricing.

    Per batch the text column is exploded to tokens, DICTIONARY-encoded,
    and each DISTINCT token is segmented once (merge list applied in rank
    order via the double-space ``str.replace`` encoding — bit-identical to
    the SQL oracle's chain of ``replace`` calls); per-doc sums are
    segmented int64 adds over the dictionary indices.  Zero shuffles; the
    merge table broadcasts once (it is vocabulary-of-merges sized).
    Docs with zero tokens are excluded (SQL GROUP BY over the explode).
    """
    pairs = list(zip(merges.column("left").to_pylist(),
                     merges.column("right").to_pylist()))
    ref = ray.put(pairs)

    def seg_counts(batch: pa.Table, merges_ref) -> pa.Table:
        mlist = ray.get(merges_ref)
        lens, flat = _explode_tokens(batch.column(text_col))
        if len(flat) == 0:
            return pa.table({id_col: batch.column(id_col).slice(0, 0),
                             "n_tokens": pa.array([], pa.int64()),
                             "n_pieces": pa.array([], pa.int64())})
        enc = flat.dictionary_encode()
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        pieces_per = np.empty(len(enc.dictionary), np.int64)
        for u, tok in enumerate(enc.dictionary.to_pylist()):
            s = _bpe_encode(tok)
            for l, r in mlist:
                s = s.replace(" " + l + "  " + r + " ", " " + l + r + " ")
            pieces_per[u] = len(_bpe_symbols(s))
        per_occ = pieces_per[idx]
        csum = np.concatenate(([0], np.cumsum(per_occ)))
        ends = np.cumsum(lens)
        keep = lens > 0
        return pa.table({
            id_col: batch.column(id_col).filter(pa.array(keep)),
            "n_tokens": pa.array(lens[keep], pa.int64()),
            "n_pieces": pa.array((csum[ends] - csum[ends - lens])[keep],
                                 pa.int64()),
        })

    import functools

    return ds.select_columns([id_col, text_col]).map_batches(
        functools.partial(seg_counts, merges_ref=ref),
        batch_format="pyarrow")
