"""End-to-end pretraining data preparation — the composed flagship of the
training-data operator family.

One call takes a raw document corpus (plus an optional held-out eval corpus)
through the standard LLM data-prep ladder, every rung an already
oracle-verified operator:

  1. repetition quality gates   textpipe.gopher_repetition  (zero shuffle)
  2. eval decontamination       substrdedup.ngram_decontaminate
                                (eval-sized shuffle + broadcast-or-join)
  3. exact dedup, min-id winner dedup.exact_dedup  (hash-pair shuffle)
  4. token counting             FUSED into rung 1: the gate pass's n_words
                                (the doc_token_stats whitespace-run rule)
                                rides the chain; no second tokenize pass
  5. concat-and-chunk packing   packing.pack_sequences (bucketed prefix sums)

The three exchanges are keyed differently by semantics — k-gram hash
(decontamination), text hash (dedup), bucket index (packing) — so they
cannot share one partitioning; everything between them is fused map work.

Output: one row per (surviving doc, training sequence) — (doc_id, seq_id,
start_tok, end_tok) with token offsets global over surviving-doc id order,
i.e. exactly the layout a sequence-loader shards by ``seq_id``.

Every stage streams; the only materialization is inside pack_sequences'
bucket-sum wave (bucket-count-sized).  The whole chain is re-derivable in
one SQL CTE pipeline, so the driver oracle checks the COMPOSITION, not just
the parts.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray.data

from .dedup import exact_dedup
from .packing import pack_sequences
from .substrdedup import ngram_decontaminate
from .textpipe import gopher_repetition


def count_ws_tokens(ds: ray.data.Dataset, text_col: str,
                    id_col: str) -> ray.data.Dataset:
    """(id, n_tokens) — whitespace-run token counts (the oracle-verified
    doc_token_stats definition), vectorized polars, zero shuffle."""

    def count(batch: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(batch.column(text_col).cast(pa.large_string()))
        n = s.str.count_matches(r"\S+").fill_null(0).to_numpy().astype(np.int64)
        return pa.table({id_col: batch.column(id_col),
                         "n_tokens": pa.array(n, pa.int64())})

    return ds.select_columns([id_col, text_col]).map_batches(
        count, batch_format="pyarrow")


def pretrain_prep(
    docs: ray.data.Dataset,
    text_col: str,
    id_col: str,
    eval_ds: Optional[ray.data.Dataset] = None,
    seq_len: int = 2048,
    k_contam: int = 8,
    bucket: int = 100_000,
    max_dup_unigrams: float = 0.80,
    max_top_bigram: float = 0.20,
    max_top_trigram: float = 0.18,
    materialize_frontier: bool = False,
    tokenizer: str = "ws",
    bpe_merges_n: int = 8,
) -> ray.data.Dataset:
    """Quality-gate -> decontaminate -> dedup -> tokenize -> pack.

    Filters compose in a fixed order (each later stage sees only earlier
    survivors — the dedup winner set, in particular, is min(id) per distinct
    text AMONG gated, clean docs), so the SQL oracle is a CTE chain with the
    same order.
    """
    import pyarrow.compute as pc

    gated = gopher_repetition(
        docs.select_columns([id_col, text_col]), text_col, id_col,
        max_dup_unigrams=max_dup_unigrams, max_top_bigram=max_top_bigram,
        max_top_trigram=max_top_trigram, passthrough=True)

    # the gate pass already tokenized every doc — carry its n_words through
    # the chain as the token count (proven == count_ws_tokens' \S+ rule,
    # tests/test_pretrain.py) instead of re-tokenizing the survivors
    def keep_only(batch: pa.Table) -> pa.Table:
        return batch.filter(batch.column("keep")) \
                    .select([id_col, text_col, "n_words"])

    kept = gated.map_batches(keep_only, batch_format="pyarrow")

    if eval_ds is not None:
        flagged = ngram_decontaminate(kept, eval_ds, text_col, id_col,
                                      k=k_contam, passthrough=True)

        def clean_only(batch: pa.Table) -> pa.Table:
            return batch.filter(
                pc.invert(batch.column("contaminated"))
            ).select([id_col, text_col, "n_words"])

        kept = flagged.map_batches(clean_only, batch_format="pyarrow")

    # exact_dedup consumes its input three ways (count-based path selection,
    # the winner aggregate, and the filter/join back) — on a lazy stream each
    # consumer re-runs the gate maps above.  Measured at bench scale the
    # fully-pipelined lazy chain is FASTER than a materialization barrier
    # (14.8 s vs 25.5 s at 500k tokens: re-running cheap vectorized maps
    # costs less than serializing four stages), so lazy is the default;
    # at true corpus scale, where three extra passes of read+tokenize beat
    # one spillable copy, pass ``materialize_frontier=True``.
    if materialize_frontier:
        kept = kept.materialize()
    uniq = exact_dedup(kept, text_col, id_col)
    if tokenizer == "bpe":
        # train the tokenizer ON THE SURVIVORS (the corpus the model will
        # actually see), then pack by piece counts — the honest budget
        from .tfidf import bpe_apply_token_counts, bpe_train

        merges = bpe_train(uniq, text_col, num_merges=bpe_merges_n)
        toks = bpe_apply_token_counts(uniq, text_col, id_col, merges)
        return pack_sequences(toks, id_col, "n_pieces", seq_len=seq_len,
                              bucket=bucket)
    def project_tokens(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch.column(id_col),
                         "n_tokens": batch.column("n_words")})

    toks = uniq.map_batches(project_tokens, batch_format="pyarrow")
    return pack_sequences(toks, id_col, "n_tokens", seq_len=seq_len,
                          bucket=bucket)


def span_corruption_stats(
    ds: ray.data.Dataset,
    text_col: str = "text",
    group_col: str = "source",
    noise_density: float = 0.15,
    mean_span_len: float = 3.0,
    seq_len: int = 512,
) -> ray.data.Dataset:
    """T5-style span-corruption PLANNING stats per group — how much
    encoder/decoder budget a corpus costs before any example is built.

    Per doc (n = whitespace-run token count, the doc_token_stats rule;
    docs with n < 2 are excluded — nothing to corrupt):

      noise  = clamp(round(n * noise_density), 1, n - 1)
      spans  = max(round(noise / mean_span_len), 1)
      input_len  = n - noise + spans + 1   (+1: EOS sentinel)
      target_len = noise + spans + 1

    round() is floor(x + 0.5) — positive args only, so half-up equals
    half-away and the SQL oracle's floor(x + 0.5) matches bit-exactly
    (the x * density product is the same IEEE double on both sides).

    Output: one row per group — n_docs, sum_input_tokens,
    sum_target_tokens, sum_spans, seqs (SUM of ceil(input_len / seq_len),
    integer arithmetic).  All-integer columns: no float SUM-order hazard.

    Shape: one vectorized zero-shuffle counting pass with per-batch
    per-group partials, then one group-count-sized groupby sum.
    """

    def plan(batch: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(batch.column(text_col).cast(pa.large_string()))
        n = s.str.count_matches(r"\S+").fill_null(0).to_numpy().astype(
            np.int64)
        grp = batch.column(group_col)
        keep = n >= 2
        n = n[keep]
        grp = grp.filter(pa.array(keep))
        noise = np.floor(n * noise_density + 0.5).astype(np.int64)
        noise = np.clip(noise, 1, n - 1)
        spans = np.maximum(
            np.floor(noise / mean_span_len + 0.5).astype(np.int64), 1)
        input_len = n - noise + spans + 1
        target_len = noise + spans + 1
        seqs = (input_len + seq_len - 1) // seq_len
        t = pa.table({group_col: grp,
                      "input_len": pa.array(input_len, pa.int64()),
                      "target_len": pa.array(target_len, pa.int64()),
                      "spans": pa.array(spans, pa.int64()),
                      "seqs": pa.array(seqs, pa.int64())})
        # per-batch per-group partials (group-count-sized rows out)
        df = pl.from_arrow(t).group_by(group_col).agg(
            pl.len().alias("n_docs"),
            pl.col("input_len").sum().alias("sum_input_tokens"),
            pl.col("target_len").sum().alias("sum_target_tokens"),
            pl.col("spans").sum().alias("sum_spans"),
            pl.col("seqs").sum().alias("seqs"))
        out = df.to_arrow()
        return out.set_column(
            out.schema.get_field_index(group_col), group_col,
            out.column(group_col).cast(pa.string()))

    from ray.data.aggregate import Sum

    partials = ds.select_columns([text_col, group_col]).map_batches(
        plan, batch_format="pyarrow")
    return partials.groupby(group_col).aggregate(
        Sum("n_docs", alias_name="n_docs"),
        Sum("sum_input_tokens", alias_name="sum_input_tokens"),
        Sum("sum_target_tokens", alias_name="sum_target_tokens"),
        Sum("sum_spans", alias_name="sum_spans"),
        Sum("seqs", alias_name="seqs"))
