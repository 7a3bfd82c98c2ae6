"""Query bodies _q_embedding_dedup.._q_heavy_hitters (mechanical split of __ray_entry__.py)."""

from __future__ import annotations
import glob
import os
from collections.abc import Callable
from typing import Any
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from ._shared import *  # noqa: F401,F403

__all__ = ['_q_embedding_dedup', '_q_top_term', '_q_orders_lineitem_join', '_q_hourly_distinct_users', '_q_events_in_sessions', '_q_stratified_sample', '_q_profile_documents', '_q_pack_sequences', '_q_decontaminate', '_q_pivot_event_daily', '_q_funnel', '_q_cohort_retention', '_q_semantic_dedup', '_q_unigram_logprob', '_q_quantiles_refine', '_q_unimax_plan', '_q_asof_nearest_error', '_q_materialize_sequences', '_q_dow_hour_heatmap', '_q_skew_kurt_by_type', '_q_robust_outliers', '_q_mad_by_type', '_q_minhash_cross_join', '_q_overlap_sessions_outages', '_q_dsir_weights', '_q_pretrain_prep', '_q_gopher_repetition', '_q_nfc_normalize', '_q_boilerplate_stats', '_q_ngram_decontaminate', '_q_dup_span_clean', '_q_vocab_top100', '_q_pii_redact', '_q_mixture', '_q_bm25', '_q_bm25_indexed', '_q_ntile', '_q_rolling_avg', '_q_heavy_hitters']

def _q_embedding_dedup(sf_dir: str):
    """Embedding near-dup ids — exact all-pairs baseline (broadcast unit
    matrix + per-batch matmul; LSH sign-bucket variant is the scale path).
    Oracle: DuckDB EXISTS + list_cosine_similarity, a genuinely independent
    re-derivation."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.dedup import embedding_dup_ids_exact

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    out = embedding_dup_ids_exact(ds, "embedding", "vec_id", threshold=0.45)
    ids = sorted(r["vec_id"] for r in out.take_all())
    return pa.table({"vec_id": pa.array(ids, pa.int64())})


def _q_top_term(sf_dir: str):
    """Corpus TF-IDF: most characteristic term per document under the total
    integer order (tf desc, df asc, token asc) — tokenize → two keyed
    pre-combined shuffles → vocabulary-bounded broadcast join → grouped
    top-1 (pipelines/tfidf.py)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import top_term_per_doc

    n_docs = _docs_rows(sf_dir)
    out = top_term_per_doc(_documents(sf_dir, ["doc_id", "text"]),
                           "text", "doc_id", n_docs=n_docs)
    rows = out.select_columns(["doc_id", "token", "tf", "df"]).take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "token": pa.array([r["token"] for r in rows], pa.string()),
        "tf": pa.array([r["tf"] for r in rows], pa.int64()),
        "df": pa.array([r["df"] for r in rows], pa.int64()),
    })


def _q_orders_lineitem_join(sf_dir: str):
    """Big-big hash shuffle join (Dataset.join), row-level: urgent orders'
    line items with revenue — the J-family scale path checked directly
    (exact_dedup only exercises it indirectly)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
    ).filter(expr="o_orderpriority == '1-URGENT'")
    joined = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                          join_type="inner", num_partitions=16)

    def project(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = price * (1.0 - disc)
        m = 1e4
        rev4 = np.where(rev >= 0, np.floor(rev * m + 0.5) / m,
                        -np.floor(-rev * m + 0.5) / m)
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "l_linenumber": batch.column("l_linenumber"),
            "o_totalprice": batch.column("o_totalprice"),
            "revenue": pa.array(rev4, pa.float64()),
        })

    out = joined.map_batches(project, batch_format="pyarrow")
    rows = out.take_all()
    rows.sort(key=lambda r: (r["l_orderkey"], r["l_linenumber"]))
    return pa.table({
        "l_orderkey": pa.array([r["l_orderkey"] for r in rows], pa.int64()),
        "l_linenumber": pa.array([r["l_linenumber"] for r in rows], pa.int64()),
        "o_totalprice": pa.array([r["o_totalprice"] for r in rows], pa.float64()),
        "revenue": pa.array([r["revenue"] for r in rows], pa.float64()),
    })


def _q_hourly_distinct_users(sf_dir: str):
    """Composition check: tumbling window x COUNT(DISTINCT) — hourly distinct
    users, windows assigned map-side then rankagg.distinct_count_by on the
    window key."""
    from insurance_pdf_extractor_ray.pipelines.rankagg import distinct_count_by

    hour_us = 3_600_000_000

    def add_window(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (us // hour_us) * hour_us
        return pa.table({"window_start": pa.array(w, pa.int64()),
                         "user_id": batch.column("user_id")})

    ds = _events(sf_dir, ["ts", "user_id"]).map_batches(add_window,
                                                        batch_format="pyarrow")
    out = distinct_count_by(ds, "window_start", "user_id")
    rows = sorted(out.take_all(), key=lambda r: r["window_start"])
    return pa.table({
        "window_start": pa.array([r["window_start"] for r in rows], pa.int64()),
        "n_distinct": pa.array([r["n_distinct"] for r in rows], pa.int64()),
    })


def _q_events_in_sessions(sf_dir: str):
    """Composition: range join x session windows — every event assigned to
    its (user, session) interval via the epoch-bucketed point-in-interval
    join (pipelines/joins.py:range_join).  1:1 by construction, which the
    row count proves."""
    from insurance_pdf_extractor_ray.pipelines.joins import range_join
    from insurance_pdf_extractor_ray.pipelines.windows import session_windows

    sessions = session_windows(_events(sf_dir, ["user_id", "ts", "event_id"]),
                               "user_id", "ts", gap_us=600_000_000,
                               tiebreak_col="event_id")

    def us(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch.column("event_id"),
                         "user_id": batch.column("user_id"),
                         "ts_us": batch.column("ts").cast(pa.int64())})

    points = _events(sf_dir, ["event_id", "user_id", "ts"]).map_batches(
        us, batch_format="pyarrow")
    out = range_join(points, sessions, on="ts_us", start_col="start_us",
                     end_col="end_us", epoch=3_600_000_000, by="user_id",
                     interval_cols=["session_id"])
    rows = out.select_columns(["event_id", "session_id"]).take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "session_id": pa.array([r["session_id"] for r in rows], pa.int64()),
    })


def _q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling (per-source mixing rates) — pure
    arithmetic-hash predicate: zero shuffle, partition-independent, exactly
    re-derivable in SQL (pipelines/sampling.py)."""
    from insurance_pdf_extractor_ray.pipelines.sampling import stratified_hash_sample

    out = stratified_hash_sample(
        _documents(sf_dir, ["doc_id", "source"]), "source", "doc_id",
        rates={"src0": 0.5, "src1": 1.0, "src2": 0.0}, default_rate=0.25,
        seed=13)
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
    })


def _q_profile_documents(sf_dir: str):
    """Column profiling over the documents table — integer-exact subset
    (row/null/distinct counts; float metrics excluded from the oracle
    because mean is reduction-order-dependent)."""
    from insurance_pdf_extractor_ray.pipelines.profile import profile_columns

    out = profile_columns(_documents(sf_dir), columns=["doc_id", "lang", "source",
                                                       "n_chars"])
    out = out.select(["column", "n", "n_null", "n_distinct"]).rename_columns(
        ["col_name", "n", "n_null", "n_distinct"])
    return out.take(pc.sort_indices(out, sort_keys=[("col_name", "ascending")]))


def _q_pack_sequences(sf_dir: str):
    """Concat-and-chunk sequence packing (2048-token budget) over documents in
    doc_id order — bucketed prefix sums, no ordered global scan
    (pipelines/packing.py); token counts = whitespace runs, the
    oracle-verified doc_token_stats definition."""
    from insurance_pdf_extractor_ray.pipelines.packing import pack_sequences

    def count_tokens(batch: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(batch.column("text").cast(pa.large_string()))
        n = s.str.count_matches(r"\S+").fill_null(0).to_numpy().astype(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": pa.array(n, pa.int64())})

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        count_tokens, batch_format="pyarrow")
    out = pack_sequences(ds, "doc_id", "n_tokens", seq_len=2048, bucket=100)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["doc_id"], r["seq_id"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "seq_id": pa.array([r["seq_id"] for r in rows], pa.int64()),
        "start_tok": pa.array([r["start_tok"] for r in rows], pa.int64()),
        "end_tok": pa.array([r["end_tok"] for r in rows], pa.int64()),
    })


def _q_decontaminate(sf_dir: str):
    """Eval-set decontamination: per-doc count of word 6-grams shared with
    the eval subset (doc_id < 5) — eval n-gram set broadcast once, corpus
    streams shuffle-free (pipelines/tfidf.py:ngram_overlap_tag)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.tfidf import ngram_overlap_tag

    docs = _documents(sf_dir, ["doc_id", "text"])
    eval_ds = _documents(sf_dir, ["doc_id", "text"]).filter(expr="doc_id < 5")
    out = ngram_overlap_tag(docs, eval_ds, "text", "doc_id", n=6)
    rows = out.select_columns(["doc_id", "n_overlap"]).take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_overlap": pa.array([r["n_overlap"] for r in rows], pa.int64()),
    })


def _q_pivot_event_daily(sf_dir: str):
    """Wide pivot (count(*) FILTER per event_type column, one row per day) —
    map-side pair pre-aggregation, one keyed shuffle over the (day, type)
    count table, fixed explicit column domain so every block carries an
    identical schema (pipelines/behavior.py:pivot_counts)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import pivot_counts

    types = ["click", "error", "purchase", "signup", "view"]

    def add_date(batch: pa.Table) -> pa.Table:
        return pa.table({
            "date": pc.strftime(batch.column("ts"), format="%Y-%m-%d"),
            "event_type": batch.column("event_type"),
        })

    ev = _events(sf_dir, ["ts", "event_type"]).map_batches(
        add_date, batch_format="pyarrow")
    out = pivot_counts(ev, "date", "event_type", types, prefix="n_")
    rows = out.take_all()
    rows.sort(key=lambda r: r["date"])
    cols = {"date": pa.array([r["date"] for r in rows], pa.string())}
    for t in types:
        cols[f"n_{t}"] = pa.array([r[f"n_{t}"] for r in rows], pa.int64())
    return pa.table(cols)


def _q_funnel(sf_dir: str):
    """Ordered-step funnel view→click→purchase (min-ts, strictly-after
    semantics): irrelevant types dropped map-side, ONE user-keyed shuffle,
    vectorized per-user scan, K-row result
    (pipelines/behavior.py:funnel_counts)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import funnel_counts

    return funnel_counts(
        _events(sf_dir, ["user_id", "ts", "event_type"]),
        "user_id", "ts", "event_type", steps=["view", "click", "purchase"])


def _q_cohort_retention(sf_dir: str):
    """Cohort retention: distinct users active N days after their first-ever
    day (N=0..7).  First-activity = pre-combined keyed min; join-back via
    the standard broadcast-or-shuffle size policy; distinct counting
    shuffles deduped (cohort, offset, user) triples
    (pipelines/behavior.py:cohort_retention)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import cohort_retention

    out = cohort_retention(_events(sf_dir, ["user_id", "ts"]),
                           "user_id", "ts", max_offset=7)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["cohort_day"], r["day_offset"]))
    return pa.table({
        "cohort_day": pa.array([r["cohort_day"] for r in rows], pa.string()),
        "day_offset": pa.array([r["day_offset"] for r in rows], pa.int64()),
        "n_users": pa.array([r["n_users"] for r in rows], pa.int64()),
    })


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup: k-means the embedding space, greedy cosine-leader prune per
    cluster (pipelines/clustering.py:semantic_dedup_drop_ids).  Oracle:
    pinned id list at sf0.01 — every dropped id independently verified in
    DuckDB to have a smaller-id partner at list_cosine_similarity >= tau,
    and the set proven identical across block layouts and CPU counts."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.clustering import (
        semantic_dedup_drop_ids,
    )

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    out = semantic_dedup_drop_ids(ds, "embedding", "vec_id",
                                  n_clusters=8, tau=0.30)
    ids = sorted(r["vec_id"] for r in out.take_all())
    return pa.table({"vec_id": pa.array(ids, pa.int64())})


def _q_unigram_logprob(sf_dir: str):
    """Corpus-unigram LM quality score per doc, quantized to integer
    micro-nats before the reduction so the sum is reduction-order-proof
    (pipelines/tfidf.py:unigram_logprob)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import unigram_logprob

    out = unigram_logprob(_documents(sf_dir, ["doc_id", "text"]),
                          "text", "doc_id")
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64()),
        "logprob_micro": pa.array([r["logprob_micro"] for r in rows], pa.int64()),
    })


def _q_quantiles_refine(sf_dir: str):
    """Exact global quantile_cont/quantile_disc WITHOUT a sort — iterative
    histogram rank-refinement, zero shuffles, driver state O(bins) per pass
    (pipelines/sketches.py:quantiles_global)."""
    import numpy as np

    from insurance_pdf_extractor_ray.pipelines.sketches import (
        quantiles_global,
    )

    ds = _events(sf_dir, ["value"])
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    cont = quantiles_global(ds, "value", qs)
    disc = quantiles_global(ds, "value", qs, kind="disc")

    def r6(xs):
        v = np.array(xs, np.float64)
        return np.where(v >= 0, np.floor(v * 1e6 + 0.5) / 1e6,
                        -np.floor(-v * 1e6 + 0.5) / 1e6)

    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "cont": pa.array(r6(cont), pa.float64()),
        "disc": pa.array(r6(disc), pa.float64()),
    })


def _q_unimax_plan(sf_dir: str):
    """UniMax temperature-sampling plan (tau=2, cap 4 epochs) over event
    types: per-source mixture weights from one tiny keyed count — feeds
    mixture_interleave's zero-shuffle hash-keep executor
    (pipelines/mixing.py:unimax_plan)."""
    from insurance_pdf_extractor_ray.pipelines.mixing import unimax_plan

    return unimax_plan(_events(sf_dir, ["event_type"]), "event_type",
                       tau=2.0, max_epochs=4.0)


def _q_asof_nearest_error(sf_dir: str):
    """Nearest-as-of join: each purchase matched to the user's CLOSEST
    error timestamp in either direction (backward wins exact ties) — one
    keyed shuffle, per-key double searchsorted
    (pipelines/joins.py:asof_join(direction='nearest'))."""
    import pyarrow.compute as pc

    from insurance_pdf_extractor_ray.pipelines.joins import asof_join

    ev = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])

    def prep(etype, cols):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("event_type"), etype))
            out = {c: t.column(c) for c in cols}
            out["_ts"] = pc.cast(t.column("ts"), pa.int64())
            return pa.table(out)
        return fn

    left = ev.map_batches(prep("purchase", ["user_id", "event_id"]),
                          batch_format="pyarrow")
    right = ev.map_batches(prep("error", ["user_id"]),
                           batch_format="pyarrow")
    out = asof_join(left, right, "user_id", "_ts", "_ts",
                    out_col="nearest_error_ts", direction="nearest")
    rows = out.take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "nearest_error_ts": pa.array(
            [r["nearest_error_ts"] for r in rows], pa.int64()),
    })


def _q_materialize_sequences(sf_dir: str):
    """Last mile of packing: actual 512-token training-sequence TEXT —
    pack offsets -> ONE keyed join back onto doc text -> vectorized word
    slices -> ONE budget-bounded seq-keyed ordered concat
    (pipelines/packing.py:materialize_sequences)."""
    from insurance_pdf_extractor_ray.pipelines.packing import (
        materialize_sequences,
    )

    out = materialize_sequences(_documents(sf_dir, ["doc_id", "text"]),
                                "doc_id", "text", seq_len=512, bucket=100)
    rows = out.take_all()
    rows.sort(key=lambda r: r["seq_id"])
    return pa.table({
        "seq_id": pa.array([r["seq_id"] for r in rows], pa.int64()),
        "seq_text": pa.array([r["seq_text"] for r in rows], pa.string()),
        "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
    })


def _q_dow_hour_heatmap(sf_dir: str):
    """Activity heatmap by (day-of-week, hour): temporal parts derived with
    pure epoch arithmetic (dow = (epoch_days + 4) % 7 — 1970-01-01 was a
    Thursday; DuckDB dayofweek numbering 0=Sunday), per-batch two-key
    partials, ONE tiny keyed combine."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        days = us // 86_400_000_000
        dow = (days + 4) % 7
        hour = (us // 3_600_000_000) % 24
        base = pa.table({
            "dow": pa.array(dow, pa.int64()),
            "hour": pa.array(hour, pa.int64()),
            "_n": pa.array(np.ones(len(us), np.int64), pa.int64()),
        })
        return base.group_by(["dow", "hour"]).aggregate(
            [("_n", "sum")]).rename_columns(["dow", "hour", "_n"])

    agg = (_events(sf_dir, ["ts"]).map_batches(partial,
                                               batch_format="pyarrow")
           .groupby(["dow", "hour"]).aggregate(Sum("_n", alias_name="n")))
    rows = agg.take_all()
    rows.sort(key=lambda r: (r["dow"], r["hour"]))
    return pa.table({
        "dow": pa.array([r["dow"] for r in rows], pa.int64()),
        "hour": pa.array([r["hour"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_skew_kurt_by_type(sf_dir: str):
    """Grouped skewness/kurtosis (bias-corrected sample estimators) from
    five-number power-sum partials — one keyed shuffle of O(keys) rows
    (pipelines/statagg.py:skew_kurt_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import (
        skew_kurt_by_key,
    )

    out = skew_kurt_by_key(_events(sf_dir, ["event_type", "value"]),
                           "event_type", "value")
    rows = out.take_all()
    rows.sort(key=lambda r: r["event_type"])
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "skewness": pa.array([round(r["skewness"], 9) for r in rows],
                             pa.float64()),
        "kurtosis": pa.array([round(r["kurtosis"], 9) for r in rows],
                             pa.float64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_robust_outliers(sf_dir: str):
    """Robust outlier counts per event type: |value - median| > 3 * MAD
    (median/MAD immune to the outliers being hunted, unlike mean/stddev) —
    composition of two skew-proof exact median passes broadcast into one
    counting map (pipelines/statagg.py:mad_by_key + median_by_key)."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.pipelines.statagg import (
        mad_by_key,
        median_by_key,
    )

    ds = _events(sf_dir, ["event_type", "value"])
    med = {r["event_type"]: r["_med"] for r in
           median_by_key(ds, "event_type", "value", out_col="_med")
           .take_all()}
    mad = {r["event_type"]: r["mad"] for r in
           mad_by_key(ds, "event_type", "value").take_all()}
    import ray
    ref = ray.put((med, mad))

    def flag(t: pa.Table, r) -> pa.Table:
        import numpy as np

        m, s = ray.get(r)
        k = t.column("event_type").to_pylist()
        v = t.column("value").to_numpy(zero_copy_only=False)
        meds = np.array([m[x] for x in k])
        mads = np.array([s[x] for x in k])
        out = np.abs(v - meds) > 3.0 * mads
        base = pa.table({"event_type": t.column("event_type"),
                         "_o": pa.array(out.astype(np.int64), pa.int64()),
                         "_n": pa.array(np.ones(len(v), np.int64), pa.int64())})
        return base.group_by(["event_type"]).aggregate(
            [("_o", "sum"), ("_n", "sum")]).rename_columns(
            ["event_type", "_o", "_n"])

    agg = (ds.map_batches(flag, fn_args=(ref,), batch_format="pyarrow")
           .groupby("event_type").aggregate(
               Sum("_o", alias_name="n_outliers"),
               Sum("_n", alias_name="n")))
    rows = agg.take_all()
    rows.sort(key=lambda r: r["event_type"])
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "n_outliers": pa.array([r["n_outliers"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_mad_by_type(sf_dir: str):
    """Robust dispersion: exact MAD(value) per event type — two skew-proof
    exact median passes (pipelines/statagg.py:mad_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import mad_by_key

    out = mad_by_key(_events(sf_dir, ["event_type", "value"]),
                     "event_type", "value")
    rows = out.take_all()
    rows.sort(key=lambda r: r["event_type"])
    import numpy as np

    v = np.array([r["mad"] for r in rows], np.float64)
    r6 = np.where(v >= 0, np.floor(v * 1e6 + 0.5) / 1e6,
                  -np.floor(-v * 1e6 + 0.5) / 1e6)
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "mad": pa.array(r6, pa.float64()),
    })


def _q_minhash_cross_join(sf_dir: str):
    """Cross-corpus set-similarity join: corpus docs that are MinHash
    near-dups of an eval slice (doc_id % 50 == 0) — fuzzy decontamination
    (pipelines/dedup.py:minhash_cross_join).  Oracle: pinned pairs at
    sf0.01; the one non-identity pair (92, 450) verified at exact 3-gram
    Jaccard 0.958 in DuckDB; estimates are k/128 dyadic rationals, so the
    floats pin exactly.  Layout/CPU-count-stable."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.dedup import minhash_cross_join

    docs = _documents(sf_dir, ["doc_id", "text"])

    def _eval(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 50 == 0))

    out = minhash_cross_join(
        docs, docs.map_batches(_eval, batch_format="pyarrow"),
        "text", "doc_id", threshold=0.7)
    rows = sorted(out.take_all(), key=lambda r: (r["l_id"], r["r_id"]))
    return pa.table({
        "l_id": pa.array([r["l_id"] for r in rows], pa.int64()),
        "r_id": pa.array([r["r_id"] for r in rows], pa.int64()),
        "est": pa.array([r["est"] for r in rows], pa.float64()),
    })


def _q_overlap_sessions_outages(sf_dir: str):
    """Interval x interval OVERLAP join: purchase activity windows
    [ts, ts+5min] against outage windows [error ts, +10min] — both sides
    replicate to epoch buckets, pairs dedup by first-common-bucket rule
    (pipelines/joins.py:interval_overlap_join)."""
    from insurance_pdf_extractor_ray.pipelines.joins import (
        interval_overlap_join,
    )

    def iv(prefix, etype, mins):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            s = batch.column("ts").cast(pa.int64())
            return pa.table({
                f"{prefix}_id": batch.column("event_id"),
                f"{prefix}s": s,
                f"{prefix}e": pc.add(s, mins * 60_000_000),
            })
        return fn

    ev = _events(sf_dir, ["event_id", "ts", "event_type"])
    left = ev.filter(expr="event_type == 'purchase'").map_batches(
        iv("l", "purchase", 5), batch_format="pyarrow")
    right = ev.filter(expr="event_type == 'error'").map_batches(
        iv("r", "error", 10), batch_format="pyarrow")
    out = interval_overlap_join(left, right, "ls", "le", "rs", "re",
                                epoch=600_000_000)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["l_id"], r["r_id"]))
    return pa.table({
        "l_id": pa.array([r["l_id"] for r in rows], pa.int64()),
        "r_id": pa.array([r["r_id"] for r in rows], pa.int64()),
    })


def _q_dsir_weights(sf_dir: str):
    """DSIR importance weights toward a target slice (source='src0' docs):
    unigram importance ratio in integer micro-nats, quantized per distinct
    token before the reduction (pipelines/tfidf.py:dsir_logweight; the
    hashed fixed-feature variant is the unbounded-vocabulary scale path)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import dsir_logweight

    docs = _documents(sf_dir, ["doc_id", "text", "source"])
    target = docs.filter(expr="source == 'src0'") \
                 .select_columns(["doc_id", "text"])
    out = dsir_logweight(docs.select_columns(["doc_id", "text"]), target,
                         "text", "doc_id")
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64()),
        "dsir_micro": pa.array([r["dsir_micro"] for r in rows], pa.int64()),
    })


def _q_pretrain_prep(sf_dir: str):
    """END-TO-END pretraining data prep (pipelines/pretrain.py): Gopher
    repetition gates -> 8-gram eval decontamination (eval = doc_id % 50
    == 0) -> exact dedup (min-id winner among survivors) -> whitespace
    token counts -> 1024-token concat-and-chunk packing.  The SQL oracle
    re-derives the WHOLE chain as one CTE pipeline, so the composition is
    verified, not just the stages."""
    from insurance_pdf_extractor_ray.pipelines.pretrain import pretrain_prep

    docs = _documents(sf_dir, ["doc_id", "text"])

    def _slice(keep_eval: bool):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as np

            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 50 == 0) if keep_eval else (ids % 50 != 0)
            return t.filter(pa.array(m))
        return fn

    out = pretrain_prep(
        docs.map_batches(_slice(False), batch_format="pyarrow"),
        "text", "doc_id",
        eval_ds=docs.map_batches(_slice(True), batch_format="pyarrow"),
        seq_len=1024, bucket=100)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["doc_id"], r["seq_id"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "seq_id": pa.array([r["seq_id"] for r in rows], pa.int64()),
        "start_tok": pa.array([r["start_tok"] for r in rows], pa.int64()),
        "end_tok": pa.array([r["end_tok"] for r in rows], pa.int64()),
    })


def _q_gopher_repetition(sf_dir: str):
    """Gopher-style per-doc repetition signals (Rae et al. 2021 Table A1):
    duplicated-unigram fraction + top bigram/trigram word fractions
    (multiplicity >= 2 only), single vectorized pass, zero shuffles
    (pipelines/textpipe.py:gopher_repetition)."""
    from insurance_pdf_extractor_ray.pipelines.textpipe import (
        gopher_repetition,
    )

    out = gopher_repetition(_documents(sf_dir, ["doc_id", "text"]))
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_words": pa.array([r["n_words"] for r in rows], pa.int64()),
        "frac_dup_unigrams": pa.array(
            [r["frac_dup_unigrams"] for r in rows], pa.float64()),
        "frac_top_bigram": pa.array(
            [r["frac_top_bigram"] for r in rows], pa.float64()),
        "frac_top_trigram": pa.array(
            [r["frac_top_trigram"] for r in rows], pa.float64()),
        "keep": pa.array([r["keep"] for r in rows], pa.bool_()),
    })


def _q_nfc_normalize(sf_dir: str):
    """Unicode NFC canonicalization of the text column (combining marks
    composed before hashing/dedup see the text) with a changed-row audit
    flag — ascii fast path, zero shuffles
    (pipelines/textpipe.py:nfc_normalize).  Semantics exercised on
    non-ASCII fixtures in tests/test_gopher.py; DuckDB nfc_normalize is
    the oracle."""
    from insurance_pdf_extractor_ray.pipelines.textpipe import nfc_normalize

    out = nfc_normalize(_documents(sf_dir, ["doc_id", "text"]))
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "text_nfc": pa.array([r["text_nfc"] for r in rows], pa.string()),
        "changed": pa.array([r["changed"] for r in rows], pa.bool_()),
    })


def _q_boilerplate_stats(sf_dir: str):
    """Corpus boilerplate mass: strict 8-word windows, positions covered by
    corpus-duplicated windows, distinct dup windows, docs touched — the
    dup-span machinery reduced to four scalars
    (pipelines/substrdedup.py:boilerplate_stats)."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        boilerplate_stats,
    )

    return boilerplate_stats(_documents(sf_dir, ["doc_id", "text"]),
                             "text", "doc_id", k=8, min_docs=2)


def _q_ngram_decontaminate(sf_dir: str):
    """Exact n-gram decontamination: flag corpus docs (doc_id % 50 != 0)
    sharing any 8-word window with the eval slice (doc_id % 50 == 0) — the
    exact twin of minhash_cross_join's fuzzy gate
    (pipelines/substrdedup.py:ngram_decontaminate)."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        ngram_decontaminate,
    )

    docs = _documents(sf_dir, ["doc_id", "text"])

    def _slice(keep_eval: bool):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as np

            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 50 == 0) if keep_eval else (ids % 50 != 0)
            return t.filter(pa.array(m))
        return fn

    out = ngram_decontaminate(
        docs.map_batches(_slice(False), batch_format="pyarrow"),
        docs.map_batches(_slice(True), batch_format="pyarrow"),
        "text", "doc_id", k=8)
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_windows": pa.array([r["n_windows"] for r in rows], pa.int64()),
        "n_eval_hits": pa.array([r["n_eval_hits"] for r in rows], pa.int64()),
        "contaminated": pa.array([r["contaminated"] for r in rows], pa.bool_()),
    })


def _q_dup_span_clean(sf_dir: str):
    """Substring-level dedup (Lee et al.): cut 8-word windows occurring in
    >=2 distinct docs out of every document — window-hash pass 1, one keyed
    combine, dup-set broadcast-or-join pass 2
    (pipelines/substrdedup.py:dup_span_clean)."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import dup_span_clean

    out = dup_span_clean(_documents(sf_dir, ["doc_id", "text"]),
                         "text", "doc_id", k=8, min_docs=2)
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_words": pa.array([r["n_words"] for r in rows], pa.int64()),
        "n_windows": pa.array([r["n_windows"] for r in rows], pa.int64()),
        "n_dup_windows": pa.array([r["n_dup_windows"] for r in rows], pa.int64()),
        "n_dropped_words": pa.array([r["n_dropped_words"] for r in rows], pa.int64()),
        "clean_text": pa.array([r["clean_text"] for r in rows], pa.string()),
    })


def _q_vocab_top100(sf_dir: str):
    """Global top-100 vocabulary by corpus frequency (token-asc tiebreak) —
    per-batch distinct-token counting BEFORE the shuffle, one keyed combine,
    distributed sort-limit (pipelines/tfidf.py:vocab_counts)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import vocab_counts

    out = vocab_counts(_documents(sf_dir, ["doc_id", "text"]),
                       "text", "doc_id", k=100)
    rows = out.take_all()
    rows.sort(key=lambda r: (-r["n"], r["token"]))
    return pa.table({
        "token": pa.array([r["token"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_pii_redact(sf_dir: str):
    """PII + denylist scrubbing: ordered regex classes (email/phone/SSN →
    replacement tokens, then a whole-word denylist), vectorized polars
    rewrite, zero shuffle; per-class match counts
    (functions/redact.py:redact_text).  The oracle re-derives the rewritten
    text character-for-character with nested regexp_replace."""
    from insurance_pdf_extractor_ray.functions.redact import (
        PII_PATTERNS,
        denylist_pattern,
        redact_text,
    )

    patterns = list(PII_PATTERNS) + [
        ("deny", denylist_pattern(["spark", "merge", "hash"]), "[TERM]")]
    out = redact_text(_documents(sf_dir, ["doc_id", "text"]), "text",
                      patterns=patterns)
    out = out.select_columns(
        ["doc_id", "n_email", "n_phone", "n_ssn", "n_deny", "text_redacted"])
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_email": pa.array([r["n_email"] for r in rows], pa.int64()),
        "n_phone": pa.array([r["n_phone"] for r in rows], pa.int64()),
        "n_ssn": pa.array([r["n_ssn"] for r in rows], pa.int64()),
        "n_deny": pa.array([r["n_deny"] for r in rows], pa.int64()),
        "text_redacted": pa.array([r["text_redacted"] for r in rows],
                                  pa.string()),
    })


def _q_mixture(sf_dir: str):
    """Weighted mixture with repetition (source weights 2.5/1.0/0.25/1.75):
    per-(id, epoch) arithmetic-hash keep decisions + deterministic shard
    assignment — ZERO shuffle where the textbook implementation globally
    shuffles the concatenation (pipelines/mixing.py:mixture_interleave)."""
    from insurance_pdf_extractor_ray.pipelines.mixing import mixture_interleave

    out = mixture_interleave(_documents(sf_dir, ["doc_id", "source"]),
                             "source", "doc_id", _MIX_WEIGHTS,
                             seed=101, n_shards=64)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["doc_id"], r["epoch"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "epoch": pa.array([r["epoch"] for r in rows], pa.int64()),
        "shard": pa.array([r["shard"] for r in rows], pa.int64()),
    })


def _q_bm25(sf_dir: str):
    """BM25 top-15 for a bag-of-words query — token stream filtered to the
    query vocabulary BEFORE its only shuffle, corpus stats from a
    zero-shuffle counting pass, distributed sort-limit
    (pipelines/tfidf.py:bm25_search)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import bm25_search

    return bm25_search(_documents(sf_dir, ["doc_id", "text"]),
                       "text", "doc_id",
                       query_terms=["shuffle", "spark", "window"], k=15)


def _q_bm25_indexed(sf_dir: str):
    """BM25 over the inverted-index at-rest layout — posting lists written
    once (zero-shuffle exact map-side tf), the query reads ONLY its terms'
    bucket dirs; proven bit-identical to the scan path, so it shares
    bm25_search's SQL oracle (pipelines/invindex.py:bm25_search_indexed)."""
    import tempfile

    from insurance_pdf_extractor_ray.pipelines.invindex import (
        bm25_search_indexed,
        build_inverted_index,
    )

    root = tempfile.mkdtemp(prefix="ipe_invidx_q_")
    build_inverted_index(_documents(sf_dir, ["doc_id", "text"]),
                         "text", "doc_id", root, n_buckets=32)
    return bm25_search_indexed(
        root, query_terms=["shuffle", "spark", "window"], k=15)


def _q_ntile(sf_dir: str):
    """Global row_number + NTILE(10) (curriculum tiering) — one Ray-native
    sort, then two metadata-weight task waves (per-block counts → zero-copy
    range append); no row touches the driver
    (pipelines/ordering.py:with_row_number/ntile)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.ordering import ntile_bucket, with_row_number

    numbered = with_row_number(
        _events(sf_dir, ["event_id", "value"]),
        sort_keys=["value", "event_id"], out_col="rn")
    total = numbered.count()

    def tile(batch: pa.Table) -> pa.Table:
        rn = batch.column("rn").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": batch.column("event_id"),
            "rn": batch.column("rn"),
            "tile": pa.array(ntile_bucket(rn - 1, total, 10), pa.int64()),
        })

    rows = numbered.map_batches(tile, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["rn"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "rn": pa.array([r["rn"] for r in rows], pa.int64()),
        "tile": pa.array([r["tile"] for r in rows], pa.int64()),
    })


def _q_rolling_avg(sf_dir: str):
    """Per-user rolling 3-row average in (ts, event_id) order — SQL ROWS
    BETWEEN 2 PRECEDING AND CURRENT ROW; one user-keyed shuffle, oldest-first
    shifted adds (no cumsum cancellation)
    (pipelines/windows.py:rolling_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.windows import rolling_by_key

    out = rolling_by_key(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]),
        "user_id", "ts", "value", window=3, order_tiebreak="event_id")
    rows = out.select_columns(["event_id", "roll_n", "roll_avg"]).take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "roll_n": pa.array([r["roll_n"] for r in rows], pa.int64()),
        "roll_avg": pa.array([_round_away(r["roll_avg"], 6) for r in rows],
                             pa.float64()),
    })


def _q_heavy_hitters(sf_dir: str):
    """Exact frequent items (count ≥ 80) via per-block Misra-Gries summaries
    + an exact candidate-count pass — no full-cardinality shuffle, bounded
    driver state; output counts are exact so the oracle is a plain
    GROUP BY ... HAVING (pipelines/sketches.py:heavy_hitters)."""
    from insurance_pdf_extractor_ray.pipelines.sketches import heavy_hitters

    out = heavy_hitters(_events(sf_dir, ["user_id"]), "user_id",
                        threshold=80, k=4096)
    return pa.table({"value": out.column("value").cast(pa.int64()),
                     "n": out.column("n")})


