"""Query bodies _q_bpe_segment_counts.._q_percent_rank_by_type (mechanical split of __ray_entry__.py)."""

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

__all__ = ['_q_bpe_segment_counts', '_q_event_paths', '_q_activity_gini', '_q_winsorized_value', '_q_burstiness', '_q_conversion_latency', '_q_q13_custdist', '_q_pretrain_prep_bpe', '_q_embedding_outliers', '_q_selfjoin_size', '_q_twap', '_q_personalized_pagerank', '_q_stopword_coverage', '_q_kcore', '_q_weighted_median', '_q_time_in_state', '_q_ks_test', '_q_roc_auc', '_q_calibration', '_q_mi_lang_source', '_q_benford', '_q_changepoint', '_q_csv_source', '_q_jsonl_source', '_q_hybrid_search', '_q_priority_dedup', '_q_longest_streak', '_q_hard_negatives', '_q_nearest_centroid', '_q_span_corruption', '_q_source_overlap', '_q_rfm_segments', '_q_k_anonymity', '_q_knn_ndcg', '_q_padding_efficiency', '_q_stratified_split', '_q_top_quartile_by_lang', '_q_value_band_pairs', '_q_percent_rank_by_type']

def _q_bpe_segment_counts(sf_dir: str):
    """Tokenizer train→apply round trip: learn 8 merges, segment every doc
    with them, count pieces — dictionary-encoded per-batch apply, zero
    shuffles beyond the word count
    (pipelines/tfidf.py:bpe_apply_token_counts)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import (
        bpe_apply_token_counts, bpe_train)

    docs = _documents(sf_dir, ["doc_id", "text"])
    merges = bpe_train(docs, "text", num_merges=8)
    out = bpe_apply_token_counts(docs, "text", "doc_id", merges)
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64()),
        "n_pieces": pa.array([r["n_pieces"] for r in rows], pa.int64()),
    })


def _q_event_paths(sf_dir: str):
    """Top-20 3-step behavioral paths — per-user ordered window join,
    vectorized slice-and-join inside each group, one path-keyed combine
    (pipelines/behavior.py:path_ngrams)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import path_ngrams

    return path_ngrams(
        _events(sf_dir, ["user_id", "ts", "event_type", "event_id"]),
        "user_id", "ts", "event_type", n=3, tiebreak="event_id", top_k=20)


def _q_activity_gini(sf_dir: str):
    """Gini coefficient of per-user event counts — the partition-skew
    health number (pipelines/statagg.py:gini_of_counts)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import gini_of_counts

    out = gini_of_counts(_events(sf_dir, ["user_id"]), "user_id")
    return _round_col(out, "gini", 9)


def _q_winsorized_value(sf_dir: str):
    """Per-type winsorized mean of the value column — exact quantile_cont
    clip bounds then clipped-moment combine
    (pipelines/statagg.py:winsorized_mean_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import (
        winsorized_mean_by_key)

    out = winsorized_mean_by_key(
        _events(sf_dir, ["event_type", "value"]), "event_type", "value")
    out = _round_col(_round_col(out, "q_lo", 9), "q_hi", 9)
    return _round_col(out, "wmean", 6)


def _q_burstiness(sf_dir: str):
    """Per-user Fano factor (var/mean of daily event counts) — burstiness
    screen; map-side (user, day) pre-counts, ONE bounded shuffle, moment
    math over the bounded count table."""
    from ray.data.aggregate import Sum

    ev = _events(sf_dir, ["user_id", "ts"])

    def day_counts(batch: pa.Table) -> pa.Table:
        day = pc.divide(batch.column("ts").cast(pa.int64()),
                        86_400_000_000)
        t = pa.table({"user_id": batch.column("user_id"), "_day": day})
        g = t.group_by(["user_id", "_day"]).aggregate([([], "count_all")])
        return pa.table({"user_id": g.column("user_id"),
                         "_day": g.column("_day"),
                         "_n": g.column("count_all").cast(pa.int64())})

    counts = (ev.map_batches(day_counts, batch_format="pyarrow")
              .groupby(["user_id", "_day"])
              .aggregate(Sum("_n", alias_name="_n"))).take_all()
    counts.sort(key=lambda r: (r["user_id"], r["_day"]))
    agg: dict = {}
    for r in counts:
        a = agg.setdefault(r["user_id"], [0, 0.0, 0.0])
        a[0] += 1
        a[1] += r["_n"]
        a[2] += r["_n"] * r["_n"]
    users = sorted(agg)
    n_days, fano = [], []
    for u in users:
        k, s1, s2 = agg[u]
        if k > 1:
            var = (s2 - s1 * s1 / k) / (k - 1)
            fano.append(var / (s1 / k))
        else:
            fano.append(None)
        n_days.append(k)
    tbl = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "n_days": pa.array(n_days, pa.int64()),
        "fano": pa.array(fano, pa.float64()),
    })
    return _round_col(tbl, "fano", 6)


def _q_conversion_latency(sf_dir: str):
    """First-view→first-purchase latency per user — conditional per-type
    Min partials, ONE keyed combine, integer-µs exact."""
    from ray.data.aggregate import Min

    ev = _events(sf_dir, ["user_id", "ts", "event_type"])

    def firsts(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column("event_type"),
                                  value_set=pa.array(["view", "purchase"])))
        tt = pa.table({
            "user_id": t.column("user_id"),
            "event_type": t.column("event_type"),
            "_ts": t.column("ts").cast(pa.int64()),
        })
        g = tt.group_by(["user_id", "event_type"]).aggregate([("_ts", "min")])
        return g.rename_columns(["user_id", "event_type", "_ts"])

    rows = (ev.map_batches(firsts, batch_format="pyarrow")
            .groupby(["user_id", "event_type"])
            .aggregate(Min("_ts", alias_name="_ts"))).take_all()
    views, buys = {}, {}
    for r in rows:
        (views if r["event_type"] == "view" else buys)[r["user_id"]] = r["_ts"]
    out = sorted((u, buys[u] - views[u]) for u in views
                 if u in buys and buys[u] >= views[u])
    return pa.table({
        "user_id": pa.array([u for u, _ in out], pa.int64()),
        "latency_us": pa.array([l for _, l in out], pa.int64()),
    })


def _q_q13_custdist(sf_dir: str):
    """TPC-H Q13 analog: distribution of customers by order count,
    zero-order customers included — orders pre-count, one left join onto
    the customer key column, tiny histogram combine."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def pre(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_custkey"]).aggregate([([], "count_all")])
        return pa.table({"c_custkey": g.column("o_custkey"),
                         "_n": g.column("count_all").cast(pa.int64())})

    per_cust = (orders.map_batches(pre, batch_format="pyarrow")
                .groupby("c_custkey").aggregate(Sum("_n", alias_name="_n")))
    cust = _read(sf_dir, "customer", ["c_custkey"])
    joined = cust.join(per_cust, join_type="left_outer", on=("c_custkey",),
                       num_partitions=_join_partitions())

    def hist(batch: pa.Table) -> pa.Table:
        n = pc.fill_null(batch.column("_n"), 0)
        t = pa.table({"c_count": n})
        g = t.group_by(["c_count"]).aggregate([([], "count_all")])
        return pa.table({"c_count": g.column("c_count"),
                         "_d": g.column("count_all").cast(pa.int64())})

    rows = (joined.map_batches(hist, batch_format="pyarrow")
            .groupby("c_count").aggregate(Sum("_d", alias_name="custdist"))
            ).take_all()
    rows.sort(key=lambda r: (-r["custdist"], -r["c_count"]))
    return pa.table({
        "c_count": pa.array([r["c_count"] for r in rows], pa.int64()),
        "custdist": pa.array([r["custdist"] for r in rows], pa.int64()),
    })


def _q_pretrain_prep_bpe(sf_dir: str):
    """Pretrain chain v2: gates -> decontaminate -> dedup -> BPE tokenizer
    TRAINED ON THE SURVIVORS -> piece counts -> packing.  The oracle is
    the full v1 CTE chain extended with the unrolled-BPE chain over the
    survivor set — one SQL pipeline verifies the whole composition."""
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
        seq_len=1024, bucket=100, tokenizer="bpe", bpe_merges_n=8)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["doc_id"], r["seq_id"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "seq_id": pa.array([r["seq_id"] for r in rows], pa.int64()),
        "start_tok": pa.array([r["start_tok"] for r in rows], pa.int64()),
        "end_tok": pa.array([r["end_tok"] for r in rows], pa.int64()),
    })


def _q_embedding_outliers(sf_dir: str):
    """Diagonal-covariance Mahalanobis outliers — two zero-shuffle passes,
    every per-dim term int64-quantized BEFORE the across-dim sum (no float
    SUM-order hazard) (pipelines/similarity.py:mahalanobis_outliers)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        mahalanobis_outliers)

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    return mahalanobis_outliers(emb, "embedding", "vec_id", top_k=25)


def _q_selfjoin_size(sf_dir: str):
    """Count-Min inner-product join-size estimation (AGMS-style) vs the
    exact Σc² self-join cardinality — both integer-exact
    (pipelines/sketches.py:count_min_inner_product)."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.pipelines.sketches import (
        count_min_inner_product, count_min_table)

    ds = _events(sf_dir, ["user_id"])
    cm = count_min_table(ds, "user_id", width=512, depth=4)
    est = count_min_inner_product(cm, cm, width=512, depth=4)

    def part(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id"]).aggregate([([], "count_all")])
        return pa.table({"user_id": g.column("user_id"),
                         "_n": g.column("count_all").cast(pa.int64())})

    rows = (ds.map_batches(part, batch_format="pyarrow")
            .groupby("user_id").aggregate(Sum("_n", alias_name="n"))
            ).take_all()
    exact = sum(r["n"] * r["n"] for r in rows)
    total = sum(r["n"] for r in rows)
    return pa.table({
        "n_rows": pa.array([total], pa.int64()),
        "exact": pa.array([exact], pa.int64()),
        "est": pa.array([est], pa.int64()),
    })


def _q_twap(sf_dir: str):
    """Time-weighted average of the value column per user — each
    value×duration term half-rounded to int64 BEFORE the per-user sum
    (value·µs units), so the reduction is order-proof; final division is
    one mirrored float expression."""

    def per_partition(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            z = pa.array([], pa.int64())
            return pa.table({"user_id": z, "span_us": z, "twap_q": z})
        part = part.take(pc.sort_indices(part, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        ts = part.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = part.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64)
        keys_np = part.column("user_id").to_numpy(zero_copy_only=False)
        new_key = np.r_[True, keys_np[1:] != keys_np[:-1]]
        starts = np.flatnonzero(new_key)
        last = np.append(starts[1:] - 1, n - 1)
        # per-term rounding THEN a per-key segment sum (cross-key terms 0)
        dt = np.diff(ts).astype(np.float64)
        terms = v[:-1] * dt
        r = (-np.floor(-terms + 0.5)).astype(np.int64)
        rv = np.append(np.where(~new_key[1:], r, 0), 0)
        q = np.add.reduceat(rv, starts)
        span = ts[last] - ts[starts]
        keep = span > 0
        return pa.table({
            "user_id": part.column("user_id").take(
                pa.array(starts[keep], pa.int64())),
            "span_us": pa.array(span[keep], pa.int64()),
            "twap_q": pa.array(q[keep], pa.int64()),
        })

    from insurance_pdf_extractor_ray.dsutil import keyed_partition_map

    out = keyed_partition_map(
        _events(sf_dir, ["user_id", "ts", "event_id", "value"]),
        "user_id", per_partition)
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    q = np.array([r["twap_q"] for r in rows], np.float64)
    span = np.array([r["span_us"] for r in rows], np.float64)
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "span_us": pa.array([r["span_us"] for r in rows], pa.int64()),
        "twap": pa.array(q / span, pa.float64()),
    })


def _q_personalized_pagerank(sf_dir: str):
    """Personalized PageRank (restart mass on custkey%100==0 seeds) over
    the customer-name similarity graph — same one-join-one-combine rounds,
    seed-concentrated restart vector (pipelines/graph.py:pagerank)."""
    from insurance_pdf_extractor_ray.pipelines.graph import pagerank

    keys = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey"]).column("c_custkey")
    seeds = [int(k) for k in keys.to_pylist() if k % 100 == 0]
    sym = _customer_name_graph(sf_dir)
    ranks = pagerank(sym, n_iter=3, damping=0.85, restart=seeds)
    rows = sorted(ranks.take_all(), key=lambda r: r["id"])
    return pa.table({
        "id": pa.array([r["id"] for r in rows], pa.int64()),
        "rank": pa.array([_round_away(r["rank"], 9) for r in rows],
                         pa.float64()),
    })


def _q_stopword_coverage(sf_dir: str):
    """Per-doc per-language stopword hit counts (integer-exact) — one
    token explode + one is_in per language, zero shuffles
    (pipelines/textpipe.py:stopword_coverage)."""
    from insurance_pdf_extractor_ray.pipelines.textpipe import (
        stopword_coverage)

    out = stopword_coverage(_documents(sf_dir, ["doc_id", "text"]))
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    cols = {"doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64())}
    for l in ("de", "en", "es", "fr"):
        cols[f"sw_{l}"] = pa.array([r[f"sw_{l}"] for r in rows], pa.int64())
    return pa.table(cols)


def _q_kcore(sf_dir: str):
    """k-core (k=4) of the embedding similarity graph by synchronous
    peeling — fixed 6 rounds, per round one tiny node-keyed combine +
    broadcast edge filter (pipelines/graph.py:kcore)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.graph import (
        ip_threshold_graph, kcore)

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).filter(expr="vec_id < 400")
    edges = ip_threshold_graph(emb, "embedding", "vec_id", tau=0.25)
    return kcore(edges, k=4, rounds=6)


def _q_weighted_median(sf_dir: str):
    """Exact lower weighted median per return flag — distributed sort +
    per-(block,key) weight-offset metadata wave + one zero-move pick wave
    (pipelines/statagg.py:weighted_median_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import (
        weighted_median_by_key)

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])

    def cast_w(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("l_quantity"), "l_quantity",
            t.column("l_quantity").cast(pa.int64()))

    out = weighted_median_by_key(
        li.map_batches(cast_w, batch_format="pyarrow"),
        "l_returnflag", "l_extendedprice", "l_quantity")
    return out.rename_columns(["l_returnflag", "wmedian"])


def _q_time_in_state(sf_dir: str):
    """Total dwell time per event type: each event owns the interval until
    the user's next event (last event excluded) — per-user vectorized
    diffs, map-side per-type partials, ONE tiny combine; integer-µs."""
    from ray.data.aggregate import Sum

    def per_partition(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n < 2:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "_d": pa.array([], pa.int64())})
        part = part.take(pc.sort_indices(part, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending"),
            ("event_id", "ascending")]))
        ts = part.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keys_np = part.column("user_id").to_numpy(zero_copy_only=False)
        same_key = keys_np[1:] == keys_np[:-1]
        t = pa.table({"event_type": part.column("event_type").slice(0, n - 1),
                      "_d": pa.array(np.diff(ts), pa.int64())}) \
              .filter(pa.array(same_key))
        if t.num_rows == 0:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "_d": pa.array([], pa.int64())})
        g = t.group_by(["event_type"]).aggregate([("_d", "sum")])
        return g.rename_columns(["event_type", "_d"])

    from insurance_pdf_extractor_ray.dsutil import keyed_partition_map

    out = (keyed_partition_map(
              _events(sf_dir, ["user_id", "ts", "event_id", "event_type"]),
              "user_id", per_partition)
           .groupby("event_type").aggregate(Sum("_d", alias_name="dwell_us")))
    rows = out.take_all()
    rows.sort(key=lambda r: r["event_type"])
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "dwell_us": pa.array([r["dwell_us"] for r in rows], pa.int64()),
    })


def _q_ks_test(sf_dir: str):
    """Exact two-sample KS statistic (view vs purchase value
    distributions) — one distributed sort + metadata count wave + zero-move
    per-block max wave; tie groups evaluate once, after their last row
    (pipelines/statagg.py:ks_two_sample)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import ks_two_sample

    out = ks_two_sample(_events(sf_dir, ["event_type", "value"]),
                        "value", "event_type", "view", "purchase")
    return _round_col(out, "ks_d", 9)


def _q_roc_auc(sf_dir: str):
    """Exact ROC AUC of `value` ranking purchases above other events —
    map-side per-score combine, one distinct-score groupby shuffle, sorted
    metadata wave; ties get the standard half credit
    (pipelines/evalstats.py:roc_auc)."""
    from insurance_pdf_extractor_ray.pipelines.evalstats import roc_auc

    out = roc_auc(_events(sf_dir, ["event_type", "value"]),
                  "value", "event_type", "purchase")
    return _round_col(out, "auc", 9)


def _q_calibration(sf_dir: str):
    """Reliability-diagram bins of p = value/500 vs observed purchase rate
    — algebraic per-bin aggregate, shuffle bounded by bins × blocks
    (pipelines/evalstats.py:calibration_bins).  The predictor transform is
    one IEEE division, bit-identical to the SQL twin so bin assignment at
    boundaries can't diverge."""
    from insurance_pdf_extractor_ray.pipelines.evalstats import calibration_bins

    def add_p(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "p", pc.divide(batch.column("value"), 500.0))

    ev = _events(sf_dir, ["event_type", "value"]).map_batches(
        add_p, batch_format="pyarrow")
    out = calibration_bins(ev, "p", "event_type", "purchase", n_bins=10)
    out = _round_col(out, "mean_p", 9)
    return _round_col(out, "frac_pos", 9)


def _q_mi_lang_source(sf_dir: str):
    """Mutual information / chi-square / Cramer's V between documents.lang
    and documents.source from one distributed contingency count; the
    closed-form chi2 n*(sum o^2/(r*c) - 1) never enumerates empty cells
    (pipelines/evalstats.py:categorical_association)."""
    from insurance_pdf_extractor_ray.pipelines.evalstats import (
        categorical_association,
    )

    out = categorical_association(
        _documents(sf_dir, ["lang", "source"]), "lang", "source")
    out = _round_col(out, "mi_nats", 9)
    out = _round_col(out, "chi2", 6)
    return _round_col(out, "cramers_v", 9)


def _q_benford(sf_dir: str):
    """Benford first-digit audit of o_totalprice — digit taken from the
    integer cents value (round(x*100), repeated integer division), so the
    substr(cast(bigint)) SQL twin is bit-identical; no float log10 in the
    digit path (pipelines/evalstats.py:benford_first_digit)."""
    from insurance_pdf_extractor_ray.pipelines.evalstats import (
        benford_first_digit,
    )

    out = benford_first_digit(
        _read(sf_dir, "orders", ["o_totalprice"]), "o_totalprice")
    out = _round_col(out, "observed_p", 9)
    return _round_col(out, "expected_p", 9)


def _q_changepoint(sf_dir: str):
    """Single change-point detection over the daily event-count series:
    the split minimizing two-segment SSE, computed in closed form from
    prefix sums — distributed day-count shuffle (bounded by days), driver
    scan over the tiny series; same float expression as the SQL twin."""
    from ray.data.aggregate import Sum

    ev = _events(sf_dir, ["ts"])

    def day_counts(batch: pa.Table) -> pa.Table:
        day = pc.divide(batch.column("ts").cast(pa.int64()), 86_400_000_000)
        t = pa.table({"_day": day})
        g = t.group_by(["_day"]).aggregate([([], "count_all")])
        return pa.table({"_day": g.column("_day"),
                         "_n": g.column("count_all").cast(pa.int64())})

    rows = (ev.map_batches(day_counts, batch_format="pyarrow")
            .groupby("_day").aggregate(Sum("_n", alias_name="_n"))
            ).take_all()
    rows.sort(key=lambda r: r["_day"])
    days = np.array([r["_day"] for r in rows], np.int64)
    x = np.array([r["_n"] for r in rows], np.float64)
    m = len(x)
    s1 = np.cumsum(x)
    s2 = np.cumsum(x * x)
    i = np.arange(1, m, dtype=np.float64)  # candidate split after row i
    sse = ((s2[:-1] - s1[:-1] * s1[:-1] * 1.0 / i)
           + ((s2[-1] - s2[:-1])
              - (s1[-1] - s1[:-1]) * (s1[-1] - s1[:-1]) * 1.0 / (m - i)))
    best = int(np.lexsort((days[:-1], sse))[0])
    return pa.table({
        "change_day": pa.array([int(days[best])], pa.int64()),
        "sse": pa.array([_round_away(float(sse[best]), 6)], pa.float64()),
    })


def _q_csv_source(sf_dir: str):
    """CSV source reader exercised end-to-end: orders exported to CSV
    (integer cents — exact through the text format), re-read with
    ``sources.io.read_csv``, aggregated; the oracle computes the same
    stats straight from the parquet view."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.sources.io import read_csv

    n = pq.ParquetFile(os.path.join(sf_dir, "orders.parquet")
                       ).metadata.num_rows
    out_dir = f"/tmp/ipe_csv_src/{n}"
    if not glob.glob(os.path.join(out_dir, "*")):
        os.makedirs(out_dir, exist_ok=True)
        orders = _read(sf_dir, "orders",
                       ["o_orderkey", "o_custkey", "o_totalprice"])

        def to_cents(t: pa.Table) -> pa.Table:
            p = t.column("o_totalprice").to_numpy(zero_copy_only=False)
            cents = (-np.floor(-(p * 100) + 0.5)).astype(np.int64)
            return pa.table({"o_orderkey": t.column("o_orderkey"),
                             "o_custkey": t.column("o_custkey"),
                             "cents": pa.array(cents, pa.int64())})

        orders.map_batches(to_cents, batch_format="pyarrow"
                           ).write_csv(out_dir)
    ds = read_csv(out_dir)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "_n": pa.array([t.num_rows], pa.int64()),
            "_s": pa.array([int(pc.sum(t.column("cents")).as_py() or 0)],
                           pa.int64()),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n_cust = _global_ndistinct(ds, "o_custkey")
    return pa.table({
        "n_orders": pa.array([sum(r["_n"] for r in rows)], pa.int64()),
        "sum_cents": pa.array([sum(r["_s"] for r in rows)], pa.int64()),
        "n_cust": pa.array([n_cust], pa.int64()),
    })


def _q_jsonl_source(sf_dir: str):
    """JSONL source reader roundtrip: events exported to NDJSON (integer
    milli-values), re-read with ``sources.io.read_jsonl``, aggregated."""
    from insurance_pdf_extractor_ray.sources.io import read_jsonl

    n = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")
                       ).metadata.num_rows
    out_dir = f"/tmp/ipe_jsonl_src/{n}"
    if not glob.glob(os.path.join(out_dir, "*")):
        os.makedirs(out_dir, exist_ok=True)
        ev = _events(sf_dir, ["event_id", "user_id", "value", "event_type"])

        def to_milli(t: pa.Table) -> pa.Table:
            v = t.column("value").to_numpy(zero_copy_only=False)
            m = np.where(v >= 0, np.floor(v * 1000 + 0.5),
                         -np.floor(-v * 1000 + 0.5)).astype(np.int64)
            return pa.table({"event_id": t.column("event_id"),
                             "user_id": t.column("user_id"),
                             "milli": pa.array(m, pa.int64()),
                             "event_type": t.column("event_type")})

        ev.map_batches(to_milli, batch_format="pyarrow").write_json(out_dir)
    ds = read_jsonl(out_dir)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "_n": pa.array([t.num_rows], pa.int64()),
            "_s": pa.array([int(pc.sum(t.column("milli")).as_py() or 0)],
                           pa.int64()),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n_types = _global_ndistinct(ds, "event_type")
    return pa.table({
        "n_events": pa.array([sum(r["_n"] for r in rows)], pa.int64()),
        "sum_milli": pa.array([sum(r["_s"] for r in rows)], pa.int64()),
        "n_types": pa.array([n_types], pa.int64()),
    })


def _q_hybrid_search(sf_dir: str):
    """Hybrid retrieval: BM25 lexical top-20 + exact-cosine semantic top-20
    fused by Reciprocal Rank Fusion (1/(60+rank), the standard k=60) —
    both legs are the already-oracle-verified operators; fusion is a tiny
    driver merge (pipelines/tfidf.py:bm25_search,
    pipelines/similarity.py:knn_brute_force)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        knn_brute_force)
    from insurance_pdf_extractor_ray.pipelines.tfidf import bm25_search

    docs = _documents(sf_dir, ["doc_id", "text"])
    lex = bm25_search(docs, "text", "doc_id",
                      ["shuffle", "spark", "window"], k=20)
    lex_ranked = list(enumerate(lex.column("doc_id").to_pylist(), start=1))

    qvec = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).sort_by("vec_id")
    q = np.array([qvec.column("embedding")[0].as_py()], np.float64)
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    sem = knn_brute_force(emb, q, k=20)
    sem_ranked = list(enumerate(sem.column("vec_id").to_pylist(), start=1))

    rrf: dict = {}
    for rank, did in lex_ranked:
        rrf[did] = rrf.get(did, 0.0) + 1.0 / (60 + rank)
    for rank, did in sem_ranked:
        rrf[did] = rrf.get(did, 0.0) + 1.0 / (60 + rank)
    top = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return pa.table({
        "doc_id": pa.array([d for d, _ in top], pa.int64()),
        "rrf": pa.array([_round_away(s, 9) for _, s in top], pa.float64()),
    })


def _q_priority_dedup(sf_dir: str):
    """Mixture-aware exact dedup: among duplicate texts keep the copy from
    the highest-priority source (then min id) — grouped_top_k k=1 over the
    text key with map-side per-batch winners pre-reduced
    (pipelines/rankagg.py:grouped_top_k)."""
    from insurance_pdf_extractor_ray.pipelines.rankagg import grouped_top_k

    docs = _documents(sf_dir, ["doc_id", "text"])

    def add_prio(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column("prio", pa.array(ids % 3, pa.int64()))

    w = grouped_top_k(docs.map_batches(add_prio, batch_format="pyarrow"),
                      "text", order_by=["prio", "doc_id"],
                      descending=[True, False], k=1,
                      columns=["doc_id"])
    rows = sorted(r["doc_id"] for r in w.take_all())
    return pa.table({"doc_id": pa.array(rows, pa.int64())})


def _q_longest_streak(sf_dir: str):
    """Longest run of consecutive active days per user — distinct
    (user, day) map-side pre-reduce, one keyed shuffle, vectorized
    islands detection inside each (bounded) group."""
    from ray.data.aggregate import Sum

    ev = _events(sf_dir, ["user_id", "ts"])

    def day_pairs(batch: pa.Table) -> pa.Table:
        day = pc.divide(batch.column("ts").cast(pa.int64()), 86_400_000_000)
        t = pa.table({"user_id": batch.column("user_id"), "_day": day})
        return t.group_by(["user_id", "_day"]).aggregate([])

    def per_partition(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            z = pa.array([], pa.int64())
            return pa.table({"user_id": z, "n_days": z, "longest_streak": z})
        part = part.take(pc.sort_indices(part, sort_keys=[
            ("user_id", "ascending"), ("_day", "ascending")]))
        k = part.column("user_id").to_numpy(zero_copy_only=False)
        d = part.column("_day").to_numpy(zero_copy_only=False)
        # global (user, day) dedup (map-side dedup is per batch only)
        keep = np.r_[True, (k[1:] != k[:-1]) | (d[1:] != d[:-1])]
        sel = np.flatnonzero(keep)
        k, d = k[sel], d[sel]
        m = len(k)
        new_key = np.r_[True, k[1:] != k[:-1]]
        starts = np.flatnonzero(new_key)
        n_days = np.diff(np.append(starts, m))
        # streak islands: new key or a calendar gap
        brk = new_key | np.r_[True, np.diff(d) != 1]
        isl_starts = np.flatnonzero(brk)
        isl_len = np.diff(np.append(isl_starts, m))
        key_isl_starts = np.flatnonzero(new_key[isl_starts])
        longest = np.maximum.reduceat(isl_len, key_isl_starts)
        return pa.table({
            "user_id": part.column("user_id").take(
                pa.array(sel[starts], pa.int64())),
            "n_days": pa.array(n_days, pa.int64()),
            "longest_streak": pa.array(longest, pa.int64()),
        })

    from insurance_pdf_extractor_ray.dsutil import keyed_partition_map

    out = keyed_partition_map(
        ev.map_batches(day_pairs, batch_format="pyarrow"),
        "user_id", per_partition)
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "n_days": pa.array([r["n_days"] for r in rows], pa.int64()),
        "longest_streak": pa.array([r["longest_streak"] for r in rows],
                                   pa.int64()),
    })


def _q_hard_negatives(sf_dir: str):
    """Hard-negative mining: per anchor (first 3 vecs by id), exact cosine
    top-5 among DIFFERENT-label vectors — broadcast anchors, per-batch
    masked top-k, tiny driver merge (pipelines/similarity.py:hard_negatives)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import hard_negatives

    path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(path, columns=["vec_id", "embedding", "label"])
    order = pc.sort_indices(head.column("vec_id"))[:3]
    q_ids = head.column("vec_id").take(order).to_pylist()
    q_labels = head.column("label").take(order).to_pylist()
    qmat = np.asarray(head.column("embedding").take(order).to_pylist(),
                      dtype=np.float64)
    ds = ray.data.read_parquet(path)
    out = hard_negatives(ds, qmat, q_ids, q_labels, k=5, batch_size=4096)
    return pa.table({
        "query_id": pa.array([q_ids[q] for q in
                              out.column("query_id").to_pylist()], pa.int64()),
        "vec_id": out.column("vec_id"),
        "score": pc.round(out.column("score"), ndigits=6),
    })


def _q_nearest_centroid(sf_dir: str):
    """Nearest-centroid eval confusion matrix — integer-exact per-label
    quantized centroid sums (order-free), cosine argmax assignment,
    all-integer output (pipelines/similarity.py:nearest_centroid_confusion)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        nearest_centroid_confusion)

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["embedding", "label"])
    return nearest_centroid_confusion(ds)


def _q_span_corruption(sf_dir: str):
    """T5 span-corruption planning stats per source — all-integer sums
    from one zero-shuffle vectorized pass + a 20-row groupby
    (pipelines/pretrain.py:span_corruption_stats)."""
    from insurance_pdf_extractor_ray.pipelines.pretrain import (
        span_corruption_stats)

    out = span_corruption_stats(_documents(sf_dir, ["doc_id", "text",
                                                    "source"]))
    rows = out.take_all()
    rows.sort(key=lambda r: r["source"])
    cols = ["n_docs", "sum_input_tokens", "sum_target_tokens", "sum_spans",
            "seqs"]
    t = {"source": pa.array([r["source"] for r in rows], pa.string())}
    for c in cols:
        t[c] = pa.array([r[c] for r in rows], pa.int64())
    return pa.table(t)


def _q_source_overlap(sf_dir: str):
    """Cross-source k-word-window overlap matrix — two aggregate shuffles
    over the distinct (window, source) table, bitmask pair expansion,
    group-pair-sized combine (pipelines/substrdedup.py:source_overlap_matrix)."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        source_overlap_matrix)

    return source_overlap_matrix(
        _documents(sf_dir, ["text", "source"]), "text", "source", k=3)


def _q_rfm_segments(sf_dir: str):
    """RFM quintile segmentation — one user-grain shuffle + three ntile
    sort waves, all-integer output (pipelines/behavior.py:rfm_segments)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import rfm_segments

    out = rfm_segments(_events(sf_dir, ["user_id", "ts", "value"]), k=5)
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    cols = ["recency_days", "frequency", "m_cents", "r_score", "f_score",
            "m_score", "rfm"]
    t = {"user_id": pa.array([r["user_id"] for r in rows], pa.int64())}
    for c in cols:
        t[c] = pa.array([r[c] for r in rows], pa.int64())
    return pa.table(t)


def _q_k_anonymity(sf_dir: str):
    """k-anonymity audit over (lang, source) quasi-identifiers — one keyed
    shuffle to class grain, block-sized driver combine
    (pipelines/profile.py:k_anonymity_stats)."""
    from insurance_pdf_extractor_ray.pipelines.profile import k_anonymity_stats

    return k_anonymity_stats(_documents(sf_dir, ["lang", "source"]),
                             ["lang", "source"], k=5)


def _q_knn_ndcg(sf_dir: str):
    """NDCG@10 of exact cosine retrieval, relevance = same label — the
    embedding-quality eval (pipelines/similarity.py:knn_label_ndcg)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import knn_label_ndcg

    path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(path, columns=["vec_id", "embedding", "label"])
    order = pc.sort_indices(head.column("vec_id"))[:10]
    q_ids = head.column("vec_id").take(order).to_pylist()
    q_labels = head.column("label").take(order).to_pylist()
    qmat = np.asarray(head.column("embedding").take(order).to_pylist(),
                      dtype=np.float64)
    ds = ray.data.read_parquet(path)
    counts = {r["label"]: r["count()"] for r in
              ds.groupby("label").count().take_all()}
    out = knn_label_ndcg(ds, qmat, q_ids, q_labels, counts, k=10)
    return pa.table({
        "query_id": pa.array([q_ids[q] for q in
                              out.column("query_id").to_pylist()], pa.int64()),
        "ndcg": pc.round(out.column("ndcg"), ndigits=6),
    })


def _q_padding_efficiency(sf_dir: str):
    """Length-bucketed padding-waste plan — zero-shuffle partials + a
    bucket-sized groupby (pipelines/packing.py:padding_efficiency)."""
    from insurance_pdf_extractor_ray.pipelines.packing import padding_efficiency

    out = padding_efficiency(_documents(sf_dir, ["text"]), bucket=16,
                             max_len=512)
    rows = out.take_all()
    rows.sort(key=lambda r: r["bucket_len"])
    return pa.table({
        "bucket_len": pa.array([r["bucket_len"] for r in rows], pa.int64()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
        "sum_tokens": pa.array([r["sum_tokens"] for r in rows], pa.int64()),
        "sum_padding": pa.array([r["sum_padding"] for r in rows],
                                pa.int64()),
    })


def _q_stratified_split(sf_dir: str):
    """Exact per-stratum 80/10/10 split — grouped row-number metadata wave
    (one sort + two metadata task waves), integer rank thresholds
    (pipelines/ordering.py:grouped_row_number)."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.pipelines.ordering import (
        grouped_row_number)

    ds = grouped_row_number(_documents(sf_dir, ["doc_id", "lang"]),
                            ["lang"], ["doc_id"], out_col="_rn",
                            total_col="_n")

    def assign(batch: pa.Table) -> pa.Table:
        rn = batch.column("_rn").to_numpy(zero_copy_only=False)
        n = batch.column("_n").to_numpy(zero_copy_only=False)
        split = np.where(rn * 10 < n * 8, "train",
                         np.where(rn * 10 < n * 9, "val", "test"))
        return pa.table({"lang": batch.column("lang"),
                         "split": pa.array(split, pa.string()),
                         "doc_id": batch.column("doc_id")})

    out = (ds.map_batches(assign, batch_format="pyarrow")
           .groupby(["lang", "split"]).aggregate(
               Count(alias_name="n_docs"),
               Sum("doc_id", alias_name="id_sum")))
    rows = out.take_all()
    rows.sort(key=lambda r: (r["lang"], r["split"]))
    return pa.table({
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "split": pa.array([r["split"] for r in rows], pa.string()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
        "id_sum": pa.array([r["id_sum"] for r in rows], pa.int64()),
    })


def _q_top_quartile_by_lang(sf_dir: str):
    """Per-stratum percentile gate: keep each lang's top 25% docs by
    n_chars (ties broken by doc_id) — grouped_row_number + integer rank
    threshold, then a lang-sized aggregate."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.pipelines.ordering import (
        grouped_row_number)

    ds = grouped_row_number(
        _documents(sf_dir, ["doc_id", "lang", "n_chars"]),
        ["lang"], ["n_chars", "doc_id"], descending=[True, False],
        out_col="_rn", total_col="_n")
    kept = ds.map_batches(
        lambda t: t.filter(pc.less(
            pc.multiply(t.column("_rn"), pa.scalar(4, pa.int64())),
            t.column("_n"))),
        batch_format="pyarrow")
    out = kept.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("doc_id", alias_name="id_sum"),
        Sum("n_chars", alias_name="chars_sum"))
    rows = out.take_all()
    rows.sort(key=lambda r: r["lang"])
    return pa.table({
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
        "id_sum": pa.array([r["id_sum"] for r in rows], pa.int64()),
        "chars_sum": pa.array([r["chars_sum"] for r in rows], pa.int64()),
    })


def _q_value_band_pairs(sf_dir: str):
    """Scalar band self-join: event pairs within 1 milli-unit of value —
    banded-bucket equi-join, integer-exact |diff| filter
    (pipelines/joins.py:scalar_band_join)."""
    from insurance_pdf_extractor_ray.pipelines.joins import scalar_band_join

    ev = _events(sf_dir, ["event_id", "value"])
    out = scalar_band_join(ev, ev, "value", "event_id", eps_q=1,
                           quant=1000.0)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["id_a"], r["id_b"]))
    return pa.table({
        "id_a": pa.array([r["id_a"] for r in rows], pa.int64()),
        "id_b": pa.array([r["id_b"] for r in rows], pa.int64()),
        "q_a": pa.array([r["q_a"] for r in rows], pa.int64()),
        "q_b": pa.array([r["q_b"] for r in rows], pa.int64()),
    })


def _q_percent_rank_by_type(sf_dir: str):
    """PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value,
    event_id) — grouped row-number metadata wave; rank ratio rounded at 9
    (pipelines/ordering.py:grouped_row_number)."""
    from insurance_pdf_extractor_ray.pipelines.ordering import (
        grouped_row_number)

    ds = grouped_row_number(
        _events(sf_dir, ["event_id", "event_type", "value"]),
        ["event_type"], ["value", "event_id"], out_col="_rn",
        total_col="_n")

    def pct(batch: pa.Table) -> pa.Table:
        rn = batch.column("_rn").to_numpy(zero_copy_only=False)
        n = batch.column("_n").to_numpy(zero_copy_only=False)
        p = np.where(n > 1, rn / np.maximum(n - 1, 1), 0.0)
        m = 1e9
        p = np.floor(p * m + 0.5) / m  # values in [0,1]: half-away == half-up
        return pa.table({"event_id": batch.column("event_id"),
                         "pct_rank": pa.array(p, pa.float64())})

    rows = ds.map_batches(pct, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "pct_rank": pa.array([r["pct_rank"] for r in rows], pa.float64()),
    })


