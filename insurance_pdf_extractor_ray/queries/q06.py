"""Query bodies _q_q10_returned_revenue.._q_revenue_share_rank (mechanical split of __ray_entry__.py)."""

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

__all__ = ['_q_q10_returned_revenue', '_q_q18_big_orders', '_q_daily_autocorr', '_q_first_touch_revenue', '_q_pmi_bigrams', '_q_welch_ttest_value', '_q_dup_cluster_sizes', '_q_logprob_deciles_by_source', '_q_containment_pairs', '_q_set_jaccard_pairs', '_q_bfs_hops_embeddings', '_q_pareto_front_orders', '_q_daily_ohlc', '_q_events_fingerprint', '_q_user_churn_daily', '_q_pq_codes', '_q_weekday_residuals', '_q_proportional_budget_sample', '_q_mannwhitney_value', '_q_third_purchase_ts', '_q_interval_coverage', '_q_top_dims_per_vector', '_q_reciprocal_topk_pairs', '_q_lang_majority_mismatch', '_q_dup_window_profile', '_q_bounce_rate_daily', '_q_acf_daily', '_q_lorenz_chars', '_q_markov_entropy_rate', '_q_q6_forecast_revenue', '_q_q14_promo_share', '_q_heaps_growth', '_q_q19_band_revenue', '_q_order_concentration_gini', '_q_revenue_share_rank']

def _q_q10_returned_revenue(sf_dir: str):
    """TPC-H Q10 analog: top-20 customers by revenue from RETURNED items in
    one order-date quarter.  Shape: aggregate-below-join (returned-line
    revenue pre-reduced per orderkey), ONE big-big hash join, custkey
    groupby, global sort-limit; the 20 winners' names resolved by a tiny
    driver-side lookup against a key-filtered customer read (never a full
    dimension broadcast)."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]) \
        .filter(expr="l_returnflag == 'R'")
    li_rev = drop_empty_blocks(
        li.map_batches(lambda b: _rev_i4(b, "l_orderkey"),
                       batch_format="pyarrow")
          .groupby("l_orderkey").aggregate(Sum("rev_i4", alias_name="rev_i4")),
        empty_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("rev_i4", pa.int64())]))

    lo = int(pd.Timestamp("1996-01-01").value // 1000)
    hi = int(pd.Timestamp("1996-04-01").value // 1000)

    def date_window(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64())
        keep = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    orders = drop_empty_blocks(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(date_window, batch_format="pyarrow"),
        empty_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]))
    j = shuffle_join(li_rev, orders, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=_join_partitions())
    top = (j.groupby("o_custkey")
            .aggregate(Sum("rev_i4", alias_name="revenue_i4"))
            .sort(["revenue_i4", "o_custkey"], descending=[True, False])
            .limit(20).take_all())
    keys = [r["o_custkey"] for r in top]

    key_arr = pa.array(sorted(keys), pa.int64())
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey"]) \
        .map_batches(
            lambda b: b.filter(pc.is_in(b.column("c_custkey"),
                                        value_set=key_arr)),
            batch_format="pyarrow").take_all()
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation",
                             ["n_nationkey", "n_name"]).take_all()}
    info = {r["c_custkey"]: (r["c_name"], nation[r["c_nationkey"]])
            for r in cust}
    return pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "c_name": pa.array([info[k][0] for k in keys], pa.string()),
        "n_name": pa.array([info[k][1] for k in keys], pa.string()),
        "revenue_i4": pa.array([r["revenue_i4"] for r in top], pa.int64()),
    })


def _q_q18_big_orders(sf_dir: str):
    """TPC-H Q18 analog: orders whose total quantity exceeds 250 — HAVING
    pushed below the join (per-orderkey integer-quantity pre-aggregate,
    filter, then ONE hash join against orders), top-100 by quantity."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join

    def qty_i2(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "qty_i2": pa.array(np.floor(q * 100.0 + 0.5).astype(np.int64),
                               pa.int64()),
        })

    big = drop_empty_blocks(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(qty_i2, batch_format="pyarrow")
        .groupby("l_orderkey").aggregate(Sum("qty_i2", alias_name="qty_i2"))
        .filter(expr="qty_i2 > 25000"),
        empty_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("qty_i2", pa.int64())]))

    def tp_i2(b: pa.Table) -> pa.Table:
        t = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_custkey": b.column("o_custkey"),
            "totalprice_i2": pa.array(
                np.floor(t * 100.0 + 0.5).astype(np.int64), pa.int64()),
        })

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"]) \
        .map_batches(tp_i2, batch_format="pyarrow")
    j = shuffle_join(big, orders, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=_join_partitions())
    rows = (j.sort(["qty_i2", "l_orderkey"], descending=[True, False])
             .limit(100).take_all())
    return pa.table({
        "o_orderkey": pa.array([r["l_orderkey"] for r in rows], pa.int64()),
        "o_custkey": pa.array([r["o_custkey"] for r in rows], pa.int64()),
        "totalprice_i2": pa.array([r["totalprice_i2"] for r in rows],
                                  pa.int64()),
        "qty_i2": pa.array([r["qty_i2"] for r in rows], pa.int64()),
    })


def _q_daily_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the daily event-count series — day-keyed
    count shuffle (bounded by distinct days), exact integer moment sums on
    the day table, closed-form Pearson r mirrored operation-for-operation
    by the oracle SQL."""
    from ray.data.aggregate import Sum

    def day_part(b: pa.Table) -> pa.Table:
        d = pc.divide(b.column("ts").cast(pa.int64()), 86_400_000_000)
        t = pa.table({"day": d,
                      "_n": pa.array(np.ones(b.num_rows, dtype=np.int64))})
        g = t.group_by("day").aggregate([("_n", "sum")])
        return g.rename_columns(["day", "_n"])

    rows = (_events(sf_dir, ["ts"])
            .map_batches(day_part, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("_n", alias_name="n"))
            .take_all())
    rows.sort(key=lambda r: r["day"])
    ns = [int(r["n"]) for r in rows]
    x, y = ns[1:], ns[:-1]          # (n_t, n_{t-1}) over consecutive rows
    k = len(x)
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    syy = sum(v * v for v in y)
    sxy = sum(a * b for a, b in zip(x, y))
    import math
    den = math.sqrt(float(k * sxx - sx * sx) * float(k * syy - sy * sy))
    r = float(k * sxy - sx * sy) / den
    return pa.table({"autocorr_lag1": pa.array([_round_away(r, 9)],
                                               pa.float64())})


def _q_first_touch_revenue(sf_dir: str):
    """First-touch attribution: each purchase's value credited to the FIRST
    event type the user ever produced (ts, event_id total order) — grouped
    top-1 per user, ONE user-keyed hash join, tiny type-keyed combine."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join
    from insurance_pdf_extractor_ray.pipelines.rankagg import grouped_top_k

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])
    firsts = grouped_top_k(
        ev.select_columns(["user_id", "ts", "event_id", "event_type"]),
        "user_id", ["ts", "event_id"], [False, False], k=1)

    def first_cols(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "first_type": b.column("event_type")})

    firsts = drop_empty_blocks(
        firsts.map_batches(first_cols, batch_format="pyarrow"),
        empty_schema=pa.schema([("user_id", pa.int64()),
                                ("first_type", pa.string())]))

    def pvals(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "val_i2": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64),
                               pa.int64()),
        })

    purchases = drop_empty_blocks(
        ev.filter(expr="event_type == 'purchase'")
          .map_batches(pvals, batch_format="pyarrow"),
        empty_schema=pa.schema([("user_id", pa.int64()),
                                ("val_i2", pa.int64())]))
    j = shuffle_join(purchases, firsts, on="user_id", right_on="user_id",
                     num_partitions=_join_partitions())
    agg = j.groupby("first_type").aggregate(
        Count(alias_name="n_purchases"),
        Sum("val_i2", alias_name="revenue_i2"))
    rows = sorted(agg.take_all(), key=lambda r: r["first_type"])
    return pa.table({
        "first_type": pa.array([r["first_type"] for r in rows], pa.string()),
        "n_purchases": pa.array([r["n_purchases"] for r in rows], pa.int64()),
        "revenue_i2": pa.array([r["revenue_i2"] for r in rows], pa.int64()),
    })


def _q_pmi_bigrams(sf_dir: str):
    """Collocation mining: top-50 word bigrams by pointwise mutual
    information among bigrams with corpus count >= 20 — map-side distinct
    n-gram pre-counts, vocabulary-bounded combines, driver math only on the
    qualifying-bigram table (min-count-bounded)."""
    import math

    from insurance_pdf_extractor_ray.pipelines.tfidf import (
        ngram_counts,
        vocab_counts,
    )

    docs = _documents(sf_dir, ["doc_id", "text"])
    big_all = ngram_counts(docs, "text", "doc_id", n=2, k=None).materialize()
    n_b = big_all.sum("n")
    big = big_all.filter(expr="n >= 20").take_all()

    uni_all = vocab_counts(docs, "text", "doc_id", k=None).materialize()
    n_u = uni_all.sum("n")
    need = set()
    for r in big:
        a, b = r["ngram"].split(" ")
        need.add(a)
        need.add(b)

    def keep_needed(t: pa.Table, need_ref) -> pa.Table:
        import ray as _ray
        toks = _ray.get(need_ref)
        return t.filter(pc.is_in(t.column("token"),
                                 value_set=pa.array(sorted(toks))))

    import ray as _ray
    need_ref = _ray.put(need)
    uni = {r["token"]: int(r["n"]) for r in uni_all.map_batches(
        keep_needed, fn_args=[need_ref], batch_format="pyarrow").take_all()}

    out = []
    for r in big:
        a, b = r["ngram"].split(" ")
        n_ab = int(r["n"])
        num = float(n_ab) * float(n_u) * float(n_u)
        den = float(n_b) * float(uni[a]) * float(uni[b])
        out.append((r["ngram"], n_ab, _round_away(math.log(num / den), 9)))
    out.sort(key=lambda t: (-t[2], t[0]))
    out = out[:50]
    return pa.table({
        "bigram": pa.array([t[0] for t in out], pa.string()),
        "n_ab": pa.array([t[1] for t in out], pa.int64()),
        "pmi": pa.array([t[2] for t in out], pa.float64()),
    })


def _q_welch_ttest_value(sf_dir: str):
    """Welch two-sample t-test (purchase vs view event values) from
    integer-quantized moment sums — per-batch (n, Σq, Σq²) partials in
    exact int64, ONE two-row combine, closed-form t and Welch–Satterthwaite
    df mirrored by the oracle SQL's arithmetic."""
    import math

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        q = np.floor(v * 1000.0 + 0.5).astype(np.int64)
        t = pa.table({
            "grp": b.column("event_type"),
            "_n": pa.array(np.ones(len(q), dtype=np.int64)),
            "_s": pa.array(q), "_ss": pa.array(q * q),
        })
        g = t.group_by("grp").aggregate([("_n", "sum"), ("_s", "sum"),
                                         ("_ss", "sum")])
        return g.rename_columns(["grp", "_n", "_s", "_ss"])

    agg = (_events(sf_dir, ["event_type", "value"])
           .filter(expr="event_type == 'purchase' or event_type == 'view'")
           .map_batches(partial, batch_format="pyarrow")
           .groupby("grp")
           .aggregate(Sum("_n", alias_name="n"), Sum("_s", alias_name="s"),
                      Sum("_ss", alias_name="ss")))
    stats = {r["grp"]: r for r in agg.take_all()}

    def mv(r):
        n = int(r["n"])
        m = float(r["s"]) / n / 1000.0
        v = (float(r["ss"]) - float(r["s"]) * float(r["s"]) / n) \
            / (n - 1) / 1000000.0
        return n, m, v

    n1, m1, v1 = mv(stats["purchase"])
    n2, m2, v2 = mv(stats["view"])
    se2 = v1 / n1 + v2 / n2
    t_stat = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                      + (v2 / n2) * (v2 / n2) / (n2 - 1))
    return pa.table({
        "n_purchase": pa.array([n1], pa.int64()),
        "n_view": pa.array([n2], pa.int64()),
        "mean_diff": pa.array([_round_away(m1 - m2, 9)], pa.float64()),
        "t_stat": pa.array([_round_away(t_stat, 9)], pa.float64()),
        "df": pa.array([_round_away(df, 9)], pa.float64()),
    })


def _q_dup_cluster_sizes(sf_dir: str):
    """Duplicate-cluster size histogram (corpus-duplication audit): cluster
    docs by identical text, histogram the cluster sizes — map-side text-hash
    pre-count, ONE hash-keyed combine, size-bounded final histogram.  Hash
    identity as in exact_dedup (collision odds documented there); the oracle
    groups by the full text."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.functions.hashing import (
        durable_hash64_column)

    def partial(b: pa.Table) -> pa.Table:
        h = durable_hash64_column(b.column("text"))
        t = pa.table({"_h": h,
                      "_n": pa.array(np.ones(b.num_rows, dtype=np.int64))})
        g = t.group_by("_h").aggregate([("_n", "sum")])
        return g.rename_columns(["_h", "_n"])

    sizes = (_documents(sf_dir, ["doc_id", "text"])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("_h").aggregate(Sum("_n", alias_name="cluster_size")))
    hist = sizes.groupby("cluster_size").aggregate(
        Count(alias_name="n_clusters"))
    rows = sorted(hist.take_all(), key=lambda r: r["cluster_size"])
    return pa.table({
        "cluster_size": pa.array([r["cluster_size"] for r in rows],
                                 pa.int64()),
        "n_clusters": pa.array([r["n_clusters"] for r in rows], pa.int64()),
    })


def _q_logprob_deciles_by_source(sf_dir: str):
    """Perplexity-decile mixing audit: per-token unigram-LM score per doc
    (integer micro-nats), global NTILE(10) sort wave, doc-keyed join back to
    the source column, (source × decile) count combine — the
    quality-curriculum sharding signal."""
    from ray.data.aggregate import Count

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join
    from insurance_pdf_extractor_ray.pipelines.ordering import ntile
    from insurance_pdf_extractor_ray.pipelines.tfidf import unigram_logprob

    lp = unigram_logprob(_documents(sf_dir, ["doc_id", "text"]),
                         "text", "doc_id")

    def score(b: pa.Table) -> pa.Table:
        m = b.column("logprob_micro").to_numpy(zero_copy_only=False)
        n = b.column("n_tokens").to_numpy(zero_copy_only=False)
        s = np.floor(m * 1000.0 / n + 0.5).astype(np.int64)
        return pa.table({"doc_id": b.column("doc_id"),
                         "score": pa.array(s, pa.int64())})

    scored = lp.map_batches(score, batch_format="pyarrow")
    tiled = ntile(scored, ["score", "doc_id"], 10, out_col="decile")
    src = _documents(sf_dir, ["doc_id", "source"])
    j = shuffle_join(
        drop_empty_blocks(tiled.select_columns(["doc_id", "decile"]),
                          empty_schema=pa.schema([("doc_id", pa.int64()),
                                                  ("decile", pa.int64())])),
        src, on="doc_id", num_partitions=_join_partitions())
    agg = j.groupby(["source", "decile"]).aggregate(
        Count(alias_name="n_docs"))
    rows = sorted(agg.take_all(), key=lambda r: (r["source"], r["decile"]))
    return pa.table({
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "decile": pa.array([r["decile"] for r in rows], pa.int64()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
    })


def _q_containment_pairs(sf_dir: str):
    """Rare-window containment pairs (near-superset / quotation detection)
    — pipelines/substrdedup.py:containment_pairs; rarity caps the pair
    fan-out at C(rare_max,2) per window; integer-exact ratio predicate."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        containment_pairs)

    out = containment_pairs(_documents(sf_dir, ["doc_id", "text"]),
                            "text", "doc_id", k=3, rare_max=8,
                            ratio_num=1, ratio_den=4)
    rows = sorted(out.take_all(), key=lambda r: (r["id_a"], r["id_b"]))
    return pa.table({
        "id_a": pa.array([r["id_a"] for r in rows], pa.int64()),
        "id_b": pa.array([r["id_b"] for r in rows], pa.int64()),
        "shared": pa.array([r["shared"] for r in rows], pa.int64()),
        "min_windows": pa.array([r["min_windows"] for r in rows],
                                pa.int64()),
    })


def _q_set_jaccard_pairs(sf_dir: str):
    """EXACT set-similarity join (Jaccard >= 0.5 over distinct 5-word
    shingle sets) via prefix filtering (SSJoin / Vernica et al. SIGMOD'10)
    — pipelines/substrdedup.py:set_similarity_pairs.  Only prefix shingles
    enter the candidate shuffle; verification is per-candidate (the output
    lower bound)."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        set_similarity_pairs)

    out = set_similarity_pairs(_documents(sf_dir, ["doc_id", "text"]),
                               "text", "doc_id", k=5, tau_num=1, tau_den=2)
    rows = sorted(out.take_all(), key=lambda r: (r["id_a"], r["id_b"]))
    return pa.table({
        "id_a": pa.array([r["id_a"] for r in rows], pa.int64()),
        "id_b": pa.array([r["id_b"] for r in rows], pa.int64()),
        "shared": pa.array([r["shared"] for r in rows], pa.int64()),
        "union_size": pa.array([r["union_size"] for r in rows], pa.int64()),
    })


def _q_bfs_hops_embeddings(sf_dir: str):
    """Minimum-hop BFS labels from seed vertices over the integer-exact
    similarity graph — per round ONE zero-shuffle edge scan against the
    broadcast frontier (pipelines/graph.py:bfs_hops); oracle is a real
    WITH RECURSIVE re-derivation."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.graph import (
        bfs_hops,
        ip_threshold_graph,
    )

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).filter(expr="vec_id < 400")
    edges = ip_threshold_graph(emb, "embedding", "vec_id", tau=0.25)
    return bfs_hops(edges, seeds=range(5), max_hops=4)


def _q_pareto_front_orders(sf_dir: str):
    """Distributed 2-D skyline (Pareto front) of DISTINCT
    (totalprice, order-day) points — per-block vectorized local skyline
    (sort + strict running-max scan), tiny union of local fronts, final
    scan on the driver (front size << data; block-local fronts are the
    classic distributed-skyline reduction)."""

    def local_front(b: pa.Table) -> pa.Table:
        t = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        tp = np.floor(t * 100.0 + 0.5).astype(np.int64)
        dt = (b.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000)
        tp2, dt2 = _skyline_2d(tp, dt)
        return pa.table({"tp": pa.array(tp2, pa.int64()),
                         "dt": pa.array(dt2, pa.int64())})

    rows = (_read(sf_dir, "orders", ["o_totalprice", "o_orderdate"])
            .map_batches(local_front, batch_format="pyarrow").take_all())
    tp = np.array([r["tp"] for r in rows], np.int64)
    dt = np.array([r["dt"] for r in rows], np.int64)
    tp, dt = _skyline_2d(tp, dt)
    return pa.table({"totalprice_i2": pa.array(tp, pa.int64()),
                     "order_day": pa.array(dt, pa.int64())})


def _q_daily_ohlc(sf_dir: str):
    """Daily OHLC bars over event values — selection-based open/close
    (argmin/argmax partials under the (ts, event_id) total order: no float
    reduction-order hazard), one bar-sized combine
    (pipelines/statagg.py:ohlc_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import ohlc_by_key

    def prep(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64())
        return pa.table({
            "day": pc.divide(ts, 86_400_000_000),
            "ts_us": ts,
            "event_id": b.column("event_id"),
            "value": b.column("value"),
        })

    ds = _events(sf_dir, ["event_id", "ts", "value"]) \
        .map_batches(prep, batch_format="pyarrow")
    out = ohlc_by_key(ds, "day", "ts_us", "event_id", "value",
                      vol_scale=1000)
    rows = sorted(out.take_all(), key=lambda r: r["day"])
    return pa.table({
        "day": pa.array([r["day"] for r in rows], pa.int64()),
        "open": pa.array([r["open"] for r in rows], pa.float64()),
        "high": pa.array([r["high"] for r in rows], pa.float64()),
        "low": pa.array([r["low"] for r in rows], pa.float64()),
        "close": pa.array([r["close"] for r in rows], pa.float64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "vol_q": pa.array([r["vol_q"] for r in rows], pa.int64()),
    })


def _q_events_fingerprint(sf_dir: str):
    """Order-independent 64-bit table digest (anti-entropy / replica
    comparison) — commutative mod-2⁶⁴ dot product, one vectorized
    wraparound pass per batch (pipelines/profile.py:table_fingerprint).
    The oracle recomputes the same digest in HUGEINT; proven layout-proof
    by the repartition test."""
    from insurance_pdf_extractor_ray.pipelines.profile import (
        table_fingerprint)

    def prep(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": b.column("event_id"),
            "qv": pa.array(np.floor(v * 1000.0 + 0.5).astype(np.int64),
                           pa.int64()),
            "user_id": b.column("user_id"),
        })

    ds = _events(sf_dir, ["event_id", "user_id", "value"]) \
        .map_batches(prep, batch_format="pyarrow")
    hexd = table_fingerprint(ds, ["event_id", "qv", "user_id"])
    d = int(hexd, 16)
    return pa.table({
        "digest_hi": pa.array([d >> 32], pa.int64()),
        "digest_lo": pa.array([d & 0xFFFFFFFF], pa.int64()),
    })


def _q_user_churn_daily(sf_dir: str):
    """Day-over-day user churn (retained / new / churned per day) — distinct
    (day, user) pre-reduce, self-alignment by a +1-day shifted tagged union
    (flag-sum 1=new, 2=churned, 3=retained), ONE (day,user)-keyed combine,
    day-sized final counts.  No self-join: the shift IS the join."""
    from ray.data.aggregate import Sum

    def tag(b: pa.Table) -> pa.Table:
        d = pc.divide(b.column("ts").cast(pa.int64()), 86_400_000_000) \
            .to_numpy(zero_copy_only=False)
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        # distinct (day, user) within batch
        order = np.lexsort((u, d))
        d, u = d[order], u[order]
        first = np.ones(len(d), dtype=bool)
        first[1:] = (d[1:] != d[:-1]) | (u[1:] != u[:-1])
        d, u = d[first], u[first]
        # presence BITS combined by Max (a (day,user) pair may recur across
        # batches — Sum of flags would double-count; Max is the OR)
        return pa.table({
            "day": pa.array(np.concatenate([d, d + 1]), pa.int64()),
            "user_id": pa.array(np.concatenate([u, u]), pa.int64()),
            "_t": pa.array(np.concatenate(
                [np.ones(len(d), np.int64),
                 np.zeros(len(d), np.int64)]), pa.int64()),
            "_y": pa.array(np.concatenate(
                [np.zeros(len(d), np.int64),
                 np.ones(len(d), np.int64)]), pa.int64()),
        })

    from ray.data.aggregate import Max
    g = (_events(sf_dir, ["ts", "user_id"])
         .map_batches(tag, batch_format="pyarrow")
         .groupby(["day", "user_id"]).aggregate(
             Max("_t", alias_name="t"), Max("_y", alias_name="y")))

    def day_counts(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy(zero_copy_only=False)
        s = (2 * b.column("y").to_numpy(zero_copy_only=False)
             + b.column("t").to_numpy(zero_copy_only=False))
        t = pa.table({
            "day": pa.array(d, pa.int64()),
            "_r": pa.array((s == 3).astype(np.int64)),
            "_n": pa.array((s == 1).astype(np.int64)),
            "_c": pa.array((s == 2).astype(np.int64)),
        })
        agg = t.group_by("day").aggregate(
            [("_r", "sum"), ("_n", "sum"), ("_c", "sum")])
        return agg.rename_columns(["day", "_r", "_n", "_c"])

    from ray.data.aggregate import Sum as _Sum
    agg = (g.map_batches(day_counts, batch_format="pyarrow")
           .groupby("day").aggregate(
               _Sum("_r", alias_name="retained"),
               _Sum("_n", alias_name="new_users"),
               _Sum("_c", alias_name="churned")))
    rows = sorted(agg.take_all(), key=lambda r: r["day"])
    return pa.table({
        "day": pa.array([r["day"] for r in rows], pa.int64()),
        "retained": pa.array([r["retained"] for r in rows], pa.int64()),
        "new_users": pa.array([r["new_users"] for r in rows], pa.int64()),
        "churned": pa.array([r["churned"] for r in rows], pa.int64()),
    })


def _q_pq_codes(sf_dir: str):
    """Product-quantization code assignment: 64-dim embeddings split into
    4×16-dim sub-blocks, each assigned to the nearest of 8 fixed codebook
    centroids (the sub-vectors of vec_ids 0..7) — integer-quantized squared
    L2 so the argmin is exact on both sides; codebook broadcast once, one
    zero-shuffle vectorized assignment pass (the PQ *training* loop is
    kmeans_embeddings' job)."""
    import ray.data

    Q = 1 << 20
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding"])
    seed_rows = sorted(emb.filter(expr="vec_id < 8").take_all(),
                       key=lambda r: r["vec_id"])
    mat = np.array([r["embedding"] for r in seed_rows], np.float64)
    qcb = (-np.floor(-(mat * Q) + 0.5)).astype(np.int64)   # (8, 64)
    dim = qcb.shape[1]
    n_sub = 4
    sub = dim // n_sub
    import ray as _ray
    cb_ref = _ray.put(qcb)

    def assign(b: pa.Table, ref) -> pa.Table:
        cb = _ray.get(ref)
        from insurance_pdf_extractor_ray.pipelines.similarity import (
            embedding_matrix)
        x = embedding_matrix(b.column("embedding"))
        qx = (-np.floor(-(x * Q) + 0.5)).astype(np.int64)
        cols = {"vec_id": b.column("vec_id")}
        for s in range(n_sub):
            xs = qx[:, s * sub:(s + 1) * sub]
            cs = cb[:, s * sub:(s + 1) * sub]
            d2 = (xs * xs).sum(axis=1, keepdims=True) \
                - 2 * (xs @ cs.T) + (cs * cs).sum(axis=1)[None, :]
            cols[f"code{s}"] = pa.array(np.argmin(d2, axis=1)
                                        .astype(np.int64), pa.int64())
        return pa.table(cols)

    import functools
    out = emb.map_batches(functools.partial(assign, ref=cb_ref),
                          batch_format="pyarrow")
    rows = sorted(out.take_all(), key=lambda r: r["vec_id"])
    return pa.table({
        "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
        **{f"code{s}": pa.array([r[f"code{s}"] for r in rows], pa.int64())
           for s in range(n_sub)},
    })


def _q_weekday_residuals(sf_dir: str):
    """Seasonal-naive anomaly signal: each day's event-value total vs its
    weekday-of-week mean (integer day-keyed count shuffle bounded by days;
    residual math on the day table, mirrored op-for-op in SQL)."""
    from ray.data.aggregate import Sum

    def day_part(b: pa.Table) -> pa.Table:
        d = pc.divide(b.column("ts").cast(pa.int64()), 86_400_000_000)
        v = b.column("value").to_numpy(zero_copy_only=False)
        t = pa.table({
            "day": d,
            "_v": pa.array(np.floor(v * 1000.0 + 0.5).astype(np.int64)),
        })
        g = t.group_by("day").aggregate([("_v", "sum")])
        return g.rename_columns(["day", "_v"])

    rows = (_events(sf_dir, ["ts", "value"])
            .map_batches(day_part, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("_v", alias_name="total_i3"))
            .take_all())
    rows.sort(key=lambda r: r["day"])
    wsum: dict = {}
    wcnt: dict = {}
    for r in rows:
        w = int(r["day"]) % 7
        wsum[w] = wsum.get(w, 0) + int(r["total_i3"])
        wcnt[w] = wcnt.get(w, 0) + 1
    out = []
    for r in rows:
        w = int(r["day"]) % 7
        mean = float(wsum[w]) / wcnt[w]
        resid = (float(r["total_i3"]) - mean) / mean
        out.append((int(r["day"]), w, int(r["total_i3"]),
                    _round_away(resid, 9)))
    return pa.table({
        "day": pa.array([t[0] for t in out], pa.int64()),
        "weekday": pa.array([t[1] for t in out], pa.int64()),
        "total_i3": pa.array([t[2] for t in out], pa.int64()),
        "resid": pa.array([t[3] for t in out], pa.float64()),
    })


def _q_proportional_budget_sample(sf_dir: str):
    """Exact proportional eval-set allocation (largest-remainder / Hamilton
    apportionment of a 137-doc budget across sources) + deterministic
    per-source take — source-sized count combine, integer-exact quota math,
    grouped row-number gate; total sampled == budget exactly."""
    from ray.data.aggregate import Count

    from insurance_pdf_extractor_ray.pipelines.ordering import (
        grouped_row_number)

    B = 137
    counts = sorted(
        _documents(sf_dir, ["doc_id", "source"])
        .groupby("source").aggregate(Count(alias_name="n")).take_all(),
        key=lambda r: r["source"])
    tot = sum(int(r["n"]) for r in counts)
    fl = {r["source"]: (B * int(r["n"])) // tot for r in counts}
    rem = {r["source"]: (B * int(r["n"])) % tot for r in counts}
    leftover = B - sum(fl.values())
    order = sorted(fl, key=lambda s: (-rem[s], s))
    quota = {s: fl[s] + (1 if i < leftover else 0)
             for i, s in enumerate(order)}
    assert sum(quota.values()) == B

    ds = grouped_row_number(
        _documents(sf_dir, ["doc_id", "source"]),
        ["source"], ["doc_id"], out_col="_rn")

    def gate(b: pa.Table) -> pa.Table:
        src = b.column("source").to_pylist()
        rn = b.column("_rn").to_numpy(zero_copy_only=False)
        keep = np.array([rn[i] < quota[s] for i, s in enumerate(src)],
                        dtype=bool)   # rn is 0-based: first `quota` rows
        return pa.table({
            "doc_id": b.column("doc_id").filter(pa.array(keep)),
            "source": b.column("source").filter(pa.array(keep)),
        })

    rows = sorted(ds.map_batches(gate, batch_format="pyarrow").take_all(),
                  key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
    })


def _q_mannwhitney_value(sf_dir: str):
    """Exact Mann-Whitney U (purchase vs view event values) with the full
    tie correction — pairwise-count formulation over the QUANTIZED distinct
    value table (U from per-value counts + a cumulative less-than sum, no
    global rank assignment): map-side (value, n1, n2) partials, ONE
    value-keyed combine bounded by distinct quantized values, closed-form z
    mirrored op-for-op in SQL.  2·U stays integer under average-rank tie
    handling."""
    import math

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        qv = np.floor(v * 1000.0 + 0.5).astype(np.int64)
        is1 = np.asarray(
            pc.equal(b.column("event_type"), "purchase")).astype(np.int64)
        t = pa.table({"qv": pa.array(qv), "_n1": pa.array(is1),
                      "_n2": pa.array(1 - is1)})
        g = t.group_by("qv").aggregate([("_n1", "sum"), ("_n2", "sum")])
        return g.rename_columns(["qv", "_n1", "_n2"])

    rows = (_events(sf_dir, ["event_type", "value"])
            .filter(expr="event_type == 'purchase' or event_type == 'view'")
            .map_batches(partial, batch_format="pyarrow")
            .groupby("qv").aggregate(Sum("_n1", alias_name="n1"),
                                     Sum("_n2", alias_name="n2"))
            .take_all())
    rows.sort(key=lambda r: r["qv"])
    tn1 = tn2 = u2 = tie = less2 = 0
    for r in rows:
        n1, n2 = int(r["n1"]), int(r["n2"])
        u2 += 2 * n1 * less2 + n1 * n2
        t = n1 + n2
        tie += t * t * t - t
        tn1 += n1
        tn2 += n2
        less2 += n2
    num = float(u2) / 2 - float(tn1 * tn2) / 2
    den = math.sqrt(float(tn1 * tn2) / 12
                    * ((tn1 + tn2 + 1)
                       - float(tie) / ((tn1 + tn2) * (tn1 + tn2 - 1))))
    return pa.table({
        "u2x": pa.array([u2], pa.int64()),
        "z": pa.array([_round_away(num / den, 9)], pa.float64()),
    })


def _q_third_purchase_ts(sf_dir: str):
    """Per-user k-th-event milestone (timestamp of the 3rd purchase under
    the (ts, event_id) total order) — grouped row-number metadata wave,
    zero-move rank gate (pipelines/ordering.py:grouped_row_number)."""
    from insurance_pdf_extractor_ray.pipelines.ordering import (
        grouped_row_number)

    p = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"]) \
        .filter(expr="event_type == 'purchase'")

    def us(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "event_id": b.column("event_id"),
                         "ts_us": b.column("ts").cast(pa.int64())})

    p = p.map_batches(us, batch_format="pyarrow")
    ds = grouped_row_number(p, ["user_id"], ["ts_us", "event_id"],
                            out_col="_rn")
    rows = sorted(
        ds.filter(expr="_rn == 2").select_columns(["user_id", "ts_us"])
          .take_all(), key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "third_ts_us": pa.array([r["ts_us"] for r in rows], pa.int64()),
    })


def _q_interval_coverage(sf_dir: str):
    """Interval-union coverage per user (sweep-line): total distinct
    microseconds covered by the user's 5-minute event windows + island
    count — merge-islands operator then a user-sized combine
    (pipelines/intervals.py:merge_intervals_by_key)."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.pipelines.intervals import (
        merge_intervals_by_key)

    W = 300_000_000  # 5 min in µs

    def iv(b: pa.Table) -> pa.Table:
        s = b.column("ts").cast(pa.int64())
        return pa.table({"user_id": b.column("user_id"), "s": s,
                         "e": pc.add(s, W)})

    islands = merge_intervals_by_key(
        _events(sf_dir, ["user_id", "ts"]).map_batches(
            iv, batch_format="pyarrow"),
        "user_id", "s", "e")

    def lengths(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "_len": pc.subtract(b.column("e"), b.column("s")),
        })

    agg = (islands.map_batches(lengths, batch_format="pyarrow")
           .groupby("user_id").aggregate(
               Sum("_len", alias_name="covered_us"),
               Count(alias_name="n_islands")))
    rows = sorted(agg.take_all(), key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "covered_us": pa.array([r["covered_us"] for r in rows], pa.int64()),
        "n_islands": pa.array([r["n_islands"] for r in rows], pa.int64()),
    })


def _q_top_dims_per_vector(sf_dir: str):
    """Vector/list ops: the 3 highest-|value| dimensions per embedding
    (integer-quantized magnitudes, stable argsort so ties break by
    dimension index — exact on both sides; zero-shuffle pass)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        embedding_matrix)

    Q = 1 << 20

    def top3(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             **{f"d{j}": pa.array([], pa.int64())
                                for j in range(3)}})
        x = embedding_matrix(b.column("embedding"))
        q = (-np.floor(-(x * Q) + 0.5)).astype(np.int64)
        idx = np.argsort(-np.abs(q), axis=1, kind="stable")[:, :3]
        return pa.table({
            "vec_id": b.column("vec_id"),
            **{f"d{j}": pa.array(idx[:, j], pa.int64()) for j in range(3)},
        })

    out = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).map_batches(
            top3, batch_format="pyarrow")
    rows = sorted(out.take_all(), key=lambda r: r["vec_id"])
    return pa.table({
        "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
        **{f"d{j}": pa.array([r[f"d{j}"] for r in rows], pa.int64())
           for j in range(3)},
    })


def _q_reciprocal_topk_pairs(sf_dir: str):
    """Reciprocal nearest-neighbor pairs (mutual top-3 by the integer-exact
    quantized inner product, neighbor-id tiebreak) — the agglomerative-
    clustering / duplicate-candidate primitive.  Broadcast candidate matrix,
    per-batch int64 matmul + stable argsort (ties break by column order =
    ascending id), directed top-3 edges, ONE pair-keyed combine keeping
    count==2 (both directions present)."""
    import ray.data
    from ray.data.aggregate import Count

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        embedding_matrix)

    Q = 1 << 20
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).filter(expr="vec_id < 400")
    small = sorted(emb.take_all(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in small], np.int64)
    mat = np.array([r["embedding"] for r in small], np.float64)
    qm = (-np.floor(-(mat * Q) + 0.5)).astype(np.int64)
    import ray as _ray
    ref = _ray.put((ids, qm))

    def edges(b: pa.Table, bref) -> pa.Table:
        bids, bq = _ray.get(bref)
        x = embedding_matrix(b.column("embedding"))
        qx = (-np.floor(-(x * Q) + 0.5)).astype(np.int64)
        rid = b.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        sim = qx @ bq.T
        # min+1, NOT min: argsort ranks by -sim and -int64.min overflows
        # back to int64.min (would rank self FIRST); -(min+1) == int64.max
        # ranks self last, which is the exclusion we want
        sim[rid[:, None] == bids[None, :]] = np.iinfo(np.int64).min + 1
        top = np.argsort(-sim, axis=1, kind="stable")[:, :3]
        a = np.repeat(rid, 3)
        nb = bids[top.ravel()]
        return pa.table({
            "lo": pa.array(np.minimum(a, nb), pa.int64()),
            "hi": pa.array(np.maximum(a, nb), pa.int64()),
        })

    import functools
    pairs = (emb.map_batches(functools.partial(edges, bref=ref),
                             batch_format="pyarrow")
             .groupby(["lo", "hi"]).aggregate(Count(alias_name="n"))
             .filter(expr="n == 2"))
    rows = sorted(pairs.take_all(), key=lambda r: (r["lo"], r["hi"]))
    return pa.table({
        "id_a": pa.array([r["lo"] for r in rows], pa.int64()),
        "id_b": pa.array([r["hi"] for r in rows], pa.int64()),
    })


def _q_lang_majority_mismatch(sf_dir: str):
    """Data-quality audit: docs whose language differs from their source's
    majority language (mode with (count desc, lang asc) tiebreak) —
    (source, lang)-sized count combine, driver majority map, broadcast
    filter pass."""
    from ray.data.aggregate import Count

    counts = (_documents(sf_dir, ["source", "lang"])
              .groupby(["source", "lang"]).aggregate(Count(alias_name="n"))
              .take_all())
    best: dict = {}
    for r in counts:
        key = r["source"]
        cand = (-int(r["n"]), r["lang"])
        if key not in best or cand < best[key]:
            best[key] = cand
    majority = {s: v[1] for s, v in best.items()}

    def mism(b: pa.Table) -> pa.Table:
        src = b.column("source").to_pylist()
        lang = b.column("lang").to_pylist()
        keep = np.array([lang[i] != majority[s] for i, s in enumerate(src)],
                        dtype=bool)
        pk = pa.array(keep)
        return pa.table({"doc_id": b.column("doc_id").filter(pk),
                         "source": b.column("source").filter(pk),
                         "lang": b.column("lang").filter(pk)})

    rows = sorted(
        _documents(sf_dir, ["doc_id", "source", "lang"])
        .map_batches(mism, batch_format="pyarrow").take_all(),
        key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })


def _q_dup_window_profile(sf_dir: str):
    """Duplication profile across window scales: for k in {4, 8, 16, 32},
    the number of k-word windows shared by >= 2 docs — the curve that picks
    the substring-dedup k (Lee et al. 2022 run length).  One distributed
    pass per k over pipelines/substrdedup.py:dup_window_hashes (hash
    identity; the oracle re-derives from window strings)."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        dup_window_hashes)

    docs = _documents(sf_dir, ["doc_id", "text"])
    ks = [4, 8, 16, 32]
    counts = [dup_window_hashes(docs, "text", k=k, min_docs=2).count()
              for k in ks]
    return pa.table({
        "k": pa.array(ks, pa.int64()),
        "n_dup_windows": pa.array(counts, pa.int64()),
    })


def _q_bounce_rate_daily(sf_dir: str):
    """Daily session bounce rate: share of 30-minute activity sessions
    containing exactly one event, bucketed by session-start day — islands
    operator then a day-sized combine; the ratio is mirrored as an exact
    integer pair + one rounded division."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.pipelines.intervals import (
        merge_intervals_by_key)

    ev = _events(sf_dir, ["user_id", "ts"])

    def to_iv(t: pa.Table) -> pa.Table:
        s = t.column("ts").cast(pa.int64())
        return pa.table({"user_id": t.column("user_id"), "s_us": s,
                         "e_us": pc.add(s, 1_800_000_000)})

    islands = merge_intervals_by_key(
        ev.map_batches(to_iv, batch_format="pyarrow"),
        "user_id", "s_us", "e_us", count_alias="n_events")

    def day_part(b: pa.Table) -> pa.Table:
        d = pc.divide(b.column("s_us"), 86_400_000_000)
        one = pc.cast(pc.equal(b.column("n_events"), 1), pa.int64())
        return pa.table({"day": d,
                         "_n": pa.array(np.ones(b.num_rows, np.int64)),
                         "_b": one})

    agg = (islands.map_batches(day_part, batch_format="pyarrow")
           .groupby("day").aggregate(Sum("_n", alias_name="n_sessions"),
                                     Sum("_b", alias_name="n_bounces")))
    rows = sorted(agg.take_all(), key=lambda r: r["day"])
    return pa.table({
        "day": pa.array([r["day"] for r in rows], pa.int64()),
        "n_sessions": pa.array([r["n_sessions"] for r in rows], pa.int64()),
        "n_bounces": pa.array([r["n_bounces"] for r in rows], pa.int64()),
        "bounce_rate": pa.array(
            [_round_away(float(r["n_bounces"]) / float(r["n_sessions"]), 9)
             for r in rows], pa.float64()),
    })


def _q_acf_daily(sf_dir: str):
    """Autocorrelation function of the daily event-count series at lags
    1..7 (weekly-seasonality detector) — ONE day-keyed count shuffle, then
    per-lag exact integer moment sums and the closed-form Pearson r
    mirrored per-lag in SQL (LAG(n, L))."""
    import math

    from ray.data.aggregate import Sum

    def day_part(b: pa.Table) -> pa.Table:
        d = pc.divide(b.column("ts").cast(pa.int64()), 86_400_000_000)
        t = pa.table({"day": d,
                      "_n": pa.array(np.ones(b.num_rows, dtype=np.int64))})
        return t.group_by("day").aggregate([("_n", "sum")]) \
                .rename_columns(["day", "_n"])

    rows = (_events(sf_dir, ["ts"])
            .map_batches(day_part, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("_n", alias_name="n"))
            .take_all())
    rows.sort(key=lambda r: r["day"])
    ns = [int(r["n"]) for r in rows]
    lags, acfs = [], []
    for L in range(1, 8):
        x, y = ns[L:], ns[:-L]
        k = len(x)
        if k < 2:
            continue
        sx, sy = sum(x), sum(y)
        sxx = sum(v * v for v in x)
        syy = sum(v * v for v in y)
        sxy = sum(a * b for a, b in zip(x, y))
        den = math.sqrt(float(k * sxx - sx * sx) * float(k * syy - sy * sy))
        lags.append(L)
        acfs.append(_round_away(float(k * sxy - sx * sy) / den, 9))
    return pa.table({"lag": pa.array(lags, pa.int64()),
                     "acf": pa.array(acfs, pa.float64())})


def _q_lorenz_chars(sf_dir: str):
    """Data-concentration audit (Lorenz points): per length-decile share
    and cumulative share of total corpus characters — global NTILE sort
    wave, decile-sized integer combine, shares mirrored as rounded
    divisions of exact integer sums."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.pipelines.ordering import ntile

    docs = _documents(sf_dir, ["doc_id", "n_chars"])
    tiled = ntile(docs, ["n_chars", "doc_id"], 10, out_col="decile")
    agg = (tiled.groupby("decile").aggregate(
        Sum("n_chars", alias_name="chars"), Count(alias_name="n_docs")))
    rows = sorted(agg.take_all(), key=lambda r: r["decile"])
    total = sum(int(r["chars"]) for r in rows)
    cum = 0
    out = []
    for r in rows:
        c = int(r["chars"])
        cum += c
        out.append((int(r["decile"]), int(r["n_docs"]), c,
                    _round_away(float(c) / float(total), 9),
                    _round_away(float(cum) / float(total), 9)))
    return pa.table({
        "decile": pa.array([t[0] for t in out], pa.int64()),
        "n_docs": pa.array([t[1] for t in out], pa.int64()),
        "chars": pa.array([t[2] for t in out], pa.int64()),
        "share": pa.array([t[3] for t in out], pa.float64()),
        "cum_share": pa.array([t[4] for t in out], pa.float64()),
    })


def _q_markov_entropy_rate(sf_dir: str):
    """Behavior predictability: entropy rate of the per-user event-type
    Markov chain, H = Σ_ij (n_ij/N)·ln(n_i/n_ij) over the transition-count
    table — ONE keyed transition shuffle (type²-bounded result), driver
    arithmetic mirrored in SQL."""
    import math

    from insurance_pdf_extractor_ray.pipelines.behavior import (
        transition_counts)

    out = transition_counts(
        _events(sf_dir, ["event_id", "user_id", "event_type", "ts"]),
        "user_id", "event_type", "ts", order_tiebreak="event_id")
    rows = sorted(out.take_all(),
                  key=lambda r: (r["from_item"], r["to_item"]))
    N = sum(int(r["n"]) for r in rows)
    row_tot: dict = {}
    for r in rows:
        row_tot[r["from_item"]] = row_tot.get(r["from_item"], 0) \
            + int(r["n"])
    h = sum((float(r["n"]) / N)
            * math.log(float(row_tot[r["from_item"]]) / float(r["n"]))
            for r in rows)
    return pa.table({
        "n_transitions": pa.array([N], pa.int64()),
        "entropy_rate": pa.array([_round_away(h, 9)], pa.float64()),
    })


def _q_q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 analog: forecast-revenue-change scalar — pruned-column
    read, one vectorized filtered integer partial per batch, zero
    shuffles."""
    from ray.data.aggregate import Sum

    lo = int(pd.Timestamp("1996-01-01").value // 1000)
    hi = int(pd.Timestamp("1997-01-01").value // 1000)

    def partial(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        keep = ((d >= lo) & (d < hi) & (disc >= 0.05) & (disc <= 0.07)
                & (qty < 24))
        rev = ep[keep] * disc[keep] * 10000.0
        s = int(np.floor(rev + 0.5).astype(np.int64).sum())
        return pa.table({"_s": pa.array([s], pa.int64())})

    agg = (_read(sf_dir, "lineitem",
                 ["l_shipdate", "l_discount", "l_quantity",
                  "l_extendedprice"])
           .map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("_s", alias_name="revenue_i4")))
    return pa.table({"revenue_i4": pa.array([agg["revenue_i4"]],
                                            pa.int64())})


def _q_q14_promo_share(sf_dir: str):
    """TPC-H Q14 analog: monthly promo-revenue share — broadcast promo
    partkey set (ray.put once), per-batch conditional integer partials,
    ONE month-sized combine, mirrored rounded division."""
    from ray.data.aggregate import Sum

    promo = np.array(sorted(
        r["p_partkey"] for r in _read(sf_dir, "part",
                                      ["p_partkey", "p_type"]).take_all()
        if r["p_type"].startswith("PROMO")), np.int64)
    import ray as _ray
    pref = _ray.put(promo)

    def partial(b: pa.Table, ref) -> pa.Table:
        pk = _ray.get(ref)
        us = b.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        month = np.asarray(us, dtype="datetime64[us]") \
            .astype("datetime64[M]").astype(np.int64)
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        part = b.column("l_partkey").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - disc) * 10000.0 + 0.5).astype(np.int64)
        isp = np.isin(part, pk)
        t = pa.table({
            "m": pa.array(month, pa.int64()),
            "_p": pa.array(np.where(isp, rev, 0), pa.int64()),
            "_t": pa.array(rev, pa.int64()),
        })
        return t.group_by("m").aggregate([("_p", "sum"), ("_t", "sum")]) \
                .rename_columns(["m", "_p", "_t"])

    import functools
    agg = (_read(sf_dir, "lineitem",
                 ["l_shipdate", "l_partkey", "l_extendedprice",
                  "l_discount"])
           .map_batches(functools.partial(partial, ref=pref),
                        batch_format="pyarrow")
           .groupby("m").aggregate(Sum("_p", alias_name="promo_i4"),
                                   Sum("_t", alias_name="total_i4")))
    rows = sorted(agg.take_all(), key=lambda r: r["m"])
    return pa.table({
        "month_idx": pa.array([r["m"] for r in rows], pa.int64()),
        "promo_i4": pa.array([r["promo_i4"] for r in rows], pa.int64()),
        "total_i4": pa.array([r["total_i4"] for r in rows], pa.int64()),
        "promo_pct": pa.array(
            [_round_away(100.0 * float(r["promo_i4"])
                         / float(r["total_i4"]), 9) for r in rows],
            pa.float64()),
    })


def _q_heaps_growth(sf_dir: str):
    """Heaps-law vocabulary growth: cumulative DISTINCT 3-word windows
    after each corpus quartile (by doc id) — computed in ONE window-keyed
    shuffle, not four scans: each window hash keeps the MIN quartile that
    contains it, a quartile-sized count combine follows, and the cumulative
    curve is the running sum (hash identity; oracle re-derives from window
    strings)."""
    from ray.data.aggregate import Count, Min

    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        _batch_windows,
        _roll,
    )

    def partial(b: pa.Table, denom) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        counts, _, wordh = _batch_windows(b.column("text").to_pylist())
        wh, wd, _ = _roll(wordh, counts, 3)
        if len(wh) == 0:
            return pa.table({"_wh": pa.array([], pa.int64()),
                             "_q": pa.array([], pa.int64())})
        q = (ids[wd] * 4) // denom
        t = pa.table({"_wh": pa.array(wh, pa.int64()),
                      "_q": pa.array(q, pa.int64())})
        g = t.group_by("_wh").aggregate([("_q", "min")])
        return g.rename_columns(["_wh", "_q"])

    import functools
    docs = _documents(sf_dir, ["doc_id", "text"])
    mx = int(docs.select_columns(["doc_id"]).max("doc_id")) + 1

    agg = (docs.map_batches(functools.partial(partial, denom=mx),
                            batch_format="pyarrow")
           .groupby("_wh").aggregate(Min("_q", alias_name="q"))
           .groupby("q").aggregate(Count(alias_name="new_windows")))
    rows = sorted(agg.take_all(), key=lambda r: r["q"])
    got = {int(r["q"]): int(r["new_windows"]) for r in rows}
    cum = 0
    out = []
    for qq in range(4):
        n = got.get(qq, 0)
        cum += n
        out.append((qq, n, cum))
    return pa.table({
        "quartile": pa.array([t[0] for t in out], pa.int64()),
        "new_windows": pa.array([t[1] for t in out], pa.int64()),
        "cum_distinct": pa.array([t[2] for t in out], pa.int64()),
    })


def _q_q19_band_revenue(sf_dir: str):
    """TPC-H Q19 analog: revenue under a DISJUNCTION of (brand, size band,
    quantity band) predicates — part attributes broadcast once as aligned
    arrays (ray.put), per-batch vectorized compound mask via searchsorted
    key lookup, scalar integer combine, zero shuffles."""
    from ray.data.aggregate import Sum

    parts = sorted(_read(sf_dir, "part",
                         ["p_partkey", "p_brand", "p_size"]).take_all(),
                   key=lambda r: r["p_partkey"])
    keys = np.array([r["p_partkey"] for r in parts], np.int64)
    brands = np.array([r["p_brand"] for r in parts])
    sizes = np.array([r["p_size"] for r in parts], np.int64)
    import ray as _ray
    ref = _ray.put((keys, brands, sizes))

    def partial(b: pa.Table, r) -> pa.Table:
        k, br, sz = _ray.get(r)
        part = b.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(k, part), 0, len(k) - 1)
        valid = k[idx] == part          # FK orphans match nothing
        pb, ps = br[idx], sz[idx]
        qty = np.where(valid, qty, -1.0)
        m1 = (pb == "Brand#11") & (ps >= 1) & (ps <= 10) \
            & (qty >= 1) & (qty <= 20)
        m2 = (pb == "Brand#22") & (ps >= 5) & (ps <= 20) \
            & (qty >= 10) & (qty <= 30)
        keep = m1 | m2
        rev = ep[keep] * (1.0 - disc[keep]) * 10000.0
        s = int(np.floor(rev + 0.5).astype(np.int64).sum())
        n = int(keep.sum())
        return pa.table({"_s": pa.array([s], pa.int64()),
                         "_n": pa.array([n], pa.int64())})

    import functools
    agg = (_read(sf_dir, "lineitem",
                 ["l_partkey", "l_quantity", "l_extendedprice",
                  "l_discount"])
           .map_batches(functools.partial(partial, r=ref),
                        batch_format="pyarrow")
           .aggregate(Sum("_s", alias_name="revenue_i4"),
                      Sum("_n", alias_name="n_lines")))
    return pa.table({
        "revenue_i4": pa.array([agg["revenue_i4"]], pa.int64()),
        "n_lines": pa.array([agg["n_lines"]], pa.int64()),
    })


def _q_order_concentration_gini(sf_dir: str):
    """Gini coefficient of per-customer order counts — the demand-skew /
    hot-key health number on the orders stream
    (pipelines/statagg.py:gini_of_counts)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import gini_of_counts

    out = gini_of_counts(_read(sf_dir, "orders", ["o_custkey"]),
                         "o_custkey")
    return _round_col(out, "gini", 9)


def _q_revenue_share_rank(sf_dir: str):
    """Share-of-parent + rank within group (window over aggregate): each
    nation's share of its region's order revenue — dims broadcast, ONE
    customer-keyed join, (region, nation)-sized combine, window math on the
    bounded result."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import (
        broadcast_join,
        shuffle_join,
    )

    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    nat = broadcast_join(nation, region, on="n_regionkey",
                         right_on="r_regionkey", add_cols=["r_name"],
                         how="inner")
    cust = broadcast_join(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]), nat,
        on="c_nationkey", right_on="n_nationkey",
        add_cols=["n_name", "r_name"], how="inner")

    def tp_i2(b: pa.Table) -> pa.Table:
        t = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "tp_i2": pa.array(np.floor(t * 100.0 + 0.5).astype(np.int64),
                              pa.int64()),
        })

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(tp_i2, batch_format="pyarrow")
    j = shuffle_join(orders, cust, on="o_custkey", right_on="c_custkey",
                     num_partitions=_join_partitions())
    agg = j.groupby(["r_name", "n_name"]).aggregate(
        Sum("tp_i2", alias_name="revenue_i2"))
    rows = sorted(agg.take_all(), key=lambda r: (r["r_name"], r["n_name"]))
    totals: dict = {}
    for r in rows:
        totals[r["r_name"]] = totals.get(r["r_name"], 0) + int(r["revenue_i2"])
    by_region: dict = {}
    for r in rows:
        by_region.setdefault(r["r_name"], []).append(r)
    out = []
    for reg in sorted(by_region):
        rs = sorted(by_region[reg],
                    key=lambda r: (-int(r["revenue_i2"]), r["n_name"]))
        for i, r in enumerate(rs):
            share = _round_away(
                float(r["revenue_i2"]) / float(totals[reg]), 9)
            out.append((reg, r["n_name"], int(r["revenue_i2"]), share,
                        i + 1))
    return pa.table({
        "r_name": pa.array([t[0] for t in out], pa.string()),
        "n_name": pa.array([t[1] for t in out], pa.string()),
        "revenue_i2": pa.array([t[2] for t in out], pa.int64()),
        "share": pa.array([t[3] for t in out], pa.float64()),
        "rnk": pa.array([t[4] for t in out], pa.int64()),
    })


