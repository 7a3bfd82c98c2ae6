"""Query bodies _q_rollup.._q_salted_sum (mechanical split of __ray_entry__.py)."""

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

__all__ = ['_q_rollup', '_q_hll_distinct', '_q_lag', '_q_zscore', '_q_histogram', '_q_outer_join', '_q_union_distinct', '_q_mode_lang', '_q_unpivot', '_q_corr_by_flag', '_q_median_by_type', '_q_string_agg_purchases', '_q_fuzzy_name_pairs', '_q_except_all_viewers', '_q_bigram_top100', '_q_cooccur_event_types', '_q_lang_entropy_by_source', '_q_event_transitions', '_q_debounce_events', '_q_entity_components', '_q_vector_centroids', '_q_quality_audit', '_q_events_in_outages', '_q_apply_changes_balances', '_q_name_pagerank', '_q_decayed_user_value', '_q_star_revenue', '_q_cumulative_daily_value', '_q_weighted_sample', '_q_chunk_documents', '_q_dense_rank_values', '_q_q1_pricing_summary', '_q_promo_nation_profit', '_q_regr_by_flag', '_q_snapshot_diff_users', '_q_latest_event_per_user', '_q_intersect_all_engaged', '_q_cube_source_lang', '_q_salted_sum']

def _q_rollup(sf_dir: str):
    """GROUP BY ROLLUP(source, lang) counts — finest level is the only
    keyed shuffle; coarser levels re-aggregate the bounded finest table
    (pipelines/sketches.py:rollup_counts)."""
    from insurance_pdf_extractor_ray.pipelines.sketches import rollup_counts

    return rollup_counts(_documents(sf_dir, ["source", "lang"]),
                         ["source", "lang"])


def _q_hll_distinct(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT) — global users + per-type
    (p=12, ~1.6 % σ).  Register merge is max ⇒ partition/retry-independent;
    the oracle pins the deterministic output, cross-validated within 2 % of
    the exact counts at sf0.01 (pipelines/sketches.py)."""
    from insurance_pdf_extractor_ray.pipelines.sketches import (
        hll_distinct,
        hll_distinct_by,
    )

    total = hll_distinct(_events(sf_dir, ["user_id"]), "user_id")
    per = hll_distinct_by(_events(sf_dir, ["event_type", "user_id"]),
                          "event_type", "user_id").take_all()
    rows = sorted(per, key=lambda r: r["event_type"])
    return pa.table({
        "event_type": pa.array(["__all__"] + [r["event_type"] for r in rows],
                               pa.string()),
        "approx_distinct": pa.array(
            [total] + [r["approx_distinct"] for r in rows], pa.int64()),
    })


def _q_lag(sf_dir: str):
    """Per-user LAG(value, 1) in (ts, event_id) order — one keyed shuffle,
    null-masked take interior (pipelines/windows.py:lag_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.windows import lag_by_key

    out = lag_by_key(_events(sf_dir, ["event_id", "user_id", "ts", "value"]),
                     "user_id", "ts", "value", offset=1,
                     order_tiebreak="event_id", out_col="prev_value")
    rows = out.select_columns(["event_id", "prev_value"]).take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "prev_value": pa.array([r["prev_value"] for r in rows], pa.float64()),
    })


def _q_zscore(sf_dir: str):
    """Per-type z-score standardization — keyed moment aggregate broadcast
    into a streaming map (pipelines/analytics.py:zscore_by)."""
    from insurance_pdf_extractor_ray.pipelines.analytics import zscore_by

    out = zscore_by(_events(sf_dir, ["event_id", "event_type", "value"]),
                    "event_type", "value")
    rows = out.select_columns(["event_id", "zscore"]).take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "zscore": pa.array(
            [None if r["zscore"] is None else _round_away(r["zscore"], 6)
             for r in rows], pa.float64()),
    })


def _q_histogram(sf_dir: str):
    """Global fixed-width histogram (20 bins over [0, 1000)) — zero shuffle,
    per-block bincount partials merged by addition
    (pipelines/sketches.py:histogram_fixed)."""
    from insurance_pdf_extractor_ray.pipelines.sketches import histogram_fixed

    return histogram_fixed(_events(sf_dir, ["value"]), "value",
                           lo=0.0, hi=1000.0, bins=20)


def _q_outer_join(sf_dir: str):
    """LEFT OUTER big-big join: every customer with their order count,
    zero-order customers included (Dataset.join left_outer + null fill)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions

    orders = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                   columns=["o_custkey"])
    from ray.data.aggregate import Count

    counts = orders.groupby("o_custkey").aggregate(Count(alias_name="n"))
    cust = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey"])
    joined = cust.join(counts, join_type="left_outer",
                       num_partitions=_join_partitions(),
                       on=("c_custkey",), right_on=("o_custkey",))

    def fill(batch: pa.Table) -> pa.Table:
        n = pc.fill_null(batch.column("n"), 0)
        return pa.table({"c_custkey": batch.column("c_custkey"),
                         "n_orders": n.cast(pa.int64())})

    rows = joined.map_batches(fill, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["c_custkey"])
    return pa.table({
        "c_custkey": pa.array([r["c_custkey"] for r in rows], pa.int64()),
        "n_orders": pa.array([r["n_orders"] for r in rows], pa.int64()),
    })


def _q_union_distinct(sf_dir: str):
    """Dataset.union of two filtered streams + exact distinct (keyed count)
    — SQL UNION semantics."""
    from ray.data.aggregate import Count

    a = _events(sf_dir, ["user_id", "event_type"]).filter(
        expr="event_type == 'purchase'").select_columns(["user_id"])
    b = _events(sf_dir, ["user_id", "event_type"]).filter(
        expr="event_type == 'error'").select_columns(["user_id"])
    uniq = a.union(b).groupby("user_id").aggregate(Count(alias_name="_c"))
    ids = sorted(r["user_id"] for r in uniq.take_all())
    return pa.table({"user_id": pa.array(ids, pa.int64())})


def _q_mode_lang(sf_dir: str):
    """Per-group MODE (most frequent value, tiebreak asc) — composition:
    keyed pair counts (one shuffle) → grouped top-1 under the total integer
    order (n desc, lang asc)."""
    from ray.data.aggregate import Count

    from insurance_pdf_extractor_ray.pipelines.rankagg import grouped_top_k

    counts = _documents(sf_dir, ["source", "lang"]).groupby(
        ["source", "lang"]).aggregate(Count(alias_name="n"))
    out = grouped_top_k(counts, "source", order_by=["n", "lang"],
                        descending=[True, False], k=1)
    rows = sorted(out.take_all(), key=lambda r: r["source"])
    return pa.table({
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_unpivot(sf_dir: str):
    """Pivot → UNPIVOT round-trip: the daily event-type count matrix melted
    back to long form (date, metric, n), zero cells preserved — unpivot is a
    zero-shuffle vectorized melt (pipelines/behavior.py:unpivot)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import (
        pivot_counts,
        unpivot,
    )

    types = ["click", "error", "purchase", "signup", "view"]

    def add_date(batch: pa.Table) -> pa.Table:
        return pa.table({
            "date": pc.strftime(batch.column("ts"), format="%Y-%m-%d"),
            "event_type": batch.column("event_type"),
        })

    wide = pivot_counts(
        _events(sf_dir, ["ts", "event_type"]).map_batches(
            add_date, batch_format="pyarrow"),
        "date", "event_type", types, prefix="n_")
    out = unpivot(wide, ["date"], [f"n_{t}" for t in types],
                  var_name="metric", value_name="n", var_labels=types)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["date"], r["metric"]))
    return pa.table({
        "date": pa.array([r["date"] for r in rows], pa.string()),
        "metric": pa.array([r["metric"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_corr_by_flag(sf_dir: str):
    """Grouped Pearson corr + sample covariance from mergeable moment sums —
    one keyed shuffle of six-number rows (pipelines/statagg.py:corr_by_key)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.statagg import corr_by_key

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_discount"])
    out = corr_by_key(li, "l_returnflag", "l_quantity", "l_discount")
    tbl = pa.Table.from_pylist(out.take_all())
    tbl = _round_col(_round_col(tbl, "corr", 9), "covar_samp", 9)
    return tbl.select(["l_returnflag", "corr", "covar_samp"])


def _q_median_by_type(sf_dir: str):
    """EXACT median over a continuous domain — distributed sort + positional
    pick, no bounded-distinct assumption (pipelines/statagg.py:median_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import median_by_key

    out = median_by_key(_events(sf_dir, ["event_type", "value"]),
                        "event_type", "value", out_col="med")
    return _round_col(pa.Table.from_pylist(out.take_all()), "med", 9)


def _q_string_agg_purchases(sf_dir: str):
    """Ordered per-group concatenation — sort + per-block run partials +
    block-ordered merge (pipelines/statagg.py:string_agg_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import string_agg_by_key

    ev = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"]).filter(
        expr="event_type == 'purchase'")
    out = string_agg_by_key(ev, "user_id", "event_id", ["ts", "event_id"],
                            sep=",", out_col="agg")
    return pa.Table.from_pylist(out.take_all())


def _q_fuzzy_name_pairs(sf_dir: str):
    """Edit-distance<=1 pair join via deletion-neighborhood (FastSS) blocking
    — linear shuffle volume instead of the O(n^2) cross join the oracle runs
    (pipelines/fuzzy.py:fuzzy_pairs)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.fuzzy import fuzzy_pairs

    cust = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey", "c_name"])
    return pa.Table.from_pylist(
        fuzzy_pairs(cust, "c_custkey", "c_name").take_all())


def _q_except_all_viewers(sf_dir: str):
    """Bag difference (EXCEPT ALL) via signed multiplicities — one keyed
    shuffle of per-block signed counts (pipelines/bagops.py:except_all)."""
    from insurance_pdf_extractor_ray.pipelines.bagops import except_all

    a = _events(sf_dir, ["user_id", "event_type"]).filter(
        expr="event_type == 'view'").select_columns(["user_id"])
    b = _events(sf_dir, ["user_id", "event_type"]).filter(
        expr="event_type == 'click'").select_columns(["user_id"])
    return pa.Table.from_pylist(except_all(a, b, ["user_id"]).take_all())


def _q_bigram_top100(sf_dir: str):
    """Top-100 word bigrams — map-side n-gram pre-count (blocks ship
    distinct grams, not token streams), one keyed combine, sort-limit
    (pipelines/tfidf.py:ngram_counts)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import ngram_counts

    out = ngram_counts(_documents(sf_dir, ["doc_id", "text"]),
                       "text", "doc_id", n=2, k=100)
    rows = out.take_all()
    rows.sort(key=lambda r: (-r["n"], r["ngram"]))
    return pa.table({
        "bigram": pa.array([r["ngram"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_cooccur_event_types(sf_dir: str):
    """Per-user event-type co-occurrence counts — distinct-pair shuffle,
    bounded per-key triu pair explode, final keyed count
    (pipelines/behavior.py:cooccurrence_pairs)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import cooccurrence_pairs

    out = cooccurrence_pairs(_events(sf_dir, ["user_id", "event_type"]),
                             "user_id", "event_type")
    rows = sorted(out.take_all(), key=lambda r: (r["item_a"], r["item_b"]))
    return pa.table({
        "item_a": pa.array([r["item_a"] for r in rows], pa.string()),
        "item_b": pa.array([r["item_b"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_lang_entropy_by_source(sf_dir: str):
    """Shannon entropy of the language mix per source — one (source, lang)
    count shuffle, vectorized entropy over the bounded table
    (pipelines/analytics.py:entropy_by)."""
    from insurance_pdf_extractor_ray.pipelines.analytics import entropy_by

    t = entropy_by(_documents(sf_dir, ["source", "lang"]), "source", "lang")
    idx = pc.sort_indices(t, sort_keys=[("source", "ascending")])
    return t.take(idx)


def _q_event_transitions(sf_dir: str):
    """Markov transition counts over each user's time-ordered event stream —
    one keyed shuffle emitting per-key partial (from, to) counts, tiny final
    combine (pipelines/behavior.py:transition_counts)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import transition_counts

    out = transition_counts(
        _events(sf_dir, ["event_id", "user_id", "event_type", "ts"]),
        "user_id", "event_type", "ts", order_tiebreak="event_id")
    rows = sorted(out.take_all(),
                  key=lambda r: (r["from_item"], r["to_item"]))
    return pa.table({
        "from_type": pa.array([r["from_item"] for r in rows], pa.string()),
        "to_type": pa.array([r["to_item"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_debounce_events(sf_dir: str):
    """Clickstream de-bounce: drop rows repeating the user's previous event
    type within 60s — one keyed shuffle, vectorized shifted compares
    (pipelines/windows.py:debounce_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.windows import debounce_by_key

    out = debounce_by_key(
        _events(sf_dir, ["event_id", "user_id", "event_type", "ts"]),
        "user_id", "ts", "event_type", gap=60_000_000,
        order_tiebreak="event_id")
    rows = sorted(out.select_columns(
        ["event_id", "user_id", "event_type"]).take_all(),
        key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
    })


def _q_entity_components(sf_dir: str):
    """Entity resolution: nation-blocked edit-distance<=1 name edges ->
    connected components (root = min custkey).  FastSS pair generation, two
    edge-bounded dim joins for the block filter, union-find / label-
    propagation closure (pipelines/fuzzy.py:entity_components)."""
    from insurance_pdf_extractor_ray.pipelines.fuzzy import entity_components

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey"])
    out = entity_components(cust, "c_custkey", "c_name",
                            block_col="c_nationkey")
    rows = sorted(out.take_all(), key=lambda r: r["id"])
    return pa.table({
        "id": pa.array([r["id"] for r in rows], pa.int64()),
        "root": pa.array([r["root"] for r in rows], pa.int64()),
    })


def _q_vector_centroids(sf_dir: str):
    """Per-label mean embedding (label, dim, centroid) — per-block
    sum-vector/count partials via one zero-copy reshape + np.add.at, one
    tiny keyed combine (pipelines/similarity.py:group_centroids)."""
    from insurance_pdf_extractor_ray.pipelines.similarity import group_centroids

    emb = _read(sf_dir, "embeddings", ["embedding", "label"])
    t = group_centroids(emb, "embedding", "label")
    cent = [_round_half_away(v, 6) for v in t.column("centroid").to_pylist()]
    return pa.table({
        "label": t.column("label").cast(pa.int32()),
        "dim": t.column("dim"),
        "centroid": pa.array(cent, pa.float64()),
    })


def _q_quality_audit(sf_dir: str):
    """Data-quality expectations over documents — every rule evaluated in
    one pass, blocks ship (rule, n_bad, n_rows) partials only
    (pipelines/profile.py:quality_audit)."""
    from insurance_pdf_extractor_ray.pipelines.profile import quality_audit

    known = {"en", "fr", "es", "de", "zh"}

    rules = [
        ("empty_text", lambda b: pc.or_kleene(
            pc.is_null(b.column("text")),
            pc.equal(b.column("text"), ""))),
        ("len_mismatch", lambda b: pc.not_equal(
            b.column("n_chars"), pc.utf8_length(b.column("text")))),
        ("unknown_lang", lambda b: pc.invert(pc.is_in(
            b.column("lang"), value_set=pa.array(sorted(known))))),
        ("oversize", lambda b: pc.greater(b.column("n_chars"), 500)),
    ]
    return quality_audit(
        _documents(sf_dir, ["text", "lang", "n_chars"]), rules)


def _q_events_in_outages(sf_dir: str):
    """Keyless point-in-interval join: every event falling inside any
    10-minute outage window opened by an error event — intervals replicate
    to the epoch buckets they overlap, points go to one bucket, one keyed
    shuffle + vectorized in-group mask (pipelines/joins.py:range_join,
    by=None path)."""
    from insurance_pdf_extractor_ray.pipelines.joins import range_join

    ev = _events(sf_dir, ["event_id", "ts", "event_type"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "ts_us": t.column("ts").cast(pa.int64()),
        })

    points = ev.map_batches(to_us, batch_format="pyarrow")

    def windows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "error"))
        start = t.column("ts").cast(pa.int64())
        return pa.table({
            "outage_id": t.column("event_id"),
            "start_us": start,
            "end_us": pc.add(start, 600_000_000),
        })

    ivals = ev.map_batches(windows, batch_format="pyarrow")
    out = range_join(points, ivals, on="ts_us", start_col="start_us",
                     end_col="end_us", epoch=600_000_000,
                     interval_cols=["outage_id"])
    rows = sorted(
        ((r["event_id"], r["outage_id"]) for r in
         out.select_columns(["event_id", "outage_id"]).take_all()))
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "outage_id": pa.array([r[1] for r in rows], pa.int64()),
    })


def _q_apply_changes_balances(sf_dir: str):
    """CDC MERGE INTO: fold the event log into customer balances — latest
    change per key (compaction shuffle, <=1 row/key/block), ONE keyed
    full-outer join, vectorized delete/upsert/passthrough resolution
    (pipelines/cdc.py:apply_changes)."""
    from insurance_pdf_extractor_ray.pipelines.cdc import apply_changes

    base = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    changes = _events(sf_dir,
                      ["user_id", "ts", "event_id", "event_type", "value"])
    out = apply_changes(base, changes, "c_custkey", "user_id",
                        order_by=["ts", "event_id"], op_col="event_type",
                        payload_map={"value": "c_acctbal"},
                        delete_op="error")
    rows = sorted(out.take_all(), key=lambda r: r["c_custkey"])
    return pa.table({
        "c_custkey": pa.array([r["c_custkey"] for r in rows], pa.int64()),
        "c_acctbal": pa.array([r["c_acctbal"] for r in rows], pa.float64()),
    })


def _q_name_pagerank(sf_dir: str):
    """PageRank (3 synchronous iterations, d=0.85) over the nation-blocked
    lev<=1 customer-name graph — per round ONE keyed join (ranks onto the
    materialized edge list) + one keyed combine; the oracle unrolls the same
    three iterations in SQL (pipelines/graph.py:pagerank)."""
    from insurance_pdf_extractor_ray.pipelines.graph import pagerank

    sym = _customer_name_graph(sf_dir)
    ranks = pagerank(sym, n_iter=3, damping=0.85)
    rows = sorted(ranks.take_all(), key=lambda r: r["id"])
    return pa.table({
        "id": pa.array([r["id"] for r in rows], pa.int64()),
        "rank": pa.array([_round_away(r["rank"], 9) for r in rows],
                         pa.float64()),
    })


def _q_decayed_user_value(sf_dir: str):
    """Recency-weighted engagement: exp-decayed value sum per user anchored
    at the user's latest event — decay factored into two plain combinable
    aggregates, map-side partials only
    (pipelines/analytics.py:decayed_sum_by)."""
    from insurance_pdf_extractor_ray.pipelines.analytics import decayed_sum_by

    # tau = 1 day; t0 = 2024-01-01 UTC (events start there)
    t = decayed_sum_by(
        _events(sf_dir, ["user_id", "ts", "value"]),
        "user_id", "ts", "value",
        tau_us=86_400_000_000.0, t0_us=1_704_067_200_000_000, nd=6)
    return pa.table({
        "user_id": t.column("user_id").cast(pa.int64()),
        "decayed_sum": t.column("decayed_sum"),
    })


def _q_star_revenue(sf_dir: str):
    """Star-schema rollup orders→customer→nation→region: aggregate-below-
    join (fact reduced to per-custkey rows BEFORE any join), hash-shuffle
    bridge join, broadcast leaf dims (pipelines/joins.py:star_aggregate)."""
    from insurance_pdf_extractor_ray.pipelines.joins import star_aggregate

    out = star_aggregate(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        "o_custkey", "o_totalprice",
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]), "c_custkey",
        dims=[
            (_read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]),
             "c_nationkey", "n_nationkey", ["n_regionkey"]),
            (_read(sf_dir, "region", ["r_regionkey", "r_name"]),
             "n_regionkey", "r_regionkey", ["r_name"]),
        ],
        group_by=["r_name"], total_alias="revenue", count_alias="n_orders")
    rows = sorted(out.take_all(), key=lambda r: r["r_name"])
    t = pa.table({
        "r_name": pa.array([r["r_name"] for r in rows], pa.string()),
        "revenue": pa.array([r["revenue"] for r in rows], pa.float64()),
        "n_orders": pa.array([r["n_orders"] for r in rows], pa.int64()),
    })
    return _round_col(t, "revenue", 2)


def _q_cumulative_daily_value(sf_dir: str):
    """Running daily totals — aggregate-first (one keyed shuffle to #days
    rows), prefix sum over the bounded sorted result
    (pipelines/analytics.py:cumulative_daily)."""
    from insurance_pdf_extractor_ray.pipelines.analytics import cumulative_daily

    t = cumulative_daily(_events(sf_dir, ["ts", "value"]), "ts", "value")
    return _round_col(t, "cum_total", 4)


def _q_weighted_sample(sf_dir: str):
    """Deterministic weighted (by n_chars) sample of 100 docs — A-Res
    reservoir keys from the Knuth hash, map-side top-k, k x blocks merge
    (pipelines/sampling.py:weighted_sample_k)."""
    from insurance_pdf_extractor_ray.pipelines.sampling import weighted_sample_k

    out = weighted_sample_k(_documents(sf_dir, ["doc_id", "n_chars"]),
                            "doc_id", "n_chars", k=100, seed=3)
    rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
    })


def _q_chunk_documents(sf_dir: str):
    """Sliding-window chunking (200 chars, 40 overlap) — zero-shuffle
    vectorized polars explode (pipelines/packing.py:chunk_text).  The chunk
    text is returned verbatim so the driver's hash check is char-exact
    against the substr oracle."""
    from insurance_pdf_extractor_ray.pipelines.packing import chunk_text

    out = chunk_text(_documents(sf_dir, ["doc_id", "text"]),
                     "doc_id", "text", size=200, overlap=40)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["doc_id"], r["chunk_id"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "chunk_id": pa.array([r["chunk_id"] for r in rows], pa.int64()),
        "chunk_text": pa.array([r["chunk_text"] for r in rows], pa.string()),
    })


def _q_dense_rank_values(sf_dir: str):
    """DENSE_RANK over the distinct (event_type, value) pairs, top-100 per
    type — map-side pair dedup, one composite shuffle, per-key rank over the
    bounded distinct-value histogram (pipelines/rankagg.py:dense_rank_by)."""
    from insurance_pdf_extractor_ray.pipelines.rankagg import dense_rank_by

    out = dense_rank_by(_events(sf_dir, ["event_type", "value"]),
                        "event_type", "value", descending=True, max_rank=100)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["event_type"], r["drank"]))
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "value": pa.array([r["value"] for r in rows], pa.float64()),
        "drank": pa.array([r["drank"] for r in rows], pa.int64()),
    })


def _q_q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 analog: lineitem pricing summary by (returnflag, linestatus)
    with a shipdate predicate — per-batch two-key Arrow group_by partials,
    ONE tiny keyed combine (integer cents, reduction-order-exact)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    cutoff = pa.scalar(np.datetime64("1999-01-01", "us"),
                       pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("l_shipdate"), cutoff))
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        base = pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "_q": pa.array(_r_cents_half_away(qty), pa.int64()),
            "_b": pa.array(_r_cents_half_away(ep), pa.int64()),
            "_d": pa.array(_r_cents_half_away(ep * (1.0 - dc)), pa.int64()),
            "_n": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
        })
        return base.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("_q", "sum"), ("_b", "sum"), ("_d", "sum"), ("_n", "sum")]
        ).rename_columns(["l_returnflag", "l_linestatus",
                          "_q", "_b", "_d", "_n"])

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_shipdate", "l_quantity",
                "l_extendedprice", "l_discount"])
    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("_q", alias_name="sum_qty_c"),
                      Sum("_b", alias_name="sum_base_c"),
                      Sum("_d", alias_name="sum_disc_c"),
                      Sum("_n", alias_name="n")))
    rows = agg.take_all()
    rows.sort(key=lambda r: (r["l_returnflag"], r["l_linestatus"]))
    return pa.table({
        "l_returnflag": pa.array([r["l_returnflag"] for r in rows],
                                 pa.string()),
        "l_linestatus": pa.array([r["l_linestatus"] for r in rows],
                                 pa.string()),
        "sum_qty_c": pa.array([r["sum_qty_c"] for r in rows], pa.int64()),
        "sum_base_c": pa.array([r["sum_base_c"] for r in rows], pa.int64()),
        "sum_disc_c": pa.array([r["sum_disc_c"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_promo_nation_profit(sf_dir: str):
    """TPC-H Q9-lite: discounted revenue of PROMO parts per supplier nation
    — PROMO part-key set filtered Dataset-side and broadcast into a
    map-side filter, revenue pre-aggregated per suppkey (ONE keyed combine
    over 8-byte keys), supplier->nation folded in as a broadcast
    (sorted keys, nation index) probe, final nation-name reduce on <=25
    rows.  Aggregate-below-join throughout: the lineitem stream is never
    joined row-wise and no dimension is collected as driver Python rows."""
    import ray
    from ray.data.aggregate import Sum

    promo_keys = _filtered_keys(
        sf_dir, "part", "p_partkey", ["p_partkey", "p_type"],
        lambda b: pc.equal(b.column("p_type"), "PROMO"))
    pref = ray.put(promo_keys)

    def partial(t: pa.Table, keys_ref) -> pa.Table:
        keys = ray.get(keys_ref)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        m = np.isin(pk, keys)
        t = t.filter(pa.array(m))
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        base = pa.table({
            "l_suppkey": t.column("l_suppkey"),
            "_r": pa.array(_r_cents_half_away(ep * (1.0 - dc)), pa.int64()),
        })
        return base.group_by(["l_suppkey"]).aggregate(
            [("_r", "sum")]).rename_columns(["l_suppkey", "_r"])

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
    per_supp = (li.map_batches(partial, fn_args=(pref,),
                               batch_format="pyarrow")
                .groupby("l_suppkey").aggregate(Sum("_r", alias_name="rev")))

    # supplier->nation resolves as a broadcast (sorted keys, int8 nation
    # index) probe inside the Dataset, and the final reduce is a <=25-key
    # groupby — nothing supplier-sized ever lands on the driver
    nat = {r["n_nationkey"]: r["n_name"] for r in
           _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()}
    sup_tbl = _filtered_dim(sf_dir, "supplier",
                            ["s_suppkey", "s_nationkey"])
    skeys = sup_tbl.column("s_suppkey").to_numpy(zero_copy_only=False) \
                   .astype(np.int64)
    snk = sup_tbl.column("s_nationkey").to_numpy(zero_copy_only=False) \
                 .astype(np.int64)
    order = np.argsort(skeys, kind="stable")
    nat_keys = np.array(sorted(nat), np.int64)
    nat_names = np.array([nat[k] for k in nat_keys], object)
    nidx = np.searchsorted(nat_keys, snk[order]).astype(np.int8)
    dim_ref = ray.put((skeys[order], nidx, nat_names))

    def to_nation(t: pa.Table) -> pa.Table:
        sk_arr, ni, nm = ray.get(dim_ref)
        sk = t.column("l_suppkey").to_numpy(zero_copy_only=False)
        names = nm[ni[np.searchsorted(sk_arr, sk)]] \
            if len(sk) else np.array([], object)
        return pa.table({"n_name": pa.array(names, pa.string()),
                         "rev": t.column("rev")})

    out = per_supp.map_batches(to_nation, batch_format="pyarrow") \
        .groupby("n_name").aggregate(Sum("rev", alias_name="rev_c"))
    rows = sorted(out.take_all(), key=lambda r: r["n_name"])
    return pa.table({
        "n_name": pa.array([r["n_name"] for r in rows], pa.string()),
        "rev_c": pa.array([int(r["rev_c"]) for r in rows], pa.int64()),
    })


def _q_regr_by_flag(sf_dir: str):
    """Grouped simple linear regression — regr_slope/intercept/r2/count of
    l_quantity on l_discount per returnflag, from the corr moment partials
    (one keyed shuffle of O(keys) six-number rows)
    (pipelines/statagg.py:regr_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import regr_by_key

    out = regr_by_key(
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_discount", "l_quantity"]),
        "l_returnflag", "l_discount", "l_quantity")
    rows = out.take_all()
    rows.sort(key=lambda r: r["l_returnflag"])
    return pa.table({
        "l_returnflag": pa.array([r["l_returnflag"] for r in rows],
                                 pa.string()),
        "slope": pa.array([round(r["slope"], 9) for r in rows], pa.float64()),
        "intercept": pa.array([round(r["intercept"], 9) for r in rows],
                              pa.float64()),
        "r2": pa.array([round(r["r2"], 9) for r in rows], pa.float64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_snapshot_diff_users(sf_dir: str):
    """Change-data-feed between two snapshot versions: latest
    (event_type, cents) per user before the corpus midpoint vs latest
    overall — insert/update/delete classification, unchanged keys drop out
    (pipelines/cdc.py:snapshot_diff over rankagg.latest_by_key snapshots)."""
    import pyarrow.compute as pc

    from insurance_pdf_extractor_ray.pipelines.cdc import snapshot_diff
    from insurance_pdf_extractor_ray.pipelines.rankagg import latest_by_key

    ev = _events(sf_dir, ["user_id", "ts", "event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"),
                                             pa.scalar(100.0))), pa.int64())
        return pa.table({
            "user_id": t.column("user_id"),
            "_ts": pc.cast(t.column("ts"), pa.int64()),
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "cents": cents,
        })

    e = ev.map_batches(prep, batch_format="pyarrow").materialize()

    def ts_bounds(t: pa.Table) -> pa.Table:
        v = t.column("_ts").to_numpy(zero_copy_only=False)
        return pa.table({"mn": pa.array([int(v.min())], pa.int64()),
                         "mx": pa.array([int(v.max())], pa.int64())})

    bounds = e.map_batches(ts_bounds, batch_format="pyarrow").take_all()
    cut = (min(r["mn"] for r in bounds) + max(r["mx"] for r in bounds)) // 2

    def before(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("_ts"), pa.scalar(cut, pa.int64())))

    cols = ["user_id", "_ts", "event_id", "event_type", "cents"]
    old = latest_by_key(e.map_batches(before, batch_format="pyarrow"),
                        "user_id", order_by=["_ts", "event_id"],
                        descending=[True, True], columns=cols)
    new = latest_by_key(e, "user_id", order_by=["_ts", "event_id"],
                        descending=[True, True], columns=cols)
    out = snapshot_diff(old, new, "user_id", ["event_type", "cents"])
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "change": pa.array([r["change"] for r in rows], pa.string()),
        "old_event_type": pa.array([r["old_event_type"] for r in rows],
                                   pa.string()),
        "new_event_type": pa.array([r["new_event_type"] for r in rows],
                                   pa.string()),
        "old_cents": pa.array([r["old_cents"] for r in rows], pa.int64()),
        "new_cents": pa.array([r["new_cents"] for r in rows], pa.int64()),
    })


def _q_latest_event_per_user(sf_dir: str):
    """Log compaction — latest event row per user (ts desc, event_id desc
    tiebreak): k=1 grouped top-k, ≤ 1 candidate per key per block crosses
    the shuffle (pipelines/rankagg.py:latest_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.rankagg import latest_by_key

    out = latest_by_key(
        _events(sf_dir, ["user_id", "ts", "event_id", "event_type", "value"]),
        "user_id", order_by=["ts", "event_id"], descending=[True, True],
        columns=["user_id", "ts", "event_id", "event_type", "value"])
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "value": pa.array([r["value"] for r in rows], pa.float64()),
    })


def _q_intersect_all_engaged(sf_dir: str):
    """Bag intersection (INTERSECT ALL) via two-column per-block counts —
    one keyed shuffle, min(sum_a, sum_b) re-expansion
    (pipelines/bagops.py:intersect_all)."""
    from insurance_pdf_extractor_ray.pipelines.bagops import intersect_all

    a = _events(sf_dir, ["user_id", "event_type"]).filter(
        expr="event_type == 'view'").select_columns(["user_id"])
    b = _events(sf_dir, ["user_id", "event_type"]).filter(
        expr="event_type == 'click'").select_columns(["user_id"])
    return pa.Table.from_pylist(intersect_all(a, b, ["user_id"]).take_all())


def _q_cube_source_lang(sf_dir: str):
    """GROUP BY CUBE(source, lang) counts — one finest-level keyed shuffle;
    all 4 grouping sets re-aggregate the bounded finest table
    (pipelines/sketches.py:cube_counts)."""
    from insurance_pdf_extractor_ray.pipelines.sketches import cube_counts

    return cube_counts(_documents(sf_dir, ["source", "lang"]),
                       ["source", "lang"])


def _q_salted_sum(sf_dir: str):
    """Two-phase hot-key-salted SUM — identical result to plain GROUP BY,
    which is exactly what the oracle runs (pipelines/bagops.py:salted_sum)."""
    from insurance_pdf_extractor_ray.pipelines.bagops import salted_sum

    out = salted_sum(_events(sf_dir, ["event_type", "value", "event_id"]),
                     "event_type", "value", "event_id", salt=16, alias="total")
    return _round_col(pa.Table.from_pylist(out.take_all()), "total", 6)


