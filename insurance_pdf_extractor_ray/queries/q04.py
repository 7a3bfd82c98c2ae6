"""Query bodies _q_fixed_k_sample.._q_bpe_merges (mechanical split of __ray_entry__.py)."""

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

__all__ = ['_q_fixed_k_sample', '_q_bucketed_join', '_q_apply_changes_bucketed', '_q_minhash_incremental', '_q_quantiles_exact', '_q_skew_join', '_q_percent_rank', '_q_cume_dist', '_q_scd2_user_states', '_q_pushdown_read_orders', '_q_weekly_top_event', '_q_quantize_embeddings', '_q_range_layout_orders', '_q_rolling_dau', '_q_events_with_state', '_q_cumsum_by_user', '_q_bloom_semijoin', '_q_daily_gapfill', '_q_full_outer_balances', '_q_hash_split_stats', '_q_anti_join_shuffle', '_q_range_rolling_user', '_q_zorder_orders', '_q_merged_user_sessions', '_q_union_by_name', '_q_lead_next_value', '_q_gsets_source_lang', '_q_shuffled_docs_head', '_q_kmeans_embeddings', '_q_q5_region_revenue', '_q_q3_unshipped_topk', '_q_count_min_users', '_q_bigram_logprob', '_q_readability', '_q_char_entropy', '_q_user_event_entropy', '_q_interarrival', '_q_embedding_covariance', '_q_lang_drift', '_q_similarity_triangles', '_q_bpe_merges']

def _q_fixed_k_sample(sf_dir: str):
    """Deterministic fixed-k-per-stratum reservoir (Knuth-hash ranking,
    partition-independent) — map-side partial top-k, shuffle carries <=
    k x blocks rows per key (pipelines/sampling.py:stratified_fixed_k)."""
    from insurance_pdf_extractor_ray.pipelines.sampling import stratified_fixed_k

    out = stratified_fixed_k(_events(sf_dir, ["event_type", "event_id"]),
                             "event_type", "event_id", 25, seed=7)
    return pa.Table.from_pylist(
        out.select_columns(["event_type", "event_id"]).take_all())


def _q_bucketed_join(sf_dir: str):
    """SMB-style zero-shuffle join: both sides written hash-bucketed once,
    then one Arrow hash-join task per co-located bucket pair — no exchange
    (pipelines/bucketed.py:bucketed_join).  Arrow join coalesces the key
    (USING semantics), so the oracle projects o_custkey once."""
    import tempfile

    import ray.data

    from insurance_pdf_extractor_ray.pipelines.bucketed import (
        bucketed_join, write_bucketed)

    root = tempfile.mkdtemp(prefix="ipe_bucketed_")
    orders = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                   columns=["o_orderkey", "o_custkey"])
    cust = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey", "c_mktsegment"])
    write_bucketed(orders, os.path.join(root, "orders"), "o_custkey", 16)
    write_bucketed(cust, os.path.join(root, "cust"), "c_custkey", 16)
    out = bucketed_join(os.path.join(root, "orders"), os.path.join(root, "cust"))
    return pa.Table.from_pylist(
        out.take_all()).select(["o_orderkey", "o_custkey", "c_mktsegment"])


def _q_apply_changes_bucketed(sf_dir: str):
    """CDC MERGE INTO over a hash-bucketed base with ZERO base exchange:
    the change log makes one map pass into the base's bucket layout, then
    one task per bucket compacts + resolves locally — the base never
    shuffles (pipelines/cdc.py:apply_changes_bucketed).  Same semantics and
    oracle as apply_changes_balances."""
    import tempfile

    from insurance_pdf_extractor_ray.pipelines.bucketed import write_bucketed
    from insurance_pdf_extractor_ray.pipelines.cdc import apply_changes_bucketed

    root = tempfile.mkdtemp(prefix="ipe_cdc_bucketed_")
    base = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    write_bucketed(base, os.path.join(root, "base"), "c_custkey", 16)
    changes = _events(sf_dir,
                      ["user_id", "ts", "event_id", "event_type", "value"])
    out = apply_changes_bucketed(
        os.path.join(root, "base"), changes, "user_id",
        order_by=["ts", "event_id"], op_col="event_type",
        payload_map={"value": "c_acctbal"}, delete_op="error")
    rows = sorted(out.take_all(), key=lambda r: r["c_custkey"])
    return pa.table({
        "c_custkey": pa.array([r["c_custkey"] for r in rows], pa.int64()),
        "c_acctbal": pa.array([r["c_acctbal"] for r in rows], pa.float64()),
    })


def _q_minhash_incremental(sf_dir: str):
    """Incremental MinHash near-dup dedup against the at-rest bucketed LSH
    index (pipelines/minhashindex.py): documents ingested in two id-ordered
    increments, the first committed to the index before the second probes
    it with zero-exchange bucketed joins.  Returns the DROPPED ids.
    Oracle: pinned id list at sf0.01 (cross-validated against the batch
    minhash_dedup flag set; per-id near-dup semantics proven in
    tests/test_minhashindex.py)."""
    import tempfile

    from insurance_pdf_extractor_ray.pipelines.minhashindex import (
        minhash_dedup_incremental, minhash_index_append)

    docs = _documents(sf_dir, ["doc_id", "text"])
    half = _docs_rows(sf_dir) // 2

    def part(lo, hi):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id")
            return t.filter(pc.and_(pc.greater_equal(ids, lo),
                                    pc.less(ids, hi)))
        return f

    index_dir = tempfile.mkdtemp(prefix="ipe_mhidx_")
    kept_ids = []
    for lo, hi, tag in ((0, half, "a"), (half, 1 << 62, "b")):
        inc = docs.map_batches(part(lo, hi), batch_format="pyarrow")
        kept, sig_rows = minhash_dedup_incremental(
            inc, index_dir, "text", "doc_id", threshold=0.8,
            tmp_dir=tempfile.mkdtemp(prefix=f"ipe_mhinc_{tag}_"))
        kept_ids.extend(r["doc_id"] for r in
                        kept.select_columns(["doc_id"]).take_all())
        minhash_index_append(index_dir, sig_rows, "doc_id")
    all_ids = [r["doc_id"] for r in
               docs.select_columns(["doc_id"]).take_all()]
    dropped = sorted(set(all_ids) - set(kept_ids))
    return pa.table({"doc_id": pa.array(dropped, pa.int64())})


def _q_quantiles_exact(sf_dir: str):
    """Exact continuous-domain quantile_cont per key — distributed sort +
    positional pick (pipelines/statagg.py:quantiles_exact_by)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import quantiles_exact_by

    out = quantiles_exact_by(_events(sf_dir, ["event_type", "value"]),
                             "event_type", "value", [0.25, 0.5, 0.75])
    return _round_col(out, "quantile", 9)


def _q_skew_join(sf_dir: str):
    """Hybrid skew-aware join — MG hot-key detection, broadcast path for hot
    keys, hash shuffle for the tail, union (pipelines/joins.py:skew_join).
    hot_threshold=70 puts a real fraction of user_ids on EACH path at
    sf0.01, so both branches are oracle-exercised."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.joins import skew_join

    ev = _events(sf_dir, ["event_id", "user_id"])
    cust = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey", "c_mktsegment"])
    out = skew_join(ev, cust, on="user_id", right_on="c_custkey",
                    how="inner", hot_threshold=70, mg_k=4096)
    rows = out.take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "c_mktsegment": pa.array([r["c_mktsegment"] for r in rows],
                                 pa.string()),
    })


def _q_percent_rank(sf_dir: str):
    """Per-key percent_rank over a total order — sort + metadata wave +
    broadcast offset probe (pipelines/statagg.py:percent_rank_by)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import percent_rank_by

    out = percent_rank_by(_events(sf_dir, ["event_type", "value", "event_id"]),
                          "event_type", "value", "event_id", out_col="pr")
    tbl = pa.Table.from_pylist(
        out.select_columns(["event_id", "pr"]).take_all())
    return _round_col(tbl, "pr", 9)


def _q_cume_dist(sf_dir: str):
    """Per-key cume_dist over a total order — same sort + metadata wave as
    percent_rank (pipelines/statagg.py:percent_rank_by kind='cume_dist')."""
    from insurance_pdf_extractor_ray.pipelines.statagg import percent_rank_by

    out = percent_rank_by(_events(sf_dir, ["event_type", "value", "event_id"]),
                          "event_type", "value", "event_id", out_col="cd",
                          kind="cume_dist")
    tbl = pa.Table.from_pylist(
        out.select_columns(["event_id", "cd"]).take_all())
    return _round_col(tbl, "cd", 9)


def _q_scd2_user_states(sf_dir: str):
    """SCD-type-2 dimension build from the event change log: per user,
    consecutive repeats of event_type collapse, each surviving change gets
    [valid_from, valid_to) from its own ts to the next change's ts — ONE
    keyed shuffle, vectorized shifted-compare interior
    (pipelines/cdc.py:scd2_intervals)."""
    from insurance_pdf_extractor_ray.pipelines.cdc import scd2_intervals

    out = scd2_intervals(
        _events(sf_dir, ["user_id", "ts", "event_id", "event_type"]),
        "user_id", "ts", ["event_type"], order_tiebreak="event_id")
    rows = sorted(out.take_all(),
                  key=lambda r: (r["user_id"], r["valid_from"]))
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "valid_from": pa.array([r["valid_from"] for r in rows],
                               pa.timestamp("us")),
        "valid_to": pa.array([r["valid_to"] for r in rows],
                             pa.timestamp("us")),
    })


def _q_pushdown_read_orders(sf_dir: str):
    """Predicate-pushdown scan: the row filter rides into the Parquet read
    (row groups pruned on min/max stats — non-matching rows never leave
    storage), then a tiny integer-cent aggregate
    (sources/io.py:read_table(predicate=...))."""
    import pyarrow.compute as pc

    from insurance_pdf_extractor_ray.sources.io import read_table

    ds = read_table(os.path.join(sf_dir, "orders.parquet"),
                    columns=["o_orderkey", "o_totalprice"],
                    predicate=(pc.field("o_totalprice") > 400000.0))

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                         pa.scalar(100.0))), pa.int64())
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "cents": pa.array([pc.sum(c).as_py() or 0], pa.int64()),
        })

    rows = ds.map_batches(cents, batch_format="pyarrow").take_all()
    return pa.table({
        "n": pa.array([sum(r["n"] for r in rows)], pa.int64()),
        "total_cents": pa.array([sum(r["cents"] for r in rows)], pa.int64()),
    })


def _q_weekly_top_event(sf_dir: str):
    """Composite-key grouped top-k: the single best event per (user, week)
    by (value desc, event_id asc) — synthesized composite key, map-side
    per-key head, ONE bounded keyed shuffle
    (pipelines/rankagg.py:grouped_top_k, k=1)."""
    import pyarrow.compute as pc

    from insurance_pdf_extractor_ray.pipelines.rankagg import grouped_top_k

    week_us = 7 * 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        week = pc.divide(pc.cast(t.column("ts"), pa.int64()),
                         pa.scalar(week_us, pa.int64()))
        ck = pc.add(pc.multiply(t.column("user_id"),
                                pa.scalar(1_000_000, pa.int64())), week)
        return pa.table({"_uw": ck, "user_id": t.column("user_id"),
                         "week": week, "event_id": t.column("event_id"),
                         "value": t.column("value")})

    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"]).map_batches(
        prep, batch_format="pyarrow")
    out = grouped_top_k(ds, "_uw", order_by=["value", "event_id"],
                        descending=[True, False], k=1,
                        columns=["_uw", "user_id", "week", "event_id",
                                 "value"])
    rows = out.take_all()
    rows.sort(key=lambda r: (r["user_id"], r["week"]))
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "week": pa.array([r["week"] for r in rows], pa.int64()),
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "value": pa.array([r["value"] for r in rows], pa.float64()),
    })


def _q_quantize_embeddings(sf_dir: str):
    """Per-dim min-max uint8 quantization of the embedding table (4x
    smaller vector storage/shuffles) — dim-sized min/max partials, broadcast
    calibration, float64 arithmetic in the oracle's expression order so
    codes are bit-comparable (pipelines/similarity.py:quantize_embeddings).
    Digest: per-dim (mn, mx, sum of codes)."""
    import numpy as np

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        embedding_matrix,
        quantize_embeddings,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out, mn, mx = quantize_embeddings(ds)

    def sum_partial(batch: pa.Table) -> pa.Table:
        m = embedding_matrix(batch.column("codes"), dtype=np.int64)
        return pa.table({"s": pa.array([m.sum(axis=0)],
                                       pa.list_(pa.int64()))})

    tot = None
    for r in out.map_batches(sum_partial, batch_format="pyarrow").take_all():
        v = np.asarray(r["s"], np.int64)
        tot = v if tot is None else tot + v
    d = len(mn)
    return pa.table({
        "dim": pa.array(np.arange(1, d + 1), pa.int64()),
        "mn": pa.array(mn, pa.float64()),
        "mx": pa.array(mx, pa.float64()),
        "sum_q": pa.array(tot, pa.int64()),
    })


def _q_range_layout_orders(sf_dir: str):
    """Balanced range-partitioned at-rest layout (Terasort partition step):
    boundaries are exact octile order statistics from the sort-free
    rank-refinement quantiles; per-partition stats read one partition per
    task — the pruned-scan shape (pipelines/rangepart.py)."""
    import tempfile

    from insurance_pdf_extractor_ray.pipelines.rangepart import (
        partition_stats,
        write_range_partitioned,
    )

    path = tempfile.mkdtemp(prefix="ipe_rangepart_")
    write_range_partitioned(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
        path, "o_totalprice", 8)
    rows = partition_stats(path).take_all()
    rows.sort(key=lambda r: r["part"])
    return pa.table({
        "part": pa.array([r["part"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "mn": pa.array([r["mn"] for r in rows], pa.float64()),
        "mx": pa.array([r["mx"] for r in rows], pa.float64()),
    })


def _q_rolling_dau(sf_dir: str):
    """Trailing-7-day distinct users per day (the DAU/WAU primitive; no
    COUNT(DISTINCT) OVER RANGE in SQL) — distinct-pair pre-reduction,
    bounded x7 map-side explode filtered to the broadcast day set, ONE
    pair-dedup shuffle (pipelines/windows.py:rolling_distinct_days)."""
    from insurance_pdf_extractor_ray.pipelines.windows import (
        rolling_distinct_days,
    )

    out = rolling_distinct_days(_events(sf_dir, ["ts", "user_id"]),
                                "ts", "user_id", window_days=7)
    rows = out.take_all()
    rows.sort(key=lambda r: r["day"])
    return pa.table({
        "day": pa.array([r["day"] for r in rows], pa.int64()),
        "n_distinct": pa.array([r["n_distinct"] for r in rows], pa.int64()),
    })


def _q_events_with_state(sf_dir: str):
    """SCD2 point-in-time lookup join: every purchase event joins the
    user's state dimension row (built from signup/error transitions via
    pipelines/cdc.py:scd2_intervals) valid AT the purchase timestamp —
    half-open [valid_from, valid_to) semantics via integer-microsecond
    end-1, open intervals capped at the max event ts so bucket replication
    stays bounded (pipelines/joins.py:range_join with by=user_id)."""
    import pyarrow.compute as pc

    from insurance_pdf_extractor_ray.pipelines.cdc import scd2_intervals
    from insurance_pdf_extractor_ray.pipelines.joins import range_join

    ev = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])

    def only(types):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t.column("event_type"),
                                     value_set=pa.array(types)))
        return fn

    changes = ev.map_batches(only(["signup", "error"]),
                             batch_format="pyarrow")
    dim = scd2_intervals(changes, "user_id", "ts", ["event_type"],
                         order_tiebreak="event_id")

    points = ev.map_batches(only(["purchase"]), batch_format="pyarrow")

    def ts_max(t: pa.Table) -> pa.Table:
        m = pc.max(pc.cast(t.column("ts"), pa.int64()))
        return pa.table({"m": pa.array([m.as_py() or 0], pa.int64())})

    cap_us = max(r["m"] for r in points.map_batches(
        ts_max, batch_format="pyarrow").take_all())

    def prep_points(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "_ts": pc.cast(t.column("ts"), pa.int64()),
        })

    def prep_iv(t: pa.Table) -> pa.Table:
        vf = pc.cast(t.column("valid_from"), pa.int64())
        vt = pc.subtract(pc.cast(t.column("valid_to"), pa.int64()),
                         pa.scalar(1, pa.int64()))
        vt = pc.coalesce(vt, pa.scalar(int(cap_us), pa.int64()))
        return pa.table({"user_id": t.column("user_id"),
                         "state": t.column("event_type"),
                         "_from": vf, "_end": vt})

    out = range_join(
        points.map_batches(prep_points, batch_format="pyarrow"),
        dim.map_batches(prep_iv, batch_format="pyarrow"),
        on="_ts", start_col="_from", end_col="_end",
        epoch=30 * 86_400 * 1_000_000, by="user_id",
        interval_cols=["state"])
    rows = out.take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "state": pa.array([r["state"] for r in rows], pa.string()),
    })


def _q_cumsum_by_user(sf_dir: str):
    """Per-key expanding running total — SQL SUM() OVER (PARTITION BY ...
    ROWS UNBOUNDED PRECEDING) — on integer cents so the cumulative sum is
    reduction-order-exact (pipelines/windows.py:expanding_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.windows import expanding_by_key

    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(batch.column("value"), 100.0)) \
                  .cast(pa.int64())
        return pa.table({
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts"),
            "event_id": batch.column("event_id"),
            "cents": cents,
        })

    out = expanding_by_key(ds.map_batches(to_cents, batch_format="pyarrow"),
                           "user_id", "ts", "cents",
                           order_tiebreak="event_id")
    rows = sorted(out.select_columns(
        ["event_id", "cum_sum", "cum_n"]).take_all(),
        key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "cum_cents": pa.array([r["cum_sum"] for r in rows], pa.int64()),
        "cum_n": pa.array([r["cum_n"] for r in rows], pa.int64()),
    })


def _q_bloom_semijoin(sf_dir: str):
    """Bloom-prefiltered semi-join: the BUILDING-segment customer keys
    stream into an m-bit filter (constant merge state), probe-side batches
    drop definite non-members before the exact keyed semi-join — runtime
    filtering, the shuffle-volume cut for big-big semi-joins
    (pipelines/bloom.py:bloom_semi_join)."""
    from insurance_pdf_extractor_ray.pipelines.bloom import bloom_semi_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.filter(expr="c_mktsegment == 'BUILDING'") \
               .select_columns(["c_custkey"])
    out = bloom_semi_join(orders, cust, on="o_custkey",
                          right_on="c_custkey", m_bits=1 << 20, k=7)
    rows = sorted(out.take_all(), key=lambda r: r["o_orderkey"])
    return pa.table({
        "o_orderkey": pa.array([r["o_orderkey"] for r in rows], pa.int64()),
        "o_custkey": pa.array([r["o_custkey"] for r in rows], pa.int64()),
    })


def _q_daily_gapfill(sf_dir: str):
    """Calendar gap-fill (resample-to-daily with zero-filled missing days)
    over a sparse event subset — one map-combined groupby, driver merge on
    the day-cardinality aggregate only
    (pipelines/analytics.py:gap_fill_days)."""
    from insurance_pdf_extractor_ray.pipelines.analytics import gap_fill_days

    ds = _events(sf_dir, ["ts", "event_type", "value"])
    sparse = ds.filter(
        expr="event_type == 'purchase' and value > 4.97")
    return gap_fill_days(sparse, "ts", count_alias="n_events")


def _q_full_outer_balances(sf_dir: str):
    """FULL OUTER JOIN coverage: customers against per-user event cents
    totals — unmatched rows survive from BOTH sides with typed nulls
    (Dataset.join full_outer, integer Sum for order-exact totals)."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    ev = _events(sf_dir, ["user_id", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "cents": pc.round(pc.multiply(batch.column("value"), 100.0))
                       .cast(pa.int64()),
        })

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks

    sums = drop_empty_blocks(
        ev.map_batches(to_cents, batch_format="pyarrow")
          .groupby("user_id").aggregate(Sum("cents", alias_name="total_cents")),
        empty_schema=pa.schema([("user_id", pa.int64()),
                                ("total_cents", pa.int64())]))
    joined = cust.join(sums, join_type="full_outer",
                       num_partitions=_join_partitions(),
                       on=("c_custkey",), right_on=("user_id",))

    def project(t: pa.Table) -> pa.Table:
        names = t.column_names
        ckey = t.column("c_custkey")
        if "user_id" in names:
            ckey = pc.coalesce(ckey, t.column("user_id"))
        return pa.table({
            "id": ckey.cast(pa.int64()),
            "c_acctbal": t.column("c_acctbal"),
            "total_cents": t.column("total_cents"),
        })

    rows = sorted(joined.map_batches(project, batch_format="pyarrow")
                        .take_all(), key=lambda r: r["id"])
    return pa.table({
        "id": pa.array([r["id"] for r in rows], pa.int64()),
        "c_acctbal": pa.array([r["c_acctbal"] for r in rows], pa.float64()),
        "total_cents": pa.array([r["total_cents"] for r in rows], pa.int64()),
    })


def _q_hash_split_stats(sf_dir: str):
    """Deterministic train/val/test assignment (Knuth-hash ranges,
    partition-independent, zero shuffle) aggregated per split — the
    reproducible-eval-split primitive; the oracle re-derives the exact
    mod-2^32 predicate in SQL (pipelines/sampling.py:assign_split)."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.pipelines.sampling import assign_split

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    out = assign_split(docs, "doc_id", test_rate=0.05, val_rate=0.05,
                       seed=9)
    agg = out.groupby("split").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="total_chars"))
    rows = sorted(agg.take_all(), key=lambda r: r["split"])
    return pa.table({
        "split": pa.array([r["split"] for r in rows], pa.string()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
        "total_chars": pa.array([r["total_chars"] for r in rows],
                                pa.int64()),
    })


def _q_anti_join_shuffle(sf_dir: str):
    """Big-big ANTI join kept fully distributed: orders whose customer is
    NOT in the BUILDING segment — right side reduced map-side to distinct
    keys, ONE hash-shuffle left_outer join + null-marker filter; no driver
    key set (pipelines/joins.py:shuffle_anti_join)."""
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_anti_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.filter(expr="c_mktsegment == 'BUILDING'") \
               .select_columns(["c_custkey"])
    out = shuffle_anti_join(orders, cust, on="o_custkey",
                            right_on="c_custkey")
    rows = sorted(out.take_all(), key=lambda r: r["o_orderkey"])
    return pa.table({
        "o_orderkey": pa.array([r["o_orderkey"] for r in rows], pa.int64()),
        "o_custkey": pa.array([r["o_custkey"] for r in rows], pa.int64()),
    })


def _q_range_rolling_user(sf_dir: str):
    """Per-key time-RANGE rolling aggregate — SQL SUM() OVER (PARTITION BY
    user ORDER BY ts RANGE BETWEEN 1 HOUR PRECEDING AND CURRENT ROW) — on
    integer cents; peers (tied timestamps) share a frame so the result is
    deterministic with no tiebreak (pipelines/windows.py:range_rolling_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.windows import (
        range_rolling_by_key,
    )

    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts"),
            "event_id": batch.column("event_id"),
            "cents": pc.round(pc.multiply(batch.column("value"), 100.0))
                       .cast(pa.int64()),
        })

    out = range_rolling_by_key(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        "user_id", "ts", "cents", range_us=3_600_000_000)
    rows = sorted(out.select_columns(
        ["event_id", "rr_sum", "rr_n"]).take_all(),
        key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "rr_cents": pa.array([r["rr_sum"] for r in rows], pa.int64()),
        "rr_n": pa.array([r["rr_n"] for r in rows], pa.int64()),
    })


def _q_zorder_orders(sf_dir: str):
    """Z-order (Morton) clustering of orders along (o_custkey, o_orderkey):
    map-side bit-interleaved key + ONE distributed sort — the multi-column
    data-layout pass (Delta/Iceberg OPTIMIZE ZORDER BY).  The oracle
    recomputes the identical curve with shift/mask SQL, so the check is
    bit-exact on both the key and the resulting order
    (pipelines/zorder.py:cluster_by_zorder)."""
    from insurance_pdf_extractor_ray.pipelines.zorder import cluster_by_zorder

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    out = cluster_by_zorder(orders, ["o_custkey", "o_orderkey"], bits=16,
                            keep_key=True, tiebreak="o_orderkey")
    rows = out.select_columns(["__z", "o_orderkey"]).take_all()
    return pa.table({
        "zkey": pa.array([r["__z"] for r in rows], pa.int64()),
        "o_orderkey": pa.array([r["o_orderkey"] for r in rows], pa.int64()),
    })


def _q_merged_user_sessions(sf_dir: str):
    """Gaps-and-islands: each event opens a 30-minute activity interval;
    overlapping/touching intervals per user merge into maximal islands —
    one keyed shuffle, maximum.accumulate + reduceat interior
    (pipelines/intervals.py:merge_intervals_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.intervals import (
        merge_intervals_by_key,
    )

    ev = _events(sf_dir, ["user_id", "ts"])

    def to_iv(t: pa.Table) -> pa.Table:
        s = t.column("ts").cast(pa.int64())
        return pa.table({
            "user_id": t.column("user_id"),
            "s_us": s,
            "e_us": pc.add(s, 1_800_000_000),
        })

    out = merge_intervals_by_key(
        ev.map_batches(to_iv, batch_format="pyarrow"),
        "user_id", "s_us", "e_us", count_alias="n_events")
    rows = sorted(out.take_all(),
                  key=lambda r: (r["user_id"], r["s_us"]))
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "s_us": pa.array([r["s_us"] for r in rows], pa.int64()),
        "e_us": pa.array([r["e_us"] for r in rows], pa.int64()),
        "n_events": pa.array([r["n_events"] for r in rows], pa.int64()),
    })


def _q_union_by_name(sf_dir: str):
    """Schema-evolution union: two parquet 'generations' of documents with
    drifted columns unioned BY NAME — driver touches schemas only, every
    batch aligns map-side, zero shuffle
    (pipelines/schemaops.py:union_by_name)."""
    from insurance_pdf_extractor_ray.pipelines.schemaops import union_by_name

    docs = _documents(sf_dir, ["doc_id", "lang", "source", "n_chars"])
    gen1 = docs.filter(expr="lang == 'en'") \
               .select_columns(["doc_id", "source", "n_chars"])
    gen2 = docs.filter(expr="lang != 'en'") \
               .select_columns(["doc_id", "lang"])
    out = union_by_name([gen1, gen2])
    rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })


def _q_lead_next_value(sf_dir: str):
    """Per-key LEAD — next event's value in the user's timeline (the same
    vectorized shift as LAG with a negative offset;
    pipelines/windows.py:lag_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.windows import lag_by_key

    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"])
    out = lag_by_key(ds, "user_id", "ts", "value", offset=-1,
                     order_tiebreak="event_id", out_col="lead_value")
    rows = sorted(out.select_columns(["event_id", "lead_value"]).take_all(),
                  key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "lead_value": pa.array([r["lead_value"] for r in rows],
                               pa.float64()),
    })


def _q_gsets_source_lang(sf_dir: str):
    """GROUP BY GROUPING SETS ((source),(lang),()) — the generic grouping
    sets operator rollup/cube are sugar for; one finest-level shuffle, each
    set re-aggregates the bounded finest table
    (pipelines/sketches.py:grouping_sets_counts)."""
    from insurance_pdf_extractor_ray.pipelines.sketches import (
        grouping_sets_counts,
    )

    docs = _documents(sf_dir, ["source", "lang"])
    return grouping_sets_counts(docs, ["source", "lang"],
                                sets=[("source",), ("lang",), ()])


def _q_shuffled_docs_head(sf_dir: str):
    """Reproducible epoch shuffle: deterministic global order by a seeded
    64-bit mix of doc_id (same seed -> same order on any cluster shape),
    first 300 rows — the training-data shuffle primitive; the oracle
    replicates the mix in HUGEINT SQL
    (pipelines/sampling.py:global_shuffle)."""
    from insurance_pdf_extractor_ray.pipelines.sampling import global_shuffle

    docs = _documents(sf_dir, ["doc_id", "source"])
    rows = global_shuffle(docs, "doc_id", seed=13).limit(300).take_all()
    return pa.table({
        "pos": pa.array(range(1, len(rows) + 1), pa.int64()),
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
    })


def _q_kmeans_embeddings(sf_dir: str):
    """Full-data distributed Lloyd k-means (k=8, 5 iters): per-iteration
    one map_batches pass emitting exact int64 fixed-point partials — zero
    shuffle, constant driver state, bit-deterministic across partitioning
    and CPU counts.  Oracle pins the cross-validated output at the
    driver's correctness scale (pipelines/clustering.py:kmeans_lloyd)."""
    import numpy as np

    from insurance_pdf_extractor_ray.pipelines.clustering import kmeans_lloyd

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents, sizes, inertia = kmeans_lloyd(emb, k=8, iters=5, seed=0)
    norms = np.sqrt((cents ** 2).sum(axis=1))
    return pa.table({
        "cluster_id": pa.array(range(len(sizes)), pa.int64()),
        "size": pa.array(sizes.tolist(), pa.int64()),
        "centroid_norm": pa.array([round(float(x), 6) for x in norms],
                                  pa.float64()),
    })


def _q_q5_region_revenue(sf_dir: str):
    """TPC-H Q5 analog: revenue by customer nation within region ASIA for
    one order-date year.  Shape: aggregate-below-join (lineitem revenue
    pre-reduced per orderkey BEFORE the big-big join, so the shuffle moves
    distinct orderkeys, not line items), dims resolved by broadcast
    (region->nation->customer chain via ray.put lookups), ONE hash join +
    one small keyed groupby.  Exact int64 cents-of-cents accumulation."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import (
        broadcast_join,
        shuffle_join,
    )

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]) \
        .filter(expr="r_name == 'ASIA'")
    nat = broadcast_join(nation, region, on="n_regionkey",
                         right_on="r_regionkey", add_cols=["r_name"],
                         how="inner")
    cust = broadcast_join(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]), nat,
        on="c_nationkey", right_on="n_nationkey", add_cols=["n_name"],
        how="inner")

    lo = int(pd.Timestamp("1996-01-01").value // 1000)
    hi = int(pd.Timestamp("1997-01-01").value // 1000)

    def date_window(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64())
        keep = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(date_window, batch_format="pyarrow")
    # heavily-filtered (one year x one region); rebuilt from non-empty
    # blocks because the selective filters emit zero-column empties that
    # poison Dataset.join's schema resolution (object-store materialize,
    # never driver-resident)
    orders_n = drop_empty_blocks(
        broadcast_join(orders, cust, on="o_custkey", right_on="c_custkey",
                       add_cols=["n_name"], how="inner"),
        empty_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("n_name", pa.string())]))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    li_rev = drop_empty_blocks(
        li.map_batches(lambda b: _rev_i4(b, "l_orderkey"),
                       batch_format="pyarrow")
          .groupby("l_orderkey").aggregate(Sum("rev_i4",
                                               alias_name="rev_i4")),
        empty_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("rev_i4", pa.int64())]))
    j = shuffle_join(li_rev, orders_n, on="l_orderkey",
                     right_on="o_orderkey",
                     num_partitions=_join_partitions())
    agg = j.groupby("n_name").aggregate(Sum("rev_i4",
                                            alias_name="revenue_i4"))
    rows = sorted(agg.take_all(), key=lambda r: r["n_name"])
    return pa.table({
        "n_name": pa.array([r["n_name"] for r in rows], pa.string()),
        "revenue_i4": pa.array([r["revenue_i4"] for r in rows], pa.int64()),
    })


def _q_q3_unshipped_topk(sf_dir: str):
    """TPC-H Q3 analog: top-10 unshipped BUILDING-segment orders by
    revenue.  Same aggregate-below-join shape as Q5; the BUILDING customer
    keys prefilter orders via a broadcast semi-join (dimension-sized set —
    the bloom_semi_join path covers the big-big case); the final top-k
    sorts the aggregate-small per-order result on the driver."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import (
        broadcast_semi_join,
        shuffle_join,
    )

    cut = int(pd.Timestamp("1998-06-15").value // 1000)

    def unshipped(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("l_shipdate").cast(pa.int64()),
                                   cut))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice",
                                    "l_discount", "l_shipdate"]) \
        .map_batches(unshipped, batch_format="pyarrow")
    li_rev = drop_empty_blocks(
        li.map_batches(lambda b: _rev_i4(b, "l_orderkey"),
                       batch_format="pyarrow")
          .groupby("l_orderkey").aggregate(Sum("rev_i4",
                                               alias_name="revenue_i4")),
        empty_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("revenue_i4", pa.int64())]))

    bkeys = [r["c_custkey"] for r in
             _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
             .filter(expr="c_mktsegment == 'BUILDING'")
             .select_columns(["c_custkey"]).take_all()]

    def open_orders(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("o_orderdate").cast(pa.int64()),
                                cut))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(open_orders, batch_format="pyarrow")
    orders = broadcast_semi_join(orders, "o_custkey", bkeys)

    j = shuffle_join(li_rev, orders, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=_join_partitions())
    rows = j.take_all()  # one row per qualifying order: aggregate-small
    rows.sort(key=lambda r: (-r["revenue_i4"], r["l_orderkey"]))
    top = rows[:10]
    return pa.table({
        "l_orderkey": pa.array([r["l_orderkey"] for r in top], pa.int64()),
        "revenue_i4": pa.array([r["revenue_i4"] for r in top], pa.int64()),
        "o_orderdate": pa.array(
            [pd.Timestamp(r["o_orderdate"]).strftime("%Y-%m-%d")
             for r in top], pa.string()),
    })


def _q_count_min_users(sf_dir: str):
    """Count-Min sketch frequency estimates (pipelines/sketches.py:
    count_min_table) — integer counter merges commute, so the sketch is
    layout-deterministic and the oracle re-derives it EXACTLY in SQL."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.pipelines.sketches import (
        count_min_estimate, count_min_table)

    ds = _events(sf_dir, ["user_id"])
    cm = count_min_table(ds, "user_id", width=512, depth=4)

    def part(batch: pa.Table) -> pa.Table:
        k = batch.column("user_id").to_numpy(zero_copy_only=False)
        k = k[k < 60]
        u, c = np.unique(k, return_counts=True)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "_n": pa.array(c.astype(np.int64), pa.int64())})

    rows = (ds.map_batches(part, batch_format="pyarrow")
            .groupby("user_id").aggregate(Sum("_n", alias_name="exact"))
            ).take_all()
    rows.sort(key=lambda r: r["user_id"])
    users = np.array([r["user_id"] for r in rows], np.int64)
    est = count_min_estimate(cm, users, width=512, depth=4)
    return pa.table({
        "user_id": pa.array(users, pa.int64()),
        "est": pa.array(est, pa.int64()),
        "exact": pa.array([r["exact"] for r in rows], pa.int64()),
    })


def _q_bigram_logprob(sf_dir: str):
    """Corpus-bigram LM score per doc, Laplace-smoothed, micro-nat-quantized
    before reduction (pipelines/tfidf.py:bigram_logprob)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import bigram_logprob

    out = bigram_logprob(_documents(sf_dir, ["doc_id", "text"]),
                         "text", "doc_id")
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_bigrams": pa.array([r["n_bigrams"] for r in rows], pa.int64()),
        "bigram_lp_micro": pa.array(
            [r["bigram_lp_micro"] for r in rows], pa.int64()),
    })


def _q_readability(sf_dir: str):
    """Flesch-style readability micro-points per doc — three vectorized RE2
    counting kernels, zero shuffles (pipelines/textpipe.py:readability)."""
    from insurance_pdf_extractor_ray.pipelines.textpipe import readability

    out = readability(_documents(sf_dir, ["doc_id", "text"]),
                      "text", "doc_id")
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_words": pa.array([r["n_words"] for r in rows], pa.int64()),
        "n_sentences": pa.array([r["n_sentences"] for r in rows], pa.int64()),
        "n_syllables": pa.array([r["n_syllables"] for r in rows], pa.int64()),
        "fre_micro": pa.array([r["fre_micro"] for r in rows], pa.int64()),
    })


def _q_char_entropy(sf_dir: str):
    """Per-doc character-distribution Shannon entropy (junk detector) —
    one utf-32 reinterpret + lexsort run-lengths per batch, zero shuffles
    (pipelines/textpipe.py:char_entropy)."""
    from insurance_pdf_extractor_ray.pipelines.textpipe import char_entropy

    out = char_entropy(_documents(sf_dir, ["doc_id", "text"]),
                       "text", "doc_id")
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_chars_h": pa.array([r["n_chars_h"] for r in rows], pa.int64()),
        "char_entropy": pa.array(
            [r["char_entropy"] for r in rows], pa.float64()),
    })
    return _round_col(tbl, "char_entropy", 6)


def _q_user_event_entropy(sf_dir: str):
    """Per-user event-mix Shannon entropy — map-side (key,cat) pre-counts,
    ONE keyed shuffle of bounded count rows
    (pipelines/statagg.py:entropy_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import entropy_by_key

    out = entropy_by_key(_events(sf_dir, ["user_id", "event_type"]),
                         "user_id", "event_type")
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    tbl = pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "entropy": pa.array([r["entropy"] for r in rows], pa.float64()),
        "n_cats": pa.array([r["n_cats"] for r in rows], pa.int64()),
    })
    return _round_col(tbl, "entropy", 6)


def _q_interarrival(sf_dir: str):
    """Per-user inter-event gap statistics — sorted-multiset adjacent
    differences are tie-order invariant, so the per-key sort needs no
    tiebreak; one keyed shuffle, integer-microsecond exact."""

    def per_partition(part: pa.Table) -> pa.Table:
        n = part.num_rows
        if n == 0:
            z = pa.array([], pa.int64())
            return pa.table({"user_id": z, "n_events": z, "span_us": z,
                             "max_gap_us": z})
        part = part.take(pc.sort_indices(part, sort_keys=[
            ("user_id", "ascending"), ("ts", "ascending")]))
        ts = part.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        keys_np = part.column("user_id").to_numpy(zero_copy_only=False)
        new_key = np.r_[True, keys_np[1:] != keys_np[:-1]]
        starts = np.flatnonzero(new_key)
        last = np.append(starts[1:] - 1, n - 1)
        counts = np.diff(np.append(starts, n))
        # per-key max gap: adjacent diffs, cross-key positions masked to -1,
        # padded reduceat (single-event keys see only -1 -> typed null)
        gv = np.append(np.where(~new_key[1:], np.diff(ts), -1), -1)
        maxg = np.maximum.reduceat(gv, starts)
        null_g = maxg < 0
        return pa.table({
            "user_id": part.column("user_id").take(pa.array(starts, pa.int64())),
            "n_events": pa.array(counts, pa.int64()),
            "span_us": pa.array(ts[last] - ts[starts], pa.int64()),
            "max_gap_us": pa.array(np.where(null_g, 0, maxg), pa.int64(),
                                   mask=null_g),
        })

    from insurance_pdf_extractor_ray.dsutil import keyed_partition_map

    out = keyed_partition_map(_events(sf_dir, ["user_id", "ts"]),
                              "user_id", per_partition)
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "n_events": pa.array([r["n_events"] for r in rows], pa.int64()),
        "span_us": pa.array([r["span_us"] for r in rows], pa.int64()),
        "max_gap_us": pa.array([r["max_gap_us"] for r in rows], pa.int64()),
    })


def _q_embedding_covariance(sf_dir: str):
    """Distributed dim×dim covariance — int64-quantized co-moment partials
    (exact float32 products), ONE (i,j)-keyed combine of d(d+1)/2-row
    partials; float col derives from the same integers both sides
    (pipelines/similarity.py:covariance_matrix)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        covariance_matrix)

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
    return covariance_matrix(emb, "embedding")


def _q_lang_drift(sf_dir: str):
    """Per-source language-distribution drift (KL bits + chi²) vs the corpus
    marginal — one keyed shuffle of bounded (key,cat) pre-counts
    (pipelines/profile.py:drift_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.profile import drift_by_key

    out = drift_by_key(_documents(sf_dir, ["source", "lang"]),
                       "source", "lang")
    return _round_col(_round_col(out, "kl_bits", 6), "chi2", 6)


def _q_similarity_triangles(sf_dir: str):
    """Neighborhood-coherence audit: exact inner-product threshold graph
    over an id-capped embedding pool (integer-dot quantization — every edge
    SQL-re-derivable), then distributed triangle counting via the canonical
    two-join enumeration (pipelines/graph.py:ip_threshold_graph,
    triangle_stats)."""
    import math

    import ray.data

    from insurance_pdf_extractor_ray.pipelines.graph import (
        ip_threshold_graph, triangle_stats)

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).filter(expr="vec_id < 400")
    edges = ip_threshold_graph(emb, "embedding", "vec_id", tau=0.25)
    rows = triangle_stats(edges).take_all()
    rows.sort(key=lambda r: r["node"])
    cc = [r["clustering"] for r in rows]
    cc = [None if (c is None or math.isnan(c)) else _round_away(c, 6)
          for c in cc]
    return pa.table({
        "node": pa.array([r["node"] for r in rows], pa.int64()),
        "degree": pa.array([r["degree"] for r in rows], pa.int64()),
        "triangles": pa.array([r["triangles"] for r in rows], pa.int64()),
        "clustering": pa.array(cc, pa.float64()),
    })


def _q_bpe_merges(sf_dir: str):
    """BPE tokenizer-merge induction (Sennrich 2016): distributed word
    count (map-side pre-reduce, ONE bounded shuffle) + vocab-bounded driver
    merge loop; greedy-apply semantics proven identical to SQL replace via
    the double-space encoding (pipelines/tfidf.py:bpe_train)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import bpe_train

    return bpe_train(_documents(sf_dir, ["text"]), "text", num_merges=8)


