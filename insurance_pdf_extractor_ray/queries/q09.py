"""Round-3 additions, batch 9: market-basket association lift, Kaplan-Meier
churn survival, linear multi-touch attribution, HITS hubs/authorities.

Each query returns a deterministic Arrow table whose value hash the driver
compares against the DuckDB oracle in ``registry.oracle_sql()``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ._shared import _events, _read, _round_col

__all__ = [
    "_q_basket_lift_pairs",
    "_q_kaplan_meier_churn",
    "_q_attribution_linear",
    "_q_hits_scores",
    "_q_dbscan_embeddings",
    "_q_label_propagation",
    "_q_dim_mi_ranking",
    "_q_agg_view_incremental",
    "_q_migrated_store_stats",
    "_q_session_windows_nullkeys",
]

_DAY_US = 86_400_000_000


def _q_basket_lift_pairs(sf_dir: str):
    """Market-basket association pairs over order baskets (support >= 2,
    lift emitted) — one distinct-(basket, item) shuffle shared by pair
    counts / item supports / basket count, bounded triu pair explode,
    broadcast support lookup (pipelines/behavior.py:association_lift)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import association_lift

    out = association_lift(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]),
        "l_orderkey", "l_partkey", min_support=2)
    rows = sorted(out.take_all(), key=lambda r: (r["item_a"], r["item_b"]))
    t = pa.table({
        "item_a": pa.array([r["item_a"] for r in rows], pa.int64()),
        "item_b": pa.array([r["item_b"] for r in rows], pa.int64()),
        "n_ab": pa.array([r["n_ab"] for r in rows], pa.int64()),
        "c_a": pa.array([r["c_a"] for r in rows], pa.int64()),
        "c_b": pa.array([r["c_b"] for r in rows], pa.int64()),
        "lift": pa.array([r["lift"] for r in rows], pa.float64()),
    })
    return _round_col(t, "lift", 9)


def _q_kaplan_meier_churn(sf_dir: str):
    """Kaplan-Meier survival over user lifetimes (event = last activity
    more than 12 hours before corpus end, else right-censored) — two keyed
    combines to a day-bounded (t, d, c) table, vectorized at-risk reverse
    cumsum + sequential cumprod (pipelines/statagg.py:kaplan_meier)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import kaplan_meier

    t = kaplan_meier(_events(sf_dir, ["user_id", "ts"]),
                     "user_id", "ts", censor_horizon_us=_DAY_US // 2)
    return _round_col(t, "survival", 9)


def _q_attribution_linear(sf_dir: str):
    """Linear multi-touch attribution: each purchase's value split equally
    over the user's view/click touches in the trailing 7 days (no touch →
    'direct'), micro-unit credits rounded per (conversion, channel) so the
    channel totals are exact int64 sums
    (pipelines/behavior.py:attribution_linear)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import (
        attribution_linear,
    )

    t = attribution_linear(
        _events(sf_dir, ["user_id", "ts", "event_type", "value"]),
        "user_id", "ts", "event_type", "value",
        conversion_type="purchase", touch_types=["view", "click"],
        window_us=7 * _DAY_US)
    idx = np.argsort(t.column("channel").to_numpy(zero_copy_only=False))
    return t.take(pa.array(idx, pa.int64()))


def _q_hits_scores(sf_dir: str):
    """HITS hubs-and-authorities (2 integer-exact authority rounds,
    unnormalized) over the bipartite customer→part purchase graph — the
    pagerank exchange shape with exact int64 scores; top-20 per side under
    (score desc, id) (pipelines/graph.py:hits_bipartite)."""
    from insurance_pdf_extractor_ray.pipelines.dedup import (
        join_partitions_for,
    )
    from insurance_pdf_extractor_ray.pipelines.graph import hits_bipartite
    from insurance_pdf_extractor_ray.pipelines.rankagg import grouped_top_k

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_partkey"]).materialize()
    P = join_partitions_for(li.count())
    from insurance_pdf_extractor_ray.dsutil import distinct_rows_by

    edges = distinct_rows_by(
        orders.join(li, join_type="inner", num_partitions=P,
                    on=("o_orderkey",), right_on=("l_orderkey",))
        .select_columns(["o_custkey", "l_partkey"]),
        ["o_custkey", "l_partkey"])
    scores = hits_bipartite(edges, "o_custkey", "l_partkey", n_iter=2)
    top = grouped_top_k(scores, "side", ["score", "id"], [True, False], 20)
    rows = sorted(top.take_all(),
                  key=lambda r: (r["side"], -r["score"], r["id"]))
    return pa.table({
        "side": pa.array([r["side"] for r in rows], pa.string()),
        "id": pa.array([r["id"] for r in rows], pa.int64()),
        "score": pa.array([r["score"] for r in rows], pa.int64()),
    })


def _q_dbscan_embeddings(sf_dir: str):
    """DBSCAN over the id-capped embedding pool (tau = 0.3125 exact-binary
    quantized cosine-IP threshold, min_pts = 3): exact integer threshold
    graph, map-side degree partials, core-core components (driver UF /
    min-label rounds auto-switch), broadcast-lookup border labeling
    (pipelines/clustering.py:dbscan_embeddings)."""
    from insurance_pdf_extractor_ray.pipelines.clustering import (
        dbscan_embeddings,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"]).filter(
        expr="vec_id < 400")
    return dbscan_embeddings(ds, "embedding", "vec_id",
                             tau=0.3125, min_pts=3)


def _q_label_propagation(sf_dir: str):
    """2-round synchronous label propagation over the capped exact
    similarity graph (seeds = vec_id < 100 keep their true label; majority
    vote, ties to smallest label) — per-round zero-shuffle broadcast vote
    pass + one (node,label)-keyed combine, integer-exact throughout
    (pipelines/clustering.py:label_propagation)."""
    from insurance_pdf_extractor_ray.pipelines.clustering import (
        label_propagation,
    )

    ds = _read(sf_dir, "embeddings",
               ["vec_id", "embedding", "label"]).filter(expr="vec_id < 400")
    return label_propagation(ds, "embedding", "vec_id", "label",
                             seed_pred=lambda ids: ids < 100,
                             tau=0.3125, n_rounds=2)


def _q_dim_mi_ranking(sf_dir: str):
    """Per-dimension mutual information I(sign(x_d); label) — one pass of
    (dims x labels)-bounded integer count partials, ONE keyed combine,
    driver plug-in estimate over the bounded table
    (pipelines/evalstats.py:dim_label_mi)."""
    from insurance_pdf_extractor_ray.pipelines.evalstats import dim_label_mi

    t = dim_label_mi(_read(sf_dir, "embeddings", ["embedding", "label"]),
                     "embedding", "label")
    return _round_col(t, "mi", 6)


def _q_agg_view_incremental(sf_dir: str):
    """Incremental additive-aggregate view maintenance: the per-user
    (count, fixed-point value sum) view is built from the even-event_id
    half of the stream, bucketed at rest, then the odd half is merged in
    with ZERO base exchange (one increment map pass into the bucket layout
    + per-bucket local combine) — result must equal a full GROUP BY
    recompute over the whole stream
    (pipelines/cdc.py:merge_aggregate_bucketed)."""
    import tempfile

    import pyarrow.compute as pc

    from insurance_pdf_extractor_ray.pipelines.bucketed import write_bucketed
    from insurance_pdf_extractor_ray.pipelines.cdc import (
        merge_aggregate_bucketed,
    )

    ev = _events(sf_dir, ["event_id", "user_id", "value"])

    def partials(half):
        def f(b: pa.Table) -> pa.Table:
            keep = pc.equal(pc.bit_wise_and(b.column("event_id"), 1), half)
            b = b.filter(keep)
            v = b.column("value").to_numpy(zero_copy_only=False)
            return pa.table({
                "user_id": b.column("user_id"),
                "n": pa.array(np.ones(b.num_rows, np.int64)),
                "v_i6": pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64)),
            })
        return f

    view_root = tempfile.mkdtemp(prefix="ipe_aggview_")
    base = ev.map_batches(partials(0), batch_format="pyarrow")
    # compact the base half to one row per key before writing the view
    from ray.data.aggregate import Sum

    base_agg = base.groupby("user_id").aggregate(
        Sum("n", alias_name="n"), Sum("v_i6", alias_name="v_i6"))
    write_bucketed(base_agg, view_root, "user_id", 8)
    inc = ev.map_batches(partials(1), batch_format="pyarrow")
    out = merge_aggregate_bucketed(view_root, inc, "user_id",
                                   ["n", "v_i6"])
    rows = sorted(out.take_all(), key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "v_i6": pa.array([r["v_i6"] for r in rows], pa.int64()),
    })


def _q_migrated_store_stats(sf_dir: str):
    """End-to-end at-rest schema migration (reference
    scripts/migrate_database.py:16-120 analog): write the documents table
    as a bucketed layout, run ``migrate_store`` over it (add a COMPUTED
    text_len column, add a constant schema_rev, rename lang -> language),
    then aggregate the MIGRATED layout per language.  The oracle derives
    the same numbers straight from the source table — equality proves the
    rewrite preserved every row and computed the new column correctly."""
    import glob as _glob
    import tempfile

    import ray.data

    from insurance_pdf_extractor_ray.pipelines.bucketed import write_bucketed
    from insurance_pdf_extractor_ray.state.migrate import migrate_store

    def text_len_col(t: pa.Table) -> pa.Array:
        import pyarrow.compute as pc

        return pc.utf8_length(t.column("text")).cast(pa.int64())

    root = tempfile.mkdtemp(prefix="ipe_migrate_q_")
    write_bucketed(
        _read(sf_dir, "documents", ["doc_id", "text", "lang"]),
        root, "doc_id", 8)
    res = migrate_store(
        root,
        add_columns={"text_len": ("int64", text_len_col),
                     "schema_rev": ("string", "v2")},
        rename_columns={"lang": "language"},
        schema_version="v2")
    assert res["units_migrated"] == 8, res

    from ray.data.aggregate import Count, Sum

    files = sorted(_glob.glob(f"{root}/_bucket=*/*.parquet"))
    out = (ray.data.read_parquet(files,
                                 columns=["language", "text_len",
                                          "schema_rev"])
           .groupby(["language", "schema_rev"])
           .aggregate(Count(alias_name="n"),
                      Sum("text_len", alias_name="sum_text_len")))
    rows = sorted(out.take_all(), key=lambda r: r["language"])
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    return pa.table({
        "language": pa.array([r["language"] for r in rows], pa.string()),
        "schema_rev": pa.array([r["schema_rev"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "sum_text_len": pa.array([r["sum_text_len"] for r in rows],
                                 pa.int64()),
    })


def _q_session_windows_nullkeys(sf_dir: str):
    """Null-group semantics under the oracle gate (round 4): every 13th
    event's user_id is nulled, then per-user 10-minute sessions run over
    the nullable key.  SQL's ``PARTITION BY user_id`` puts all NULLs in
    ONE partition; the engine's null-safe run masks (dsutil.adjacent_change)
    must reproduce that exactly — before round 4, numeric-null keys became
    NaN in the kernels and each null row formed its own session."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.windows import session_windows

    def nullify(b: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.equal(
            pc.subtract(b.column("event_id"),
                        pc.multiply(pc.divide(b.column("event_id"), 13), 13)),
            0)
        uid = pc.if_else(mask, pa.nulls(b.num_rows, pa.int64()),
                         b.column("user_id"))
        return pa.table({"user_id": uid, "ts": b.column("ts"),
                         "event_id": b.column("event_id")})

    ds = session_windows(
        _events(sf_dir, ["user_id", "ts", "event_id"])
        .map_batches(nullify, batch_format="pyarrow"),
        "user_id", "ts", gap_us=600_000_000, tiebreak_col="event_id")
    rows = ds.take_all()
    rows.sort(key=lambda r: (r["user_id"] is not None,
                             r["user_id"] or 0, r["session_id"]))
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "session_id": pa.array([r["session_id"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "start_us": pa.array([r["start_us"] for r in rows], pa.int64()),
        "end_us": pa.array([r["end_us"] for r in rows], pa.int64()),
    })
