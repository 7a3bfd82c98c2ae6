"""Query bodies: round-3 TPC-H analog additions (Q4/Q16/Q17/Q22 shapes
adapted to the synthetic schema — no l_commitdate/partsupp/phone columns,
so each keeps the decision shape of its original with the columns that
exist)."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ._shared import *  # noqa: F401,F403

__all__ = ['_q_q4_late_orders', '_q_q16_brand_size_suppliers',
           '_q_q17_small_qty_revenue', '_q_q22_idle_rich',
           '_q_embedding_incremental', '_q_q12_priority_by_flag',
           '_q_q15_top_supplier', '_q_q20_bulky_suppliers']


def _q_embedding_incremental(sf_dir: str):
    """Incremental embedding near-dup dedup against the at-rest sign-bucket
    index (pipelines/embindex.py): increment 1 = the embeddings table,
    committed; increment 2 = planted SCALED copies (x2.0 — unit-identical,
    so the sign bucket matches deterministically and cosine is exactly 1)
    of the vec_id%7==0 rows under shifted ids, plus NEGATED copies of the
    vec_id%11==0 rows (cosine -1: must survive).  Returns the DROPPED ids.
    Oracle is REAL SQL: the planted copy ids — sound because the table's
    max natural off-diagonal cosine is 0.51 << the 0.95 threshold, so
    nothing else can cross it."""
    import os as _os
    import tempfile

    import ray.data

    from insurance_pdf_extractor_ray.pipelines.embindex import (
        embedding_dedup_incremental, embedding_index_append)

    ds = ray.data.read_parquet(_os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    index_dir = tempfile.mkdtemp(prefix="ipe_embidx_")
    kept, rows = embedding_dedup_incremental(
        ds, index_dir, "embedding", "vec_id", threshold=0.95, n_planes=12,
        tmp_dir=tempfile.mkdtemp(prefix="ipe_embinc_a_"))
    assert kept.count() == ds.count()  # no natural pair reaches 0.95
    embedding_index_append(index_dir, rows)

    def plant(t: pa.Table) -> pa.Table:
        ids = t.column("vec_id").to_numpy(zero_copy_only=False)
        emb = t.column("embedding")
        cols_id, cols_emb = [], []
        for i in range(t.num_rows):
            v = np.asarray(emb[i].as_py(), np.float32)
            if ids[i] % 7 == 0:
                cols_id.append(int(ids[i]) + 1_000_000)
                cols_emb.append((v * np.float32(2.0)).tolist())
            if ids[i] % 11 == 0:
                cols_id.append(int(ids[i]) + 2_000_000)
                cols_emb.append((-v).tolist())
        return pa.table({"vec_id": pa.array(cols_id, pa.int64()),
                         "embedding": pa.array(cols_emb,
                                               pa.list_(pa.float32()))})

    inc2 = ds.map_batches(plant, batch_format="pyarrow")
    kept2, _ = embedding_dedup_incremental(
        inc2, index_dir, "embedding", "vec_id", threshold=0.95, n_planes=12,
        tmp_dir=tempfile.mkdtemp(prefix="ipe_embinc_b_"))
    kept2_ids = set(r["vec_id"] for r in
                    kept2.select_columns(["vec_id"]).take_all())
    all2 = [r["vec_id"] for r in
            inc2.select_columns(["vec_id"]).take_all()]
    dropped = sorted(set(all2) - kept2_ids)
    return pa.table({"vec_id": pa.array(dropped, pa.int64())})


def _q_q4_late_orders(sf_dir: str):
    """TPC-H Q4 analog: per-priority count of 1996-Q1 orders with at least
    one lineitem shipped >60 days after the order date.  The EXISTS
    collapses below the join: per-orderkey MAX(l_shipdate) is a pre-reduce
    (EXISTS(ship > od+60) == max_ship > od+60), then ONE hash join against
    the quarter-filtered orders and a priority-sized count combine."""
    from ray.data.aggregate import Max, Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join

    def ship_us(b: pa.Table) -> pa.Table:
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "ship_us": b.column("l_shipdate").cast(pa.int64()),
        })

    max_ship = drop_empty_blocks(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_shipdate"])
        .map_batches(ship_us, batch_format="pyarrow")
        .groupby("l_orderkey").aggregate(Max("ship_us", alias_name="max_ship")),
        empty_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("max_ship", pa.int64())]))

    lo = int(pd.Timestamp("1996-01-01").value // 1000)
    hi = int(pd.Timestamp("1996-04-01").value // 1000)

    def quarter(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64())
        keep = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        t = t.filter(keep)
        return pa.table({"o_orderkey": t.column("o_orderkey"),
                         "od_us": t.column("o_orderdate").cast(pa.int64()),
                         "o_orderpriority": t.column("o_orderpriority")})

    orders = drop_empty_blocks(
        _read(sf_dir, "orders",
              ["o_orderkey", "o_orderdate", "o_orderpriority"])
        .map_batches(quarter, batch_format="pyarrow"),
        empty_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("od_us", pa.int64()),
                                ("o_orderpriority", pa.string())]))

    j = shuffle_join(orders, max_ship, on="o_orderkey", right_on="l_orderkey",
                     num_partitions=_join_partitions())
    sixty_days_us = 60 * 86_400_000_000

    def late(t: pa.Table) -> pa.Table:
        keep = pc.greater(t.column("max_ship"),
                          pc.add(t.column("od_us"), sixty_days_us))
        t = t.filter(keep)
        return pa.table({"o_orderpriority": t.column("o_orderpriority"),
                         "_one": pa.array(np.ones(t.num_rows, np.int64))})

    out = (j.map_batches(late, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("_one", alias_name="n_late")))
    rows = sorted(out.take_all(), key=lambda r: r["o_orderpriority"])
    return pa.table({
        "o_orderpriority": pa.array([r["o_orderpriority"] for r in rows],
                                    pa.string()),
        "n_late": pa.array([r["n_late"] for r in rows], pa.int64()),
    })


def _q_q16_brand_size_suppliers(sf_dir: str):
    """TPC-H Q16 analog (no partsupp: supplier-part pairs come from
    lineitem): distinct suppliers per (brand, size bucket), one brand
    excluded.  Part attributes stay a DISTRIBUTED side: lineitem reduces
    map-side to distinct (part, supp) pairs, which shuffle-join the
    filtered part dimension (join_partitions_for-sized) — no dimension
    table is ever collected on the driver."""
    from ray.data.aggregate import Sum

    from ..dsutil import distinct_rows_by, drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import join_partitions_for
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join

    # part attributes stay DISTRIBUTED (no dimension take_all): prep the
    # filtered (partkey, brand, bucket) side, reduce lineitem to distinct
    # (part, supp) pairs, then one join_partitions_for-sized shuffle join
    def part_prep(b: pa.Table) -> pa.Table:
        t = b.filter(pc.invert(pc.equal(b.column("p_brand"), "Brand#45")))
        size = t.column("p_size").to_numpy(zero_copy_only=False)
        return pa.table({"p_partkey": t.column("p_partkey"),
                         "p_brand": t.column("p_brand"),
                         "size_bucket": pa.array(size % 5, pa.int64())})

    parts_ds = _read(sf_dir, "part", ["p_partkey", "p_brand", "p_size"]) \
        .map_batches(part_prep, batch_format="pyarrow")

    def local_pairs(b: pa.Table) -> pa.Table:
        return b.group_by(["l_partkey", "l_suppkey"]).aggregate([])

    li_pairs = distinct_rows_by(
        _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])
        .map_batches(local_pairs, batch_format="pyarrow"),
        ["l_partkey", "l_suppkey"]).materialize()
    joined = drop_empty_blocks(
        shuffle_join(li_pairs, parts_ds, on="l_partkey",
                     right_on="p_partkey",
                     num_partitions=join_partitions_for(li_pairs.count())),
        empty_schema=pa.schema([
            ("l_partkey", pa.int64()), ("l_suppkey", pa.int64()),
            ("p_partkey", pa.int64()), ("p_brand", pa.string()),
            ("size_bucket", pa.int64())]))
    distinct = distinct_rows_by(
        joined.select_columns(["p_brand", "size_bucket", "l_suppkey"]),
        ["p_brand", "size_bucket", "l_suppkey"])

    def one(t: pa.Table) -> pa.Table:
        return t.append_column("_one",
                               pa.array(np.ones(t.num_rows, np.int64)))

    out = (distinct.map_batches(one, batch_format="pyarrow")
           .groupby(["p_brand", "size_bucket"])
           .aggregate(Sum("_one", alias_name="supplier_cnt")))
    rows = sorted(out.take_all(),
                  key=lambda r: (-r["supplier_cnt"], r["p_brand"],
                                 r["size_bucket"]))
    return pa.table({
        "p_brand": pa.array([r["p_brand"] for r in rows], pa.string()),
        "size_bucket": pa.array([r["size_bucket"] for r in rows], pa.int64()),
        "supplier_cnt": pa.array([r["supplier_cnt"] for r in rows],
                                 pa.int64()),
    })


def _q_q17_small_qty_revenue(sf_dir: str):
    """TPC-H Q17 analog: revenue from small-quantity lineitems of one
    brand's parts, "small" = quantity below 0.2x that part's average.  The
    threshold compare is INTEGER-exact on both sides (5*qty_i2*cnt <
    sum_qty_i2 — no float average crosses the wire).  Brand partkeys prune
    the per-part aggregate BEFORE its shuffle; the per-part (sum,cnt) map
    is brand-sized and broadcast for the second, zero-shuffle scoring
    pass."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks

    # Dataset-side dimension filter: only Brand#23 part keys reach the
    # driver (never the full part table)
    brand_keys = _filtered_keys(
        sf_dir, "part", "p_partkey", ["p_partkey", "p_brand"],
        lambda b: pc.equal(b.column("p_brand"), "Brand#23"))
    bref = _ray.put(brand_keys)

    def qty_partial(b: pa.Table) -> pa.Table:
        keys = _ray.get(bref)
        part = b.column("l_partkey").to_numpy(zero_copy_only=False)
        keep = np.isin(part, keys)
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)[keep]
        qi = np.floor(q * 100.0 + 0.5).astype(np.int64)
        return pa.table({
            "l_partkey": pa.array(part[keep], pa.int64()),
            "sq": pa.array(qi, pa.int64()),
            "c": pa.array(np.ones(keep.sum(), np.int64)),
        })

    per_part = drop_empty_blocks(
        _read(sf_dir, "lineitem", ["l_partkey", "l_quantity"])
        .map_batches(qty_partial, batch_format="pyarrow")
        .groupby("l_partkey")
        .aggregate(Sum("sq", alias_name="sq"), Sum("c", alias_name="c")),
        empty_schema=pa.schema([("l_partkey", pa.int64()),
                                ("sq", pa.int64()), ("c", pa.int64())]))
    rows = per_part.take_all()  # brand-sized: ~1/|brands| of parts
    ppk = np.array([r["l_partkey"] for r in rows], np.int64)
    order = np.argsort(ppk)
    ppk = ppk[order]
    psq = np.array([r["sq"] for r in rows], np.int64)[order]
    pc_ = np.array([r["c"] for r in rows], np.int64)[order]
    tref = _ray.put((ppk, psq, pc_))

    def score(b: pa.Table) -> pa.Table:
        kpk, ksq, kc = _ray.get(tref)
        if len(kpk) == 0:
            return pa.table({"_s": pa.array([0], pa.int64())})
        part = b.column("l_partkey").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(kpk, part)
        ok = (pos < len(kpk)) & (kpk[np.minimum(pos, len(kpk) - 1)] == part)
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        qi = np.floor(q * 100.0 + 0.5).astype(np.int64)
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        pos = np.minimum(pos, len(kpk) - 1)
        small = ok & (5 * qi * kc[pos] < ksq[pos])
        rev = np.floor(ep[small] * 10000.0 + 0.5).astype(np.int64)
        return pa.table({"_s": pa.array([int(rev.sum())], pa.int64())})

    agg = (_read(sf_dir, "lineitem",
                 ["l_partkey", "l_quantity", "l_extendedprice"])
           .map_batches(score, batch_format="pyarrow")
           .aggregate(Sum("_s", alias_name="revenue_i4")))
    return pa.table({"revenue_i4": pa.array([agg["revenue_i4"] or 0],
                                            pa.int64())})


def _q_q22_idle_rich(sf_dir: str):
    """TPC-H Q22 analog: per-nation count and balance of above-average
    customers with no RECENT order (none since 2001-01-01 — every customer
    in the synthetic data has SOME order, so the lapse window is what makes
    the anti-join bite).  The scalar subquery threshold compares
    INTEGER-exactly (bal_i2 * n_pos > sum_i2); the NOT EXISTS is one
    left_anti hash join against the window's distinct custkeys."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions

    def bal_i2(b: pa.Table) -> pa.Table:
        v = b.column("c_acctbal").to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": b.column("c_custkey"),
            "c_nationkey": b.column("c_nationkey"),
            "bal_i2": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64),
                               pa.int64()),
        })

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_nationkey", "c_acctbal"]) \
        .map_batches(bal_i2, batch_format="pyarrow").materialize()

    def pos_partial(b: pa.Table) -> pa.Table:
        v = b.column("bal_i2").to_numpy(zero_copy_only=False)
        p = v[v > 0]
        return pa.table({"s": pa.array([int(p.sum())], pa.int64()),
                         "n": pa.array([len(p)], pa.int64())})

    g = cust.map_batches(pos_partial, batch_format="pyarrow") \
        .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
    sum_i2, n_pos = int(g["s"]), int(g["n"])

    cutoff = int(pd.Timestamp("2001-01-01").value // 1000)

    def recent(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64())
        return t.filter(pc.greater_equal(d, cutoff)) \
                .select(["o_custkey"])

    from ..dsutil import distinct_rows_by

    ordered = drop_empty_blocks(
        distinct_rows_by(
            _read(sf_dir, "orders", ["o_custkey", "o_orderdate"])
            .map_batches(recent, batch_format="pyarrow"), "o_custkey"),
        empty_schema=pa.schema([("o_custkey", pa.int64())]))
    idle = cust.join(ordered, join_type="left_anti",
                     num_partitions=_join_partitions(),
                     on=("c_custkey",), right_on=("o_custkey",))

    def rich(t: pa.Table) -> pa.Table:
        if "bal_i2" not in t.column_names:
            return pa.table({"c_nationkey": pa.array([], pa.int64()),
                             "bal_i2": pa.array([], pa.int64()),
                             "_one": pa.array([], pa.int64())})
        v = t.column("bal_i2").to_numpy(zero_copy_only=False)
        keep = v * n_pos > sum_i2
        t = t.filter(pa.array(keep))
        return pa.table({"c_nationkey": t.column("c_nationkey"),
                         "bal_i2": t.column("bal_i2"),
                         "_one": pa.array(np.ones(t.num_rows, np.int64))})

    out = (idle.map_batches(rich, batch_format="pyarrow")
           .groupby("c_nationkey")
           .aggregate(Sum("_one", alias_name="n_cust"),
                      Sum("bal_i2", alias_name="bal_i2")))
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation",
                             ["n_nationkey", "n_name"]).take_all()}
    # the oracle orders by name: "NATION_10" < "NATION_2" lexicographically
    rows = sorted(out.take_all(), key=lambda r: nation[r["c_nationkey"]])
    return pa.table({
        "n_name": pa.array([nation[r["c_nationkey"]] for r in rows],
                           pa.string()),
        "n_cust": pa.array([r["n_cust"] for r in rows], pa.int64()),
        "bal_i2": pa.array([r["bal_i2"] for r in rows], pa.int64()),
    })


def _q_q12_priority_by_flag(sf_dir: str):
    """TPC-H Q12 analog (returnflag stands in for shipmode): per returnflag,
    high- vs low-priority line counts among 1996 shipments.  Lines
    pre-reduce per (orderkey, flag) BEFORE the join (aggregate-below-join),
    then ONE hash join against the pruned orders and a flag-sized
    conditional combine."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join

    lo = int(pd.Timestamp("1996-01-01").value // 1000)
    hi = int(pd.Timestamp("1997-01-01").value // 1000)

    def year_lines(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate").cast(pa.int64())
        b = b.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "l_returnflag": b.column("l_returnflag"),
            "_n": pa.array(np.ones(b.num_rows, np.int64)),
        })

    lines = drop_empty_blocks(
        _read(sf_dir, "lineitem",
              ["l_orderkey", "l_returnflag", "l_shipdate"])
        .map_batches(year_lines, batch_format="pyarrow")
        .groupby(["l_orderkey", "l_returnflag"])
        .aggregate(Sum("_n", alias_name="_n")),
        empty_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("l_returnflag", pa.string()),
                                ("_n", pa.int64())]))
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])
    j = shuffle_join(lines, orders, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=_join_partitions())

    def split(t: pa.Table) -> pa.Table:
        pr = t.column("o_orderpriority").to_numpy(zero_copy_only=False)
        n = t.column("_n").to_numpy(zero_copy_only=False)
        high = np.isin(pr, ("1-URGENT", "2-HIGH"))
        return pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "_h": pa.array(np.where(high, n, 0), pa.int64()),
            "_l": pa.array(np.where(high, 0, n), pa.int64()),
        })

    out = (j.map_batches(split, batch_format="pyarrow")
            .groupby("l_returnflag")
            .aggregate(Sum("_h", alias_name="high_line_count"),
                       Sum("_l", alias_name="low_line_count")))
    rows = sorted(out.take_all(), key=lambda r: r["l_returnflag"])
    return pa.table({
        "l_returnflag": pa.array([r["l_returnflag"] for r in rows],
                                 pa.string()),
        "high_line_count": pa.array([r["high_line_count"] for r in rows],
                                    pa.int64()),
        "low_line_count": pa.array([r["low_line_count"] for r in rows],
                                   pa.int64()),
    })


def _q_q15_top_supplier(sf_dir: str):
    """TPC-H Q15 analog: the top-revenue supplier of 1996H1 (ties would all
    surface; the data has a unique max at both test scales).  Per-supplier
    revenue is an integer partial-combine; the max and name resolve on the
    supplier-sized result."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks

    lo = int(pd.Timestamp("1996-01-01").value // 1000)
    hi = int(pd.Timestamp("1996-07-01").value // 1000)

    def partial(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate").cast(pa.int64())
        b = b.filter(pc.and_(pc.greater_equal(d, lo), pc.less(d, hi)))
        return _rev_i4(b, "l_suppkey")

    rev = drop_empty_blocks(
        _read(sf_dir, "lineitem",
              ["l_suppkey", "l_shipdate", "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey").aggregate(Sum("rev_i4", alias_name="revenue_i4")),
        empty_schema=pa.schema([("l_suppkey", pa.int64()),
                                ("revenue_i4", pa.int64())]))
    # distributed max + equality filter: only the winning row(s) reach the
    # driver, and the name fetch is bounded by the winner set (the
    # supplier-sized aggregate and the supplier dimension both stay
    # Dataset-side)
    rev = rev.materialize()     # consumed twice: max scalar + filter
    best = rev.max("revenue_i4")
    top = sorted(r["l_suppkey"] for r in
                 rev.filter(expr=f"revenue_i4 == {int(best)}").take_all())
    need = np.array(top, np.int64)
    sup_tbl = _filtered_dim(
        sf_dir, "supplier", ["s_suppkey", "s_name"],
        lambda b: pa.array(np.isin(
            b.column("s_suppkey").to_numpy(zero_copy_only=False), need)))
    names = dict(zip(sup_tbl.column("s_suppkey").to_pylist(),
                     sup_tbl.column("s_name").to_pylist()))
    return pa.table({
        "s_suppkey": pa.array(top, pa.int64()),
        "s_name": pa.array([names[k] for k in top], pa.string()),
        "revenue_i4": pa.array([best] * len(top), pa.int64()),
    })


def _q_q20_bulky_suppliers(sf_dir: str):
    """TPC-H Q20 analog (no partsupp: availability comes from shipped
    quantity): suppliers who moved > 1500.00 total quantity of 'small%'
    parts.  Part keys broadcast once (np.isin prunes BEFORE the per-supplier
    combine); the threshold gate and name lookup run on the supplier-sized
    result."""
    import ray as _ray
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks

    keys = np.array(sorted(
        r["p_partkey"] for r in _read(sf_dir, "part",
                                      ["p_partkey", "p_name"]).take_all()
        if r["p_name"].startswith("small")), np.int64)
    ref = _ray.put(keys)

    def partial(b: pa.Table) -> pa.Table:
        pk = _ray.get(ref)
        part = b.column("l_partkey").to_numpy(zero_copy_only=False)
        keep = np.isin(part, pk)
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)[keep]
        return pa.table({
            "l_suppkey": b.column("l_suppkey").filter(pa.array(keep)),
            "q_i2": pa.array(np.floor(q * 100.0 + 0.5).astype(np.int64),
                             pa.int64()),
        })

    agg = drop_empty_blocks(
        _read(sf_dir, "lineitem",
              ["l_partkey", "l_suppkey", "l_quantity"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("l_suppkey").aggregate(Sum("q_i2", alias_name="q_i2")),
        empty_schema=pa.schema([("l_suppkey", pa.int64()),
                                ("q_i2", pa.int64())]))
    rows = sorted((r["l_suppkey"] for r in agg.take_all()
                   if r["q_i2"] > 150_000))
    names = {r["s_suppkey"]: r["s_name"]
             for r in _read(sf_dir, "supplier",
                            ["s_suppkey", "s_name"]).take_all()}
    return pa.table({
        "s_suppkey": pa.array(rows, pa.int64()),
        "s_name": pa.array([names[k] for k in rows], pa.string()),
    })
