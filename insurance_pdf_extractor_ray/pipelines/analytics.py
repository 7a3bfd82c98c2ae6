"""Analytics aggregations — the reference's SQL analytics as Ray Data pipelines.

Behavioral spec: /root/reference/app/services/storage.py:435-584 (A1-A6 of
SURVEY.md §2.6) and app/api/routes/analytics.py:23-378 (A7-A10).  Each SQL
aggregate becomes ``groupby().aggregate()`` (Ray Data handles partial/final
combining — the pre-aggregation answer to the all-to-all shuffle) followed by
small driver-side projections where the reference decorates results.

All helpers take/return ``ray.data.Dataset`` and never materialize the input;
the *outputs* are aggregate-small by construction.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def global_stats(ds: ray.data.Dataset, value_col: str) -> pa.Table:
    """A1 (storage.py:442-458): COUNT / SUM / AVG / MIN / MAX of one column
    over non-null rows.  Returns a 1-row Arrow table with stable column names.
    """
    res = ds.aggregate(
        Count(on=value_col, ignore_nulls=True, alias_name="n"),
        Sum(value_col, alias_name="total"),
        Mean(value_col, alias_name="avg"),
        Min(value_col, alias_name="min"),
        Max(value_col, alias_name="max"),
    )
    return pa.table({k: [v] for k, v in res.items()})


def stats_by(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    sort_by: Optional[str] = "total",
    descending: bool = True,
) -> ray.data.Dataset:
    """A2 (storage.py:461-479): GROUP BY key with count/sum/avg, ordered."""
    out = ds.groupby(key).aggregate(
        Count(alias_name="n"),
        Sum(value_col, alias_name="total"),
        Mean(value_col, alias_name="avg"),
    )
    if sort_by:
        out = out.sort(sort_by, descending=descending)
    return out


def daily_trends(
    ds: ray.data.Dataset,
    ts_col: str,
    value_col: str,
    cutoff_date: Optional[str] = None,
) -> ray.data.Dataset:
    """A3 (storage.py:482-497): GROUP BY DATE(ts) over a window; count + sum.

    The 30-day window is a plain predicate (``cutoff_date`` ISO 'YYYY-MM-DD');
    deterministic callers pass an explicit cutoff instead of now()-30d.
    """

    def add_date(batch: pa.Table) -> pa.Table:
        date = pc.strftime(batch.column(ts_col), format="%Y-%m-%d")
        return batch.append_column("date", date)

    out = ds.map_batches(add_date, batch_format="pyarrow")
    if cutoff_date is not None:
        out = out.filter(expr=f"date >= '{cutoff_date}'")
    return (
        out.groupby("date")
        .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="total"))
        .sort("date", descending=True)
    )


def gap_fill_days(
    ds: ray.data.Dataset,
    ts_col: str,
    count_alias: str = "n_events",
) -> pa.Table:
    """Daily counts with missing calendar days zero-filled — the time-series
    resample primitive (SQL ``generate_series`` + LEFT JOIN + COALESCE).

    Distributed part: ONE groupby on epoch-day (map-side combined counts —
    shuffle volume is one row per day per block).  The result is
    day-cardinality small by construction, so the calendar densification is
    a driver-side numpy merge over that aggregate, never over the input.
    Returns an Arrow table (date string 'YYYY-MM-DD', count) sorted by day.
    """

    def add_day(batch: pa.Table) -> pa.Table:
        us = batch.column(ts_col).cast(pa.int64())
        day = pc.floor(pc.divide(us.cast(pa.float64()), 86_400_000_000.0))
        return pa.table({"__day": day.cast(pa.int64())})

    daily = (ds.map_batches(add_day, batch_format="pyarrow")
               .groupby("__day").aggregate(Count(alias_name=count_alias)))
    rows = daily.take_all()
    if not rows:
        return pa.table({"date": pa.array([], pa.string()),
                         count_alias: pa.array([], pa.int64())})
    days = np.array([r["__day"] for r in rows], dtype=np.int64)
    counts = np.array([r[count_alias] for r in rows], dtype=np.int64)
    lo, hi = days.min(), days.max()
    full = np.arange(lo, hi + 1, dtype=np.int64)
    dense = np.zeros(len(full), dtype=np.int64)
    dense[days - lo] = counts
    dates = pc.strftime(pa.array(full * 86_400_000_000,
                                 pa.timestamp("us")), format="%Y-%m-%d")
    return pa.table({"date": dates, count_alias: pa.array(dense, pa.int64())})


def top_k(
    ds: ray.data.Dataset,
    col: str,
    k: int = 10,
    tiebreak: Optional[str] = None,
    columns: Optional[List[str]] = None,
) -> ray.data.Dataset:
    """A4/O2 (storage.py:500-512): global top-k via sort().limit(k).

    ``tiebreak`` makes ordering total (SQL ORDER BY is unstable otherwise).
    """
    keys: List[str] = [col] if tiebreak is None else [col, tiebreak]
    desc = [True] if tiebreak is None else [True, False]
    out = ds.sort(keys, descending=desc).limit(k)
    if columns:
        out = out.select_columns(columns)
    return out


def breakdown_with_pct(ds: ray.data.Dataset, key: str) -> pa.Table:
    """A5 (storage.py:532-549): GROUP BY key with share-of-total percentage.

    Reference does two passes (COUNT(*) then grouped); here one grouped
    aggregate and a driver-side projection over the tiny result.
    """
    grouped = ds.groupby(key).aggregate(Count(alias_name="n")).take_all()
    total = sum(r["n"] for r in grouped) or 1
    grouped.sort(key=lambda r: (-r["n"], str(r[key])))
    return pa.table(
        {
            key: [r[key] for r in grouped],
            "n": [r["n"] for r in grouped],
            "pct": [round(100.0 * r["n"] / total, 2) for r in grouped],
        }
    )


def success_rates(
    ds: ray.data.Dataset,
    key: str,
    flag_col: str,
) -> ray.data.Dataset:
    """A6 (storage.py:552-570): per-key success rate over a 0/1 flag column,
    ORDER BY rate DESC.  Callers derive ``flag_col`` with a vectorized
    predicate first (conditional-SUM pushed into the map side).
    """

    out = (
        ds.groupby(key)
        .aggregate(Count(alias_name="n"), Sum(flag_col, alias_name="n_success"))
    )

    def project(batch: pa.Table) -> pa.Table:
        n = batch.column("n").cast(pa.float64())
        rate = pc.round(
            pc.multiply(pc.divide(batch.column("n_success").cast(pa.float64()), n), 100.0),
            ndigits=2,
        )
        return batch.append_column("success_rate", rate)

    return out.map_batches(project, batch_format="pyarrow").sort(
        ["success_rate", key], descending=[True, False]
    )


def trend_classification(daily: Sequence[dict], value_key: str = "total") -> str:
    """A8 (analytics.py:362-378): first-7 vs last-7 mean with a ±10% band.

    ``daily`` is the (small) output of :func:`daily_trends`, newest first.
    """
    if len(daily) < 2:
        return "stable"
    recent = [r[value_key] for r in daily[:7]]
    older = [r[value_key] for r in daily[-7:]]
    avg_recent = sum(recent) / len(recent)
    avg_older = sum(older) / len(older)
    if avg_older == 0:
        return "stable"
    if avg_recent > avg_older * 1.1:
        return "increasing"
    if avg_recent < avg_older * 0.9:
        return "decreasing"
    return "stable"


def cost_prediction(avg_cost: float, planned_n: int) -> dict:
    """A9 (analytics.py:209-265): planned_n x historical average, ±20% band."""
    predicted = avg_cost * planned_n
    return {
        "predicted_cost": round(predicted, 6),
        "lower_bound": round(predicted * 0.8, 6),
        "upper_bound": round(predicted * 1.2, 6),
    }


def most_used(ds: ray.data.Dataset, key: str) -> Optional[str]:
    """A10 (analytics.py:353-359): argmax key by count."""
    rows = ds.groupby(key).aggregate(Count(alias_name="n")).sort(
        ["n", key], descending=[True, False]
    ).limit(1).take_all()
    return rows[0][key] if rows else None


def zscore_by(
    ds: ray.data.Dataset,
    key: str,
    value_col: str,
    out_col: str = "zscore",
) -> ray.data.Dataset:
    """Per-key standardization: z = (v - mean_key) / stddev_pop_key.

    Two passes: a keyed moment aggregate (count/sum/sum-of-squares — ONE
    shuffle whose output is key-cardinality-sized) broadcast back into a
    streaming map.  Keys with zero variance emit null (SQL division by
    zero-stddev semantics)."""
    import math as _math

    import numpy as _np
    import ray as _ray

    def moments(batch: pa.Table) -> pa.Table:
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(_np.float64)
        t = pa.table({key: batch.column(key),
                      "_n": pa.array(_np.ones(len(v), dtype=_np.int64)),
                      "_s": pa.array(v, pa.float64()),
                      "_s2": pa.array(v * v, pa.float64())})
        return (t.group_by(key)
                .aggregate([("_n", "sum"), ("_s", "sum"), ("_s2", "sum")])
                .rename_columns([key, "_n", "_s", "_s2"]))

    stats_rows = (
        ds.select_columns([key, value_col])
        .map_batches(moments, batch_format="pyarrow")
        .groupby(key)
        .aggregate(Sum("_n", alias_name="n"), Sum("_s", alias_name="s"),
                   Sum("_s2", alias_name="s2"))
        .take_all()
    )
    lookup = {}
    for r in stats_rows:
        mean = r["s"] / r["n"]
        var = max(r["s2"] / r["n"] - mean * mean, 0.0)
        lookup[r[key]] = (mean, _math.sqrt(var))
    ref = _ray.put(lookup)

    def standardize(batch: pa.Table) -> pa.Table:
        lk = _ray.get(ref)
        v = batch.column(value_col).to_numpy(zero_copy_only=False).astype(_np.float64)
        keys = batch.column(key).to_pylist()
        mean = _np.fromiter((lk[k][0] for k in keys), dtype=_np.float64,
                            count=len(keys))
        std = _np.fromiter((lk[k][1] for k in keys), dtype=_np.float64,
                           count=len(keys))
        z = _np.where(std > 0, (v - mean) / _np.where(std > 0, std, 1.0),
                      _np.nan)
        return batch.append_column(
            out_col, pa.array(z, pa.float64(),
                              mask=_np.asarray(std == 0)))

    return ds.map_batches(standardize, batch_format="pyarrow")


def cumulative_daily(
    ds: ray.data.Dataset,
    ts_col: str,
    value_col: str,
) -> pa.Table:
    """Running total by day — ``SUM(SUM(v)) OVER (ORDER BY day)``.

    One keyed shuffle reduces the stream to a #days-sized table (map-side
    partial sums make the exchange per-block-per-day rows); the prefix sum
    then runs over that tiny sorted result on the driver — running totals
    over an ordered corpus-scale stream are inherently sequential, so the
    scale trick is to aggregate FIRST and only cumsum the bounded result
    (same shape as ``packing.pack_sequences``' bucket offsets).
    """

    def add_date(batch: pa.Table) -> pa.Table:
        date = pc.strftime(batch.column(ts_col), format="%Y-%m-%d")
        return batch.append_column("date", date)

    daily = (ds.map_batches(add_date, batch_format="pyarrow")
             .groupby("date")
             .aggregate(Count(alias_name="n"), Sum(value_col, alias_name="_t"))
             .take_all())
    daily.sort(key=lambda r: r["date"])
    acc = 0.0
    n_acc = 0
    run, n_run = [], []
    for r in daily:
        acc += float(r["_t"])
        n_acc += int(r["n"])
        run.append(acc)
        n_run.append(n_acc)
    return pa.table({
        "date": pa.array([r["date"] for r in daily], pa.string()),
        "cum_n": pa.array(n_run, pa.int64()),
        "cum_total": pa.array(run, pa.float64()),
    })


def entropy_by(
    ds: ray.data.Dataset,
    key_col: str,
    val_col: str,
    nd: int = 6,
) -> pa.Table:
    """Shannon entropy (nats) of the ``val_col`` distribution within each
    ``key_col`` group — the diversity / skew monitor for corpus composition
    (is one language swamping a source?).

    One keyed shuffle reduces the stream to (key, val) counts — map-side
    partials make the exchange per-block-distinct-pairs — and the entropy
    arithmetic runs over that bounded (|keys| × |vals|) table driver-side,
    vectorized.  Assumes both columns are category-like (bounded
    cardinality); entropy over an unbounded value space needs a sketch, not
    this operator.
    """
    counts = (ds.groupby([key_col, val_col])
              .aggregate(Count(alias_name="_n")).take_all())
    counts.sort(key=lambda r: (str(r[key_col]), str(r[val_col])))
    keys = np.array([r[key_col] for r in counts])
    ns = np.array([r["_n"] for r in counts], dtype=np.float64)
    out_keys: List = []
    out_h: List[float] = []
    i = 0
    while i < len(counts):
        j = i
        while j < len(counts) and keys[j] == keys[i]:
            j += 1
        p = ns[i:j] / ns[i:j].sum()
        h = float(-(p * np.log(p)).sum())
        m = 10.0 ** nd
        out_keys.append(keys[i])
        out_h.append(np.floor(h * m + 0.5) / m if h >= 0 else h)
        i = j
    return pa.table({key_col: pa.array(out_keys),
                     "entropy": pa.array(out_h, pa.float64())})


def decayed_sum_by(
    ds: ray.data.Dataset,
    key_col: str,
    ts_col: str,
    value_col: str,
    tau_us: float,
    t0_us: int,
    nd: int = 6,
) -> pa.Table:
    """Exponentially-decayed sum per key, anchored at each key's latest
    timestamp: ``S_k = sum_i v_i * exp(-(max_ts_k - ts_i) / tau)`` — the
    recency-weighted engagement / freshness score.

    The decay factors out: ``S_k = exp(-(max_ts_k - t0)/tau) * sum_i
    v_i * exp((ts_i - t0)/tau)``, so the whole operator is two PLAIN
    combinable aggregates (Sum of a per-row weighted value, Max of ts) —
    map-side partials, one tiny keyed combine, no per-key ordering or
    grouping of row streams at all.  ``t0_us`` rebases the exponent so
    ``exp`` stays in float64 range: pick t0 near the data's start and keep
    ``(max_ts - t0) / tau`` under ~600.
    """

    def weigh(batch: pa.Table) -> pa.Table:
        ts = batch.column(ts_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False).astype(np.float64)
        v = batch.column(value_col).to_numpy(
            zero_copy_only=False).astype(np.float64)
        w = v * np.exp((ts - t0_us) / tau_us)
        return pa.table({key_col: batch.column(key_col),
                         "_w": pa.array(w, pa.float64()),
                         "_ts": batch.column(ts_col).cast(pa.int64())})

    agg = (ds.select_columns([key_col, ts_col, value_col])
           .map_batches(weigh, batch_format="pyarrow")
           .groupby(key_col)
           .aggregate(Sum("_w", alias_name="_sw"),
                      Max("_ts", alias_name="_mt")))
    rows = sorted(agg.take_all(), key=lambda r: r[key_col])
    m = 10.0 ** nd
    out = []
    for r in rows:
        s = r["_sw"] * np.exp(-(r["_mt"] - t0_us) / tau_us)
        out.append(np.copysign(np.floor(abs(s) * m + 0.5), s) / m)
    return pa.table({key_col: pa.array([r[key_col] for r in rows]),
                     "decayed_sum": pa.array(out, pa.float64())})
