"""Statistical aggregates the reference's GROUP BY family stops short of —
grouped correlation/covariance, EXACT median over unbounded continuous
domains, and ordered per-group string concatenation.

Why these shapes (and not `map_groups` over raw rows):

* ``corr_by_key`` / ``covar_by_key`` — Pearson correlation and sample
  covariance per key from *mergeable moment sums* (n, Σx, Σy, Σxy, Σx²,
  Σy²).  The six sums combine map-side inside each Arrow batch, so the one
  keyed shuffle carries ≤ ``keys × blocks`` six-number rows regardless of
  input size — the classic algebraic-aggregate decomposition (same family
  as AVG = SUM/COUNT, reference analytics SURVEY.md §2.6 only has those).
* ``median_by_key`` — exact ``median()`` per key with NO bounded-distinct
  assumption (``rankagg.quantiles_by`` requires a quantized value domain;
  this does not).  One distributed sort by (key, value) + the
  ``ordering.with_row_number`` metadata wave, then a *positional pick*:
  per-key counts (metadata-scale) give each key's global median positions;
  only those ≤ 2·keys rows are pulled through a final tiny aggregate.
  Nothing per-group ever materializes — a hot key costs the same as a cold
  one because the sort spreads its rows over many blocks.
* ``string_agg_by_key`` — SQL ``string_agg(v, sep ORDER BY ...)``.  Sort by
  (key, order), then each sorted block emits one partial string per key-run
  (vectorized run detection), and a per-key merge joins the ≤ blocks-per-key
  partials in block order.  The merge group is bounded by #blocks touching
  the key, never by the key's row count.
"""

from __future__ import annotations

import math
from typing import List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Mean, Sum

from .ordering import with_row_number

# ---------------------------------------------------------------------------
# grouped correlation / covariance
# ---------------------------------------------------------------------------

_MOMENTS = ["_n", "_sx", "_sy", "_sxx", "_syy", "_sxy"]


def _moment_partial(key: str, x: str, y: str):
    """Per-batch moment sums per key — the map-side combiner."""

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.and_(pc.is_valid(batch.column(x)), pc.is_valid(batch.column(y)))
        batch = batch.filter(mask)
        xv = batch.column(x).to_numpy(zero_copy_only=False).astype(np.float64)
        yv = batch.column(y).to_numpy(zero_copy_only=False).astype(np.float64)
        t = pa.table({
            key: batch.column(key),
            "_n": np.ones(len(xv), dtype=np.float64),
            "_sx": xv, "_sy": yv,
            "_sxx": xv * xv, "_syy": yv * yv, "_sxy": xv * yv,
        })
        # pa group_by puts key columns FIRST in the result
        agg = t.group_by([key]).aggregate([(c, "sum") for c in _MOMENTS])
        return agg.rename_columns([key] + _MOMENTS)

    return partial


def _moments_by_key(ds: ray.data.Dataset, key: str, x: str, y: str) -> ray.data.Dataset:
    partials = ds.select_columns([key, x, y]).map_batches(
        _moment_partial(key, x, y), batch_format="pyarrow")
    agg = partials.groupby(key).aggregate(
        *[Sum(c, alias_name=c) for c in _MOMENTS])
    return agg


def corr_by_key(
    ds: ray.data.Dataset,
    key: str,
    x: str,
    y: str,
    corr_col: str = "corr",
    covar_col: Optional[str] = "covar_samp",
) -> ray.data.Dataset:
    """``SELECT key, corr(x, y), covar_samp(x, y) GROUP BY key`` — exact
    (same closed forms DuckDB's kernels compute), one keyed shuffle of
    six-number moment rows."""
    agg = _moments_by_key(ds, key, x, y)

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("_n").to_numpy(zero_copy_only=False)
        sx = batch.column("_sx").to_numpy(zero_copy_only=False)
        sy = batch.column("_sy").to_numpy(zero_copy_only=False)
        sxx = batch.column("_sxx").to_numpy(zero_copy_only=False)
        syy = batch.column("_syy").to_numpy(zero_copy_only=False)
        sxy = batch.column("_sxy").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            num = n * sxy - sx * sy
            den = np.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
            corr = np.where(den > 0, num / den, np.nan)
            covar = np.where(n > 1, (sxy - sx * sy / n) / (n - 1), np.nan)
        cols = {key: batch.column(key), corr_col: pa.array(corr, pa.float64())}
        if covar_col:
            cols[covar_col] = pa.array(covar, pa.float64())
        return pa.table(cols)

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# exact median per key (continuous domain, sort-based)
# ---------------------------------------------------------------------------

def median_by_key(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    out_col: str = "median",
) -> ray.data.Dataset:
    """Exact ``median(value) GROUP BY key`` (``quantile_cont(0.5)``: even
    groups average the two middle order statistics).

    Scale shape: ONE distributed sort by (key, value); global positions from
    ``with_row_number``'s metadata wave; per-key counts collected as
    keys×blocks partial rows (metadata-scale — the same budget the row-number
    wave already spends); the ≤ 2·keys median-position rows are filtered
    map-side against a broadcast position array and reduced with a tiny
    ``groupby.mean``.  No per-group materialization anywhere, so key skew is
    irrelevant — a 10⁹-row hot key's median costs one extra block scan, not
    one giant in-memory group.
    """
    import ray as _ray

    slim = ds.select_columns([key, value])
    numbered = with_row_number(
        slim, [key, value], out_col="_rn0", one_based=False)

    # per-key counts: one partial row per (key, block) — metadata-scale
    def pcount(batch: pa.Table) -> pa.Table:
        g = batch.group_by([key]).aggregate([([], "count_all")])
        return g.rename_columns([key, "_c"])

    parts = numbered.map_batches(pcount, batch_format="pyarrow").take_all()
    counts: dict = {}
    for r in parts:
        counts[r[key]] = counts.get(r[key], 0) + r["_c"]

    # key sort order here must match the distributed sort's (Arrow ascending)
    offsets, off = {}, 0
    for k in sorted(counts):
        offsets[k] = off
        off += counts[k]
    targets = np.sort(np.array(
        [offsets[k] + (counts[k] - 1) // 2 for k in counts]
        + [offsets[k] + counts[k] // 2 for k in counts], dtype=np.int64))
    ref = _ray.put(targets)

    def pick(batch: pa.Table) -> pa.Table:
        tg = _ray.get(ref)
        rn = batch.column("_rn0").to_numpy(zero_copy_only=False)
        hit = batch.filter(pa.array(np.isin(rn, tg)))
        return hit.select([key, value])

    picked = numbered.map_batches(pick, batch_format="pyarrow")
    med = picked.groupby(key).aggregate(Mean(value, alias_name=out_col))
    return med


def quantiles_exact_by(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    qs: Sequence[float],
) -> "pa.Table":
    """Exact ``quantile_cont(value, q) GROUP BY key`` for CONTINUOUS domains
    — the generalization of ``median_by_key`` (and of
    ``rankagg.quantiles_by``, which requires a bounded distinct-value set).

    Same scale shape as the median: one distributed sort, metadata-weight
    position arithmetic, and a broadcast-filter that pulls only the
    <= 2·keys·|qs| order statistics any interpolation touches.  Returns the
    result as an Arrow table (keys × qs rows — result-scale by definition).
    """
    import ray as _ray

    qs = list(qs)
    numbered = with_row_number(
        ds.select_columns([key, value]), [key, value], out_col="_rn0",
        one_based=False)

    def pcount(batch: pa.Table) -> pa.Table:
        g = batch.group_by([key]).aggregate([([], "count_all")])
        return g.rename_columns([key, "_c"])

    parts = numbered.map_batches(pcount, batch_format="pyarrow").take_all()
    counts: dict = {}
    for r in parts:
        counts[r[key]] = counts.get(r[key], 0) + r["_c"]

    offsets, off = {}, 0
    for k in sorted(counts):
        offsets[k] = off
        off += counts[k]
    # every global position any (key, q) interpolation reads
    want = set()
    for k, n in counts.items():
        for q in qs:
            h = (n - 1) * q
            want.add(offsets[k] + math.floor(h))
            want.add(offsets[k] + math.ceil(h))
    targets = np.sort(np.fromiter(want, dtype=np.int64, count=len(want)))
    ref = _ray.put(targets)

    def pick(batch: pa.Table) -> pa.Table:
        tg = _ray.get(ref)
        rn = batch.column("_rn0").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(np.isin(rn, tg)))

    hits = numbered.map_batches(pick, batch_format="pyarrow").take_all()
    pos_to_val = {r["_rn0"]: r[value] for r in hits}
    out_k, out_q, out_v = [], [], []
    for k in sorted(counts):
        n = counts[k]
        for q in qs:
            h = (n - 1) * q
            lo, hi = math.floor(h), math.ceil(h)
            v_lo = float(pos_to_val[offsets[k] + lo])
            v_hi = float(pos_to_val[offsets[k] + hi])
            out_k.append(k)
            out_q.append(q)
            out_v.append(v_lo + (h - lo) * (v_hi - v_lo))
    return pa.table({key: pa.array(out_k), "q": pa.array(out_q, pa.float64()),
                     "quantile": pa.array(out_v, pa.float64())})


def percent_rank_by(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    tiebreak: str,
    out_col: str = "percent_rank",
    kind: str = "percent_rank",
) -> ray.data.Dataset:
    """``percent_rank()`` / ``cume_dist() OVER (PARTITION BY key ORDER BY
    value, tiebreak)`` — the quality-curriculum primitive ("keep the top
    30 % per language").  ``kind='cume_dist'`` emits (rank+1)/n instead of
    rank/(n-1); with the total order both match their SQL namesakes.

    The ``tiebreak`` column makes the order total, so rank == row_number and
    the result is deterministic.  Same machinery as ``median_by_key``: one
    sort + the row-number metadata wave; per-key (offset, count) pairs are
    metadata-scale and broadcast once; the rank map is a vectorized
    dictionary probe per batch.  Rows never group, so key skew is free.
    """
    assert kind in ("percent_rank", "cume_dist")
    import ray as _ray

    numbered = with_row_number(
        ds.select_columns(list(dict.fromkeys([key, value, tiebreak]))),
        [key, value, tiebreak], out_col="_rn0", one_based=False)

    def pcount(batch: pa.Table) -> pa.Table:
        g = batch.group_by([key]).aggregate([([], "count_all")])
        return g.rename_columns([key, "_c"])

    parts = numbered.map_batches(pcount, batch_format="pyarrow").take_all()
    counts: dict = {}
    for r in parts:
        counts[r[key]] = counts.get(r[key], 0) + r["_c"]
    offsets, off = {}, 0
    for k in sorted(counts):
        offsets[k] = off
        off += counts[k]
    ref = _ray.put((offsets, counts))

    def rank(batch: pa.Table) -> pa.Table:
        offs, cnts = _ray.get(ref)
        keys = pd.Series(batch.column(key).to_pylist())
        o = keys.map(offs).to_numpy(dtype=np.int64)
        n = keys.map(cnts).to_numpy(dtype=np.int64)
        rn = batch.column("_rn0").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore"):
            if kind == "cume_dist":
                pr = (rn - o + 1) / n
            else:
                pr = np.where(n > 1, (rn - o) / np.maximum(n - 1, 1), 0.0)
        return (batch.drop_columns(["_rn0"])
                .append_column(out_col, pa.array(pr, pa.float64())))

    return numbered.map_batches(rank, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# ordered string_agg per key
# ---------------------------------------------------------------------------

def string_agg_by_key(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    order_by: Sequence[str],
    sep: str = ",",
    out_col: str = "agg",
) -> ray.data.Dataset:
    """``string_agg(value, sep ORDER BY order_by) GROUP BY key`` — pass a
    tiebreak column in ``order_by`` to make the order total.

    One sort by (key, *order_by); each sorted block folds its key-runs into
    one partial string per key (vectorized run detection + a single
    ``"".join`` per run); the final per-key merge sees only blocks-per-key
    partials, ordered by their global position.
    """
    order_by = list(order_by)
    cols = list(dict.fromkeys([key, value] + order_by))
    numbered = with_row_number(
        ds.select_columns(cols), [key] + order_by, out_col="_rn0",
        one_based=False)

    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({key: pa.array([], pa.string()),
                             "_part": pa.array([], pa.string()),
                             "_ord": pa.array([], pa.int64())})
        from ..dsutil import run_starts

        keys = batch.column(key).to_numpy(zero_copy_only=False)
        vals = pc.cast(batch.column(value), pa.string()).to_pylist()
        rn = batch.column("_rn0").to_numpy(zero_copy_only=False)
        change = run_starts(batch.column(key))  # null-safe key change
        starts = np.flatnonzero(change)
        ends = np.append(starts[1:], len(keys))
        return pa.table({
            key: pa.array(keys[starts]),
            "_part": pa.array([sep.join(vals[s:e]) for s, e in zip(starts, ends)],
                              pa.string()),
            "_ord": pa.array(rn[starts], pa.int64()),
        })

    parts = numbered.map_batches(partial, batch_format="pyarrow")

    def merge(part: pa.Table) -> pa.Table:
        # all keys at once: one Rust-side sorted string-join per key
        import polars as pl

        df = pl.from_arrow(part)
        out = (df.sort([key, "_ord"])
                 .group_by(key, maintain_order=True)
                 .agg(pl.col("_part").str.join(sep).alias(out_col)))
        return out.to_arrow().cast(pa.schema([
            (key, part.schema.field(key).type), (out_col, pa.string())]))

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(parts, key, merge)


def mad_by_key(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    out_col: str = "mad",
) -> ray.data.Dataset:
    """Exact ``mad(value) GROUP BY key`` — median absolute deviation, the
    robust dispersion statistic (outlier-immune where stddev is not; DuckDB
    ``mad()`` is the oracle twin).

    Two exact median passes (:func:`median_by_key`): per-key medians first
    (key-cardinality-bounded, broadcast once), then the median of
    ``|value - median(key)|`` over a derived deviation stream — same
    skew-proof sort + metadata-wave machinery both times, nothing per-group
    in memory.
    """
    import ray as _ray

    med = median_by_key(ds, key, value, out_col="_med")
    med_map = {r[key]: r["_med"] for r in med.take_all()}
    ref = _ray.put(med_map)

    def deviations(batch: pa.Table, med_ref) -> pa.Table:
        mm = _ray.get(med_ref)
        kcol = batch.column(key)
        if isinstance(kcol, pa.ChunkedArray):
            kcol = kcol.combine_chunks()
        enc = kcol.dictionary_encode()
        uniq = enc.dictionary.to_pylist()
        meds = np.fromiter((mm[u] for u in uniq), dtype=np.float64,
                           count=len(uniq))
        idx = enc.indices.to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(value).to_numpy(zero_copy_only=False).astype(np.float64)
        dev = np.abs(v - meds[idx])
        return pa.table({key: batch.column(key),
                         "_dev": pa.array(dev, pa.float64())})

    devs = ds.select_columns([key, value]).map_batches(
        deviations, fn_args=(ref,), batch_format="pyarrow")
    return median_by_key(devs, key, "_dev", out_col=out_col)


def regr_by_key(
    ds: ray.data.Dataset,
    key: str,
    x: str,
    y: str,
) -> ray.data.Dataset:
    """``SELECT key, regr_slope(y,x), regr_intercept(y,x), regr_r2(y,x),
    regr_count(y,x) GROUP BY key`` — exact grouped simple linear regression
    from the same six-number moment partials as :func:`corr_by_key` (one
    keyed shuffle of O(keys) moment rows, zero per-group materialization).

    Closed forms and edge cases mirror DuckDB/Postgres: slope = Sxy/Sxx
    (null when Sxx = 0, i.e. constant x), intercept = ȳ − slope·x̄,
    r² = null when Sxx = 0, 1 when Syy = 0 (perfect horizontal fit), else
    Sxy²/(Sxx·Syy).
    """
    agg = _moments_by_key(ds, key, x, y)

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("_n").to_numpy(zero_copy_only=False).astype(np.float64)
        sx = batch.column("_sx").to_numpy(zero_copy_only=False)
        sy = batch.column("_sy").to_numpy(zero_copy_only=False)
        sxx = batch.column("_sxx").to_numpy(zero_copy_only=False)
        syy = batch.column("_syy").to_numpy(zero_copy_only=False)
        sxy = batch.column("_sxy").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            cxx = sxx - sx * sx / n       # n * var_pop(x)
            cyy = syy - sy * sy / n
            cxy = sxy - sx * sy / n
            slope = np.where(cxx > 0, cxy / cxx, np.nan)
            intercept = sy / n - slope * (sx / n)
            r2 = np.where(cxx > 0,
                          np.where(cyy > 0, (cxy * cxy) / (cxx * cyy), 1.0),
                          np.nan)
        return pa.table({
            key: batch.column(key),
            "slope": pa.array(slope, pa.float64()),
            "intercept": pa.array(intercept, pa.float64()),
            "r2": pa.array(r2, pa.float64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


def skew_kurt_by_key(
    ds: ray.data.Dataset,
    key: str,
    value: str,
) -> ray.data.Dataset:
    """``SELECT key, skewness(v), kurtosis(v) GROUP BY key`` — the
    bias-corrected sample estimators DuckDB/Excel compute (adjusted
    Fisher-Pearson skewness; excess kurtosis), from per-block power-sum
    partials (n, Σx, Σx², Σx³, Σx⁴): one keyed shuffle of five-number rows,
    central moments recovered in closed form.  Null for groups too small
    for the correction terms (n<3 skew, n<4 kurtosis), matching SQL."""
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select([key, value]))
        v = pl.col(value)
        g = df.group_by(key).agg(
            pl.len().cast(pl.Int64).alias("_n"),
            v.sum().alias("_s1"),
            (v ** 2).sum().alias("_s2"),
            (v ** 3).sum().alias("_s3"),
            (v ** 4).sum().alias("_s4"),
        )
        return g.to_arrow()

    agg = (ds.select_columns([key, value])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(key).aggregate(
               Sum("_n", alias_name="_n"), Sum("_s1", alias_name="_s1"),
               Sum("_s2", alias_name="_s2"), Sum("_s3", alias_name="_s3"),
               Sum("_s4", alias_name="_s4")))

    def finish(batch: pa.Table) -> pa.Table:
        n = batch.column("_n").to_numpy(zero_copy_only=False).astype(np.float64)
        s1 = batch.column("_s1").to_numpy(zero_copy_only=False)
        s2 = batch.column("_s2").to_numpy(zero_copy_only=False)
        s3 = batch.column("_s3").to_numpy(zero_copy_only=False)
        s4 = batch.column("_s4").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            m = s1 / n
            m2 = s2 - n * m * m
            m3 = s3 - 3.0 * m * s2 + 2.0 * n * m ** 3
            m4 = s4 - 4.0 * m * s3 + 6.0 * m * m * s2 - 3.0 * n * m ** 4
            s = np.sqrt(m2 / (n - 1.0))
            skew = np.where((n > 2) & (s > 0),
                            n / ((n - 1.0) * (n - 2.0)) * m3 / s ** 3,
                            np.nan)
            kurt = np.where((n > 3) & (s > 0),
                            (n * (n + 1.0))
                            / ((n - 1.0) * (n - 2.0) * (n - 3.0))
                            * m4 / s ** 4
                            - 3.0 * (n - 1.0) ** 2
                            / ((n - 2.0) * (n - 3.0)),
                            np.nan)
        return pa.table({
            key: batch.column(key),
            "skewness": pa.array(skew, pa.float64()),
            "kurtosis": pa.array(kurt, pa.float64()),
            "n": pa.array(n.astype(np.int64), pa.int64()),
        })

    return agg.map_batches(finish, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# grouped Shannon entropy over a bounded category column
# ---------------------------------------------------------------------------

def entropy_by_key(
    ds: ray.data.Dataset,
    key: str,
    cat: str,
    out_col: str = "entropy",
) -> ray.data.Dataset:
    """``SELECT key, entropy(cat) GROUP BY key`` — Shannon entropy (base 2)
    of the category distribution within each key, matching DuckDB's
    ``entropy`` aggregate: ``-Σ (c/n)·log2(c/n)`` over category counts.

    A behavioral-diversity / distribution-health signal (e.g. how varied a
    user's event mix is, how language-mixed a crawl source is).

    Scale shape: per-batch Arrow ``group_by`` pre-reduces to (key, cat)
    counts, so the ONE keyed shuffle carries ≤ keys × cats × blocks count
    rows regardless of input size; the finishing per-key sum runs over the
    bounded (key, cat) table.  Interior float sums run in sorted category
    order — layout-independent output.
    """

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by([key, cat]).aggregate([([], "count_all")])
        return pa.table({key: t.column(key), cat: t.column(cat),
                         "_n": t.column("count_all").cast(pa.int64())})

    counts = (ds.select_columns([key, cat])
              .map_batches(partial, batch_format="pyarrow")
              .groupby([key, cat]).aggregate(Sum("_n", alias_name="_n")))

    def per_partition(part: pa.Table) -> pa.Table:
        """All keys at once over the bounded (key, cat, n) table:
        deterministic reduction order via the (key, cat) sort, per-key sums
        as sequential ``np.add.reduceat`` segment folds."""
        n_rows = part.num_rows
        ktype = part.column(key).type
        if n_rows == 0:
            return pa.table({key: pa.array([], ktype),
                             out_col: pa.array([], pa.float64()),
                             "n_cats": pa.array([], pa.int64())})
        part = part.take(pc.sort_indices(
            part, sort_keys=[(key, "ascending"), (cat, "ascending")]))
        from ..dsutil import run_starts

        c = part.column("_n").to_numpy(zero_copy_only=False).astype(np.float64)
        new_key = run_starts(part.column(key))  # null-safe key change
        starts = np.flatnonzero(new_key)
        seg = np.cumsum(new_key) - 1
        tot = np.add.reduceat(c, starts)
        p = c / tot[seg]
        h = np.add.reduceat(-(p * np.log2(p)), starts)
        n_cats = np.diff(np.append(starts, n_rows))
        return pa.table({key: part.column(key).take(pa.array(starts, pa.int64())),
                         out_col: pa.array(h, pa.float64()),
                         "n_cats": pa.array(n_cats, pa.int64())})

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(counts, key, per_partition)


def gini_of_counts(ds: ray.data.Dataset, key: str) -> pa.Table:
    """Concentration/skew diagnostic: Gini coefficient of the per-key row
    counts (how unevenly activity/bytes spread over users / domains /
    shards — the number that says whether your partitioning key is safe).

    ``G = (2·Σ i·x_i)/(n·Σ x_i) − (n+1)/n`` over the ascending-sorted
    per-key sums (1-based ranks; tied values make the rank-weighted sum
    invariant to tie order).  One keyed shuffle of map-side pre-counts;
    the final formula runs over the keys-sized count table (driver-side —
    for key cardinalities beyond driver memory, feed the counts Dataset to
    ``sketches.order_statistics`` instead).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.group_by([key]).aggregate([([], "count_all")])
        return pa.table({key: g.column(key),
                         "_n": g.column("count_all").cast(pa.int64())})

    rows = (ds.select_columns([key])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(key).aggregate(Sum("_n", alias_name="_n"))).take_all()
    x = np.sort(np.array([r["_n"] for r in rows], np.float64))
    n = len(x)
    tot = x.sum()
    i = np.arange(1, n + 1, dtype=np.float64)
    gini = (2.0 * (i * x).sum()) / (n * tot) - (n + 1.0) / n
    return pa.table({
        "n_keys": pa.array([n], pa.int64()),
        "total": pa.array([int(tot)], pa.int64()),
        "gini": pa.array([float(gini)], pa.float64()),
    })


def winsorized_mean_by_key(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    lo: float = 0.05,
    hi: float = 0.95,
) -> pa.Table:
    """Robust per-key mean: clip values outside the key's exact
    [q_lo, q_hi] ``quantile_cont`` band, then average — the outlier-proof
    aggregate for monitoring skewed value columns.

    Two passes: the exact-quantile machinery (one distributed sort +
    positional pick) yields the clip bounds; the bounds broadcast into a
    map-side clipped-moment partial and ONE keyed combine.  Result is
    keys-sized.
    """
    from ray.data.aggregate import Sum

    qt = quantiles_exact_by(ds, key, value, [lo, hi])
    bounds: dict = {}
    for r in qt.to_pylist():  # long format: (key, q, value)
        lo_hi = bounds.setdefault(r[key], [None, None])
        lo_hi[0 if r["q"] == lo else 1] = r[qt.column_names[2]]
    import ray as _ray

    ref = _ray.put({k: tuple(v) for k, v in bounds.items()})

    def partial(batch: pa.Table, b_ref) -> pa.Table:
        bmap = _ray.get(b_ref)
        k = batch.column(key).to_pylist()
        v = batch.column(value).to_numpy(zero_copy_only=False).astype(
            np.float64)
        lo_a = np.array([bmap[x][0] for x in k], np.float64)
        hi_a = np.array([bmap[x][1] for x in k], np.float64)
        clipped = np.clip(v, lo_a, hi_a)
        t = pa.table({key: batch.column(key), "_s": clipped,
                      "_n": np.ones(len(v), np.float64)})
        g = t.group_by([key]).aggregate([("_s", "sum"), ("_n", "sum")])
        return g.rename_columns([key, "_s", "_n"])

    import functools

    agg = (ds.select_columns([key, value])
           .map_batches(functools.partial(partial, b_ref=ref),
                        batch_format="pyarrow")
           .groupby(key).aggregate(Sum("_s", alias_name="_s"),
                                   Sum("_n", alias_name="_n")))
    rows = agg.take_all()
    rows.sort(key=lambda r: str(r[key]))
    ktype = pa.array([r[key] for r in rows]).type
    return pa.table({
        key: pa.array([r[key] for r in rows], ktype),
        "n": pa.array([int(r["_n"]) for r in rows], pa.int64()),
        "q_lo": pa.array([bounds[r[key]][0] for r in rows], pa.float64()),
        "q_hi": pa.array([bounds[r[key]][1] for r in rows], pa.float64()),
        "wmean": pa.array([r["_s"] / r["_n"] for r in rows], pa.float64()),
    })


@ray.remote
def _key_weight_sums(tbl: pa.Table, key: str, w: str):
    """Per-key weight sums for one sorted block, in block key order."""
    g = tbl.group_by([key]).aggregate([(w, "sum")])
    return list(zip(g.column(key).to_pylist(),
                    g.column(f"{w}_sum").to_pylist()))


@ray.remote
def _pick_weighted(tbl: pa.Table, key: str, value: str, w: str,
                   starts: dict, thresholds: dict) -> pa.Table:
    """Rows where the per-key running weight first reaches the threshold."""
    k = tbl.column(key).to_pylist()
    wv = tbl.column(w).to_numpy(zero_copy_only=False).astype(np.int64)
    cum = np.zeros(len(k), np.int64)
    run: dict = {}
    for i, kk in enumerate(k):
        run[kk] = run.get(kk, starts.get(kk, 0)) + int(wv[i])
        cum[i] = run[kk]
    thr = np.array([thresholds[kk] for kk in k], np.float64)
    prev = cum - wv  # running weight BEFORE this row
    hit = (cum >= thr) & (prev < thr)
    return tbl.filter(pa.array(hit)).select([key, value])


def weighted_median_by_key(
    ds: ray.data.Dataset,
    key: str,
    value: str,
    weight: str,
) -> pa.Table:
    """Exact lower weighted median per key: the smallest ``value`` whose
    per-key cumulative ``weight`` (in value order) reaches half the key's
    total weight — SQL ``MIN(value) FILTER (cum_w >= total_w/2)`` over a
    windowed cumsum.

    Same shape as ``median_by_key``, generalized from row positions to
    WEIGHT positions: one distributed sort by (key, value); a metadata wave
    of per-(block, key) weight sums gives each block its per-key starting
    offsets (driver holds keys × blocks numbers, never rows); one zero-move
    pick wave emits exactly the first threshold-crossing row per key.
    Integer weights by contract (exact threshold arithmetic).
    """
    slim = ds.select_columns([key, value, weight])
    ordered = slim.sort([key, value]).materialize()
    refs = ordered.to_arrow_refs()
    per_block = ray.get([_key_weight_sums.remote(r, key, weight)
                         for r in refs])
    totals: dict = {}
    starts_per_block = []
    running: dict = {}
    for pb in per_block:
        starts_per_block.append(
            {k: running.get(k, 0) for k, _ in pb})
        for k, s in pb:
            running[k] = running.get(k, 0) + int(s)
    totals = running
    thresholds = {k: t / 2.0 for k, t in totals.items()}
    out_refs = [_pick_weighted.remote(r, key, value, weight, st, thresholds)
                for r, st in zip(refs, starts_per_block)]
    picked = pa.concat_tables(ray.get(out_refs))
    idx = pc.sort_indices(picked, sort_keys=[(key, "ascending")])
    picked = picked.take(idx)
    return picked.rename_columns([key, "wmedian"])


@ray.remote
def _ks_block_counts(tbl: pa.Table, value: str, flag: str):
    """(n1, n2, first_value) for one sorted block (possibly a zero-column
    empty block — guard before touching columns)."""
    if tbl.num_rows == 0:
        return 0, 0, None
    f = tbl.column(flag).to_numpy(zero_copy_only=False)
    n1 = int(f.sum())
    return n1, tbl.num_rows - n1, tbl.column(value)[0].as_py()


@ray.remote
def _ks_block_max(tbl: pa.Table, value: str, flag: str,
                  start1: int, start2: int, n1: int, n2: int,
                  next_first) -> float:
    """Max |F1−F2| over this block's VALID evaluation points (rows whose
    successor — including the next block's first row — has a different
    value; ties evaluate only after their last row, matching SQL's
    RANGE-framed cumulative)."""
    if tbl.num_rows == 0:
        return 0.0
    v = tbl.column(value).to_numpy(zero_copy_only=False)
    f = tbl.column(flag).to_numpy(zero_copy_only=False).astype(np.int64)
    c1 = start1 + np.cumsum(f)
    c2 = start2 + np.cumsum(1 - f)
    valid = np.ones(len(v), dtype=bool)
    valid[:-1] = v[:-1] != v[1:]
    if next_first is not None and v[-1] == next_first:
        valid[-1] = False
    if not valid.any():
        return 0.0
    d = np.abs(c1[valid] / n1 - c2[valid] / n2)
    return float(d.max())


def ks_two_sample(
    ds: ray.data.Dataset,
    value: str,
    group: str,
    group_a,
    group_b,
) -> pa.Table:
    """Exact two-sample Kolmogorov–Smirnov statistic between the ``value``
    distributions of two groups — the standard distribution-shift test for
    "did this source's score distribution move?".

    ``D = max_x |F_a(x) − F_b(x)|`` evaluated after each complete tie
    group (identical to the SQL RANGE-framed window cumulative).  Shape:
    ONE distributed sort by value; a metadata wave of per-block (n_a, n_b,
    first_value) gives every block its starting cumulative counts AND its
    successor's first value (so ties spanning block boundaries are never
    evaluated mid-tie); one zero-move max wave; driver reduces #blocks
    floats.
    """
    def keep(batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column(group),
                     value_set=pa.array([group_a, group_b]))
        t = batch.filter(m)
        flag = pc.cast(pc.equal(t.column(group), group_a), pa.int8())
        return pa.table({value: t.column(value), "_f": flag})

    slim = ds.select_columns([group, value]).map_batches(
        keep, batch_format="pyarrow")
    ordered = slim.sort([value]).materialize()
    refs = ordered.to_arrow_refs()
    meta = ray.get([_ks_block_counts.remote(r, value, "_f") for r in refs])
    n1 = sum(m[0] for m in meta)
    n2 = sum(m[1] for m in meta)
    if n1 == 0 or n2 == 0:
        raise ValueError("both groups must be non-empty")
    starts1 = np.concatenate(([0], np.cumsum([m[0] for m in meta])[:-1]))
    starts2 = np.concatenate(([0], np.cumsum([m[1] for m in meta])[:-1]))
    next_firsts = [meta[i + 1][2] if i + 1 < len(meta) else None
                   for i in range(len(meta))]
    maxes = ray.get([
        _ks_block_max.remote(r, value, "_f", int(s1), int(s2), n1, n2, nf)
        for r, s1, s2, nf in zip(refs, starts1, starts2, next_firsts)])
    return pa.table({
        "n_a": pa.array([n1], pa.int64()),
        "n_b": pa.array([n2], pa.int64()),
        "ks_d": pa.array([max(maxes)], pa.float64()),
    })


def ohlc_by_key(
    ds: ray.data.Dataset,
    key: str,
    order_col: str,
    tiebreak_col: str,
    value_col: str,
    vol_scale: int = 1000,
) -> ray.data.Dataset:
    """Time-bucketed OHLC bars: per ``key`` the first (open) and last
    (close) ``value_col`` under the total order ``(order_col,
    tiebreak_col)``, the min/max, the row count, and an integer-quantized
    volume sum.

    Open/close are SELECTIONS (mergeable argmin/argmax partials), so no
    float reduction-order hazard exists anywhere: per batch one
    ``lexsort`` + ``reduceat`` pass emits a single partial row per key;
    the final combine is a key-sized ``map_groups`` over partial rows
    (bars, not events).  Volume is summed in int64 ``vol_scale`` units.
    """

    def partial(batch: pa.Table) -> pa.Table:
        # Key type follows the input schema (``key`` is generic: int or
        # string callers both get schema-consistent blocks, including the
        # empty-batch partial).
        ktype = batch.schema.field(key).type
        k = batch.column(key).to_numpy(zero_copy_only=False)
        o = batch.column(order_col).to_numpy(zero_copy_only=False)
        t = batch.column(tiebreak_col).to_numpy(zero_copy_only=False)
        v = batch.column(value_col).to_numpy(zero_copy_only=False)
        if len(k) == 0:
            return pa.table({
                key: pa.array([], ktype),
                "_ots": pa.array([], pa.int64()),
                "_otie": pa.array([], pa.int64()),
                "_oval": pa.array([], pa.float64()),
                "_cts": pa.array([], pa.int64()),
                "_ctie": pa.array([], pa.int64()),
                "_cval": pa.array([], pa.float64()),
                "_mn": pa.array([], pa.float64()),
                "_mx": pa.array([], pa.float64()),
                "_n": pa.array([], pa.int64()),
                "_vol": pa.array([], pa.int64()),
            })
        from ..dsutil import run_starts

        # Arrow sort instead of np.lexsort: object arrays with None keys
        # (nullable string symbols) would raise TypeError in lexsort, and
        # the Arrow path is null-safe for every key type
        order = pc.sort_indices(batch, sort_keys=[
            (key, "ascending"), (order_col, "ascending"),
            (tiebreak_col, "ascending")]).to_numpy(zero_copy_only=False)
        k, o, t, v = k[order], o[order], t[order], v[order]
        # null-safe run detection on the reordered Arrow key column
        k_arr = batch.column(key).combine_chunks() \
                     .take(pa.array(order, pa.int64()))
        starts = np.flatnonzero(run_starts(k_arr))
        ends = np.r_[starts[1:], len(k)] - 1
        qv = np.floor(v * float(vol_scale) + 0.5).astype(np.int64)
        return pa.table({
            key: k_arr.take(pa.array(starts, pa.int64())),
            "_ots": pa.array(o[starts], pa.int64()),
            "_otie": pa.array(t[starts], pa.int64()),
            "_oval": pa.array(v[starts], pa.float64()),
            "_cts": pa.array(o[ends], pa.int64()),
            "_ctie": pa.array(t[ends], pa.int64()),
            "_cval": pa.array(v[ends], pa.float64()),
            "_mn": pa.array(np.minimum.reduceat(v, starts), pa.float64()),
            "_mx": pa.array(np.maximum.reduceat(v, starts), pa.float64()),
            "_n": pa.array(ends - starts + 1, pa.int64()),
            "_vol": pa.array(np.add.reduceat(qv, starts), pa.int64()),
        })

    def final(part: pa.Table) -> pa.Table:
        """All bars of the partition at once: open = first partial under the
        (key, _ots, _otie) sort, close = last under (key, _cts, _ctie); the
        commutative aggregates combine via one local Arrow group_by.  All
        three passes emit rows in ascending-key order, so columns align."""
        if part.num_rows == 0:
            ktype = part.column(key).type
            f64 = pa.array([], pa.float64())
            return pa.table({key: pa.array([], ktype), "open": f64,
                             "high": f64, "low": f64, "close": f64,
                             "n": pa.array([], pa.int64()),
                             "vol_q": pa.array([], pa.int64())})
        t1 = part.take(pc.sort_indices(part, sort_keys=[
            (key, "ascending"), ("_ots", "ascending"), ("_otie", "ascending")]))
        from ..dsutil import run_starts

        starts1 = np.flatnonzero(run_starts(t1.column(key)))
        t2 = part.take(pc.sort_indices(part, sort_keys=[
            (key, "ascending"), ("_cts", "ascending"), ("_ctie", "ascending")]))
        last2 = np.append(starts1[1:] - 1, part.num_rows - 1)
        agg = t1.group_by(key, use_threads=False).aggregate(
            [("_mx", "max"), ("_mn", "min"), ("_n", "sum"), ("_vol", "sum")])
        return pa.table({
            key: t1.column(key).take(pa.array(starts1, pa.int64())),
            "open": t1.column("_oval").take(pa.array(starts1, pa.int64())),
            "high": agg.column("_mx_max").cast(pa.float64()),
            "low": agg.column("_mn_min").cast(pa.float64()),
            "close": t2.column("_cval").take(pa.array(last2, pa.int64())),
            "n": agg.column("_n_sum").cast(pa.int64()),
            "vol_q": agg.column("_vol_sum").cast(pa.int64()),
        })

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(
        ds.select_columns([key, order_col, tiebreak_col, value_col])
        .map_batches(partial, batch_format="pyarrow"), key, final)


# ---------------------------------------------------------------------------
# Kaplan-Meier survival estimator
# ---------------------------------------------------------------------------

def kaplan_meier(
    ds: "ray.data.Dataset",
    subject_col: str,
    ts_col: str,
    censor_horizon_us: int,
    bucket_us: int = 86_400_000_000,
) -> pa.Table:
    """Kaplan-Meier survival curve over subject lifetimes derived from an
    event stream — S(t) = Π_{t_i <= t} (1 − d_i / n_i) at each distinct
    lifetime bucket t_i with d_i > 0, where a subject's lifetime is
    ``floor((max_ts − min_ts) / bucket_us)`` and the subject is an EVENT
    (churned) iff its last activity predates the corpus end by more than
    ``censor_horizon_us`` (otherwise right-censored: still alive at the
    observation boundary).  The classic churn / retention-duration
    estimator with censoring handled properly, one level up from the
    day-over-day churn counts (`user_churn_daily`).

    Scale shape: one subject-keyed combine (Min/Max ts — map-side partial,
    pre-combined) produces the lifetime table; a second keyed combine
    reduces it to the BUCKET-bounded (t, d_i, c_i) table (distinct lifetime
    buckets, e.g. days — thousands at most, by contract); at-risk counts
    and the cumulative product are a vectorized driver pass over that tiny
    table (reverse cumsum + cumprod — sequential by construction, so the
    float product is deterministic and an SQL windowed PRODUCT re-derives
    it exactly).

    Returns pa.Table(t, events, censored, at_risk, survival) over buckets
    with d_i > 0, survival UNROUNDED (callers round for hashing).
    """
    from ray.data.aggregate import Count as _Count, Max as _Max, Min as _Min
    from ray.data.aggregate import Sum as _Sum

    base = ds.select_columns([subject_col, ts_col]).materialize()
    end_us = base.aggregate(_Max(ts_col, alias_name="m"))["m"]
    end_us = int(pa.scalar(end_us).cast(pa.timestamp("us")).cast(
        pa.int64()).as_py())
    cutoff = end_us - censor_horizon_us

    spans = base.groupby(subject_col).aggregate(
        _Min(ts_col, alias_name="_lo"), _Max(ts_col, alias_name="_hi"))

    def lifetimes(batch: pa.Table) -> pa.Table:
        lo = batch.column("_lo").cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        hi = batch.column("_hi").cast(pa.timestamp("us")).cast(
            pa.int64()).to_numpy(zero_copy_only=False)
        return pa.table({
            "t": pa.array((hi - lo) // bucket_us, pa.int64()),
            "_ev": pa.array((hi < cutoff).astype(np.int64), pa.int64()),
        })

    per_t = (spans.map_batches(lifetimes, batch_format="pyarrow")
             .groupby("t").aggregate(_Sum("_ev", alias_name="d"),
                                     _Count(alias_name="c"))
             ).take_all()
    per_t.sort(key=lambda r: r["t"])
    t = np.array([r["t"] for r in per_t], np.int64)
    d = np.array([r["d"] for r in per_t], np.int64)
    c = np.array([r["c"] for r in per_t], np.int64)
    # at risk at t_i: everyone with lifetime >= t_i
    n_at = c[::-1].cumsum()[::-1]
    keep = d > 0
    surv = np.cumprod(1.0 - d[keep].astype(np.float64) / n_at[keep])
    return pa.table({
        "t": pa.array(t[keep], pa.int64()),
        "events": pa.array(d[keep], pa.int64()),
        "censored": pa.array((c - d)[keep], pa.int64()),
        "at_risk": pa.array(n_at[keep], pa.int64()),
        "survival": pa.array(surv, pa.float64()),
    })
