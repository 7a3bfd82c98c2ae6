"""Mergeable sketches and multi-level aggregates for corpus-scale counting.

At 10^12 rows, exact global COUNT(DISTINCT) over a high-cardinality column
(URLs, user ids, n-grams) needs a full shuffle of every distinct value;
a sketch needs one streaming pass and a registers-sized merge.  Everything
here follows the same shape: per-block partial state inside ``map_batches``
(the only pass over the data), then a merge of block summaries whose size is
INDEPENDENT of row count.

* ``hll_distinct`` / ``hll_distinct_by`` — HyperLogLog (Flajolet et al.
  2007) with the standard bias correction and small/large-range corrections.
  Registers merge by elementwise max (commutative + idempotent ⇒ the result
  is partition- and retry-independent given the hash).  2^p registers;
  p=12 → 4 KB state, ~1.6 % standard error.
* ``heavy_hitters`` — EXACT frequent items at any scale, two passes:
  pass 1 runs Misra-Gries (k counters) per block and merges the bounded
  summaries (guarantee: any value with global count > n/k survives as a
  candidate — merging MG summaries preserves the deficit bound, Agarwal et
  al. 2012); pass 2 re-scans counting ONLY the ≤k candidates (broadcast
  set, zero shuffle) and filters to the threshold.  Output is exact, so the
  SQL oracle is a plain GROUP BY ... HAVING.
* ``rollup_counts`` — GROUP BY ROLLUP(k1, k2, ...): the finest level is the
  one keyed shuffle; every coarser level re-aggregates the (bounded,
  key-cardinality-sized) finest table driver-side, mirroring SQL's NULL
  markers for rolled-up columns.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from ..functions.hashing import stable_hash64_column

HLL_SEED = 42


def _hll_partial(values, p: int, seed: int) -> np.ndarray:
    """Registers (uint8[2^p]) for one batch: bucket = top p hash bits,
    rank = 1 + leading zeros of the remaining 64-p bits (capped)."""
    h = stable_hash64_column(values, seed=seed)
    m = 1 << p
    bucket = (h >> np.uint64(64 - p)).astype(np.int64)
    rest = (h << np.uint64(p)) | (np.uint64(1) << np.uint64(p - 1))  # sentinel
    # leading zero count of `rest` via bit_length: lzc = 64 - bit_length
    bl = np.zeros(len(rest), dtype=np.int64)
    r = rest.copy()
    for shift in (32, 16, 8, 4, 2, 1):
        mask = r >= (np.uint64(1) << np.uint64(shift))
        bl[mask] += shift
        r[mask] >>= np.uint64(shift)
    bl[rest > 0] += 1
    # rank = leading zeros + 1 = 64 - bit_length + 1, capped to the suffix
    # width (the sentinel guarantees bl >= p, so the cap only binds there)
    rank = np.minimum(64 - bl + 1, 64 - p + 1).astype(np.uint8)
    regs = np.zeros(m, dtype=np.uint8)
    np.maximum.at(regs, bucket, rank)
    return regs


def _hll_estimate(regs: np.ndarray) -> float:
    """Standard HLL estimator with small-range (linear counting) and
    large-range corrections."""
    m = float(len(regs))
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est = alpha * m * m / np.sum(np.exp2(-regs.astype(np.float64)))
    zeros = float(np.count_nonzero(regs == 0))
    if est <= 2.5 * m and zeros > 0:
        est = m * np.log(m / zeros)
    elif est > (1 << 64) / 30.0:  # pragma: no cover — unreachable at tests
        est = -(2.0 ** 64) * np.log(1.0 - est / 2.0 ** 64)
    return float(est)


def hll_distinct(
    ds: ray.data.Dataset,
    col: str,
    p: int = 12,
    seed: int = HLL_SEED,
) -> int:
    """Approximate global COUNT(DISTINCT col): one streaming pass emitting a
    4 KB register row per block, elementwise-max merge on the driver
    (#blocks × 2^p bytes — never row-scaled).  ~1.04/√2^p relative error."""

    def partial(batch: pa.Table) -> pa.Table:
        regs = _hll_partial(batch.column(col), p, seed)
        return pa.table({"regs": pa.array([regs], pa.list_(pa.uint8()))})

    merged = np.zeros(1 << p, dtype=np.uint8)
    for row in ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow").take_all():
        np.maximum(merged, np.asarray(row["regs"], dtype=np.uint8), out=merged)
    return int(round(_hll_estimate(merged)))


def hll_distinct_by(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    p: int = 12,
    seed: int = HLL_SEED,
) -> ray.data.Dataset:
    """Per-key approximate COUNT(DISTINCT col): per-(block, key) register
    rows, ONE keyed shuffle of 4 KB payloads, per-key max-merge.  The
    shuffle volume is #keys × #blocks × 2^p bytes — independent of rows."""

    def partial(batch: pa.Table) -> pa.Table:
        keys_np = batch.column(key).to_numpy(zero_copy_only=False)
        out_k: List = []
        out_r: List[np.ndarray] = []
        for kv in np.unique(keys_np):
            sel = batch.filter(pa.array(keys_np == kv))
            out_k.append(kv)
            out_r.append(_hll_partial(sel.column(col), p, seed))
        return pa.table({key: pa.array(out_k, batch.column(key).type),
                         "regs": pa.array(out_r, pa.list_(pa.uint8()))})

    def merge(group: pa.Table) -> pa.Table:
        regs = np.zeros(1 << p, dtype=np.uint8)
        for row in group.column("regs").to_pylist():
            np.maximum(regs, np.asarray(row, dtype=np.uint8), out=regs)
        return pa.table({
            key: pa.array([group.column(key)[0].as_py()],
                          group.column(key).type),
            "approx_distinct": pa.array([int(round(_hll_estimate(regs)))],
                                        pa.int64()),
        })

    return (ds.select_columns([key, col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(key)
            .map_groups(merge, batch_format="pyarrow"))


def _mg_merge(a: Dict, b: Dict, k: int) -> Dict:
    """Merge two Misra-Gries summaries preserving the ≤ n/k deficit bound:
    add counts, then decrement all by the (k+1)-th largest and drop ≤ 0."""
    out = dict(a)
    for v, c in b.items():
        out[v] = out.get(v, 0) + c
    if len(out) > k:
        cut = sorted(out.values(), reverse=True)[k]
        out = {v: c - cut for v, c in out.items() if c > cut}
    return out


def heavy_hitters(
    ds: ray.data.Dataset,
    col: str,
    threshold: int,
    k: int = 4096,
    with_total: bool = False,
):
    """EXACT values with global count ≥ ``threshold`` — (value, n), no
    full-cardinality shuffle and no row-scaled driver state at any point.

    Pass 1: per-block exact value counts collapse into a ≤ k-entry
    Misra-Gries summary BEFORE leaving the worker, so the driver merge sees
    ≤ k × #blocks bounded rows; the merged summary's per-value count deficit
    is ≤ n/(k+1) (Agarwal et al. 2012, mergeable summaries), so every value
    with true count > n/(k+1) survives as a candidate.  The operator raises
    if ``threshold`` is below that guarantee line — raise ``k`` to hunt
    rarer values.
    Pass 2: exact counts for the ≤ k surviving candidates only (broadcast
    membership filter + per-block counts, zero shuffle), then the threshold
    filter.  Output counts are exact, so correctness is checkable by plain
    SQL GROUP BY ... HAVING regardless of the sketch internals.
    """

    def block_summary(batch: pa.Table) -> pa.Table:
        vc = batch.group_by(col).aggregate([([], "count_all")])
        d = dict(zip(vc.column(col).to_pylist(),
                     vc.column("count_all").to_pylist()))
        if len(d) > k:
            cut = sorted(d.values(), reverse=True)[k]
            d = {v: c - cut for v, c in d.items() if c > cut}
        vals = list(d.keys())
        rows = [0] * max(len(vals), 1)
        rows[0] = batch.num_rows
        if not vals:  # all-pruned block still reports its row count
            return pa.table({"value": pa.array([None], batch.column(col).type),
                             "n": pa.array([0], pa.int64()),
                             "rows": pa.array(rows, pa.int64())})
        return pa.table({
            "value": pa.array(vals, batch.column(col).type),
            "n": pa.array([d[v] for v in vals], pa.int64()),
            "rows": pa.array(rows, pa.int64()),
        })

    summaries = ds.select_columns([col]).map_batches(
        block_summary, batch_format="pyarrow").take_all()
    total_rows = sum(r["rows"] for r in summaries)
    if threshold <= total_rows // (k + 1):
        raise ValueError(
            f"threshold {threshold} is under the MG guarantee line "
            f"n/(k+1) = {total_rows // (k + 1)}; raise k")
    merged: Dict = {}
    for r in summaries:
        if r["value"] is not None:
            merged = _mg_merge(merged, {r["value"]: r["n"]}, k)

    cand_arr = pa.array(sorted(merged.keys()))
    ref = ray.put(cand_arr)

    def exact_counts(batch: pa.Table) -> pa.Table:
        ca = ray.get(ref)
        vals = batch.column(col)
        sel = batch.filter(pc.is_in(vals, value_set=ca))
        vc = sel.group_by(col).aggregate([([], "count_all")])
        return pa.table({"value": vc.column(col),
                         "n": vc.column("count_all").cast(pa.int64())})

    parts = ds.select_columns([col]).map_batches(
        exact_counts, batch_format="pyarrow").take_all()
    exact: Dict = {}
    for r in parts:  # ≤ k × #blocks rows
        exact[r["value"]] = exact.get(r["value"], 0) + r["n"]
    keep = sorted(((v, c) for v, c in exact.items() if c >= threshold),
                  key=lambda t: (-t[1], t[0]))
    tbl = pa.table({"value": pa.array([v for v, _ in keep]),
                    "n": pa.array([c for _, c in keep], pa.int64())})
    # with_total: also report the scanned row count (already tallied for the
    # MG guarantee check) — lets callers like skew_join detect "every row is
    # hot" without a second pass
    return (tbl, total_rows) if with_total else tbl


def rollup_counts(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    null_marker: Optional[str] = None,
) -> pa.Table:
    """``GROUP BY ROLLUP(keys...)`` counts: finest level is the one keyed
    shuffle; coarser levels re-aggregate the finest (bounded) table
    driver-side.  Rolled-up key columns carry ``null_marker`` (None ⇒ SQL
    NULL)."""
    from ray.data.aggregate import Count

    keys = list(keys)
    finest = ds.groupby(keys).aggregate(Count(alias_name="n")).take_all()

    out_rows: List[Tuple] = []
    for level in range(len(keys), -1, -1):
        agg: Dict[Tuple, int] = {}
        for r in finest:
            kt = tuple(r[k] for k in keys[:level])
            agg[kt] = agg.get(kt, 0) + r["n"]
        for kt, n in agg.items():
            full = list(kt) + [null_marker] * (len(keys) - level)
            out_rows.append((*full, n))
    out_rows.sort(key=lambda t: tuple((x is None, x) for x in t[:-1]))
    cols: Dict[str, list] = {k: [] for k in keys}
    ns = []
    for row in out_rows:
        for i, k in enumerate(keys):
            cols[k].append(row[i])
        ns.append(row[-1])
    tbl = {k: pa.array(cols[k], pa.string()) for k in keys}
    tbl["n"] = pa.array(ns, pa.int64())
    return pa.table(tbl)


def cube_counts(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    null_marker: Optional[str] = None,
) -> pa.Table:
    """``GROUP BY CUBE(keys...)`` counts — every subset of ``keys`` as a
    grouping set.  Same shape as :func:`rollup_counts`: the finest-level
    groupby is the ONE keyed shuffle over the data; all 2^k coarser grouping
    sets re-aggregate the finest (bounded: |distinct key combos| rows)
    table driver-side, so adding grouping sets costs no extra passes.
    Rolled-up key columns carry ``null_marker`` (None => SQL NULL)."""
    from itertools import combinations

    from ray.data.aggregate import Count

    keys = list(keys)
    finest = ds.groupby(keys).aggregate(Count(alias_name="n")).take_all()

    out_rows: List[Tuple] = []
    for level in range(len(keys), -1, -1):
        for subset in combinations(range(len(keys)), level):
            agg: Dict[Tuple, int] = {}
            for r in finest:
                kt = tuple(r[keys[i]] for i in subset)
                agg[kt] = agg.get(kt, 0) + r["n"]
            for kt, n in agg.items():
                full: List = [null_marker] * len(keys)
                for pos, i in enumerate(subset):
                    full[i] = kt[pos]
                out_rows.append((*full, n))
    out_rows.sort(key=lambda t: tuple((x is None, x) for x in t[:-1]))
    cols: Dict[str, list] = {k: [] for k in keys}
    ns = []
    for row in out_rows:
        for i, k in enumerate(keys):
            cols[k].append(row[i])
        ns.append(row[-1])
    tbl = {k: pa.array(cols[k], pa.string()) for k in keys}
    tbl["n"] = pa.array(ns, pa.int64())
    return pa.table(tbl)


def grouping_sets_counts(
    ds: ray.data.Dataset,
    keys: Sequence[str],
    sets: Sequence[Sequence[str]],
    null_marker: Optional[str] = None,
) -> pa.Table:
    """``GROUP BY GROUPING SETS ((...), ...)`` counts — the generalization
    ROLLUP and CUBE are sugar for.  Same one-shuffle shape: the finest
    groupby over the union of all requested keys is the only pass over the
    data; each requested set re-aggregates the bounded finest table
    driver-side.  Keys absent from a set carry ``null_marker``."""
    keys = list(keys)
    for s in sets:
        assert set(s) <= set(keys), f"set {s} not within keys {keys}"
    from ray.data.aggregate import Count

    finest = ds.groupby(keys).aggregate(Count(alias_name="n")).take_all()

    out_rows: List[Tuple] = []
    for s in sets:
        idxs = [keys.index(k) for k in s]
        agg: Dict[Tuple, int] = {}
        for r in finest:
            kt = tuple(r[keys[i]] for i in idxs)
            agg[kt] = agg.get(kt, 0) + r["n"]
        for kt, n in agg.items():
            full: List = [null_marker] * len(keys)
            for pos, i in enumerate(idxs):
                full[i] = kt[pos]
            out_rows.append((*full, n))
    out_rows.sort(key=lambda t: tuple((x is None, x) for x in t[:-1]))
    cols: Dict[str, list] = {k: [] for k in keys}
    ns = []
    for row in out_rows:
        for i, k in enumerate(keys):
            cols[k].append(row[i])
        ns.append(row[-1])
    tbl = {k: pa.array(cols[k], pa.string()) for k in keys}
    tbl["n"] = pa.array(ns, pa.int64())
    return pa.table(tbl)


def histogram_fixed(
    ds: ray.data.Dataset,
    col: str,
    lo: float,
    hi: float,
    bins: int,
) -> pa.Table:
    """Global fixed-width histogram over [lo, hi) — bin counts with values
    outside the range clamped to the edge bins.  Zero shuffle: per-block
    ``np.bincount`` partials (bins ints each) merge by addition on the
    driver.  Returns (bin, lo_edge, n) for all ``bins`` rows (empty bins
    included — fixed output schema and size)."""
    width = (hi - lo) / bins

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        b = np.clip(((v - lo) / width).astype(np.int64), 0, bins - 1)
        return pa.table({"counts": pa.array(
            [np.bincount(b, minlength=bins).astype(np.int64)],
            pa.list_(pa.int64()))})

    total = np.zeros(bins, dtype=np.int64)
    for r in ds.select_columns([col]).map_batches(
            partial, batch_format="pyarrow").take_all():
        total += np.asarray(r["counts"], dtype=np.int64)
    return pa.table({
        "bin": pa.array(np.arange(bins), pa.int64()),
        "lo_edge": pa.array(lo + np.arange(bins) * width, pa.float64()),
        "n": pa.array(total, pa.int64()),
    })


# ---------------------------------------------------------------------------
# Exact global order statistics WITHOUT a sort — iterative histogram
# rank-refinement (the classic distributed selection scheme: Blum et al.
# selection generalized to histograms; same family as Terasort's partition
# sampling but exact).  Each pass histograms only the still-active value
# interval; the k-th value's bin is located from the merged counts, the
# interval narrows to that bin's ACTUAL [min, max] (so any monotone binning
# is safe), and the rank re-bases.  Distinct values in an interval fall
# below `bins` within O(log_bins(range/gap)) passes, so every target either
# pins to a single float or its bin count drops under `exact_threshold` and
# one bounded collect finishes it with np.partition.
#
# Scale shape: ZERO shuffles; per pass one streaming map_batches emitting a
# (3 × n_intervals × bins)-float partial per block, merged on the driver —
# state independent of row count.  The column is materialized once so the
# multi-pass loop re-reads object-store blocks, not the upstream pipeline.
# Contrast statagg.median_by_key (sort-based, per-key): this is the global,
# sort-free path for 10^12-row percentiles.
# ---------------------------------------------------------------------------


def _order_stats_pass(vals, col: str, intervals, bins: int):
    """One refinement pass: per (lo, hi) interval, merged histogram counts
    plus per-bin actual min/max over ``vals[col]``."""
    K = len(intervals)
    los = np.array([iv[0] for iv in intervals], np.float64)
    his = np.array([iv[1] for iv in intervals], np.float64)

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        cnt = np.zeros((K, bins), np.int64)
        mn = np.full((K, bins), np.inf)
        mx = np.full((K, bins), -np.inf)
        for i in range(K):
            lo, hi = los[i], his[i]
            x = v[(v >= lo) & (v <= hi)]
            if len(x) == 0:
                continue
            if hi > lo:
                b = np.minimum(((x - lo) * (bins / (hi - lo))).astype(np.int64),
                               bins - 1)
            else:
                b = np.zeros(len(x), np.int64)
            cnt[i] += np.bincount(b, minlength=bins)
            order = np.argsort(b, kind="stable")
            bs, xs = b[order], x[order]
            first = np.ones(len(bs), dtype=bool)
            first[1:] = bs[1:] != bs[:-1]
            starts = np.flatnonzero(first)
            ub = bs[starts]
            mn[i, ub] = np.minimum(mn[i, ub], np.minimum.reduceat(xs, starts))
            mx[i, ub] = np.maximum(mx[i, ub], np.maximum.reduceat(xs, starts))
        return pa.table({
            "c": pa.array([cnt.ravel()], pa.list_(pa.int64())),
            "mn": pa.array([mn.ravel()], pa.list_(pa.float64())),
            "mx": pa.array([mx.ravel()], pa.list_(pa.float64())),
        })

    C = np.zeros(K * bins, np.int64)
    MN = np.full(K * bins, np.inf)
    MX = np.full(K * bins, -np.inf)
    for r in vals.map_batches(partial, batch_format="pyarrow").take_all():
        C += np.asarray(r["c"], np.int64)
        MN = np.minimum(MN, np.asarray(r["mn"], np.float64))
        MX = np.maximum(MX, np.asarray(r["mx"], np.float64))
    return C.reshape(K, bins), MN.reshape(K, bins), MX.reshape(K, bins)


def order_statistics(
    ds: ray.data.Dataset,
    col: str,
    ks: Sequence[int],
    bins: int = 2048,
    exact_threshold: int = 65536,
    max_passes: int = 64,
    _vals: Optional[ray.data.Dataset] = None,
) -> Dict[int, float]:
    """Exact k-th smallest values (0-based ranks, NaN/null-free order) of a
    numeric column, any number of ranks in one shared pass sequence."""
    vals = _vals if _vals is not None else ds.select_columns([col]).materialize()

    def count_minmax(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        return pa.table({
            "n": pa.array([len(v)], pa.int64()),
            "mn": pa.array([v.min() if len(v) else np.inf], pa.float64()),
            "mx": pa.array([v.max() if len(v) else -np.inf], pa.float64()),
        })

    n, gmin, gmax = 0, np.inf, -np.inf
    for r in vals.map_batches(count_minmax, batch_format="pyarrow").take_all():
        n += r["n"]
        gmin, gmax = min(gmin, r["mn"]), max(gmax, r["mx"])
    for k in ks:
        if not (0 <= k < n):
            raise IndexError(f"rank {k} out of range for {n} values")

    # state per target rank: (lo, hi, below) with the k-th value in [lo, hi]
    # and `below` = #values < lo
    state = {int(k): (float(gmin), float(gmax), 0) for k in ks}
    result: Dict[int, float] = {}
    collect: Dict[int, Tuple[float, float, int]] = {}  # (lo, hi, rel_rank)

    for _ in range(max_passes):
        active = {k: s for k, s in state.items()
                  if k not in result and k not in collect}
        if not active:
            break
        intervals = sorted({(s[0], s[1]) for s in active.values()})
        idx = {iv: i for i, iv in enumerate(intervals)}
        C, MN, MX = _order_stats_pass(vals, col, intervals, bins)
        for k, (lo, hi, below) in active.items():
            i = idx[(lo, hi)]
            cum = np.cumsum(C[i])
            rel = k - below
            j = int(np.searchsorted(cum, rel, side="right"))
            in_bin = int(C[i, j])
            new_below = below + (int(cum[j - 1]) if j else 0)
            blo, bhi = float(MN[i, j]), float(MX[i, j])
            if blo == bhi:
                result[k] = blo
            elif in_bin <= exact_threshold:
                collect[k] = (blo, bhi, rel - (new_below - below))
            else:
                state[k] = (blo, bhi, new_below)
    else:  # pragma: no cover — convergence is geometric
        raise RuntimeError("order_statistics did not converge")

    if collect:
        cints = sorted({(a, b) for a, b, _ in collect.values()})

        def gather(batch: pa.Table) -> pa.Table:
            v = batch.column(col).to_numpy(zero_copy_only=False
                                           ).astype(np.float64)
            v = v[~np.isnan(v)]
            out = [v[(v >= a) & (v <= b)] for a, b in cints]
            return pa.table({"v": pa.array(
                [out], pa.list_(pa.list_(pa.float64())))})

        pools: List[List[np.ndarray]] = [[] for _ in cints]
        for r in vals.map_batches(gather, batch_format="pyarrow").take_all():
            for i, x in enumerate(r["v"]):
                pools[i].append(np.asarray(x, np.float64))
        merged = [np.concatenate(p) if p else np.empty(0) for p in pools]
        cidx = {iv: i for i, iv in enumerate(cints)}
        for k, (a, b, rr) in collect.items():
            pool = merged[cidx[(a, b)]]
            result[k] = float(np.partition(pool, rr)[rr])
    return result


def quantiles_global(
    ds: ray.data.Dataset,
    col: str,
    qs: Sequence[float],
    kind: str = "cont",
    bins: int = 2048,
    exact_threshold: int = 65536,
) -> List[float]:
    """Exact global ``quantile_cont`` / ``quantile_disc`` without a sort —
    order statistics by histogram rank-refinement, DuckDB-matching
    interpolation: cont interpolates ranks (n-1)·q, disc takes the element
    at ceil(q·n)-1."""
    vals = ds.select_columns([col]).materialize()

    def nn_count(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table({"n": pa.array([int((~np.isnan(v)).sum())], pa.int64())})

    n = sum(r["n"] for r in vals.map_batches(
        nn_count, batch_format="pyarrow").take_all())
    if n == 0:
        return [float("nan")] * len(qs)
    need = set()
    plans = []
    for q in qs:
        if kind == "cont":
            h = (n - 1) * float(q)
            k0, k1 = int(np.floor(h)), int(np.ceil(h))
            need.update((k0, k1))
            plans.append(("cont", h, k0, k1))
        elif kind == "disc":
            k = max(int(np.ceil(float(q) * n)) - 1, 0)
            need.add(k)
            plans.append(("disc", k, None, None))
        else:
            raise ValueError(kind)
    os_ = order_statistics(vals, col, sorted(need), bins=bins,
                           exact_threshold=exact_threshold, _vals=vals)
    out = []
    for kind_, a, k0, k1 in plans:
        if kind_ == "disc":
            out.append(os_[a])
        else:
            lo, hi = os_[k0], os_[k1]
            out.append(lo + (a - k0) * (hi - lo))
    return out


# ---------------------------------------------------------------------------
# Count-Min sketch (Cormode & Muthukrishnan 2005) — approximate frequency of
# EVERY key in one streaming pass, with a one-sided error guarantee:
# exact <= est <= exact + (e/width) * N with probability 1 - e^-depth.
#
# Scale shape: per block, each row hashes into `depth` buckets; the block
# emits its non-zero (slot, count) partials (<= depth*width rows however big
# the block), then ONE keyed combine sums slots.  Counter updates are
# integer additions — commutative and associative — so the merged matrix is
# partition-, retry- and layout-independent: the sketch (and every estimate
# read from it) is DETERMINISTIC for a given input multiset, which is what
# lets the SQL oracle re-derive it exactly (no "approximately equal" oracle).
#
# Hash family: h_i(k) = ((a_i*(k mod p) + b_i) mod p) mod width with
# p = 2^31 - 1 (Mersenne).  a_i*(k mod p) < 2^62 fits int64 exactly, and the
# same expression is plain BIGINT arithmetic in SQL.
# ---------------------------------------------------------------------------

_CM_P = 2147483647  # 2^31 - 1
_CM_PARAMS: List[Tuple[int, int]] = [
    (1103515245, 12345),
    (1664525, 1013904223),
    (69069, 362437),
    (22695477, 133331),
]


def _cm_slots(keys: np.ndarray, width: int, depth: int) -> np.ndarray:
    """(depth, n) int64 slot ids, row i offset by i*width."""
    km = (keys.astype(np.int64) % _CM_P)
    out = np.empty((depth, len(km)), dtype=np.int64)
    for i, (a, b) in enumerate(_CM_PARAMS[:depth]):
        out[i] = ((a * km + b) % _CM_P) % width + i * width
    return out


def count_min_table(
    ds: ray.data.Dataset,
    key: str,
    width: int = 2048,
    depth: int = 4,
) -> pa.Table:
    """Build the merged Count-Min matrix for an integer key column.

    Returns the bounded sparse form: (slot, c) with slot = i*width + bucket,
    only non-zero slots, <= depth*width rows total however many input rows.
    """
    if depth > len(_CM_PARAMS):
        raise ValueError(f"depth <= {len(_CM_PARAMS)}")
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        k = batch.column(key).cast(pa.int64()).to_numpy(zero_copy_only=False)
        slots = _cm_slots(k, width, depth).ravel()
        uniq, cnt = np.unique(slots, return_counts=True)
        return pa.table({"slot": pa.array(uniq, pa.int64()),
                         "c": pa.array(cnt.astype(np.int64), pa.int64())})

    merged = (ds.select_columns([key])
                .map_batches(partial, batch_format="pyarrow")
                .groupby("slot").aggregate(Sum("c", alias_name="c")))
    rows = merged.take_all()  # bounded: <= depth*width rows
    rows.sort(key=lambda r: r["slot"])
    return pa.table({
        "slot": pa.array([r["slot"] for r in rows], pa.int64()),
        "c": pa.array([r["c"] for r in rows], pa.int64()),
    })


def count_min_estimate(
    cm: pa.Table,
    keys: np.ndarray,
    width: int = 2048,
    depth: int = 4,
) -> np.ndarray:
    """Point-query the sketch: est(k) = min_i M[i, h_i(k)] (int64 array)."""
    dense = np.zeros(depth * width, dtype=np.int64)
    dense[cm.column("slot").to_numpy()] = cm.column("c").to_numpy()
    slots = _cm_slots(np.asarray(keys, dtype=np.int64), width, depth)
    return dense[slots].min(axis=0)


def count_min_inner_product(
    cm_a: pa.Table,
    cm_b: pa.Table,
    width: int,
    depth: int,
) -> int:
    """Join-size / self-join-size estimation from two Count-Min sketches
    (AGMS-style): ``est = min_i Σ_j A[i,j]·B[i,j]`` upper-bounds
    ``Σ_k c_A(k)·c_B(k)`` — the equi-join cardinality — with the same
    one-sided guarantee as point queries.  Both sketches must share the
    hash family / width / depth.  Integer arithmetic end-to-end, so the
    estimate is layout-deterministic and SQL-re-derivable exactly; the
    sketches are depth×width-bounded however large the joined inputs."""
    def dense(cm: pa.Table) -> np.ndarray:
        d = np.zeros(depth * width, dtype=np.int64)
        d[cm.column("slot").to_numpy()] = cm.column("c").to_numpy()
        return d.reshape(depth, width)

    a, b = dense(cm_a), dense(cm_b)
    return int((a * b).sum(axis=1).min())
