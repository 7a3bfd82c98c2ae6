"""Column profiling — dataset quality report as a first-class operator.

A corpus onboarding step every training-data pipeline runs: per-column row /
null / distinct counts, numeric min/max/mean, string length stats.  Shapes:

  * row/null/min/max/mean — one streaming ``Dataset.aggregate`` pass over
    all requested columns together (map-side combined, no shuffle of rows);
  * exact distinct counts — one composite shuffle per column over map-side
    deduped `(column, value)` pairs (the ``rankagg.distinct_count_by``
    pattern), so the exchange is bounded by distinct-value cardinality.

Output is one row per column (long format) — trivially joinable with a
previous run's profile for drift detection.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min


def profile_columns(
    ds: ray.data.Dataset,
    columns: Optional[List[str]] = None,
    distinct: bool = True,
) -> pa.Table:
    """One row per column: (column, n, n_null, n_distinct, min_str, max_str,
    mean_num, avg_len).  Numeric-only metrics are null for strings and vice
    versa; min/max stringified for a uniform schema.  ``distinct=False``
    skips the (per-column shuffle) distinct counts.
    """
    schema = ds.schema()
    columns = columns or schema.names
    types = dict(zip(schema.names, schema.types))
    ds = ds.select_columns(columns)

    n_rows = ds.count()

    # one combined aggregate pass: nulls + numeric stats + length stats
    aggs = []
    for c in columns:
        aggs.append(Count(on=c, ignore_nulls=True, alias_name=f"{c}__nn"))
        if pa.types.is_integer(types[c]) or pa.types.is_floating(types[c]):
            aggs.append(Min(c, alias_name=f"{c}__min"))
            aggs.append(Max(c, alias_name=f"{c}__max"))
            aggs.append(Mean(c, alias_name=f"{c}__mean"))

    str_cols = [c for c in columns if pa.types.is_string(types[c])
                or pa.types.is_large_string(types[c])]

    def add_lens(batch: pa.Table) -> pa.Table:
        cols = {c: batch.column(c) for c in batch.schema.names}
        for c in str_cols:
            cols[f"{c}__len"] = pc.utf8_length(batch.column(c)).cast(pa.int64())
        return pa.table(cols)

    if str_cols:
        ds_l = ds.map_batches(add_lens, batch_format="pyarrow")
        for c in str_cols:
            aggs.append(Mean(f"{c}__len", alias_name=f"{c}__avglen"))
            aggs.append(Min(c, alias_name=f"{c}__min"))
            aggs.append(Max(c, alias_name=f"{c}__max"))
    else:
        ds_l = ds
    stats = ds_l.aggregate(*aggs)

    n_distinct: dict = {}
    if distinct:
        for c in columns:
            def pairs(batch: pa.Table, col=c) -> pa.Table:
                t = batch.select([col]).filter(pc.is_valid(batch.column(col)))
                return t.group_by([col]).aggregate([])

            uniq = (ds.map_batches(pairs, batch_format="pyarrow")
                    .groupby(c).aggregate(Count(alias_name="_c")))
            n_distinct[c] = uniq.count()

    rows = []
    for c in columns:
        is_num = pa.types.is_integer(types[c]) or pa.types.is_floating(types[c])
        rows.append({
            "column": c,
            "n": n_rows,
            "n_null": n_rows - stats[f"{c}__nn"],
            "n_distinct": n_distinct.get(c),
            "min_str": (str(stats[f"{c}__min"])
                        if f"{c}__min" in stats and stats[f"{c}__min"] is not None
                        else None),
            "max_str": (str(stats[f"{c}__max"])
                        if f"{c}__max" in stats and stats[f"{c}__max"] is not None
                        else None),
            "mean_num": (float(stats[f"{c}__mean"])
                         if is_num and stats.get(f"{c}__mean") is not None else None),
            "avg_len": (float(stats[f"{c}__avglen"])
                        if f"{c}__avglen" in stats and
                        stats.get(f"{c}__avglen") is not None else None),
        })
    return pa.table({
        "column": pa.array([r["column"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "n_null": pa.array([r["n_null"] for r in rows], pa.int64()),
        "n_distinct": pa.array([r["n_distinct"] for r in rows], pa.int64()),
        "min_str": pa.array([r["min_str"] for r in rows], pa.string()),
        "max_str": pa.array([r["max_str"] for r in rows], pa.string()),
        "mean_num": pa.array([r["mean_num"] for r in rows], pa.float64()),
        "avg_len": pa.array([r["avg_len"] for r in rows], pa.float64()),
    })


def quality_audit(
    ds: ray.data.Dataset,
    rules,
) -> pa.Table:
    """Data-quality expectations: count violations of each named rule —
    Table(rule, violations, total).  The pre-training corpus gatekeeper
    (null text, length mismatches, out-of-vocabulary enum values, ...).

    ``rules`` is a list of ``(name, fn)`` where ``fn(batch: pa.Table)``
    returns a boolean mask (Arrow or numpy) marking VIOLATING rows.  Every
    rule is evaluated in the same single pass; each block ships one tiny
    (rule, n_bad, n_rows) partial table and a final keyed combine sums them
    — zero corpus-scale shuffle, output bounded by |rules|.
    """
    from ray.data.aggregate import Sum

    names = [n for n, _ in rules]
    fns = [f for _, f in rules]

    def partials(batch: pa.Table) -> pa.Table:
        bad: List[int] = []
        for f in fns:
            mask = f(batch)
            if isinstance(mask, (pa.Array, pa.ChunkedArray)):
                n = pc.sum(pc.fill_null(mask, False)).as_py() or 0
            else:
                n = int(np.count_nonzero(mask))
            bad.append(n)
        return pa.table({
            "rule": pa.array(names, pa.string()),
            "_bad": pa.array(bad, pa.int64()),
            "_rows": pa.array([batch.num_rows] * len(names), pa.int64()),
        })

    out = (ds.map_batches(partials, batch_format="pyarrow")
           .groupby("rule")
           .aggregate(Sum("_bad", alias_name="violations"),
                      Sum("_rows", alias_name="total")))
    rows = sorted(out.take_all(), key=lambda r: r["rule"])
    return pa.table({
        "rule": pa.array([r["rule"] for r in rows], pa.string()),
        "violations": pa.array([r["violations"] for r in rows], pa.int64()),
        "total": pa.array([r["total"] for r in rows], pa.int64()),
    })


def drift_by_key(
    ds: ray.data.Dataset,
    key: str,
    cat: str,
) -> pa.Table:
    """Distribution-shift report: per key, how far its category distribution
    sits from the corpus-wide distribution — KL divergence (base 2, with the
    key's own support; global probabilities are > 0 on it by construction)
    and the Pearson chi-squared statistic against expected counts
    ``n_key · p_global``.

    The drift screen every mixture/crawl pipeline runs per source or per
    time slice: a source whose language / event mix wanders from the corpus
    norm gets flagged before it poisons the blend.

    Scale shape: ONE keyed shuffle of map-side (key, cat) pre-counts —
    bounded by keys × cats × blocks; the global marginal derives from the
    same bounded table (no second pass over rows).  Finishing math runs on
    the driver over the keys × cats result (aggregate-small by contract:
    this operator is for bounded category columns).  Float sums run in
    sorted (key, cat) order — layout-independent.
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        t = batch.group_by([key, cat]).aggregate([([], "count_all")])
        return pa.table({key: t.column(key), cat: t.column(cat),
                         "_n": t.column("count_all").cast(pa.int64())})

    counts = (ds.select_columns([key, cat])
              .map_batches(partial, batch_format="pyarrow")
              .groupby([key, cat]).aggregate(Sum("_n", alias_name="_n"))
              ).take_all()  # bounded: keys x cats rows
    counts.sort(key=lambda r: (str(r[key]), str(r[cat])))
    if not counts:
        return pa.table({key: pa.array([], pa.string()),
                         "n": pa.array([], pa.int64()),
                         "kl_bits": pa.array([], pa.float64()),
                         "chi2": pa.array([], pa.float64())})

    cats = sorted({r[cat] for r in counts})
    keys = sorted({r[key] for r in counts})
    ci = {c: i for i, c in enumerate(cats)}
    ki = {k: i for i, k in enumerate(keys)}
    m = np.zeros((len(keys), len(cats)), np.float64)
    for r in counts:
        m[ki[r[key]], ci[r[cat]]] = r["_n"]
    tot = m.sum(axis=0)          # global category counts
    n_all = tot.sum()
    q = tot / n_all              # global distribution
    n_key = m.sum(axis=1)
    p = m / n_key[:, None]
    with np.errstate(divide="ignore", invalid="ignore"):
        kl_terms = np.where(m > 0, p * np.log2(p / q[None, :]), 0.0)
    kl = kl_terms.sum(axis=1)
    exp = n_key[:, None] * q[None, :]
    chi2 = ((m - exp) ** 2 / exp).sum(axis=1)
    ktype = pa.array(keys).type
    return pa.table({
        key: pa.array(keys, ktype),
        "n": pa.array(n_key.astype(np.int64), pa.int64()),
        "kl_bits": pa.array(kl, pa.float64()),
        "chi2": pa.array(chi2, pa.float64()),
    })


def k_anonymity_stats(
    ds: ray.data.Dataset,
    quasi_cols: Sequence[str],
    k: int = 5,
) -> pa.Table:
    """k-anonymity audit over a quasi-identifier combination — how much of
    the table sits in equivalence classes smaller than ``k`` (the rows a
    release would have to suppress or generalize).  Privacy-family sibling
    of :mod:`..functions.redact` (content-level PII removal); this is the
    LINKAGE-level risk measure.

    Output (one row): ``n_rows``, ``n_classes`` (distinct quasi-identifier
    combos), ``n_unsafe_classes`` (size < k), ``n_unsafe_rows`` (rows in
    them), ``min_class_size``.

    Shape: ONE keyed shuffle to class grain (map-side partial counts over
    the quasi columns), then class-table-sized per-batch partials combined
    on the driver (a handful of ints per block) — the raw table never
    leaves its blocks, and nothing class-scale is driver-resident.
    """
    from ray.data.aggregate import Sum

    cols = list(quasi_cols)

    def partial(batch: pa.Table) -> pa.Table:
        import polars as pl

        df = pl.from_arrow(batch.select(cols))
        g = df.group_by(cols).agg(pl.len().alias("_n"))
        out = g.to_arrow()
        return out.set_column(out.schema.get_field_index("_n"), "_n",
                              out.column("_n").cast(pa.int64()))

    classes = (ds.select_columns(cols)
               .map_batches(partial, batch_format="pyarrow")
               .groupby(cols).aggregate(Sum("_n", alias_name="n")))

    def audit(batch: pa.Table) -> pa.Table:
        n = batch.column("n").to_numpy(zero_copy_only=False)
        unsafe = n < k
        return pa.table({
            "n_rows": pa.array([int(n.sum())], pa.int64()),
            "n_classes": pa.array([len(n)], pa.int64()),
            "n_unsafe_classes": pa.array([int(unsafe.sum())], pa.int64()),
            "n_unsafe_rows": pa.array([int(n[unsafe].sum())], pa.int64()),
            "min_class_size": pa.array(
                [int(n.min()) if len(n) else 0], pa.int64()),
        })

    parts = classes.map_batches(audit, batch_format="pyarrow").take_all()
    agg = {c: 0 for c in ("n_rows", "n_classes", "n_unsafe_classes",
                          "n_unsafe_rows")}
    mn = None
    for r in parts:  # one row per class-table block
        for c in agg:
            agg[c] += r[c]
        if r["n_classes"]:
            mn = r["min_class_size"] if mn is None else min(
                mn, r["min_class_size"])
    return pa.table({c: pa.array([agg[c]], pa.int64()) for c in agg}
                    ).append_column("min_class_size",
                                    pa.array([mn or 0], pa.int64()))


def table_fingerprint(
    ds: ray.data.Dataset,
    int_cols: List[str],
    coeffs: Optional[List[int]] = None,
) -> str:
    """Order-independent 64-bit table digest (anti-entropy / replica
    comparison): ``hex(Σ_rows Σ_j coeff_j · col_j  mod 2⁶⁴)``.

    Commutative by construction, so the digest is identical for any row
    order, block layout, or partitioning — two replicas (or a table and its
    re-shuffled copy) compare by exchanging 8 bytes.  Per batch one
    vectorized uint64 wraparound dot product (numpy wrap IS the mod);
    partials combine on the driver with Python-int mod arithmetic.  The SQL
    mirror computes the same sum in HUGEINT and reduces mod 2⁶⁴ once —
    headroom holds to ~10⁹ rows per digest (1e24·1e9 « 2¹²⁷); shard the
    digest by key range beyond that.

    Contract: ``int_cols`` must be null-free (nulls would silently cast to
    NaN float64 and ``.view(uint64)`` would reinterpret the float bits —
    a garbage digest); enforced per batch.  The HUGEINT SQL mirror must
    reduce with a non-negative modulo (DuckDB's ``%`` is remainder, which
    is negative for negative sums): use
    ``(s % 2^64 + 2^64) % 2^64`` — the oracle in ``__ray_entry__`` does.
    """
    if coeffs is None:
        coeffs = [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
                  0x27D4EB2F165667C5][: len(int_cols)]
    if len(coeffs) != len(int_cols):
        raise ValueError("one coefficient per column")
    cs = [np.uint64(c) for c in coeffs]

    def partial(batch: pa.Table) -> pa.Table:
        acc = np.zeros(batch.num_rows, dtype=np.uint64)
        with np.errstate(over="ignore"):
            for col, c in zip(int_cols, cs):
                a = batch.column(col)
                if a.null_count:
                    raise ValueError(
                        f"table_fingerprint: column {col!r} has "
                        f"{a.null_count} nulls; the int64->uint64 "
                        "reinterpret requires null-free input (cast of a "
                        "null column yields float64 NaN whose bit pattern "
                        "would corrupt the digest) — fill or filter first")
                v = a.cast(pa.int64()).to_numpy(
                    zero_copy_only=False).view(np.uint64)
                acc += v * c
            s = np.add.reduce(acc, dtype=np.uint64) if len(acc) else \
                np.uint64(0)
        return pa.table({"_p": pa.array(
            np.array([s], dtype=np.uint64).view(np.int64), pa.int64())})

    rows = ds.select_columns(int_cols).map_batches(
        partial, batch_format="pyarrow").take_all()
    total = 0
    for r in rows:
        total = (total + (int(r["_p"]) & 0xFFFFFFFFFFFFFFFF)) \
            % (1 << 64)
    return f"{total:016x}"
