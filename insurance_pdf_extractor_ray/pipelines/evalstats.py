"""Model-evaluation and distribution-audit statistics.

The reference validates extraction quality with per-field booleans and a
confidence heuristic (`app/services/validators.py`,
`app/services/pdf_processor.py:109-146`); a training-data pipeline needs the
same idea at corpus scale — "how well does this score separate the classes,
and is this column's distribution plausible?".  Four operators:

* ``roc_auc`` — EXACT area under the ROC curve, the standard
  threshold-free ranking metric (equals the Mann–Whitney U statistic
  normalized by n⁺·n⁻, with the ½-credit tie convention).  Shape: one
  map-side per-batch combine to (score, n_pos, n_neg) partials, ONE keyed
  shuffle (`groupby(score)`) whose traffic is bounded by
  distinct-scores × blocks, one distributed sort of the distinct-score
  table, then a metadata wave: per-block (Σn_pos, Σn_neg) gives every
  block its starting negative-count prefix, and a zero-move second wave
  computes each block's Σ n_pos·(negatives_below + ½·negatives_tied)
  locally.  Because the groupby made scores unique, NO tie group ever
  spans a block boundary — the cross-block tie bookkeeping that
  ``statagg.ks_two_sample`` needs disappears by construction.  Driver
  reduces #blocks scalars; nothing corpus-scale ever leaves the cluster.
* ``calibration_bins`` — reliability diagram: equal-width bins over a
  predicted probability, per-bin (count, mean prediction, observed
  positive rate).  Pure algebraic aggregate: map-side combine to
  (bin, n, Σp, Σlabel), tiny keyed shuffle bounded by n_bins × blocks.
* ``categorical_association`` — mutual information (nats), chi² and
  Cramér's V between two categorical columns, from ONE distributed
  contingency count (`groupby(x, y).count()`).  The driver reduces the
  |X|·|Y| cell table (metadata scale — the same boundedness assumption as
  every GROUP BY over categorical keys); chi² uses the closed form
  n·(Σ o²/(r·c) − 1), which is exact and never enumerates empty cells.
* ``benford_first_digit`` — first-significant-digit histogram vs
  Benford's law, the classic fabricated-numbers audit.  The digit is
  extracted from the INTEGER cents value (round(x·100) then repeated
  integer division), never from float log10 — identical arithmetic in
  SQL (`substr(cast(bigint))`) so the oracle can't diverge on
  libm-rounding boundaries.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Count, Sum

# ---------------------------------------------------------------------------
# exact ROC AUC
# ---------------------------------------------------------------------------


@ray.remote
def _auc_block_sums(tbl: pa.Table):
    """(Σ n_pos, Σ n_neg) for one distinct-score block (possibly an empty
    zero-column block — guard before touching columns)."""
    if tbl.num_rows == 0:
        return 0, 0
    return (int(pc.sum(tbl.column("_np")).as_py() or 0),
            int(pc.sum(tbl.column("_nn")).as_py() or 0))


@ray.remote
def _auc_block_contrib(tbl: pa.Table, start_nn: int) -> float:
    """Σ n_pos·(negatives strictly below + ½·negatives tied) over one
    sorted block of UNIQUE scores; ``start_nn`` = negatives in all prior
    blocks.  Uniqueness (post-groupby) means no tie spans blocks."""
    if tbl.num_rows == 0:
        return 0.0
    np_ = tbl.column("_np").to_numpy(zero_copy_only=False).astype(np.float64)
    nn_ = tbl.column("_nn").to_numpy(zero_copy_only=False).astype(np.float64)
    below = start_nn + np.concatenate(([0.0], np.cumsum(nn_)[:-1]))
    return float(np.dot(np_, below) + 0.5 * np.dot(np_, nn_))


def roc_auc(
    ds: ray.data.Dataset,
    score: str,
    group: str,
    positive,
) -> pa.Table:
    """Exact AUC of ``score`` ranking rows with ``group == positive``
    above the rest.  Ties get the standard ½ credit, so the result equals
    the trapezoidal ROC area / normalized Mann–Whitney U exactly.

    Returns a 1-row table ``(n_pos, n_neg, auc)``.
    """

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(score)))
        pos = pc.cast(pc.equal(batch.column(group), positive), pa.int64())
        t = pa.table({
            score: batch.column(score),
            "_np": pos,
            "_nn": pc.subtract(pa.scalar(1, pa.int64()), pos),
        })
        # map-side combine: one row per distinct score per block
        g = t.group_by(score).aggregate([("_np", "sum"), ("_nn", "sum")])
        return g.rename_columns([score, "_np", "_nn"])

    per_score = (ds.select_columns([group, score])
                 .map_batches(partial, batch_format="pyarrow")
                 .groupby(score)
                 .aggregate(Sum("_np", alias_name="_np"),
                            Sum("_nn", alias_name="_nn")))
    ordered = per_score.sort([score]).materialize()
    refs = ordered.to_arrow_refs()
    sums = ray.get([_auc_block_sums.remote(r) for r in refs])
    n_pos = sum(s[0] for s in sums)
    n_neg = sum(s[1] for s in sums)
    if n_pos == 0 or n_neg == 0:
        raise ValueError("AUC needs at least one positive and one negative")
    starts = np.concatenate(([0], np.cumsum([s[1] for s in sums])[:-1]))
    contribs = ray.get([
        _auc_block_contrib.remote(r, int(st)) for r, st in zip(refs, starts)])
    return pa.table({
        "n_pos": pa.array([n_pos], pa.int64()),
        "n_neg": pa.array([n_neg], pa.int64()),
        "auc": pa.array([sum(contribs) / (n_pos * n_neg)], pa.float64()),
    })


# ---------------------------------------------------------------------------
# calibration / reliability bins
# ---------------------------------------------------------------------------


def calibration_bins(
    ds: ray.data.Dataset,
    p: str,
    group: str,
    positive,
    n_bins: int = 10,
) -> pa.Table:
    """Reliability-diagram bins: equal-width bins over predicted
    probability ``p`` (clamped to [0, 1]; p == 1.0 lands in the top bin),
    per-bin count, mean prediction and observed positive rate.

    Returns ``(bin, n, mean_p, frac_pos)`` sorted by bin.
    """

    def partial(batch: pa.Table) -> pa.Table:
        batch = batch.filter(pc.is_valid(batch.column(p)))
        pv = batch.column(p).to_numpy(zero_copy_only=False).astype(np.float64)
        pv = np.clip(pv, 0.0, 1.0)
        bins = np.minimum((pv * n_bins).astype(np.int64), n_bins - 1)
        pos = pc.cast(pc.equal(batch.column(group), positive), pa.int64())
        t = pa.table({
            "bin": pa.array(bins, pa.int64()),
            "_n": pa.array(np.ones(len(pv), np.int64)),
            "_sp": pa.array(pv, pa.float64()),
            "_sl": pos,
        })
        g = t.group_by("bin").aggregate(
            [("_n", "sum"), ("_sp", "sum"), ("_sl", "sum")])
        return g.rename_columns(["bin", "_n", "_sp", "_sl"])

    agg = (ds.select_columns([group, p])
           .map_batches(partial, batch_format="pyarrow")
           .groupby("bin")
           .aggregate(Sum("_n", alias_name="n"),
                      Sum("_sp", alias_name="_sp"),
                      Sum("_sl", alias_name="_sl")))
    rows = agg.take_all()  # bounded by n_bins
    rows.sort(key=lambda r: r["bin"])
    return pa.table({
        "bin": pa.array([r["bin"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "mean_p": pa.array([r["_sp"] / r["n"] for r in rows], pa.float64()),
        "frac_pos": pa.array([r["_sl"] / r["n"] for r in rows],
                             pa.float64()),
    })


# ---------------------------------------------------------------------------
# mutual information / chi² / Cramér's V
# ---------------------------------------------------------------------------


def categorical_association(
    ds: ray.data.Dataset,
    x: str,
    y: str,
) -> pa.Table:
    """Association strength between two categorical columns: mutual
    information in nats, Pearson chi², and Cramér's V, all EXACT from one
    distributed contingency count.  The reduced cell table is
    |X|·|Y| rows — metadata scale for categorical keys (same assumption
    as any GROUP BY on them); nothing row-scale reaches the driver.

    Returns a 1-row table ``(n, mi_nats, chi2, cramers_v)``.
    """
    cells = (ds.select_columns([x, y])
             .groupby([x, y])
             .aggregate(Count(alias_name="o"))
             .take_all())
    if not cells:
        raise ValueError("empty input")
    rx: dict = {}
    cy: dict = {}
    n = 0
    for c in cells:
        rx[c[x]] = rx.get(c[x], 0) + c["o"]
        cy[c[y]] = cy.get(c[y], 0) + c["o"]
        n += c["o"]
    mi = 0.0
    s = 0.0  # Σ o² / (row_total · col_total)
    for c in cells:
        o = c["o"]
        r_, c_ = rx[c[x]], cy[c[y]]
        mi += (o / n) * math.log(o * n / (r_ * c_))
        s += o * o / (r_ * c_)
    chi2 = n * (s - 1.0)
    k = min(len(rx), len(cy))
    v = math.sqrt(max(chi2, 0.0) / (n * (k - 1))) if k > 1 else 0.0
    return pa.table({
        "n": pa.array([n], pa.int64()),
        "mi_nats": pa.array([mi], pa.float64()),
        "chi2": pa.array([chi2], pa.float64()),
        "cramers_v": pa.array([v], pa.float64()),
    })


# ---------------------------------------------------------------------------
# Benford first-digit audit
# ---------------------------------------------------------------------------


def benford_first_digit(
    ds: ray.data.Dataset,
    col: str,
    decimals: int = 2,
) -> pa.Table:
    """First-significant-digit histogram of a positive money-like column
    vs Benford's law.  The digit comes from the INTEGER value
    ``round(x · 10^decimals)`` by repeated integer division — no float
    log10, so an ANSI-SQL oracle using ``substr(cast(bigint as varchar))``
    is bit-identical.

    Returns 9 rows ``(digit, n, observed_p, expected_p)``.
    """
    scale = 10 ** decimals

    def partial(batch: pa.Table) -> pa.Table:
        v = batch.column(col).to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[np.isfinite(v) & (v > 0)]
        d = np.rint(v * scale).astype(np.int64)
        d = d[d > 0]
        while (d >= 10).any():
            big = d >= 10
            d[big] //= 10
        t = pa.table({"digit": pa.array(d, pa.int64()),
                      "_n": pa.array(np.ones(len(d), np.int64))})
        g = t.group_by("digit").aggregate([("_n", "sum")])
        return g.rename_columns(["digit", "_n"])

    rows = (ds.select_columns([col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby("digit")
            .aggregate(Sum("_n", alias_name="n"))
            .take_all())  # ≤ 9 rows
    counts = {r["digit"]: r["n"] for r in rows}
    total = sum(counts.values())
    digits = list(range(1, 10))
    return pa.table({
        "digit": pa.array(digits, pa.int64()),
        "n": pa.array([counts.get(d, 0) for d in digits], pa.int64()),
        "observed_p": pa.array(
            [counts.get(d, 0) / total for d in digits], pa.float64()),
        "expected_p": pa.array(
            [math.log10(1 + 1 / d) for d in digits], pa.float64()),
    })


# ---------------------------------------------------------------------------
# per-dimension mutual information vs a label (feature selection)
# ---------------------------------------------------------------------------

def dim_label_mi(
    ds: "ray.data.Dataset",
    emb_col: str,
    label_col: str,
) -> pa.Table:
    """Mutual information I(sign(x_d); label) per embedding dimension — the
    filter-method feature-selection primitive: which coordinates carry
    label signal at all.  The feature is the dimension's SIGN BIT
    (x_d >= 0), so every statistic is an integer count and the only float
    work is the final (dims × 2 × labels)-bounded plug-in estimate
    I = Σ p(s,l)·ln(p(s,l)/(p(s)·p(l))), accumulated in sorted (s, label)
    order so the tiny float sum is deterministic.

    Scale shape: one ``map_batches`` pass emits per-batch integer count
    partials — at most dims × labels rows per batch however big the block
    (vectorized: one boolean matrix, per-label column sums) — then ONE
    keyed combine on (dim, label).  No other exchange; nothing
    corpus-sized ever leaves the workers.

    Returns pa.Table(dim, mi) over dims 0..d−1, mi in nats, UNROUNDED.
    """
    import numpy as np

    from ray.data.aggregate import Sum as _Sum

    from .similarity import embedding_matrix

    def partial(batch: pa.Table) -> pa.Table:
        x = embedding_matrix(batch.column(emb_col))
        lab = batch.column(label_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        pos = (x >= 0.0)
        dims = x.shape[1]
        ulab = np.unique(lab)
        out_d, out_l, out_p, out_n = [], [], [], []
        for l in ulab:
            m = lab == l
            p = pos[m].sum(axis=0).astype(np.int64)
            out_d.append(np.arange(dims, dtype=np.int64))
            out_l.append(np.full(dims, l, np.int64))
            out_p.append(p)
            out_n.append(np.full(dims, int(m.sum()), np.int64))
        return pa.table({
            "dim": pa.array(np.concatenate(out_d), pa.int64()),
            "label": pa.array(np.concatenate(out_l), pa.int64()),
            "_pos": pa.array(np.concatenate(out_p), pa.int64()),
            "_tot": pa.array(np.concatenate(out_n), pa.int64()),
        })

    rows = (ds.select_columns([emb_col, label_col])
            .map_batches(partial, batch_format="pyarrow")
            .groupby(["dim", "label"])
            .aggregate(_Sum("_pos", alias_name="pos"),
                       _Sum("_tot", alias_name="tot"))).take_all()
    # bounded table: dims × labels rows
    dims = sorted({r["dim"] for r in rows})
    labels = sorted({r["label"] for r in rows})
    pos = {(r["dim"], r["label"]): r["pos"] for r in rows}
    tot = {l: 0 for l in labels}
    for r in rows:
        if r["dim"] == dims[0]:
            tot[r["label"]] = r["tot"]
    N = float(sum(tot.values()))
    import math

    mis = []
    for d in dims:
        # marginals for this dim's sign bit
        n_pos = sum(pos[(d, l)] for l in labels)
        p_s = {1: n_pos / N, 0: (N - n_pos) / N}
        mi = 0.0
        for s in (0, 1):  # sorted (s, label) order — deterministic sum
            for l in labels:
                n_sl = pos[(d, l)] if s == 1 else tot[l] - pos[(d, l)]
                if n_sl == 0:
                    continue
                p_sl = n_sl / N
                p_l = tot[l] / N
                mi += p_sl * math.log(p_sl / (p_s[s] * p_l))
        mis.append(mi)
    return pa.table({
        "dim": pa.array(dims, pa.int64()),
        "mi": pa.array(mis, pa.float64()),
    })
