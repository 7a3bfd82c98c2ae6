"""Deterministic sampling — reproducible corpus subsetting at any scale.

Training-data pipelines subset constantly (ablations, eval splits, per-source
mixing rates).  ``random_sample`` is non-reproducible across retries and
partitionings, so every operator here derives the keep/assign decision from a
pure arithmetic hash of the row's id:

    h(id) = (id * 2654435761 + seed) mod 2^32        (Knuth multiplicative)

Properties that matter at 10^12 rows:
  * zero shuffle, zero state — a pure ``map_batches`` predicate that
    streams, resumes, and parallelizes trivially;
  * partition-independent — the same row is kept no matter how blocks are
    split, so a resumed or re-partitioned run samples identically;
  * SQL-expressible — the oracle re-derives the exact predicate, making
    sampled pipelines hash-checkable end to end (uint64 wraparound preserves
    the mod-2^32 result because 2^32 divides 2^64).

``mod`` math, not float thresholds: ``rate_pct`` is in basis points of 2^32
(exact integer compare), so engine and SQL can never disagree on a boundary.
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

KNUTH = np.uint64(2654435761)
MOD32 = np.uint64(1) << np.uint64(32)


def _hash32(ids: np.ndarray, seed: int) -> np.ndarray:
    """(id * KNUTH + seed) mod 2^32 — exact for any int64 id (the uint64
    wrap is mod 2^64, and 2^32 | 2^64)."""
    return (ids.astype(np.uint64) * KNUTH + np.uint64(seed)) % MOD32


def hash_sample(
    ds: ray.data.Dataset,
    id_col: str,
    rate: float,
    seed: int = 0,
) -> ray.data.Dataset:
    """Keep rows with h(id) < rate·2^32 — a deterministic ``rate`` sample."""
    threshold = np.uint64(int(rate * float(MOD32)))

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(_hash32(ids, seed) < threshold))

    return ds.map_batches(keep, batch_format="pyarrow")


def stratified_hash_sample(
    ds: ray.data.Dataset,
    key_col: str,
    id_col: str,
    rates: Dict,
    default_rate: float = 0.0,
    seed: int = 0,
) -> ray.data.Dataset:
    """Per-stratum deterministic sampling: each ``key_col`` value keeps its
    own rate (source-mixing ratios).  The rate map broadcasts once."""
    thresholds = {k: np.uint64(int(r * float(MOD32))) for k, r in rates.items()}
    default_thr = np.uint64(int(default_rate * float(MOD32)))
    ref = ray.put(thresholds)

    def keep(batch: pa.Table) -> pa.Table:
        thr_map = ray.get(ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = _hash32(ids, seed)
        keys = batch.column(key_col).to_pylist()
        thr = np.fromiter((thr_map.get(k, default_thr) for k in keys),
                          dtype=np.uint64, count=batch.num_rows)
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(keep, batch_format="pyarrow")


def assign_split(
    ds: ray.data.Dataset,
    id_col: str,
    test_rate: float,
    val_rate: float = 0.0,
    seed: int = 0,
    out_col: str = "split",
) -> ray.data.Dataset:
    """Attach a deterministic train/val/test label: h(id) partitions 2^32
    into [test | val | train] contiguous ranges."""
    t_thr = np.uint64(int(test_rate * float(MOD32)))
    v_thr = np.uint64(int((test_rate + val_rate) * float(MOD32)))

    def label(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = _hash32(ids, seed)
        lab = np.where(h < t_thr, "test", np.where(h < v_thr, "val", "train"))
        return batch.append_column(out_col, pa.array(lab, pa.string()))

    return ds.map_batches(label, batch_format="pyarrow")


def stratified_fixed_k(
    ds: ray.data.Dataset,
    key_col: str,
    id_col: str,
    k: int,
    seed: int = 0,
) -> ray.data.Dataset:
    """EXACTLY ``k`` rows per stratum (fewer if the stratum is smaller) —
    the fixed-budget counterpart of ``stratified_hash_sample``'s fixed-rate.

    Deterministic reservoir: rank rows within each key by the Knuth hash of
    their id (ties broken by id) and keep rank <= k — equivalent SQL is
    ``row_number() OVER (PARTITION BY key ORDER BY h(id), id) <= k``.
    Scale shape is ``rankagg.grouped_top_k``'s: map-side partial top-k per
    key inside each batch, so the one keyed shuffle carries at most
    ``k × blocks`` rows per key — never the stratum's full population.
    Partition-independent like the rest of the family: re-running on a
    different block layout selects the same rows.
    """
    from .rankagg import grouped_top_k

    def add_h(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        return batch.append_column(
            "_h", pa.array(_hash32(ids, seed), pa.uint64()))

    hashed = ds.map_batches(add_h, batch_format="pyarrow")
    top = grouped_top_k(hashed, key_col, ["_h", id_col], [False, False], k)
    return top.drop_columns(["_h"])


def fixed_k_sql_rank(key_col: str, id_col: str, seed: int = 0) -> str:
    """The DuckDB window ORDER that reproduces ``stratified_fixed_k``'s
    ranking (pair with ``QUALIFY row_number() OVER (...) <= k``)."""
    return (f"PARTITION BY {key_col} ORDER BY "
            f"((CAST({id_col} AS HUGEINT) * 2654435761 + {seed}) % 4294967296),"
            f" {id_col}")


def sample_sql_predicate(id_col: str, rate: float, seed: int = 0) -> str:
    """The DuckDB-exact predicate for ``hash_sample`` — HUGEINT arithmetic,
    no wraparound, identical integer compare."""
    threshold = int(rate * float(MOD32))
    return (f"((CAST({id_col} AS HUGEINT) * 2654435761 + {seed}) % 4294967296)"
            f" < {threshold}")


def weighted_sample_k(
    ds: ray.data.Dataset,
    id_col: str,
    weight_col: str,
    k: int,
    seed: int = 0,
) -> ray.data.Dataset:
    """Deterministic weighted sample WITHOUT replacement of exactly ``k``
    rows — inclusion probability proportional to ``weight_col``.

    Efraimidis–Spirakis A-Res reservoir made partition-independent: each
    row's reservoir key is ln(u)/w with u = (h(id)+1)/2^32 from the same
    Knuth hash as the rest of the family (u^(1/w) ranking, log-transformed
    so no pow), and the sample is the global top-k by key.  Pure function of
    (id, weight, seed) ⇒ identical across partitionings, retries and
    cluster sizes, and the SQL oracle re-derives the exact ranking
    (:func:`weighted_sql_rank`).  Scale shape: map-side per-block top-k
    keeps ≤ k rows per block before the single k×blocks-row merge — the
    corpus itself is never sorted or shuffled.  Weights must be > 0
    (w == 0 ⇒ key −inf, never sampled — same in SQL).
    """
    from .rankagg import grouped_top_k

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        w = batch.column(weight_col).to_numpy(zero_copy_only=False).astype(
            np.float64)
        u = (_hash32(ids, seed).astype(np.float64) + 1.0) / float(MOD32)
        with np.errstate(divide="ignore"):
            key = np.log(u) / w
        batch = batch.append_column("_wkey", pa.array(key, pa.float64()))
        return batch.append_column("_g", pa.array(
            np.zeros(batch.num_rows, dtype=np.int8), pa.int8()))

    keyed = ds.map_batches(add_key, batch_format="pyarrow")
    top = grouped_top_k(keyed, "_g", ["_wkey", id_col], [True, False], k)
    return top.drop_columns(["_wkey", "_g"])


def weighted_sql_rank(id_col: str, weight_col: str, seed: int = 0) -> str:
    """The DuckDB window ORDER reproducing ``weighted_sample_k``'s ranking
    (pair with ``QUALIFY row_number() OVER (ORDER BY ...) <= k``)."""
    return (f"ln((((CAST({id_col} AS HUGEINT) * 2654435761 + {seed})"
            f" % 4294967296) + 1) / 4294967296.0) / {weight_col} DESC,"
            f" {id_col}")


def global_shuffle(
    ds: ray.data.Dataset,
    id_col: str,
    seed: int = 0,
    key_col: str = "__shuf",
    keep_key: bool = False,
) -> ray.data.Dataset:
    """Deterministic global shuffle: total order by (hash32(id), id).

    ``random_shuffle()`` is nondeterministic across runs/partitionings;
    training-data pipelines need a shuffle that is REPRODUCIBLE (same seed
    -> same epoch order on any cluster shape) and restartable.  The hash
    key is computed map-side; the placement is ONE distributed sort — the
    same all-to-all a random shuffle costs anyway.  Different seeds give
    independent epoch orders.
    """

    def add_key(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = _mix32(ids, seed).astype(np.int64)
        return batch.append_column(key_col, pa.array(h, pa.int64()))

    out = ds.map_batches(add_key, batch_format="pyarrow") \
            .sort([key_col, id_col])
    if keep_key:
        return out
    names = list(ds.schema().names)
    return out.map_batches(lambda t: t.select(names), batch_format="pyarrow")


_MIX_K2 = np.uint64(0x9E3779B97F4A7C15)


def _mix32(ids: np.ndarray, seed: int) -> np.ndarray:
    """Seed-SENSITIVE 32-bit key: multiply, xor-fold the high half, multiply
    again.  ``_hash32``'s additive seed only shifts every key by a constant
    (same ordering), which is fine for sampling thresholds but useless for
    reshuffling — the xor between the two multiplies makes distinct seeds
    produce independent permutations, and every step (mod-2^64 multiply,
    ``>> 32`` as integer division, xor) has an exact HUGEINT SQL twin."""
    h = ids.astype(np.uint64) * KNUTH + np.uint64(seed)  # wraps mod 2^64
    h = h ^ (h >> np.uint64(32))
    h = h * _MIX_K2  # wraps mod 2^64
    return h % MOD32


def shuffle_sql_order(id_col: str, seed: int = 0) -> str:
    """ORDER BY clause replicating ``global_shuffle``'s total order —
    HUGEINT arithmetic with explicit mod-2^64 wraps mirroring uint64."""
    m64 = 1 << 64
    t1 = f"((CAST({id_col} AS HUGEINT) * 2654435761 + {seed}) % {m64})"
    t2 = f"xor({t1}, {t1} // 4294967296)"
    t3 = f"(({t2}) * {int(_MIX_K2)}) % {m64}"
    return f"(({t3}) % 4294967296), {id_col}"
