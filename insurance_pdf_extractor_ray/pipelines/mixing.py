"""Dataset mixing — deterministic weighted interleave with repetition.

LLM training corpora are MIXTURES: each source gets a weight (wiki ×2.5,
crawl ×0.3, ...), sources with weight > 1 repeat for multiple epochs, and
fractional weights subsample.  The standard implementation shuffles the
concatenation; at 10^12 documents a global shuffle is the single most
expensive operation in the pipeline.  This operator produces the same
mixture with ZERO shuffle:

* Every (row, epoch) keep/drop decision is the pure hash predicate from
  ``sampling._hash32`` with a per-epoch seed — partition-independent,
  resumable, and SQL-re-derivable (the oracle is a UNION ALL of per-epoch
  hash-predicate selects).
* "Shuffling" is replaced by a deterministic ``shard`` assignment
  (h(id, epoch) mod n_shards): writing the output partitioned by shard and
  reading shards in order yields a fixed, well-mixed global order without an
  all-to-all exchange.  (Readers that need finer intra-shard mixing sort the
  bounded shard by the hash — local work, never global.)
* Epochs are materialized as an ``epoch`` column, so downstream stages and
  checkpoint manifests see repeated documents as distinct rows with
  distinct (id, epoch) lineage.

The whole operator is one streaming ``map_batches`` — it scales linearly in
input size and is insensitive to source skew (a 90 %-of-corpus source costs
exactly its share of rows, never a hot reducer).
"""

from __future__ import annotations

import math
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .sampling import MOD32, _hash32

EPOCH_SEED_STRIDE = 1_000_003  # decorrelates per-epoch hash streams


def _epoch_plan(weights: Dict[str, float]) -> Tuple[int, Dict[str, Tuple[int, np.uint64]]]:
    """Per source: (full_epochs, fractional-epoch threshold).  A weight of
    2.3 means epochs 0 and 1 keep every row and epoch 2 keeps h < 0.3·2^32."""
    plan = {}
    max_epochs = 0
    for s, w in weights.items():
        if w < 0:
            raise ValueError(f"negative weight for source {s!r}")
        full = int(math.floor(w))
        frac_thr = np.uint64(int((w - full) * float(MOD32)))
        plan[s] = (full, frac_thr)
        max_epochs = max(max_epochs, full + (1 if frac_thr > 0 else 0))
    return max_epochs, plan


def mixture_interleave(
    ds: ray.data.Dataset,
    source_col: str,
    id_col: str,
    weights: Dict[str, float],
    seed: int = 0,
    n_shards: int = 64,
    shard_seed: int = 7_654_321,
) -> ray.data.Dataset:
    """Weighted mixture with repetition: row of source s appears
    ``floor(w_s)`` times plus once more with probability ``frac(w_s)``
    (deterministic per (id, epoch)).  Sources absent from ``weights`` drop.

    Output = input columns + ``epoch`` (0-based repetition index) +
    ``shard`` (deterministic mix bucket in [0, n_shards)).  Zero shuffle;
    write partitioned by ``shard`` for a resumable, well-mixed layout.
    """
    max_epochs, plan = _epoch_plan(weights)
    plan_ref = ray.put(plan)

    def expand(batch: pa.Table) -> pa.Table:
        pl = ray.get(plan_ref)
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        sources = batch.column(source_col).to_pylist()
        full = np.fromiter((pl[s][0] if s in pl else 0 for s in sources),
                           dtype=np.int64, count=batch.num_rows)
        frac_thr = np.fromiter((pl[s][1] if s in pl else np.uint64(0)
                                for s in sources),
                               dtype=np.uint64, count=batch.num_rows)
        pieces: List[pa.Table] = []
        for e in range(max_epochs):
            keep = (full > e) | (
                (full == e)
                & (_hash32(ids, seed + e * EPOCH_SEED_STRIDE) < frac_thr))
            if not keep.any():
                continue
            sub = batch.filter(pa.array(keep))
            sub_ids = ids[keep]
            shard = (_hash32(sub_ids, shard_seed + e * EPOCH_SEED_STRIDE)
                     % np.uint64(n_shards)).astype(np.int64)
            sub = sub.append_column(
                "epoch", pa.array(np.full(len(sub_ids), e), pa.int64()))
            sub = sub.append_column("shard", pa.array(shard, pa.int64()))
            pieces.append(sub)
        if not pieces:
            empty = batch.slice(0, 0)
            empty = empty.append_column("epoch", pa.array([], pa.int64()))
            return empty.append_column("shard", pa.array([], pa.int64()))
        return pa.concat_tables(pieces)

    return ds.map_batches(expand, batch_format="pyarrow")


def mixture_sql(
    table: str,
    source_col: str,
    id_col: str,
    weights: Dict[str, float],
    seed: int = 0,
    n_shards: int = 64,
    shard_seed: int = 7_654_321,
    columns: str = "*",
) -> str:
    """The DuckDB-exact UNION ALL re-derivation of ``mixture_interleave`` —
    one SELECT per (source, epoch) with the literal hash predicate (HUGEINT
    arithmetic, no wraparound)."""
    max_epochs, plan = _epoch_plan(weights)
    parts = []
    for s, (full, frac_thr) in sorted(plan.items()):
        n_epochs = full + (1 if int(frac_thr) > 0 else 0)
        for e in range(n_epochs):
            h_seed = seed + e * EPOCH_SEED_STRIDE
            s_seed = shard_seed + e * EPOCH_SEED_STRIDE
            pred = (f"{source_col} = '{s}'")
            if e >= full:  # fractional epoch
                pred += (f" AND ((CAST({id_col} AS HUGEINT) * 2654435761 + "
                         f"{h_seed}) % 4294967296) < {int(frac_thr)}")
            parts.append(
                f"SELECT {columns}, CAST({e} AS BIGINT) AS epoch, "
                f"CAST(((CAST({id_col} AS HUGEINT) * 2654435761 + {s_seed}) "
                f"% 4294967296) % {n_shards} AS BIGINT) AS shard "
                f"FROM {table} WHERE {pred}")
    return "\nUNION ALL\n".join(parts)


def unimax_plan(
    ds: ray.data.Dataset,
    source_col: str,
    tau: float = 2.0,
    budget_rows: int = None,
    max_epochs: float = 4.0,
) -> pa.Table:
    """UniMax-style temperature sampling plan (Chung et al. 2023): per
    source, the mixture weight ``w_s = min(B · n_s^(1/τ) / Z / n_s, cap)``
    — low-resource sources up-weighted toward uniformity as τ grows, capped
    at ``max_epochs`` repetitions so tiny sources never over-repeat.
    ``B`` defaults to the corpus size (resample-to-same-total).

    Output one row per source: (source, n, weight, full_epochs) with weight
    half-away-rounded to 6 decimals — feed the (source -> weight) map
    straight into :func:`mixture_interleave`, whose zero-shuffle hash-keep
    executes the plan at any scale.  The plan itself costs ONE tiny keyed
    count (source cardinality rows)."""
    from ray.data.aggregate import Count

    counts = {r[source_col]: r["count()"] for r in
              ds.select_columns([source_col]).groupby(source_col)
              .aggregate(Count()).take_all()}
    srcs = sorted(counts)
    n = np.array([counts[s] for s in srcs], np.float64)
    total = float(budget_rows) if budget_rows is not None else float(n.sum())
    z = np.power(n, 1.0 / tau).sum()
    w = np.minimum(total * np.power(n, 1.0 / tau) / z / n,
                   float(max_epochs))
    # half-away to 6 decimals (weights are non-negative)
    q = w * 1e6
    tq = np.trunc(q)
    w6 = (tq + (q - tq >= 0.5)) / 1e6
    return pa.table({
        "source": pa.array(srcs, pa.string()),
        "n": pa.array(n.astype(np.int64), pa.int64()),
        "weight": pa.array(w6, pa.float64()),
        "full_epochs": pa.array(np.floor(w6).astype(np.int64), pa.int64()),
    })
