"""Iterative graph algorithms over Dataset edge lists.

Companions to ``dedup.dup_components_distributed`` (min-label propagation):
the same all-Dataset round structure — a materialized edge list re-joined
against a shrinking per-node state each round — applied to numeric
fixed-point iterations.  Nothing is driver-resident beyond scheduling;
both the edge list and the rank vector live in the object store and every
round is two keyed exchanges (join on src, combine on dst).
"""

from __future__ import annotations

from typing import Optional

import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from ..dsutil import drop_empty_blocks
from .dedup import _join_partitions


def pagerank(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """PageRank over a directed edge list — Dataset(id, rank) after exactly
    ``n_iter`` synchronous iterations from the uniform start (fixed
    iteration count keeps the result deterministic and oracle-checkable;
    convergence loops can wrap this).

    Assumes every node has out-degree >= 1 (true for symmetric/undirected
    edge lists — pass both directions; dangling-node mass redistribution is
    out of scope).  Per round: one keyed join (ranks onto edges by ``src``),
    a vectorized contribution map, one keyed combine (sum by ``dst``) —
    identical exchange shape every round, so a cluster keeps the same
    partitioning throughout.
    """
    P = num_partitions or _join_partitions()
    edges = edges.select_columns([src, dst]).materialize()
    id_type = edges.schema().base_schema.field(src).type
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table(
            {"id": pa.array([], id_type),
             "rank": pa.array([], pa.float64())}))

    deg_schema = pa.schema([("id", id_type), ("_deg", pa.int64())])
    degrees = drop_empty_blocks(
        edges.groupby(src).aggregate(Count(alias_name="_deg"))
        .rename_columns(["id", "_deg"]),
        empty_schema=deg_schema)
    n_nodes = degrees.count()
    if n_nodes == 0:
        return ray.data.from_arrow(pa.table(
            {"id": pa.array([], id_type),
             "rank": pa.array([], pa.float64())}))
    base = (1.0 - damping) / n_nodes

    # (src, dst, out-degree of src) — joined ONCE, reused every round
    ed = edges.join(degrees, join_type="inner", num_partitions=P,
                    on=(src,), right_on=("id",)).materialize()

    def init_ranks(t: pa.Table) -> pa.Table:
        return pa.table({"id": t.column("id"),
                         "rank": pa.array([1.0 / n_nodes] * t.num_rows,
                                          pa.float64())})

    rank_schema = pa.schema([("id", id_type), ("rank", pa.float64())])
    ranks = degrees.map_batches(init_ranks, batch_format="pyarrow")

    for _ in range(n_iter):
        msgs = ed.join(ranks, join_type="inner", num_partitions=P,
                       on=(src,), right_on=("id",))

        def contrib(t: pa.Table) -> pa.Table:
            c = pc.divide(t.column("rank"),
                          t.column("_deg").cast(pa.float64()))
            return pa.table({"id": t.column(dst), "_c": c})

        ranks = drop_empty_blocks(
            msgs.map_batches(contrib, batch_format="pyarrow")
            .groupby("id").aggregate(Sum("_c", alias_name="_s"))
            .map_batches(
                lambda t: pa.table({
                    "id": t.column("id"),
                    "rank": pc.add(base, pc.multiply(
                        damping, t.column("_s")))}),
                batch_format="pyarrow"),
            empty_schema=rank_schema)

    return ranks
