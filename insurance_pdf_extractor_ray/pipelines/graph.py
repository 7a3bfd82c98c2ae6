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
from .dedup import _join_partitions, join_partitions_for


def pagerank(
    edges: ray.data.Dataset,
    src: str = "src",
    dst: str = "dst",
    n_iter: int = 3,
    damping: float = 0.85,
    num_partitions: Optional[int] = None,
    restart: Optional[list] = None,
) -> ray.data.Dataset:
    """PageRank over a directed edge list — Dataset(id, rank) after exactly
    ``n_iter`` synchronous iterations from the uniform start (fixed
    iteration count keeps the result deterministic and oracle-checkable;
    convergence loops can wrap this).

    ``restart`` switches to PERSONALIZED PageRank: the restart
    distribution concentrates uniformly on the given seed ids instead of
    all nodes (and the walk starts from it) — "similar to THESE docs"
    relevance over a similarity graph.  Seed list is driver-small by
    contract (it parameterizes the query); same exchange shape per round.

    Assumes every node has out-degree >= 1 (true for symmetric/undirected
    edge lists — pass both directions; dangling-node mass redistribution is
    out of scope).  Per round: one keyed join (ranks onto edges by ``src``),
    a vectorized contribution map, one keyed combine (sum by ``dst``) —
    identical exchange shape every round, so a cluster keeps the same
    partitioning throughout.
    """
    edges = edges.select_columns([src, dst]).materialize()
    # size-aware join partitioning: each hash-join aggregator actor costs a
    # scheduling slot + ~1s spawn, so a thousand-edge audit graph wants 2-4
    # partitions, not CPU-count — at corpus scale the row quotient exceeds
    # the CPU cap and behavior is unchanged (same tradeoff measured for
    # triangle_stats / entity_components).
    P = num_partitions or join_partitions_for(edges.count())
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
    seeds = pa.array(sorted(set(restart)), id_type) if restart else None
    base = (1.0 - damping) / n_nodes

    # (src, dst, out-degree of src) — joined ONCE, reused every round
    ed = edges.join(degrees, join_type="inner", num_partitions=P,
                    on=(src,), right_on=("id",)).materialize()
    # the join itself can emit empty zero-column partition blocks that the
    # per-round ed ⋈ ranks join would reject; edges is non-empty here, so
    # the inner join against its own degree table is too — no schema needed
    ed = drop_empty_blocks(ed)

    def init_ranks(t: pa.Table) -> pa.Table:
        if seeds is not None:
            s = pc.cast(pc.is_in(t.column("id"), value_set=seeds),
                        pa.float64())
            return pa.table({"id": t.column("id"),
                             "rank": pc.divide(s, float(len(seeds)))})
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

        def finish_round(t: pa.Table) -> pa.Table:
            if seeds is not None:
                s = pc.cast(pc.is_in(t.column("id"), value_set=seeds),
                            pa.float64())
                b = pc.multiply(pc.divide(s, float(len(seeds))),
                                1.0 - damping)
            else:
                b = base
            return pa.table({
                "id": t.column("id"),
                "rank": pc.add(b, pc.multiply(damping, t.column("_s")))})

        ranks = drop_empty_blocks(
            msgs.map_batches(contrib, batch_format="pyarrow")
            .groupby("id").aggregate(Sum("_c", alias_name="_s"))
            .map_batches(finish_round, batch_format="pyarrow"),
            empty_schema=rank_schema)

    return ranks


# ---------------------------------------------------------------------------
# similarity-threshold graph + triangle counting / clustering coefficient
# ---------------------------------------------------------------------------

Q_SCALE = 1 << 20  # per-value fixed-point scale for the exact similarity


def ip_threshold_graph(
    ds: ray.data.Dataset,
    emb_col: str,
    id_col: str,
    tau: float,
    max_vertices: int = 4096,
) -> ray.data.Dataset:
    """Exact inner-product threshold graph over an embedding column:
    edge (u < v) iff ``sim_q(u, v) >= round(tau · 2^40)`` where
    ``sim_q = Σ_i q(x_i)·q(y_i)`` and ``q(x) = half-round(x · 2^20)``.

    Quantizing each VALUE (not each product) makes the similarity an
    integer DOT PRODUCT — the per-batch kernel is one exact int64 matmul
    against the broadcast candidate matrix (no B×M×d tensor), and the SQL
    oracle re-derives every edge exactly (no float threshold flicker).
    |q| ≤ ~2^20, so a 64-dim dot is ≤ 2^46 — int64-safe up to ~2^23 dims.

    Scale contract: the EXACT all-pairs graph is for id-capped / bounded
    vertex sets (``max_vertices`` guard) — neighborhood-structure audits,
    golden sets, eval pools.  For open-corpus near-neighbor graphs compose
    the LSH/IVF candidate generators (``dedup.embedding_neardup``,
    ``similarity.knn_ivf``) with this threshold as the verify step.
    Shape: candidate matrix collected once, ``ray.put`` once, one
    zero-shuffle ``map_batches`` pass emitting only above-threshold pairs.
    """
    import numpy as np

    from .similarity import embedding_matrix

    tau_q = int(round(tau * Q_SCALE * Q_SCALE))
    small = ds.select_columns([id_col, emb_col]).take_all()
    if len(small) > max_vertices:
        raise ValueError(
            f"exact all-pairs graph capped at {max_vertices} vertices "
            f"(got {len(small)}); pre-filter ids or use the LSH/IVF "
            "candidate path")
    small.sort(key=lambda r: r[id_col])
    ids = np.array([r[id_col] for r in small], np.int64)
    mat = np.array([r[emb_col] for r in small], np.float64)
    qmat = (-np.floor(-(mat * Q_SCALE) + 0.5)).astype(np.int64)
    ref = ray.put((ids, qmat))

    def edges(batch: pa.Table, broadcast) -> pa.Table:
        import numpy as _np
        bids, bq = ray.get(broadcast)
        x = embedding_matrix(batch.column(emb_col))
        qx = (-_np.floor(-(x * Q_SCALE) + 0.5)).astype(_np.int64)
        rid = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        sim = qx @ bq.T  # exact int64
        hit = (sim >= tau_q) & (rid[:, None] < bids[None, :])
        ri, ci = _np.nonzero(hit)
        return pa.table({
            "u": pa.array(rid[ri], pa.int64()),
            "v": pa.array(bids[ci], pa.int64()),
            "sim_q": pa.array(sim[ri, ci], pa.int64()),
        })

    import functools

    return ds.select_columns([id_col, emb_col]).map_batches(
        functools.partial(edges, broadcast=ref), batch_format="pyarrow")


def triangle_stats(
    edges: ray.data.Dataset,
    u: str = "u",
    v: str = "v",
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """Per-node triangle count, degree, and local clustering coefficient
    over an undirected edge list given in canonical ``u < v`` orientation.

    The classic two-join enumeration with every triangle found exactly once
    under the total order: wedges (a,b)-(a,c) with b < c from E ⋈ E on the
    low endpoint, closed by an inner join of the (b,c) pair against E.
    Both are keyed Dataset joins — edge lists and wedge lists stream
    through the object store; nothing graph-sized touches the driver.
    cc(x) = 2·T(x) / (deg(x)·(deg(x)−1)), null when deg < 2.

    Skew note: wedge count is Σ_a deg(a)² on low endpoints — the canonical
    orientation already bounds the worst hub blowup (a node contributes
    wedges only through neighbors ABOVE it in id order); for adversarial
    hubs, re-orient by (degree, id) before calling.

    ``num_partitions`` defaults to a size-aware pick: hash-join partitions
    cost a fixed per-partition actor round, so a thousand-edge audit graph
    wants 4 partitions, not 32 (measured 15 s → ~4 s at bench sf0.1).
    """
    import numpy as np

    if num_partitions is None:
        edges = edges.materialize()  # edge-bounded; count becomes metadata
        n_edges = edges.count()
        num_partitions = max(2, min(_join_partitions(),
                                    int(n_edges // 50_000) + 2))
    nparts = num_partitions
    e = edges.select_columns([u, v])

    # wedges: self-join on the low endpoint
    left = e.rename_columns({u: "_a", v: "_b"})
    right = e.rename_columns({u: "_a", v: "_c"})
    wedges = left.join(right, join_type="inner", on=("_a",),
                       num_partitions=nparts)
    # hash-join partitions with no rows come back as zero-column blocks,
    # which the NEXT per-partition pyarrow join rejects — rebuild from the
    # non-empty blocks (wedge list already lives in the object store)
    wedges = drop_empty_blocks(
        wedges.filter(expr="_b < _c"),
        empty_schema=pa.schema([("_a", pa.int64()), ("_b", pa.int64()),
                                ("_c", pa.int64())]))
    # close: (b, c) must be an edge
    closing = e.rename_columns({u: "_b", v: "_c"})
    tris = wedges.join(closing, join_type="inner", on=("_b", "_c"),
                      num_partitions=nparts)

    # ONE fused aggregation instead of two groupbys + a join: tag the
    # degree stream (_d=1,_t=0) and the triangle-explode stream
    # (_d=0,_t=1), union them lazily, and let a single node-keyed combine
    # produce (degree, triangles) together.  Every Ray execution pays a
    # fixed executor/shuffle-actor spin-up, so collapsing four executions
    # into one cuts the small-graph wall time ~3×.
    def explode_nodes(batch: pa.Table) -> pa.Table:
        cols = [batch.column("_a"), batch.column("_b"), batch.column("_c")]
        node = pa.concat_arrays([c.combine_chunks() for c in cols])
        z = np.zeros(len(node), np.int64)
        return pa.table({"node": node, "_d": pa.array(z),
                         "_t": pa.array(np.ones(len(node), np.int64))})

    def explode_deg(batch: pa.Table) -> pa.Table:
        node = pa.concat_arrays([batch.column(u).combine_chunks(),
                                 batch.column(v).combine_chunks()])
        z = np.zeros(len(node), np.int64)
        return pa.table({"node": node,
                         "_d": pa.array(np.ones(len(node), np.int64)),
                         "_t": pa.array(z)})

    tri_stream = tris.map_batches(explode_nodes, batch_format="pyarrow")
    deg_stream = e.map_batches(explode_deg, batch_format="pyarrow")
    merged = (deg_stream.union(tri_stream)
              .groupby("node").aggregate(Sum("_d", alias_name="degree"),
                                         Sum("_t", alias_name="triangles")))

    def finish(batch: pa.Table) -> pa.Table:
        deg = batch.column("degree").to_numpy(zero_copy_only=False)
        tri = pc.fill_null(batch.column("triangles"), 0).to_numpy(
            zero_copy_only=False).astype(np.int64)
        denom = deg.astype(np.float64) * (deg - 1.0)
        with np.errstate(divide="ignore", invalid="ignore"):
            cc = np.where(deg >= 2, 2.0 * tri / denom, np.nan)
        return pa.table({
            "node": batch.column("node"),
            "degree": pa.array(deg, pa.int64()),
            "triangles": pa.array(tri, pa.int64()),
            "clustering": pa.array(cc, pa.float64()),
        })

    return merged.map_batches(finish, batch_format="pyarrow")


def kcore(
    edges: ray.data.Dataset,
    k: int,
    rounds: int = 8,
    u: str = "u",
    v: str = "v",
    max_broadcast_nodes: int = 4_000_000,
) -> pa.Table:
    """k-core decomposition by synchronous peeling: ``rounds`` fixed
    iterations of (degree count → keep nodes with deg ≥ k → restrict edges
    to kept endpoints).  Fixed round count keeps the result deterministic
    and lets the SQL oracle unroll the same levels; pick ``rounds`` ≥ the
    peeling depth (tests verify an extra round is a no-op).

    The community-density screen over similarity graphs: the k-core is
    where the near-duplicate cliques and template families live, the
    periphery is one-off content.

    Per round: map-side degree pre-counts, ONE node-keyed combine (tiny),
    surviving-node set broadcast (``ray.put`` once per round, bounded by
    ``max_broadcast_nodes``), one zero-shuffle edge filter.  Edge blocks
    stream; driver holds only the node set.  Returns surviving (node,
    degree) at the final round.
    """
    import numpy as np

    from ray.data.aggregate import Sum

    e = edges.select_columns([u, v]).materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        node = pa.concat_arrays([batch.column(u).combine_chunks(),
                                 batch.column(v).combine_chunks()])
        t = pa.table({"node": node})
        g = t.group_by(["node"]).aggregate([([], "count_all")])
        return pa.table({"node": g.column("node"),
                         "_d": g.column("count_all").cast(pa.int64())})

    last = []
    for _ in range(rounds):
        rows = (e.map_batches(deg_partial, batch_format="pyarrow")
                .groupby("node").aggregate(Sum("_d", alias_name="degree"))
                ).take_all()
        keep_rows = [(r["node"], r["degree"]) for r in rows
                     if r["degree"] >= k]
        last = sorted(keep_rows)
        if len(last) == len(rows):  # fixed point: nothing peeled
            break
        if len(last) > max_broadcast_nodes:
            raise ValueError("kcore node set exceeds broadcast cap; "
                             "use a semi-join variant")
        keep = np.array([n for n, _ in last], np.int64)
        ref = ray.put(keep)

        def filt(batch: pa.Table, keep_ref) -> pa.Table:
            import numpy as _np
            ks = ray.get(keep_ref)
            uu = batch.column(u).to_numpy(zero_copy_only=False)
            vv = batch.column(v).to_numpy(zero_copy_only=False)
            m = _np.isin(uu, ks) & _np.isin(vv, ks)
            return batch.filter(pa.array(m))

        import functools

        e = e.map_batches(functools.partial(filt, keep_ref=ref),
                          batch_format="pyarrow").materialize()

    return pa.table({
        "node": pa.array([n for n, _ in last], pa.int64()),
        "degree": pa.array([d for _, d in last], pa.int64()),
    })


def bfs_hops(
    edges: ray.data.Dataset,
    seeds,
    max_hops: int = 4,
) -> pa.Table:
    """Minimum-hop distance labels from a seed set over an undirected edge
    Dataset (u, v) — bounded-frontier BFS.

    Same vertex contract as the exact similarity graph this composes with
    (:func:`ip_threshold_graph`): node state is vertex-bounded, so the
    hop map lives on the driver while the EDGES stay distributed — each
    round is ONE zero-shuffle edge scan against the broadcast frontier
    (``ray.put`` once per round), emitting only per-block distinct touched
    neighbors.  Rounds are bounded by ``max_hops``; early-exits when a
    frontier empties.  For billion-edge open graphs swap the driver map for
    a (node, hop) Dataset and a per-round min-combine join — the same
    round structure :func:`pagerank` / :func:`kcore` use.

    Returns pa.Table(node, hop) for every node within ``max_hops`` of a
    seed (seeds themselves at hop 0, isolated seeds included).
    """
    import numpy as np

    import ray as _ray

    edges = edges.select_columns(["u", "v"]).materialize()
    dist: dict = {int(s): 0 for s in seeds}
    frontier = set(dist)
    for h in range(max_hops):
        if not frontier:
            break
        fref = _ray.put(np.array(sorted(frontier), np.int64))

        def nbrs(batch: pa.Table, ref=fref) -> pa.Table:
            f = _ray.get(ref)
            u = batch.column("u").to_numpy(zero_copy_only=False)
            v = batch.column("v").to_numpy(zero_copy_only=False)
            out = np.unique(np.concatenate(
                [v[np.isin(u, f)], u[np.isin(v, f)]]))
            return pa.table({"node": pa.array(out, pa.int64())})

        reached = edges.map_batches(nbrs, batch_format="pyarrow").take_all()
        new = {int(r["node"]) for r in reached} - dist.keys()
        for n in new:
            dist[n] = h + 1
        frontier = new
    nodes = sorted(dist)
    return pa.table({
        "node": pa.array(nodes, pa.int64()),
        "hop": pa.array([dist[n] for n in nodes], pa.int64()),
    })


#: edge count above which HITS/score maps stop broadcasting and the keyed
#: join/combine rounds run instead (nodes ≤ edges, so this bounds the
#: broadcast id/score arrays at ~80 MB)
HITS_BROADCAST_EDGES_MAX = 5_000_000


def _collect_parts(ds: ray.data.Dataset) -> Optional[pa.Table]:
    """Concat a partial-table Dataset's non-empty Arrow blocks on the driver
    (bounded by contract: nodes × blocks partial rows)."""
    import ray as _ray

    tbls = [t for t in _ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tbls:
        return None
    return pa.concat_tables(tbls, promote_options="default")


def _hits_broadcast_rounds(edges: ray.data.Dataset, hub_col: str,
                           auth_col: str, n_iter: int) -> ray.data.Dataset:
    """HITS rounds with broadcast score maps — bit-identical to the join
    path (integer degree sums are order-independent), zero shuffles."""
    import numpy as np
    import ray as _ray

    def merge(parts: pa.Table):
        g = parts.group_by("id").aggregate([("s", "sum")])
        ids = g.column("id").to_numpy(zero_copy_only=False)
        sc = g.column("s_sum").to_numpy(zero_copy_only=False)
        order = np.argsort(ids)
        return ids[order].astype(np.int64), sc[order].astype(np.int64)

    def count_partial(col):
        def f(t: pa.Table) -> pa.Table:
            g = t.group_by(col).aggregate([([], "count_all")])
            return pa.table({"id": g.column(col).cast(pa.int64()),
                             "s": g.column("count_all").cast(pa.int64())})
        return f

    def sum_partial(probe_col, out_col, ref):
        def f(t: pa.Table) -> pa.Table:
            ids, sc = _ray.get(ref)
            p = t.column(probe_col).cast(pa.int64()) \
                 .to_numpy(zero_copy_only=False)
            v = sc[np.searchsorted(ids, p)]  # every edge endpoint has a score
            tt = pa.table({"id": t.column(out_col).cast(pa.int64()),
                           "s": pa.array(v, pa.int64())})
            g = tt.group_by("id").aggregate([("s", "sum")])
            return pa.table({"id": g.column("id"),
                             "s": g.column("s_sum").cast(pa.int64())})
        return f

    # round 1 authority update: auth = in-degree (hub scores are all 1)
    auth = merge(_collect_parts(edges.map_batches(
        count_partial(auth_col), batch_format="pyarrow")))
    hubs = None
    for _ in range(n_iter - 1):
        ref_a = _ray.put(auth)
        hubs = merge(_collect_parts(edges.map_batches(
            sum_partial(auth_col, hub_col, ref_a), batch_format="pyarrow")))
        ref_h = _ray.put(hubs)
        auth = merge(_collect_parts(edges.map_batches(
            sum_partial(hub_col, auth_col, ref_h), batch_format="pyarrow")))
    if hubs is None:  # n_iter == 1: hubs stay at the uniform start
        ids, _ = merge(_collect_parts(edges.map_batches(
            count_partial(hub_col), batch_format="pyarrow")))
        hubs = (ids, np.ones(len(ids), np.int64))

    def side_tbl(pair, side):
        ids, sc = pair
        return pa.table({"id": pa.array(ids, pa.int64()),
                         "score": pa.array(sc, pa.int64()),
                         "side": pa.array([side] * len(ids), pa.string())})

    return ray.data.from_arrow(pa.concat_tables(
        [side_tbl(auth, "auth"), side_tbl(hubs, "hub")]))


def hits_bipartite(
    edges: ray.data.Dataset,
    hub_col: str,
    auth_col: str,
    n_iter: int = 2,
    num_partitions: Optional[int] = None,
) -> ray.data.Dataset:
    """HITS hubs-and-authorities over a bipartite edge list, UNNORMALIZED
    and integer-exact: hub⁰ ≡ 1, authⁱ(p) = Σ_{h→p} hubⁱ⁻¹(h),
    hubⁱ(h) = Σ_{h→p} authⁱ(p), for exactly ``n_iter`` authority updates.
    Skipping the per-round normalization keeps every score an exact int64
    (degree sums — commutative/associative, partition- and retry-
    independent), which is what lets an SQL oracle unroll the identical
    rounds with no float-reduction drift; relative rankings are unchanged
    (normalization is a positive global scalar per round).

    Same per-round exchange shape as :func:`pagerank`: ONE keyed join
    (scores onto the materialized edge list) + ONE keyed combine on the
    other side, alternating sides each half-round — a cluster keeps the
    same two hash partitionings throughout.  Scores overflow int64 only
    past ~degree^(2·n_iter) ≈ 10^18 mass; cap ``n_iter`` or normalize
    offline for adversarial graphs.

    Returns Dataset(id, score, side) with side ∈ {'hub', 'auth'} at the
    final round (authorities from round ``n_iter``, hubs from round
    ``n_iter − 1``'s update — the standard alternating schedule).
    """
    from ray.data.aggregate import Sum as _Sum

    edges = edges.select_columns([hub_col, auth_col]).materialize()
    P = num_partitions or join_partitions_for(edges.count())
    hub_t = edges.schema().base_schema.field(hub_col).type
    auth_t = edges.schema().base_schema.field(auth_col).type
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table({
            "id": pa.array([], pa.int64()),
            "score": pa.array([], pa.int64()),
            "side": pa.array([], pa.string())}))
    # upstream dedups/groupbys can leave zero-column placeholder blocks the
    # per-round Dataset.join would reject — scrub once (metadata-only)
    edges = drop_empty_blocks(edges)

    # Zero-shuffle fast path: score maps are NODE-cardinality (≤ edge
    # count), so under the broadcast cap each half-round is one map pass
    # over the edges (broadcast scores probed with a sorted-id searchsorted,
    # per-batch int64 partial sums) plus a driver merge of partials — the
    # ``kmeans_lloyd`` shape.  Above the cap (or non-integer ids) the keyed
    # join/combine rounds below run unchanged.
    n_edges = edges.count()
    if (pa.types.is_integer(hub_t) and pa.types.is_integer(auth_t)
            and n_edges <= HITS_BROADCAST_EDGES_MAX):
        return _hits_broadcast_rounds(edges, hub_col, auth_col, n_iter)

    # round 1 authority update: auth = in-degree (hub scores are all 1)
    auth = drop_empty_blocks(
        edges.groupby(auth_col).aggregate(Count(alias_name="score"))
        .rename_columns(["id", "score"]),
        empty_schema=pa.schema([("id", auth_t), ("score", pa.int64())]))
    hubs = None
    for _ in range(n_iter - 1):
        # hub update: sum of current authority over out-neighbors
        m = edges.join(auth, join_type="inner", num_partitions=P,
                       on=(auth_col,), right_on=("id",))
        hubs = drop_empty_blocks(
            m.groupby(hub_col).aggregate(_Sum("score", alias_name="_s"))
            .rename_columns(["id", "score"]),
            empty_schema=pa.schema([("id", hub_t), ("score", pa.int64())]))
        # authority update: sum of current hub over in-neighbors
        m2 = edges.join(hubs, join_type="inner", num_partitions=P,
                        on=(hub_col,), right_on=("id",))
        auth = drop_empty_blocks(
            m2.groupby(auth_col).aggregate(_Sum("score", alias_name="_s"))
            .rename_columns(["id", "score"]),
            empty_schema=pa.schema([("id", auth_t), ("score", pa.int64())]))
    if hubs is None:  # n_iter == 1: hubs stay at the uniform start

        def uniform_hub(t: pa.Table) -> pa.Table:
            return pa.table({
                "id": t.column(hub_col),
                "score": pa.array([1] * t.num_rows, pa.int64())})

        hubs = drop_empty_blocks(
            edges.groupby(hub_col).aggregate(Count(alias_name="_one"))
            .map_batches(uniform_hub, batch_format="pyarrow"),
            empty_schema=pa.schema([("id", hub_t), ("score", pa.int64())]))

    def tag(side: str):
        def f(t: pa.Table) -> pa.Table:
            return pa.table({
                "id": t.column("id").cast(pa.int64()),
                "score": t.column("score").cast(pa.int64()),
                "side": pa.array([side] * t.num_rows, pa.string())})
        return f

    return (auth.map_batches(tag("auth"), batch_format="pyarrow")
            .union(hubs.map_batches(tag("hub"), batch_format="pyarrow")))
