"""Distributed k-means (Lloyd's algorithm) over an embedding column.

``similarity.train_centroids`` fits on a driver-side sample — the right
IVF-training shape.  This module is the full-data path: every iteration
streams the WHOLE dataset through one ``map_batches`` pass that emits a
constant-size partial (k x d centroid sums + k counts per batch), so the
driver reduces k·(d+1) numbers per batch regardless of corpus size.  No
shuffle at all — the only data movement is the tiny centroid broadcast
(``ray.put``) down and fixed-size partials up.

Determinism contract (bit-exact across partitioning, batch sizes, CPU
counts, and retry order):
- per-row distances use ``(X - c)**2 .sum(axis=1)`` — a per-row reduction
  whose result is independent of how rows are batched (no BLAS matmul,
  whose blocking varies with matrix shape);
- centroid-update accumulation is FIXED-POINT: coordinates are scaled by
  2^20 and rounded to int64 before summation, so partial sums are exact
  integers and their reduction is order-independent.  The quantization
  (~1e-6 per coordinate per update) is part of the operator's defined
  semantics.  int64 headroom: |x|<=2^23 coordinates overflow only past
  ~2^20 rows *per cluster per batch* times 2^20 blocks — far beyond the
  block sizes Ray produces.

Reference analog: the reference clusters nothing; this is part of the
LLM-data-pipeline family (corpus bucketing for near-dup blocking, IVF
coarse quantizers, topic sharding).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .similarity import embedding_matrix

_SCALE = np.int64(1) << np.int64(20)


def _assign(X: np.ndarray, centroids: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Per-row nearest centroid + squared distance, batch-shape-independent."""
    n = X.shape[0]
    best = np.zeros(n, dtype=np.int64)
    best_d = np.full(n, np.inf)
    for c in range(centroids.shape[0]):
        d = ((X - centroids[c]) ** 2).sum(axis=1)
        take = d < best_d
        best[take] = c
        best_d[take] = d[take]
    return best, best_d


def _partial_sums(batch: pa.Table, centroids_ref, emb_col: str) -> pa.Table:
    """One row out per batch: exact int64 fixed-point centroid sums.

    A plain task fn, not an actor pool: a fresh pool per Lloyd iteration
    costs seconds of actor startup while the broadcast state is only k x d
    floats — ``ray.get`` of the same ref is plasma-cached per worker, so
    tasks pay nothing extra."""
    centroids = np.asarray(ray.get(centroids_ref), dtype=np.float64)
    X = embedding_matrix(batch.column(emb_col), dtype=np.float64)
    k, d = centroids.shape
    assign, dist = _assign(X, centroids)
    sums = np.zeros((k, d), dtype=np.int64)
    np.add.at(sums, assign,
              np.rint(X * float(_SCALE)).astype(np.int64))
    counts = np.bincount(assign, minlength=k).astype(np.int64)
    inertia = np.zeros(k, dtype=np.int64)
    np.add.at(inertia, assign,
              np.rint(dist * float(_SCALE)).astype(np.int64))
    return pa.table({
        "sums": pa.array([sums.ravel().tolist()], pa.list_(pa.int64())),
        "counts": pa.array([counts.tolist()], pa.list_(pa.int64())),
        "inertia": pa.array([inertia.tolist()], pa.list_(pa.int64())),
    })


def init_centroids_by_hash(
    ds: ray.data.Dataset,
    emb_col: str,
    id_col: str,
    k: int,
    seed: int = 0,
    pool: int = 256,
) -> np.ndarray:
    """Deterministic, order-independent init: gather the ``pool`` rows with
    the smallest (hash(id), id) — a per-batch top-k candidate pass + tiny
    driver merge (the knn_brute_force pattern), never a head/limit (order-
    biased) — then greedy farthest-point (maxmin) selection picks k spread
    seeds from the pool, the deterministic analog of k-means++."""
    from .sampling import _hash32

    pool = max(pool, k)

    def candidates(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        h = _hash32(ids, seed)
        order = np.lexsort((ids, h))[:pool]
        idx = pa.array(order, pa.int64())
        return pa.table({
            id_col: batch.column(id_col).take(idx),
            emb_col: batch.column(emb_col).take(idx),
            "__h": pa.array(h[order].astype(np.int64), pa.int64()),
        })

    rows = ds.select_columns([id_col, emb_col]) \
             .map_batches(candidates, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: (r["__h"], r[id_col]))
    P = np.asarray([r[emb_col] for r in rows[:pool]], dtype=np.float64)
    k = min(k, len(P))
    chosen = [0]  # smallest (hash, id) anchors the sequence
    mind = ((P - P[0]) ** 2).sum(axis=1)
    for _ in range(1, k):
        nxt = int(np.argmax(mind))  # first max wins ties: deterministic
        chosen.append(nxt)
        mind = np.minimum(mind, ((P - P[nxt]) ** 2).sum(axis=1))
    return P[chosen]


def kmeans_lloyd(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 8,
    iters: int = 5,
    seed: int = 0,
    init: Optional[np.ndarray] = None,
) -> Tuple[np.ndarray, np.ndarray, float]:
    """Full-data Lloyd iterations.  Returns (centroids (k,d) float64,
    cluster_sizes (k,) int64, inertia float) — all bit-deterministic.

    Empty clusters keep their previous centroid (standard Lloyd fallback).
    The input Dataset is re-executed once per iteration; materialize it
    upstream if its lineage is expensive (Dataset diamonds re-execute).
    """
    centroids = (np.asarray(init, dtype=np.float64) if init is not None
                 else init_centroids_by_hash(ds, emb_col, id_col, k, seed))
    k = centroids.shape[0]
    sizes = np.zeros(k, dtype=np.int64)
    inertia_i = np.int64(0)
    for _ in range(max(1, iters)):
        cref = ray.put(centroids)
        parts = ds.map_batches(
            _partial_sums, batch_format="pyarrow",
            fn_args=(cref, emb_col)).take_all()
        d = centroids.shape[1]
        sums = np.zeros(k * d, dtype=np.int64)
        sizes = np.zeros(k, dtype=np.int64)
        inertia_parts = np.zeros(k, dtype=np.int64)
        for r in parts:  # exact ints: any order reduces identically
            sums += np.asarray(r["sums"], dtype=np.int64)
            sizes += np.asarray(r["counts"], dtype=np.int64)
            inertia_parts += np.asarray(r["inertia"], dtype=np.int64)
        inertia_i = np.int64(inertia_parts.sum())
        nz = sizes > 0
        new = centroids.copy()
        new[nz] = (sums.reshape(k, d)[nz] / float(_SCALE)) \
            / sizes[nz, None].astype(np.float64)
        centroids = new
    return centroids, sizes, float(inertia_i) / float(_SCALE)


def semantic_dedup_drop_ids(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    n_clusters: int = 8,
    tau: float = 0.95,
    iters: int = 3,
    seed: int = 0,
) -> ray.data.Dataset:
    """SemDeDup (Abbas et al., 2023): semantic near-dup pruning — k-means the
    embedding space, then within each cluster greedily keep one representative
    per cosine-``tau`` neighborhood.  Returns the DROPPED ids, sorted.

    Pipeline shape: :func:`kmeans_lloyd` (zero-shuffle, constant-size partials)
    → one assignment ``map_batches`` (centroid broadcast) → ONE keyed shuffle
    on the cluster id → per-cluster greedy leader scan.  Compared to the
    all-pairs baseline (``dedup.embedding_dup_ids_exact``, corpus-sized
    broadcast), work and memory are per-cluster: O(Σ m_c²) similarity flops
    and O(m_c·d) group memory, so ``n_clusters`` is the scale knob — size it
    ~corpus/64k so the largest cluster fits a worker heap (the same
    partitioning assumption every SemDeDup implementation makes; a pathological
    single-mode corpus degrades to the all-pairs cost).

    Determinism: cluster assignment is bit-exact (see module header), and the
    in-cluster scan is ordered by ``id_col``, so results are identical across
    partitioning and CPU counts.  Greedy-leader semantics: a row is dropped
    iff its cosine to some smaller-id KEPT row in its cluster is ``>= tau``
    (chains collapse to the smallest id, like the LSH path's canonical set).
    """
    mat = ds.select_columns([id_col, emb_col]).materialize()
    centroids, _, _ = kmeans_lloyd(mat, emb_col, id_col, k=n_clusters,
                                   iters=iters, seed=seed)
    cref = ray.put(centroids)

    def assign(batch: pa.Table) -> pa.Table:
        cents = ray.get(cref)
        X = embedding_matrix(batch.column(emb_col), dtype=np.float64)
        c, _ = _assign(X, cents)
        return batch.append_column("__c", pa.array(c, pa.int64()))

    def prune(group: pa.Table) -> pa.Table:
        ids = np.asarray(group.column(id_col).to_pylist())
        order = np.argsort(ids, kind="stable")
        ids = ids[order]
        U = embedding_matrix(group.column(emb_col).take(pa.array(order)),
                             dtype=np.float64)
        norms = np.linalg.norm(U, axis=1)
        norms[norms == 0] = 1.0
        U = U / norms[:, None]
        m = len(ids)
        kept = np.zeros((m, U.shape[1]))
        n_kept = 0
        dropped = []
        for i in range(m):
            if n_kept and (kept[:n_kept] @ U[i] >= tau).any():
                dropped.append(ids[i])
            else:
                kept[n_kept] = U[i]
                n_kept += 1
        return pa.table({id_col: pa.array(dropped,
                                          group.schema.field(id_col).type)})

    out = (mat.map_batches(assign, batch_format="pyarrow")
           .groupby("__c").map_groups(prune, batch_format="pyarrow"))
    return out.sort(id_col)


# ---------------------------------------------------------------------------
# DBSCAN over an embedding column (exact quantized similarity graph)
# ---------------------------------------------------------------------------

def dbscan_embeddings(
    ds: ray.data.Dataset,
    emb_col: str,
    id_col: str,
    tau: float,
    min_pts: int,
    max_vertices: int = 4096,
    max_broadcast_pairs: int = 2_000_000,
    distributed: Optional[bool] = None,
) -> pa.Table:
    """DBSCAN density clustering over an embedding column, built on the
    EXACT integer-quantized inner-product threshold graph
    (:func:`graph.ip_threshold_graph`): neighborhood = {sim_q >= tau_q},
    CORE = nodes with >= ``min_pts`` neighbors, clusters = connected
    components of the core-core subgraph (label = component min id),
    BORDER = non-core nodes adjacent to >= 1 core (label = MIN over
    adjacent cores' cluster labels — deterministic, unlike classic
    first-come DBSCAN), NOISE = everything else (label −1).  Integer-exact
    edges mean an SQL oracle re-derives the identical clustering — no
    float-threshold flicker on the eps boundary.

    Scale shape: the vertex set is bounded by contract (``max_vertices``,
    inherited from the exact graph — eval pools / audit samples; compose
    LSH/IVF candidate generators upstream for open corpora), but the EDGE
    list never lands on the driver: degrees are map-side endpoint-explode
    partials + one keyed combine; border labels are a zero-shuffle
    broadcast-lookup pass emitting per-batch (node, min-label) partials +
    one keyed Min combine.  Core-core components run driver union-find
    while the core pair list fits (``max_broadcast_pairs``), else the
    min-label-propagation rounds of ``dedup.dup_components_distributed``
    — the same auto-switch as ``jaccard_component_dedup``.

    Returns pa.Table(id, cluster, role) sorted by id, one row per input
    vector; roles ∈ {'core', 'border', 'noise'}.
    """
    from ray.data.aggregate import Min as _Min, Sum as _Sum

    from .dedup import dup_components, dup_components_distributed
    from .graph import ip_threshold_graph

    all_ids = np.array(sorted(
        r[id_col] for r in ds.select_columns([id_col]).take_all()),
        np.int64)
    edges = ip_threshold_graph(ds, emb_col, id_col, tau,
                               max_vertices=max_vertices).materialize()

    def deg_partial(batch: pa.Table) -> pa.Table:
        node = pa.concat_arrays([
            batch.column("u").combine_chunks(),
            batch.column("v").combine_chunks()])
        t = pa.table({"node": node})
        g = t.group_by(["node"]).aggregate([([], "count_all")])
        return pa.table({"node": g.column("node"),
                         "_d": g.column("count_all").cast(pa.int64())})

    deg_rows = (edges.map_batches(deg_partial, batch_format="pyarrow")
                .groupby("node").aggregate(_Sum("_d", alias_name="degree"))
                ).take_all()
    core_ids = np.array(sorted(r["node"] for r in deg_rows
                               if r["degree"] >= min_pts), np.int64)
    core_set_ref = ray.put(core_ids)

    # core-core components
    def cc_filter(batch: pa.Table, ref=core_set_ref) -> pa.Table:
        cs = ray.get(ref)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        m = np.isin(u, cs) & np.isin(v, cs)
        return pa.table({"id_a": pa.array(u[m], pa.int64()),
                         "id_b": pa.array(v[m], pa.int64())})

    cc_pairs = edges.map_batches(cc_filter,
                                 batch_format="pyarrow").materialize()
    if distributed is None:
        distributed = cc_pairs.count() > max_broadcast_pairs
    if distributed:
        lab_rows = dup_components_distributed(cc_pairs).take_all()
        labels = {r["id"]: r["root"] for r in lab_rows}
    else:
        labels = dup_components(cc_pairs)
    label_map = {int(c): int(labels.get(int(c), int(c))) for c in core_ids}
    core_lbls = np.array([label_map[int(c)] for c in core_ids], np.int64)
    lbl_ref = ray.put((core_ids, core_lbls))

    # border labels: min adjacent-core cluster label per non-core node
    def border_partial(batch: pa.Table, ref=lbl_ref) -> pa.Table:
        cids, clbl = ray.get(ref)
        u = batch.column("u").to_numpy(zero_copy_only=False)
        v = batch.column("v").to_numpy(zero_copy_only=False)
        uc = np.isin(u, cids)
        vc = np.isin(v, cids)
        nodes = np.concatenate([u[~uc & vc], v[~vc & uc]])
        nbr = np.concatenate([v[~uc & vc], u[~vc & uc]])
        lbl = clbl[np.searchsorted(cids, nbr)] if len(nbr) else \
            np.empty(0, np.int64)
        if len(nodes):  # in-batch min per node
            order = np.lexsort((lbl, nodes))
            nodes, lbl = nodes[order], lbl[order]
            first = np.empty(len(nodes), bool)
            first[0] = True
            first[1:] = nodes[1:] != nodes[:-1]
            nodes, lbl = nodes[first], lbl[first]
        return pa.table({"node": pa.array(nodes, pa.int64()),
                         "_l": pa.array(lbl, pa.int64())})

    border_rows = (edges.map_batches(border_partial, batch_format="pyarrow")
                   .groupby("node").aggregate(_Min("_l", alias_name="lbl"))
                   ).take_all()
    border = {int(r["node"]): int(r["lbl"]) for r in border_rows}

    cluster = np.full(len(all_ids), -1, np.int64)
    role = np.full(len(all_ids), "noise", object)
    core_pos = np.searchsorted(all_ids, core_ids)
    cluster[core_pos] = core_lbls
    role[core_pos] = "core"
    for n, l in border.items():
        i = int(np.searchsorted(all_ids, n))
        if role[i] == "noise":
            cluster[i] = l
            role[i] = "border"
    return pa.table({
        "id": pa.array(all_ids, pa.int64()),
        "cluster": pa.array(cluster, pa.int64()),
        "role": pa.array([str(x) for x in role], pa.string()),
    })


# ---------------------------------------------------------------------------
# label propagation (semi-supervised node classification)
# ---------------------------------------------------------------------------

def label_propagation(
    ds: ray.data.Dataset,
    emb_col: str,
    id_col: str,
    label_col: str,
    seed_pred,
    tau: float,
    n_rounds: int = 2,
    max_vertices: int = 4096,
) -> pa.Table:
    """Synchronous label propagation over the exact quantized similarity
    graph: SEED nodes (``seed_pred(ids) -> bool mask``) keep their true
    label forever; every round, every non-seed node takes the MAJORITY
    label among its neighbors' previous-round labels (unlabeled neighbors
    ignored; ties break to the SMALLEST label; no labeled neighbor →
    stays unlabeled = −1).  Fixed ``n_rounds`` keeps the result
    deterministic and lets an SQL oracle unroll the identical rounds —
    integer vote counts mean no float flicker anywhere.

    Scale shape: the edge list stays distributed; each round is ONE
    zero-shuffle ``map_batches`` pass over the edges against the broadcast
    previous-round label vector (``ray.put`` once per round), emitting
    in-batch-combined (node, label, votes) partials, then ONE keyed
    combine; the argmax is a vectorized pass over the (vertex × labels)-
    bounded vote table.  Vertex set bounded by contract (``max_vertices``,
    inherited from :func:`graph.ip_threshold_graph`).

    Returns pa.Table(id, label, role) sorted by id; role ∈ {'seed',
    'propagated', 'unlabeled'}.
    """
    from ray.data.aggregate import Sum as _Sum

    from .graph import ip_threshold_graph

    rows = ds.select_columns([id_col, label_col]).take_all()
    rows.sort(key=lambda r: r[id_col])
    all_ids = np.array([r[id_col] for r in rows], np.int64)
    true_lbl = np.array([r[label_col] for r in rows], np.int64)
    seed_mask = np.asarray(seed_pred(all_ids), bool)
    labels = np.where(seed_mask, true_lbl, -1)

    edges = ip_threshold_graph(ds, emb_col, id_col, tau,
                               max_vertices=max_vertices).materialize()

    for _ in range(n_rounds):
        ref = ray.put((all_ids, labels))

        def votes(batch: pa.Table, r=ref) -> pa.Table:
            ids, lbl = ray.get(r)
            u = batch.column("u").to_numpy(zero_copy_only=False)
            v = batch.column("v").to_numpy(zero_copy_only=False)
            # both directions: v hears u's label, u hears v's
            node = np.concatenate([v, u])
            heard = np.concatenate([lbl[np.searchsorted(ids, u)],
                                    lbl[np.searchsorted(ids, v)]])
            keep = heard >= 0
            node, heard = node[keep], heard[keep]
            if len(node):  # in-batch combine
                order = np.lexsort((heard, node))
                node, heard = node[order], heard[order]
                new = np.empty(len(node), bool)
                new[0] = True
                new[1:] = (node[1:] != node[:-1]) | (heard[1:] != heard[:-1])
                grp = np.cumsum(new) - 1
                cnt = np.bincount(grp)
                node, heard = node[new], heard[new]
            else:
                cnt = np.empty(0, np.int64)
            return pa.table({"node": pa.array(node, pa.int64()),
                             "lbl": pa.array(heard, pa.int64()),
                             "_n": pa.array(cnt.astype(np.int64))})

        vote_rows = (edges.map_batches(votes, batch_format="pyarrow")
                     .groupby(["node", "lbl"])
                     .aggregate(_Sum("_n", alias_name="n"))).take_all()
        nxt = labels.copy()
        best: dict = {}
        for r in vote_rows:
            node, lbl, n = int(r["node"]), int(r["lbl"]), int(r["n"])
            cur = best.get(node)
            # majority, ties to the smallest label
            if cur is None or (n, -lbl) > (cur[0], -cur[1]):
                best[node] = (n, lbl)
        for node, (_, lbl) in best.items():
            i = int(np.searchsorted(all_ids, node))
            if not seed_mask[i]:
                nxt[i] = lbl
        labels = nxt

    role = np.where(seed_mask, "seed",
                    np.where(labels >= 0, "propagated", "unlabeled"))
    return pa.table({
        "id": pa.array(all_ids, pa.int64()),
        "label": pa.array(labels, pa.int64()),
        "role": pa.array([str(x) for x in role], pa.string()),
    })
