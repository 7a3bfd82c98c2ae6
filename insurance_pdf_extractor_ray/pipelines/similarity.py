"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline (per-batch numpy matmul
against a broadcast query matrix; partial top-k per batch, tiny final merge),
plus an LSH-bucketed approximate variant as the scale path.

Broadcast pattern: the query matrix is ``ray.put`` once and referenced by all
map tasks — never re-shipped per batch.
"""

from __future__ import annotations

from typing import Optional

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def embedding_matrix(col, dtype=np.float64) -> np.ndarray:
    """(n, dim) matrix from a list<float> / fixed_size_list column, zero-copy
    where possible: uniform-length lists reshape the flattened values buffer
    directly instead of the to_pylist() row-by-row materialization."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    n = len(col)
    if n == 0:
        return np.empty((0, 0), dtype=dtype)
    if pa.types.is_fixed_size_list(col.type):
        dim = col.type.list_size
        return col.values.to_numpy(zero_copy_only=False).reshape(n, dim).astype(
            dtype, copy=False)
    lengths = col.value_lengths().fill_null(0).to_numpy()
    if lengths.min() == lengths.max() and lengths[0] > 0 and col.null_count == 0:
        flat = col.flatten().to_numpy(zero_copy_only=False)
        return flat.reshape(n, int(lengths[0])).astype(dtype, copy=False)
    return np.asarray(col.to_pylist(), dtype=dtype)  # ragged fallback


class BruteForceTopK:
    """map_batches stage: per-batch cosine top-k against the broadcast queries.

    Emits candidate rows (query_id, id, score) — at most k per (query, batch);
    the driver merges the (small) candidate set to the global top-k.
    """

    def __init__(self, queries_ref, emb_col: str, id_col: str, k: int):
        # ObjectRef resolved once per actor; zero-copy numpy view
        self.queries = _normalize(np.asarray(ray.get(queries_ref), dtype=np.float64))
        self.emb_col, self.id_col, self.k = emb_col, id_col, k

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = embedding_matrix(batch.column(self.emb_col))
        if embs.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             self.id_col: pa.array([], batch.column(self.id_col).type),
                             "score": pa.array([], pa.float64())})
        ids = batch.column(self.id_col)
        sims = self.queries @ _normalize(embs).T  # (q, n)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        q_idx = np.repeat(np.arange(sims.shape[0]), k)
        flat = top.ravel()
        return pa.table(
            {"query_id": pa.array(q_idx, pa.int64()),
             self.id_col: ids.take(pa.array(flat)),
             "score": pa.array(sims[q_idx, flat].astype(np.float64))}
        )


def _topk_merge(candidates: ray.data.Dataset, id_col: str, k: int) -> pa.Table:
    """Distributed global top-k-per-query reduce over a candidate stream of
    (query_id, id, score) rows.

    Per-block partial head (≤ q·k rows leave each block) → ONE keyed
    shuffle on query_id → per-query final head.  The driver receives only
    the q·k RESULT rows — never the O(q·k·num_batches) candidate stream,
    which at 100 TB (~10⁶ blocks) would be driver-scale.  Ties on score
    break by ascending id so results are total-ordered (oracle-comparable).
    """
    from .rankagg import grouped_top_k

    rows = grouped_top_k(candidates, "query_id", ["score", id_col],
                         [True, False], k=k).take_all()
    rows.sort(key=lambda r: (r["query_id"], -r["score"], r[id_col]))
    return pa.table({"query_id": pa.array([r["query_id"] for r in rows],
                                          pa.int64()),
                     id_col: pa.array([r[id_col] for r in rows]),
                     "score": pa.array([r["score"] for r in rows],
                                       pa.float64())})


def knn_brute_force(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    concurrency=(1, 8),
    batch_size: int = 4096,
) -> pa.Table:
    """Exact cosine top-k: (query_id, id, score) sorted by query, -score, id.

    Ties on score are broken by ascending id so results are total-ordered
    (and oracle-comparable).  Candidates are reduced DISTRIBUTIVELY
    (:func:`_topk_merge`) — no driver-side heap over the candidate stream.
    """
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    candidates = ds.select_columns([id_col, emb_col]).map_batches(
        BruteForceTopK,
        fn_constructor_kwargs=dict(queries_ref=qref, emb_col=emb_col, id_col=id_col, k=k),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
    return _topk_merge(candidates, id_col, k)


class LshTopK(BruteForceTopK):
    """Approximate variant: only score rows whose sign-bucket matches a query
    bucket within ``max_mismatch`` planes (random-projection prefilter)."""

    def __init__(self, queries_ref, emb_col, id_col, k,
                 n_planes: int = 8, max_mismatch: int = 2, seed: int = 42):
        super().__init__(queries_ref, emb_col, id_col, k)
        rng = np.random.RandomState(seed)
        self.planes = rng.standard_normal((self.queries.shape[1], n_planes)).astype(np.float64)
        self.q_signs = (self.queries @ self.planes) > 0
        self.max_mismatch = max_mismatch

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = embedding_matrix(batch.column(self.emb_col))
        if embs.size == 0:
            return super().__call__(batch)
        signs = (embs @ self.planes) > 0  # (n, planes)
        # rows within max_mismatch of ANY query's signature survive
        mismatches = (signs[None, :, :] != self.q_signs[:, None, :]).sum(axis=2)  # (q, n)
        keep = (mismatches <= self.max_mismatch).any(axis=0)
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             self.id_col: pa.array([], batch.column(self.id_col).type),
                             "score": pa.array([], pa.float64())})
        sub = batch.filter(pa.array(keep))
        return super().__call__(sub)


def train_centroids(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
    n_clusters: int = 64,
    sample_size: int = 10000,
    iters: int = 10,
    seed: int = 42,
    id_col: Optional[str] = None,
) -> np.ndarray:
    """Deterministic k-means centroids from a sample (the IVF training step;
    public Lloyd's algorithm over unit vectors).

    With ``id_col`` the sample is an unbiased deterministic hash stratum
    (rows whose stable id hash falls in the smallest 1/m slice) — identical
    regardless of block order or parallelism, unlike a head ``limit`` (which
    is order-biased) or ``random_sample`` (which depends on partitioning).
    Without ``id_col`` it falls back to the head.  At 100 TB you'd train once
    offline and broadcast the tiny centroid matrix.
    """
    if id_col is not None:
        from ..functions.hashing import stable_hash64_column

        n = ds.count()
        m = max(1, n // max(1, sample_size))

        def stratum(batch: pa.Table) -> pa.Table:
            h = stable_hash64_column(batch.column(id_col).cast(pa.string()),
                                     seed=seed)
            return batch.filter(pa.array(h % np.uint64(m) == 0))

        sample_ds = ds.select_columns([id_col, emb_col]).map_batches(
            stratum, batch_format="pyarrow")
        rows = sorted(sample_ds.take_all(), key=lambda r: r[id_col])
        sample = rows[: 2 * sample_size]
    else:
        sample = ds.select_columns([emb_col]).limit(sample_size).take_all()
    X = _normalize(np.asarray([r[emb_col] for r in sample], dtype=np.float64))
    rng = np.random.RandomState(seed)
    n_clusters = min(n_clusters, len(X))
    centroids = X[rng.choice(len(X), size=n_clusters, replace=False)]
    for _ in range(iters):
        assign = np.argmax(X @ centroids.T, axis=1)
        for c in range(n_clusters):
            members = X[assign == c]
            if len(members):
                centroids[c] = members.mean(axis=0)
        centroids = _normalize(centroids)
    return centroids


class IvfTopK(BruteForceTopK):
    """IVF variant: score only rows assigned to one of each query's
    ``n_probe`` nearest centroids (inverted-file prefilter)."""

    def __init__(self, queries_ref, centroids_ref, emb_col, id_col, k, n_probe: int = 4):
        super().__init__(queries_ref, emb_col, id_col, k)
        self.centroids = np.asarray(ray.get(centroids_ref), dtype=np.float64)
        # per-query probe set
        sims = self.queries @ self.centroids.T  # (q, c)
        n_probe = min(n_probe, sims.shape[1])
        self.probe = np.argpartition(-sims, n_probe - 1, axis=1)[:, :n_probe]  # (q, p)
        self.probe_union = np.unique(self.probe)

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = embedding_matrix(batch.column(self.emb_col))
        if embs.size == 0:
            return super().__call__(batch)
        assign = np.argmax(_normalize(embs) @ self.centroids.T, axis=1)
        keep = np.isin(assign, self.probe_union)
        if not keep.any():
            return pa.table({"query_id": pa.array([], pa.int64()),
                             self.id_col: pa.array([], batch.column(self.id_col).type),
                             "score": pa.array([], pa.float64())})
        return super().__call__(batch.filter(pa.array(keep)))


def knn_ivf(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    centroids: Optional[np.ndarray] = None,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_clusters: int = 64,
    n_probe: int = 4,
    concurrency=(1, 8),
    batch_size: int = 4096,
) -> pa.Table:
    """Approximate cosine top-k via IVF (k-means inverted file).

    Centroids are trained from a sample if not supplied, broadcast once, and
    each batch scores only its probe-cluster rows.  Recall rises with
    ``n_probe`` (n_probe == n_clusters degenerates to brute force).
    """
    if centroids is None:
        centroids = train_centroids(ds, emb_col, n_clusters=n_clusters,
                                    id_col=id_col)
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    cref = ray.put(np.asarray(centroids, dtype=np.float64))
    candidates = ds.select_columns([id_col, emb_col]).map_batches(
        IvfTopK,
        fn_constructor_kwargs=dict(queries_ref=qref, centroids_ref=cref,
                                   emb_col=emb_col, id_col=id_col, k=k, n_probe=n_probe),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
    return _topk_merge(candidates, id_col, k)


def build_ivf_index(
    ds: ray.data.Dataset, path: str, centroids: np.ndarray,
    emb_col: str = "embedding", id_col: str = "vec_id",
) -> str:
    """Materialize an IVF layout: rows partitioned by nearest-centroid id
    (``path/cluster=<c>/...parquet``) + the centroid matrix alongside.

    This is the at-rest form of the inverted file: a query then READS ONLY
    its probe clusters' directories — storage-level pruning instead of
    scanning the whole table and filtering (what :func:`knn_ivf` does).
    Centroids are broadcast once via ``ray.put``; assignment is one batched
    matmul per block.
    """
    import os

    import pyarrow.parquet as pq

    C = _normalize(np.asarray(centroids, dtype=np.float64))
    cref = ray.put(C)

    class Assign:
        def __init__(self, centroids_ref):
            self.c = ray.get(centroids_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            embs = embedding_matrix(batch.column(emb_col))
            if embs.size == 0:
                return batch.append_column("cluster", pa.array([], pa.int32()))
            assign = np.argmax(_normalize(embs) @ self.c.T, axis=1)
            return batch.append_column(
                "cluster", pa.array(assign.astype(np.int32), pa.int32()))

    os.makedirs(path, exist_ok=True)
    ds.map_batches(Assign, fn_constructor_kwargs=dict(centroids_ref=cref),
                   batch_format="pyarrow", concurrency=(1, 8)).write_parquet(
        path, partition_cols=["cluster"])
    pq.write_table(pa.table({"centroid": pa.array([c.tolist() for c in C],
                                                  pa.list_(pa.float64()))}),
                   os.path.join(path, "_centroids.parquet"))
    return path


def knn_ivf_indexed(
    path: str, queries: np.ndarray,
    emb_col: str = "embedding", id_col: str = "vec_id",
    k: int = 10, n_probe: int = 4,
    concurrency=(1, 8), batch_size: int = 4096,
) -> pa.Table:
    """ANN over a :func:`build_ivf_index` layout: compute each query's probe
    clusters, read ONLY those ``cluster=<c>`` directories (pruned at
    storage), brute-force-score the candidates.  Produces exactly the rows
    :func:`knn_ivf` would (same centroids, same probe union), while touching
    ``n_probe/n_clusters`` of the bytes.
    """
    import glob
    import os

    import pyarrow.parquet as pq
    import ray.data

    C = np.asarray(
        pq.read_table(os.path.join(path, "_centroids.parquet"))
        .column("centroid").to_pylist(), dtype=np.float64)
    q = _normalize(np.asarray(queries, dtype=np.float64))
    sims = q @ C.T
    n_probe = min(n_probe, sims.shape[1])
    probe_union = np.unique(np.argpartition(-sims, n_probe - 1, axis=1)[:, :n_probe])

    # read_parquet wants files when given a list — expand each probe dir
    dirs = [f for c in probe_union
            for f in glob.glob(os.path.join(path, f"cluster={int(c)}", "*.parquet"))]
    if not dirs:
        return pa.table({"query_id": pa.array([], pa.int64()),
                         id_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})
    ds = ray.data.read_parquet(dirs, columns=[id_col, emb_col])
    return knn_brute_force(ds, queries, emb_col=emb_col, id_col=id_col, k=k,
                           concurrency=concurrency, batch_size=batch_size)


def knn_lsh(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    n_planes: int = 8,
    max_mismatch: int = 2,
    concurrency=(1, 8),
    batch_size: int = 4096,
) -> pa.Table:
    """Approximate cosine top-k (LSH prefilter; recall < 1, compute << brute)."""
    qref = ray.put(np.asarray(queries, dtype=np.float64))
    candidates = ds.select_columns([id_col, emb_col]).map_batches(
        LshTopK,
        fn_constructor_kwargs=dict(queries_ref=qref, emb_col=emb_col, id_col=id_col,
                                   k=k, n_planes=n_planes, max_mismatch=max_mismatch),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )
    return _topk_merge(candidates, id_col, k)


def group_centroids(
    ds: ray.data.Dataset,
    emb_col: str,
    group_col: str,
) -> pa.Table:
    """Per-group mean embedding — Dataset(group, dim, centroid), one row per
    (group, vector dimension).  The class-prototype / cluster-summary
    primitive (seed vectors for IVF, per-source drift monitors, nearest-
    centroid classification).

    Scale shape: each block reduces to per-group (sum-vector, count)
    PARTIALS via one zero-copy matrix reshape + ``np.add.at`` scatter —
    blocks ship |groups in block| x dim rows, never vectors.  A final keyed
    combine sums partials per (group, dim); output is bounded by
    |groups| x dim.  Exploding partials to (group, dim, s) rows keeps the
    combine a plain columnar Sum — no list-typed aggregate state needed.
    """
    from ray.data.aggregate import Sum

    def partials(batch: pa.Table) -> pa.Table:
        m = embedding_matrix(batch.column(emb_col))
        g = batch.column(group_col).to_numpy(zero_copy_only=False)
        if m.size == 0:
            return pa.table({group_col: pa.array([], batch.schema.field(group_col).type),
                             "dim": pa.array([], pa.int32()),
                             "_s": pa.array([], pa.float64()),
                             "_n": pa.array([], pa.int64())})
        uniq, inv = np.unique(g, return_inverse=True)
        sums = np.zeros((len(uniq), m.shape[1]), dtype=np.float64)
        np.add.at(sums, inv, m)
        counts = np.bincount(inv, minlength=len(uniq)).astype(np.int64)
        k, d = sums.shape
        return pa.table({
            group_col: pa.array(np.repeat(uniq, d)),
            "dim": pa.array(np.tile(np.arange(d, dtype=np.int32), k)),
            "_s": pa.array(sums.ravel(), pa.float64()),
            "_n": pa.array(np.repeat(counts, d), pa.int64()),
        })

    combined = (ds.select_columns([group_col, emb_col])
                .map_batches(partials, batch_format="pyarrow")
                .groupby([group_col, "dim"])
                .aggregate(Sum("_s", alias_name="_s"),
                           Sum("_n", alias_name="_n")))
    rows = combined.take_all()  # |groups| x dim — bounded, never corpus-scale
    rows.sort(key=lambda r: (r[group_col], r["dim"]))
    return pa.table({
        group_col: pa.array([r[group_col] for r in rows]),
        "dim": pa.array([r["dim"] for r in rows], pa.int32()),
        "centroid": pa.array([r["_s"] / r["_n"] for r in rows], pa.float64()),
    })


def quantize_embeddings(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    levels: int = 256,
):
    """Per-dimension min-max int8-style quantization of an embedding column
    — the storage/bandwidth step of a large-scale vector pipeline (float32
    -> 1 byte/dim, 4x smaller shuffles and indexes; codes reconstruct to
    within half a step).

    Pass 1 streams per-block per-dim (min, max) partials (dim-sized rows,
    never row-scaled) and merges them on the driver; pass 2 broadcasts the
    two dim-vectors and maps codes = floor((v - mn) * (levels-1)/(mx - mn)
    + 0.5) — all arithmetic in float64 in exactly the SQL oracle's
    expression order, so codes are bit-comparable to a DuckDB
    re-derivation.  Constant dimensions (mx == mn) code to 0.

    Returns ``(codes_dataset, mn, mx)``: codes as list<uint8> per row plus
    the broadcast-sized calibration vectors (persist them next to the codes
    — dequantization needs them).
    """
    vals = ds.select_columns([id_col, emb_col]).materialize()

    def mm_partial(batch: pa.Table) -> pa.Table:
        m = embedding_matrix(batch.column(emb_col))
        return pa.table({
            "mn": pa.array([m.min(axis=0)], pa.list_(pa.float64())),
            "mx": pa.array([m.max(axis=0)], pa.list_(pa.float64())),
        })

    mn = mx = None
    for r in vals.map_batches(mm_partial, batch_format="pyarrow").take_all():
        bmn = np.asarray(r["mn"], np.float64)
        bmx = np.asarray(r["mx"], np.float64)
        mn = bmn if mn is None else np.minimum(mn, bmn)
        mx = bmx if mx is None else np.maximum(mx, bmx)

    mn_ref, mx_ref = ray.put(mn), ray.put(mx)
    lv = float(levels - 1)

    def quant(batch: pa.Table, mn_r, mx_r) -> pa.Table:
        lo = ray.get(mn_r)
        hi = ray.get(mx_r)
        m = embedding_matrix(batch.column(emb_col))
        span = hi - lo
        with np.errstate(invalid="ignore", divide="ignore"):
            q = (m - lo) * lv / span
        # exact round-half-away for q >= 0: frac = q - trunc(q) is exact in
        # IEEE (Sterbenz), so the .5 comparison never suffers the
        # floor(q + 0.5) representability edge that SQL round() avoids
        tq = np.trunc(q)
        codes = tq + (q - tq >= 0.5)
        codes[:, span <= 0] = 0.0
        codes = codes.astype(np.uint8)
        n, d = codes.shape
        la = pa.ListArray.from_arrays(
            pa.array(np.arange(0, (n + 1) * d, d, dtype=np.int32)),
            pa.array(codes.ravel(), pa.uint8()))
        return pa.table({id_col: batch.column(id_col), "codes": la})

    out = vals.map_batches(quant, fn_args=(mn_ref, mx_ref),
                           batch_format="pyarrow")
    return out, mn, mx


def covariance_matrix(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
) -> "pa.Table":
    """Distributed dim×dim sample-covariance of an embedding column — the
    input to PCA / whitening / feature-correlation screens over a corpus of
    vectors.

    Determinism contract (the same trick as ``quantize_embeddings`` /
    ``unigram_logprob``): every per-element product ``x_i·x_j`` (float32 ×
    float32 is EXACT in float64 — 48 mantissa bits) is half-rounded to
    integer micro-units BEFORE reduction, so the co-moment sums are int64
    and commute — partition-, retry- and layout-independent, and exactly
    re-derivable in SQL.  The covariance column derives from those integers
    with one fixed float expression mirrored by the oracle.

    Scale shape: one ``map_batches`` pass emits per-batch quantized
    co-moment partials — d(d+1)/2 rows per batch however many input rows —
    then ONE keyed combine over the (i, j) grid (d² keys; d ≤ a few
    thousand by contract).  No row-scale shuffle; driver holds only the
    d×d result.  Output per (i ≤ j): n, s_xy_micro, s_x_micro, s_y_micro,
    cov = (s_xy/1e6 − (s_x/1e6)·(s_y/1e6)/n)/(n−1).
    """
    from ray.data.aggregate import Sum

    def partial(batch: pa.Table) -> pa.Table:
        x = embedding_matrix(batch.column(emb_col))  # (B, d) float64 exact
        b, d = x.shape
        prod = (x[:, :, None] * x[:, None, :]) * 1e6
        s_xy = (-np.floor(-prod + 0.5)).astype(np.int64).sum(axis=0)
        sx = (-np.floor(-(x * 1e6) + 0.5)).astype(np.int64).sum(axis=0)
        iu, ju = np.triu_indices(d)
        return pa.table({
            "i": pa.array(iu.astype(np.int64), pa.int64()),
            "j": pa.array(ju.astype(np.int64), pa.int64()),
            "_sxy": pa.array(s_xy[iu, ju], pa.int64()),
            "_sx": pa.array(sx[iu], pa.int64()),
            "_sy": pa.array(sx[ju], pa.int64()),
            "_n": pa.array(np.full(len(iu), b, np.int64), pa.int64()),
        })

    agg = (ds.select_columns([emb_col])
           .map_batches(partial, batch_format="pyarrow")
           .groupby(["i", "j"])
           .aggregate(Sum("_sxy", alias_name="s_xy_micro"),
                      Sum("_sx", alias_name="s_x_micro"),
                      Sum("_sy", alias_name="s_y_micro"),
                      Sum("_n", alias_name="n")))
    rows = agg.take_all()  # d(d+1)/2 rows
    rows.sort(key=lambda r: (r["i"], r["j"]))
    i = np.array([r["i"] for r in rows], np.int64)
    j = np.array([r["j"] for r in rows], np.int64)
    sxy = np.array([r["s_xy_micro"] for r in rows], np.int64)
    sx = np.array([r["s_x_micro"] for r in rows], np.int64)
    sy = np.array([r["s_y_micro"] for r in rows], np.int64)
    n = np.array([r["n"] for r in rows], np.int64).astype(np.float64)
    cov = (sxy / 1e6 - (sx / 1e6) * (sy / 1e6) / n) / (n - 1.0)
    return pa.table({
        "i": pa.array(i, pa.int64()), "j": pa.array(j, pa.int64()),
        "n": pa.array(n.astype(np.int64), pa.int64()),
        "s_xy_micro": pa.array(sxy, pa.int64()),
        "cov": pa.array(cov, pa.float64()),
    })


def pca_top_component(
    cov_tbl: "pa.Table",
    dim: int,
    iters: int = 50,
) -> np.ndarray:
    """Leading eigenvector of a ``covariance_matrix`` result by fixed-seed
    power iteration on the (tiny, driver-resident) d×d matrix — the PCA
    last mile once the distributed pass has reduced the corpus to d².
    Deterministic: starts from the all-ones vector, fixed iteration count,
    sign-canonicalized (largest-|component| entry made positive)."""
    m = np.zeros((dim, dim), np.float64)
    i = np.array(cov_tbl.column("i").to_pylist())
    j = np.array(cov_tbl.column("j").to_pylist())
    c = np.array(cov_tbl.column("cov").to_pylist())
    m[i, j] = c
    m[j, i] = c
    v = np.ones(dim) / np.sqrt(dim)
    for _ in range(iters):
        v = m @ v
        nv = np.linalg.norm(v)
        if nv == 0:
            return v
        v = v / nv
    k = int(np.abs(v).argmax())
    return v if v[k] >= 0 else -v


def mahalanobis_outliers(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    top_k: int = 25,
) -> "pa.Table":
    """Corpus-level embedding outliers by diagonal-covariance Mahalanobis
    distance — the vector-space health screen (mislabeled media, garbage
    encodes, adversarial inserts sit far from the per-dimension envelope).

    Two passes, zero shuffles:
      1. per-dim moment sums with the ``covariance_matrix`` quantization
         (every x and x² half-rounded to int64 micro-units BEFORE
         reduction — layout-independent, SQL-re-derivable);
      2. per-row distance with each per-dim term
         ``(x−μ_i)²/σ²_i`` half-rounded to integer micro-units before the
         across-dim sum, so the score is int64-exact on both sides (no
         float SUM-order hazard in the oracle).
    μ/σ² derive from the integer sums with one fixed float expression
    mirrored by the SQL.  Returns the top-k (distance desc, id asc).
    """
    from ray.data.aggregate import Sum

    def moments(batch: pa.Table) -> pa.Table:
        x = embedding_matrix(batch.column(emb_col))
        d = x.shape[1]
        sx = (-np.floor(-(x * 1e6) + 0.5)).astype(np.int64).sum(axis=0)
        sxx = (-np.floor(-((x * x) * 1e6) + 0.5)).astype(np.int64).sum(axis=0)
        return pa.table({
            "i": pa.array(np.arange(d, dtype=np.int64), pa.int64()),
            "_sx": pa.array(sx, pa.int64()),
            "_sxx": pa.array(sxx, pa.int64()),
            "_n": pa.array(np.full(d, x.shape[0], np.int64), pa.int64()),
        })

    agg = (ds.select_columns([emb_col])
           .map_batches(moments, batch_format="pyarrow")
           .groupby("i").aggregate(Sum("_sx", alias_name="sx"),
                                   Sum("_sxx", alias_name="sxx"),
                                   Sum("_n", alias_name="n"))).take_all()
    agg.sort(key=lambda r: r["i"])
    sx = np.array([r["sx"] for r in agg], np.float64)
    sxx = np.array([r["sxx"] for r in agg], np.float64)
    n = float(agg[0]["n"])
    mu = sx / 1e6 / n
    var = (sxx / 1e6 - (sx / 1e6) * (sx / 1e6) / n) / (n - 1.0)
    ref = ray.put((mu, var))

    def dist(batch: pa.Table, mv_ref) -> pa.Table:
        m, v = ray.get(mv_ref)
        x = embedding_matrix(batch.column(emb_col))
        t = ((x - m[None, :]) ** 2 / v[None, :]) * 1e6
        dq = (-np.floor(-t + 0.5)).astype(np.int64).sum(axis=1)
        ids = batch.column(id_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        k = min(top_k, len(dq))
        part = np.argpartition(-dq, k - 1)[:k] if k else np.array([], int)
        return pa.table({
            id_col: pa.array(ids[part], pa.int64()),
            "dist2_micro": pa.array(dq[part], pa.int64()),
        })

    import functools

    cand = ds.select_columns([id_col, emb_col]).map_batches(
        functools.partial(dist, mv_ref=ref), batch_format="pyarrow")
    rows = cand.take_all()  # <= top_k per block
    rows.sort(key=lambda r: (-r["dist2_micro"], r[id_col]))
    rows = rows[:top_k]
    return pa.table({
        id_col: pa.array([r[id_col] for r in rows], pa.int64()),
        "dist2_micro": pa.array([r["dist2_micro"] for r in rows],
                                pa.int64()),
    })


class LabelMaskedTopK(BruteForceTopK):
    """Hard-negative mining stage: per-batch cosine top-k against the
    broadcast queries, EXCLUDING candidates that share the query's label
    (and the query row itself).

    Mining hard negatives for contrastive / retrieval training: for each
    anchor, the highest-similarity examples with a DIFFERENT label are the
    negatives that most improve the margin.  Same candidate-row contract as
    BruteForceTopK (at most k per (query, batch); tiny driver merge).
    """

    def __init__(self, queries_ref, emb_col: str, id_col: str,
                 label_col: str, k: int):
        # queries_ref resolves to (matrix, query_ids, query_labels)
        mat, qids, qlabels = ray.get(queries_ref)
        self.queries = _normalize(np.asarray(mat, dtype=np.float64))
        self.q_ids = np.asarray(qids, dtype=np.int64)
        self.q_labels = np.asarray(qlabels, dtype=np.int64)
        self.emb_col, self.id_col, self.label_col, self.k = (
            emb_col, id_col, label_col, k)

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = embedding_matrix(batch.column(self.emb_col))
        empty = pa.table({"query_id": pa.array([], pa.int64()),
                          self.id_col: pa.array(
                              [], batch.column(self.id_col).type),
                          "score": pa.array([], pa.float64())})
        if embs.size == 0:
            return empty
        ids = batch.column(self.id_col)
        labels = batch.column(self.label_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        sims = self.queries @ _normalize(embs).T  # (q, n)
        # mask same-label candidates (which also masks the anchor itself
        # when labels match — belt-and-braces mask the anchor id too)
        rid = ids.cast(pa.int64()).to_numpy(zero_copy_only=False)
        mask = (self.q_labels[:, None] == labels[None, :]) | (
            self.q_ids[:, None] == rid[None, :])
        sims = np.where(mask, -np.inf, sims)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        q_idx = np.repeat(np.arange(sims.shape[0]), k)
        flat = top.ravel()
        keep = np.isfinite(sims[q_idx, flat])
        q_idx, flat = q_idx[keep], flat[keep]
        return pa.table(
            {"query_id": pa.array(q_idx, pa.int64()),
             self.id_col: ids.take(pa.array(flat)),
             "score": pa.array(sims[q_idx, flat].astype(np.float64))})


def hard_negatives(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids,
    query_labels,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 10,
    concurrency=(1, 8),
    batch_size: int = 4096,
) -> pa.Table:
    """Exact cosine hard-negative top-k per anchor: (query_id, id, score)
    where every returned id has a label DIFFERENT from the anchor's.

    query_id in the output is the POSITIONAL index of the anchor (caller
    remaps to real ids).  Ties on score break by ascending id — total order,
    oracle-comparable.  Broadcast once via ray.put; per-batch partial top-k;
    distributed keyed top-k reduce (:func:`_topk_merge`) — the driver only
    ever sees the final q·k result rows.
    """
    qref = ray.put((np.asarray(queries, dtype=np.float64),
                    np.asarray(query_ids, dtype=np.int64),
                    np.asarray(query_labels, dtype=np.int64)))
    candidates = ds.select_columns([id_col, emb_col, label_col]).map_batches(
        LabelMaskedTopK,
        fn_constructor_kwargs=dict(queries_ref=qref, emb_col=emb_col,
                                   id_col=id_col, label_col=label_col, k=k),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    )
    return _topk_merge(candidates, id_col, k)


def nearest_centroid_confusion(
    ds: ray.data.Dataset,
    emb_col: str = "embedding",
    label_col: str = "label",
    batch_size: int = 4096,
) -> pa.Table:
    """Nearest-centroid classification eval — confusion matrix
    (true_label, pred_label, n) of assigning every vector to the
    most-cosine-similar per-label mean centroid.

    Integer-exact centroids: per-label per-dim sums of HALF-ROUNDED
    fixed-point values (q(x) = round(x * 2^20), the ip_threshold_graph
    quantizer), so the centroid is deterministic regardless of block
    arrival order — no float SUM-order hazard.  Cosine is scale-invariant,
    so scoring against the integer SUM vector equals scoring against the
    mean; no division by the group count is needed.

    Two zero-shuffle passes: (1) map-side per-(batch,label) partial sums,
    label-count-sized driver combine; (2) broadcast centroid matrix,
    per-batch argmax + per-batch confusion partials, label^2-sized driver
    combine.  Ties on cosine break toward the LOWEST label.
    """
    Q = float(1 << 20)

    def partial_sums(batch: pa.Table) -> pa.Table:
        x = embedding_matrix(batch.column(emb_col))
        lab = batch.column(label_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if x.size == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "sums": pa.array([], pa.list_(pa.int64()))})
        qx = (-np.floor(-(x * Q) + 0.5)).astype(np.int64)
        ulab = np.unique(lab)
        sums = [qx[lab == l].sum(axis=0) for l in ulab]
        cnts = [int((lab == l).sum()) for l in ulab]
        return pa.table({"label": pa.array(ulab, pa.int64()),
                         "n": pa.array(cnts, pa.int64()),
                         "sums": pa.array([s.tolist() for s in sums],
                                          pa.list_(pa.int64()))})

    parts = ds.select_columns([emb_col, label_col]).map_batches(
        partial_sums, batch_format="pyarrow",
        batch_size=batch_size).take_all()  # <= n_labels per batch
    acc: dict = {}
    for r in parts:
        s = np.asarray(r["sums"], dtype=np.int64)
        if r["label"] in acc:
            acc[r["label"]] = acc[r["label"]] + s
        else:
            acc[r["label"]] = s
    labels = np.array(sorted(acc), np.int64)
    cent = np.stack([acc[l].astype(np.float64) for l in labels])
    ref = ray.put((labels, _normalize(cent)))

    def confuse(batch: pa.Table, c_ref) -> pa.Table:
        labs, cn = ray.get(c_ref)
        x = embedding_matrix(batch.column(emb_col))
        if x.size == 0:
            return pa.table({"true_label": pa.array([], pa.int64()),
                             "pred_label": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        sims = _normalize(x) @ cn.T  # (n, n_labels)
        pred = labs[np.argmax(sims, axis=1)]  # first max = lowest label
        true = batch.column(label_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        key = true * (labs.max() + 1) + pred
        uk, counts = np.unique(key, return_counts=True)
        return pa.table({
            "true_label": pa.array(uk // (labs.max() + 1), pa.int64()),
            "pred_label": pa.array(uk % (labs.max() + 1), pa.int64()),
            "n": pa.array(counts.astype(np.int64), pa.int64())})

    import functools

    cells = ds.select_columns([emb_col, label_col]).map_batches(
        functools.partial(confuse, c_ref=ref), batch_format="pyarrow",
        batch_size=batch_size).take_all()  # <= n_labels^2 per batch
    agg: dict = {}
    for r in cells:
        kk = (r["true_label"], r["pred_label"])
        agg[kk] = agg.get(kk, 0) + r["n"]
    keys = sorted(agg)
    return pa.table({
        "true_label": pa.array([k[0] for k in keys], pa.int64()),
        "pred_label": pa.array([k[1] for k in keys], pa.int64()),
        "n": pa.array([agg[k] for k in keys], pa.int64())})


class EvalTopK(LabelMaskedTopK):
    """Retrieval-eval stage: cosine top-k candidates per anchor, masking
    ONLY the anchor row itself (same-label rows stay — they are the
    relevant results being graded) and carrying the candidate label."""

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = embedding_matrix(batch.column(self.emb_col))
        id_type = batch.column(self.id_col).type
        if embs.size == 0:
            return pa.table({"query_id": pa.array([], pa.int64()),
                             self.id_col: pa.array([], id_type),
                             "score": pa.array([], pa.float64()),
                             self.label_col: pa.array([], pa.int64())})
        ids = batch.column(self.id_col)
        rid = ids.cast(pa.int64()).to_numpy(zero_copy_only=False)
        labels = batch.column(self.label_col).cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        sims = self.queries @ _normalize(embs).T
        sims = np.where(self.q_ids[:, None] == rid[None, :], -np.inf, sims)
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, k - 1, axis=1)[:, :k]
        q_idx = np.repeat(np.arange(sims.shape[0]), k)
        flat = top.ravel()
        keep = np.isfinite(sims[q_idx, flat])
        q_idx, flat = q_idx[keep], flat[keep]
        return pa.table(
            {"query_id": pa.array(q_idx, pa.int64()),
             self.id_col: ids.take(pa.array(flat)),
             "score": pa.array(sims[q_idx, flat].astype(np.float64)),
             self.label_col: pa.array(labels[flat], pa.int64())})


def knn_label_ndcg(
    ds: ray.data.Dataset,
    queries: np.ndarray,
    query_ids,
    query_labels,
    label_counts: dict,
    emb_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
    k: int = 10,
    concurrency=(1, 8),
    batch_size: int = 4096,
) -> pa.Table:
    """NDCG@k of exact cosine retrieval where relevance = candidate label
    == anchor label (the standard embedding-quality eval: does the space
    rank same-class neighbors first?).

    DCG@k = Σ_{i≤k} rel_i / log2(i+1) over the (score desc, id asc)
    ranking with the anchor excluded; IDCG puts min(k, n_same_label − 1)
    relevant results in the top ranks.  ``label_counts`` is the corpus
    label histogram (label-count-sized — pass the tiny groupby result).
    Returns (query_id positional, ndcg) — caller remaps and rounds.
    """
    qref = ray.put((np.asarray(queries, dtype=np.float64),
                    np.asarray(query_ids, dtype=np.int64),
                    np.asarray(query_labels, dtype=np.int64)))
    candidates = ds.select_columns([id_col, emb_col, label_col]).map_batches(
        EvalTopK,
        fn_constructor_kwargs=dict(queries_ref=qref, emb_col=emb_col,
                                   id_col=id_col, label_col=label_col, k=k),
        batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    ).take_all()

    per_q: dict = {}
    for r in candidates:
        per_q.setdefault(r["query_id"], []).append(
            (-r["score"], r[id_col], r[label_col]))
    out_q, out_n = [], []
    for qi in sorted(per_q):
        ranked = sorted(per_q[qi])[:k]
        qlab = int(np.asarray(query_labels)[qi])
        dcg = sum(1.0 / np.log2(i + 2.0)
                  for i, (_, _, lab) in enumerate(ranked) if lab == qlab)
        n_rel = min(k, int(label_counts.get(qlab, 0)) - 1)
        idcg = sum(1.0 / np.log2(i + 2.0) for i in range(max(n_rel, 0)))
        out_q.append(qi)
        out_n.append(dcg / idcg if idcg > 0 else 0.0)
    return pa.table({"query_id": pa.array(out_q, pa.int64()),
                     "ndcg": pa.array(out_n, pa.float64())})
