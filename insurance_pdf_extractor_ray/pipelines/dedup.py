"""Deduplication pipelines (exact + near-dup) for large-scale corpora.

Not present in the reference (SURVEY.md §2.8 notes the gap); these are the
training-data-pipeline operators the engine needs at 100 TB, built on public
schemes: exact hash dedup, MinHash+LSH (Broder), SimHash (Charikar), n-gram
Jaccard verification, and embedding near-dup via random-projection bucketing.

Scale design:
  * every pipeline hash-partitions by a *stable* key (blake2b — never
    Python's randomized hash), so bucketing is reproducible across workers;
  * candidate generation is always bucketed (LSH bands / sign-bands) — no
    O(n^2) comparisons ever leave a bucket;
  * keep-first semantics use the minimum ``id_col`` as the canonical winner,
    which is deterministic and needs no global coordination;
  * the only shuffles are groupbys on short keys (hash, band_key), with
    signatures computed map-side once in a stateful actor.
"""

from __future__ import annotations

from typing import List, Optional

import numpy as np
import pyarrow as pa
import ray.data

from ..functions.hashing import MinHasher, simhash64, stable_hash64
from ..functions.textstats import word_ngrams

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def exact_dedup(
    ds: ray.data.Dataset, col: str, id_col: str,
    num_partitions: Optional[int] = None, strict: bool = False,
) -> ray.data.Dataset:
    """Keep one row per distinct ``col`` value — the row with min ``id_col``.

    Default path: groupby a 64-bit stable hash of the value and take
    ``Min(id)`` (the shuffle moves only (hash, id) pairs — not the payload),
    then a broadcast semi-join on the winner-id set brings back the winning
    rows.  For corpora whose winner set exceeds driver memory, pass
    ``num_partitions`` to use a hash shuffle join instead (size it to the
    cluster: the join spawns that many aggregator actors).  A blake2b-64
    collision would merge two distinct values (~n^2/2^65 odds — ~3e-2
    expected collisions at 10^12 rows); ``strict=True`` uses the
    value-rechecking group-scan path instead.
    """

    def add_hash(batch: pa.Table) -> pa.Table:
        vals = batch.column(col).to_pylist()
        h = pa.array([stable_hash64(v or "") for v in vals], pa.uint64())
        return batch.append_column("__h", h)

    hashed = ds.map_batches(add_hash, batch_format="pyarrow")

    if strict:
        def keep_first(group: pa.Table) -> pa.Table:
            if group.num_rows == 1:
                return group.drop_columns(["__h"])
            vals = group.column(col).to_pylist()
            ids = group.column(id_col).to_pylist()
            best: dict = {}
            for i, (v, rid) in enumerate(zip(vals, ids)):
                if v not in best or rid < ids[best[v]]:
                    best[v] = i
            keep = sorted(best.values())
            return group.take(pa.array(keep)).drop_columns(["__h"])

        return hashed.groupby("__h").map_groups(keep_first, batch_format="pyarrow")

    from ray.data.aggregate import Min

    winners = hashed.select_columns(["__h", id_col]).groupby("__h").aggregate(
        Min(id_col, alias_name="__keep")
    ).select_columns(["__keep"])

    if num_partitions is not None:
        kept = hashed.join(
            winners, join_type="inner", num_partitions=num_partitions,
            on=(id_col,), right_on=("__keep",),
        )
        return kept.drop_columns(["__h"])

    import ray as _ray

    winner_ids = frozenset(r["__keep"] for r in winners.take_all())
    ref = _ray.put(winner_ids)

    class Keep:
        def __init__(self, keys_ref):
            self.keys = _ray.get(keys_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pa.array([v in self.keys for v in batch.column(id_col).to_pylist()])
            return batch.filter(mask).drop_columns(["__h"])

    return hashed.map_batches(
        Keep, fn_constructor_kwargs=dict(keys_ref=ref),
        batch_format="pyarrow", concurrency=(1, 8),
    )


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------


class MinHashStage:
    """Actor stage: shingle -> MinHash signature -> LSH band keys.

    Permutation coefficients are built once per actor in ``__init__``.
    """

    def __init__(self, col: str, id_col: str, num_perm: int = 128,
                 num_bands: int = 16, ngram: int = 3, seed: int = 42):
        self.col, self.id_col = col, id_col
        self.hasher = MinHasher(num_perm=num_perm, seed=seed)
        self.num_bands = num_bands
        self.ngram = ngram

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        out_band, out_id, out_sig = [], [], []
        for rid, text in zip(ids, texts):
            shingles = word_ngrams(text or "", self.ngram)
            sig = self.hasher.signature(shingles)
            for key in self.hasher.band_keys(sig, self.num_bands):
                out_band.append(key)
                out_id.append(rid)
                out_sig.append(sig.tobytes())
        return pa.table(
            {"band_key": pa.array(out_band, pa.uint64()),
             self.id_col: pa.array(out_id),
             "sig": pa.array(out_sig, pa.binary())}
        )


def _bucket_dups(group: pa.Table, id_col: str, threshold: float,
                 max_bucket: int = 2048) -> pa.Table:
    """Within one LSH bucket: mark every non-min doc whose estimated Jaccard
    vs the bucket's current canonical doc >= threshold as a duplicate."""
    n = group.num_rows
    empty = pa.table({id_col: pa.array([], group.column(id_col).type)})
    if n < 2:
        return empty
    if n > max_bucket:
        group = group.slice(0, max_bucket)  # salt/cap degenerate buckets
        n = max_bucket
    ids = group.column(id_col).to_pylist()
    sigs = [np.frombuffer(b, dtype=np.uint64) for b in group.column("sig").to_pylist()]
    order = sorted(range(n), key=lambda i: ids[i])
    canon = [order[0]]
    dups = []
    for i in order[1:]:
        is_dup = False
        for c in canon:
            est = float(np.mean(sigs[i] == sigs[c]))
            if est >= threshold:
                is_dup = True
                break
        if is_dup:
            dups.append(ids[i])
        else:
            canon.append(i)
    if not dups:
        return empty
    return pa.table({id_col: pa.array(sorted(set(dups)), group.column(id_col).type)})


def minhash_dup_ids(
    ds: ray.data.Dataset, col: str, id_col: str,
    threshold: float = 0.8, num_perm: int = 128, num_bands: int = 16,
    ngram: int = 3, concurrency=(1, 8),
) -> ray.data.Dataset:
    """IDs judged near-duplicates (keep-first by min id within LSH buckets)."""
    sigs = ds.select_columns([id_col, col]).map_batches(
        MinHashStage,
        fn_constructor_kwargs=dict(col=col, id_col=id_col, num_perm=num_perm,
                                   num_bands=num_bands, ngram=ngram),
        batch_format="pyarrow", concurrency=concurrency,
    )
    dup = sigs.groupby("band_key").map_groups(
        lambda g: _bucket_dups(g, id_col, threshold), batch_format="pyarrow"
    )
    # a doc can be flagged in several bands -> distinct
    return dup.groupby(id_col).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


def minhash_dedup(
    ds: ray.data.Dataset, col: str, id_col: str, threshold: float = 0.8,
    **kwargs,
) -> ray.data.Dataset:
    """Filter near-duplicates out of ``ds`` (small dup-set broadcast path).

    The dup-id set is aggregate-small (duplicates, not corpus); it is
    collected once and shipped to the filter tasks via closure capture
    (``ray.put`` under the hood) — a broadcast semi-join, not a shuffle join.
    """
    dup_ids = set(
        r[id_col] for r in minhash_dup_ids(ds, col, id_col, threshold, **kwargs).take_all()
    )

    def keep(batch: pa.Table) -> pa.Table:
        mask = pa.array([v not in dup_ids for v in batch.column(id_col).to_pylist()])
        return batch.filter(mask)

    return ds.map_batches(keep, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# SimHash near-dup
# ---------------------------------------------------------------------------


class SimHashStage:
    """Actor stage: token -> 64-bit SimHash; emits one row per band.

    With ``num_bands`` equal-width bands, any pair within Hamming distance
    ``num_bands - 1`` is guaranteed to share >= 1 band (pigeonhole).  More
    bands -> higher recall but coarser buckets (band width 64/num_bands bits);
    size it to the target ``max_hamming``.
    """

    def __init__(self, col: str, id_col: str, ngram: int = 1, num_bands: int = 4):
        assert 64 % num_bands == 0, "num_bands must divide 64"
        self.col, self.id_col, self.ngram = col, id_col, ngram
        self.num_bands = num_bands
        self.width = 64 // num_bands

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.col).to_pylist()
        ids = batch.column(self.id_col).to_pylist()
        mask = (1 << self.width) - 1
        out_band, out_id, out_sig = [], [], []
        for rid, text in zip(ids, texts):
            toks = word_ngrams(text or "", self.ngram)
            sig = simhash64(toks)
            for t in range(self.num_bands):
                band = (sig >> (self.width * t)) & mask
                out_band.append((t << 56) | band)
                out_id.append(rid)
                out_sig.append(sig)
        return pa.table(
            {"band_key": pa.array(out_band, pa.uint64()),
             self.id_col: pa.array(out_id),
             "sig": pa.array(out_sig, pa.uint64())}
        )


def simhash_dup_ids(
    ds: ray.data.Dataset, col: str, id_col: str, max_hamming: int = 3,
    ngram: int = 1, num_bands: int = 4, concurrency=(1, 8),
) -> ray.data.Dataset:
    """IDs whose SimHash is within ``max_hamming`` of a smaller-id doc."""

    def bucket(group: pa.Table) -> pa.Table:
        n = group.num_rows
        empty = pa.table({id_col: pa.array([], group.column(id_col).type)})
        if n < 2:
            return empty
        ids = group.column(id_col).to_pylist()
        sigs = group.column("sig").to_pylist()
        order = sorted(range(min(n, 2048)), key=lambda i: ids[i])
        canon, dups = [order[0]], []
        for i in order[1:]:
            if any(bin(sigs[i] ^ sigs[c]).count("1") <= max_hamming for c in canon):
                dups.append(ids[i])
            else:
                canon.append(i)
        if not dups:
            return empty
        return pa.table({id_col: pa.array(sorted(set(dups)), group.column(id_col).type)})

    sigs = ds.select_columns([id_col, col]).map_batches(
        SimHashStage,
        fn_constructor_kwargs=dict(col=col, id_col=id_col, ngram=ngram,
                                   num_bands=num_bands),
        batch_format="pyarrow", concurrency=concurrency,
    )
    dup = sigs.groupby("band_key").map_groups(bucket, batch_format="pyarrow")
    return dup.groupby(id_col).map_groups(lambda g: g.slice(0, 1), batch_format="pyarrow")


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact verify inside LSH buckets)
# ---------------------------------------------------------------------------


def jaccard_dup_pairs(
    ds: ray.data.Dataset, col: str, id_col: str, threshold: float = 0.8,
    ngram: int = 3, num_perm: int = 128, num_bands: int = 16,
    concurrency=(1, 8),
) -> ray.data.Dataset:
    """Candidate pairs from MinHash LSH, verified with EXACT n-gram Jaccard.

    Returns (id_a, id_b, jaccard) with id_a < id_b.  Text is shipped with the
    band rows so verification happens inside the bucket (no second join).
    """

    class Stage(MinHashStage):
        def __call__(self, batch: pa.Table) -> pa.Table:
            out = super().__call__(batch)
            texts = batch.column(self.col).to_pylist()
            ids = batch.column(self.id_col).to_pylist()
            text_of = {i: (t or "") for i, t in zip(ids, texts)}
            col_txt = pa.array([text_of[i] for i in out.column(self.id_col).to_pylist()], pa.string())
            return out.append_column("__text", col_txt)

    def verify(group: pa.Table) -> pa.Table:
        n = min(group.num_rows, 512)
        ids = group.column(id_col).to_pylist()[:n]
        texts = group.column("__text").to_pylist()[:n]
        shingle_sets = [set(word_ngrams(t, ngram)) for t in texts]
        out_a, out_b, out_j = [], [], []
        for i in range(n):
            for j in range(i + 1, n):
                a, b = shingle_sets[i], shingle_sets[j]
                if not a and not b:
                    continue
                inter = len(a & b)
                jac = inter / (len(a) + len(b) - inter) if (a or b) else 1.0
                if jac >= threshold:
                    lo, hi = sorted((ids[i], ids[j]))
                    out_a.append(lo)
                    out_b.append(hi)
                    out_j.append(jac)
        return pa.table(
            {"id_a": pa.array(out_a, group.column(id_col).type),
             "id_b": pa.array(out_b, group.column(id_col).type),
             "jaccard": pa.array(out_j, pa.float64())}
        )

    sigs = ds.select_columns([id_col, col]).map_batches(
        Stage,
        fn_constructor_kwargs=dict(col=col, id_col=id_col, num_perm=num_perm,
                                   num_bands=num_bands, ngram=ngram),
        batch_format="pyarrow", concurrency=concurrency,
    )
    pairs = sigs.groupby("band_key").map_groups(verify, batch_format="pyarrow")
    # same pair can surface from several bands -> distinct on (id_a, id_b)
    return pairs.groupby(["id_a", "id_b"]).map_groups(
        lambda g: g.slice(0, 1), batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# connected components over dup pairs (cluster-level keep-first)
# ---------------------------------------------------------------------------


def dup_components(pairs: ray.data.Dataset, id_a: str = "id_a", id_b: str = "id_b"):
    """Union-find over a duplicate-pair edge list -> {id: component_root}.

    Bucket-level keep-first can split a transitive dup chain (A~B in one
    bucket, B~C in another); components merge them.  The edge list is
    dup-pairs-sized (<< corpus), so it is collected to the driver; for edge
    lists beyond driver memory, run iterative min-label propagation as a
    sequence of groupby rounds instead.
    Root = min id of the component (deterministic keep-first winner).
    """
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs.select_columns([id_a, id_b]).take_all():
        a, b = r[id_a], r[id_b]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            # root at the smaller id so the winner is deterministic
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo

    return {x: find(x) for x in parent}


def jaccard_component_dedup(
    ds: ray.data.Dataset, col: str, id_col: str, threshold: float = 0.8,
    **kwargs,
) -> ray.data.Dataset:
    """Near-dup removal with transitive closure: LSH candidates -> exact
    Jaccard verify -> connected components -> keep each component's min id."""
    pairs = jaccard_dup_pairs(ds, col, id_col, threshold=threshold, **kwargs)
    comp = dup_components(pairs)
    drop = frozenset(x for x, root in comp.items() if x != root)
    ref = ray.put(drop)

    class Keep:
        def __init__(self, keys_ref):
            self.drop = ray.get(keys_ref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            mask = pa.array([v not in self.drop for v in batch.column(id_col).to_pylist()])
            return batch.filter(mask)

    return ds.map_batches(Keep, fn_constructor_kwargs=dict(keys_ref=ref),
                          batch_format="pyarrow", concurrency=(1, 8))


# ---------------------------------------------------------------------------
# embedding near-dup (random-projection bucketing + exact cosine)
# ---------------------------------------------------------------------------


class SignBucketStage:
    """Random-hyperplane sign signature (per-actor fixed projection matrix)."""

    def __init__(self, emb_col: str, id_col: str, n_planes: int = 16,
                 dim: Optional[int] = None, seed: int = 42):
        self.emb_col, self.id_col = emb_col, id_col
        self.n_planes, self.seed = n_planes, seed
        self.planes = None  # lazily sized from the first batch

    def __call__(self, batch: pa.Table) -> pa.Table:
        embs = np.asarray(batch.column(self.emb_col).to_pylist(), dtype=np.float32)
        if self.planes is None:
            rng = np.random.RandomState(self.seed)
            self.planes = rng.standard_normal((embs.shape[1], self.n_planes)).astype(np.float32)
        signs = (embs @ self.planes) > 0  # (n, planes)
        keys = np.zeros(len(embs), dtype=np.uint64)
        for b in range(self.n_planes):
            keys |= signs[:, b].astype(np.uint64) << np.uint64(b)
        norms = np.linalg.norm(embs, axis=1)
        norms[norms == 0] = 1.0
        unit = embs / norms[:, None]
        return pa.table(
            {"bucket": pa.array(keys, pa.uint64()),
             self.id_col: batch.column(self.id_col),
             "unit": pa.array(list(unit), pa.list_(pa.float32()))}
        )


def embedding_dup_ids(
    ds: ray.data.Dataset, emb_col: str, id_col: str,
    threshold: float = 0.95, n_planes: int = 12, concurrency=(1, 8),
) -> ray.data.Dataset:
    """IDs whose embedding cosine vs a smaller-id doc in the same sign-bucket
    exceeds ``threshold``.  Recall is per-bucket (raise recall by lowering
    ``n_planes`` or running multiple plane seeds and unioning)."""

    def bucket(group: pa.Table) -> pa.Table:
        n = min(group.num_rows, 4096)
        empty = pa.table({id_col: pa.array([], group.column(id_col).type)})
        if n < 2:
            return empty
        ids = group.column(id_col).to_pylist()[:n]
        unit = np.asarray(group.column("unit").to_pylist()[:n], dtype=np.float32)
        order = np.argsort(np.asarray(ids, dtype=object), kind="stable")
        sims = unit @ unit.T
        canon: List[int] = []
        dups = []
        for i in order:
            if canon and np.max(sims[i, canon]) >= threshold:
                dups.append(ids[i])
            else:
                canon.append(i)
        if not dups:
            return empty
        return pa.table({id_col: pa.array(sorted(set(dups)), group.column(id_col).type)})

    sigs = ds.select_columns([id_col, emb_col]).map_batches(
        SignBucketStage,
        fn_constructor_kwargs=dict(emb_col=emb_col, id_col=id_col, n_planes=n_planes),
        batch_format="pyarrow", concurrency=concurrency,
    )
    return sigs.groupby("bucket").map_groups(bucket, batch_format="pyarrow")
