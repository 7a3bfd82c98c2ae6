"""Inverted-index at-rest layout + pruned-read BM25 — the retrieval
counterpart of ``similarity.build_ivf_index``.

``tfidf.bm25_search`` re-streams the whole corpus per query: right when
queries are rare, wrong when the corpus is 100 TB and queries are many.  The
classic answer is an inverted index; in Ray Data terms it is just another
hash-bucketed at-rest layout (``bucketed.write_bucketed``):

  build  one map_batches pass emits exact posting rows (token, doc, tf, dl)
         — a document never spans batches, so per-batch (doc, token) counts
         ARE the global term frequencies: ZERO shuffles; postings land in
         ``path/_bucket=hash(token)%B/`` parquet dirs (resumable per bucket),
         corpus stats (n_docs, Σdl) in a sidecar manifest.
  query  read ONLY the buckets the query terms hash into — cost is
         O(postings of query terms), independent of corpus size — then the
         exact scoring tail of ``bm25_search`` (same idf/tf formula, same
         half-away 1e-6 rounding, same (score desc, id asc) order), so the
         two paths return identical tables.

The denormalized ``dl`` per posting (standard Lucene trick) is what removes
the corpus-sized doc-length join at query time.
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .bucketed import _bucket_of, layout_of, write_bucketed

_STATS_FILE = "_bm25_stats.json"


def build_inverted_index(
    ds: ray.data.Dataset,
    text_col: str,
    id_col: str,
    path: str,
    n_buckets: int = 64,
) -> str:
    """Write the inverted index for ``ds`` under ``path``; returns ``path``.

    Postings schema: ``(token, <id_col>, tf, dl)`` — lowercase ``[a-z0-9]+``
    tokens (the engine-wide rule), exact tf computed map-side.
    """

    def postings(batch: pa.Table) -> pa.Table:
        import polars as pl

        texts = pl.from_arrow(batch.column(text_col).cast(pa.large_string()))
        toks = texts.str.to_lowercase().str.extract_all(r"[a-z0-9]+")
        lens = toks.list.len().fill_null(0).to_numpy().astype(np.int64)
        flat = toks.explode().drop_nulls().to_arrow().cast(pa.string())
        rep = pa.array(np.repeat(np.arange(len(lens)), lens))
        t = pa.table({
            id_col: batch.column(id_col).take(rep),
            "token": flat,
            "dl": pa.array(np.repeat(lens, lens), pa.int64()),
        })
        g = t.group_by([id_col, "token"]).aggregate(
            [("dl", "max"), ([], "count_all")])
        return pa.table({
            "token": g.column("token"),
            id_col: g.column(id_col),
            "tf": g.column("count_all").cast(pa.int64()),
            "dl": g.column("dl_max"),
        })

    rows = ds.select_columns([id_col, text_col]).map_batches(
        postings, batch_format="pyarrow")
    write_bucketed(rows, path, "token", n_buckets)

    # corpus stats (identical computation to bm25_search's stats pass)
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    def doc_len(batch: pa.Table) -> pa.Table:
        import polars as pl

        texts = pl.from_arrow(batch.column(text_col).cast(pa.large_string()))
        dl = texts.str.to_lowercase().str.count_matches(r"[a-z0-9]+") \
                  .fill_null(0).to_numpy().astype(np.int64)
        return pa.table({"dl": pa.array(dl, pa.int64())})

    stats = (ds.select_columns([text_col])
             .map_batches(doc_len, batch_format="pyarrow")
             .aggregate(_Sum("dl", alias_name="sum_dl"),
                        _Count(alias_name="n_docs")))
    with open(os.path.join(path, _STATS_FILE), "w") as f:
        json.dump({"n_docs": int(stats["n_docs"]),
                   "sum_dl": int(stats["sum_dl"]),
                   "id_col": id_col}, f)
    return path


def bm25_search_indexed(
    path: str,
    query_terms: Sequence[str],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
) -> pa.Table:
    """BM25 top-``k`` over an index built by :func:`build_inverted_index` —
    bit-identical to ``tfidf.bm25_search`` on the same corpus, but reads only
    the query terms' bucket directories."""
    from ray.data.aggregate import Count as _Count
    from ray.data.aggregate import Sum as _Sum

    layout = layout_of(path)
    with open(os.path.join(path, _STATS_FILE)) as f:
        st = json.load(f)
    id_col = st["id_col"]
    n_docs = int(st["n_docs"])
    avgdl = float(st["sum_dl"]) / float(n_docs)

    query_terms = sorted({t.lower() for t in query_terms})
    qset = pa.array(query_terms, pa.string())
    buckets = sorted(set(
        _bucket_of(pa.chunked_array([qset]), layout["n_buckets"]).tolist()))
    import glob as _glob

    dirs = [os.path.join(path, f"_bucket={bkt}") for bkt in buckets]
    files = sorted(f for d in dirs
                   for f in _glob.glob(os.path.join(d, "*.parquet")))
    if not files:
        return pa.table({id_col: pa.array([], pa.int64()),
                         "score": pa.array([], pa.float64())})

    postings = ray.data.read_parquet(files,
                                     columns=["token", id_col, "tf", "dl"])
    tf = postings.map_batches(
        lambda t: t.filter(pc.is_in(t.column("token"), value_set=qset)),
        batch_format="pyarrow").materialize()  # query-vocabulary-bounded

    df = {r["token"]: r["df"] for r in
          tf.groupby("token").aggregate(_Count(alias_name="df")).take_all()}

    def score(batch: pa.Table) -> pa.Table:
        tfs = batch.column("tf").to_numpy(zero_copy_only=False).astype(np.float64)
        dls = batch.column("dl").to_numpy(zero_copy_only=False).astype(np.float64)
        dfs = np.fromiter((df[t] for t in batch.column("token").to_pylist()),
                          dtype=np.float64, count=batch.num_rows)
        idf = np.log((n_docs - dfs + 0.5) / (dfs + 0.5) + 1.0)
        s = idf * tfs * (k1 + 1.0) / (tfs + k1 * (1.0 - b + b * dls / avgdl))
        return pa.table({id_col: batch.column(id_col),
                         "score": pa.array(s, pa.float64())})

    def round6(batch: pa.Table) -> pa.Table:
        v = batch.column("score").to_numpy(zero_copy_only=False)
        r = np.where(v >= 0, np.floor(v * 1e6 + 0.5) / 1e6,
                     -np.floor(-v * 1e6 + 0.5) / 1e6)
        return pa.table({id_col: batch.column(id_col),
                         "score": pa.array(r, pa.float64())})

    per_doc = (tf.map_batches(score, batch_format="pyarrow")
               .groupby(id_col).aggregate(_Sum("score", alias_name="score"))
               .map_batches(round6, batch_format="pyarrow"))
    rows = per_doc.sort(["score", id_col],
                        descending=[True, False]).limit(k).take_all()
    return pa.table({
        id_col: pa.array([r[id_col] for r in rows], pa.int64()),
        "score": pa.array([r["score"] for r in rows], pa.float64()),
    })
