"""KNN similarity search vs numpy/duckdb oracle."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.similarity import knn_brute_force, knn_lsh

SF = "/root/testdata/sf0.001"
pytestmark = pytest.mark.usefixtures("ray_session")


def _queries(n=3, dim=None):
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    dim = len(t.column("embedding")[0])
    rng = np.random.RandomState(5)
    return rng.standard_normal((n, dim)).astype(np.float32)


def test_brute_force_matches_numpy_oracle():
    import pyarrow.parquet as pq

    t = pq.read_table(f"{SF}/embeddings.parquet")
    embs = np.asarray(t.column("embedding").to_pylist(), dtype=np.float64)
    ids = np.asarray(t.column("vec_id").to_pylist())
    q = _queries()
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    got = knn_brute_force(ds, q, k=5, concurrency=2, batch_size=128).to_pylist()

    qn = q.astype(np.float64) / np.linalg.norm(q, axis=1, keepdims=True)
    en = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    sims = qn @ en.T
    for qi in range(len(q)):
        order = sorted(range(len(ids)), key=lambda i: (-sims[qi, i], ids[i]))[:5]
        want = [(int(ids[i]), sims[qi, i]) for i in order]
        rows = [r for r in got if r["query_id"] == qi]
        assert [(r["vec_id"], pytest.approx(r["score"])) for r in rows] == [
            (w[0], pytest.approx(w[1])) for w in want
        ]


def test_ivf_recall_reasonable():
    from insurance_pdf_extractor_ray.pipelines.similarity import knn_ivf

    q = _queries(n=2)
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    exact = knn_brute_force(ds, q, k=10, concurrency=2).to_pylist()
    approx = knn_ivf(ds, q, k=10, n_clusters=16, n_probe=6, concurrency=2).to_pylist()
    for qi in range(2):
        e = {r["vec_id"] for r in exact if r["query_id"] == qi}
        a = {r["vec_id"] for r in approx if r["query_id"] == qi}
        assert len(e & a) >= 5  # recall@10 >= 0.5 with 6/16 probes


def test_ivf_full_probe_equals_brute():
    from insurance_pdf_extractor_ray.pipelines.similarity import knn_ivf

    q = _queries(n=2)
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    exact = knn_brute_force(ds, q, k=5, concurrency=2).to_pylist()
    full = knn_ivf(ds, q, k=5, n_clusters=8, n_probe=8, concurrency=2).to_pylist()
    assert [(r["query_id"], r["vec_id"]) for r in exact] == \
           [(r["query_id"], r["vec_id"]) for r in full]


def test_lsh_recall_reasonable():
    q = _queries(n=2)
    ds = ray.data.read_parquet(f"{SF}/embeddings.parquet")
    exact = knn_brute_force(ds, q, k=10, concurrency=2).to_pylist()
    approx = knn_lsh(ds, q, k=10, n_planes=6, max_mismatch=3, concurrency=2).to_pylist()
    for qi in range(2):
        e = {r["vec_id"] for r in exact if r["query_id"] == qi}
        a = {r["vec_id"] for r in approx if r["query_id"] == qi}
        assert len(e & a) >= 5  # recall@10 >= 0.5 with a generous prefilter


def test_ivf_index_matches_scan_path(ray_session, tmp_path):
    """build_ivf_index + knn_ivf_indexed reads only probe clusters yet
    returns exactly what the scan-and-filter knn_ivf returns."""
    import glob
    import os

    import numpy as np
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        build_ivf_index,
        knn_ivf,
        knn_ivf_indexed,
        train_centroids,
    )

    path = "/root/testdata/sf0.001/embeddings.parquet"
    ds = ray.data.read_parquet(path)
    centroids = train_centroids(ds, n_clusters=8, id_col="vec_id")
    import pyarrow.parquet as pq

    head = pq.read_table(path, columns=["vec_id", "embedding"])
    import pyarrow.compute as pc

    order = pc.sort_indices(head.column("vec_id"))[:3]
    queries = np.asarray(head.column("embedding").take(order).to_pylist(),
                         dtype=np.float64)

    scan = knn_ivf(ds, queries, centroids=centroids, k=5, n_probe=3)
    idx_dir = str(tmp_path / "ivf")
    build_ivf_index(ds, idx_dir, centroids)
    assert glob.glob(os.path.join(idx_dir, "cluster=*"))
    indexed = knn_ivf_indexed(idx_dir, queries, k=5, n_probe=3)

    def norm(t):
        return sorted(zip(t.column("query_id").to_pylist(),
                          t.column("vec_id").to_pylist(),
                          [round(s, 9) for s in t.column("score").to_pylist()]))
    assert norm(scan) == norm(indexed)
    # pruning is real: fewer cluster dirs than total
    assert len(glob.glob(os.path.join(idx_dir, "cluster=*"))) <= 8


def test_group_centroids_matches_duckdb():
    import duckdb

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        group_centroids,
    )

    rng = np.random.RandomState(23)
    n, d = 300, 8
    m = rng.randn(n, d)
    labels = rng.randint(0, 4, n)
    tbl = pa.table({
        "label": pa.array(labels, pa.int32()),
        "embedding": pa.array([list(map(float, row)) for row in m],
                              pa.list_(pa.float32())),
    })
    out = group_centroids(ray.data.from_arrow(tbl).repartition(5),
                          "embedding", "label")
    got = {(r["label"], r["dim"]): r["centroid"] for r in out.to_pylist()}
    con = duckdb.connect()
    con.register("emb", tbl)
    want = {(lab, i - 1): v for lab, i, v in con.execute("""
        SELECT label, i, AVG(e) FROM (
          SELECT label, unnest(embedding) AS e,
                 generate_subscripts(embedding, 1) AS i FROM emb)
        GROUP BY label, i""").fetchall()}
    assert set(got) == set(want)
    for key in got:
        assert got[key] == pytest.approx(want[key], abs=1e-9)


class TestQuantizeEmbeddings:
    def test_codes_match_duckdb_arithmetic(self, ray_session):
        import duckdb

        from insurance_pdf_extractor_ray.pipelines.similarity import (
            quantize_embeddings,
        )

        rng = np.random.default_rng(23)
        n, d = 300, 6
        m = rng.normal(0, 1, (n, d)).astype(np.float32)
        m[:, 3] = 7.5  # constant dim -> code 0
        t = pa.table({
            "vec_id": pa.array(np.arange(n), pa.int64()),
            "embedding": pa.array([row for row in m.tolist()],
                                  pa.list_(pa.float32())),
        })
        out, mn, mx = quantize_embeddings(
            ray.data.from_arrow(t).repartition(4))
        codes = {r["vec_id"]: list(r["codes"]) for r in out.take_all()}
        con = duckdb.connect()
        con.register("e", t)
        want = con.execute("""
            WITH x AS (
              SELECT e.vec_id, t.dim,
                     CAST(e.embedding[t.dim] AS DOUBLE) AS v
              FROM e, unnest(generate_series(1, len(e.embedding))) AS t(dim)
            ), s AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM x GROUP BY dim)
            SELECT x.vec_id, x.dim,
                   CASE WHEN s.mx > s.mn THEN CAST(round(
                     (x.v - s.mn) * 255.0 / (s.mx - s.mn)) AS BIGINT)
                   ELSE 0 END AS code
            FROM x JOIN s USING (dim)
        """).fetchall()
        for vid, dim, code in want:
            assert codes[vid][dim - 1] == code, (vid, dim)
        # calibration vectors + reconstruction bound (half a step)
        assert mn[3] == mx[3] == 7.5
        span = (mx - mn)
        span[span == 0] = 1.0
        for vid, row in list(codes.items())[:50]:
            rec = mn + np.array(row) * span / 255.0
            orig = m[vid].astype(np.float64)
            ok = np.abs(rec - orig) <= span / 255.0 * 0.5 + 1e-12
            ok[3] = abs(rec[3] - 7.5) < 1e-12
            assert ok.all()
