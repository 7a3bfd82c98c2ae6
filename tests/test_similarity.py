"""KNN similarity search vs numpy/duckdb oracle."""

import duckdb
import numpy as np
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
