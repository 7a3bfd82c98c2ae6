"""Distributed covariance matrix (quantized co-moments), PCA last mile, and
per-key distribution drift (KL / chi-squared)."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.profile import drift_by_key
from insurance_pdf_extractor_ray.pipelines.similarity import (
    covariance_matrix, pca_top_component)

pytestmark = pytest.mark.usefixtures("ray_session")


def _emb_table(n=300, d=6, seed=5):
    rng = np.random.RandomState(seed)
    # correlated dims: dim1 = dim0 + noise, dim2 anti-correlated
    base = rng.randn(n).astype(np.float32)
    m = rng.randn(n, d).astype(np.float32) * 0.3
    m[:, 0] = base
    m[:, 1] = base + m[:, 1]
    m[:, 2] = -base + m[:, 2]
    return pa.table({"embedding": pa.array([r for r in m.tolist()],
                                           pa.list_(pa.float32()))}), m


class TestCovarianceMatrix:
    def test_close_to_np_cov_and_layout_independent(self):
        tbl, m = _emb_table()
        cov1 = covariance_matrix(ray.data.from_arrow(tbl).repartition(1))
        cov5 = covariance_matrix(ray.data.from_arrow(tbl).repartition(5))
        assert cov1.equals(cov5)  # quantized int sums commute
        want = np.cov(m.astype(np.float64), rowvar=False)
        got = np.zeros_like(want)
        i = np.array(cov1.column("i").to_pylist())
        j = np.array(cov1.column("j").to_pylist())
        c = np.array(cov1.column("cov").to_pylist())
        got[i, j] = c
        got[j, i] = c
        # quantization error: per-product |err| <= 0.5e-6, averaged over n
        assert np.abs(got - want).max() < 5e-6

    def test_signs_of_planted_correlations(self):
        tbl, _ = _emb_table()
        cov = covariance_matrix(ray.data.from_arrow(tbl))
        lk = {(r["i"], r["j"]): r["cov"] for r in cov.to_pylist()}
        assert lk[(0, 1)] > 0.5     # strongly correlated
        assert lk[(0, 2)] < -0.5    # anti-correlated
        assert lk[(0, 0)] > 0

    def test_pca_recovers_planted_direction(self):
        tbl, m = _emb_table(n=800)
        cov = covariance_matrix(ray.data.from_arrow(tbl).repartition(3))
        v = pca_top_component(cov, m.shape[1])
        w, vecs = np.linalg.eigh(np.cov(m.astype(np.float64), rowvar=False))
        top = vecs[:, -1]
        assert abs(abs(float(v @ top)) - 1.0) < 1e-6
        assert np.linalg.norm(v) == pytest.approx(1.0, abs=1e-9)


class TestDriftByKey:
    def test_uniform_key_has_zero_drift(self):
        # every key sees the exact global distribution -> KL = chi2 = 0
        keys, cats = [], []
        for k in ("a", "b"):
            for c, cnt in (("x", 6), ("y", 3), ("z", 1)):
                keys += [k] * cnt
                cats += [c] * cnt
        tbl = pa.table({"k": pa.array(keys), "c": pa.array(cats)})
        out = drift_by_key(ray.data.from_arrow(tbl).repartition(3), "k", "c")
        for r in out.to_pylist():
            assert r["kl_bits"] == pytest.approx(0.0, abs=1e-12)
            assert r["chi2"] == pytest.approx(0.0, abs=1e-12)

    def test_matches_duckdb_and_flags_skewed_key(self):
        rng = np.random.RandomState(9)
        n = 4000
        keys = rng.choice(["s0", "s1", "s2"], n).tolist()
        cats = rng.choice(["en", "de", "fr"], n, p=[.6, .3, .1]).tolist()
        # planted drifted key: only ever 'fr'
        keys += ["odd"] * 200
        cats += ["fr"] * 200
        tbl = pa.table({"source": pa.array(keys), "lang": pa.array(cats)})
        out = drift_by_key(ray.data.from_arrow(tbl).repartition(4),
                           "source", "lang")
        lk = {r["source"]: r for r in out.to_pylist()}
        assert lk["odd"]["kl_bits"] > max(
            lk[k]["kl_bits"] for k in ("s0", "s1", "s2")) + 1.0
        con = duckdb.connect()
        con.register("t", tbl)
        want = con.execute("""
            WITH c AS (SELECT source, lang, COUNT(*) AS n FROM t
                       GROUP BY 1, 2),
            g AS (SELECT lang, SUM(n) AS gn FROM c GROUP BY 1),
            tot AS (SELECT SUM(n) AS t FROM c),
            k AS (SELECT source, SUM(n) AS kn FROM c GROUP BY 1),
            grid AS (SELECT k.source, g.lang, k.kn, g.gn,
                            COALESCE(c.n, 0) AS n
                     FROM k CROSS JOIN g
                     LEFT JOIN c ON c.source = k.source AND c.lang = g.lang)
            SELECT grid.source, MAX(grid.kn) AS n,
              round(SUM(CASE WHEN grid.n > 0 THEN (grid.n*1.0/grid.kn)
                     * log2((grid.n*1.0/grid.kn) / (grid.gn*1.0/tot.t))
                     ELSE 0 END), 6) AS kl,
              round(SUM(pow(grid.n - grid.kn*grid.gn*1.0/tot.t, 2)
                        / (grid.kn*grid.gn*1.0/tot.t)), 6) AS chi2
            FROM grid, tot GROUP BY 1 ORDER BY 1
        """).fetchall()
        got = sorted(
            ((r["source"], r["n"],
              np.floor(r["kl_bits"] * 1e6 + 0.5) / 1e6,
              np.floor(r["chi2"] * 1e6 + 0.5) / 1e6)
             for r in out.to_pylist()))
        assert got == [tuple(r) for r in want]


class TestKsTwoSample:
    def _ks_brute(self, a, b):
        allv = np.sort(np.unique(np.concatenate([a, b])))
        f1 = np.searchsorted(np.sort(a), allv, side="right") / len(a)
        f2 = np.searchsorted(np.sort(b), allv, side="right") / len(b)
        return np.abs(f1 - f2).max()

    def _run(self, a, b, parts=5):
        from insurance_pdf_extractor_ray.pipelines.statagg import (
            ks_two_sample)

        tbl = pa.table({
            "g": pa.array(["a"] * len(a) + ["b"] * len(b)),
            "v": pa.array(np.concatenate([a, b]), pa.float64()),
        })
        out = ks_two_sample(ray.data.from_arrow(tbl).repartition(parts),
                            "v", "g", "a", "b")
        return out.column("ks_d")[0].as_py()

    def test_matches_brute_force(self):
        rng = np.random.RandomState(51)
        a, b = rng.randn(3000), rng.randn(2000) + 0.3
        assert self._run(a, b) == pytest.approx(self._ks_brute(a, b),
                                                abs=1e-12)

    def test_identical_distributions_near_zero(self):
        rng = np.random.RandomState(52)
        x = rng.randn(5000)
        d = self._run(x[:2500], x[2500:])
        assert d < 0.06  # same distribution: D ~ O(1/sqrt(n))

    def test_heavy_ties_across_blocks(self):
        # discrete values with huge tie groups that straddle block splits
        rng = np.random.RandomState(53)
        a = rng.choice([1.0, 2.0, 3.0], 4000, p=[.5, .3, .2])
        b = rng.choice([1.0, 2.0, 3.0], 3000, p=[.2, .3, .5])
        for parts in (1, 9):
            assert self._run(a, b, parts) == pytest.approx(
                self._ks_brute(a, b), abs=1e-12)

    def test_disjoint_supports_give_one(self):
        a = np.arange(100, dtype=np.float64)
        b = np.arange(1000, 1100, dtype=np.float64)
        assert self._run(a, b) == pytest.approx(1.0, abs=1e-12)


class TestChangepoint:
    def test_planted_level_shift_found(self):
        # synthesize events: 20 days at ~5/day then 20 days at ~50/day
        import __ray_entry__ as entry

        rows = []
        eid = 0
        for day in range(40):
            per = 5 if day < 20 else 50
            for j in range(per):
                rows.append((eid, (day * 86_400 + j * 60) * 1_000_000))
                eid += 1
        tbl = pa.table({
            "event_id": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows],
                           pa.timestamp("us")),
        })
        import os
        import tempfile

        import pyarrow.parquet as pq

        d = tempfile.mkdtemp(prefix="cp_test_")
        pq.write_table(tbl, os.path.join(d, "events.parquet"))
        out = entry._q_changepoint(d)
        assert out.column("change_day")[0].as_py() == 19  # last low day
