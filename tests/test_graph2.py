"""k-core peeling, personalized PageRank, and stopword coverage."""

import duckdb
import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.graph import kcore, pagerank
from insurance_pdf_extractor_ray.pipelines.textpipe import stopword_coverage

pytestmark = pytest.mark.usefixtures("ray_session")


def _edges(pairs):
    return ray.data.from_arrow(pa.table({
        "u": pa.array([a for a, _ in pairs], pa.int64()),
        "v": pa.array([b for _, b in pairs], pa.int64()),
    })).repartition(2)


class TestKcore:
    def test_peels_pendant_chain(self):
        # triangle 0-1-2 plus chain 2-3-4: 2-core = the triangle
        e = _edges([(0, 1), (0, 2), (1, 2), (2, 3), (3, 4)])
        out = kcore(e, k=2, rounds=5)
        assert out.column("node").to_pylist() == [0, 1, 2]
        assert out.column("degree").to_pylist() == [2, 2, 2]

    def test_cascading_peel_needs_multiple_rounds(self):
        # chain 0-1-2-3-4: 2-core empty, but only after cascading rounds
        e = _edges([(0, 1), (1, 2), (2, 3), (3, 4)])
        out = kcore(e, k=2, rounds=8)
        assert out.num_rows == 0

    def test_extra_round_is_noop(self):
        rng = np.random.RandomState(5)
        pairs = {(int(a), int(b)) for a, b in
                 rng.randint(0, 40, (200, 2)) if a < b}
        e = list(pairs)
        # rounds >= node count guarantees the fixed point is reached (the
        # early-break makes the surplus rounds free); +1 must be a no-op
        a = kcore(_edges(e), k=3, rounds=40)
        b = kcore(_edges(e), k=3, rounds=41)
        assert a.equals(b)

    def test_k4_is_its_own_3core(self):
        e = _edges([(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3)])
        out = kcore(e, k=3, rounds=4)
        assert out.column("node").to_pylist() == [0, 1, 2, 3]


class TestPersonalizedPagerank:
    def _sym(self, pairs):
        src = [a for a, b in pairs] + [b for a, b in pairs]
        dst = [b for a, b in pairs] + [a for a, b in pairs]
        return ray.data.from_arrow(pa.table({
            "src": pa.array(src, pa.int64()),
            "dst": pa.array(dst, pa.int64()),
        }))

    def test_mass_concentrates_near_seed(self):
        # two disconnected triangles; seed in the first
        pairs = [(0, 1), (0, 2), (1, 2), (10, 11), (10, 12), (11, 12)]
        out = pagerank(self._sym(pairs), n_iter=5, restart=[0]).take_all()
        by = {r["id"]: r["rank"] for r in out}
        assert sum(by.values()) == pytest.approx(1.0, abs=1e-9)
        # the un-seeded component receives nothing
        assert by[10] == by[11] == by[12] == 0.0
        assert by[0] > by[1] > 0

    def test_uniform_restart_matches_plain_pagerank(self):
        pairs = [(0, 1), (1, 2), (0, 2), (2, 3)]
        ds = self._sym(pairs)
        plain = {r["id"]: r["rank"]
                 for r in pagerank(ds, n_iter=4).take_all()}
        allseed = {r["id"]: r["rank"]
                   for r in pagerank(ds, n_iter=4,
                                     restart=[0, 1, 2, 3]).take_all()}
        for k in plain:
            assert plain[k] == pytest.approx(allseed[k], abs=1e-12)


class TestStopwordCoverage:
    def test_counts_match_sql(self):
        tbl = pa.table({
            "doc_id": pa.array([0, 1, 2], pa.int64()),
            "text": pa.array([
                "the cat and the dog in the yard",
                "el perro y la casa de la ciudad",
                "12345 67890",
            ], pa.string()),
        })
        out = stopword_coverage(ray.data.from_arrow(tbl).repartition(2))
        by = {r["doc_id"]: r for r in out.take_all()}
        assert by[0]["sw_en"] == 5  # the x3, and, in
        assert by[0]["sw_es"] == 0
        assert by[1]["sw_es"] == 5  # el, y, la x2, de
        assert by[2]["sw_en"] == 0 and by[2]["n_tokens"] == 2

        con = duckdb.connect()
        con.register("documents", tbl)
        import __ray_entry__ as entry

        want = con.execute(entry._stopword_oracle()).fetchall()
        got = sorted((r["doc_id"], r["n_tokens"], r["sw_de"], r["sw_en"],
                      r["sw_es"], r["sw_fr"]) for r in out.take_all())
        assert got == [tuple(r) for r in want]
