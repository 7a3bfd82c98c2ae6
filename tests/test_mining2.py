"""Association lift, Kaplan-Meier survival, linear attribution, HITS."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.behavior import (
    association_lift,
    attribution_linear,
)
from insurance_pdf_extractor_ray.pipelines.graph import hits_bipartite
from insurance_pdf_extractor_ray.pipelines.statagg import kaplan_meier

from conftest import to_arrow

pytestmark = pytest.mark.usefixtures("ray_session")

_DAY = 86_400_000_000


def _ts(day_float):
    return int(day_float * _DAY)


class TestAssociationLift:
    def _baskets(self, rows):
        return ray.data.from_arrow(pa.table({
            "k": pa.array([k for k, _ in rows], pa.int64()),
            "i": pa.array([i for _, i in rows], pa.int64()),
        })).repartition(2)

    def test_hand_computed_lift(self):
        # baskets: {1,2}, {1,2}, {1,3}, {2,3}  -> N=4
        # c(1)=3 c(2)=3 c(3)=2; n(1,2)=2 n(1,3)=1 n(2,3)=1
        ds = self._baskets([(10, 1), (10, 2), (11, 1), (11, 2),
                            (12, 1), (12, 3), (13, 2), (13, 3)])
        out = to_arrow(association_lift(ds, "k", "i", min_support=1))
        got = {(r["item_a"], r["item_b"]): r for r in out.to_pylist()}
        assert got[(1, 2)]["n_ab"] == 2
        assert got[(1, 2)]["lift"] == pytest.approx(2 * 4 / (3 * 3))
        assert got[(1, 3)]["lift"] == pytest.approx(1 * 4 / (3 * 2))
        assert got[(2, 3)]["c_a"] == 3 and got[(2, 3)]["c_b"] == 2

    def test_min_support_and_duplicate_rows(self):
        # duplicate (basket, item) rows must dedup before counting
        ds = self._baskets([(1, 7), (1, 7), (1, 8), (2, 7), (2, 8)])
        out = to_arrow(association_lift(ds, "k", "i", min_support=2))
        assert out.to_pylist() == [{
            "item_a": 7, "item_b": 8, "n_ab": 2, "c_a": 2, "c_b": 2,
            "lift": pytest.approx(2 * 2 / (2 * 2))}]

    def test_min_lift_pct_integer_gate(self):
        ds = self._baskets([(10, 1), (10, 2), (11, 1), (11, 2),
                            (12, 1), (12, 3), (13, 2), (13, 3)])
        # lift(1,2)=8/9 < 1.0; lift(1,3)=lift(2,3)=4/6 < 1 — pct=100 drops all
        out = to_arrow(association_lift(ds, "k", "i", min_support=1,
                                        min_lift_pct=100))
        assert out is None or out.num_rows == 0
        # pct=80: keeps only (1,2) (0.888... >= 0.8; 4/6=0.666 dropped)
        out = to_arrow(association_lift(ds, "k", "i", min_support=1,
                                        min_lift_pct=80))
        assert [(r["item_a"], r["item_b"]) for r in out.to_pylist()] \
            == [(1, 2)]


class TestKaplanMeier:
    def _events(self, rows):
        return ray.data.from_arrow(pa.table({
            "u": pa.array([u for u, _ in rows], pa.int64()),
            "ts": pa.array([t for _, t in rows], pa.timestamp("us")),
        })).repartition(2)

    def test_textbook_curve(self):
        # corpus end = day 10.  horizon 1 day -> event iff last < day 9.
        # u1: days 0..2 (dur 2, event)   u2: days 0..5 (dur 5, event)
        # u3: days 0..5 (dur 5, event)   u4: days 3..9.5 (dur 6, censored)
        # u5: days 0..10 (dur 10, censored)
        ev = self._events([
            (1, _ts(0)), (1, _ts(2)),
            (2, _ts(0)), (2, _ts(5)),
            (3, _ts(0)), (3, _ts(5)),
            (4, _ts(3)), (4, _ts(9.5)),
            (5, _ts(0)), (5, _ts(10)),
        ])
        out = kaplan_meier(ev, "u", "ts", censor_horizon_us=_DAY)
        assert out.column("t").to_pylist() == [2, 5]
        assert out.column("events").to_pylist() == [1, 2]
        assert out.column("at_risk").to_pylist() == [5, 4]
        # S(2) = 1 - 1/5 = 0.8 ; S(5) = 0.8 * (1 - 2/4) = 0.4
        s = out.column("survival").to_pylist()
        assert s[0] == pytest.approx(0.8)
        assert s[1] == pytest.approx(0.4)
        # censored column: at t=5 only the two events had that duration
        assert out.column("censored").to_pylist() == [0, 0]

    def test_all_censored_gives_empty_curve(self):
        ev = self._events([(1, _ts(0)), (1, _ts(9.9)),
                           (2, _ts(1)), (2, _ts(10))])
        out = kaplan_meier(ev, "u", "ts", censor_horizon_us=_DAY)
        assert out.num_rows == 0


class TestAttributionLinear:
    def _events(self, rows):
        return ray.data.from_arrow(pa.table({
            "u": pa.array([r[0] for r in rows], pa.int64()),
            "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
            "typ": pa.array([r[2] for r in rows], pa.string()),
            "val": pa.array([r[3] for r in rows], pa.float64()),
        })).repartition(2)

    def _run(self, ds, window_days=7):
        return attribution_linear(
            ds, "u", "ts", "typ", "val",
            conversion_type="purchase", touch_types=["view", "click"],
            window_us=window_days * _DAY)

    def test_split_and_direct(self):
        ev = self._events([
            # user 1: 2 views + 1 click before a 90.0 purchase -> 60/30
            (1, _ts(0.1), "view", 0.0),
            (1, _ts(0.2), "view", 0.0),
            (1, _ts(0.3), "click", 0.0),
            (1, _ts(1.0), "purchase", 90.0),
            # user 2: no touches -> direct 50.0
            (2, _ts(1.0), "purchase", 50.0),
        ])
        out = {r["channel"]: r["credit_i"] for r in self._run(ev).to_pylist()}
        assert out == {"view": 60_000_000, "click": 30_000_000,
                       "direct": 50_000_000}

    def test_window_is_half_open_and_per_user(self):
        ev = self._events([
            # touch exactly at window edge (ts == p.ts - 7d) is EXCLUDED
            (1, _ts(0.0), "view", 0.0),
            (1, _ts(7.0), "purchase", 10.0),
            # same-timestamp touch (ts == p.ts) is INCLUDED
            (2, _ts(3.0), "click", 0.0),
            (2, _ts(3.0), "purchase", 20.0),
            # other users' touches never credit this purchase
            (3, _ts(2.9), "view", 0.0),
        ])
        out = {r["channel"]: r["credit_i"] for r in self._run(ev).to_pylist()}
        assert out == {"view": 0, "click": 20_000_000,
                       "direct": 10_000_000}

    def test_per_conversion_rounding_is_exact_int(self):
        # 10.0 split over 3 touches: floor(10*2/3*1e6+.5)=6666667 (view)
        # floor(10*1/3*1e6+.5)=3333333 (click) — sums preserved exactly
        ev = self._events([
            (1, _ts(0.1), "view", 0.0),
            (1, _ts(0.2), "view", 0.0),
            (1, _ts(0.3), "click", 0.0),
            (1, _ts(1.0), "purchase", 10.0),
        ])
        out = {r["channel"]: r["credit_i"] for r in self._run(ev).to_pylist()}
        assert out == {"view": 6_666_667, "click": 3_333_333, "direct": 0}


class TestHitsBipartite:
    def _edges(self, pairs):
        return ray.data.from_arrow(pa.table({
            "h": pa.array([a for a, _ in pairs], pa.int64()),
            "a": pa.array([b for _, b in pairs], pa.int64()),
        })).repartition(2)

    def test_two_round_integer_scores(self):
        # hubs {1,2}, auths {10,11,12}
        # 1 -> 10, 11 ; 2 -> 11, 12
        e = self._edges([(1, 10), (1, 11), (2, 11), (2, 12)])
        out = to_arrow(hits_bipartite(e, "h", "a", n_iter=2))
        got = {(r["side"], r["id"]): r["score"] for r in out.to_pylist()}
        # a1: 10->1, 11->2, 12->1 ; h1: 1->1+2=3, 2->2+1=3
        # a2: 10->3, 11->6, 12->3
        assert got[("hub", 1)] == 3 and got[("hub", 2)] == 3
        assert got[("auth", 10)] == 3
        assert got[("auth", 11)] == 6
        assert got[("auth", 12)] == 3

    def test_one_round_is_degree_count(self):
        e = self._edges([(1, 10), (1, 11), (2, 11)])
        out = to_arrow(hits_bipartite(e, "h", "a", n_iter=1))
        got = {(r["side"], r["id"]): r["score"] for r in out.to_pylist()}
        assert got[("auth", 11)] == 2 and got[("auth", 10)] == 1
        assert got[("hub", 1)] == 1 and got[("hub", 2)] == 1

    def test_empty_edges(self):
        e = ray.data.from_arrow(pa.table({
            "h": pa.array([], pa.int64()), "a": pa.array([], pa.int64())}))
        out = to_arrow(hits_bipartite(e, "h", "a"))
        assert out is None or out.num_rows == 0


class TestDbscanEmbeddings:
    def _ds(self):
        # 8-dim; cluster A in dims 0-3, cluster B in dims 4-7, tau=0.5:
        #   A: v0=[1,1,0,0] v1=[1,0,1,0] v2=[0,1,1,0] pairwise dot 1
        #      v3=[0.7,0,0,0] touches v0, v1 only
        #   B: same motif at ids 5,6,7 + border 8
        #   v4: orthogonal singleton -> noise
        z4 = [0.0] * 4
        vecs = {
            0: [1, 1, 0, 0] + z4, 1: [1, 0, 1, 0] + z4,
            2: [0, 1, 1, 0] + z4, 3: [0.7, 0, 0, 0] + z4,
            4: z4[:3] + [1.0] + [0.0, 0.0, 0.0, 0.0],
            5: z4 + [1, 1, 0, 0], 6: z4 + [1, 0, 1, 0],
            7: z4 + [0, 1, 1, 0], 8: z4 + [0.7, 0, 0, 0],
        }
        # v4 must be orthogonal to everything: put it on dim 3 (unused by A)
        vecs[4] = [0, 0, 0, 1] + z4
        ids = sorted(vecs)
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array([[float(x) for x in vecs[i]]
                                   for i in ids],
                                  pa.list_(pa.float32())),
        })).repartition(2)

    def test_core_border_noise_roles(self):
        from insurance_pdf_extractor_ray.pipelines.clustering import (
            dbscan_embeddings,
        )

        out = dbscan_embeddings(self._ds(), "embedding", "vec_id",
                                tau=0.5, min_pts=3)
        got = {r["id"]: (r["cluster"], r["role"]) for r in out.to_pylist()}
        assert got == {
            0: (0, "core"), 1: (0, "core"),
            2: (0, "border"), 3: (0, "border"),
            4: (-1, "noise"),
            5: (5, "core"), 6: (5, "core"),
            7: (5, "border"), 8: (5, "border"),
        }

    def test_distributed_components_path_identical(self):
        from insurance_pdf_extractor_ray.pipelines.clustering import (
            dbscan_embeddings,
        )

        a = dbscan_embeddings(self._ds(), "embedding", "vec_id",
                              tau=0.5, min_pts=3)
        b = dbscan_embeddings(self._ds(), "embedding", "vec_id",
                              tau=0.5, min_pts=3, distributed=True)
        assert a.equals(b)

    def test_min_pts_sweep_degenerates(self):
        from insurance_pdf_extractor_ray.pipelines.clustering import (
            dbscan_embeddings,
        )

        # min_pts above max degree -> everything noise
        out = dbscan_embeddings(self._ds(), "embedding", "vec_id",
                                tau=0.5, min_pts=10)
        assert set(r["role"] for r in out.to_pylist()) == {"noise"}


class TestLabelPropagation:
    def _ds(self):
        # two orthogonal cliques (dims 0-3 / 4-7), one seed each
        z4 = [0.0] * 4
        vecs = {
            0: [1, 1, 0, 0] + z4,            # seed, label 7
            1: [1, 0, 1, 0] + z4,            # -> 7 in round 1
            2: [0, 1, 1, 0] + z4,            # -> 7 in round 1
            3: [0, 0, 0, 1] + z4,            # isolated -> unlabeled
            5: z4 + [1, 1, 0, 0],            # seed, label 9
            6: z4 + [1, 0, 1, 0],            # -> 9
            7: z4 + [0.0, 0.7, 0.7, 0.0],    # touches 5 (0.7) and 6 (0.7)
        }
        ids = sorted(vecs)
        labels = {0: 7, 5: 9}
        return ray.data.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in vecs[i]] for i in ids],
                pa.list_(pa.float32())),
            "label": pa.array([labels.get(i, 0) for i in ids], pa.int64()),
        })).repartition(2)

    def test_propagates_from_seeds(self):
        from insurance_pdf_extractor_ray.pipelines.clustering import (
            label_propagation,
        )

        out = label_propagation(
            self._ds(), "embedding", "vec_id", "label",
            seed_pred=lambda ids: np.isin(ids, [0, 5]),
            tau=0.5, n_rounds=2)
        got = {r["id"]: (r["label"], r["role"]) for r in out.to_pylist()}
        assert got[0] == (7, "seed") and got[5] == (9, "seed")
        assert got[1] == (7, "propagated") and got[2] == (7, "propagated")
        assert got[6] == (9, "propagated") and got[7] == (9, "propagated")
        assert got[3] == (-1, "unlabeled")

    def test_majority_and_tie_break(self):
        from insurance_pdf_extractor_ray.pipelines.clustering import (
            label_propagation,
        )

        # node 10 neighbors: two seeds labeled 4, one seed labeled 2 -> 4;
        # node 11 neighbors: one seed 4, one seed 2 (tie) -> min label 2
        vecs = {
            0: [1, 0, 0, 0, 0, 0],   # seed 4
            1: [1, 0, 0, 0, 0, 0],   # seed 4
            2: [0, 1, 0, 0, 0, 0],   # seed 2
            10: [0.6, 0.6, 0, 0, 0, 0],   # dot: 0.6 w/ 0,1,2
            11: [0, 0, 0, 0.6, 0, 0],     # touches 12, 13 only
            12: [0, 0, 0, 1, 0, 0],       # seed 4
            13: [0, 0, 0, 1, 0, 0],       # seed 2
        }
        # make 12/13 distinct vectors so 11 ties between labels 4 and 2:
        vecs[12] = [0, 0, 0, 1, 0.1, 0]
        vecs[13] = [0, 0, 0, 1, 0, 0.1]
        ids = sorted(vecs)
        labels = {0: 4, 1: 4, 2: 2, 12: 4, 13: 2}
        ds = ray.data.from_arrow(pa.table({
            "vec_id": pa.array(ids, pa.int64()),
            "embedding": pa.array(
                [[float(x) for x in vecs[i]] for i in ids],
                pa.list_(pa.float32())),
            "label": pa.array([labels.get(i, 0) for i in ids], pa.int64()),
        })).repartition(2)
        out = label_propagation(
            ds, "embedding", "vec_id", "label",
            seed_pred=lambda v: np.isin(v, [0, 1, 2, 12, 13]),
            tau=0.5, n_rounds=1)
        got = {r["id"]: r["label"] for r in out.to_pylist()}
        assert got[10] == 4   # majority 2-vs-1
        assert got[11] == 2   # tie breaks to the smaller label


class TestDimLabelMi:
    def test_perfect_and_zero_signal_dims(self):
        from insurance_pdf_extractor_ray.pipelines.evalstats import (
            dim_label_mi,
        )

        # dim 0 = exact label sign (MI = ln 2 for balanced binary),
        # dim 1 = constant (MI = 0)
        n = 64
        lab = [i % 2 for i in range(n)]
        emb = [[1.0 if l else -1.0, 0.5] for l in lab]
        ds = ray.data.from_arrow(pa.table({
            "embedding": pa.array(emb, pa.list_(pa.float32())),
            "label": pa.array(lab, pa.int64()),
        })).repartition(3)
        out = dim_label_mi(ds, "embedding", "label")
        mi = out.column("mi").to_pylist()
        assert out.column("dim").to_pylist() == [0, 1]
        assert mi[0] == pytest.approx(np.log(2))
        assert mi[1] == pytest.approx(0.0, abs=1e-12)

    def test_partials_merge_across_blocks(self):
        from insurance_pdf_extractor_ray.pipelines.evalstats import (
            dim_label_mi,
        )

        rng = np.random.RandomState(3)
        emb = rng.randn(200, 4).astype(np.float32)
        lab = rng.randint(0, 3, 200)
        t = pa.table({
            "embedding": pa.array([list(map(float, r)) for r in emb],
                                  pa.list_(pa.float32())),
            "label": pa.array(lab, pa.int64()),
        })
        a = dim_label_mi(ray.data.from_arrow(t).repartition(1),
                         "embedding", "label")
        b = dim_label_mi(ray.data.from_arrow(t).repartition(7),
                         "embedding", "label")
        assert a.equals(b)
