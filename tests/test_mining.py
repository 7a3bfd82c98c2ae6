"""Hard-negative mining, nearest-centroid eval, span-corruption planning."""

import numpy as np
import pyarrow as pa
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.pretrain import span_corruption_stats
from insurance_pdf_extractor_ray.pipelines.similarity import (
    hard_negatives,
    nearest_centroid_confusion,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _vec_table():
    # two tight clusters around orthogonal axes + one planted traitor
    rng = np.random.RandomState(7)
    a = np.array([1.0, 0.0, 0.0])
    b = np.array([0.0, 1.0, 0.0])
    rows, labels = [], []
    for i in range(20):
        base = a if i % 2 == 0 else b
        rows.append(base + rng.standard_normal(3) * 0.05)
        labels.append(i % 2)
    # vec 20: labeled 0 but sitting in cluster 1
    rows.append(b + rng.standard_normal(3) * 0.01)
    labels.append(0)
    return pa.table({
        "vec_id": pa.array(range(21), pa.int64()),
        "embedding": pa.array([r.tolist() for r in rows],
                              pa.list_(pa.float64())),
        "label": pa.array(labels, pa.int32()),
    })


def test_hard_negatives_exclude_same_label_and_self():
    t = _vec_table()
    ds = ray.data.from_arrow(t)
    q = np.asarray(t.column("embedding").to_pylist())[:2]
    out = hard_negatives(ds, q, query_ids=[0, 1], query_labels=[0, 1],
                         k=4, concurrency=2, batch_size=5)
    labels = dict(zip(t.column("vec_id").to_pylist(),
                      t.column("label").to_pylist()))
    got = out.to_pylist()
    assert {r["query_id"] for r in got} == {0, 1}
    for r in got:
        assert r["vec_id"] != r["query_id"]
        assert labels[r["vec_id"]] != [0, 1][r["query_id"]]
    # anchor 0 (cluster a, label 0): its hardest negative must be the
    # traitor vec 20 (label 0 is excluded... 20 has label 0 so NOT eligible);
    # eligible negatives are label-1 vectors only
    q0 = [r["vec_id"] for r in got if r["query_id"] == 0]
    assert 20 not in q0  # label 0 == anchor label, masked
    assert all(labels[v] == 1 for v in q0)


def test_hard_negatives_match_numpy_oracle():
    t = _vec_table()
    ds = ray.data.from_arrow(t)
    embs = np.asarray(t.column("embedding").to_pylist())
    labels = np.asarray(t.column("label").to_pylist())
    q = embs[:3]
    out = hard_negatives(ds, q, query_ids=[0, 1, 2],
                         query_labels=labels[:3], k=3,
                         concurrency=2, batch_size=4).to_pylist()
    en = embs / np.linalg.norm(embs, axis=1, keepdims=True)
    sims = en[:3] @ en.T
    for qi in range(3):
        elig = [i for i in range(21)
                if labels[i] != labels[qi] and i != qi]
        want = sorted(elig, key=lambda i: (-sims[qi, i], i))[:3]
        got = [r["vec_id"] for r in out if r["query_id"] == qi]
        assert got == want


def test_nearest_centroid_confusion_diagonal_plus_traitor():
    ds = ray.data.from_arrow(_vec_table())
    out = nearest_centroid_confusion(ds, batch_size=6).to_pylist()
    cells = {(r["true_label"], r["pred_label"]): r["n"] for r in out}
    # 10 clean label-0 vectors stay diagonal; the traitor (true 0, sits in
    # cluster 1) lands off-diagonal; all label-1 vectors stay diagonal
    assert cells[(0, 0)] == 10
    assert cells[(0, 1)] == 1
    assert cells[(1, 1)] == 10
    assert (1, 0) not in cells
    assert sum(cells.values()) == 21


def test_nearest_centroid_batch_order_invariant():
    t = _vec_table()
    a = nearest_centroid_confusion(ray.data.from_arrow(t),
                                   batch_size=3).to_pylist()
    b = nearest_centroid_confusion(
        ray.data.from_arrow(t.take(pa.array(list(reversed(range(21)))))),
        batch_size=21).to_pylist()
    assert a == b


def test_span_corruption_formula():
    # n=10 tokens: noise=round(1.5)=2, spans=max(round(2/3),1)=1,
    # input=10-2+1+1=10, target=2+1+1=4, seqs(512)=1
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["t " * 9 + "t", "a b", "solo"], pa.string()),
        "source": pa.array(["s1", "s1", "s2"], pa.string()),
    })
    out = span_corruption_stats(
        ray.data.from_arrow(docs)).take_all()
    by = {r["source"]: r for r in out}
    # doc2: n=2, noise=clamp(round(0.3),1,1)=1, spans=1, input=2-1+1+1=3,
    # target=1+1+1=3
    assert by["s1"]["n_docs"] == 2
    assert by["s1"]["sum_input_tokens"] == 10 + 3
    assert by["s1"]["sum_target_tokens"] == 4 + 3
    assert by["s1"]["sum_spans"] == 2
    assert by["s1"]["seqs"] == 2
    # 'solo' has n=1 < 2 -> excluded entirely
    assert "s2" not in by


def test_span_corruption_long_doc_seq_split():
    docs = pa.table({
        "doc_id": pa.array([1], pa.int64()),
        "text": pa.array([("w " * 1200).strip()], pa.string()),
        "source": pa.array(["s"], pa.string()),
    })
    r = span_corruption_stats(ray.data.from_arrow(docs),
                              seq_len=512).take_all()[0]
    # n=1200, noise=180, spans=60, input=1200-180+60+1=1081 -> 3 seqs of 512
    assert r["sum_input_tokens"] == 1081
    assert r["seqs"] == 3


def test_source_overlap_matrix_planted():
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        source_overlap_matrix)

    docs = pa.table({
        "text": pa.array([
            "alpha beta gamma delta",       # A: windows abg, bgd
            "alpha beta gamma zeta",        # A: abg, bgz
            "alpha beta gamma eta",         # B: abg, bge -> shares abg w/ A
            "one two three four",           # C: ott, ttf -> no overlap
        ]),
        "src": pa.array(["A", "A", "B", "C"]),
    })
    out = source_overlap_matrix(ray.data.from_arrow(docs), "text", "src",
                                k=3).to_pylist()
    cells = {(r["src_a"], r["src_b"]): r["n_shared"] for r in out}
    # 'alpha beta gamma' is the single shared window, counted ONCE even
    # though two A docs contain it (distinct per source)
    assert cells == {("A", "B"): 1}


def test_source_overlap_matrix_group_cap():
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        source_overlap_matrix)

    docs = pa.table({
        "text": pa.array([f"w{i} x y z" for i in range(70)]),
        "src": pa.array([f"s{i}" for i in range(70)]),
    })
    with pytest.raises(ValueError):
        source_overlap_matrix(ray.data.from_arrow(docs), "text", "src", k=3)


def test_rfm_segments_tiers_and_composite():
    from datetime import datetime

    from insurance_pdf_extractor_ray.pipelines.behavior import rfm_segments

    # 5 users, one event each except u1 (3 events); values make monetary
    # order u1 > u2 > u3 > u4 > u5; timestamps make recency order u5 best
    rows = []
    for i, (u, day, val) in enumerate([
            (1, 1, 50.0), (1, 2, 30.0), (1, 3, 20.004),
            (2, 4, 90.0), (3, 5, 80.0), (4, 6, 70.0), (5, 7, 60.0)]):
        rows.append({"user_id": u,
                     "ts": datetime(2024, 1, day, 12, 0, 0),
                     "value": val})
    ds = ray.data.from_items(rows)
    out = {r["user_id"]: r for r in rfm_segments(ds, k=5).take_all()}
    assert len(out) == 5
    # recency: u5 last (day7) -> tier 1 ... u1 (day3) -> tier 5
    assert [out[u]["r_score"] for u in (5, 4, 3, 2, 1)] == [1, 2, 3, 4, 5]
    # frequency: u1 has 3 events -> tier 1; rest tie at 1 event,
    # user_id tiebreak ascending -> u2..u5 get tiers 2..5
    assert out[1]["f_score"] == 1
    assert [out[u]["f_score"] for u in (2, 3, 4, 5)] == [2, 3, 4, 5]
    # monetary: u1 100.00 (50+30+20.004 -> 10000 cents after half-round)
    assert out[1]["m_cents"] == 10000
    assert out[1]["m_score"] == 1
    assert out[5]["m_score"] == 5
    # composite
    assert out[1]["rfm"] == 5 * 100 + 1 * 10 + 1
    assert out[1]["recency_days"] == 4  # day3 noon -> day7 noon


def test_k_anonymity_stats_planted():
    from insurance_pdf_extractor_ray.pipelines.profile import k_anonymity_stats

    t = pa.table({
        "a": pa.array(["x"] * 6 + ["y"] * 2 + ["z"]),
        "b": pa.array(["p"] * 6 + ["q"] * 2 + ["r"]),
    })
    r = k_anonymity_stats(ray.data.from_arrow(t), ["a", "b"],
                          k=3).to_pylist()[0]
    # classes: (x,p)=6 safe, (y,q)=2 unsafe, (z,r)=1 unsafe
    assert r == {"n_rows": 9, "n_classes": 3, "n_unsafe_classes": 2,
                 "n_unsafe_rows": 3, "min_class_size": 1}


def test_knn_label_ndcg_perfect_and_zero():
    from insurance_pdf_extractor_ray.pipelines.similarity import knn_label_ndcg

    t = _vec_table()  # clusters: label 0 on x-axis, label 1 on y-axis
    ds = ray.data.from_arrow(t)
    embs = np.asarray(t.column("embedding").to_pylist())
    labels = np.asarray(t.column("label").to_pylist())
    counts = {0: int((labels == 0).sum()), 1: int((labels == 1).sum())}
    out = knn_label_ndcg(ds, embs[:2], [0, 1], labels[:2], counts,
                         k=3, batch_size=7).to_pylist()
    by = {r["query_id"]: r["ndcg"] for r in out}
    # anchor 1 (label 1): the traitor (label 0, planted in cluster 1)
    # sneaks into its top-3 at rank 3 -> rel pattern (1, 1, 0)
    dcg = 1.0 + 1.0 / np.log2(3)
    idcg = dcg + 1.0 / np.log2(4)
    assert by[1] == pytest.approx(dcg / idcg)
    # anchor 0 (label 0, clean x-axis cluster): top-3 all label 0 -> 1.0
    assert by[0] == pytest.approx(1.0)
    # orthogonal-cluster sanity: a query with NO same-label neighbor scores 0
    lone_counts = {0: counts[0], 1: counts[1], 9: 1}
    out2 = knn_label_ndcg(ds, embs[:1], [999], [9], lone_counts,
                          k=3).to_pylist()
    assert out2[0]["ndcg"] == 0.0


def test_padding_efficiency_buckets():
    from insurance_pdf_extractor_ray.pipelines.packing import padding_efficiency

    docs = pa.table({"text": pa.array([
        "a b c",                    # n=3  -> bucket 4, pad 1
        "a b c d",                  # n=4  -> bucket 4, pad 0
        "a b c d e",                # n=5  -> bucket 8, pad 3
        "",                         # n=0  -> excluded
        " ".join(["w"] * 600),      # n=600 -> clipped 512 -> bucket 512
    ])})
    out = padding_efficiency(ray.data.from_arrow(docs), bucket=4,
                             max_len=512).take_all()
    by = {r["bucket_len"]: r for r in out}
    assert by[4]["n_docs"] == 2 and by[4]["sum_padding"] == 1
    assert by[8]["n_docs"] == 1 and by[8]["sum_padding"] == 3
    assert by[512]["n_docs"] == 1 and by[512]["sum_padding"] == 0
    assert sum(r["n_docs"] for r in out) == 4


def test_grouped_row_number_spanning_blocks():
    from insurance_pdf_extractor_ray.pipelines.ordering import (
        grouped_row_number)

    # group 'a' has 7 rows, 'b' has 5 — small blocks force groups to span
    t = pa.table({
        "g": pa.array(["a"] * 7 + ["b"] * 5),
        "id": pa.array(list(range(7)) + list(range(100, 105)), pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(4)
    out = grouped_row_number(ds, ["g"], ["id"], out_col="rn",
                             total_col="n").take_all()
    by = {(r["g"], r["id"]): (r["rn"], r["n"]) for r in out}
    assert [by[("a", i)][0] for i in range(7)] == list(range(7))
    assert [by[("b", i)][0] for i in range(100, 105)] == list(range(5))
    assert all(by[("a", i)][1] == 7 for i in range(7))
    assert all(by[("b", i)][1] == 5 for i in range(100, 105))


def test_grouped_row_number_descending():
    from insurance_pdf_extractor_ray.pipelines.ordering import (
        grouped_row_number)

    t = pa.table({"g": pa.array(["x"] * 3),
                  "v": pa.array([10, 30, 20], pa.int64())})
    out = grouped_row_number(ray.data.from_arrow(t), ["g"], ["v"],
                             descending=[True], out_col="rn").take_all()
    assert {r["v"]: r["rn"] for r in out} == {30: 0, 20: 1, 10: 2}


def test_scalar_band_join_bucket_edges():
    from insurance_pdf_extractor_ray.pipelines.joins import scalar_band_join

    # quant=1: values ARE the quantized units; eps_q=1 -> |diff| <= 1
    t = pa.table({"id": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "v": pa.array([0.0, 1.0, 2.0, 5.0, -1.0], pa.float64())})
    ds = ray.data.from_arrow(t)
    got = sorted((r["id_a"], r["id_b"]) for r in
                 scalar_band_join(ds, ds, "v", "id", eps_q=1,
                                  quant=1.0).take_all())
    # pairs within 1: (0,1),(1,2),(0,-1) -> ids (1,2),(2,3),(1,5)
    assert got == [(1, 2), (1, 5), (2, 3)]


def test_scalar_band_join_cross_no_self_filter():
    from insurance_pdf_extractor_ray.pipelines.joins import scalar_band_join

    l = ray.data.from_arrow(pa.table({"id": pa.array([10], pa.int64()),
                                      "v": pa.array([3.0])}))
    r = ray.data.from_arrow(pa.table({"id": pa.array([1, 2], pa.int64()),
                                      "v": pa.array([3.0005, 4.0])}))
    got = sorted((x["id_a"], x["id_b"]) for x in
                 scalar_band_join(l, r, "v", "id", eps_q=1, quant=1000.0,
                                  self_pairs=True).take_all())
    # q(3.0)=3000, q(3.0005)=3001 (half-up) -> in band; q(4.0)=4000 -> out
    assert got == [(10, 1)]
