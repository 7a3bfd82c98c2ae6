"""containment_pairs: planted near-superset detection + rarity cap."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.substrdedup import containment_pairs

pytestmark = pytest.mark.usefixtures("ray_session")

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta",
         "iota", "kappa", "lam", "mu", "nu", "xi", "omicron", "pi"]


def _doc(rng, n):
    return " ".join(rng.choice(WORDS, n))


def test_planted_superset_found_and_ratio_respected():
    rng = np.random.RandomState(3)
    base = _doc(rng, 40)
    texts = [base + " " + _doc(rng, 8),      # doc 0: superset of base
             base,                            # doc 1: the contained doc
             _doc(rng, 40),                   # unrelated
             _doc(rng, 40)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    rows = containment_pairs(ds, "text", "doc_id", k=3, rare_max=8,
                             ratio_num=3, ratio_den=4).take_all()
    got = {(r["id_a"], r["id_b"]) for r in rows}
    assert (0, 1) in got
    row = next(r for r in rows if (r["id_a"], r["id_b"]) == (0, 1))
    # doc 1's windows are all inside doc 0
    assert row["shared"] == row["min_windows"]


def test_rare_cap_excludes_boilerplate_windows():
    """A window occurring in MORE than rare_max docs must not generate
    pairs: 12 docs that share only one common sentence stay pair-free at
    rare_max=8."""
    rng = np.random.RandomState(5)
    common = "lorem ipsum dolor sit amet"
    texts = [common + " " + _doc(rng, 30) for _ in range(12)]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    rows = containment_pairs(ds, "text", "doc_id", k=3, rare_max=8,
                             ratio_num=1, ratio_den=4).take_all()
    # shared windows all have df=12 > rare_max -> no qualifying pairs
    assert rows == []


def test_matches_bruteforce_on_random_corpus():
    rng = np.random.RandomState(11)
    texts = [_doc(rng, rng.randint(10, 30)) for _ in range(60)]
    # plant two overlapping pairs
    texts[7] = texts[3] + " extra words here"
    texts[21] = " ".join(texts[9].split()[:12])
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    got = {(r["id_a"], r["id_b"]): (r["shared"], r["min_windows"])
           for r in containment_pairs(ds, "text", "doc_id", k=3,
                                      rare_max=8).take_all()}

    # brute force with window STRINGS
    def wins(t):
        ws = t.lower().split()
        return {" ".join(ws[i:i + 3]) for i in range(len(ws) - 2)}

    sets = [wins(t) for t in texts]
    df: dict = {}
    for s in sets:
        for w in s:
            df[w] = df.get(w, 0) + 1
    rare = [{w for w in s if df[w] <= 8} for s in sets]
    want = {}
    for i in range(len(texts)):
        for j in range(i + 1, len(texts)):
            shared = len({w for w in rare[i] if df[w] >= 2}
                         & {w for w in rare[j] if df[w] >= 2})
            mn = min(len(rare[i]), len(rare[j]))
            if shared * 4 >= mn and shared > 0:
                want[(i, j)] = (shared, mn)
    assert got == want


def test_set_similarity_pairs_matches_bruteforce():
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        set_similarity_pairs)

    rng = np.random.RandomState(3)
    words = ["w%d" % i for i in range(200)]

    def mk(n):
        return " ".join(rng.choice(words, n))

    texts = [mk(30) for _ in range(50)]
    texts[10] = texts[4] + " x1 x2"       # near-dup (J ~ 26/28)
    texts[20] = texts[7]                  # exact dup (J = 1)
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(50), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    rows = set_similarity_pairs(ds, "text", "doc_id", k=5,
                                tau_num=1, tau_den=2).take_all()
    got = sorted((r["id_a"], r["id_b"], r["shared"], r["union_size"])
                 for r in rows)

    def sh(t):
        ws = t.split()
        return {" ".join(ws[i:i + 5]) for i in range(len(ws) - 4)}

    S = [sh(t) for t in texts]
    want = sorted((i, j, len(S[i] & S[j]), len(S[i] | S[j]))
                  for i in range(50) for j in range(i + 1, 50)
                  if len(S[i] | S[j])
                  and 2 * len(S[i] & S[j]) >= len(S[i] | S[j]))
    assert got == want


def test_set_similarity_high_threshold_only_exact():
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        set_similarity_pairs)

    rng = np.random.RandomState(9)
    words = ["w%d" % i for i in range(200)]
    texts = [" ".join(rng.choice(words, 25)) for _ in range(20)]
    texts[5] = texts[2]                    # J = 1 pair
    texts[11] = texts[3] + " q1 q2 q3 q4 q5 q6 q7 q8"  # diluted, J < 0.9
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(20), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))
    rows = set_similarity_pairs(ds, "text", "doc_id", k=5,
                                tau_num=9, tau_den=10).take_all()
    assert {(r["id_a"], r["id_b"]) for r in rows} == {(2, 5)}
