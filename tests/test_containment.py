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
