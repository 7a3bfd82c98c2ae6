"""ngram_counts full-table / min-count paths and the Welch t-test
composition's integer-exact moment math."""

import math

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.tfidf import ngram_counts, vocab_counts

pytestmark = pytest.mark.usefixtures("ray_session")


def _docs():
    texts = [
        "new york new york city",
        "new york is a city",
        "san francisco bay",
        "san francisco city hall",
        "",
    ]
    return ray.data.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    }))


def test_ngram_counts_full_table_no_limit():
    out = {r["ngram"]: r["n"] for r in
           ngram_counts(_docs(), "text", "doc_id", n=2, k=None).take_all()}
    assert out["new york"] == 3
    assert out["san francisco"] == 2
    # window never crosses documents
    assert "city new" not in out
    assert "bay san" not in out
    # total windows = sum over docs of (tokens - 1)
    assert sum(out.values()) == (5 - 1) + (5 - 1) + (3 - 1) + (4 - 1)


def test_ngram_counts_min_count_floor():
    out = {r["ngram"]: r["n"] for r in
           ngram_counts(_docs(), "text", "doc_id", n=2, k=None,
                        min_count=2).take_all()}
    assert set(out) == {"new york", "san francisco"}


def test_vocab_counts_full_table():
    out = {r["token"]: r["n"] for r in
           vocab_counts(_docs(), "text", "doc_id", k=None).take_all()}
    assert out["new"] == 3 and out["york"] == 3 and out["city"] == 3
    assert len(out) > 5  # no top-k truncation


def test_welch_math_matches_direct_computation():
    """The quantized-moment closed form equals the textbook Welch statistic
    computed directly from the quantized samples."""
    rng = np.random.RandomState(7)
    a = np.floor(rng.uniform(1, 400, 300) * 1000 + 0.5) / 1000.0
    b = np.floor(rng.uniform(5, 300, 500) * 1000 + 0.5) / 1000.0

    def moments(x):
        q = np.floor(x * 1000.0 + 0.5).astype(np.int64)
        n = len(q)
        s, ss = int(q.sum()), int((q * q).sum())
        m = float(s) / n / 1000.0
        v = (float(ss) - float(s) * float(s) / n) / (n - 1) / 1000000.0
        return n, m, v

    n1, m1, v1 = moments(a)
    n2, m2, v2 = moments(b)
    se2 = v1 / n1 + v2 / n2
    t = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / ((v1 / n1) ** 2 / (n1 - 1) + (v2 / n2) ** 2 / (n2 - 1))

    assert m1 == pytest.approx(a.mean(), abs=1e-9)
    assert v1 == pytest.approx(a.var(ddof=1), rel=1e-9)
    tt = (a.mean() - b.mean()) / math.sqrt(a.var(ddof=1) / n1
                                           + b.var(ddof=1) / n2)
    assert t == pytest.approx(tt, rel=1e-9)
    assert df > min(n1, n2) - 1  # Welch df bounds
    assert df < n1 + n2 - 2 + 1e-9


def test_mannwhitney_pairwise_formulation():
    """The distinct-value U formulation equals the direct pairwise count
    2U = 2·#(x>y) + #(x==y), and the tie-corrected z matches the textbook
    closed form."""
    rng = np.random.RandomState(21)
    a = rng.randint(0, 40, 120)   # integer values force heavy ties
    b = rng.randint(5, 45, 200)

    # distinct-value formulation (engine math)
    vals = sorted(set(a) | set(b))
    tn1 = tn2 = u2 = tie = less2 = 0
    import collections
    ca, cb = collections.Counter(a), collections.Counter(b)
    for v in vals:
        n1, n2 = ca.get(v, 0), cb.get(v, 0)
        u2 += 2 * n1 * less2 + n1 * n2
        t = n1 + n2
        tie += t ** 3 - t
        tn1 += n1
        tn2 += n2
        less2 += n2

    direct = sum(2 * int(x > y) + int(x == y) for x in a for y in b)
    assert u2 == direct

    n, m = len(a), len(b)
    N = n + m
    mu = n * m / 2
    var = n * m / 12 * ((N + 1) - tie / (N * (N - 1)))
    z = (u2 / 2 - mu) / math.sqrt(var)
    # textbook check via rank sums (average ranks)
    allv = np.concatenate([a, b]).astype(float)
    order = np.argsort(allv, kind="mergesort")
    ranks = np.empty(N)
    i = 0
    sv = allv[order]
    while i < N:
        j = i
        while j < N and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + j + 1) / 2.0
        i = j
    r1 = ranks[:n].sum()
    u_rank = r1 - n * (n + 1) / 2
    assert u2 / 2 == pytest.approx(u_rank, abs=1e-9)
