"""End-to-end pretrain_prep composition: each gate eliminates its target."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data

from insurance_pdf_extractor_ray.pipelines.pretrain import pretrain_prep

pytestmark = pytest.mark.usefixtures("ray_session")

SHARED8 = "alpha beta gamma delta epsilon zeta eta theta"


def test_gates_compose():
    corpus = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array([
            "spam spam spam spam spam spam",                # gopher-fail
            f"leaky document containing {SHARED8} verbatim",  # contaminated
            "a fine unique document with plenty of words",  # survives
            "a fine unique document with plenty of words",  # dup of 3 -> drop
            "another fine survivor with its own words here",  # survives
        ], pa.string()),
    })
    ev = pa.table({
        "doc_id": pa.array([100], pa.int64()),
        "text": pa.array([f"eval prompt with {SHARED8} in it"], pa.string()),
    })
    out = pretrain_prep(ray.data.from_arrow(corpus).repartition(3),
                        "text", "doc_id",
                        eval_ds=ray.data.from_arrow(ev),
                        seq_len=8, bucket=2)
    rows = sorted((r["doc_id"], r["seq_id"], r["start_tok"], r["end_tok"])
                  for r in out.take_all())
    ids = {d for d, *_ in rows}
    assert ids == {3, 5}
    # doc 3: 8 ws-tokens at offset 0 -> seq 0 only (end==8 is exclusive);
    # doc 5: 8 tokens at 8..16 -> seqs 1
    assert rows == [(3, 0, 0, 8), (5, 1, 8, 16)]


def test_no_eval_side_skips_decontamination():
    corpus = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([f"doc one {SHARED8}", "doc two body"], pa.string()),
    })
    out = pretrain_prep(ray.data.from_arrow(corpus), "text", "doc_id",
                        seq_len=4, bucket=10)
    assert {r["doc_id"] for r in out.take_all()} == {1, 2}


def test_bpe_tokenizer_packs_fewer_tokens(ray_session):
    """v2 chain: BPE piece counts are <= char counts and the pack layout is
    contiguous (end_tok of doc i == start_tok of doc i+1 over survivors)."""
    import pyarrow as pa
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.pretrain import pretrain_prep

    import numpy as np

    rng = np.random.RandomState(31)
    vocab = [f"w{i}" for i in range(120)]

    def mk(seed_off):
        r = np.random.RandomState(31 + seed_off)
        return " ".join(r.choice(vocab, 160))

    texts = [mk(0), mk(1), mk(0), mk(2)]  # doc 2 = exact dup of doc 0
    docs = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                     "text": pa.array(texts, pa.string())})
    out = pretrain_prep(ray.data.from_arrow(docs).repartition(2),
                        "text", "doc_id", seq_len=64, bucket=10,
                        tokenizer="bpe", bpe_merges_n=6).take_all()
    assert out, "chain produced no sequences"
    ids = sorted({r["doc_id"] for r in out})
    assert 2 not in ids  # dup dropped, min-id winner kept
    spans = sorted({(r["doc_id"], r["start_tok"], r["end_tok"])
                    for r in out})
    for (d1, s1, e1), (d2, s2, e2) in zip(spans, spans[1:]):
        assert e1 == s2  # contiguous global token layout
    # piece budget sane: > 0 and less than the raw character count
    for d, s, e in spans:
        assert 0 < e - s < len(texts[d])


def test_gate_n_words_equals_ws_token_rule(ray_session):
    """pretrain_prep reuses gopher_repetition's n_words as the token count
    (skipping a second tokenize pass) — valid only while both implement the
    same \\S+ whitespace-run rule, pinned here including edge cases."""
    import pyarrow as pa
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.pretrain import count_ws_tokens
    from insurance_pdf_extractor_ray.pipelines.textpipe import (
        gopher_repetition)

    t = pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array(["", "   ", "a\t b\nc", None,
                          "one two  three", "x " * 500], pa.string()),
    })
    ds = ray.data.from_arrow(t)
    g = {r["doc_id"]: r["n_words"] for r in
         gopher_repetition(ds, "text", "doc_id", passthrough=True)
         .select_columns(["doc_id", "n_words"]).take_all()}
    c = {r["doc_id"]: r["n_tokens"] for r in
         count_ws_tokens(ds, "text", "doc_id").take_all()}
    assert g == c
