"""Unit vectors for jsonextract / confidence / cost / hashing + property tests.

Literal cases mirrored from the reference
(tests/test_services/test_gemini_service.py:46-66, pdf_processor.py:249-445).
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from insurance_pdf_extractor_ray.functions.confidence import (
    calculate_confidence_scores,
    extract_failed_fields,
)
from insurance_pdf_extractor_ray.functions.cost import (
    cost_breakdown,
    estimate_cost,
    estimate_cost_vec,
    resolve_model,
)
from insurance_pdf_extractor_ray.functions.hashing import (
    MinHasher,
    hamming_distance64,
    jaccard,
    simhash64,
    stable_hash64,
)
from insurance_pdf_extractor_ray.functions.jsonextract import (
    JsonExtractionError,
    extract_json_from_text,
    manual_kv_extraction,
)
from insurance_pdf_extractor_ray.functions.normalize import (
    clean_currency_string,
    clean_text_field,
    normalize_date,
)


class TestJsonExtract:
    def test_fenced_json_block(self):
        # test_gemini_service.py:46-55
        text = 'Here is the data:\n```json\n{"quote_number": "123456"}\n```\nDone.'
        assert extract_json_from_text(text) == {"quote_number": "123456"}

    def test_generic_code_block(self):
        assert extract_json_from_text('```\n{"a": "b"}\n```') == {"a": "b"}

    def test_json_keyword(self):
        assert extract_json_from_text('json {"k": "v"} trailing') == {"k": "v"}

    def test_bare_object(self):
        assert extract_json_from_text('noise {"x": 1} noise') == {"x": 1}

    def test_strategy_priority(self):
        # fenced block wins over an earlier bare object
        text = '{"bare": 1} then ```json\n{"fenced": 2}\n```'
        assert extract_json_from_text(text) == {"fenced": 2}

    def test_manual_fallback(self):
        # unbalanced braces defeat the regex strategies; KV scrape kicks in
        text = 'quote_number: "Q-9"\nstatus: ok'
        out = extract_json_from_text(text)
        assert out["quote_number"] == "Q-9"

    def test_garbage_raises(self):
        # test_gemini_service.py:57-66
        with pytest.raises(JsonExtractionError):
            extract_json_from_text("no structured data here at all")

    def test_manual_drops_null_and_empty(self):
        out = manual_kv_extraction('a: "x"\nb: null\nc: ""')
        assert "b" not in out and out["a"] == "x"


class TestConfidence:
    def test_reference_formula(self):
        # pdf_processor.py:403-445
        data = {"quote_number": "WC-123456", "taxes": "EMPTY VALUE", "x": "ab"}
        scores = calculate_confidence_scores(data, "contains WC-123456 here")
        assert scores["taxes"] == 0.0
        # .5 + .2(len>5) + .2(in text) + .1(bonus field) -> 1.0 clamped
        assert scores["quote_number"] == pytest.approx(1.0)
        # 'ab': .5 - .1(len<3), not in text -> 0.4
        assert scores["x"] == pytest.approx(0.4)

    def test_date_slash_bonus(self):
        s = calculate_confidence_scores({"policy_effective_date": "01/01/2024"}, "01/01/2024")
        assert s["policy_effective_date"] == pytest.approx(1.0)

    def test_failed_fields_scrape(self):
        # pdf_processor.py:387-401: only errors mentioning 'field', quoted names
        errors = ["validation failed for field 'quote_number' and field 'taxes'",
                  "unrelated message with 'name'"]
        assert extract_failed_fields(errors) == ["quote_number", "taxes"]
        assert extract_failed_fields(["no match here"]) == []


class TestCost:
    def test_exact_pricing(self):
        # pdf_processor.py:262-299: flash = $0.075/M in, $0.30/M out
        assert estimate_cost(1000, 1000, "gemini-1.5-flash") == pytest.approx(0.000375)
        assert estimate_cost(0, 0, "gemini-1.5-pro") == 0.0

    def test_partial_name_match_and_fallback(self):
        assert resolve_model("models/gemini-1.5-pro-latest") == "gemini-1.5-pro"
        assert resolve_model("unknown-model") == "gemini-1.5-flash"

    def test_breakdown(self):
        b = cost_breakdown(2000, 500, "gemini-1.5-flash")
        assert b["total_tokens"] == 2500
        assert b["total_cost"] == pytest.approx(b["input_cost"] + b["output_cost"])

    def test_vectorized_matches_scalar(self):
        inp = np.array([100, 2000, 0])
        out = np.array([50, 1000, 0])
        vec = estimate_cost_vec(inp, out, "gemini-2.5-pro")
        for i in range(3):
            assert vec[i] == pytest.approx(estimate_cost(int(inp[i]), int(out[i]), "gemini-2.5-pro"))


class TestHashing:
    def test_stable_hash_is_stable(self):
        assert stable_hash64("abc") == stable_hash64("abc")
        assert stable_hash64("abc") != stable_hash64("abd")

    def test_minhash_estimates_jaccard(self):
        mh = MinHasher(num_perm=256)
        a = [f"sh-{i}" for i in range(100)]
        b = a[:80] + [f"other-{i}" for i in range(20)]
        sig_a, sig_b = mh.signature(a), mh.signature(b)
        est = float(np.mean(sig_a == sig_b))
        true = jaccard(a, b)
        assert abs(est - true) < 0.12

    def test_minhash_band_keys_deterministic(self):
        mh = MinHasher(num_perm=128)
        sig = mh.signature(["x", "y"])
        assert mh.band_keys(sig, 16) == mh.band_keys(sig, 16)
        assert len(mh.band_keys(sig, 16)) == 16

    def test_simhash_similarity(self):
        toks = [f"w{i}" for i in range(200)]
        near = toks[:-2] + ["zz", "qq"]
        far = [f"v{i}" for i in range(200)]
        d_near = hamming_distance64(simhash64(toks), simhash64(near))
        d_far = hamming_distance64(simhash64(toks), simhash64(far))
        assert d_near < d_far
        assert simhash64([]) == 0


# ---------------------------------------------------------------------------
# property-based (hypothesis)
# ---------------------------------------------------------------------------

@settings(max_examples=200, deadline=None)
@given(st.text(max_size=40))
def test_normalize_date_idempotent(s):
    """Normalizing twice == normalizing once (reference passthrough contract)."""
    once = normalize_date(s)
    assert normalize_date(once) == once


@settings(max_examples=200, deadline=None)
@given(st.floats(min_value=0, max_value=10**9, allow_nan=False))
def test_currency_roundtrip(x):
    formatted = f"${x:,.2f}"
    parsed = clean_currency_string(formatted)
    assert parsed == pytest.approx(round(x, 2))


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_clean_text_idempotent_and_single_spaced(s):
    out = clean_text_field(s)
    assert clean_text_field(out) == out
    if isinstance(out, str) and out and out.upper() != "EMPTY VALUE":
        assert "  " not in out and not out.startswith(" ") and not out.endswith(" ")


class TestMinHashBatchForms:
    def test_signature_many_matches_single(self):
        from insurance_pdf_extractor_ray.functions.hashing import MinHasher

        mh = MinHasher(num_perm=64)
        docs = [["a b c", "b c d"], [], ["x y z"], ["a b c"] * 5]
        many = mh.signature_many(docs)
        for i, d in enumerate(docs):
            assert (many[i] == mh.signature(d)).all(), i

    def test_signature_many_chunking_invariant(self):
        from insurance_pdf_extractor_ray.functions.hashing import MinHasher

        mh = MinHasher(num_perm=32)
        docs = [[f"sh{i}{j}" for j in range(20)] for i in range(30)]
        a = mh.signature_many(docs)
        b = mh.signature_many(docs, max_chunk=16)  # force many chunks
        assert (a == b).all()

    def test_band_keys_many_bucket_semantics(self):
        import numpy as np

        from insurance_pdf_extractor_ray.functions.hashing import MinHasher

        mh = MinHasher(num_perm=32)
        sigs = mh.signature_many([["a", "b"], ["a", "b"], ["c", "d"]])
        keys = mh.band_keys_many(sigs, 8)
        assert keys.shape == (3, 8)
        assert (keys[0] == keys[1]).all()       # identical sigs share buckets
        assert not (keys[0] == keys[2]).all()   # different sigs mostly don't
        # distinct bands of one doc get distinct salts
        assert len(np.unique(keys[0])) > 1
