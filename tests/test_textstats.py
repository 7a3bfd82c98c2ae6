"""Text analysis: unit vectors + Ray stage."""

import pytest

import ray.data

from insurance_pdf_extractor_ray.functions.textstats import (
    bpe_token_count,
    detect_language,
    quality_scores,
    rolling_fingerprint,
    whitespace_token_count,
    word_ngrams,
)
from insurance_pdf_extractor_ray.pipelines.textpipe import analyze_text

SF = "/root/testdata/sf0.001"


def test_token_counts():
    assert whitespace_token_count("a b  c") == 3
    assert whitespace_token_count("") == 0
    assert bpe_token_count("hello, world 42") == 4  # hello / , / world / 42
    assert bpe_token_count("") == 0


def test_detect_language():
    assert detect_language("the cat sat on the mat and it was good") == "en"
    assert detect_language("el perro y la casa en un dia") == "es"
    assert detect_language("der hund und die katze ist nicht da") == "de"
    assert detect_language("le chien et la maison est dans le jardin") == "fr"
    assert detect_language("你好世界这是一个测试文本") == "zh"
    assert detect_language("") == "unknown"
    assert detect_language("xyzzy plugh qwerty") == "unknown"


def test_quality_scores():
    q = quality_scores("The quick brown fox jumps over the lazy dog.")
    assert q["n_words"] == 9
    assert 3 <= q["mean_word_len"] <= 10
    assert q["quality"] >= 0.8
    junk = quality_scores("!!! ??? *** &&& %%%")
    assert junk["quality"] <= 0.3
    assert quality_scores("")["quality"] == 0.0


def test_fingerprint_stability():
    t = "some document text " * 20
    assert rolling_fingerprint(t) == rolling_fingerprint(t)
    assert rolling_fingerprint(t) != rolling_fingerprint(t + "x")
    assert rolling_fingerprint("") == 0
    assert rolling_fingerprint("short") != 0


def test_word_ngrams():
    assert word_ngrams("a b c d", 3) == ["a b c", "b c d"]
    assert word_ngrams("a b", 3) == ["a b"]
    assert word_ngrams("", 3) == []


@pytest.mark.usefixtures("ray_session")
def test_analyze_text_stage():
    ds = ray.data.read_parquet(f"{SF}/documents.parquet")
    out = analyze_text(ds, concurrency=2).take(5)
    for r in out:
        assert r["n_tokens_ws"] > 0
        assert r["n_tokens_bpe"] >= r["n_tokens_ws"]
        assert 0.0 <= r["quality"] <= 1.0
        assert isinstance(r["fingerprint"], int)
