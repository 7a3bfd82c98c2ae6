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


class TestQualityFilterPipeline:
    def test_rejects_junk_keeps_prose(self, ray_session):
        import pyarrow as pa
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.textpipe import quality_filter

        good = ("the policy provides coverage for the insured and it is "
                "subject to the terms that apply in this state for a year")
        junk_long_words = good.replace(" ", "")  # one giant word (-0.3 -0.2)
        junk_short_no_stop = "zz qq vv kk ww nn"  # mean_wl<3 AND no stopwords
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array([good, junk_long_words, junk_short_no_stop]),
        }))
        kept = sorted(r["doc_id"] for r in quality_filter(ds).take_all())
        assert kept == [1]

    def test_matches_scalar_rule(self, ray_session):
        import pyarrow as pa
        import ray.data

        from insurance_pdf_extractor_ray.functions.textstats import quality_scores
        from insurance_pdf_extractor_ray.pipelines.textpipe import quality_filter

        texts = ["the cat sat on the mat and it was good for this test",
                 "x", "", "!!! ??? ... ;;; :::",
                 "a b c d e f g h i j k l m n o p"]
        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts)}))
        kept = sorted(r["doc_id"] for r in quality_filter(ds, min_quality=0.6).take_all())
        want = sorted(i for i, t in enumerate(texts)
                      if quality_scores(t)["quality"] >= 0.6)
        assert kept == want


class TestRepetitionStats:
    def test_dup_line_ratio(self, ray_session):
        import pyarrow as pa
        import ray.data

        from insurance_pdf_extractor_ray.pipelines.textpipe import repetition_stats

        ds = ray.data.from_arrow(pa.table({
            "doc_id": pa.array([1, 2, 3], pa.int64()),
            "text": pa.array(["a\nb\nc", "x\nx\nx\ny", ""]),
        }))
        rows = {r["doc_id"]: r for r in repetition_stats(ds).take_all()}
        assert rows[1]["n_lines"] == 3 and rows[1]["dup_line_ratio"] == 0.0
        assert rows[2]["n_lines"] == 4 and rows[2]["n_distinct_lines"] == 2
        assert abs(rows[2]["dup_line_ratio"] - 0.5) < 1e-12
        assert rows[3]["n_lines"] == 1  # "" splits to one empty line
