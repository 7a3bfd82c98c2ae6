"""Batch-vectorized text kernels must be BIT-IDENTICAL to the scalar
functions (the text_analysis golden parquet pins the outputs)."""

import numpy as np
import pytest

from insurance_pdf_extractor_ray.functions import textstats as ts
from insurance_pdf_extractor_ray.functions import textstats_batch as tb

CASES = [
    "",
    " ",
    "x",
    "the quick brown fox jumps over the lazy dog",
    "short",
    "a b c d e f g h i j",
    "word " * 500,                        # long, periodic
    "!!! ??? ... ;;; :::",
    "el la de que y en un una los las",   # Spanish stopwords
    "der die das und in den von zu mit",  # German
    "zz qq vv kk ww nn",
    "x" * 63,                             # <= fingerprint window
    "x" * 64,
    "x" * 65,
    "mixed 123 numbers and CamelCase plus under_scores",
    "line one\nline two\nline one\n",
    "café naïve résumé 你好世界 " * 10,  # non-ASCII + CJK
    "你好" * 300,                 # CJK-dominant
    "tab\tsep\tvalues\tand  double  spaces",
]


def test_token_counts_match():
    ws, bpe = tb.token_counts_batch(CASES)
    for i, t in enumerate(CASES):
        assert ws[i] == ts.whitespace_token_count(t), (i, t[:30])
        assert bpe[i] == ts.bpe_token_count(t), (i, t[:30])


def test_quality_match_bitwise():
    q = tb.quality_batch(CASES)
    for i, t in enumerate(CASES):
        ref = ts.quality_scores(t)
        for k in ("n_chars", "n_words", "mean_word_len", "alnum_ratio",
                  "punct_ratio", "stopword_ratio", "max_word_len", "quality"):
            assert q[k][i] == ref[k], (i, k, q[k][i], ref[k])


def test_language_match():
    langs = tb.detect_language_batch(CASES)
    for i, t in enumerate(CASES):
        assert langs[i] == ts.detect_language(t), (i, t[:30])


def test_fingerprint_match():
    fps = tb.rolling_fingerprint_batch(CASES)
    for i, t in enumerate(CASES):
        assert int(fps[i]) == ts.rolling_fingerprint(t), (i, t[:30])


def test_match_on_corpus_sample():
    import duckdb

    texts = [r[0] for r in duckdb.connect().execute(
        "SELECT text FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
        " LIMIT 200").fetchall()]
    ws, bpe = tb.token_counts_batch(texts)
    q = tb.quality_batch(texts)
    langs = tb.detect_language_batch(texts)
    fps = tb.rolling_fingerprint_batch(texts)
    for i, t in enumerate(texts):
        assert ws[i] == ts.whitespace_token_count(t)
        assert bpe[i] == ts.bpe_token_count(t)
        assert q["quality"][i] == ts.quality_scores(t)["quality"]
        assert langs[i] == ts.detect_language(t)
        assert int(fps[i]) == ts.rolling_fingerprint(t), i


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_fingerprint_fuzz(seed):
    rng = np.random.RandomState(seed)
    texts = []
    alphabet = "ab \n.!x0"
    for _ in range(60):
        n = int(rng.randint(0, 300))
        texts.append("".join(alphabet[j] for j in rng.randint(0, len(alphabet), n)))
    fps = tb.rolling_fingerprint_batch(texts)
    for i, t in enumerate(texts):
        assert int(fps[i]) == ts.rolling_fingerprint(t), (seed, i, t[:40])
