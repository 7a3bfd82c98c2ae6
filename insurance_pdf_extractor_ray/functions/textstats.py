"""Text-analysis functions for large-scale corpus pipelines.

Beyond-the-reference operators required for a training-data engine:
language ID (n-gram/stopword heuristic), quality scoring, token counting
(whitespace + BPE-ish regex), and rolling-hash document fingerprinting.

All deterministic, stateless, vectorizable per batch.
"""

from __future__ import annotations

import re
from typing import Dict, List

import numpy as np

# BPE-ish token pattern (public GPT-2 style: word / number / punct runs)
_RE_BPE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+")
_RE_WS_TOKEN = re.compile(r"\S+")
_RE_ALNUM = re.compile(r"[A-Za-z0-9]")
_RE_PUNCT = re.compile(r"[^\w\s]")

# Tiny stopword tables per language for the heuristic language ID.
_STOPWORDS = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for", "was", "with", "on", "as", "this"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "los", "las", "es", "por", "con", "para", "del"},
    "fr": {"le", "la", "les", "de", "des", "et", "en", "un", "une", "est", "que", "pour", "dans", "qui", "au"},
    "de": {"der", "die", "das", "und", "in", "den", "von", "zu", "mit", "ist", "des", "ein", "eine", "nicht", "auf"},
}


def whitespace_token_count(text: str) -> int:
    """Number of whitespace-delimited tokens."""
    if not text:
        return 0
    return len(_RE_WS_TOKEN.findall(text))


def bpe_token_count(text: str) -> int:
    """Approximate subword token count via a GPT-2-style pretokenizer regex."""
    if not text:
        return 0
    return len(_RE_BPE.findall(text))


def detect_language(text: str) -> str:
    """Heuristic language ID: stopword hit-rate per language; CJK by codepoint.

    Returns an ISO-639-1 code or 'unknown'.  Deterministic tie-break by
    language code order.
    """
    if not text:
        return "unknown"
    # CJK detection by unicode block share.
    cjk = sum(1 for c in text[:2000] if "一" <= c <= "鿿")
    if cjk > 0.05 * min(len(text), 2000):
        return "zh"
    words = [w.lower() for w in _RE_WS_TOKEN.findall(text[:4000])]
    if not words:
        return "unknown"
    best_lang, best_hits = "unknown", 0
    for lang in sorted(_STOPWORDS):
        hits = sum(1 for w in words if w in _STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    if best_hits < max(1, len(words) // 50):
        return "unknown"
    return best_lang


def quality_scores(text: str) -> Dict[str, float]:
    """Document quality metrics (Gopher/C4-style cheap filters, public recipes).

    Returns: n_chars, n_words, mean_word_len, alnum_ratio, punct_ratio,
    stopword_ratio (English), max_word_len, and a combined [0,1] quality score.
    """
    n_chars = len(text)
    words = _RE_WS_TOKEN.findall(text)
    n_words = len(words)
    if n_words == 0:
        return {
            "n_chars": float(n_chars), "n_words": 0.0, "mean_word_len": 0.0,
            "alnum_ratio": 0.0, "punct_ratio": 0.0, "stopword_ratio": 0.0,
            "max_word_len": 0.0, "quality": 0.0,
        }
    word_lens = [len(w) for w in words]
    alnum = len(_RE_ALNUM.findall(text))
    punct = len(_RE_PUNCT.findall(text))
    sw = _STOPWORDS["en"]
    stop_hits = sum(1 for w in words if w.lower() in sw)
    mean_wl = sum(word_lens) / n_words
    alnum_ratio = alnum / max(1, n_chars)
    punct_ratio = punct / max(1, n_chars)
    stop_ratio = stop_hits / n_words
    # combined score: reward sane word lengths, alnum density, some stopwords
    quality = 1.0
    if not (3 <= mean_wl <= 10):
        quality -= 0.3
    if alnum_ratio < 0.6:
        quality -= 0.3
    if punct_ratio > 0.2:
        quality -= 0.2
    if stop_ratio < 0.01:
        quality -= 0.2
    return {
        "n_chars": float(n_chars), "n_words": float(n_words),
        "mean_word_len": mean_wl, "alnum_ratio": alnum_ratio,
        "punct_ratio": punct_ratio, "stopword_ratio": stop_ratio,
        "max_word_len": float(max(word_lens)), "quality": max(0.0, quality),
    }


_FP_BASE = np.uint64(1000003)
_FP_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def rolling_fingerprint(text: str, window: int = 64) -> int:
    """Rolling-hash (Karp-Rabin/winnowing-style) document fingerprint.

    Sum (mod 2^64) of polynomial window hashes sampled where
    ``hash % 16 == 0``, mixed with the byte length.  Sum (not XOR) so
    repeated windows in periodic text don't cancel; the length term makes
    small appends visible even when no new window is sampled.
    Returns an unsigned 64-bit int (0 only for empty text).
    """
    if not text:
        return 0
    data = np.frombuffer(text.encode("utf-8", "ignore"), dtype=np.uint8).astype(np.uint64)
    n = int(data.size)
    if n == 0:
        return 0
    mask = (1 << 64) - 1
    base = int(_FP_BASE)
    if n <= window:
        h = 0
        for b in data.tolist():
            h = (h * base + b) & mask
        sketch = h
    else:
        with np.errstate(over="ignore"):
            pows = np.empty(window, dtype=np.uint64)
            pows[0] = np.uint64(1)
            for i in range(1, window):
                pows[i] = (pows[i - 1] * _FP_BASE) & _FP_MASK
            hashes = np.zeros(n - window + 1, dtype=np.uint64)
            for i in range(window):
                hashes += data[i : n - window + 1 + i] * pows[window - 1 - i]
        selected = hashes[hashes % np.uint64(16) == 0]
        if selected.size == 0:
            selected = hashes[:: max(1, hashes.size // 8)]
        with np.errstate(over="ignore"):
            sketch = int(selected.sum(dtype=np.uint64))
    fp = (sketch ^ (n * 0x9E3779B97F4A7C15)) & mask
    return fp or 1


def word_ngrams(text: str, n: int = 3) -> List[str]:
    """Lowercased word n-grams (shingles)."""
    words = [w.lower() for w in _RE_WS_TOKEN.findall(text)]
    if len(words) < n:
        return [" ".join(words)] if words else []
    return [" ".join(words[i : i + n]) for i in range(len(words) - n + 1)]
