"""Boilerplate / main-content classification for spans.

The reference delegates layout understanding to an LLM; the north-star spec
replaces it with deterministic main-content extraction — boilerplate stripping
via text-density scoring in the style of public readability/boilerpipe
heuristics (Kohlschütter et al., "Boilerplate Detection using Shallow Text
Features", WSDM 2010): short, low-density, navigation/footer-shaped segments
are chrome; long, word-dense segments are content.

Pure functions, compiled patterns at import time; the extractor actor calls
:func:`is_boilerplate` per span.
"""

from __future__ import annotations

import re

_RE_PAGE_NO = re.compile(r"^\s*page\s+\d+(\s+of\s+\d+)?\s*$", re.IGNORECASE)
_RE_COPYRIGHT = re.compile(r"©|\(c\)\s*\d{4}|copyright|all rights reserved", re.IGNORECASE)
_RE_WORD = re.compile(r"[A-Za-z0-9]+")


def text_density(text: str) -> float:
    """Fraction of characters inside word tokens (content is word-dense)."""
    if not text:
        return 0.0
    word_chars = sum(len(m) for m in _RE_WORD.findall(text))
    return word_chars / len(text)


def nav_separator_score(text: str) -> int:
    """Count of menu-style separators ('|', '>', '•' between short segments)."""
    segments = re.split(r"\s*[|>]\s*", text)
    if len(segments) < 3:
        return 0
    short = sum(1 for s in segments if 0 < len(_RE_WORD.findall(s)) <= 3)
    return short if short >= 3 else 0


def boilerplate_score(text: str) -> float:
    """[0,1] score; >= 0.5 classified as boilerplate."""
    if not text or not text.strip():
        return 0.0
    if _RE_PAGE_NO.match(text):
        return 1.0
    if _RE_COPYRIGHT.search(text):
        return 1.0
    if nav_separator_score(text) >= 3:
        return 1.0
    # density/length shallow features: very short, low-density spans are chrome
    n_words = len(_RE_WORD.findall(text))
    score = 0.0
    if n_words <= 3:
        score += 0.3
    if text_density(text) < 0.5:
        score += 0.3
    return score


def is_boilerplate(text: str) -> bool:
    return boilerplate_score(text) >= 0.5
