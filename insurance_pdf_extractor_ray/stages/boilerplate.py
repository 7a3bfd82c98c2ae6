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


def boilerplate_mask(texts) -> "object":
    """Vectorized :func:`is_boilerplate` over a pyarrow string array —
    returns a numpy bool mask, bit-identical to the scalar path.

    The per-span Python scorer dominated oversized-doc extraction (measured
    3.4 s of a 4.5 s / 50-doc profile at 1400 spans/doc).  Features are
    computed over the array's raw UTF-8 buffer with numpy byte kernels
    (Arrow's count_substring_regex is ~50x slower than the cumsum trick
    here): per-row alnum-char and word-run counts via one cumulative sum
    indexed at the offset boundaries.  Exactness contract: rows that are
    pure ASCII and contain no menu-separator char take the vector path,
    where every feature provably equals the Python definitions (byte
    length == code-point length, byte classes == re classes on ASCII);
    rows with non-ASCII bytes (Unicode \\s / \\d class differences) or any
    ``|``/``>`` (nav-segment scoring needs per-segment word counts) fall
    back to the scalar scorer row-by-row — rare in document text, always
    correct.  Only the two anchor patterns (page-number, copyright) stay
    RE2 kernels; both are cheap.
    """
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    from ..functions.bytekernels import row_sums, string_buffer

    data, lo, hi, t = string_buffer(texts)
    n = len(t)
    if n == 0:
        return np.zeros(0, bool)
    length = hi - lo

    alnum_b = ((data >= 48) & (data <= 57)) | \
              ((data >= 65) & (data <= 90)) | \
              ((data >= 97) & (data <= 122))
    ws_b = (data == 32) | ((data >= 9) & (data <= 13))
    non_ascii = row_sums(data >= 128, lo, hi) > 0
    has_sep = row_sums((data == 124) | (data == 62), lo, hi) > 0
    vec = ~non_ascii & ~has_sep

    alnum = row_sums(alnum_b, lo, hi)
    # word runs: alnum byte whose predecessor is not alnum; row starts are
    # forced run starts (the predecessor byte belongs to another row)
    run = alnum_b.copy()
    run[1:] &= ~alnum_b[:-1]
    inbounds = lo[length > 0]
    run[inbounds] = alnum_b[inbounds]
    n_words = row_sums(run, lo, hi)
    blank = row_sums(ws_b, lo, hi) == length  # zero-length rows are blank

    page = pc.match_substring_regex(
        t, r"(?i)^[\s\v]*page[\s\v]+[0-9]+([\s\v]+of[\s\v]+[0-9]+)?[\s\v]*$"
    ).to_numpy(zero_copy_only=False)
    cpy = pc.match_substring_regex(
        t, r"(?i)\(c\)[\s\v]*[0-9]{4}|copyright|all rights reserved"
    ).to_numpy(zero_copy_only=False)
    # the © alternative is non-ASCII — vector-path rows can never hit it

    # score >= 0.5 needs both 0.3 features (short AND low-density)
    both = (n_words <= 3) & (alnum * 2 < length)
    out = ~blank & (page | cpy | both)

    fb = np.flatnonzero(~vec)
    if len(fb):
        tl = t.take(pa.array(fb, pa.int64())).to_pylist()
        for j, s in zip(fb, tl):
            out[j] = is_boilerplate(s)
    return out
