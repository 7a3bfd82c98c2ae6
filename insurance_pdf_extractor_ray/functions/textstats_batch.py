"""Batch-vectorized text analysis — the hot interior of TextAnalysisStage.

Each function computes EXACTLY the same values as its scalar counterpart in
``textstats`` (asserted by tests over adversarial inputs and real corpus
samples — the text_analysis golden parquet pins the outputs): tokenization
and counting run in polars (Rust, one pass per batch), the fingerprint's
window hashing runs as one global numpy pass over the batch's concatenated
bytes with doc-boundary masking.  Rows the vectorized path can't reproduce
bit-for-bit fall back to the scalar function:

  * non-ASCII rows for language ID (polars ``str.slice`` offsets differ from
    Python codepoint slicing only beyond ASCII),
  * short/degenerate rows for the fingerprint (<= window bytes, or the
    empty-selection stride fallback).
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np

from .textstats import (
    _FP_BASE,
    _STOPWORDS,
    detect_language,
    rolling_fingerprint,
)

_LANGS = sorted(_STOPWORDS)  # tie-break order of the scalar loop


def _pl_series(texts: Sequence[str]):
    import polars as pl

    return pl.Series([t or "" for t in texts], dtype=pl.String)


def token_counts_batch(texts: Sequence[str]):
    """(n_tokens_ws, n_tokens_bpe) int64 arrays — exact regex-count parity."""
    s = _pl_series(texts)
    ws = s.str.count_matches(r"\S+").to_numpy().astype(np.int64)
    bpe = s.str.count_matches(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]+").to_numpy().astype(np.int64)
    return ws, bpe


def quality_batch(texts: Sequence[str]):
    """Vectorized ``quality_scores`` columns (dict of float64 arrays).

    Integer counts come from polars; the ratio arithmetic mirrors the scalar
    function's expression order so the float results are bit-identical.
    """
    import polars as pl

    s = _pl_series(texts)
    n = len(texts)
    n_chars = s.str.len_chars().to_numpy().astype(np.int64)
    words = s.str.extract_all(r"\S+")
    n_words = words.list.len().to_numpy().astype(np.int64)
    wl_sum = (
        words.list.eval(pl.element().str.len_chars())
        .list.sum().fill_null(0).to_numpy().astype(np.int64)
    )
    max_wl = (
        words.list.eval(pl.element().str.len_chars())
        .list.max().fill_null(0).to_numpy().astype(np.int64)
    )
    alnum = s.str.count_matches(r"[A-Za-z0-9]").to_numpy().astype(np.int64)
    punct = s.str.count_matches(r"[^\w\s]").to_numpy().astype(np.int64)
    sw = sorted(_STOPWORDS["en"])
    stop_hits = (
        words.list.eval(pl.element().str.to_lowercase().is_in(sw))
        .list.sum().fill_null(0).to_numpy().astype(np.int64)
    )

    nz = n_words > 0
    mean_wl = np.zeros(n, dtype=np.float64)
    stop_ratio = np.zeros(n, dtype=np.float64)
    mean_wl[nz] = wl_sum[nz] / n_words[nz]
    stop_ratio[nz] = stop_hits[nz] / n_words[nz]
    denom = np.maximum(1, n_chars).astype(np.float64)
    alnum_ratio = np.where(nz, alnum / denom, 0.0)
    punct_ratio = np.where(nz, punct / denom, 0.0)

    quality = np.ones(n, dtype=np.float64)
    quality -= np.where((mean_wl >= 3) & (mean_wl <= 10), 0.0, 0.3)
    quality -= np.where(alnum_ratio < 0.6, 0.3, 0.0)
    quality -= np.where(punct_ratio > 0.2, 0.2, 0.0)
    quality -= np.where(stop_ratio < 0.01, 0.2, 0.0)
    quality = np.maximum(0.0, quality)
    quality[~nz] = 0.0

    return {
        "n_chars": n_chars.astype(np.float64),
        "n_words": n_words.astype(np.float64),
        "mean_word_len": mean_wl,
        "alnum_ratio": alnum_ratio,
        "punct_ratio": punct_ratio,
        "stopword_ratio": stop_ratio,
        "max_word_len": np.where(nz, max_wl, 0).astype(np.float64),
        "quality": quality,
    }


def detect_language_batch(texts: Sequence[str]) -> List[str]:
    """Vectorized language ID; non-ASCII rows use the scalar path (Python
    slices by codepoint; keeping them scalar preserves exact parity)."""
    import polars as pl

    s = _pl_series(texts)
    n = len(texts)
    non_ascii = s.str.count_matches(r"[^\x00-\x7F]").to_numpy() > 0
    head = s.str.slice(0, 4000)
    words = head.str.to_lowercase().str.extract_all(r"\S+")
    n_words = words.list.len().to_numpy().astype(np.int64)
    # one explode + one flat is_in per language, then segmented sums — much
    # cheaper than a per-row list.eval
    flat = words.explode().drop_nulls()  # empty docs explode to a null row
    starts = np.cumsum(n_words) - n_words
    nz = np.flatnonzero(n_words)
    hits = np.zeros((n, len(_LANGS)), dtype=np.int64)
    if len(nz):
        bounds = starts[nz]
        for j, lang in enumerate(_LANGS):
            ind = flat.is_in(sorted(_STOPWORDS[lang])).to_numpy().astype(np.int64)
            hits[nz, j] = np.add.reduceat(ind, bounds) if len(ind) else 0
    # scalar loop: keep first strictly-greater over sorted langs == argmax
    # with first-wins tie-break, 'unknown' when best hit count is 0 or under
    # the floor
    best_j = np.argmax(hits, axis=1)
    best_hits = hits[np.arange(n), best_j]
    floor = np.maximum(1, n_words // 50)
    out: List[str] = []
    for i in range(n):
        if non_ascii[i]:
            out.append(detect_language(texts[i] or ""))
        elif n_words[i] == 0 or best_hits[i] == 0 or best_hits[i] < floor[i]:
            out.append("unknown")
        else:
            out.append(_LANGS[best_j[i]])
    return out


def rolling_fingerprint_batch(texts: Sequence[str], window: int = 64) -> np.ndarray:
    """uint64 fingerprints; the polynomial window hashing runs as ONE numpy
    pass over the batch's concatenated bytes with doc-boundary masking.
    Docs with <= window bytes or an empty hash%16 selection (both rare on
    real text) take the scalar path — the output is bit-identical to
    per-doc ``rolling_fingerprint`` in all cases.
    """
    n = len(texts)
    out = np.zeros(n, dtype=np.uint64)
    encoded = [(t or "").encode("utf-8", "ignore") for t in texts]
    lens = np.fromiter((len(b) for b in encoded), dtype=np.int64, count=n)
    long_idx = np.flatnonzero(lens > window)
    short_idx = np.flatnonzero((lens > 0) & (lens <= window))
    for i in short_idx:
        out[i] = np.uint64(rolling_fingerprint(texts[i] or "", window))
    if len(long_idx) == 0:
        return out

    data = np.frombuffer(b"".join(encoded[i] for i in long_idx),
                         dtype=np.uint8).astype(np.uint64)
    ll = lens[long_idx]
    starts = np.cumsum(ll) - ll
    total = int(ll.sum())
    W = total - window + 1
    with np.errstate(over="ignore"):
        pows = np.empty(window, dtype=np.uint64)
        pows[0] = np.uint64(1)
        for i in range(1, window):
            pows[i] = pows[i - 1] * _FP_BASE
        hashes = np.zeros(W, dtype=np.uint64)
        for i in range(window):
            hashes += data[i : W + i] * pows[window - 1 - i]
        # windows fully inside one doc: position p belongs to doc d iff
        # starts[d] <= p <= starts[d] + len[d] - window
        did = np.repeat(np.arange(len(ll)), ll)[:W]
        valid = did == np.repeat(np.arange(len(ll)), ll)[window - 1 :]
        sel = valid & (hashes % np.uint64(16) == 0)
        contrib = np.where(sel, hashes, np.uint64(0))
        bounds = np.minimum(starts, W)  # doc window-range starts, clipped
        sums = np.add.reduceat(contrib, bounds)
        counts = np.add.reduceat(sel.astype(np.int64), bounds)
        # reduceat quirk: equal consecutive bounds return contrib[bound]
        seg_len = np.diff(np.append(bounds, W))
        sums[seg_len == 0] = 0
        counts[seg_len == 0] = 0
        mix = np.uint64(0x9E3779B97F4A7C15)
        fp = (sums ^ (ll.astype(np.uint64) * mix))
        fp[fp == np.uint64(0)] = np.uint64(1)
        out[long_idx] = fp
    # rows whose selection was empty fall back to the scalar stride path
    for k in np.flatnonzero(counts == 0):
        if seg_len[k] > 0 or ll[k] > 0:
            out[long_idx[k]] = np.uint64(
                rolling_fingerprint(texts[long_idx[k]] or "", window))
    return out
