"""Text-analysis pipeline stages over a document table.

Language-ID, quality scoring, token counting, and fingerprinting as a single
vectorized ``map_batches`` stage (one pass over the text column), per the
large-scale training-data operator set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data




class TextAnalysisStage:
    """Stateful stage (compiled patterns live at module import; the actor
    keeps the configured option set)."""

    def __init__(self, text_col: str = "text", fingerprint: bool = True):
        self.text_col = text_col
        self.fingerprint = fingerprint

    def __call__(self, batch: pa.Table) -> pa.Table:
        # batch-vectorized kernels (polars/numpy; bit-identical to the
        # scalar functions — see functions/textstats_batch.py)
        from ..functions.textstats_batch import (
            detect_language_batch,
            quality_batch,
            rolling_fingerprint_batch,
            token_counts_batch,
        )

        texts = batch.column(self.text_col).to_pylist()
        langs = detect_language_batch(texts)
        ws, bpe = token_counts_batch(texts)
        q = quality_batch(texts)
        out = batch
        out = out.append_column("lang_pred", pa.array(langs, pa.string()))
        out = out.append_column("n_tokens_ws", pa.array(ws, pa.int64()))
        out = out.append_column("n_tokens_bpe", pa.array(bpe, pa.int64()))
        for k in ("n_words", "mean_word_len", "alnum_ratio", "punct_ratio",
                  "stopword_ratio", "quality"):
            out = out.append_column(k if k != "n_words" else "n_words_q",
                                    pa.array(q[k], pa.float64()))
        if self.fingerprint:
            out = out.append_column(
                "fingerprint",
                pa.array(rolling_fingerprint_batch(texts), pa.uint64()))
        return out


def analyze_text(
    ds: ray.data.Dataset, text_col: str = "text",
    fingerprint: bool = True, concurrency=(1, 8), batch_size: int = 1024,
) -> ray.data.Dataset:
    return ds.map_batches(
        TextAnalysisStage,
        fn_constructor_kwargs=dict(text_col=text_col, fingerprint=fingerprint),
        batch_format="pyarrow", batch_size=batch_size, concurrency=concurrency,
    )


def quality_filter(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id",
    min_quality: float = 0.6, batch_size: int = 1024,
) -> ray.data.Dataset:
    """Gopher/C4-style quality gate: keep docs whose combined quality score
    (``textstats.quality_scores``: mean-word-length band, alnum density,
    punctuation share, stopword floor) clears ``min_quality``.

    The rule is pure arithmetic over regexp counts, so the driver oracle
    re-derives it independently in SQL — this operator is semantically
    verified, not just determinism-pinned."""
    from ..functions.textstats_batch import quality_batch

    def gate(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        keep = quality_batch(texts)["quality"] >= min_quality
        return pa.table({id_col: batch.column(id_col).filter(pa.array(keep))})

    return ds.select_columns([id_col, text_col]).map_batches(
        gate, batch_format="pyarrow", batch_size=batch_size,
    )


def repetition_stats(
    ds: ray.data.Dataset, text_col: str = "text", id_col: str = "doc_id",
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """Per-doc line-repetition metrics (the Gopher repetition filter family):
    (id, n_lines, n_distinct_lines, dup_line_ratio).  Boilerplate-heavy and
    templated crawl docs show high duplicate-line fractions."""

    def stats(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        n_lines, n_distinct = [], []
        for t in texts:
            lines = (t or "").split("\n")
            n_lines.append(len(lines))
            n_distinct.append(len(set(lines)))
        nl = np.asarray(n_lines, dtype=np.int64)
        nd = np.asarray(n_distinct, dtype=np.int64)
        ratio = 1.0 - nd / np.maximum(1, nl)
        return pa.table({
            id_col: batch.column(id_col),
            "n_lines": pa.array(nl, pa.int64()),
            "n_distinct_lines": pa.array(nd, pa.int64()),
            "dup_line_ratio": pa.array(ratio, pa.float64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        stats, batch_format="pyarrow", batch_size=batch_size,
    )


def gopher_repetition(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_dup_unigrams: float = 0.80,
    max_top_bigram: float = 0.20,
    max_top_trigram: float = 0.18,
    passthrough: bool = False,
) -> ray.data.Dataset:
    """Per-document repetition quality signals in the style of Gopher's
    repetition-removal rules (Rae et al. 2021, Table A1): fraction of
    duplicated unigrams, and the word-fraction of the single most frequent
    bigram / trigram; ``keep`` applies the thresholds.  A crawl page that is
    one navigation menu repeated forty times passes length/stopword gates
    but fails these.

    Pure per-row signals ⇒ a single vectorized ``map_batches`` pass, zero
    shuffles at any corpus size.  ``passthrough=True`` appends the signal
    columns to the INPUT batch (all original columns retained) so the gate
    composes into filter pipelines without a join back.  The interior reuses the substring-dedup
    tokenizer + rolling window hashes (`substrdedup._batch_windows/_roll`):
    per-doc n-gram multiplicities come from one lexsort over (doc, hash)
    run-lengths — no Python over rows, no per-doc dictionaries.
    """
    from .substrdedup import _batch_windows, _roll

    def _top_run_per_doc(word_hash: np.ndarray, counts: np.ndarray,
                         n: int, ndocs: int) -> np.ndarray:
        """max multiplicity of any n-gram within each doc (0 if < n words)."""
        wh, wd, _ = _roll(word_hash, counts, n)
        top = np.zeros(ndocs, dtype=np.int64)
        if len(wh) == 0:
            return top
        order = np.lexsort((wh, wd))
        ws, ds_ = wh[order], wd[order]
        first = np.ones(len(ws), dtype=bool)
        first[1:] = (ws[1:] != ws[:-1]) | (ds_[1:] != ds_[:-1])
        starts = np.flatnonzero(first)
        runs = np.diff(np.append(starts, len(ws)))
        np.maximum.at(top, ds_[starts], runs)
        return top

    def signals(batch: pa.Table) -> pa.Table:
        counts, _, word_hash = _batch_windows(
            batch.column(text_col).to_pylist())
        ndocs = len(counts)
        # distinct unigrams per doc: count of run STARTS per doc
        wh, wd, _ = _roll(word_hash, counts, 1)
        if len(wh):
            order = np.lexsort((wh, wd))
            ws, ds_ = wh[order], wd[order]
            first = np.ones(len(ws), dtype=bool)
            first[1:] = (ws[1:] != ws[:-1]) | (ds_[1:] != ds_[:-1])
            distinct = np.bincount(ds_[first], minlength=ndocs).astype(np.int64)
        else:
            distinct = np.zeros(ndocs, np.int64)
        # a gram occurring once is not repetition: only multiplicity >= 2
        # counts toward the top-gram fraction (else every 11-word sentence
        # would "contain" a 3/11 trigram)
        top2 = _top_run_per_doc(word_hash, counts, 2, ndocs)
        top3 = _top_run_per_doc(word_hash, counts, 3, ndocs)
        top2 = np.where(top2 >= 2, top2, 0)
        top3 = np.where(top3 >= 2, top3, 0)

        nw = counts.astype(np.float64)
        safe = np.where(counts > 0, nw, 1.0)
        f_dup = np.where(counts > 0, 1.0 - distinct / safe, 0.0)
        f_b = np.where(counts >= 2, top2 * 2.0 / safe, 0.0)
        f_t = np.where(counts >= 3, top3 * 3.0 / safe, 0.0)

        def r6(v):
            return np.floor(v * 1e6 + 0.5) / 1e6  # non-negative, half-up

        f_dup, f_b, f_t = r6(f_dup), r6(f_b), r6(f_t)
        keep = ((f_dup <= max_dup_unigrams) & (f_b <= max_top_bigram)
                & (f_t <= max_top_trigram))
        cols = ({c: batch.column(c) for c in batch.column_names}
                if passthrough else {id_col: batch.column(id_col)})
        cols.update({
            "n_words": pa.array(counts, pa.int64()),
            "frac_dup_unigrams": pa.array(f_dup, pa.float64()),
            "frac_top_bigram": pa.array(f_b, pa.float64()),
            "frac_top_trigram": pa.array(f_t, pa.float64()),
            "keep": pa.array(keep, pa.bool_()),
        })
        return pa.table(cols)

    src = ds if passthrough else ds.select_columns([id_col, text_col])
    return src.map_batches(signals, batch_format="pyarrow")


def nfc_normalize(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    out_col: str = "text_nfc",
) -> ray.data.Dataset:
    """Unicode NFC normalization of a text column — the crawl-cleaning step
    that collapses combining-mark sequences (e + U+0301 -> é) so that
    hashing, dedup and tokenization see one canonical form.  Zero shuffles;
    ``changed`` marks rows the normalization actually altered (cheap audit
    of how dirty a crawl slice is).  DuckDB ``nfc_normalize`` is the oracle
    twin.

    Kernel note: pyarrow's ``utf8_normalize`` is a silent no-op in builds
    without ICU normalization (verified on 16.1 here), so the kernel is
    stdlib ``unicodedata.normalize`` (one C call per string) gated by an
    ``str.isascii()`` fast path — ASCII rows (the vast majority of a crawl
    batch) never enter the normalize call."""
    import unicodedata

    def norm(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        out = [t if t is None or t.isascii()
               else unicodedata.normalize("NFC", t) for t in texts]
        changed = [a is not b and a != b for a, b in zip(out, texts)]
        return pa.table({
            id_col: batch.column(id_col),
            out_col: pa.array(out, pa.string()),
            "changed": pa.array(changed, pa.bool_()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        norm, batch_format="pyarrow")


def readability(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Flesch-reading-ease-style readability signal per document — a cheap
    fluency/quality gate for crawl filtering (alongside the Gopher gates):
    pages of keyword-stuffed fragments or run-on machine text score far
    outside the human band.

    Definitions (chosen to be regex-derivable so the SQL oracle re-derives
    them EXACTLY):

    * words      = matches of ``[a-z0-9]+`` over ``lower(text)``
    * sentences  = matches of ``[.!?]+`` (clamped to ≥ 1)
    * syllables  = matches of ``[aeiouy]+`` over ``lower(text)`` (vowel
      groups only occur inside word tokens, so this equals the per-word
      vowel-group sum; no min-1-per-word correction — documented deviation
      from classic Flesch)
    * ``fre = 206.835 - 1.015·(W/S) - 84.6·(Syl/W)``, emitted as
      half-rounded integer micro-points (``fre_micro``) — the per-row
      float expression is deterministic, the quantization makes it
      hash-exact vs SQL.  Docs with 0 words are excluded.

    Zero shuffles: three vectorized RE2 counting kernels per batch
    (``pc.count_substring_regex``), no Python over rows.
    """

    def signals(batch: pa.Table) -> pa.Table:
        lower = pc.utf8_lower(batch.column(text_col))
        w = pc.count_substring_regex(lower, "[a-z0-9]+").to_numpy(
            zero_copy_only=False).astype(np.float64)
        s = pc.count_substring_regex(batch.column(text_col), "[.!?]+"
                                     ).to_numpy(zero_copy_only=False)
        s = np.maximum(s, 1).astype(np.float64)
        syl = pc.count_substring_regex(lower, "[aeiouy]+").to_numpy(
            zero_copy_only=False).astype(np.float64)
        keep = w > 0
        ws = np.where(keep, w, 1.0)
        fre = 206.835 - 1.015 * (w / s) - 84.6 * (syl / ws)
        x = fre * 1e6
        mu = (-np.floor(-x + 0.5)).astype(np.int64)
        return pa.table({
            id_col: batch.column(id_col).filter(pa.array(keep)),
            "n_words": pa.array(w[keep].astype(np.int64), pa.int64()),
            "n_sentences": pa.array(s[keep].astype(np.int64), pa.int64()),
            "n_syllables": pa.array(syl[keep].astype(np.int64), pa.int64()),
            "fre_micro": pa.array(mu[keep], pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        signals, batch_format="pyarrow")


def char_entropy(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-document Shannon entropy (base 2) of the CHARACTER distribution —
    a classic junk detector: base64 blobs / minified JS sit high, repeated
    padding and single-char spam sit near zero, natural language clusters in
    a tight band.  Matches DuckDB's ``entropy`` aggregate over the exploded
    characters (the oracle twin).

    Zero shuffles; per-row signal.  Vectorized interior: the whole batch's
    codepoints come from ONE ``utf-32-le`` reinterpret (no per-char Python),
    per-doc run-lengths from one lexsort over (doc, codepoint), and the
    entropy sum runs in sorted-codepoint order — layout-independent.
    Empty docs are excluded (SQL GROUP BY over the char explode).
    """

    def signals(batch: pa.Table) -> pa.Table:
        texts = batch.column(text_col).to_pylist()
        lens = np.array([len(t) if t else 0 for t in texts], np.int64)
        cps = np.frombuffer(
            "".join(t for t in texts if t).encode("utf-32-le"), np.uint32
        ).astype(np.int64)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        order = np.lexsort((cps, doc_of))
        cs, ds_ = cps[order], doc_of[order]
        first = np.ones(len(cs), dtype=bool)
        first[1:] = (cs[1:] != cs[:-1]) | (ds_[1:] != ds_[:-1])
        starts = np.flatnonzero(first)
        runs = np.diff(np.append(starts, len(cs))).astype(np.float64)
        docs_r = ds_[starts]
        p = runs / lens[docs_r]
        term = -(p * np.log2(p))
        h = np.zeros(len(lens), np.float64)
        np.add.at(h, docs_r, term)
        keep = lens > 0
        return pa.table({
            id_col: batch.column(id_col).filter(pa.array(keep)),
            "n_chars_h": pa.array(lens[keep], pa.int64()),
            "char_entropy": pa.array(h[keep], pa.float64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        signals, batch_format="pyarrow")


def stopword_coverage(
    ds: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """Per-doc stopword hit COUNTS for each supported language — the
    integer-exact signal under the heuristic language ID (code-switch and
    template pages show multi-language coverage; pure junk shows none).

    Counts, not fractions, so the oracle is exact (fractions are one
    division away for the consumer).  Vectorized: one token explode per
    batch, one ``pc.is_in`` per language over the flat token array,
    segmented int64 sums.  Zero shuffles; docs with no tokens excluded
    (explode GROUP BY semantics).
    """
    from ..functions.textstats import _STOPWORDS
    from .tfidf import _explode_tokens

    langs = sorted(_STOPWORDS)
    sets = {l: pa.array(sorted(_STOPWORDS[l])) for l in langs}

    def cover(batch: pa.Table) -> pa.Table:
        lens, flat = _explode_tokens(batch.column(text_col))
        ends = np.cumsum(lens)
        keep = lens > 0
        cols = {
            id_col: batch.column(id_col).filter(pa.array(keep)),
            "n_tokens": pa.array(lens[keep], pa.int64()),
        }
        for l in langs:
            hit = pc.is_in(flat, value_set=sets[l]).to_numpy(
                zero_copy_only=False).astype(np.int64)
            csum = np.concatenate(([0], np.cumsum(hit)))
            cols[f"sw_{l}"] = pa.array(
                (csum[ends] - csum[ends - lens])[keep], pa.int64())
        return pa.table(cols)

    return ds.select_columns([id_col, text_col]).map_batches(
        cover, batch_format="pyarrow")
