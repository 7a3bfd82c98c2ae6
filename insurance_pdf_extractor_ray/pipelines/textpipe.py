"""Text-analysis pipeline stages over a document table.

Language-ID, quality scoring, token counting, and fingerprinting as a single
vectorized ``map_batches`` stage (one pass over the text column), per the
large-scale training-data operator set.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
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
