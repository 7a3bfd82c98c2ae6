"""Text-analysis pipeline stages over a document table.

Language-ID, quality scoring, token counting, and fingerprinting as a single
vectorized ``map_batches`` stage (one pass over the text column), per the
large-scale training-data operator set.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data

from ..functions.textstats import (
    bpe_token_count,
    detect_language,
    quality_scores,
    rolling_fingerprint,
    whitespace_token_count,
)


class TextAnalysisStage:
    """Stateful stage (compiled patterns live at module import; the actor
    keeps the configured option set)."""

    def __init__(self, text_col: str = "text", fingerprint: bool = True):
        self.text_col = text_col
        self.fingerprint = fingerprint

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch.column(self.text_col).to_pylist()
        langs, ws, bpe, fps = [], [], [], []
        qcols: dict = {k: [] for k in
                       ("n_words", "mean_word_len", "alnum_ratio", "punct_ratio",
                        "stopword_ratio", "quality")}
        for t in texts:
            t = t or ""
            langs.append(detect_language(t))
            ws.append(whitespace_token_count(t))
            bpe.append(bpe_token_count(t))
            q = quality_scores(t)
            for k in qcols:
                qcols[k].append(q[k])
            if self.fingerprint:
                fps.append(rolling_fingerprint(t))
        out = batch
        out = out.append_column("lang_pred", pa.array(langs, pa.string()))
        out = out.append_column("n_tokens_ws", pa.array(ws, pa.int64()))
        out = out.append_column("n_tokens_bpe", pa.array(bpe, pa.int64()))
        for k, v in qcols.items():
            out = out.append_column(k if k != "n_words" else "n_words_q",
                                    pa.array(v, pa.float64()))
        if self.fingerprint:
            out = out.append_column("fingerprint", pa.array(fps, pa.uint64()))
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
