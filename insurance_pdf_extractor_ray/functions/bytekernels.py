"""Shared numpy byte kernels over Arrow string-array UTF-8 buffers.

The vectorized extractor interiors (``stages.boilerplate.boilerplate_mask``,
``functions.normalize.dirty_text_mask``) need per-row counts of byte-class
matches.  A cumsum-at-offsets implementation writes a 4x-size int32 prefix
array per feature (~5 features x ~100 MB traffic per 24 MB batch);
``np.add.reduceat`` with an int32 accumulator is a single read pass with a
rows-sized output — measured ~10x less memory traffic at identical results.

Row segments tile the value buffer contiguously for a (sliced-rebased)
string array, which is exactly what ``reduceat`` wants; the only sharp
edges are zero-length rows (duplicate indices make reduceat return
``mask[lo]`` instead of 0) and trailing empty rows (``lo == len(data)`` is
out of bounds) — both handled here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc


def string_buffer(texts):
    """(data, lo, hi) for a pyarrow string array: the array's own byte
    range of the UTF-8 value buffer (rebased — sliced arrays don't pay for
    the parent's bytes) and per-row [lo, hi) bounds.  Nulls count as ''."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    t = pc.fill_null(texts, "")
    off_dtype = np.int64 if t.type == pa.large_string() else np.int32
    n = len(t)
    if n == 0:
        return (np.empty(0, np.uint8), np.empty(0, np.int64),
                np.empty(0, np.int64), t)
    off = np.frombuffer(t.buffers()[1], off_dtype)[
        t.offset: t.offset + n + 1].astype(np.int64)
    base = off[0]
    data = np.frombuffer(t.buffers()[2], np.uint8)[base:off[-1]]
    off = off - base
    return data, off[:-1], off[1:], t


def row_sums(mask: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Per-row sums of a byte-aligned bool/uint8 mask via one reduceat pass.

    Assumes rows tile ``mask`` contiguously (lo[i+1] == hi[i]), the layout
    ``string_buffer`` returns.
    """
    n = len(lo)
    if n == 0:
        return np.empty(0, np.int64)
    out = np.zeros(n, np.int64)
    if len(mask) == 0:
        return out
    # trailing empty rows have lo == len(mask) (out of bounds for reduceat);
    # lo is non-decreasing, so the in-bounds rows are a prefix — reduceat
    # over that prefix only (clipping instead would steal bytes from the
    # previous row's segment)
    k = int(np.searchsorted(lo, len(mask), side="left"))
    out[:k] = np.add.reduceat(mask, lo[:k], dtype=np.int32)
    out[lo == hi] = 0  # duplicate indices return mask[lo], not 0
    return out


def row_any(mask: np.ndarray, lo: np.ndarray, hi: np.ndarray) -> np.ndarray:
    """Per-row 'any byte matches' via the same single-pass segment sums."""
    return row_sums(mask, lo, hi) > 0
