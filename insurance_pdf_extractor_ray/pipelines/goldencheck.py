"""Distributed golden-diff: compare a pipeline's output against an expected
table, emitting only mismatching cells.

This is the verification surface for the flagship extraction path (the
reference's core capability, app/services/pdf_processor.py:29-169 ->
app/models/extraction.py:183-233): the synthetic corpus writer
(sources/synth.py) derives ``expected_fields`` / ``expected_spans`` goldens
from first principles, and these operators diff engine output against them
as a *distributed* anti-join — union both sides with a side tag, one
groupby on the key, compare within the group.  An empty result is a proof
of field-level equality over the whole corpus.

Scale: the only exchange is the groupby(key) — both sides ship only the
compared columns; at 100 TB this is the same one-key shuffle the flagship
itself uses.  No driver-side materialization (callers ``take_all()`` the
mismatch rows, which are empty/tiny by construction).
"""

from __future__ import annotations

import hashlib
from typing import List, Optional

import pyarrow as pa
import ray.data

_SIDE_GOT = "got"
_SIDE_WANT = "want"


def _diff_schema(key_type: pa.DataType) -> pa.Schema:
    return pa.schema([
        ("doc_id", key_type), ("column", pa.string()),
        ("got", pa.string()), ("want", pa.string()),
    ])


def golden_diff(
    got: ray.data.Dataset,
    want: ray.data.Dataset,
    key: str = "doc_id",
    columns: Optional[List[str]] = None,
) -> ray.data.Dataset:
    """Cell-level diff of two keyed Datasets -> (doc_id, column, got, want).

    ``columns`` defaults to every shared non-key column of ``got``'s schema.
    Rows present on only one side are reported as column='__presence__';
    duplicate keys on a side as column='__multiplicity__'.
    """
    got_cols = [f.name for f in got.schema().base_schema if f.name != key]
    if columns is None:
        want_names = {f.name for f in want.schema().base_schema}
        columns = [c for c in got_cols if c in want_names]
    key_type = got.schema().base_schema.field(key).type

    def tag(side: str):
        def f(batch: pa.Table) -> pa.Table:
            cols = {key: batch.column(key)}
            for c in columns:
                cols[c] = batch.column(c).cast(pa.string())
            cols["__side"] = pa.array([side] * batch.num_rows, pa.string())
            return pa.table(cols)

        return f

    unioned = got.map_batches(tag(_SIDE_GOT), batch_format="pyarrow").union(
        want.map_batches(tag(_SIDE_WANT), batch_format="pyarrow")
    )

    schema = _diff_schema(key_type)

    def compare(group: pa.Table) -> pa.Table:
        sides = group.column("__side").to_pylist()
        k = group.column(key)[0].as_py()
        n_got = sides.count(_SIDE_GOT)
        n_want = sides.count(_SIDE_WANT)
        out_k, out_c, out_g, out_w = [], [], [], []
        if n_got != 1 or n_want != 1:
            col = "__presence__" if (n_got == 0 or n_want == 0) else "__multiplicity__"
            out_k.append(k)
            out_c.append(col)
            out_g.append(str(n_got))
            out_w.append(str(n_want))
        else:
            gi = sides.index(_SIDE_GOT)
            wi = sides.index(_SIDE_WANT)
            for c in columns:
                col_arr = group.column(c)
                gv, wv = col_arr[gi].as_py(), col_arr[wi].as_py()
                if gv != wv:
                    out_k.append(k)
                    out_c.append(c)
                    out_g.append(gv)
                    out_w.append(wv)
        return pa.table({
            "doc_id": pa.array(out_k, key_type),
            "column": pa.array(out_c, pa.string()),
            "got": pa.array(out_g, pa.string()),
            "want": pa.array(out_w, pa.string()),
        }, schema=schema)

    return unioned.groupby(key).map_groups(compare, batch_format="pyarrow")


def span_digests(ds: ray.data.Dataset, spans_col: str,
                 key: str = "doc_id") -> ray.data.Dataset:
    """Per-doc digest of the (kind, text, media_ref) span sequence in order.

    The north-rule invariant is span-sequence equality; a fixed blake2b digest
    of the concatenated canonical fields turns list<struct> equality into a
    scalar compare that :func:`golden_diff` can handle.
    """

    def digest(batch: pa.Table) -> pa.Table:
        col = batch.column(spans_col)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        flat = col.flatten()
        kinds = flat.field(0).to_pylist()
        texts = flat.field(1).to_pylist()
        medias = flat.field(2).to_pylist()
        lengths = col.value_lengths().fill_null(0).to_pylist()
        out = []
        pos = 0
        for ln in lengths:
            h = hashlib.blake2b(digest_size=16)
            for i in range(pos, pos + ln):
                h.update((kinds[i] or "").encode())
                h.update(b"\x1f")
                h.update((texts[i] or "").encode())
                h.update(b"\x1f")
                h.update((medias[i] or "").encode())
                h.update(b"\x1e")
            out.append(h.hexdigest())
            pos += ln
        return pa.table({key: batch.column(key),
                         "span_digest": pa.array(out, pa.string())})

    return ds.map_batches(digest, batch_format="pyarrow")


def normalize_diff(ds: ray.data.Dataset, key_type: pa.DataType = pa.string()) -> pa.Table:
    """Collect a (tiny) diff Dataset into a sorted, explicitly-typed table —
    the stable surface the driver hashes (raw map_groups Datasets can carry
    empty zero-column blocks that poison the hash)."""
    rows = ds.take_all()
    rows.sort(key=lambda r: (str(r["doc_id"]), r["column"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], key_type),
        "column": pa.array([r["column"] for r in rows], pa.string()),
        "got": pa.array([r["got"] for r in rows], pa.string()),
        "want": pa.array([r["want"] for r in rows], pa.string()),
    })
