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

    def compare_partition(part: pa.Table) -> pa.Table:
        """All keys of one hash partition vectorized: sort by (key, side) —
        'got' < 'want', so a clean 1:1 key occupies rows (s, s+1) — then one
        null-safe string compare per checked column over the clean keys;
        presence/multiplicity anomalies fall out of the side counts."""
        import numpy as np
        import pyarrow.compute as pc

        n = part.num_rows
        if n == 0:
            return schema.empty_table()
        part = part.take(pc.sort_indices(part, sort_keys=[
            (key, "ascending"), ("__side", "ascending")]))
        from ..dsutil import run_starts

        is_got = pc.equal(part.column("__side"), _SIDE_GOT) \
                   .to_numpy(zero_copy_only=False)
        starts = np.flatnonzero(run_starts(part.column(key)))
        counts = np.diff(np.append(starts, n))
        n_got = np.add.reduceat(is_got.astype(np.int64), starts)
        n_want = counts - n_got
        clean = (n_got == 1) & (n_want == 1)
        out_k, out_c, out_g, out_w = [], [], [], []
        # anomalies: presence (one side absent) or multiplicity
        bad = np.flatnonzero(~clean)
        key_col = part.column(key)
        for b in bad:
            out_k.append(key_col[int(starts[b])].as_py())
            out_c.append("__presence__" if (n_got[b] == 0 or n_want[b] == 0)
                         else "__multiplicity__")
            out_g.append(str(int(n_got[b])))
            out_w.append(str(int(n_want[b])))
        # clean keys: got at starts, want at starts+1 (side sort order)
        gsel = pa.array(starts[clean], pa.int64())
        wsel = pa.array(starts[clean] + 1, pa.int64())
        gkeys = key_col.take(gsel)
        for c in columns:
            g = part.column(c).take(gsel)
            w = part.column(c).take(wsel)
            eq = pc.fill_null(pc.equal(g, w), False)
            both_null = pc.and_(pc.is_null(g), pc.is_null(w))
            diff = pc.invert(pc.or_(eq, both_null)) \
                     .to_numpy(zero_copy_only=False)
            for i in np.flatnonzero(diff):
                out_k.append(gkeys[int(i)].as_py())
                out_c.append(c)
                out_g.append(g[int(i)].as_py())
                out_w.append(w[int(i)].as_py())
        return pa.table({
            "doc_id": pa.array(out_k, key_type),
            "column": pa.array(out_c, pa.string()),
            "got": pa.array(out_g, pa.string()),
            "want": pa.array(out_w, pa.string()),
        }, schema=schema)

    from ..dsutil import keyed_partition_map

    return keyed_partition_map(unioned, key, compare_partition)


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
