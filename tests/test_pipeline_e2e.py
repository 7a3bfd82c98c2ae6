"""End-to-end Ray Data pipeline tests on the 600-doc corpus.

Tier-3 (SURVEY.md §5): distributed pipeline output must equal the golden
tables — including docs sharded across rows/blocks (reassembly) and the skew
tail — under both the shuffle path and the colocated fast path.
"""

import pyarrow.parquet as pq
import pytest

from insurance_pdf_extractor_ray.pipelines.extraction import extract_pipeline, flatten_fields
from insurance_pdf_extractor_ray.sources import synth

pytestmark = pytest.mark.usefixtures("ray_session")


def _golden_maps(corpus_dir):
    fields = pq.read_table(corpus_dir / "expected_fields.parquet").to_pylist()
    spans = pq.read_table(corpus_dir / "expected_spans.parquet").to_pylist()
    return ({r["doc_id"]: r for r in fields}, {r["doc_id"]: r["spans"] for r in spans})


def test_extract_pipeline_matches_goldens(ray_session, corpus_600):
    import ray.data

    ds = ray.data.read_parquet(str(corpus_600 / "documents.parquet"))
    # small blocks so multi-row docs straddle block boundaries
    ds = ds.repartition(8)
    out = extract_pipeline(ds, batch_size=64).take_all()

    exp_fields, exp_spans = _golden_maps(corpus_600)
    assert len(out) == 600  # one row per doc after reassembly
    for row in out:
        did = row["doc_id"]
        want = exp_fields[did]
        for f in synth.FIELD_ORDER:
            assert row["fields"][f] == want[f], (did, f)
        assert row["status"] == want["status"], did
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans_out"]]
        want_spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp_spans[did]]
        assert got == want_spans, did


def test_flatten_fields(ray_session, corpus_600):
    import ray.data

    ds = ray.data.read_parquet(str(corpus_600 / "documents.parquet"))
    flat = flatten_fields(extract_pipeline(ds)).take_all()
    assert len(flat) == 600
    cols = set(flat[0])
    assert {"doc_id", "status", *synth.FIELD_ORDER} <= cols


def test_auto_mode_matches_goldens(ray_session, corpus_600):
    """mode='auto': split docs detected and shuffled; the rest streams.
    Output must equal the goldens exactly, same as the full shuffle."""
    import ray.data

    ds = ray.data.read_parquet(str(corpus_600 / "documents.parquet")).repartition(8)
    out = extract_pipeline(ds, mode="auto", batch_size=64).take_all()
    exp_fields, exp_spans = _golden_maps(corpus_600)
    assert len(out) == 600
    for row in out:
        did = row["doc_id"]
        want = exp_fields[did]
        for f in synth.FIELD_ORDER:
            assert row["fields"][f] == want[f], (did, f)
        got = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans_out"]]
        want_spans = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in exp_spans[did]]
        assert got == want_spans, did


def test_auto_mode_distributed_detector(ray_session, corpus_600, monkeypatch):
    """The groupby-count split detector (the >50M-row path) must agree with
    the driver-blob path — forced on by zeroing the size threshold."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines import extraction as E

    monkeypatch.setattr(E, "MAX_DRIVER_DETECT_ROWS", 0)
    ds = ray.data.read_parquet(str(corpus_600 / "documents.parquet")).repartition(8)
    out = extract_pipeline(ds, mode="auto", batch_size=64).take_all()
    exp_fields, _ = _golden_maps(corpus_600)
    assert len(out) == 600
    assert sorted(r["doc_id"] for r in out) == sorted(exp_fields)
    for row in out:
        want = exp_fields[row["doc_id"]]
        for f in synth.FIELD_ORDER:
            assert row["fields"][f] == want[f], (row["doc_id"], f)


def test_extreme_skew_doc(ray_session):
    """One 60k-span doc sharded over 60 out-of-order rows, mixed with 200
    normal docs: the two-phase merge reassembles it exactly (offsets
    0..n-1 in order) without starving the partition."""
    import pyarrow as pa
    import ray.data

    from insurance_pdf_extractor_ray.schema import SPANS_TYPE

    n_spans = 60_000
    chunk = 1_000
    rows_ids, rows_spans = [], []
    for start in reversed(range(0, n_spans, chunk)):  # worst-case order
        rows_ids.append("giant")
        rows_spans.append([
            {"kind": "text", "text": f"filler span number {i} with several words",
             "media_ref": "", "offset": i}
            for i in range(start, start + chunk)
        ])
    giant = pa.table({"doc_id": pa.array(rows_ids, pa.string()),
                      "spans": pa.array(rows_spans, SPANS_TYPE)})
    normal = synth.docs_table(range(200))
    ds = ray.data.from_arrow(pa.concat_tables([giant, normal], promote_options="default"))
    out = {r["doc_id"]: r for r in extract_pipeline(ds.repartition(16)).take_all()}
    assert len(out) == 201
    g = out["giant"]
    assert g["n_spans"] == n_spans
    texts = [s["text"] for s in g["spans_out"]]
    assert texts[0].startswith("filler span number 0 ")
    assert texts[-1].startswith(f"filler span number {n_spans-1} ")
    assert [s["offset"] for s in g["spans_out"][:5]] == [0, 1, 2, 3, 4]


def test_colocated_fast_path_equivalent(ray_session):
    """With whole docs per row (no sharded docs), both paths agree."""
    import ray.data

    # families without multi-row chunking, and avoid the hashed skew tail
    idx = [i for i in range(0, 120) if i % 12 not in (8,)]
    idx = [i for i in idx if len(synth.build_doc(i).row_chunks) == 1]
    tbl = synth.docs_table(idx)
    ds1 = extract_pipeline(ray.data.from_arrow(tbl)).take_all()
    ds2 = extract_pipeline(ray.data.from_arrow(tbl), assume_colocated=True).take_all()
    key = lambda r: r["doc_id"]
    for a, b in zip(sorted(ds1, key=key), sorted(ds2, key=key)):
        assert a == b


def test_malformed_spans_survive(ray_session):
    """Crawl-reality inputs: null text in a span, empty span list, null
    media_ref — the pipeline must emit one row per doc, not crash."""
    import pyarrow as pa
    import ray.data

    from insurance_pdf_extractor_ray.schema import SPANS_TYPE

    def doc(doc_id, spans):
        return {"doc_id": doc_id, "spans": spans}

    rows = [
        doc("ok-1", [{"kind": "text", "text": "Policy Number: QT-1",
                      "media_ref": None, "offset": 0}]),
        doc("null-text", [{"kind": "text", "text": None,
                           "media_ref": None, "offset": 0}]),
        doc("empty-spans", []),
        doc("media-only", [{"kind": "media", "text": None,
                            "media_ref": "media://x/0", "offset": 0}]),
    ]
    t = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.string()),
        "spans": pa.array([r["spans"] for r in rows], SPANS_TYPE),
    })
    out = extract_pipeline(ray.data.from_arrow(t).repartition(2)).take_all()
    assert len(out) == 4
    by_id = {r["doc_id"]: r for r in out}
    assert by_id["ok-1"]["fields"]["quote_number"] is not None
    for did in ("null-text", "empty-spans", "media-only"):
        assert by_id[did]["status"] is not None  # classified, not crashed


def test_auto_mode_routes_weight_outliers(ray_session):
    """auto mode must spread a concentrated oversized tail through the
    exchange: output identical to the full shuffle, and the heavy docs'
    hashes must be in the routed set (pipelines/extraction.py:
    _heavy_doc_hashes).  Measured 4x straggler collapse without this."""
    import numpy as np
    import pyarrow as pa
    import ray.data

    from insurance_pdf_extractor_ray.functions.hashing import (
        stable_hash64_column,
    )
    from insurance_pdf_extractor_ray.pipelines.extraction import (
        _heavy_doc_hashes,
        precombine,
    )

    light = synth.docs_table(range(300))                 # ~14 spans/doc
    heavy = synth.docs_table(range(300, 306), text_scale=100)
    # heavy docs concentrated in their own block (the adversarial layout)
    ds = ray.data.from_arrow(light).repartition(8) \
        .union(ray.data.from_arrow(heavy))

    shuf = {r["doc_id"]: r for r in
            extract_pipeline(ds, mode="shuffle").take_all()}
    auto = {r["doc_id"]: r for r in
            extract_pipeline(ds, mode="auto").take_all()}
    assert set(shuf) == set(auto) and len(auto) == 306
    for k in shuf:
        assert shuf[k]["n_spans"] == auto[k]["n_spans"]
        assert [s["offset"] for s in shuf[k]["spans_out"]] == \
            [s["offset"] for s in auto[k]["spans_out"]]

    pre = ds.map_batches(precombine, batch_format="pyarrow").materialize()
    routed = _heavy_doc_hashes(pre)
    hh = stable_hash64_column(heavy.column("doc_id")).view(np.int64)
    assert np.isin(np.unique(hh), routed).all()
    # light docs must NOT be routed (threshold is relative to corpus mean)
    lh = stable_hash64_column(light.column("doc_id")).view(np.int64)
    assert not np.isin(np.unique(lh), routed).any()
