"""Driver contract for the graft builder (Ray Data target).

``entry()`` runs the flagship extraction pipeline on a corpus derived from
sf0.001.  ``queries()`` exposes one entry per implemented operator family
(SURVEY.md §2 + the large-scale dedup/similarity/text-analysis additions);
``oracle_sql()`` gives the DuckDB-equivalent for every SQL-expressible one.

Ray is initialised by the driver BEFORE this module is imported: nothing here
calls ``ray.init()`` / ``ray.shutdown()``.

Float columns in oracle-checked queries are rounded identically on both sides
(the driver hashes values; unrounded float sums differ across reduction
orders).
"""

from __future__ import annotations

import glob
import os
from collections.abc import Callable
from typing import Any

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SF_DEFAULT = "/root/testdata/sf0.001"


def _round_away(v: float, nd: int) -> float:
    """DuckDB-ROUND-exact scalar round (std::round half away from zero)."""
    import math

    m = 10 ** nd
    return math.floor(v * m + 0.5) / m if v >= 0 else -math.floor(-v * m + 0.5) / m


# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------

def _docs_rows(sf_dir: str) -> int:
    return pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows


def _corpus_root(sf_dir: str) -> str:
    """Deterministic synthetic span corpus + goldens sized to the sf documents
    table, cached under /tmp (regenerated if absent)."""
    from insurance_pdf_extractor_ray.sources.synth import GEN_VERSION, write_corpus

    n = _docs_rows(sf_dir)
    out = f"/tmp/ipe_corpus/v{GEN_VERSION}-{n}"
    docs = os.path.join(out, "documents")
    golden = os.path.join(out, "expected_fields")
    if not (glob.glob(os.path.join(docs, "*.parquet"))
            and glob.glob(os.path.join(golden, "*.parquet"))):
        write_corpus(n, out, goldens=True)
    return out


def _corpus_for(sf_dir: str) -> str:
    return os.path.join(_corpus_root(sf_dir), "documents")


def _events(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def _documents(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 columns=columns)


def _round_col(tbl: pa.Table, col: str, nd: int) -> pa.Table:
    """Round a float column mirroring DuckDB's ROUND bit-exactly
    (std::round(v*10^nd)/10^nd, half away from zero) — pc.round can land one
    ULP away from DuckDB's result (e.g. 16376.630000000001 vs 16376.63)."""
    i = tbl.schema.get_field_index(col)
    v = tbl.column(col).cast(pa.float64()).to_numpy(zero_copy_only=False)
    m = 10.0 ** nd
    r = np.where(v >= 0, np.floor(v * m + 0.5) / m, -np.floor(-v * m + 0.5) / m)
    return tbl.set_column(i, col, pa.array(r, pa.float64()))


# ---------------------------------------------------------------------------
# flagship
# ---------------------------------------------------------------------------

def entry() -> Any:
    """Flagship pipeline on a corpus derived from sf0.001; returns a Dataset."""
    from insurance_pdf_extractor_ray.pipelines.extraction import (
        extract_pipeline,
        flatten_fields,
    )

    return flatten_fields(extract_pipeline(_corpus_for(SF_DEFAULT)))


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------

def _q_extract_fields(sf_dir: str):
    from insurance_pdf_extractor_ray.pipelines.extraction import (
        extract_pipeline,
        flatten_fields,
    )

    return flatten_fields(extract_pipeline(_corpus_for(sf_dir)))


def _q_extract_spans(sf_dir: str):
    """Span-sequence output (north-rule invariant surface) as flat rows."""
    from insurance_pdf_extractor_ray.pipelines.extraction import extract_pipeline

    def explode(batch: pa.Table) -> pa.Table:
        out = {"doc_id": [], "kind": [], "text": [], "media_ref": [], "offset": []}
        for did, spans in zip(batch.column("doc_id").to_pylist(),
                              batch.column("spans_out").to_pylist()):
            for s in spans:
                out["doc_id"].append(did)
                out["kind"].append(s["kind"])
                out["text"].append(s["text"])
                out["media_ref"].append(s["media_ref"])
                out["offset"].append(s["offset"])
        return pa.table({"doc_id": pa.array(out["doc_id"], pa.string()),
                         "kind": pa.array(out["kind"], pa.string()),
                         "text": pa.array(out["text"], pa.string()),
                         "media_ref": pa.array(out["media_ref"], pa.string()),
                         "offset": pa.array(out["offset"], pa.int32())})

    return extract_pipeline(_corpus_for(sf_dir)).map_batches(explode, batch_format="pyarrow")


def _q_layout_extract(sf_dir: str):
    """PDF-layout path: word boxes -> line/block clustering + whitespace-gap
    table detection -> spans -> extraction (north-star layout surface).
    Approximation-free but geometry-derived, so rows-only check."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.extraction import (
        extract_pipeline,
        flatten_fields,
    )
    from insurance_pdf_extractor_ray.pipelines.layoutpipe import words_to_docs
    from insurance_pdf_extractor_ray.sources.synth import word_boxes_table

    n = min(_docs_rows(sf_dir), 500)
    idx = [i for i in range(n) if i % 12 != 9]  # media spans have no boxes
    docs = words_to_docs(ray.data.from_arrow(word_boxes_table(idx)))
    return flatten_fields(extract_pipeline(docs))


def _q_extract_fields_check(sf_dir: str):
    """Hard correctness gate for the flagship: distributed cell-level diff of
    the extraction output against the first-principles ``expected_fields``
    golden (sources/synth.py) — returns ONLY mismatching cells, so an empty
    result (matching the oracle's WHERE 1=0) proves field-level equality of
    every doc in the corpus."""
    import ray.data

    from insurance_pdf_extractor_ray.config import FIELD_ORDER
    from insurance_pdf_extractor_ray.pipelines.extraction import (
        extract_pipeline,
        flatten_fields,
    )
    from insurance_pdf_extractor_ray.pipelines.goldencheck import (
        golden_diff,
        normalize_diff,
    )

    root = _corpus_root(sf_dir)
    engine = flatten_fields(extract_pipeline(os.path.join(root, "documents")))
    golden = ray.data.read_parquet(os.path.join(root, "expected_fields"),
                                   columns=["doc_id"] + FIELD_ORDER + ["status"])
    return normalize_diff(golden_diff(engine, golden, key="doc_id"))


def _q_extract_spans_check(sf_dir: str):
    """North-rule invariant gate: per-doc span-sequence digests
    (kind, text, media_ref, order) of the extraction output diffed against the
    ``expected_spans`` golden.  Empty result = span-sequence equality."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.extraction import extract_pipeline
    from insurance_pdf_extractor_ray.pipelines.goldencheck import (
        golden_diff,
        normalize_diff,
        span_digests,
    )

    root = _corpus_root(sf_dir)
    engine = span_digests(extract_pipeline(os.path.join(root, "documents")),
                          "spans_out")
    golden = span_digests(
        ray.data.read_parquet(os.path.join(root, "expected_spans")), "spans")
    return normalize_diff(golden_diff(engine, golden, key="doc_id"))


def _q_layout_extract_check(sf_dir: str):
    """Layout-path gate: word boxes -> layout parse -> extraction, fields
    diffed against the same ``expected_fields`` golden (media docs excluded —
    they have no visual boxes)."""
    import ray.data

    from insurance_pdf_extractor_ray.config import FIELD_ORDER
    from insurance_pdf_extractor_ray.pipelines.extraction import (
        extract_pipeline,
        flatten_fields,
    )
    from insurance_pdf_extractor_ray.pipelines.goldencheck import (
        golden_diff,
        normalize_diff,
    )
    from insurance_pdf_extractor_ray.pipelines.layoutpipe import words_to_docs
    from insurance_pdf_extractor_ray.sources.synth import (
        expected_tables,
        word_boxes_table,
    )

    n = min(_docs_rows(sf_dir), 500)
    idx = [i for i in range(n) if i % 12 != 9]  # media spans have no boxes
    docs = words_to_docs(ray.data.from_arrow(word_boxes_table(idx)))
    engine = flatten_fields(extract_pipeline(docs))
    golden_tbl = expected_tables(idx)[0].select(["doc_id"] + FIELD_ORDER + ["status"])
    return normalize_diff(golden_diff(engine, ray.data.from_arrow(golden_tbl),
                                      key="doc_id"))


def _q_exact_dedup(sf_dir: str):
    """Exact dedup over documents ∪ relabeled copy; returns kept doc_ids."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.dedup import exact_dedup

    ds = _documents(sf_dir, columns=["doc_id", "text"])
    shifted = ds.map_batches(
        lambda t: pa.table({"doc_id": pc.add(t.column("doc_id"), 1000000),
                            "text": t.column("text")}),
        batch_format="pyarrow",
    )
    kept = exact_dedup(ds.union(shifted), "text", "doc_id")
    return kept.select_columns(["doc_id"])


def _q_global_stats(sf_dir: str):
    from insurance_pdf_extractor_ray.pipelines.analytics import global_stats

    t = global_stats(_events(sf_dir, ["value"]), "value")
    t = _round_col(t, "total", 2)
    t = _round_col(t, "avg", 4)
    return t


def _q_stats_by_type(sf_dir: str):
    from insurance_pdf_extractor_ray.pipelines.analytics import stats_by

    ds = stats_by(_events(sf_dir, ["event_type", "value"]), "event_type", "value",
                  sort_by=None)
    tbl = pa.concat_tables([pa.Table.from_pylist(ds.take_all())])
    tbl = _round_col(tbl, "total", 2)
    return tbl.drop_columns(["avg"])


def _q_daily_trends(sf_dir: str):
    from insurance_pdf_extractor_ray.pipelines.analytics import daily_trends

    rows = daily_trends(_events(sf_dir, ["ts", "value"]), "ts", "value").take_all()
    tbl = pa.Table.from_pylist(rows)
    return _round_col(tbl, "total", 2)


def _q_top10_by_value(sf_dir: str):
    from insurance_pdf_extractor_ray.pipelines.analytics import top_k

    return top_k(_events(sf_dir), "value", k=10, tiebreak="event_id",
                 columns=["event_id", "event_type", "value"])


def _q_breakdown(sf_dir: str):
    from insurance_pdf_extractor_ray.pipelines.analytics import breakdown_with_pct

    return breakdown_with_pct(_events(sf_dir, ["event_type"]), "event_type")


def _q_recent_n(sf_dir: str):
    ds = _events(sf_dir, ["event_id", "ts", "event_type", "value"])
    return ds.sort(["ts", "event_id"], descending=[True, False]).limit(100) \
             .select_columns(["event_id", "event_type", "value"])


def _q_search_filter(sf_dir: str):
    # F8 (storage.py:402-426): composed predicates incl. LIKE
    ds = _documents(sf_dir)

    def pred(batch: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.and_(pc.equal(batch.column("source"), "src3"),
                    pc.greater_equal(batch.column("n_chars"), 200)),
            pc.match_substring(batch.column("text"), "data"),
        )
        return batch.filter(mask)

    return ds.map_batches(pred, batch_format="pyarrow")


def _q_orders_join(sf_dir: str):
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.joins import broadcast_join

    orders = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                   columns=["o_orderkey", "o_custkey", "o_totalprice"])
    customer = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                     columns=["c_custkey", "c_name", "c_mktsegment"])
    joined = broadcast_join(orders, customer, on="o_custkey", right_on="c_custkey",
                            add_cols=["c_name", "c_mktsegment"])
    return joined.select_columns(["o_orderkey", "o_custkey", "c_name", "c_mktsegment", "o_totalprice"])


def _q_anti_join(sf_dir: str):
    from insurance_pdf_extractor_ray.pipelines.joins import broadcast_anti_join

    ds = _documents(sf_dir, ["doc_id", "source", "n_chars"])
    return broadcast_anti_join(ds, "source", {"src0", "src1", "src2"})


def _q_token_explode(sf_dir: str):
    # J2-style flat_map explosion: doc -> (doc_id, token) rows
    import re

    ds = _documents(sf_dir, ["doc_id", "text"])
    tok = re.compile(r"\S+")

    def explode(batch: pa.Table) -> pa.Table:
        out_id, out_tok = [], []
        for did, text in zip(batch.column("doc_id").to_pylist(),
                             batch.column("text").to_pylist()):
            for t in tok.findall(text or ""):
                out_id.append(did)
                out_tok.append(t)
        return pa.table({"doc_id": pa.array(out_id, pa.int64()),
                         "token": pa.array(out_tok, pa.string())})

    return ds.map_batches(explode, batch_format="pyarrow")


def _q_doc_token_stats(sf_dir: str):
    # text-analysis subset that SQL can replicate exactly
    from insurance_pdf_extractor_ray.pipelines.textpipe import analyze_text

    ds = analyze_text(_documents(sf_dir, ["doc_id", "text"]), fingerprint=False,
                      concurrency=2)

    def project(batch: pa.Table) -> pa.Table:
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "n_tokens_ws": batch.column("n_tokens_ws"),
            "n_chars_calc": pc.utf8_length(batch.column("text")).cast(pa.int64()),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def _q_knn(sf_dir: str):
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import knn_brute_force

    path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(path, columns=["vec_id", "embedding"])
    order = pc.sort_indices(head.column("vec_id"))[:3]
    q_ids = [head.column("vec_id").take(order).to_pylist()[i] for i in range(3)]
    queries = np.asarray(head.column("embedding").take(order).to_pylist(), dtype=np.float64)

    ds = ray.data.read_parquet(path)
    out = knn_brute_force(ds, queries, k=5, batch_size=4096)
    # remap positional query_id -> actual vec_id; round score for oracle hash
    qmap = {i: q_ids[i] for i in range(3)}
    return pa.table({
        "query_id": pa.array([qmap[q] for q in out.column("query_id").to_pylist()], pa.int64()),
        "vec_id": out.column("vec_id"),
        "score": pc.round(out.column("score"), ndigits=6),
    })


def _q_knn_ivf(sf_dir: str):
    """Approximate ANN via IVF (k-means inverted file) — deterministic but
    approximate, so rows-only check (no SQL oracle)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import knn_ivf

    path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(path, columns=["vec_id", "embedding"])
    order = pc.sort_indices(head.column("vec_id"))[:3]
    queries = np.asarray(head.column("embedding").take(order).to_pylist(), dtype=np.float64)
    ds = ray.data.read_parquet(path)
    out = knn_ivf(ds, queries, k=5, n_clusters=16, n_probe=6)
    return _round_col(pa.table({
        "query_id": out.column("query_id"),
        "vec_id": out.column("vec_id"),
        "score": out.column("score"),
    }), "score", 6)


def _ids_table(ds) -> pa.Table:
    """Sorted, typed doc_id table (map_groups Datasets carry empty
    zero-column blocks that can poison the driver's value hash)."""
    ids = sorted(r["doc_id"] for r in ds.take_all())
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


def _q_minhash_dedup(sf_dir: str):
    """MinHash+LSH near-dup ids.  Oracle: pinned id list at sf0.01, every id
    independently verified to have an exact-Jaccard near-dup partner."""
    from insurance_pdf_extractor_ray.pipelines.dedup import minhash_dup_ids

    ds = _documents(sf_dir, ["doc_id", "text"])
    return _ids_table(
        minhash_dup_ids(ds, "text", "doc_id", threshold=0.8).select_columns(["doc_id"]))


def _q_simhash_dedup(sf_dir: str):
    """SimHash near-dup ids (banded, pigeonhole-exact recall).  Oracle:
    pinned id list at sf0.01."""
    from insurance_pdf_extractor_ray.pipelines.dedup import simhash_dup_ids

    ds = _documents(sf_dir, ["doc_id", "text"])
    return _ids_table(
        simhash_dup_ids(ds, "text", "doc_id", max_hamming=2).select_columns(["doc_id"]))


def _q_text_analysis(sf_dir: str):
    """Full text-analysis stage (lang-ID, token counts, quality,
    fingerprint).  Oracle: committed golden parquet pinned at the driver's
    correctness scale (sf0.01) — cross-validated independently for
    n_tokens_ws (DuckDB regexp, see doc_token_stats) and spot-checked for
    lang/quality; fingerprint emitted as hex (uint64 values above int64.max
    round-trip poorly through row-based conversion)."""
    from insurance_pdf_extractor_ray.pipelines.textpipe import analyze_text

    ds = analyze_text(_documents(sf_dir, ["doc_id", "text"]))

    def project(batch: pa.Table) -> pa.Table:
        fp = batch.column("fingerprint").to_numpy(zero_copy_only=False)
        q = batch.column("quality").to_numpy(zero_copy_only=False)
        m = 1e6
        q6 = np.floor(q * m + 0.5) / m  # half-away, DuckDB-ROUND-exact
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "lang_pred": batch.column("lang_pred"),
            "n_tokens_ws": batch.column("n_tokens_ws"),
            "n_tokens_bpe": batch.column("n_tokens_bpe"),
            "quality": pa.array(q6, pa.float64()),
            "fingerprint_hex": pa.array([f"{v:016x}" for v in fp], pa.string()),
        })

    return ds.map_batches(project, batch_format="pyarrow")


def _q_quality_filter(sf_dir: str):
    """Gopher/C4-style quality gate over documents ∪ mangled copies (vowels
    and spaces stripped -> degenerate word lengths, zero stopwords); the
    mangled half must be rejected.  The oracle re-derives the whole rule
    independently in SQL (regexp counts + ratio thresholds), so this is a
    semantic check, not a determinism pin."""
    from insurance_pdf_extractor_ray.pipelines.textpipe import quality_filter

    ds = _documents(sf_dir, ["doc_id", "text"])
    drop_tbl = str.maketrans("", "", "aeiouAEIOU ")

    def mangle(batch: pa.Table) -> pa.Table:
        texts = [(t or "").translate(drop_tbl) for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": pc.add(batch.column("doc_id"), 1000000),
                         "text": pa.array(texts, pa.string())})

    unioned = ds.union(ds.map_batches(mangle, batch_format="pyarrow"))
    return _ids_table(quality_filter(unioned, min_quality=0.6))


def _q_repetition_stats(sf_dir: str):
    """Per-doc duplicate-line fraction (Gopher repetition filter family)."""
    from insurance_pdf_extractor_ray.pipelines.textpipe import repetition_stats

    ds = repetition_stats(_documents(sf_dir, ["doc_id", "text"]))
    rows = ds.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_lines": pa.array([r["n_lines"] for r in rows], pa.int64()),
        "n_distinct_lines": pa.array([r["n_distinct_lines"] for r in rows], pa.int64()),
        "dup_line_ratio": pa.array(
            [_round_away(r["dup_line_ratio"], 4) for r in rows], pa.float64()),
    })


def _q_field_success_rates(sf_dir: str):
    from insurance_pdf_extractor_ray.pipelines.analytics import success_rates
    from insurance_pdf_extractor_ray.pipelines.extraction import extract_pipeline
    from insurance_pdf_extractor_ray.pipelines.fields_table import (
        explode_fields,
        field_success_flags,
    )

    extracted = extract_pipeline(_corpus_for(sf_dir))
    long = field_success_flags(explode_fields(extracted))
    rows = success_rates(long, "field_name", "success_flag").take_all()
    rows.sort(key=lambda r: r["field_name"])
    return pa.table({
        "field_name": pa.array([r["field_name"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "n_success": pa.array([r["n_success"] for r in rows], pa.int64()),
        "success_rate": pa.array(
            [_round_away(100.0 * r["n_success"] / r["n"], 2) for r in rows],
            pa.float64()),
    })


def _q_html_main_content(sf_dir: str):
    """HTML boilerplate strip (north-star DOM text-density scoring): wrap each
    document's text in deterministic chrome (nav/header/link-farm/footer),
    strip it back out — output must equal the original text exactly, which
    the SQL oracle checks via SELECT doc_id, text."""
    from insurance_pdf_extractor_ray.pipelines.htmlpipe import main_content

    ds = _documents(sf_dir, ["doc_id", "text"])

    def wrap(batch: pa.Table) -> pa.Table:
        htmls = [
            "<html><head><title>doc</title></head><body>"
            '<nav><a href="/">Home</a> <a href="/p">Products</a> <a href="/c">Claims</a></nav>'
            '<header><a href="/login">Login</a> | <a href="/signup">Sign up</a></header>'
            f"<p>{t}</p>"
            '<div><a href="/a">x</a> <a href="/b">y</a> <a href="/c">z</a></div>'
            "<footer>&copy; 2024 Example Corp. All rights reserved.</footer>"
            "</body></html>"
            for t in batch.column("text").to_pylist()
        ]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "html": pa.array(htmls, pa.string())})

    return main_content(ds.map_batches(wrap, batch_format="pyarrow"), "html", "doc_id")


def _q_json_props_stats(sf_dir: str):
    """A7 (analytics.py:82-91) derived per-group metrics over a JSON column:
    parse events.props JSON, then per event_type n / total value / total k /
    value per 1k k — the engine's JSON-scalar + post-aggregation projection
    path (SURVEY.md §2.9).

    Determinism: ``value`` is exact 2-decimal, so it is summed as integer
    cents (int64 Sum is reduction-order-independent, unlike float Sum); the
    final rounds mirror DuckDB's ROUND (std::round half-away: floor(v*10^nd+0.5))
    rather than Python's banker's rounding — r01's hash-fail-with-identical-rows
    pointed at exactly this boundary."""
    import json as _json

    from ray.data.aggregate import Count, Sum

    ds = _events(sf_dir, ["event_type", "value", "props"])

    def parse(batch: pa.Table) -> pa.Table:
        ks = [int(_json.loads(p)["k"]) for p in batch.column("props").to_pylist()]
        cents = pc.round(pc.multiply(batch.column("value"), 100.0)).cast(pa.int64())
        return pa.table({
            "event_type": batch.column("event_type"),
            "cents": cents,
            "k": pa.array(ks, pa.int64()),
        })

    grouped = ds.map_batches(parse, batch_format="pyarrow").groupby("event_type").aggregate(
        Count(alias_name="n"),
        Sum("cents", alias_name="total_cents"),
        Sum("k", alias_name="total_k"),
    ).take_all()
    rows = sorted(grouped, key=lambda r: r["event_type"])
    totals = [r["total_cents"] / 100.0 for r in rows]  # exact 2-dec float
    return pa.table({
        "event_type": [r["event_type"] for r in rows],
        "n": [r["n"] for r in rows],
        "total_value": pa.array(totals, pa.float64()),
        "total_k": [r["total_k"] for r in rows],
        "value_per_1k": pa.array([
            _round_away(t / r["total_k"] * 1000, 4) if r["total_k"] else 0.0
            for t, r in zip(totals, rows)
        ], pa.float64()),
    })


_HOUR_US = 3_600_000_000


def _q_tumbling_window(sf_dir: str):
    """Streaming-shaped: 1-hour tumbling window count/sum over events."""
    from insurance_pdf_extractor_ray.pipelines.windows import tumbling_window

    rows = tumbling_window(_events(sf_dir, ["ts", "value"]), "ts", _HOUR_US,
                           "value").take_all()
    rows.sort(key=lambda r: r["window_start"])
    return pa.table({
        "window_start": [r["window_start"] for r in rows],
        "n": [r["n"] for r in rows],
        "total": [_round_away(r["total"], 2) for r in rows],
    })


def _q_sliding_window(sf_dir: str):
    """2-hour windows sliding by 1 hour (each event in 2 windows)."""
    from insurance_pdf_extractor_ray.pipelines.windows import sliding_window

    rows = sliding_window(_events(sf_dir, ["ts", "value"]), "ts",
                          2 * _HOUR_US, _HOUR_US, "value").take_all()
    rows.sort(key=lambda r: r["window_start"])
    return pa.table({
        "window_start": [r["window_start"] for r in rows],
        "n": [r["n"] for r in rows],
        "total": [_round_away(r["total"], 2) for r in rows],
    })


def _q_session_windows(sf_dir: str):
    """Per-user session windows with a 10-minute inactivity gap.

    Normalized to a sorted, explicitly-typed Arrow table: the map_groups
    shuffle can emit empty zero-column blocks whose schema poisons the
    driver's value hash even when every row matches the oracle
    (CORRECTNESS_r01 hash_match=false with identical rows)."""
    from insurance_pdf_extractor_ray.pipelines.windows import session_windows

    ds = session_windows(_events(sf_dir, ["user_id", "ts", "event_id"]),
                         "user_id", "ts", gap_us=600_000_000,
                         tiebreak_col="event_id")
    rows = ds.take_all()
    rows.sort(key=lambda r: (r["user_id"], r["session_id"]))
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "session_id": pa.array([r["session_id"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "start_us": pa.array([r["start_us"] for r in rows], pa.int64()),
        "end_us": pa.array([r["end_us"] for r in rows], pa.int64()),
    })


def _q_retention(sf_dir: str):
    """D2 (storage.py:601-639): age-based expiry as a partition-prunable
    predicate — keep rows at/after a fixed cutoff date."""
    ds = _events(sf_dir, ["event_id", "ts", "event_type"])

    def keep(batch: pa.Table) -> pa.Table:
        import datetime

        cutoff = datetime.datetime(2024, 1, 15)
        return batch.filter(pc.greater_equal(batch.column("ts"),
                                             pa.scalar(cutoff, pa.timestamp("us"))))

    return ds.map_batches(keep, batch_format="pyarrow").select_columns(
        ["event_id", "event_type"]
    )


def _q_media_decode(sf_dir: str):
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.multimodal import (
        decode_media,
        fake_assets_for_docs,
        media_consistency_gate,
        media_refs_from_docs,
    )

    docs = ray.data.read_parquet(_corpus_for(sf_dir))
    refs = media_refs_from_docs(docs).take_all()
    assets = fake_assets_for_docs([(r["doc_id"], r["media_ref"]) for r in refs],
                                  corrupt_frac=0.1)
    gated = media_consistency_gate(ray.data.from_arrow(assets))
    out = decode_media(gated)

    # Driver-sortable scalar projection: the decode emits a list<float>
    # feature column, which generic result normalizers (sort/hash) can't
    # order — ship its first element instead of the vector.
    def scalarize(batch: pa.Table) -> pa.Table:
        feats = batch.column("features")
        f0 = pc.list_element(feats, 0) if batch.num_rows else \
            pa.array([], pa.float64())
        keep = [c for c in batch.column_names if c != "features"]
        return batch.select(keep).append_column("f0", f0)

    return out.map_batches(scalarize, batch_format="pyarrow")


def _q_media_decode_check(sf_dir: str):
    """Deterministic digest of the media_decode output (count / thumbnail
    area / first-feature sum per kind × consistency cell) so the multimodal
    plumbing is driver-checkable against a pinned oracle — decode is the
    documented deterministic stand-in (real codecs aren't in this
    container), but the Ray-side schema, gate and actor plumbing are real."""
    out = _q_media_decode(sf_dir)
    rows = out.take_all()
    cells: dict = {}
    for r in rows:
        key = (r["kind"], bool(r["kind_consistent"]))
        c = cells.setdefault(key, [0, 0, 0.0])
        c[0] += 1
        c[1] += int(r["thumb_w"]) * int(r["thumb_h"])
        c[2] += float(r["f0"])
    keys = sorted(cells)
    return pa.table({
        "kind": pa.array([k[0] for k in keys], pa.string()),
        "consistent": pa.array([k[1] for k in keys], pa.bool_()),
        "n": pa.array([cells[k][0] for k in keys], pa.int64()),
        "thumb_area": pa.array([cells[k][1] for k in keys], pa.int64()),
        "f0_sum": pa.array([_round_away(cells[k][2], 6) for k in keys],
                           pa.float64()),
    })


def _q_frame_sample_check(sf_dir: str):
    """Deterministic digest of the video frame-sample stage (1 frame per
    60 s, max 5 per clip) grouped by frame_idx — the frame features are the
    documented deterministic stand-in, the explode layout / actor plumbing
    is real (pipelines/multimodal.py:FrameSampleStage)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.multimodal import (
        fake_assets_for_docs,
        frame_sample,
        media_refs_from_docs,
    )

    docs = ray.data.read_parquet(_corpus_for(sf_dir))
    refs = media_refs_from_docs(docs).take_all()
    assets = fake_assets_for_docs(
        [(r["doc_id"], r["media_ref"]) for r in refs])
    out = frame_sample(ray.data.from_arrow(assets),
                       every_ms=60_000, max_frames=5)
    cells: dict = {}
    for r in out.take_all():
        c = cells.setdefault(int(r["frame_idx"]), [0, 0, 0.0])
        c[0] += 1
        c[1] += int(r["ts_ms"])
        c[2] += float(r["features"][0])
    keys = sorted(cells)
    return pa.table({
        "frame_idx": pa.array(keys, pa.int32()),
        "n": pa.array([cells[k][0] for k in keys], pa.int64()),
        "ts_sum": pa.array([cells[k][1] for k in keys], pa.int64()),
        "f0_sum": pa.array([_round_away(cells[k][2], 6) for k in keys],
                           pa.float64()),
    })


def _q_grouped_topk(sf_dir: str):
    """Per-group top-k (row_number() OVER (PARTITION BY ...) <= k): top-3
    events per type by value, event_id tiebreak — map-side partial top-k,
    one bounded keyed shuffle (pipelines/rankagg.py)."""
    from insurance_pdf_extractor_ray.pipelines.rankagg import grouped_top_k

    out = grouped_top_k(
        _events(sf_dir, ["event_type", "event_id", "value"]),
        "event_type", order_by=["value", "event_id"], descending=[True, False],
        k=3, columns=["event_type", "event_id", "value"],
    )
    rows = out.take_all()
    rows.sort(key=lambda r: (r["event_type"], -r["value"], r["event_id"]))
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "value": pa.array([r["value"] for r in rows], pa.float64()),
    })


def _q_distinct_users(sf_dir: str):
    """COUNT(DISTINCT user_id) per event_type — pair-dedup shuffle on the
    composite key (no per-key reducer hot spot), then a tiny keyed count."""
    from insurance_pdf_extractor_ray.pipelines.rankagg import distinct_count_by

    out = distinct_count_by(_events(sf_dir, ["event_type", "user_id"]),
                            "event_type", "user_id")
    rows = sorted(out.take_all(), key=lambda r: r["event_type"])
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "n_distinct": pa.array([r["n_distinct"] for r in rows], pa.int64()),
    })


def _q_value_quantiles(sf_dir: str):
    """Exact percentile_cont(0.5 / 0.9) per event_type over the
    cents-quantized value column via a distinct-value histogram — one
    composite-key shuffle, per-key interpolation over the tiny histogram."""
    from insurance_pdf_extractor_ray.pipelines.rankagg import quantiles_by

    out = quantiles_by(_events(sf_dir, ["event_type", "value"]),
                       "event_type", "value", qs=(0.5, 0.9), names=("p50", "p90"))
    rows = sorted(out.take_all(), key=lambda r: r["event_type"])
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "p50": pa.array([_round_away(r["p50"], 6) for r in rows], pa.float64()),
        "p90": pa.array([_round_away(r["p90"], 6) for r in rows], pa.float64()),
    })


def _q_asof_last_click(sf_dir: str):
    """Backward as-of join: for every non-click event, the most recent click
    at-or-before it by the same user (big-big, single keyed shuffle,
    vectorized searchsorted merge — pipelines/joins.py:asof_join)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.joins import asof_join

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type"])

    def us(batch: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": batch.column("event_id"),
            "user_id": batch.column("user_id"),
            "ts_us": batch.column("ts").cast(pa.int64()),
            "event_type": batch.column("event_type"),
        })

    ev = ev.map_batches(us, batch_format="pyarrow")
    left = ev.filter(expr="event_type != 'click'")
    right = ev.filter(expr="event_type == 'click'")
    out = asof_join(left, right, by="user_id", on="ts_us", value_col="ts_us",
                    out_col="last_click_ts")
    rows = out.select_columns(["event_id", "last_click_ts"]).take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "last_click_ts": pa.array([r["last_click_ts"] for r in rows], pa.int64()),
    })


def _q_embedding_dedup(sf_dir: str):
    """Embedding near-dup ids — exact all-pairs baseline (broadcast unit
    matrix + per-batch matmul; LSH sign-bucket variant is the scale path).
    Oracle: DuckDB EXISTS + list_cosine_similarity, a genuinely independent
    re-derivation."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.dedup import embedding_dup_ids_exact

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    out = embedding_dup_ids_exact(ds, "embedding", "vec_id", threshold=0.45)
    ids = sorted(r["vec_id"] for r in out.take_all())
    return pa.table({"vec_id": pa.array(ids, pa.int64())})


def _q_top_term(sf_dir: str):
    """Corpus TF-IDF: most characteristic term per document under the total
    integer order (tf desc, df asc, token asc) — tokenize → two keyed
    pre-combined shuffles → vocabulary-bounded broadcast join → grouped
    top-1 (pipelines/tfidf.py)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import top_term_per_doc

    n_docs = _docs_rows(sf_dir)
    out = top_term_per_doc(_documents(sf_dir, ["doc_id", "text"]),
                           "text", "doc_id", n_docs=n_docs)
    rows = out.select_columns(["doc_id", "token", "tf", "df"]).take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "token": pa.array([r["token"] for r in rows], pa.string()),
        "tf": pa.array([r["tf"] for r in rows], pa.int64()),
        "df": pa.array([r["df"] for r in rows], pa.int64()),
    })


def _q_orders_lineitem_join(sf_dir: str):
    """Big-big hash shuffle join (Dataset.join), row-level: urgent orders'
    line items with revenue — the J-family scale path checked directly
    (exact_dedup only exercises it indirectly)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey", "l_linenumber", "l_extendedprice", "l_discount"])
    orders = ray.data.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_totalprice", "o_orderpriority"],
    ).filter(expr="o_orderpriority == '1-URGENT'")
    joined = shuffle_join(li, orders, on="l_orderkey", right_on="o_orderkey",
                          join_type="inner", num_partitions=16)

    def project(batch: pa.Table) -> pa.Table:
        price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
        rev = price * (1.0 - disc)
        m = 1e4
        rev4 = np.where(rev >= 0, np.floor(rev * m + 0.5) / m,
                        -np.floor(-rev * m + 0.5) / m)
        return pa.table({
            "l_orderkey": batch.column("l_orderkey"),
            "l_linenumber": batch.column("l_linenumber"),
            "o_totalprice": batch.column("o_totalprice"),
            "revenue": pa.array(rev4, pa.float64()),
        })

    out = joined.map_batches(project, batch_format="pyarrow")
    rows = out.take_all()
    rows.sort(key=lambda r: (r["l_orderkey"], r["l_linenumber"]))
    return pa.table({
        "l_orderkey": pa.array([r["l_orderkey"] for r in rows], pa.int64()),
        "l_linenumber": pa.array([r["l_linenumber"] for r in rows], pa.int64()),
        "o_totalprice": pa.array([r["o_totalprice"] for r in rows], pa.float64()),
        "revenue": pa.array([r["revenue"] for r in rows], pa.float64()),
    })


def _q_hourly_distinct_users(sf_dir: str):
    """Composition check: tumbling window x COUNT(DISTINCT) — hourly distinct
    users, windows assigned map-side then rankagg.distinct_count_by on the
    window key."""
    from insurance_pdf_extractor_ray.pipelines.rankagg import distinct_count_by

    hour_us = 3_600_000_000

    def add_window(batch: pa.Table) -> pa.Table:
        us = batch.column("ts").cast(pa.int64()).to_numpy(zero_copy_only=False)
        w = (us // hour_us) * hour_us
        return pa.table({"window_start": pa.array(w, pa.int64()),
                         "user_id": batch.column("user_id")})

    ds = _events(sf_dir, ["ts", "user_id"]).map_batches(add_window,
                                                        batch_format="pyarrow")
    out = distinct_count_by(ds, "window_start", "user_id")
    rows = sorted(out.take_all(), key=lambda r: r["window_start"])
    return pa.table({
        "window_start": pa.array([r["window_start"] for r in rows], pa.int64()),
        "n_distinct": pa.array([r["n_distinct"] for r in rows], pa.int64()),
    })


def _q_events_in_sessions(sf_dir: str):
    """Composition: range join x session windows — every event assigned to
    its (user, session) interval via the epoch-bucketed point-in-interval
    join (pipelines/joins.py:range_join).  1:1 by construction, which the
    row count proves."""
    from insurance_pdf_extractor_ray.pipelines.joins import range_join
    from insurance_pdf_extractor_ray.pipelines.windows import session_windows

    sessions = session_windows(_events(sf_dir, ["user_id", "ts", "event_id"]),
                               "user_id", "ts", gap_us=600_000_000,
                               tiebreak_col="event_id")

    def us(batch: pa.Table) -> pa.Table:
        return pa.table({"event_id": batch.column("event_id"),
                         "user_id": batch.column("user_id"),
                         "ts_us": batch.column("ts").cast(pa.int64())})

    points = _events(sf_dir, ["event_id", "user_id", "ts"]).map_batches(
        us, batch_format="pyarrow")
    out = range_join(points, sessions, on="ts_us", start_col="start_us",
                     end_col="end_us", epoch=3_600_000_000, by="user_id",
                     interval_cols=["session_id"])
    rows = out.select_columns(["event_id", "session_id"]).take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "session_id": pa.array([r["session_id"] for r in rows], pa.int64()),
    })


def _q_stratified_sample(sf_dir: str):
    """Deterministic stratified sampling (per-source mixing rates) — pure
    arithmetic-hash predicate: zero shuffle, partition-independent, exactly
    re-derivable in SQL (pipelines/sampling.py)."""
    from insurance_pdf_extractor_ray.pipelines.sampling import stratified_hash_sample

    out = stratified_hash_sample(
        _documents(sf_dir, ["doc_id", "source"]), "source", "doc_id",
        rates={"src0": 0.5, "src1": 1.0, "src2": 0.0}, default_rate=0.25,
        seed=13)
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
    })


def _q_profile_documents(sf_dir: str):
    """Column profiling over the documents table — integer-exact subset
    (row/null/distinct counts; float metrics excluded from the oracle
    because mean is reduction-order-dependent)."""
    from insurance_pdf_extractor_ray.pipelines.profile import profile_columns

    out = profile_columns(_documents(sf_dir), columns=["doc_id", "lang", "source",
                                                       "n_chars"])
    out = out.select(["column", "n", "n_null", "n_distinct"]).rename_columns(
        ["col_name", "n", "n_null", "n_distinct"])
    return out.take(pc.sort_indices(out, sort_keys=[("col_name", "ascending")]))


def _q_pack_sequences(sf_dir: str):
    """Concat-and-chunk sequence packing (2048-token budget) over documents in
    doc_id order — bucketed prefix sums, no ordered global scan
    (pipelines/packing.py); token counts = whitespace runs, the
    oracle-verified doc_token_stats definition."""
    from insurance_pdf_extractor_ray.pipelines.packing import pack_sequences

    def count_tokens(batch: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(batch.column("text").cast(pa.large_string()))
        n = s.str.count_matches(r"\S+").fill_null(0).to_numpy().astype(np.int64)
        return pa.table({"doc_id": batch.column("doc_id"),
                         "n_tokens": pa.array(n, pa.int64())})

    ds = _documents(sf_dir, ["doc_id", "text"]).map_batches(
        count_tokens, batch_format="pyarrow")
    out = pack_sequences(ds, "doc_id", "n_tokens", seq_len=2048, bucket=100)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["doc_id"], r["seq_id"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "seq_id": pa.array([r["seq_id"] for r in rows], pa.int64()),
        "start_tok": pa.array([r["start_tok"] for r in rows], pa.int64()),
        "end_tok": pa.array([r["end_tok"] for r in rows], pa.int64()),
    })


def _q_decontaminate(sf_dir: str):
    """Eval-set decontamination: per-doc count of word 6-grams shared with
    the eval subset (doc_id < 5) — eval n-gram set broadcast once, corpus
    streams shuffle-free (pipelines/tfidf.py:ngram_overlap_tag)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.tfidf import ngram_overlap_tag

    docs = _documents(sf_dir, ["doc_id", "text"])
    eval_ds = _documents(sf_dir, ["doc_id", "text"]).filter(expr="doc_id < 5")
    out = ngram_overlap_tag(docs, eval_ds, "text", "doc_id", n=6)
    rows = out.select_columns(["doc_id", "n_overlap"]).take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_overlap": pa.array([r["n_overlap"] for r in rows], pa.int64()),
    })


def _q_pivot_event_daily(sf_dir: str):
    """Wide pivot (count(*) FILTER per event_type column, one row per day) —
    map-side pair pre-aggregation, one keyed shuffle over the (day, type)
    count table, fixed explicit column domain so every block carries an
    identical schema (pipelines/behavior.py:pivot_counts)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import pivot_counts

    types = ["click", "error", "purchase", "signup", "view"]

    def add_date(batch: pa.Table) -> pa.Table:
        return pa.table({
            "date": pc.strftime(batch.column("ts"), format="%Y-%m-%d"),
            "event_type": batch.column("event_type"),
        })

    ev = _events(sf_dir, ["ts", "event_type"]).map_batches(
        add_date, batch_format="pyarrow")
    out = pivot_counts(ev, "date", "event_type", types, prefix="n_")
    rows = out.take_all()
    rows.sort(key=lambda r: r["date"])
    cols = {"date": pa.array([r["date"] for r in rows], pa.string())}
    for t in types:
        cols[f"n_{t}"] = pa.array([r[f"n_{t}"] for r in rows], pa.int64())
    return pa.table(cols)


def _q_funnel(sf_dir: str):
    """Ordered-step funnel view→click→purchase (min-ts, strictly-after
    semantics): irrelevant types dropped map-side, ONE user-keyed shuffle,
    vectorized per-user scan, K-row result
    (pipelines/behavior.py:funnel_counts)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import funnel_counts

    return funnel_counts(
        _events(sf_dir, ["user_id", "ts", "event_type"]),
        "user_id", "ts", "event_type", steps=["view", "click", "purchase"])


def _q_cohort_retention(sf_dir: str):
    """Cohort retention: distinct users active N days after their first-ever
    day (N=0..7).  First-activity = pre-combined keyed min; join-back via
    the standard broadcast-or-shuffle size policy; distinct counting
    shuffles deduped (cohort, offset, user) triples
    (pipelines/behavior.py:cohort_retention)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import cohort_retention

    out = cohort_retention(_events(sf_dir, ["user_id", "ts"]),
                           "user_id", "ts", max_offset=7)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["cohort_day"], r["day_offset"]))
    return pa.table({
        "cohort_day": pa.array([r["cohort_day"] for r in rows], pa.string()),
        "day_offset": pa.array([r["day_offset"] for r in rows], pa.int64()),
        "n_users": pa.array([r["n_users"] for r in rows], pa.int64()),
    })


def _q_semantic_dedup(sf_dir: str):
    """SemDeDup: k-means the embedding space, greedy cosine-leader prune per
    cluster (pipelines/clustering.py:semantic_dedup_drop_ids).  Oracle:
    pinned id list at sf0.01 — every dropped id independently verified in
    DuckDB to have a smaller-id partner at list_cosine_similarity >= tau,
    and the set proven identical across block layouts and CPU counts."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.clustering import (
        semantic_dedup_drop_ids,
    )

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["vec_id", "embedding"])
    out = semantic_dedup_drop_ids(ds, "embedding", "vec_id",
                                  n_clusters=8, tau=0.30)
    ids = sorted(r["vec_id"] for r in out.take_all())
    return pa.table({"vec_id": pa.array(ids, pa.int64())})


def _q_unigram_logprob(sf_dir: str):
    """Corpus-unigram LM quality score per doc, quantized to integer
    micro-nats before the reduction so the sum is reduction-order-proof
    (pipelines/tfidf.py:unigram_logprob)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import unigram_logprob

    out = unigram_logprob(_documents(sf_dir, ["doc_id", "text"]),
                          "text", "doc_id")
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64()),
        "logprob_micro": pa.array([r["logprob_micro"] for r in rows], pa.int64()),
    })


def _q_quantiles_refine(sf_dir: str):
    """Exact global quantile_cont/quantile_disc WITHOUT a sort — iterative
    histogram rank-refinement, zero shuffles, driver state O(bins) per pass
    (pipelines/sketches.py:quantiles_global)."""
    import numpy as np

    from insurance_pdf_extractor_ray.pipelines.sketches import (
        quantiles_global,
    )

    ds = _events(sf_dir, ["value"])
    qs = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]
    cont = quantiles_global(ds, "value", qs)
    disc = quantiles_global(ds, "value", qs, kind="disc")

    def r6(xs):
        v = np.array(xs, np.float64)
        return np.where(v >= 0, np.floor(v * 1e6 + 0.5) / 1e6,
                        -np.floor(-v * 1e6 + 0.5) / 1e6)

    return pa.table({
        "q": pa.array(qs, pa.float64()),
        "cont": pa.array(r6(cont), pa.float64()),
        "disc": pa.array(r6(disc), pa.float64()),
    })


def _q_unimax_plan(sf_dir: str):
    """UniMax temperature-sampling plan (tau=2, cap 4 epochs) over event
    types: per-source mixture weights from one tiny keyed count — feeds
    mixture_interleave's zero-shuffle hash-keep executor
    (pipelines/mixing.py:unimax_plan)."""
    from insurance_pdf_extractor_ray.pipelines.mixing import unimax_plan

    return unimax_plan(_events(sf_dir, ["event_type"]), "event_type",
                       tau=2.0, max_epochs=4.0)


def _q_asof_nearest_error(sf_dir: str):
    """Nearest-as-of join: each purchase matched to the user's CLOSEST
    error timestamp in either direction (backward wins exact ties) — one
    keyed shuffle, per-key double searchsorted
    (pipelines/joins.py:asof_join(direction='nearest'))."""
    import pyarrow.compute as pc

    from insurance_pdf_extractor_ray.pipelines.joins import asof_join

    ev = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])

    def prep(etype, cols):
        def fn(t: pa.Table) -> pa.Table:
            t = t.filter(pc.equal(t.column("event_type"), etype))
            out = {c: t.column(c) for c in cols}
            out["_ts"] = pc.cast(t.column("ts"), pa.int64())
            return pa.table(out)
        return fn

    left = ev.map_batches(prep("purchase", ["user_id", "event_id"]),
                          batch_format="pyarrow")
    right = ev.map_batches(prep("error", ["user_id"]),
                           batch_format="pyarrow")
    out = asof_join(left, right, "user_id", "_ts", "_ts",
                    out_col="nearest_error_ts", direction="nearest")
    rows = out.take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "nearest_error_ts": pa.array(
            [r["nearest_error_ts"] for r in rows], pa.int64()),
    })


def _q_materialize_sequences(sf_dir: str):
    """Last mile of packing: actual 512-token training-sequence TEXT —
    pack offsets -> ONE keyed join back onto doc text -> vectorized word
    slices -> ONE budget-bounded seq-keyed ordered concat
    (pipelines/packing.py:materialize_sequences)."""
    from insurance_pdf_extractor_ray.pipelines.packing import (
        materialize_sequences,
    )

    out = materialize_sequences(_documents(sf_dir, ["doc_id", "text"]),
                                "doc_id", "text", seq_len=512, bucket=100)
    rows = out.take_all()
    rows.sort(key=lambda r: r["seq_id"])
    return pa.table({
        "seq_id": pa.array([r["seq_id"] for r in rows], pa.int64()),
        "seq_text": pa.array([r["seq_text"] for r in rows], pa.string()),
        "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
    })


def _q_dow_hour_heatmap(sf_dir: str):
    """Activity heatmap by (day-of-week, hour): temporal parts derived with
    pure epoch arithmetic (dow = (epoch_days + 4) % 7 — 1970-01-01 was a
    Thursday; DuckDB dayofweek numbering 0=Sunday), per-batch two-key
    partials, ONE tiny keyed combine."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    def partial(t: pa.Table) -> pa.Table:
        us = pc.cast(t.column("ts"), pa.int64()).to_numpy(
            zero_copy_only=False)
        days = us // 86_400_000_000
        dow = (days + 4) % 7
        hour = (us // 3_600_000_000) % 24
        base = pa.table({
            "dow": pa.array(dow, pa.int64()),
            "hour": pa.array(hour, pa.int64()),
            "_n": pa.array(np.ones(len(us), np.int64), pa.int64()),
        })
        return base.group_by(["dow", "hour"]).aggregate(
            [("_n", "sum")]).rename_columns(["dow", "hour", "_n"])

    agg = (_events(sf_dir, ["ts"]).map_batches(partial,
                                               batch_format="pyarrow")
           .groupby(["dow", "hour"]).aggregate(Sum("_n", alias_name="n")))
    rows = agg.take_all()
    rows.sort(key=lambda r: (r["dow"], r["hour"]))
    return pa.table({
        "dow": pa.array([r["dow"] for r in rows], pa.int64()),
        "hour": pa.array([r["hour"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_skew_kurt_by_type(sf_dir: str):
    """Grouped skewness/kurtosis (bias-corrected sample estimators) from
    five-number power-sum partials — one keyed shuffle of O(keys) rows
    (pipelines/statagg.py:skew_kurt_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import (
        skew_kurt_by_key,
    )

    out = skew_kurt_by_key(_events(sf_dir, ["event_type", "value"]),
                           "event_type", "value")
    rows = out.take_all()
    rows.sort(key=lambda r: r["event_type"])
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "skewness": pa.array([round(r["skewness"], 9) for r in rows],
                             pa.float64()),
        "kurtosis": pa.array([round(r["kurtosis"], 9) for r in rows],
                             pa.float64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_robust_outliers(sf_dir: str):
    """Robust outlier counts per event type: |value - median| > 3 * MAD
    (median/MAD immune to the outliers being hunted, unlike mean/stddev) —
    composition of two skew-proof exact median passes broadcast into one
    counting map (pipelines/statagg.py:mad_by_key + median_by_key)."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.pipelines.statagg import (
        mad_by_key,
        median_by_key,
    )

    ds = _events(sf_dir, ["event_type", "value"])
    med = {r["event_type"]: r["_med"] for r in
           median_by_key(ds, "event_type", "value", out_col="_med")
           .take_all()}
    mad = {r["event_type"]: r["mad"] for r in
           mad_by_key(ds, "event_type", "value").take_all()}
    import ray
    ref = ray.put((med, mad))

    def flag(t: pa.Table, r) -> pa.Table:
        import numpy as np

        m, s = ray.get(r)
        k = t.column("event_type").to_pylist()
        v = t.column("value").to_numpy(zero_copy_only=False)
        meds = np.array([m[x] for x in k])
        mads = np.array([s[x] for x in k])
        out = np.abs(v - meds) > 3.0 * mads
        base = pa.table({"event_type": t.column("event_type"),
                         "_o": pa.array(out.astype(np.int64), pa.int64()),
                         "_n": pa.array(np.ones(len(v), np.int64), pa.int64())})
        return base.group_by(["event_type"]).aggregate(
            [("_o", "sum"), ("_n", "sum")]).rename_columns(
            ["event_type", "_o", "_n"])

    agg = (ds.map_batches(flag, fn_args=(ref,), batch_format="pyarrow")
           .groupby("event_type").aggregate(
               Sum("_o", alias_name="n_outliers"),
               Sum("_n", alias_name="n")))
    rows = agg.take_all()
    rows.sort(key=lambda r: r["event_type"])
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "n_outliers": pa.array([r["n_outliers"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_mad_by_type(sf_dir: str):
    """Robust dispersion: exact MAD(value) per event type — two skew-proof
    exact median passes (pipelines/statagg.py:mad_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import mad_by_key

    out = mad_by_key(_events(sf_dir, ["event_type", "value"]),
                     "event_type", "value")
    rows = out.take_all()
    rows.sort(key=lambda r: r["event_type"])
    import numpy as np

    v = np.array([r["mad"] for r in rows], np.float64)
    r6 = np.where(v >= 0, np.floor(v * 1e6 + 0.5) / 1e6,
                  -np.floor(-v * 1e6 + 0.5) / 1e6)
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "mad": pa.array(r6, pa.float64()),
    })


def _q_minhash_cross_join(sf_dir: str):
    """Cross-corpus set-similarity join: corpus docs that are MinHash
    near-dups of an eval slice (doc_id % 50 == 0) — fuzzy decontamination
    (pipelines/dedup.py:minhash_cross_join).  Oracle: pinned pairs at
    sf0.01; the one non-identity pair (92, 450) verified at exact 3-gram
    Jaccard 0.958 in DuckDB; estimates are k/128 dyadic rationals, so the
    floats pin exactly.  Layout/CPU-count-stable."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.dedup import minhash_cross_join

    docs = _documents(sf_dir, ["doc_id", "text"])

    def _eval(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.filter(pa.array(ids % 50 == 0))

    out = minhash_cross_join(
        docs, docs.map_batches(_eval, batch_format="pyarrow"),
        "text", "doc_id", threshold=0.7)
    rows = sorted(out.take_all(), key=lambda r: (r["l_id"], r["r_id"]))
    return pa.table({
        "l_id": pa.array([r["l_id"] for r in rows], pa.int64()),
        "r_id": pa.array([r["r_id"] for r in rows], pa.int64()),
        "est": pa.array([r["est"] for r in rows], pa.float64()),
    })


def _q_overlap_sessions_outages(sf_dir: str):
    """Interval x interval OVERLAP join: purchase activity windows
    [ts, ts+5min] against outage windows [error ts, +10min] — both sides
    replicate to epoch buckets, pairs dedup by first-common-bucket rule
    (pipelines/joins.py:interval_overlap_join)."""
    from insurance_pdf_extractor_ray.pipelines.joins import (
        interval_overlap_join,
    )

    def iv(prefix, etype, mins):
        def fn(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            s = batch.column("ts").cast(pa.int64())
            return pa.table({
                f"{prefix}_id": batch.column("event_id"),
                f"{prefix}s": s,
                f"{prefix}e": pc.add(s, mins * 60_000_000),
            })
        return fn

    ev = _events(sf_dir, ["event_id", "ts", "event_type"])
    left = ev.filter(expr="event_type == 'purchase'").map_batches(
        iv("l", "purchase", 5), batch_format="pyarrow")
    right = ev.filter(expr="event_type == 'error'").map_batches(
        iv("r", "error", 10), batch_format="pyarrow")
    out = interval_overlap_join(left, right, "ls", "le", "rs", "re",
                                epoch=600_000_000)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["l_id"], r["r_id"]))
    return pa.table({
        "l_id": pa.array([r["l_id"] for r in rows], pa.int64()),
        "r_id": pa.array([r["r_id"] for r in rows], pa.int64()),
    })


def _q_dsir_weights(sf_dir: str):
    """DSIR importance weights toward a target slice (source='src0' docs):
    unigram importance ratio in integer micro-nats, quantized per distinct
    token before the reduction (pipelines/tfidf.py:dsir_logweight; the
    hashed fixed-feature variant is the unbounded-vocabulary scale path)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import dsir_logweight

    docs = _documents(sf_dir, ["doc_id", "text", "source"])
    target = docs.filter(expr="source == 'src0'") \
                 .select_columns(["doc_id", "text"])
    out = dsir_logweight(docs.select_columns(["doc_id", "text"]), target,
                         "text", "doc_id")
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64()),
        "dsir_micro": pa.array([r["dsir_micro"] for r in rows], pa.int64()),
    })


def _q_pretrain_prep(sf_dir: str):
    """END-TO-END pretraining data prep (pipelines/pretrain.py): Gopher
    repetition gates -> 8-gram eval decontamination (eval = doc_id % 50
    == 0) -> exact dedup (min-id winner among survivors) -> whitespace
    token counts -> 1024-token concat-and-chunk packing.  The SQL oracle
    re-derives the WHOLE chain as one CTE pipeline, so the composition is
    verified, not just the stages."""
    from insurance_pdf_extractor_ray.pipelines.pretrain import pretrain_prep

    docs = _documents(sf_dir, ["doc_id", "text"])

    def _slice(keep_eval: bool):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as np

            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 50 == 0) if keep_eval else (ids % 50 != 0)
            return t.filter(pa.array(m))
        return fn

    out = pretrain_prep(
        docs.map_batches(_slice(False), batch_format="pyarrow"),
        "text", "doc_id",
        eval_ds=docs.map_batches(_slice(True), batch_format="pyarrow"),
        seq_len=1024, bucket=100)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["doc_id"], r["seq_id"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "seq_id": pa.array([r["seq_id"] for r in rows], pa.int64()),
        "start_tok": pa.array([r["start_tok"] for r in rows], pa.int64()),
        "end_tok": pa.array([r["end_tok"] for r in rows], pa.int64()),
    })


def _q_gopher_repetition(sf_dir: str):
    """Gopher-style per-doc repetition signals (Rae et al. 2021 Table A1):
    duplicated-unigram fraction + top bigram/trigram word fractions
    (multiplicity >= 2 only), single vectorized pass, zero shuffles
    (pipelines/textpipe.py:gopher_repetition)."""
    from insurance_pdf_extractor_ray.pipelines.textpipe import (
        gopher_repetition,
    )

    out = gopher_repetition(_documents(sf_dir, ["doc_id", "text"]))
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_words": pa.array([r["n_words"] for r in rows], pa.int64()),
        "frac_dup_unigrams": pa.array(
            [r["frac_dup_unigrams"] for r in rows], pa.float64()),
        "frac_top_bigram": pa.array(
            [r["frac_top_bigram"] for r in rows], pa.float64()),
        "frac_top_trigram": pa.array(
            [r["frac_top_trigram"] for r in rows], pa.float64()),
        "keep": pa.array([r["keep"] for r in rows], pa.bool_()),
    })


def _q_nfc_normalize(sf_dir: str):
    """Unicode NFC canonicalization of the text column (combining marks
    composed before hashing/dedup see the text) with a changed-row audit
    flag — ascii fast path, zero shuffles
    (pipelines/textpipe.py:nfc_normalize).  Semantics exercised on
    non-ASCII fixtures in tests/test_gopher.py; DuckDB nfc_normalize is
    the oracle."""
    from insurance_pdf_extractor_ray.pipelines.textpipe import nfc_normalize

    out = nfc_normalize(_documents(sf_dir, ["doc_id", "text"]))
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "text_nfc": pa.array([r["text_nfc"] for r in rows], pa.string()),
        "changed": pa.array([r["changed"] for r in rows], pa.bool_()),
    })


def _q_boilerplate_stats(sf_dir: str):
    """Corpus boilerplate mass: strict 8-word windows, positions covered by
    corpus-duplicated windows, distinct dup windows, docs touched — the
    dup-span machinery reduced to four scalars
    (pipelines/substrdedup.py:boilerplate_stats)."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        boilerplate_stats,
    )

    return boilerplate_stats(_documents(sf_dir, ["doc_id", "text"]),
                             "text", "doc_id", k=8, min_docs=2)


def _q_ngram_decontaminate(sf_dir: str):
    """Exact n-gram decontamination: flag corpus docs (doc_id % 50 != 0)
    sharing any 8-word window with the eval slice (doc_id % 50 == 0) — the
    exact twin of minhash_cross_join's fuzzy gate
    (pipelines/substrdedup.py:ngram_decontaminate)."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        ngram_decontaminate,
    )

    docs = _documents(sf_dir, ["doc_id", "text"])

    def _slice(keep_eval: bool):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as np

            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 50 == 0) if keep_eval else (ids % 50 != 0)
            return t.filter(pa.array(m))
        return fn

    out = ngram_decontaminate(
        docs.map_batches(_slice(False), batch_format="pyarrow"),
        docs.map_batches(_slice(True), batch_format="pyarrow"),
        "text", "doc_id", k=8)
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_windows": pa.array([r["n_windows"] for r in rows], pa.int64()),
        "n_eval_hits": pa.array([r["n_eval_hits"] for r in rows], pa.int64()),
        "contaminated": pa.array([r["contaminated"] for r in rows], pa.bool_()),
    })


def _q_dup_span_clean(sf_dir: str):
    """Substring-level dedup (Lee et al.): cut 8-word windows occurring in
    >=2 distinct docs out of every document — window-hash pass 1, one keyed
    combine, dup-set broadcast-or-join pass 2
    (pipelines/substrdedup.py:dup_span_clean)."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import dup_span_clean

    out = dup_span_clean(_documents(sf_dir, ["doc_id", "text"]),
                         "text", "doc_id", k=8, min_docs=2)
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_words": pa.array([r["n_words"] for r in rows], pa.int64()),
        "n_windows": pa.array([r["n_windows"] for r in rows], pa.int64()),
        "n_dup_windows": pa.array([r["n_dup_windows"] for r in rows], pa.int64()),
        "n_dropped_words": pa.array([r["n_dropped_words"] for r in rows], pa.int64()),
        "clean_text": pa.array([r["clean_text"] for r in rows], pa.string()),
    })


def _q_vocab_top100(sf_dir: str):
    """Global top-100 vocabulary by corpus frequency (token-asc tiebreak) —
    per-batch distinct-token counting BEFORE the shuffle, one keyed combine,
    distributed sort-limit (pipelines/tfidf.py:vocab_counts)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import vocab_counts

    out = vocab_counts(_documents(sf_dir, ["doc_id", "text"]),
                       "text", "doc_id", k=100)
    rows = out.take_all()
    rows.sort(key=lambda r: (-r["n"], r["token"]))
    return pa.table({
        "token": pa.array([r["token"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_pii_redact(sf_dir: str):
    """PII + denylist scrubbing: ordered regex classes (email/phone/SSN →
    replacement tokens, then a whole-word denylist), vectorized polars
    rewrite, zero shuffle; per-class match counts
    (functions/redact.py:redact_text).  The oracle re-derives the rewritten
    text character-for-character with nested regexp_replace."""
    from insurance_pdf_extractor_ray.functions.redact import (
        PII_PATTERNS,
        denylist_pattern,
        redact_text,
    )

    patterns = list(PII_PATTERNS) + [
        ("deny", denylist_pattern(["spark", "merge", "hash"]), "[TERM]")]
    out = redact_text(_documents(sf_dir, ["doc_id", "text"]), "text",
                      patterns=patterns)
    out = out.select_columns(
        ["doc_id", "n_email", "n_phone", "n_ssn", "n_deny", "text_redacted"])
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_email": pa.array([r["n_email"] for r in rows], pa.int64()),
        "n_phone": pa.array([r["n_phone"] for r in rows], pa.int64()),
        "n_ssn": pa.array([r["n_ssn"] for r in rows], pa.int64()),
        "n_deny": pa.array([r["n_deny"] for r in rows], pa.int64()),
        "text_redacted": pa.array([r["text_redacted"] for r in rows],
                                  pa.string()),
    })


_MIX_WEIGHTS = {"src0": 2.5, "src1": 1.0, "src2": 0.25, "src4": 1.75}


def _q_mixture(sf_dir: str):
    """Weighted mixture with repetition (source weights 2.5/1.0/0.25/1.75):
    per-(id, epoch) arithmetic-hash keep decisions + deterministic shard
    assignment — ZERO shuffle where the textbook implementation globally
    shuffles the concatenation (pipelines/mixing.py:mixture_interleave)."""
    from insurance_pdf_extractor_ray.pipelines.mixing import mixture_interleave

    out = mixture_interleave(_documents(sf_dir, ["doc_id", "source"]),
                             "source", "doc_id", _MIX_WEIGHTS,
                             seed=101, n_shards=64)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["doc_id"], r["epoch"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "epoch": pa.array([r["epoch"] for r in rows], pa.int64()),
        "shard": pa.array([r["shard"] for r in rows], pa.int64()),
    })


def _q_bm25(sf_dir: str):
    """BM25 top-15 for a bag-of-words query — token stream filtered to the
    query vocabulary BEFORE its only shuffle, corpus stats from a
    zero-shuffle counting pass, distributed sort-limit
    (pipelines/tfidf.py:bm25_search)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import bm25_search

    return bm25_search(_documents(sf_dir, ["doc_id", "text"]),
                       "text", "doc_id",
                       query_terms=["shuffle", "spark", "window"], k=15)


def _q_bm25_indexed(sf_dir: str):
    """BM25 over the inverted-index at-rest layout — posting lists written
    once (zero-shuffle exact map-side tf), the query reads ONLY its terms'
    bucket dirs; proven bit-identical to the scan path, so it shares
    bm25_search's SQL oracle (pipelines/invindex.py:bm25_search_indexed)."""
    import tempfile

    from insurance_pdf_extractor_ray.pipelines.invindex import (
        bm25_search_indexed,
        build_inverted_index,
    )

    root = tempfile.mkdtemp(prefix="ipe_invidx_q_")
    build_inverted_index(_documents(sf_dir, ["doc_id", "text"]),
                         "text", "doc_id", root, n_buckets=32)
    return bm25_search_indexed(
        root, query_terms=["shuffle", "spark", "window"], k=15)


def _q_ntile(sf_dir: str):
    """Global row_number + NTILE(10) (curriculum tiering) — one Ray-native
    sort, then two metadata-weight task waves (per-block counts → zero-copy
    range append); no row touches the driver
    (pipelines/ordering.py:with_row_number/ntile)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.ordering import ntile_bucket, with_row_number

    numbered = with_row_number(
        _events(sf_dir, ["event_id", "value"]),
        sort_keys=["value", "event_id"], out_col="rn")
    total = numbered.count()

    def tile(batch: pa.Table) -> pa.Table:
        rn = batch.column("rn").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": batch.column("event_id"),
            "rn": batch.column("rn"),
            "tile": pa.array(ntile_bucket(rn - 1, total, 10), pa.int64()),
        })

    rows = numbered.map_batches(tile, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["rn"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "rn": pa.array([r["rn"] for r in rows], pa.int64()),
        "tile": pa.array([r["tile"] for r in rows], pa.int64()),
    })


def _q_rolling_avg(sf_dir: str):
    """Per-user rolling 3-row average in (ts, event_id) order — SQL ROWS
    BETWEEN 2 PRECEDING AND CURRENT ROW; one user-keyed shuffle, oldest-first
    shifted adds (no cumsum cancellation)
    (pipelines/windows.py:rolling_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.windows import rolling_by_key

    out = rolling_by_key(
        _events(sf_dir, ["event_id", "user_id", "ts", "value"]),
        "user_id", "ts", "value", window=3, order_tiebreak="event_id")
    rows = out.select_columns(["event_id", "roll_n", "roll_avg"]).take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "roll_n": pa.array([r["roll_n"] for r in rows], pa.int64()),
        "roll_avg": pa.array([_round_away(r["roll_avg"], 6) for r in rows],
                             pa.float64()),
    })


def _q_heavy_hitters(sf_dir: str):
    """Exact frequent items (count ≥ 80) via per-block Misra-Gries summaries
    + an exact candidate-count pass — no full-cardinality shuffle, bounded
    driver state; output counts are exact so the oracle is a plain
    GROUP BY ... HAVING (pipelines/sketches.py:heavy_hitters)."""
    from insurance_pdf_extractor_ray.pipelines.sketches import heavy_hitters

    out = heavy_hitters(_events(sf_dir, ["user_id"]), "user_id",
                        threshold=80, k=4096)
    return pa.table({"value": out.column("value").cast(pa.int64()),
                     "n": out.column("n")})


def _q_rollup(sf_dir: str):
    """GROUP BY ROLLUP(source, lang) counts — finest level is the only
    keyed shuffle; coarser levels re-aggregate the bounded finest table
    (pipelines/sketches.py:rollup_counts)."""
    from insurance_pdf_extractor_ray.pipelines.sketches import rollup_counts

    return rollup_counts(_documents(sf_dir, ["source", "lang"]),
                         ["source", "lang"])


def _q_hll_distinct(sf_dir: str):
    """HyperLogLog approximate COUNT(DISTINCT) — global users + per-type
    (p=12, ~1.6 % σ).  Register merge is max ⇒ partition/retry-independent;
    the oracle pins the deterministic output, cross-validated within 2 % of
    the exact counts at sf0.01 (pipelines/sketches.py)."""
    from insurance_pdf_extractor_ray.pipelines.sketches import (
        hll_distinct,
        hll_distinct_by,
    )

    total = hll_distinct(_events(sf_dir, ["user_id"]), "user_id")
    per = hll_distinct_by(_events(sf_dir, ["event_type", "user_id"]),
                          "event_type", "user_id").take_all()
    rows = sorted(per, key=lambda r: r["event_type"])
    return pa.table({
        "event_type": pa.array(["__all__"] + [r["event_type"] for r in rows],
                               pa.string()),
        "approx_distinct": pa.array(
            [total] + [r["approx_distinct"] for r in rows], pa.int64()),
    })


def _q_lag(sf_dir: str):
    """Per-user LAG(value, 1) in (ts, event_id) order — one keyed shuffle,
    null-masked take interior (pipelines/windows.py:lag_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.windows import lag_by_key

    out = lag_by_key(_events(sf_dir, ["event_id", "user_id", "ts", "value"]),
                     "user_id", "ts", "value", offset=1,
                     order_tiebreak="event_id", out_col="prev_value")
    rows = out.select_columns(["event_id", "prev_value"]).take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "prev_value": pa.array([r["prev_value"] for r in rows], pa.float64()),
    })


def _q_zscore(sf_dir: str):
    """Per-type z-score standardization — keyed moment aggregate broadcast
    into a streaming map (pipelines/analytics.py:zscore_by)."""
    from insurance_pdf_extractor_ray.pipelines.analytics import zscore_by

    out = zscore_by(_events(sf_dir, ["event_id", "event_type", "value"]),
                    "event_type", "value")
    rows = out.select_columns(["event_id", "zscore"]).take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "zscore": pa.array(
            [None if r["zscore"] is None else _round_away(r["zscore"], 6)
             for r in rows], pa.float64()),
    })


def _q_histogram(sf_dir: str):
    """Global fixed-width histogram (20 bins over [0, 1000)) — zero shuffle,
    per-block bincount partials merged by addition
    (pipelines/sketches.py:histogram_fixed)."""
    from insurance_pdf_extractor_ray.pipelines.sketches import histogram_fixed

    return histogram_fixed(_events(sf_dir, ["value"]), "value",
                           lo=0.0, hi=1000.0, bins=20)


def _q_outer_join(sf_dir: str):
    """LEFT OUTER big-big join: every customer with their order count,
    zero-order customers included (Dataset.join left_outer + null fill)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions

    orders = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                   columns=["o_custkey"])
    from ray.data.aggregate import Count

    counts = orders.groupby("o_custkey").aggregate(Count(alias_name="n"))
    cust = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey"])
    joined = cust.join(counts, join_type="left_outer",
                       num_partitions=_join_partitions(),
                       on=("c_custkey",), right_on=("o_custkey",))

    def fill(batch: pa.Table) -> pa.Table:
        n = pc.fill_null(batch.column("n"), 0)
        return pa.table({"c_custkey": batch.column("c_custkey"),
                         "n_orders": n.cast(pa.int64())})

    rows = joined.map_batches(fill, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["c_custkey"])
    return pa.table({
        "c_custkey": pa.array([r["c_custkey"] for r in rows], pa.int64()),
        "n_orders": pa.array([r["n_orders"] for r in rows], pa.int64()),
    })


def _q_union_distinct(sf_dir: str):
    """Dataset.union of two filtered streams + exact distinct (keyed count)
    — SQL UNION semantics."""
    from ray.data.aggregate import Count

    a = _events(sf_dir, ["user_id", "event_type"]).filter(
        expr="event_type == 'purchase'").select_columns(["user_id"])
    b = _events(sf_dir, ["user_id", "event_type"]).filter(
        expr="event_type == 'error'").select_columns(["user_id"])
    uniq = a.union(b).groupby("user_id").aggregate(Count(alias_name="_c"))
    ids = sorted(r["user_id"] for r in uniq.take_all())
    return pa.table({"user_id": pa.array(ids, pa.int64())})


def _q_mode_lang(sf_dir: str):
    """Per-group MODE (most frequent value, tiebreak asc) — composition:
    keyed pair counts (one shuffle) → grouped top-1 under the total integer
    order (n desc, lang asc)."""
    from ray.data.aggregate import Count

    from insurance_pdf_extractor_ray.pipelines.rankagg import grouped_top_k

    counts = _documents(sf_dir, ["source", "lang"]).groupby(
        ["source", "lang"]).aggregate(Count(alias_name="n"))
    out = grouped_top_k(counts, "source", order_by=["n", "lang"],
                        descending=[True, False], k=1)
    rows = sorted(out.take_all(), key=lambda r: r["source"])
    return pa.table({
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_unpivot(sf_dir: str):
    """Pivot → UNPIVOT round-trip: the daily event-type count matrix melted
    back to long form (date, metric, n), zero cells preserved — unpivot is a
    zero-shuffle vectorized melt (pipelines/behavior.py:unpivot)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import (
        pivot_counts,
        unpivot,
    )

    types = ["click", "error", "purchase", "signup", "view"]

    def add_date(batch: pa.Table) -> pa.Table:
        return pa.table({
            "date": pc.strftime(batch.column("ts"), format="%Y-%m-%d"),
            "event_type": batch.column("event_type"),
        })

    wide = pivot_counts(
        _events(sf_dir, ["ts", "event_type"]).map_batches(
            add_date, batch_format="pyarrow"),
        "date", "event_type", types, prefix="n_")
    out = unpivot(wide, ["date"], [f"n_{t}" for t in types],
                  var_name="metric", value_name="n", var_labels=types)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["date"], r["metric"]))
    return pa.table({
        "date": pa.array([r["date"] for r in rows], pa.string()),
        "metric": pa.array([r["metric"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_corr_by_flag(sf_dir: str):
    """Grouped Pearson corr + sample covariance from mergeable moment sums —
    one keyed shuffle of six-number rows (pipelines/statagg.py:corr_by_key)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.statagg import corr_by_key

    li = ray.data.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_returnflag", "l_quantity", "l_discount"])
    out = corr_by_key(li, "l_returnflag", "l_quantity", "l_discount")
    tbl = pa.Table.from_pylist(out.take_all())
    tbl = _round_col(_round_col(tbl, "corr", 9), "covar_samp", 9)
    return tbl.select(["l_returnflag", "corr", "covar_samp"])


def _q_median_by_type(sf_dir: str):
    """EXACT median over a continuous domain — distributed sort + positional
    pick, no bounded-distinct assumption (pipelines/statagg.py:median_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import median_by_key

    out = median_by_key(_events(sf_dir, ["event_type", "value"]),
                        "event_type", "value", out_col="med")
    return _round_col(pa.Table.from_pylist(out.take_all()), "med", 9)


def _q_string_agg_purchases(sf_dir: str):
    """Ordered per-group concatenation — sort + per-block run partials +
    block-ordered merge (pipelines/statagg.py:string_agg_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import string_agg_by_key

    ev = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"]).filter(
        expr="event_type == 'purchase'")
    out = string_agg_by_key(ev, "user_id", "event_id", ["ts", "event_id"],
                            sep=",", out_col="agg")
    return pa.Table.from_pylist(out.take_all())


def _q_fuzzy_name_pairs(sf_dir: str):
    """Edit-distance<=1 pair join via deletion-neighborhood (FastSS) blocking
    — linear shuffle volume instead of the O(n^2) cross join the oracle runs
    (pipelines/fuzzy.py:fuzzy_pairs)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.fuzzy import fuzzy_pairs

    cust = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey", "c_name"])
    return pa.Table.from_pylist(
        fuzzy_pairs(cust, "c_custkey", "c_name").take_all())


def _q_except_all_viewers(sf_dir: str):
    """Bag difference (EXCEPT ALL) via signed multiplicities — one keyed
    shuffle of per-block signed counts (pipelines/bagops.py:except_all)."""
    from insurance_pdf_extractor_ray.pipelines.bagops import except_all

    a = _events(sf_dir, ["user_id", "event_type"]).filter(
        expr="event_type == 'view'").select_columns(["user_id"])
    b = _events(sf_dir, ["user_id", "event_type"]).filter(
        expr="event_type == 'click'").select_columns(["user_id"])
    return pa.Table.from_pylist(except_all(a, b, ["user_id"]).take_all())


def _q_bigram_top100(sf_dir: str):
    """Top-100 word bigrams — map-side n-gram pre-count (blocks ship
    distinct grams, not token streams), one keyed combine, sort-limit
    (pipelines/tfidf.py:ngram_counts)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import ngram_counts

    out = ngram_counts(_documents(sf_dir, ["doc_id", "text"]),
                       "text", "doc_id", n=2, k=100)
    rows = out.take_all()
    rows.sort(key=lambda r: (-r["n"], r["ngram"]))
    return pa.table({
        "bigram": pa.array([r["ngram"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_cooccur_event_types(sf_dir: str):
    """Per-user event-type co-occurrence counts — distinct-pair shuffle,
    bounded per-key triu pair explode, final keyed count
    (pipelines/behavior.py:cooccurrence_pairs)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import cooccurrence_pairs

    out = cooccurrence_pairs(_events(sf_dir, ["user_id", "event_type"]),
                             "user_id", "event_type")
    rows = sorted(out.take_all(), key=lambda r: (r["item_a"], r["item_b"]))
    return pa.table({
        "item_a": pa.array([r["item_a"] for r in rows], pa.string()),
        "item_b": pa.array([r["item_b"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_lang_entropy_by_source(sf_dir: str):
    """Shannon entropy of the language mix per source — one (source, lang)
    count shuffle, vectorized entropy over the bounded table
    (pipelines/analytics.py:entropy_by)."""
    from insurance_pdf_extractor_ray.pipelines.analytics import entropy_by

    t = entropy_by(_documents(sf_dir, ["source", "lang"]), "source", "lang")
    idx = pc.sort_indices(t, sort_keys=[("source", "ascending")])
    return t.take(idx)


def _q_event_transitions(sf_dir: str):
    """Markov transition counts over each user's time-ordered event stream —
    one keyed shuffle emitting per-key partial (from, to) counts, tiny final
    combine (pipelines/behavior.py:transition_counts)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import transition_counts

    out = transition_counts(
        _events(sf_dir, ["event_id", "user_id", "event_type", "ts"]),
        "user_id", "event_type", "ts", order_tiebreak="event_id")
    rows = sorted(out.take_all(),
                  key=lambda r: (r["from_item"], r["to_item"]))
    return pa.table({
        "from_type": pa.array([r["from_item"] for r in rows], pa.string()),
        "to_type": pa.array([r["to_item"] for r in rows], pa.string()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_debounce_events(sf_dir: str):
    """Clickstream de-bounce: drop rows repeating the user's previous event
    type within 60s — one keyed shuffle, vectorized shifted compares
    (pipelines/windows.py:debounce_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.windows import debounce_by_key

    out = debounce_by_key(
        _events(sf_dir, ["event_id", "user_id", "event_type", "ts"]),
        "user_id", "ts", "event_type", gap=60_000_000,
        order_tiebreak="event_id")
    rows = sorted(out.select_columns(
        ["event_id", "user_id", "event_type"]).take_all(),
        key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
    })


def _q_entity_components(sf_dir: str):
    """Entity resolution: nation-blocked edit-distance<=1 name edges ->
    connected components (root = min custkey).  FastSS pair generation, two
    edge-bounded dim joins for the block filter, union-find / label-
    propagation closure (pipelines/fuzzy.py:entity_components)."""
    from insurance_pdf_extractor_ray.pipelines.fuzzy import entity_components

    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey"])
    out = entity_components(cust, "c_custkey", "c_name",
                            block_col="c_nationkey")
    rows = sorted(out.take_all(), key=lambda r: r["id"])
    return pa.table({
        "id": pa.array([r["id"] for r in rows], pa.int64()),
        "root": pa.array([r["root"] for r in rows], pa.int64()),
    })


def _round_half_away(x: float, nd: int) -> float:
    """DuckDB ROUND semantics (half away from zero) — Python round() is
    banker's and diverges on exact .5 boundaries."""
    m = 10.0 ** nd
    import math
    return math.copysign(math.floor(abs(x) * m + 0.5), x) / m


def _q_vector_centroids(sf_dir: str):
    """Per-label mean embedding (label, dim, centroid) — per-block
    sum-vector/count partials via one zero-copy reshape + np.add.at, one
    tiny keyed combine (pipelines/similarity.py:group_centroids)."""
    from insurance_pdf_extractor_ray.pipelines.similarity import group_centroids

    emb = _read(sf_dir, "embeddings", ["embedding", "label"])
    t = group_centroids(emb, "embedding", "label")
    cent = [_round_half_away(v, 6) for v in t.column("centroid").to_pylist()]
    return pa.table({
        "label": t.column("label").cast(pa.int32()),
        "dim": t.column("dim"),
        "centroid": pa.array(cent, pa.float64()),
    })


def _q_quality_audit(sf_dir: str):
    """Data-quality expectations over documents — every rule evaluated in
    one pass, blocks ship (rule, n_bad, n_rows) partials only
    (pipelines/profile.py:quality_audit)."""
    from insurance_pdf_extractor_ray.pipelines.profile import quality_audit

    known = {"en", "fr", "es", "de", "zh"}

    rules = [
        ("empty_text", lambda b: pc.or_kleene(
            pc.is_null(b.column("text")),
            pc.equal(b.column("text"), ""))),
        ("len_mismatch", lambda b: pc.not_equal(
            b.column("n_chars"), pc.utf8_length(b.column("text")))),
        ("unknown_lang", lambda b: pc.invert(pc.is_in(
            b.column("lang"), value_set=pa.array(sorted(known))))),
        ("oversize", lambda b: pc.greater(b.column("n_chars"), 500)),
    ]
    return quality_audit(
        _documents(sf_dir, ["text", "lang", "n_chars"]), rules)


def _q_events_in_outages(sf_dir: str):
    """Keyless point-in-interval join: every event falling inside any
    10-minute outage window opened by an error event — intervals replicate
    to the epoch buckets they overlap, points go to one bucket, one keyed
    shuffle + vectorized in-group mask (pipelines/joins.py:range_join,
    by=None path)."""
    from insurance_pdf_extractor_ray.pipelines.joins import range_join

    ev = _events(sf_dir, ["event_id", "ts", "event_type"])

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "ts_us": t.column("ts").cast(pa.int64()),
        })

    points = ev.map_batches(to_us, batch_format="pyarrow")

    def windows(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("event_type"), "error"))
        start = t.column("ts").cast(pa.int64())
        return pa.table({
            "outage_id": t.column("event_id"),
            "start_us": start,
            "end_us": pc.add(start, 600_000_000),
        })

    ivals = ev.map_batches(windows, batch_format="pyarrow")
    out = range_join(points, ivals, on="ts_us", start_col="start_us",
                     end_col="end_us", epoch=600_000_000,
                     interval_cols=["outage_id"])
    rows = sorted(
        ((r["event_id"], r["outage_id"]) for r in
         out.select_columns(["event_id", "outage_id"]).take_all()))
    return pa.table({
        "event_id": pa.array([r[0] for r in rows], pa.int64()),
        "outage_id": pa.array([r[1] for r in rows], pa.int64()),
    })


def _q_apply_changes_balances(sf_dir: str):
    """CDC MERGE INTO: fold the event log into customer balances — latest
    change per key (compaction shuffle, <=1 row/key/block), ONE keyed
    full-outer join, vectorized delete/upsert/passthrough resolution
    (pipelines/cdc.py:apply_changes)."""
    from insurance_pdf_extractor_ray.pipelines.cdc import apply_changes

    base = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    changes = _events(sf_dir,
                      ["user_id", "ts", "event_id", "event_type", "value"])
    out = apply_changes(base, changes, "c_custkey", "user_id",
                        order_by=["ts", "event_id"], op_col="event_type",
                        payload_map={"value": "c_acctbal"},
                        delete_op="error")
    rows = sorted(out.take_all(), key=lambda r: r["c_custkey"])
    return pa.table({
        "c_custkey": pa.array([r["c_custkey"] for r in rows], pa.int64()),
        "c_acctbal": pa.array([r["c_acctbal"] for r in rows], pa.float64()),
    })


def _customer_name_graph(sf_dir: str):
    """Symmetrized nation-blocked lev<=1 customer-name edge list — shared
    by the PageRank-family queries (same derivation as entity_components:
    fuzzy pairs + block dim joins, empty-block hygiene between them)."""
    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.fuzzy import fuzzy_pairs

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    pairs = drop_empty_blocks(
        fuzzy_pairs(cust.select_columns(["c_custkey", "c_name"]),
                    "c_custkey", "c_name"),
        empty_schema=pa.schema([("id_a", pa.int64()),
                                ("id_b", pa.int64())]))
    P = _join_partitions()
    dim = cust.select_columns(["c_custkey", "c_nationkey"])
    pairs = pairs.join(dim, join_type="inner", num_partitions=P,
                       on=("id_a",), right_on=("c_custkey",))
    pairs = drop_empty_blocks(
        pairs, empty_schema=pa.schema([
            ("id_a", pa.int64()), ("id_b", pa.int64()),
            ("c_custkey", pa.int64()), ("c_nationkey", pa.int32())]))
    pairs = pairs.join(dim, join_type="inner", num_partitions=P,
                       on=("id_b",), right_on=("c_custkey",),
                       right_suffix="_rb")
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.equal(t.column("c_nationkey"),
                                    t.column("c_nationkey_rb")))
                   .select(["id_a", "id_b"]),
        batch_format="pyarrow")
    return pairs.map_batches(
        lambda t: pa.table({
            "src": pa.concat_arrays([t.column("id_a").combine_chunks(),
                                     t.column("id_b").combine_chunks()]),
            "dst": pa.concat_arrays([t.column("id_b").combine_chunks(),
                                     t.column("id_a").combine_chunks()])}),
        batch_format="pyarrow")


def _q_name_pagerank(sf_dir: str):
    """PageRank (3 synchronous iterations, d=0.85) over the nation-blocked
    lev<=1 customer-name graph — per round ONE keyed join (ranks onto the
    materialized edge list) + one keyed combine; the oracle unrolls the same
    three iterations in SQL (pipelines/graph.py:pagerank)."""
    from insurance_pdf_extractor_ray.pipelines.graph import pagerank

    sym = _customer_name_graph(sf_dir)
    ranks = pagerank(sym, n_iter=3, damping=0.85)
    rows = sorted(ranks.take_all(), key=lambda r: r["id"])
    return pa.table({
        "id": pa.array([r["id"] for r in rows], pa.int64()),
        "rank": pa.array([_round_away(r["rank"], 9) for r in rows],
                         pa.float64()),
    })


def _q_decayed_user_value(sf_dir: str):
    """Recency-weighted engagement: exp-decayed value sum per user anchored
    at the user's latest event — decay factored into two plain combinable
    aggregates, map-side partials only
    (pipelines/analytics.py:decayed_sum_by)."""
    from insurance_pdf_extractor_ray.pipelines.analytics import decayed_sum_by

    # tau = 1 day; t0 = 2024-01-01 UTC (events start there)
    t = decayed_sum_by(
        _events(sf_dir, ["user_id", "ts", "value"]),
        "user_id", "ts", "value",
        tau_us=86_400_000_000.0, t0_us=1_704_067_200_000_000, nd=6)
    return pa.table({
        "user_id": t.column("user_id").cast(pa.int64()),
        "decayed_sum": t.column("decayed_sum"),
    })


def _q_star_revenue(sf_dir: str):
    """Star-schema rollup orders→customer→nation→region: aggregate-below-
    join (fact reduced to per-custkey rows BEFORE any join), hash-shuffle
    bridge join, broadcast leaf dims (pipelines/joins.py:star_aggregate)."""
    from insurance_pdf_extractor_ray.pipelines.joins import star_aggregate

    out = star_aggregate(
        _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]),
        "o_custkey", "o_totalprice",
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]), "c_custkey",
        dims=[
            (_read(sf_dir, "nation", ["n_nationkey", "n_regionkey"]),
             "c_nationkey", "n_nationkey", ["n_regionkey"]),
            (_read(sf_dir, "region", ["r_regionkey", "r_name"]),
             "n_regionkey", "r_regionkey", ["r_name"]),
        ],
        group_by=["r_name"], total_alias="revenue", count_alias="n_orders")
    rows = sorted(out.take_all(), key=lambda r: r["r_name"])
    t = pa.table({
        "r_name": pa.array([r["r_name"] for r in rows], pa.string()),
        "revenue": pa.array([r["revenue"] for r in rows], pa.float64()),
        "n_orders": pa.array([r["n_orders"] for r in rows], pa.int64()),
    })
    return _round_col(t, "revenue", 2)


def _q_cumulative_daily_value(sf_dir: str):
    """Running daily totals — aggregate-first (one keyed shuffle to #days
    rows), prefix sum over the bounded sorted result
    (pipelines/analytics.py:cumulative_daily)."""
    from insurance_pdf_extractor_ray.pipelines.analytics import cumulative_daily

    t = cumulative_daily(_events(sf_dir, ["ts", "value"]), "ts", "value")
    return _round_col(t, "cum_total", 4)


def _q_weighted_sample(sf_dir: str):
    """Deterministic weighted (by n_chars) sample of 100 docs — A-Res
    reservoir keys from the Knuth hash, map-side top-k, k x blocks merge
    (pipelines/sampling.py:weighted_sample_k)."""
    from insurance_pdf_extractor_ray.pipelines.sampling import weighted_sample_k

    out = weighted_sample_k(_documents(sf_dir, ["doc_id", "n_chars"]),
                            "doc_id", "n_chars", k=100, seed=3)
    rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
    })


def _q_chunk_documents(sf_dir: str):
    """Sliding-window chunking (200 chars, 40 overlap) — zero-shuffle
    vectorized polars explode (pipelines/packing.py:chunk_text).  The chunk
    text is returned verbatim so the driver's hash check is char-exact
    against the substr oracle."""
    from insurance_pdf_extractor_ray.pipelines.packing import chunk_text

    out = chunk_text(_documents(sf_dir, ["doc_id", "text"]),
                     "doc_id", "text", size=200, overlap=40)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["doc_id"], r["chunk_id"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "chunk_id": pa.array([r["chunk_id"] for r in rows], pa.int64()),
        "chunk_text": pa.array([r["chunk_text"] for r in rows], pa.string()),
    })


def _q_dense_rank_values(sf_dir: str):
    """DENSE_RANK over the distinct (event_type, value) pairs, top-100 per
    type — map-side pair dedup, one composite shuffle, per-key rank over the
    bounded distinct-value histogram (pipelines/rankagg.py:dense_rank_by)."""
    from insurance_pdf_extractor_ray.pipelines.rankagg import dense_rank_by

    out = dense_rank_by(_events(sf_dir, ["event_type", "value"]),
                        "event_type", "value", descending=True, max_rank=100)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["event_type"], r["drank"]))
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "value": pa.array([r["value"] for r in rows], pa.float64()),
        "drank": pa.array([r["drank"] for r in rows], pa.int64()),
    })


def _r_cents_half_away(x):
    """Vectorized round-half-away to integer cents, exact for x >= 0
    (trunc-fraction compare — no floor(x+0.5) representability edge)."""
    import numpy as np

    q = x * 100.0
    tq = np.trunc(q)
    return (tq + (q - tq >= 0.5)).astype(np.int64)


def _q_q1_pricing_summary(sf_dir: str):
    """TPC-H Q1 analog: lineitem pricing summary by (returnflag, linestatus)
    with a shipdate predicate — per-batch two-key Arrow group_by partials,
    ONE tiny keyed combine (integer cents, reduction-order-exact)."""
    import pyarrow.compute as pc
    from ray.data.aggregate import Sum

    cutoff = pa.scalar(np.datetime64("1999-01-01", "us"),
                       pa.timestamp("us"))

    def partial(t: pa.Table) -> pa.Table:
        t = t.filter(pc.less(t.column("l_shipdate"), cutoff))
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        base = pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "_q": pa.array(_r_cents_half_away(qty), pa.int64()),
            "_b": pa.array(_r_cents_half_away(ep), pa.int64()),
            "_d": pa.array(_r_cents_half_away(ep * (1.0 - dc)), pa.int64()),
            "_n": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
        })
        return base.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("_q", "sum"), ("_b", "sum"), ("_d", "sum"), ("_n", "sum")]
        ).rename_columns(["l_returnflag", "l_linestatus",
                          "_q", "_b", "_d", "_n"])

    ds = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_linestatus", "l_shipdate", "l_quantity",
                "l_extendedprice", "l_discount"])
    agg = (ds.map_batches(partial, batch_format="pyarrow")
           .groupby(["l_returnflag", "l_linestatus"])
           .aggregate(Sum("_q", alias_name="sum_qty_c"),
                      Sum("_b", alias_name="sum_base_c"),
                      Sum("_d", alias_name="sum_disc_c"),
                      Sum("_n", alias_name="n")))
    rows = agg.take_all()
    rows.sort(key=lambda r: (r["l_returnflag"], r["l_linestatus"]))
    return pa.table({
        "l_returnflag": pa.array([r["l_returnflag"] for r in rows],
                                 pa.string()),
        "l_linestatus": pa.array([r["l_linestatus"] for r in rows],
                                 pa.string()),
        "sum_qty_c": pa.array([r["sum_qty_c"] for r in rows], pa.int64()),
        "sum_base_c": pa.array([r["sum_base_c"] for r in rows], pa.int64()),
        "sum_disc_c": pa.array([r["sum_disc_c"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_promo_nation_profit(sf_dir: str):
    """TPC-H Q9-lite: discounted revenue of PROMO parts per supplier nation
    — PROMO part-key set broadcast into a map-side filter, revenue
    pre-aggregated per suppkey (ONE keyed combine over 8-byte keys),
    supplier->nation resolved driver-side (two tiny dims), final
    nation-name reduce on <=25 rows.  Aggregate-below-join throughout:
    the lineitem stream is never joined row-wise."""
    import ray
    from ray.data.aggregate import Sum

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])
    promo = part.filter(expr="p_type == 'PROMO'").take_all()
    promo_keys = np.sort(np.array([r["p_partkey"] for r in promo], np.int64))
    pref = ray.put(promo_keys)

    def partial(t: pa.Table, keys_ref) -> pa.Table:
        keys = ray.get(keys_ref)
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        m = np.isin(pk, keys)
        t = t.filter(pa.array(m))
        ep = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        dc = t.column("l_discount").to_numpy(zero_copy_only=False)
        base = pa.table({
            "l_suppkey": t.column("l_suppkey"),
            "_r": pa.array(_r_cents_half_away(ep * (1.0 - dc)), pa.int64()),
        })
        return base.group_by(["l_suppkey"]).aggregate(
            [("_r", "sum")]).rename_columns(["l_suppkey", "_r"])

    li = _read(sf_dir, "lineitem",
               ["l_partkey", "l_suppkey", "l_extendedprice", "l_discount"])
    per_supp = (li.map_batches(partial, fn_args=(pref,),
                               batch_format="pyarrow")
                .groupby("l_suppkey").aggregate(Sum("_r", alias_name="rev")))

    sup = {r["s_suppkey"]: r["s_nationkey"] for r in
           _read(sf_dir, "supplier", ["s_suppkey", "s_nationkey"]).take_all()}
    nat = {r["n_nationkey"]: r["n_name"] for r in
           _read(sf_dir, "nation", ["n_nationkey", "n_name"]).take_all()}
    totals: dict = {}
    for r in per_supp.take_all():
        name = nat[sup[r["l_suppkey"]]]
        totals[name] = totals.get(name, 0) + int(r["rev"])
    names = sorted(totals)
    return pa.table({
        "n_name": pa.array(names, pa.string()),
        "rev_c": pa.array([totals[n] for n in names], pa.int64()),
    })


def _q_regr_by_flag(sf_dir: str):
    """Grouped simple linear regression — regr_slope/intercept/r2/count of
    l_quantity on l_discount per returnflag, from the corr moment partials
    (one keyed shuffle of O(keys) six-number rows)
    (pipelines/statagg.py:regr_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import regr_by_key

    out = regr_by_key(
        _read(sf_dir, "lineitem",
              ["l_returnflag", "l_discount", "l_quantity"]),
        "l_returnflag", "l_discount", "l_quantity")
    rows = out.take_all()
    rows.sort(key=lambda r: r["l_returnflag"])
    return pa.table({
        "l_returnflag": pa.array([r["l_returnflag"] for r in rows],
                                 pa.string()),
        "slope": pa.array([round(r["slope"], 9) for r in rows], pa.float64()),
        "intercept": pa.array([round(r["intercept"], 9) for r in rows],
                              pa.float64()),
        "r2": pa.array([round(r["r2"], 9) for r in rows], pa.float64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
    })


def _q_snapshot_diff_users(sf_dir: str):
    """Change-data-feed between two snapshot versions: latest
    (event_type, cents) per user before the corpus midpoint vs latest
    overall — insert/update/delete classification, unchanged keys drop out
    (pipelines/cdc.py:snapshot_diff over rankagg.latest_by_key snapshots)."""
    import pyarrow.compute as pc

    from insurance_pdf_extractor_ray.pipelines.cdc import snapshot_diff
    from insurance_pdf_extractor_ray.pipelines.rankagg import latest_by_key

    ev = _events(sf_dir, ["user_id", "ts", "event_id", "event_type", "value"])

    def prep(t: pa.Table) -> pa.Table:
        cents = pc.cast(pc.round(pc.multiply(t.column("value"),
                                             pa.scalar(100.0))), pa.int64())
        return pa.table({
            "user_id": t.column("user_id"),
            "_ts": pc.cast(t.column("ts"), pa.int64()),
            "event_id": t.column("event_id"),
            "event_type": t.column("event_type"),
            "cents": cents,
        })

    e = ev.map_batches(prep, batch_format="pyarrow").materialize()

    def ts_bounds(t: pa.Table) -> pa.Table:
        v = t.column("_ts").to_numpy(zero_copy_only=False)
        return pa.table({"mn": pa.array([int(v.min())], pa.int64()),
                         "mx": pa.array([int(v.max())], pa.int64())})

    bounds = e.map_batches(ts_bounds, batch_format="pyarrow").take_all()
    cut = (min(r["mn"] for r in bounds) + max(r["mx"] for r in bounds)) // 2

    def before(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("_ts"), pa.scalar(cut, pa.int64())))

    cols = ["user_id", "_ts", "event_id", "event_type", "cents"]
    old = latest_by_key(e.map_batches(before, batch_format="pyarrow"),
                        "user_id", order_by=["_ts", "event_id"],
                        descending=[True, True], columns=cols)
    new = latest_by_key(e, "user_id", order_by=["_ts", "event_id"],
                        descending=[True, True], columns=cols)
    out = snapshot_diff(old, new, "user_id", ["event_type", "cents"])
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "change": pa.array([r["change"] for r in rows], pa.string()),
        "old_event_type": pa.array([r["old_event_type"] for r in rows],
                                   pa.string()),
        "new_event_type": pa.array([r["new_event_type"] for r in rows],
                                   pa.string()),
        "old_cents": pa.array([r["old_cents"] for r in rows], pa.int64()),
        "new_cents": pa.array([r["new_cents"] for r in rows], pa.int64()),
    })


def _q_latest_event_per_user(sf_dir: str):
    """Log compaction — latest event row per user (ts desc, event_id desc
    tiebreak): k=1 grouped top-k, ≤ 1 candidate per key per block crosses
    the shuffle (pipelines/rankagg.py:latest_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.rankagg import latest_by_key

    out = latest_by_key(
        _events(sf_dir, ["user_id", "ts", "event_id", "event_type", "value"]),
        "user_id", order_by=["ts", "event_id"], descending=[True, True],
        columns=["user_id", "ts", "event_id", "event_type", "value"])
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "value": pa.array([r["value"] for r in rows], pa.float64()),
    })


def _q_intersect_all_engaged(sf_dir: str):
    """Bag intersection (INTERSECT ALL) via two-column per-block counts —
    one keyed shuffle, min(sum_a, sum_b) re-expansion
    (pipelines/bagops.py:intersect_all)."""
    from insurance_pdf_extractor_ray.pipelines.bagops import intersect_all

    a = _events(sf_dir, ["user_id", "event_type"]).filter(
        expr="event_type == 'view'").select_columns(["user_id"])
    b = _events(sf_dir, ["user_id", "event_type"]).filter(
        expr="event_type == 'click'").select_columns(["user_id"])
    return pa.Table.from_pylist(intersect_all(a, b, ["user_id"]).take_all())


def _q_cube_source_lang(sf_dir: str):
    """GROUP BY CUBE(source, lang) counts — one finest-level keyed shuffle;
    all 4 grouping sets re-aggregate the bounded finest table
    (pipelines/sketches.py:cube_counts)."""
    from insurance_pdf_extractor_ray.pipelines.sketches import cube_counts

    return cube_counts(_documents(sf_dir, ["source", "lang"]),
                       ["source", "lang"])


def _q_salted_sum(sf_dir: str):
    """Two-phase hot-key-salted SUM — identical result to plain GROUP BY,
    which is exactly what the oracle runs (pipelines/bagops.py:salted_sum)."""
    from insurance_pdf_extractor_ray.pipelines.bagops import salted_sum

    out = salted_sum(_events(sf_dir, ["event_type", "value", "event_id"]),
                     "event_type", "value", "event_id", salt=16, alias="total")
    return _round_col(pa.Table.from_pylist(out.take_all()), "total", 6)


def _q_fixed_k_sample(sf_dir: str):
    """Deterministic fixed-k-per-stratum reservoir (Knuth-hash ranking,
    partition-independent) — map-side partial top-k, shuffle carries <=
    k x blocks rows per key (pipelines/sampling.py:stratified_fixed_k)."""
    from insurance_pdf_extractor_ray.pipelines.sampling import stratified_fixed_k

    out = stratified_fixed_k(_events(sf_dir, ["event_type", "event_id"]),
                             "event_type", "event_id", 25, seed=7)
    return pa.Table.from_pylist(
        out.select_columns(["event_type", "event_id"]).take_all())


def _q_bucketed_join(sf_dir: str):
    """SMB-style zero-shuffle join: both sides written hash-bucketed once,
    then one Arrow hash-join task per co-located bucket pair — no exchange
    (pipelines/bucketed.py:bucketed_join).  Arrow join coalesces the key
    (USING semantics), so the oracle projects o_custkey once."""
    import tempfile

    import ray.data

    from insurance_pdf_extractor_ray.pipelines.bucketed import (
        bucketed_join, write_bucketed)

    root = tempfile.mkdtemp(prefix="ipe_bucketed_")
    orders = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                   columns=["o_orderkey", "o_custkey"])
    cust = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey", "c_mktsegment"])
    write_bucketed(orders, os.path.join(root, "orders"), "o_custkey", 16)
    write_bucketed(cust, os.path.join(root, "cust"), "c_custkey", 16)
    out = bucketed_join(os.path.join(root, "orders"), os.path.join(root, "cust"))
    return pa.Table.from_pylist(
        out.take_all()).select(["o_orderkey", "o_custkey", "c_mktsegment"])


def _q_quantiles_exact(sf_dir: str):
    """Exact continuous-domain quantile_cont per key — distributed sort +
    positional pick (pipelines/statagg.py:quantiles_exact_by)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import quantiles_exact_by

    out = quantiles_exact_by(_events(sf_dir, ["event_type", "value"]),
                             "event_type", "value", [0.25, 0.5, 0.75])
    return _round_col(out, "quantile", 9)


def _q_skew_join(sf_dir: str):
    """Hybrid skew-aware join — MG hot-key detection, broadcast path for hot
    keys, hash shuffle for the tail, union (pipelines/joins.py:skew_join).
    hot_threshold=70 puts a real fraction of user_ids on EACH path at
    sf0.01, so both branches are oracle-exercised."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.joins import skew_join

    ev = _events(sf_dir, ["event_id", "user_id"])
    cust = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                 columns=["c_custkey", "c_mktsegment"])
    out = skew_join(ev, cust, on="user_id", right_on="c_custkey",
                    how="inner", hot_threshold=70, mg_k=4096)
    rows = out.take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "c_mktsegment": pa.array([r["c_mktsegment"] for r in rows],
                                 pa.string()),
    })


def _q_percent_rank(sf_dir: str):
    """Per-key percent_rank over a total order — sort + metadata wave +
    broadcast offset probe (pipelines/statagg.py:percent_rank_by)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import percent_rank_by

    out = percent_rank_by(_events(sf_dir, ["event_type", "value", "event_id"]),
                          "event_type", "value", "event_id", out_col="pr")
    tbl = pa.Table.from_pylist(
        out.select_columns(["event_id", "pr"]).take_all())
    return _round_col(tbl, "pr", 9)


def _q_cume_dist(sf_dir: str):
    """Per-key cume_dist over a total order — same sort + metadata wave as
    percent_rank (pipelines/statagg.py:percent_rank_by kind='cume_dist')."""
    from insurance_pdf_extractor_ray.pipelines.statagg import percent_rank_by

    out = percent_rank_by(_events(sf_dir, ["event_type", "value", "event_id"]),
                          "event_type", "value", "event_id", out_col="cd",
                          kind="cume_dist")
    tbl = pa.Table.from_pylist(
        out.select_columns(["event_id", "cd"]).take_all())
    return _round_col(tbl, "cd", 9)


def _q_scd2_user_states(sf_dir: str):
    """SCD-type-2 dimension build from the event change log: per user,
    consecutive repeats of event_type collapse, each surviving change gets
    [valid_from, valid_to) from its own ts to the next change's ts — ONE
    keyed shuffle, vectorized shifted-compare interior
    (pipelines/cdc.py:scd2_intervals)."""
    from insurance_pdf_extractor_ray.pipelines.cdc import scd2_intervals

    out = scd2_intervals(
        _events(sf_dir, ["user_id", "ts", "event_id", "event_type"]),
        "user_id", "ts", ["event_type"], order_tiebreak="event_id")
    rows = sorted(out.take_all(),
                  key=lambda r: (r["user_id"], r["valid_from"]))
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "valid_from": pa.array([r["valid_from"] for r in rows],
                               pa.timestamp("us")),
        "valid_to": pa.array([r["valid_to"] for r in rows],
                             pa.timestamp("us")),
    })


def _q_pushdown_read_orders(sf_dir: str):
    """Predicate-pushdown scan: the row filter rides into the Parquet read
    (row groups pruned on min/max stats — non-matching rows never leave
    storage), then a tiny integer-cent aggregate
    (sources/io.py:read_table(predicate=...))."""
    import pyarrow.compute as pc

    from insurance_pdf_extractor_ray.sources.io import read_table

    ds = read_table(os.path.join(sf_dir, "orders.parquet"),
                    columns=["o_orderkey", "o_totalprice"],
                    predicate=(pc.field("o_totalprice") > 400000.0))

    def cents(t: pa.Table) -> pa.Table:
        c = pc.cast(pc.round(pc.multiply(t.column("o_totalprice"),
                                         pa.scalar(100.0))), pa.int64())
        return pa.table({
            "n": pa.array([t.num_rows], pa.int64()),
            "cents": pa.array([pc.sum(c).as_py() or 0], pa.int64()),
        })

    rows = ds.map_batches(cents, batch_format="pyarrow").take_all()
    return pa.table({
        "n": pa.array([sum(r["n"] for r in rows)], pa.int64()),
        "total_cents": pa.array([sum(r["cents"] for r in rows)], pa.int64()),
    })


def _q_weekly_top_event(sf_dir: str):
    """Composite-key grouped top-k: the single best event per (user, week)
    by (value desc, event_id asc) — synthesized composite key, map-side
    per-key head, ONE bounded keyed shuffle
    (pipelines/rankagg.py:grouped_top_k, k=1)."""
    import pyarrow.compute as pc

    from insurance_pdf_extractor_ray.pipelines.rankagg import grouped_top_k

    week_us = 7 * 86_400_000_000

    def prep(t: pa.Table) -> pa.Table:
        week = pc.divide(pc.cast(t.column("ts"), pa.int64()),
                         pa.scalar(week_us, pa.int64()))
        ck = pc.add(pc.multiply(t.column("user_id"),
                                pa.scalar(1_000_000, pa.int64())), week)
        return pa.table({"_uw": ck, "user_id": t.column("user_id"),
                         "week": week, "event_id": t.column("event_id"),
                         "value": t.column("value")})

    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"]).map_batches(
        prep, batch_format="pyarrow")
    out = grouped_top_k(ds, "_uw", order_by=["value", "event_id"],
                        descending=[True, False], k=1,
                        columns=["_uw", "user_id", "week", "event_id",
                                 "value"])
    rows = out.take_all()
    rows.sort(key=lambda r: (r["user_id"], r["week"]))
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "week": pa.array([r["week"] for r in rows], pa.int64()),
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "value": pa.array([r["value"] for r in rows], pa.float64()),
    })


def _q_quantize_embeddings(sf_dir: str):
    """Per-dim min-max uint8 quantization of the embedding table (4x
    smaller vector storage/shuffles) — dim-sized min/max partials, broadcast
    calibration, float64 arithmetic in the oracle's expression order so
    codes are bit-comparable (pipelines/similarity.py:quantize_embeddings).
    Digest: per-dim (mn, mx, sum of codes)."""
    import numpy as np

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        embedding_matrix,
        quantize_embeddings,
    )

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out, mn, mx = quantize_embeddings(ds)

    def sum_partial(batch: pa.Table) -> pa.Table:
        m = embedding_matrix(batch.column("codes"), dtype=np.int64)
        return pa.table({"s": pa.array([m.sum(axis=0)],
                                       pa.list_(pa.int64()))})

    tot = None
    for r in out.map_batches(sum_partial, batch_format="pyarrow").take_all():
        v = np.asarray(r["s"], np.int64)
        tot = v if tot is None else tot + v
    d = len(mn)
    return pa.table({
        "dim": pa.array(np.arange(1, d + 1), pa.int64()),
        "mn": pa.array(mn, pa.float64()),
        "mx": pa.array(mx, pa.float64()),
        "sum_q": pa.array(tot, pa.int64()),
    })


def _q_range_layout_orders(sf_dir: str):
    """Balanced range-partitioned at-rest layout (Terasort partition step):
    boundaries are exact octile order statistics from the sort-free
    rank-refinement quantiles; per-partition stats read one partition per
    task — the pruned-scan shape (pipelines/rangepart.py)."""
    import tempfile

    from insurance_pdf_extractor_ray.pipelines.rangepart import (
        partition_stats,
        write_range_partitioned,
    )

    path = tempfile.mkdtemp(prefix="ipe_rangepart_")
    write_range_partitioned(
        _read(sf_dir, "orders", ["o_orderkey", "o_totalprice"]),
        path, "o_totalprice", 8)
    rows = partition_stats(path).take_all()
    rows.sort(key=lambda r: r["part"])
    return pa.table({
        "part": pa.array([r["part"] for r in rows], pa.int64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "mn": pa.array([r["mn"] for r in rows], pa.float64()),
        "mx": pa.array([r["mx"] for r in rows], pa.float64()),
    })


def _q_rolling_dau(sf_dir: str):
    """Trailing-7-day distinct users per day (the DAU/WAU primitive; no
    COUNT(DISTINCT) OVER RANGE in SQL) — distinct-pair pre-reduction,
    bounded x7 map-side explode filtered to the broadcast day set, ONE
    pair-dedup shuffle (pipelines/windows.py:rolling_distinct_days)."""
    from insurance_pdf_extractor_ray.pipelines.windows import (
        rolling_distinct_days,
    )

    out = rolling_distinct_days(_events(sf_dir, ["ts", "user_id"]),
                                "ts", "user_id", window_days=7)
    rows = out.take_all()
    rows.sort(key=lambda r: r["day"])
    return pa.table({
        "day": pa.array([r["day"] for r in rows], pa.int64()),
        "n_distinct": pa.array([r["n_distinct"] for r in rows], pa.int64()),
    })


def _q_events_with_state(sf_dir: str):
    """SCD2 point-in-time lookup join: every purchase event joins the
    user's state dimension row (built from signup/error transitions via
    pipelines/cdc.py:scd2_intervals) valid AT the purchase timestamp —
    half-open [valid_from, valid_to) semantics via integer-microsecond
    end-1, open intervals capped at the max event ts so bucket replication
    stays bounded (pipelines/joins.py:range_join with by=user_id)."""
    import pyarrow.compute as pc

    from insurance_pdf_extractor_ray.pipelines.cdc import scd2_intervals
    from insurance_pdf_extractor_ray.pipelines.joins import range_join

    ev = _events(sf_dir, ["user_id", "ts", "event_id", "event_type"])

    def only(types):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.is_in(t.column("event_type"),
                                     value_set=pa.array(types)))
        return fn

    changes = ev.map_batches(only(["signup", "error"]),
                             batch_format="pyarrow")
    dim = scd2_intervals(changes, "user_id", "ts", ["event_type"],
                         order_tiebreak="event_id")

    points = ev.map_batches(only(["purchase"]), batch_format="pyarrow")

    def ts_max(t: pa.Table) -> pa.Table:
        m = pc.max(pc.cast(t.column("ts"), pa.int64()))
        return pa.table({"m": pa.array([m.as_py() or 0], pa.int64())})

    cap_us = max(r["m"] for r in points.map_batches(
        ts_max, batch_format="pyarrow").take_all())

    def prep_points(t: pa.Table) -> pa.Table:
        return pa.table({
            "event_id": t.column("event_id"),
            "user_id": t.column("user_id"),
            "_ts": pc.cast(t.column("ts"), pa.int64()),
        })

    def prep_iv(t: pa.Table) -> pa.Table:
        vf = pc.cast(t.column("valid_from"), pa.int64())
        vt = pc.subtract(pc.cast(t.column("valid_to"), pa.int64()),
                         pa.scalar(1, pa.int64()))
        vt = pc.coalesce(vt, pa.scalar(int(cap_us), pa.int64()))
        return pa.table({"user_id": t.column("user_id"),
                         "state": t.column("event_type"),
                         "_from": vf, "_end": vt})

    out = range_join(
        points.map_batches(prep_points, batch_format="pyarrow"),
        dim.map_batches(prep_iv, batch_format="pyarrow"),
        on="_ts", start_col="_from", end_col="_end",
        epoch=30 * 86_400 * 1_000_000, by="user_id",
        interval_cols=["state"])
    rows = out.take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "state": pa.array([r["state"] for r in rows], pa.string()),
    })


def _q_cumsum_by_user(sf_dir: str):
    """Per-key expanding running total — SQL SUM() OVER (PARTITION BY ...
    ROWS UNBOUNDED PRECEDING) — on integer cents so the cumulative sum is
    reduction-order-exact (pipelines/windows.py:expanding_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.windows import expanding_by_key

    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        cents = pc.round(pc.multiply(batch.column("value"), 100.0)) \
                  .cast(pa.int64())
        return pa.table({
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts"),
            "event_id": batch.column("event_id"),
            "cents": cents,
        })

    out = expanding_by_key(ds.map_batches(to_cents, batch_format="pyarrow"),
                           "user_id", "ts", "cents",
                           order_tiebreak="event_id")
    rows = sorted(out.select_columns(
        ["event_id", "cum_sum", "cum_n"]).take_all(),
        key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "cum_cents": pa.array([r["cum_sum"] for r in rows], pa.int64()),
        "cum_n": pa.array([r["cum_n"] for r in rows], pa.int64()),
    })


def _q_bloom_semijoin(sf_dir: str):
    """Bloom-prefiltered semi-join: the BUILDING-segment customer keys
    stream into an m-bit filter (constant merge state), probe-side batches
    drop definite non-members before the exact keyed semi-join — runtime
    filtering, the shuffle-volume cut for big-big semi-joins
    (pipelines/bloom.py:bloom_semi_join)."""
    from insurance_pdf_extractor_ray.pipelines.bloom import bloom_semi_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.filter(expr="c_mktsegment == 'BUILDING'") \
               .select_columns(["c_custkey"])
    out = bloom_semi_join(orders, cust, on="o_custkey",
                          right_on="c_custkey", m_bits=1 << 20, k=7)
    rows = sorted(out.take_all(), key=lambda r: r["o_orderkey"])
    return pa.table({
        "o_orderkey": pa.array([r["o_orderkey"] for r in rows], pa.int64()),
        "o_custkey": pa.array([r["o_custkey"] for r in rows], pa.int64()),
    })


def _q_daily_gapfill(sf_dir: str):
    """Calendar gap-fill (resample-to-daily with zero-filled missing days)
    over a sparse event subset — one map-combined groupby, driver merge on
    the day-cardinality aggregate only
    (pipelines/analytics.py:gap_fill_days)."""
    from insurance_pdf_extractor_ray.pipelines.analytics import gap_fill_days

    ds = _events(sf_dir, ["ts", "event_type", "value"])
    sparse = ds.filter(
        expr="event_type == 'purchase' and value > 4.97")
    return gap_fill_days(sparse, "ts", count_alias="n_events")


def _q_full_outer_balances(sf_dir: str):
    """FULL OUTER JOIN coverage: customers against per-user event cents
    totals — unmatched rows survive from BOTH sides with typed nulls
    (Dataset.join full_outer, integer Sum for order-exact totals)."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions

    cust = _read(sf_dir, "customer", ["c_custkey", "c_acctbal"])
    ev = _events(sf_dir, ["user_id", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "cents": pc.round(pc.multiply(batch.column("value"), 100.0))
                       .cast(pa.int64()),
        })

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks

    sums = drop_empty_blocks(
        ev.map_batches(to_cents, batch_format="pyarrow")
          .groupby("user_id").aggregate(Sum("cents", alias_name="total_cents")),
        empty_schema=pa.schema([("user_id", pa.int64()),
                                ("total_cents", pa.int64())]))
    joined = cust.join(sums, join_type="full_outer",
                       num_partitions=_join_partitions(),
                       on=("c_custkey",), right_on=("user_id",))

    def project(t: pa.Table) -> pa.Table:
        names = t.column_names
        ckey = t.column("c_custkey")
        if "user_id" in names:
            ckey = pc.coalesce(ckey, t.column("user_id"))
        return pa.table({
            "id": ckey.cast(pa.int64()),
            "c_acctbal": t.column("c_acctbal"),
            "total_cents": t.column("total_cents"),
        })

    rows = sorted(joined.map_batches(project, batch_format="pyarrow")
                        .take_all(), key=lambda r: r["id"])
    return pa.table({
        "id": pa.array([r["id"] for r in rows], pa.int64()),
        "c_acctbal": pa.array([r["c_acctbal"] for r in rows], pa.float64()),
        "total_cents": pa.array([r["total_cents"] for r in rows], pa.int64()),
    })


def _q_hash_split_stats(sf_dir: str):
    """Deterministic train/val/test assignment (Knuth-hash ranges,
    partition-independent, zero shuffle) aggregated per split — the
    reproducible-eval-split primitive; the oracle re-derives the exact
    mod-2^32 predicate in SQL (pipelines/sampling.py:assign_split)."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.pipelines.sampling import assign_split

    docs = _read(sf_dir, "documents", ["doc_id", "n_chars"])
    out = assign_split(docs, "doc_id", test_rate=0.05, val_rate=0.05,
                       seed=9)
    agg = out.groupby("split").aggregate(
        Count(alias_name="n_docs"),
        Sum("n_chars", alias_name="total_chars"))
    rows = sorted(agg.take_all(), key=lambda r: r["split"])
    return pa.table({
        "split": pa.array([r["split"] for r in rows], pa.string()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
        "total_chars": pa.array([r["total_chars"] for r in rows],
                                pa.int64()),
    })


def _q_anti_join_shuffle(sf_dir: str):
    """Big-big ANTI join kept fully distributed: orders whose customer is
    NOT in the BUILDING segment — right side reduced map-side to distinct
    keys, ONE hash-shuffle left_outer join + null-marker filter; no driver
    key set (pipelines/joins.py:shuffle_anti_join)."""
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_anti_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    cust = cust.filter(expr="c_mktsegment == 'BUILDING'") \
               .select_columns(["c_custkey"])
    out = shuffle_anti_join(orders, cust, on="o_custkey",
                            right_on="c_custkey")
    rows = sorted(out.take_all(), key=lambda r: r["o_orderkey"])
    return pa.table({
        "o_orderkey": pa.array([r["o_orderkey"] for r in rows], pa.int64()),
        "o_custkey": pa.array([r["o_custkey"] for r in rows], pa.int64()),
    })


def _q_range_rolling_user(sf_dir: str):
    """Per-key time-RANGE rolling aggregate — SQL SUM() OVER (PARTITION BY
    user ORDER BY ts RANGE BETWEEN 1 HOUR PRECEDING AND CURRENT ROW) — on
    integer cents; peers (tied timestamps) share a frame so the result is
    deterministic with no tiebreak (pipelines/windows.py:range_rolling_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.windows import (
        range_rolling_by_key,
    )

    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"])

    def to_cents(batch: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": batch.column("user_id"),
            "ts": batch.column("ts"),
            "event_id": batch.column("event_id"),
            "cents": pc.round(pc.multiply(batch.column("value"), 100.0))
                       .cast(pa.int64()),
        })

    out = range_rolling_by_key(
        ds.map_batches(to_cents, batch_format="pyarrow"),
        "user_id", "ts", "cents", range_us=3_600_000_000)
    rows = sorted(out.select_columns(
        ["event_id", "rr_sum", "rr_n"]).take_all(),
        key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "rr_cents": pa.array([r["rr_sum"] for r in rows], pa.int64()),
        "rr_n": pa.array([r["rr_n"] for r in rows], pa.int64()),
    })


def _q_zorder_orders(sf_dir: str):
    """Z-order (Morton) clustering of orders along (o_custkey, o_orderkey):
    map-side bit-interleaved key + ONE distributed sort — the multi-column
    data-layout pass (Delta/Iceberg OPTIMIZE ZORDER BY).  The oracle
    recomputes the identical curve with shift/mask SQL, so the check is
    bit-exact on both the key and the resulting order
    (pipelines/zorder.py:cluster_by_zorder)."""
    from insurance_pdf_extractor_ray.pipelines.zorder import cluster_by_zorder

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    out = cluster_by_zorder(orders, ["o_custkey", "o_orderkey"], bits=16,
                            keep_key=True, tiebreak="o_orderkey")
    rows = out.select_columns(["__z", "o_orderkey"]).take_all()
    return pa.table({
        "zkey": pa.array([r["__z"] for r in rows], pa.int64()),
        "o_orderkey": pa.array([r["o_orderkey"] for r in rows], pa.int64()),
    })


def _q_merged_user_sessions(sf_dir: str):
    """Gaps-and-islands: each event opens a 30-minute activity interval;
    overlapping/touching intervals per user merge into maximal islands —
    one keyed shuffle, maximum.accumulate + reduceat interior
    (pipelines/intervals.py:merge_intervals_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.intervals import (
        merge_intervals_by_key,
    )

    ev = _events(sf_dir, ["user_id", "ts"])

    def to_iv(t: pa.Table) -> pa.Table:
        s = t.column("ts").cast(pa.int64())
        return pa.table({
            "user_id": t.column("user_id"),
            "s_us": s,
            "e_us": pc.add(s, 1_800_000_000),
        })

    out = merge_intervals_by_key(
        ev.map_batches(to_iv, batch_format="pyarrow"),
        "user_id", "s_us", "e_us", count_alias="n_events")
    rows = sorted(out.take_all(),
                  key=lambda r: (r["user_id"], r["s_us"]))
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "s_us": pa.array([r["s_us"] for r in rows], pa.int64()),
        "e_us": pa.array([r["e_us"] for r in rows], pa.int64()),
        "n_events": pa.array([r["n_events"] for r in rows], pa.int64()),
    })


def _q_union_by_name(sf_dir: str):
    """Schema-evolution union: two parquet 'generations' of documents with
    drifted columns unioned BY NAME — driver touches schemas only, every
    batch aligns map-side, zero shuffle
    (pipelines/schemaops.py:union_by_name)."""
    from insurance_pdf_extractor_ray.pipelines.schemaops import union_by_name

    docs = _documents(sf_dir, ["doc_id", "lang", "source", "n_chars"])
    gen1 = docs.filter(expr="lang == 'en'") \
               .select_columns(["doc_id", "source", "n_chars"])
    gen2 = docs.filter(expr="lang != 'en'") \
               .select_columns(["doc_id", "lang"])
    out = union_by_name([gen1, gen2])
    rows = sorted(out.take_all(), key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "n_chars": pa.array([r["n_chars"] for r in rows], pa.int64()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })


def _q_lead_next_value(sf_dir: str):
    """Per-key LEAD — next event's value in the user's timeline (the same
    vectorized shift as LAG with a negative offset;
    pipelines/windows.py:lag_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.windows import lag_by_key

    ds = _events(sf_dir, ["user_id", "ts", "event_id", "value"])
    out = lag_by_key(ds, "user_id", "ts", "value", offset=-1,
                     order_tiebreak="event_id", out_col="lead_value")
    rows = sorted(out.select_columns(["event_id", "lead_value"]).take_all(),
                  key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "lead_value": pa.array([r["lead_value"] for r in rows],
                               pa.float64()),
    })


def _q_gsets_source_lang(sf_dir: str):
    """GROUP BY GROUPING SETS ((source),(lang),()) — the generic grouping
    sets operator rollup/cube are sugar for; one finest-level shuffle, each
    set re-aggregates the bounded finest table
    (pipelines/sketches.py:grouping_sets_counts)."""
    from insurance_pdf_extractor_ray.pipelines.sketches import (
        grouping_sets_counts,
    )

    docs = _documents(sf_dir, ["source", "lang"])
    return grouping_sets_counts(docs, ["source", "lang"],
                                sets=[("source",), ("lang",), ()])


def _q_shuffled_docs_head(sf_dir: str):
    """Reproducible epoch shuffle: deterministic global order by a seeded
    64-bit mix of doc_id (same seed -> same order on any cluster shape),
    first 300 rows — the training-data shuffle primitive; the oracle
    replicates the mix in HUGEINT SQL
    (pipelines/sampling.py:global_shuffle)."""
    from insurance_pdf_extractor_ray.pipelines.sampling import global_shuffle

    docs = _documents(sf_dir, ["doc_id", "source"])
    rows = global_shuffle(docs, "doc_id", seed=13).limit(300).take_all()
    return pa.table({
        "pos": pa.array(range(1, len(rows) + 1), pa.int64()),
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
    })


def _q_kmeans_embeddings(sf_dir: str):
    """Full-data distributed Lloyd k-means (k=8, 5 iters): per-iteration
    one map_batches pass emitting exact int64 fixed-point partials — zero
    shuffle, constant driver state, bit-deterministic across partitioning
    and CPU counts.  Oracle pins the cross-validated output at the
    driver's correctness scale (pipelines/clustering.py:kmeans_lloyd)."""
    import numpy as np

    from insurance_pdf_extractor_ray.pipelines.clustering import kmeans_lloyd

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    cents, sizes, inertia = kmeans_lloyd(emb, k=8, iters=5, seed=0)
    norms = np.sqrt((cents ** 2).sum(axis=1))
    return pa.table({
        "cluster_id": pa.array(range(len(sizes)), pa.int64()),
        "size": pa.array(sizes.tolist(), pa.int64()),
        "centroid_norm": pa.array([round(float(x), 6) for x in norms],
                                  pa.float64()),
    })


def _rev_i4(batch: pa.Table, key: str) -> pa.Table:
    """Per-row revenue extprice*(1-disc) rounded half-up to 4dp, scaled to
    int64 — integer sums are reduction-order-exact and match DuckDB's
    round() bit-for-bit on positive values."""
    price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
    disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
    rev = price * (1.0 - disc) * 10000.0
    return pa.table({
        key: batch.column(key),
        "rev_i4": pa.array(np.floor(rev + 0.5).astype(np.int64), pa.int64()),
    })


def _q_q5_region_revenue(sf_dir: str):
    """TPC-H Q5 analog: revenue by customer nation within region ASIA for
    one order-date year.  Shape: aggregate-below-join (lineitem revenue
    pre-reduced per orderkey BEFORE the big-big join, so the shuffle moves
    distinct orderkeys, not line items), dims resolved by broadcast
    (region->nation->customer chain via ray.put lookups), ONE hash join +
    one small keyed groupby.  Exact int64 cents-of-cents accumulation."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import (
        broadcast_join,
        shuffle_join,
    )

    nation = _read(sf_dir, "nation", ["n_nationkey", "n_name", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"]) \
        .filter(expr="r_name == 'ASIA'")
    nat = broadcast_join(nation, region, on="n_regionkey",
                         right_on="r_regionkey", add_cols=["r_name"],
                         how="inner")
    cust = broadcast_join(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]), nat,
        on="c_nationkey", right_on="n_nationkey", add_cols=["n_name"],
        how="inner")

    lo = int(pd.Timestamp("1996-01-01").value // 1000)
    hi = int(pd.Timestamp("1997-01-01").value // 1000)

    def date_window(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64())
        keep = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(date_window, batch_format="pyarrow")
    # heavily-filtered (one year x one region); rebuilt from non-empty
    # blocks because the selective filters emit zero-column empties that
    # poison Dataset.join's schema resolution (object-store materialize,
    # never driver-resident)
    orders_n = drop_empty_blocks(
        broadcast_join(orders, cust, on="o_custkey", right_on="c_custkey",
                       add_cols=["n_name"], how="inner"),
        empty_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64()),
                                ("n_name", pa.string())]))

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_extendedprice", "l_discount"])
    li_rev = drop_empty_blocks(
        li.map_batches(lambda b: _rev_i4(b, "l_orderkey"),
                       batch_format="pyarrow")
          .groupby("l_orderkey").aggregate(Sum("rev_i4",
                                               alias_name="rev_i4")),
        empty_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("rev_i4", pa.int64())]))
    j = shuffle_join(li_rev, orders_n, on="l_orderkey",
                     right_on="o_orderkey",
                     num_partitions=_join_partitions())
    agg = j.groupby("n_name").aggregate(Sum("rev_i4",
                                            alias_name="revenue_i4"))
    rows = sorted(agg.take_all(), key=lambda r: r["n_name"])
    return pa.table({
        "n_name": pa.array([r["n_name"] for r in rows], pa.string()),
        "revenue_i4": pa.array([r["revenue_i4"] for r in rows], pa.int64()),
    })


def _q_q3_unshipped_topk(sf_dir: str):
    """TPC-H Q3 analog: top-10 unshipped BUILDING-segment orders by
    revenue.  Same aggregate-below-join shape as Q5; the BUILDING customer
    keys prefilter orders via a broadcast semi-join (dimension-sized set —
    the bloom_semi_join path covers the big-big case); the final top-k
    sorts the aggregate-small per-order result on the driver."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import (
        broadcast_semi_join,
        shuffle_join,
    )

    cut = int(pd.Timestamp("1998-06-15").value // 1000)

    def unshipped(t: pa.Table) -> pa.Table:
        return t.filter(pc.greater(t.column("l_shipdate").cast(pa.int64()),
                                   cut))

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_extendedprice",
                                    "l_discount", "l_shipdate"]) \
        .map_batches(unshipped, batch_format="pyarrow")
    li_rev = drop_empty_blocks(
        li.map_batches(lambda b: _rev_i4(b, "l_orderkey"),
                       batch_format="pyarrow")
          .groupby("l_orderkey").aggregate(Sum("rev_i4",
                                               alias_name="revenue_i4")),
        empty_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("revenue_i4", pa.int64())]))

    bkeys = [r["c_custkey"] for r in
             _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
             .filter(expr="c_mktsegment == 'BUILDING'")
             .select_columns(["c_custkey"]).take_all()]

    def open_orders(t: pa.Table) -> pa.Table:
        return t.filter(pc.less(t.column("o_orderdate").cast(pa.int64()),
                                cut))

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_orderdate"]) \
        .map_batches(open_orders, batch_format="pyarrow")
    orders = broadcast_semi_join(orders, "o_custkey", bkeys)

    j = shuffle_join(li_rev, orders, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=_join_partitions())
    rows = j.take_all()  # one row per qualifying order: aggregate-small
    rows.sort(key=lambda r: (-r["revenue_i4"], r["l_orderkey"]))
    top = rows[:10]
    return pa.table({
        "l_orderkey": pa.array([r["l_orderkey"] for r in top], pa.int64()),
        "revenue_i4": pa.array([r["revenue_i4"] for r in top], pa.int64()),
        "o_orderdate": pa.array(
            [pd.Timestamp(r["o_orderdate"]).strftime("%Y-%m-%d")
             for r in top], pa.string()),
    })


def _q_count_min_users(sf_dir: str):
    """Count-Min sketch frequency estimates (pipelines/sketches.py:
    count_min_table) — integer counter merges commute, so the sketch is
    layout-deterministic and the oracle re-derives it EXACTLY in SQL."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.pipelines.sketches import (
        count_min_estimate, count_min_table)

    ds = _events(sf_dir, ["user_id"])
    cm = count_min_table(ds, "user_id", width=512, depth=4)

    def part(batch: pa.Table) -> pa.Table:
        k = batch.column("user_id").to_numpy(zero_copy_only=False)
        k = k[k < 60]
        u, c = np.unique(k, return_counts=True)
        return pa.table({"user_id": pa.array(u, pa.int64()),
                         "_n": pa.array(c.astype(np.int64), pa.int64())})

    rows = (ds.map_batches(part, batch_format="pyarrow")
            .groupby("user_id").aggregate(Sum("_n", alias_name="exact"))
            ).take_all()
    rows.sort(key=lambda r: r["user_id"])
    users = np.array([r["user_id"] for r in rows], np.int64)
    est = count_min_estimate(cm, users, width=512, depth=4)
    return pa.table({
        "user_id": pa.array(users, pa.int64()),
        "est": pa.array(est, pa.int64()),
        "exact": pa.array([r["exact"] for r in rows], pa.int64()),
    })


def _q_bigram_logprob(sf_dir: str):
    """Corpus-bigram LM score per doc, Laplace-smoothed, micro-nat-quantized
    before reduction (pipelines/tfidf.py:bigram_logprob)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import bigram_logprob

    out = bigram_logprob(_documents(sf_dir, ["doc_id", "text"]),
                         "text", "doc_id")
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_bigrams": pa.array([r["n_bigrams"] for r in rows], pa.int64()),
        "bigram_lp_micro": pa.array(
            [r["bigram_lp_micro"] for r in rows], pa.int64()),
    })


def _q_readability(sf_dir: str):
    """Flesch-style readability micro-points per doc — three vectorized RE2
    counting kernels, zero shuffles (pipelines/textpipe.py:readability)."""
    from insurance_pdf_extractor_ray.pipelines.textpipe import readability

    out = readability(_documents(sf_dir, ["doc_id", "text"]),
                      "text", "doc_id")
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_words": pa.array([r["n_words"] for r in rows], pa.int64()),
        "n_sentences": pa.array([r["n_sentences"] for r in rows], pa.int64()),
        "n_syllables": pa.array([r["n_syllables"] for r in rows], pa.int64()),
        "fre_micro": pa.array([r["fre_micro"] for r in rows], pa.int64()),
    })


def _q_char_entropy(sf_dir: str):
    """Per-doc character-distribution Shannon entropy (junk detector) —
    one utf-32 reinterpret + lexsort run-lengths per batch, zero shuffles
    (pipelines/textpipe.py:char_entropy)."""
    from insurance_pdf_extractor_ray.pipelines.textpipe import char_entropy

    out = char_entropy(_documents(sf_dir, ["doc_id", "text"]),
                       "text", "doc_id")
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    tbl = pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_chars_h": pa.array([r["n_chars_h"] for r in rows], pa.int64()),
        "char_entropy": pa.array(
            [r["char_entropy"] for r in rows], pa.float64()),
    })
    return _round_col(tbl, "char_entropy", 6)


def _q_user_event_entropy(sf_dir: str):
    """Per-user event-mix Shannon entropy — map-side (key,cat) pre-counts,
    ONE keyed shuffle of bounded count rows
    (pipelines/statagg.py:entropy_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import entropy_by_key

    out = entropy_by_key(_events(sf_dir, ["user_id", "event_type"]),
                         "user_id", "event_type")
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    tbl = pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "entropy": pa.array([r["entropy"] for r in rows], pa.float64()),
        "n_cats": pa.array([r["n_cats"] for r in rows], pa.int64()),
    })
    return _round_col(tbl, "entropy", 6)


def _q_interarrival(sf_dir: str):
    """Per-user inter-event gap statistics — sorted-multiset adjacent
    differences are tie-order invariant, so the per-key sort needs no
    tiebreak; one keyed shuffle, integer-microsecond exact."""

    def per_user(group: pa.Table) -> pa.Table:
        ts = group.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        ts = np.sort(ts)
        gaps = np.diff(ts)
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "n_events": pa.array([len(ts)], pa.int64()),
            "span_us": pa.array([int(ts[-1] - ts[0])], pa.int64()),
            "max_gap_us": pa.array(
                [int(gaps.max()) if len(gaps) else None], pa.int64()),
        })

    out = (_events(sf_dir, ["user_id", "ts"])
           .groupby("user_id").map_groups(per_user, batch_format="pyarrow"))
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "n_events": pa.array([r["n_events"] for r in rows], pa.int64()),
        "span_us": pa.array([r["span_us"] for r in rows], pa.int64()),
        "max_gap_us": pa.array([r["max_gap_us"] for r in rows], pa.int64()),
    })


def _q_embedding_covariance(sf_dir: str):
    """Distributed dim×dim covariance — int64-quantized co-moment partials
    (exact float32 products), ONE (i,j)-keyed combine of d(d+1)/2-row
    partials; float col derives from the same integers both sides
    (pipelines/similarity.py:covariance_matrix)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        covariance_matrix)

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["embedding"])
    return covariance_matrix(emb, "embedding")


def _q_lang_drift(sf_dir: str):
    """Per-source language-distribution drift (KL bits + chi²) vs the corpus
    marginal — one keyed shuffle of bounded (key,cat) pre-counts
    (pipelines/profile.py:drift_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.profile import drift_by_key

    out = drift_by_key(_documents(sf_dir, ["source", "lang"]),
                       "source", "lang")
    return _round_col(_round_col(out, "kl_bits", 6), "chi2", 6)


def _q_similarity_triangles(sf_dir: str):
    """Neighborhood-coherence audit: exact inner-product threshold graph
    over an id-capped embedding pool (integer-dot quantization — every edge
    SQL-re-derivable), then distributed triangle counting via the canonical
    two-join enumeration (pipelines/graph.py:ip_threshold_graph,
    triangle_stats)."""
    import math

    import ray.data

    from insurance_pdf_extractor_ray.pipelines.graph import (
        ip_threshold_graph, triangle_stats)

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).filter(expr="vec_id < 400")
    edges = ip_threshold_graph(emb, "embedding", "vec_id", tau=0.25)
    rows = triangle_stats(edges).take_all()
    rows.sort(key=lambda r: r["node"])
    cc = [r["clustering"] for r in rows]
    cc = [None if (c is None or math.isnan(c)) else _round_away(c, 6)
          for c in cc]
    return pa.table({
        "node": pa.array([r["node"] for r in rows], pa.int64()),
        "degree": pa.array([r["degree"] for r in rows], pa.int64()),
        "triangles": pa.array([r["triangles"] for r in rows], pa.int64()),
        "clustering": pa.array(cc, pa.float64()),
    })


def _q_bpe_merges(sf_dir: str):
    """BPE tokenizer-merge induction (Sennrich 2016): distributed word
    count (map-side pre-reduce, ONE bounded shuffle) + vocab-bounded driver
    merge loop; greedy-apply semantics proven identical to SQL replace via
    the double-space encoding (pipelines/tfidf.py:bpe_train)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import bpe_train

    return bpe_train(_documents(sf_dir, ["text"]), "text", num_merges=8)


def _bpe_chain_parts(k: int, source: str) -> list:
    """CTE list for unrolled-k BPE over ``source`` (a FROM-able SQL text
    with a ``text`` column).  Per level: weighted adjacent-pair counts over
    the symbol strings, argmax (count desc, pair asc), then a plain
    ``replace`` on the double-space encoding — same greedy left-to-right
    non-overlap semantics as Python ``str.replace`` (run case included).
    CTEs are MATERIALIZED: each level references the previous three times,
    and inlining would re-evaluate the chain exponentially."""
    parts = [f"""tok AS (SELECT unnest(regexp_extract_all(lower(text),
                       '[a-z0-9]+')) AS token FROM ({source})),
wc AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
w0 AS MATERIALIZED (SELECT token, '  ' || array_to_string(
       regexp_split_to_array(token, ''), '  ') || '  ' AS s, c FROM wc)"""]
    sel = []
    for i in range(k):
        parts.append(f"""pc{i} AS MATERIALIZED (SELECT pair, SUM(c) AS pc
  FROM (SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
          j -> sy[j] || ' ' || sy[j + 1])) AS pair, c
        FROM (SELECT list_filter(string_split(s, ' '), x -> x <> '') AS sy,
                     c FROM w{i})) GROUP BY 1),
b{i} AS MATERIALIZED (SELECT pair, pc FROM pc{i}
                      ORDER BY pc DESC, pair ASC LIMIT 1),
w{i + 1} AS MATERIALIZED (SELECT token, replace(s,
     ' ' || string_split((SELECT pair FROM b{i}), ' ')[1] || '  '
         || string_split((SELECT pair FROM b{i}), ' ')[2] || ' ',
     ' ' || replace((SELECT pair FROM b{i}), ' ', '') || ' ') AS s, c
   FROM w{i})""")
        sel.append(f"""SELECT CAST({i} AS BIGINT) AS rank,
  string_split(pair, ' ')[1] AS "left",
  string_split(pair, ' ')[2] AS "right",
  replace(pair, ' ', '') AS merged,
  CAST(pc AS BIGINT) AS pair_count FROM b{i}""")
    return parts, sel


def _bpe_oracle(k: int, mode: str = "merges",
                source: str = "SELECT text FROM documents",
                doc_source: str = "SELECT doc_id, text FROM documents") -> str:
    parts, sel = _bpe_chain_parts(k, source)
    if mode == "apply":
        # token-carrying final table -> pieces per distinct token ->
        # per-doc piece sums over the token explode
        return ("WITH " + ",\n".join(parts) + f""",
pieces AS (SELECT token, len(list_filter(string_split(s, ' '),
                              x -> x <> '')) AS p FROM w{k}),
docs AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                  '[a-z0-9]+')) AS token FROM ({doc_source}))
SELECT d.doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(pieces.p) AS BIGINT) AS n_pieces
FROM docs d JOIN pieces USING (token)
GROUP BY 1 ORDER BY 1""")
    return ("WITH " + ",\n".join(parts) + "\n"
            + "\nUNION ALL\n".join(sel) + "\nORDER BY rank")


def _q_bpe_segment_counts(sf_dir: str):
    """Tokenizer train→apply round trip: learn 8 merges, segment every doc
    with them, count pieces — dictionary-encoded per-batch apply, zero
    shuffles beyond the word count
    (pipelines/tfidf.py:bpe_apply_token_counts)."""
    from insurance_pdf_extractor_ray.pipelines.tfidf import (
        bpe_apply_token_counts, bpe_train)

    docs = _documents(sf_dir, ["doc_id", "text"])
    merges = bpe_train(docs, "text", num_merges=8)
    out = bpe_apply_token_counts(docs, "text", "doc_id", merges)
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64()),
        "n_pieces": pa.array([r["n_pieces"] for r in rows], pa.int64()),
    })


def _q_event_paths(sf_dir: str):
    """Top-20 3-step behavioral paths — per-user ordered window join,
    vectorized slice-and-join inside each group, one path-keyed combine
    (pipelines/behavior.py:path_ngrams)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import path_ngrams

    return path_ngrams(
        _events(sf_dir, ["user_id", "ts", "event_type", "event_id"]),
        "user_id", "ts", "event_type", n=3, tiebreak="event_id", top_k=20)


def _q_activity_gini(sf_dir: str):
    """Gini coefficient of per-user event counts — the partition-skew
    health number (pipelines/statagg.py:gini_of_counts)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import gini_of_counts

    out = gini_of_counts(_events(sf_dir, ["user_id"]), "user_id")
    return _round_col(out, "gini", 9)


def _q_winsorized_value(sf_dir: str):
    """Per-type winsorized mean of the value column — exact quantile_cont
    clip bounds then clipped-moment combine
    (pipelines/statagg.py:winsorized_mean_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import (
        winsorized_mean_by_key)

    out = winsorized_mean_by_key(
        _events(sf_dir, ["event_type", "value"]), "event_type", "value")
    out = _round_col(_round_col(out, "q_lo", 9), "q_hi", 9)
    return _round_col(out, "wmean", 6)


def _q_burstiness(sf_dir: str):
    """Per-user Fano factor (var/mean of daily event counts) — burstiness
    screen; map-side (user, day) pre-counts, ONE bounded shuffle, moment
    math over the bounded count table."""
    from ray.data.aggregate import Sum

    ev = _events(sf_dir, ["user_id", "ts"])

    def day_counts(batch: pa.Table) -> pa.Table:
        day = pc.divide(batch.column("ts").cast(pa.int64()),
                        86_400_000_000)
        t = pa.table({"user_id": batch.column("user_id"), "_day": day})
        g = t.group_by(["user_id", "_day"]).aggregate([([], "count_all")])
        return pa.table({"user_id": g.column("user_id"),
                         "_day": g.column("_day"),
                         "_n": g.column("count_all").cast(pa.int64())})

    counts = (ev.map_batches(day_counts, batch_format="pyarrow")
              .groupby(["user_id", "_day"])
              .aggregate(Sum("_n", alias_name="_n"))).take_all()
    counts.sort(key=lambda r: (r["user_id"], r["_day"]))
    agg: dict = {}
    for r in counts:
        a = agg.setdefault(r["user_id"], [0, 0.0, 0.0])
        a[0] += 1
        a[1] += r["_n"]
        a[2] += r["_n"] * r["_n"]
    users = sorted(agg)
    n_days, fano = [], []
    for u in users:
        k, s1, s2 = agg[u]
        if k > 1:
            var = (s2 - s1 * s1 / k) / (k - 1)
            fano.append(var / (s1 / k))
        else:
            fano.append(None)
        n_days.append(k)
    tbl = pa.table({
        "user_id": pa.array(users, pa.int64()),
        "n_days": pa.array(n_days, pa.int64()),
        "fano": pa.array(fano, pa.float64()),
    })
    return _round_col(tbl, "fano", 6)


def _q_conversion_latency(sf_dir: str):
    """First-view→first-purchase latency per user — conditional per-type
    Min partials, ONE keyed combine, integer-µs exact."""
    from ray.data.aggregate import Min

    ev = _events(sf_dir, ["user_id", "ts", "event_type"])

    def firsts(batch: pa.Table) -> pa.Table:
        t = batch.filter(pc.is_in(batch.column("event_type"),
                                  value_set=pa.array(["view", "purchase"])))
        tt = pa.table({
            "user_id": t.column("user_id"),
            "event_type": t.column("event_type"),
            "_ts": t.column("ts").cast(pa.int64()),
        })
        g = tt.group_by(["user_id", "event_type"]).aggregate([("_ts", "min")])
        return g.rename_columns(["user_id", "event_type", "_ts"])

    rows = (ev.map_batches(firsts, batch_format="pyarrow")
            .groupby(["user_id", "event_type"])
            .aggregate(Min("_ts", alias_name="_ts"))).take_all()
    views, buys = {}, {}
    for r in rows:
        (views if r["event_type"] == "view" else buys)[r["user_id"]] = r["_ts"]
    out = sorted((u, buys[u] - views[u]) for u in views
                 if u in buys and buys[u] >= views[u])
    return pa.table({
        "user_id": pa.array([u for u, _ in out], pa.int64()),
        "latency_us": pa.array([l for _, l in out], pa.int64()),
    })


def _q_q13_custdist(sf_dir: str):
    """TPC-H Q13 analog: distribution of customers by order count,
    zero-order customers included — orders pre-count, one left join onto
    the customer key column, tiny histogram combine."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from ray.data.aggregate import Sum

    orders = _read(sf_dir, "orders", ["o_custkey"])

    def pre(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["o_custkey"]).aggregate([([], "count_all")])
        return pa.table({"c_custkey": g.column("o_custkey"),
                         "_n": g.column("count_all").cast(pa.int64())})

    per_cust = (orders.map_batches(pre, batch_format="pyarrow")
                .groupby("c_custkey").aggregate(Sum("_n", alias_name="_n")))
    cust = _read(sf_dir, "customer", ["c_custkey"])
    joined = cust.join(per_cust, join_type="left_outer", on=("c_custkey",),
                       num_partitions=_join_partitions())

    def hist(batch: pa.Table) -> pa.Table:
        n = pc.fill_null(batch.column("_n"), 0)
        t = pa.table({"c_count": n})
        g = t.group_by(["c_count"]).aggregate([([], "count_all")])
        return pa.table({"c_count": g.column("c_count"),
                         "_d": g.column("count_all").cast(pa.int64())})

    rows = (joined.map_batches(hist, batch_format="pyarrow")
            .groupby("c_count").aggregate(Sum("_d", alias_name="custdist"))
            ).take_all()
    rows.sort(key=lambda r: (-r["custdist"], -r["c_count"]))
    return pa.table({
        "c_count": pa.array([r["c_count"] for r in rows], pa.int64()),
        "custdist": pa.array([r["custdist"] for r in rows], pa.int64()),
    })


def _q_pretrain_prep_bpe(sf_dir: str):
    """Pretrain chain v2: gates -> decontaminate -> dedup -> BPE tokenizer
    TRAINED ON THE SURVIVORS -> piece counts -> packing.  The oracle is
    the full v1 CTE chain extended with the unrolled-BPE chain over the
    survivor set — one SQL pipeline verifies the whole composition."""
    from insurance_pdf_extractor_ray.pipelines.pretrain import pretrain_prep

    docs = _documents(sf_dir, ["doc_id", "text"])

    def _slice(keep_eval: bool):
        def fn(t: pa.Table) -> pa.Table:
            import numpy as np

            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 50 == 0) if keep_eval else (ids % 50 != 0)
            return t.filter(pa.array(m))
        return fn

    out = pretrain_prep(
        docs.map_batches(_slice(False), batch_format="pyarrow"),
        "text", "doc_id",
        eval_ds=docs.map_batches(_slice(True), batch_format="pyarrow"),
        seq_len=1024, bucket=100, tokenizer="bpe", bpe_merges_n=8)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["doc_id"], r["seq_id"]))
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "seq_id": pa.array([r["seq_id"] for r in rows], pa.int64()),
        "start_tok": pa.array([r["start_tok"] for r in rows], pa.int64()),
        "end_tok": pa.array([r["end_tok"] for r in rows], pa.int64()),
    })


def _pretrain_bpe_oracle(k: int = 8) -> str:
    """v1 survivor chain (gates -> decontaminate -> dedup) + unrolled-BPE
    trained over the survivors + piece-count packing, as ONE CTE pipeline."""
    surv_chain = """wn AS (
      SELECT doc_id, text,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw
      FROM documents
    ), corp AS (SELECT * FROM wn WHERE doc_id % 50 <> 0
    ), uni AS (
      SELECT doc_id, count(DISTINCT x) AS nd
      FROM corp, unnest(w) AS u(x) GROUP BY doc_id
    ), bi AS (
      SELECT doc_id, max(CASE WHEN c >= 2 THEN c ELSE 0 END) AS m
      FROM (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g, count(*) AS c
            FROM corp, unnest(generate_series(1, nw - 1)) AS s(i)
            WHERE nw >= 2 GROUP BY doc_id, g) GROUP BY doc_id
    ), tri AS (
      SELECT doc_id, max(CASE WHEN c >= 2 THEN c ELSE 0 END) AS m
      FROM (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g, count(*) AS c
            FROM corp, unnest(generate_series(1, nw - 2)) AS s(i)
            WHERE nw >= 3 GROUP BY doc_id, g) GROUP BY doc_id
    ), gated AS (
      SELECT corp.doc_id FROM corp
      LEFT JOIN uni USING (doc_id) LEFT JOIN bi USING (doc_id)
      LEFT JOIN tri USING (doc_id)
      WHERE (CASE WHEN corp.nw > 0
             THEN round(1 - uni.nd * 1.0 / corp.nw, 6) ELSE 0 END) <= 0.80
        AND round(coalesce(bi.m * 2.0 / corp.nw, 0), 6) <= 0.20
        AND round(coalesce(tri.m * 3.0 / corp.nw, 0), 6) <= 0.18
    ), evg AS (
      SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS gram
      FROM wn, unnest(generate_series(1, nw - 8 + 1)) AS t(i)
      WHERE nw >= 8 AND doc_id % 50 = 0
    ), contam AS (
      SELECT DISTINCT doc_id FROM (
        SELECT c.doc_id, array_to_string(c.w[i:i+7], ' ') AS gram
        FROM corp c JOIN gated USING (doc_id),
             unnest(generate_series(1, c.nw - 8 + 1)) AS t(i)
        WHERE c.nw >= 8)
      WHERE gram IN (SELECT gram FROM evg)
    ), clean AS (
      SELECT c.doc_id, c.text FROM corp c JOIN gated USING (doc_id)
      WHERE c.doc_id NOT IN (SELECT doc_id FROM contam)
    ), winners AS (
      SELECT doc_id FROM (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS m
        FROM clean) WHERE doc_id = m
    ), surv AS MATERIALIZED (
      SELECT c.doc_id, c.text FROM clean c JOIN winners USING (doc_id))"""
    bpe_parts, _ = _bpe_chain_parts(k, "SELECT text FROM surv")
    return ("WITH " + surv_chain + ",\n" + ",\n".join(bpe_parts) + f""",
pieces AS (SELECT token, len(list_filter(string_split(s, ' '),
                              x -> x <> '')) AS p FROM w{k}),
sd AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
              '[a-z0-9]+')) AS token FROM surv),
npc AS (SELECT sd.doc_id, CAST(SUM(pieces.p) AS BIGINT) AS n_pieces
        FROM sd JOIN pieces USING (token) GROUP BY 1),
cum AS (SELECT doc_id, n_pieces,
          CAST(COALESCE(sum(n_pieces) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS BIGINT) AS start_tok
        FROM npc)
SELECT doc_id,
       unnest(generate_series(start_tok // 1024,
                (start_tok + n_pieces - 1) // 1024)) AS seq_id,
       start_tok, start_tok + n_pieces AS end_tok
FROM cum WHERE n_pieces > 0
ORDER BY doc_id, seq_id""")


def _q_embedding_outliers(sf_dir: str):
    """Diagonal-covariance Mahalanobis outliers — two zero-shuffle passes,
    every per-dim term int64-quantized BEFORE the across-dim sum (no float
    SUM-order hazard) (pipelines/similarity.py:mahalanobis_outliers)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        mahalanobis_outliers)

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    return mahalanobis_outliers(emb, "embedding", "vec_id", top_k=25)


def _q_selfjoin_size(sf_dir: str):
    """Count-Min inner-product join-size estimation (AGMS-style) vs the
    exact Σc² self-join cardinality — both integer-exact
    (pipelines/sketches.py:count_min_inner_product)."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.pipelines.sketches import (
        count_min_inner_product, count_min_table)

    ds = _events(sf_dir, ["user_id"])
    cm = count_min_table(ds, "user_id", width=512, depth=4)
    est = count_min_inner_product(cm, cm, width=512, depth=4)

    def part(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["user_id"]).aggregate([([], "count_all")])
        return pa.table({"user_id": g.column("user_id"),
                         "_n": g.column("count_all").cast(pa.int64())})

    rows = (ds.map_batches(part, batch_format="pyarrow")
            .groupby("user_id").aggregate(Sum("_n", alias_name="n"))
            ).take_all()
    exact = sum(r["n"] * r["n"] for r in rows)
    total = sum(r["n"] for r in rows)
    return pa.table({
        "n_rows": pa.array([total], pa.int64()),
        "exact": pa.array([exact], pa.int64()),
        "est": pa.array([est], pa.int64()),
    })


def _q_twap(sf_dir: str):
    """Time-weighted average of the value column per user — each
    value×duration term half-rounded to int64 BEFORE the per-user sum
    (value·µs units), so the reduction is order-proof; final division is
    one mirrored float expression."""

    def per_user(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("ts", "ascending"),
                                                ("event_id", "ascending")])
        group = group.take(idx)
        ts = group.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        v = group.column("value").to_numpy(zero_copy_only=False).astype(
            np.float64)
        span = int(ts[-1] - ts[0])
        if span <= 0:
            return pa.table({"user_id": group.column("user_id").slice(0, 0),
                             "span_us": pa.array([], pa.int64()),
                             "twap_q": pa.array([], pa.int64())})
        dt = np.diff(ts).astype(np.float64)
        terms = v[:-1] * dt
        q = int((-np.floor(-terms + 0.5)).astype(np.int64).sum())
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "span_us": pa.array([span], pa.int64()),
            "twap_q": pa.array([q], pa.int64()),
        })

    out = (_events(sf_dir, ["user_id", "ts", "event_id", "value"])
           .groupby("user_id").map_groups(per_user, batch_format="pyarrow"))
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    q = np.array([r["twap_q"] for r in rows], np.float64)
    span = np.array([r["span_us"] for r in rows], np.float64)
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "span_us": pa.array([r["span_us"] for r in rows], pa.int64()),
        "twap": pa.array(q / span, pa.float64()),
    })


def _q_personalized_pagerank(sf_dir: str):
    """Personalized PageRank (restart mass on custkey%100==0 seeds) over
    the customer-name similarity graph — same one-join-one-combine rounds,
    seed-concentrated restart vector (pipelines/graph.py:pagerank)."""
    from insurance_pdf_extractor_ray.pipelines.graph import pagerank

    keys = pq.read_table(os.path.join(sf_dir, "customer.parquet"),
                         columns=["c_custkey"]).column("c_custkey")
    seeds = [int(k) for k in keys.to_pylist() if k % 100 == 0]
    sym = _customer_name_graph(sf_dir)
    ranks = pagerank(sym, n_iter=3, damping=0.85, restart=seeds)
    rows = sorted(ranks.take_all(), key=lambda r: r["id"])
    return pa.table({
        "id": pa.array([r["id"] for r in rows], pa.int64()),
        "rank": pa.array([_round_away(r["rank"], 9) for r in rows],
                         pa.float64()),
    })


def _q_stopword_coverage(sf_dir: str):
    """Per-doc per-language stopword hit counts (integer-exact) — one
    token explode + one is_in per language, zero shuffles
    (pipelines/textpipe.py:stopword_coverage)."""
    from insurance_pdf_extractor_ray.pipelines.textpipe import (
        stopword_coverage)

    out = stopword_coverage(_documents(sf_dir, ["doc_id", "text"]))
    rows = out.take_all()
    rows.sort(key=lambda r: r["doc_id"])
    cols = {"doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
            "n_tokens": pa.array([r["n_tokens"] for r in rows], pa.int64())}
    for l in ("de", "en", "es", "fr"):
        cols[f"sw_{l}"] = pa.array([r[f"sw_{l}"] for r in rows], pa.int64())
    return pa.table(cols)


def _q_kcore(sf_dir: str):
    """k-core (k=4) of the embedding similarity graph by synchronous
    peeling — fixed 6 rounds, per round one tiny node-keyed combine +
    broadcast edge filter (pipelines/graph.py:kcore)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.graph import (
        ip_threshold_graph, kcore)

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).filter(expr="vec_id < 400")
    edges = ip_threshold_graph(emb, "embedding", "vec_id", tau=0.25)
    return kcore(edges, k=4, rounds=6)


def _stopword_oracle() -> str:
    from insurance_pdf_extractor_ray.functions.textstats import _STOPWORDS

    sums = []
    for l in sorted(_STOPWORDS):
        lst = ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[l]))
        sums.append(f"CAST(SUM(CASE WHEN t IN ({lst}) THEN 1 ELSE 0"
                    f" END) AS BIGINT) AS sw_{l}")
    return ("""
        WITH tok AS (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                              '[a-z0-9]+')) AS t
                     FROM documents)
        SELECT doc_id, COUNT(*) AS n_tokens, """ + ",\n".join(sums)
            + " FROM tok GROUP BY 1 ORDER BY 1")


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled synchronous peeling over the integer-exact similarity
    edges (same edge CTE as similarity_triangles)."""
    parts = ["""q AS (SELECT vec_id,
             unnest(generate_series(1, len(embedding))) - 1 AS i,
             CAST(-floor(-(CAST(unnest(embedding) AS DOUBLE)
                           * 1048576) + 0.5) AS BIGINT) AS qv
           FROM embeddings WHERE vec_id < 400),
s AS (SELECT a.vec_id AS u, b.vec_id AS v, SUM(a.qv * b.qv) AS sim
      FROM q a JOIN q b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2),
e0 AS MATERIALIZED (SELECT u, v FROM s WHERE sim >= 274877906944)"""]
    for i in range(rounds):
        parts.append(f"""d{i} AS MATERIALIZED (
  SELECT node, COUNT(*) AS degree FROM
  (SELECT u AS node FROM e{i} UNION ALL SELECT v FROM e{i}) GROUP BY 1),
k{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE degree >= {k}),
e{i + 1} AS MATERIALIZED (
  SELECT u, v FROM e{i}
  WHERE u IN (SELECT node FROM k{i}) AND v IN (SELECT node FROM k{i}))""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT node, degree FROM d{rounds - 1} WHERE degree >= {k} ORDER BY node""")


def _q_weighted_median(sf_dir: str):
    """Exact lower weighted median per return flag — distributed sort +
    per-(block,key) weight-offset metadata wave + one zero-move pick wave
    (pipelines/statagg.py:weighted_median_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import (
        weighted_median_by_key)

    li = _read(sf_dir, "lineitem",
               ["l_returnflag", "l_extendedprice", "l_quantity"])

    def cast_w(t: pa.Table) -> pa.Table:
        return t.set_column(
            t.schema.get_field_index("l_quantity"), "l_quantity",
            t.column("l_quantity").cast(pa.int64()))

    out = weighted_median_by_key(
        li.map_batches(cast_w, batch_format="pyarrow"),
        "l_returnflag", "l_extendedprice", "l_quantity")
    return out.rename_columns(["l_returnflag", "wmedian"])


def _q_time_in_state(sf_dir: str):
    """Total dwell time per event type: each event owns the interval until
    the user's next event (last event excluded) — per-user vectorized
    diffs, map-side per-type partials, ONE tiny combine; integer-µs."""
    from ray.data.aggregate import Sum

    def per_user(group: pa.Table) -> pa.Table:
        idx = pc.sort_indices(group, sort_keys=[("ts", "ascending"),
                                                ("event_id", "ascending")])
        group = group.take(idx)
        ts = group.column("ts").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        if len(ts) < 2:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "_d": pa.array([], pa.int64())})
        dt = np.diff(ts)
        t = pa.table({"event_type": group.column("event_type").slice(
            0, len(ts) - 1), "_d": pa.array(dt, pa.int64())})
        g = t.group_by(["event_type"]).aggregate([("_d", "sum")])
        return g.rename_columns(["event_type", "_d"])

    out = (_events(sf_dir, ["user_id", "ts", "event_id", "event_type"])
           .groupby("user_id").map_groups(per_user, batch_format="pyarrow")
           .groupby("event_type").aggregate(Sum("_d", alias_name="dwell_us")))
    rows = out.take_all()
    rows.sort(key=lambda r: r["event_type"])
    return pa.table({
        "event_type": pa.array([r["event_type"] for r in rows], pa.string()),
        "dwell_us": pa.array([r["dwell_us"] for r in rows], pa.int64()),
    })


def _q_ks_test(sf_dir: str):
    """Exact two-sample KS statistic (view vs purchase value
    distributions) — one distributed sort + metadata count wave + zero-move
    per-block max wave; tie groups evaluate once, after their last row
    (pipelines/statagg.py:ks_two_sample)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import ks_two_sample

    out = ks_two_sample(_events(sf_dir, ["event_type", "value"]),
                        "value", "event_type", "view", "purchase")
    return _round_col(out, "ks_d", 9)


def _q_roc_auc(sf_dir: str):
    """Exact ROC AUC of `value` ranking purchases above other events —
    map-side per-score combine, one distinct-score groupby shuffle, sorted
    metadata wave; ties get the standard half credit
    (pipelines/evalstats.py:roc_auc)."""
    from insurance_pdf_extractor_ray.pipelines.evalstats import roc_auc

    out = roc_auc(_events(sf_dir, ["event_type", "value"]),
                  "value", "event_type", "purchase")
    return _round_col(out, "auc", 9)


def _q_calibration(sf_dir: str):
    """Reliability-diagram bins of p = value/500 vs observed purchase rate
    — algebraic per-bin aggregate, shuffle bounded by bins × blocks
    (pipelines/evalstats.py:calibration_bins).  The predictor transform is
    one IEEE division, bit-identical to the SQL twin so bin assignment at
    boundaries can't diverge."""
    from insurance_pdf_extractor_ray.pipelines.evalstats import calibration_bins

    def add_p(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "p", pc.divide(batch.column("value"), 500.0))

    ev = _events(sf_dir, ["event_type", "value"]).map_batches(
        add_p, batch_format="pyarrow")
    out = calibration_bins(ev, "p", "event_type", "purchase", n_bins=10)
    out = _round_col(out, "mean_p", 9)
    return _round_col(out, "frac_pos", 9)


def _q_mi_lang_source(sf_dir: str):
    """Mutual information / chi-square / Cramer's V between documents.lang
    and documents.source from one distributed contingency count; the
    closed-form chi2 n*(sum o^2/(r*c) - 1) never enumerates empty cells
    (pipelines/evalstats.py:categorical_association)."""
    from insurance_pdf_extractor_ray.pipelines.evalstats import (
        categorical_association,
    )

    out = categorical_association(
        _documents(sf_dir, ["lang", "source"]), "lang", "source")
    out = _round_col(out, "mi_nats", 9)
    out = _round_col(out, "chi2", 6)
    return _round_col(out, "cramers_v", 9)


def _q_benford(sf_dir: str):
    """Benford first-digit audit of o_totalprice — digit taken from the
    integer cents value (round(x*100), repeated integer division), so the
    substr(cast(bigint)) SQL twin is bit-identical; no float log10 in the
    digit path (pipelines/evalstats.py:benford_first_digit)."""
    from insurance_pdf_extractor_ray.pipelines.evalstats import (
        benford_first_digit,
    )

    out = benford_first_digit(
        _read(sf_dir, "orders", ["o_totalprice"]), "o_totalprice")
    out = _round_col(out, "observed_p", 9)
    return _round_col(out, "expected_p", 9)


def _q_changepoint(sf_dir: str):
    """Single change-point detection over the daily event-count series:
    the split minimizing two-segment SSE, computed in closed form from
    prefix sums — distributed day-count shuffle (bounded by days), driver
    scan over the tiny series; same float expression as the SQL twin."""
    from ray.data.aggregate import Sum

    ev = _events(sf_dir, ["ts"])

    def day_counts(batch: pa.Table) -> pa.Table:
        day = pc.divide(batch.column("ts").cast(pa.int64()), 86_400_000_000)
        t = pa.table({"_day": day})
        g = t.group_by(["_day"]).aggregate([([], "count_all")])
        return pa.table({"_day": g.column("_day"),
                         "_n": g.column("count_all").cast(pa.int64())})

    rows = (ev.map_batches(day_counts, batch_format="pyarrow")
            .groupby("_day").aggregate(Sum("_n", alias_name="_n"))
            ).take_all()
    rows.sort(key=lambda r: r["_day"])
    days = np.array([r["_day"] for r in rows], np.int64)
    x = np.array([r["_n"] for r in rows], np.float64)
    m = len(x)
    s1 = np.cumsum(x)
    s2 = np.cumsum(x * x)
    i = np.arange(1, m, dtype=np.float64)  # candidate split after row i
    sse = ((s2[:-1] - s1[:-1] * s1[:-1] * 1.0 / i)
           + ((s2[-1] - s2[:-1])
              - (s1[-1] - s1[:-1]) * (s1[-1] - s1[:-1]) * 1.0 / (m - i)))
    best = int(np.lexsort((days[:-1], sse))[0])
    return pa.table({
        "change_day": pa.array([int(days[best])], pa.int64()),
        "sse": pa.array([_round_away(float(sse[best]), 6)], pa.float64()),
    })


def _global_ndistinct(ds, col: str) -> int:
    """Global COUNT(DISTINCT col): map-side per-batch dedup, one
    value-keyed combine, metadata count."""

    def part(t: pa.Table) -> pa.Table:
        return t.select([col]).group_by([col]).aggregate([])

    return (ds.map_batches(part, batch_format="pyarrow")
            .groupby(col).count().count())


def _q_csv_source(sf_dir: str):
    """CSV source reader exercised end-to-end: orders exported to CSV
    (integer cents — exact through the text format), re-read with
    ``sources.io.read_csv``, aggregated; the oracle computes the same
    stats straight from the parquet view."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.sources.io import read_csv

    n = pq.ParquetFile(os.path.join(sf_dir, "orders.parquet")
                       ).metadata.num_rows
    out_dir = f"/tmp/ipe_csv_src/{n}"
    if not glob.glob(os.path.join(out_dir, "*")):
        os.makedirs(out_dir, exist_ok=True)
        orders = _read(sf_dir, "orders",
                       ["o_orderkey", "o_custkey", "o_totalprice"])

        def to_cents(t: pa.Table) -> pa.Table:
            p = t.column("o_totalprice").to_numpy(zero_copy_only=False)
            cents = (-np.floor(-(p * 100) + 0.5)).astype(np.int64)
            return pa.table({"o_orderkey": t.column("o_orderkey"),
                             "o_custkey": t.column("o_custkey"),
                             "cents": pa.array(cents, pa.int64())})

        orders.map_batches(to_cents, batch_format="pyarrow"
                           ).write_csv(out_dir)
    ds = read_csv(out_dir)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "_n": pa.array([t.num_rows], pa.int64()),
            "_s": pa.array([int(pc.sum(t.column("cents")).as_py() or 0)],
                           pa.int64()),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n_cust = _global_ndistinct(ds, "o_custkey")
    return pa.table({
        "n_orders": pa.array([sum(r["_n"] for r in rows)], pa.int64()),
        "sum_cents": pa.array([sum(r["_s"] for r in rows)], pa.int64()),
        "n_cust": pa.array([n_cust], pa.int64()),
    })


def _q_jsonl_source(sf_dir: str):
    """JSONL source reader roundtrip: events exported to NDJSON (integer
    milli-values), re-read with ``sources.io.read_jsonl``, aggregated."""
    from insurance_pdf_extractor_ray.sources.io import read_jsonl

    n = pq.ParquetFile(os.path.join(sf_dir, "events.parquet")
                       ).metadata.num_rows
    out_dir = f"/tmp/ipe_jsonl_src/{n}"
    if not glob.glob(os.path.join(out_dir, "*")):
        os.makedirs(out_dir, exist_ok=True)
        ev = _events(sf_dir, ["event_id", "user_id", "value", "event_type"])

        def to_milli(t: pa.Table) -> pa.Table:
            v = t.column("value").to_numpy(zero_copy_only=False)
            m = np.where(v >= 0, np.floor(v * 1000 + 0.5),
                         -np.floor(-v * 1000 + 0.5)).astype(np.int64)
            return pa.table({"event_id": t.column("event_id"),
                             "user_id": t.column("user_id"),
                             "milli": pa.array(m, pa.int64()),
                             "event_type": t.column("event_type")})

        ev.map_batches(to_milli, batch_format="pyarrow").write_json(out_dir)
    ds = read_jsonl(out_dir)

    def partial(t: pa.Table) -> pa.Table:
        return pa.table({
            "_n": pa.array([t.num_rows], pa.int64()),
            "_s": pa.array([int(pc.sum(t.column("milli")).as_py() or 0)],
                           pa.int64()),
        })

    rows = ds.map_batches(partial, batch_format="pyarrow").take_all()
    n_types = _global_ndistinct(ds, "event_type")
    return pa.table({
        "n_events": pa.array([sum(r["_n"] for r in rows)], pa.int64()),
        "sum_milli": pa.array([sum(r["_s"] for r in rows)], pa.int64()),
        "n_types": pa.array([n_types], pa.int64()),
    })


def _q_hybrid_search(sf_dir: str):
    """Hybrid retrieval: BM25 lexical top-20 + exact-cosine semantic top-20
    fused by Reciprocal Rank Fusion (1/(60+rank), the standard k=60) —
    both legs are the already-oracle-verified operators; fusion is a tiny
    driver merge (pipelines/tfidf.py:bm25_search,
    pipelines/similarity.py:knn_brute_force)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        knn_brute_force)
    from insurance_pdf_extractor_ray.pipelines.tfidf import bm25_search

    docs = _documents(sf_dir, ["doc_id", "text"])
    lex = bm25_search(docs, "text", "doc_id",
                      ["shuffle", "spark", "window"], k=20)
    lex_ranked = list(enumerate(lex.column("doc_id").to_pylist(), start=1))

    qvec = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).sort_by("vec_id")
    q = np.array([qvec.column("embedding")[0].as_py()], np.float64)
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"])
    sem = knn_brute_force(emb, q, k=20)
    sem_ranked = list(enumerate(sem.column("vec_id").to_pylist(), start=1))

    rrf: dict = {}
    for rank, did in lex_ranked:
        rrf[did] = rrf.get(did, 0.0) + 1.0 / (60 + rank)
    for rank, did in sem_ranked:
        rrf[did] = rrf.get(did, 0.0) + 1.0 / (60 + rank)
    top = sorted(rrf.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    return pa.table({
        "doc_id": pa.array([d for d, _ in top], pa.int64()),
        "rrf": pa.array([_round_away(s, 9) for _, s in top], pa.float64()),
    })


def _q_priority_dedup(sf_dir: str):
    """Mixture-aware exact dedup: among duplicate texts keep the copy from
    the highest-priority source (then min id) — grouped_top_k k=1 over the
    text key with map-side per-batch winners pre-reduced
    (pipelines/rankagg.py:grouped_top_k)."""
    from insurance_pdf_extractor_ray.pipelines.rankagg import grouped_top_k

    docs = _documents(sf_dir, ["doc_id", "text"])

    def add_prio(t: pa.Table) -> pa.Table:
        ids = t.column("doc_id").to_numpy(zero_copy_only=False)
        return t.append_column("prio", pa.array(ids % 3, pa.int64()))

    w = grouped_top_k(docs.map_batches(add_prio, batch_format="pyarrow"),
                      "text", order_by=["prio", "doc_id"],
                      descending=[True, False], k=1,
                      columns=["doc_id"])
    rows = sorted(r["doc_id"] for r in w.take_all())
    return pa.table({"doc_id": pa.array(rows, pa.int64())})


def _q_longest_streak(sf_dir: str):
    """Longest run of consecutive active days per user — distinct
    (user, day) map-side pre-reduce, one keyed shuffle, vectorized
    islands detection inside each (bounded) group."""
    from ray.data.aggregate import Sum

    ev = _events(sf_dir, ["user_id", "ts"])

    def day_pairs(batch: pa.Table) -> pa.Table:
        day = pc.divide(batch.column("ts").cast(pa.int64()), 86_400_000_000)
        t = pa.table({"user_id": batch.column("user_id"), "_day": day})
        return t.group_by(["user_id", "_day"]).aggregate([])

    def per_user(group: pa.Table) -> pa.Table:
        days = np.unique(group.column("_day").to_numpy(
            zero_copy_only=False))
        if len(days) == 0:
            return pa.table({"user_id": group.column("user_id").slice(0, 0),
                             "n_days": pa.array([], pa.int64()),
                             "longest_streak": pa.array([], pa.int64())})
        breaks = np.flatnonzero(np.diff(days) != 1)
        run_lens = np.diff(np.concatenate(([-1], breaks, [len(days) - 1])))
        return pa.table({
            "user_id": group.column("user_id").slice(0, 1),
            "n_days": pa.array([len(days)], pa.int64()),
            "longest_streak": pa.array([int(run_lens.max())], pa.int64()),
        })

    out = (ev.map_batches(day_pairs, batch_format="pyarrow")
           .groupby("user_id").map_groups(per_user, batch_format="pyarrow"))
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "n_days": pa.array([r["n_days"] for r in rows], pa.int64()),
        "longest_streak": pa.array([r["longest_streak"] for r in rows],
                                   pa.int64()),
    })


def _q_hard_negatives(sf_dir: str):
    """Hard-negative mining: per anchor (first 3 vecs by id), exact cosine
    top-5 among DIFFERENT-label vectors — broadcast anchors, per-batch
    masked top-k, tiny driver merge (pipelines/similarity.py:hard_negatives)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import hard_negatives

    path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(path, columns=["vec_id", "embedding", "label"])
    order = pc.sort_indices(head.column("vec_id"))[:3]
    q_ids = head.column("vec_id").take(order).to_pylist()
    q_labels = head.column("label").take(order).to_pylist()
    qmat = np.asarray(head.column("embedding").take(order).to_pylist(),
                      dtype=np.float64)
    ds = ray.data.read_parquet(path)
    out = hard_negatives(ds, qmat, q_ids, q_labels, k=5, batch_size=4096)
    return pa.table({
        "query_id": pa.array([q_ids[q] for q in
                              out.column("query_id").to_pylist()], pa.int64()),
        "vec_id": out.column("vec_id"),
        "score": pc.round(out.column("score"), ndigits=6),
    })


def _q_nearest_centroid(sf_dir: str):
    """Nearest-centroid eval confusion matrix — integer-exact per-label
    quantized centroid sums (order-free), cosine argmax assignment,
    all-integer output (pipelines/similarity.py:nearest_centroid_confusion)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        nearest_centroid_confusion)

    ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                               columns=["embedding", "label"])
    return nearest_centroid_confusion(ds)


def _q_span_corruption(sf_dir: str):
    """T5 span-corruption planning stats per source — all-integer sums
    from one zero-shuffle vectorized pass + a 20-row groupby
    (pipelines/pretrain.py:span_corruption_stats)."""
    from insurance_pdf_extractor_ray.pipelines.pretrain import (
        span_corruption_stats)

    out = span_corruption_stats(_documents(sf_dir, ["doc_id", "text",
                                                    "source"]))
    rows = out.take_all()
    rows.sort(key=lambda r: r["source"])
    cols = ["n_docs", "sum_input_tokens", "sum_target_tokens", "sum_spans",
            "seqs"]
    t = {"source": pa.array([r["source"] for r in rows], pa.string())}
    for c in cols:
        t[c] = pa.array([r[c] for r in rows], pa.int64())
    return pa.table(t)


def _q_source_overlap(sf_dir: str):
    """Cross-source k-word-window overlap matrix — two aggregate shuffles
    over the distinct (window, source) table, bitmask pair expansion,
    group-pair-sized combine (pipelines/substrdedup.py:source_overlap_matrix)."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        source_overlap_matrix)

    return source_overlap_matrix(
        _documents(sf_dir, ["text", "source"]), "text", "source", k=3)


def _q_rfm_segments(sf_dir: str):
    """RFM quintile segmentation — one user-grain shuffle + three ntile
    sort waves, all-integer output (pipelines/behavior.py:rfm_segments)."""
    from insurance_pdf_extractor_ray.pipelines.behavior import rfm_segments

    out = rfm_segments(_events(sf_dir, ["user_id", "ts", "value"]), k=5)
    rows = out.take_all()
    rows.sort(key=lambda r: r["user_id"])
    cols = ["recency_days", "frequency", "m_cents", "r_score", "f_score",
            "m_score", "rfm"]
    t = {"user_id": pa.array([r["user_id"] for r in rows], pa.int64())}
    for c in cols:
        t[c] = pa.array([r[c] for r in rows], pa.int64())
    return pa.table(t)


def _q_k_anonymity(sf_dir: str):
    """k-anonymity audit over (lang, source) quasi-identifiers — one keyed
    shuffle to class grain, block-sized driver combine
    (pipelines/profile.py:k_anonymity_stats)."""
    from insurance_pdf_extractor_ray.pipelines.profile import k_anonymity_stats

    return k_anonymity_stats(_documents(sf_dir, ["lang", "source"]),
                             ["lang", "source"], k=5)


def _q_knn_ndcg(sf_dir: str):
    """NDCG@10 of exact cosine retrieval, relevance = same label — the
    embedding-quality eval (pipelines/similarity.py:knn_label_ndcg)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import knn_label_ndcg

    path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(path, columns=["vec_id", "embedding", "label"])
    order = pc.sort_indices(head.column("vec_id"))[:10]
    q_ids = head.column("vec_id").take(order).to_pylist()
    q_labels = head.column("label").take(order).to_pylist()
    qmat = np.asarray(head.column("embedding").take(order).to_pylist(),
                      dtype=np.float64)
    ds = ray.data.read_parquet(path)
    counts = {r["label"]: r["count()"] for r in
              ds.groupby("label").count().take_all()}
    out = knn_label_ndcg(ds, qmat, q_ids, q_labels, counts, k=10)
    return pa.table({
        "query_id": pa.array([q_ids[q] for q in
                              out.column("query_id").to_pylist()], pa.int64()),
        "ndcg": pc.round(out.column("ndcg"), ndigits=6),
    })


def _q_padding_efficiency(sf_dir: str):
    """Length-bucketed padding-waste plan — zero-shuffle partials + a
    bucket-sized groupby (pipelines/packing.py:padding_efficiency)."""
    from insurance_pdf_extractor_ray.pipelines.packing import padding_efficiency

    out = padding_efficiency(_documents(sf_dir, ["text"]), bucket=16,
                             max_len=512)
    rows = out.take_all()
    rows.sort(key=lambda r: r["bucket_len"])
    return pa.table({
        "bucket_len": pa.array([r["bucket_len"] for r in rows], pa.int64()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
        "sum_tokens": pa.array([r["sum_tokens"] for r in rows], pa.int64()),
        "sum_padding": pa.array([r["sum_padding"] for r in rows],
                                pa.int64()),
    })


def _q_stratified_split(sf_dir: str):
    """Exact per-stratum 80/10/10 split — grouped row-number metadata wave
    (one sort + two metadata task waves), integer rank thresholds
    (pipelines/ordering.py:grouped_row_number)."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.pipelines.ordering import (
        grouped_row_number)

    ds = grouped_row_number(_documents(sf_dir, ["doc_id", "lang"]),
                            ["lang"], ["doc_id"], out_col="_rn",
                            total_col="_n")

    def assign(batch: pa.Table) -> pa.Table:
        rn = batch.column("_rn").to_numpy(zero_copy_only=False)
        n = batch.column("_n").to_numpy(zero_copy_only=False)
        split = np.where(rn * 10 < n * 8, "train",
                         np.where(rn * 10 < n * 9, "val", "test"))
        return pa.table({"lang": batch.column("lang"),
                         "split": pa.array(split, pa.string()),
                         "doc_id": batch.column("doc_id")})

    out = (ds.map_batches(assign, batch_format="pyarrow")
           .groupby(["lang", "split"]).aggregate(
               Count(alias_name="n_docs"),
               Sum("doc_id", alias_name="id_sum")))
    rows = out.take_all()
    rows.sort(key=lambda r: (r["lang"], r["split"]))
    return pa.table({
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "split": pa.array([r["split"] for r in rows], pa.string()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
        "id_sum": pa.array([r["id_sum"] for r in rows], pa.int64()),
    })


def _q_top_quartile_by_lang(sf_dir: str):
    """Per-stratum percentile gate: keep each lang's top 25% docs by
    n_chars (ties broken by doc_id) — grouped_row_number + integer rank
    threshold, then a lang-sized aggregate."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.pipelines.ordering import (
        grouped_row_number)

    ds = grouped_row_number(
        _documents(sf_dir, ["doc_id", "lang", "n_chars"]),
        ["lang"], ["n_chars", "doc_id"], descending=[True, False],
        out_col="_rn", total_col="_n")
    kept = ds.map_batches(
        lambda t: t.filter(pc.less(
            pc.multiply(t.column("_rn"), pa.scalar(4, pa.int64())),
            t.column("_n"))),
        batch_format="pyarrow")
    out = kept.groupby("lang").aggregate(
        Count(alias_name="n_docs"),
        Sum("doc_id", alias_name="id_sum"),
        Sum("n_chars", alias_name="chars_sum"))
    rows = out.take_all()
    rows.sort(key=lambda r: r["lang"])
    return pa.table({
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
        "id_sum": pa.array([r["id_sum"] for r in rows], pa.int64()),
        "chars_sum": pa.array([r["chars_sum"] for r in rows], pa.int64()),
    })


def _q_value_band_pairs(sf_dir: str):
    """Scalar band self-join: event pairs within 1 milli-unit of value —
    banded-bucket equi-join, integer-exact |diff| filter
    (pipelines/joins.py:scalar_band_join)."""
    from insurance_pdf_extractor_ray.pipelines.joins import scalar_band_join

    ev = _events(sf_dir, ["event_id", "value"])
    out = scalar_band_join(ev, ev, "value", "event_id", eps_q=1,
                           quant=1000.0)
    rows = out.take_all()
    rows.sort(key=lambda r: (r["id_a"], r["id_b"]))
    return pa.table({
        "id_a": pa.array([r["id_a"] for r in rows], pa.int64()),
        "id_b": pa.array([r["id_b"] for r in rows], pa.int64()),
        "q_a": pa.array([r["q_a"] for r in rows], pa.int64()),
        "q_b": pa.array([r["q_b"] for r in rows], pa.int64()),
    })


def _q_percent_rank_by_type(sf_dir: str):
    """PERCENT_RANK() OVER (PARTITION BY event_type ORDER BY value,
    event_id) — grouped row-number metadata wave; rank ratio rounded at 9
    (pipelines/ordering.py:grouped_row_number)."""
    from insurance_pdf_extractor_ray.pipelines.ordering import (
        grouped_row_number)

    ds = grouped_row_number(
        _events(sf_dir, ["event_id", "event_type", "value"]),
        ["event_type"], ["value", "event_id"], out_col="_rn",
        total_col="_n")

    def pct(batch: pa.Table) -> pa.Table:
        rn = batch.column("_rn").to_numpy(zero_copy_only=False)
        n = batch.column("_n").to_numpy(zero_copy_only=False)
        p = np.where(n > 1, rn / np.maximum(n - 1, 1), 0.0)
        m = 1e9
        p = np.floor(p * m + 0.5) / m  # values in [0,1]: half-away == half-up
        return pa.table({"event_id": batch.column("event_id"),
                         "pct_rank": pa.array(p, pa.float64())})

    rows = ds.map_batches(pct, batch_format="pyarrow").take_all()
    rows.sort(key=lambda r: r["event_id"])
    return pa.table({
        "event_id": pa.array([r["event_id"] for r in rows], pa.int64()),
        "pct_rank": pa.array([r["pct_rank"] for r in rows], pa.float64()),
    })


def _q_q10_returned_revenue(sf_dir: str):
    """TPC-H Q10 analog: top-20 customers by revenue from RETURNED items in
    one order-date quarter.  Shape: aggregate-below-join (returned-line
    revenue pre-reduced per orderkey), ONE big-big hash join, custkey
    groupby, global sort-limit; the 20 winners' names resolved by a tiny
    driver-side lookup against a key-filtered customer read (never a full
    dimension broadcast)."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join

    li = _read(sf_dir, "lineitem",
               ["l_orderkey", "l_returnflag", "l_extendedprice", "l_discount"]) \
        .filter(expr="l_returnflag == 'R'")
    li_rev = drop_empty_blocks(
        li.map_batches(lambda b: _rev_i4(b, "l_orderkey"),
                       batch_format="pyarrow")
          .groupby("l_orderkey").aggregate(Sum("rev_i4", alias_name="rev_i4")),
        empty_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("rev_i4", pa.int64())]))

    lo = int(pd.Timestamp("1996-01-01").value // 1000)
    hi = int(pd.Timestamp("1996-04-01").value // 1000)

    def date_window(t: pa.Table) -> pa.Table:
        d = t.column("o_orderdate").cast(pa.int64())
        keep = pc.and_(pc.greater_equal(d, lo), pc.less(d, hi))
        return t.filter(keep).select(["o_orderkey", "o_custkey"])

    orders = drop_empty_blocks(
        _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"])
        .map_batches(date_window, batch_format="pyarrow"),
        empty_schema=pa.schema([("o_orderkey", pa.int64()),
                                ("o_custkey", pa.int64())]))
    j = shuffle_join(li_rev, orders, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=_join_partitions())
    top = (j.groupby("o_custkey")
            .aggregate(Sum("rev_i4", alias_name="revenue_i4"))
            .sort(["revenue_i4", "o_custkey"], descending=[True, False])
            .limit(20).take_all())
    keys = [r["o_custkey"] for r in top]

    key_arr = pa.array(sorted(keys), pa.int64())
    cust = _read(sf_dir, "customer",
                 ["c_custkey", "c_name", "c_nationkey"]) \
        .map_batches(
            lambda b: b.filter(pc.is_in(b.column("c_custkey"),
                                        value_set=key_arr)),
            batch_format="pyarrow").take_all()
    nation = {r["n_nationkey"]: r["n_name"]
              for r in _read(sf_dir, "nation",
                             ["n_nationkey", "n_name"]).take_all()}
    info = {r["c_custkey"]: (r["c_name"], nation[r["c_nationkey"]])
            for r in cust}
    return pa.table({
        "c_custkey": pa.array(keys, pa.int64()),
        "c_name": pa.array([info[k][0] for k in keys], pa.string()),
        "n_name": pa.array([info[k][1] for k in keys], pa.string()),
        "revenue_i4": pa.array([r["revenue_i4"] for r in top], pa.int64()),
    })


def _q_q18_big_orders(sf_dir: str):
    """TPC-H Q18 analog: orders whose total quantity exceeds 250 — HAVING
    pushed below the join (per-orderkey integer-quantity pre-aggregate,
    filter, then ONE hash join against orders), top-100 by quantity."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join

    def qty_i2(b: pa.Table) -> pa.Table:
        q = b.column("l_quantity").to_numpy(zero_copy_only=False)
        return pa.table({
            "l_orderkey": b.column("l_orderkey"),
            "qty_i2": pa.array(np.floor(q * 100.0 + 0.5).astype(np.int64),
                               pa.int64()),
        })

    big = drop_empty_blocks(
        _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])
        .map_batches(qty_i2, batch_format="pyarrow")
        .groupby("l_orderkey").aggregate(Sum("qty_i2", alias_name="qty_i2"))
        .filter(expr="qty_i2 > 25000"),
        empty_schema=pa.schema([("l_orderkey", pa.int64()),
                                ("qty_i2", pa.int64())]))

    def tp_i2(b: pa.Table) -> pa.Table:
        t = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "o_orderkey": b.column("o_orderkey"),
            "o_custkey": b.column("o_custkey"),
            "totalprice_i2": pa.array(
                np.floor(t * 100.0 + 0.5).astype(np.int64), pa.int64()),
        })

    orders = _read(sf_dir, "orders",
                   ["o_orderkey", "o_custkey", "o_totalprice"]) \
        .map_batches(tp_i2, batch_format="pyarrow")
    j = shuffle_join(big, orders, on="l_orderkey", right_on="o_orderkey",
                     num_partitions=_join_partitions())
    rows = (j.sort(["qty_i2", "l_orderkey"], descending=[True, False])
             .limit(100).take_all())
    return pa.table({
        "o_orderkey": pa.array([r["l_orderkey"] for r in rows], pa.int64()),
        "o_custkey": pa.array([r["o_custkey"] for r in rows], pa.int64()),
        "totalprice_i2": pa.array([r["totalprice_i2"] for r in rows],
                                  pa.int64()),
        "qty_i2": pa.array([r["qty_i2"] for r in rows], pa.int64()),
    })


def _q_daily_autocorr(sf_dir: str):
    """Lag-1 autocorrelation of the daily event-count series — day-keyed
    count shuffle (bounded by distinct days), exact integer moment sums on
    the day table, closed-form Pearson r mirrored operation-for-operation
    by the oracle SQL."""
    from ray.data.aggregate import Sum

    def day_part(b: pa.Table) -> pa.Table:
        d = pc.divide(b.column("ts").cast(pa.int64()), 86_400_000_000)
        t = pa.table({"day": d,
                      "_n": pa.array(np.ones(b.num_rows, dtype=np.int64))})
        g = t.group_by("day").aggregate([("_n", "sum")])
        return g.rename_columns(["day", "_n"])

    rows = (_events(sf_dir, ["ts"])
            .map_batches(day_part, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("_n", alias_name="n"))
            .take_all())
    rows.sort(key=lambda r: r["day"])
    ns = [int(r["n"]) for r in rows]
    x, y = ns[1:], ns[:-1]          # (n_t, n_{t-1}) over consecutive rows
    k = len(x)
    sx, sy = sum(x), sum(y)
    sxx = sum(v * v for v in x)
    syy = sum(v * v for v in y)
    sxy = sum(a * b for a, b in zip(x, y))
    import math
    den = math.sqrt(float(k * sxx - sx * sx) * float(k * syy - sy * sy))
    r = float(k * sxy - sx * sy) / den
    return pa.table({"autocorr_lag1": pa.array([_round_away(r, 9)],
                                               pa.float64())})


def _q_first_touch_revenue(sf_dir: str):
    """First-touch attribution: each purchase's value credited to the FIRST
    event type the user ever produced (ts, event_id total order) — grouped
    top-1 per user, ONE user-keyed hash join, tiny type-keyed combine."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join
    from insurance_pdf_extractor_ray.pipelines.rankagg import grouped_top_k

    ev = _events(sf_dir, ["event_id", "user_id", "ts", "event_type", "value"])
    firsts = grouped_top_k(
        ev.select_columns(["user_id", "ts", "event_id", "event_type"]),
        "user_id", ["ts", "event_id"], [False, False], k=1)

    def first_cols(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "first_type": b.column("event_type")})

    firsts = drop_empty_blocks(
        firsts.map_batches(first_cols, batch_format="pyarrow"),
        empty_schema=pa.schema([("user_id", pa.int64()),
                                ("first_type", pa.string())]))

    def pvals(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "user_id": b.column("user_id"),
            "val_i2": pa.array(np.floor(v * 100.0 + 0.5).astype(np.int64),
                               pa.int64()),
        })

    purchases = drop_empty_blocks(
        ev.filter(expr="event_type == 'purchase'")
          .map_batches(pvals, batch_format="pyarrow"),
        empty_schema=pa.schema([("user_id", pa.int64()),
                                ("val_i2", pa.int64())]))
    j = shuffle_join(purchases, firsts, on="user_id", right_on="user_id",
                     num_partitions=_join_partitions())
    agg = j.groupby("first_type").aggregate(
        Count(alias_name="n_purchases"),
        Sum("val_i2", alias_name="revenue_i2"))
    rows = sorted(agg.take_all(), key=lambda r: r["first_type"])
    return pa.table({
        "first_type": pa.array([r["first_type"] for r in rows], pa.string()),
        "n_purchases": pa.array([r["n_purchases"] for r in rows], pa.int64()),
        "revenue_i2": pa.array([r["revenue_i2"] for r in rows], pa.int64()),
    })


def _q_pmi_bigrams(sf_dir: str):
    """Collocation mining: top-50 word bigrams by pointwise mutual
    information among bigrams with corpus count >= 20 — map-side distinct
    n-gram pre-counts, vocabulary-bounded combines, driver math only on the
    qualifying-bigram table (min-count-bounded)."""
    import math

    from insurance_pdf_extractor_ray.pipelines.tfidf import (
        ngram_counts,
        vocab_counts,
    )

    docs = _documents(sf_dir, ["doc_id", "text"])
    big_all = ngram_counts(docs, "text", "doc_id", n=2, k=None).materialize()
    n_b = big_all.sum("n")
    big = big_all.filter(expr="n >= 20").take_all()

    uni_all = vocab_counts(docs, "text", "doc_id", k=None).materialize()
    n_u = uni_all.sum("n")
    need = set()
    for r in big:
        a, b = r["ngram"].split(" ")
        need.add(a)
        need.add(b)

    def keep_needed(t: pa.Table, need_ref) -> pa.Table:
        import ray as _ray
        toks = _ray.get(need_ref)
        return t.filter(pc.is_in(t.column("token"),
                                 value_set=pa.array(sorted(toks))))

    import ray as _ray
    need_ref = _ray.put(need)
    uni = {r["token"]: int(r["n"]) for r in uni_all.map_batches(
        keep_needed, fn_args=[need_ref], batch_format="pyarrow").take_all()}

    out = []
    for r in big:
        a, b = r["ngram"].split(" ")
        n_ab = int(r["n"])
        num = float(n_ab) * float(n_u) * float(n_u)
        den = float(n_b) * float(uni[a]) * float(uni[b])
        out.append((r["ngram"], n_ab, _round_away(math.log(num / den), 9)))
    out.sort(key=lambda t: (-t[2], t[0]))
    out = out[:50]
    return pa.table({
        "bigram": pa.array([t[0] for t in out], pa.string()),
        "n_ab": pa.array([t[1] for t in out], pa.int64()),
        "pmi": pa.array([t[2] for t in out], pa.float64()),
    })


def _q_welch_ttest_value(sf_dir: str):
    """Welch two-sample t-test (purchase vs view event values) from
    integer-quantized moment sums — per-batch (n, Σq, Σq²) partials in
    exact int64, ONE two-row combine, closed-form t and Welch–Satterthwaite
    df mirrored by the oracle SQL's arithmetic."""
    import math

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        q = np.floor(v * 1000.0 + 0.5).astype(np.int64)
        t = pa.table({
            "grp": b.column("event_type"),
            "_n": pa.array(np.ones(len(q), dtype=np.int64)),
            "_s": pa.array(q), "_ss": pa.array(q * q),
        })
        g = t.group_by("grp").aggregate([("_n", "sum"), ("_s", "sum"),
                                         ("_ss", "sum")])
        return g.rename_columns(["grp", "_n", "_s", "_ss"])

    agg = (_events(sf_dir, ["event_type", "value"])
           .filter(expr="event_type == 'purchase' or event_type == 'view'")
           .map_batches(partial, batch_format="pyarrow")
           .groupby("grp")
           .aggregate(Sum("_n", alias_name="n"), Sum("_s", alias_name="s"),
                      Sum("_ss", alias_name="ss")))
    stats = {r["grp"]: r for r in agg.take_all()}

    def mv(r):
        n = int(r["n"])
        m = float(r["s"]) / n / 1000.0
        v = (float(r["ss"]) - float(r["s"]) * float(r["s"]) / n) \
            / (n - 1) / 1000000.0
        return n, m, v

    n1, m1, v1 = mv(stats["purchase"])
    n2, m2, v2 = mv(stats["view"])
    se2 = v1 / n1 + v2 / n2
    t_stat = (m1 - m2) / math.sqrt(se2)
    df = se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                      + (v2 / n2) * (v2 / n2) / (n2 - 1))
    return pa.table({
        "n_purchase": pa.array([n1], pa.int64()),
        "n_view": pa.array([n2], pa.int64()),
        "mean_diff": pa.array([_round_away(m1 - m2, 9)], pa.float64()),
        "t_stat": pa.array([_round_away(t_stat, 9)], pa.float64()),
        "df": pa.array([_round_away(df, 9)], pa.float64()),
    })


def _q_dup_cluster_sizes(sf_dir: str):
    """Duplicate-cluster size histogram (corpus-duplication audit): cluster
    docs by identical text, histogram the cluster sizes — map-side text-hash
    pre-count, ONE hash-keyed combine, size-bounded final histogram.  Hash
    identity as in exact_dedup (collision odds documented there); the oracle
    groups by the full text."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.functions.hashing import (
        durable_hash64_column)

    def partial(b: pa.Table) -> pa.Table:
        h = durable_hash64_column(b.column("text"))
        t = pa.table({"_h": h,
                      "_n": pa.array(np.ones(b.num_rows, dtype=np.int64))})
        g = t.group_by("_h").aggregate([("_n", "sum")])
        return g.rename_columns(["_h", "_n"])

    sizes = (_documents(sf_dir, ["doc_id", "text"])
             .map_batches(partial, batch_format="pyarrow")
             .groupby("_h").aggregate(Sum("_n", alias_name="cluster_size")))
    hist = sizes.groupby("cluster_size").aggregate(
        Count(alias_name="n_clusters"))
    rows = sorted(hist.take_all(), key=lambda r: r["cluster_size"])
    return pa.table({
        "cluster_size": pa.array([r["cluster_size"] for r in rows],
                                 pa.int64()),
        "n_clusters": pa.array([r["n_clusters"] for r in rows], pa.int64()),
    })


def _q_logprob_deciles_by_source(sf_dir: str):
    """Perplexity-decile mixing audit: per-token unigram-LM score per doc
    (integer micro-nats), global NTILE(10) sort wave, doc-keyed join back to
    the source column, (source × decile) count combine — the
    quality-curriculum sharding signal."""
    from ray.data.aggregate import Count

    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join
    from insurance_pdf_extractor_ray.pipelines.ordering import ntile
    from insurance_pdf_extractor_ray.pipelines.tfidf import unigram_logprob

    lp = unigram_logprob(_documents(sf_dir, ["doc_id", "text"]),
                         "text", "doc_id")

    def score(b: pa.Table) -> pa.Table:
        m = b.column("logprob_micro").to_numpy(zero_copy_only=False)
        n = b.column("n_tokens").to_numpy(zero_copy_only=False)
        s = np.floor(m * 1000.0 / n + 0.5).astype(np.int64)
        return pa.table({"doc_id": b.column("doc_id"),
                         "score": pa.array(s, pa.int64())})

    scored = lp.map_batches(score, batch_format="pyarrow")
    tiled = ntile(scored, ["score", "doc_id"], 10, out_col="decile")
    src = _documents(sf_dir, ["doc_id", "source"])
    j = shuffle_join(
        drop_empty_blocks(tiled.select_columns(["doc_id", "decile"]),
                          empty_schema=pa.schema([("doc_id", pa.int64()),
                                                  ("decile", pa.int64())])),
        src, on="doc_id", num_partitions=_join_partitions())
    agg = j.groupby(["source", "decile"]).aggregate(
        Count(alias_name="n_docs"))
    rows = sorted(agg.take_all(), key=lambda r: (r["source"], r["decile"]))
    return pa.table({
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "decile": pa.array([r["decile"] for r in rows], pa.int64()),
        "n_docs": pa.array([r["n_docs"] for r in rows], pa.int64()),
    })


def _q_containment_pairs(sf_dir: str):
    """Rare-window containment pairs (near-superset / quotation detection)
    — pipelines/substrdedup.py:containment_pairs; rarity caps the pair
    fan-out at C(rare_max,2) per window; integer-exact ratio predicate."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        containment_pairs)

    out = containment_pairs(_documents(sf_dir, ["doc_id", "text"]),
                            "text", "doc_id", k=3, rare_max=8,
                            ratio_num=1, ratio_den=4)
    rows = sorted(out.take_all(), key=lambda r: (r["id_a"], r["id_b"]))
    return pa.table({
        "id_a": pa.array([r["id_a"] for r in rows], pa.int64()),
        "id_b": pa.array([r["id_b"] for r in rows], pa.int64()),
        "shared": pa.array([r["shared"] for r in rows], pa.int64()),
        "min_windows": pa.array([r["min_windows"] for r in rows],
                                pa.int64()),
    })


def _q_set_jaccard_pairs(sf_dir: str):
    """EXACT set-similarity join (Jaccard >= 0.5 over distinct 5-word
    shingle sets) via prefix filtering (SSJoin / Vernica et al. SIGMOD'10)
    — pipelines/substrdedup.py:set_similarity_pairs.  Only prefix shingles
    enter the candidate shuffle; verification is per-candidate (the output
    lower bound)."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        set_similarity_pairs)

    out = set_similarity_pairs(_documents(sf_dir, ["doc_id", "text"]),
                               "text", "doc_id", k=5, tau_num=1, tau_den=2)
    rows = sorted(out.take_all(), key=lambda r: (r["id_a"], r["id_b"]))
    return pa.table({
        "id_a": pa.array([r["id_a"] for r in rows], pa.int64()),
        "id_b": pa.array([r["id_b"] for r in rows], pa.int64()),
        "shared": pa.array([r["shared"] for r in rows], pa.int64()),
        "union_size": pa.array([r["union_size"] for r in rows], pa.int64()),
    })


def _q_bfs_hops_embeddings(sf_dir: str):
    """Minimum-hop BFS labels from seed vertices over the integer-exact
    similarity graph — per round ONE zero-shuffle edge scan against the
    broadcast frontier (pipelines/graph.py:bfs_hops); oracle is a real
    WITH RECURSIVE re-derivation."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.graph import (
        bfs_hops,
        ip_threshold_graph,
    )

    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).filter(expr="vec_id < 400")
    edges = ip_threshold_graph(emb, "embedding", "vec_id", tau=0.25)
    return bfs_hops(edges, seeds=range(5), max_hops=4)


def _q_pareto_front_orders(sf_dir: str):
    """Distributed 2-D skyline (Pareto front) of DISTINCT
    (totalprice, order-day) points — per-block vectorized local skyline
    (sort + strict running-max scan), tiny union of local fronts, final
    scan on the driver (front size << data; block-local fronts are the
    classic distributed-skyline reduction)."""

    def local_front(b: pa.Table) -> pa.Table:
        t = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        tp = np.floor(t * 100.0 + 0.5).astype(np.int64)
        dt = (b.column("o_orderdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False) // 86_400_000_000)
        tp2, dt2 = _skyline_2d(tp, dt)
        return pa.table({"tp": pa.array(tp2, pa.int64()),
                         "dt": pa.array(dt2, pa.int64())})

    rows = (_read(sf_dir, "orders", ["o_totalprice", "o_orderdate"])
            .map_batches(local_front, batch_format="pyarrow").take_all())
    tp = np.array([r["tp"] for r in rows], np.int64)
    dt = np.array([r["dt"] for r in rows], np.int64)
    tp, dt = _skyline_2d(tp, dt)
    return pa.table({"totalprice_i2": pa.array(tp, pa.int64()),
                     "order_day": pa.array(dt, pa.int64())})


def _skyline_2d(x: np.ndarray, y: np.ndarray):
    """Distinct 2-D maxima: keep (x, y) iff no other point has both
    coords >= with one strictly greater.  Per distinct x keep max y, then
    one descending-x scan with a strict running max over y."""
    if len(x) == 0:
        return x, y
    order = np.lexsort((-y, -x))
    x, y = x[order], y[order]
    first = np.ones(len(x), dtype=bool)
    first[1:] = x[1:] != x[:-1]          # max-y per distinct x
    x, y = x[first], y[first]
    runmax = np.maximum.accumulate(np.concatenate(([np.iinfo(np.int64).min],
                                                   y[:-1])))
    keep = y > runmax
    out = np.argsort(x[keep], kind="stable")
    return x[keep][out], y[keep][out]


def _q_daily_ohlc(sf_dir: str):
    """Daily OHLC bars over event values — selection-based open/close
    (argmin/argmax partials under the (ts, event_id) total order: no float
    reduction-order hazard), one bar-sized combine
    (pipelines/statagg.py:ohlc_by_key)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import ohlc_by_key

    def prep(b: pa.Table) -> pa.Table:
        ts = b.column("ts").cast(pa.int64())
        return pa.table({
            "day": pc.divide(ts, 86_400_000_000),
            "ts_us": ts,
            "event_id": b.column("event_id"),
            "value": b.column("value"),
        })

    ds = _events(sf_dir, ["event_id", "ts", "value"]) \
        .map_batches(prep, batch_format="pyarrow")
    out = ohlc_by_key(ds, "day", "ts_us", "event_id", "value",
                      vol_scale=1000)
    rows = sorted(out.take_all(), key=lambda r: r["day"])
    return pa.table({
        "day": pa.array([r["day"] for r in rows], pa.int64()),
        "open": pa.array([r["open"] for r in rows], pa.float64()),
        "high": pa.array([r["high"] for r in rows], pa.float64()),
        "low": pa.array([r["low"] for r in rows], pa.float64()),
        "close": pa.array([r["close"] for r in rows], pa.float64()),
        "n": pa.array([r["n"] for r in rows], pa.int64()),
        "vol_q": pa.array([r["vol_q"] for r in rows], pa.int64()),
    })


def _q_events_fingerprint(sf_dir: str):
    """Order-independent 64-bit table digest (anti-entropy / replica
    comparison) — commutative mod-2⁶⁴ dot product, one vectorized
    wraparound pass per batch (pipelines/profile.py:table_fingerprint).
    The oracle recomputes the same digest in HUGEINT; proven layout-proof
    by the repartition test."""
    from insurance_pdf_extractor_ray.pipelines.profile import (
        table_fingerprint)

    def prep(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        return pa.table({
            "event_id": b.column("event_id"),
            "qv": pa.array(np.floor(v * 1000.0 + 0.5).astype(np.int64),
                           pa.int64()),
            "user_id": b.column("user_id"),
        })

    ds = _events(sf_dir, ["event_id", "user_id", "value"]) \
        .map_batches(prep, batch_format="pyarrow")
    hexd = table_fingerprint(ds, ["event_id", "qv", "user_id"])
    d = int(hexd, 16)
    return pa.table({
        "digest_hi": pa.array([d >> 32], pa.int64()),
        "digest_lo": pa.array([d & 0xFFFFFFFF], pa.int64()),
    })


def _q_user_churn_daily(sf_dir: str):
    """Day-over-day user churn (retained / new / churned per day) — distinct
    (day, user) pre-reduce, self-alignment by a +1-day shifted tagged union
    (flag-sum 1=new, 2=churned, 3=retained), ONE (day,user)-keyed combine,
    day-sized final counts.  No self-join: the shift IS the join."""
    from ray.data.aggregate import Sum

    def tag(b: pa.Table) -> pa.Table:
        d = pc.divide(b.column("ts").cast(pa.int64()), 86_400_000_000) \
            .to_numpy(zero_copy_only=False)
        u = b.column("user_id").to_numpy(zero_copy_only=False)
        # distinct (day, user) within batch
        order = np.lexsort((u, d))
        d, u = d[order], u[order]
        first = np.ones(len(d), dtype=bool)
        first[1:] = (d[1:] != d[:-1]) | (u[1:] != u[:-1])
        d, u = d[first], u[first]
        # presence BITS combined by Max (a (day,user) pair may recur across
        # batches — Sum of flags would double-count; Max is the OR)
        return pa.table({
            "day": pa.array(np.concatenate([d, d + 1]), pa.int64()),
            "user_id": pa.array(np.concatenate([u, u]), pa.int64()),
            "_t": pa.array(np.concatenate(
                [np.ones(len(d), np.int64),
                 np.zeros(len(d), np.int64)]), pa.int64()),
            "_y": pa.array(np.concatenate(
                [np.zeros(len(d), np.int64),
                 np.ones(len(d), np.int64)]), pa.int64()),
        })

    from ray.data.aggregate import Max
    g = (_events(sf_dir, ["ts", "user_id"])
         .map_batches(tag, batch_format="pyarrow")
         .groupby(["day", "user_id"]).aggregate(
             Max("_t", alias_name="t"), Max("_y", alias_name="y")))

    def day_counts(b: pa.Table) -> pa.Table:
        d = b.column("day").to_numpy(zero_copy_only=False)
        s = (2 * b.column("y").to_numpy(zero_copy_only=False)
             + b.column("t").to_numpy(zero_copy_only=False))
        t = pa.table({
            "day": pa.array(d, pa.int64()),
            "_r": pa.array((s == 3).astype(np.int64)),
            "_n": pa.array((s == 1).astype(np.int64)),
            "_c": pa.array((s == 2).astype(np.int64)),
        })
        agg = t.group_by("day").aggregate(
            [("_r", "sum"), ("_n", "sum"), ("_c", "sum")])
        return agg.rename_columns(["day", "_r", "_n", "_c"])

    from ray.data.aggregate import Sum as _Sum
    agg = (g.map_batches(day_counts, batch_format="pyarrow")
           .groupby("day").aggregate(
               _Sum("_r", alias_name="retained"),
               _Sum("_n", alias_name="new_users"),
               _Sum("_c", alias_name="churned")))
    rows = sorted(agg.take_all(), key=lambda r: r["day"])
    return pa.table({
        "day": pa.array([r["day"] for r in rows], pa.int64()),
        "retained": pa.array([r["retained"] for r in rows], pa.int64()),
        "new_users": pa.array([r["new_users"] for r in rows], pa.int64()),
        "churned": pa.array([r["churned"] for r in rows], pa.int64()),
    })


def _q_pq_codes(sf_dir: str):
    """Product-quantization code assignment: 64-dim embeddings split into
    4×16-dim sub-blocks, each assigned to the nearest of 8 fixed codebook
    centroids (the sub-vectors of vec_ids 0..7) — integer-quantized squared
    L2 so the argmin is exact on both sides; codebook broadcast once, one
    zero-shuffle vectorized assignment pass (the PQ *training* loop is
    kmeans_embeddings' job)."""
    import ray.data

    Q = 1 << 20
    emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                columns=["vec_id", "embedding"])
    seed_rows = sorted(emb.filter(expr="vec_id < 8").take_all(),
                       key=lambda r: r["vec_id"])
    mat = np.array([r["embedding"] for r in seed_rows], np.float64)
    qcb = (-np.floor(-(mat * Q) + 0.5)).astype(np.int64)   # (8, 64)
    dim = qcb.shape[1]
    n_sub = 4
    sub = dim // n_sub
    import ray as _ray
    cb_ref = _ray.put(qcb)

    def assign(b: pa.Table, ref) -> pa.Table:
        cb = _ray.get(ref)
        from insurance_pdf_extractor_ray.pipelines.similarity import (
            embedding_matrix)
        x = embedding_matrix(b.column("embedding"))
        qx = (-np.floor(-(x * Q) + 0.5)).astype(np.int64)
        cols = {"vec_id": b.column("vec_id")}
        for s in range(n_sub):
            xs = qx[:, s * sub:(s + 1) * sub]
            cs = cb[:, s * sub:(s + 1) * sub]
            d2 = (xs * xs).sum(axis=1, keepdims=True) \
                - 2 * (xs @ cs.T) + (cs * cs).sum(axis=1)[None, :]
            cols[f"code{s}"] = pa.array(np.argmin(d2, axis=1)
                                        .astype(np.int64), pa.int64())
        return pa.table(cols)

    import functools
    out = emb.map_batches(functools.partial(assign, ref=cb_ref),
                          batch_format="pyarrow")
    rows = sorted(out.take_all(), key=lambda r: r["vec_id"])
    return pa.table({
        "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
        **{f"code{s}": pa.array([r[f"code{s}"] for r in rows], pa.int64())
           for s in range(n_sub)},
    })


def _q_weekday_residuals(sf_dir: str):
    """Seasonal-naive anomaly signal: each day's event-value total vs its
    weekday-of-week mean (integer day-keyed count shuffle bounded by days;
    residual math on the day table, mirrored op-for-op in SQL)."""
    from ray.data.aggregate import Sum

    def day_part(b: pa.Table) -> pa.Table:
        d = pc.divide(b.column("ts").cast(pa.int64()), 86_400_000_000)
        v = b.column("value").to_numpy(zero_copy_only=False)
        t = pa.table({
            "day": d,
            "_v": pa.array(np.floor(v * 1000.0 + 0.5).astype(np.int64)),
        })
        g = t.group_by("day").aggregate([("_v", "sum")])
        return g.rename_columns(["day", "_v"])

    rows = (_events(sf_dir, ["ts", "value"])
            .map_batches(day_part, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("_v", alias_name="total_i3"))
            .take_all())
    rows.sort(key=lambda r: r["day"])
    wsum: dict = {}
    wcnt: dict = {}
    for r in rows:
        w = int(r["day"]) % 7
        wsum[w] = wsum.get(w, 0) + int(r["total_i3"])
        wcnt[w] = wcnt.get(w, 0) + 1
    out = []
    for r in rows:
        w = int(r["day"]) % 7
        mean = float(wsum[w]) / wcnt[w]
        resid = (float(r["total_i3"]) - mean) / mean
        out.append((int(r["day"]), w, int(r["total_i3"]),
                    _round_away(resid, 9)))
    return pa.table({
        "day": pa.array([t[0] for t in out], pa.int64()),
        "weekday": pa.array([t[1] for t in out], pa.int64()),
        "total_i3": pa.array([t[2] for t in out], pa.int64()),
        "resid": pa.array([t[3] for t in out], pa.float64()),
    })


def _q_proportional_budget_sample(sf_dir: str):
    """Exact proportional eval-set allocation (largest-remainder / Hamilton
    apportionment of a 137-doc budget across sources) + deterministic
    per-source take — source-sized count combine, integer-exact quota math,
    grouped row-number gate; total sampled == budget exactly."""
    from ray.data.aggregate import Count

    from insurance_pdf_extractor_ray.pipelines.ordering import (
        grouped_row_number)

    B = 137
    counts = sorted(
        _documents(sf_dir, ["doc_id", "source"])
        .groupby("source").aggregate(Count(alias_name="n")).take_all(),
        key=lambda r: r["source"])
    tot = sum(int(r["n"]) for r in counts)
    fl = {r["source"]: (B * int(r["n"])) // tot for r in counts}
    rem = {r["source"]: (B * int(r["n"])) % tot for r in counts}
    leftover = B - sum(fl.values())
    order = sorted(fl, key=lambda s: (-rem[s], s))
    quota = {s: fl[s] + (1 if i < leftover else 0)
             for i, s in enumerate(order)}
    assert sum(quota.values()) == B

    ds = grouped_row_number(
        _documents(sf_dir, ["doc_id", "source"]),
        ["source"], ["doc_id"], out_col="_rn")

    def gate(b: pa.Table) -> pa.Table:
        src = b.column("source").to_pylist()
        rn = b.column("_rn").to_numpy(zero_copy_only=False)
        keep = np.array([rn[i] < quota[s] for i, s in enumerate(src)],
                        dtype=bool)   # rn is 0-based: first `quota` rows
        return pa.table({
            "doc_id": b.column("doc_id").filter(pa.array(keep)),
            "source": b.column("source").filter(pa.array(keep)),
        })

    rows = sorted(ds.map_batches(gate, batch_format="pyarrow").take_all(),
                  key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
    })


def _q_mannwhitney_value(sf_dir: str):
    """Exact Mann-Whitney U (purchase vs view event values) with the full
    tie correction — pairwise-count formulation over the QUANTIZED distinct
    value table (U from per-value counts + a cumulative less-than sum, no
    global rank assignment): map-side (value, n1, n2) partials, ONE
    value-keyed combine bounded by distinct quantized values, closed-form z
    mirrored op-for-op in SQL.  2·U stays integer under average-rank tie
    handling."""
    import math

    from ray.data.aggregate import Sum

    def partial(b: pa.Table) -> pa.Table:
        v = b.column("value").to_numpy(zero_copy_only=False)
        qv = np.floor(v * 1000.0 + 0.5).astype(np.int64)
        is1 = np.asarray(
            pc.equal(b.column("event_type"), "purchase")).astype(np.int64)
        t = pa.table({"qv": pa.array(qv), "_n1": pa.array(is1),
                      "_n2": pa.array(1 - is1)})
        g = t.group_by("qv").aggregate([("_n1", "sum"), ("_n2", "sum")])
        return g.rename_columns(["qv", "_n1", "_n2"])

    rows = (_events(sf_dir, ["event_type", "value"])
            .filter(expr="event_type == 'purchase' or event_type == 'view'")
            .map_batches(partial, batch_format="pyarrow")
            .groupby("qv").aggregate(Sum("_n1", alias_name="n1"),
                                     Sum("_n2", alias_name="n2"))
            .take_all())
    rows.sort(key=lambda r: r["qv"])
    tn1 = tn2 = u2 = tie = less2 = 0
    for r in rows:
        n1, n2 = int(r["n1"]), int(r["n2"])
        u2 += 2 * n1 * less2 + n1 * n2
        t = n1 + n2
        tie += t * t * t - t
        tn1 += n1
        tn2 += n2
        less2 += n2
    num = float(u2) / 2 - float(tn1 * tn2) / 2
    den = math.sqrt(float(tn1 * tn2) / 12
                    * ((tn1 + tn2 + 1)
                       - float(tie) / ((tn1 + tn2) * (tn1 + tn2 - 1))))
    return pa.table({
        "u2x": pa.array([u2], pa.int64()),
        "z": pa.array([_round_away(num / den, 9)], pa.float64()),
    })


def _q_third_purchase_ts(sf_dir: str):
    """Per-user k-th-event milestone (timestamp of the 3rd purchase under
    the (ts, event_id) total order) — grouped row-number metadata wave,
    zero-move rank gate (pipelines/ordering.py:grouped_row_number)."""
    from insurance_pdf_extractor_ray.pipelines.ordering import (
        grouped_row_number)

    p = _events(sf_dir, ["user_id", "event_id", "ts", "event_type"]) \
        .filter(expr="event_type == 'purchase'")

    def us(b: pa.Table) -> pa.Table:
        return pa.table({"user_id": b.column("user_id"),
                         "event_id": b.column("event_id"),
                         "ts_us": b.column("ts").cast(pa.int64())})

    p = p.map_batches(us, batch_format="pyarrow")
    ds = grouped_row_number(p, ["user_id"], ["ts_us", "event_id"],
                            out_col="_rn")
    rows = sorted(
        ds.filter(expr="_rn == 2").select_columns(["user_id", "ts_us"])
          .take_all(), key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "third_ts_us": pa.array([r["ts_us"] for r in rows], pa.int64()),
    })


def _q_interval_coverage(sf_dir: str):
    """Interval-union coverage per user (sweep-line): total distinct
    microseconds covered by the user's 5-minute event windows + island
    count — merge-islands operator then a user-sized combine
    (pipelines/intervals.py:merge_intervals_by_key)."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.pipelines.intervals import (
        merge_intervals_by_key)

    W = 300_000_000  # 5 min in µs

    def iv(b: pa.Table) -> pa.Table:
        s = b.column("ts").cast(pa.int64())
        return pa.table({"user_id": b.column("user_id"), "s": s,
                         "e": pc.add(s, W)})

    islands = merge_intervals_by_key(
        _events(sf_dir, ["user_id", "ts"]).map_batches(
            iv, batch_format="pyarrow"),
        "user_id", "s", "e")

    def lengths(b: pa.Table) -> pa.Table:
        return pa.table({
            "user_id": b.column("user_id"),
            "_len": pc.subtract(b.column("e"), b.column("s")),
        })

    agg = (islands.map_batches(lengths, batch_format="pyarrow")
           .groupby("user_id").aggregate(
               Sum("_len", alias_name="covered_us"),
               Count(alias_name="n_islands")))
    rows = sorted(agg.take_all(), key=lambda r: r["user_id"])
    return pa.table({
        "user_id": pa.array([r["user_id"] for r in rows], pa.int64()),
        "covered_us": pa.array([r["covered_us"] for r in rows], pa.int64()),
        "n_islands": pa.array([r["n_islands"] for r in rows], pa.int64()),
    })


def _q_top_dims_per_vector(sf_dir: str):
    """Vector/list ops: the 3 highest-|value| dimensions per embedding
    (integer-quantized magnitudes, stable argsort so ties break by
    dimension index — exact on both sides; zero-shuffle pass)."""
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        embedding_matrix)

    Q = 1 << 20

    def top3(b: pa.Table) -> pa.Table:
        if b.num_rows == 0:
            return pa.table({"vec_id": pa.array([], pa.int64()),
                             **{f"d{j}": pa.array([], pa.int64())
                                for j in range(3)}})
        x = embedding_matrix(b.column("embedding"))
        q = (-np.floor(-(x * Q) + 0.5)).astype(np.int64)
        idx = np.argsort(-np.abs(q), axis=1, kind="stable")[:, :3]
        return pa.table({
            "vec_id": b.column("vec_id"),
            **{f"d{j}": pa.array(idx[:, j], pa.int64()) for j in range(3)},
        })

    out = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).map_batches(
            top3, batch_format="pyarrow")
    rows = sorted(out.take_all(), key=lambda r: r["vec_id"])
    return pa.table({
        "vec_id": pa.array([r["vec_id"] for r in rows], pa.int64()),
        **{f"d{j}": pa.array([r[f"d{j}"] for r in rows], pa.int64())
           for j in range(3)},
    })


def _q_reciprocal_topk_pairs(sf_dir: str):
    """Reciprocal nearest-neighbor pairs (mutual top-3 by the integer-exact
    quantized inner product, neighbor-id tiebreak) — the agglomerative-
    clustering / duplicate-candidate primitive.  Broadcast candidate matrix,
    per-batch int64 matmul + stable argsort (ties break by column order =
    ascending id), directed top-3 edges, ONE pair-keyed combine keeping
    count==2 (both directions present)."""
    import ray.data
    from ray.data.aggregate import Count

    from insurance_pdf_extractor_ray.pipelines.similarity import (
        embedding_matrix)

    Q = 1 << 20
    emb = ray.data.read_parquet(
        os.path.join(sf_dir, "embeddings.parquet"),
        columns=["vec_id", "embedding"]).filter(expr="vec_id < 400")
    small = sorted(emb.take_all(), key=lambda r: r["vec_id"])
    ids = np.array([r["vec_id"] for r in small], np.int64)
    mat = np.array([r["embedding"] for r in small], np.float64)
    qm = (-np.floor(-(mat * Q) + 0.5)).astype(np.int64)
    import ray as _ray
    ref = _ray.put((ids, qm))

    def edges(b: pa.Table, bref) -> pa.Table:
        bids, bq = _ray.get(bref)
        x = embedding_matrix(b.column("embedding"))
        qx = (-np.floor(-(x * Q) + 0.5)).astype(np.int64)
        rid = b.column("vec_id").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        sim = qx @ bq.T
        # min+1, NOT min: argsort ranks by -sim and -int64.min overflows
        # back to int64.min (would rank self FIRST); -(min+1) == int64.max
        # ranks self last, which is the exclusion we want
        sim[rid[:, None] == bids[None, :]] = np.iinfo(np.int64).min + 1
        top = np.argsort(-sim, axis=1, kind="stable")[:, :3]
        a = np.repeat(rid, 3)
        nb = bids[top.ravel()]
        return pa.table({
            "lo": pa.array(np.minimum(a, nb), pa.int64()),
            "hi": pa.array(np.maximum(a, nb), pa.int64()),
        })

    import functools
    pairs = (emb.map_batches(functools.partial(edges, bref=ref),
                             batch_format="pyarrow")
             .groupby(["lo", "hi"]).aggregate(Count(alias_name="n"))
             .filter(expr="n == 2"))
    rows = sorted(pairs.take_all(), key=lambda r: (r["lo"], r["hi"]))
    return pa.table({
        "id_a": pa.array([r["lo"] for r in rows], pa.int64()),
        "id_b": pa.array([r["hi"] for r in rows], pa.int64()),
    })


def _q_lang_majority_mismatch(sf_dir: str):
    """Data-quality audit: docs whose language differs from their source's
    majority language (mode with (count desc, lang asc) tiebreak) —
    (source, lang)-sized count combine, driver majority map, broadcast
    filter pass."""
    from ray.data.aggregate import Count

    counts = (_documents(sf_dir, ["source", "lang"])
              .groupby(["source", "lang"]).aggregate(Count(alias_name="n"))
              .take_all())
    best: dict = {}
    for r in counts:
        key = r["source"]
        cand = (-int(r["n"]), r["lang"])
        if key not in best or cand < best[key]:
            best[key] = cand
    majority = {s: v[1] for s, v in best.items()}

    def mism(b: pa.Table) -> pa.Table:
        src = b.column("source").to_pylist()
        lang = b.column("lang").to_pylist()
        keep = np.array([lang[i] != majority[s] for i, s in enumerate(src)],
                        dtype=bool)
        pk = pa.array(keep)
        return pa.table({"doc_id": b.column("doc_id").filter(pk),
                         "source": b.column("source").filter(pk),
                         "lang": b.column("lang").filter(pk)})

    rows = sorted(
        _documents(sf_dir, ["doc_id", "source", "lang"])
        .map_batches(mism, batch_format="pyarrow").take_all(),
        key=lambda r: r["doc_id"])
    return pa.table({
        "doc_id": pa.array([r["doc_id"] for r in rows], pa.int64()),
        "source": pa.array([r["source"] for r in rows], pa.string()),
        "lang": pa.array([r["lang"] for r in rows], pa.string()),
    })


def _q_dup_window_profile(sf_dir: str):
    """Duplication profile across window scales: for k in {4, 8, 16, 32},
    the number of k-word windows shared by >= 2 docs — the curve that picks
    the substring-dedup k (Lee et al. 2022 run length).  One distributed
    pass per k over pipelines/substrdedup.py:dup_window_hashes (hash
    identity; the oracle re-derives from window strings)."""
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        dup_window_hashes)

    docs = _documents(sf_dir, ["doc_id", "text"])
    ks = [4, 8, 16, 32]
    counts = [dup_window_hashes(docs, "text", k=k, min_docs=2).count()
              for k in ks]
    return pa.table({
        "k": pa.array(ks, pa.int64()),
        "n_dup_windows": pa.array(counts, pa.int64()),
    })


def _q_bounce_rate_daily(sf_dir: str):
    """Daily session bounce rate: share of 30-minute activity sessions
    containing exactly one event, bucketed by session-start day — islands
    operator then a day-sized combine; the ratio is mirrored as an exact
    integer pair + one rounded division."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.pipelines.intervals import (
        merge_intervals_by_key)

    ev = _events(sf_dir, ["user_id", "ts"])

    def to_iv(t: pa.Table) -> pa.Table:
        s = t.column("ts").cast(pa.int64())
        return pa.table({"user_id": t.column("user_id"), "s_us": s,
                         "e_us": pc.add(s, 1_800_000_000)})

    islands = merge_intervals_by_key(
        ev.map_batches(to_iv, batch_format="pyarrow"),
        "user_id", "s_us", "e_us", count_alias="n_events")

    def day_part(b: pa.Table) -> pa.Table:
        d = pc.divide(b.column("s_us"), 86_400_000_000)
        one = pc.cast(pc.equal(b.column("n_events"), 1), pa.int64())
        return pa.table({"day": d,
                         "_n": pa.array(np.ones(b.num_rows, np.int64)),
                         "_b": one})

    agg = (islands.map_batches(day_part, batch_format="pyarrow")
           .groupby("day").aggregate(Sum("_n", alias_name="n_sessions"),
                                     Sum("_b", alias_name="n_bounces")))
    rows = sorted(agg.take_all(), key=lambda r: r["day"])
    return pa.table({
        "day": pa.array([r["day"] for r in rows], pa.int64()),
        "n_sessions": pa.array([r["n_sessions"] for r in rows], pa.int64()),
        "n_bounces": pa.array([r["n_bounces"] for r in rows], pa.int64()),
        "bounce_rate": pa.array(
            [_round_away(float(r["n_bounces"]) / float(r["n_sessions"]), 9)
             for r in rows], pa.float64()),
    })


def _q_acf_daily(sf_dir: str):
    """Autocorrelation function of the daily event-count series at lags
    1..7 (weekly-seasonality detector) — ONE day-keyed count shuffle, then
    per-lag exact integer moment sums and the closed-form Pearson r
    mirrored per-lag in SQL (LAG(n, L))."""
    import math

    from ray.data.aggregate import Sum

    def day_part(b: pa.Table) -> pa.Table:
        d = pc.divide(b.column("ts").cast(pa.int64()), 86_400_000_000)
        t = pa.table({"day": d,
                      "_n": pa.array(np.ones(b.num_rows, dtype=np.int64))})
        return t.group_by("day").aggregate([("_n", "sum")]) \
                .rename_columns(["day", "_n"])

    rows = (_events(sf_dir, ["ts"])
            .map_batches(day_part, batch_format="pyarrow")
            .groupby("day").aggregate(Sum("_n", alias_name="n"))
            .take_all())
    rows.sort(key=lambda r: r["day"])
    ns = [int(r["n"]) for r in rows]
    lags, acfs = [], []
    for L in range(1, 8):
        x, y = ns[L:], ns[:-L]
        k = len(x)
        if k < 2:
            continue
        sx, sy = sum(x), sum(y)
        sxx = sum(v * v for v in x)
        syy = sum(v * v for v in y)
        sxy = sum(a * b for a, b in zip(x, y))
        den = math.sqrt(float(k * sxx - sx * sx) * float(k * syy - sy * sy))
        lags.append(L)
        acfs.append(_round_away(float(k * sxy - sx * sy) / den, 9))
    return pa.table({"lag": pa.array(lags, pa.int64()),
                     "acf": pa.array(acfs, pa.float64())})


def _acf_oracle() -> str:
    legs = []
    for L in range(1, 8):
        legs.append(f"""
            SELECT {L} AS lag, n,
                   LAG(n, {L}) OVER (ORDER BY day) AS pn
            FROM d""")
    return ("""
        WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                          AS day, CAST(COUNT(*) AS BIGINT) AS n
                   FROM events GROUP BY 1),
        p AS (""" + " UNION ALL ".join(legs) + """),
        s AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(n) AS BIGINT) AS sx,
                     CAST(SUM(pn) AS BIGINT) AS sy,
                     CAST(SUM(n * pn) AS BIGINT) AS sxy,
                     CAST(SUM(n * n) AS BIGINT) AS sxx,
                     CAST(SUM(pn * pn) AS BIGINT) AS syy
              FROM p WHERE pn IS NOT NULL GROUP BY 1)
        SELECT CAST(lag AS BIGINT) AS lag,
               ROUND(CAST(k * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(k * sxx - sx * sx AS DOUBLE)
                            * CAST(k * syy - sy * sy AS DOUBLE)), 9) AS acf
        FROM s WHERE k >= 2 ORDER BY lag
    """)


def _q_lorenz_chars(sf_dir: str):
    """Data-concentration audit (Lorenz points): per length-decile share
    and cumulative share of total corpus characters — global NTILE sort
    wave, decile-sized integer combine, shares mirrored as rounded
    divisions of exact integer sums."""
    from ray.data.aggregate import Count, Sum

    from insurance_pdf_extractor_ray.pipelines.ordering import ntile

    docs = _documents(sf_dir, ["doc_id", "n_chars"])
    tiled = ntile(docs, ["n_chars", "doc_id"], 10, out_col="decile")
    agg = (tiled.groupby("decile").aggregate(
        Sum("n_chars", alias_name="chars"), Count(alias_name="n_docs")))
    rows = sorted(agg.take_all(), key=lambda r: r["decile"])
    total = sum(int(r["chars"]) for r in rows)
    cum = 0
    out = []
    for r in rows:
        c = int(r["chars"])
        cum += c
        out.append((int(r["decile"]), int(r["n_docs"]), c,
                    _round_away(float(c) / float(total), 9),
                    _round_away(float(cum) / float(total), 9)))
    return pa.table({
        "decile": pa.array([t[0] for t in out], pa.int64()),
        "n_docs": pa.array([t[1] for t in out], pa.int64()),
        "chars": pa.array([t[2] for t in out], pa.int64()),
        "share": pa.array([t[3] for t in out], pa.float64()),
        "cum_share": pa.array([t[4] for t in out], pa.float64()),
    })


def _q_markov_entropy_rate(sf_dir: str):
    """Behavior predictability: entropy rate of the per-user event-type
    Markov chain, H = Σ_ij (n_ij/N)·ln(n_i/n_ij) over the transition-count
    table — ONE keyed transition shuffle (type²-bounded result), driver
    arithmetic mirrored in SQL."""
    import math

    from insurance_pdf_extractor_ray.pipelines.behavior import (
        transition_counts)

    out = transition_counts(
        _events(sf_dir, ["event_id", "user_id", "event_type", "ts"]),
        "user_id", "event_type", "ts", order_tiebreak="event_id")
    rows = sorted(out.take_all(),
                  key=lambda r: (r["from_item"], r["to_item"]))
    N = sum(int(r["n"]) for r in rows)
    row_tot: dict = {}
    for r in rows:
        row_tot[r["from_item"]] = row_tot.get(r["from_item"], 0) \
            + int(r["n"])
    h = sum((float(r["n"]) / N)
            * math.log(float(row_tot[r["from_item"]]) / float(r["n"]))
            for r in rows)
    return pa.table({
        "n_transitions": pa.array([N], pa.int64()),
        "entropy_rate": pa.array([_round_away(h, 9)], pa.float64()),
    })


def _q_q6_forecast_revenue(sf_dir: str):
    """TPC-H Q6 analog: forecast-revenue-change scalar — pruned-column
    read, one vectorized filtered integer partial per batch, zero
    shuffles."""
    from ray.data.aggregate import Sum

    lo = int(pd.Timestamp("1996-01-01").value // 1000)
    hi = int(pd.Timestamp("1997-01-01").value // 1000)

    def partial(b: pa.Table) -> pa.Table:
        d = b.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        keep = ((d >= lo) & (d < hi) & (disc >= 0.05) & (disc <= 0.07)
                & (qty < 24))
        rev = ep[keep] * disc[keep] * 10000.0
        s = int(np.floor(rev + 0.5).astype(np.int64).sum())
        return pa.table({"_s": pa.array([s], pa.int64())})

    agg = (_read(sf_dir, "lineitem",
                 ["l_shipdate", "l_discount", "l_quantity",
                  "l_extendedprice"])
           .map_batches(partial, batch_format="pyarrow")
           .aggregate(Sum("_s", alias_name="revenue_i4")))
    return pa.table({"revenue_i4": pa.array([agg["revenue_i4"]],
                                            pa.int64())})


def _q_q14_promo_share(sf_dir: str):
    """TPC-H Q14 analog: monthly promo-revenue share — broadcast promo
    partkey set (ray.put once), per-batch conditional integer partials,
    ONE month-sized combine, mirrored rounded division."""
    from ray.data.aggregate import Sum

    promo = np.array(sorted(
        r["p_partkey"] for r in _read(sf_dir, "part",
                                      ["p_partkey", "p_type"]).take_all()
        if r["p_type"].startswith("PROMO")), np.int64)
    import ray as _ray
    pref = _ray.put(promo)

    def partial(b: pa.Table, ref) -> pa.Table:
        pk = _ray.get(ref)
        us = b.column("l_shipdate").cast(pa.int64()).to_numpy(
            zero_copy_only=False)
        month = np.asarray(us, dtype="datetime64[us]") \
            .astype("datetime64[M]").astype(np.int64)
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        part = b.column("l_partkey").to_numpy(zero_copy_only=False)
        rev = np.floor(ep * (1.0 - disc) * 10000.0 + 0.5).astype(np.int64)
        isp = np.isin(part, pk)
        t = pa.table({
            "m": pa.array(month, pa.int64()),
            "_p": pa.array(np.where(isp, rev, 0), pa.int64()),
            "_t": pa.array(rev, pa.int64()),
        })
        return t.group_by("m").aggregate([("_p", "sum"), ("_t", "sum")]) \
                .rename_columns(["m", "_p", "_t"])

    import functools
    agg = (_read(sf_dir, "lineitem",
                 ["l_shipdate", "l_partkey", "l_extendedprice",
                  "l_discount"])
           .map_batches(functools.partial(partial, ref=pref),
                        batch_format="pyarrow")
           .groupby("m").aggregate(Sum("_p", alias_name="promo_i4"),
                                   Sum("_t", alias_name="total_i4")))
    rows = sorted(agg.take_all(), key=lambda r: r["m"])
    return pa.table({
        "month_idx": pa.array([r["m"] for r in rows], pa.int64()),
        "promo_i4": pa.array([r["promo_i4"] for r in rows], pa.int64()),
        "total_i4": pa.array([r["total_i4"] for r in rows], pa.int64()),
        "promo_pct": pa.array(
            [_round_away(100.0 * float(r["promo_i4"])
                         / float(r["total_i4"]), 9) for r in rows],
            pa.float64()),
    })


def _q_heaps_growth(sf_dir: str):
    """Heaps-law vocabulary growth: cumulative DISTINCT 3-word windows
    after each corpus quartile (by doc id) — computed in ONE window-keyed
    shuffle, not four scans: each window hash keeps the MIN quartile that
    contains it, a quartile-sized count combine follows, and the cumulative
    curve is the running sum (hash identity; oracle re-derives from window
    strings)."""
    from ray.data.aggregate import Count, Min

    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        _batch_windows,
        _roll,
    )

    def partial(b: pa.Table, denom) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        counts, _, wordh = _batch_windows(b.column("text").to_pylist())
        wh, wd, _ = _roll(wordh, counts, 3)
        if len(wh) == 0:
            return pa.table({"_wh": pa.array([], pa.int64()),
                             "_q": pa.array([], pa.int64())})
        q = (ids[wd] * 4) // denom
        t = pa.table({"_wh": pa.array(wh, pa.int64()),
                      "_q": pa.array(q, pa.int64())})
        g = t.group_by("_wh").aggregate([("_q", "min")])
        return g.rename_columns(["_wh", "_q"])

    import functools
    docs = _documents(sf_dir, ["doc_id", "text"])
    mx = int(docs.select_columns(["doc_id"]).max("doc_id")) + 1

    agg = (docs.map_batches(functools.partial(partial, denom=mx),
                            batch_format="pyarrow")
           .groupby("_wh").aggregate(Min("_q", alias_name="q"))
           .groupby("q").aggregate(Count(alias_name="new_windows")))
    rows = sorted(agg.take_all(), key=lambda r: r["q"])
    got = {int(r["q"]): int(r["new_windows"]) for r in rows}
    cum = 0
    out = []
    for qq in range(4):
        n = got.get(qq, 0)
        cum += n
        out.append((qq, n, cum))
    return pa.table({
        "quartile": pa.array([t[0] for t in out], pa.int64()),
        "new_windows": pa.array([t[1] for t in out], pa.int64()),
        "cum_distinct": pa.array([t[2] for t in out], pa.int64()),
    })


def _q_q19_band_revenue(sf_dir: str):
    """TPC-H Q19 analog: revenue under a DISJUNCTION of (brand, size band,
    quantity band) predicates — part attributes broadcast once as aligned
    arrays (ray.put), per-batch vectorized compound mask via searchsorted
    key lookup, scalar integer combine, zero shuffles."""
    from ray.data.aggregate import Sum

    parts = sorted(_read(sf_dir, "part",
                         ["p_partkey", "p_brand", "p_size"]).take_all(),
                   key=lambda r: r["p_partkey"])
    keys = np.array([r["p_partkey"] for r in parts], np.int64)
    brands = np.array([r["p_brand"] for r in parts])
    sizes = np.array([r["p_size"] for r in parts], np.int64)
    import ray as _ray
    ref = _ray.put((keys, brands, sizes))

    def partial(b: pa.Table, r) -> pa.Table:
        k, br, sz = _ray.get(r)
        part = b.column("l_partkey").to_numpy(zero_copy_only=False)
        qty = b.column("l_quantity").to_numpy(zero_copy_only=False)
        ep = b.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = b.column("l_discount").to_numpy(zero_copy_only=False)
        idx = np.clip(np.searchsorted(k, part), 0, len(k) - 1)
        valid = k[idx] == part          # FK orphans match nothing
        pb, ps = br[idx], sz[idx]
        qty = np.where(valid, qty, -1.0)
        m1 = (pb == "Brand#11") & (ps >= 1) & (ps <= 10) \
            & (qty >= 1) & (qty <= 20)
        m2 = (pb == "Brand#22") & (ps >= 5) & (ps <= 20) \
            & (qty >= 10) & (qty <= 30)
        keep = m1 | m2
        rev = ep[keep] * (1.0 - disc[keep]) * 10000.0
        s = int(np.floor(rev + 0.5).astype(np.int64).sum())
        n = int(keep.sum())
        return pa.table({"_s": pa.array([s], pa.int64()),
                         "_n": pa.array([n], pa.int64())})

    import functools
    agg = (_read(sf_dir, "lineitem",
                 ["l_partkey", "l_quantity", "l_extendedprice",
                  "l_discount"])
           .map_batches(functools.partial(partial, r=ref),
                        batch_format="pyarrow")
           .aggregate(Sum("_s", alias_name="revenue_i4"),
                      Sum("_n", alias_name="n_lines")))
    return pa.table({
        "revenue_i4": pa.array([agg["revenue_i4"]], pa.int64()),
        "n_lines": pa.array([agg["n_lines"]], pa.int64()),
    })


def _q_order_concentration_gini(sf_dir: str):
    """Gini coefficient of per-customer order counts — the demand-skew /
    hot-key health number on the orders stream
    (pipelines/statagg.py:gini_of_counts)."""
    from insurance_pdf_extractor_ray.pipelines.statagg import gini_of_counts

    out = gini_of_counts(_read(sf_dir, "orders", ["o_custkey"]),
                         "o_custkey")
    return _round_col(out, "gini", 9)


def _q_revenue_share_rank(sf_dir: str):
    """Share-of-parent + rank within group (window over aggregate): each
    nation's share of its region's order revenue — dims broadcast, ONE
    customer-keyed join, (region, nation)-sized combine, window math on the
    bounded result."""
    from ray.data.aggregate import Sum

    from insurance_pdf_extractor_ray.pipelines.dedup import _join_partitions
    from insurance_pdf_extractor_ray.pipelines.joins import (
        broadcast_join,
        shuffle_join,
    )

    nation = _read(sf_dir, "nation",
                   ["n_nationkey", "n_name", "n_regionkey"])
    region = _read(sf_dir, "region", ["r_regionkey", "r_name"])
    nat = broadcast_join(nation, region, on="n_regionkey",
                         right_on="r_regionkey", add_cols=["r_name"],
                         how="inner")
    cust = broadcast_join(
        _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]), nat,
        on="c_nationkey", right_on="n_nationkey",
        add_cols=["n_name", "r_name"], how="inner")

    def tp_i2(b: pa.Table) -> pa.Table:
        t = b.column("o_totalprice").to_numpy(zero_copy_only=False)
        return pa.table({
            "o_custkey": b.column("o_custkey"),
            "tp_i2": pa.array(np.floor(t * 100.0 + 0.5).astype(np.int64),
                              pa.int64()),
        })

    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]) \
        .map_batches(tp_i2, batch_format="pyarrow")
    j = shuffle_join(orders, cust, on="o_custkey", right_on="c_custkey",
                     num_partitions=_join_partitions())
    agg = j.groupby(["r_name", "n_name"]).aggregate(
        Sum("tp_i2", alias_name="revenue_i2"))
    rows = sorted(agg.take_all(), key=lambda r: (r["r_name"], r["n_name"]))
    totals: dict = {}
    for r in rows:
        totals[r["r_name"]] = totals.get(r["r_name"], 0) + int(r["revenue_i2"])
    by_region: dict = {}
    for r in rows:
        by_region.setdefault(r["r_name"], []).append(r)
    out = []
    for reg in sorted(by_region):
        rs = sorted(by_region[reg],
                    key=lambda r: (-int(r["revenue_i2"]), r["n_name"]))
        for i, r in enumerate(rs):
            share = _round_away(
                float(r["revenue_i2"]) / float(totals[reg]), 9)
            out.append((reg, r["n_name"], int(r["revenue_i2"]), share,
                        i + 1))
    return pa.table({
        "r_name": pa.array([t[0] for t in out], pa.string()),
        "n_name": pa.array([t[1] for t in out], pa.string()),
        "revenue_i2": pa.array([t[2] for t in out], pa.int64()),
        "share": pa.array([t[3] for t in out], pa.float64()),
        "rnk": pa.array([t[4] for t in out], pa.int64()),
    })


def queries() -> dict[str, Callable[[str], Any]]:
    return {
        "extract_fields": _q_extract_fields,
        "extract_spans": _q_extract_spans,
        "layout_extract": _q_layout_extract,
        "extract_fields_check": _q_extract_fields_check,
        "extract_spans_check": _q_extract_spans_check,
        "layout_extract_check": _q_layout_extract_check,
        "exact_dedup": _q_exact_dedup,
        "global_stats": _q_global_stats,
        "stats_by_type": _q_stats_by_type,
        "daily_trends": _q_daily_trends,
        "top10_by_value": _q_top10_by_value,
        "event_breakdown": _q_breakdown,
        "recent_n": _q_recent_n,
        "search_filter": _q_search_filter,
        "orders_customer_join": _q_orders_join,
        "anti_join_docs": _q_anti_join,
        "token_explode": _q_token_explode,
        "doc_token_stats": _q_doc_token_stats,
        "knn_embeddings": _q_knn,
        "knn_ivf": _q_knn_ivf,
        "minhash_dedup": _q_minhash_dedup,
        "simhash_dedup": _q_simhash_dedup,
        "text_analysis": _q_text_analysis,
        "field_success_rates": _q_field_success_rates,
        "quality_filter": _q_quality_filter,
        "repetition_stats": _q_repetition_stats,
        "media_decode": _q_media_decode,
        "retention_filter": _q_retention,
        "json_props_stats": _q_json_props_stats,
        "html_main_content": _q_html_main_content,
        "tumbling_window": _q_tumbling_window,
        "sliding_window": _q_sliding_window,
        "session_windows": _q_session_windows,
        "grouped_topk": _q_grouped_topk,
        "distinct_users_by_type": _q_distinct_users,
        "value_quantiles_by_type": _q_value_quantiles,
        "asof_last_click": _q_asof_last_click,
        "embedding_dedup": _q_embedding_dedup,
        "top_term_per_doc": _q_top_term,
        "orders_lineitem_join": _q_orders_lineitem_join,
        "hourly_distinct_users": _q_hourly_distinct_users,
        "events_in_sessions": _q_events_in_sessions,
        "stratified_sample": _q_stratified_sample,
        "profile_documents": _q_profile_documents,
        "pack_sequences": _q_pack_sequences,
        "decontaminate": _q_decontaminate,
        "pivot_event_daily": _q_pivot_event_daily,
        "funnel_view_click_purchase": _q_funnel,
        "cohort_retention": _q_cohort_retention,
        "vocab_top100": _q_vocab_top100,
        "dup_span_clean": _q_dup_span_clean,
        "ngram_decontaminate": _q_ngram_decontaminate,
        "boilerplate_stats": _q_boilerplate_stats,
        "nfc_normalize": _q_nfc_normalize,
        "gopher_repetition": _q_gopher_repetition,
        "pretrain_prep": _q_pretrain_prep,
        "unigram_logprob": _q_unigram_logprob,
        "semantic_dedup": _q_semantic_dedup,
        "dsir_weights": _q_dsir_weights,
        "overlap_sessions_outages": _q_overlap_sessions_outages,
        "minhash_cross_join": _q_minhash_cross_join,
        "mad_by_type": _q_mad_by_type,
        "robust_outliers": _q_robust_outliers,
        "skew_kurt_by_type": _q_skew_kurt_by_type,
        "dow_hour_heatmap": _q_dow_hour_heatmap,
        "materialize_sequences": _q_materialize_sequences,
        "asof_nearest_error": _q_asof_nearest_error,
        "unimax_plan": _q_unimax_plan,
        "quantiles_refine": _q_quantiles_refine,
        "pii_redact": _q_pii_redact,
        "mixture_interleave": _q_mixture,
        "bm25_search": _q_bm25,
        "bm25_search_indexed": _q_bm25_indexed,
        "ntile_by_value": _q_ntile,
        "rolling_avg_user": _q_rolling_avg,
        "heavy_hitters_users": _q_heavy_hitters,
        "rollup_source_lang": _q_rollup,
        "hll_distinct_users": _q_hll_distinct,
        "lag_prev_value": _q_lag,
        "zscore_by_type": _q_zscore,
        "value_histogram": _q_histogram,
        "customer_order_counts": _q_outer_join,
        "union_distinct_users": _q_union_distinct,
        "mode_lang_per_source": _q_mode_lang,
        "unpivot_daily_counts": _q_unpivot,
        "media_decode_check": _q_media_decode_check,
        "frame_sample_check": _q_frame_sample_check,
        "corr_by_flag": _q_corr_by_flag,
        "median_by_type": _q_median_by_type,
        "string_agg_purchases": _q_string_agg_purchases,
        "fuzzy_name_pairs": _q_fuzzy_name_pairs,
        "except_all_viewers": _q_except_all_viewers,
        "intersect_all_engaged": _q_intersect_all_engaged,
        "dense_rank_values": _q_dense_rank_values,
        "weighted_sample": _q_weighted_sample,
        "star_revenue": _q_star_revenue,
        "name_pagerank": _q_name_pagerank,
        "decayed_user_value": _q_decayed_user_value,
        "vector_centroids": _q_vector_centroids,
        "quality_audit": _q_quality_audit,
        "events_in_outages": _q_events_in_outages,
        "apply_changes_balances": _q_apply_changes_balances,
        "event_transitions": _q_event_transitions,
        "debounce_events": _q_debounce_events,
        "entity_components": _q_entity_components,
        "bigram_top100": _q_bigram_top100,
        "cooccur_event_types": _q_cooccur_event_types,
        "lang_entropy_by_source": _q_lang_entropy_by_source,
        "cumulative_daily_value": _q_cumulative_daily_value,
        "chunk_documents": _q_chunk_documents,
        "latest_event_per_user": _q_latest_event_per_user,
        "regr_by_flag": _q_regr_by_flag,
        "q1_pricing_summary": _q_q1_pricing_summary,
        "promo_nation_profit": _q_promo_nation_profit,
        "snapshot_diff_users": _q_snapshot_diff_users,
        "cube_source_lang": _q_cube_source_lang,
        "salted_value_sum": _q_salted_sum,
        "fixed_k_sample": _q_fixed_k_sample,
        "bucketed_join_orders": _q_bucketed_join,
        "quantiles_exact_by_type": _q_quantiles_exact,
        "skew_join_events": _q_skew_join,
        "percent_rank_values": _q_percent_rank,
        "scd2_user_states": _q_scd2_user_states,
        "events_with_state": _q_events_with_state,
        "rolling_dau": _q_rolling_dau,
        "range_layout_orders": _q_range_layout_orders,
        "quantize_embeddings": _q_quantize_embeddings,
        "weekly_top_event": _q_weekly_top_event,
        "pushdown_read_orders": _q_pushdown_read_orders,
        "cumsum_by_user": _q_cumsum_by_user,
        "bloom_semijoin_orders": _q_bloom_semijoin,
        "daily_gapfill": _q_daily_gapfill,
        "full_outer_balances": _q_full_outer_balances,
        "hash_split_stats": _q_hash_split_stats,
        "anti_join_shuffle": _q_anti_join_shuffle,
        "range_rolling_user": _q_range_rolling_user,
        "zorder_orders": _q_zorder_orders,
        "merged_user_sessions": _q_merged_user_sessions,
        "union_by_name_docs": _q_union_by_name,
        "lead_next_value": _q_lead_next_value,
        "gsets_source_lang": _q_gsets_source_lang,
        "shuffled_docs_head": _q_shuffled_docs_head,
        "kmeans_embeddings": _q_kmeans_embeddings,
        "cume_dist_values": _q_cume_dist,
        "q5_region_revenue": _q_q5_region_revenue,
        "q3_unshipped_topk": _q_q3_unshipped_topk,
        "count_min_users": _q_count_min_users,
        "bigram_logprob": _q_bigram_logprob,
        "readability_docs": _q_readability,
        "char_entropy_docs": _q_char_entropy,
        "user_event_entropy": _q_user_event_entropy,
        "interarrival_by_user": _q_interarrival,
        "embedding_covariance": _q_embedding_covariance,
        "lang_drift_by_source": _q_lang_drift,
        "similarity_triangles": _q_similarity_triangles,
        "bpe_merges": _q_bpe_merges,
        "bpe_segment_counts": _q_bpe_segment_counts,
        "event_paths_top20": _q_event_paths,
        "activity_gini": _q_activity_gini,
        "winsorized_value_by_type": _q_winsorized_value,
        "burstiness_by_user": _q_burstiness,
        "conversion_latency": _q_conversion_latency,
        "q13_custdist": _q_q13_custdist,
        "pretrain_prep_bpe": _q_pretrain_prep_bpe,
        "embedding_outliers": _q_embedding_outliers,
        "selfjoin_size_estimate": _q_selfjoin_size,
        "twap_by_user": _q_twap,
        "personalized_pagerank": _q_personalized_pagerank,
        "stopword_coverage": _q_stopword_coverage,
        "kcore_embeddings": _q_kcore,
        "weighted_median_price": _q_weighted_median,
        "time_in_state": _q_time_in_state,
        "ks_view_purchase": _q_ks_test,
        "roc_auc_purchase": _q_roc_auc,
        "calibration_purchase": _q_calibration,
        "mi_lang_source": _q_mi_lang_source,
        "benford_totalprice": _q_benford,
        "changepoint_daily": _q_changepoint,
        "csv_source_stats": _q_csv_source,
        "jsonl_source_stats": _q_jsonl_source,
        "hybrid_search_rrf": _q_hybrid_search,
        "priority_dedup": _q_priority_dedup,
        "longest_streak_by_user": _q_longest_streak,
        "hard_negative_mining": _q_hard_negatives,
        "nearest_centroid_eval": _q_nearest_centroid,
        "span_corruption_stats": _q_span_corruption,
        "source_overlap_matrix": _q_source_overlap,
        "rfm_user_segments": _q_rfm_segments,
        "k_anonymity_audit": _q_k_anonymity,
        "knn_ndcg_eval": _q_knn_ndcg,
        "padding_efficiency": _q_padding_efficiency,
        "stratified_split": _q_stratified_split,
        "top_quartile_by_lang": _q_top_quartile_by_lang,
        "value_band_pairs": _q_value_band_pairs,
        "percent_rank_by_type": _q_percent_rank_by_type,
        "q10_returned_revenue": _q_q10_returned_revenue,
        "q18_big_orders": _q_q18_big_orders,
        "daily_autocorr": _q_daily_autocorr,
        "first_touch_revenue": _q_first_touch_revenue,
        "pmi_bigrams": _q_pmi_bigrams,
        "welch_ttest_value": _q_welch_ttest_value,
        "dup_cluster_sizes": _q_dup_cluster_sizes,
        "logprob_deciles_by_source": _q_logprob_deciles_by_source,
        "containment_pairs": _q_containment_pairs,
        "revenue_share_rank": _q_revenue_share_rank,
        "set_jaccard_pairs": _q_set_jaccard_pairs,
        "bfs_hops_embeddings": _q_bfs_hops_embeddings,
        "pareto_front_orders": _q_pareto_front_orders,
        "daily_ohlc": _q_daily_ohlc,
        "events_fingerprint": _q_events_fingerprint,
        "user_churn_daily": _q_user_churn_daily,
        "pq_codes": _q_pq_codes,
        "weekday_residuals": _q_weekday_residuals,
        "proportional_budget_sample": _q_proportional_budget_sample,
        "mannwhitney_value": _q_mannwhitney_value,
        "third_purchase_ts": _q_third_purchase_ts,
        "interval_coverage": _q_interval_coverage,
        "top_dims_per_vector": _q_top_dims_per_vector,
        "reciprocal_topk_pairs": _q_reciprocal_topk_pairs,
        "lang_majority_mismatch": _q_lang_majority_mismatch,
        "dup_window_profile": _q_dup_window_profile,
        "bounce_rate_daily": _q_bounce_rate_daily,
        "acf_daily": _q_acf_daily,
        "lorenz_chars": _q_lorenz_chars,
        "markov_entropy_rate": _q_markov_entropy_rate,
        "q6_forecast_revenue": _q_q6_forecast_revenue,
        "q14_promo_share": _q_q14_promo_share,
        "heaps_growth": _q_heaps_growth,
        "q19_band_revenue": _q_q19_band_revenue,
        "order_concentration_gini": _q_order_concentration_gini,
    }


# HLL is approximate — no SQL-expressible semantics.  This pins the engine's
# deterministic output at the driver's correctness scale (sf0.01, seed-fixed
# hash; register max-merge is partition/retry-independent).  Cross-validated:
# exact COUNT(DISTINCT user_id) is 150 globally and per type — every pinned
# estimate (148) is within the ~1.6 % standard error of p=12.
_HLL_PINNED_SQL = """
    SELECT event_type, CAST(approx_distinct AS BIGINT) AS approx_distinct
    FROM (VALUES
      ('__all__', 148), ('click', 148), ('error', 148),
      ('purchase', 148), ('signup', 148), ('view', 148)
    ) AS t(event_type, approx_distinct)
"""


def _pii_redact_sql() -> str:
    """Nested regexp_replace + per-class counts mirroring _q_pii_redact's
    ordered classes (each count on that class's input text)."""
    from insurance_pdf_extractor_ray.functions.redact import (
        PII_PATTERNS,
        denylist_pattern,
        redact_sql_expr,
    )

    patterns = list(PII_PATTERNS) + [
        ("deny", denylist_pattern(["spark", "merge", "hash"]), "[TERM]")]
    counts = []
    for i, (name, pat, _repl) in enumerate(patterns):
        prior = redact_sql_expr("text", patterns[:i])
        p = pat.replace("'", "''")
        counts.append(
            f"CAST(len(regexp_extract_all({prior}, '{p}')) AS BIGINT)"
            f" AS n_{name}")
    full = redact_sql_expr("text", patterns)
    return (f"SELECT doc_id, {', '.join(counts)}, {full} AS text_redacted "
            f"FROM documents ORDER BY doc_id")


def _zorder_sql() -> str:
    """Bit-exact Morton key via shift/mask SQL; same curve + tiebreak order
    as _q_zorder_orders."""
    from insurance_pdf_extractor_ray.pipelines.zorder import zorder_sql_expr

    expr = zorder_sql_expr(["o_custkey", "o_orderkey"], 16)
    return (f"SELECT {expr} AS zkey, o_orderkey FROM orders "
            f"ORDER BY zkey, o_orderkey")


def _shuffled_head_sql() -> str:
    """HUGEINT replica of global_shuffle's seeded 64-bit mix order."""
    from insurance_pdf_extractor_ray.pipelines.sampling import (
        shuffle_sql_order,
    )

    order = shuffle_sql_order("doc_id", seed=13)
    return (f"SELECT ROW_NUMBER() OVER (ORDER BY {order}) AS pos, "
            f"doc_id, source FROM documents ORDER BY {order} LIMIT 300")


def _mixture_sql() -> str:
    from insurance_pdf_extractor_ray.pipelines.mixing import mixture_sql

    return mixture_sql("documents", "source", "doc_id", _MIX_WEIGHTS,
                       seed=101, n_shards=64, columns="doc_id, source")


_EMPTY_DIFF_SQL = """
    SELECT CAST(NULL AS VARCHAR) AS doc_id, CAST(NULL AS VARCHAR) AS column,
           CAST(NULL AS VARCHAR) AS got, CAST(NULL AS VARCHAR) AS want
    WHERE 1=0
"""


def oracle_sql() -> dict[str, str]:
    # NOTE on pinned oracles: minhash_dedup / simhash_dedup /
    # field_success_rates / knn_ivf / text_analysis have no SQL-expressible
    # semantics (LSH estimates, engine-defined heuristics, approximate ANN).
    # Their oracles pin the independently-cross-validated expected output at
    # the driver's correctness scale (sf0.01, seed-fixed inputs): every
    # flagged minhash id was verified to have an exact n-gram-Jaccard >= 0.7
    # smaller-id partner and no doc with a >= 0.85 partner is missed;
    # text_analysis token counts re-derived in DuckDB regexp; results proven
    # bit-identical across 4/8-CPU runs.  They are determinism+regression
    # gates, valid at sf0.01 only.
    return {
        # golden-diff gates return ONLY mismatching cells; correctness = empty
        "extract_fields_check": _EMPTY_DIFF_SQL,
        "extract_spans_check": _EMPTY_DIFF_SQL,
        "layout_extract_check": _EMPTY_DIFF_SQL,
        "minhash_dedup": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id FROM (VALUES
              (134),(178),(185),(245),(267),(290),(293),(301),(323),(332),
              (374),(377),(383),(387),(389),(413),(420),(446),(447),(450),
              (455),(457),(462),(486)) AS t(doc_id)
        """,
        "simhash_dedup": """
            SELECT CAST(doc_id AS BIGINT) AS doc_id FROM (VALUES
              (178),(185),(245),(290),(301),(323),(332),(389),(403),(413),
              (420),(446),(447)) AS t(doc_id)
        """,
        "field_success_rates": """
            SELECT field_name,
                   CAST(n AS BIGINT) AS n,
                   CAST(n_success AS BIGINT) AS n_success,
                   CAST(success_rate AS DOUBLE) AS success_rate
            FROM (VALUES
              ('additional_named_insured_address', 500, 21, 4.2),
              ('additional_named_insured_name', 500, 21, 4.2),
              ('commission', 500, 42, 8.4),
              ('estimated_premium_amount', 500, 416, 83.2),
              ('issuing_carrier', 500, 416, 83.2),
              ('minimum_earned_premium', 500, 42, 8.4),
              ('named_insured_address', 500, 500, 100.0),
              ('named_insured_name', 500, 500, 100.0),
              ('policy_effective_date', 500, 416, 83.2),
              ('policy_expiration_date', 500, 416, 83.2),
              ('quote_number', 500, 458, 91.6),
              ('taxes', 500, 416, 83.2),
              ('tria', 500, 416, 83.2),
              ('waiver_of_subrogation_type', 500, 416, 83.2),
              ('workers_comp_disease_each_employee', 500, 416, 83.2),
              ('workers_comp_disease_policy_limit', 500, 416, 83.2),
              ('workers_comp_each_accident_limit', 500, 416, 83.2),
              ('workers_comp_exclusion_description', 500, 42, 8.4)
            ) AS t(field_name, n, n_success, success_rate)
        """,
        "text_analysis": """
            SELECT * FROM read_parquet('/root/repo/goldens/text_analysis_sf0_01.parquet')
        """,
        "quality_filter": """
            WITH unioned AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id,
                     translate(text, 'aeiouAEIOU ', '') AS text
              FROM documents
            ),
            m AS (
              SELECT doc_id,
                     length(text) AS n_chars,
                     regexp_extract_all(text, '\\S+') AS words,
                     len(regexp_extract_all(text, '[A-Za-z0-9]')) AS n_alnum,
                     len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct
              FROM unioned
            ),
            r AS (
              SELECT doc_id, n_chars, len(words) AS n_words,
                     CASE WHEN len(words) = 0 THEN 0.0
                          ELSE list_sum(list_transform(words, w -> length(w))) * 1.0
                               / len(words) END AS mean_wl,
                     n_alnum * 1.0 / greatest(1, n_chars) AS alnum_ratio,
                     n_punct * 1.0 / greatest(1, n_chars) AS punct_ratio,
                     CASE WHEN len(words) = 0 THEN 0.0
                          ELSE len(list_filter(words, w -> lower(w) IN
                               ('the','and','of','to','a','in','is','that','it',
                                'for','was','with','on','as','this'))) * 1.0
                               / len(words) END AS stop_ratio
              FROM m
            ),
            q AS (
              SELECT doc_id,
                     greatest(0.0,
                       1.0
                       - CASE WHEN mean_wl >= 3 AND mean_wl <= 10 THEN 0.0 ELSE 0.3 END
                       - CASE WHEN alnum_ratio < 0.6 THEN 0.3 ELSE 0.0 END
                       - CASE WHEN punct_ratio > 0.2 THEN 0.2 ELSE 0.0 END
                       - CASE WHEN stop_ratio < 0.01 THEN 0.2 ELSE 0.0 END
                     ) AS quality
              FROM r
            )
            SELECT doc_id FROM q WHERE quality >= 0.6
        """,
        "repetition_stats": """
            SELECT doc_id,
                   len(string_split(text, chr(10))) AS n_lines,
                   len(list_distinct(string_split(text, chr(10)))) AS n_distinct_lines,
                   round(1.0 - len(list_distinct(string_split(text, chr(10)))) * 1.0
                             / greatest(1, len(string_split(text, chr(10)))), 4)
                     AS dup_line_ratio
            FROM documents
        """,
        "knn_ivf": """
            SELECT CAST(query_id AS BIGINT) AS query_id,
                   CAST(vec_id AS BIGINT) AS vec_id,
                   CAST(score AS DOUBLE) AS score
            FROM (VALUES
              (0, 0, 1.0), (0, 365, 0.369994), (0, 334, 0.362722),
              (0, 387, 0.331139), (0, 423, 0.296934),
              (1, 1, 1.0), (1, 386, 0.371485), (1, 27, 0.348208),
              (1, 407, 0.32701), (1, 195, 0.322744),
              (2, 2, 1.0), (2, 117, 0.318143), (2, 450, 0.266344),
              (2, 145, 0.263494), (2, 320, 0.255043)
            ) AS t(query_id, vec_id, score)
        """,
        "exact_dedup": """
            WITH unioned AS (
              SELECT doc_id, text FROM documents
              UNION ALL
              SELECT doc_id + 1000000 AS doc_id, text FROM documents
            )
            SELECT min(doc_id) AS doc_id FROM unioned GROUP BY text
        """,
        "global_stats": """
            SELECT count(value) AS n,
                   round(sum(value), 2) AS total,
                   round(avg(value), 4) AS avg,
                   min(value) AS min,
                   max(value) AS max
            FROM events
        """,
        "stats_by_type": """
            SELECT event_type,
                   count(*) AS n,
                   round(sum(value), 2) AS total
            FROM events GROUP BY event_type
        """,
        "daily_trends": """
            SELECT strftime(ts, '%Y-%m-%d') AS date,
                   count(*) AS n,
                   round(sum(value), 2) AS total
            FROM events GROUP BY 1
        """,
        "top10_by_value": """
            SELECT event_id, event_type, value
            FROM events ORDER BY value DESC, event_id LIMIT 10
        """,
        "event_breakdown": """
            SELECT event_type, count(*) AS n,
                   round(100.0 * count(*) / (SELECT count(*) FROM events), 2) AS pct
            FROM events GROUP BY event_type
        """,
        "recent_n": """
            SELECT event_id, event_type, value
            FROM events ORDER BY ts DESC, event_id LIMIT 100
        """,
        "search_filter": """
            SELECT * FROM documents
            WHERE source = 'src3' AND n_chars >= 200 AND text LIKE '%data%'
        """,
        "orders_customer_join": """
            SELECT o.o_orderkey, o.o_custkey, c.c_name, c.c_mktsegment, o.o_totalprice
            FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
        """,
        "anti_join_docs": """
            SELECT doc_id, source, n_chars FROM documents
            WHERE source NOT IN ('src0', 'src1', 'src2')
        """,
        "token_explode": """
            SELECT doc_id, unnest(regexp_extract_all(text, '\\S+')) AS token
            FROM documents
        """,
        "doc_token_stats": """
            SELECT doc_id,
                   len(regexp_extract_all(text, '\\S+')) AS n_tokens_ws,
                   length(text) AS n_chars_calc
            FROM documents
        """,
        "retention_filter": """
            SELECT event_id, event_type FROM events
            WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
        """,
        "html_main_content": """
            SELECT doc_id, text FROM documents
        """,
        "json_props_stats": """
            WITH parsed AS (
              SELECT event_type, value,
                     CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
              FROM events
            )
            SELECT event_type,
                   count(*) AS n,
                   round(sum(value), 2) AS total_value,
                   CAST(sum(k) AS BIGINT) AS total_k,
                   CASE WHEN sum(k) > 0
                        THEN round(round(sum(value), 2) / sum(k) * 1000, 4)
                        ELSE 0.0 END AS value_per_1k
            FROM parsed GROUP BY event_type
        """,
        "tumbling_window": """
            SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start,
                   count(*) AS n, round(sum(value), 2) AS total
            FROM events GROUP BY 1
        """,
        "sliding_window": """
            SELECT (epoch_us(ts) // 3600000000) * 3600000000
                     - i * 3600000000 AS window_start,
                   count(*) AS n, round(sum(value), 2) AS total
            FROM events, range(2) AS t(i)
            GROUP BY 1
        """,
        "session_windows": """
            WITH d AS (SELECT user_id, event_id, epoch_us(ts) AS e FROM events),
            m AS (SELECT user_id, event_id, e,
                         CASE WHEN e - lag(e) OVER (PARTITION BY user_id
                                                    ORDER BY e, event_id)
                                  > 600000000 THEN 1 ELSE 0 END AS brk
                  FROM d),
            s AS (SELECT user_id, e,
                         CAST(sum(brk) OVER (PARTITION BY user_id
                                             ORDER BY e, event_id
                                             ROWS UNBOUNDED PRECEDING)
                              AS BIGINT) AS session_id
                  FROM m)
            SELECT user_id, session_id, count(*) AS n,
                   min(e) AS start_us, max(e) AS end_us
            FROM s GROUP BY user_id, session_id
        """,
        "knn_embeddings": """
            WITH q AS (
              SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS emb
              FROM embeddings ORDER BY vec_id LIMIT 3
            ),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.emb, CAST(e.embedding AS DOUBLE[])) AS sim
              FROM q CROSS JOIN embeddings e
            ),
            ranked AS (
              SELECT query_id, vec_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, vec_id) AS rk
              FROM scored
            )
            SELECT query_id, vec_id, round(sim, 6) AS score
            FROM ranked WHERE rk <= 5
        """,
        "grouped_topk": """
            SELECT event_type, event_id, value FROM (
              SELECT event_type, event_id, value,
                     row_number() OVER (PARTITION BY event_type
                                        ORDER BY value DESC, event_id ASC) AS rn
              FROM events) WHERE rn <= 3
            ORDER BY event_type, value DESC, event_id
        """,
        "distinct_users_by_type": """
            SELECT event_type, COUNT(DISTINCT user_id) AS n_distinct
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "value_quantiles_by_type": """
            SELECT event_type, COUNT(value) AS n,
                   round(percentile_cont(0.5) WITHIN GROUP (ORDER BY value), 6) AS p50,
                   round(percentile_cont(0.9) WITHIN GROUP (ORDER BY value), 6) AS p90
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        "asof_last_click": """
            SELECT l.event_id, r.ts_us AS last_click_ts
            FROM (SELECT event_id, user_id, epoch_us(ts) AS ts_us FROM events
                  WHERE event_type <> 'click') l
            ASOF LEFT JOIN
                 (SELECT user_id, epoch_us(ts) AS ts_us FROM events
                  WHERE event_type = 'click') r
              ON l.user_id = r.user_id AND l.ts_us >= r.ts_us
            ORDER BY l.event_id
        """,
        "embedding_dedup": """
            SELECT a.vec_id FROM embeddings a
            WHERE EXISTS (
              SELECT 1 FROM embeddings b
              WHERE b.vec_id < a.vec_id
                AND list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                           CAST(b.embedding AS DOUBLE[])) >= 0.45)
            ORDER BY a.vec_id
        """,
        "top_term_per_doc": """
            WITH toks AS (
              SELECT doc_id,
                     unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS token
              FROM documents
            ),
            tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM toks
                   GROUP BY doc_id, token),
            df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM toks
                   GROUP BY token)
            SELECT doc_id, token, tf, df FROM (
              SELECT tf.doc_id, tf.token, tf.tf, df.df,
                     row_number() OVER (PARTITION BY tf.doc_id
                                        ORDER BY tf.tf DESC, df.df ASC,
                                                 tf.token ASC) AS rn
              FROM tf JOIN df USING (token))
            WHERE rn = 1 ORDER BY doc_id
        """,
        "orders_lineitem_join": """
            SELECT l.l_orderkey, CAST(l.l_linenumber AS BIGINT) AS l_linenumber,
                   o.o_totalprice,
                   round(l.l_extendedprice * (1.0 - l.l_discount), 4) AS revenue
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderpriority = '1-URGENT'
            ORDER BY l.l_orderkey, l.l_linenumber
        """,
        "hourly_distinct_users": """
            SELECT (epoch_us(ts) // 3600000000) * 3600000000 AS window_start,
                   COUNT(DISTINCT user_id) AS n_distinct
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "events_in_sessions": """
            WITH d AS (SELECT user_id, event_id, epoch_us(ts) AS e FROM events),
            m AS (SELECT user_id, event_id, e,
                         CASE WHEN e - lag(e) OVER (PARTITION BY user_id
                                                    ORDER BY e, event_id)
                                  > 600000000 THEN 1 ELSE 0 END AS brk
                  FROM d),
            s AS (SELECT user_id, event_id, e,
                         CAST(sum(brk) OVER (PARTITION BY user_id
                                             ORDER BY e, event_id
                                             ROWS UNBOUNDED PRECEDING)
                              AS BIGINT) AS session_id
                  FROM m),
            iv AS (SELECT user_id, session_id,
                          min(e) AS start_us, max(e) AS end_us
                   FROM s GROUP BY user_id, session_id)
            SELECT d.event_id, iv.session_id
            FROM d JOIN iv ON d.user_id = iv.user_id
                          AND d.e BETWEEN iv.start_us AND iv.end_us
            ORDER BY d.event_id
        """,
        "stratified_sample": """
            SELECT doc_id, source FROM documents
            WHERE ((CAST(doc_id AS HUGEINT) * 2654435761 + 13) % 4294967296)
                  < CASE source WHEN 'src0' THEN 2147483648
                                WHEN 'src1' THEN 4294967296
                                WHEN 'src2' THEN 0
                                ELSE 1073741824 END
            ORDER BY doc_id
        """,
        "profile_documents": """
            SELECT 'doc_id' AS col_name, COUNT(*) AS n,
                   COUNT(*) - COUNT(doc_id) AS n_null,
                   COUNT(DISTINCT doc_id) AS n_distinct FROM documents
            UNION ALL
            SELECT 'lang', COUNT(*), COUNT(*) - COUNT(lang),
                   COUNT(DISTINCT lang) FROM documents
            UNION ALL
            SELECT 'n_chars', COUNT(*), COUNT(*) - COUNT(n_chars),
                   COUNT(DISTINCT n_chars) FROM documents
            UNION ALL
            SELECT 'source', COUNT(*), COUNT(*) - COUNT(source),
                   COUNT(DISTINCT source) FROM documents
            ORDER BY col_name
        """,
        "pack_sequences": """
            WITH d AS (
              SELECT doc_id,
                     len(regexp_extract_all(text, '\\S+')) AS n_tokens
              FROM documents
            ),
            c AS (
              SELECT doc_id, n_tokens,
                     CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                          0) AS BIGINT) AS start_tok
              FROM d
            )
            SELECT doc_id,
                   unnest(generate_series(start_tok // 2048,
                                          (start_tok + n_tokens - 1) // 2048))
                       AS seq_id,
                   start_tok,
                   start_tok + n_tokens AS end_tok
            FROM c WHERE n_tokens > 0
            ORDER BY doc_id, seq_id
        """,
        "decontaminate": """
            WITH tok AS (
              SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS ts
              FROM documents
            ),
            g AS (
              SELECT doc_id, array_to_string(ts[i:i+5], ' ') AS gram
              FROM tok, unnest(generate_series(1, len(ts) - 5)) AS t(i)
            ),
            eg AS (
              SELECT DISTINCT gram FROM g WHERE doc_id < 5
            )
            SELECT tok.doc_id,
                   COALESCE((SELECT COUNT(*) FROM g
                             WHERE g.doc_id = tok.doc_id
                               AND g.gram IN (SELECT gram FROM eg)),
                            0) AS n_overlap
            FROM tok ORDER BY tok.doc_id
        """,
        "pivot_event_daily": """
            SELECT strftime(ts, '%Y-%m-%d') AS date,
                   count(*) FILTER (event_type = 'click') AS n_click,
                   count(*) FILTER (event_type = 'error') AS n_error,
                   count(*) FILTER (event_type = 'purchase') AS n_purchase,
                   count(*) FILTER (event_type = 'signup') AS n_signup,
                   count(*) FILTER (event_type = 'view') AS n_view
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "funnel_view_click_purchase": """
            WITH s1 AS (SELECT user_id, min(ts) AS t1 FROM events
                        WHERE event_type = 'view' GROUP BY 1),
            s2 AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
                   JOIN s1 ON e.user_id = s1.user_id AND e.ts > s1.t1
                   WHERE e.event_type = 'click' GROUP BY 1),
            s3 AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
                   JOIN s2 ON e.user_id = s2.user_id AND e.ts > s2.t2
                   WHERE e.event_type = 'purchase' GROUP BY 1)
            SELECT CAST(step_idx AS BIGINT) AS step_idx, step,
                   CAST(n_users AS BIGINT) AS n_users
            FROM (VALUES
              (1, 'view', (SELECT count(*) FROM s1)),
              (2, 'click', (SELECT count(*) FROM s2)),
              (3, 'purchase', (SELECT count(*) FROM s3))
            ) AS t(step_idx, step, n_users)
        """,
        "cohort_retention": """
            WITH f AS (SELECT user_id, min(date_trunc('day', ts)) AS cohort
                       FROM events GROUP BY 1),
            a AS (SELECT DISTINCT e.user_id, f.cohort,
                         datediff('day', f.cohort,
                                  date_trunc('day', e.ts)) AS day_offset
                  FROM events e JOIN f ON e.user_id = f.user_id)
            SELECT strftime(cohort, '%Y-%m-%d') AS cohort_day, day_offset,
                   count(*) AS n_users
            FROM a WHERE day_offset BETWEEN 0 AND 7
            GROUP BY cohort, day_offset ORDER BY 1, 2
        """,
        "vocab_top100": """
            SELECT token, count(*) AS n
            FROM (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                  AS token FROM documents)
            GROUP BY 1 ORDER BY n DESC, token LIMIT 100
        """,
        # semantic_dedup's pinned set at sf0.01 (tau=0.30, k=8, 3 Lloyd
        # iters): each id verified in DuckDB to have a smaller-id partner at
        # list_cosine_similarity >= 0.30; set layout/CPU-count-stable
        "semantic_dedup": """
            SELECT CAST(vec_id AS BIGINT) AS vec_id FROM (VALUES
              (27),(30),(33),(35),(58),(60),(77),(88),(91),(95),
              (108),(110),(111),(112),(114),(115),(116),(117),(120),(123),
              (124),(138),(139),(143),(145),(149),(150),(162),(169),(175),
              (181),(187),(190),(196),(197),(202),(204),(205),(209),(214),
              (218),(220),(224),(225),(227),(228),(233),(234),(235),(238),
              (240),(256),(260),(261),(262),(264),(270),(271),(274),(277),
              (278),(280),(281),(282),(289),(291),(292),(295),(296),(298),
              (299),(300),(301),(302),(305),(306),(308),(309),(313),(314),
              (317),(320),(322),(324),(325),(326),(334),(339),(340),(343),
              (344),(347),(349),(350),(354),(355),(357),(359),(360),(361),
              (363),(365),(366),(369),(370),(371),(372),(375),(380),(382),
              (384),(385),(386),(387),(397),(398),(399),(401),(402),(403),
              (404),(406),(407),(410),(411),(412),(413),(414),(415),(416),
              (417),(419),(421),(427),(428),(430),(431),(432),(434),(436),
              (437),(438),(442),(444),(445),(447),(449),(452),(456),(457),
              (458),(460),(461),(462),(463),(466),(468),(470),(471),(472),
              (473),(474),(475),(476),(477),(478),(479),(481),(483),(484),
              (486),(488),(489),(491),(495),(496),(498),(499)) AS t(vec_id)
        """,
        "quantiles_refine": """
            WITH a AS (
              SELECT quantile_cont(value, [0.01,0.1,0.25,0.5,0.75,0.9,0.99]) AS c,
                     quantile_disc(value, [0.01,0.1,0.25,0.5,0.75,0.9,0.99]) AS d
              FROM events)
            SELECT t.q, round(a.c[t.i], 6) AS cont, round(a.d[t.i], 6) AS disc
            FROM a, (VALUES (1,0.01),(2,0.1),(3,0.25),(4,0.5),
                            (5,0.75),(6,0.9),(7,0.99)) AS t(i, q)
            ORDER BY t.q
        """,
        "unimax_plan": """
            WITH c AS (SELECT event_type AS source, count(*) AS n
                       FROM events GROUP BY 1),
            s AS (SELECT sum(pow(n, 0.5)) AS z, sum(n) AS total FROM c)
            SELECT source, n,
                   round(least(total * pow(n, 0.5) / z / n, 4.0), 6)
                     AS weight,
                   CAST(floor(round(least(total * pow(n, 0.5) / z / n,
                                          4.0), 6)) AS BIGINT)
                     AS full_epochs
            FROM c, s ORDER BY source
        """,
        "asof_nearest_error": """
            SELECT p.event_id, p.user_id,
                   (SELECT epoch_us(e.ts) FROM events e
                    WHERE e.user_id = p.user_id AND e.event_type = 'error'
                    ORDER BY abs(epoch_us(e.ts) - epoch_us(p.ts)),
                             (epoch_us(e.ts) > epoch_us(p.ts)), e.ts
                    LIMIT 1) AS nearest_error_ts
            FROM events p WHERE p.event_type = 'purchase'
            ORDER BY p.event_id
        """,
        "materialize_sequences": """
            WITH d AS (
              SELECT doc_id, regexp_extract_all(text, '\\S+') AS w,
                     len(regexp_extract_all(text, '\\S+')) AS n
              FROM documents
            ), cum AS (
              SELECT doc_id, w, n,
                     CAST(COALESCE(sum(n) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                       AS BIGINT) AS start_tok
              FROM d
            ), pairs AS (
              SELECT doc_id, w, n, start_tok,
                     unnest(generate_series(start_tok // 512,
                              (start_tok + n - 1) // 512)) AS seq_id
              FROM cum WHERE n > 0
            ), slices AS (
              SELECT seq_id, doc_id,
                     array_to_string(
                       w[greatest(seq_id * 512 - start_tok, 0) + 1 :
                         least((seq_id + 1) * 512 - start_tok, n)],
                       ' ') AS piece,
                     least((seq_id + 1) * 512 - start_tok, n)
                       - greatest(seq_id * 512 - start_tok, 0) AS ntok
              FROM pairs)
            SELECT seq_id, string_agg(piece, ' ' ORDER BY doc_id)
                     AS seq_text,
                   CAST(sum(ntok) AS BIGINT) AS n_tokens, count(*) AS n_docs
            FROM slices GROUP BY seq_id ORDER BY seq_id
        """,
        "dow_hour_heatmap": """
            SELECT dayofweek(ts) AS dow, hour(ts) AS hour, count(*) AS n
            FROM events GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "skew_kurt_by_type": """
            SELECT event_type, ROUND(skewness(value), 9) AS skewness,
                   ROUND(kurtosis(value), 9) AS kurtosis, count(*) AS n
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "robust_outliers": """
            WITH s AS (SELECT event_type, median(value) AS med,
                              mad(value) AS md
                       FROM events GROUP BY event_type)
            SELECT e.event_type,
                   CAST(sum(CASE WHEN abs(e.value - s.med) > 3 * s.md
                       THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
                   count(*) AS n
            FROM events e JOIN s USING (event_type)
            GROUP BY e.event_type ORDER BY e.event_type
        """,
        "mad_by_type": """
            SELECT event_type, round(mad(value), 6) AS mad
            FROM events GROUP BY event_type ORDER BY event_type
        """,
        # minhash_cross_join pinned at sf0.01: 10 identity pairs (the eval
        # slice rejoins itself at est=1.0) + pair (92,450) — exact 3-gram
        # Jaccard 0.958 in DuckDB; est = 118/128 is a dyadic rational, so
        # the float pins exactly
        "minhash_cross_join": """
            SELECT CAST(l AS BIGINT) AS l_id, CAST(r AS BIGINT) AS r_id,
                   CAST(e AS DOUBLE) AS est
            FROM (VALUES
              (0,0,1.0),(50,50,1.0),(92,450,0.921875),(100,100,1.0),
              (150,150,1.0),(200,200,1.0),(250,250,1.0),(300,300,1.0),
              (350,350,1.0),(400,400,1.0),(450,450,1.0)) AS t(l, r, e)
            ORDER BY l_id, r_id
        """,
        "overlap_sessions_outages": """
            WITH l AS (SELECT event_id AS l_id,
                              epoch_us(ts) AS ls,
                              epoch_us(ts) + 5*60*1000000 AS le
                       FROM events WHERE event_type = 'purchase'),
            r AS (SELECT event_id AS r_id,
                         epoch_us(ts) AS rs,
                         epoch_us(ts) + 10*60*1000000 AS re
                  FROM events WHERE event_type = 'error')
            SELECT l_id, r_id FROM l JOIN r
            ON ls <= re AND rs <= le
            ORDER BY l_id, r_id
        """,
        "dsir_weights": """
            WITH toks AS (SELECT doc_id,
                            unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                            AS token FROM documents),
            ttoks AS (SELECT t.token FROM toks t JOIN documents d
                      USING (doc_id) WHERE d.source = 'src0'),
            src AS (SELECT token, count(*) c FROM toks GROUP BY token),
            tgt AS (SELECT token, count(*) c FROM ttoks GROUP BY token),
            vocab AS (SELECT token, coalesce(s.c, 0) cs, coalesce(t.c, 0) ct
                      FROM (SELECT token FROM src UNION SELECT token FROM tgt)
                      LEFT JOIN src s USING (token)
                      LEFT JOIN tgt t USING (token)),
            stats AS (SELECT sum(cs) + count(*) AS stot,
                             sum(ct) + count(*) AS ttot FROM vocab),
            ratio AS (SELECT token,
                        ln((ct+1)*1.0 / (SELECT ttot FROM stats))
                        - ln((cs+1)*1.0 / (SELECT stot FROM stats)) AS x
                      FROM vocab),
            micro AS (SELECT token,
                        CAST(CASE WHEN x >= 0 THEN floor(x*1000000 + 0.5)
                             ELSE -floor(-x*1000000 + 0.5) END AS BIGINT) AS m
                      FROM ratio)
            SELECT t.doc_id, count(*) AS n_tokens, CAST(sum(m.m) AS BIGINT) AS dsir_micro
            FROM toks t JOIN micro m USING (token)
            GROUP BY t.doc_id ORDER BY doc_id
        """,
        "unigram_logprob": """
            WITH toks AS (SELECT doc_id,
                            unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                            AS token FROM documents),
            cnt AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
            tot AS (SELECT count(*) AS n FROM toks),
            lp AS (SELECT token,
                          CAST(-floor(-ln(c * 1.0 / (SELECT n FROM tot))
                                       * 1000000 + 0.5) AS BIGINT) AS micro
                   FROM cnt)
            SELECT t.doc_id, count(*) AS n_tokens,
                   CAST(sum(lp.micro) AS BIGINT) AS logprob_micro
            FROM toks t JOIN lp USING (token)
            GROUP BY t.doc_id ORDER BY doc_id
        """,
        "pretrain_prep": """
            WITH wn AS (
              SELECT doc_id, text,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw
              FROM documents
            ), corp AS (SELECT * FROM wn WHERE doc_id % 50 <> 0
            ), uni AS (
              SELECT doc_id, count(DISTINCT x) AS nd
              FROM corp, unnest(w) AS u(x) GROUP BY doc_id
            ), bi AS (
              SELECT doc_id, max(CASE WHEN c >= 2 THEN c ELSE 0 END) AS m
              FROM (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g,
                           count(*) AS c
                    FROM corp, unnest(generate_series(1, nw - 1)) AS s(i)
                    WHERE nw >= 2 GROUP BY doc_id, g) GROUP BY doc_id
            ), tri AS (
              SELECT doc_id, max(CASE WHEN c >= 2 THEN c ELSE 0 END) AS m
              FROM (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g,
                           count(*) AS c
                    FROM corp, unnest(generate_series(1, nw - 2)) AS s(i)
                    WHERE nw >= 3 GROUP BY doc_id, g) GROUP BY doc_id
            ), gated AS (
              SELECT corp.doc_id FROM corp
              LEFT JOIN uni USING (doc_id) LEFT JOIN bi USING (doc_id)
              LEFT JOIN tri USING (doc_id)
              WHERE (CASE WHEN corp.nw > 0
                     THEN round(1 - uni.nd * 1.0 / corp.nw, 6) ELSE 0 END)
                    <= 0.80
                AND round(coalesce(bi.m * 2.0 / corp.nw, 0), 6) <= 0.20
                AND round(coalesce(tri.m * 3.0 / corp.nw, 0), 6) <= 0.18
            ), evg AS (
              SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS gram
              FROM wn, unnest(generate_series(1, nw - 8 + 1)) AS t(i)
              WHERE nw >= 8 AND doc_id % 50 = 0
            ), contam AS (
              SELECT DISTINCT doc_id FROM (
                SELECT c.doc_id, array_to_string(c.w[i:i+7], ' ') AS gram
                FROM corp c JOIN gated USING (doc_id),
                     unnest(generate_series(1, c.nw - 8 + 1)) AS t(i)
                WHERE c.nw >= 8)
              WHERE gram IN (SELECT gram FROM evg)
            ), clean AS (
              SELECT c.doc_id, c.text FROM corp c JOIN gated USING (doc_id)
              WHERE c.doc_id NOT IN (SELECT doc_id FROM contam)
            ), winners AS (
              SELECT doc_id FROM (
                SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS m
                FROM clean) WHERE doc_id = m
            ), d AS (
              SELECT c.doc_id,
                     len(regexp_extract_all(c.text, '\\S+')) AS n_tokens
              FROM clean c JOIN winners USING (doc_id)
            ), cum AS (
              SELECT doc_id, n_tokens,
                     CAST(COALESCE(sum(n_tokens) OVER (ORDER BY doc_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                       0) AS BIGINT) AS start_tok
              FROM d)
            SELECT doc_id,
                   unnest(generate_series(start_tok // 1024,
                            (start_tok + n_tokens - 1) // 1024)) AS seq_id,
                   start_tok, start_tok + n_tokens AS end_tok
            FROM cum WHERE n_tokens > 0
            ORDER BY doc_id, seq_id
        """,
        "gopher_repetition": """
            WITH wn AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw
              FROM documents
            ), uni AS (
              SELECT doc_id, count(DISTINCT x) AS nd
              FROM wn, unnest(w) AS u(x) GROUP BY doc_id
            ), bi AS (
              SELECT doc_id, max(CASE WHEN c >= 2 THEN c ELSE 0 END) AS m
              FROM (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g,
                           count(*) AS c
                    FROM wn, unnest(generate_series(1, nw - 1)) AS s(i)
                    WHERE nw >= 2 GROUP BY doc_id, g) GROUP BY doc_id
            ), tri AS (
              SELECT doc_id, max(CASE WHEN c >= 2 THEN c ELSE 0 END) AS m
              FROM (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g,
                           count(*) AS c
                    FROM wn, unnest(generate_series(1, nw - 2)) AS s(i)
                    WHERE nw >= 3 GROUP BY doc_id, g) GROUP BY doc_id
            )
            SELECT wn.doc_id, wn.nw AS n_words,
              CASE WHEN wn.nw > 0
                   THEN round(1 - uni.nd * 1.0 / wn.nw, 6) ELSE 0
              END AS frac_dup_unigrams,
              round(coalesce(bi.m * 2.0 / wn.nw, 0), 6) AS frac_top_bigram,
              round(coalesce(tri.m * 3.0 / wn.nw, 0), 6) AS frac_top_trigram,
              (CASE WHEN wn.nw > 0
                    THEN round(1 - uni.nd * 1.0 / wn.nw, 6) ELSE 0 END) <= 0.80
              AND round(coalesce(bi.m * 2.0 / wn.nw, 0), 6) <= 0.20
              AND round(coalesce(tri.m * 3.0 / wn.nw, 0), 6) <= 0.18 AS keep
            FROM wn LEFT JOIN uni USING (doc_id) LEFT JOIN bi USING (doc_id)
            LEFT JOIN tri USING (doc_id) ORDER BY wn.doc_id
        """,
        "nfc_normalize": """
            SELECT doc_id, nfc_normalize(text) AS text_nfc,
                   nfc_normalize(text) <> text AS changed
            FROM documents ORDER BY doc_id
        """,
        "boilerplate_stats": """
            WITH wn AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw
              FROM documents
            ), wins AS (
              SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS gram
              FROM wn, unnest(generate_series(1, nw - 8 + 1)) AS t(i)
              WHERE nw >= 8
            ), dup AS (
              SELECT gram FROM wins
              GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
            ), hits AS (SELECT doc_id, i FROM wins
                        WHERE gram IN (SELECT gram FROM dup))
            SELECT (SELECT count(*) FROM wins) AS n_windows,
                   (SELECT count(*) FROM dup) AS n_dup_windows,
                   (SELECT count(*) FROM hits) AS n_dup_positions,
                   (SELECT count(DISTINCT doc_id) FROM hits)
                     AS n_docs_touched
        """,
        "ngram_decontaminate": """
            WITH wn AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw
              FROM documents
            ), evg AS (
              SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS gram
              FROM wn, unnest(generate_series(1, nw - 8 + 1)) AS t(i)
              WHERE nw >= 8 AND doc_id % 50 = 0
            ), cg AS (
              SELECT doc_id, array_to_string(w[i:i+7], ' ') AS gram
              FROM wn, unnest(generate_series(1, nw - 8 + 1)) AS t(i)
              WHERE nw >= 8 AND doc_id % 50 <> 0
            ), hits AS (
              SELECT doc_id, count(*) AS n FROM cg
              WHERE gram IN (SELECT gram FROM evg) GROUP BY doc_id)
            SELECT c.doc_id, greatest(c.nw - 8 + 1, 0) AS n_windows,
                   coalesce(h.n, 0) AS n_eval_hits,
                   coalesce(h.n, 0) >= 1 AS contaminated
            FROM wn c LEFT JOIN hits h USING (doc_id)
            WHERE c.doc_id % 50 <> 0 ORDER BY c.doc_id
        """,
        "dup_span_clean": """
            WITH wn AS (
              SELECT doc_id, regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
                     len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw
              FROM documents
            ), wins AS (
              SELECT doc_id, i, array_to_string(w[i:i+7], ' ') AS gram
              FROM wn, unnest(generate_series(1, nw - 8 + 1)) AS t(i)
              WHERE nw >= 8
            ), dup AS (
              SELECT gram FROM wins
              GROUP BY gram HAVING count(DISTINCT doc_id) >= 2
            ), dpos AS (
              SELECT doc_id, i FROM wins
              WHERE gram IN (SELECT gram FROM dup)
            ), wordrows AS (
              SELECT doc_id, t.i AS pos, w[t.i] AS word
              FROM wn, unnest(generate_series(1, nw)) AS t(i)
            ), covered AS (
              SELECT wr.doc_id, wr.pos, wr.word,
                     EXISTS (SELECT 1 FROM dpos d WHERE d.doc_id = wr.doc_id
                             AND wr.pos BETWEEN d.i AND d.i + 7) AS cov
              FROM wordrows wr)
            SELECT wn.doc_id, wn.nw AS n_words,
                   greatest(wn.nw - 8 + 1, 0) AS n_windows,
                   (SELECT count(*) FROM dpos d
                    WHERE d.doc_id = wn.doc_id) AS n_dup_windows,
                   (SELECT count(*) FROM covered c
                    WHERE c.doc_id = wn.doc_id AND c.cov) AS n_dropped_words,
                   coalesce((SELECT string_agg(c.word, ' ' ORDER BY c.pos)
                             FROM covered c
                             WHERE c.doc_id = wn.doc_id AND NOT c.cov),
                            '') AS clean_text
            FROM wn ORDER BY doc_id
        """,
        "pii_redact": _pii_redact_sql(),
        "mixture_interleave": _mixture_sql(),
        "bm25_search": """
            WITH dl AS (SELECT doc_id,
                          len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                          AS dl FROM documents),
            stats AS (SELECT count(*) AS n_docs,
                             sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
            toks AS (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS token FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
                   WHERE token IN ('shuffle', 'spark', 'window')
                   GROUP BY 1, 2),
            df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
            SELECT t.doc_id,
                   round(sum(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                             * t.tf * (1.2 + 1.0)
                             / (t.tf + 1.2 * (1.0 - 0.75
                                              + 0.75 * l.dl / s.avgdl))),
                         6) AS score
            FROM tf t JOIN df d USING (token) JOIN dl l USING (doc_id)
            CROSS JOIN stats s
            GROUP BY t.doc_id ORDER BY score DESC, t.doc_id LIMIT 15
        """,
        "bm25_search_indexed": """
            WITH dl AS (SELECT doc_id,
                          len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                          AS dl FROM documents),
            stats AS (SELECT count(*) AS n_docs,
                             sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
            toks AS (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS token FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
                   WHERE token IN ('shuffle', 'spark', 'window')
                   GROUP BY 1, 2),
            df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1)
            SELECT t.doc_id,
                   round(sum(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                             * t.tf * (1.2 + 1.0)
                             / (t.tf + 1.2 * (1.0 - 0.75
                                              + 0.75 * l.dl / s.avgdl))),
                         6) AS score
            FROM tf t JOIN df d USING (token) JOIN dl l USING (doc_id)
            CROSS JOIN stats s
            GROUP BY t.doc_id ORDER BY score DESC, t.doc_id LIMIT 15
        """,
        "ntile_by_value": """
            SELECT event_id,
                   row_number() OVER (ORDER BY value, event_id) AS rn,
                   ntile(10) OVER (ORDER BY value, event_id) AS tile
            FROM events ORDER BY rn
        """,
        "rolling_avg_user": """
            SELECT event_id,
                   count(*) OVER w AS roll_n,
                   round(avg(value) OVER w, 6) AS roll_avg
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                         ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
            ORDER BY event_id
        """,
        "heavy_hitters_users": """
            SELECT user_id AS value, count(*) AS n FROM events
            GROUP BY 1 HAVING count(*) >= 80 ORDER BY n DESC, value
        """,
        "rollup_source_lang": """
            SELECT source, lang, count(*) AS n FROM documents
            GROUP BY ROLLUP(source, lang)
        """,
        "hll_distinct_users": _HLL_PINNED_SQL,
        "lag_prev_value": """
            SELECT event_id,
                   lag(value, 1) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_value
            FROM events ORDER BY event_id
        """,
        "zscore_by_type": """
            SELECT event_id,
                   round((value - avg(value) OVER (PARTITION BY event_type))
                         / stddev_pop(value) OVER (PARTITION BY event_type),
                         6) AS zscore
            FROM events ORDER BY event_id
        """,
        "value_histogram": """
            WITH b AS (SELECT unnest(generate_series(0, 19)) AS bin),
            c AS (SELECT LEAST(GREATEST(CAST(floor(value / 50.0) AS BIGINT),
                                        0), 19) AS bin,
                         count(*) AS n
                  FROM events GROUP BY 1)
            SELECT b.bin, b.bin * 50.0 AS lo_edge, COALESCE(c.n, 0) AS n
            FROM b LEFT JOIN c USING (bin) ORDER BY b.bin
        """,
        "customer_order_counts": """
            SELECT c.c_custkey, COALESCE(o.n, 0) AS n_orders
            FROM customer c
            LEFT JOIN (SELECT o_custkey, count(*) AS n FROM orders
                       GROUP BY 1) o
              ON c.c_custkey = o.o_custkey
            ORDER BY c.c_custkey
        """,
        "union_distinct_users": """
            SELECT DISTINCT user_id FROM (
              SELECT user_id FROM events WHERE event_type = 'purchase'
              UNION
              SELECT user_id FROM events WHERE event_type = 'error'
            ) ORDER BY user_id
        """,
        "mode_lang_per_source": """
            SELECT source, lang, n FROM (
              SELECT source, lang, count(*) AS n,
                     row_number() OVER (PARTITION BY source
                                        ORDER BY count(*) DESC, lang) AS rk
              FROM documents GROUP BY source, lang
            ) WHERE rk = 1 ORDER BY source
        """,
        "unpivot_daily_counts": """
            WITH d AS (SELECT DISTINCT strftime(ts, '%Y-%m-%d') AS date
                       FROM events),
            t AS (SELECT unnest(['click', 'error', 'purchase', 'signup',
                                 'view']) AS metric),
            c AS (SELECT strftime(ts, '%Y-%m-%d') AS date,
                         event_type AS metric, count(*) AS n
                  FROM events GROUP BY 1, 2)
            SELECT d.date, t.metric, COALESCE(c.n, 0) AS n
            FROM d CROSS JOIN t
            LEFT JOIN c ON c.date = d.date AND c.metric = t.metric
            ORDER BY d.date, t.metric
        """,
        # media_decode's digest pinned at sf0.01 (deterministic synthetic
        # decode; proven identical across runs and block layouts) — makes
        # the multimodal plumbing driver-checkable
        # frame_sample_check pinned at sf0.01: the asset table is a pure
        # deterministic function of the corpus media refs (seed 42), and the
        # per-frame digest is layout/CPU-count-stable (proven in
        # tests/test_multimodal.py::TestFrameSample)
        "frame_sample_check": """
            SELECT CAST(frame_idx AS INTEGER) AS frame_idx,
                   CAST(n AS BIGINT) AS n, CAST(ts_sum AS BIGINT) AS ts_sum,
                   f0_sum
            FROM (VALUES
              (0, 26, 0, 13.606888),
              (1, 22, 1320000, 9.787698),
              (2, 18, 2160000, 10.392069),
              (3, 14, 2520000, 6.815966),
              (4, 12, 2880000, 7.304632)
            ) AS t(frame_idx, n, ts_sum, f0_sum)
        """,
        "media_decode_check": """
            SELECT kind, consistent, CAST(n AS BIGINT) AS n,
                   CAST(thumb_area AS BIGINT) AS thumb_area, f0_sum
            FROM (VALUES
              ('audio', false, 5, 0, 2.830273),
              ('audio', true, 27, 0, 10.902026),
              ('image', false, 1, 256, 0.936732),
              ('image', true, 23, 40315, 11.746857),
              ('video', true, 26, 0, 12.795594)
            ) AS t(kind, consistent, n, thumb_area, f0_sum)
        """,
        "q1_pricing_summary": """
            SELECT l_returnflag, l_linestatus,
                   CAST(sum(CAST(round(l_quantity * 100) AS BIGINT)) AS BIGINT) AS sum_qty_c,
                   CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
                     AS BIGINT) AS sum_base_c,
                   CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                            AS BIGINT)) AS BIGINT) AS sum_disc_c,
                   count(*) AS n
            FROM lineitem WHERE l_shipdate < TIMESTAMP '1999-01-01'
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "promo_nation_profit": """
            SELECT n_name,
                   CAST(sum(CAST(round(l_extendedprice * (1.0 - l_discount) * 100)
                            AS BIGINT)) AS BIGINT) AS rev_c
            FROM lineitem
            JOIN part ON l_partkey = p_partkey
            JOIN supplier ON l_suppkey = s_suppkey
            JOIN nation ON s_nationkey = n_nationkey
            WHERE p_type = 'PROMO'
            GROUP BY n_name ORDER BY n_name
        """,
        "regr_by_flag": """
            SELECT l_returnflag,
                   ROUND(regr_slope(l_quantity, l_discount), 9) AS slope,
                   ROUND(regr_intercept(l_quantity, l_discount), 9)
                     AS intercept,
                   ROUND(regr_r2(l_quantity, l_discount), 9) AS r2,
                   CAST(regr_count(l_quantity, l_discount) AS BIGINT) AS n
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "snapshot_diff_users": """
            WITH e AS (
              SELECT user_id, ts, event_id, event_type,
                     CAST(round(value * 100) AS BIGINT) AS cents FROM events
            ), cut AS (
              SELECT make_timestamp((epoch_us(min(ts)) + epoch_us(max(ts)))
                                    // 2) AS c FROM e
            ), o AS (
              SELECT user_id, event_type, cents FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM e WHERE ts < (SELECT c FROM cut)) WHERE rn = 1
            ), n AS (
              SELECT user_id, event_type, cents FROM (
                SELECT *, row_number() OVER (
                  PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                FROM e) WHERE rn = 1
            )
            SELECT coalesce(o.user_id, n.user_id) AS user_id,
                   CASE WHEN o.user_id IS NULL THEN 'insert'
                        WHEN n.user_id IS NULL THEN 'delete'
                        ELSE 'update' END AS change,
                   o.event_type AS old_event_type,
                   n.event_type AS new_event_type,
                   o.cents AS old_cents, n.cents AS new_cents
            FROM o FULL OUTER JOIN n ON o.user_id = n.user_id
            WHERE NOT (o.user_id IS NOT NULL AND n.user_id IS NOT NULL
                       AND o.event_type IS NOT DISTINCT FROM n.event_type
                       AND o.cents IS NOT DISTINCT FROM n.cents)
            ORDER BY user_id
        """,
        "corr_by_flag": """
            SELECT l_returnflag, ROUND(corr(l_quantity, l_discount), 9) AS corr,
                   ROUND(covar_samp(l_quantity, l_discount), 9) AS covar_samp
            FROM lineitem GROUP BY 1 ORDER BY 1
        """,
        "median_by_type": """
            SELECT event_type, ROUND(median(value), 9) AS med
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "string_agg_purchases": """
            SELECT user_id,
                   string_agg(CAST(event_id AS VARCHAR), ','
                              ORDER BY ts, event_id) AS agg
            FROM events WHERE event_type = 'purchase'
            GROUP BY 1 ORDER BY 1
        """,
        "fuzzy_name_pairs": """
            SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
            FROM customer a, customer b
            WHERE a.c_custkey < b.c_custkey
              AND levenshtein(a.c_name, b.c_name) <= 1
            ORDER BY 1, 2
        """,
        "except_all_viewers": """
            SELECT user_id FROM events WHERE event_type = 'view'
            EXCEPT ALL
            SELECT user_id FROM events WHERE event_type = 'click'
        """,
        "intersect_all_engaged": """
            SELECT user_id FROM events WHERE event_type = 'view'
            INTERSECT ALL
            SELECT user_id FROM events WHERE event_type = 'click'
        """,
        "cube_source_lang": """
            SELECT source, lang, COUNT(*) AS n FROM documents
            GROUP BY CUBE(source, lang)
        """,
        "name_pagerank": """
            WITH pairs AS (
              SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
              FROM customer a, customer b
              WHERE a.c_custkey < b.c_custkey
                AND a.c_nationkey = b.c_nationkey
                AND levenshtein(a.c_name, b.c_name) <= 1),
            edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                      UNION ALL SELECT id_b, id_a FROM pairs),
            deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
            nn AS (SELECT count(*) AS n FROM deg),
            r0 AS (SELECT deg.src AS id, 1.0 / nn.n AS r FROM deg, nn),
            r1 AS (SELECT e.dst AS id,
                          0.15 / (SELECT n FROM nn)
                          + 0.85 * SUM(r0.r / deg.d) AS r
                   FROM edges e JOIN r0 ON e.src = r0.id
                        JOIN deg ON e.src = deg.src
                   GROUP BY e.dst),
            r2 AS (SELECT e.dst AS id,
                          0.15 / (SELECT n FROM nn)
                          + 0.85 * SUM(r1.r / deg.d) AS r
                   FROM edges e JOIN r1 ON e.src = r1.id
                        JOIN deg ON e.src = deg.src
                   GROUP BY e.dst),
            r3 AS (SELECT e.dst AS id,
                          0.15 / (SELECT n FROM nn)
                          + 0.85 * SUM(r2.r / deg.d) AS r
                   FROM edges e JOIN r2 ON e.src = r2.id
                        JOIN deg ON e.src = deg.src
                   GROUP BY e.dst)
            SELECT id, ROUND(r, 9) AS rank FROM r3 ORDER BY id
        """,
        "decayed_user_value": """
            WITH w AS (
              SELECT user_id,
                     value * exp((epoch_us(ts) - 1704067200000000)
                                 / 86400000000.0) AS wv,
                     epoch_us(ts) AS e
              FROM events)
            SELECT user_id,
                   ROUND(SUM(wv) * exp(-(MAX(e) - 1704067200000000)
                                       / 86400000000.0), 6) AS decayed_sum
            FROM w GROUP BY user_id ORDER BY user_id
        """,
        "vector_centroids": """
            SELECT label, CAST(i - 1 AS INTEGER) AS dim,
                   ROUND(AVG(e), 6) AS centroid
            FROM (SELECT label, unnest(embedding) AS e,
                         generate_subscripts(embedding, 1) AS i
                  FROM embeddings)
            GROUP BY label, i ORDER BY label, dim
        """,
        "quality_audit": """
            SELECT * FROM (
              SELECT 'empty_text' AS rule,
                     CAST(COALESCE(SUM(CASE WHEN text IS NULL OR text = ''
                                       THEN 1 ELSE 0 END), 0) AS BIGINT) AS violations,
                     COUNT(*) AS total FROM documents
              UNION ALL
              SELECT 'len_mismatch',
                     CAST(COALESCE(SUM(CASE WHEN n_chars <> length(text)
                                       THEN 1 ELSE 0 END), 0) AS BIGINT),
                     COUNT(*) FROM documents
              UNION ALL
              SELECT 'unknown_lang',
                     CAST(COALESCE(SUM(CASE WHEN lang NOT IN
                                       ('de','en','es','fr','zh')
                                       THEN 1 ELSE 0 END), 0) AS BIGINT),
                     COUNT(*) FROM documents
              UNION ALL
              SELECT 'oversize',
                     CAST(COALESCE(SUM(CASE WHEN n_chars > 500
                                       THEN 1 ELSE 0 END), 0) AS BIGINT),
                     COUNT(*) FROM documents)
            ORDER BY rule
        """,
        "events_in_outages": """
            SELECT e.event_id AS event_id, w.event_id AS outage_id
            FROM events e JOIN events w
              ON w.event_type = 'error'
             AND e.ts >= w.ts AND e.ts <= w.ts + INTERVAL 600 SECOND
            ORDER BY 1, 2
        """,
        "apply_changes_balances": """
            WITH latest AS (
              SELECT user_id, event_type, value FROM (
                SELECT user_id, event_type, value,
                       row_number() OVER (PARTITION BY user_id
                         ORDER BY ts DESC, event_id DESC) AS rn
                FROM events) WHERE rn = 1)
            SELECT COALESCE(c.c_custkey, l.user_id) AS c_custkey,
                   CASE WHEN l.user_id IS NOT NULL THEN l.value
                        ELSE c.c_acctbal END AS c_acctbal
            FROM customer c FULL OUTER JOIN latest l
              ON c.c_custkey = l.user_id
            WHERE l.event_type IS DISTINCT FROM 'error'
            ORDER BY 1
        """,
        "event_transitions": """
            WITH m AS (SELECT user_id, event_type,
                         lag(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev
                       FROM events)
            SELECT prev AS from_type, event_type AS to_type,
                   count(*) AS n
            FROM m WHERE prev IS NOT NULL
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "debounce_events": """
            WITH m AS (SELECT event_id, user_id, event_type,
                         lag(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS ptype,
                         epoch_us(ts) - lag(epoch_us(ts)) OVER (
                           PARTITION BY user_id
                           ORDER BY ts, event_id) AS gap
                       FROM events)
            SELECT event_id, user_id, event_type FROM m
            WHERE ptype IS DISTINCT FROM event_type OR gap > 60000000
            ORDER BY event_id
        """,
        "entity_components": """
            WITH RECURSIVE pairs AS (
              SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
              FROM customer a, customer b
              WHERE a.c_custkey < b.c_custkey
                AND a.c_nationkey = b.c_nationkey
                AND levenshtein(a.c_name, b.c_name) <= 1
            ),
            edges AS (
              SELECT id_a AS src, id_b AS dst FROM pairs
              UNION ALL SELECT id_b, id_a FROM pairs
            ),
            reach AS (
              SELECT src AS id, src AS r FROM edges
              UNION
              SELECT e.dst AS id, reach.r FROM reach
              JOIN edges e ON reach.id = e.src
            )
            SELECT id, MIN(r) AS root FROM reach GROUP BY id ORDER BY id
        """,
        "bigram_top100": """
            WITH w AS (SELECT doc_id,
                         regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                       FROM documents),
            b AS (SELECT unnest(list_transform(
                    generate_series(1, len(ws) - 1),
                    i -> ws[i] || ' ' || ws[i + 1])) AS bigram FROM w)
            SELECT bigram, count(*) AS n FROM b
            GROUP BY 1 ORDER BY n DESC, bigram LIMIT 100
        """,
        "cooccur_event_types": """
            WITH d AS (SELECT DISTINCT user_id, event_type FROM events)
            SELECT a.event_type AS item_a, b.event_type AS item_b,
                   count(*) AS n
            FROM d a JOIN d b ON a.user_id = b.user_id
                 AND a.event_type < b.event_type
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "lang_entropy_by_source": """
            SELECT source, ROUND(-SUM(p * ln(p)), 6) AS entropy FROM (
              SELECT source,
                     COUNT(*) * 1.0
                       / SUM(COUNT(*)) OVER (PARTITION BY source) AS p
              FROM documents GROUP BY source, lang)
            GROUP BY source ORDER BY source
        """,
        "star_revenue": """
            SELECT r_name, ROUND(SUM(o_totalprice), 2) AS revenue,
                   COUNT(*) AS n_orders
            FROM orders
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            JOIN region ON n_regionkey = r_regionkey
            GROUP BY r_name ORDER BY r_name
        """,
        "cumulative_daily_value": """
            SELECT strftime(CAST(ts AS DATE), '%Y-%m-%d') AS date,
                   CAST(SUM(COUNT(*)) OVER (ORDER BY CAST(ts AS DATE))
                        AS BIGINT) AS cum_n,
                   ROUND(SUM(SUM(value)) OVER (ORDER BY CAST(ts AS DATE)), 4)
                     AS cum_total
            FROM events GROUP BY CAST(ts AS DATE) ORDER BY date
        """,
        "weighted_sample": """
            SELECT doc_id, n_chars FROM documents
            QUALIFY row_number() OVER (ORDER BY
              ln((((CAST(doc_id AS HUGEINT) * 2654435761 + 3)
                   % 4294967296) + 1) / 4294967296.0) / n_chars DESC,
              doc_id) <= 100
            ORDER BY doc_id
        """,
        "chunk_documents": """
            WITH s AS (
              SELECT doc_id, text,
                     unnest(generate_series(
                       0, CAST(length(text) AS BIGINT) - 1, 160)) AS gs
              FROM documents)
            SELECT doc_id, CAST(gs / 160 AS BIGINT) AS chunk_id,
                   substr(text, CAST(gs AS BIGINT) + 1, 200) AS chunk_text
            FROM s ORDER BY doc_id, chunk_id
        """,
        "dense_rank_values": """
            SELECT event_type, value, drank FROM (
              SELECT DISTINCT event_type, value,
                     DENSE_RANK() OVER (PARTITION BY event_type
                                        ORDER BY value DESC) AS drank
              FROM events)
            WHERE drank <= 100 ORDER BY event_type, drank
        """,
        "latest_event_per_user": """
            SELECT user_id, ts, event_id, event_type, value FROM events
            QUALIFY row_number() OVER (
              PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
            ORDER BY user_id
        """,
        "salted_value_sum": """
            SELECT event_type, ROUND(SUM(value), 6) AS total
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "fixed_k_sample": """
            SELECT event_type, event_id FROM events
            QUALIFY row_number() OVER (
              PARTITION BY event_type ORDER BY
                ((CAST(event_id AS HUGEINT) * 2654435761 + 7) % 4294967296),
                event_id) <= 25
            ORDER BY 1, 2
        """,
        "bucketed_join_orders": """
            SELECT o_orderkey, o_custkey, c_mktsegment
            FROM orders JOIN customer ON o_custkey = c_custkey
            ORDER BY 1
        """,
        "quantiles_exact_by_type": """
            SELECT event_type, q, ROUND(quantile, 9) AS quantile FROM (
              SELECT event_type, 0.25 AS q,
                     quantile_cont(value, 0.25) AS quantile
              FROM events GROUP BY 1
              UNION ALL
              SELECT event_type, 0.5, quantile_cont(value, 0.5)
              FROM events GROUP BY 1
              UNION ALL
              SELECT event_type, 0.75, quantile_cont(value, 0.75)
              FROM events GROUP BY 1
            ) ORDER BY 1, 2
        """,
        "skew_join_events": """
            SELECT event_id, user_id, c_mktsegment
            FROM events JOIN customer ON user_id = c_custkey
            ORDER BY event_id
        """,
        "percent_rank_values": """
            SELECT event_id,
                   ROUND(percent_rank() OVER (
                     PARTITION BY event_type ORDER BY value, event_id), 9) AS pr
            FROM events ORDER BY event_id
        """,
        "pushdown_read_orders": """
            SELECT count(*) AS n,
                   CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
                     AS BIGINT) AS total_cents
            FROM orders WHERE o_totalprice > 400000.0
        """,
        "weekly_top_event": """
            SELECT user_id, week, event_id, value FROM (
              SELECT user_id, epoch_us(ts) // 604800000000 AS week,
                     event_id, value,
                     row_number() OVER (
                       PARTITION BY user_id, epoch_us(ts) // 604800000000
                       ORDER BY value DESC, event_id) AS rn
              FROM events) WHERE rn = 1
            ORDER BY user_id, week
        """,
        "quantize_embeddings": """
            WITH x AS (
              SELECT e.vec_id, t.dim,
                     CAST(e.embedding[t.dim] AS DOUBLE) AS v
              FROM embeddings e,
                   unnest(generate_series(1, len(e.embedding))) AS t(dim)
            ), s AS (SELECT dim, min(v) AS mn, max(v) AS mx FROM x GROUP BY dim)
            SELECT x.dim, s.mn, s.mx,
                   CAST(sum(CASE WHEN s.mx > s.mn THEN CAST(round(
                     (x.v - s.mn) * 255.0 / (s.mx - s.mn)) AS BIGINT)
                   ELSE 0 END) AS BIGINT) AS sum_q
            FROM x JOIN s USING (dim) GROUP BY x.dim, s.mn, s.mx
            ORDER BY x.dim
        """,
        "range_layout_orders": """
            WITH b AS (SELECT unnest(quantile_disc(o_totalprice,
                         [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]))
                       AS bv FROM orders),
            p AS (SELECT o_totalprice AS v,
                         (SELECT count(*) FROM b WHERE bv < o_totalprice)
                         AS part FROM orders)
            SELECT part, count(*) AS n, min(v) AS mn, max(v) AS mx
            FROM p GROUP BY part ORDER BY part
        """,
        "rolling_dau": """
            WITH e AS (SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
                              user_id FROM events),
                 days AS (SELECT DISTINCT day FROM e)
            SELECT d.day, count(DISTINCT e.user_id) AS n_distinct
            FROM days d JOIN e ON e.day BETWEEN d.day - 6 AND d.day
            GROUP BY d.day ORDER BY d.day
        """,
        "events_with_state": """
            WITH ch AS (
              SELECT user_id, ts, event_id, event_type,
                     LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events WHERE event_type IN ('signup', 'error')
            ), surv AS (
              SELECT user_id, ts, event_id, event_type FROM ch
              WHERE prev IS NULL OR event_type <> prev
            ), dim AS (
              SELECT user_id, event_type AS state, ts AS valid_from,
                     LEAD(ts) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
              FROM surv)
            SELECT p.event_id, p.user_id, d.state
            FROM events p JOIN dim d ON p.user_id = d.user_id
              AND p.ts >= d.valid_from
              AND (d.valid_to IS NULL OR p.ts < d.valid_to)
            WHERE p.event_type = 'purchase'
            ORDER BY p.event_id
        """,
        "scd2_user_states": """
            WITH ordered AS (
              SELECT user_id, ts, event_id, event_type,
                     LAG(event_type) OVER (
                       PARTITION BY user_id ORDER BY ts, event_id) AS prev
              FROM events
            ), changes AS (
              SELECT user_id, ts, event_id, event_type FROM ordered
              WHERE prev IS NULL OR event_type <> prev
            )
            SELECT user_id, event_type, ts AS valid_from,
                   LEAD(ts) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id) AS valid_to
            FROM changes ORDER BY user_id, valid_from
        """,
        "cumsum_by_user": """
            SELECT event_id,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cents,
                   COUNT(*) OVER (
                     PARTITION BY user_id ORDER BY ts, event_id
                     ROWS UNBOUNDED PRECEDING) AS cum_n
            FROM events ORDER BY event_id
        """,
        "bloom_semijoin_orders": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM customer
                                WHERE c_mktsegment = 'BUILDING')
            ORDER BY o_orderkey
        """,
        "daily_gapfill": """
            WITH agg AS (
              SELECT CAST(ts AS DATE) AS day, COUNT(*) AS n FROM events
              WHERE event_type = 'purchase' AND value > 4.97
              GROUP BY 1
            ), cal AS (
              SELECT CAST(unnest(generate_series(
                       (SELECT MIN(day) FROM agg),
                       (SELECT MAX(day) FROM agg),
                       INTERVAL 1 DAY)) AS DATE) AS day
            )
            SELECT strftime(cal.day, '%Y-%m-%d') AS date,
                   COALESCE(agg.n, 0) AS n_events
            FROM cal LEFT JOIN agg USING (day) ORDER BY 1
        """,
        "full_outer_balances": """
            WITH s AS (
              SELECT user_id,
                     SUM(CAST(round(value * 100) AS BIGINT)) AS total_cents
              FROM events GROUP BY user_id
            )
            SELECT COALESCE(c_custkey, user_id) AS id, c_acctbal, total_cents
            FROM customer FULL OUTER JOIN s ON c_custkey = user_id
            ORDER BY id
        """,
        "hash_split_stats": """
            WITH h AS (
              SELECT n_chars,
                     CAST((CAST(doc_id AS HUGEINT) * 2654435761 + 9)
                          % 4294967296 AS BIGINT) AS hv
              FROM documents
            ), lab AS (
              SELECT n_chars,
                     CASE WHEN hv < 214748364 THEN 'test'
                          WHEN hv < 429496729 THEN 'val'
                          ELSE 'train' END AS split
              FROM h
            )
            SELECT split, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars
            FROM lab GROUP BY split ORDER BY split
        """,
        "anti_join_shuffle": """
            SELECT o_orderkey, o_custkey FROM orders
            WHERE NOT EXISTS (SELECT 1 FROM customer
                              WHERE c_custkey = o_custkey
                                AND c_mktsegment = 'BUILDING')
            ORDER BY o_orderkey
        """,
        "range_rolling_user": """
            SELECT event_id,
                   CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT) AS rr_cents,
                   COUNT(*) OVER w AS rr_n
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts
                         RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                         AND CURRENT ROW)
            ORDER BY event_id
        """,
        "zorder_orders": _zorder_sql(),
        "merged_user_sessions": """
            WITH iv AS (
              SELECT user_id, epoch_us(ts) AS s_us,
                     epoch_us(ts) + 1800000000 AS e_us
              FROM events
            ), flagged AS (
              SELECT user_id, s_us, e_us,
                     CASE WHEN s_us > COALESCE(MAX(e_us) OVER (
                            PARTITION BY user_id ORDER BY s_us, e_us
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), s_us - 1)
                          THEN 1 ELSE 0 END AS brk
              FROM iv
            ), grouped AS (
              SELECT *, SUM(brk) OVER (PARTITION BY user_id
                                       ORDER BY s_us, e_us
                                       ROWS UNBOUNDED PRECEDING) AS island
              FROM flagged
            )
            SELECT user_id, MIN(s_us) AS s_us, MAX(e_us) AS e_us,
                   COUNT(*) AS n_events
            FROM grouped GROUP BY user_id, island
            ORDER BY user_id, s_us
        """,
        "union_by_name_docs": """
            SELECT doc_id, source, n_chars, lang FROM (
              SELECT doc_id, source, n_chars FROM documents
              WHERE lang = 'en'
              UNION ALL BY NAME
              SELECT doc_id, lang FROM documents WHERE lang <> 'en'
            ) ORDER BY doc_id
        """,
        "lead_next_value": """
            SELECT event_id,
                   LEAD(value, 1) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS lead_value
            FROM events ORDER BY event_id
        """,
        "gsets_source_lang": """
            SELECT source, lang, COUNT(*) AS n FROM documents
            GROUP BY GROUPING SETS ((source), (lang), ())
            ORDER BY (source IS NULL), source, (lang IS NULL), lang
        """,
        "cume_dist_values": """
            SELECT event_id,
                   ROUND(cume_dist() OVER (
                     PARTITION BY event_type ORDER BY value, event_id), 9) AS cd
            FROM events ORDER BY event_id
        """,
        "q5_region_revenue": """
            SELECT n_name,
                   CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT)) AS BIGINT) AS revenue_i4
            FROM customer, orders, lineitem, nation, region
            WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
              AND r_name = 'ASIA'
              AND o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1997-01-01'
            GROUP BY n_name ORDER BY n_name
        """,
        "q3_unshipped_topk": """
            SELECT l_orderkey,
                   CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount) * 10000)
                            AS BIGINT)) AS BIGINT) AS revenue_i4,
                   strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate
            FROM customer, orders, lineitem
            WHERE c_mktsegment = 'BUILDING'
              AND c_custkey = o_custkey AND l_orderkey = o_orderkey
              AND o_orderdate < TIMESTAMP '1998-06-15'
              AND l_shipdate  > TIMESTAMP '1998-06-15'
            GROUP BY l_orderkey, o_orderdate
            ORDER BY revenue_i4 DESC, l_orderkey LIMIT 10
        """,
        "shuffled_docs_head": _shuffled_head_sql(),
        # kmeans is iterative — not SQL-expressible.  This pins the engine's
        # bit-deterministic output at the driver's correctness scale
        # (sf0.01, seed=0, k=8, 5 iters): fixed-point int64 partials make
        # the result identical across partitionings; verified bit-equal at
        # 4 vs 16 CPUs.  Determinism+regression gate, valid at sf0.01 only.
        "kmeans_embeddings": """
            SELECT CAST(cluster_id AS BIGINT) AS cluster_id,
                   CAST(size AS BIGINT) AS size,
                   CAST(centroid_norm AS DOUBLE) AS centroid_norm
            FROM (VALUES
              (0, 55, 0.265906), (1, 61, 0.255662), (2, 67, 0.250667),
              (3, 66, 0.274938), (4, 63, 0.269473), (5, 63, 0.274249),
              (6, 66, 0.273279), (7, 59, 0.274369)
            ) AS t(cluster_id, size, centroid_norm)
        """,
        # Count-Min counters are integer sums (commutative), so the sketch
        # is layout-deterministic and fully re-derivable in SQL: bucket the
        # whole stream with the same hash family, then est = min over rows.
        "count_min_users": """
            WITH params(i, a, b) AS (VALUES
              (0, 1103515245, 12345), (1, 1664525, 1013904223),
              (2, 69069, 362437), (3, 22695477, 133331)),
            slots AS (
              SELECT p.i AS i,
                     ((p.a * (e.user_id % 2147483647) + p.b) % 2147483647)
                       % 512 AS bucket,
                     COUNT(*) AS c
              FROM events e CROSS JOIN params p GROUP BY 1, 2),
            qk AS (SELECT user_id, COUNT(*) AS exact FROM events
                   WHERE user_id < 60 GROUP BY 1),
            qs AS (
              SELECT q.user_id, p.i,
                     ((p.a * (q.user_id % 2147483647) + p.b) % 2147483647)
                       % 512 AS bucket
              FROM qk q CROSS JOIN params p),
            est AS (
              SELECT qs.user_id, MIN(s.c) AS est
              FROM qs JOIN slots s ON s.i = qs.i AND s.bucket = qs.bucket
              GROUP BY 1)
            SELECT q.user_id, CAST(e.est AS BIGINT) AS est,
                   CAST(q.exact AS BIGINT) AS exact
            FROM qk q JOIN est e USING (user_id) ORDER BY user_id
        """,
        "bigram_logprob": """
            WITH w AS (SELECT doc_id,
                         regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                       FROM documents),
            tok AS (SELECT unnest(ws) AS token FROM w),
            v AS (SELECT COUNT(DISTINCT token) AS v FROM tok),
            b AS (SELECT doc_id, unnest(list_transform(
                    generate_series(1, len(ws) - 1),
                    i -> ws[i] || ' ' || ws[i + 1])) AS bigram FROM w),
            cb AS (SELECT bigram, COUNT(*) AS c FROM b GROUP BY 1),
            ctx AS (SELECT string_split(bigram, ' ')[1] AS tok1,
                           SUM(c) AS cc FROM cb GROUP BY 1),
            mu AS (SELECT cb.bigram,
                     CAST(-floor(-(ln((cb.c + 1.0) / (ctx.cc + v.v))
                                  * 1000000) + 0.5) AS BIGINT) AS mu
                   FROM cb, ctx, v
                   WHERE string_split(cb.bigram, ' ')[1] = ctx.tok1)
            SELECT b.doc_id, COUNT(*) AS n_bigrams,
                   CAST(SUM(mu.mu) AS BIGINT) AS bigram_lp_micro
            FROM b JOIN mu USING (bigram)
            GROUP BY 1 ORDER BY doc_id
        """,
        "readability_docs": """
            SELECT doc_id,
              len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS n_words,
              greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
                AS n_sentences,
              len(regexp_extract_all(lower(text), '[aeiouy]+'))
                AS n_syllables,
              CAST(-floor(-((206.835 - 1.015*(n_words*1.0/n_sentences)
                             - 84.6*(n_syllables*1.0/n_words))*1000000)
                          + 0.5) AS BIGINT) AS fre_micro
            FROM documents
            WHERE len(regexp_extract_all(lower(text), '[a-z0-9]+')) > 0
            ORDER BY doc_id
        """,
        "char_entropy_docs": """
            WITH c AS (SELECT doc_id,
                         unnest(regexp_split_to_array(text, '')) AS ch
                       FROM documents WHERE text <> '')
            SELECT doc_id, COUNT(*) AS n_chars_h,
                   round(entropy(ch), 6) AS char_entropy
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "user_event_entropy": """
            SELECT user_id, round(entropy(event_type), 6) AS entropy,
                   COUNT(DISTINCT event_type) AS n_cats
            FROM events GROUP BY 1 ORDER BY 1
        """,
        "interarrival_by_user": """
            WITH g AS (SELECT user_id, ts,
                         epoch_us(ts) - epoch_us(
                           LAG(ts) OVER (PARTITION BY user_id ORDER BY ts))
                           AS gap
                       FROM events)
            SELECT user_id, COUNT(*) AS n_events,
                   CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT)
                     AS span_us,
                   CAST(MAX(gap) AS BIGINT) AS max_gap_us
            FROM g GROUP BY 1 ORDER BY 1
        """,
        # Every x_i*x_j product of float32 values is exact in float64, and
        # each product is half-rounded to integer micro-units BEFORE the
        # reduction — so the co-moment sums are order-independent int64 and
        # the covariance column derives from the same integers with the
        # same float expression on both sides (bit-exact, no rounding).
        "embedding_covariance": """
            WITH e AS (SELECT vec_id,
                         unnest(generate_series(1, len(embedding))) - 1 AS i,
                         unnest(embedding) AS v
                       FROM embeddings),
            p AS (SELECT e1.i AS i, e2.i AS j,
                    SUM(CAST(-floor(-((CAST(e1.v AS DOUBLE)
                                       * CAST(e2.v AS DOUBLE)) * 1000000)
                                    + 0.5) AS BIGINT)) AS s_xy,
                    SUM(CAST(-floor(-(CAST(e1.v AS DOUBLE) * 1000000)
                                    + 0.5) AS BIGINT)) AS s_x,
                    SUM(CAST(-floor(-(CAST(e2.v AS DOUBLE) * 1000000)
                                    + 0.5) AS BIGINT)) AS s_y,
                    COUNT(*) AS n
                  FROM e e1 JOIN e e2
                    ON e1.vec_id = e2.vec_id AND e1.i <= e2.i
                  GROUP BY 1, 2)
            SELECT i, j, n, CAST(s_xy AS BIGINT) AS s_xy_micro,
                   (s_xy/1000000.0 - (s_x/1000000.0)*(s_y/1000000.0)/n)
                     / (n - 1.0) AS cov
            FROM p ORDER BY i, j
        """,
        "lang_drift_by_source": """
            WITH c AS (SELECT source, lang, COUNT(*) AS n
                       FROM documents GROUP BY 1, 2),
            g AS (SELECT lang, SUM(n) AS gn FROM c GROUP BY 1),
            tot AS (SELECT SUM(n) AS t FROM c),
            k AS (SELECT source, SUM(n) AS kn FROM c GROUP BY 1),
            grid AS (SELECT k.source, g.lang, k.kn, g.gn,
                            COALESCE(c.n, 0) AS n
                     FROM k CROSS JOIN g
                     LEFT JOIN c ON c.source = k.source AND c.lang = g.lang)
            SELECT grid.source, CAST(MAX(grid.kn) AS BIGINT) AS n,
              round(SUM(CASE WHEN grid.n > 0 THEN (grid.n*1.0/grid.kn)
                       * log2((grid.n*1.0/grid.kn) / (grid.gn*1.0/tot.t))
                     ELSE 0 END), 6) AS kl_bits,
              round(SUM(pow(grid.n - grid.kn*grid.gn*1.0/tot.t, 2)
                        / (grid.kn*grid.gn*1.0/tot.t)), 6) AS chi2
            FROM grid, tot GROUP BY 1 ORDER BY 1
        """,
        # Edge membership is an INTEGER threshold (per-value fixed-point
        # quantization then exact int64 dot), so the graph — and every
        # triangle — is re-derived exactly; no float-threshold flicker.
        "similarity_triangles": """
            WITH q AS (SELECT vec_id,
                         unnest(generate_series(1, len(embedding))) - 1 AS i,
                         CAST(-floor(-(CAST(unnest(embedding) AS DOUBLE)
                                       * 1048576) + 0.5) AS BIGINT) AS qv
                       FROM embeddings WHERE vec_id < 400),
            s AS (SELECT a.vec_id AS u, b.vec_id AS v, SUM(a.qv * b.qv) AS sim
                  FROM q a JOIN q b ON a.i = b.i AND a.vec_id < b.vec_id
                  GROUP BY 1, 2),
            e AS (SELECT u, v FROM s WHERE sim >= 274877906944),
            deg AS (SELECT node, COUNT(*) AS degree FROM
                    (SELECT u AS node FROM e UNION ALL SELECT v FROM e)
                    GROUP BY 1),
            tri AS (SELECT e1.u AS a, e1.v AS b, e2.v AS c
                    FROM e e1 JOIN e e2 ON e1.u = e2.u AND e1.v < e2.v
                    JOIN e e3 ON e3.u = e1.v AND e3.v = e2.v),
            tc AS (SELECT node, COUNT(*) AS triangles FROM
                   (SELECT a AS node FROM tri UNION ALL SELECT b FROM tri
                    UNION ALL SELECT c FROM tri) GROUP BY 1)
            SELECT deg.node, deg.degree,
                   COALESCE(tc.triangles, 0) AS triangles,
                   CASE WHEN deg.degree >= 2
                        THEN round(2.0 * COALESCE(tc.triangles, 0)
                                   / (deg.degree * (deg.degree - 1.0)), 6)
                        END AS clustering
            FROM deg LEFT JOIN tc USING (node) ORDER BY node
        """,
        "bpe_merges": _bpe_oracle(8),
        "bpe_segment_counts": _bpe_oracle(8, mode="apply"),
        "event_paths_top20": """
            WITH s AS (SELECT user_id, event_type,
                         LEAD(event_type, 1) OVER w AS e2,
                         LEAD(event_type, 2) OVER w AS e3
                       FROM events
                       WINDOW w AS (PARTITION BY user_id
                                    ORDER BY ts, event_id))
            SELECT event_type || '>' || e2 || '>' || e3 AS path,
                   COUNT(*) AS n_paths
            FROM s WHERE e3 IS NOT NULL
            GROUP BY 1 ORDER BY n_paths DESC, path ASC LIMIT 20
        """,
        # 1-based ranks over ascending per-key counts; rank-weighted sum is
        # tie-order invariant, so no tiebreak column is needed.
        "activity_gini": """
            WITH c AS (SELECT user_id, COUNT(*) AS n FROM events
                       GROUP BY 1),
            r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS i FROM c)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(SUM(n) AS BIGINT) AS total,
                   round((2.0 * SUM(i * n)) / (COUNT(*) * SUM(n))
                         - (COUNT(*) + 1.0) / COUNT(*), 9) AS gini
            FROM r
        """,
        "winsorized_value_by_type": """
            WITH q AS (SELECT event_type,
                         quantile_cont(value, 0.05) AS lo,
                         quantile_cont(value, 0.95) AS hi
                       FROM events GROUP BY 1)
            SELECT e.event_type, COUNT(*) AS n,
                   round(MAX(q.lo), 9) AS q_lo,
                   round(MAX(q.hi), 9) AS q_hi,
                   round(AVG(CASE WHEN e.value < q.lo THEN q.lo
                                  WHEN e.value > q.hi THEN q.hi
                                  ELSE e.value END), 6) AS wmean
            FROM events e JOIN q USING (event_type)
            GROUP BY 1 ORDER BY 1
        """,
        "burstiness_by_user": """
            WITH d AS (SELECT user_id,
                         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                         COUNT(*) AS n
                       FROM events GROUP BY 1, 2)
            SELECT user_id, COUNT(*) AS n_days,
                   round(var_samp(n) / avg(n), 6) AS fano
            FROM d GROUP BY 1 ORDER BY 1
        """,
        "conversion_latency": """
            WITH f AS (SELECT user_id,
                         MIN(CASE WHEN event_type = 'view'
                                  THEN epoch_us(ts) END) AS v,
                         MIN(CASE WHEN event_type = 'purchase'
                                  THEN epoch_us(ts) END) AS p
                       FROM events
                       WHERE event_type IN ('view', 'purchase')
                       GROUP BY 1)
            SELECT user_id, CAST(p - v AS BIGINT) AS latency_us
            FROM f WHERE v IS NOT NULL AND p IS NOT NULL AND p >= v
            ORDER BY user_id
        """,
        "q13_custdist": """
            SELECT c_count, COUNT(*) AS custdist FROM (
              SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
              FROM customer c LEFT JOIN orders o
                ON o.o_custkey = c.c_custkey
              GROUP BY 1)
            GROUP BY 1 ORDER BY custdist DESC, c_count DESC
        """,
        "pretrain_prep_bpe": _pretrain_bpe_oracle(8),
        # per-dim μ/σ² derive from int64-quantized moment sums; each
        # Mahalanobis term is quantized BEFORE the across-dim SUM, so the
        # score (and the top-k cut) is integer-exact on both sides.
        "embedding_outliers": """
            WITH e AS (SELECT vec_id,
                         unnest(generate_series(1, len(embedding))) - 1 AS i,
                         CAST(unnest(embedding) AS DOUBLE) AS v
                       FROM embeddings),
            m AS (SELECT i,
                    SUM(CAST(-floor(-(v*1000000) + 0.5) AS BIGINT)) AS sx,
                    SUM(CAST(-floor(-((v*v)*1000000) + 0.5) AS BIGINT))
                      AS sxx,
                    COUNT(*) AS n
                  FROM e GROUP BY 1),
            p AS (SELECT i, sx/1000000.0/n AS mu,
                    (sxx/1000000.0 - (sx/1000000.0)*(sx/1000000.0)/n)
                      / (n - 1.0) AS var
                  FROM m),
            d AS (SELECT e.vec_id,
                    SUM(CAST(-floor(-(((e.v - p.mu)*(e.v - p.mu)/p.var)
                                      *1000000) + 0.5) AS BIGINT))
                      AS dist2_micro
                  FROM e JOIN p USING (i) GROUP BY 1)
            SELECT vec_id, CAST(dist2_micro AS BIGINT) AS dist2_micro FROM d
            ORDER BY dist2_micro DESC, vec_id LIMIT 25
        """,
        "selfjoin_size_estimate": """
            WITH params(i, a, b) AS (VALUES
              (0, 1103515245, 12345), (1, 1664525, 1013904223),
              (2, 69069, 362437), (3, 22695477, 133331)),
            slots AS (
              SELECT p.i AS i,
                     ((p.a * (e.user_id % 2147483647) + p.b) % 2147483647)
                       % 512 AS bucket,
                     COUNT(*) AS c
              FROM events e CROSS JOIN params p GROUP BY 1, 2),
            ip AS (SELECT i, SUM(c * c) AS s FROM slots GROUP BY 1),
            cnts AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY 1)
            SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
                   CAST(SUM(n * n) AS BIGINT) AS exact,
                   (SELECT CAST(MIN(s) AS BIGINT) FROM ip) AS est
            FROM cnts
        """,
        "twap_by_user": """
            WITH s AS (SELECT user_id, epoch_us(ts) AS t, value,
                         LEAD(epoch_us(ts)) OVER
                           (PARTITION BY user_id
                            ORDER BY ts, event_id) AS t2
                       FROM events),
            g AS (SELECT user_id,
                    CAST(SUM(CASE WHEN t2 IS NOT NULL THEN
                      CAST(-floor(-(value * (t2 - t)) + 0.5) AS BIGINT)
                      ELSE 0 END) AS BIGINT) AS q,
                    CAST(MAX(t) - MIN(t) AS BIGINT) AS span_us
                  FROM s GROUP BY 1)
            SELECT user_id, span_us, CAST(q AS DOUBLE) / span_us AS twap
            FROM g WHERE span_us > 0 ORDER BY user_id
        """,
        "personalized_pagerank": """
            WITH pairs AS (
              SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
              FROM customer a, customer b
              WHERE a.c_custkey < b.c_custkey
                AND a.c_nationkey = b.c_nationkey
                AND levenshtein(a.c_name, b.c_name) <= 1),
            edges AS (SELECT id_a AS src, id_b AS dst FROM pairs
                      UNION ALL SELECT id_b, id_a FROM pairs),
            deg AS (SELECT src, count(*) AS d FROM edges GROUP BY src),
            ns AS (SELECT count(*) AS n FROM customer
                   WHERE c_custkey % 100 = 0),
            r0 AS (SELECT deg.src AS id,
                          CASE WHEN deg.src % 100 = 0
                               THEN 1.0 / ns.n ELSE 0.0 END AS r
                   FROM deg, ns),
            r1 AS (SELECT e.dst AS id,
                          0.15 * CASE WHEN e.dst % 100 = 0
                                 THEN 1.0 / (SELECT n FROM ns)
                                 ELSE 0.0 END
                          + 0.85 * SUM(r0.r / deg.d) AS r
                   FROM edges e JOIN r0 ON e.src = r0.id
                        JOIN deg ON e.src = deg.src
                   GROUP BY e.dst),
            r2 AS (SELECT e.dst AS id,
                          0.15 * CASE WHEN e.dst % 100 = 0
                                 THEN 1.0 / (SELECT n FROM ns)
                                 ELSE 0.0 END
                          + 0.85 * SUM(r1.r / deg.d) AS r
                   FROM edges e JOIN r1 ON e.src = r1.id
                        JOIN deg ON e.src = deg.src
                   GROUP BY e.dst),
            r3 AS (SELECT e.dst AS id,
                          0.15 * CASE WHEN e.dst % 100 = 0
                                 THEN 1.0 / (SELECT n FROM ns)
                                 ELSE 0.0 END
                          + 0.85 * SUM(r2.r / deg.d) AS r
                   FROM edges e JOIN r2 ON e.src = r2.id
                        JOIN deg ON e.src = deg.src
                   GROUP BY e.dst)
            SELECT id, ROUND(r, 9) AS rank FROM r3 ORDER BY id
        """,
        "stopword_coverage": _stopword_oracle(),
        "kcore_embeddings": _kcore_oracle(4, 6),
        "weighted_median_price": """
            WITH c AS (SELECT l_returnflag, l_extendedprice,
                         CAST(l_quantity AS BIGINT) AS w,
                         SUM(CAST(l_quantity AS BIGINT)) OVER
                           (PARTITION BY l_returnflag
                            ORDER BY l_extendedprice) AS cw,
                         SUM(CAST(l_quantity AS BIGINT)) OVER
                           (PARTITION BY l_returnflag) AS tw
                       FROM lineitem)
            SELECT l_returnflag, MIN(l_extendedprice) AS wmedian
            FROM c WHERE cw >= tw / 2.0 GROUP BY 1 ORDER BY 1
        """,
        "time_in_state": """
            WITH s AS (SELECT user_id, event_type, epoch_us(ts) AS t,
                         LEAD(epoch_us(ts)) OVER
                           (PARTITION BY user_id
                            ORDER BY ts, event_id) AS t2
                       FROM events)
            SELECT event_type,
                   CAST(SUM(t2 - t) AS BIGINT) AS dwell_us
            FROM s WHERE t2 IS NOT NULL
            GROUP BY 1 ORDER BY 1
        """,
        # default RANGE window frame makes the cumulative tie-inclusive —
        # the engine evaluates only after each complete tie group, same rule
        "roc_auc_purchase": """
            WITH x AS (SELECT value AS s,
                         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                           AS p
                       FROM events WHERE value IS NOT NULL),
            a AS (SELECT s, SUM(p) AS np, SUM(1 - p) AS nn
                  FROM x GROUP BY s),
            w AS (SELECT np, nn,
                    COALESCE(SUM(nn) OVER (ORDER BY s
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                      AS below
                  FROM a),
            t AS (SELECT SUM(np) AS n1, SUM(nn) AS n0 FROM a)
            SELECT CAST(t.n1 AS BIGINT) AS n_pos,
                   CAST(t.n0 AS BIGINT) AS n_neg,
                   round(SUM(np * (below + 0.5 * nn)) / (t.n1 * t.n0), 9)
                     AS auc
            FROM w, t GROUP BY t.n1, t.n0
        """,
        "calibration_purchase": """
            WITH x AS (SELECT LEAST(GREATEST(value / 500.0, 0.0), 1.0) AS p,
                         CASE WHEN event_type = 'purchase' THEN 1.0
                              ELSE 0.0 END AS l
                       FROM events WHERE value IS NOT NULL)
            SELECT LEAST(CAST(FLOOR(p * 10) AS BIGINT), 9) AS bin,
                   COUNT(*) AS n,
                   round(AVG(p), 9) AS mean_p,
                   round(AVG(l), 9) AS frac_pos
            FROM x GROUP BY 1 ORDER BY 1
        """,
        "mi_lang_source": """
            WITH c AS (SELECT lang AS x, source AS y, COUNT(*) AS o
                       FROM documents GROUP BY 1, 2),
            rx AS (SELECT x, SUM(o) AS r FROM c GROUP BY 1),
            cy AS (SELECT y, SUM(o) AS cc FROM c GROUP BY 1),
            t AS (SELECT SUM(o) AS n FROM c),
            k AS (SELECT LEAST((SELECT COUNT(*) FROM rx),
                               (SELECT COUNT(*) FROM cy)) AS k)
            SELECT CAST(t.n AS BIGINT) AS n,
                   round(SUM((c.o * 1.0 / t.n)
                             * ln(c.o * 1.0 * t.n / (rx.r * cy.cc))), 9)
                     AS mi_nats,
                   round(t.n * (SUM(c.o * c.o * 1.0 / (rx.r * cy.cc)) - 1.0),
                         6) AS chi2,
                   round(sqrt(GREATEST(t.n * (SUM(c.o * c.o * 1.0
                                                  / (rx.r * cy.cc)) - 1.0),
                                       0.0) / (t.n * (k.k - 1))), 9)
                     AS cramers_v
            FROM c JOIN rx ON c.x = rx.x JOIN cy ON c.y = cy.y, t, k
            GROUP BY t.n, k.k
        """,
        "benford_totalprice": """
            WITH i AS (SELECT CAST(ROUND(o_totalprice * 100) AS BIGINT) AS c
                       FROM orders WHERE o_totalprice > 0),
            d AS (SELECT CAST(substr(CAST(c AS VARCHAR), 1, 1) AS BIGINT)
                    AS digit
                  FROM i WHERE c > 0),
            g AS (SELECT digit, COUNT(*) AS n FROM d GROUP BY 1),
            t AS (SELECT SUM(n) AS tot FROM g),
            all9 AS (SELECT CAST(r + 1 AS BIGINT) AS digit
                     FROM range(9) AS x(r))
            SELECT all9.digit, CAST(COALESCE(g.n, 0) AS BIGINT) AS n,
                   round(COALESCE(g.n, 0) * 1.0 / t.tot, 9) AS observed_p,
                   round(log10(1 + 1.0 / all9.digit), 9) AS expected_p
            FROM all9 LEFT JOIN g USING (digit), t
            ORDER BY all9.digit
        """,
        "ks_view_purchase": """
            WITH x AS (SELECT value AS v,
                         CASE WHEN event_type = 'view' THEN 1 ELSE 0 END
                           AS i1,
                         CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END
                           AS i2
                       FROM events
                       WHERE event_type IN ('view', 'purchase')),
            n AS (SELECT SUM(i1) AS n1, SUM(i2) AS n2 FROM x),
            r AS (SELECT v, SUM(i1) OVER (ORDER BY v) AS c1,
                         SUM(i2) OVER (ORDER BY v) AS c2 FROM x)
            SELECT CAST(n.n1 AS BIGINT) AS n_a, CAST(n.n2 AS BIGINT) AS n_b,
                   round(MAX(ABS(c1 * 1.0 / n.n1 - c2 * 1.0 / n.n2)), 9)
                     AS ks_d
            FROM r, n GROUP BY 1, 2
        """,
        "changepoint_daily": """
            WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                         AS day, COUNT(*) AS n
                       FROM events GROUP BY 1),
            o AS (SELECT day, n,
                    ROW_NUMBER() OVER (ORDER BY day) AS i,
                    SUM(n) OVER (ORDER BY day) AS s1,
                    SUM(n * n) OVER (ORDER BY day) AS s2
                  FROM d),
            t AS (SELECT MAX(s1) AS st1, MAX(s2) AS st2,
                         COUNT(*) AS m FROM o),
            c AS (SELECT o.day,
                    (o.s2 - o.s1 * o.s1 * 1.0 / o.i)
                    + ((t.st2 - o.s2)
                       - (t.st1 - o.s1) * (t.st1 - o.s1) * 1.0
                         / (t.m - o.i)) AS sse
                  FROM o, t WHERE o.i < t.m)
            SELECT day AS change_day, round(sse, 6) AS sse
            FROM c ORDER BY sse ASC, day ASC LIMIT 1
        """,
        # engine side round-trips through CSV/NDJSON text (integer-quantized
        # value columns survive exactly); oracle reads the parquet directly
        "csv_source_stats": """
            SELECT COUNT(*) AS n_orders,
                   CAST(SUM(CAST(-floor(-(o_totalprice * 100) + 0.5)
                                 AS BIGINT)) AS BIGINT) AS sum_cents,
                   COUNT(DISTINCT o_custkey) AS n_cust
            FROM orders
        """,
        "jsonl_source_stats": """
            SELECT COUNT(*) AS n_events,
                   CAST(SUM(CASE WHEN value >= 0
                             THEN CAST(floor(value * 1000 + 0.5) AS BIGINT)
                             ELSE -CAST(floor(-value * 1000 + 0.5)
                                        AS BIGINT) END) AS BIGINT)
                     AS sum_milli,
                   COUNT(DISTINCT event_type) AS n_types
            FROM events
        """,
        # both legs reuse the verified bm25 / cosine rankings; RRF adds at
        # most two floats per doc (float addition of two terms is
        # order-free), rounded at 9
        "hybrid_search_rrf": """
            WITH dl AS (SELECT doc_id,
                          len(regexp_extract_all(lower(text), '[a-z0-9]+'))
                          AS dl FROM documents),
            stats AS (SELECT count(*) AS n_docs,
                             sum(dl) * 1.0 / count(*) AS avgdl FROM dl),
            toks AS (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text), '[a-z0-9]+'))
                       AS token FROM documents),
            tf AS (SELECT doc_id, token, count(*) AS tf FROM toks
                   WHERE token IN ('shuffle', 'spark', 'window')
                   GROUP BY 1, 2),
            df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
            bm AS (SELECT t.doc_id,
                     sum(ln((s.n_docs - d.df + 0.5) / (d.df + 0.5) + 1.0)
                         * t.tf * (1.2 + 1.0)
                         / (t.tf + 1.2 * (1.0 - 0.75
                                          + 0.75 * l.dl / s.avgdl)))
                       AS score
                   FROM tf t JOIN df d USING (token) JOIN dl l USING (doc_id)
                   CROSS JOIN stats s GROUP BY t.doc_id),
            lex AS (SELECT doc_id,
                      row_number() OVER (ORDER BY score DESC, doc_id) AS rk
                    FROM bm ORDER BY score DESC, doc_id LIMIT 20),
            q AS (SELECT CAST(embedding AS DOUBLE[]) AS emb
                  FROM embeddings ORDER BY vec_id LIMIT 1),
            scored AS (SELECT e.vec_id,
                         list_cosine_similarity(q.emb,
                           CAST(e.embedding AS DOUBLE[])) AS sim
                       FROM q CROSS JOIN embeddings e),
            sem AS (SELECT vec_id AS doc_id,
                      row_number() OVER (ORDER BY sim DESC, vec_id) AS rk
                    FROM scored ORDER BY sim DESC, vec_id LIMIT 20),
            fused AS (SELECT doc_id, SUM(1.0 / (60 + rk)) AS rrf FROM (
                        SELECT doc_id, rk FROM lex
                        UNION ALL SELECT doc_id, rk FROM sem)
                      GROUP BY 1)
            SELECT doc_id, round(rrf, 9) AS rrf
            FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
        """,
        "priority_dedup": """
            SELECT doc_id FROM (
              SELECT doc_id, ROW_NUMBER() OVER (
                       PARTITION BY text
                       ORDER BY doc_id % 3 DESC, doc_id ASC) AS rn
              FROM documents) WHERE rn = 1
            ORDER BY doc_id
        """,
        "longest_streak_by_user": """
            WITH d AS (SELECT DISTINCT user_id,
                         CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day
                       FROM events),
            g AS (SELECT user_id, day,
                    day - ROW_NUMBER() OVER (PARTITION BY user_id
                                             ORDER BY day) AS grp
                  FROM d),
            runs AS (SELECT user_id, grp, COUNT(*) AS len
                     FROM g GROUP BY 1, 2),
            nd AS (SELECT user_id, COUNT(*) AS n_days FROM d GROUP BY 1),
            ls AS (SELECT user_id, MAX(len) AS longest_streak
                   FROM runs GROUP BY 1)
            SELECT nd.user_id, CAST(nd.n_days AS BIGINT) AS n_days,
                   CAST(ls.longest_streak AS BIGINT) AS longest_streak
            FROM nd JOIN ls USING (user_id) ORDER BY user_id
        """,
        "hard_negative_mining": """
            WITH q AS (
              SELECT vec_id AS query_id, label AS q_label,
                     CAST(embedding AS DOUBLE[]) AS emb
              FROM embeddings ORDER BY vec_id LIMIT 3
            ),
            scored AS (
              SELECT q.query_id, e.vec_id,
                     list_cosine_similarity(q.emb,
                       CAST(e.embedding AS DOUBLE[])) AS sim
              FROM q CROSS JOIN embeddings e
              WHERE e.label <> q.q_label AND e.vec_id <> q.query_id
            ),
            ranked AS (
              SELECT query_id, vec_id, sim,
                     row_number() OVER (PARTITION BY query_id
                                        ORDER BY sim DESC, vec_id) AS rk
              FROM scored
            )
            SELECT query_id, vec_id, round(sim, 6) AS score
            FROM ranked WHERE rk <= 5
        """,
        # centroid = per-label SUM of half-rounded fixed-point values
        # (integer-exact, order-free); cosine is scale-invariant so the SUM
        # vector scores identically to the mean — no division needed
        "nearest_centroid_eval": """
            WITH ql AS (
              SELECT label AS c_label, i,
                     SUM(CAST(-floor(-(CAST(e AS DOUBLE) * 1048576) + 0.5)
                              AS BIGINT)) AS s
              FROM (SELECT label, unnest(embedding) AS e,
                           generate_subscripts(embedding, 1) AS i
                    FROM embeddings)
              GROUP BY 1, 2),
            cent AS (SELECT c_label,
                            list(CAST(s AS DOUBLE) ORDER BY i) AS cv
                     FROM ql GROUP BY 1),
            scored AS (
              SELECT e.vec_id, e.label, c.c_label,
                     list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                            c.cv) AS sim
              FROM embeddings e CROSS JOIN cent c),
            pick AS (
              SELECT vec_id, label, c_label,
                     row_number() OVER (PARTITION BY vec_id
                                        ORDER BY sim DESC, c_label) AS rk
              FROM scored)
            SELECT CAST(label AS BIGINT) AS true_label,
                   CAST(c_label AS BIGINT) AS pred_label,
                   COUNT(*) AS n
            FROM pick WHERE rk = 1 GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "span_corruption_stats": """
            WITH plan AS (
              SELECT source,
                     LEAST(GREATEST(CAST(floor(n * 0.15 + 0.5) AS BIGINT),
                                    1), n - 1) AS noise, n
              FROM (SELECT source,
                           CAST(len(regexp_extract_all(text, '\\S+'))
                                AS BIGINT) AS n
                    FROM documents)
              WHERE n >= 2),
            p2 AS (
              SELECT source, n, noise,
                     GREATEST(CAST(floor(noise / 3.0 + 0.5) AS BIGINT), 1)
                       AS spans
              FROM plan),
            p3 AS (
              SELECT source, spans,
                     n - noise + spans + 1 AS input_len,
                     noise + spans + 1 AS target_len
              FROM p2)
            SELECT source, COUNT(*) AS n_docs,
                   CAST(SUM(input_len) AS BIGINT) AS sum_input_tokens,
                   CAST(SUM(target_len) AS BIGINT) AS sum_target_tokens,
                   CAST(SUM(spans) AS BIGINT) AS sum_spans,
                   CAST(SUM((input_len + 511) // 512) AS BIGINT) AS seqs
            FROM p3 GROUP BY 1 ORDER BY 1
        """,
        # re-derives every 3-word window as a STRING (engine uses the 64-bit
        # rolling hash; collision odds in substrdedup module header)
        "source_overlap_matrix": """
            WITH toks AS (
              SELECT source,
                     regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
              FROM documents),
            win AS (
              SELECT DISTINCT source,
                     unnest(list_transform(
                       generate_series(1, len(ts) - 2),
                       j -> ts[j] || ' ' || ts[j + 1] || ' ' || ts[j + 2]))
                       AS w
              FROM toks)
            SELECT a.source AS src_a, b.source AS src_b,
                   COUNT(*) AS n_shared
            FROM win a JOIN win b ON a.w = b.w AND a.source < b.source
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "rfm_user_segments": """
            WITH u AS (
              SELECT user_id,
                     MAX(epoch_us(ts)) AS last_ts_us,
                     CAST(COUNT(*) AS BIGINT) AS frequency,
                     CAST(SUM(CASE WHEN value >= 0
                              THEN CAST(floor(value * 100 + 0.5) AS BIGINT)
                              ELSE -CAST(floor(-value * 100 + 0.5) AS BIGINT)
                              END) AS BIGINT) AS m_cents
              FROM events GROUP BY 1),
            mx AS (SELECT MAX(last_ts_us) AS mts FROM u),
            s AS (
              SELECT u.user_id, u.frequency, u.m_cents,
                     CAST((mx.mts - u.last_ts_us) // 86400000000 AS BIGINT)
                       AS recency_days,
                     CAST(NTILE(5) OVER (ORDER BY u.last_ts_us DESC,
                                         u.user_id) AS BIGINT) AS r_score,
                     CAST(NTILE(5) OVER (ORDER BY u.frequency DESC,
                                         u.user_id) AS BIGINT) AS f_score,
                     CAST(NTILE(5) OVER (ORDER BY u.m_cents DESC,
                                         u.user_id) AS BIGINT) AS m_score
              FROM u CROSS JOIN mx)
            SELECT user_id, recency_days, frequency, m_cents,
                   r_score, f_score, m_score,
                   r_score * 100 + f_score * 10 + m_score AS rfm
            FROM s ORDER BY user_id
        """,
        "k_anonymity_audit": """
            WITH cls AS (SELECT lang, source, COUNT(*) AS n
                         FROM documents GROUP BY 1, 2)
            SELECT CAST(SUM(n) AS BIGINT) AS n_rows,
                   COUNT(*) AS n_classes,
                   CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
                     AS n_unsafe_classes,
                   CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
                     AS n_unsafe_rows,
                   CAST(MIN(n) AS BIGINT) AS min_class_size
            FROM cls
        """,
        "knn_ndcg_eval": """
            WITH q AS (
              SELECT vec_id AS qid, label AS qlab,
                     CAST(embedding AS DOUBLE[]) AS emb
              FROM embeddings ORDER BY vec_id LIMIT 10),
            scored AS (
              SELECT q.qid, q.qlab, e.vec_id, e.label,
                     list_cosine_similarity(q.emb,
                       CAST(e.embedding AS DOUBLE[])) AS sim
              FROM q CROSS JOIN embeddings e WHERE e.vec_id <> q.qid),
            ranked AS (
              SELECT qid, qlab, label,
                     row_number() OVER (PARTITION BY qid
                                        ORDER BY sim DESC, vec_id) AS rk
              FROM scored),
            dcg AS (
              SELECT qid, SUM(CASE WHEN label = qlab
                              THEN 1.0 / log2(rk + 1) ELSE 0 END) AS dcg
              FROM ranked WHERE rk <= 10 GROUP BY 1),
            cnt AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1),
            idcg AS (
              SELECT q.qid, SUM(1.0 / log2(s.i + 1)) AS idcg
              FROM q JOIN cnt c ON c.label = q.qlab
              CROSS JOIN (SELECT unnest(generate_series(1, 10)) AS i) s
              WHERE s.i <= LEAST(10, c.n - 1) GROUP BY q.qid)
            SELECT d.qid AS query_id, round(d.dcg / i.idcg, 6) AS ndcg
            FROM dcg d JOIN idcg i USING (qid) ORDER BY 1
        """,
        "padding_efficiency": """
            WITH n AS (
              SELECT LEAST(len(regexp_extract_all(text, '\\S+')), 512) AS n
              FROM documents),
            b AS (SELECT n, CAST(ceil(n / 16.0) * 16 AS BIGINT)
                       AS bucket_len FROM n WHERE n > 0)
            SELECT bucket_len, COUNT(*) AS n_docs,
                   CAST(SUM(n) AS BIGINT) AS sum_tokens,
                   CAST(SUM(bucket_len - n) AS BIGINT) AS sum_padding
            FROM b GROUP BY 1 ORDER BY 1
        """,
        "stratified_split": """
            WITH r AS (
              SELECT lang, doc_id,
                     ROW_NUMBER() OVER (PARTITION BY lang
                                        ORDER BY doc_id) - 1 AS rk,
                     COUNT(*) OVER (PARTITION BY lang) AS n
              FROM documents)
            SELECT lang,
                   CASE WHEN rk * 10 < n * 8 THEN 'train'
                        WHEN rk * 10 < n * 9 THEN 'val'
                        ELSE 'test' END AS split,
                   COUNT(*) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS id_sum
            FROM r GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "top_quartile_by_lang": """
            WITH r AS (
              SELECT lang, doc_id, n_chars,
                     ROW_NUMBER() OVER (PARTITION BY lang
                       ORDER BY n_chars DESC, doc_id) - 1 AS rk,
                     COUNT(*) OVER (PARTITION BY lang) AS n
              FROM documents)
            SELECT lang, COUNT(*) AS n_docs,
                   CAST(SUM(doc_id) AS BIGINT) AS id_sum,
                   CAST(SUM(n_chars) AS BIGINT) AS chars_sum
            FROM r WHERE rk * 4 < n GROUP BY 1 ORDER BY 1
        """,
        "value_band_pairs": """
            WITH q AS (
              SELECT event_id,
                     CASE WHEN value >= 0
                          THEN CAST(floor(value * 1000 + 0.5) AS BIGINT)
                          ELSE -CAST(floor(-value * 1000 + 0.5) AS BIGINT)
                     END AS qv
              FROM events)
            SELECT a.event_id AS id_a, b.event_id AS id_b,
                   a.qv AS q_a, b.qv AS q_b
            FROM q a JOIN q b
              ON b.qv BETWEEN a.qv - 1 AND a.qv + 1
             AND a.event_id < b.event_id
            ORDER BY 1, 2
        """,
        "percent_rank_by_type": """
            SELECT event_id,
                   round(PERCENT_RANK() OVER (PARTITION BY event_type
                         ORDER BY value, event_id), 9) AS pct_rank
            FROM events ORDER BY event_id
        """,
        "q10_returned_revenue": """
            WITH rev AS (
              SELECT l_orderkey,
                     CAST(SUM(CAST(round(l_extendedprice * (1 - l_discount)
                                         * 10000) AS BIGINT)) AS BIGINT)
                       AS rev_i4
              FROM lineitem WHERE l_returnflag = 'R' GROUP BY 1)
            SELECT c_custkey, c_name, n_name,
                   CAST(SUM(rev_i4) AS BIGINT) AS revenue_i4
            FROM rev
            JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            JOIN nation ON c_nationkey = n_nationkey
            WHERE o_orderdate >= TIMESTAMP '1996-01-01'
              AND o_orderdate <  TIMESTAMP '1996-04-01'
            GROUP BY 1, 2, 3
            ORDER BY revenue_i4 DESC, c_custkey LIMIT 20
        """,
        "q18_big_orders": """
            WITH q AS (
              SELECT l_orderkey,
                     CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT))
                          AS BIGINT) AS qty_i2
              FROM lineitem GROUP BY 1)
            SELECT o_orderkey, o_custkey,
                   CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)
                     AS totalprice_i2,
                   qty_i2
            FROM orders JOIN q ON o_orderkey = l_orderkey
            WHERE qty_i2 > 25000
            ORDER BY qty_i2 DESC, o_orderkey LIMIT 100
        """,
        "daily_autocorr": """
            WITH d AS (
              SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                     CAST(COUNT(*) AS BIGINT) AS n
              FROM events GROUP BY 1),
            p AS (SELECT n, LAG(n) OVER (ORDER BY day) AS pn FROM d),
            s AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                         CAST(SUM(n) AS BIGINT) AS sx,
                         CAST(SUM(pn) AS BIGINT) AS sy,
                         CAST(SUM(n * pn) AS BIGINT) AS sxy,
                         CAST(SUM(n * n) AS BIGINT) AS sxx,
                         CAST(SUM(pn * pn) AS BIGINT) AS syy
                  FROM p WHERE pn IS NOT NULL)
            SELECT ROUND(CAST(k * sxy - sx * sy AS DOUBLE)
                         / sqrt(CAST(k * sxx - sx * sx AS DOUBLE)
                                * CAST(k * syy - sy * sy AS DOUBLE)), 9)
                     AS autocorr_lag1
            FROM s
        """,
        "first_touch_revenue": """
            WITH r AS (
              SELECT user_id, event_type,
                     ROW_NUMBER() OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id) AS rn
              FROM events),
            f AS (SELECT user_id, event_type AS first_type FROM r
                  WHERE rn = 1),
            p AS (SELECT user_id,
                         CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
                  FROM events WHERE event_type = 'purchase')
            SELECT first_type, CAST(COUNT(*) AS BIGINT) AS n_purchases,
                   CAST(SUM(v) AS BIGINT) AS revenue_i2
            FROM p JOIN f USING (user_id)
            GROUP BY 1 ORDER BY 1
        """,
        "pmi_bigrams": """
            WITH w AS (SELECT doc_id,
                         regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
                       FROM documents),
            b AS (SELECT unnest(list_transform(
                    generate_series(1, len(ws) - 1),
                    i -> ws[i] || ' ' || ws[i + 1])) AS bigram FROM w),
            bc AS (SELECT bigram, CAST(COUNT(*) AS BIGINT) AS n_ab
                   FROM b GROUP BY 1),
            u AS (SELECT unnest(ws) AS tok FROM w),
            uc AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n
                   FROM u GROUP BY 1),
            tot AS (SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS nb,
                           (SELECT CAST(COUNT(*) AS BIGINT) FROM u) AS nu)
            SELECT bigram, n_ab,
                   ROUND(ln((CAST(n_ab AS DOUBLE) * nu * nu)
                            / (CAST(nb AS DOUBLE) * ca.n * cb.n)), 9) AS pmi
            FROM bc, tot, uc ca, uc cb
            WHERE ca.tok = split_part(bigram, ' ', 1)
              AND cb.tok = split_part(bigram, ' ', 2)
              AND n_ab >= 20
            ORDER BY pmi DESC, bigram LIMIT 50
        """,
        "welch_ttest_value": """
            WITH q AS (
              SELECT event_type,
                     CAST(floor(value * 1000 + 0.5) AS BIGINT) AS qv
              FROM events WHERE event_type IN ('purchase', 'view')),
            s AS (
              SELECT CAST(COUNT(*) FILTER (event_type = 'purchase')
                          AS BIGINT) AS n1,
                     CAST(SUM(qv) FILTER (event_type = 'purchase')
                          AS DOUBLE) AS s1,
                     CAST(SUM(qv * qv) FILTER (event_type = 'purchase')
                          AS DOUBLE) AS ss1,
                     CAST(COUNT(*) FILTER (event_type = 'view')
                          AS BIGINT) AS n2,
                     CAST(SUM(qv) FILTER (event_type = 'view')
                          AS DOUBLE) AS s2,
                     CAST(SUM(qv * qv) FILTER (event_type = 'view')
                          AS DOUBLE) AS ss2
              FROM q),
            m AS (
              SELECT n1, n2,
                     s1 / n1 / 1000.0 AS m1, s2 / n2 / 1000.0 AS m2,
                     (ss1 - s1 * s1 / n1) / (n1 - 1) / 1000000.0 AS v1,
                     (ss2 - s2 * s2 / n2) / (n2 - 1) / 1000000.0 AS v2
              FROM s),
            f AS (SELECT n1, n2, m1, m2, v1, v2,
                         v1 / n1 + v2 / n2 AS se2 FROM m)
            SELECT n1 AS n_purchase, n2 AS n_view,
                   ROUND(m1 - m2, 9) AS mean_diff,
                   ROUND((m1 - m2) / sqrt(se2), 9) AS t_stat,
                   ROUND(se2 * se2 / ((v1 / n1) * (v1 / n1) / (n1 - 1)
                         + (v2 / n2) * (v2 / n2) / (n2 - 1)), 9) AS df
            FROM f
        """,
        "dup_cluster_sizes": """
            WITH c AS (SELECT text, CAST(COUNT(*) AS BIGINT) AS cluster_size
                       FROM documents GROUP BY 1)
            SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters
            FROM c GROUP BY 1 ORDER BY 1
        """,
        "logprob_deciles_by_source": """
            WITH toks AS (SELECT doc_id,
                            unnest(regexp_extract_all(lower(text),
                                                      '[a-z0-9]+')) AS token
                          FROM documents),
            cnt AS (SELECT token, count(*) AS c FROM toks GROUP BY token),
            tot AS (SELECT count(*) AS n FROM toks),
            lp AS (SELECT token,
                          CAST(-floor(-ln(c * 1.0 / (SELECT n FROM tot))
                                       * 1000000 + 0.5) AS BIGINT) AS micro
                   FROM cnt),
            dlp AS (SELECT t.doc_id, count(*) AS n_tokens,
                           CAST(sum(lp.micro) AS BIGINT) AS lp_micro
                    FROM toks t JOIN lp USING (token) GROUP BY 1),
            sc AS (SELECT doc_id,
                          CAST(floor(lp_micro * 1000.0 / n_tokens + 0.5)
                               AS BIGINT) AS score
                   FROM dlp),
            nt AS (SELECT doc_id,
                          CAST(NTILE(10) OVER (ORDER BY score, doc_id)
                               AS BIGINT) AS decile
                   FROM sc)
            SELECT source, decile, CAST(COUNT(*) AS BIGINT) AS n_docs
            FROM nt JOIN documents USING (doc_id)
            GROUP BY 1, 2 ORDER BY 1, 2
        """,
        "containment_pairs": """
            WITH toks AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
                          FROM documents),
            win AS (SELECT DISTINCT doc_id,
                      unnest(list_transform(
                        generate_series(1, len(ts) - 2),
                        j -> ts[j] || ' ' || ts[j + 1] || ' ' || ts[j + 2]))
                        AS w
                    FROM toks),
            wc AS (SELECT w, COUNT(*) AS c FROM win GROUP BY 1),
            rare AS (SELECT win.doc_id, win.w FROM win JOIN wc USING (w)
                     WHERE c BETWEEN 2 AND 8),
            nw AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                   FROM (SELECT win.doc_id, win.w FROM win
                         JOIN wc USING (w) WHERE c <= 8)
                   GROUP BY 1),
            pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                             CAST(COUNT(*) AS BIGINT) AS shared
                      FROM rare a JOIN rare b
                        ON a.w = b.w AND a.doc_id < b.doc_id
                      GROUP BY 1, 2)
            SELECT id_a, id_b, shared,
                   LEAST(na.n, nb.n) AS min_windows
            FROM pairs
            JOIN nw na ON id_a = na.doc_id
            JOIN nw nb ON id_b = nb.doc_id
            WHERE shared * 4 >= LEAST(na.n, nb.n)
            ORDER BY 1, 2
        """,
        "revenue_share_rank": """
            WITH a AS (
              SELECT r_name, n_name,
                     CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5)
                                   AS BIGINT)) AS BIGINT) AS revenue_i2
              FROM orders
              JOIN customer ON o_custkey = c_custkey
              JOIN nation ON c_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
              GROUP BY 1, 2)
            SELECT r_name, n_name, revenue_i2,
                   ROUND(CAST(revenue_i2 AS DOUBLE)
                         / CAST(SUM(revenue_i2) OVER (PARTITION BY r_name)
                                AS DOUBLE), 9) AS share,
                   CAST(RANK() OVER (PARTITION BY r_name
                        ORDER BY revenue_i2 DESC, n_name) AS BIGINT) AS rnk
            FROM a ORDER BY r_name, rnk
        """,
        "set_jaccard_pairs": """
            WITH toks AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
                          FROM documents),
            sh AS (SELECT DISTINCT doc_id,
                     unnest(list_transform(
                       generate_series(1, len(ts) - 4),
                       j -> ts[j] || ' ' || ts[j + 1] || ' ' || ts[j + 2]
                            || ' ' || ts[j + 3] || ' ' || ts[j + 4])) AS w
                   FROM toks),
            n AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n
                  FROM sh GROUP BY 1),
            i AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
                         CAST(COUNT(*) AS BIGINT) AS shared
                  FROM sh a JOIN sh b
                    ON a.w = b.w AND a.doc_id < b.doc_id
                  GROUP BY 1, 2)
            SELECT id_a, id_b, shared,
                   na.n + nb.n - shared AS union_size
            FROM i
            JOIN n na ON id_a = na.doc_id
            JOIN n nb ON id_b = nb.doc_id
            WHERE 2 * shared >= na.n + nb.n - shared
            ORDER BY 1, 2
        """,
        "bfs_hops_embeddings": """
            WITH RECURSIVE q AS (SELECT vec_id,
                         unnest(generate_series(1, len(embedding))) - 1 AS i,
                         CAST(-floor(-(CAST(unnest(embedding) AS DOUBLE)
                                       * 1048576) + 0.5) AS BIGINT) AS qv
                       FROM embeddings WHERE vec_id < 400),
            s AS (SELECT a.vec_id AS u, b.vec_id AS v,
                         SUM(a.qv * b.qv) AS sim
                  FROM q a JOIN q b ON a.i = b.i AND a.vec_id < b.vec_id
                  GROUP BY 1, 2),
            e AS (SELECT u, v FROM s WHERE sim >= 274877906944),
            e2 AS (SELECT u, v FROM e UNION ALL SELECT v, u FROM e),
            bfs AS (
              SELECT vec_id AS node, 0 AS hop FROM embeddings
              WHERE vec_id < 5
              UNION
              SELECT e2.v, bfs.hop + 1 FROM bfs JOIN e2 ON e2.u = bfs.node
              WHERE bfs.hop < 4)
            SELECT node, CAST(MIN(hop) AS BIGINT) AS hop
            FROM bfs GROUP BY 1 ORDER BY 1
        """,
        "pareto_front_orders": """
            WITH p AS (SELECT CAST(floor(o_totalprice * 100 + 0.5)
                              AS BIGINT) AS tp,
                              CAST(epoch_us(o_orderdate) // 86400000000
                              AS BIGINT) AS dt
                       FROM orders),
            m AS (SELECT tp, MAX(dt) AS dt FROM p GROUP BY 1),
            s AS (SELECT tp, dt,
                         MAX(dt) OVER (ORDER BY tp DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS mx
                  FROM m)
            SELECT tp AS totalprice_i2, dt AS order_day
            FROM s WHERE mx IS NULL OR dt > mx ORDER BY 1
        """,
        "daily_ohlc": """
            WITH e AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                              AS day, ts, event_id, value
                       FROM events),
            r AS (SELECT day, value,
                         ROW_NUMBER() OVER (PARTITION BY day
                           ORDER BY ts, event_id) AS rn,
                         ROW_NUMBER() OVER (PARTITION BY day
                           ORDER BY ts DESC, event_id DESC) AS rn2
                  FROM e)
            SELECT day,
                   MAX(CASE WHEN rn = 1 THEN value END) AS open,
                   MAX(value) AS high,
                   MIN(value) AS low,
                   MAX(CASE WHEN rn2 = 1 THEN value END) AS close,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CAST(floor(value * 1000 + 0.5) AS BIGINT))
                        AS BIGINT) AS vol_q
            FROM r GROUP BY 1 ORDER BY 1
        """,
        "events_fingerprint": """
            WITH q AS (SELECT CAST(event_id AS HUGEINT) AS e,
                              CAST(user_id AS HUGEINT) AS u,
                              CAST(floor(value * 1000 + 0.5) AS HUGEINT)
                                AS v
                       FROM events),
            s AS (SELECT ((SUM(e * 11400714819323198485
                              + v * 14029467366897019727
                              + u * 1609587929392839161)
                           % 18446744073709551616)
                          + 18446744073709551616)
                           % 18446744073709551616 AS d
                  FROM q)
            SELECT CAST(d // 4294967296 AS BIGINT) AS digest_hi,
                   CAST(d % 4294967296 AS BIGINT) AS digest_lo
            FROM s
        """,
        "user_churn_daily": """
            WITH du AS (SELECT DISTINCT
                          CAST(epoch_us(ts) // 86400000000 AS BIGINT) AS day,
                          user_id
                        FROM events),
            f AS (SELECT day, user_id, 1 AS fl FROM du
                  UNION ALL
                  SELECT day + 1, user_id, 2 FROM du),
            g AS (SELECT day, user_id, SUM(fl) AS s FROM f GROUP BY 1, 2)
            SELECT day,
                   CAST(COUNT(*) FILTER (s = 3) AS BIGINT) AS retained,
                   CAST(COUNT(*) FILTER (s = 1) AS BIGINT) AS new_users,
                   CAST(COUNT(*) FILTER (s = 2) AS BIGINT) AS churned
            FROM g GROUP BY 1 ORDER BY 1
        """,
        "pq_codes": """
            WITH q AS (SELECT vec_id,
                         unnest(generate_series(1, len(embedding))) - 1 AS i,
                         CAST(-floor(-(CAST(unnest(embedding) AS DOUBLE)
                                       * 1048576) + 0.5) AS BIGINT) AS qv
                       FROM embeddings),
            cb AS (SELECT vec_id AS cid, i, qv AS cv FROM q
                   WHERE vec_id < 8),
            d AS (SELECT q.vec_id, q.i // 16 AS sub, cb.cid,
                         (q.qv - cb.cv) * (q.qv - cb.cv) AS sq
                  FROM q JOIN cb ON q.i = cb.i),
            ds AS (SELECT vec_id, sub, cid, SUM(sq) AS dist
                   FROM d GROUP BY 1, 2, 3),
            r AS (SELECT vec_id, sub, cid,
                         ROW_NUMBER() OVER (PARTITION BY vec_id, sub
                           ORDER BY dist, cid) AS rn
                  FROM ds)
            SELECT vec_id,
                   CAST(MAX(CASE WHEN sub = 0 THEN cid END) AS BIGINT)
                     AS code0,
                   CAST(MAX(CASE WHEN sub = 1 THEN cid END) AS BIGINT)
                     AS code1,
                   CAST(MAX(CASE WHEN sub = 2 THEN cid END) AS BIGINT)
                     AS code2,
                   CAST(MAX(CASE WHEN sub = 3 THEN cid END) AS BIGINT)
                     AS code3
            FROM r WHERE rn = 1
            GROUP BY 1 ORDER BY 1
        """,
        "weekday_residuals": """
            WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                              AS day,
                              CAST(SUM(CAST(floor(value * 1000 + 0.5)
                                            AS BIGINT)) AS BIGINT)
                                AS total_i3
                       FROM events GROUP BY 1),
            w AS (SELECT day, day % 7 AS weekday, total_i3,
                         CAST(SUM(total_i3) OVER (PARTITION BY day % 7)
                              AS DOUBLE)
                         / COUNT(*) OVER (PARTITION BY day % 7) AS mean
                  FROM d)
            SELECT day, weekday, total_i3,
                   ROUND((CAST(total_i3 AS DOUBLE) - mean) / mean, 9)
                     AS resid
            FROM w ORDER BY day
        """,
        "proportional_budget_sample": """
            WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n
                       FROM documents GROUP BY 1),
            t AS (SELECT SUM(n) AS tot FROM c),
            q AS (SELECT source, n,
                         (137 * n) // tot AS fl, (137 * n) % tot AS rem
                  FROM c, t),
            lv AS (SELECT 137 - SUM(fl) AS extra FROM q),
            r AS (SELECT source, fl,
                         RANK() OVER (ORDER BY rem DESC, source) AS rk
                  FROM q),
            qq AS (SELECT source,
                          fl + CASE WHEN rk <= (SELECT extra FROM lv)
                               THEN 1 ELSE 0 END AS quota
                   FROM r),
            s AS (SELECT doc_id, source,
                         ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY doc_id) AS rn
                  FROM documents)
            SELECT s.doc_id, s.source
            FROM s JOIN qq USING (source)
            WHERE rn <= quota ORDER BY doc_id
        """,
        "mannwhitney_value": """
            WITH q AS (SELECT event_type,
                              CAST(floor(value * 1000 + 0.5) AS BIGINT)
                                AS qv
                       FROM events
                       WHERE event_type IN ('purchase', 'view')),
            c AS (SELECT qv,
                         CAST(COUNT(*) FILTER (event_type = 'purchase')
                              AS BIGINT) AS n1,
                         CAST(COUNT(*) FILTER (event_type = 'view')
                              AS BIGINT) AS n2
                  FROM q GROUP BY 1),
            w AS (SELECT qv, n1, n2,
                         COALESCE(SUM(n2) OVER (ORDER BY qv
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING), 0) AS less2
                  FROM c),
            s AS (SELECT SUM(n1) AS tn1, SUM(n2) AS tn2,
                         SUM(2 * n1 * less2 + n1 * n2) AS u2,
                         SUM((n1 + n2) * (n1 + n2) * (n1 + n2)
                             - (n1 + n2)) AS tie
                  FROM w)
            SELECT CAST(u2 AS BIGINT) AS u2x,
                   ROUND((CAST(u2 AS DOUBLE) / 2
                          - CAST(tn1 * tn2 AS DOUBLE) / 2)
                         / sqrt(CAST(tn1 * tn2 AS DOUBLE) / 12
                                * ((tn1 + tn2 + 1)
                                   - CAST(tie AS DOUBLE)
                                     / ((tn1 + tn2) * (tn1 + tn2 - 1)))),
                         9) AS z
            FROM s
        """,
        "third_purchase_ts": """
            WITH r AS (SELECT user_id, epoch_us(ts) AS ts_us,
                              ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS rn
                       FROM events WHERE event_type = 'purchase')
            SELECT user_id, CAST(ts_us AS BIGINT) AS third_ts_us
            FROM r WHERE rn = 3 ORDER BY user_id
        """,
        "interval_coverage": """
            WITH iv AS (SELECT user_id, epoch_us(ts) AS s,
                               epoch_us(ts) + 300000000 AS e
                        FROM events),
            m AS (SELECT user_id, s, e,
                         MAX(e) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND 1 PRECEDING) AS pm
                  FROM iv),
            i AS (SELECT user_id, s, e,
                         CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END
                           AS brk
                  FROM m),
            g AS (SELECT user_id, s, e,
                         SUM(brk) OVER (PARTITION BY user_id ORDER BY s, e
                           ROWS UNBOUNDED PRECEDING) AS isl
                  FROM i),
            l AS (SELECT user_id, isl, MAX(e) - MIN(s) AS len
                  FROM g GROUP BY 1, 2)
            SELECT user_id, CAST(SUM(len) AS BIGINT) AS covered_us,
                   CAST(COUNT(*) AS BIGINT) AS n_islands
            FROM l GROUP BY 1 ORDER BY 1
        """,
        "top_dims_per_vector": """
            WITH q AS (SELECT vec_id,
                         unnest(generate_series(1, len(embedding))) - 1 AS i,
                         ABS(CAST(-floor(-(CAST(unnest(embedding) AS DOUBLE)
                                       * 1048576) + 0.5) AS BIGINT)) AS aq
                       FROM embeddings),
            r AS (SELECT vec_id, i,
                         ROW_NUMBER() OVER (PARTITION BY vec_id
                           ORDER BY aq DESC, i) AS rn
                  FROM q)
            SELECT vec_id,
                   CAST(MAX(CASE WHEN rn = 1 THEN i END) AS BIGINT) AS d0,
                   CAST(MAX(CASE WHEN rn = 2 THEN i END) AS BIGINT) AS d1,
                   CAST(MAX(CASE WHEN rn = 3 THEN i END) AS BIGINT) AS d2
            FROM r WHERE rn <= 3 GROUP BY 1 ORDER BY 1
        """,
        "reciprocal_topk_pairs": """
            WITH q AS (SELECT vec_id,
                         unnest(generate_series(1, len(embedding))) - 1 AS i,
                         CAST(-floor(-(CAST(unnest(embedding) AS DOUBLE)
                                       * 1048576) + 0.5) AS BIGINT) AS qv
                       FROM embeddings WHERE vec_id < 400),
            s AS (SELECT a.vec_id AS u, b.vec_id AS v,
                         SUM(a.qv * b.qv) AS sim
                  FROM q a JOIN q b ON a.i = b.i AND a.vec_id <> b.vec_id
                  GROUP BY 1, 2),
            r AS (SELECT u, v,
                         ROW_NUMBER() OVER (PARTITION BY u
                           ORDER BY sim DESC, v) AS rn
                  FROM s),
            e AS (SELECT u, v FROM r WHERE rn <= 3)
            SELECT LEAST(u, v) AS id_a, GREATEST(u, v) AS id_b
            FROM e GROUP BY 1, 2 HAVING COUNT(*) = 2
            ORDER BY 1, 2
        """,
        "lang_majority_mismatch": """
            WITH c AS (SELECT source, lang, COUNT(*) AS n
                       FROM documents GROUP BY 1, 2),
            m AS (SELECT source, lang AS maj,
                         ROW_NUMBER() OVER (PARTITION BY source
                           ORDER BY n DESC, lang) AS rn
                  FROM c)
            SELECT doc_id, d.source, d.lang
            FROM documents d
            JOIN m ON d.source = m.source AND m.rn = 1
            WHERE d.lang <> m.maj
            ORDER BY doc_id
        """,
        "dup_window_profile": """
            WITH toks AS (SELECT doc_id,
                            regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
                          FROM documents),
            w4 AS (SELECT DISTINCT doc_id, unnest(list_transform(
                     generate_series(1, len(ts) - 3),
                     j -> list_aggregate(ts[j:j+3], 'string_agg', ' ')))
                     AS w FROM toks),
            w8 AS (SELECT DISTINCT doc_id, unnest(list_transform(
                     generate_series(1, len(ts) - 7),
                     j -> list_aggregate(ts[j:j+7], 'string_agg', ' ')))
                     AS w FROM toks),
            w16 AS (SELECT DISTINCT doc_id, unnest(list_transform(
                      generate_series(1, len(ts) - 15),
                      j -> list_aggregate(ts[j:j+15], 'string_agg', ' ')))
                      AS w FROM toks),
            w32 AS (SELECT DISTINCT doc_id, unnest(list_transform(
                      generate_series(1, len(ts) - 31),
                      j -> list_aggregate(ts[j:j+31], 'string_agg', ' ')))
                      AS w FROM toks),
            c AS (
              SELECT 4 AS k, w FROM w4 GROUP BY w HAVING COUNT(*) >= 2
              UNION ALL
              SELECT 8, w FROM w8 GROUP BY w HAVING COUNT(*) >= 2
              UNION ALL
              SELECT 16, w FROM w16 GROUP BY w HAVING COUNT(*) >= 2
              UNION ALL
              SELECT 32, w FROM w32 GROUP BY w HAVING COUNT(*) >= 2),
            agg AS (SELECT k, CAST(COUNT(*) AS BIGINT) AS n
                    FROM c GROUP BY 1)
            SELECT CAST(ks.k AS BIGINT) AS k,
                   CAST(COALESCE(agg.n, 0) AS BIGINT) AS n_dup_windows
            FROM (VALUES (4), (8), (16), (32)) ks(k)
            LEFT JOIN agg ON ks.k = agg.k
            ORDER BY 1
        """,
        "bounce_rate_daily": """
            WITH iv AS (SELECT user_id, epoch_us(ts) AS s_us,
                               epoch_us(ts) + 1800000000 AS e_us
                        FROM events),
            flagged AS (
              SELECT user_id, s_us, e_us,
                     CASE WHEN s_us > COALESCE(MAX(e_us) OVER (
                            PARTITION BY user_id ORDER BY s_us, e_us
                            ROWS BETWEEN UNBOUNDED PRECEDING
                            AND 1 PRECEDING), s_us - 1)
                          THEN 1 ELSE 0 END AS brk
              FROM iv),
            grouped AS (
              SELECT *, SUM(brk) OVER (PARTITION BY user_id
                                       ORDER BY s_us, e_us
                                       ROWS UNBOUNDED PRECEDING) AS island
              FROM flagged),
            sess AS (SELECT user_id, island, MIN(s_us) AS s_us,
                            COUNT(*) AS n FROM grouped GROUP BY 1, 2),
            d AS (SELECT s_us // 86400000000 AS day,
                         CASE WHEN n = 1 THEN 1 ELSE 0 END AS b
                  FROM sess)
            SELECT CAST(day AS BIGINT) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n_sessions,
                   CAST(SUM(b) AS BIGINT) AS n_bounces,
                   ROUND(CAST(SUM(b) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE), 9) AS bounce_rate
            FROM d GROUP BY 1 ORDER BY 1
        """,
        "acf_daily": _acf_oracle(),
        "lorenz_chars": """
            WITH t AS (SELECT doc_id, n_chars,
                              CAST(NTILE(10) OVER (ORDER BY n_chars, doc_id)
                                   AS BIGINT) AS decile
                       FROM documents),
            a AS (SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
                         CAST(SUM(n_chars) AS BIGINT) AS chars
                  FROM t GROUP BY 1),
            w AS (SELECT decile, n_docs, chars,
                         CAST(SUM(chars) OVER () AS BIGINT) AS total,
                         CAST(SUM(chars) OVER (ORDER BY decile
                           ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
                  FROM a)
            SELECT decile, n_docs, chars,
                   ROUND(CAST(chars AS DOUBLE) / CAST(total AS DOUBLE), 9)
                     AS share,
                   ROUND(CAST(cum AS DOUBLE) / CAST(total AS DOUBLE), 9)
                     AS cum_share
            FROM w ORDER BY decile
        """,
        "markov_entropy_rate": """
            WITH m AS (SELECT user_id, event_type,
                         lag(event_type) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id) AS prev
                       FROM events),
            c AS (SELECT prev AS f, event_type AS t,
                         CAST(count(*) AS BIGINT) AS n
                  FROM m WHERE prev IS NOT NULL GROUP BY 1, 2),
            tot AS (SELECT CAST(SUM(n) AS BIGINT) AS N FROM c),
            rt AS (SELECT f, CAST(SUM(n) AS BIGINT) AS nf
                   FROM c GROUP BY 1)
            SELECT (SELECT N FROM tot) AS n_transitions,
                   ROUND(SUM((CAST(c.n AS DOUBLE) / (SELECT N FROM tot))
                             * ln(CAST(rt.nf AS DOUBLE)
                                  / CAST(c.n AS DOUBLE))), 9)
                     AS entropy_rate
            FROM c JOIN rt USING (f)
        """,
        "q6_forecast_revenue": """
            SELECT CAST(SUM(CAST(floor(l_extendedprice * l_discount
                                       * 10000 + 0.5) AS BIGINT))
                        AS BIGINT) AS revenue_i4
            FROM lineitem
            WHERE l_shipdate >= TIMESTAMP '1996-01-01'
              AND l_shipdate <  TIMESTAMP '1997-01-01'
              AND l_discount BETWEEN 0.05 AND 0.07
              AND l_quantity < 24
        """,
        "q14_promo_share": """
            WITH li AS (
              SELECT (year(l_shipdate) - 1970) * 12
                     + (month(l_shipdate) - 1) AS m,
                     CAST(floor(l_extendedprice * (1 - l_discount) * 10000
                                + 0.5) AS BIGINT) AS rev,
                     p_type LIKE 'PROMO%' AS isp
              FROM lineitem JOIN part ON l_partkey = p_partkey)
            SELECT CAST(m AS BIGINT) AS month_idx,
                   CAST(SUM(CASE WHEN isp THEN rev ELSE 0 END) AS BIGINT)
                     AS promo_i4,
                   CAST(SUM(rev) AS BIGINT) AS total_i4,
                   ROUND(100.0 * CAST(SUM(CASE WHEN isp THEN rev ELSE 0 END)
                                      AS DOUBLE)
                         / CAST(SUM(rev) AS DOUBLE), 9) AS promo_pct
            FROM li GROUP BY 1 ORDER BY 1
        """,
        "heaps_growth": """
            WITH mx AS (SELECT MAX(doc_id) + 1 AS d FROM documents),
            toks AS (SELECT doc_id,
                       regexp_extract_all(lower(text), '[a-z0-9]+') AS ts
                     FROM documents),
            win AS (SELECT doc_id,
                      unnest(list_transform(
                        generate_series(1, len(ts) - 2),
                        j -> ts[j] || ' ' || ts[j + 1] || ' ' || ts[j + 2]))
                        AS w
                    FROM toks),
            q AS (SELECT w,
                         MIN((doc_id * 4) // (SELECT d FROM mx)) AS qt
                  FROM win GROUP BY 1),
            c AS (SELECT qt, CAST(COUNT(*) AS BIGINT) AS new_windows
                  FROM q GROUP BY 1)
            SELECT CAST(ks.qt AS BIGINT) AS quartile,
                   CAST(COALESCE(c.new_windows, 0) AS BIGINT)
                     AS new_windows,
                   CAST(SUM(COALESCE(c.new_windows, 0)) OVER (
                        ORDER BY ks.qt ROWS UNBOUNDED PRECEDING) AS BIGINT)
                     AS cum_distinct
            FROM (VALUES (0), (1), (2), (3)) ks(qt)
            LEFT JOIN c ON ks.qt = c.qt
            ORDER BY 1
        """,
        "q19_band_revenue": """
            SELECT CAST(SUM(CAST(floor(l_extendedprice * (1 - l_discount)
                                       * 10000 + 0.5) AS BIGINT))
                        AS BIGINT) AS revenue_i4,
                   CAST(COUNT(*) AS BIGINT) AS n_lines
            FROM lineitem JOIN part ON l_partkey = p_partkey
            WHERE (p_brand = 'Brand#11' AND p_size BETWEEN 1 AND 10
                   AND l_quantity BETWEEN 1 AND 20)
               OR (p_brand = 'Brand#22' AND p_size BETWEEN 5 AND 20
                   AND l_quantity BETWEEN 10 AND 30)
        """,
        "order_concentration_gini": """
            WITH c AS (SELECT o_custkey, COUNT(*) AS n FROM orders
                       GROUP BY 1),
            r AS (SELECT n, ROW_NUMBER() OVER (ORDER BY n) AS i FROM c)
            SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
                   CAST(SUM(n) AS BIGINT) AS total,
                   round((2.0 * SUM(i * n)) / (COUNT(*) * SUM(n))
                         - (COUNT(*) + 1.0) / COUNT(*), 9) AS gini
            FROM r
        """,
    }
