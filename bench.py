#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": <headline seconds>, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., "num_cpus": N,
   "docs_per_sec": ...}

``--scaling`` runs the headline extraction pipeline twice in fresh processes
(num_cpus=8 then num_cpus=32) on the same input and reports both throughputs
plus the scaling efficiency (rate32/rate8)/4 — the sandbox evidence for the
north rule's two-cluster-size criterion (no real cluster available here).

Crash resilience (round 4): the default invocation runs the suite in a CHILD
process that checkpoints each completed stage to a JSONL state file.  If the
child dies (e.g. a Ray core-worker C++ crash like round 3's driver bench —
rc 1, no Python frame), the parent relaunches it: completed stages reuse
their recorded times, the in-flight stage is retried once, and a stage that
crashes the process twice is SKIPPED and recorded in ``skipped_stages``.  If
the child never completes, the parent still assembles and prints a partial
JSON (``"partial": true``) from the state file — a single raylet hiccup can
no longer zero the round's bench artifact.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
MAX_ATTEMPTS = 3  # child launches: 1 initial + up to 2 crash relaunches


def _sf_label(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


class StageRunner:
    """Per-stage checkpoint/retry bookkeeping for the crash guard.

    Protocol (JSONL appended to ``state_path``): a ``start`` record before a
    stage body runs, a ``done`` record (sec + extra query entries) after.
    On a resumed run: ``done`` stages are replayed from the record without
    executing; a stage with >= 2 ``start`` records and no ``done`` (i.e. it
    crashed the process twice) is skipped and recorded as such.  With
    ``state_path=None`` the runner is pure pass-through timing."""

    def __init__(self, state_path, queries: dict):
        self.state_path = state_path
        self.queries = queries
        self.done: dict = {}
        self.starts: dict = {}
        self.skipped: list = []
        if state_path and os.path.exists(state_path):
            for ln in open(state_path):
                try:
                    rec = json.loads(ln)
                except json.JSONDecodeError:
                    continue
                if rec.get("status") == "start":
                    self.starts[rec["stage"]] = self.starts.get(rec["stage"], 0) + 1
                elif rec.get("status") == "done":
                    self.done[rec["stage"]] = rec

    def _rec(self, obj: dict) -> None:
        if self.state_path:
            with open(self.state_path, "a") as f:
                f.write(json.dumps(obj) + "\n")
                f.flush()
                os.fsync(f.fileno())

    def run(self, name: str, fn, volatile: bool = False) -> None:
        """``volatile``: the stage leaves filesystem side effects a later
        stage depends on (e.g. a bucketed layout in a fresh tmpdir), so a
        resumed child must RE-EXECUTE it rather than replay its recorded
        time — otherwise the dependent stage reads a path that was never
        written this run.  Its recorded sec is overwritten (same work,
        comparable timing); skip bookkeeping is unchanged."""
        if name in self.done:
            rec = self.done[name]
            if volatile and not rec.get("skipped"):
                pass  # fall through and re-execute
            else:
                self.queries[name] = rec["sec"]
                self.queries.update(rec.get("extra", {}))
                if rec.get("skipped"):
                    self.skipped.append(name)
                return
        if self.starts.get(name, 0) >= 2:
            # this stage crashed the process twice: skip, record the skip
            self.skipped.append(name)
            self.queries[name] = None
            self._rec({"stage": name, "status": "done", "sec": None,
                       "extra": {}, "skipped": True})
            return
        self._rec({"stage": name, "status": "start"})
        t0 = time.time()
        extra = fn() or {}
        sec = extra.pop("__sec__", None)
        if sec is None:
            sec = round(time.time() - t0, 3)
        self.queries[name] = sec
        self.queries.update(extra)
        self._rec({"stage": name, "status": "done", "sec": sec, "extra": extra})


def ensure_corpus(sf_dir: str, mult: int = 10) -> tuple[str, int]:
    """Synth corpus sized to the sf documents table, cached under /tmp."""
    import glob

    import pyarrow.parquet as pq

    from insurance_pdf_extractor_ray.sources.synth import GEN_VERSION, write_corpus

    # mult x the sf documents row count: the flagship corpus needs enough
    # docs for multi-second wall-times at 32 CPUs (sf0.1 documents is only
    # 5k rows); scaling runs use 4x more so fixed actor-pool startup doesn't
    # masquerade as poor scaling
    n = mult * pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows
    out = f"/tmp/ipe_corpus/v{GEN_VERSION}-{n}"
    docs = os.path.join(out, "documents")
    if not glob.glob(os.path.join(docs, "*.parquet")):
        write_corpus(n, out, goldens=False)
    return docs, n


def run_bench(sf_dir: str, num_cpus: int, corpus_mult: int = 10,
              extract_only: bool = False, state_path=None) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
                 log_to_driver=False)  # keep stdout = the one JSON line

    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    # At bench scale (50k docs) the reassembly sort emits ~0.7 MB partition
    # blocks; Ray's map-input bundling floor (target_min_block_size, 1 MB
    # default) coalesces them into ~11 tasks and the fused merge+extract
    # stage runs 11-wide on 32 CPUs.  Lowering the floor restores full-width
    # execution (7.2 s -> 4.7 s measured).  At production block sizes
    # (>= 128 MB partitions) the floor never binds — this is harness tuning
    # for the small-corpus regime, not a library requirement.
    ray.data.DataContext.get_current().target_min_block_size = 256 * 1024

    from insurance_pdf_extractor_ray.pipelines import analytics
    from insurance_pdf_extractor_ray.pipelines.dedup import minhash_dup_ids
    from insurance_pdf_extractor_ray.pipelines.extraction import extract_pipeline
    from insurance_pdf_extractor_ray.pipelines.similarity import knn_brute_force
    from insurance_pdf_extractor_ray.pipelines.textpipe import analyze_text

    corpus, n_docs = ensure_corpus(sf_dir, corpus_mult)
    queries: dict = {}
    R = StageRunner(state_path, queries)

    # headline: flagship extraction (read -> reassembly shuffle -> extract
    # tasks); block count sized to the CPU budget for smooth wave packing.
    # Best-of-3: this sandbox VM shows vCPU steal with ±20% run-to-run
    # variance in minutes-long windows (a whole best-of-2 run can land
    # inside one), so a single trial measures the hypervisor as much as
    # the pipeline (all trials are reported).
    # 2 trials ALSO on the scaling legs: measured back-to-back identical
    # 16-CPU runs at 210 s and 74 s on this VM — single-trial scaling
    # numbers measure the hypervisor's steal schedule, not the pipeline
    # block count: 4x CPUs gives wave slack on big corpora (2M docs at 16
    # CPUs: 47.6k docs/s at 64 blocks vs 33.9k at 32 — measured), but at the
    # 50k-doc headline 128 blocks is pure per-block overhead (extract 3.8 s
    # -> 2.7 s at 64).  Floor blocks at ~5k docs each, between 2x and 4x.
    n_blocks = min(4 * num_cpus, max(2 * num_cpus, n_docs // 5000))

    def _s_extract():
        trials = []
        for _ in range(3):
            t0 = time.time()
            src = ray.data.read_parquet(corpus, override_num_blocks=n_blocks)
            n_out = extract_pipeline(src).count()
            trials.append(time.time() - t0)
            assert n_out == n_docs, (n_out, n_docs)
        return {"__sec__": round(min(trials), 3),
                "extract_trials": [round(t, 3) for t in trials]}

    R.run("extract", _s_extract)
    extract_sec = queries.get("extract")

    if extract_only:
        return {
            "metric": "flagship extraction wall-time",
            "value": extract_sec if extract_sec is not None else -1,
            "unit": "sec", "queries": queries,
            "sf": _sf_label(sf_dir), "num_cpus": num_cpus, "n_docs": n_docs,
            "docs_per_sec": (round(n_docs / extract_sec, 1)
                             if extract_sec else -1),
            "skipped_stages": R.skipped,
        }

    # adaptive shuffle avoidance (mode='auto'): detects split docs and
    # shuffles only those — reported alongside the general shuffle path.
    # Best-of-3 like the headline: same vCPU-steal variance applies.
    def _s_extract_auto():
        auto_trials = []
        for _ in range(3):
            t0 = time.time()
            # same read shape as the shuffle trials so the two modes compare
            # apples-to-apples
            src = ray.data.read_parquet(corpus, override_num_blocks=n_blocks)
            extract_pipeline(src, mode="auto").count()
            auto_trials.append(time.time() - t0)
        return {"__sec__": round(min(auto_trials), 3),
                "extract_auto_trials": [round(t, 3) for t in auto_trials]}

    R.run("extract_auto", _s_extract_auto)

    docs_path = os.path.join(sf_dir, "documents.parquet")
    events = os.path.join(sf_dir, "events.parquet")

    R.run("text_analysis", lambda: analyze_text(
        ray.data.read_parquet(docs_path),
        concurrency=(1, num_cpus)).count() and None)

    R.run("minhash_dedup", lambda: minhash_dup_ids(
        ray.data.read_parquet(docs_path), "text", "doc_id",
        threshold=0.8, concurrency=(1, num_cpus)).count() and None)

    def _s_analytics():
        analytics.global_stats(ray.data.read_parquet(events, columns=["value"]), "value")
        analytics.stats_by(ray.data.read_parquet(events, columns=["event_type", "value"]),
                           "event_type", "value").take_all()
        analytics.daily_trends(ray.data.read_parquet(events, columns=["ts", "value"]),
                               "ts", "value").take_all()
        analytics.top_k(ray.data.read_parquet(events), "value", k=10,
                        tiebreak="event_id").take_all()

    R.run("analytics", _s_analytics)

    from insurance_pdf_extractor_ray.pipelines.windows import tumbling_window

    R.run("tumbling_window", lambda: tumbling_window(
        ray.data.read_parquet(events, columns=["ts", "value"]),
        "ts", 3_600_000_000, "value").take_all() and None)

    import pyarrow as pa

    from insurance_pdf_extractor_ray.pipelines.htmlpipe import main_content

    def _s_html():
        def wrap(batch: pa.Table) -> pa.Table:
            htmls = ['<html><body><nav><a href="/">H</a> <a href="/a">A</a> <a href="/b">B</a></nav>'
                     f"<p>{t}</p><footer>&copy; 2024 X. All rights reserved.</footer></body></html>"
                     for t in batch.column("text").to_pylist()]
            return pa.table({"doc_id": batch.column("doc_id"),
                             "html": pa.array(htmls, pa.string())})

        main_content(
            ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
            .map_batches(wrap, batch_format="pyarrow"),
            "html", "doc_id",
        ).count()

    R.run("html_main_content", _s_html)

    from insurance_pdf_extractor_ray.pipelines.dedup import exact_dedup
    from insurance_pdf_extractor_ray.pipelines.textpipe import quality_filter

    R.run("exact_dedup", lambda: exact_dedup(
        ray.data.read_parquet(docs_path, columns=["doc_id", "text"]),
        "text", "doc_id").count() and None)

    R.run("quality_filter", lambda: quality_filter(
        ray.data.read_parquet(docs_path, columns=["doc_id", "text"])).count() and None)

    from insurance_pdf_extractor_ray.pipelines.joins import asof_join
    from insurance_pdf_extractor_ray.pipelines.rankagg import (
        distinct_count_by,
        grouped_top_k,
    )
    from insurance_pdf_extractor_ray.pipelines.tfidf import top_term_per_doc

    def _s_rankagg():
        grouped_top_k(ray.data.read_parquet(events, columns=["event_type", "event_id", "value"]),
                      "event_type", order_by=["value", "event_id"],
                      descending=[True, False], k=3).count()
        distinct_count_by(ray.data.read_parquet(events, columns=["event_type", "user_id"]),
                          "event_type", "user_id").count()

    R.run("rankagg", _s_rankagg)

    def _s_asof():
        def _us(batch: pa.Table) -> pa.Table:
            return pa.table({"event_id": batch.column("event_id"),
                             "user_id": batch.column("user_id"),
                             "ts_us": batch.column("ts").cast(pa.int64()),
                             "event_type": batch.column("event_type")})

        ev = ray.data.read_parquet(
            events, columns=["event_id", "user_id", "ts", "event_type"]
        ).map_batches(_us, batch_format="pyarrow")
        asof_join(ev.filter(expr="event_type != 'click'"),
                  ev.filter(expr="event_type == 'click'"),
                  by="user_id", on="ts_us", value_col="ts_us").count()

    R.run("asof_join", _s_asof)

    R.run("tfidf_top_term", lambda: top_term_per_doc(
        ray.data.read_parquet(docs_path, columns=["doc_id", "text"]),
        "text", "doc_id").count() and None)

    from insurance_pdf_extractor_ray.pipelines.packing import pack_sequences

    def _s_pack():
        def _count_tokens(batch: pa.Table) -> pa.Table:
            import polars as pl

            s = pl.from_arrow(batch.column("text").cast(pa.large_string()))
            cnt = s.str.count_matches(r"\S+").fill_null(0).to_numpy().astype(np.int64)
            return pa.table({"doc_id": batch.column("doc_id"),
                             "n_tokens": pa.array(cnt, pa.int64())})

        pack_sequences(
            ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
            .map_batches(_count_tokens, batch_format="pyarrow"),
            "doc_id", "n_tokens", seq_len=2048, bucket=1000,
        ).count()

    R.run("pack_sequences", _s_pack)

    from insurance_pdf_extractor_ray.pipelines.behavior import (
        cohort_retention,
        funnel_counts,
        pivot_counts,
    )

    def _s_behavior():
        def _date(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            return pa.table({"date": pc.strftime(batch.column("ts"), format="%Y-%m-%d"),
                             "event_type": batch.column("event_type")})

        pivot_counts(
            ray.data.read_parquet(events, columns=["ts", "event_type"])
            .map_batches(_date, batch_format="pyarrow"),
            "date", "event_type",
            ["click", "error", "purchase", "signup", "view"]).count()
        funnel_counts(ray.data.read_parquet(events, columns=["user_id", "ts", "event_type"]),
                      "user_id", "ts", "event_type", ["view", "click", "purchase"])
        cohort_retention(ray.data.read_parquet(events, columns=["user_id", "ts"]),
                         "user_id", "ts", max_offset=7).count()

    R.run("behavior", _s_behavior)

    from insurance_pdf_extractor_ray.pipelines.mixing import mixture_interleave

    R.run("mixture_interleave", lambda: mixture_interleave(
        ray.data.read_parquet(docs_path, columns=["doc_id", "source"]),
        "source", "doc_id",
        {f"src{i}": w for i, w in enumerate([2.5, 1.0, 0.25, 1.75] * 5)},
        seed=101).count() and None)

    from insurance_pdf_extractor_ray.functions.redact import (
        PII_PATTERNS,
        denylist_pattern,
        redact_text,
    )

    R.run("pii_redact", lambda: redact_text(
        ray.data.read_parquet(docs_path, columns=["doc_id", "text"]), "text",
        patterns=list(PII_PATTERNS)
        + [("deny", denylist_pattern(["spark", "merge", "hash"]), "[TERM]")],
    ).count() and None)

    from insurance_pdf_extractor_ray.pipelines.tfidf import bm25_search, vocab_counts

    def _s_retrieval():
        vocab_counts(ray.data.read_parquet(docs_path, columns=["doc_id", "text"]),
                     "text", "doc_id", k=100).count()
        bm25_search(ray.data.read_parquet(docs_path, columns=["doc_id", "text"]),
                    "text", "doc_id", ["shuffle", "spark", "window"], k=15)

    R.run("retrieval", _s_retrieval)

    from insurance_pdf_extractor_ray.pipelines.statagg import (
        corr_by_key,
        median_by_key,
        percent_rank_by,
    )

    def _s_statagg():
        corr_by_key(ray.data.read_parquet(
            os.path.join(sf_dir, "lineitem.parquet"),
            columns=["l_returnflag", "l_quantity", "l_discount"]),
            "l_returnflag", "l_quantity", "l_discount").take_all()
        median_by_key(ray.data.read_parquet(events, columns=["event_type", "value"]),
                      "event_type", "value").take_all()
        percent_rank_by(ray.data.read_parquet(
            events, columns=["event_type", "value", "event_id"]),
            "event_type", "value", "event_id").count()

    R.run("statagg", _s_statagg)

    from insurance_pdf_extractor_ray.pipelines.bucketed import (
        bucketed_join,
        write_bucketed,
    )
    from insurance_pdf_extractor_ray.pipelines.fuzzy import fuzzy_pairs

    R.run("fuzzy_pairs", lambda: fuzzy_pairs(
        ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                              columns=["c_custkey", "c_name"]),
        "c_custkey", "c_name").count() and None)

    import shutil
    import tempfile as _tempfile

    broot = _tempfile.mkdtemp(prefix="ipe_bench_bucketed_")
    try:
        def _s_bucketed_write():
            write_bucketed(
                ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                      columns=["o_orderkey", "o_custkey"]),
                os.path.join(broot, "o"), "o_custkey", 32)
            write_bucketed(
                ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                      columns=["c_custkey", "c_mktsegment"]),
                os.path.join(broot, "c"), "c_custkey", 32)

        R.run("bucketed_write", _s_bucketed_write, volatile=True)
        if queries.get("bucketed_write") is not None:
            R.run("bucketed_join", lambda: bucketed_join(
                os.path.join(broot, "o"), os.path.join(broot, "c")).count() and None)
        else:  # the bucketed layout never landed: nothing to join
            queries["bucketed_join"] = None
    finally:
        shutil.rmtree(broot, ignore_errors=True)

    emb_path = os.path.join(sf_dir, "embeddings.parquet")
    head = pq.read_table(emb_path, columns=["embedding"]).column("embedding")
    q = np.asarray(head[:8].to_pylist(), dtype=np.float64)
    R.run("knn", lambda: knn_brute_force(
        ray.data.read_parquet(emb_path), q, k=10) and None)

    # graph / CDC family: entity components (FastSS edges + closure),
    # MERGE-style change apply, keyless interval join
    from insurance_pdf_extractor_ray.pipelines.cdc import apply_changes
    from insurance_pdf_extractor_ray.pipelines.fuzzy import entity_components
    from insurance_pdf_extractor_ray.pipelines.joins import range_join

    R.run("entity_components", lambda: entity_components(
        ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                              columns=["c_custkey", "c_name", "c_nationkey"]),
        "c_custkey", "c_name", block_col="c_nationkey").count() and None)

    R.run("apply_changes", lambda: apply_changes(
        ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                              columns=["c_custkey", "c_acctbal"]),
        ray.data.read_parquet(
            events, columns=["user_id", "ts", "event_id",
                             "event_type", "value"]),
        "c_custkey", "user_id", order_by=["ts", "event_id"],
        op_col="event_type", payload_map={"value": "c_acctbal"},
        delete_op="error").count() and None)

    def _s_range_join():
        def _pts(batch: pa.Table) -> pa.Table:
            return pa.table({"event_id": batch.column("event_id"),
                             "ts_us": batch.column("ts").cast(pa.int64())})

        def _wins(batch: pa.Table) -> pa.Table:
            import pyarrow.compute as pc

            batch = batch.filter(pc.equal(batch.column("event_type"), "error"))
            s = batch.column("ts").cast(pa.int64())
            return pa.table({"outage_id": batch.column("event_id"),
                             "start_us": s, "end_us": pc.add(s, 600_000_000)})

        evr = ray.data.read_parquet(events,
                                    columns=["event_id", "ts", "event_type"])
        range_join(evr.map_batches(_pts, batch_format="pyarrow"),
                   evr.map_batches(_wins, batch_format="pyarrow"),
                   on="ts_us", start_col="start_us", end_col="end_us",
                   epoch=600_000_000, interval_cols=["outage_id"]).count()

    R.run("range_join", _s_range_join)

    # sequence/composition family: word bigrams, co-occurrence, Markov
    # transitions, de-bounce, entropy, quality audit, embedding centroids
    from insurance_pdf_extractor_ray.pipelines.analytics import entropy_by
    from insurance_pdf_extractor_ray.pipelines.behavior import (
        cooccurrence_pairs,
        transition_counts,
    )
    from insurance_pdf_extractor_ray.pipelines.profile import quality_audit
    from insurance_pdf_extractor_ray.pipelines.similarity import group_centroids
    from insurance_pdf_extractor_ray.pipelines.tfidf import ngram_counts
    from insurance_pdf_extractor_ray.pipelines.windows import debounce_by_key

    R.run("bigrams", lambda: ngram_counts(
        ray.data.read_parquet(docs_path, columns=["doc_id", "text"]),
        "text", "doc_id", n=2, k=100).count() and None)

    def _s_sequence_ops():
        cooccurrence_pairs(
            ray.data.read_parquet(events, columns=["user_id", "event_type"]),
            "user_id", "event_type").count()
        transition_counts(
            ray.data.read_parquet(events,
                                  columns=["event_id", "user_id",
                                           "event_type", "ts"]),
            "user_id", "event_type", "ts", order_tiebreak="event_id").count()
        debounce_by_key(
            ray.data.read_parquet(events,
                                  columns=["event_id", "user_id",
                                           "event_type", "ts"]),
            "user_id", "ts", "event_type", gap=60_000_000,
            order_tiebreak="event_id").count()

    R.run("sequence_ops", _s_sequence_ops)

    import pyarrow.compute as _pc

    def _s_audit_centroids():
        entropy_by(ray.data.read_parquet(docs_path,
                                         columns=["source", "lang"]),
                   "source", "lang")
        quality_audit(
            ray.data.read_parquet(docs_path,
                                  columns=["text", "lang", "n_chars"]),
            [("empty_text", lambda b: _pc.or_kleene(
                _pc.is_null(b.column("text")), _pc.equal(b.column("text"), ""))),
             ("len_mismatch", lambda b: _pc.not_equal(
                 b.column("n_chars"), _pc.utf8_length(b.column("text")))),
             ("oversize", lambda b: _pc.greater(b.column("n_chars"), 500))])
        group_centroids(ray.data.read_parquet(emb_path,
                                              columns=["embedding", "label"]),
                        "embedding", "label")

    R.run("audit_centroids", _s_audit_centroids)

    from insurance_pdf_extractor_ray.pipelines.clustering import kmeans_lloyd
    from insurance_pdf_extractor_ray.pipelines.intervals import (
        merge_intervals_by_key,
    )
    from insurance_pdf_extractor_ray.pipelines.joins import shuffle_anti_join
    from insurance_pdf_extractor_ray.pipelines.sampling import global_shuffle
    from insurance_pdf_extractor_ray.pipelines.zorder import cluster_by_zorder

    def _s_layout_shuffle():
        cluster_by_zorder(
            ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                  columns=["o_orderkey", "o_custkey"]),
            ["o_custkey", "o_orderkey"], bits=16).count()
        global_shuffle(
            ray.data.read_parquet(docs_path, columns=["doc_id", "source"]),
            "doc_id", seed=13).count()

    R.run("layout_shuffle", _s_layout_shuffle)

    R.run("kmeans", lambda: kmeans_lloyd(
        ray.data.read_parquet(emb_path, columns=["vec_id", "embedding"]),
        k=8, iters=5, seed=0) and None)

    def _s_intervals_antijoin():
        def _iv(batch: pa.Table) -> pa.Table:
            s_us = batch.column("ts").cast(pa.int64())
            return pa.table({"user_id": batch.column("user_id"), "s": s_us,
                             "e": _pc.add(s_us, 1_800_000_000)})

        merge_intervals_by_key(
            ray.data.read_parquet(events, columns=["user_id", "ts"])
                    .map_batches(_iv, batch_format="pyarrow"),
            "user_id", "s", "e").count()
        cust_b = ray.data.read_parquet(
            os.path.join(sf_dir, "customer.parquet"),
            columns=["c_custkey", "c_mktsegment"]) \
            .filter(expr="c_mktsegment == 'BUILDING'") \
            .select_columns(["c_custkey"])
        shuffle_anti_join(
            ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                  columns=["o_orderkey", "o_custkey"]),
            cust_b, on="o_custkey", right_on="c_custkey").count()

    R.run("intervals_antijoin", _s_intervals_antijoin)

    # training-data family (session 6): substring-span dedup (two corpus
    # passes + one keyed combine), corpus-unigram scoring, SemDeDup
    from insurance_pdf_extractor_ray.pipelines.clustering import (
        semantic_dedup_drop_ids,
    )
    from insurance_pdf_extractor_ray.pipelines.substrdedup import dup_span_clean
    from insurance_pdf_extractor_ray.pipelines.tfidf import unigram_logprob

    def _s_substr_dedup():
        assert dup_span_clean(
            ray.data.read_parquet(docs_path, columns=["doc_id", "text"]),
            "text", "doc_id", k=8).count() > 0

    R.run("substr_dedup", _s_substr_dedup)

    def _s_unigram_logprob():
        assert unigram_logprob(
            ray.data.read_parquet(docs_path, columns=["doc_id", "text"]),
            "text", "doc_id").count() > 0

    R.run("unigram_logprob", _s_unigram_logprob)

    from insurance_pdf_extractor_ray.pipelines.invindex import (
        bm25_search_indexed,
        build_inverted_index,
    )

    idx_root = _tempfile.mkdtemp(prefix="ipe_bench_invidx_")
    R.run("invindex_build", lambda: build_inverted_index(
        ray.data.read_parquet(docs_path, columns=["doc_id", "text"]),
        "text", "doc_id", idx_root, n_buckets=32) and None,
          volatile=True)

    def _s_invindex_search():
        for terms in (["shuffle", "spark", "window"], ["agg"], ["join", "sort"]):
            assert bm25_search_indexed(idx_root, terms, k=15).num_rows > 0

    if queries.get("invindex_build") is not None:
        R.run("invindex_search3", _s_invindex_search)
    else:  # the index never landed: nothing to search
        queries["invindex_search3"] = None

    R.run("semantic_dedup", lambda: semantic_dedup_drop_ids(
        ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                              columns=["vec_id", "embedding"]),
        "embedding", "vec_id", n_clusters=8, tau=0.30).count() and None)

    from insurance_pdf_extractor_ray.pipelines.sketches import quantiles_global
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        ngram_decontaminate,
    )
    from insurance_pdf_extractor_ray.pipelines.textpipe import gopher_repetition

    def _s_gopher():
        assert gopher_repetition(
            ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
        ).count() > 0

    R.run("gopher_repetition", _s_gopher)

    def _eval_slice(keep: bool):
        def fn(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id").to_numpy(zero_copy_only=False)
            return t.filter(pa.array((ids % 50 == 0) == keep))
        return fn

    def _s_decontaminate():
        docs_de = ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
        assert ngram_decontaminate(
            docs_de.map_batches(_eval_slice(False), batch_format="pyarrow"),
            docs_de.map_batches(_eval_slice(True), batch_format="pyarrow"),
            "text", "doc_id", k=8).count() > 0

    R.run("ngram_decontaminate", _s_decontaminate)

    R.run("quantiles_refine", lambda: quantiles_global(
        ray.data.read_parquet(events, columns=["value"]), "value",
        [0.01, 0.25, 0.5, 0.75, 0.99]) and None)

    from insurance_pdf_extractor_ray.pipelines.pretrain import pretrain_prep

    def _s_pretrain_prep():
        docs_pp = ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
        assert pretrain_prep(
            docs_pp.map_batches(_eval_slice(False), batch_format="pyarrow"),
            "text", "doc_id",
            eval_ds=docs_pp.map_batches(_eval_slice(True), batch_format="pyarrow"),
            seq_len=2048).count() > 0

    R.run("pretrain_prep", _s_pretrain_prep)

    # --- session-8 stages -------------------------------------------------
    from insurance_pdf_extractor_ray.pipelines.graph import (
        ip_threshold_graph, triangle_stats)
    from insurance_pdf_extractor_ray.pipelines.similarity import (
        covariance_matrix)
    from insurance_pdf_extractor_ray.pipelines.textpipe import (
        char_entropy, readability)
    from insurance_pdf_extractor_ray.pipelines.tfidf import (
        bpe_apply_token_counts, bpe_train)

    emb8 = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                 columns=["vec_id", "embedding"])

    def _s_embedding_cov():
        assert covariance_matrix(emb8, "embedding").num_rows > 0

    R.run("embedding_covariance", _s_embedding_cov)

    def _s_similarity_triangles():
        edges8 = ip_threshold_graph(emb8.filter(expr="vec_id < 400"),
                                    "embedding", "vec_id", tau=0.25)
        assert triangle_stats(edges8).count() > 0

    R.run("similarity_triangles", _s_similarity_triangles)

    docs_txt = ray.data.read_parquet(docs_path, columns=["doc_id", "text"])

    def _s_readability():
        assert readability(docs_txt, "text", "doc_id").count() > 0
        assert char_entropy(docs_txt, "text", "doc_id").count() > 0

    R.run("readability_entropy", _s_readability)

    def _s_bpe():
        merges8 = bpe_train(docs_txt, "text", num_merges=8)
        assert bpe_apply_token_counts(docs_txt, "text", "doc_id",
                                      merges8).count() > 0

    R.run("bpe_train_apply", _s_bpe)

    # --- session-9 stages -------------------------------------------------
    from insurance_pdf_extractor_ray.pipelines.behavior import rfm_segments
    from insurance_pdf_extractor_ray.pipelines.packing import (
        padding_efficiency)
    from insurance_pdf_extractor_ray.pipelines.pretrain import (
        span_corruption_stats)
    from insurance_pdf_extractor_ray.pipelines.similarity import (
        hard_negatives, knn_label_ndcg, nearest_centroid_confusion)
    from insurance_pdf_extractor_ray.pipelines.substrdedup import (
        source_overlap_matrix)

    emb9_path = os.path.join(sf_dir, "embeddings.parquet")
    head9 = pq.read_table(emb9_path,
                          columns=["vec_id", "embedding", "label"])
    q9 = np.asarray(head9.column("embedding")[:8].to_pylist(), np.float64)
    q9_ids = head9.column("vec_id")[:8].to_pylist()
    q9_lab = head9.column("label")[:8].to_pylist()

    def _s_mining_eval():
        emb9 = ray.data.read_parquet(emb9_path)
        assert hard_negatives(emb9, q9, q9_ids, q9_lab, k=10).num_rows > 0
        counts9 = {r["label"]: r["count()"] for r in
                   emb9.groupby("label").count().take_all()}
        assert knn_label_ndcg(emb9, q9, q9_ids, q9_lab, counts9,
                              k=10).num_rows > 0
        assert nearest_centroid_confusion(emb9).num_rows > 0

    R.run("mining_eval", _s_mining_eval)

    docs9 = ray.data.read_parquet(docs_path, columns=["text", "source"])

    def _s_corruption_padding():
        assert span_corruption_stats(docs9).count() > 0
        assert padding_efficiency(docs9).count() > 0

    R.run("corruption_padding_plan", _s_corruption_padding)

    def _s_source_overlap():
        assert source_overlap_matrix(docs9, "text", "source", k=8).num_rows >= 0

    R.run("source_overlap", _s_source_overlap)

    def _s_rfm():
        assert rfm_segments(ray.data.read_parquet(
            events, columns=["user_id", "ts", "value"])).count() > 0

    R.run("rfm_segments", _s_rfm)

    # --- round-3 stages: real codecs, binary-PDF ingestion, image near-dup
    from insurance_pdf_extractor_ray.pipelines.imagededup import (
        near_dup_image_groups,
    )
    from insurance_pdf_extractor_ray.pipelines.multimodal import (
        decode_media,
        frame_sample,
        media_consistency_gate,
        real_assets_for_docs,
    )
    from insurance_pdf_extractor_ray.pipelines.pdfingest import (
        file_gates,
        pdf_to_docs,
        pdfs_for_docs,
    )

    # fixtures are generated DISTRIBUTED (encode is per-asset CPU work) and
    # materialized outside the timers so the stages measure decode, not gen
    n_assets_docs = 4000

    def _gen_assets(batch) -> pa.Table:
        refs = [(f"doc-{int(i):09d}", f"media://doc-{int(i):09d}/{j}")
                for i in batch["id"] for j in (0, 1)]
        return real_assets_for_docs(refs, mismatch_frac=0.05,
                                    corrupt_frac=0.05)

    assets = ray.data.range(n_assets_docs, override_num_blocks=num_cpus) \
        .map_batches(_gen_assets, batch_format="numpy", batch_size=256) \
        .materialize()

    def _s_media_decode():
        assert decode_media(media_consistency_gate(assets), use_fake=False,
                            concurrency=(1, num_cpus)).count() == n_assets_docs * 2

    R.run("media_decode_real", _s_media_decode)

    def _s_frame_sample():
        assert frame_sample(assets, use_fake=False, every_ms=500, max_frames=6,
                            concurrency=(1, num_cpus)).count() > 0

    R.run("frame_sample_real", _s_frame_sample)

    R.run("image_dedup", lambda: near_dup_image_groups(
        assets, max_hamming=3, bands=4).count() and None)

    from insurance_pdf_extractor_ray.pipelines.audiodedup import (
        audio_fingerprints,
        near_dup_audio_groups,
    )
    from insurance_pdf_extractor_ray.pipelines.fingerprintindex import (
        fingerprint_dedup_incremental,
        fingerprint_index_append,
    )
    from insurance_pdf_extractor_ray.pipelines.videodedup import (
        near_dup_video_groups,
    )

    R.run("video_dedup", lambda: near_dup_video_groups(
        assets, max_hamming=3, bands=4).count() and None)

    R.run("audio_dedup", lambda: near_dup_audio_groups(
        assets, max_hamming=3, bands=4).count() and None)

    # incremental fingerprint index: first half builds, second half probes
    # (fixture materialization stays OUTSIDE the stage timer, as in r3)
    sigs_all = audio_fingerprints(assets).materialize()
    half_ref = f"media://doc-{n_assets_docs // 2:09d}/0"
    fp_first = sigs_all.filter(expr=f"media_ref < '{half_ref}'").materialize()
    fp_second = sigs_all.filter(expr=f"media_ref >= '{half_ref}'").materialize()

    def _s_fp_incremental():
        fp_idx = _tempfile.mkdtemp(prefix="ipe_bench_fpidx_")
        try:
            t0 = time.time()
            kept1 = fingerprint_dedup_incremental(fp_first, fp_idx)
            fingerprint_index_append(fp_idx, kept1)
            assert fingerprint_dedup_incremental(fp_second, fp_idx).count() > 0
            return {"__sec__": round(time.time() - t0, 3)}
        finally:
            shutil.rmtree(fp_idx, ignore_errors=True)

    R.run("fingerprint_incremental", _s_fp_incremental)

    n_pdf_docs = 5000

    def _gen_pdfs(batch) -> pa.Table:
        return pdfs_for_docs([int(i) for i in batch["id"]])

    pdf_tbl = ray.data.range(n_pdf_docs, override_num_blocks=num_cpus) \
        .map_batches(_gen_pdfs, batch_format="numpy", batch_size=256) \
        .materialize()

    def _s_pdf_ingest():
        parsed = pdf_to_docs(file_gates(pdf_tbl, drop_failed=True)
                             .drop_columns(["ext_ok", "magic_ok", "size_ok",
                                            "safe_name"]), drop_errors=True)
        n_pdf_out = extract_pipeline(parsed, assume_colocated=True).count()
        assert n_pdf_out > 0.9 * n_pdf_docs * (1 - 1 / 17)

    R.run("pdf_ingest_extract", _s_pdf_ingest)

    # --- incremental dedup against at-rest bucketed indexes: two-increment
    # ingest of the documents / embeddings tables (index build + probe)
    from insurance_pdf_extractor_ray.pipelines.embindex import (
        embedding_dedup_incremental,
        embedding_index_append,
    )
    from insurance_pdf_extractor_ray.pipelines.minhashindex import (
        minhash_dedup_incremental,
        minhash_index_append,
    )

    def _halves(ds, id_col):
        n = ds.count()
        half = n // 2

        def part(lo, hi):
            def f(t: pa.Table) -> pa.Table:
                ids = t.column(id_col)
                import pyarrow.compute as pc
                return t.filter(pc.and_(pc.greater_equal(ids, lo),
                                        pc.less(ids, hi)))
            return f

        return (ds.map_batches(part(0, half), batch_format="pyarrow"),
                ds.map_batches(part(half, 1 << 62), batch_format="pyarrow"))

    def _s_minhash_inc():
        docs_ds = ray.data.read_parquet(docs_path, columns=["doc_id", "text"])
        inc_a, inc_b = _halves(docs_ds, "doc_id")
        idx = _tempfile.mkdtemp(prefix="ipe_bench_mhidx_")
        try:
            kept, sigs = minhash_dedup_incremental(inc_a, idx, "text", "doc_id",
                                                   threshold=0.8)
            assert kept.count() > 0
            minhash_index_append(idx, sigs, "doc_id")
            kept2, _ = minhash_dedup_incremental(inc_b, idx, "text", "doc_id",
                                                 threshold=0.8)
            assert kept2.count() > 0
        finally:
            shutil.rmtree(idx, ignore_errors=True)

    R.run("minhash_incremental", _s_minhash_inc)

    def _s_embedding_inc():
        emb_ds = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"),
                                       columns=["vec_id", "embedding"])
        inc_a, inc_b = _halves(emb_ds, "vec_id")
        idx = _tempfile.mkdtemp(prefix="ipe_bench_embidx_")
        try:
            kept, rows = embedding_dedup_incremental(inc_a, idx, "embedding",
                                                     "vec_id", threshold=0.45)
            assert kept.count() > 0
            embedding_index_append(idx, rows)
            kept2, _ = embedding_dedup_incremental(inc_b, idx, "embedding",
                                                   "vec_id", threshold=0.45)
            assert kept2.count() > 0
        finally:
            shutil.rmtree(idx, ignore_errors=True)

    R.run("embedding_incremental", _s_embedding_inc)

    from insurance_pdf_extractor_ray.pipelines.bucketed import write_bucketed
    from insurance_pdf_extractor_ray.pipelines.cdc import apply_changes_bucketed

    def _s_apply_changes_bucketed():
        base = ray.data.read_parquet(os.path.join(sf_dir, "customer.parquet"),
                                     columns=["c_custkey", "c_acctbal"])
        chg = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                                    columns=["user_id", "ts", "event_id",
                                             "event_type", "value"])
        root = _tempfile.mkdtemp(prefix="ipe_bench_cdcb_")
        try:
            write_bucketed(base, os.path.join(root, "base"), "c_custkey",
                           num_cpus)
            t0 = time.time()
            n_state = apply_changes_bucketed(
                os.path.join(root, "base"), chg, "user_id",
                order_by=["ts", "event_id"], op_col="event_type",
                payload_map={"value": "c_acctbal"}, delete_op="error").count()
            assert n_state > 0
            return {"__sec__": round(time.time() - t0, 3)}
        finally:
            shutil.rmtree(root, ignore_errors=True)

    R.run("apply_changes_bucketed", _s_apply_changes_bucketed)

    # round-3 additions: market-basket lift + survival + attribution
    from insurance_pdf_extractor_ray.pipelines.behavior import (
        association_lift,
        attribution_linear,
    )
    from insurance_pdf_extractor_ray.pipelines.statagg import kaplan_meier

    li = ray.data.read_parquet(os.path.join(sf_dir, "lineitem.parquet"),
                               columns=["l_orderkey", "l_partkey"])
    ev = ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"),
                               columns=["user_id", "ts", "event_type",
                                        "value"])

    def _s_mining2():
        assert association_lift(li, "l_orderkey", "l_partkey",
                                min_support=2).count() > 0
        kaplan_meier(ev, "user_id", "ts", censor_horizon_us=43_200_000_000)
        attribution_linear(ev, "user_id", "ts", "event_type", "value",
                           conversion_type="purchase",
                           touch_types=["view", "click"],
                           window_us=7 * 86_400_000_000)

    R.run("mining2", _s_mining2)

    # round-3 additions: graph/ML family over embeddings + purchase graph
    from insurance_pdf_extractor_ray.pipelines.clustering import (
        dbscan_embeddings,
        label_propagation,
    )
    from insurance_pdf_extractor_ray.pipelines.evalstats import dim_label_mi
    from insurance_pdf_extractor_ray.pipelines.graph import hits_bipartite

    def _s_graph_ml():
        emb = ray.data.read_parquet(os.path.join(sf_dir, "embeddings.parquet"))
        capped = emb.filter(expr="vec_id < 400").materialize()
        assert dbscan_embeddings(capped, "embedding", "vec_id", tau=0.3125,
                                 min_pts=3).num_rows > 0
        label_propagation(capped, "embedding", "vec_id", "label",
                          seed_pred=lambda ids: ids < 100,
                          tau=0.3125, n_rounds=2)
        dim_label_mi(emb, "embedding", "label")
        ords = ray.data.read_parquet(os.path.join(sf_dir, "orders.parquet"),
                                     columns=["o_orderkey", "o_custkey"])
        from insurance_pdf_extractor_ray.dsutil import distinct_rows_by

        edges = distinct_rows_by(
            ords.join(li.materialize(), join_type="inner",
                      num_partitions=8, on=("o_orderkey",),
                      right_on=("l_orderkey",))
            .select_columns(["o_custkey", "l_partkey"]),
            ["o_custkey", "l_partkey"])
        assert hits_bipartite(edges, "o_custkey", "l_partkey",
                              n_iter=2).count() > 0

    R.run("graph_ml", _s_graph_ml)

    return {
        "metric": "flagship extraction wall-time (read->reassemble->extract->validate), corpus derived from sf documents",
        "value": extract_sec if extract_sec is not None else -1,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_label(sf_dir),
        "num_cpus": num_cpus,
        "n_docs": n_docs,
        "docs_per_sec": (round(n_docs / extract_sec, 1)
                         if extract_sec else -1),
        "skipped_stages": R.skipped,
    }


def run_guarded(sf_dir: str, num_cpus: int, mult: int,
                extract_only: bool = False) -> dict:
    """Run the suite in a child process with per-stage state; relaunch on
    crash (completed stages replay from state, the crashing stage is retried
    once then skipped).  Always returns a parseable result dict."""
    fd, state = tempfile.mkstemp(prefix="ipe_bench_state_", suffix=".jsonl")
    os.close(fd)
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--cpus", str(num_cpus), "--mult", str(mult), "--state", state]
    if extract_only:
        cmd.append("--extract-only")
    last_rc = None
    # progress watchdog: a stage that HANGS (idle deadlock — observed once
    # on a long-lived session: an autoscaling actor pool never came up
    # ~55 stages in) writes no checkpoint records; killing the child after
    # STALL_SEC of state-file silence converts the hang into the crash
    # path (stage retried once, then skipped) instead of eating the
    # 90-minute overall timeout three times
    STALL_SEC = int(os.environ.get("IPE_BENCH_STALL_SEC", "420"))
    for attempt in range(1, MAX_ATTEMPTS + 1):
        # child output goes to files, not pipes — a filled unread pipe
        # would block the child and read as a stall
        ofd, opath = tempfile.mkstemp(prefix="ipe_bench_out_")
        efd, epath = tempfile.mkstemp(prefix="ipe_bench_err_")
        with open(ofd, "w") as of, open(efd, "w") as ef:
            child = subprocess.Popen(
                cmd, env={**os.environ, "GRAFT_SF_DIR": sf_dir},
                stdout=of, stderr=ef, text=True)
            t0 = time.time()
            last_size = -1
            last_progress = t0
            stalled = False
            while True:
                try:
                    child.wait(timeout=5)
                    break
                except subprocess.TimeoutExpired:
                    pass
                now = time.time()
                try:
                    size = os.path.getsize(state)
                except OSError:
                    size = -1
                if size != last_size:
                    last_size = size
                    last_progress = now
                if now - last_progress > STALL_SEC or now - t0 > 5400:
                    child.kill()
                    child.wait()
                    stalled = True
                    break
        out_text = open(opath).read()
        for p in (opath, epath):
            try:
                os.unlink(p)
            except OSError:
                pass
        if stalled:
            last_rc = "stalled"
            continue
        last_rc = child.returncode
        proc = type("R", (), {"returncode": last_rc, "stdout": out_text})()
        lines = [ln for ln in proc.stdout.strip().splitlines()
                 if ln.startswith("{")]
        if proc.returncode == 0 and lines:
            out = json.loads(lines[-1])
            out["bench_attempts"] = attempt
            try:
                os.unlink(state)
            except OSError:
                pass
            return out
    # child never completed: assemble a partial result from the state file
    queries: dict = {}
    starts: dict = {}
    skipped: list = []
    if os.path.exists(state):
        for ln in open(state):
            try:
                rec = json.loads(ln)
            except json.JSONDecodeError:
                continue
            if rec.get("status") == "start":
                starts[rec["stage"]] = starts.get(rec["stage"], 0) + 1
            elif rec.get("status") == "done":
                queries[rec["stage"]] = rec["sec"]
                queries.update(rec.get("extra", {}))
                if rec.get("skipped"):
                    skipped.append(rec["stage"])
    for stage, n in starts.items():
        if stage not in queries:
            queries[stage] = None
            skipped.append(stage)
    extract_sec = queries.get("extract")
    return {
        "metric": "flagship extraction wall-time (read->reassemble->extract->validate), corpus derived from sf documents",
        "value": extract_sec if extract_sec is not None else -1,
        "unit": "sec",
        "queries": queries,
        "sf": _sf_label(sf_dir),
        "num_cpus": num_cpus,
        "partial": True,
        "bench_attempts": MAX_ATTEMPTS,
        "last_rc": last_rc,
        "skipped_stages": sorted(set(skipped)),
    }


def run_scaling(sf_dir: str) -> dict:
    """Same job at N=4 and 4N=16 CPUs in fresh processes; eff=(r16/r4)/4.

    4/16 rather than 8/32: this VM shows vCPU steal and saturates around ~16
    effective cores (16- and 32-CPU runs deliver the same docs/s), so 8-vs-32
    measures the hypervisor, not the pipeline.  The scaling corpus is 40x the
    headline (2M docs at sf0.1) so fixed startup doesn't masquerade as poor
    scaling.
    """
    mult = "400"
    # pre-generate the corpus once so neither child pays generation time
    subprocess.run(
        [sys.executable, os.path.abspath(__file__), "--child", "--cpus", "32",
         "--mult", mult, "--gen-only"],
        env={**os.environ, "GRAFT_SF_DIR": sf_dir},
        capture_output=True, text=True, timeout=3600,
    )
    results = {}
    for cpus in (4, 16):
        # one retry per leg: a raylet hiccup shouldn't zero the artifact
        for _ in range(2):
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--child", "--cpus", str(cpus),
                 "--mult", mult, "--extract-only"],
                env={**os.environ, "GRAFT_SF_DIR": sf_dir},
                capture_output=True, text=True, timeout=3600,
            )
            lines = [ln for ln in proc.stdout.strip().splitlines()
                     if ln.startswith("{")]
            if proc.returncode == 0 and lines:
                results[cpus] = json.loads(lines[-1])
                break
        else:
            return {"metric": "scaling efficiency (FAILED leg)",
                    "value": -1, "unit": "efficiency", "failed_cpus": cpus}
    r4 = results[4]["docs_per_sec"]
    r16 = results[16]["docs_per_sec"]
    return {
        "metric": "scaling efficiency of flagship extraction, 4 vs 16 CPUs (fresh processes, same input)",
        "value": round((r16 / r4) / 4.0, 3),
        "unit": "efficiency",
        "sf": _sf_label(sf_dir),
        "n_docs": results[4]["n_docs"],
        "docs_per_sec_4cpu": r4,
        "docs_per_sec_16cpu": r16,
        "extract_sec_4cpu": results[4]["value"],
        "extract_sec_16cpu": results[16]["value"],
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpus", type=int, default=NUM_CPUS)
    ap.add_argument("--mult", type=int, default=10)
    ap.add_argument("--extract-only", action="store_true")
    ap.add_argument("--gen-only", action="store_true")
    ap.add_argument("--state", default=None,
                    help="per-stage checkpoint file (set by the crash guard)")
    ap.add_argument("--no-guard", action="store_true",
                    help="run in-process without the crash-guard child")
    args = ap.parse_args()

    if args.scaling:
        print(json.dumps(run_scaling(SF_DIR)))
        return

    if not args.child and not args.no_guard and not args.gen_only:
        # default path: crash-guarded child with per-stage state
        print(json.dumps(run_guarded(SF_DIR, args.cpus, args.mult,
                                     extract_only=args.extract_only)))
        return

    import ray

    if args.gen_only:
        if not ray.is_initialized():
            ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                     log_to_driver=False)
        corpus, n = ensure_corpus(SF_DIR, args.mult)
        print(json.dumps({"corpus": corpus, "n_docs": n}))
        ray.shutdown()
        return

    out = run_bench(SF_DIR, args.cpus, corpus_mult=args.mult,
                    extract_only=args.extract_only, state_path=args.state)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
