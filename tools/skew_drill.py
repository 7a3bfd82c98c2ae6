"""Skew-stress drill for the flagship extraction pipeline.

The north rule calls out "explicit skew handling for oversized PDFs".  The
engine's answer is the per-block ``precombine`` partial merge (a 100x-span
doc sharded over K blocks ships K combined rows through the reassembly
exchange, not K·100 span rows) plus auto-mode's split-doc detection.  This
drill produces the evidence artifact:

  1. builds a SKEWED corpus — 99% docs at text_scale 1, 1% at text_scale
     100 (~70x the spans of a normal doc) — and a UNIFORM corpus with a
     comparable total span count;
  2. runs ``extract_pipeline`` over both (shuffle and auto modes), timing
     best-of-2;
  3. proves correctness on the skewed corpus: cell-level golden diff of
     fields AND span-sequence digests both EMPTY;
  4. writes BENCH/SKEW_r4.json with docs/s, spans/s and the skew profile.

Usage:  python tools/skew_drill.py  [num_docs]  (default 50_000)
"""

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

HEAVY_SCALE = 100
HEAVY_FRAC = 0.01


def build_mixed_corpus(n: int, root: str) -> dict:
    """99%/1% mixed-scale corpus + goldens; heavy ids are the tail range."""
    import ray.data

    from insurance_pdf_extractor_ray.sources.synth import (
        docs_table,
        expected_tables,
    )

    n_heavy = max(1, int(n * HEAVY_FRAC))
    cohorts = [(0, n - n_heavy, 1), (n - n_heavy, n, HEAVY_SCALE)]
    os.makedirs(root, exist_ok=True)
    for sub in ("documents", "expected_fields", "expected_spans"):
        os.makedirs(os.path.join(root, sub), exist_ok=True)
    total_spans = 0
    for lo, hi, scale in cohorts:
        def gen_docs(batch, s=scale):
            return docs_table(batch["id"], 42, s)

        def gen_fields(batch, s=scale):
            return expected_tables(batch["id"], 42, s)[0]

        def gen_spans(batch, s=scale):
            return expected_tables(batch["id"], 42, s)[1]

        blocks = max(1, (hi - lo) // 2000)
        ids = ray.data.range(hi - lo, override_num_blocks=blocks) \
            .map_batches(lambda b, off=lo: {"id": b["id"] + off},
                         batch_format="numpy")
        ids.map_batches(gen_docs, batch_format="numpy", batch_size=2000) \
            .write_parquet(os.path.join(root, "documents", f"s{scale}"))
        ids.map_batches(gen_fields, batch_format="numpy", batch_size=2000) \
            .write_parquet(os.path.join(root, "expected_fields", f"s{scale}"))
        ids.map_batches(gen_spans, batch_format="numpy", batch_size=2000) \
            .write_parquet(os.path.join(root, "expected_spans", f"s{scale}"))
    docs = ray.data.read_parquet(os.path.join(root, "documents"),
                                 columns=["doc_id", "spans"])

    def span_counts(b: pa.Table) -> pa.Table:
        return pa.table({"n": pa.array(
            [int(b.column("spans").combine_chunks().value_lengths()
                 .cast(pa.int64()).to_numpy(zero_copy_only=False).sum())],
            pa.int64())})

    counts = docs.map_batches(span_counts, batch_format="pyarrow").take_all()
    total_spans = sum(r["n"] for r in counts)
    return {"n_docs": n, "n_heavy": n_heavy, "total_spans": total_spans}


def bench_mode(path: str, mode: str, trials: int = 2) -> float:
    from insurance_pdf_extractor_ray.pipelines.extraction import (
        extract_pipeline,
    )

    best = float("inf")
    for _ in range(trials):
        t0 = time.time()
        n = extract_pipeline(path, mode=mode).count()
        best = min(best, time.time() - t0)
    return best


def golden_checks(root: str) -> dict:
    import ray.data

    from insurance_pdf_extractor_ray.config import FIELD_ORDER
    from insurance_pdf_extractor_ray.pipelines.extraction import (
        extract_pipeline,
        flatten_fields,
    )
    from insurance_pdf_extractor_ray.pipelines.goldencheck import (
        golden_diff,
        span_digests,
    )

    docs = os.path.join(root, "documents")
    engine = flatten_fields(extract_pipeline(docs))
    golden = ray.data.read_parquet(
        os.path.join(root, "expected_fields"),
        columns=["doc_id"] + FIELD_ORDER + ["status"])
    fields_diff = golden_diff(engine, golden, key="doc_id").count()
    eng_d = span_digests(extract_pipeline(docs), "spans_out")
    want_d = span_digests(
        ray.data.read_parquet(os.path.join(root, "expected_spans")), "spans")
    spans_diff = golden_diff(eng_d, want_d, key="doc_id").count()
    return {"fields_diff_rows": fields_diff, "spans_diff_rows": spans_diff}


def main():
    import ray

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    if not ray.is_initialized():
        ray.init(address="local",
                 num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False)

    from insurance_pdf_extractor_ray.sources.synth import (
        GEN_VERSION,
        write_corpus,
    )

    skew_root = f"/tmp/skew_corpus/v{GEN_VERSION}-{n}"
    if not os.path.isdir(os.path.join(skew_root, "documents")):
        meta = build_mixed_corpus(n, skew_root)
    else:
        meta = {"n_docs": n, "n_heavy": max(1, int(n * HEAVY_FRAC)),
                "total_spans": None}
    # uniform corpus of comparable span mass: scale 2 doubles filler spans
    uni_root = f"/tmp/skew_uniform/v{GEN_VERSION}-{n}"
    if not os.path.isdir(os.path.join(uni_root, "documents")):
        write_corpus(n, uni_root, goldens=False, text_scale=2)

    out = {"n_docs": n, **meta}
    for label, root in (("skewed", skew_root), ("uniform", uni_root)):
        docs = os.path.join(root, "documents")
        for mode in ("shuffle", "auto"):
            sec = bench_mode(docs, mode)
            out[f"{label}_{mode}_sec"] = round(sec, 3)
            out[f"{label}_{mode}_docs_per_s"] = round(n / sec, 1)
    out.update(golden_checks(skew_root))
    out["exact_on_skewed"] = (out["fields_diff_rows"] == 0
                              and out["spans_diff_rows"] == 0)
    dst = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH", "SKEW_r4.json")
    with open(dst, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))
    ray.shutdown()


if __name__ == "__main__":
    main()
