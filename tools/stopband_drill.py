"""Stop-band effectiveness drill (minhashindex.write_stop_bands).

Scenario: crawl corpora share boilerplate (cookie banners, footers, legal
text), so some LSH bands degenerate — one band value shared by a large
fraction of the corpus.  Probing an increment against the index then pays
|new_in_band| x |indexed_in_band| candidate rows for every degenerate
band: O(corpus^2 / bands) work for zero recall value (pathological bands
discriminate nothing; real near-dups still share their OTHER bands).

Corpus: every doc = one shared boilerplate block + a unique filler block
sized so (a) random doc pairs sit far below the 0.8 Jaccard threshold (not
near-dups) but (b) each band has a real probability that all its minima
come from boilerplate shingles — the degenerate-band mechanism itself, not
a synthetic plant.  True near-dups: every 50th doc of increment 2 copies
an increment-1 doc verbatim.

Protocol (both legs fresh-process, same corpus, 16 CPUs):
  A. baseline — increment 1 -> index; increment 2 probes it raw.
  B. frozen  — same, plus write_stop_bands(max_band_rows) between
     commit and probe.
Reported: probe wall time both legs, frozen-band count, per-band
occupancy of the top bands (the candidate bound), and the dropped-id sets
— which must be IDENTICAL (recall preserved by the surviving bands).

Usage: python tools/stopband_drill.py [--docs 200000] [--child ...]
Prints one JSON line; redirect to BENCH/STOPBAND_r5.json.
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

CACHE = "/tmp/ipe_stopband"
BOILER_WORDS = 80      # shared block
UNIQUE_WORDS = 75      # per-doc block: ratio 0.516 -> P(band all-boiler)
                       # ~= 0.5% at 8 rows/band; pair Jaccard ~= 0.35


def input_path(n_docs: int) -> str:
    return os.path.join(CACHE, f"docs-v1-{n_docs}")


def build_input(n_docs: int) -> str:
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    out = input_path(n_docs)
    if glob.glob(os.path.join(out, "*.parquet")):
        return out
    os.makedirs(out, exist_ok=True)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)
    rng0 = np.random.default_rng(99)
    vocab = [f"w{i:05d}" for i in range(50_000)]
    boiler = " ".join(vocab[i] for i in
                      rng0.integers(0, len(vocab), BOILER_WORDS))
    shard = 50_000
    half = n_docs // 2

    @ray.remote
    def write_shard(j: int) -> int:
        lo, hi = j * shard, min((j + 1) * shard, n_docs)
        rng = np.random.default_rng(1234 + j)
        texts = []
        for i in range(lo, hi):
            if i >= half and (i - half) % 50 == 0:
                # verbatim copy of an increment-1 doc -> true near-dup
                src = np.random.default_rng(5_000_000 + (i - half))
                uniq = " ".join(vocab[k] for k in
                                src.integers(0, 50_000, UNIQUE_WORDS))
            else:
                seed = 5_000_000 + i if i < half else 9_000_000 + i
                src = np.random.default_rng(seed)
                uniq = " ".join(vocab[k] for k in
                                src.integers(0, 50_000, UNIQUE_WORDS))
            texts.append(boiler + " " + uniq)
        tbl = pa.table({
            "doc_id": pa.array(np.arange(lo, hi, dtype=np.int64)),
            "text": pa.array(texts, pa.string()),
        })
        pq.write_table(tbl, os.path.join(out, f"s-{j:05d}.parquet"))
        return hi - lo

    ray.get([write_shard.remote(j) for j in range(-(-n_docs // shard))])
    return out


def run_leg(input_dir: str, n_docs: int, freeze: bool, cpus: int,
            max_band_rows: int) -> dict:
    import pyarrow as pa
    import pyarrow.compute as pc
    import ray
    import ray.data

    from insurance_pdf_extractor_ray.pipelines.minhashindex import (
        band_stats,
        minhash_dedup_incremental,
        minhash_index_append,
        write_stop_bands,
    )

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    ds = ray.data.read_parquet(input_dir)
    half = n_docs // 2

    def rng(lo, hi):
        def f(t: pa.Table) -> pa.Table:
            ids = t.column("doc_id")
            return t.filter(pc.and_(pc.greater_equal(ids, lo),
                                    pc.less(ids, hi)))
        return f

    import shutil

    index_dir = tempfile.mkdtemp(prefix="ipe_stopband_")
    inc1 = ds.map_batches(rng(0, half), batch_format="pyarrow")
    tmp1 = tempfile.mkdtemp(prefix="ipe_sb1_")
    kept1, sig1 = minhash_dedup_incremental(
        inc1, index_dir, "text", "doc_id", threshold=0.8,
        concurrency=(1, cpus), tmp_dir=tmp1)
    n_kept1 = kept1.count()
    minhash_index_append(index_dir, sig1, "doc_id")
    shutil.rmtree(tmp1, ignore_errors=True)

    top = band_stats(index_dir, top=5)
    occupancy = [{"band_key": str(r["band_key"]), "n": r["n"]}
                 for r in top.to_pylist()]
    frozen = write_stop_bands(index_dir, max_band_rows) if freeze else 0

    inc2 = ds.map_batches(rng(half, 1 << 62), batch_format="pyarrow")
    tmp2 = tempfile.mkdtemp(prefix="ipe_sb2_")
    t0 = time.time()
    kept2, _sig2 = minhash_dedup_incremental(
        inc2, index_dir, "text", "doc_id", threshold=0.8,
        concurrency=(1, cpus), tmp_dir=tmp2)
    kept_ids = sorted(r["doc_id"] for r in
                      kept2.select_columns(["doc_id"]).take_all())
    probe_sec = time.time() - t0
    dropped = sorted(set(range(half, n_docs)) - set(kept_ids))
    shutil.rmtree(tmp2, ignore_errors=True)
    shutil.rmtree(index_dir, ignore_errors=True)
    ray.shutdown()
    return {"probe_sec": round(probe_sec, 3), "n_kept1": n_kept1,
            "frozen_bands": frozen, "n_dropped": len(dropped),
            "dropped_head": dropped[:20], "top_band_occupancy": occupancy,
            "probe_docs_per_sec": round(half / probe_sec)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=16)
    ap.add_argument("--max-band-rows", type=int, default=1_000)
    ap.add_argument("--child", choices=["baseline", "frozen"])
    args = ap.parse_args()

    if args.child:
        print(json.dumps(run_leg(input_path(args.docs), args.docs,
                                 args.child == "frozen", args.cpus,
                                 args.max_band_rows)))
        return

    build_input(args.docs)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    legs = {}
    for mode in ("baseline", "frozen"):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--child", mode,
             "--docs", str(args.docs), "--cpus", str(args.cpus),
             "--max-band-rows", str(args.max_band_rows)],
            capture_output=True, text=True, timeout=5400)
        line = [ln for ln in proc.stdout.strip().splitlines()
                if ln.startswith("{")][-1]
        legs[mode] = json.loads(line)
    base, froz = legs["baseline"], legs["frozen"]
    print(json.dumps({
        "metric": ("stop-band freeze: probe speedup and preserved recall "
                   f"({args.docs} docs, 2 increments, "
                   f"{args.cpus} CPUs, fresh processes)"),
        "value": round(base["probe_sec"] / froz["probe_sec"], 2),
        "unit": "x probe speedup",
        "recall_identical": (base["n_dropped"] == froz["n_dropped"]
                             and base["dropped_head"]
                             == froz["dropped_head"]),
        "n_docs": args.docs,
        "max_band_rows": args.max_band_rows,
        "baseline": base,
        "frozen": froz,
    }))


if __name__ == "__main__":
    main()
