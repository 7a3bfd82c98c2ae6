"""Operator-level scaling drill: run ONE operator at 4 and 16 CPUs in fresh
processes over the same large input and report throughput + efficiency —
the sandbox evidence for the north rule's two-cluster-size criterion at the
granularity of a single exchange (extends BENCH/SCALING_r3_ops.json's
session_windows method to the dedup family).

Input: the sf0.1 documents table replicated R times with deterministically
word-shuffled text per replica (numpy permutation seeded by replica id), so
replica texts are NOT near-duplicates of each other (different k-gram
shingle sets) — plus every 10th doc of replica 1 ONLY copies replica 0's
text verbatim, planting exact-dup GROUPS OF SIZE 2 (a group per replica
would concentrate all copies of a text into one LSH bucket / one hash
group, and the measurement would be the planted skew, not the operator).

Usage:
    python tools/op_scaling.py minhash      --docs 200000
    python tools/op_scaling.py exact_dedup  --docs 1000000
    python tools/op_scaling.py --child ...  (internal: one timed leg)

Prints one JSON line; redirect to BENCH/SCALING_r4_<op>.json.
"""

import argparse
import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
CACHE = "/tmp/ipe_opscale"


def input_path(n_docs: int) -> str:
    """Single source of truth for the generated-input cache dir (bump the
    version tag whenever the generator changes)."""
    return os.path.join(CACHE, f"docs-v3-{n_docs}")


def build_input(n_docs: int) -> str:
    """Replicated documents table under CACHE (idempotent, one file per
    replica, written distributed)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray
    import ray.data

    out = input_path(n_docs)
    if glob.glob(os.path.join(out, "*.parquet")):
        return out
    os.makedirs(out, exist_ok=True)
    base = pq.read_table(os.path.join(SF_DIR, "documents.parquet"),
                         columns=["doc_id", "text"])
    n_base = base.num_rows
    reps = -(-n_docs // n_base)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)
    base_ref = ray.put(base)

    @ray.remote
    def write_replica(j: int) -> int:
        b = ray.get(base_ref)
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        texts = b.column("text").to_pylist()
        rng = np.random.default_rng(j)
        rng0 = np.random.default_rng(0)
        out_texts = []
        for i, t in enumerate(texts):
            words = (t or "").split(" ")
            perm0 = rng0.permutation(len(words))  # kept in lockstep with j=0
            if j == 0 or (j == 1 and i % 10 == 0):
                # replica 0's shuffle; on replica 1 every 10th doc copies it
                # verbatim -> planted size-2 exact-dup groups
                out_texts.append(" ".join(words[k] for k in perm0))
                continue
            perm = rng.permutation(len(words))
            out_texts.append(" ".join(words[k] for k in perm))
        tbl = pa.table({
            "doc_id": pa.array(ids + np.int64(j) * np.int64(10_000_000),
                               pa.int64()),
            "text": pa.array(out_texts, pa.string()),
        })
        pq.write_table(tbl, os.path.join(out, f"rep-{j:05d}.parquet"))
        return tbl.num_rows

    ray.get([write_replica.remote(j) for j in range(reps)])
    return out


def run_leg(op: str, input_dir: str, cpus: int) -> dict:
    import ray
    import ray.data

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    ds = ray.data.read_parquet(input_dir)
    n_rows = ds.count()
    t0 = time.time()
    if op == "minhash":
        from insurance_pdf_extractor_ray.pipelines.dedup import minhash_dup_ids

        if os.environ.get("OPSCALE_DEBUG"):
            print("DBG input:", input_dir, "files:",
                  len(glob.glob(os.path.join(input_dir, "*.parquet"))),
                  file=sys.stderr)
        # autoscaling (1, cpus): a FIXED pool of cpus actors holds every
        # CPU slot and starves the upstream read (measured: wedged leg)
        n_out = minhash_dup_ids(ds, "text", "doc_id", threshold=0.8,
                                concurrency=(1, cpus)).count()
    elif op == "exact_dedup":
        from insurance_pdf_extractor_ray.pipelines.dedup import exact_dedup

        # max_broadcast=0 forces the JOIN path (the 100-TB default shape)
        n_out = exact_dedup(ds, "text", "doc_id", max_broadcast=0).count()
    else:
        raise SystemExit(f"unknown op {op}")
    sec = time.time() - t0
    ray.shutdown()
    return {"sec": round(sec, 3), "n_rows": n_rows, "n_out": n_out,
            "rows_per_sec": round(n_rows / sec)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("op", choices=["minhash", "exact_dedup"])
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    if args.child:
        input_dir = input_path(args.docs)
        print(json.dumps(run_leg(args.op, input_dir, args.cpus)))
        return

    build_input(args.docs)
    import ray

    if ray.is_initialized():
        ray.shutdown()
    legs = {}
    for cpus in (4, 16):
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), args.op,
             "--child", "--cpus", str(cpus), "--docs", str(args.docs)],
            capture_output=True, text=True, timeout=5400)
        line = [ln for ln in proc.stdout.strip().splitlines()
                if ln.startswith("{")][-1]
        legs[cpus] = json.loads(line)
    r4, r16 = legs[4]["rows_per_sec"], legs[16]["rows_per_sec"]
    print(json.dumps({
        "metric": (f"scaling efficiency of {args.op} "
                   "(4 vs 16 CPUs, fresh processes, same input)"),
        "value": round((r16 / r4) / 4.0, 3),
        "unit": "efficiency",
        "n_rows": legs[4]["n_rows"],
        "input": (f"sf0.1 documents replicated to {args.docs} docs, "
                  "word-shuffled per replica (size-2 planted exact-dup "
                  "groups, skew-free)"),
        "n_out_4cpu": legs[4]["n_out"],
        "n_out_16cpu": legs[16]["n_out"],
        "sec_4cpu": legs[4]["sec"],
        "sec_16cpu": legs[16]["sec"],
        "rows_per_sec_4cpu": r4,
        "rows_per_sec_16cpu": r16,
    }))


if __name__ == "__main__":
    main()
