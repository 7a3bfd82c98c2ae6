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

Join-family inputs are generated synthetically instead (uniform keys,
skew-free; see build_join_input / build_asof_input) and minhash_inc
replays the docs input as three replica-interleaved ingest increments
against the at-rest bucketed index.

Usage:
    python tools/op_scaling.py minhash      --docs 200000
    python tools/op_scaling.py exact_dedup  --docs 1000000
    python tools/op_scaling.py shuffle_join --docs 400000000
    python tools/op_scaling.py asof_join    --docs 300000000
    python tools/op_scaling.py minhash_inc  --docs 4800000
    python tools/op_scaling.py --child ...  (internal: one timed leg)

Size --docs so the 16-CPU leg runs >=60 s (shorter legs are
startup-dominated and report fake efficiency).  Prints one JSON line;
redirect to BENCH/SCALING_r<N>_<op>.json.
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


def join_input_path(n_rows: int) -> str:
    return os.path.join(CACHE, f"join-v1-{n_rows}")


def build_join_input(n_rows: int) -> str:
    """orders x lineitem - shaped two-table input: ``right/`` holds n_rows
    fact rows over a key space of n_rows//4 orderkeys (uniform, skew-free),
    ``left/`` one dimension-fact row per orderkey.  Deterministic per-shard
    numpy generation, written distributed."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    out = join_input_path(n_rows)
    if glob.glob(os.path.join(out, "right", "*.parquet")):
        return out
    os.makedirs(os.path.join(out, "left"), exist_ok=True)
    os.makedirs(os.path.join(out, "right"), exist_ok=True)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)
    n_keys = n_rows // 4
    shard = 2_000_000
    n_right = -(-n_rows // shard)
    n_left = -(-n_keys // shard)

    @ray.remote
    def write_shard(side: str, j: int) -> int:
        rng = np.random.default_rng(1000 + j if side == "right" else j)
        if side == "left":
            lo, hi = j * shard, min((j + 1) * shard, n_keys)
            tbl = pa.table({
                "o_orderkey": pa.array(np.arange(lo, hi, dtype=np.int64)),
                "o_custkey": pa.array(
                    rng.integers(0, n_keys // 8 + 1, hi - lo), pa.int64()),
            })
        else:
            lo, hi = j * shard, min((j + 1) * shard, n_rows)
            tbl = pa.table({
                "l_orderkey": pa.array(
                    rng.integers(0, n_keys, hi - lo), pa.int64()),
                "l_extendedprice": pa.array(
                    rng.uniform(1.0, 1e5, hi - lo), pa.float64()),
            })
        pq.write_table(tbl, os.path.join(out, side, f"s-{j:05d}.parquet"))
        return hi - lo

    ray.get([write_shard.remote("left", j) for j in range(n_left)]
            + [write_shard.remote("right", j) for j in range(n_right)])
    return out


def asof_input_path(n_rows: int) -> str:
    return os.path.join(CACHE, f"asof-v1-{n_rows}")


def build_asof_input(n_rows: int) -> str:
    """events x quotes - shaped as-of input: ``left/`` n_rows (k, t) probe
    rows over n_rows//100 keys, ``right/`` n_rows//4 (k, t, v) state rows —
    uniform keys and timestamps (skew-free; the salted variant has its own
    drill in tests)."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray

    out = asof_input_path(n_rows)
    if glob.glob(os.path.join(out, "left", "*.parquet")):
        return out
    os.makedirs(os.path.join(out, "left"), exist_ok=True)
    os.makedirs(os.path.join(out, "right"), exist_ok=True)
    if not ray.is_initialized():
        ray.init(address="local", num_cpus=16, include_dashboard=False,
                 log_to_driver=False)
    n_keys = max(n_rows // 100, 1)
    n_right = n_rows // 4
    shard = 2_000_000

    @ray.remote
    def write_shard(side: str, j: int) -> int:
        total = n_rows if side == "left" else n_right
        lo, hi = j * shard, min((j + 1) * shard, total)
        rng = np.random.default_rng((5000 if side == "left" else 7000) + j)
        cols = {
            "k": pa.array(rng.integers(0, n_keys, hi - lo), pa.int64()),
            "t": pa.array(rng.integers(0, 1 << 40, hi - lo), pa.int64()),
        }
        if side == "right":
            cols["v"] = pa.array(rng.uniform(0, 1, hi - lo), pa.float64())
        pq.write_table(pa.table(cols),
                       os.path.join(out, side, f"s-{j:05d}.parquet"))
        return hi - lo

    legs = [write_shard.remote("left", j)
            for j in range(-(-n_rows // shard))]
    legs += [write_shard.remote("right", j)
             for j in range(-(-n_right // shard))]
    ray.get(legs)
    return out


def run_leg(op: str, input_dir: str, cpus: int) -> dict:
    import ray
    import ray.data

    ray.init(address="local", num_cpus=cpus, include_dashboard=False,
             log_to_driver=False)
    if op in ("minhash", "exact_dedup"):
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
    elif op == "shuffle_join":
        from insurance_pdf_extractor_ray.pipelines.dedup import (
            join_partitions_for)
        from insurance_pdf_extractor_ray.pipelines.joins import shuffle_join

        left = ray.data.read_parquet(os.path.join(input_dir, "left"))
        right = ray.data.read_parquet(os.path.join(input_dir, "right"))
        n_rows = right.count()
        t0 = time.time()
        n_out = shuffle_join(
            right, left, on="l_orderkey", right_on="o_orderkey",
            num_partitions=join_partitions_for(n_rows)).count()
    elif op == "asof_join":
        from insurance_pdf_extractor_ray.pipelines.joins import asof_join

        left = ray.data.read_parquet(os.path.join(input_dir, "left"))
        right = ray.data.read_parquet(os.path.join(input_dir, "right"))
        n_rows = left.count()
        t0 = time.time()
        n_out = asof_join(left, right, by="k", on="t",
                          value_col="v").count()
    elif op == "minhash_inc":
        # the continuous-crawl shape minhashindex.py exists for: three
        # ingest increments, each deduped against the at-rest bucketed
        # index built by its predecessors, then committed
        import shutil
        import tempfile

        import pyarrow as pa
        import pyarrow.compute as pc

        from insurance_pdf_extractor_ray.pipelines.minhashindex import (
            minhash_dedup_incremental, minhash_index_append)

        ds = ray.data.read_parquet(input_dir)
        n_rows = ds.count()
        index_dir = tempfile.mkdtemp(prefix="ipe_incscale_")
        incs = []
        t0 = time.time()
        n_out = 0
        for i in range(3):
            def part(t: pa.Table, i=i) -> pa.Table:
                rep = pc.divide(t.column("doc_id"), 10_000_000)
                return t.filter(pc.equal(
                    pc.subtract(rep, pc.multiply(pc.divide(rep, 3), 3)), i))

            ti = time.time()
            inc = ds.map_batches(part, batch_format="pyarrow")
            inc_tmp = tempfile.mkdtemp(prefix=f"ipe_incsc_{i}_")
            kept, sig_rows = minhash_dedup_incremental(
                inc, index_dir, "text", "doc_id", threshold=0.8,
                concurrency=(1, cpus), tmp_dir=inc_tmp)
            n_kept = kept.count()
            minhash_index_append(index_dir, sig_rows, "doc_id")
            n_out += n_kept
            incs.append({"inc": i, "sec": round(time.time() - ti, 3),
                         "kept": n_kept})
            # band+candidate staging is ~10s of GB per increment at drill
            # scale; reclaim it before the next increment or the 2-leg
            # drill ENOSPCs the sandbox disk
            shutil.rmtree(inc_tmp, ignore_errors=True)
        shutil.rmtree(index_dir, ignore_errors=True)
        sec = time.time() - t0
        ray.shutdown()
        return {"sec": round(sec, 3), "n_rows": n_rows, "n_out": n_out,
                "rows_per_sec": round(n_rows / sec), "increments": incs}
    else:
        raise SystemExit(f"unknown op {op}")
    sec = time.time() - t0
    ray.shutdown()
    return {"sec": round(sec, 3), "n_rows": n_rows, "n_out": n_out,
            "rows_per_sec": round(n_rows / sec)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("op", choices=["minhash", "exact_dedup",
                                   "shuffle_join", "asof_join",
                                   "minhash_inc"])
    ap.add_argument("--docs", type=int, default=200_000)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--cpus", type=int, default=16)
    args = ap.parse_args()

    paths = {"shuffle_join": join_input_path, "asof_join": asof_input_path}
    builders = {"shuffle_join": build_join_input,
                "asof_join": build_asof_input}

    if args.child:
        input_dir = paths.get(args.op, input_path)(args.docs)
        print(json.dumps(run_leg(args.op, input_dir, args.cpus)))
        return

    builders.get(args.op, build_input)(args.docs)
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
    input_desc = {
        "shuffle_join": (f"synthetic orders x lineitem shape: {args.docs} "
                         f"fact rows over {args.docs // 4} uniform orderkeys"
                         " + one left row per key (skew-free)"),
        "asof_join": (f"synthetic events x quotes shape: {args.docs} probe "
                      f"rows over {args.docs // 100} uniform keys, "
                      f"{args.docs // 4} state rows, uniform timestamps "
                      "(skew-free)"),
        "minhash_inc": (f"sf0.1 documents replicated to {args.docs} docs, "
                        "word-shuffled per replica, ingested as 3 replica-"
                        "interleaved increments against the at-rest index"),
    }.get(args.op, (f"sf0.1 documents replicated to {args.docs} docs, "
                    "word-shuffled per replica (size-2 planted exact-dup "
                    "groups, skew-free)"))
    print(json.dumps({
        "metric": (f"scaling efficiency of {args.op} "
                   "(4 vs 16 CPUs, fresh processes, same input)"),
        "value": round((r16 / r4) / 4.0, 3),
        "unit": "efficiency",
        "n_rows": legs[4]["n_rows"],
        "input": input_desc,
        "n_out_4cpu": legs[4]["n_out"],
        "n_out_16cpu": legs[16]["n_out"],
        "sec_4cpu": legs[4]["sec"],
        "sec_16cpu": legs[16]["sec"],
        "rows_per_sec_4cpu": r4,
        "rows_per_sec_16cpu": r16,
        **({"increments_4cpu": legs[4]["increments"],
            "increments_16cpu": legs[16]["increments"]}
           if "increments" in legs[4] else {}),
    }))


if __name__ == "__main__":
    main()
