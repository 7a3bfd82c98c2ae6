"""Flagship kill-and-resume drill over the bucketed layout (round-3 item 6).

Phases:
  1. synthesize an sf0.1-scale corpus (50k docs) and ``write_bucketed`` it
     (all rows of a doc in one bucket dir);
  2. launch ``run_partitioned(extract_pipeline)`` over the bucket partitions
     in a CHILD process and SIGKILL it once some (but not all) manifests are
     committed — a real mid-run crash, not a simulation;
  3. resume in a fresh process;
  4. validate exactly-once output: every doc_id present exactly once, counts
     match the corpus, manifest count matches the bucket count.

Writes BENCH/RESUME_r<N>.json.  Usage:
    python tools/resume_drill.py [num_docs] [num_buckets]
"""

import glob
import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CHILD = r"""
import os, sys
sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus={cpus}, include_dashboard=False)
from insurance_pdf_extractor_ray.pipelines.extraction import extract_pipeline, flatten_fields
from insurance_pdf_extractor_ray.sources.io import bucket_partitions
from insurance_pdf_extractor_ray.state import checkpoint

parts = bucket_partitions({layout!r})
res = checkpoint.run_partitioned(
    "", {out!r},
    lambda ds: flatten_fields(extract_pipeline(ds)),
    config={{"job": "resume-drill", "rules_version": "v1"}},
    partitions=parts)
print("CHILD_DONE", res)
ray.shutdown()
"""


def build_corpus(num_docs: int, layout: str, num_buckets: int) -> None:
    import ray

    ray.init(address="local", num_cpus=16, include_dashboard=False)
    import ray.data

    from insurance_pdf_extractor_ray.sources.io import write_bucketed
    from insurance_pdf_extractor_ray.sources.synth import docs_table

    def gen(batch):
        return docs_table(batch["id"])

    ds = ray.data.range(num_docs, override_num_blocks=max(1, num_docs // 4000))
    ds = ds.map_batches(gen, batch_format="numpy", batch_size=4000)
    write_bucketed(ds, layout, key="doc_id", num_buckets=num_buckets)
    ray.shutdown()


def launch(layout: str, out: str, cpus: int) -> subprocess.Popen:
    code = CHILD.format(repo=REPO, layout=layout, out=out, cpus=cpus)
    return subprocess.Popen([sys.executable, "-c", code],
                            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                            preexec_fn=os.setsid)


def main() -> int:
    num_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 50_000
    num_buckets = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    kill_after = max(2, num_buckets // 4)
    base = f"/tmp/resume_drill_{num_docs}"
    layout = os.path.join(base, "bucketed")
    out = os.path.join(base, "out")
    man_glob = os.path.join(out, "_manifest", "part-*.json")

    t0 = time.time()
    if not glob.glob(os.path.join(layout, "bucket=*")):
        print("building corpus ...")
        build_corpus(num_docs, layout, num_buckets)
    import shutil

    shutil.rmtree(out, ignore_errors=True)
    t_build = time.time() - t0

    # phase A: run + SIGKILL mid-run
    print(f"phase A: launch + SIGKILL after {kill_after} manifests ...")
    t1 = time.time()
    child = launch(layout, out, cpus=16)
    killed_at_manifests = -1
    while child.poll() is None:
        n = len(glob.glob(man_glob))
        if n >= kill_after:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            killed_at_manifests = n
            break
        time.sleep(0.2)
    child.wait()
    if killed_at_manifests < 0:
        print("FAIL: child finished before the kill threshold — corpus too small")
        return 1
    committed_after_kill = len(glob.glob(man_glob))
    t_kill = time.time() - t1

    # phase B: resume in a fresh process
    print(f"phase B: resume (killed at {committed_after_kill} manifests) ...")
    t2 = time.time()
    child2 = launch(layout, out, cpus=16)
    out_text = child2.communicate()[0].decode()
    if child2.returncode != 0 or "CHILD_DONE" not in out_text:
        print("FAIL: resume run did not complete\n", out_text[-2000:])
        return 1
    t_resume = time.time() - t2
    summary_line = [l for l in out_text.splitlines() if "CHILD_DONE" in l][0]

    # phase C: exactly-once validation (pure pyarrow, no Ray needed)
    import pyarrow.dataset as pads

    tbl = pads.dataset(glob.glob(os.path.join(out, "part-*", "*.parquet"))
                       ).to_table(columns=["doc_id"])
    ids = tbl.column("doc_id").to_pylist()
    n_rows, n_unique = len(ids), len(set(ids))
    manifests = glob.glob(man_glob)
    ok = (n_rows == num_docs and n_unique == num_docs
          and len(manifests) == num_buckets)
    result = {
        "num_docs": num_docs,
        "num_buckets": num_buckets,
        "killed_at_manifests": committed_after_kill,
        "rows_out": n_rows,
        "unique_docs_out": n_unique,
        "manifests": len(manifests),
        "resume_summary": summary_line.split("CHILD_DONE", 1)[1].strip(),
        "build_sec": round(t_build, 2),
        "killed_run_sec": round(t_kill, 2),
        "resume_sec": round(t_resume, 2),
        "exactly_once": ok,
    }
    print(json.dumps(result, indent=1))
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "RESUME_r5.json"), "w") as f:
        json.dump(result, f, indent=1)
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
