"""Kill-and-resume semantics of the partition-manifest checkpoint."""

import glob
import json
import os

import pyarrow.parquet as pq
import pytest

import ray.data

from insurance_pdf_extractor_ray.pipelines.extraction import extract_pipeline, flatten_fields
from insurance_pdf_extractor_ray.sources import synth
from insurance_pdf_extractor_ray.state import checkpoint

pytestmark = pytest.mark.usefixtures("ray_session")


@pytest.fixture()
def sharded_input(tmp_path):
    d = tmp_path / "in"
    d.mkdir()
    for i in range(6):
        tbl = synth.docs_table(range(i * 50, (i + 1) * 50))
        pq.write_table(tbl, d / f"frag-{i}.parquet")
    return str(d)


def _pipeline(ds):
    return flatten_fields(extract_pipeline(ds, concurrency=2))


def test_run_then_full_resume(sharded_input, tmp_path):
    out = str(tmp_path / "out")
    res1 = checkpoint.run_partitioned(sharded_input, out, _pipeline, num_partitions=3)
    assert res1 == {"partitions_run": 3, "partitions_skipped": 0, "rows": 300}
    # resume: everything committed -> nothing re-runs
    res2 = checkpoint.run_partitioned(sharded_input, out, _pipeline, num_partitions=3)
    assert res2 == {"partitions_run": 0, "partitions_skipped": 3, "rows": 300}


def test_kill_and_resume(sharded_input, tmp_path):
    out = str(tmp_path / "out")
    checkpoint.run_partitioned(sharded_input, out, _pipeline, num_partitions=3)
    # simulate a crash after partition 1's data write but before its manifest
    # commit: delete the manifest and corrupt the data dir
    os.remove(os.path.join(out, "_manifest", "part-1.json"))
    part1 = os.path.join(out, "part-1")
    for f in glob.glob(os.path.join(part1, "*.parquet"))[:1]:
        os.remove(f)  # torn output
    res = checkpoint.run_partitioned(sharded_input, out, _pipeline, num_partitions=3)
    assert res["partitions_run"] == 1 and res["partitions_skipped"] == 2
    # all rows present exactly once
    total = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(out, "part-*", "*.parquet"))
    )
    assert total == 300


def test_config_change_invalidates(sharded_input, tmp_path):
    out = str(tmp_path / "out")
    checkpoint.run_partitioned(sharded_input, out, _pipeline, num_partitions=2,
                               config={"v": 1})
    res = checkpoint.run_partitioned(sharded_input, out, _pipeline, num_partitions=2,
                                     config={"v": 2})
    assert res["partitions_run"] == 2  # config hash mismatch -> re-run

    man = json.load(open(glob.glob(os.path.join(out, "_manifest", "*.json"))[0]))
    assert {"partition", "input_files", "rows", "config_hash", "wall_time_sec"} <= set(man)


def test_partition_count_change_invalidates(sharded_input, tmp_path):
    """Changing num_partitions reassigns files; a manifest whose input_files
    no longer match must NOT be skipped (silent row loss/dup otherwise)."""
    out = str(tmp_path / "out")
    checkpoint.run_partitioned(sharded_input, out, _pipeline, num_partitions=3)
    res = checkpoint.run_partitioned(sharded_input, out, _pipeline, num_partitions=2)
    # 3->2 partitions: every partition's file list changed -> all re-run
    assert res["partitions_skipped"] == 0
    total = sum(
        pq.ParquetFile(f).metadata.num_rows
        for f in glob.glob(os.path.join(out, "part-0", "*.parquet"))
        + glob.glob(os.path.join(out, "part-1", "*.parquet"))
    )
    assert total == 300


def test_new_fragment_invalidates_affected_partitions(sharded_input, tmp_path):
    """Adding an input fragment must re-run the partitions whose assignment
    changed, and the final output must contain every row exactly once."""
    out = str(tmp_path / "out")
    checkpoint.run_partitioned(sharded_input, out, _pipeline, num_partitions=3)
    tbl = synth.docs_table(range(300, 350))
    pq.write_table(tbl, os.path.join(sharded_input, "frag-6.parquet"))
    res = checkpoint.run_partitioned(sharded_input, out, _pipeline, num_partitions=3)
    assert res["partitions_run"] >= 1
    assert res["rows"] == 350


def test_flagship_sigkill_resume_bucketed(tmp_path):
    """REAL mid-run kill: the flagship runs over a bucketed layout in a child
    process that is SIGKILLed after some manifests commit; a fresh resume
    must skip exactly the committed buckets and produce every doc exactly
    once.  (The sf0.1-scale version of this drill is tools/resume_drill.py,
    artifact BENCH/RESUME_r3.json.)"""
    import signal
    import subprocess
    import sys
    import time

    from insurance_pdf_extractor_ray.sources.io import write_bucketed

    layout = str(tmp_path / "bucketed")
    out = str(tmp_path / "out")
    write_bucketed(ray.data.from_arrow(synth.docs_table(range(1200))),
                   layout, key="doc_id", num_buckets=6)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    child_code = f"""
import sys; sys.path.insert(0, {repo!r})
import ray
ray.init(address="local", num_cpus=2, include_dashboard=False)
from insurance_pdf_extractor_ray.pipelines.extraction import extract_pipeline, flatten_fields
from insurance_pdf_extractor_ray.sources.io import bucket_partitions
from insurance_pdf_extractor_ray.state import checkpoint
res = checkpoint.run_partitioned(
    "", {out!r}, lambda ds: flatten_fields(extract_pipeline(ds)),
    config={{"v": 1}}, partitions=bucket_partitions({layout!r}))
print("CHILD_DONE", res)
ray.shutdown()
"""

    def launch():
        return subprocess.Popen([sys.executable, "-c", child_code],
                                stdout=subprocess.PIPE,
                                stderr=subprocess.STDOUT,
                                preexec_fn=os.setsid)

    man_glob = os.path.join(out, "_manifest", "part-*.json")
    child = launch()
    killed = False
    deadline = time.time() + 180
    while child.poll() is None and time.time() < deadline:
        if len(glob.glob(man_glob)) >= 2:
            os.killpg(os.getpgid(child.pid), signal.SIGKILL)
            killed = True
            break
        time.sleep(0.1)
    child.wait()
    assert killed, "child finished before kill threshold; enlarge corpus"
    n_committed = len(glob.glob(man_glob))
    assert n_committed < 6

    child2 = launch()
    out_text = child2.communicate()[0].decode()
    assert child2.returncode == 0 and "CHILD_DONE" in out_text, out_text[-2000:]
    assert f"'partitions_skipped': {n_committed}" in out_text

    ids = ray.data.read_parquet(
        glob.glob(os.path.join(out, "part-*", "*.parquet")),
        columns=["doc_id"]).take_all()
    id_list = [r["doc_id"] for r in ids]
    assert len(id_list) == 1200 and len(set(id_list)) == 1200
    assert len(glob.glob(man_glob)) == 6


def test_bucketed_layout_end_to_end(tmp_path):
    """write_bucketed -> run_partitioned(bucket_partitions): per-bucket
    reassembly with NO corpus-wide shuffle produces golden-exact output even
    for multi-row (sharded) docs, and resume skips finished buckets."""
    from insurance_pdf_extractor_ray.sources.io import (
        bucket_partitions,
        write_bucketed,
    )

    # multi_row family docs (i % 12 == 8) are split across rows out of order
    tbl = synth.docs_table(range(240))
    src = ray.data.from_arrow(tbl)
    layout = str(tmp_path / "bucketed")
    write_bucketed(src, layout, key="doc_id", num_buckets=5)

    parts = bucket_partitions(layout)
    assert len(parts) == 5 and all(p for p in parts)

    out = str(tmp_path / "out")
    res = checkpoint.run_partitioned(
        "", out, _pipeline, config={"v": 1}, partitions=parts)
    assert res["partitions_run"] == 5 and res["rows"] == 240

    got = {r["doc_id"]: r for r in ray.data.read_parquet(
        glob.glob(os.path.join(out, "part-*", "*.parquet"))).take_all()}
    assert len(got) == 240  # every doc exactly once (no split-doc dupes)
    for i in range(0, 240, 7):
        spec = synth.build_doc(i)
        row = got[spec.doc_id]
        for f, v in spec.expected_fields.items():
            assert row[f] == v, (i, f)

    # resume: nothing re-runs
    res2 = checkpoint.run_partitioned(
        "", out, _pipeline, config={"v": 1}, partitions=parts)
    assert res2 == {"partitions_run": 0, "partitions_skipped": 5, "rows": 240}


def test_run_metrics_surfaces_lineage(sharded_input, tmp_path):
    out = str(tmp_path / "out")
    checkpoint.run_partitioned(sharded_input, out, _pipeline,
                               num_partitions=3,
                               config={"rules_version": "v1"})
    m = checkpoint.run_metrics(out)
    assert m.num_rows == 3
    assert sum(m.column("rows").to_pylist()) == 300
    assert set(m.column("rules_version").to_pylist()) == {"v1"}
    assert all(n >= 1 for n in m.column("n_input_files").to_pylist())
    assert len(set(m.column("config_hash").to_pylist())) == 1


def test_compact_partitions_preserves_rows_and_resume(sharded_input, tmp_path):
    out = str(tmp_path / "out")
    checkpoint.run_partitioned(sharded_input, out, _pipeline, num_partitions=3)
    files_before = glob.glob(os.path.join(out, "part-*", "*.parquet"))
    # force every partition to look "small-file" so compaction runs
    res = checkpoint.compact_partitions(out, target_rows_per_file=1_000_000,
                                        min_files=0)
    assert res["compacted"] == 3
    assert res["files_after"] <= res["files_before"] == len(files_before)
    # rows intact, per partition and in total
    total = 0
    for i in range(3):
        part_files = glob.glob(os.path.join(out, f"part-{i}", "*.parquet"))
        assert len(part_files) == 1  # 100 rows << target -> one file
        total += sum(pq.ParquetFile(f).metadata.num_rows for f in part_files)
    assert total == 300
    # manifests untouched: a resume still skips everything
    res2 = checkpoint.run_partitioned(sharded_input, out, _pipeline,
                                      num_partitions=3)
    assert res2 == {"partitions_run": 0, "partitions_skipped": 3, "rows": 300}
    # second compaction is a no-op (already at <= min_files defaults)
    res3 = checkpoint.compact_partitions(out)
    assert res3["compacted"] == 0 and res3["skipped"] == 3
