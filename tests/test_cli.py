"""CLI driver programs: synth -> run -> stats -> export -> manifest.

Subprocess-driven (each CLI command owns its Ray session), so these are
moderately slow; they cover the ops entry points (SURVEY.md §3.3).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli(*args, timeout=600):
    proc = subprocess.run(
        [sys.executable, "-m", "insurance_pdf_extractor_ray.cli", *args],
        capture_output=True, text=True, timeout=timeout,
        env={**os.environ, "PYTHONPATH": REPO}, cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    # take the last stdout line that parses as JSON (Ray may log dict reprs)
    for ln in reversed(proc.stdout.strip().splitlines()):
        if ln.startswith("{"):
            try:
                return json.loads(ln)
            except json.JSONDecodeError:
                continue
    return None


def test_cli_end_to_end(tmp_path):
    corpus = tmp_path / "corpus"
    out = tmp_path / "results"
    exp = tmp_path / "export"

    r = _cli("synth", "--num-docs", "300", "--out", str(corpus))
    assert r["num_docs"] == 300

    # 300 docs -> one parquet fragment -> partitions capped at 1 (partitions
    # are input-fragment groups; never more partitions than fragments)
    r = _cli("run", "--input", r["documents"], "--out", str(out),
             "--partitions", "2", "--flat")
    assert r["rows"] == 300 and r["partitions_run"] == 1

    man = _cli("manifest", "--out", str(out))
    assert man["committed"] == [0] and man["rows"] == 300

    stats = _cli("stats", "--results", str(out / "part-0"))
    assert stats["rows"] > 0
    assert any(b["status"] == "success" for b in stats["status_breakdown"])

    r = _cli("export", "--results", str(out / "part-0"), "--out", str(exp),
             "--format", "csv", "--limit", "50")
    assert r["format"] == "csv"
    assert any(f.endswith(".csv") for f in os.listdir(exp))


def test_cli_dedup_and_quality(tmp_path):
    """dedup/quality subcommands over a table with planted dups and junk."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    good = ("the policy provides coverage for the insured and it is subject "
            "to the terms that apply in this state for one full year")
    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([good, good, good + " extra", "zz qq vv kk ww nn",
                          good.replace(" ", ""), good + " more words here"]),
    }), src / "part.parquet")

    r = _cli("dedup", "--input", str(src), "--out", str(tmp_path / "dd"),
             "--method", "exact")
    assert r == {"method": "exact", "rows_in": 6, "rows_kept": 5,
                 "rows_dropped": 1}

    r = _cli("quality", "--input", str(src), "--out", str(tmp_path / "qf"))
    # the no-stopword short-word doc and the one-giant-word doc are dropped
    assert r["rows_in"] == 6 and r["rows_kept"] == 4


def test_cli_sample_profile_pack(tmp_path):
    """New subcommands end-to-end over a small parquet table."""
    import json as _json

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from insurance_pdf_extractor_ray.cli import main

    src = tmp_path / "docs"
    src.mkdir()
    n = 500
    pq.write_table(pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "text": pa.array([f"tok{i} alpha beta gamma" for i in range(n)], pa.string()),
    }), src / "part.parquet")

    main(["sample", "--input", str(src), "--out", str(tmp_path / "s"),
          "--rate", "0.2", "--seed", "5"])
    out = pq.read_table(str(tmp_path / "s"))
    assert 50 < out.num_rows < 150

    main(["profile", "--input", str(src), "--columns", "doc_id"])

    main(["pack", "--input", str(src), "--out", str(tmp_path / "p"),
          "--seq-len", "128", "--bucket", "100"])
    packed = pq.read_table(str(tmp_path / "p"))
    assert packed.num_rows >= n  # every doc appears at least once
    assert set(packed.column_names) == {"doc_id", "seq_id", "start_tok", "end_tok"}


def test_cli_mix_redact_hh(tmp_path):
    corpus = tmp_path / "c"
    r = _cli("synth", "--num-docs", "200", "--out", str(corpus))
    docs = r["documents"]

    # the synthetic corpus has no `source`/plain-text cols; use the sf table
    sf_docs = "/root/testdata/sf0.001/documents.parquet"
    mix_out = tmp_path / "mix"
    r = _cli("mix", "--input", sf_docs, "--out", str(mix_out),
             "--weights", "src0=2.0", "src1=0.5", "--shards", "4")
    assert r["rows_in"] == 500
    # src0: 2 full epochs of 25; src1: ~12-13 of 25
    assert 55 <= r["rows_out"] <= 70

    red_out = tmp_path / "red"
    r = _cli("redact", "--input", sf_docs, "--out", str(red_out),
             "--deny", "table", "row")
    assert r["redactions"]["n_email"] == 0
    assert r["redactions"]["n_deny"] > 0

    r = _cli("hh", "--input", "/root/testdata/sf0.001/events.parquet",
             "--col", "event_type", "--threshold", "100")
    vals = {v["value"] for v in r["values"]}
    assert vals == {"click", "error", "purchase", "signup", "view"}


def test_cli_compact_shuffle(tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    frag = tmp_path / "frag"
    frag.mkdir()
    for i in range(12):
        pq.write_table(
            pa.table({"doc_id": pa.array(range(i * 50, i * 50 + 50))}),
            frag / f"f{i:02d}.parquet")

    r = _cli("compact", "--input", str(frag), "--out",
             str(tmp_path / "cp"), "--min-rows", "300", "--max-rows", "600")
    assert r == {"rows": 600, "files_in": 12, "files_out": r["files_out"]}
    assert r["files_out"] <= 2

    r = _cli("shuffle", "--input", str(tmp_path / "cp"),
             "--out", str(tmp_path / "sh"), "--id-col", "doc_id",
             "--seed", "3")
    assert r["rows"] == 600
    back = pq.read_table(str(tmp_path / "sh")).column("doc_id").to_pylist()
    assert sorted(back) == list(range(600))
    assert back != sorted(back)
