"""bench.py crash-guard bookkeeping (StageRunner) — no Ray needed."""

import json
import sys

sys.path.insert(0, "/root/repo")

from bench import StageRunner  # noqa: E402


def _state_lines(path):
    return [json.loads(ln) for ln in open(path)]


class TestStageRunner:
    def test_records_and_replays(self, tmp_path):
        state = str(tmp_path / "s.jsonl")
        q1: dict = {}
        r1 = StageRunner(state, q1)
        r1.run("a", lambda: None)
        r1.run("b", lambda: {"b_extra": [1, 2]})
        assert set(q1) == {"a", "b", "b_extra"}
        assert q1["b_extra"] == [1, 2]

        # a resumed runner replays both stages WITHOUT executing the bodies
        q2: dict = {}
        r2 = StageRunner(state, q2)

        def boom():
            raise AssertionError("must not re-run a completed stage")

        r2.run("a", boom)
        r2.run("b", boom)
        assert q2["a"] == q1["a"]
        assert q2["b_extra"] == [1, 2]
        assert r2.skipped == []

    def test_sec_override(self, tmp_path):
        q: dict = {}
        r = StageRunner(str(tmp_path / "s.jsonl"), q)
        r.run("x", lambda: {"__sec__": 42.5, "trials": [42.5, 50.0]})
        assert q["x"] == 42.5 and q["trials"] == [42.5, 50.0]

    def test_double_crash_skips_and_records(self, tmp_path):
        state = str(tmp_path / "s.jsonl")
        # simulate two process deaths mid-stage: two start records, no done
        with open(state, "w") as f:
            f.write(json.dumps({"stage": "bad", "status": "start"}) + "\n")
            f.write(json.dumps({"stage": "bad", "status": "start"}) + "\n")
        q: dict = {}
        r = StageRunner(state, q)

        def boom():
            raise AssertionError("a twice-crashed stage must be skipped")

        r.run("bad", boom)
        assert r.skipped == ["bad"]
        assert q["bad"] is None
        # the skip is durable: a later resume replays it as skipped
        q2: dict = {}
        r2 = StageRunner(state, q2)
        r2.run("bad", boom)
        assert r2.skipped == ["bad"] and q2["bad"] is None

    def test_single_crash_retries(self, tmp_path):
        state = str(tmp_path / "s.jsonl")
        with open(state, "w") as f:
            f.write(json.dumps({"stage": "flaky", "status": "start"}) + "\n")
        q: dict = {}
        r = StageRunner(state, q)
        ran = []
        r.run("flaky", lambda: ran.append(1))
        assert ran == [1] and q["flaky"] is not None and r.skipped == []

    def test_no_state_passthrough(self):
        q: dict = {}
        r = StageRunner(None, q)
        r.run("a", lambda: None)
        assert "a" in q and r.skipped == []
