"""Versioned extraction rule tables (§2.11): manager surface, same-corpus
differing goldens under v1 vs v2, row stamping, and manifest invalidation.

Reference analog: /root/reference/app/services/prompt_manager.py:14-132
(get_prompt / get_available_versions / validate_prompt_version / reload)
over config/prompts.yaml versions."""

import os

import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.pipelines.extraction import (
    extract_pipeline,
    flatten_fields,
)
from insurance_pdf_extractor_ray.ruleversions import (
    CUSTOM_RULES_VERSION,
    DEFAULT_RULES_VERSION,
    RuleVersionManager,
    resolve_rules,
    rule_manager,
)
from insurance_pdf_extractor_ray.sources.synth import docs_table as spans_table
from insurance_pdf_extractor_ray.stages.extract import FieldExtractor


class TestManagerSurface:
    def test_available_versions(self):
        assert rule_manager.get_available_versions() == ["v1", "v2"]

    def test_default_version(self):
        assert rule_manager.get_default_version() == DEFAULT_RULES_VERSION == "v1"

    def test_validate(self):
        assert rule_manager.validate_rule_version("v1")
        assert rule_manager.validate_rule_version("v2")
        assert not rule_manager.validate_rule_version("v99")

    def test_unknown_version_raises(self):
        with pytest.raises(ValueError, match="v99 not found"):
            rule_manager.get_rules("v99")

    def test_get_rules_cached_identity(self):
        m = RuleVersionManager()
        assert m.get_rules("v2") is m.get_rules("v2")
        m.clear_cache()
        # still equal after cache clear
        assert m.get_rules("v2") == rule_manager.get_rules("v2")

    def test_info(self):
        info = rule_manager.get_rule_info()  # default
        assert info["version"] == "v1" and info["is_default"]
        assert info["labels_count"] > 20 and info["fields_count"] >= 17
        bad = rule_manager.get_rule_info("nope")
        assert "error" in bad

    def test_v2_diffs_from_v1(self):
        v1, v2 = rule_manager.get_rules("v1"), rule_manager.get_rules("v2")
        assert "address" in v1 and "address" not in v2
        assert v2["policy number"] == "quote_number"
        assert "policy number" not in v1

    def test_register_and_reload(self):
        m = RuleVersionManager()
        m.register_version("v3", {"quote number": "quote_number"},
                           "minimal", make_default=True)
        assert m.get_default_version() == "v3"
        assert m.get_rules() == {"quote number": "quote_number"}
        m.reload()  # built-ins still present, registration kept
        assert set(m.get_available_versions()) == {"v1", "v2", "v3"}

    def test_resolve_rules(self):
        rules, tag = resolve_rules(None, None)
        assert tag == "v1" and "address" in rules
        rules, tag = resolve_rules(None, "v2")
        assert tag == "v2" and "address" not in rules
        rules, tag = resolve_rules({"x": "quote_number"}, "v2")
        assert tag == CUSTOM_RULES_VERSION and rules == {"x": "quote_number"}


def _fields_by_doc(ds):
    tbl = pa.concat_tables(
        [pa.table(b) for b in flatten_fields(ds).iter_batches(batch_format="pyarrow")]
    )
    return {r["doc_id"]: r for r in tbl.to_pylist()}


class TestSameCorpusDifferentGoldens:
    """The same corpus extracted under two rule versions yields different
    goldens: v2 drops the bare 'address' alias, so docs labelling the insured
    address with the bare form lose a schema-required field."""

    @pytest.fixture(scope="class")
    def corpus(self):
        # clean docs only (family stride 12; index%12==0 is 'clean')
        idx = [i * 12 for i in range(24)]
        return ray.data.from_arrow(spans_table(idx)), idx

    def test_v1_vs_v2(self, corpus):
        ds, idx = corpus
        v1 = _fields_by_doc(extract_pipeline(ds, rules_version="v1"))
        v2 = _fields_by_doc(extract_pipeline(ds, rules_version="v2"))
        assert set(v1) == set(v2) and len(v1) == len(idx)
        n_diff = 0
        for doc_id, r1 in v1.items():
            r2 = v2[doc_id]
            # v1: address extracted, success status
            assert r1["named_insured_address"].endswith(tuple("0123456789"))
            assert r1["status"] == "success"
            # v2: bare 'Address:' no longer maps -> EMPTY sentinel (the
            # reference treats EMPTY VALUE as valid-absent, extraction.py:60-72,
            # so status stays success — the golden difference is the field)
            assert r2["named_insured_address"] == "EMPTY VALUE"
            # every other field identical between versions
            same = [k for k in r1 if k != "named_insured_address"]
            for k in same:
                assert r1[k] == r2[k], (doc_id, k)
            n_diff += 1
        assert n_diff == len(idx)

    def test_rows_stamped_with_version(self, corpus):
        ds, _ = corpus
        for v in ("v1", "v2"):
            out = extract_pipeline(ds, rules_version=v).select_columns(["rules_version"])
            tags = set()
            for b in out.iter_batches(batch_format="pyarrow"):
                tags.update(b.column("rules_version").to_pylist())
            assert tags == {v}
        # default (no version arg) stamps the manager default
        out = extract_pipeline(ds)
        b = next(iter(out.iter_batches(batch_format="pyarrow")))
        assert b.column("rules_version")[0].as_py() == DEFAULT_RULES_VERSION

    def test_v2_new_alias(self):
        """v2's added aliases fire on labels v1 ignores."""
        spans = [{"kind": "text", "text": "Policy Number: PN-777", "media_ref": "",
                  "offset": 0},
                 {"kind": "text", "text": "Underwriter: Acme Underwriting", "media_ref": "",
                  "offset": 1}]
        v1 = FieldExtractor(rules_version="v1").extract_doc(spans)
        v2 = FieldExtractor(rules_version="v2").extract_doc(spans)
        assert v1["fields"]["quote_number"] != "PN-777"
        assert v2["fields"]["quote_number"] == "PN-777"
        assert v2["fields"]["issuing_carrier"] == "Acme Underwriting"
        assert v1["rules_version"] == "v1" and v2["rules_version"] == "v2"


class TestManifestInvalidation:
    def test_version_change_invalidates_partitions(self, tmp_path):
        from insurance_pdf_extractor_ray.state.checkpoint import run_partitioned

        src = str(tmp_path / "in")
        os.makedirs(src)
        idx = [i * 12 for i in range(12)]
        import pyarrow.parquet as pq

        pq.write_table(spans_table(idx[:6]), os.path.join(src, "a.parquet"))
        pq.write_table(spans_table(idx[6:]), os.path.join(src, "b.parquet"))
        out = str(tmp_path / "out")

        def pipe_v(version):
            return lambda ds: extract_pipeline(ds, rules_version=version,
                                               assume_colocated=True)

        r1 = run_partitioned(src, out, pipe_v("v1"), num_partitions=2,
                             config={"rules_version": "v1"})
        assert r1["partitions_run"] == 2 and r1["partitions_skipped"] == 0

        # same version resumes: all skipped
        r2 = run_partitioned(src, out, pipe_v("v1"), num_partitions=2,
                             config={"rules_version": "v1"})
        assert r2["partitions_run"] == 0 and r2["partitions_skipped"] == 2

        # new version invalidates every partition and re-runs
        r3 = run_partitioned(src, out, pipe_v("v2"), num_partitions=2,
                             config={"rules_version": "v2"})
        assert r3["partitions_run"] == 2 and r3["partitions_skipped"] == 0

        # manifest records the version as first-class lineage
        import json, glob

        mans = [json.load(open(p)) for p in
                glob.glob(os.path.join(out, "_manifest", "*.json"))]
        assert {m["rules_version"] for m in mans} == {"v2"}


class TestRegisteredVersionHotSwap:
    """§2.11 extension surface: a version registered at RUNTIME on the
    driver must drive a fresh pipeline (the map ships driver-resolved to
    workers, which hold their own manager singletons and never see the
    registration), while a concurrently-pinned built-in run is unaffected,
    and resume invalidation fires exactly on the version swap."""

    def _register_v3(self):
        from insurance_pdf_extractor_ray.ruleversions import rule_manager

        # v3 = v1 minus the bare 'address' alias (the v2 core change) under
        # a name no worker has ever seen
        labels = dict(rule_manager.get_rules("v1"))
        labels.pop("address")
        rule_manager.register_version("v3-hotswap", labels,
                                      description="runtime-registered")
        return rule_manager

    def _cleanup(self, m):
        m._versions.pop("v3-hotswap", None)
        m._cache.pop("v3-hotswap", None)

    def test_fresh_pipeline_uses_registration_pinned_run_unaffected(self):
        m = self._register_v3()
        try:
            idx = [i * 12 for i in range(12)]
            ds = ray.data.from_arrow(spans_table(idx))
            raw3 = extract_pipeline(ds, rules_version="v3-hotswap").materialize()
            tags = set()
            for b in raw3.select_columns(["rules_version"]) \
                         .iter_batches(batch_format="pyarrow"):
                tags.update(b.column("rules_version").to_pylist())
            assert tags == {"v3-hotswap"}   # rows stamped with the NEW name
            v3 = _fields_by_doc(raw3)
            v1 = _fields_by_doc(extract_pipeline(ds, rules_version="v1"))
            assert len(v3) == len(idx)
            for doc_id, r3 in v3.items():
                # registered semantics applied on workers
                assert r3["named_insured_address"] == "EMPTY VALUE"
                # the pinned v1 run still extracts the address
                r1 = v1[doc_id]
                assert r1["named_insured_address"].endswith(tuple("0123456789"))
        finally:
            self._cleanup(m)

    def test_resume_invalidates_exactly_on_swap(self, tmp_path):
        from insurance_pdf_extractor_ray.state.checkpoint import run_partitioned

        m = self._register_v3()
        try:
            src = str(tmp_path / "in")
            os.makedirs(src)
            idx = [i * 12 for i in range(8)]
            import pyarrow.parquet as pq

            pq.write_table(spans_table(idx), os.path.join(src, "a.parquet"))
            out = str(tmp_path / "out")

            def pipe_v(version):
                return lambda ds: extract_pipeline(ds, rules_version=version,
                                                   assume_colocated=True)

            r1 = run_partitioned(src, out, pipe_v("v1"), num_partitions=1,
                                 config={"rules_version": "v1"})
            # swapping to the registered version invalidates and re-runs
            r2 = run_partitioned(src, out, pipe_v("v3-hotswap"),
                                 num_partitions=1,
                                 config={"rules_version": "v3-hotswap"})
            # resuming under the SAME registered version skips (no spurious
            # invalidation)
            r3 = run_partitioned(src, out, pipe_v("v3-hotswap"),
                                 num_partitions=1,
                                 config={"rules_version": "v3-hotswap"})
            assert (r1["partitions_run"], r2["partitions_run"],
                    r3["partitions_run"]) == (1, 1, 0)
            assert r3["partitions_skipped"] == 1
        finally:
            self._cleanup(m)

    def test_unknown_version_fails_on_driver_not_worker(self):
        # without a registration, an unknown version errors at pipeline
        # CONSTRUCTION (driver-side resolve) — not as a buried worker error
        idx = [0]
        ds = ray.data.from_arrow(spans_table(idx))
        with pytest.raises(ValueError, match="not found"):
            extract_pipeline(ds, rules_version="nope-v9")
