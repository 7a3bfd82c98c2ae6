"""At-rest schema migration (state/migrate.py) — the reference's
scripts/migrate_database.py analog: idempotent add/rename/drop over an
existing partitioned or bucketed parquet store, per-unit rewrite with a
resumable ledger."""

import glob
import json
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray
import ray.data

pytestmark = pytest.mark.usefixtures("ray_session")

def _make_text_len_col(canary=None):
    """Computed-column callable built as a CLOSURE: test modules aren't
    importable on Ray workers, so module-level functions pickle by
    reference and fail to load — closures pickle by value.  ``canary``:
    path whose existence simulates a mid-migration kill."""
    import pyarrow.compute as _pcc

    def text_len_col(t):
        import os as _os

        if canary and _os.path.exists(canary):
            raise RuntimeError("simulated mid-migration kill")
        return _pcc.utf8_length(t.column("text")).cast(pa.int64())

    return text_len_col


def _docs_table(n=400):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc text {i} " + "x" * (i % 17) for i in range(n)]),
        "lang": pa.array(["en", "de", "fr", "es"][i % 4] for i in range(n)),
        "junk": pa.array([i % 2 for i in range(n)], pa.int64()),
    })


def _read_all(root: str) -> pa.Table:
    files = sorted(glob.glob(os.path.join(root, "**", "*.parquet"),
                             recursive=True))
    return pa.concat_tables([pq.read_table(f) for f in files],
                            promote_options="default")


class TestMigrateBucketed:
    def _bucketed(self, tmp_path, n=400):
        from insurance_pdf_extractor_ray.pipelines.bucketed import (
            write_bucketed)

        root = str(tmp_path / "store")
        write_bucketed(ray.data.from_arrow(_docs_table(n)), root,
                       "doc_id", 8)
        return root

    def test_add_rename_drop(self, tmp_path):
        from insurance_pdf_extractor_ray.state.migrate import migrate_store

        root = self._bucketed(tmp_path)
        out = migrate_store(
            root,
            add_columns={"text_len": ("int64", _make_text_len_col()),
                         "pipeline_rev": ("string", "r4")},
            rename_columns={"lang": "language"},
            drop_columns=["junk"],
            schema_version="v2")
        assert out["units_migrated"] == 8 and out["units_skipped"] == 0
        assert out["rows"] == 400
        got = _read_all(root)
        # the layout's internal _bucket column must survive the rewrite
        assert set(got.column_names) == {"doc_id", "text", "language",
                                         "text_len", "pipeline_rev",
                                         "_bucket"}
        want_len = pc.utf8_length(got.column("text")).cast(pa.int64())
        assert got.column("text_len").combine_chunks().equals(
            want_len.combine_chunks())
        assert got.column("pipeline_rev").to_pylist() == ["r4"] * 400

    def test_rerun_skips_all_and_is_idempotent(self, tmp_path):
        from insurance_pdf_extractor_ray.state.migrate import migrate_store

        root = self._bucketed(tmp_path)
        spec = dict(add_columns={"flag": ("bool", True)},
                    schema_version="v2")
        first = migrate_store(root, **spec)
        before = _read_all(root)
        second = migrate_store(root, **spec)
        assert first["units_migrated"] == 8
        assert second["units_migrated"] == 0
        assert second["units_skipped"] == 8
        assert _read_all(root).equals(before)

    def test_kill_and_resume(self, tmp_path):
        from insurance_pdf_extractor_ray.state.migrate import migrate_store

        root = self._bucketed(tmp_path)
        canary = str(tmp_path / "kill_now")
        spec = dict(
            add_columns={"text_len": ("int64", _make_text_len_col(canary))},
            schema_version="v2")
        # first migrate one unit cleanly, THEN arm the canary so the
        # next unit's rewrite dies mid-migration
        units = sorted(glob.glob(os.path.join(root, "_bucket=*")))
        migrate_store(root, units=units[:1], **spec)
        open(canary, "w").close()
        with pytest.raises(Exception):
            migrate_store(root, **spec)
        # the ledger holds the completed unit; the store is mixed but
        # every unit is either fully old or fully new
        lpath = glob.glob(os.path.join(root, "_migrations", "*.json"))
        assert len(lpath) == 1
        done = json.load(open(lpath[0]))["done_units"]
        assert len(done) >= 1
        os.unlink(canary)
        out = migrate_store(root, **spec)
        assert out["units_skipped"] == len(done)
        assert out["units_migrated"] == 8 - len(done)
        got = _read_all(root)
        assert got.num_rows == 400
        want_len = pc.utf8_length(got.column("text")).cast(pa.int64())
        assert got.column("text_len").combine_chunks().equals(
            want_len.combine_chunks())

    def test_bucketed_join_still_reads_migrated_layout(self, tmp_path):
        from insurance_pdf_extractor_ray.pipelines.bucketed import (
            bucketed_join, write_bucketed)
        from insurance_pdf_extractor_ray.state.migrate import migrate_store

        root = self._bucketed(tmp_path)
        migrate_store(root, add_columns={"flag": ("bool", True)})
        other = str(tmp_path / "scores")
        scores = pa.table({
            "doc_id": pa.array(range(0, 400, 2), pa.int64()),
            "score": pa.array([i * 0.5 for i in range(200)], pa.float64()),
        })
        write_bucketed(ray.data.from_arrow(scores), other, "doc_id", 8)
        joined = bucketed_join(root, other)
        assert joined.count() == 200
        row = joined.take(1)[0]
        assert row["flag"] is True and "score" in row


class TestMigratePartitioned:
    def test_part_layout(self, tmp_path):
        from insurance_pdf_extractor_ray.state.checkpoint import (
            run_partitioned)
        from insurance_pdf_extractor_ray.state.migrate import migrate_store

        src = str(tmp_path / "src")
        os.makedirs(src)
        t = _docs_table(300)
        for i in range(6):
            pq.write_table(t.slice(i * 50, 50),
                           os.path.join(src, f"f{i}.parquet"))
        out_dir = str(tmp_path / "out")
        run_partitioned(src, out_dir, lambda ds: ds, num_partitions=3)
        res = migrate_store(out_dir,
                            add_columns={"rev": ("string", "v2")},
                            drop_columns=["junk"])
        assert res["units_migrated"] == 3 and res["rows"] == 300
        got = _read_all(os.path.join(out_dir, "part-0"))
        assert "rev" in got.column_names and "junk" not in got.column_names
        # original run manifests untouched: a data-run resume still skips
        from insurance_pdf_extractor_ray.state.checkpoint import (
            committed_partitions)

        assert len(committed_partitions(out_dir)) == 3

    def test_flat_layout_and_cli(self, tmp_path):
        from insurance_pdf_extractor_ray.cli import main

        flat = str(tmp_path / "flat")
        os.makedirs(flat)
        t = _docs_table(120)
        pq.write_table(t.slice(0, 60), os.path.join(flat, "a.parquet"))
        pq.write_table(t.slice(60, 60), os.path.join(flat, "b.parquet"))
        main(["migrate", "--out", flat,
              "--add", "rev:string:\"v2\"",
              "--add", "score:float64",
              "--rename", "lang=language",
              "--drop", "junk"])
        got = _read_all(flat)
        assert got.num_rows == 120
        assert set(got.column_names) == {"doc_id", "text", "language",
                                         "rev", "score"}
        assert got.column("rev").to_pylist() == ["v2"] * 120
        assert got.column("score").null_count == 120

    def test_empty_migration_rejected(self, tmp_path):
        from insurance_pdf_extractor_ray.state.migrate import migrate_store

        with pytest.raises(ValueError, match="empty migration"):
            migrate_store(str(tmp_path))


class TestSwapCrashRecovery:
    def test_dir_unit_recovers_from_half_swap(self, tmp_path, ray_session):
        """Kill between os.replace(unit, unit.old) and os.replace(shadow,
        unit) leaves only part-N.old; the next run must restore and
        migrate it — not silently drop the unit."""
        from insurance_pdf_extractor_ray.state.checkpoint import (
            run_partitioned)
        from insurance_pdf_extractor_ray.state.migrate import migrate_store

        src = str(tmp_path / "src")
        os.makedirs(src)
        t = _docs_table(200)
        pq.write_table(t.slice(0, 100), os.path.join(src, "f0.parquet"))
        pq.write_table(t.slice(100, 100), os.path.join(src, "f1.parquet"))
        out_dir = str(tmp_path / "out")
        run_partitioned(src, out_dir, lambda ds: ds, num_partitions=2)
        # simulate the crash window on part-0
        os.replace(os.path.join(out_dir, "part-0"),
                   os.path.join(out_dir, "part-0.old"))
        res = migrate_store(out_dir, add_columns={"rev": ("string", "v2")})
        assert res["units_migrated"] == 2 and res["rows"] == 200
        got = _read_all(out_dir)
        assert got.num_rows == 200
        assert got.column("rev").to_pylist() == ["v2"] * 200
        assert not os.path.exists(os.path.join(out_dir, "part-0.old"))

    def test_flat_recovers_mid_backup_and_mid_movein(self, tmp_path,
                                                     ray_session):
        from insurance_pdf_extractor_ray.state.migrate import (
            _recover_unit, migrate_store)

        flat = str(tmp_path / "flat")
        os.makedirs(flat)
        t = _docs_table(100)
        pq.write_table(t.slice(0, 50), os.path.join(flat, "a.parquet"))
        pq.write_table(t.slice(50, 50), os.path.join(flat, "b.parquet"))

        # window (i): crash mid old->backup (no .complete marker)
        bak = os.path.join(flat, ".migrate_old")
        os.makedirs(bak)
        os.replace(os.path.join(flat, "a.parquet"),
                   os.path.join(bak, "a.parquet"))
        _recover_unit(flat, is_root=True)
        assert sorted(os.path.basename(f) for f in
                      glob.glob(os.path.join(flat, "*.parquet"))) == \
            ["a.parquet", "b.parquet"]

        # window (ii): crash mid new move-in (.complete marker present,
        # partial new fragments in the root)
        os.makedirs(bak)
        for n in ("a.parquet", "b.parquet"):
            os.replace(os.path.join(flat, n), os.path.join(bak, n))
        open(os.path.join(bak, ".complete"), "w").close()
        pq.write_table(t.slice(0, 10), os.path.join(flat, "new-0.parquet"))
        _recover_unit(flat, is_root=True)
        got = _read_all(flat)
        assert got.num_rows == 100          # old layout fully restored
        assert not os.path.isdir(bak)

        # and a full migrate over the recovered layout works
        res = migrate_store(flat, add_columns={"rev": ("string", "v2")})
        assert res["rows"] == 100
        assert _read_all(flat).column("rev").to_pylist() == ["v2"] * 100


class TestSpecHashIdentity:
    """ADVICE r4: spec hashing must distinguish logic-changed callables
    and reject anonymous ones (resume state is keyed on the hash)."""

    def test_lambda_rejected(self):
        from insurance_pdf_extractor_ray.state.migrate import (
            migration_spec_hash)
        with pytest.raises(ValueError, match="NAMED"):
            migration_spec_hash({"x": ("int64", lambda t: None)},
                                None, None, None)

    def test_same_name_different_logic_different_hash(self):
        from insurance_pdf_extractor_ray.state.migrate import (
            migration_spec_hash)

        def make(version):
            def col_fn(t):
                return pa.array([version] * t.num_rows, pa.int64())
            return col_fn

        h1 = migration_spec_hash({"v": ("int64", make(1))}, None, None, None)
        h2 = migration_spec_hash({"v": ("int64", make(2))}, None, None, None)
        h1b = migration_spec_hash({"v": ("int64", make(1))}, None, None, None)
        assert h1 != h2          # logic change -> fresh ledger
        assert h1 == h1b         # identical logic -> stable across builds

    def test_concurrent_shard_ledgers_merge(self, tmp_path):
        """Two migrate calls over disjoint units= slices of one store must
        both end up in done_units (the r4 last-writer-wins bug)."""
        from insurance_pdf_extractor_ray.state.checkpoint import (
            run_partitioned)
        from insurance_pdf_extractor_ray.state.migrate import (
            _ledger_path, _read_ledger, discover_units, migrate_store,
            migration_spec_hash)

        src = str(tmp_path / "src")
        os.makedirs(src)
        t = _docs_table(120)
        for i in range(4):
            pq.write_table(t.slice(i * 30, 30),
                           os.path.join(src, f"f{i}.parquet"))
        out_dir = str(tmp_path / "out")
        run_partitioned(src, out_dir, lambda ds: ds, num_partitions=4)
        units = discover_units(out_dir)
        spec = dict(add_columns={"rev": ("string", "v2")})
        # shard A migrates units [0,1], shard B units [2,3]; interleaving
        # is serialized here but each call starts from its own in-memory
        # ledger view, which is exactly the lost-update shape
        migrate_store(out_dir, units=units[:2], **spec)
        migrate_store(out_dir, units=units[2:], **spec)
        h = migration_spec_hash(spec["add_columns"], None, None, None)
        ledger = _read_ledger(_ledger_path(out_dir, h))
        assert len(ledger["done_units"]) == 4
        # and a full resume run skips everything
        res = migrate_store(out_dir, **spec)
        assert res["units_migrated"] == 0 and res["units_skipped"] == 4
