"""In-place schema migration of an at-rest partitioned/bucketed output.

The Ray-Data rebuild of the reference's database migration script
(``scripts/migrate_database.py:16-120``: idempotent ``ALTER TABLE ADD
COLUMN`` + index builds over an existing SQLite store).  Here the store is
a directory of parquet *units* — ``part-<i>/`` dirs from
``checkpoint.run_partitioned``, ``_bucket=<i>/`` dirs from
``bucketed.write_bucketed``, or a flat fragment directory — and a migration
is a per-unit fragment rewrite:

    read unit -> map_batches(drop / rename / add) -> shadow dir ->
    row-count verify -> atomic swap -> ledger append

Resumability: progress lives in ``<root>/_migrations/<spec_hash>.json``
(one ledger per distinct migration spec, listing completed units).  A
killed run leaves each unit either fully old + not in the ledger (re-run)
or fully new + in the ledger (skipped); a kill in the swap/append window
re-runs the unit, which is safe because every operation is idempotent by
construction (add of an existing column, rename of an absent source and
drop of an absent column are all no-ops — the reference's "column already
exists" checks, ported).  Data-run manifests are untouched: migrations
never change row counts, so the original run's resume semantics survive.

Scale shape: units migrate sequentially but each unit's rewrite is a
distributed Ray Data pipeline (read -> map_batches -> write), so a
multi-node cluster streams fragments through workers; the driver holds
only unit names and row counts.  On a 100-TB store the unit loop itself
can be sharded by running several migrate processes over disjoint
``units=`` slices: every ledger append takes an exclusive ``fcntl``
lock on ``<spec_hash>.lock`` and merges ``done_units`` with the
on-disk state before the atomic replace, so concurrent shards never
lose each other's completions (requires the store root on a
flock-capable filesystem; on object storage, run one migrate process
per disjoint ledger by passing distinct ``schema_version`` suffixes).
"""

from __future__ import annotations

import contextlib
import glob
import hashlib
import json
import os
import shutil
import time

try:
    import fcntl
except ImportError:          # non-POSIX: single-process migrate only
    fcntl = None
from typing import Callable, Dict, List, Optional, Sequence, Tuple, Union

import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

AddSpec = Dict[str, Tuple[Union[str, pa.DataType],
                          Union[None, int, float, str, bool,
                                Callable[[pa.Table], pa.Array]]]]


def _type_of(t: Union[str, pa.DataType]) -> pa.DataType:
    return pa.type_for_alias(t) if isinstance(t, str) else t


def _is_unit_dir(p: str) -> bool:
    # never treat swap leftovers as units (a crashed swap leaves
    # part-N.old / part-N.migrate siblings until recovery runs)
    return (os.path.isdir(p) and not p.endswith(".old")
            and not p.endswith(".migrate"))


def discover_units(root: str) -> List[str]:
    """Unit directories of an at-rest layout, in deterministic order:
    ``part-<i>`` (checkpointed runs), ``_bucket=<i>`` (bucketed layouts),
    else the root itself if it holds flat parquet fragments.  Swap
    leftovers (``*.old`` / ``*.migrate``) are never units; a unit whose
    directory is missing but whose ``.old`` sibling exists (a kill inside
    the swap window) is recovered by ``migrate_store``."""
    parts = sorted(p for p in glob.glob(os.path.join(root, "part-*"))
                   if _is_unit_dir(p))
    # a crash between the two swap renames leaves only part-N.old: surface
    # the unit under its canonical name so recovery restores it
    parts += sorted(p[:-4] for p in glob.glob(os.path.join(root,
                                                           "part-*.old"))
                    if os.path.isdir(p) and p[:-4] not in parts)
    if parts:
        return sorted(parts)
    buckets = sorted(b for b in glob.glob(os.path.join(root, "_bucket=*"))
                     if _is_unit_dir(b))
    buckets += sorted(b[:-4] for b in glob.glob(os.path.join(
        root, "_bucket=*.old")) if os.path.isdir(b) and b[:-4] not in buckets)
    if buckets:
        return sorted(buckets)
    if (glob.glob(os.path.join(root, "*.parquet"))
            or os.path.isdir(os.path.join(root, ".migrate_old"))):
        return [root]
    raise FileNotFoundError(f"no migratable units under {root}")


def migration_spec_hash(add_columns: Optional[AddSpec],
                        rename_columns: Optional[Dict[str, str]],
                        drop_columns: Optional[Sequence[str]],
                        schema_version: Optional[str]) -> str:
    """Stable hash of the migration spec.  Callables hash by __name__ plus
    a digest of their compiled bytecode (``co_code`` + ``co_consts``), so a
    resumed run with a same-named but logic-changed computed column gets a
    FRESH ledger instead of silently skipping already-done units with stale
    values.  Anonymous callables are rejected: two different lambdas are
    indistinguishable by name and their identity across processes is too
    fragile to key resume state on."""

    def enc_default(d):
        if not callable(d):
            return d
        name = getattr(d, "__name__", "<callable>")
        if name == "<lambda>":
            raise ValueError(
                "computed-column defaults must be NAMED functions, not "
                "lambdas: resume state is keyed on the function identity "
                "and lambdas cannot be distinguished across runs")
        code = getattr(d, "__code__", None)
        if code is None:        # builtins / callables without code objects
            return name

        def freeze(v):
            # scalars hash by value (a factory-made closure over version=1
            # vs version=2 must differ); everything else by type name
            if isinstance(v, (int, float, str, bytes, bool, type(None))):
                return repr(v)
            return type(v).__name__

        consts = tuple(freeze(c) for c in code.co_consts
                       if not callable(c) and not isinstance(c, type))
        cells = tuple(freeze(c.cell_contents)
                      for c in (getattr(d, "__closure__", None) or ()))
        dflts = tuple(freeze(v)
                      for v in (getattr(d, "__defaults__", None) or ()))
        body = code.co_code + repr((consts, cells, dflts)).encode()
        return f"{name}:{hashlib.blake2b(body, digest_size=6).hexdigest()}"

    spec = {
        "add": {k: [str(_type_of(t)), enc_default(d)]
                for k, (t, d) in sorted((add_columns or {}).items())},
        "rename": dict(sorted((rename_columns or {}).items())),
        "drop": sorted(drop_columns or []),
        "schema_version": schema_version,
    }
    return hashlib.blake2b(json.dumps(spec, sort_keys=True).encode(),
                           digest_size=8).hexdigest()


def _batch_fn(add_columns: AddSpec, rename_columns: Dict[str, str],
              drop_columns: Sequence[str]):
    def migrate_batch(t: pa.Table) -> pa.Table:
        for c in drop_columns:
            if c in t.column_names:          # absent: no-op (idempotent)
                t = t.drop_columns([c])
        if rename_columns:
            t = t.rename_columns([rename_columns.get(c, c)
                                  for c in t.column_names])
        for name, (typ, default) in add_columns.items():
            if name in t.column_names:       # exists: no-op (idempotent)
                continue
            typ = _type_of(typ)
            if callable(default):
                arr = default(t)
                if not isinstance(arr, (pa.Array, pa.ChunkedArray)):
                    arr = pa.array(arr, typ)
            elif default is None:
                arr = pa.nulls(t.num_rows, typ)
            else:
                arr = pa.array([default] * t.num_rows, typ)
            t = t.append_column(name, arr)
        return t

    return migrate_batch


def _recover_unit(unit: str, is_root: bool) -> None:
    """Roll a unit back to a consistent OLD layout after a kill inside the
    swap window (idempotent; no-op on clean units).

    Directory units: a kill between ``os.replace(unit, unit.old)`` and
    ``os.replace(shadow, unit)`` leaves only ``unit.old`` — restore it;
    a leftover ``unit.old`` NEXT TO a live unit is post-swap debris —
    delete it.  Flat root units: ``.migrate_old`` without its
    ``.complete`` marker means the old->backup move was interrupted
    (move the backed-up files home); with the marker, new fragments may
    be partially moved in — delete them all (the shadow dir still holds
    the full new set, which the re-run rebuilds anyway) and move every
    old fragment back.  The migration ledger is only appended AFTER a
    completed swap, so a recovered unit simply re-runs."""
    if is_root:
        bak = os.path.join(unit, ".migrate_old")
        if not os.path.isdir(bak):
            return
        committed = os.path.exists(os.path.join(bak, ".complete"))
        if committed:
            # any parquet in the root is a partially-moved NEW fragment
            for f in glob.glob(os.path.join(unit, "*.parquet")):
                os.unlink(f)
        for f in glob.glob(os.path.join(bak, "*.parquet")):
            dst = os.path.join(unit, os.path.basename(f))
            if not os.path.exists(dst):
                os.replace(f, dst)
        shutil.rmtree(bak, ignore_errors=True)
        return
    old = unit.rstrip("/") + ".old"
    if os.path.isdir(old):
        if not os.path.isdir(unit):
            os.replace(old, unit)   # kill between the two swap renames
        else:
            shutil.rmtree(old, ignore_errors=True)  # post-swap debris


def _ledger_path(root: str, spec_hash: str) -> str:
    return os.path.join(root, "_migrations", f"{spec_hash}.json")


def _read_ledger(path: str) -> Dict:
    if os.path.exists(path):
        try:
            with open(path) as f:
                return json.load(f)
        except json.JSONDecodeError:
            pass  # torn ledger: restart this migration from zero units
    return {"done_units": []}


@contextlib.contextmanager
def _ledger_lock(path: str):
    """Exclusive advisory lock serialising the ledger's read-modify-write
    so concurrent shard processes (disjoint ``units=`` slices over one
    store) can't overwrite each other's ``done_units``."""
    if fcntl is None:
        yield
        return
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path + ".lock", "a") as lf:
        fcntl.flock(lf.fileno(), fcntl.LOCK_EX)
        try:
            yield
        finally:
            fcntl.flock(lf.fileno(), fcntl.LOCK_UN)


def _write_ledger(path: str, ledger: Dict) -> None:
    """Merge-and-replace under an exclusive lock: ``done_units`` is the
    union of our view and the on-disk ledger, so a concurrent shard's
    completions are never lost (last-writer-wins only on the scalar
    metadata fields, which is harmless)."""
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with _ledger_lock(path):
        on_disk = _read_ledger(path)
        ledger["done_units"] = sorted(
            set(ledger.get("done_units", []))
            | set(on_disk.get("done_units", [])))
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(ledger, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, path)


def migrate_store(
    root: str,
    add_columns: Optional[AddSpec] = None,
    rename_columns: Optional[Dict[str, str]] = None,
    drop_columns: Optional[Sequence[str]] = None,
    schema_version: Optional[str] = None,
    resume: bool = True,
    units: Optional[List[str]] = None,
) -> Dict:
    """Apply a schema migration to every unit of an at-rest layout.

    ``add_columns``: {name: (type, default)} — default is a scalar (typed
    null if None) or a NAMED callable ``batch -> pa.Array`` for computed
    columns (must be deterministic; it re-runs on resume).
    ``rename_columns``: {old: new}.  ``drop_columns``: [name, ...].

    Returns {units_migrated, units_skipped, rows, spec_hash}.
    """
    add_columns = add_columns or {}
    rename_columns = rename_columns or {}
    drop_columns = list(drop_columns or [])
    if not (add_columns or rename_columns or drop_columns):
        raise ValueError("empty migration: nothing to add/rename/drop")
    spec_hash = migration_spec_hash(add_columns, rename_columns,
                                    drop_columns, schema_version)
    unit_dirs = units if units is not None else discover_units(root)
    lpath = _ledger_path(root, spec_hash)
    if not resume:
        # fresh run: drop the old ledger so the merge-on-write union can't
        # resurrect stale done_units
        with _ledger_lock(lpath):
            if os.path.exists(lpath):
                os.unlink(lpath)
    ledger = _read_ledger(lpath) if resume else {"done_units": []}
    ledger.setdefault("spec_hash", spec_hash)
    ledger.setdefault("schema_version", schema_version)
    done = set(ledger["done_units"])
    fn = _batch_fn(add_columns, rename_columns, drop_columns)

    migrated = skipped = total_rows = 0
    for unit in unit_dirs:
        uname = os.path.relpath(unit, root) if unit != root else "."
        _recover_unit(unit, is_root=(unit == root))
        files = sorted(glob.glob(os.path.join(unit, "*.parquet")))
        if not files:
            continue
        pre_rows = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        if uname in done:
            skipped += 1
            total_rows += pre_rows
            continue
        shadow = unit.rstrip("/") + ".migrate"
        shutil.rmtree(shadow, ignore_errors=True)
        t0 = time.time()
        ray.data.read_parquet(files) \
            .map_batches(fn, batch_format="pyarrow") \
            .write_parquet(shadow)
        new_files = glob.glob(os.path.join(shadow, "*.parquet"))
        new_rows = sum(pq.ParquetFile(f).metadata.num_rows
                       for f in new_files)
        if new_rows != pre_rows:
            shutil.rmtree(shadow, ignore_errors=True)
            raise RuntimeError(
                f"migration row mismatch on {uname}: "
                f"{new_rows} != {pre_rows}")
        if unit == root:
            # flat layout: swap fragments inside the root (the root dir
            # itself can't be replaced — it holds _migrations/).  Crash-
            # safe protocol: old fragments move to .migrate_old first, a
            # .complete marker commits that phase, then new fragments move
            # in; _recover_unit rolls a kill in any window back to the old
            # layout (see there)
            bak = os.path.join(unit, ".migrate_old")
            shutil.rmtree(bak, ignore_errors=True)
            os.makedirs(bak)
            for f in files:
                os.replace(f, os.path.join(bak, os.path.basename(f)))
            open(os.path.join(bak, ".complete"), "w").close()
            for f in new_files:
                os.replace(f, os.path.join(unit, os.path.basename(f)))
            shutil.rmtree(bak, ignore_errors=True)
            shutil.rmtree(shadow, ignore_errors=True)
        else:
            old = unit.rstrip("/") + ".old"
            shutil.rmtree(old, ignore_errors=True)
            os.replace(unit, old)
            os.replace(shadow, unit)
            shutil.rmtree(old, ignore_errors=True)
        ledger["done_units"] = sorted(done | {uname})
        done.add(uname)
        ledger["last_unit_sec"] = round(time.time() - t0, 3)
        _write_ledger(lpath, ledger)
        migrated += 1
        total_rows += pre_rows
    ledger["completed_at"] = time.strftime("%Y-%m-%dT%H:%M:%S")
    _write_ledger(lpath, ledger)
    return {"units_migrated": migrated, "units_skipped": skipped,
            "rows": total_rows, "spec_hash": spec_hash}
