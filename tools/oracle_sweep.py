"""Driver-style correctness sweep: run each `queries()` entry AND its
`oracle_sql()` twin on the same parquet tables, then compare row count,
schema (column names + dtypes) and a value hash computed after sorting
columns by name and rows by all columns — the same normalization the
round driver applies before hashing.

Usage:
    python tools/oracle_sweep.py [query ...]         # default: all
    SFDIR=/root/testdata/sf0.01 python tools/oracle_sweep.py roc_auc_purchase
"""

import hashlib
import json
import os
import sys
import time

import duckdb
import pandas as pd
import pyarrow as pa

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def _to_pandas(x):
    if isinstance(x, pd.DataFrame):
        return x
    if isinstance(x, pa.Table):
        return x.to_pandas()
    return x.to_pandas()  # ray Dataset


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)]
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort")
    return df.reset_index(drop=True)


def _value_hash(df: pd.DataFrame) -> str:
    payload = df.to_csv(index=False, float_format="%.9g").encode()
    return hashlib.sha256(payload).hexdigest()[:16]


def main() -> int:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=int(os.environ.get("RAY_GRAFT_CPUS", 32)),
                 include_dashboard=False, ignore_reinit_error=True)
    import __ray_entry__ as entry

    sf_dir = os.environ.get("SFDIR", "/root/testdata/sf0.01")
    qs = entry.queries()
    oracles = entry.oracle_sql()
    names = sys.argv[1:] or sorted(qs)

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    results = {}
    n_fail = 0
    for name in names:
        if name not in qs:
            print(f"{name}: UNKNOWN QUERY")
            n_fail += 1
            continue
        t0 = time.time()
        try:
            mine = _normalize(_to_pandas(qs[name](sf_dir)))
        except Exception as exc:  # noqa: BLE001
            print(f"{name}: RAY ERROR {type(exc).__name__}: {exc}")
            n_fail += 1
            continue
        ray_sec = time.time() - t0
        if name not in oracles:
            results[name] = {"status": "no_oracle", "rows": len(mine)}
            print(f"{name}: no_oracle rows={len(mine)} ({ray_sec:.1f}s)")
            continue
        theirs = _normalize(con.execute(oracles[name]).fetchdf())
        status = []
        if len(mine) != len(theirs):
            status.append(f"rows {len(mine)} != {len(theirs)}")
        if list(mine.columns) != list(theirs.columns):
            status.append(f"cols {list(mine.columns)} != {list(theirs.columns)}")
        elif [str(d) for d in mine.dtypes] != [str(d) for d in theirs.dtypes]:
            status.append(
                f"dtypes {[str(d) for d in mine.dtypes]} != "
                f"{[str(d) for d in theirs.dtypes]}")
        if not status and _value_hash(mine) != _value_hash(theirs):
            status.append("hash mismatch")
            diff = (mine != theirs) & ~(mine.isna() & theirs.isna())
            bad = diff.any(axis=1)
            print(mine[bad].head(3))
            print(theirs[bad].head(3))
        ok = not status
        n_fail += 0 if ok else 1
        results[name] = {"status": "pass" if ok else "; ".join(status),
                         "rows": len(mine), "sec": round(ray_sec, 2)}
        print(f"{name}: {'PASS' if ok else 'FAIL ' + '; '.join(status)} "
              f"rows={len(mine)} ({ray_sec:.1f}s)")
    print(json.dumps({"n": len(names), "fail": n_fail}))
    out_path = os.environ.get("SWEEP_OUT")
    if out_path:
        payload = {
            "sf_dir": sf_dir,
            "n": len(names),
            "fail": n_fail,
            "results": results,
        }
        with open(out_path, "w") as f:
            json.dump(payload, f, indent=1, sort_keys=True)
        print(f"wrote {out_path}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
