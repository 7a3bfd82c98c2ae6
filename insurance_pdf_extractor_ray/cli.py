"""CLI driver programs (the batch analog of the reference's scripts/, §3.3).

    python -m insurance_pdf_extractor_ray.cli run     --input DIR --out DIR [--partitions N] [--resume/--no-resume]
    python -m insurance_pdf_extractor_ray.cli synth   --num-docs N --out DIR
    python -m insurance_pdf_extractor_ray.cli stats   --results DIR
    python -m insurance_pdf_extractor_ray.cli export  --results DIR --out DIR --format json|csv
    python -m insurance_pdf_extractor_ray.cli dedup   --input DIR --out DIR --method exact|minhash|jaccard
    python -m insurance_pdf_extractor_ray.cli quality --input DIR --out DIR [--min-quality Q]
    python -m insurance_pdf_extractor_ray.cli sample  --input DIR --out DIR [--rate R | --split]
    python -m insurance_pdf_extractor_ray.cli profile --input DIR [--columns ...]
    python -m insurance_pdf_extractor_ray.cli pack    --input DIR --out DIR [--seq-len N]
    python -m insurance_pdf_extractor_ray.cli manifest --out DIR

Mirrors scripts/manage_storage.py:16-80 and scripts/token_analytics.py:18-177
(stats / list / cleanup / export) rebuilt over the Ray pipelines.  Owns its
Ray session (guarded init) — library code never calls ray.init().
"""

from __future__ import annotations

import argparse
import json
import os


def _ray_init():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    return ray


def cmd_run(args) -> None:
    ray = _ray_init()
    from .pipelines.extraction import extract_pipeline, flatten_fields
    from .state.checkpoint import run_partitioned

    def pipeline(ds):
        out = extract_pipeline(ds, strip_boilerplate=not args.keep_boilerplate)
        return flatten_fields(out) if args.flat else out

    summary = run_partitioned(
        args.input, args.out, pipeline,
        num_partitions=args.partitions,
        config={"flat": args.flat, "keep_boilerplate": args.keep_boilerplate},
        resume=args.resume,
    )
    print(json.dumps(summary))
    ray.shutdown()


def cmd_synth(args) -> None:
    ray = _ray_init()
    from .sources.synth import write_corpus

    docs = write_corpus(args.num_docs, args.out, seed=args.seed, goldens=args.goldens)
    print(json.dumps({"documents": docs, "num_docs": args.num_docs}))
    ray.shutdown()


def cmd_stats(args) -> None:
    ray = _ray_init()
    import ray.data

    from .pipelines.analytics import breakdown_with_pct

    ds = ray.data.read_parquet(args.results)
    n = ds.count()
    status = breakdown_with_pct(ds, "status").to_pylist()
    print(json.dumps({"rows": n, "status_breakdown": status}))
    ray.shutdown()


def cmd_export(args) -> None:
    ray = _ray_init()
    import ray.data

    from .sources.io import export_csv, export_json

    ds = ray.data.read_parquet(args.results)
    if args.limit:
        ds = ds.limit(args.limit)  # export cap (storage.py routes limit 10000)
    if args.format == "json":
        export_json(ds, args.out)
    else:
        export_csv(ds, args.out)
    print(json.dumps({"exported_to": args.out, "format": args.format}))
    ray.shutdown()


def cmd_dedup(args) -> None:
    ray = _ray_init()
    import ray.data

    from .pipelines.dedup import exact_dedup, jaccard_component_dedup, minhash_dedup
    from .sources.io import write_table

    ds = ray.data.read_parquet(args.input)
    n_in = ds.count()
    if args.method == "exact":
        kept = exact_dedup(ds, args.col, args.id_col)
    elif args.method == "minhash":
        kept = minhash_dedup(ds, args.col, args.id_col, threshold=args.threshold)
    else:  # jaccard (transitive closure)
        kept = jaccard_component_dedup(ds, args.col, args.id_col,
                                       threshold=args.threshold)
    write_table(kept, args.out)
    n_out = ray.data.read_parquet(args.out).count()
    print(json.dumps({"method": args.method, "rows_in": n_in,
                      "rows_kept": n_out, "rows_dropped": n_in - n_out}))
    ray.shutdown()


def cmd_quality(args) -> None:
    ray = _ray_init()
    import ray.data

    from .pipelines.dedup import filter_by_ids
    from .pipelines.textpipe import quality_filter
    from .sources.io import write_table

    ds = ray.data.read_parquet(args.input)
    n_in = ds.count()
    keep_ids = quality_filter(ds, text_col=args.col, id_col=args.id_col,
                              min_quality=args.min_quality)
    kept = filter_by_ids(ds, args.id_col, keep_ids, keep_matching=True)
    write_table(kept, args.out)
    n_out = ray.data.read_parquet(args.out).count()
    print(json.dumps({"rows_in": n_in, "rows_kept": n_out,
                      "min_quality": args.min_quality}))
    ray.shutdown()


def cmd_sample(args) -> None:
    ray = _ray_init()
    import ray.data

    from .pipelines.sampling import assign_split, hash_sample
    from .sources.io import write_table

    ds = ray.data.read_parquet(args.input)
    n_in = ds.count()
    if args.split:
        out = assign_split(ds, args.id_col, test_rate=args.test_rate,
                           val_rate=args.val_rate, seed=args.seed)
    else:
        out = hash_sample(ds, args.id_col, rate=args.rate, seed=args.seed)
    write_table(out, args.out)
    n_out = ray.data.read_parquet(args.out).count()
    print(json.dumps({"rows_in": n_in, "rows_out": n_out,
                      "mode": "split" if args.split else "sample"}))
    ray.shutdown()


def cmd_profile(args) -> None:
    ray = _ray_init()
    import ray.data

    from .pipelines.profile import profile_columns

    ds = ray.data.read_parquet(args.input)
    tbl = profile_columns(ds, columns=args.columns or None,
                          distinct=not args.no_distinct)
    print(json.dumps(tbl.to_pylist()))
    ray.shutdown()


def cmd_pack(args) -> None:
    ray = _ray_init()
    import numpy as np
    import pyarrow as pa
    import ray.data

    from .pipelines.packing import pack_sequences
    from .sources.io import write_table

    ds = ray.data.read_parquet(args.input)

    def count_tokens(batch: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(batch.column(args.col).cast(pa.large_string()))
        n = s.str.count_matches(r"\S+").fill_null(0).to_numpy().astype(np.int64)
        return pa.table({args.id_col: batch.column(args.id_col),
                         "n_tokens": pa.array(n, pa.int64())})

    counted = ds.map_batches(count_tokens, batch_format="pyarrow")
    out = pack_sequences(counted, args.id_col, "n_tokens",
                         seq_len=args.seq_len, bucket=args.bucket)
    write_table(out, args.out)
    from ray.data.aggregate import Max

    mx = ray.data.read_parquet(args.out, columns=["seq_id"]).aggregate(
        Max("seq_id", alias_name="m"))
    print(json.dumps({"seq_len": args.seq_len,
                      "n_sequences": int(mx["m"]) + 1}))
    ray.shutdown()


def cmd_pretrain(args) -> None:
    ray = _ray_init()
    import ray.data

    from .pipelines.pretrain import pretrain_prep
    from .sources.io import write_table

    docs = ray.data.read_parquet(args.input)
    ev = ray.data.read_parquet(args.eval) if args.eval else None
    out = pretrain_prep(docs, args.col, args.id_col, eval_ds=ev,
                        seq_len=args.seq_len, k_contam=args.k_contam,
                        bucket=args.bucket)
    write_table(out, args.out)
    n = ray.data.read_parquet(args.out, columns=["doc_id"]).count()
    print(json.dumps({"seq_len": args.seq_len, "rows": int(n)}))
    ray.shutdown()


def cmd_decontaminate(args) -> None:
    ray = _ray_init()
    import ray.data

    from .pipelines.substrdedup import ngram_decontaminate
    from .sources.io import write_table

    out = ngram_decontaminate(
        ray.data.read_parquet(args.input),
        ray.data.read_parquet(args.eval),
        args.col, args.id_col, k=args.k)
    write_table(out, args.out)
    import pyarrow.parquet as _pq
    import glob as _glob
    n_bad = sum(
        _pq.read_table(f, columns=["contaminated"]).column("contaminated")
        .to_pandas().sum()
        for f in _glob.glob(f"{args.out}/*.parquet"))
    print(json.dumps({"k": args.k, "contaminated": int(n_bad)}))
    ray.shutdown()


def cmd_mix(args) -> None:
    ray = _ray_init()
    import ray.data

    from .pipelines.mixing import mixture_interleave
    from .sources.io import write_table

    weights = {}
    for spec in args.weights:
        name, _, w = spec.partition("=")
        weights[name] = float(w)
    ds = ray.data.read_parquet(args.input)
    n_in = ds.count()
    out = mixture_interleave(ds, args.source_col, args.id_col, weights,
                             seed=args.seed, n_shards=args.shards)
    write_table(out, args.out, partition_cols=["shard"] if args.by_shard else None)
    n_out = ray.data.read_parquet(args.out).count()
    print(json.dumps({"rows_in": n_in, "rows_out": n_out, "weights": weights,
                      "n_shards": args.shards}))
    ray.shutdown()


def cmd_redact(args) -> None:
    ray = _ray_init()
    import ray.data

    from .functions.redact import PII_PATTERNS, denylist_pattern, redact_text
    from .sources.io import write_table

    patterns = list(PII_PATTERNS)
    if args.deny:
        patterns.append(("deny", denylist_pattern(args.deny), "[TERM]"))
    ds = ray.data.read_parquet(args.input)
    out = redact_text(ds, args.col, patterns=patterns)
    write_table(out, args.out)
    from ray.data.aggregate import Sum

    cols = [f"n_{name}" for name, _, _ in patterns]
    sums = ray.data.read_parquet(args.out, columns=cols).aggregate(
        *[Sum(c, alias_name=c) for c in cols])
    print(json.dumps({"redactions": {c: int(sums[c]) for c in cols}}))
    ray.shutdown()


def cmd_hh(args) -> None:
    ray = _ray_init()
    import ray.data

    from .pipelines.sketches import heavy_hitters

    ds = ray.data.read_parquet(args.input, columns=[args.col])
    tbl = heavy_hitters(ds, args.col, threshold=args.threshold, k=args.k)
    print(json.dumps({"values": [
        {"value": v, "n": n}
        for v, n in zip(tbl.column("value").to_pylist(),
                        tbl.column("n").to_pylist())]}))
    ray.shutdown()


def cmd_compact(args) -> None:
    ray = _ray_init()

    from .sources.io import compact_table

    manifest = compact_table(args.input, args.out,
                             min_rows_per_file=args.min_rows,
                             max_rows_per_file=args.max_rows)
    print(json.dumps(manifest))
    ray.shutdown()


def cmd_shuffle(args) -> None:
    ray = _ray_init()
    import ray.data

    from .pipelines.sampling import global_shuffle

    ds = ray.data.read_parquet(args.input)
    out = global_shuffle(ds, args.id_col, seed=args.seed)
    os.makedirs(args.out, exist_ok=True)
    out.write_parquet(args.out)
    print(json.dumps({"rows": ds.count(), "seed": args.seed}))
    ray.shutdown()


def cmd_migrate(args) -> None:
    """In-place schema migration of a partitioned/bucketed output —
    reference scripts/migrate_database.py analog (add columns idempotently;
    here also rename/drop), per-unit rewrite, ledger-resumable."""
    ray = _ray_init()

    from .state.migrate import migrate_store

    add = {}
    for spec in args.add or []:
        parts = spec.split(":", 2)
        if len(parts) < 2:
            raise SystemExit(f"--add needs name:type[:default], got {spec!r}")
        name, typ = parts[0], parts[1]
        default = None
        if len(parts) == 3:
            import pyarrow as _pa

            default = _pa.scalar(json.loads(parts[2]),
                                 _pa.type_for_alias(typ)).as_py()
        add[name] = (typ, default)
    rename = {}
    for spec in args.rename or []:
        old, _, new = spec.partition("=")
        if not new:
            raise SystemExit(f"--rename needs old=new, got {spec!r}")
        rename[old] = new
    out = migrate_store(args.out, add_columns=add, rename_columns=rename,
                        drop_columns=args.drop or [],
                        schema_version=args.schema_version,
                        resume=not args.no_resume)
    print(json.dumps(out))
    ray.shutdown()


def cmd_manifest(args) -> None:
    from .state.checkpoint import committed_partitions

    done = committed_partitions(args.out)
    print(json.dumps({
        "committed": sorted(done),
        "rows": sum(m.get("rows", 0) for m in done.values()),
        "partitions": done,
    }))


def main(argv=None) -> None:
    ap = argparse.ArgumentParser(prog="insurance_pdf_extractor_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    p = sub.add_parser("run", help="resumable extraction run over an input dir")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--partitions", type=int, default=16)
    p.add_argument("--flat", action="store_true", help="flatten fields struct")
    p.add_argument("--keep-boilerplate", action="store_true")
    p.add_argument("--resume", action=argparse.BooleanOptionalAction, default=True)
    p.set_defaults(fn=cmd_run)

    p = sub.add_parser("synth", help="write a synthetic corpus")
    p.add_argument("--num-docs", type=int, required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--goldens", action="store_true")
    p.set_defaults(fn=cmd_synth)

    p = sub.add_parser("stats", help="status breakdown of a results dir")
    p.add_argument("--results", required=True)
    p.set_defaults(fn=cmd_stats)

    p = sub.add_parser("export", help="export results to JSON/CSV")
    p.add_argument("--results", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--format", choices=["json", "csv"], default="json")
    p.add_argument("--limit", type=int, default=10000)
    p.set_defaults(fn=cmd_export)

    p = sub.add_parser("dedup", help="deduplicate a document table")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--method", choices=["exact", "minhash", "jaccard"],
                   default="exact")
    p.add_argument("--col", default="text")
    p.add_argument("--id-col", dest="id_col", default="doc_id")
    p.add_argument("--threshold", type=float, default=0.8)
    p.set_defaults(fn=cmd_dedup)

    p = sub.add_parser("quality", help="quality-filter a document table")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--col", default="text")
    p.add_argument("--id-col", dest="id_col", default="doc_id")
    p.add_argument("--min-quality", dest="min_quality", type=float, default=0.6)
    p.set_defaults(fn=cmd_quality)

    p = sub.add_parser("sample", help="deterministic hash sample / split assignment")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--id-col", dest="id_col", default="doc_id")
    p.add_argument("--rate", type=float, default=0.1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--split", action="store_true",
                   help="assign train/val/test labels instead of filtering")
    p.add_argument("--test-rate", dest="test_rate", type=float, default=0.1)
    p.add_argument("--val-rate", dest="val_rate", type=float, default=0.0)
    p.set_defaults(fn=cmd_sample)

    p = sub.add_parser("profile", help="per-column profile of a table")
    p.add_argument("--input", required=True)
    p.add_argument("--columns", nargs="*", default=None)
    p.add_argument("--no-distinct", action="store_true")
    p.set_defaults(fn=cmd_profile)

    p = sub.add_parser("pack", help="pack documents into fixed token-budget sequences")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--col", default="text")
    p.add_argument("--id-col", dest="id_col", default="doc_id")
    p.add_argument("--seq-len", dest="seq_len", type=int, default=2048)
    p.add_argument("--bucket", type=int, default=100_000)
    p.set_defaults(fn=cmd_pack)

    p = sub.add_parser("pretrain", help="end-to-end pretraining prep: gates -> decontaminate -> dedup -> pack")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--eval", default=None, help="held-out corpus to decontaminate against")
    p.add_argument("--col", default="text")
    p.add_argument("--id-col", dest="id_col", default="doc_id")
    p.add_argument("--seq-len", dest="seq_len", type=int, default=2048)
    p.add_argument("--k-contam", dest="k_contam", type=int, default=8)
    p.add_argument("--bucket", type=int, default=100_000)
    p.set_defaults(fn=cmd_pretrain)

    p = sub.add_parser("decontaminate", help="flag docs sharing k-grams with an eval corpus")
    p.add_argument("--input", required=True)
    p.add_argument("--eval", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--col", default="text")
    p.add_argument("--id-col", dest="id_col", default="doc_id")
    p.add_argument("--k", type=int, default=8)
    p.set_defaults(fn=cmd_decontaminate)

    p = sub.add_parser("mix", help="weighted mixture interleave with repetition")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--source-col", dest="source_col", default="source")
    p.add_argument("--id-col", dest="id_col", default="doc_id")
    p.add_argument("--weights", nargs="+", required=True,
                   metavar="SOURCE=W", help="e.g. wiki=2.5 cc=0.3")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--shards", type=int, default=64)
    p.add_argument("--by-shard", action="store_true",
                   help="write output partitioned by shard")
    p.set_defaults(fn=cmd_mix)

    p = sub.add_parser("redact", help="PII / denylist text scrubbing")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--col", default="text")
    p.add_argument("--deny", nargs="*", default=None,
                   help="extra whole-word denylist terms")
    p.set_defaults(fn=cmd_redact)

    p = sub.add_parser("hh", help="exact heavy hitters of a column")
    p.add_argument("--input", required=True)
    p.add_argument("--col", required=True)
    p.add_argument("--threshold", type=int, required=True)
    p.add_argument("--k", type=int, default=4096)
    p.set_defaults(fn=cmd_hh)

    p = sub.add_parser("compact", help="compact a fragment dir to size-bounded files")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--min-rows", type=int, default=200_000)
    p.add_argument("--max-rows", type=int, default=1_000_000)
    p.set_defaults(fn=cmd_compact)

    p = sub.add_parser("shuffle", help="reproducible seeded global shuffle")
    p.add_argument("--input", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--id-col", required=True)
    p.add_argument("--seed", type=int, default=0)
    p.set_defaults(fn=cmd_shuffle)

    p = sub.add_parser("manifest", help="show committed partitions of a run")
    p.add_argument("--out", required=True)
    p.set_defaults(fn=cmd_manifest)

    p = sub.add_parser(
        "migrate",
        help="in-place schema migration of a partitioned/bucketed output")
    p.add_argument("--out", required=True,
                   help="root of the at-rest layout (part-*/ or _bucket=*/)")
    p.add_argument("--add", action="append", metavar="NAME:TYPE[:DEFAULT]",
                   help="add a column (DEFAULT is JSON; null if omitted)")
    p.add_argument("--rename", action="append", metavar="OLD=NEW")
    p.add_argument("--drop", action="append", metavar="NAME")
    p.add_argument("--schema-version", default=None)
    p.add_argument("--no-resume", action="store_true",
                   help="ignore the migration ledger and redo every unit")
    p.set_defaults(fn=cmd_migrate)

    args = ap.parse_args(argv)
    try:
        args.fn(args)
    except FileNotFoundError as e:
        print(f"error: {e}", file=__import__("sys").stderr)
        raise SystemExit(2)


if __name__ == "__main__":
    main()
