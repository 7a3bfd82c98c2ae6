"""Shared helpers for the query registry (mechanical split of __ray_entry__.py)."""

from __future__ import annotations
import glob
import os
from collections.abc import Callable
from typing import Any
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

__all__ = ['SF_DEFAULT', '_round_away', '_docs_rows', '_corpus_root', '_corpus_for', '_events', '_documents', '_read', '_filtered_keys', '_filtered_dim', '_round_col', 'entry', '_ids_table', '_HOUR_US', '_MIX_WEIGHTS', '_round_half_away', '_customer_name_graph', '_r_cents_half_away', '_rev_i4', '_bpe_chain_parts', '_bpe_oracle', '_pretrain_bpe_oracle', '_stopword_oracle', '_kcore_oracle', '_global_ndistinct', '_skyline_2d', '_acf_oracle', '_HLL_PINNED_SQL', '_pii_redact_sql', '_zorder_sql', '_shuffled_head_sql', '_mixture_sql', '_EMPTY_DIFF_SQL']

SF_DEFAULT = "/root/testdata/sf0.001"


def _round_away(v: float, nd: int) -> float:
    """DuckDB-ROUND-exact scalar round (std::round half away from zero)."""
    import math

    m = 10 ** nd
    return math.floor(v * m + 0.5) / m if v >= 0 else -math.floor(-v * m + 0.5) / m


def _docs_rows(sf_dir: str) -> int:
    return pq.ParquetFile(os.path.join(sf_dir, "documents.parquet")).metadata.num_rows


def _corpus_root(sf_dir: str) -> str:
    """Deterministic synthetic span corpus + goldens sized to the sf documents
    table, cached under /tmp (regenerated if absent)."""
    from insurance_pdf_extractor_ray.sources.synth import GEN_VERSION, write_corpus

    n = _docs_rows(sf_dir)
    out = f"/tmp/ipe_corpus/v{GEN_VERSION}-{n}"
    docs = os.path.join(out, "documents")
    golden = os.path.join(out, "expected_fields")
    if not (glob.glob(os.path.join(docs, "*.parquet"))
            and glob.glob(os.path.join(golden, "*.parquet"))):
        write_corpus(n, out, goldens=True)
    return out


def _corpus_for(sf_dir: str) -> str:
    return os.path.join(_corpus_root(sf_dir), "documents")


def _events(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "events.parquet"), columns=columns)


def _documents(sf_dir: str, columns=None):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, "documents.parquet"), columns=columns)


def _read(sf_dir: str, table: str, columns=None):
    import ray.data

    return ray.data.read_parquet(os.path.join(sf_dir, f"{table}.parquet"),
                                 columns=columns)


def _filtered_keys(sf_dir: str, table: str, key_col: str, columns,
                   pred_fn) -> np.ndarray:
    """Distributed dimension filter -> sorted int64 key array.

    ``pred_fn(batch) -> pa.BooleanArray`` runs Dataset-side (vectorized per
    batch, pruned read); only MATCHING keys reach the driver — never the
    full dimension table.  Use for broadcast-side key sets: the collected
    set must be broadcast-sized (the same precondition
    ``broadcast_semi_join`` already imposes on its key argument)."""
    import ray as _ray

    def keep(b: pa.Table) -> pa.Table:
        return b.filter(pred_fn(b)).select([key_col])

    tbls = [t for t in _ray.get(
        _read(sf_dir, table, columns)
        .map_batches(keep, batch_format="pyarrow").to_arrow_refs())
        if t.num_rows]
    if not tbls:
        return np.zeros(0, np.int64)
    arr = pa.concat_tables(tbls).column(key_col) \
            .to_numpy(zero_copy_only=False).astype(np.int64)
    return np.sort(arr)


def _filtered_dim(sf_dir: str, table: str, columns,
                  pred_fn=None) -> pa.Table:
    """Dataset-side dimension filter -> projected Arrow table of ONLY the
    matching rows (zero-copy Arrow refs, no Python row objects).

    The full dimension never materializes as driver Python state: the
    predicate runs vectorized per batch inside the read pipeline, and the
    driver concatenates just the surviving rows — so the collected table is
    sized by predicate selectivity (or, with no predicate, is an explicit
    broadcast of the projected dimension for a star-schema map-side join,
    the same precondition ``joins.broadcast_join`` imposes)."""
    import pyarrow.parquet as _pq

    import ray as _ray

    ds = _read(sf_dir, table, columns)
    if pred_fn is not None:
        ds = ds.map_batches(lambda b: b.filter(pred_fn(b)),
                            batch_format="pyarrow")
    tbls = [t for t in _ray.get(ds.to_arrow_refs()) if t.num_rows]
    if tbls:
        return pa.concat_tables(tbls).combine_chunks()
    schema = _pq.read_schema(os.path.join(sf_dir, f"{table}.parquet"))
    return pa.schema([schema.field(c) for c in columns]).empty_table()


def _round_col(tbl: pa.Table, col: str, nd: int) -> pa.Table:
    """Round a float column mirroring DuckDB's ROUND bit-exactly
    (std::round(v*10^nd)/10^nd, half away from zero) — pc.round can land one
    ULP away from DuckDB's result (e.g. 16376.630000000001 vs 16376.63)."""
    i = tbl.schema.get_field_index(col)
    v = tbl.column(col).cast(pa.float64()).to_numpy(zero_copy_only=False)
    m = 10.0 ** nd
    r = np.where(v >= 0, np.floor(v * m + 0.5) / m, -np.floor(-v * m + 0.5) / m)
    return tbl.set_column(i, col, pa.array(r, pa.float64()))


def entry() -> Any:
    """Flagship pipeline on a corpus derived from sf0.001; returns a Dataset."""
    from insurance_pdf_extractor_ray.pipelines.extraction import (
        extract_pipeline,
        flatten_fields,
    )

    return flatten_fields(extract_pipeline(_corpus_for(SF_DEFAULT)))


def _ids_table(ds) -> pa.Table:
    """Sorted, typed doc_id table (map_groups Datasets carry empty
    zero-column blocks that can poison the driver's value hash)."""
    ids = sorted(r["doc_id"] for r in ds.take_all())
    return pa.table({"doc_id": pa.array(ids, pa.int64())})


_HOUR_US = 3_600_000_000


_MIX_WEIGHTS = {"src0": 2.5, "src1": 1.0, "src2": 0.25, "src4": 1.75}


def _round_half_away(x: float, nd: int) -> float:
    """DuckDB ROUND semantics (half away from zero) — Python round() is
    banker's and diverges on exact .5 boundaries."""
    m = 10.0 ** nd
    import math
    return math.copysign(math.floor(abs(x) * m + 0.5), x) / m


def _customer_name_graph(sf_dir: str):
    """Symmetrized nation-blocked lev<=1 customer-name edge list — shared
    by the PageRank-family queries (same derivation as entity_components:
    fuzzy pairs + block dim joins, empty-block hygiene between them)."""
    from insurance_pdf_extractor_ray.dsutil import drop_empty_blocks
    from insurance_pdf_extractor_ray.pipelines.dedup import join_partitions_for
    from insurance_pdf_extractor_ray.pipelines.fuzzy import fuzzy_pairs

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_nationkey"])
    pairs = drop_empty_blocks(
        fuzzy_pairs(cust.select_columns(["c_custkey", "c_name"]),
                    "c_custkey", "c_name"),
        empty_schema=pa.schema([("id_a", pa.int64()),
                                ("id_b", pa.int64())]))
    # pairs just materialized (drop_empty_blocks) — size the join to the
    # data, not the CPU count (aggregator actors cost ~1s each to spin up)
    P = join_partitions_for(pairs.count())
    dim = cust.select_columns(["c_custkey", "c_nationkey"])
    pairs = pairs.join(dim, join_type="inner", num_partitions=P,
                       on=("id_a",), right_on=("c_custkey",))
    pairs = drop_empty_blocks(
        pairs, empty_schema=pa.schema([
            ("id_a", pa.int64()), ("id_b", pa.int64()),
            ("c_custkey", pa.int64()), ("c_nationkey", pa.int32())]))
    pairs = pairs.join(dim, join_type="inner", num_partitions=P,
                       on=("id_b",), right_on=("c_custkey",),
                       right_suffix="_rb")
    pairs = pairs.map_batches(
        lambda t: t.filter(pc.equal(t.column("c_nationkey"),
                                    t.column("c_nationkey_rb")))
                   .select(["id_a", "id_b"]),
        batch_format="pyarrow")
    return pairs.map_batches(
        lambda t: pa.table({
            "src": pa.concat_arrays([t.column("id_a").combine_chunks(),
                                     t.column("id_b").combine_chunks()]),
            "dst": pa.concat_arrays([t.column("id_b").combine_chunks(),
                                     t.column("id_a").combine_chunks()])}),
        batch_format="pyarrow")


def _r_cents_half_away(x):
    """Vectorized round-half-away to integer cents, exact for x >= 0
    (trunc-fraction compare — no floor(x+0.5) representability edge)."""
    import numpy as np

    q = x * 100.0
    tq = np.trunc(q)
    return (tq + (q - tq >= 0.5)).astype(np.int64)


def _rev_i4(batch: pa.Table, key: str) -> pa.Table:
    """Per-row revenue extprice*(1-disc) rounded half-up to 4dp, scaled to
    int64 — integer sums are reduction-order-exact and match DuckDB's
    round() bit-for-bit on positive values."""
    price = batch.column("l_extendedprice").to_numpy(zero_copy_only=False)
    disc = batch.column("l_discount").to_numpy(zero_copy_only=False)
    rev = price * (1.0 - disc) * 10000.0
    return pa.table({
        key: batch.column(key),
        "rev_i4": pa.array(np.floor(rev + 0.5).astype(np.int64), pa.int64()),
    })


def _bpe_chain_parts(k: int, source: str) -> list:
    """CTE list for unrolled-k BPE over ``source`` (a FROM-able SQL text
    with a ``text`` column).  Per level: weighted adjacent-pair counts over
    the symbol strings, argmax (count desc, pair asc), then a plain
    ``replace`` on the double-space encoding — same greedy left-to-right
    non-overlap semantics as Python ``str.replace`` (run case included).
    CTEs are MATERIALIZED: each level references the previous three times,
    and inlining would re-evaluate the chain exponentially."""
    parts = [f"""tok AS (SELECT unnest(regexp_extract_all(lower(text),
                       '[a-z0-9]+')) AS token FROM ({source})),
wc AS (SELECT token, COUNT(*) AS c FROM tok GROUP BY 1),
w0 AS MATERIALIZED (SELECT token, '  ' || array_to_string(
       regexp_split_to_array(token, ''), '  ') || '  ' AS s, c FROM wc)"""]
    sel = []
    for i in range(k):
        parts.append(f"""pc{i} AS MATERIALIZED (SELECT pair, SUM(c) AS pc
  FROM (SELECT unnest(list_transform(generate_series(1, len(sy) - 1),
          j -> sy[j] || ' ' || sy[j + 1])) AS pair, c
        FROM (SELECT list_filter(string_split(s, ' '), x -> x <> '') AS sy,
                     c FROM w{i})) GROUP BY 1),
b{i} AS MATERIALIZED (SELECT pair, pc FROM pc{i}
                      ORDER BY pc DESC, pair ASC LIMIT 1),
w{i + 1} AS MATERIALIZED (SELECT token, replace(s,
     ' ' || string_split((SELECT pair FROM b{i}), ' ')[1] || '  '
         || string_split((SELECT pair FROM b{i}), ' ')[2] || ' ',
     ' ' || replace((SELECT pair FROM b{i}), ' ', '') || ' ') AS s, c
   FROM w{i})""")
        sel.append(f"""SELECT CAST({i} AS BIGINT) AS rank,
  string_split(pair, ' ')[1] AS "left",
  string_split(pair, ' ')[2] AS "right",
  replace(pair, ' ', '') AS merged,
  CAST(pc AS BIGINT) AS pair_count FROM b{i}""")
    return parts, sel


def _bpe_oracle(k: int, mode: str = "merges",
                source: str = "SELECT text FROM documents",
                doc_source: str = "SELECT doc_id, text FROM documents") -> str:
    parts, sel = _bpe_chain_parts(k, source)
    if mode == "apply":
        # token-carrying final table -> pieces per distinct token ->
        # per-doc piece sums over the token explode
        return ("WITH " + ",\n".join(parts) + f""",
pieces AS (SELECT token, len(list_filter(string_split(s, ' '),
                              x -> x <> '')) AS p FROM w{k}),
docs AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
                  '[a-z0-9]+')) AS token FROM ({doc_source}))
SELECT d.doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(pieces.p) AS BIGINT) AS n_pieces
FROM docs d JOIN pieces USING (token)
GROUP BY 1 ORDER BY 1""")
    return ("WITH " + ",\n".join(parts) + "\n"
            + "\nUNION ALL\n".join(sel) + "\nORDER BY rank")


def _pretrain_bpe_oracle(k: int = 8) -> str:
    """v1 survivor chain (gates -> decontaminate -> dedup) + unrolled-BPE
    trained over the survivors + piece-count packing, as ONE CTE pipeline."""
    surv_chain = """wn AS (
      SELECT doc_id, text,
             regexp_extract_all(lower(text), '[a-z0-9]+') AS w,
             len(regexp_extract_all(lower(text), '[a-z0-9]+')) AS nw
      FROM documents
    ), corp AS (SELECT * FROM wn WHERE doc_id % 50 <> 0
    ), uni AS (
      SELECT doc_id, count(DISTINCT x) AS nd
      FROM corp, unnest(w) AS u(x) GROUP BY doc_id
    ), bi AS (
      SELECT doc_id, max(CASE WHEN c >= 2 THEN c ELSE 0 END) AS m
      FROM (SELECT doc_id, array_to_string(w[i:i+1], ' ') AS g, count(*) AS c
            FROM corp, unnest(generate_series(1, nw - 1)) AS s(i)
            WHERE nw >= 2 GROUP BY doc_id, g) GROUP BY doc_id
    ), tri AS (
      SELECT doc_id, max(CASE WHEN c >= 2 THEN c ELSE 0 END) AS m
      FROM (SELECT doc_id, array_to_string(w[i:i+2], ' ') AS g, count(*) AS c
            FROM corp, unnest(generate_series(1, nw - 2)) AS s(i)
            WHERE nw >= 3 GROUP BY doc_id, g) GROUP BY doc_id
    ), gated AS (
      SELECT corp.doc_id FROM corp
      LEFT JOIN uni USING (doc_id) LEFT JOIN bi USING (doc_id)
      LEFT JOIN tri USING (doc_id)
      WHERE (CASE WHEN corp.nw > 0
             THEN round(1 - uni.nd * 1.0 / corp.nw, 6) ELSE 0 END) <= 0.80
        AND round(coalesce(bi.m * 2.0 / corp.nw, 0), 6) <= 0.20
        AND round(coalesce(tri.m * 3.0 / corp.nw, 0), 6) <= 0.18
    ), evg AS (
      SELECT DISTINCT array_to_string(w[i:i+7], ' ') AS gram
      FROM wn, unnest(generate_series(1, nw - 8 + 1)) AS t(i)
      WHERE nw >= 8 AND doc_id % 50 = 0
    ), contam AS (
      SELECT DISTINCT doc_id FROM (
        SELECT c.doc_id, array_to_string(c.w[i:i+7], ' ') AS gram
        FROM corp c JOIN gated USING (doc_id),
             unnest(generate_series(1, c.nw - 8 + 1)) AS t(i)
        WHERE c.nw >= 8)
      WHERE gram IN (SELECT gram FROM evg)
    ), clean AS (
      SELECT c.doc_id, c.text FROM corp c JOIN gated USING (doc_id)
      WHERE c.doc_id NOT IN (SELECT doc_id FROM contam)
    ), winners AS (
      SELECT doc_id FROM (
        SELECT doc_id, min(doc_id) OVER (PARTITION BY text) AS m
        FROM clean) WHERE doc_id = m
    ), surv AS MATERIALIZED (
      SELECT c.doc_id, c.text FROM clean c JOIN winners USING (doc_id))"""
    bpe_parts, _ = _bpe_chain_parts(k, "SELECT text FROM surv")
    return ("WITH " + surv_chain + ",\n" + ",\n".join(bpe_parts) + f""",
pieces AS (SELECT token, len(list_filter(string_split(s, ' '),
                              x -> x <> '')) AS p FROM w{k}),
sd AS (SELECT doc_id, unnest(regexp_extract_all(lower(text),
              '[a-z0-9]+')) AS token FROM surv),
npc AS (SELECT sd.doc_id, CAST(SUM(pieces.p) AS BIGINT) AS n_pieces
        FROM sd JOIN pieces USING (token) GROUP BY 1),
cum AS (SELECT doc_id, n_pieces,
          CAST(COALESCE(sum(n_pieces) OVER (ORDER BY doc_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
            0) AS BIGINT) AS start_tok
        FROM npc)
SELECT doc_id,
       unnest(generate_series(start_tok // 1024,
                (start_tok + n_pieces - 1) // 1024)) AS seq_id,
       start_tok, start_tok + n_pieces AS end_tok
FROM cum WHERE n_pieces > 0
ORDER BY doc_id, seq_id""")


def _stopword_oracle() -> str:
    from insurance_pdf_extractor_ray.functions.textstats import _STOPWORDS

    sums = []
    for l in sorted(_STOPWORDS):
        lst = ", ".join(f"'{w}'" for w in sorted(_STOPWORDS[l]))
        sums.append(f"CAST(SUM(CASE WHEN t IN ({lst}) THEN 1 ELSE 0"
                    f" END) AS BIGINT) AS sw_{l}")
    return ("""
        WITH tok AS (SELECT doc_id,
                       unnest(regexp_extract_all(lower(text),
                              '[a-z0-9]+')) AS t
                     FROM documents)
        SELECT doc_id, COUNT(*) AS n_tokens, """ + ",\n".join(sums)
            + " FROM tok GROUP BY 1 ORDER BY 1")


def _kcore_oracle(k: int, rounds: int) -> str:
    """Unrolled synchronous peeling over the integer-exact similarity
    edges (same edge CTE as similarity_triangles)."""
    parts = ["""q AS (SELECT vec_id,
             unnest(generate_series(1, len(embedding))) - 1 AS i,
             CAST(-floor(-(CAST(unnest(embedding) AS DOUBLE)
                           * 1048576) + 0.5) AS BIGINT) AS qv
           FROM embeddings WHERE vec_id < 400),
s AS (SELECT a.vec_id AS u, b.vec_id AS v, SUM(a.qv * b.qv) AS sim
      FROM q a JOIN q b ON a.i = b.i AND a.vec_id < b.vec_id
      GROUP BY 1, 2),
e0 AS MATERIALIZED (SELECT u, v FROM s WHERE sim >= 274877906944)"""]
    for i in range(rounds):
        parts.append(f"""d{i} AS MATERIALIZED (
  SELECT node, COUNT(*) AS degree FROM
  (SELECT u AS node FROM e{i} UNION ALL SELECT v FROM e{i}) GROUP BY 1),
k{i} AS MATERIALIZED (SELECT node FROM d{i} WHERE degree >= {k}),
e{i + 1} AS MATERIALIZED (
  SELECT u, v FROM e{i}
  WHERE u IN (SELECT node FROM k{i}) AND v IN (SELECT node FROM k{i}))""")
    return ("WITH " + ",\n".join(parts) + f"""
SELECT node, degree FROM d{rounds - 1} WHERE degree >= {k} ORDER BY node""")


def _global_ndistinct(ds, col: str) -> int:
    """Global COUNT(DISTINCT col): map-side per-batch dedup, one
    value-keyed combine, metadata count."""

    def part(t: pa.Table) -> pa.Table:
        return t.select([col]).group_by([col]).aggregate([])

    return (ds.map_batches(part, batch_format="pyarrow")
            .groupby(col).count().count())


def _skyline_2d(x: np.ndarray, y: np.ndarray):
    """Distinct 2-D maxima: keep (x, y) iff no other point has both
    coords >= with one strictly greater.  Per distinct x keep max y, then
    one descending-x scan with a strict running max over y."""
    if len(x) == 0:
        return x, y
    order = np.lexsort((-y, -x))
    x, y = x[order], y[order]
    first = np.ones(len(x), dtype=bool)
    first[1:] = x[1:] != x[:-1]          # max-y per distinct x
    x, y = x[first], y[first]
    runmax = np.maximum.accumulate(np.concatenate(([np.iinfo(np.int64).min],
                                                   y[:-1])))
    keep = y > runmax
    out = np.argsort(x[keep], kind="stable")
    return x[keep][out], y[keep][out]


def _acf_oracle() -> str:
    legs = []
    for L in range(1, 8):
        legs.append(f"""
            SELECT {L} AS lag, n,
                   LAG(n, {L}) OVER (ORDER BY day) AS pn
            FROM d""")
    return ("""
        WITH d AS (SELECT CAST(epoch_us(ts) // 86400000000 AS BIGINT)
                          AS day, CAST(COUNT(*) AS BIGINT) AS n
                   FROM events GROUP BY 1),
        p AS (""" + " UNION ALL ".join(legs) + """),
        s AS (SELECT lag, CAST(COUNT(*) AS BIGINT) AS k,
                     CAST(SUM(n) AS BIGINT) AS sx,
                     CAST(SUM(pn) AS BIGINT) AS sy,
                     CAST(SUM(n * pn) AS BIGINT) AS sxy,
                     CAST(SUM(n * n) AS BIGINT) AS sxx,
                     CAST(SUM(pn * pn) AS BIGINT) AS syy
              FROM p WHERE pn IS NOT NULL GROUP BY 1)
        SELECT CAST(lag AS BIGINT) AS lag,
               ROUND(CAST(k * sxy - sx * sy AS DOUBLE)
                     / sqrt(CAST(k * sxx - sx * sx AS DOUBLE)
                            * CAST(k * syy - sy * sy AS DOUBLE)), 9) AS acf
        FROM s WHERE k >= 2 ORDER BY lag
    """)


_HLL_PINNED_SQL = """
    SELECT event_type, CAST(approx_distinct AS BIGINT) AS approx_distinct
    FROM (VALUES
      ('__all__', 148), ('click', 148), ('error', 148),
      ('purchase', 148), ('signup', 148), ('view', 148)
    ) AS t(event_type, approx_distinct)
"""


def _pii_redact_sql() -> str:
    """Nested regexp_replace + per-class counts mirroring _q_pii_redact's
    ordered classes (each count on that class's input text)."""
    from insurance_pdf_extractor_ray.functions.redact import (
        PII_PATTERNS,
        denylist_pattern,
        redact_sql_expr,
    )

    patterns = list(PII_PATTERNS) + [
        ("deny", denylist_pattern(["spark", "merge", "hash"]), "[TERM]")]
    counts = []
    for i, (name, pat, _repl) in enumerate(patterns):
        prior = redact_sql_expr("text", patterns[:i])
        p = pat.replace("'", "''")
        counts.append(
            f"CAST(len(regexp_extract_all({prior}, '{p}')) AS BIGINT)"
            f" AS n_{name}")
    full = redact_sql_expr("text", patterns)
    return (f"SELECT doc_id, {', '.join(counts)}, {full} AS text_redacted "
            f"FROM documents ORDER BY doc_id")


def _zorder_sql() -> str:
    """Bit-exact Morton key via shift/mask SQL; same curve + tiebreak order
    as _q_zorder_orders."""
    from insurance_pdf_extractor_ray.pipelines.zorder import zorder_sql_expr

    expr = zorder_sql_expr(["o_custkey", "o_orderkey"], 16)
    return (f"SELECT {expr} AS zkey, o_orderkey FROM orders "
            f"ORDER BY zkey, o_orderkey")


def _shuffled_head_sql() -> str:
    """HUGEINT replica of global_shuffle's seeded 64-bit mix order."""
    from insurance_pdf_extractor_ray.pipelines.sampling import (
        shuffle_sql_order,
    )

    order = shuffle_sql_order("doc_id", seed=13)
    return (f"SELECT ROW_NUMBER() OVER (ORDER BY {order}) AS pos, "
            f"doc_id, source FROM documents ORDER BY {order} LIMIT 300")


def _mixture_sql() -> str:
    from insurance_pdf_extractor_ray.pipelines.mixing import mixture_sql

    return mixture_sql("documents", "source", "doc_id", _MIX_WEIGHTS,
                       seed=101, n_shards=64, columns="doc_id, source")


_EMPTY_DIFF_SQL = """
    SELECT CAST(NULL AS VARCHAR) AS doc_id, CAST(NULL AS VARCHAR) AS column,
           CAST(NULL AS VARCHAR) AS got, CAST(NULL AS VARCHAR) AS want
    WHERE 1=0
"""


