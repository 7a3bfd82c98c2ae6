"""PII / denylist redaction — vectorized text scrubbing.

Training-data pipelines scrub two kinds of content before anything else sees
the text: structured PII (emails, phone numbers, SSN-like ids) and
denylisted terms (trademarks, usernames, opted-out domains).  Both are pure
per-row rewrites — zero shuffle, one streaming ``map_batches`` — and both
use regex dialect common to the Rust regex crate (polars), RE2 (DuckDB) and
Python ``re``: no backreferences, no lookarounds, so the SQL oracle can
re-derive the rewrite character-for-character.

Patterns (class → replacement token):
  email  [A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}   → [EMAIL]
  phone  \\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b                   → [PHONE]
  ssn    \\b\\d{3}-\\d{2}-\\d{4}\\b                          → [SSN]

Order matters (ssn before phone would double-match); classes apply in the
listed order, each over the previous class's output — mirrored exactly by
nesting ``regexp_replace(..., 'g')`` in SQL.
"""

from __future__ import annotations

from typing import Dict, List, Sequence, Tuple

import numpy as np
import pyarrow as pa
import ray.data

PII_PATTERNS: List[Tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "[EMAIL]"),
    ("phone", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "[PHONE]"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b", "[SSN]"),
]


def denylist_pattern(terms: Sequence[str]) -> str:
    """Whole-word alternation for a term denylist (terms must be \\w-only;
    sorted longest-first so shorter terms never shadow longer ones)."""
    import re as _re

    for t in terms:
        if not t or _re.search(r"\W", t):
            raise ValueError(f"denylist terms must be word characters: {t!r}")
    alts = "|".join(sorted(terms, key=lambda t: (-len(t), t)))
    return rf"\b({alts})\b"


def redact_text(
    ds: ray.data.Dataset,
    text_col: str,
    patterns: Sequence[Tuple[str, str, str]] = tuple(PII_PATTERNS),
    out_col: str = "text_redacted",
    count_cols: bool = True,
) -> ray.data.Dataset:
    """Apply each (name, pattern, replacement) in order; emit the rewritten
    ``out_col`` plus, when ``count_cols``, an int64 ``n_<name>`` match count
    per class (counted on that class's INPUT text, i.e. post the previous
    classes — same convention the SQL oracle nests)."""
    patterns = list(patterns)

    def scrub(batch: pa.Table) -> pa.Table:
        import polars as pl

        s = pl.from_arrow(batch.column(text_col).cast(pa.large_string()))
        counts: Dict[str, np.ndarray] = {}
        for name, pat, repl in patterns:
            if count_cols:
                counts[name] = s.str.count_matches(pat).fill_null(0) \
                                .to_numpy().astype(np.int64)
            s = s.str.replace_all(pat, repl)
        out = batch.append_column(out_col, s.to_arrow().cast(pa.string()))
        for name in counts:
            out = out.append_column(f"n_{name}",
                                    pa.array(counts[name], pa.int64()))
        return out

    return ds.map_batches(scrub, batch_format="pyarrow")


def redact_sql_expr(col: str,
                    patterns: Sequence[Tuple[str, str, str]]) -> str:
    """Nested DuckDB ``regexp_replace(..., 'g')`` mirroring ``redact_text``'s
    class order (innermost = first class)."""
    expr = col
    for _, pat, repl in patterns:
        p = pat.replace("'", "''")
        expr = f"regexp_replace({expr}, '{p}', '{repl}', 'g')"
    return expr
