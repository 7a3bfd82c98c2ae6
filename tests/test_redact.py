"""PII / denylist redaction: planted-PII literals + DuckDB re-derivation."""

import duckdb
import pyarrow as pa
import pytest
import ray.data

from insurance_pdf_extractor_ray.functions.redact import (
    PII_PATTERNS,
    denylist_pattern,
    redact_sql_expr,
    redact_text,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def _run(texts, patterns=tuple(PII_PATTERNS)):
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    out = redact_text(ray.data.from_arrow(tbl).repartition(2), "text",
                      patterns=patterns).take_all()
    return sorted(out, key=lambda r: r["doc_id"])


def test_planted_pii():
    rows = _run([
        "mail bob.smith+x@corp.example.co now",
        "call 415-555-1234 or 415.555.9999",
        "ssn 123-45-6789 on file",
        "clean text, no pii at all",
        "combo a@b.io and 212-555-0000 and 987-65-4321",
    ])
    assert rows[0]["text_redacted"] == "mail [EMAIL] now"
    assert rows[0]["n_email"] == 1 and rows[0]["n_phone"] == 0
    assert rows[1]["text_redacted"] == "call [PHONE] or [PHONE]"
    assert rows[1]["n_phone"] == 2
    # ssn pattern also matches the phone class shape dd-dd? no: phone is
    # 3-3-4, ssn is 3-2-4 — the planted ssn must survive to the ssn class
    assert rows[2]["text_redacted"] == "ssn [SSN] on file"
    assert rows[2]["n_ssn"] == 1 and rows[2]["n_phone"] == 0
    assert rows[3]["text_redacted"] == "clean text, no pii at all"
    assert rows[4]["n_email"] == 1 and rows[4]["n_phone"] == 1 \
        and rows[4]["n_ssn"] == 1


def test_denylist_whole_word():
    pats = [("deny", denylist_pattern(["spark", "sparkle"]), "[X]")]
    rows = _run(["spark sparkle sparks", "no match here"], patterns=pats)
    # longest-first alternation: 'sparkle' is not eaten by 'spark';
    # 'sparks' is not a whole-word match
    assert rows[0]["text_redacted"] == "[X] [X] sparks"
    assert rows[0]["n_deny"] == 2
    assert rows[1]["n_deny"] == 0


def test_denylist_rejects_non_word():
    with pytest.raises(ValueError):
        denylist_pattern(["a.b"])


def test_matches_duckdb_rederivation():
    texts = [
        "x a@b.co y 415-555-1234 z 123-45-6789 spark",
        "spark spark 999.888.7777x not-a-phone",  # trailing x kills \\b? no:
        # x is a word char so \\b fails only on the RIGHT side of 7777x
        "plain words only",
        "e@ma.il.com trailing dot.",
    ]
    pats = list(PII_PATTERNS) + [("deny", denylist_pattern(["spark"]), "[T]")]
    rows = _run(texts, patterns=pats)
    tbl = pa.table({"doc_id": pa.array(range(len(texts)), pa.int64()),
                    "text": pa.array(texts, pa.string())})
    con = duckdb.connect()
    con.register("t", tbl)
    want = con.execute(
        f"SELECT doc_id, {redact_sql_expr('text', pats)} FROM t ORDER BY 1"
    ).fetchall()
    assert [r["text_redacted"] for r in rows] == [w[1] for w in want]
