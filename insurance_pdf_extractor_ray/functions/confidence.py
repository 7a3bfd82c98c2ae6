"""Confidence heuristic + failed-field scrape.

Behavioral spec:
  * confidence scores — /root/reference/app/services/pdf_processor.py:403-445
  * failed-field name scrape — pdf_processor.py:387-401
"""

from __future__ import annotations

import re
from typing import Dict, List

EMPTY = "EMPTY VALUE"

_RE_QUOTED = re.compile(r"'([^']*)'")


def calculate_confidence_scores(extracted: Dict[str, str], response_text: str) -> Dict[str, float]:
    """Per-field heuristic score in [0, 1]; exactly the reference's rules.

    Base 0.5; +0.2 len>5; +0.2 value substring of response; -0.1 len<3;
    +0.1 for quote_number/named_insured_name; +0.1 for *_date containing '/';
    0.0 for EMPTY VALUE.  pdf_processor.py:403-445.
    """
    scores: Dict[str, float] = {}
    for field, value in extracted.items():
        if value == EMPTY:
            scores[field] = 0.0
            continue
        score = 0.5
        sval = str(value)
        if len(sval) > 5:
            score += 0.2
        if sval in response_text:
            score += 0.2
        if len(sval) < 3:
            score -= 0.1
        if field in ("quote_number", "named_insured_name"):
            score += 0.1
        if field.endswith("_date") and "/" in sval:
            score += 0.1
        scores[field] = min(1.0, max(0.0, score))
    return scores


def extract_failed_fields(validation_errors: List[str]) -> List[str]:
    """Scrape quoted field names from error strings; dedup (set semantics).

    pdf_processor.py:387-401 — only errors whose lowercase text contains
    'field' are scanned.  Reference uses ``list(set(...))`` (unordered); we
    sort for deterministic output, which is a superset-compatible behavior
    for equality-of-sets tests.
    """
    failed: List[str] = []
    for error in validation_errors:
        if "field" in error.lower():
            failed.extend(_RE_QUOTED.findall(error))
    return sorted(set(failed))
