"""Record validation — the batch equivalent of the reference's pydantic model.

Behavioral spec: /root/reference/app/models/extraction.py:12-233 (model,
field validators, ``validate_extracted_data``) with the per-field transforms
reproduced exactly:

  * dates: 6-format strptime cascade then MM/DD/YYYY regex gate
    (extraction.py:48-58,134-161)
  * quote_number / named_insured_*: non-empty, stripped (:60-72)
  * currency + limit fields: passthrough (the reference's negative-limit check
    raises inside its own ``try`` and is swallowed by the same
    ``except ValueError: pass`` — a latent no-op we reproduce) (:74-101)
  * tria / waiver: the pydantic-variant boolean normalization — values already
    in {Included, Excluded, Yes, No, True, False} pass through UNCHANGED (:103-115)
  * commission: %/$ passthrough, bare 0..100 number -> f"{float(v)}%" (:117-132)
  * business rule: effective >= expiration -> warning; unparseable regex-valid
    dates -> relationship warning (:195-206)

Divergence (documented): on validation failure the reference's fallback
constructor (extraction.py:222-228) itself crashes under pydantic v2 because
``issuing_carrier`` has no default — requests 500.  A batch engine must
tag-and-keep (SURVEY.md §4), so we emit the *intended* partial record
(VALIDATION_FAILED sentinels, status ``partial_success``) and carry the error
strings on the row.
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import Dict, List, Tuple

from ..config import FIELD_ORDER, SCHEMA_REQUIRED
from ..functions.normalize import (
    DATE_FORMATS_PYDANTIC,
    normalize_boolean_pydantic,
    normalize_commission,
    normalize_date,
)

EMPTY = "EMPTY VALUE"
_RE_MMDDYYYY = re.compile(r"^\d{2}/\d{2}/\d{4}$")

VALIDATION_FAILED_RECORD: Dict[str, str] = {
    **{f: EMPTY for f in FIELD_ORDER},
    "quote_number": "VALIDATION_FAILED",
    "named_insured_name": "VALIDATION_FAILED",
    "named_insured_address": "VALIDATION_FAILED",
}

_DATE_FIELDS = ("policy_effective_date", "policy_expiration_date")
_REQUIRED_TEXT_FIELDS = ("named_insured_name", "named_insured_address")
_BOOL_FIELDS = ("tria", "waiver_of_subrogation_type")


def validate_record(raw: Dict[str, str]) -> Tuple[Dict[str, str], List[str], List[str], str]:
    """Validate one raw 18-field dict.

    Returns ``(fields, validation_errors, warnings, status)`` where ``fields``
    always contains all 18 keys with the EMPTY sentinel for absent values.
    """
    field_errors: List[Tuple[str, str]] = []
    out: Dict[str, str] = {}

    for name in FIELD_ORDER:
        v = raw.get(name)
        if v is None:
            if name in SCHEMA_REQUIRED:
                field_errors.append((name, "Field required"))
                out[name] = EMPTY
            else:
                out[name] = EMPTY
            continue
        if not isinstance(v, str):
            v = str(v)

        if name in _DATE_FIELDS:
            if v and v != EMPTY and not _RE_MMDDYYYY.match(v):
                v = normalize_date(v, DATE_FORMATS_PYDANTIC)
                if not _RE_MMDDYYYY.match(v):
                    field_errors.append((name, f"Date must be in MM/DD/YYYY format, got: {v}"))
        elif name == "quote_number":
            if not v or v.strip() == "":
                field_errors.append((name, "Quote number cannot be empty"))
            else:
                v = v.strip()
        elif name in _REQUIRED_TEXT_FIELDS:
            if not v or v.strip() == "":
                field_errors.append((name, "This field is required and cannot be empty"))
            else:
                v = v.strip()
        elif name in _BOOL_FIELDS:
            v = normalize_boolean_pydantic(v)
        elif name == "commission":
            v = normalize_commission(v)
        # currency / limit / plain string fields: passthrough
        out[name] = v

    if field_errors:
        detail = "; ".join(f"field '{n}': {m}" for n, m in field_errors)
        msg = (
            f"Data validation failed: {len(field_errors)} validation error(s) "
            f"for WorkersCompensationData: {detail}"
        )
        return dict(VALIDATION_FAILED_RECORD), [msg], [], "partial_success"

    warnings: List[str] = []
    eff, exp = out["policy_effective_date"], out["policy_expiration_date"]
    if eff != EMPTY and exp != EMPTY:
        try:
            if datetime.strptime(eff, "%m/%d/%Y") >= datetime.strptime(exp, "%m/%d/%Y"):
                warnings.append("Policy effective date should be before expiration date")
        except ValueError:
            warnings.append("Could not validate date relationship due to invalid date format")
    return out, [], warnings, "success"
