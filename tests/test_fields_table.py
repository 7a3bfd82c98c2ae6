"""Long-format field explosion (J2) + A6 success rates."""

import pytest

import ray.data

from insurance_pdf_extractor_ray.config import FIELD_ORDER
from insurance_pdf_extractor_ray.pipelines.analytics import success_rates
from insurance_pdf_extractor_ray.pipelines.extraction import extract_pipeline
from insurance_pdf_extractor_ray.pipelines.fields_table import (
    explode_fields,
    field_success_flags,
)

pytestmark = pytest.mark.usefixtures("ray_session")


def test_explode_and_rates(ray_session, corpus_600):
    ds = ray.data.read_parquet(str(corpus_600 / "documents.parquet"))
    extracted = extract_pipeline(ds)
    long = explode_fields(extracted)
    rows = long.take_all()
    assert len(rows) == 600 * len(FIELD_ORDER)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert all(len(v) == len(FIELD_ORDER) for v in by_doc.values())
    some = by_doc["doc-000000000"]
    qn = next(r for r in some if r["field_name"] == "quote_number")
    assert qn["field_value"].startswith("WC-")
    assert qn["confidence"] > 0.5
    assert qn["is_failed"] is False

    flagged = field_success_flags(ray.data.from_items(rows))
    rates = success_rates(flagged, "field_name", "success_flag").take_all()
    assert len(rates) == len(FIELD_ORDER)
    rate_of = {r["field_name"]: r["success_rate"] for r in rates}
    # A6's predicate counts any non-EMPTY, non-failed value as success
    # (storage.py:557-560) — so the VALIDATION_FAILED sentinel counts too
    # unless the field itself is in failed_fields: quote_number is failed only
    # in missing_required (1/12 families) -> 550/600
    assert rate_of["quote_number"] == pytest.approx(100 * 550 / 600, abs=0.1)
    # rates sorted descending
    vals = [r["success_rate"] for r in rates]
    assert vals == sorted(vals, reverse=True)
