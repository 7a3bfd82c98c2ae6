"""Field catalog and extractor rule tables (schema-as-config).

Rebuilds the reference's YAML field catalog (/root/reference/config/fields.yaml:1-95,
mirrored in code at app/core/config.py:182-269) as a plain-dict catalog, plus
the label->field rule table the deterministic extractor compiles in its actor
``__init__`` (replacing the reference's prompt+LLM path, gemini.py:117-134).

Users extend the engine the same way they extend the reference (§2.11 of
SURVEY.md): add a catalog entry and, optionally, label aliases / a normalizer
hook — the extractor actor picks them up at construction.
"""

from __future__ import annotations

from typing import Dict, List

EMPTY = "EMPTY VALUE"

# name -> (type, required).  Types: String | Date | Currency | Percentage |
# Boolean (format Included/Excluded).  Matches fields.yaml:1-95.
FIELD_CATALOG: Dict[str, Dict] = {
    "quote_number": {"type": "String", "required": True},
    "policy_effective_date": {"type": "Date", "format": "MM/DD/YYYY", "required": True},
    "policy_expiration_date": {"type": "Date", "format": "MM/DD/YYYY", "required": True},
    "named_insured_name": {"type": "String", "required": True},
    "named_insured_address": {"type": "String", "required": True},
    "additional_named_insured_name": {"type": "Boolean", "format": "Included/Excluded", "required": False},
    "additional_named_insured_address": {"type": "String", "required": False},
    "issuing_carrier": {"type": "String", "required": False},
    "commission": {"type": "Percentage/Currency", "required": False},
    "estimated_premium_amount": {"type": "Currency", "required": False},
    "minimum_earned_premium": {"type": "Currency/Percentage", "required": False},
    "taxes": {"type": "Currency", "required": False},
    "tria": {"type": "Boolean", "format": "Included/Excluded", "required": False},
    "waiver_of_subrogation_type": {"type": "Boolean", "format": "Included/Excluded", "required": False},
    "workers_comp_each_accident_limit": {"type": "Currency", "required": False},
    "workers_comp_disease_each_employee": {"type": "Currency", "required": False},
    "workers_comp_disease_policy_limit": {"type": "Currency", "required": False},
    "workers_comp_exclusion_description": {"type": "String", "required": False},
}

FIELD_ORDER: List[str] = list(FIELD_CATALOG)

# Pydantic-model defaults (extraction.py:15-46): fields with no default are
# required-by-schema (missing => validation failure); the rest default EMPTY.
SCHEMA_REQUIRED: List[str] = [
    "quote_number",
    "policy_effective_date",
    "policy_expiration_date",
    "named_insured_name",
    "named_insured_address",
    "issuing_carrier",
]

# Label aliases seen in policy-quote documents (modeled on the labeled-line
# style of the reference's mock generator, tests/utils/mock_generators.py:18-39).
# Lowercased label -> field name.  Compiled by the extractor actor.
LABEL_TO_FIELD: Dict[str, str] = {
    "quote number": "quote_number",
    "quote no": "quote_number",
    "quote #": "quote_number",
    "policy effective date": "policy_effective_date",
    "effective date": "policy_effective_date",
    "policy expiration date": "policy_expiration_date",
    "expiration date": "policy_expiration_date",
    "named insured": "named_insured_name",
    "insured name": "named_insured_name",
    "address": "named_insured_address",
    "insured address": "named_insured_address",
    "additional named insured": "additional_named_insured_name",
    "additional insured address": "additional_named_insured_address",
    "issuing carrier": "issuing_carrier",
    "carrier": "issuing_carrier",
    "commission": "commission",
    "estimated premium": "estimated_premium_amount",
    "estimated premium amount": "estimated_premium_amount",
    "total estimated premium": "estimated_premium_amount",
    "minimum earned premium": "minimum_earned_premium",
    "taxes": "taxes",
    "tria coverage": "tria",
    "tria": "tria",
    "terrorism coverage": "tria",
    "waiver of subrogation": "waiver_of_subrogation_type",
    "each accident": "workers_comp_each_accident_limit",
    "each accident limit": "workers_comp_each_accident_limit",
    "disease - each employee": "workers_comp_disease_each_employee",
    "disease each employee": "workers_comp_disease_each_employee",
    "disease - policy limit": "workers_comp_disease_policy_limit",
    "disease policy limit": "workers_comp_disease_policy_limit",
}
