"""JSON-from-free-text extraction (the reference's LLM-response parser).

Behavioral spec: /root/reference/app/services/gemini.py:197-284.
Four regex strategies in priority order — fenced ```json block, generic fenced
block, a bare ``json {...}`` keyword, any ``{...}`` — first parseable
non-empty dict wins; then a manual key/value scrape fallback.

Stateless; patterns compiled at import (once per worker).
"""

from __future__ import annotations

import json
import re
from typing import Any, Dict, Optional

_STRATEGIES = [
    re.compile(r"```json\s*(\{.*?\})\s*```", re.DOTALL | re.IGNORECASE),
    re.compile(r"```\s*(\{.*?\})\s*```", re.DOTALL | re.IGNORECASE),
    re.compile(r"json\s*(\{.*?\})", re.DOTALL | re.IGNORECASE),
    re.compile(r"(\{.*?\})", re.DOTALL | re.IGNORECASE),
]

_KV_PATTERNS = [
    re.compile(r'"?([a-z_]+)"?\s*:\s*"([^"]*)"', re.IGNORECASE | re.MULTILINE),
    re.compile(r'"?([a-z_]+)"?\s*:\s*([^,\n}]+)', re.IGNORECASE | re.MULTILINE),
]


class JsonExtractionError(ValueError):
    """All strategies failed (reference raises ExtractionError, gemini.py:255)."""


def manual_kv_extraction(text: str) -> Optional[Dict[str, Any]]:
    """Fallback key/value scrape; drops empty and 'null' values. gemini.py:260-284."""
    result: Dict[str, Any] = {}
    for pattern in _KV_PATTERNS:
        for field, value in pattern.findall(text):
            field = field.strip().lower()
            value = value.strip().strip('"').strip("'")
            if value and value != "null":
                result[field] = value
    return result or None


def extract_json_from_text(response_text: str) -> Dict[str, Any]:
    """Pull the first parseable non-empty JSON dict out of free text.

    gemini.py:197-258; raises :class:`JsonExtractionError` when every
    strategy (including the manual fallback) fails.
    """
    for pattern in _STRATEGIES:
        for match in pattern.findall(response_text):
            try:
                parsed = json.loads(match.strip())
            except json.JSONDecodeError:
                continue
            if isinstance(parsed, dict) and parsed:
                return parsed

    manual = manual_kv_extraction(response_text)
    if manual:
        return manual

    raise JsonExtractionError(
        f"Could not extract valid JSON from text (length={len(response_text)})"
    )
