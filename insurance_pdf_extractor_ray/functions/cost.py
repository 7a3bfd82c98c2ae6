"""Token-cost arithmetic (per-model pricing table, partial-name matching).

Behavioral spec: /root/reference/app/services/pdf_processor.py:249-341.
Pure scalar/NumPy arithmetic — used as a cheap projection inside map_batches.
"""

from __future__ import annotations

from typing import Any, Dict

import numpy as np

# $/1k tokens (pdf_processor.py:262-279)
PRICING = {
    "gemini-1.5-flash": {"input": 0.000075, "output": 0.0003},
    "gemini-1.5-pro": {"input": 0.00125, "output": 0.005},
    "gemini-2.5-flash-preview-05-20": {"input": 0.00015, "output": 0.0006},
    "gemini-2.5-pro": {"input": 0.00125, "output": 0.0100},
}
DEFAULT_MODEL = "gemini-1.5-flash"


def resolve_model(model_name: str) -> str:
    """Exact match, then substring match, then default. pdf_processor.py:281-290."""
    if model_name in PRICING:
        return model_name
    for key in PRICING:
        if key in model_name:
            return key
    return DEFAULT_MODEL


def estimate_cost(input_tokens: int, output_tokens: int, model_name: str) -> float:
    """round(input + output cost, 6). pdf_processor.py:292-299."""
    p = PRICING[resolve_model(model_name)]
    return round((input_tokens / 1000) * p["input"] + (output_tokens / 1000) * p["output"], 6)


def cost_breakdown(input_tokens: int, output_tokens: int, model_name: str) -> Dict[str, Any]:
    """Detailed breakdown dict. pdf_processor.py:301-341 (note: that twin uses a
    slightly different pricing table; we keep the canonical one)."""
    base = resolve_model(model_name)
    p = PRICING[base]
    input_cost = (input_tokens / 1000) * p["input"]
    output_cost = (output_tokens / 1000) * p["output"]
    total = input_cost + output_cost
    return {
        "model_used": base,
        "input_tokens": input_tokens,
        "output_tokens": output_tokens,
        "total_tokens": input_tokens + output_tokens,
        "input_cost": round(input_cost, 6),
        "output_cost": round(output_cost, 6),
        "total_cost": round(total, 6),
    }


def estimate_cost_vec(input_tokens: np.ndarray, output_tokens: np.ndarray, model_name: str) -> np.ndarray:
    """Vectorized cost for a batch sharing one model name."""
    p = PRICING[resolve_model(model_name)]
    cost = (np.asarray(input_tokens) / 1000.0) * p["input"] + (
        np.asarray(output_tokens) / 1000.0
    ) * p["output"]
    return np.round(cost, 6)
