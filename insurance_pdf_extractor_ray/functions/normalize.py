"""Field normalizers / validators with reference-exact semantics.

Behavioral spec (re-implemented, not copied):
  * date normalization  — /root/reference/app/utils/validators.py:52-89 (8-format
    superset) and the pydantic twin /root/reference/app/models/extraction.py:134-161
    (6-format variant used inside validation).
  * currency cleaning   — validators.py:13-32
  * text cleanup        — validators.py:92-112
  * boolean normalization — validators.py:134-159 (superset) and the pydantic
    variant extraction.py:103-115 (smaller mapping; values already in
    {Included, Excluded, Yes, No, True, False} pass through unchanged).
  * commission          — extraction.py:117-132
  * quote number / date-format / currency-amount predicates —
    validators.py:35-49, 115-131, 237-256
  * state codes         — validators.py:162-234
  * filename sanitize   — validators.py:259-281
  * processing-time humanizer — validators.py:284-301

The sentinel for null is the literal string ``"EMPTY VALUE"`` everywhere,
matching the reference's textual comparisons (storage.py:557-560).

Scalar functions mirror the per-value semantics; ``*_array`` variants are the
vectorized forms used inside ``map_batches`` — they exploit the fact that in a
real corpus the distinct-value set per batch is small (dictionary-encode, apply
the scalar once per distinct value).
"""

from __future__ import annotations

import re
from datetime import datetime
from typing import List, Optional, Sequence

import numpy as np

EMPTY = "EMPTY VALUE"

# ---------------------------------------------------------------------------
# compiled patterns (module-level: compiled once per worker process)
# ---------------------------------------------------------------------------
_RE_DATE_MMDDYYYY = re.compile(r"^\d{2}/\d{2}/\d{4}$")
_RE_CURRENCY_STRIP = re.compile(r"[$,\s]")
_RE_WS = re.compile(r"\s+")
_RE_BULLETS = re.compile(r"[·•]")
_RE_QUOTE_NUMBER = re.compile(r"^[A-Za-z0-9\-_\(\)\s]+$")
_RE_STATE_TOKEN = re.compile(r"\b[A-Z]{2}\b")
_RE_FNAME_BAD = re.compile(r'[<>:"/\\|?*]')

# 8-format cascade (validators.py:69-78); order matters (MM/DD before DD/MM).
DATE_FORMATS_FULL = (
    "%m/%d/%Y", "%m-%d-%Y", "%Y-%m-%d", "%d/%m/%Y",
    "%B %d, %Y", "%b %d, %Y", "%m/%d/%y", "%Y%m%d",
)
# 6-format pydantic variant (extraction.py:144-151) — wired inside validation.
DATE_FORMATS_PYDANTIC = DATE_FORMATS_FULL[:6]

US_STATES = frozenset(
    "AL AK AZ AR CA CO CT DE FL GA HI ID IL IN IA KS KY LA ME MD MA MI MN MS "
    "MO MT NE NV NH NJ NM NY NC ND OH OK OR PA RI SC SD TN TX UT VT VA WA WV "
    "WI WY DC".split()
)

_BOOL_INCLUDED = frozenset(["yes", "true", "included", "include", "y", "1", "on"])
_BOOL_EXCLUDED = frozenset(["no", "false", "excluded", "exclude", "n", "0", "off"])
# pydantic variant: passthrough set + smaller mapping (extraction.py:107-114)
_BOOL_VALID_PASSTHROUGH = frozenset(["Included", "Excluded", "Yes", "No", "True", "False"])
_BOOL_INCLUDED_PD = frozenset(["yes", "true", "included", "include"])
_BOOL_EXCLUDED_PD = frozenset(["no", "false", "excluded", "exclude"])


def _is_empty(value) -> bool:
    """Reference empty test: falsy or case-insensitive 'EMPTY VALUE'."""
    return (not value) or (isinstance(value, str) and value.upper() == EMPTY)


# ---------------------------------------------------------------------------
# scalars
# ---------------------------------------------------------------------------

def clean_currency_string(value) -> Optional[float]:
    """'$1,234.56' -> 1234.56; EMPTY/unparseable -> None. validators.py:13-32."""
    if _is_empty(value):
        return None
    try:
        return float(_RE_CURRENCY_STRIP.sub("", str(value)))
    except (ValueError, TypeError):
        return None


def validate_date_format(date_str) -> bool:
    """True iff MM/DD/YYYY (EMPTY passes). validators.py:35-49."""
    if _is_empty(date_str):
        return True
    return bool(_RE_DATE_MMDDYYYY.match(date_str))


def normalize_date(date_str, formats: Sequence[str] = DATE_FORMATS_FULL) -> str:
    """Try each strptime format, reformat MM/DD/YYYY; passthrough on failure.

    validators.py:52-89 (full 8-format cascade).  Pass
    ``formats=DATE_FORMATS_PYDANTIC`` for the 6-format validation variant
    (extraction.py:134-161).
    """
    if _is_empty(date_str):
        return date_str
    date_str = date_str.strip()
    for fmt in formats:
        try:
            return datetime.strptime(date_str, fmt).strftime("%m/%d/%Y")
        except ValueError:
            continue
    return date_str


# matches anything that makes a string NOT a fixed point of the cleanup
# passes: edge whitespace, a whitespace run, any whitespace other than a
# plain space (\t, \n, NBSP \xa0, \u2003, \u2028, ... -- [^\S ] is
# Unicode-aware, matching the reference's re.sub(r'\s+') semantics), bullets
_RE_DIRTY = re.compile(r"^\s|\s$|\s\s|[^\S ]|[·•]")


def clean_text_field(value) -> str:
    """Collapse whitespace, strip bullets. validators.py:92-112.

    Fast path: a string the dirty-pattern regex doesn't match is a fixed
    point of the three regex passes — returned as-is (the hot extraction
    loop calls this per line/span).
    """
    if _is_empty(value):
        return value
    s = str(value)
    if _RE_DIRTY.search(s) is None:
        return s
    cleaned = _RE_WS.sub(" ", s.strip())
    cleaned = _RE_BULLETS.sub("", cleaned)
    cleaned = _RE_WS.sub(" ", cleaned)
    return cleaned.strip()


def validate_quote_number(quote_number) -> bool:
    """Nonempty and alnum/dash/underscore/parens/space. validators.py:115-131."""
    if not quote_number or len(quote_number.strip()) == 0:
        return False
    return bool(_RE_QUOTE_NUMBER.match(quote_number.strip()))


def normalize_boolean_field(value) -> str:
    """Superset mapping -> Included/Excluded, else passthrough. validators.py:134-159."""
    if _is_empty(value):
        return value
    v = str(value).lower().strip()
    if v in _BOOL_INCLUDED:
        return "Included"
    if v in _BOOL_EXCLUDED:
        return "Excluded"
    return value


def normalize_boolean_pydantic(value) -> str:
    """The validation-path variant (extraction.py:103-115).

    Values already in {Included, Excluded, Yes, No, True, False} pass through
    UNCHANGED (including 'Yes'); only other spellings are normalized, and the
    mapping set is smaller (no y/n/1/0/on/off) and not stripped.
    """
    if value and value != EMPTY:
        if value not in _BOOL_VALID_PASSTHROUGH:
            v = value.lower()
            if v in _BOOL_INCLUDED_PD:
                return "Included"
            if v in _BOOL_EXCLUDED_PD:
                return "Excluded"
    return value


def normalize_commission(value) -> str:
    """Keep if % or $ present; bare 0-100 number gets '%'. extraction.py:117-132.

    Note the reference formats via ``f"{float(v)}%"`` so '10' -> '10.0%'.
    """
    if value and value != EMPTY:
        value = value.strip()
        if "%" in value or "$" in value:
            return value
        try:
            num = float(value)
            if 0 <= num <= 100:
                return f"{num}%"
        except ValueError:
            pass
    return value


def extract_state_codes(text) -> List[str]:
    """Two-letter uppercase tokens filtered to US states. validators.py:162-234."""
    if not text:
        return []
    return [s for s in _RE_STATE_TOKEN.findall(text.upper()) if s in US_STATES]


def validate_currency_amount(amount) -> bool:
    """Parseable and >= 0 (EMPTY passes). validators.py:237-256."""
    if _is_empty(amount):
        return True
    cleaned = clean_currency_string(amount)
    return cleaned is not None and cleaned >= 0


def sanitize_filename(filename) -> str:
    """Replace unsafe chars, cap at 100 preserving extension. validators.py:259-281."""
    if not filename:
        return "unknown_file"
    sanitized = _RE_FNAME_BAD.sub("_", filename)
    sanitized = _RE_WS.sub("_", sanitized)
    if len(sanitized) > 100:
        name, ext = sanitized.rsplit(".", 1) if "." in sanitized else (sanitized, "")
        sanitized = name[:90] + ("." + ext if ext else "")
    return sanitized


def format_processing_time(seconds: float) -> str:
    """Humanize seconds (ms/s/m). validators.py:284-301."""
    if seconds < 1:
        return f"{seconds * 1000:.0f}ms"
    if seconds < 60:
        return f"{seconds:.1f}s"
    minutes = int(seconds // 60)
    return f"{minutes}m {seconds % 60:.1f}s"


# ---------------------------------------------------------------------------
# vectorized forms (for map_batches hot paths)
# ---------------------------------------------------------------------------

def _apply_over_distinct(values: np.ndarray, scalar_fn) -> np.ndarray:
    """Apply ``scalar_fn`` once per distinct value and scatter back.

    Date/boolean/commission columns have tiny distinct-value sets per batch;
    this turns an O(rows) strptime cascade into O(distinct).
    """
    uniq, inverse = np.unique(values.astype(object), return_inverse=True)
    mapped = np.array([scalar_fn(u) for u in uniq], dtype=object)
    return mapped[inverse]


def normalize_date_array(values, formats: Sequence[str] = DATE_FORMATS_FULL) -> np.ndarray:
    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return arr
    return _apply_over_distinct(arr, lambda v: normalize_date(v, formats))


def clean_currency_array(values) -> np.ndarray:
    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return arr
    return _apply_over_distinct(arr, clean_currency_string)


def normalize_boolean_array(values) -> np.ndarray:
    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return arr
    return _apply_over_distinct(arr, normalize_boolean_field)


def clean_text_array(values) -> np.ndarray:
    arr = np.asarray(values, dtype=object)
    if arr.size == 0:
        return arr
    return np.array([clean_text_field(v) for v in arr], dtype=object)


def dirty_text_mask(texts) -> "object":
    """Vectorized ``_RE_DIRTY`` test over a pyarrow string array — numpy
    bool mask, True where :func:`clean_text_field` would NOT be a no-op.

    The fast-path regex itself was the per-span bottleneck on span-heavy
    docs (~29 µs/call — alternation overhead, not matching work).  ASCII
    rows get exact byte tests (python ``\\s`` on ASCII is exactly bytes
    {9,10,11,12,13,32}; the bullet class is non-ASCII so it can't occur);
    rows with any non-ASCII byte are conservatively marked dirty — the
    scalar cleaner they then route through re-checks the same fast path,
    so semantics are unchanged, only speed.
    """
    import numpy as np

    from .bytekernels import row_any, string_buffer

    data, lo, hi, t = string_buffer(texts)
    n = len(t)
    if n == 0:
        return np.zeros(0, bool)
    nonempty = hi > lo

    ws = (data == 32) | ((data >= 9) & (data <= 13))
    odd_ws = ws & (data != 32)          # any whitespace other than ' '
    non_ascii = data >= 128
    dbl = np.zeros(len(data), bool)     # ws pair fully inside one row
    if len(data) > 1:
        dbl[:-1] = ws[:-1] & ws[1:]
        dbl[hi[nonempty] - 1] = False   # pair crossing a row boundary

    out = row_any(odd_ws | non_ascii | dbl, lo, hi)
    edge = np.zeros(n, bool)
    edge[nonempty] = ws[lo[nonempty]] | ws[hi[nonempty] - 1]
    return out | edge
