"""Deterministic synthetic corpus of interleaved span documents + goldens.

Generates the engine's canonical input table
``(doc_id: string, spans: list<struct<kind,text,media_ref,offset:int32>>)``
(shape from /root/repo/BASELINE.json ``input_hint``) at parameterized scale,
modeled on the labeled-line content of the reference's mock PDF generator
(/root/reference/tests/utils/mock_generators.py:18-39), plus two *golden*
tables computed from first principles (hand-coded raw->expected tables, NOT
by calling the engine's own functions):

  * ``expected_fields``: the 18-field validated record + status per doc
    (/root/reference/app/models/extraction.py:12-46 semantics)
  * ``expected_spans``: the post-extraction span sequence — boilerplate
    removed, text cleaned, media preserved, offsets re-densified
    (the north-rule invariant: span-sequence equality (kind,text,media_ref,order)).

Every doc is generated independently from ``blake2b(seed, doc_index)`` so
generation is embarrassingly parallel, order-independent and reproducible at
any scale — the 10^12-doc table is the same function over a bigger index
range.  Fixture families (FIXTURES.md §1) cycle by ``doc_index % 12``; a
~0.1% skew tail gets 100x-size span lists to exercise the salted
reassembly path.
"""

from __future__ import annotations

import hashlib
from dataclasses import dataclass, field
from typing import Dict, List, Tuple

import numpy as np
import pyarrow as pa

EMPTY = "EMPTY VALUE"

# bump when generated content changes: cached corpora under /tmp key on this
GEN_VERSION = 3

FAMILIES = [
    "clean", "dirty_dates_ok", "dirty_dates_fail", "currency_noise",
    "boolean_variants", "commission_bare", "state_exclusion",
    "missing_required", "multi_row", "media_interleaved",
    "boilerplate_wrapped", "date_warning",
]

# (raw, expected-after-validation) pairs, hand-derived from the reference's
# validator semantics (extraction.py:48-161).  Dates use day>=13 so the
# DD/MM variants are unambiguous under the MM/DD-first strptime cascade.
_DATE_VARIANTS: List[Tuple[str, str]] = [
    ("03/15/2024", "03/15/2024"),
    ("03-15-2024", "03/15/2024"),
    ("2024-03-15", "03/15/2024"),
    ("March 15, 2024", "03/15/2024"),
    ("Mar 15, 2024", "03/15/2024"),
    # NB: a 2-digit DD/MM date like 15/03/2024 matches the MM/DD/YYYY regex
    # and passes through UNTOUCHED in the reference (the %d/%m/%Y cascade
    # entry is unreachable for it); non-zero-padded dates do hit the cascade.
    ("3/15/2024", "03/15/2024"),
]
_DATE_VARIANTS_EXP: List[Tuple[str, str]] = [
    ("03/15/2025", "03/15/2025"),
    ("03-15-2025", "03/15/2025"),
    ("2025-03-15", "03/15/2025"),
    ("March 15, 2025", "03/15/2025"),
    ("Mar 15, 2025", "03/15/2025"),
    ("3/15/2025", "03/15/2025"),
]
# %m/%d/%y is handled by the standalone normalizer (validators.py:76) but NOT
# by the validation-path 6-format cascade -> validation failure.
_DATE_FAIL_RAW = "01/01/24"

_BOOL_VARIANTS: List[Tuple[str, str]] = [
    ("Included", "Included"), ("Excluded", "Excluded"),
    ("Yes", "Yes"), ("No", "No"), ("True", "True"), ("False", "False"),
    ("yes", "Included"), ("true", "Included"), ("included", "Included"),
    ("include", "Included"), ("no", "Excluded"), ("false", "Excluded"),
    ("excluded", "Excluded"), ("exclude", "Excluded"),
]

_COMMISSION_VARIANTS: List[Tuple[str, str]] = [
    ("10%", "10%"), ("12.5%", "12.5%"), ("$500", "$500"),
    ("10", "10.0%"), ("7.5", "7.5%"), ("0", "0.0%"), ("100", "100.0%"),
    ("150", "150"), ("n/a", "n/a"),
]

_CARRIERS = [
    "Test Insurance Company", "Hartford Casualty Insurance Company",
    "Acme Mutual Insurance", "Liberty Shield Insurance Co",
    "Pinnacle Underwriters Inc", "Granite State Assurance",
]

_CITIES = [
    ("Boise", "ID", "83702"), ("Springfield", "IL", "62704"),
    ("Austin", "TX", "78701"), ("Albany", "NY", "12207"),
    ("Denver", "CO", "80202"), ("Tampa", "FL", "33602"),
]

_EXCL_STATES = ["TX", "ID", "NY", "CA", "OH", "WA"]

_FILLER_WORDS = (
    "coverage policy terms conditions premium endorsement schedule rating "
    "classification payroll audit claims experience modifier statutory "
    "liability employers compensation benefits applicable described herein"
).split()

_NAV_LINE = "Home | Products | Claims | Contact Us | Privacy Policy"
_COPYRIGHT_LINE = "© 2024 Acme Insurance Group. All rights reserved."

FIELD_ORDER = [
    "quote_number", "policy_effective_date", "policy_expiration_date",
    "named_insured_name", "named_insured_address",
    "additional_named_insured_name", "additional_named_insured_address",
    "issuing_carrier", "commission", "estimated_premium_amount",
    "minimum_earned_premium", "taxes", "tria", "waiver_of_subrogation_type",
    "workers_comp_each_accident_limit", "workers_comp_disease_each_employee",
    "workers_comp_disease_policy_limit", "workers_comp_exclusion_description",
]

VALIDATION_FAILED_RECORD: Dict[str, str] = {
    **{f: EMPTY for f in FIELD_ORDER},
    "quote_number": "VALIDATION_FAILED",
    "named_insured_name": "VALIDATION_FAILED",
    "named_insured_address": "VALIDATION_FAILED",
}


@dataclass
class DocSpec:
    doc_id: str
    family: str
    # list of row-chunks; each chunk is a list of spans (kind, text, media_ref, offset)
    row_chunks: List[List[Tuple[str, str, str, int]]]
    expected_fields: Dict[str, str]
    expected_status: str
    expected_warnings: List[str] = field(default_factory=list)
    expected_spans: List[Tuple[str, str, str, int]] = field(default_factory=list)


def _doc_rng(seed: int, index: int) -> np.random.RandomState:
    h = hashlib.blake2b(f"{seed}:{index}".encode(), digest_size=4).digest()
    return np.random.RandomState(int.from_bytes(h, "big"))


def doc_id_for(index: int) -> str:
    return f"doc-{index:09d}"


def _money(rng, lo=500, hi=99999) -> str:
    return f"${rng.randint(lo, hi):,}.00"


def build_doc(index: int, seed: int = 42, text_scale: int = 1) -> DocSpec:
    """Build one deterministic document + its golden expectations.

    ``text_scale`` (>=1) controls document weight: each extra unit adds ~10
    label-free policy-prose spans of 40-80 words, taking a doc from ~0.5 KB
    (unit-test size) to the multi-KB sizes real corpora have.  Field values,
    families and golden semantics are unaffected — filler participates only
    in boilerplate classification (kept) and span-sequence output.
    """
    rng = _doc_rng(seed, index)
    family = FAMILIES[index % len(FAMILIES)]
    doc_id = doc_id_for(index)

    exp: Dict[str, str] = {f: EMPTY for f in FIELD_ORDER}
    warnings: List[str] = []
    status = "success"

    # ---- choose field values ------------------------------------------------
    quote_number = f"WC-{rng.randint(0, 10**6):06d}-{index % 1000:03d}"
    di = rng.randint(0, len(_DATE_VARIANTS))
    if family == "dirty_dates_ok":
        eff_raw, eff_exp = _DATE_VARIANTS[di]
        exp_raw, exp_exp = _DATE_VARIANTS_EXP[(di + 1) % len(_DATE_VARIANTS_EXP)]
    elif family == "dirty_dates_fail":
        eff_raw, eff_exp = _DATE_FAIL_RAW, None
        exp_raw, exp_exp = "01/01/25", None
    elif family == "date_warning":
        if index % 24 < 12:
            # effective >= expiration -> ordering warning
            eff_raw, eff_exp = "06/15/2024", "06/15/2024"
            exp_raw, exp_exp = "06/15/2024", "06/15/2024"
            warnings.append("Policy effective date should be before expiration date")
        else:
            # regex-valid but unparseable date -> relationship warning
            eff_raw, eff_exp = "13/45/2024", "13/45/2024"
            exp_raw, exp_exp = "06/15/2025", "06/15/2025"
            warnings.append("Could not validate date relationship due to invalid date format")
    else:
        eff_raw, eff_exp = "01/15/2024", "01/15/2024"
        exp_raw, exp_exp = "01/15/2025", "01/15/2025"

    company = f"Company {index % 5000:04d} LLC"
    city, st, zipc = _CITIES[rng.randint(0, len(_CITIES))]
    address = f"{rng.randint(1, 999)} Main Street, {city}, {st} {zipc}"
    carrier = _CARRIERS[rng.randint(0, len(_CARRIERS))]

    premium = _money(rng, 1000, 99999)
    taxes = _money(rng, 10, 999)
    limit1 = "$1,000,000"
    limit2 = "$1,000,000"
    limit3 = "$500,000" if index % 2 else "$1,000,000"

    if family == "boolean_variants":
        bi = rng.randint(0, len(_BOOL_VARIANTS))
        tria_raw, tria_exp = _BOOL_VARIANTS[bi]
        wv_raw, wv_exp = _BOOL_VARIANTS[(bi + 3) % len(_BOOL_VARIANTS)]
    else:
        tria_raw, tria_exp = ("Included", "Included") if index % 2 else ("Excluded", "Excluded")
        wv_raw, wv_exp = ("Excluded", "Excluded") if index % 2 else ("Included", "Included")

    commission_raw = commission_exp = None
    if family == "commission_bare":
        ci = rng.randint(0, len(_COMMISSION_VARIANTS))
        commission_raw, commission_exp = _COMMISSION_VARIANTS[ci]

    excl_state = None
    if family == "state_exclusion":
        excl_state = _EXCL_STATES[rng.randint(0, len(_EXCL_STATES))]

    # multi-state carrier premiums (fields.yaml:40-43: when a per-state
    # premium breakdown exists, issuing_carrier becomes the stringified list
    # "['NY - <carrier> - 553', ...]" with rounded amounts — the reference's
    # example_output shape in config/prompts.yaml)
    state_premiums = None
    if family == "clean" and (index // 12) % 3 == 1:
        n_states = 2 + rng.randint(0, 2)
        picks = []
        pool = list(_EXCL_STATES)
        for _ in range(n_states):
            picks.append(pool.pop(rng.randint(0, len(pool))))
        state_premiums = [(st_code, int(rng.randint(100, 9999))) for st_code in picks]

    if family == "currency_noise":
        premium = f"$ {rng.randint(1000, 99999):,}.00"
        taxes = f"${rng.randint(10, 999)},00".replace(",00", ".00")

    # minimum earned premium: planted in currency_noise docs as a percentage
    # (fields.yaml:55-58: exact amount or exact percentage, else EMPTY)
    min_earned = f"{rng.randint(10, 35)}%" if family == "currency_noise" else None

    # additional named insured: boolean_variants docs carry the 'Excluded'
    # marker pair (fields.yaml:29-38 / prompts.yaml example output)
    additional = family == "boolean_variants" and index % 24 >= 12

    # ---- golden fields ------------------------------------------------------
    if family in ("dirty_dates_fail", "missing_required"):
        exp = dict(VALIDATION_FAILED_RECORD)
        status = "partial_success"
    else:
        exp["quote_number"] = quote_number
        exp["policy_effective_date"] = eff_exp
        exp["policy_expiration_date"] = exp_exp
        exp["named_insured_name"] = company
        exp["named_insured_address"] = address
        if state_premiums is not None:
            exp["issuing_carrier"] = str([f"{s} - {carrier} - {amt}" for s, amt in state_premiums])
        else:
            exp["issuing_carrier"] = carrier
        exp["estimated_premium_amount"] = premium
        exp["taxes"] = taxes
        exp["tria"] = tria_exp
        exp["waiver_of_subrogation_type"] = wv_exp
        exp["workers_comp_each_accident_limit"] = limit1
        exp["workers_comp_disease_each_employee"] = limit2
        exp["workers_comp_disease_policy_limit"] = limit3
        if commission_exp is not None:
            exp["commission"] = commission_exp
        if excl_state is not None:
            exp["workers_comp_exclusion_description"] = f"{excl_state}-Excluded"
        if min_earned is not None:
            exp["minimum_earned_premium"] = min_earned
        if additional:
            exp["additional_named_insured_name"] = "Excluded"
            exp["additional_named_insured_address"] = "Excluded"

    # ---- span content -------------------------------------------------------
    qn_line = "Quote Number:" if family == "missing_required" else f"Quote Number: {quote_number}"
    head_lines = [qn_line,
                  f"Policy Effective Date: {eff_raw}",
                  f"Policy Expiration Date: {exp_raw}"]
    insured_lines = [f"Named Insured: {company}", f"Address: {address}"]
    money_lines = [f"Issuing Carrier: {carrier}",
                   f"Estimated Premium: {premium}",
                   f"Taxes: {taxes}"]
    if commission_raw is not None:
        money_lines.append(f"Commission: {commission_raw}")
    if min_earned is not None:
        money_lines.append(f"Minimum Earned Premium: {min_earned}")
    if additional:
        insured_lines.append("Additional Named Insured: Excluded")
        insured_lines.append("Additional Insured Address: Excluded")
    table_lines = ["Coverage Limits:",
                   f"Each Accident: {limit1}",
                   f"Disease - Each Employee: {limit2}",
                   f"Disease - Policy Limit: {limit3}"]
    tail_lines = [f"TRIA Coverage: {tria_raw}", f"Waiver of Subrogation: {wv_raw}"]
    if excl_state is not None:
        tail_lines.append(f"Note: {excl_state} is excluded from the Workers Compensation policy")

    # (kind, dirty_text, clean_text, media_ref, is_boilerplate)
    proto: List[Tuple[str, str, str, str, bool]] = []
    heading = "WORKERS COMPENSATION INSURANCE QUOTE"
    proto.append(("heading", heading, heading, "", False))

    def add_text(lines: List[str], dirty: bool = False):
        # expected clean form = clean_text_field semantics: ALL whitespace
        # (incl. newlines) collapsed to single spaces, bullets removed
        clean = " ".join(ln.strip() for ln in lines)
        if dirty:
            text = "\n".join("  " + ln.replace(": ", ":   ") + " ·" for ln in lines)
        else:
            text = "\n".join(lines)
        proto.append(("text", text, clean, "", False))

    dirty_spans = family == "boilerplate_wrapped"  # this family also carries ws dirt
    if family == "boilerplate_wrapped":
        proto.insert(0, ("text", _NAV_LINE, _NAV_LINE, "", True))
    add_text(head_lines)
    add_text(insured_lines, dirty=dirty_spans)
    if family == "media_interleaved":
        proto.append(("media", "", "", f"media://{doc_id}/0", False))
    add_text(money_lines)
    tbl = "\n".join(table_lines)
    tbl_clean = " ".join(table_lines)
    proto.append(("table", tbl, tbl_clean, "", False))
    if state_premiums is not None:
        sp_lines = ["State Premiums:"] + [
            f"{s} - {carrier} - ${amt:,}.00" for s, amt in state_premiums
        ]
        proto.append(("table", "\n".join(sp_lines), " ".join(sp_lines), "", False))
    if family == "media_interleaved":
        proto.append(("media", "", "", f"media://{doc_id}/1", False))
    add_text(tail_lines)
    if family == "boilerplate_wrapped":
        proto.append(("text", f"Page 1 of {rng.randint(2, 9)}", "", "", True))
        proto.append(("text", _COPYRIGHT_LINE, _COPYRIGHT_LINE, "", True))

    # skew tail: ~0.1% of docs get 100x span lists of non-label filler
    is_skew = (int.from_bytes(hashlib.blake2b(doc_id.encode(), digest_size=2).digest(), "big") % 1000) == 7
    n_filler = 200 if is_skew else rng.randint(0, 4)
    n_filler += max(0, text_scale - 1) * 10
    for k in range(n_filler):
        words = [
            _FILLER_WORDS[rng.randint(0, len(_FILLER_WORDS))]
            for _ in range(rng.randint(8, 20) if text_scale <= 1 else rng.randint(40, 80))
        ]
        line = " ".join(words)
        proto.append(("text", line, line, "", False))

    # materialize spans with offsets; golden output spans
    spans = [(k, t, m, i) for i, (k, t, _c, m, _b) in enumerate(proto)]
    out_spans: List[Tuple[str, str, str, int]] = []
    for (k, _t, c, m, b) in proto:
        if b:
            continue
        out_spans.append((k, c, m, len(out_spans)))

    # row chunking: multi_row + skew docs split across rows, emitted out of order
    if family == "multi_row" or is_skew:
        n_chunks = 4 if is_skew else 2 + (index % 2)
        size = max(1, len(spans) // n_chunks)
        chunks = [spans[i : i + size] for i in range(0, len(spans), size)]
        chunks.reverse()  # force the pipeline to re-sort by offset
    else:
        chunks = [spans]

    return DocSpec(
        doc_id=doc_id, family=family, row_chunks=chunks,
        expected_fields=exp, expected_status=status,
        expected_warnings=warnings, expected_spans=out_spans,
    )


# ---------------------------------------------------------------------------
# Arrow assembly
# ---------------------------------------------------------------------------

def _spans_to_pylist(spans: List[Tuple[str, str, str, int]]):
    return [{"kind": k, "text": t, "media_ref": m, "offset": o} for (k, t, m, o) in spans]


def docs_table(indices, seed: int = 42, text_scale: int = 1) -> pa.Table:
    """Input rows (doc_id, spans) for the given doc indices."""
    ids, span_lists = [], []
    for i in indices:
        spec = build_doc(int(i), seed, text_scale)
        for chunk in spec.row_chunks:
            ids.append(spec.doc_id)
            span_lists.append(_spans_to_pylist(chunk))
    span_type = pa.list_(
        pa.struct([("kind", pa.string()), ("text", pa.string()),
                   ("media_ref", pa.string()), ("offset", pa.int32())])
    )
    return pa.table({"doc_id": pa.array(ids, pa.string()),
                     "spans": pa.array(span_lists, span_type)})


def expected_tables(indices, seed: int = 42, text_scale: int = 1) -> Tuple[pa.Table, pa.Table]:
    """(expected_fields, expected_spans) golden tables for the given indices."""
    rows = [build_doc(int(i), seed, text_scale) for i in indices]
    fields_cols: Dict[str, List[str]] = {"doc_id": [r.doc_id for r in rows]}
    for f in FIELD_ORDER:
        fields_cols[f] = [r.expected_fields[f] for r in rows]
    fields_cols["status"] = [r.expected_status for r in rows]
    fields_cols["family"] = [r.family for r in rows]
    fields_tbl = pa.table(fields_cols)

    span_type = pa.list_(
        pa.struct([("kind", pa.string()), ("text", pa.string()),
                   ("media_ref", pa.string()), ("offset", pa.int32())])
    )
    spans_tbl = pa.table({
        "doc_id": pa.array([r.doc_id for r in rows], pa.string()),
        "spans": pa.array([_spans_to_pylist(r.expected_spans) for r in rows], span_type),
    })
    return fields_tbl, spans_tbl


def word_boxes_for_doc(index: int, seed: int = 42):
    """Render one doc's spans as PDF-style word boxes (the geometry model
    for the layout-parse path; media spans have no visual box and are
    skipped).  Table-span lines get a column split at the cell boundary so
    the whitespace-gap table heuristic has something to detect."""
    from ..functions.layout import SPAN_GAP, LINE_H, render_span_lines

    spec = build_doc(index, seed)
    spans = sorted(
        (s for chunk in spec.row_chunks for s in chunk), key=lambda s: s[3]
    )
    boxes = []
    y = 72.0
    for (kind, text, media_ref, _off) in spans:
        if kind == "media":
            continue
        lines = []
        for line in text.split("\n"):
            split = -1
            if kind == "table":
                toks = line.split()
                colon = next((i for i, t in enumerate(toks) if t.endswith(":")), None)
                if colon is not None:
                    split = colon + 1
                elif len(toks) > 1:
                    split = len(toks) - 1
            lines.append((line, split))
        bs, y = render_span_lines(lines, y)
        boxes.extend(bs)
        y += SPAN_GAP - LINE_H
    return spec, boxes


def word_boxes_table(indices, seed: int = 42) -> pa.Table:
    """(doc_id, word, x0, y0, x1, y1) — one row per word box."""
    cols = {k: [] for k in ("doc_id", "word", "x0", "y0", "x1", "y1")}
    for i in indices:
        spec, boxes = word_boxes_for_doc(int(i), seed)
        for b in boxes:
            cols["doc_id"].append(spec.doc_id)
            cols["word"].append(b.text)
            cols["x0"].append(b.x0)
            cols["y0"].append(b.y0)
            cols["x1"].append(b.x1)
            cols["y1"].append(b.y1)
    return pa.table({
        "doc_id": pa.array(cols["doc_id"], pa.string()),
        "word": pa.array(cols["word"], pa.string()),
        "x0": pa.array(cols["x0"], pa.float64()),
        "y0": pa.array(cols["y0"], pa.float64()),
        "x1": pa.array(cols["x1"], pa.float64()),
        "y1": pa.array(cols["y1"], pa.float64()),
    })


def write_corpus(num_docs: int, out_dir: str, seed: int = 42, goldens: bool = True,
                 text_scale: int = 1) -> str:
    """Distributed corpus writer: range -> map_batches(build) -> parquet.

    Returns the documents directory.  At real scale this would be
    ``write_lance``; parquet-dir layout keeps the same fragment-resume story.
    """
    import os

    import ray.data

    os.makedirs(out_dir, exist_ok=True)
    docs_dir = os.path.join(out_dir, "documents")

    def gen(batch: Dict[str, np.ndarray]) -> pa.Table:
        return docs_table(batch["id"], seed, text_scale)

    n_blocks = max(1, num_docs // 4000)
    ds = ray.data.range(num_docs, override_num_blocks=n_blocks)
    os.makedirs(docs_dir, exist_ok=True)
    ds.map_batches(gen, batch_format="numpy", batch_size=4000).write_parquet(docs_dir)

    if goldens:
        def gen_fields(batch):
            return expected_tables(batch["id"], seed, text_scale)[0]

        def gen_spans(batch):
            return expected_tables(batch["id"], seed, text_scale)[1]

        for sub, fn in (("expected_fields", gen_fields), ("expected_spans", gen_spans)):
            d = os.path.join(out_dir, sub)
            os.makedirs(d, exist_ok=True)
            ray.data.range(num_docs, override_num_blocks=n_blocks).map_batches(
                fn, batch_format="numpy", batch_size=4000
            ).write_parquet(d)
    return docs_dir
