"""Unit vectors pinning normalizer semantics to the reference's literal cases.

Inputs mirrored from /root/reference/tests/test_validation.py and the
validator implementations (file:line cited per case).
"""

from insurance_pdf_extractor_ray.functions.normalize import (
    DATE_FORMATS_PYDANTIC,
    clean_currency_string,
    clean_text_field,
    extract_state_codes,
    format_processing_time,
    normalize_boolean_field,
    normalize_boolean_pydantic,
    normalize_commission,
    normalize_date,
    sanitize_filename,
    validate_currency_amount,
    validate_date_format,
    validate_quote_number,
)


class TestDates:
    def test_iso_normalized(self):
        # tests/test_validation.py:20-34: 2024-01-01 -> 01/01/2024
        assert normalize_date("2024-01-01") == "01/01/2024"

    def test_all_formats(self):
        for raw in ["01/15/2024", "01-15-2024", "2024-01-15", "January 15, 2024", "Jan 15, 2024"]:
            assert normalize_date(raw) == "01/15/2024"

    def test_superset_formats(self):
        # validators.py:76-77: %m/%d/%y and %Y%m%d only in the 8-format cascade
        assert normalize_date("01/15/24") == "01/15/2024"
        assert normalize_date("20240115") == "01/15/2024"
        assert normalize_date("01/15/24", DATE_FORMATS_PYDANTIC) == "01/15/24"

    def test_dd_mm_disambiguation(self):
        # day>12 forces the %d/%m/%Y branch (only for non-2-digit-regex inputs)
        assert normalize_date("3/15/2024") == "03/15/2024"

    def test_passthrough_on_failure(self):
        # validators.py:87-89
        assert normalize_date("not a date") == "not a date"
        assert normalize_date("EMPTY VALUE") == "EMPTY VALUE"
        assert normalize_date("") == ""

    def test_validate_format(self):
        assert validate_date_format("01/01/2024")
        assert validate_date_format("EMPTY VALUE")  # validators.py:45-46
        assert not validate_date_format("2024-01-01")
        # regex-only: impossible dates still pass the format gate
        assert validate_date_format("13/45/2024")


class TestCurrency:
    def test_clean(self):
        # validators.py:13-32
        assert clean_currency_string("$1,234.56") == 1234.56
        assert clean_currency_string("1234.56") == 1234.56
        assert clean_currency_string("$ 1, 000 .00") == 1000.0
        assert clean_currency_string("EMPTY VALUE") is None
        assert clean_currency_string("") is None
        assert clean_currency_string("abc") is None

    def test_validate(self):
        assert validate_currency_amount("$1,000.00")
        assert validate_currency_amount("EMPTY VALUE")
        assert not validate_currency_amount("-5")  # negative fails
        assert not validate_currency_amount("xyz")


class TestText:
    def test_clean_text(self):
        # validators.py:92-112
        assert clean_text_field("  hello   world  ") == "hello world"
        assert clean_text_field("a\n\nb\tc") == "a b c"
        assert clean_text_field("· bullet • text") == "bullet text"
        assert clean_text_field("EMPTY VALUE") == "EMPTY VALUE"
        assert clean_text_field("") == ""

    def test_clean_text_unicode_whitespace(self):
        # the reference's re.sub(r'\s+') collapses Unicode whitespace too —
        # NBSP and friends are common in PDF-extracted text; the fast path
        # must not pass them through
        assert clean_text_field("a\xa0b") == "a b"
        assert clean_text_field("a b c") == "a b c"
        assert clean_text_field("\xa0edge\xa0") == "edge"


class TestQuoteNumber:
    def test_valid(self):
        assert validate_quote_number("WC-TEST-123456")
        assert validate_quote_number("Q (2024) 01_A")

    def test_invalid(self):
        assert not validate_quote_number("")
        assert not validate_quote_number("   ")
        assert not validate_quote_number("QN#123")  # '#' outside class


class TestBooleans:
    def test_superset_variant(self):
        # validators.py:134-159
        for v in ["yes", "true", "included", "include", "y", "1", "on", "YES "]:
            assert normalize_boolean_field(v) == "Included", v
        for v in ["no", "false", "excluded", "exclude", "n", "0", "off"]:
            assert normalize_boolean_field(v) == "Excluded", v
        assert normalize_boolean_field("maybe") == "maybe"

    def test_pydantic_variant_passthrough(self):
        # extraction.py:103-115: canonical spellings pass through UNCHANGED
        for v in ["Included", "Excluded", "Yes", "No", "True", "False"]:
            assert normalize_boolean_pydantic(v) == v
        assert normalize_boolean_pydantic("yes") == "Included"
        assert normalize_boolean_pydantic("exclude") == "Excluded"
        # the smaller mapping: y/1/on are NOT mapped here
        assert normalize_boolean_pydantic("y") == "y"
        assert normalize_boolean_pydantic("1") == "1"


class TestCommission:
    def test_rules(self):
        # extraction.py:117-132
        assert normalize_commission("10%") == "10%"
        assert normalize_commission("$500") == "$500"
        assert normalize_commission("10") == "10.0%"
        assert normalize_commission("7.5") == "7.5%"
        assert normalize_commission("150") == "150"
        assert normalize_commission("n/a") == "n/a"
        assert normalize_commission("EMPTY VALUE") == "EMPTY VALUE"


class TestStateCodes:
    def test_extract(self):
        # validators.py:162-234
        # NB: the reference uppercases the whole text first, so the English
        # word 'in' is reported as Indiana — a by-design false positive.
        assert extract_state_codes("offices in NY and TX, plus Toronto ON") == ["IN", "NY", "TX"]
        assert extract_state_codes("zz AB CD") == []
        assert extract_state_codes("lowercase tx") == ["TX"]  # .upper() first
        assert extract_state_codes("") == []


class TestFilenames:
    def test_sanitize(self):
        # validators.py:259-281
        assert sanitize_filename('a<b>c:d"e.pdf') == "a_b_c_d_e.pdf"
        assert sanitize_filename("my file.pdf") == "my_file.pdf"
        assert sanitize_filename("") == "unknown_file"
        long = "x" * 150 + ".pdf"
        out = sanitize_filename(long)
        assert out.endswith(".pdf") and len(out) <= 94


class TestTimeFormat:
    def test_humanize(self):
        # validators.py:284-301
        assert format_processing_time(0.5) == "500ms"
        assert format_processing_time(2.34) == "2.3s"
        assert format_processing_time(65) == "1m 5.0s"
