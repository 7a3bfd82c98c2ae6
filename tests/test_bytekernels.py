"""Byte-kernel helpers + the vectorized extractor masks built on them."""

import numpy as np
import pyarrow as pa
import pytest

from insurance_pdf_extractor_ray.functions.bytekernels import (
    row_any,
    row_sums,
    string_buffer,
)
from insurance_pdf_extractor_ray.functions.normalize import (
    _RE_DIRTY,
    clean_text_field,
    dirty_text_mask,
)
from insurance_pdf_extractor_ray.stages.boilerplate import (
    boilerplate_mask,
    is_boilerplate,
)


class TestRowSums:
    def _sums(self, strings, byte):
        data, lo, hi, _ = string_buffer(pa.array(strings, pa.string()))
        return row_sums(data == byte, lo, hi)

    def test_basic_counts(self):
        assert self._sums(["aba", "", "bb", "a"], ord("a")).tolist() \
            == [2, 0, 0, 1]

    def test_trailing_empty_rows(self):
        # empty rows at the very end have lo == len(data): must be 0,
        # not an out-of-bounds reduceat crash or a stolen last byte
        assert self._sums(["xa", "", ""], ord("a")).tolist() == [1, 0, 0]

    def test_all_empty(self):
        assert self._sums(["", "", ""], ord("a")).tolist() == [0, 0, 0]

    def test_empty_array(self):
        assert self._sums([], ord("a")).tolist() == []

    def test_sliced_array_rebases(self):
        arr = pa.array(["zzzz", "ab", "", "ba"], pa.string()).slice(1, 3)
        data, lo, hi, _ = string_buffer(arr)
        assert len(data) == 4  # parent's 'zzzz' bytes not scanned
        assert row_sums(data == ord("a"), lo, hi).tolist() == [1, 0, 1]

    def test_nulls_count_as_empty(self):
        assert self._sums(["a", None, "aa"], ord("a")).tolist() == [1, 0, 2]

    def test_row_any(self):
        data, lo, hi, _ = string_buffer(
            pa.array(["x", "", "ax", "a"], pa.string()))
        assert row_any(data == ord("a"), lo, hi).tolist() \
            == [False, False, True, True]


class TestMaskEquivalence:
    CASES = [
        "", " ", "\t\n", "page 3", "Page 12 of 40", "  page 7 ",
        "© 2021 acme", "(c) 1999", "(C)  2024 corp", "Copyright",
        "all rights reserved", "home | about | contact", "a > b > c",
        "a|b", "word", "the quick brown fox", "a  b", "a\tb", " a", "a ",
        "a\xa0b", "é", "naïve café", "\x0bpage 4\x0b", "x\x0by", "a·b",
        "1 2 3 4 5 6", "!@#$%^", None,
    ]

    def test_boilerplate_mask_matches_scalar(self):
        import random

        rng = random.Random(3)
        cases = self.CASES + [
            "".join(rng.choices("ab |>.0123456789\t\n\x0b é©·",
                                k=rng.randint(0, 40)))
            for _ in range(3000)]
        m = boilerplate_mask(pa.array(cases, pa.string()))
        for i, c in enumerate(cases):
            assert bool(m[i]) == is_boilerplate(c or ""), repr(c)

    def test_dirty_mask_is_exact_or_conservative(self):
        import random

        rng = random.Random(4)
        cases = self.CASES + [
            "".join(rng.choices("ab .\t\n\x0b\xa0é·•",
                                k=rng.randint(0, 30)))
            for _ in range(3000)]
        m = dirty_text_mask(pa.array(cases, pa.string()))
        for i, c in enumerate(cases):
            c0 = c or ""
            want = _RE_DIRTY.search(c0) is not None
            if bool(m[i]) != want:
                # conservative-dirty allowed only for non-ASCII rows
                assert bool(m[i]) and not c0.isascii(), repr(c)
            # end-to-end: mask-gated cleaning == direct cleaning
            via = c0 if not m[i] else clean_text_field(c0)
            assert via == clean_text_field(c0), repr(c)
