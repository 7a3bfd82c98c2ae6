"""Layout parsing: word boxes -> lines/blocks/tables -> spans -> extraction.

The north-star's pdfplumber/pdfminer-style surface: y-tolerance line
clustering, vertical-gap block segmentation, whitespace-gap table detection.
"""

import pytest

import ray.data

from insurance_pdf_extractor_ray.functions.layout import (
    WordBox,
    cluster_blocks,
    cluster_lines,
    is_table_block,
    render_line,
    words_to_spans,
)
from insurance_pdf_extractor_ray.pipelines.extraction import extract_pipeline
from insurance_pdf_extractor_ray.pipelines.layoutpipe import words_to_docs
from insurance_pdf_extractor_ray.sources.synth import (
    build_doc,
    word_boxes_for_doc,
    word_boxes_table,
)
from insurance_pdf_extractor_ray.stages.extract import FieldExtractor


def test_line_clustering_y_tolerance():
    words = (render_line("a b", 100.0) + render_line("c d", 102.0, x0=200.0)
             + render_line("e", 130.0))  # first two merge (within tol), third is new
    lines = cluster_lines(words, y_tol=4.0)
    assert [ln.text for ln in lines] == ["a b c d", "e"]


def test_unsorted_input_is_reordered():
    words = render_line("second line", 120.0) + render_line("first line", 100.0)
    import random

    random.Random(3).shuffle(words)
    lines = cluster_lines(words)
    assert [ln.text for ln in lines] == ["first line", "second line"]


def test_block_segmentation_and_table_detection():
    words = []
    words += render_line("Coverage Limits:", 100.0)
    words += render_line("Each Accident: $1,000,000", 118.0, column_split=2)
    words += render_line("Disease: $1,000,000", 136.0, column_split=1)
    words += render_line("a plain paragraph with several words", 200.0)
    blocks = cluster_blocks(cluster_lines(words))
    assert len(blocks) == 2
    assert is_table_block(blocks[0]) and not is_table_block(blocks[1])
    spans = words_to_spans(words)
    assert [s["kind"] for s in spans] == ["table", "text"]
    assert spans[0]["text"].splitlines()[1] == "Each Accident: $1,000,000"


def test_single_break_is_not_a_table():
    # one column break total -> not enough alignment evidence
    words = render_line("label value", 100.0, column_split=1) + \
            render_line("just text here", 118.0)
    blocks = cluster_blocks(cluster_lines(words))
    assert not is_table_block(blocks[0])


@pytest.mark.parametrize("family_offset", [0, 4, 6, 10])
def test_layout_golden_families(family_offset):
    """word boxes -> layout parse -> extraction matches the doc goldens
    (cleaned span texts + kinds + all 18 fields)."""
    ex = FieldExtractor()
    for i in range(family_offset, 120, 12):
        spec, boxes = word_boxes_for_doc(i)
        r = ex.extract_doc(words_to_spans(boxes))
        for f, v in spec.expected_fields.items():
            assert r["fields"][f] == v, (i, spec.family, f)
        got = [(s["kind"], s["text"]) for s in r["spans_out"]]
        assert got == [(s[0], s[1]) for s in spec.expected_spans], (i, spec.family)


@pytest.mark.usefixtures("ray_session")
def test_layout_pipeline_distributed(ray_session):
    """Distributed: word-box table -> words_to_docs -> flagship extractor."""
    idx = [i for i in range(48) if i % 12 != 9]  # media has no boxes
    tbl = word_boxes_table(idx)
    docs = words_to_docs(ray.data.from_arrow(tbl))
    rows = {r["doc_id"]: r for r in extract_pipeline(docs).take_all()}
    assert len(rows) == len(idx)
    for i in idx:
        spec = build_doc(i)
        r = rows[spec.doc_id]
        assert r["status"] == spec.expected_status, (i, spec.family)
        assert r["fields"]["quote_number"] == spec.expected_fields["quote_number"]
