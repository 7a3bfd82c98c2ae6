"""HTML boilerplate stripping (text-density DOM scoring) + span conversion."""

import pytest

import ray.data

from insurance_pdf_extractor_ray.functions.html import (
    block_features,
    extract_main_content,
    html_to_spans,
    is_chrome_block,
    unescape,
)
from insurance_pdf_extractor_ray.pipelines.extraction import extract_pipeline
from insurance_pdf_extractor_ray.pipelines.htmlpipe import html_to_docs, main_content

CHROME_DOC = """<html><head><title>T</title><script>var x=1;</script></head><body>
<nav><a href="/">Home</a> <a href="/p">Products</a> <a href="/c">Claims</a></nav>
<header><a href="/login">Login</a> | <a href="/signup">Sign up</a></header>
<h1>WORKERS COMPENSATION INSURANCE QUOTE</h1>
<p>Quote Number: WC-HTML-000001</p>
<p>Policy Effective Date: 01/15/2024</p>
<p>Policy Expiration Date: 01/15/2025</p>
<p>Named Insured: Html Co LLC</p>
<p>Address: 1 Web Street, Boise, ID 83702</p>
<p>Issuing Carrier: Test Insurance Company</p>
<img src="media://h/0">
<table><tr><td>Each Accident: $1,000,000</td></tr></table>
<div><a href="/a">x</a> <a href="/b">y</a> <a href="/c">z</a></div>
<footer>&copy; 2024 Acme. All rights reserved.</footer>
</body></html>"""


def test_main_content_strips_chrome():
    out = extract_main_content(CHROME_DOC)
    assert "Home" not in out and "Login" not in out and "rights reserved" not in out
    assert "Quote Number: WC-HTML-000001" in out
    assert "Each Accident: $1,000,000" in out
    assert out.splitlines()[0] == "WORKERS COMPENSATION INSURANCE QUOTE"


def test_span_kinds_and_order():
    spans = html_to_spans(CHROME_DOC)
    kinds = [s["kind"] for s in spans]
    assert kinds[0] == "heading"
    assert "media" in kinds and "table" in kinds
    media = next(s for s in spans if s["kind"] == "media")
    assert media["media_ref"] == "media://h/0" and media["text"] == ""
    # media sits between the last <p> and the table, as in the markup
    assert kinds.index("media") < kinds.index("table")
    assert [s["offset"] for s in spans] == list(range(len(spans)))


def test_features_and_chrome_decision():
    f = block_features('<a href="/x">a b c</a> d', "a b c d")
    assert f["link_density"] == pytest.approx(0.75)
    assert is_chrome_block("nav", "anything", "anything at all")
    assert is_chrome_block("", '<a href=x>aa</a> <a href=y>bb</a>', "aa bb")
    assert not is_chrome_block("p", "long prose " * 20, "long prose " * 20)


def test_unescape():
    assert unescape("a &amp; b &lt;c&gt; &quot;d&quot; &#39;e&#39;") == "a & b <c> \"d\" 'e'"


@pytest.mark.usefixtures("ray_session")
def test_html_to_extraction_pipeline(ray_session):
    """HTML -> spans -> the flagship extractor end-to-end."""
    import pyarrow as pa

    tbl = pa.table({"id": pa.array([1], pa.int64()),
                    "html": pa.array([CHROME_DOC], pa.string())})
    docs = html_to_docs(ray.data.from_arrow(tbl), "html", "id")
    rows = extract_pipeline(docs).take_all()
    assert len(rows) == 1
    f = rows[0]["fields"]
    assert f["quote_number"] == "WC-HTML-000001"
    assert f["policy_effective_date"] == "01/15/2024"
    assert f["named_insured_name"] == "Html Co LLC"
    assert f["workers_comp_each_accident_limit"] == "$1,000,000"
    assert rows[0]["status"] == "success"
    # media span survives into spans_out
    assert any(s["kind"] == "media" and s["media_ref"] == "media://h/0"
               for s in rows[0]["spans_out"])


@pytest.mark.usefixtures("ray_session")
def test_main_content_roundtrip_on_testdata(ray_session):
    """Chrome-wrapped document text round-trips exactly (the oracle check)."""
    import pyarrow as pa

    docs = ray.data.read_parquet("/root/testdata/sf0.001/documents.parquet",
                                 columns=["doc_id", "text"]).limit(50)
    original = {r["doc_id"]: r["text"] for r in docs.take_all()}

    def wrap(batch: pa.Table) -> pa.Table:
        htmls = [f'<html><body><nav><a href="/">Home</a> <a href="/a">A</a> <a href="/b">B</a></nav>'
                 f"<p>{t}</p><footer>&copy; 2024 X. All rights reserved.</footer></body></html>"
                 for t in batch.column("text").to_pylist()]
        return pa.table({"doc_id": batch.column("doc_id"),
                         "html": pa.array(htmls, pa.string())})

    out = main_content(docs.map_batches(wrap, batch_format="pyarrow"),
                       "html", "doc_id").take_all()
    assert len(out) == 50
    for r in out:
        assert r["text"] == original[r["doc_id"]]
