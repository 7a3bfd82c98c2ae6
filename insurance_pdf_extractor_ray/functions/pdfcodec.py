"""Minimal real PDF writer + parser (pure stdlib) for span-model ingestion.

The reference's input surface is actual PDF bytes parsed with pypdf
(/root/reference/app/services/pdf_processor.py:364-377 ``PdfReader(BytesIO(
content)).pages`` + ``extract_text()``); its test fixtures are built with
reportlab (/root/reference/tests/utils/mock_generators.py:11-48: one text
line per labeled field at decreasing y).  Neither library is in this
container, so this module implements the same two capabilities directly on
the PDF spec:

* :func:`build_pdf` — a valid multi-page PDF 1.4: catalog/pages/page object
  graph, Helvetica + Helvetica-Bold fonts, FlateDecode-compressed content
  streams of ``Tj`` text runs positioned with ``Td``, real raw-RGB Image
  XObjects for media spans, a correct xref table + trailer.
* :func:`parse_pdf` — object-graph parser: trailer -> /Root -> /Pages ->
  /Kids walk, stream extraction (+ zlib inflate for /FlateDecode), content
  tokenization (BT/ET, Tf font+size, Td motion, Tj strings with full
  escape handling, Do XObject invocations), and span reconstruction from
  the typographic grammar the writer uses (leading = same span, gap = new
  span, bold/large = heading).

The writer/parser pair gives the engine a genuine binary-document
ingestion path: doc spec -> real PDF bytes -> parsed span model ->
extract_pipeline, gated against the same first-principles field goldens as
the span-native path.
"""

from __future__ import annotations

import re
import zlib
from typing import Dict, List, Optional, Tuple

# typographic grammar shared by writer and parser
LINE_LEADING = 14   # dy between lines of one span
SPAN_GAP = 26       # dy between spans
BODY_SIZE = 11
HEADING_SIZE = 16
LINES_PER_PAGE = 44
PAGE_W, PAGE_H = 612, 792
TOP_Y = 720
LEFT_X = 72


# ---------------------------------------------------------------------------
# Writer
# ---------------------------------------------------------------------------


def _esc(s: str) -> bytes:
    out = []
    for ch in s:
        if ch in "\\()":
            out.append("\\" + ch)
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    return "".join(out).encode("latin-1", errors="replace")


class _PdfBuilder:
    """Accumulates numbered objects; emits body + xref + trailer."""

    def __init__(self):
        self.objects: List[bytes] = []  # index i -> object (i+1)

    def add(self, body: bytes) -> int:
        self.objects.append(body)
        return len(self.objects)

    def reserve(self) -> int:
        self.objects.append(b"")
        return len(self.objects)

    def set(self, num: int, body: bytes) -> None:
        self.objects[num - 1] = body

    def render(self, root: int, info: Optional[int] = None) -> bytes:
        out = bytearray(b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n")
        offsets = [0] * (len(self.objects) + 1)
        for i, body in enumerate(self.objects):
            offsets[i + 1] = len(out)
            out += f"{i + 1} 0 obj\n".encode() + body + b"\nendobj\n"
        xref_at = len(out)
        out += f"xref\n0 {len(self.objects) + 1}\n".encode()
        out += b"0000000000 65535 f \n"
        for off in offsets[1:]:
            out += f"{off:010d} 00000 n \n".encode()
        info_ref = f" /Info {info} 0 R" if info else ""
        out += (f"trailer\n<< /Size {len(self.objects) + 1} "
                f"/Root {root} 0 R{info_ref} >>\n"
                f"startxref\n{xref_at}\n").encode() + b"%%EOF\n"
        return bytes(out)


def _stream_obj(payload: bytes, extra: str = "") -> bytes:
    comp = zlib.compress(payload, 6)
    return (f"<< /Length {len(comp)} /Filter /FlateDecode{extra} >>\nstream\n"
            .encode() + comp + b"\nendstream")


def _image_xobject(media_ref: str, w: int = 8, h: int = 6) -> bytes:
    """Real raw-RGB Image XObject; the span's media_ref rides along as a
    custom dict entry (custom keys are legal in any PDF dictionary)."""
    # deterministic pixels from the ref so the object is a real image
    seed = sum(media_ref.encode())
    px = bytes(((seed + 37 * i) % 256) for i in range(w * h * 3))
    comp = zlib.compress(px, 6)
    return (f"<< /Type /XObject /Subtype /Image /Width {w} /Height {h} "
            f"/ColorSpace /DeviceRGB /BitsPerComponent 8 "
            f"/GraftRef ({_esc(media_ref).decode('latin-1')}) "
            f"/Length {len(comp)} /Filter /FlateDecode >>\nstream\n"
            .encode("latin-1") + comp + b"\nendstream")


# document-information dictionary: reference metadata key -> PDF /Info key
# (pypdf's reader.metadata surface, see /root/reference/app/services/
# pdf_processor.py:467-477)
INFO_KEYS = (("title", "Title"), ("author", "Author"),
             ("subject", "Subject"), ("creator", "Creator"),
             ("producer", "Producer"), ("creation_date", "CreationDate"),
             ("modification_date", "ModDate"))


def build_pdf(spans: List[Tuple[str, str, str]],
              info: Optional[Dict[str, str]] = None) -> bytes:
    """[(kind, text, media_ref)] in document order -> real PDF bytes.

    kind 'heading' renders bold 16pt; 'media' embeds an Image XObject and
    draws it; everything else renders 11pt body lines.  Pagination at
    LINES_PER_PAGE with the span grammar preserved across page breaks via
    a continuation marker (the parser joins them).  ``info`` (reference-key
    dict, see INFO_KEYS) writes a document-information dictionary
    referenced from the trailer ``/Info`` — the metadata surface the
    reference projects via pypdf (pdf_processor.py:458-483)."""
    b = _PdfBuilder()
    catalog = b.reserve()
    pages = b.reserve()
    font_r = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    font_b = b.add(b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica-Bold >>")

    # lay out into per-page content streams
    page_payloads: List[bytes] = []
    page_xobjects: List[Dict[str, int]] = []
    cur: List[bytes] = []
    cur_xo: Dict[str, int] = {}
    lines_on_page = 0
    continued = False  # current span continues from previous page

    def flush_page():
        nonlocal cur, cur_xo, lines_on_page
        page_payloads.append(b"".join(cur))
        page_xobjects.append(cur_xo)
        cur, cur_xo, lines_on_page = [], {}, 0

    def begin_page():
        cur.append(f"BT\n/F1 {BODY_SIZE} Tf\n{LEFT_X} {TOP_Y} Td\n".encode())

    begin_page()
    first_on_page = True
    for kind, text, media_ref in spans:
        if kind == "media":
            if lines_on_page >= LINES_PER_PAGE:
                cur.append(b"ET\n")
                flush_page()
                begin_page()
                first_on_page = True
            name = f"Im{len(cur_xo)}"
            xo = b.add(_image_xobject(media_ref))
            cur_xo[name] = xo
            # leave the text block, paint, re-enter at the next slot
            if not first_on_page:
                cur.append(f"0 -{SPAN_GAP} Td\n".encode())
            cur.append(f"ET\nq 48 0 0 36 {LEFT_X} 200 cm /{name} Do Q\nBT\n"
                       f"/F1 {BODY_SIZE} Tf\n{LEFT_X} {TOP_Y} Td\n".encode())
            # Do NOT reset first_on_page: the Td cursor restarted, but span
            # grammar continues; parser tracks Do as its own span.
            lines_on_page += 1
            first_on_page = True
            continue
        size = HEADING_SIZE if kind == "heading" else BODY_SIZE
        font = "F2" if kind == "heading" else "F1"
        lines = text.split("\n")
        cur.append(f"/{font} {size} Tf\n".encode())
        for j, line in enumerate(lines):
            if lines_on_page >= LINES_PER_PAGE:
                cur.append(b"ET\n")
                flush_page()
                begin_page()
                cur.append(f"/{font} {size} Tf\n".encode())
                if j > 0:
                    # page break MID-span: mark so the parser keeps the
                    # first line of the new page inside the current span
                    cur.append(b"% cont\n")
                    continued = True
                first_on_page = True
            if not first_on_page:
                dy = LINE_LEADING if (j > 0 or continued) else SPAN_GAP
                cur.append(f"0 -{dy} Td\n".encode())
            cur.append(b"(" + _esc(line) + b") Tj\n")
            first_on_page = False
            continued = False
            lines_on_page += 1
    cur.append(b"ET\n")
    flush_page()

    page_nums = []
    for payload, xobjects in zip(page_payloads, page_xobjects):
        content = b.add(_stream_obj(payload))
        xo_entries = " ".join(f"/{n} {num} 0 R" for n, num in xobjects.items())
        res = (f"<< /Font << /F1 {font_r} 0 R /F2 {font_b} 0 R >>"
               + (f" /XObject << {xo_entries} >>" if xo_entries else "")
               + " >>")
        pnum = b.add((f"<< /Type /Page /Parent {pages} 0 R "
                      f"/MediaBox [0 0 {PAGE_W} {PAGE_H}] "
                      f"/Resources {res} /Contents {content} 0 R >>").encode())
        page_nums.append(pnum)
    kids = " ".join(f"{p} 0 R" for p in page_nums)
    b.set(pages, (f"<< /Type /Pages /Count {len(page_nums)} "
                  f"/Kids [{kids}] >>").encode())
    b.set(catalog, f"<< /Type /Catalog /Pages {pages} 0 R >>".encode())
    info_num = None
    if info:
        entries = b"".join(
            b"/" + pdf_key.encode() + b" (" + _esc(str(info[ref_key])) + b") "
            for ref_key, pdf_key in INFO_KEYS if info.get(ref_key))
        if entries:
            info_num = b.add(b"<< " + entries + b">>")
    return b.render(catalog, info=info_num)


# ---------------------------------------------------------------------------
# Parser
# ---------------------------------------------------------------------------

_REF_RE = re.compile(rb"/(\w+)\s+(\d+)\s+0\s+R")
_TOKEN_RE = re.compile(
    rb"/F(\d+)\s+([\d.]+)\s+Tf"        # 1,2: font select
    rb"|([-\d.]+)\s+([-\d.]+)\s+Td"    # 3,4: cursor move
    rb"|\(((?:[^()\\]|\\.)*)\)\s*Tj"   # 5: show string
    rb"|/(\w+)\s+Do"                   # 6: xobject paint
    rb"|BT|ET"
)
_STR_ESC = {b"n": b"\n", b"r": b"\r", b"t": b"\t", b"b": b"\b", b"f": b"\f",
            b"(": b"(", b")": b")", b"\\": b"\\"}


def _unescape(raw: bytes) -> str:
    out = bytearray()
    i = 0
    while i < len(raw):
        c = raw[i:i + 1]
        if c == b"\\" and i + 1 < len(raw):
            nxt = raw[i + 1:i + 2]
            if nxt in _STR_ESC:
                out += _STR_ESC[nxt]
                i += 2
                continue
            if nxt.isdigit():  # octal \d{1,3}
                j = i + 1
                while j < min(i + 4, len(raw)) and raw[j:j + 1].isdigit():
                    j += 1
                out.append(int(raw[i + 1:j], 8) & 0xFF)
                i = j
                continue
            i += 1
            continue
        out += c
        i += 1
    return out.decode("latin-1")


class PdfDocument:
    """Parsed object graph of one PDF byte string.

    xref-driven, like a conforming reader: ``startxref`` -> xref table ->
    per-object byte offsets; stream payloads are skipped by their declared
    /Length, never scanned — compressed bytes can contain anything,
    including sequences that look like object delimiters."""

    def __init__(self, data: bytes):
        if not data.startswith(b"%PDF-"):
            raise ValueError("not a PDF: bad header")
        self._data = data
        self._objects: Dict[int, bytes] = {}
        sx = data.rfind(b"startxref")
        if sx < 0:
            raise ValueError("PDF missing startxref")
        mx = re.match(rb"startxref\s+(\d+)", data[sx:])
        if not mx:
            raise ValueError("PDF malformed startxref")
        xref_at = int(mx.group(1))
        mh = re.match(rb"xref\s+(\d+)\s+(\d+)\s*\n", data[xref_at:])
        if not mh:
            raise ValueError("PDF xref table not found at startxref offset")
        first, count = int(mh.group(1)), int(mh.group(2))
        pos = xref_at + mh.end()
        for i in range(count):
            entry = data[pos + 20 * i: pos + 20 * (i + 1)]
            if len(entry) < 18:
                raise ValueError("truncated xref entry")
            if entry[17:18] != b"n":
                continue  # free entry
            self._load_object(first + i, int(entry[:10]))
        tr = data.rfind(b"trailer")
        if tr < 0:
            raise ValueError("PDF missing trailer")
        mroot = re.search(rb"/Root\s+(\d+)\s+0\s+R", data[tr:])
        if not mroot:
            raise ValueError("PDF trailer missing /Root")
        self.root = int(mroot.group(1))
        minfo = re.search(rb"/Info\s+(\d+)\s+0\s+R", data[tr:])
        self.info_num = int(minfo.group(1)) if minfo else None

    def _load_object(self, num: int, offset: int) -> None:
        data = self._data
        m = re.match(rb"(\d+)\s+0\s+obj\s*", data[offset:offset + 64])
        if not m or int(m.group(1)) != num:
            raise ValueError(f"xref offset for object {num} is wrong")
        start = offset + m.end()
        # dict region is text; if it declares a stream, skip exactly /Length
        # payload bytes, then expect endstream/endobj
        ms = re.compile(rb"stream\r?\n").search(data, start)
        me = data.find(b"endobj", start)
        if me < 0:
            raise ValueError("truncated PDF object")
        if ms and ms.start() < me:
            ml = re.search(rb"/Length\s+(\d+)", data[start:ms.start()])
            if not ml:
                raise ValueError(f"stream object {num} missing /Length")
            payload_end = ms.end() + int(ml.group(1))
            me = data.find(b"endobj", payload_end)
            if me < 0 or b"endstream" not in data[payload_end:me]:
                raise ValueError(f"stream object {num} missing endstream")
        self._objects[num] = data[start:me]

    def obj(self, num: int) -> bytes:
        try:
            return self._objects[num]
        except KeyError:
            raise ValueError(f"PDF object {num} missing") from None

    def stream(self, num: int) -> bytes:
        body = self.obj(num)
        m = re.search(rb"stream\r?\n", body)
        if not m:
            raise ValueError(f"object {num} has no stream")
        ml = re.search(rb"/Length\s+(\d+)", body[:m.start()])
        if not ml:
            raise ValueError(f"stream object {num} missing /Length")
        # slice exactly /Length bytes — compressed payloads may contain
        # newline bytes or even the literal word 'endstream'
        payload = body[m.end():m.end() + int(ml.group(1))]
        if b"/FlateDecode" in body[:m.start()]:
            payload = zlib.decompress(payload)
        return payload

    def page_numbers(self) -> List[int]:
        cat = self.obj(self.root)
        mp = re.search(rb"/Pages\s+(\d+)\s+0\s+R", cat)
        if not mp:
            raise ValueError("catalog missing /Pages")
        pages = self.obj(int(mp.group(1)))
        mk = re.search(rb"/Kids\s*\[(.*?)\]", pages, re.S)
        if not mk:
            raise ValueError("pages missing /Kids")
        return [int(n) for n in re.findall(rb"(\d+)\s+0\s+R", mk.group(1))]

    def page_xobjects(self, page_num: int) -> Dict[str, int]:
        body = self.obj(page_num)
        mx = re.search(rb"/XObject\s*<<(.*?)>>", body, re.S)
        if not mx:
            return {}
        return {m.group(1).decode(): int(m.group(2))
                for m in _REF_RE.finditer(mx.group(1))}

    def page_content(self, page_num: int) -> bytes:
        mc = re.search(rb"/Contents\s+(\d+)\s+0\s+R", self.obj(page_num))
        if not mc:
            raise ValueError("page missing /Contents")
        return self.stream(int(mc.group(1)))

    def info_dict(self) -> Optional[Dict[str, str]]:
        """Document-information dictionary as the reference projects it
        (pypdf ``reader.metadata``, pdf_processor.py:467-477): reference
        metadata keys, empty string for absent entries; None when the
        trailer carries no ``/Info``."""
        if self.info_num is None:
            return None
        body = self.obj(self.info_num)
        out = {}
        for ref_key, pdf_key in INFO_KEYS:
            m = re.search(rb"/" + pdf_key.encode()
                          + rb"\s+\(((?:[^()\\]|\\.)*)\)", body)
            out[ref_key] = _unescape(m.group(1)) if m else ""
        return out

    def page_text(self, page_num: int) -> str:
        """All Tj strings of one page joined with newlines — the analog of
        pypdf's ``page.extract_text()`` for this writer's layout grammar
        (reference first-page preview, pdf_processor.py:479-482)."""
        parts = []
        for m in _TOKEN_RE.finditer(self.page_content(page_num)):
            if m.group(5) is not None:
                parts.append(_unescape(m.group(5)))
        return "\n".join(parts)

    def xobject_graft_ref(self, num: int) -> Optional[str]:
        m = re.search(rb"/GraftRef\s+\(((?:[^()\\]|\\.)*)\)", self.obj(num))
        return _unescape(m.group(1)) if m else None

    def xobject_image(self, num: int) -> "np.ndarray":
        """Decode a raw-RGB Image XObject to (H,W,3) uint8."""
        import numpy as np

        body = self.obj(num)
        mw = re.search(rb"/Width\s+(\d+)", body)
        mh = re.search(rb"/Height\s+(\d+)", body)
        if not (mw and mh):
            raise ValueError("image xobject missing dims")
        w, h = int(mw.group(1)), int(mh.group(1))
        px = self.stream(num)
        if len(px) < w * h * 3:
            raise ValueError("short image payload")
        return np.frombuffer(px[: w * h * 3], np.uint8).reshape(h, w, 3)


def parse_pdf(data: bytes) -> List[Tuple[str, str, str]]:
    """PDF bytes -> [(kind, text, media_ref)] spans in document order.

    Reconstructs the typographic grammar: a Td drop of LINE_LEADING (or a
    page-break continuation) extends the current span; a SPAN_GAP drop (or
    a fresh text block start after content) begins a new span; font size >=
    14 marks a heading; Do invocations of image XObjects become media spans
    carrying the /GraftRef."""
    doc = PdfDocument(data)
    spans: List[Tuple[str, str, str]] = []
    cur_lines: List[str] = []
    cur_kind = "text"
    open_span = False  # a text span continues across the page boundary

    def close():
        nonlocal cur_lines, open_span
        if cur_lines:
            spans.append((cur_kind, "\n".join(cur_lines), ""))
        cur_lines = []
        open_span = False

    for pnum in doc.page_numbers():
        xobjects = doc.page_xobjects(pnum)
        content = doc.page_content(pnum)
        continuation = b"% cont" in content
        size = float(BODY_SIZE)
        first_tj_on_page = True
        for m in _TOKEN_RE.finditer(content):
            if m.group(1) is not None:
                size = float(m.group(2))
            elif m.group(3) is not None:
                dy = -float(m.group(4))
                if dy >= SPAN_GAP - 1:
                    close()
            elif m.group(5) is not None:
                text = _unescape(m.group(5))
                if first_tj_on_page:
                    # page start: continuation joins the open span,
                    # otherwise it's a new span
                    if not (continuation and open_span):
                        close()
                    first_tj_on_page = False
                if not cur_lines:
                    cur_kind = "heading" if size >= 14 else "text"
                cur_lines.append(text)
                open_span = True
            elif m.group(6) is not None:
                close()
                name = m.group(6).decode()
                ref = doc.xobject_graft_ref(xobjects.get(name, -1)) \
                    if name in xobjects else None
                spans.append(("media", "", ref or ""))
    close()
    return spans


def pdf_info(data: bytes) -> Dict:
    """Metadata + basic info for one PDF — the reference's ``get_pdf_info``
    rebuilt on the xref parser (pdf_processor.py:458-497): page count, size
    in bytes and MB (rounded to 2), the /Info metadata projection when
    present, a <=500-char first-page text preview, and the estimated text
    length; parse failures degrade to the reference's zero-page error
    envelope instead of raising (tag-and-keep)."""
    try:
        doc = PdfDocument(data)
        pages = doc.page_numbers()
        out = {
            "num_pages": len(pages),
            "size_bytes": len(data),
            "size_mb": round(len(data) / (1024 * 1024), 2),
        }
        meta = doc.info_dict()
        if meta is not None:
            out["metadata"] = meta
        if pages:
            first = doc.page_text(pages[0])
            out["first_page_preview"] = first[:500] if first \
                else "No text extracted"
            out["estimated_text_length"] = len(first)
        return out
    except Exception as e:  # noqa: BLE001 - reference returns an error dict
        return {
            "num_pages": 0,
            "size_bytes": len(data),
            "size_mb": round(len(data) / (1024 * 1024), 2),
            "error": str(e),
        }
