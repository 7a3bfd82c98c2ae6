"""HTML boilerplate stripping via shallow text-density scoring.

The north-star spec calls for main-content extraction over HTML documents:
boilerplate removal with text-density DOM scoring in the style of public
readability/boilerpipe heuristics (Kohlschütter et al., WSDM 2010): chrome
blocks (nav, header, footer, link farms) are short and link-dense; content
blocks are long and word-dense.

Pure-regex implementation (no bs4/lxml in this container): good enough for
the block-level density features the scoring needs, deterministic, and fast.
All patterns compiled at import (once per worker).
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

_RE_HEAD = re.compile(r"<head\b[^>]*>.*?</head\s*>", re.DOTALL | re.IGNORECASE)
_RE_SCRIPT = re.compile(r"<(script|style)\b[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
# block-level containers that delimit candidate blocks
_BLOCK_TAGS = r"p|div|h[1-6]|li|ul|ol|table|tr|article|section|header|footer|nav|aside|main|blockquote|pre"
_RE_BLOCK_OPEN = re.compile(rf"<({_BLOCK_TAGS})\b[^>]*>", re.IGNORECASE)
_RE_BLOCK_CLOSE = re.compile(rf"</({_BLOCK_TAGS})\s*>", re.IGNORECASE)
_RE_ANCHOR = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.DOTALL | re.IGNORECASE)
_RE_IMG = re.compile(r"<img\b[^>]*?src\s*=\s*[\"']([^\"']+)[\"'][^>]*>", re.IGNORECASE)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_WORD = re.compile(r"[A-Za-z0-9]+")

_ENTITIES = {
    "&amp;": "&", "&lt;": "<", "&gt;": ">", "&quot;": '"',
    "&#39;": "'", "&apos;": "'", "&nbsp;": " ",
}

# chrome by structure: content inside these containers is boilerplate
_CHROME_TAGS = frozenset(["nav", "header", "footer", "aside"])


def unescape(text: str) -> str:
    for ent, ch in _ENTITIES.items():
        text = text.replace(ent, ch)
    return text


def _strip_tags(fragment: str) -> str:
    return unescape(_RE_TAG.sub("", fragment)).strip()


def split_blocks(html: str) -> List[Tuple[str, str, str]]:
    """Split HTML into (container_tag, raw_fragment, text) blocks.

    container_tag is the innermost block-level tag enclosing the fragment
    ('' at top level).  script/style/comments removed first.
    """
    html = _RE_COMMENT.sub("", _RE_SCRIPT.sub("", _RE_HEAD.sub("", html)))
    blocks: List[Tuple[str, str, str]] = []
    stack: List[str] = []
    pos = 0
    events = sorted(
        [(m.start(), m.end(), m.group(1).lower(), "open") for m in _RE_BLOCK_OPEN.finditer(html)]
        + [(m.start(), m.end(), m.group(1).lower(), "close") for m in _RE_BLOCK_CLOSE.finditer(html)]
    )
    for start, end, tag, kind in events:
        fragment = html[pos:start]
        text = _strip_tags(fragment)
        if text:
            blocks.append((stack[-1] if stack else "", fragment, text))
        if kind == "open":
            stack.append(tag)
        else:
            while stack:
                if stack.pop() == tag:
                    break
        pos = end
    tail = _strip_tags(html[pos:])
    if tail:
        blocks.append((stack[-1] if stack else "", html[pos:], tail))
    return blocks


def block_features(fragment: str, text: str) -> Dict[str, float]:
    """Shallow features: word count, link density (anchor-text share)."""
    words = _RE_WORD.findall(text)
    n_words = len(words)
    anchor_text = " ".join(_strip_tags(m) for m in _RE_ANCHOR.findall(fragment))
    anchor_words = len(_RE_WORD.findall(anchor_text))
    link_density = anchor_words / n_words if n_words else 0.0
    word_chars = sum(len(w) for w in words)
    density = word_chars / max(1, len(text))
    return {"n_words": float(n_words), "link_density": link_density, "density": density}


def is_chrome_block(container: str, fragment: str, text: str) -> bool:
    """Boilerplate decision: structural chrome, link farms, or junk-short."""
    if container in _CHROME_TAGS:
        return True
    f = block_features(fragment, text)
    if f["link_density"] > 0.33 and f["n_words"] < 30:
        return True
    if f["n_words"] <= 3 and f["density"] < 0.5:
        return True
    return False


def extract_main_content(html: str) -> str:
    """Main text content: non-chrome blocks joined by newlines."""
    out = []
    for container, fragment, text in split_blocks(html):
        if not is_chrome_block(container, fragment, text):
            out.append(text)
    return "\n".join(out)


def html_to_spans(html: str) -> List[Dict]:
    """HTML -> interleaved span sequence (the engine's canonical doc shape).

    h1-h6 content -> heading spans; table containers -> table spans;
    <img src> -> media spans (media_ref = src); other content blocks -> text
    spans; chrome blocks dropped.  Offsets densified in document order.
    """
    spans: List[Dict] = []

    def add(kind: str, text: str, media_ref: str = "") -> None:
        spans.append({"kind": kind, "text": text, "media_ref": media_ref,
                      "offset": len(spans)})

    html_clean = _RE_COMMENT.sub("", _RE_SCRIPT.sub("", _RE_HEAD.sub("", html)))
    img_positions = [(m.start(), m.group(1)) for m in _RE_IMG.finditer(html_clean)]
    img_i = 0
    consumed = 0
    for container, fragment, text in split_blocks(html_clean):
        frag_pos = html_clean.find(fragment, consumed)
        if frag_pos >= 0:
            consumed = frag_pos + len(fragment)
            while img_i < len(img_positions) and img_positions[img_i][0] < frag_pos:
                add("media", "", img_positions[img_i][1])
                img_i += 1
        if is_chrome_block(container, fragment, text):
            continue
        if container.startswith("h") and container[1:].isdigit():
            add("heading", text)
        elif container in ("table", "tr"):
            add("table", text)
        else:
            add("text", text)
    while img_i < len(img_positions):
        add("media", "", img_positions[img_i][1])
        img_i += 1
    return spans
