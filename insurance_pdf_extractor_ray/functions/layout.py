"""PDF-style layout parsing: word boxes -> lines -> blocks -> spans.

The north-star spec's layout surface (pdfplumber/pdfminer-style, public
algorithms): cluster word boxes into lines by y-coordinate tolerance, lines
into blocks by vertical gaps, detect tables via aligned whitespace-gap
column breaks across consecutive lines, classify single-line ALL-CAPS
blocks as headings — then emit the engine's canonical span sequence.

Coordinates: top-left origin, y increases downward, units arbitrary
(points).  Pure functions, deterministic.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Dict, List, Sequence, Tuple


@dataclass
class WordBox:
    text: str
    x0: float
    y0: float
    x1: float
    y1: float

    @property
    def yc(self) -> float:
        return (self.y0 + self.y1) / 2.0


@dataclass
class Line:
    y: float
    words: List[WordBox]  # sorted by x0

    @property
    def text(self) -> str:
        return " ".join(w.text for w in self.words)

    def column_breaks(self, col_gap: float) -> List[float]:
        """x-positions where the within-line whitespace gap exceeds col_gap
        (the whitespace-gap table heuristic): start x of the cell AFTER the gap."""
        breaks = []
        for a, b in zip(self.words, self.words[1:]):
            if b.x0 - a.x1 > col_gap:
                breaks.append(b.x0)
        return breaks


def cluster_lines(words: Sequence[WordBox], y_tol: float = 4.0) -> List[Line]:
    """Cluster word boxes into lines: sort by y-center, group while the
    y-center stays within ``y_tol`` of the line's running mean."""
    if not words:
        return []
    ordered = sorted(words, key=lambda w: (w.yc, w.x0))
    lines: List[Line] = []
    current: List[WordBox] = [ordered[0]]
    mean_y = ordered[0].yc
    for w in ordered[1:]:
        if abs(w.yc - mean_y) <= y_tol:
            current.append(w)
            mean_y += (w.yc - mean_y) / len(current)
        else:
            current.sort(key=lambda x: x.x0)
            lines.append(Line(y=mean_y, words=current))
            current, mean_y = [w], w.yc
    current.sort(key=lambda x: x.x0)
    lines.append(Line(y=mean_y, words=current))
    return lines


def cluster_blocks(lines: Sequence[Line], block_gap: float = 28.0) -> List[List[Line]]:
    """Group consecutive lines into blocks wherever the vertical gap between
    adjacent lines stays below ``block_gap`` (paragraph segmentation)."""
    if not lines:
        return []
    blocks: List[List[Line]] = [[lines[0]]]
    for prev, cur in zip(lines, lines[1:]):
        if cur.y - prev.y > block_gap:
            blocks.append([cur])
        else:
            blocks[-1].append(cur)
    return blocks


def is_table_block(block: Sequence[Line], col_gap: float = 40.0,
                   align_tol: float = 8.0) -> bool:
    """Table iff >= 2 lines share an aligned column break (cell start x
    within ``align_tol``) — the whitespace-gap / implicit-ruling heuristic."""
    break_xs: List[float] = []
    for line in block:
        break_xs.extend(line.column_breaks(col_gap))
    if len(break_xs) < 2:
        return False
    break_xs.sort()
    run = 1
    for a, b in zip(break_xs, break_xs[1:]):
        if b - a <= align_tol:
            run += 1
            if run >= 2:
                return True
        else:
            run = 1
    return False


def block_kind(block: Sequence[Line], col_gap: float = 40.0) -> str:
    if is_table_block(block, col_gap):
        return "table"
    if len(block) == 1:
        t = block[0].text
        if t and t.isupper():
            return "heading"
    return "text"


def words_to_spans(
    words: Sequence[WordBox],
    y_tol: float = 4.0,
    block_gap: float = 28.0,
    col_gap: float = 40.0,
) -> List[Dict]:
    """Full layout parse: word boxes -> ordered (kind, text, media_ref,
    offset) spans.  Lines inside a block are joined with newlines (the
    extractor's line parser re-splits them)."""
    spans: List[Dict] = []
    for block in cluster_blocks(cluster_lines(words, y_tol), block_gap):
        kind = block_kind(block, col_gap)
        text = "\n".join(line.text for line in block)
        spans.append({"kind": kind, "text": text, "media_ref": "",
                      "offset": len(spans)})
    return spans


# ---------------------------------------------------------------------------
# deterministic box rendering (the test/bench generator's geometry model)
# ---------------------------------------------------------------------------

CHAR_W = 6.0
WORD_GAP = 6.0
LINE_H = 18.0
SPAN_GAP = 40.0
COL_X = 400.0


def render_line(text: str, y: float, x0: float = 72.0,
                column_split: int = -1) -> List[WordBox]:
    """Lay one text line out as word boxes.  ``column_split`` puts the words
    from that index onward at COL_X (a table value cell); -1 = no split."""
    boxes: List[WordBox] = []
    x = x0
    for i, word in enumerate(text.split()):
        if column_split >= 0 and i == column_split:
            x = max(x, COL_X)
        w = len(word) * CHAR_W
        boxes.append(WordBox(word, x, y, x + w, y + 12.0))
        x += w + WORD_GAP
    return boxes


def render_span_lines(lines: List[Tuple[str, int]], y: float) -> Tuple[List[WordBox], float]:
    """Render a span's lines (text, column_split) starting at ``y``; returns
    (boxes, next free y)."""
    boxes: List[WordBox] = []
    for text, split in lines:
        boxes.extend(render_line(text, y, column_split=split))
        y += LINE_H
    return boxes, y
