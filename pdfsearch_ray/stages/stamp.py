"""Result-stamp stage (S12 analog).

The reference's watermark tool places an image + external link at a
mm-grid position on a selected page of a PDF
(/root/reference/watermark.go:36-191 ``AddImageToPdf``): nine named page
positions plus a custom offset whose sign selects the corner it is
measured from, a 1-offset page selector where 0 = every page and a
negative number counts back from the last page, and mm -> point unit
conversion for the stamp's footprint.

The webtext engine has no pages to draw on; the analog stamps a text
marker + URL into a document's line/column grid:

* a document is a "page" whose extent is (max line width x line count),
  measured in points via a fixed monospace cell (CHAR_W_PT x LINE_H_PT);
* the stamp's footprint is ``width_mm x height_mm`` converted with the
  same mm->pt constants (functions/units.py, units.go:5-18);
* the placement math (`_coords`) is semantics-identical to
  watermark.go:60-97 including the custom-position sign convention
  (positive = from bottom-right, negative = from top-left);
* the ``doc_num`` selector is pageNum re-targeted at the ordered result
  set: 1-offset, 0 = every doc, negative counts back from the last doc,
  clamped at the first (watermark.go:125-131).

This is an output-formatting stage over the ≤100-doc capped results
table (results.py), so it operates on a pyarrow Table; ``stamp_docs``
wraps the same kernel as a ``map_batches`` stage for the 0 = all-docs
case over a full Dataset.
"""

from __future__ import annotations

import enum
from dataclasses import dataclass

import pyarrow as pa

from ..functions.units import mm_to_point

# Monospace layout cell: a 12 pt line grid with a 0.6 em advance — the
# fixed grid that maps point coordinates onto (line, column).
CHAR_W_PT = 7.2
LINE_H_PT = 12.0


class PagePosition(enum.Enum):
    TOP_LEFT = "top-left"
    TOP_CENTER = "top-center"
    TOP_RIGHT = "top-right"
    CENTER_LEFT = "center-left"
    CENTER = "center"
    CENTER_RIGHT = "center-right"
    BOTTOM_LEFT = "bottom-left"
    BOTTOM_CENTER = "bottom-center"
    BOTTOM_RIGHT = "bottom-right"
    CUSTOM = "custom"


@dataclass(frozen=True)
class StampLocation:
    """Placement spec — the ImageLocation analog (watermark.go:24-58)."""

    position: PagePosition = PagePosition.BOTTOM_RIGHT
    width_mm: float = 20.0
    height_mm: float = 5.0
    x_mm: float = 0.0       # custom offset; sign picks the corner
    y_mm: float = 0.0
    margin_x_mm: float = 2.0
    margin_y_mm: float = 2.0


def _coords(w: float, h: float, loc: StampLocation) -> tuple[float, float]:
    """Top-left (x, y) of the stamp on a w x h pt page — exact port of
    the placement switch (watermark.go:60-97)."""
    width = mm_to_point(loc.width_mm)
    height = mm_to_point(loc.height_mm)
    margin_x = mm_to_point(loc.margin_x_mm)
    margin_y = mm_to_point(loc.margin_y_mm)
    w -= width
    h -= height
    p = loc.position
    if p is PagePosition.TOP_LEFT:
        return margin_x, margin_y
    if p is PagePosition.TOP_CENTER:
        return w / 2, margin_y
    if p is PagePosition.TOP_RIGHT:
        return w - margin_x, margin_y
    if p is PagePosition.CENTER_LEFT:
        return margin_x, h / 2
    if p is PagePosition.CENTER:
        return w / 2, h / 2
    if p is PagePosition.CENTER_RIGHT:
        return w - margin_x, h / 2
    if p is PagePosition.BOTTOM_LEFT:
        return margin_x, h - margin_y
    if p is PagePosition.BOTTOM_CENTER:
        return w / 2, h - margin_y
    if p is PagePosition.BOTTOM_RIGHT:
        return w - margin_x, h - margin_y
    if p is PagePosition.CUSTOM:
        x_pos = mm_to_point(loc.x_mm)
        y_pos = mm_to_point(loc.y_mm)
        # Positive (or zero): from bottom right.  Negative: from top left.
        x = w - x_pos
        y = h - y_pos
        if x_pos < 0:
            x = -x_pos
        if y_pos < 0:
            y = -y_pos
        return x, y
    raise ValueError(f"bad PagePosition: {loc!r}")


def stamp_one(text: str, stamp: str, url: str, loc: StampLocation) -> str:
    """Insert ``[stamp](url)`` into ``text`` at the grid cell `_coords`
    selects for this document's extent; short lines are padded so the
    marker lands at the computed column."""
    lines = text.split("\n")
    w_pt = max((len(ln) for ln in lines), default=0) * CHAR_W_PT
    h_pt = len(lines) * LINE_H_PT
    x, y = _coords(w_pt, h_pt, loc)
    col = max(0, int(round(x / CHAR_W_PT)))
    row = min(max(0, int(round(y / LINE_H_PT))), max(0, len(lines) - 1))
    marker = f"[{stamp}]({url})" if url else f"[{stamp}]"
    ln = lines[row] if lines else ""
    if len(ln) < col:
        ln = ln + " " * (col - len(ln))
    lines[row] = ln[:col] + marker + ln[col:]
    return "\n".join(lines)


def stamp_table(
    table: pa.Table,
    stamp: str,
    url: str = "",
    *,
    doc_num: int = 0,
    loc: StampLocation = StampLocation(),
    text_column: str = "text",
) -> pa.Table:
    """Stamp the selected doc(s) of an ordered (results) table.

    ``doc_num`` follows pageNum semantics (watermark.go:119-131):
    1-offset, 0 = all docs, negative = from the end, clamped to the
    first doc."""
    n = table.num_rows
    if doc_num < 0:
        doc_num = max(1, 1 + n + doc_num)
    texts = table[text_column].to_pylist()
    out = [
        stamp_one(t if t is not None else "", stamp, url, loc)
        if (doc_num == 0 or i + 1 == doc_num) else t
        for i, t in enumerate(texts)
    ]
    idx = table.schema.get_field_index(text_column)
    return table.set_column(idx, text_column,
                            pa.array(out, type=pa.string()))


def stamp_docs(ds, stamp: str, url: str = "", *,
               loc: StampLocation = StampLocation(),
               text_column: str = "text"):
    """Stamp EVERY doc of a Dataset (the pageNum=0 path) as a streaming
    ``map_batches`` stage — the only case that runs over more than the
    capped results table."""
    return ds.map_batches(
        lambda t: stamp_table(t, stamp, url, doc_num=0, loc=loc,
                              text_column=text_column),
        batch_format="pyarrow",
    )
