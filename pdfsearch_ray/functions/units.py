"""Unit conversions (F5 parity).

Re-expresses the reference's mm <-> printer's-point constants
(/root/reference/internal/utils/units.go:5-18) exactly: 1 inch = 25.4 mm
= 72 pt.  In the webtext engine these feed the stamp stage's layout grid
(stages/stamp.py) the same way the reference's watermark placement uses
them (watermark.go:110-112).
"""

from __future__ import annotations

INCH_TO_MM = 25.4
INCH_TO_POINT = 72.0
MM_TO_POINT = INCH_TO_POINT / INCH_TO_MM
POINT_TO_MM = INCH_TO_MM / INCH_TO_POINT


def mm_to_point(x: float) -> float:
    return x * MM_TO_POINT


def point_to_mm(x: float) -> float:
    return x * POINT_TO_MM
