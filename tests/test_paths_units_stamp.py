"""F5 / F8 / T4-T5 / S12 parity: units, fuzzy path match, deterministic
size-banded ordering, and the result-stamp stage."""

from __future__ import annotations

import pyarrow as pa
import pytest

from pdfsearch_ray.functions.paths import (
    FileFinder,
    common_suffix,
    fnv_shuffle,
    longest_matching_suffix,
    size_banded_order,
)
from pdfsearch_ray.functions.units import (
    MM_TO_POINT,
    mm_to_point,
    point_to_mm,
)
from pdfsearch_ray.stages.stamp import (
    CHAR_W_PT,
    LINE_H_PT,
    PagePosition,
    StampLocation,
    _coords,
    stamp_docs,
    stamp_one,
    stamp_table,
)


# ---------------------------------------------------------------- units


def test_units_round_trip_and_constants():
    # units.go:5-18 — 1 inch = 25.4 mm = 72 pt
    assert mm_to_point(25.4) == pytest.approx(72.0)
    assert point_to_mm(72.0) == pytest.approx(25.4)
    for x in (0.0, 1.0, 13.7, 210.0):
        assert point_to_mm(mm_to_point(x)) == pytest.approx(x)
    assert MM_TO_POINT == pytest.approx(72.0 / 25.4)


# ---------------------------------------------------------------- paths


def test_common_suffix():
    assert common_suffix("abc/def.pdf", "xyz/def.pdf") == len("/def.pdf")
    assert common_suffix("same", "same") == 4
    assert common_suffix("a", "b") == 0
    assert common_suffix("", "anything") == 0


def test_longest_matching_suffix_prefers_longest_then_deterministic():
    cands = ["/a/x/doc.pdf", "/b/x/doc.pdf", "/c/y/doc.pdf"]
    assert longest_matching_suffix("/new/x/doc.pdf", cands) in (
        "/a/x/doc.pdf", "/b/x/doc.pdf")
    # tie between /a and /b on suffix "/x/doc.pdf": the (len, lex)
    # pre-sort makes the outcome deterministic (path_utils.go:194-201)
    assert (longest_matching_suffix("/new/x/doc.pdf", cands)
            == longest_matching_suffix("/new/x/doc.pdf", list(reversed(cands))))


def test_file_finder_exact_dup_and_missing():
    ff = FileFinder(["/corpus/a/r.pdf", "/corpus/b/r.pdf", "/corpus/q.pdf"])
    assert ff.find("/elsewhere/q.pdf") == "/corpus/q.pdf"
    assert ff.find("/moved/b/r.pdf") == "/corpus/b/r.pdf"
    assert ff.find("/nowhere/zzz.pdf") == ""


def test_fnv_shuffle_deterministic_and_uncorrelated():
    items = [f"/data/part-{i:04d}.parquet" for i in range(200)]
    s1 = fnv_shuffle(items, key=lambda p: p)
    s2 = fnv_shuffle(list(reversed(items)), key=lambda p: p)
    assert s1 == s2                     # pure function of the key set
    assert sorted(s1) == sorted(items)  # permutation
    assert s1 != items                  # not the lexicographic order


def test_size_banded_order_big_first_deterministic():
    items = [{"k": f"p{i}", "n": n}
             for i, n in enumerate([10] * 150 + [1000] * 10 + [1] * 40)]
    out = size_banded_order(
        items, size_of=lambda d: d["n"], key=lambda d: d["k"],
        big_size=100, small_size=5, head=100)
    assert sorted(d["k"] for d in out) == sorted(d["k"] for d in items)
    # every big item is scheduled before every small item
    pos = {d["k"]: i for i, d in enumerate(out)}
    last_big = max(pos[d["k"]] for d in items if d["n"] == 1000)
    first_small = min(pos[d["k"]] for d in items if d["n"] == 1)
    assert last_big < first_small
    # deterministic: same input -> identical order (resume-safe), and
    # the shuffled head is not the lexicographic band order
    out2 = size_banded_order(
        items, size_of=lambda d: d["n"],
        key=lambda d: d["k"], big_size=100, small_size=5, head=100)
    assert [d["k"] for d in out] == [d["k"] for d in out2]
    band_order = ([d for d in items if d["n"] == 1000]
                  + [d for d in items if d["n"] == 10])
    assert [d["k"] for d in out[:40]] != [d["k"] for d in band_order[:40]]


# ---------------------------------------------------------------- stamp


def test_coords_named_positions_match_reference_switch():
    loc = StampLocation(position=PagePosition.TOP_LEFT,
                        width_mm=10, height_mm=5,
                        margin_x_mm=2, margin_y_mm=3)
    w, h = 720.0, 1440.0
    x, y = _coords(w, h, loc)
    assert (x, y) == (mm_to_point(2), mm_to_point(3))
    x, y = _coords(w, h, StampLocation(position=PagePosition.CENTER,
                                       width_mm=10, height_mm=5))
    assert x == pytest.approx((w - mm_to_point(10)) / 2)
    assert y == pytest.approx((h - mm_to_point(5)) / 2)
    x, y = _coords(w, h, StampLocation(position=PagePosition.BOTTOM_RIGHT,
                                       width_mm=10, height_mm=5,
                                       margin_x_mm=2, margin_y_mm=3))
    assert x == pytest.approx(w - mm_to_point(10) - mm_to_point(2))
    assert y == pytest.approx(h - mm_to_point(5) - mm_to_point(3))


def test_coords_custom_sign_convention():
    # watermark.go:85-96 — positive offsets from bottom-right,
    # negative from top-left
    w, h = 720.0, 1440.0
    loc = StampLocation(position=PagePosition.CUSTOM, width_mm=0,
                        height_mm=0, x_mm=10, y_mm=20)
    x, y = _coords(w, h, loc)
    assert x == pytest.approx(w - mm_to_point(10))
    assert y == pytest.approx(h - mm_to_point(20))
    loc = StampLocation(position=PagePosition.CUSTOM, width_mm=0,
                        height_mm=0, x_mm=-10, y_mm=-20)
    x, y = _coords(w, h, loc)
    assert x == pytest.approx(mm_to_point(10))
    assert y == pytest.approx(mm_to_point(20))


def test_stamp_one_places_marker_on_grid():
    text = "\n".join("line %02d %s" % (i, "x" * 40) for i in range(20))
    out = stamp_one(text, "STAMP", "https://example.com",
                    StampLocation(position=PagePosition.TOP_LEFT,
                                  width_mm=5, height_mm=3,
                                  margin_x_mm=0, margin_y_mm=0))
    lines = out.split("\n")
    assert lines[0].startswith("[STAMP](https://example.com)")
    assert len(lines) == 20
    # all other lines untouched
    assert lines[1:] == text.split("\n")[1:]


def test_stamp_table_doc_num_semantics():
    t = pa.table({"doc_id": pa.array([1, 2, 3], type=pa.int64()),
                  "text": pa.array(["aaa\nbbb", "ccc\nddd", "eee\nfff"])})
    loc = StampLocation(position=PagePosition.TOP_LEFT,
                        margin_x_mm=0, margin_y_mm=0)
    # doc_num=2 stamps only the second doc (1-offset, watermark.go:119)
    out = stamp_table(t, "S", doc_num=2, loc=loc)
    texts = out["text"].to_pylist()
    assert "[S]" not in texts[0] and "[S]" in texts[1] and "[S]" not in texts[2]
    # doc_num=-1 = last doc; -99 clamps to the first (watermark.go:125-131)
    assert "[S]" in stamp_table(t, "S", doc_num=-1,
                                loc=loc)["text"].to_pylist()[2]
    assert "[S]" in stamp_table(t, "S", doc_num=-99,
                                loc=loc)["text"].to_pylist()[0]
    # doc_num=0 = every doc
    assert all("[S]" in s for s in
               stamp_table(t, "S", doc_num=0, loc=loc)["text"].to_pylist())
    # non-text columns untouched
    assert out["doc_id"].to_pylist() == [1, 2, 3]


def test_stamp_docs_dataset_stage(ray_session):
    import ray.data as rd

    ds = rd.from_items([{"doc_id": i, "text": f"doc {i}\nbody {i}"}
                        for i in range(10)])
    out = stamp_docs(ds, "PROV", "https://prov.example",
                     loc=StampLocation(position=PagePosition.BOTTOM_LEFT,
                                       margin_x_mm=0, margin_y_mm=0))
    rows = out.take_all()
    assert len(rows) == 10
    assert all("[PROV](https://prov.example)" in r["text"] for r in rows)
