"""Span renderer (S11's evidence artifact, pipelines/render.py): HTML
and ANSI output golden-shape checks over a small built index."""

import shutil

import pytest


@pytest.fixture(scope="module")
def small_index(ray_session, tmp_path_factory):
    from pdfsearch_ray.pipelines.build import build_index
    from pdfsearch_ray.pipelines.query import BM25Index

    d = str(tmp_path_factory.mktemp("render_idx"))
    shutil.rmtree(d, ignore_errors=True)
    build_index("/root/testdata/sf0.001/documents.parquet", d,
                analyzer="en", lang_col="lang", num_buckets=8)
    return BM25Index(d)


def test_render_html_highlights_spans(small_index, tmp_path):
    from pdfsearch_ray.pipelines.render import render_html, render_query_html

    q = "data processing pipeline"
    ms = small_index.search(q, max_results=5, with_spans=True)
    assert ms.matches and ms.matches[0].spans
    page = render_html(q, ms, index=small_index)
    # structure: one result div per match, a <mark> per rendered span,
    # escaped content, scores shown
    assert page.count('<div class="result">') == len(ms.matches)
    assert "<mark>" in page
    assert f"doc <b>{ms.matches[0].doc_id}</b>" in page
    assert f"{ms.matches[0].score:.4f}" in page
    # the highlighted text is really the span text from the doc
    dtbl, has_text = small_index.fetch_doc_meta(
        [ms.matches[0].doc_id], with_text=True)
    assert has_text
    text = dtbl["text"].to_pylist()[0]
    s0 = ms.matches[0].spans[0]
    import html as _h

    assert (f"<mark>{_h.escape(text[s0['start']:s0['end']])}</mark>"
            in page)
    # one-call writer
    out = render_query_html(small_index, q, str(tmp_path / "r.html"),
                            max_results=5)
    assert open(out).read() == page


def test_render_html_escapes(small_index):
    from pdfsearch_ray.pipelines.query import Match, MatchSet
    from pdfsearch_ray.pipelines.render import render_html

    ms = MatchSet(total_matches=1)
    ms.matches.append(Match(doc_id=1, url="http://x/<script>",
                            score=1.0, spans=[{"start": 0, "end": 6,
                                               "score": 1.0}]))
    page = render_html("<q>&", ms, texts={1: "<script>alert(1)</script>"})
    assert "<script>alert" not in page
    assert "&lt;script&gt;" in page


def test_render_ansi(small_index):
    from pdfsearch_ray.pipelines.render import render_ansi

    q = "data processing pipeline"
    ms = small_index.search(q, max_results=3, with_spans=True)
    colored = render_ansi(q, ms, index=small_index)
    plain = render_ansi(q, ms, index=small_index, color=False)
    assert "\x1b[" in colored and "\x1b[" not in plain
    assert f"doc {ms.matches[0].doc_id}" in plain
    # the span text appears verbatim in the plain rendering
    dtbl, _ = small_index.fetch_doc_meta([ms.matches[0].doc_id])
    text = dtbl["text"].to_pylist()[0]
    s0 = ms.matches[0].spans[0]
    assert text[s0["start"]:s0["end"]].replace("\n", " ") in plain


def test_render_empty_result(small_index):
    from pdfsearch_ray.pipelines.render import render_ansi, render_html

    ms = small_index.search("zzxqv unknownterm", max_results=5)
    assert not ms.matches
    page = render_html("zzxqv unknownterm", ms, index=small_index)
    assert page.count('<div class="result">') == 0
    assert "0 total" in page
    assert render_ansi("zzxqv unknownterm", ms,
                       index=small_index).startswith("\x1b[1m")
