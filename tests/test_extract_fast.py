"""The fast-subset HTML scanner must be byte-identical to the
HTMLParser reference path whenever it claims success (returns non-None);
anything outside its subset must fall back.  Fuzzed over the fixture
generator's output space, structured variants, and adversarial tag
soup."""

import numpy as np

from pdfsearch_ray.stages.extract import (
    _extract_text_fast,
    _TextExtractor,
    extract_text,
)


def _reference(s: str) -> str:
    p = _TextExtractor()
    p.feed(s)
    p.close()
    return p.text()


def _check(s: str):
    fast = _extract_text_fast(s)
    if fast is not None:
        assert fast == _reference(s), repr(s)
    # the public entry point always equals the reference on parseable
    # input (fast path or fallback)
    assert extract_text(s.encode()) == _reference(s), repr(s)


def test_fixture_corpus_is_fast_path():
    from pdfsearch_ray.fixtures.gen import make_text, text_to_html

    for i in range(300):
        text = make_text(i, doc_len_words=80)
        html = text_to_html(text).decode()
        fast = _extract_text_fast(html)
        assert fast is not None, "fixture html left the fast subset"
        assert fast == _reference(html) == text


def test_structured_variants():
    cases = [
        "",
        "plain text no tags",
        "<html><body><p>a</p><p>b</p></body></html>",
        "<P>upper<BR>case</P>",
        "<p>a<b>bold</b>c</p>",
        "<p>AT&amp;T</p>",
        "<p>AT&amp</p><p>;T</p>",         # entity resolves per segment
        "<p>x&nbsp;y</p>",
        "<p>bare & amp</p>",
        "<ul><li>one</li><li>two</li></ul>",
        "<noscript><p>shown?</p></noscript>after",
        "<noscript/>tail must survive",          # self-closing skip tag
        "<noscript />tail must survive too",
        "a<noscript/>b<noscript>hidden</noscript>c",
        "<p>line1<br/>line2</p>",
        "<br />spaced self-close",
        "<p/>empty block",
        "<p />spaced empty block",
        "<p class=x>unquoted attr</p>",
        "<h1>t</h1><pre>pre\ntext</pre>",
        "no close <p",
        "<p>trailing",
        "tag <notarealtag> passes</notarealtag> through",
    ]
    for s in cases:
        _check(s)


def test_fallback_cases_delegate():
    # all of these leave the simple subset; extract_text must still
    # exactly match the reference via fallback
    cases = [
        "<!-- comment --><p>a</p>",
        "<!doctype html><p>a</p>",
        "<script>if (a<b) { x(); }</script><p>after</p>",
        "<style>p > a { color: red }</style><p>after</p>",
        '<p title="a>b">quoted gt</p>',
        "<p title='a>b'>quoted gt</p>",
        "<p/ >odd slash",
        "<a href=/x>slash value</a>",
        "<3 not a tag",
        "<?php echo ?><p>a</p>",
    ]
    for s in cases:
        assert _extract_text_fast(s) is None or \
            _extract_text_fast(s) == _reference(s), repr(s)
        _check(s)


def test_fuzz_tag_soup():
    """Random soup from a grammar-ish alphabet: wherever the fast path
    claims success it must equal the reference."""
    rng = np.random.RandomState(42)
    atoms = ["<p>", "</p>", "<div >", "</div>", "<br>", "<br/>", "text ",
             "&amp;", "&amp", ";", "&", "<b>", "</b>", "<", ">", "words",
             "<title>", "</title>", "<li x=1>", "\n", "<P>", "</P >",
             "<noscript>", "</noscript>", "<noscript/>", "<noscript />",
             "<span>", "&#65;", "&unknown;",
             "<em/>", "e=mc2 ", "</ p>", "<p a=1 b=2>", "100<200 "]
    n_fast = 0
    for _ in range(600):
        k = rng.randint(1, 14)
        s = "".join(atoms[i] for i in rng.randint(0, len(atoms), k))
        fast = _extract_text_fast(s)
        if fast is not None:
            n_fast += 1
            assert fast == _reference(s), repr(s)
    assert n_fast > 100  # the fast path actually fires on most soup
