"""Deterministic synthetic pages corpus (FIXTURES.md §1).

Mirrors the reference's test-corpus design
(internal/doclib/bleve_mem_test.go:64-100,142-150): fixed word list, the
arithmetic ``i0 = (i0 + 17) * 47`` phrase generator, planted query
phrases in rows with ``i % 3 != 2``, plus deterministic edge rows
(empty text, duplicate html under a different url, very long doc,
unicode/possessive text).

``text`` is the ground-truth extraction target: ``html`` is built by
wrapping the text's lines so that stages/extract.py reproduces ``text``
byte-identically per url (input_hint invariant).  All generation is
seed-free arithmetic — same inputs, same bytes, any machine.
"""

from __future__ import annotations

import html as _html

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..schemas import PAGES

# Fixed vocabulary paragraph (allText/makeWords analog, bleve_mem_test.go:152-225)
_ALL_TEXT = """
be the person who you want to meet search for the truth in the data and
the data will set you free a fast index finds every phrase quickly while
a slow scan reads each page again results should rank by score and ties
break by document order the quick brown fox jumps over the lazy dog
engineers measure throughput in documents per second and latency in
milliseconds shuffle stages move blocks between workers while map stages
stay local compression trades cpu for bytes and caching trades memory for
time correctness comes first performance comes second but both must ship
"""

WORDS = _ALL_TEXT.split()

# Planted phrases (the searchable ground truth, bleve_mem_test.go:17-24 style)
PLANTED_PHRASES = [
    "be the person who",
    "set you free",
    "quick brown fox",
    "documents per second",
]

QUERY_SET = PLANTED_PHRASES + [
    "index finds every phrase",
    "correctness comes first",
    "the and of to",        # stopword-only
    "zzxqv unknownterm",    # out-of-vocabulary, 0 hits
    "The Person's search",  # case/possessive variant
]


def phrase(i: int, n: int) -> str:
    """The reference's arithmetic phrase generator
    (bleve_mem_test.go:142-150): i0 = (i0+17)*47, modular word indexing."""
    words = []
    i0 = i
    for _ in range(n):
        i0 = (i0 + 17) * 47
        words.append(WORDS[i0 % len(WORDS)])
    return " ".join(words)


_LONG_DOC_IDX = 7          # ~100k chars (largest docLen at bleve_mem_test.go:24)
_EMPTY_DOC_STRIDE = 97     # rows i % 97 == 95 have empty text
_DUP_DOC_STRIDE = 101      # rows i % 101 == 100 duplicate row i-1's content
_UNICODE_DOC_IDX = 13


def make_text(i: int, doc_len_words: int) -> str:
    """Deterministic document body; planted phrase embedded when i%3 != 2
    (bleve_mem_test.go:74-79)."""
    if i % _EMPTY_DOC_STRIDE == 95:
        return ""
    if i == _UNICODE_DOC_IDX:
        return (
            "The Person's café results — naïve engineers' throughput.\n"
            + phrase(i, doc_len_words)
        )
    lines = []
    n_lines = max(1, doc_len_words // 12)
    for ln in range(n_lines):
        lines.append(phrase(i * 1000 + ln, 12))
    if i % 3 != 2:
        planted = PLANTED_PHRASES[i % len(PLANTED_PHRASES)]
        lines.insert(len(lines) // 2, planted)
    if i == _LONG_DOC_IDX:
        while sum(len(x) + 1 for x in lines) < 100_000:
            lines.append(phrase(i * 7919 + len(lines), 12))
    return "\n".join(lines)


def text_to_html(text: str) -> bytes:
    """Wrap text as minimal deterministic HTML: first line becomes the
    <title>, each remaining line a <p>; stages/extract.py inverts this
    exactly."""
    lines = text.split("\n") if text else []
    title = lines[0] if lines else ""
    body = "".join(f"<p>{_html.escape(ln)}</p>" for ln in lines[1:])
    doc = (
        f"<html><head><title>{_html.escape(title)}</title></head>"
        f"<body>{body}</body></html>"
    )
    return doc.encode("utf-8")


_LANGS = ["en"] * 19 + ["de", "fr", ""]  # deterministic ~14% minority


def generate_pages(n_rows: int, doc_len_words: int = 60) -> pa.Table:
    urls, tss, htmls, texts, langs = [], [], [], [], []
    prev_text = ""
    for i in range(n_rows):
        site = (i * 31) % 1000
        url = f"https://site{site:04d}.example/page/{i:06d}"
        if i % _DUP_DOC_STRIDE == 100 and prev_text:
            text = prev_text  # exact duplicate content under a different url
        else:
            body = make_text(i, doc_len_words)
            text = f"page {i}\n{body}" if body else ""
        html = text_to_html(text)
        urls.append(url)
        tss.append(1_500_000_000_000_000 + i * 1_000_003)  # epoch-us + f(i)
        htmls.append(html)
        texts.append(text)
        langs.append(_LANGS[i % len(_LANGS)])
        prev_text = text
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "warc_ts": pa.array(np.array(tss, dtype="int64"), type=pa.timestamp("us")),
            "html": pa.array(htmls, type=pa.binary()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(langs, type=pa.string()),
        }
    ).cast(PAGES)


def write_pages(path: str, n_rows: int, doc_len_words: int = 60,
                rows_per_file: int = 5000, row_group_size: int = 1000) -> list[str]:
    """Write the corpus as multiple parquet files (the multi-fragment input
    the extract stage partitions over).  Returns file paths."""
    import os

    os.makedirs(path, exist_ok=True)
    full = generate_pages(n_rows, doc_len_words)
    paths = []
    for start in range(0, n_rows, rows_per_file):
        cnt = min(rows_per_file, n_rows - start)
        p = os.path.join(path, f"pages-{start:08d}.parquet")
        pq.write_table(full.slice(start, cnt), p, row_group_size=row_group_size)
        paths.append(p)
    return paths
