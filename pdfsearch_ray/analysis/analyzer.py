"""Analysis chains (tokenize → normalize) for the fulltext engine.

Two chains:

* ``en`` — the product default, mirroring the chain the reference
  configures on its single indexed field (reference:
  /root/reference/internal/doclib/bleve_glue.go:42-61 — bleve's "en"
  analyzer: UAX#29 word tokenization → English possessive strip →
  lowercase → English stopword removal → Porter stemming).  Token
  *positions* are assigned on the pre-stop-removal stream and survive
  stopword deletion, matching bleve's position semantics — phrase
  assembly (search_pdfs.go:382-484 semantics) depends on this.

* ``simple`` — lowercase + split on ``[^a-z0-9]+``.  Exists so that the
  DuckDB correctness oracle can reproduce tokenization exactly
  (``regexp_split_to_array(lower(text), '[^a-z0-9]+')``); no stopwords,
  no stemming.

Both are deterministic, versioned (ANALYZER_VERSION) and pure-Python
with compiled regexes; per-batch entry points aggregate to
(term, tf, positions, dl) per document so the tuple explosion is
combined before it ever reaches the shuffle.
"""

from __future__ import annotations

import re
from typing import NamedTuple

from .porter import stem

ANALYZER_VERSION = "en-porter-v1"

# UAX#29-approximating word pattern: runs of word chars, apostrophes kept
# word-internal (so "world's" is ONE token, as the unicode segmenter the
# reference depends on produces), digits with internal ./, kept together.
_TOKEN_RE = re.compile(r"\d+(?:[.,]\d+)*|\w+(?:['’]\w+)*", re.UNICODE)

_POSSESSIVE_RE = re.compile(r"['’][sS]$")

# English stopword list: the Snowball list bleve's stop_en token filter
# ships (public; bleve v0.8.1 analysis/lang/en).
STOPWORDS_EN = frozenset("""
i me my myself we our ours ourselves you your yours yourself yourselves he
him his himself she her hers herself it its itself they them their theirs
themselves what which who whom this that these those am is are was were be
been being have has had having do does did doing would should could ought
i'm you're he's she's it's we're they're i've you've we've they've i'd
you'd he'd she'd we'd they'd i'll you'll he'll she'll we'll they'll isn't
aren't wasn't weren't hasn't haven't hadn't doesn't don't didn't won't
wouldn't shan't shouldn't can't cannot couldn't mustn't let's that's who's
what's here's there's when's where's why's how's a an the and but if or
because as until while of at by for with about against between into
through during before after above below to from up down in out on off
over under again further then once here there when where why how all any
both each few more most other some such no nor not only own same so than
too very
""".split())


class Token(NamedTuple):
    term: str
    position: int  # 1-based, assigned pre-stop-removal (bleve semantics)
    start: int     # char offset into the analyzed text
    end: int       # char offset (exclusive)


def analyze_en(text: str) -> list[Token]:
    """Full `en` chain with positions/offsets. One call per document."""
    out: list[Token] = []
    pos = 0
    for m in _TOKEN_RE.finditer(text):
        pos += 1
        tok = m.group()
        tok = _POSSESSIVE_RE.sub("", tok)
        tok = tok.lower()
        if tok in STOPWORDS_EN:
            continue
        out.append(Token(stem(tok), pos, m.start(), m.end()))
    return out


# Raw-token → final-term memo for the hot paths: one dict hit replaces
# lower + possessive strip + stopword check + stem.  None marks a
# stopword.  Natural-language token streams are Zipfian, so the hit rate
# is ~1; the cap bounds worker memory against adversarial text.
_RAW_TERM_CACHE: dict[str, str | None] = {}
_RAW_TERM_CACHE_MAX = 1 << 20
_MISSING = object()


def _final_term(raw: str):
    tok = raw.lower()
    if tok.endswith("'s") or tok.endswith("’s"):
        tok = tok[:-2]
    if tok in STOPWORDS_EN:
        term = None
    else:
        term = stem(tok)
    if len(_RAW_TERM_CACHE) < _RAW_TERM_CACHE_MAX:
        _RAW_TERM_CACHE[raw] = term
    return term


def analyze_en_pos(text: str) -> list[tuple[str, int]]:
    """`en` chain, (term, position) only — the indexing hot path.

    Semantically identical to ``[(t.term, t.position) for t in
    analyze_en(text)]`` (equivalence is unit-tested) but several times
    faster: findall instead of Match objects, no char offsets, and a
    raw-token memo collapsing the whole normalize chain to a dict hit.
    Offsets are only needed at hydration time for the top-k docs, never
    for the corpus-wide tokenize."""
    out: list[tuple[str, int]] = []
    cache_get = _RAW_TERM_CACHE.get
    append = out.append
    for pos, raw in enumerate(_TOKEN_RE.findall(text), 1):
        term = cache_get(raw, _MISSING)
        if term is _MISSING:
            term = _final_term(raw)
        if term is not None:
            append((term, pos))
    return out


def analyze_en_terms(text: str) -> list[str]:
    """`en` chain, terms only (stats/query-side helper)."""
    out: list[str] = []
    cache_get = _RAW_TERM_CACHE.get
    append = out.append
    for raw in _TOKEN_RE.findall(text):
        term = cache_get(raw, _MISSING)
        if term is _MISSING:
            term = _final_term(raw)
        if term is not None:
            append(term)
    return out


_SIMPLE_SPLIT_RE = re.compile(r"[^a-z0-9]+")


def analyze_simple(text: str) -> list[str]:
    """lowercase + split on [^a-z0-9]+, matching the DuckDB oracle expression
    ``unnest(regexp_split_to_array(lower(text), '[^a-z0-9]+'))`` with empty
    strings removed."""
    return [t for t in _SIMPLE_SPLIT_RE.split(text.lower()) if t]


def get_analyzer(name: str):
    if name == "en":
        return analyze_en_terms
    if name == "simple":
        return analyze_simple
    raise ValueError(f"unknown analyzer {name!r}")
