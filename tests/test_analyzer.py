"""Golden tests pinning the analysis chain (SURVEY §2.2 M5/M6).

The chain (UAX#29-ish tokenize → possessive strip → lowercase → English
stop removal → Porter stem) is the rebuild's contract for the analyzer
the reference configures at internal/doclib/bleve_glue.go:42-61. These
fixtures are the frozen behaviour; change them only deliberately.
"""

from pdfsearch_ray.analysis.analyzer import (
    STOPWORDS_EN,
    analyze_en,
    analyze_en_terms,
    analyze_simple,
)
from pdfsearch_ray.analysis.porter import stem

# Classic Porter test vectors from the published algorithm description.
PORTER_VECTORS = {
    "caresses": "caress",
    "ponies": "poni",
    "ties": "ti",
    "caress": "caress",
    "cats": "cat",
    "feed": "feed",
    "agreed": "agre",
    "plastered": "plaster",
    "bled": "bled",
    "motoring": "motor",
    "sing": "sing",
    "conflated": "conflat",
    "troubled": "troubl",
    "sized": "size",
    "hopping": "hop",
    "tanned": "tan",
    "falling": "fall",
    "hissing": "hiss",
    "fizzed": "fizz",
    "failing": "fail",
    "filing": "file",
    "happy": "happi",
    "sky": "sky",
    "relational": "relat",
    "conditional": "condit",
    "rational": "ration",
    "valenci": "valenc",
    "hesitanci": "hesit",
    "digitizer": "digit",
    "conformabli": "conform",
    "radicalli": "radic",
    "differentli": "differ",
    "vileli": "vile",
    "analogousli": "analog",
    "vietnamization": "vietnam",
    "predication": "predic",
    "operator": "oper",
    "feudalism": "feudal",
    "decisiveness": "decis",
    "hopefulness": "hope",
    "callousness": "callous",
    "formaliti": "formal",
    "sensitiviti": "sensit",
    "sensibiliti": "sensibl",
    "triplicate": "triplic",
    "formative": "form",
    "formalize": "formal",
    "electriciti": "electr",
    "electrical": "electr",
    "hopeful": "hope",
    "goodness": "good",
    "revival": "reviv",
    "allowance": "allow",
    "inference": "infer",
    "airliner": "airlin",
    "gyroscopic": "gyroscop",
    "adjustable": "adjust",
    "defensible": "defens",
    "irritant": "irrit",
    "replacement": "replac",
    "adjustment": "adjust",
    "dependent": "depend",
    "adoption": "adopt",
    "homologou": "homolog",
    "communism": "commun",
    "activate": "activ",
    "angulariti": "angular",
    "homologous": "homolog",
    "effective": "effect",
    "bowdlerize": "bowdler",
    "probate": "probat",
    "rate": "rate",
    "cease": "ceas",
    "controll": "control",
    "roll": "roll",
}


def test_porter_vectors():
    for word, expected in PORTER_VECTORS.items():
        assert stem(word) == expected, f"{word} -> {stem(word)} != {expected}"


def test_en_chain_golden():
    text = "The quick brown foxes jumped over the lazy dog's back."
    toks = analyze_en(text)
    # the/over/the are stopwords; positions survive removal (bleve semantics)
    assert [(t.term, t.position) for t in toks] == [
        ("quick", 2),
        ("brown", 3),
        ("fox", 4),
        ("jump", 5),
        ("lazi", 8),
        ("dog", 9),
        ("back", 10),
    ]
    # offsets point into the original text, pre-possessive-strip
    dog = toks[5]
    assert text[dog.start : dog.end] == "dog's"


def test_en_possessive_and_case():
    assert analyze_en_terms("The WORLD'S fastest engine") == [
        "world", "fastest", "engin",
    ]
    assert analyze_en_terms("it’s Mary’s") == ["mari"]  # it's is a stopword


def test_en_numbers_and_unicode():
    assert analyze_en_terms("ship 3.14 tons in 2,000 crates") == [
        "ship", "3.14", "ton", "2,000", "crate",
    ]
    assert analyze_en_terms("café naïve") == ["café", "naïv"]


def test_en_stopword_only_query():
    assert analyze_en_terms("the and of to was") == []


def test_en_empty():
    assert analyze_en("") == []


def test_simple_matches_duckdb_expression():
    import duckdb

    texts = [
        "Hello, World's fun 123",
        "a b   c--d",
        "",
        "UPPER lower 3.14",
    ]
    for text in texts:
        sql = duckdb.sql(
            "select list_filter(regexp_split_to_array(lower(?), '[^a-z0-9]+'), x -> x <> '')",
            params=[text],
        ).fetchone()[0]
        assert analyze_simple(text) == sql, text


def test_stopwords_are_lowercase():
    assert all(w == w.lower() for w in STOPWORDS_EN)


def test_analyze_en_pos_equivalent():
    """The fast index-path chain must match the full chain exactly on
    terms and positions, including possessives, stopwords and unicode
    apostrophes."""
    from pdfsearch_ray.analysis.analyzer import (
        analyze_en,
        analyze_en_pos,
        analyze_en_terms,
    )

    cases = [
        "The World's fastest engine, isn't it? Don't stop.",
        "résumé naïve café's owner—paid 3.14 dollars, v1.2.3 release",
        "IT'S A TEST'S POSSESSIVE’S CASE’s",
        "", "   ", "the and of", "word",
        "a'b'c x''y o’clock jack-o'-lantern",
    ]
    for text in cases:
        full = [(t.term, t.position) for t in analyze_en(text)]
        assert analyze_en_pos(text) == full, text
        assert analyze_en_terms(text) == [t for t, _ in full], text
