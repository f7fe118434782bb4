"""Unit tests for the shared normalizer/stemmer (Normalizer.java /
PorterStemmer.java capability parity — deterministic kernels, SURVEY.md §5)."""

from ontologymatching_spark.functions import textnorm


def test_camel_split():
    assert textnorm.split_camel("TaxIncomeURI") == "Tax Income URI"
    assert textnorm.split_camel("parseHTTPResponse") == "parse HTTP Response"
    assert textnorm.split_camel("already split") == "already split"


def test_normalize_tiers():
    # tier-2: case/underscore insensitive
    assert textnorm.normalize("FooBar") == textnorm.normalize("foo_bar") == "foo bar"
    # tier-3: stem-insensitive
    assert textnorm.normalize("parsers", stem=True) == textnorm.normalize(
        "parser", stem=True
    )
    assert textnorm.normalize("loading", stem=True) == textnorm.normalize(
        "load", stem=True
    )
    # tier-4: digit-insensitive
    assert textnorm.normalize("FooBar2", stem=True, strip_digits=True) == \
        textnorm.normalize("FooBar", stem=True, strip_digits=True)


def test_porter_stem_classics():
    cases = {
        "caresses": "caress",
        "ponies": "poni",
        "cats": "cat",
        "feed": "feed",
        "agreed": "agre",
        "plastered": "plaster",
        "motoring": "motor",
        "sing": "sing",
        "relational": "relat",
        "conditional": "condit",
        "happy": "happi",
    }
    for w, expect in cases.items():
        assert textnorm.porter_stem(w) == expect, w


def test_tokenize_and_shingles():
    assert textnorm.tokenize("parseHTTP_Response") == ["parse", "http", "response"]
    assert textnorm.tokenize("") == []
    assert textnorm.shingles("abcd", 3) == ["abc", "bcd"]
    assert textnorm.shingles("ab", 3) == ["ab"]
    assert textnorm.shingles("", 3) == []
