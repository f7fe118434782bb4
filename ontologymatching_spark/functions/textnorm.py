"""Pure-Python text normalization shared by the Spark kernels (pandas UDFs)
and the single-node oracle, so tokenization is bit-identical on both sides.

Capability parity with the reference's normalizer
(`StringUtil/Normalizer.java:29-110`: lowercase, camelCase split, punctuation/
digit strip, stopword removal, Porter stem) and `StringUtil/PorterStemmer.java`.
The stemmer below is implemented from Porter's published 1980 algorithm
("An algorithm for suffix stripping"), not from the reference source.
"""

from __future__ import annotations

import re

_CAMEL_1 = re.compile(r"([a-z0-9])([A-Z])")
_CAMEL_2 = re.compile(r"([A-Z]+)([A-Z][a-z])")
_NON_ALNUM = re.compile(r"[^a-z0-9]+")
_DIGITS = re.compile(r"[0-9]+")
_WS = re.compile(r"\s+")

# Small stopword list mirroring the normalizer's "remove all stop words"
# option (NormalizerParameter.java:7-17). Kept tiny and code-oriented.
STOPWORDS = frozenset(
    "a an and are as at be by for from has in is it of on or the to with".split()
)


def split_camel(s: str) -> str:
    """``TaxIncomeURI`` → ``Tax Income URI`` → handled before lowercasing."""
    s = _CAMEL_2.sub(r"\1 \2", s)
    s = _CAMEL_1.sub(r"\1 \2", s)
    return s


def normalize(s: str, *, stem: bool = False, strip_digits: bool = False,
              remove_stopwords: bool = False) -> str:
    """Tiered normalization; tiers map to the BSM cascade
    (BaseSimilarityMatcher.java:292-355):

      tier2 = normalize(s)                       → sim 0.95 on equality
      tier3 = normalize(s, stem=True)            → sim 0.90
      tier4 = normalize(s, stem=True, strip_digits=True) → sim 0.80
    """
    if s is None:
        return ""
    s = split_camel(s)
    s = s.lower()
    if strip_digits:
        s = _DIGITS.sub(" ", s)
    s = _NON_ALNUM.sub(" ", s)
    toks = [t for t in s.split() if t]
    if remove_stopwords:
        toks = [t for t in toks if t not in STOPWORDS]
    if stem:
        toks = [porter_stem(t) for t in toks]
    return " ".join(toks)


def tokenize(s: str) -> list[str]:
    """Canonical tokenizer for TF-IDF / Jaccard (VMM semantics,
    MultiWordsMatcher.java:190). Must match the SQL-side
    ``split(normalized, ' ')`` exactly: normalize then split on single space."""
    n = normalize(s)
    return n.split(" ") if n else []


def shingles(s: str, q: int = 3) -> list[str]:
    """Character q-grams over the raw lowercased string (QGramSim semantics,
    similarity/QGramSim.java:9-15 — token tri-gram dice)."""
    s = (s or "").lower()
    if len(s) < q:
        return [s] if s else []
    return [s[i : i + q] for i in range(len(s) - q + 1)]


# ---------------------------------------------------------------------------
# Porter stemmer (Porter 1980). Standard algorithm, vowel/consonant measure
# based. Deliberately self-contained — no external deps.
# ---------------------------------------------------------------------------

_VOWELS = "aeiou"


def _is_cons(word: str, i: int) -> bool:
    c = word[i]
    if c in _VOWELS:
        return False
    if c == "y":
        return i == 0 or not _is_cons(word, i - 1)
    return True


def _measure(stem: str) -> int:
    """Number of VC sequences in the stem."""
    m = 0
    prev_vowel = False
    for i in range(len(stem)):
        cons = _is_cons(stem, i)
        if cons and prev_vowel:
            m += 1
        prev_vowel = not cons
    return m


def _has_vowel(stem: str) -> bool:
    return any(not _is_cons(stem, i) for i in range(len(stem)))


def _ends_double_cons(word: str) -> bool:
    return (
        len(word) >= 2
        and word[-1] == word[-2]
        and _is_cons(word, len(word) - 1)
    )


def _cvc(word: str) -> bool:
    if len(word) < 3:
        return False
    if not (
        _is_cons(word, len(word) - 3)
        and not _is_cons(word, len(word) - 2)
        and _is_cons(word, len(word) - 1)
    ):
        return False
    return word[-1] not in "wxy"


def porter_stem(word: str) -> str:  # noqa: C901 — the algorithm is one unit
    if len(word) <= 2:
        return word
    w = word

    # Step 1a
    if w.endswith("sses"):
        w = w[:-2]
    elif w.endswith("ies"):
        w = w[:-2]
    elif w.endswith("ss"):
        pass
    elif w.endswith("s"):
        w = w[:-1]

    # Step 1b
    flag_1b = False
    if w.endswith("eed"):
        if _measure(w[:-3]) > 0:
            w = w[:-1]
    elif w.endswith("ed") and _has_vowel(w[:-2]):
        w = w[:-2]
        flag_1b = True
    elif w.endswith("ing") and _has_vowel(w[:-3]):
        w = w[:-3]
        flag_1b = True
    if flag_1b:
        if w.endswith(("at", "bl", "iz")):
            w += "e"
        elif _ends_double_cons(w) and not w.endswith(("l", "s", "z")):
            w = w[:-1]
        elif _measure(w) == 1 and _cvc(w):
            w += "e"

    # Step 1c
    if w.endswith("y") and _has_vowel(w[:-1]):
        w = w[:-1] + "i"

    # Step 2
    step2 = [
        ("ational", "ate"), ("tional", "tion"), ("enci", "ence"), ("anci", "ance"),
        ("izer", "ize"), ("abli", "able"), ("alli", "al"), ("entli", "ent"),
        ("eli", "e"), ("ousli", "ous"), ("ization", "ize"), ("ation", "ate"),
        ("ator", "ate"), ("alism", "al"), ("iveness", "ive"), ("fulness", "ful"),
        ("ousness", "ous"), ("aliti", "al"), ("iviti", "ive"), ("biliti", "ble"),
    ]
    for suf, rep in step2:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 3
    step3 = [
        ("icate", "ic"), ("ative", ""), ("alize", "al"), ("iciti", "ic"),
        ("ical", "ic"), ("ful", ""), ("ness", ""),
    ]
    for suf, rep in step3:
        if w.endswith(suf):
            if _measure(w[: -len(suf)]) > 0:
                w = w[: -len(suf)] + rep
            break

    # Step 4
    step4 = [
        "al", "ance", "ence", "er", "ic", "able", "ible", "ant", "ement",
        "ment", "ent", "ou", "ism", "ate", "iti", "ous", "ive", "ize",
    ]
    for suf in step4:
        if w.endswith(suf):
            stem = w[: -len(suf)]
            if suf == "ent" and w.endswith("ion"):
                pass
            if _measure(stem) > 1:
                if suf == "ou" and not (stem.endswith("s") or stem.endswith("t")):
                    # "ion" only after s/t — handled via the ou/ion special case
                    pass
                w = stem
            break
    else:
        if w.endswith("ion") and len(w) > 3 and w[-4] in "st" and _measure(w[:-3]) > 1:
            w = w[:-3]

    # Step 5a
    if w.endswith("e"):
        stem = w[:-1]
        m = _measure(stem)
        if m > 1 or (m == 1 and not _cvc(stem)):
            w = stem
    # Step 5b
    if _measure(w) > 1 and _ends_double_cons(w) and w.endswith("l"):
        w = w[:-1]

    return w
