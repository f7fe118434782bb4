"""Deterministic unit tests per scalar kernel (SURVEY.md §5 takeaway)."""

import pytest

from ontologymatching_spark.functions import simkernels as K


def test_levenshtein_dist():
    assert K.levenshtein_dist("kitten", "sitting") == 3
    assert K.levenshtein_dist("", "abc") == 3
    assert K.levenshtein_dist("abc", "abc") == 0


def test_lev_min_norm_semantics():
    # normalizes by the SHORTER string (LevenshteinEditDistance.java:17-53)
    assert K.levenshtein_min_norm("ab", "abcdef") == 1.0 - 4 / 2 * 0 - min(4, 2) / 2
    # dist("ab","abcdef")=4, len_min=2 → 1 - min(4,2)/2 = 0
    assert K.levenshtein_min_norm("ab", "abcdef") == 0.0
    assert K.levenshtein_min_norm("abc", "abd") == 1.0 - 1 / 3
    assert K.levenshtein_min_norm("", "") == 1.0
    assert K.levenshtein_min_norm("", "x") == 0.0
    assert K.levenshtein_min_norm("same", "same") == 1.0


def test_substring_sim():
    assert K.substring_sim("x", "x") <= 1.0  # below min_len → prefix bonus only
    assert K.substring_sim("abcdef", "abcdef") == 1.0
    assert K.substring_sim("", "") == 1.0
    assert K.substring_sim("abc", "") == 0.0
    # shared long substring scores high
    assert K.substring_sim("parseTable", "parseTables") > 0.9
    # disjoint strings score 0
    assert K.substring_sim("aaaa", "bbbb") == 0.0


def test_amsub_sim_semantics():
    # identity with a >=3 substring → exactly 1.0 (commonality 1, frag 0)
    assert K.amsub_sim("abcdef", "abcdef") == 1.0
    assert K.amsub_sim("", "") == 1.0
    assert K.amsub_sim("abc", "") == 0.0
    # reference quirk preserved: 1-2 char identical strings peel an
    # uncounted short substring → score 0 (ISub's identity shortcut says 1)
    assert K.amsub_sim("ab", "ab") == 0.0
    assert K.substring_sim("ab", "ab") == 1.0
    # fragmentation penalty: two >=3 peels cost (n_subs-1)/min_len
    # "abcxdefy" vs "abcdef": common=6 → 12/14; frag = 1/6; no residual prefix
    assert K.amsub_sim("abcxdefy", "abcdef") == pytest.approx(12 / 14 - 1 / 6)


def test_amsub_diverges_from_isub():
    """AMSub and ISub are distinct metrics (AMSubstringSim.java vs
    ISubSim.java) — a divergence corpus where they must not agree."""
    corpus = [
        ("ab", "ab"),                # identity shortcut vs uncounted peel
        ("abcxdefy", "abcdef"),      # fragmentation penalty vs u1*u2 diff
        ("parseTable", "parseTables"),
        ("loadSortRead", "readSortLoad"),
    ]
    diverged = sum(
        1 for a, b in corpus
        if abs(K.amsub_sim(a, b) - K.substring_sim(a, b)) > 1e-9
    )
    assert diverged >= 3


def test_amsub_edit_blend():
    s = K.amsub_edit("handleRequest", "handleReqest")
    assert 0.7 < s <= 1.0
    # blend wired to the AMSub kernel (not ISub)
    assert K.amsub_edit("x", "x") == pytest.approx(
        0.65 * K.amsub_sim("x", "x") + 0.35 * 1.0
    )
    assert K.amsub_edit("x", "x") == pytest.approx(0.35)


def test_jaro_winkler():
    assert K.jaro_winkler("MARTHA", "MARHTA") == pytest.approx(0.9611, abs=1e-3)
    assert K.jaro_winkler("abc", "abc") == 1.0
    assert K.jaro_winkler("", "") == 1.0
    assert K.jaro_winkler("abc", "xyz") == 0.0


def test_token_sets():
    assert K.token_jaccard(["a", "b"], ["b", "c"]) == pytest.approx(1 / 3)
    assert K.token_dice(["a", "b"], ["b", "c"]) == pytest.approx(0.5)
    assert K.token_jaccard([], []) == 1.0


def test_sims_bounded():
    pairs = [("parse_table", "ParseTable2"), ("a", "zzzz"), ("", "x"),
             ("LoadReadSort", "load_read_sort")]
    for a, b in pairs:
        for fn in (K.levenshtein_min_norm, K.substring_sim, K.amsub_edit,
                   K.jaro_winkler):
            v = fn(a, b)
            assert 0.0 <= v <= 1.0, (fn.__name__, a, b, v)
