"""Pure-Python string-similarity kernels.

These are the scalar kernels behind the reference's ``StringSimilarityMeasure``
registry (`StringUtil/StringMetrics.java:22-31`):

  - normalized Levenshtein with *min-length* normalization
    (`similarity/LevenshteinEditDistance.java:17-53` — duke-derived:
    ``1 - min(dist, len_min)/len_min``)
  - substring/ISub-style commonality metric
    (`similarity/AMSubstringSim.java:14-107`, `similarity/ISubSim.java:10-140`;
    implemented here from the published Stoilos et al. 2005 ISub description,
    not from the reference source)
  - the OAEI default blend AMSUB_AND_EDIT = 0.65*substring + 0.35*levenshtein
    (`similarity/AMSubEditSim.java:7-18`)
  - Jaro-Winkler (`similarity/JaroWinklerSim.java`; standard public algorithm)
  - token-set Jaccard / Dice (`multiWords/MultiWordsMatcher.java:453-467`)

They are used in two places with bit-identical results: (a) inside vectorized
pandas UDFs on executors, (b) inside the single-node oracle that plays the role
of the reference matcher for P/R scoring.
"""

from __future__ import annotations


def levenshtein_dist(s1: str, s2: str) -> int:
    """Classic DP edit distance (two-row)."""
    if s1 == s2:
        return 0
    l1, l2 = len(s1), len(s2)
    if l1 == 0:
        return l2
    if l2 == 0:
        return l1
    if l1 > l2:
        s1, s2, l1, l2 = s2, s1, l2, l1
    prev = list(range(l1 + 1))
    cur = [0] * (l1 + 1)
    for j in range(1, l2 + 1):
        cur[0] = j
        c2 = s2[j - 1]
        for i in range(1, l1 + 1):
            cost = 0 if s1[i - 1] == c2 else 1
            cur[i] = min(prev[i] + 1, cur[i - 1] + 1, prev[i - 1] + cost)
        prev, cur = cur, prev
    return prev[l1]


def levenshtein_min_norm(s1: str, s2: str) -> float:
    """``1 - min(dist, len_min)/len_min`` — NOTE: normalizes by the *shorter*
    string, per LevenshteinEditDistance.java:17-53. Empty-vs-empty → 1.0,
    empty-vs-nonempty → 0.0."""
    s1, s2 = s1 or "", s2 or ""
    len_min = min(len(s1), len(s2))
    if len_min == 0:
        return 1.0 if len(s1) == len(s2) else 0.0
    d = levenshtein_dist(s1, s2)
    return 1.0 - min(d, len_min) / len_min


def _longest_common_substring(s1: str, s2: str) -> tuple[int, int, int]:
    """(length, start1, start2) of the longest common substring."""
    if not s1 or not s2:
        return 0, -1, -1
    best, b1, b2 = 0, -1, -1
    prev = [0] * (len(s2) + 1)
    for i in range(1, len(s1) + 1):
        cur = [0] * (len(s2) + 1)
        c1 = s1[i - 1]
        for j in range(1, len(s2) + 1):
            if c1 == s2[j - 1]:
                cur[j] = prev[j - 1] + 1
                if cur[j] > best:
                    best = cur[j]
                    b1, b2 = i - best, j - best
        prev = cur
    return best, b1, b2


def substring_sim(s1: str, s2: str, min_len: int = 2, p: float = 0.6) -> float:
    """ISub-style metric (Stoilos et al. 2005): iteratively peel the longest
    common substring (length >= min_len), then

        comm    = 2 * matched / (len1 + len2)
        diff    = (u1 * u2) / (p + (1-p) * (u1 + u2 - u1*u2))
        winkler = common-prefix bonus (Winkler, up to 4 chars, scale 0.1)
        sim     = clamp01(comm - diff + winkler)

    Result clamped into [0, 1] (the reference clamps too — similarities are
    always in [0,1], Mapping.java:27-64)."""
    s1, s2 = s1 or "", s2 or ""
    if s1 == s2:
        return 1.0  # identity shortcut (min_len=2 would score 1-char pairs 0)
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0.0

    # Winkler prefix bonus on the originals.
    prefix = 0
    for a, b in zip(s1, s2):
        if a != b or prefix >= 4:
            break
        prefix += 1

    t1, t2 = s1, s2
    matched = 0
    while True:
        n, i1, i2 = _longest_common_substring(t1, t2)
        if n < min_len:
            break
        matched += n
        t1 = t1[:i1] + t1[i1 + n :]
        t2 = t2[:i2] + t2[i2 + n :]
    comm = 2.0 * matched / (l1 + l2)
    u1 = (l1 - matched) / l1
    u2 = (l2 - matched) / l2
    denom = p + (1 - p) * (u1 + u2 - u1 * u2)
    diff = (u1 * u2 / denom) if denom > 0 else 0.0
    sim = comm - diff + prefix * 0.1 * (1.0 - comm)
    return max(0.0, min(1.0, sim))


def amsub_sim(s1: str, s2: str) -> float:
    """AMSubstring metric (`similarity/AMSubstringSim.java:14-107` — distinct
    from ISub; re-implemented from its documented formula, not the source):

        commonality  = 2 * matched / (len1 + len2), counting only peeled
                       common substrings of length >= 3
        fragmentation = (n_substrings - 1) / min(len1, len2),
                       subtracted only when positive
        winkler      = prefix bonus (cap 4, scale 0.1) computed on the
                       *residual* strings left after peeling — NOT the
                       originals (observed reference behavior)
        sim          = commonality - fragmentation + winkler

    Quirks preserved: a final common substring of length 1-2 is peeled from
    the residuals (affecting the Winkler term) but never counted, and
    identical 2-char strings score 0.0 (no >=3 substring, empty residuals).
    Deviation: empty-vs-empty → 1.0 / empty-vs-nonempty → 0.0 instead of the
    reference's 0/0 NaN."""
    s1, s2 = s1 or "", s2 or ""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 1.0 if l1 == l2 else 0.0

    t1, t2 = s1, s2
    matched = 0
    n_subs = 0
    while t1 and t2:
        n, i1, i2 = _longest_common_substring(t1, t2)
        if n == 0:
            break
        t1 = t1[:i1] + t1[i1 + n :]
        t2 = t2[:i2] + t2[i2 + n :]
        if n > 2:
            matched += n
            n_subs += 1
        else:
            break  # short match is peeled (residual!) but not counted

    commonality = 2.0 * matched / (l1 + l2)
    prefix = 0
    for a, b in zip(t1, t2):  # residuals, per the reference
        if a != b or prefix >= 4:
            break
        prefix += 1
    winkler = min(prefix, 4) * 0.1 * (1.0 - commonality)
    fragmentation = (n_subs - 1) / min(l1, l2)
    if fragmentation > 0:
        return commonality - fragmentation + winkler
    return commonality + winkler


def amsub_edit(s1: str, s2: str, w_sub: float = 0.65, w_edit: float = 0.35) -> float:
    """AMSUB_AND_EDIT — the OAEI default metric: 0.65*AMSubstring +
    0.35*normalized-levenshtein (`AMSubEditSim.java:7-18`,
    weights per `ParametricStringParameters.java:68`). Wired to the real
    AMSub kernel (round 2) — `substring_sim` (ISub) is a separate metric."""
    return w_sub * amsub_sim(s1, s2) + w_edit * levenshtein_min_norm(s1, s2)


def jaro(s1: str, s2: str) -> float:
    s1, s2 = s1 or "", s2 or ""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 and l2 == 0:
        return 1.0
    if l1 == 0 or l2 == 0:
        return 0.0
    window = max(l1, l2) // 2 - 1
    window = max(window, 0)
    match1 = [False] * l1
    match2 = [False] * l2
    matches = 0
    for i in range(l1):
        lo, hi = max(0, i - window), min(l2, i + window + 1)
        for j in range(lo, hi):
            if not match2[j] and s1[i] == s2[j]:
                match1[i] = match2[j] = True
                matches += 1
                break
    if matches == 0:
        return 0.0
    k = 0
    transpositions = 0
    for i in range(l1):
        if match1[i]:
            while not match2[k]:
                k += 1
            if s1[i] != s2[k]:
                transpositions += 1
            k += 1
    t = transpositions / 2
    return (matches / l1 + matches / l2 + (matches - t) / matches) / 3


def jaro_winkler(s1: str, s2: str, scale: float = 0.1) -> float:
    j = jaro(s1, s2)
    prefix = 0
    for a, b in zip(s1 or "", s2 or ""):
        if a != b or prefix >= 4:
            break
        prefix += 1
    return j + prefix * scale * (1 - j)


def jaro_winkler_boosted(s1: str, s2: str, scale: float = 0.1,
                         boost_threshold: float = 0.7) -> float:
    """Winkler's original boost-threshold variant: the prefix bonus applies
    only when jaro > 0.7 (this is the variant DuckDB/rapidfuzz implement —
    used where an external oracle computes JW)."""
    j = jaro(s1, s2)
    if j <= boost_threshold:
        return j
    prefix = 0
    for a, b in zip(s1 or "", s2 or ""):
        if a != b or prefix >= 4:
            break
        prefix += 1
    return j + prefix * scale * (1 - j)


def token_jaccard(t1: list[str], t2: list[str]) -> float:
    a, b = set(t1), set(t2)
    if not a and not b:
        return 1.0
    u = len(a | b)
    return len(a & b) / u if u else 0.0


def token_dice(t1: list[str], t2: list[str]) -> float:
    a, b = set(t1), set(t2)
    if not a and not b:
        return 1.0
    d = len(a) + len(b)
    return 2.0 * len(a & b) / d if d else 0.0


def lcs_subseq_len(s1: str, s2: str) -> int:
    """Longest common SUBSEQUENCE length — the reference ConceptMatcher's
    text kernel (`conceptMatcher/ConceptMatcher.java:318-331`; the method is
    named LongestCommonSubstringLength but its max() recurrence computes the
    subsequence, a quirk preserved here). Two-row DP."""
    s1, s2 = s1 or "", s2 or ""
    l1, l2 = len(s1), len(s2)
    if l1 == 0 or l2 == 0:
        return 0
    if l1 > l2:
        s1, s2, l1, l2 = s2, s1, l2, l1
    prev = [0] * (l1 + 1)
    cur = [0] * (l1 + 1)
    for j in range(1, l2 + 1):
        c2 = s2[j - 1]
        for i in range(1, l1 + 1):
            cur[i] = prev[i - 1] + 1 if s1[i - 1] == c2 else max(
                prev[i], cur[i - 1]
            )
        prev, cur = cur, prev
    return prev[l1]


def lcs_text_sim(s1: str, s2: str) -> float:
    """ConceptMatcher TextSim = LCS-subsequence length / (len1 + len2)
    (`ConceptMatcher.java:307-308`). Both empty → 0.0 (0/0 guarded)."""
    s1, s2 = s1 or "", s2 or ""
    d = len(s1) + len(s2)
    return lcs_subseq_len(s1, s2) / d if d else 0.0


def sigmoid(x: float, k: float = 10.0, c: float = 0.5) -> float:
    """Sigmoid rescale used by LWC sigmoid-average
    (`Combination/CombinationMatcher.java:151-153`)."""
    import math

    return 1.0 / (1.0 + math.exp(-k * (x - c)))
