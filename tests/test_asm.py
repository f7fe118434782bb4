"""ASM content-word sub-matrix (AdvancedSimilarityMatcher.java:31-533) —
parity of operators.matchers.asm_advanced_sim against a faithful pure-Python
port of the reference's calculateSimilarity loop (:154-194), including the
position-dependent nonContentWordCheck quirks (:339-398)."""

import math

import pytest
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, LongType, StringType, StructField, StructType,
)

from ontologymatching_spark.functions import simkernels
from ontologymatching_spark.operators.matchers import (
    ASM_ISHAS, ASM_NONCONTENT, ASM_PREP, asm_advanced_sim, asm_weight_tables,
)

NO_MATCH = object()


def asm_port(src_toks, dst_toks, kernel, max_tokens=8):
    """Line-faithful port of AdvancedSimilarityMatcher.calculateSimilarity
    (:154-194) + nonContentWordCheck (:339-398) + contentWordCheck (:259-323)
    + computeValue (:451-491), on the same 1e-6 sim grid and floor rule as
    the Spark operator. Returns None where the reference returns no mapping
    (NO_MATCH, empty content side, or computeValue <= 0)."""
    s_toks = [t.lower() for t in src_toks[:max_tokens]]
    d_toks = [t.lower() for t in dst_toks[:max_tokens]]
    rel = set(ASM_ISHAS) | set(ASM_PREP)

    # nonContentWordCheck — faithful loop incl. break/early-return order
    sim_value = 0.0
    for s in s_toks:
        if s in rel:  # isNonContent && isRelevantString reduces to relevance
            for t in d_toks:
                if t in rel:
                    if s == t:
                        sim_value = 0.05
                        break
                    elif s in ASM_ISHAS and t in ASM_ISHAS:
                        return None  # NO_MATCH
                    elif s in ASM_PREP and t in ASM_PREP:
                        return None  # NO_MATCH
                    else:
                        sim_value = 0.0
    bonus = sim_value

    sc = [t for t in s_toks if t not in ASM_NONCONTENT]
    dc = [t for t in d_toks if t not in ASM_NONCONTENT]
    if not sc or not dc:
        return None  # 0/0 = NaN in the reference -> no mapping

    cells = sorted(
        (
            (-round(kernel(a, b) * 1e6), i, j)
            for i, a in enumerate(sc)
            for j, b in enumerate(dc)
        )
    )
    used_i, used_j, total = set(), set(), 0
    for negsim, i, j in cells:
        if i in used_i or j in used_j:
            continue
        used_i.add(i)
        used_j.add(j)
        total += -negsim

    ns, nt = len(sc), len(dc)
    svc, add = asm_weight_tables(max_tokens)
    d = abs(ns - nt)
    a = (ns + nt) // 2
    mean = total / (min(ns, nt) * 1e6)
    cv = min(1.0, mean * svc[d] + add[(d, a)])
    if cv <= 0:
        return None
    sim = min(1.0, cv * (1.0 + bonus)) if bonus > 0 else min(1.0, cv)
    return math.floor(sim * 1e6) / 1e6


FIXTURE_PAIRS = [
    # the verdict's fixture: compound name vs noise-worded phrase
    (["tax", "income"], ["income", "of", "tax"]),
    # NO_MATCH: both sides carry an isHas word, unequal (isPartOf/hasPart)
    (["is", "part", "of"], ["has", "part"]),
    # bonus 0.05: equal relevant word on both sides, similar content words
    (["has", "name"], ["has", "naming"]),
    # equal-first beats later conflict (break quirk): "is ... is/has"
    (["is", "decimal"], ["is", "has", "decimal"]),
    # later source token overwrites an earlier 0.05 (last-assignment quirk)
    (["is", "of", "number"], ["is", "number"]),
    # cross-class relevant pair -> 0.0, no NO_MATCH
    (["is", "target"], ["of", "target"]),
    # word-distance 2 branch + atan term
    (["alpha"], ["alpha", "beta", "gamma"]),
    # word-distance >2 default branch (negative exp contribution)
    (["alpha"], ["alpha", "beta", "gamma", "delta", "x"]),
    # empty content side -> no row
    (["is", "of"], ["name"]),
    # reference main() examples (:606-618), tokenized
    (["is", "decimal"], ["long", "decimal"]),
    (["has", "phone", "number"], ["telephone"]),
    (["result"], ["event", "indicator"]),
    (["long", "decimal"], ["long", "decimal"]),
    (["panic", "attack", "type"], ["terror"]),
    (["last", "name"], ["full", "name"]),
    (["aim"], ["has", "target", "attack"]),
]


@pytest.fixture(scope="module")
def asm_result(spark):
    schema = StructType([
        StructField("src_id", LongType()),
        StructField("dst_id", LongType()),
        StructField("src_toks", ArrayType(StringType())),
        StructField("dst_toks", ArrayType(StringType())),
    ])
    rows = [
        (i, 1000 + i, s, d) for i, (s, d) in enumerate(FIXTURE_PAIRS)
    ]
    df = spark.createDataFrame(rows, schema)
    out = asm_advanced_sim(df)  # default kernel = AMSUB_AND_EDIT
    return {r["src_id"]: r["asm_sim"] for r in out.collect()}


def test_asm_matches_reference_port(asm_result):
    for i, (s, d) in enumerate(FIXTURE_PAIRS):
        want = asm_port(s, d, simkernels.amsub_edit)
        got = asm_result.get(i)
        assert got == want, f"pair {i} {s} vs {d}: spark={got} port={want}"


def test_asm_no_match_pairs_dropped(asm_result):
    assert 1 not in asm_result  # is/has conflict
    assert 8 not in asm_result  # empty content side


def test_asm_bonus_applied(asm_result):
    # pair 2 has the 0.05 bonus; the same content words without the shared
    # "has" score exactly sim/1.05 (pre-floor) — assert the strict ordering
    base = asm_port(["name"], ["naming"], simkernels.amsub_edit)
    assert base is not None and asm_result[2] > base


def test_asm_identity_pair(asm_result):
    assert asm_result[12] == 1.0  # LongDecimal vs LongDecimal


def test_asm_port_quirks():
    k = simkernels.amsub_edit
    # break quirk: equal "is" found before the has-conflict -> bonus, no NM
    assert asm_port(["is", "decimal"], ["is", "has", "decimal"], k) is not None
    # scanning order flipped -> conflict seen first -> NO_MATCH
    assert asm_port(["is", "decimal"], ["has", "is", "decimal"], k) is None
    # last-assignment quirk: second source token resets the 0.05 to 0.0
    with_reset = asm_port(["is", "of", "x"], ["is", "x"], k)
    without = asm_port(["is", "x"], ["is", "x"], k)
    assert with_reset is not None and without is not None
    assert without > with_reset  # bonus survived only in the second


def test_asm_parallelism_invariance(spark):
    schema = StructType([
        StructField("src_id", LongType()),
        StructField("dst_id", LongType()),
        StructField("src_toks", ArrayType(StringType())),
        StructField("dst_toks", ArrayType(StringType())),
    ])
    rows = [(i, 1000 + i, s, d) for i, (s, d) in enumerate(FIXTURE_PAIRS)]
    a = asm_advanced_sim(
        spark.createDataFrame(rows, schema).repartition(1)
    ).collect()
    b = asm_advanced_sim(
        spark.createDataFrame(rows, schema).repartition(16)
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_asm_row_kernel_path_equivalent(spark):
    """row_kernel=True (in-row nested-transform grid, zero post-join
    shuffles) must produce byte-identical output to the explode+groupBy
    path for the same JVM Column kernel."""
    from ontologymatching_spark.functions.spark_sims import lev_min_norm_col

    schema = StructType([
        StructField("src_id", LongType()),
        StructField("dst_id", LongType()),
        StructField("src_toks", ArrayType(StringType())),
        StructField("dst_toks", ArrayType(StringType())),
    ])
    rows = [(i, 1000 + i, s, d) for i, (s, d) in enumerate(FIXTURE_PAIRS)]
    df = spark.createDataFrame(rows, schema)
    a = asm_advanced_sim(df, kernel=lev_min_norm_col, row_kernel=False)
    b = asm_advanced_sim(df, kernel=lev_min_norm_col, row_kernel=True)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
