"""JVM Column expressions must agree exactly with the pure-Python kernels —
the 'shared normalizer code' requirement of SURVEY.md §7 hard part (a)."""

import pandas as pd
from pyspark.sql import functions as F

from ontologymatching_spark.functions import simkernels as K
from ontologymatching_spark.functions import spark_sims as S
from ontologymatching_spark.functions import textnorm

SAMPLES = [
    "parseTable", "parse_table", "LoadHTTPResponse", "main", "utils2",
    "x", "", "foo_bar_baz", "A", "camelCaseID9", "dash-sep.name",
]
PAIRS = [(a, b) for a in SAMPLES for b in SAMPLES][:60]


def test_norm_name_col_parity(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": SAMPLES}))
    got = df.select(S.norm_name_col(F.col("s")).alias("n")).toPandas()["n"].tolist()
    want = [textnorm.normalize(s) for s in SAMPLES]
    assert got == want


def test_stem_udf_parity(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": SAMPLES}))
    got = df.select(S.stem_norm_udf(F.col("s")).alias("n")).toPandas()["n"].tolist()
    want = [textnorm.normalize(s, stem=True) for s in SAMPLES]
    assert got == want


def test_lev_min_norm_parity(spark):
    pdf = pd.DataFrame(PAIRS, columns=["a", "b"])
    df = spark.createDataFrame(pdf)
    got = df.select(
        S.lev_min_norm_col(F.col("a"), F.col("b")).alias("v")
    ).toPandas()["v"].tolist()
    want = [K.levenshtein_min_norm(a, b) for a, b in PAIRS]
    for g, w, p in zip(got, want, PAIRS):
        assert abs(g - w) < 1e-12, p


def test_amsub_edit_udf_parity(spark):
    pdf = pd.DataFrame(PAIRS, columns=["a", "b"])
    df = spark.createDataFrame(pdf)
    got = df.select(
        S.amsub_edit_udf(F.col("a"), F.col("b")).alias("v")
    ).toPandas()["v"].tolist()
    want = [K.amsub_edit(a, b) for a, b in PAIRS]
    for g, w, p in zip(got, want, PAIRS):
        assert abs(g - w) < 1e-12, p


def test_jaccard_col_parity(spark):
    toks = [textnorm.tokenize(s) for s in SAMPLES]
    pdf = pd.DataFrame(
        [(ta, tb) for ta in toks for tb in toks], columns=["a", "b"]
    )
    df = spark.createDataFrame(pdf)
    got = df.select(S.jaccard_col(F.col("a"), F.col("b")).alias("v")).toPandas()[
        "v"
    ].tolist()
    want = [K.token_jaccard(ta, tb) for ta in toks for tb in toks]
    for g, w in zip(got, want):
        assert abs(g - w) < 1e-12


def test_shingles_col_parity(spark):
    df = spark.createDataFrame(pd.DataFrame({"s": SAMPLES}))
    got = df.select(S.shingles_col(F.col("s"), 3).alias("v")).toPandas()["v"].tolist()
    want = [textnorm.shingles(s, 3) for s in SAMPLES]
    assert [list(g) for g in got] == want


def test_cosine_array_col(spark):
    pdf = pd.DataFrame(
        {"a": [[1.0, 0.0], [1.0, 2.0], [0.0, 0.0]],
         "b": [[1.0, 0.0], [2.0, 1.0], [1.0, 1.0]]}
    )
    df = spark.createDataFrame(pdf)
    got = df.select(S.cosine_array_col(F.col("a"), F.col("b")).alias("v")).toPandas()[
        "v"
    ].tolist()
    assert abs(got[0] - 1.0) < 1e-12
    assert abs(got[1] - 4 / 5) < 1e-12
    assert got[2] == 0.0
