"""Skip-gram companion (SURVEY.md §3.3) — the reference ships a standalone
Scala word2vec/MSSG trainer (skipgram/src/WordEmbeddingModel.scala:10-84,
SkipGramEmbeddingModel.scala:11-74) whose HogWild thread loop and manual
byte-range input splitting Spark ML's Word2Vec reproduces wholesale
(distributed fit over an RDD of token sequences). Embeddings never feed the
reference's Java matcher, so this is a stretch stage: train → vectors table →
nearest-neighbour browse (Distance.scala:25-60: L2-normalize, top-k).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def train_word2vec(
    docs: DataFrame,
    tokens_col: str = "tokens",
    dim: int = 32,
    min_count: int = 2,
    window: int = 5,
    seed: int = 42,
) -> DataFrame:
    """docs(doc_id, tokens: array<string>) → vectors(word, vector array<float>).

    vocab pruning by min_count and the context window mirror the reference's
    VocabBuilder.scala:104-181 / train loop parameters."""
    from pyspark.ml.feature import Word2Vec

    w2v = Word2Vec(
        vectorSize=dim,
        minCount=min_count,
        windowSize=window,
        seed=seed,
        inputCol=tokens_col,
        outputCol="_vec",
        maxIter=1,
    )
    model = w2v.fit(docs.select(tokens_col))
    vecs = model.getVectors()  # (word, vector: ml VectorUDT)
    to_arr = F.udf(lambda v: [float(x) for x in v], "array<float>")
    return vecs.select("word", to_arr(F.col("vector")).alias("vector"))


def nearest_words(vectors: DataFrame, probe_words: list[str], k: int = 10) -> DataFrame:
    """Distance.scala browse: L2-normalized dot-product top-k neighbours of
    each probe word (deterministic tie-break word asc)."""
    from ..functions.spark_sims import cosine_array_col

    probes = vectors.filter(F.col("word").isin(probe_words)).select(
        F.col("word").alias("probe"), F.col("vector").alias("pv")
    )
    scored = (
        F.broadcast(probes)
        .crossJoin(vectors.select(F.col("word").alias("neighbor"),
                                  F.col("vector").alias("nv")))
        .filter(F.col("probe") != F.col("neighbor"))
        .withColumn("cosine", F.round(cosine_array_col(F.col("pv"), F.col("nv")), 9))
    )
    w = Window.partitionBy("probe").orderBy(F.desc("cosine"), F.asc("neighbor"))
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("probe", "neighbor", "cosine", "rnk")
    )
