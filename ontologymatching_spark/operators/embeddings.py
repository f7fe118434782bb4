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
    from pyspark.ml.functions import vector_to_array

    return vecs.select(
        "word", vector_to_array(F.col("vector"), "float32").alias("vector")
    )


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


def context_vectors(
    docs: DataFrame,
    vectors: DataFrame,
    tokens_col: str = "tokens",
    window: int = 2,
) -> DataFrame:
    """Per-occurrence context vectors: for every (doc_id, pos, word), the
    elementwise MEAN of the embeddings of tokens within ±window (the
    reference's context-sum, MultiSenseSkipGramEmbeddingModel.scala:12-47,
    normalized to a mean so window-edge occurrences are comparable).

    All JVM-side and O(tokens × window), never O(tokens²): neighbors come
    from array slices of the ORIGINAL tokens column (no within-doc
    self-join), the vector lookup is a broadcast join, and the mean is one
    zip_with fold per occurrence (single shuffle, no per-dimension row
    blow-up). → (doc_id, pos, word, ctx: array<double>)."""
    dim_row = vectors.select(F.size("vector").alias("d")).first()
    dim = dim_row.d if dim_row else 0
    occ = docs.select(
        "doc_id",
        F.col(tokens_col).alias("toks"),
        F.posexplode(F.col(tokens_col)).alias("pos", "word"),
    )
    # pos is 0-based, slice() is 1-based
    left = F.slice(
        F.col("toks"),
        F.greatest(F.col("pos") - window + 1, F.lit(1)),
        F.least(F.lit(window), F.col("pos")),
    )
    right = F.slice(
        F.col("toks"),
        F.col("pos") + 2,
        F.greatest(
            F.least(F.lit(window), F.size("toks") - F.col("pos") - 1),
            F.lit(0),
        ),
    )
    nbr = occ.select(
        "doc_id", "pos", "word",
        F.explode(F.concat(left, right)).alias("nword"),
    )
    withv = nbr.join(
        F.broadcast(vectors.withColumnRenamed("word", "nword")), "nword"
    )
    zeros = F.array_repeat(F.lit(0.0), dim)
    return (
        withv.groupBy("doc_id", "pos", "word")
        # sort the collected (nword, vector) structs: double summation is
        # order-sensitive at the ULP level, and collect_list order varies
        # with parallelism — the sort makes ctx bit-identical at any level
        .agg(
            F.array_sort(
                F.collect_list(F.struct("nword", "vector"))
            ).alias("nvs")
        )
        .select(
            "doc_id", "pos", "word",
            F.transform(
                F.aggregate(
                    "nvs",
                    zeros,
                    lambda acc, s: F.zip_with(
                        acc,
                        s.getField("vector"),
                        lambda a, b: a + b.cast("double"),
                    ),
                ),
                lambda v: v / F.size("nvs"),
            ).alias("ctx"),
        )
    )


def mssg_sense_vectors(
    ctx: DataFrame,
    n_senses: int = 2,
    n_iter: int = 5,
    min_contexts: int = 4,
    quantize_pow2: int | None = None,
) -> DataFrame:
    """Multi-Sense Skip-Gram sense discovery — the reference thesis's MSSG
    trainer re-expressed batch-side (skipgram/src/
    MultiSenseSkipGramEmbeddingModel.scala:12-100 'cbow_predict': a context
    is assigned to the sense with max dot(context, sense-vec);
    MultiSenseWordEmbeddingModel.scala:50-136: cluster centers move to the
    mean of their contexts). Per word: k-means over its context vectors,
    max-dot assignment, mean update, ``n_iter`` bounded rounds.

    Deterministic under any parallelism: contexts sorted by (doc_id, pos)
    inside each group; init = first ``n_senses`` contexts in that order.

    ``quantize_pow2=b`` floors every context component AND every updated
    centroid onto the 2^-b binary grid (the similarity-flooding oracle's
    trick): with |values| ≤ 1, all dot-product terms land on the exact
    2^-2b grid and all partial sums stay exactly representable in a
    double, so assignments and centroids are bit-identical in ANY
    summation order and in any engine — which is what lets the bounded
    k-means unroll into a DuckDB CTE twin (benchqueries.SQL_MSSG_SENSES).
    → (word, sense, sense_vec: array<double>, n_contexts)."""
    import pandas as pd

    def kmeans(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["doc_id", "pos"], kind="mergesort")
        word = pdf["word"].iloc[0]
        X = np.array(pdf["ctx"].tolist(), dtype="float64")
        if quantize_pow2 is not None:
            grid = float(1 << quantize_pow2)
            X = np.floor(X * grid) / grid
        k = min(n_senses, len(X))
        C = X[:k].copy()
        assign = np.zeros(len(X), dtype="int64")
        for _ in range(n_iter):
            assign = np.argmax(X @ C.T, axis=1)  # cbow_predict: max dot
            for j in range(k):
                mask = assign == j
                if mask.any():
                    C[j] = X[mask].mean(axis=0)
                    if quantize_pow2 is not None:
                        C[j] = np.floor(C[j] * grid) / grid
        counts = np.bincount(assign, minlength=k)
        return pd.DataFrame(
            {
                "word": [word] * k,
                "sense": np.arange(k, dtype="int64"),
                "sense_vec": [C[j].tolist() for j in range(k)],
                "n_contexts": counts.astype("int64"),
            }
        )

    eligible = ctx.join(
        ctx.groupBy("word").agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") >= min_contexts).select("word"),
        "word",
    )
    return eligible.groupBy("word").applyInPandas(
        kmeans,
        "word string, sense long, sense_vec array<double>, n_contexts long",
    )
