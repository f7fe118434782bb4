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
    dpmeans: bool = False,
    create_lambda: float = 0.5,
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
    → (word, sense, sense_vec: array<double>, n_contexts).

    ``dpmeans=True`` (round 4) runs the reference's NONPARAMETRIC variant
    instead (MultiSenseSkipGramEmbeddingModel.scala:111-140
    ``cbow_predict_dpmeans``): one sequential pass over the word's contexts
    in (doc_id, pos) order — the stream order of the reference trainer —
    assigning each context to the sense with minimal 1 − cosine(ctx, μ_s)
    where μ_s = running-sum/count, and CREATING a new sense whenever
    min-dist > ``create_lambda`` while under the ``n_senses`` cap
    (:129-136); the first context self-initializes sense 0 the same way
    (no clusters → min-dist = +inf > λ). Centers update online
    (center += ctx, count += 1, :138-140). The per-word pass is sequential
    inside applyInPandas, so results are deterministic at any parallelism;
    with ``quantize_pow2`` the context grid makes the running sums exact."""
    import pandas as pd

    def kmeans(pdf: pd.DataFrame) -> pd.DataFrame:
        import numpy as np

        pdf = pdf.sort_values(["doc_id", "pos"], kind="mergesort")
        word = pdf["word"].iloc[0]
        X = np.array(pdf["ctx"].tolist(), dtype="float64")
        if quantize_pow2 is not None:
            grid = float(1 << quantize_pow2)
            X = np.floor(X * grid) / grid
        if dpmeans:
            # online DP-means stream over the contexts (reference order)
            sums: list = []   # running center SUMS (:121 divides by count)
            cnts: list = []
            assign = np.zeros(len(X), dtype="int64")
            for idx in range(len(X)):
                x = X[idx]
                sense, min_dist = 0, np.inf
                for s in range(len(sums)):
                    mu = sums[s] / cnts[s]
                    denom = float(np.linalg.norm(x) * np.linalg.norm(mu))
                    cos = float(x @ mu) / denom if denom > 0 else 0.0
                    dist = 1.0 - cos
                    if dist < min_dist:  # first-min tie-break (:124-127)
                        min_dist = dist
                        sense = s
                if len(sums) < n_senses and create_lambda < min_dist:
                    sums.append(np.zeros_like(x))
                    cnts.append(0)
                    sense = len(sums) - 1
                sums[sense] = sums[sense] + x
                cnts[sense] += 1
                assign[idx] = sense
            k = len(sums)
            C = np.array([sums[j] / cnts[j] for j in range(k)])
            if quantize_pow2 is not None:
                C = np.floor(C * grid) / grid
            counts = np.bincount(assign, minlength=k)
            return pd.DataFrame(
                {
                    "word": [word] * k,
                    "sense": np.arange(k, dtype="int64"),
                    "sense_vec": [C[j].tolist() for j in range(k)],
                    "n_contexts": counts.astype("int64"),
                }
            )
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


# ---------------------------------------------------------------------------
# NEG-sampling skip-gram parity trainer
# (SkipGramEmbeddingModel.scala:11-74 + VocabBuilder.scala:150-165)
# ---------------------------------------------------------------------------

SG_GRID_BITS = 20
SG_GRID = float(1 << SG_GRID_BITS)


def _sg_md5_unit(*parts):
    """md5-derived uniform draw on the 2^-20 grid in [0,1) — the
    engine-portable stand-in for the reference's seeded java.util.Random
    stream (same distribution, hash-indexed instead of call-ordered so a
    distributed plan draws identically in any partitioning)."""
    from ..functions.spark_sims import md5int_col

    key = F.concat_ws("|", *[p.cast("string") for p in parts])
    return (md5int_col(key) % F.lit(1 << SG_GRID_BITS)) / F.lit(SG_GRID)


def _fg(c):
    return F.floor(c * SG_GRID) / SG_GRID


def skipgram_vocab(
    docs: DataFrame, text_col: str = "text", n_parts: int | None = None
) -> DataFrame:
    """(word, word_id, cnt, lo, hi): vocabulary with the unigram^0.75
    negative-sampling CDF (VocabBuilder.scala:150-165 builds the same
    distribution as a 10^8-slot discretized table; here the exact CDF is a
    2-column range, engine-portable). word_id = alphabetic rank.

    Fully distributed (round 4; the previous version forced the whole
    vocabulary through ONE task via a global ``Window.orderBy`` and a
    global cumulative sum — a real bottleneck at web-corpus vocab sizes):

    * rank: range-partition by word, per-partition ``row_number``, plus
      driver-prefixed per-partition row-count offsets (exact integers).
    * CDF: the normalized probability is floored onto the 2^-20 grid
      (``p = _fg(p_raw / tot)``), so every partial sum is an exact
      multiple of 2^-20 with total ≤ 1 — exactly representable and
      therefore ORDER-INDEPENDENT. The per-partition running sum plus
      driver-prefixed partition totals is then bit-identical to a single
      global left-to-right pass, to any other summation order, and to any
      other engine. This also makes ``lo = hi0 − p`` exact (an exact
      difference of grid multiples equals the previous row's hi0
      bit-for-bit), so the CDF buckets partition [0,1) with no ulp
      gap/overlap for a grid-valued draw to fall into.
    * exact-sum budgets: ``tot = Σ p_raw`` sums 2^-20 multiples exactly
      while the total stays under 2^33 (Σ cnt^0.75 over the vocabulary) —
      same budget the previous global pass relied on; beyond it, re-grid
      p_raw to a coarser power of two.
    """
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    counts = (
        docs.select(F.explode(toks).alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("cnt"))
    )
    spark = docs.sparkSession
    P = n_parts or int(
        spark.conf.get("spark.sql.shuffle.partitions", "32")
    )
    part = (
        counts.repartitionByRange(P, "word")
        .withColumn("pid", F.spark_partition_id())
        .withColumn("p_raw", _fg(F.pow(F.col("cnt"), F.lit(0.75))))
        .localCheckpoint()
    )
    # phase 1: per-partition row counts + raw-mass totals (grid-exact in
    # any order), prefixed on the driver
    info = {
        r.pid: (r.n, r.praw)
        for r in part.groupBy("pid").agg(
            F.count(F.lit(1)).alias("n"), F.sum("p_raw").alias("praw")
        ).collect()
    }
    if not info:
        return part.select(
            "word", F.lit(0).alias("word_id"), "cnt",
            F.lit(0.0).alias("lo"), F.lit(0.0).alias("hi"),
        ).limit(0)
    tot = float(sum(info[pid][1] for pid in sorted(info)))
    nv = sum(info[pid][0] for pid in sorted(info))
    part = part.withColumn("p", _fg(F.col("p_raw") / F.lit(tot)))
    # phase 2: per-partition p totals (exact grid sums), prefixed on the
    # driver into per-partition CDF offsets
    psums = {
        r.pid: r.ps
        for r in part.groupBy("pid").agg(F.sum("p").alias("ps")).collect()
    }
    id_off, cum_off, acc_n, acc_p = {}, {}, 0, 0.0
    for pid in sorted(info):
        id_off[pid] = acc_n
        cum_off[pid] = acc_p
        acc_n += info[pid][0]
        acc_p += psums[pid]
    offs = spark.createDataFrame(
        [(pid, id_off[pid], cum_off[pid]) for pid in sorted(info)],
        "pid int, id_off long, cum_off double",
    )
    wloc = Window.partitionBy("pid").orderBy("word")
    cumw = (
        Window.partitionBy("pid").orderBy("word")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return (
        part.join(F.broadcast(offs), "pid")
        .withColumn("word_id", F.col("id_off") + F.row_number().over(wloc) - 1)
        .withColumn("hi0", F.col("cum_off") + F.sum("p").over(cumw))
        .withColumn("lo", F.col("hi0") - F.col("p"))
        .withColumn(
            "hi",
            F.when(F.col("word_id") == nv - 1, F.lit(1.000001))
            .otherwise(F.col("hi0")),
        )
        .select("word", "word_id", "cnt", "lo", "hi")
    )


def skipgram_neg_examples(
    docs: DataFrame,
    vocab: DataFrame,
    window: int = 2,
    negative: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(word, ctx, label ±1) training examples with the reference's exact
    example construction (SkipGramEmbeddingModel.process :11-48): per
    position a random window shrink b ∈ [0,window), contexts at senPos −
    window + a for a ∈ [b, 2·window+1−b) \\ {window}; one positive per
    (word, context) plus ``negative`` unigram^0.75-sampled negatives.
    Random draws are md5-hash-indexed (same distribution as the seeded
    rng; order-free so the plan distributes). Subsampling is off
    (opts.sample defaults 0). All JVM-side: token explode, sequence
    explode, broadcast CDF range join — no UDF, no shuffle of doc text."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    sen = docs.select(
        F.col(id_col).alias("doc_id"),
        F.posexplode(toks).alias("pos", "w"),
    )
    ids = F.broadcast(vocab.select(F.col("word").alias("w"), "word_id"))
    sen = sen.join(ids, "w").select(
        "doc_id", "pos", F.col("word_id").alias("wid")
    )
    b = (
        F.conv(
            F.substring(
                F.md5(F.concat_ws("|", F.lit("b"), F.col("doc_id"),
                                  F.col("pos"))), 1, 8
            ), 16, 10
        ).cast("long") % window
    ).cast("int")
    withb = sen.withColumn("b", b)
    ctxpos = withb.select(
        "doc_id", "pos", "wid",
        F.explode(
            F.filter(
                F.sequence(
                    F.col("b") - window, window - F.col("b")
                ),
                lambda o: o != 0,
            )
        ).alias("off"),
    ).withColumn("cpos", F.col("pos") + F.col("off"))
    ctx = ctxpos.join(
        sen.select(
            "doc_id", F.col("pos").alias("cpos"), F.col("wid").alias("cid")
        ),
        ["doc_id", "cpos"],
    )
    pos_ex = ctx.select(
        "doc_id", "pos", "off",
        F.col("wid").alias("word"), F.col("cid").alias("ctx"),
        F.lit(1).alias("label"),
    )
    negs = ctx.select(
        "doc_id", "pos", "off", "wid",
        F.explode(F.sequence(F.lit(0), F.lit(negative - 1))).alias("k"),
    ).withColumn(
        "u",
        _sg_md5_unit(F.lit("n"), F.col("doc_id"), F.col("pos"),
                     F.col("off"), F.col("k")),
    )
    cdf = F.broadcast(vocab.select(
        F.col("word_id").alias("nid"), "lo", "hi"
    ))
    neg_ex = (
        negs.join(cdf, (F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")))
        .select(
            "doc_id", "pos", "off",
            F.col("wid").alias("word"), F.col("nid").alias("ctx"),
            F.lit(-1).alias("label"),
        )
    )
    return pos_ex.unionByName(neg_ex)


def skipgram_neg_train(
    examples: DataFrame,
    vocab: DataFrame,
    dim: int = 8,
    rounds: int = 2,
    lr: float = 0.05,
) -> DataFrame:
    """Synchronous full-batch NEG gradient rounds with the reference's
    exact per-example objective/gradient (SkipGramNegSamplingExample
    :50-74: score = w·c; positive factor σ(−s) = e^(−s)/(1+e^(−s)),
    negative factor −σ(s) = −1/(1+e^(−s)); BOTH the word and the context
    row of the single shared weight matrix accumulate factor × other).
    The reference's HogWild asynchronous SGD is execution-order-dependent
    by construction; the distributed re-expression is synchronous batch
    gradient ascent on the MEAN objective (summed gradient / n_examples —
    without the mean a corpus-sized batch diverges at any fixed lr) —
    same objective, same gradient field, deterministic (the same
    deviation Spark ML's Word2Vec makes).

    Engine-exact determinism: init and factors floored to the 2^-20 grid,
    so every gradient term is a product of grid values (exact 2^-40 sums
    in any order) and the unrolled DuckDB twin reproduces weights
    bit-identically. → (word_id, embedding array<double>)."""
    wts = vocab.select("word_id").withColumn(
        "embedding",
        F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda d: _fg(
                (_sg_md5_unit(F.lit("w"), F.col("word_id"), d) - 0.5)
                / dim
            ),
        ),
    ).localCheckpoint()
    from ..partitions import fan_parts

    # fan the example table before checkpointing: every gradient round
    # re-reads this checkpoint twice (word side + ctx side), and its
    # inherited partitioning (profiled: 10 partitions at bench SF, 532 MB
    # re-read per round on a third of the cores) caps the round's
    # parallelism. Gradient sums are 2^-20-grid-exact, so partitioning
    # cannot change the result.
    ex = examples.select("word", "ctx", F.col("label").cast("double")
                         .alias("label"))
    ex = ex.repartition(fan_parts(ex)).localCheckpoint()
    step = lr / ex.count()  # mean-gradient step; exact same double in SQL
    for _ in range(rounds):
        we = wts.select(F.col("word_id").alias("word"),
                        F.col("embedding").alias("wv"))
        ce = wts.select(F.col("word_id").alias("ctx"),
                        F.col("embedding").alias("cv"))
        scored = (
            ex.join(F.broadcast(we), "word")
            .join(F.broadcast(ce), "ctx")
            .withColumn(
                "score",
                F.aggregate(
                    F.zip_with(F.col("wv"), F.col("cv"),
                               lambda a_, b_: a_ * b_),
                    F.lit(0.0), lambda acc, v: acc + v,
                ),
            )
            .withColumn(
                "factor",
                _fg(
                    F.when(
                        F.col("label") == 1.0,
                        F.exp(-F.col("score"))
                        / (F.lit(1.0) + F.exp(-F.col("score"))),
                    ).otherwise(
                        F.lit(-1.0)
                        / (F.lit(1.0) + F.exp(-F.col("score")))
                    )
                ),
            )
        )
        # both sides accumulate factor × other-embedding (shared matrix).
        # each per-example contribution is floored to the 2^-20 grid BEFORE
        # summing: raw products live on 2^-40, whose exact-sum budget
        # (Σ|terms| < 2^13) a corpus-scale example count overflows — on
        # 2^-20 the budget is 2^33 terms, order-independent at any SF
        # ONE pass over scored: a union of two selects re-computes the whole
        # scored subtree (join + dot fold + factor) per branch — Spark has
        # no cross-branch CSE (profiled: the round stage halves). The
        # explode emits the same two contribution rows per example.
        contrib = scored.select(
            F.explode(
                F.array(
                    F.struct(
                        F.col("word").alias("word_id"),
                        F.transform(
                            F.col("cv"), lambda v: _fg(F.col("factor") * v)
                        ).alias("g"),
                    ),
                    F.struct(
                        F.col("ctx").alias("word_id"),
                        F.transform(
                            F.col("wv"), lambda v: _fg(F.col("factor") * v)
                        ).alias("g"),
                    ),
                )
            ).alias("_c")
        ).select(F.col("_c.word_id").alias("word_id"), F.col("_c.g").alias("g"))
        # per-dim sums in ONE groupBy (no posexplode: an 8-dim explode
        # multiplies the contribution rows 8x and needs a second groupBy
        # to re-assemble — measured 53 s → 20 s at sf0.1, 89 → 27 s at sf1)
        grads = contrib.groupBy("word_id").agg(
            F.array(
                *[
                    F.sum(F.element_at("g", d + 1)).alias(f"g{d}")
                    for d in range(dim)
                ]
            ).alias("grad")
        )
        wts = (
            wts.join(grads, "word_id", "left")
            .withColumn(
                "embedding",
                F.when(
                    F.col("grad").isNull(), F.col("embedding")
                ).otherwise(
                    F.zip_with(
                        F.col("embedding"), F.col("grad"),
                        lambda wv, g: _fg(wv + F.lit(step) * g),
                    )
                ),
            )
            .select("word_id", "embedding")
            .localCheckpoint()
        )
    return wts
