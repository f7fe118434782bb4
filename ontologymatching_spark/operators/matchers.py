"""Matcher stages — DataFrame re-expressions of the reference's composite
matchers (SURVEY.md §2.8). Each takes the prepared entities + candidate pairs
and returns the pairs with a similarity column added; all stay sparse (the
reference's dense SimilarityMatrix is never materialized — the pair table with
threshold-at-fill IS the AggregativeSparseMatrix, AbstractMatcher.java:504-505).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import spark_sims as S

# ---------------------------------------------------------------------------
# entity preparation: normalization tiers + virtual document
# ---------------------------------------------------------------------------


def prepare_entities(entities: DataFrame) -> DataFrame:
    """Add entity_id + the BSM normalization tiers + token array.

    norm tiers are JVM expressions where possible; stemming is the one
    pandas-UDF column (Porter has no Catalyst equivalent)."""
    from .extract import with_entity_ids

    e = with_entity_ids(entities)
    e = e.withColumn("norm_name", S.norm_name_col(F.col("local_name")))
    e = e.withColumn("stem_name", S.stem_norm_udf(F.col("local_name")))
    e = e.withColumn("nodigit_name", S.stem_nodigit_norm_udf(F.col("local_name")))
    e = e.withColumn("tokens", F.split(F.col("norm_name"), " "))
    return e


def with_virtual_doc(entities: DataFrame) -> DataFrame:
    """VMM virtual document (MultiWordsMatcher.createMultiWordsString,
    multiWords/MultiWordsMatcher.java:178-300): per-entity text = own name
    tokens + names of sibling entities in the same module + module path
    tokens. Pure DataFrame: module-level aggregation + join, no UDF.

    Token order is normalized (sorted, deduped) so the doc is deterministic
    under any partitioning — required for oracle parity."""
    sib = entities.groupBy("repo", "path").agg(
        F.array_distinct(
            F.flatten(F.collect_list(F.col("tokens")))
        ).alias("module_tokens")
    )
    path_toks = F.split(
        S.norm_name_col(F.regexp_replace(F.col("path"), r"\.[a-z]+$", "")), " "
    )
    return entities.join(sib, ["repo", "path"]).withColumn(
        "doc_tokens",
        F.array_sort(
            F.array_distinct(
                F.concat(F.col("tokens"), F.col("module_tokens"), path_toks)
            )
        ),
    ).drop("module_tokens")


# ---------------------------------------------------------------------------
# pair assembly
# ---------------------------------------------------------------------------

_SRC_COLS = ["entity_id", "uri", "local_name", "norm_name", "stem_name",
             "nodigit_name", "doc_tokens"]


def pairs_with_features(pairs: DataFrame, src: DataFrame, dst: DataFrame) -> DataFrame:
    """Join the candidate-pair ids back to both sides' feature columns."""
    s = src.select([F.col(c).alias(f"s_{c}") for c in _SRC_COLS])
    d = dst.select([F.col(c).alias(f"d_{c}") for c in _SRC_COLS])
    return (
        pairs.join(s, pairs.src_id == s.s_entity_id)
        .join(d, pairs.dst_id == d.d_entity_id)
        .drop("s_entity_id", "d_entity_id")
    )


# ---------------------------------------------------------------------------
# BSM — tiered exact-match cascade (BaseSimilarityMatcher.java:292-355)
# ---------------------------------------------------------------------------


def bsm(pairs_f: DataFrame) -> DataFrame:
    """exact=1.0 → normalized=0.95 → +stem=0.9 → +digit-strip=0.8 → 0.
    A single when-cascade over the candidate pairs; the four progressively
    normalized columns were computed once on each entity side, so this is
    pure whole-stage-codegen arithmetic (no join, no UDF here)."""
    sim = (
        F.when(F.col("s_local_name") == F.col("d_local_name"), F.lit(1.0))
        .when(F.col("s_norm_name") == F.col("d_norm_name"), F.lit(0.95))
        .when(F.col("s_stem_name") == F.col("d_stem_name"), F.lit(0.9))
        .when(
            (F.col("s_nodigit_name") == F.col("d_nodigit_name"))
            & (F.length("s_nodigit_name") > 0),
            F.lit(0.8),
        )
        .otherwise(F.lit(0.0))
    )
    return pairs_f.withColumn("sim_bsm", sim)


# ---------------------------------------------------------------------------
# PSM — weighted string similarity over fields with weight redistribution
# (ParametricStringMatcher.java:118-382; OAEI weights .33/.34/.33 localname/
# label/comment, metric AMSUB_AND_EDIT, OAEI2011Matcher.java:281-299)
# ---------------------------------------------------------------------------


def psm(pairs_f: DataFrame,
        w_local: float = 0.33, w_label: float = 0.34, w_doc: float = 0.33) -> DataFrame:
    """Fields here: localname (raw name), label (normalized name), comment
    (virtual doc). Missing/irrelevant fields (Utility.isIrrelevant) surrender
    their weight to the present ones (weight redistribution)."""
    sim_local = S.amsub_edit_udf(F.col("s_local_name"), F.col("d_local_name"))
    sim_label = S.amsub_edit_udf(F.col("s_norm_name"), F.col("d_norm_name"))
    sim_doc = S.jaccard_col(F.col("s_doc_tokens"), F.col("d_doc_tokens"))

    def present(a: str, b: str):
        return (F.length(F.col(a)) > 0) & (F.length(F.col(b)) > 0)

    p_local = present("s_local_name", "d_local_name")
    p_label = present("s_norm_name", "d_norm_name")
    p_doc = (F.size("s_doc_tokens") > 0) & (F.size("d_doc_tokens") > 0)

    w_l = F.when(p_local, F.lit(w_local)).otherwise(F.lit(0.0))
    w_b = F.when(p_label, F.lit(w_label)).otherwise(F.lit(0.0))
    w_d = F.when(p_doc, F.lit(w_doc)).otherwise(F.lit(0.0))
    total = w_l + w_b + w_d
    num = (
        F.when(p_local, sim_local).otherwise(F.lit(0.0)) * w_l
        + F.when(p_label, sim_label).otherwise(F.lit(0.0)) * w_b
        + F.when(p_doc, sim_doc).otherwise(F.lit(0.0)) * w_d
    )
    return pairs_f.withColumn(
        "sim_psm", F.when(total > 0, num / total).otherwise(F.lit(0.0))
    )


# ---------------------------------------------------------------------------
# VMM — TF-IDF cosine over virtual documents (MultiWordsMatcher.java:103-176,
# 469-479). Corpus = union of BOTH sides' docs (corpus build :122-149).
# Sparse join-based cosine — the dense matrix never exists.
# ---------------------------------------------------------------------------


def tfidf_weights(docs: DataFrame) -> DataFrame:
    """docs(doc_id, doc_tokens) → (doc_id, term, w) with w = tf * ln(N/df),
    plus an L2 norm per doc folded in downstream. Two-phase aggregation,
    map-side combine free via groupBy."""
    n_docs = docs.count()
    terms = docs.select(
        "doc_id", F.explode("doc_tokens").alias("term")
    ).filter(F.length("term") > 0)
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    df = terms.groupBy("term").agg(F.count_distinct("doc_id").alias("df"))
    w = (
        tf.join(df, "term")
        .withColumn("w", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")))
        .select("doc_id", "term", "w")
    )
    return w


def vmm(pairs: DataFrame, src: DataFrame, dst: DataFrame) -> DataFrame:
    """→ (src_id, dst_id, sim_vmm). Cosine over sparse TF-IDF vectors via a
    term-level join restricted to candidate pairs (never all-pairs)."""
    s_docs = src.select(F.col("entity_id").alias("doc_id"), "doc_tokens")
    d_docs = dst.select(F.col("entity_id").alias("doc_id"), "doc_tokens")
    corpus = s_docs.unionByName(d_docs)
    w = tfidf_weights(corpus).cache()

    norms = w.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm"))

    sw = w.select(F.col("doc_id").alias("src_id"), "term", F.col("w").alias("sw"))
    dw = w.select(F.col("doc_id").alias("dst_id"), "term", F.col("w").alias("dw"))

    dots = (
        pairs.join(sw, "src_id")
        .join(dw, ["dst_id", "term"])
        .groupBy("src_id", "dst_id")
        .agg(F.sum(F.col("sw") * F.col("dw")).alias("dot"))
    )
    sn = norms.select(F.col("doc_id").alias("src_id"), F.col("nrm").alias("s_nrm"))
    dn = norms.select(F.col("doc_id").alias("dst_id"), F.col("nrm").alias("d_nrm"))
    out = (
        pairs.join(dots, ["src_id", "dst_id"], "left")
        .join(sn, "src_id", "left")
        .join(dn, "dst_id", "left")
        .withColumn(
            "sim_vmm",
            F.when(
                F.col("dot").isNotNull() & (F.col("s_nrm") > 0) & (F.col("d_nrm") > 0),
                F.col("dot") / (F.col("s_nrm") * F.col("d_nrm")),
            ).otherwise(F.lit(0.0)),
        )
        .select("src_id", "dst_id", "sim_vmm")
    )
    return out


# ---------------------------------------------------------------------------
# LWC — combination (Combination/CombinationMatcher.java:93-199)
# ---------------------------------------------------------------------------


def lwc_average(pairs_sims: DataFrame, sim_cols: list[str]) -> DataFrame:
    """AVERAGECOMB: plain average of the available matcher similarities."""
    n = len(sim_cols)
    expr = sum((F.coalesce(F.col(c), F.lit(0.0)) for c in sim_cols), F.lit(0.0)) / n
    return pairs_sims.withColumn("sim", expr)


def lwc_max(pairs_sims: DataFrame, sim_cols: list[str]) -> DataFrame:
    return pairs_sims.withColumn(
        "sim", F.greatest(*[F.coalesce(F.col(c), F.lit(0.0)) for c in sim_cols])
    )


def lwc_sigmoid_average(pairs_sims: DataFrame, sim_cols: list[str]) -> DataFrame:
    """SIGMOIDAVERAGECOMB (CombinationMatcher.java:151-153,182-186): average
    of sigmoid-rescaled similarities, sigmoid = 1/(1+exp(-5*(x-0.5)))
    (Utility.getSigmoidFunction:232-239 — k=5, midpoint 0.5). Missing sims
    enter as 0.0 BEFORE the sigmoid (the reference reads an empty matrix
    cell as sim=0 and rescales it), so an absent matcher contributes
    sigmoid(0) ≈ 0.076, not 0."""
    n = len(sim_cols)

    def sg(c):
        return 1.0 / (
            1.0 + F.exp(-5.0 * (F.coalesce(F.col(c), F.lit(0.0)) - 0.5))
        )

    expr = sum((sg(c) for c in sim_cols[1:]), sg(sim_cols[0])) / n
    return pairs_sims.withColumn("sim", expr)


def local_confidence_weights(pairs_sims: DataFrame, sim_col: str,
                             by: str = "src_id") -> DataFrame:
    """LocalConfidenceQuality (qualityEvaluation/metrics/LocalConfidenceQuality
    .java:32-119): per-row confidence = 1 - avg(non-best sims). High when the
    best candidate stands out. → (by, quality)."""
    agg = pairs_sims.groupBy(by).agg(
        F.sum(sim_col).alias("s"), F.max(sim_col).alias("m"), F.count("*").alias("n")
    )
    return agg.withColumn(
        "quality",
        F.when(F.col("n") > 1, 1.0 - (F.col("s") - F.col("m")) / (F.col("n") - 1))
        .otherwise(F.lit(1.0)),
    ).select(by, "quality")


def lwc_quality_weighted(pairs_sims: DataFrame, sim_cols: list[str]) -> DataFrame:
    """Quality-weighted average: each matcher's sim is weighted by its
    per-source-row local confidence."""
    out = pairs_sims
    qcols = []
    for c in sim_cols:
        q = local_confidence_weights(pairs_sims.select("src_id", "dst_id", c), c)
        q = q.withColumnRenamed("quality", f"q_{c}")
        out = out.join(q, "src_id", "left")
        qcols.append(f"q_{c}")
    num = sum(
        (F.coalesce(F.col(c), F.lit(0.0)) * F.coalesce(F.col(q), F.lit(1.0))
         for c, q in zip(sim_cols, qcols)),
        F.lit(0.0),
    )
    den = sum((F.coalesce(F.col(q), F.lit(1.0)) for q in qcols), F.lit(0.0))
    return out.withColumn(
        "sim", F.when(den > 0, num / den).otherwise(F.lit(0.0))
    ).drop(*qcols)
