"""Mention → canonical-entity linking — the instance-matching stage of the
reference (LabelInstanceMatcher.java:28-150, TokenInstanceMatcher.java,
InstanceMatching.java:22-110: label/alias/keyword match of ABox instances,
disambiguation by type + token overlap, top-1 by score).

In the code graft, *mentions* are import statements / call sites extracted
from files; *entities* are the canonical declarations. Linking = blocked
similarity join + scoring + top-1 per mention (Window row_number == 1), the
standard entity-linking shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import spark_sims as S


def mentions_from_triples(triples: DataFrame) -> DataFrame:
    """imports triples → mentions(mention_id, label, repo, path, context).
    mention_id is deterministic (sha2 of the source coordinates + label)."""
    imp = triples.filter(F.col("pred") == "imports")
    m = imp.select(
        F.col("obj").alias("label"),
        "repo", "path", "commit", "content_sha256",
        F.col("subj").alias("context"),
    )
    return m.withColumn(
        "mention_id",
        F.conv(
            F.substring(
                F.sha2(F.concat_ws("|", "repo", "path", "label", "context"), 256),
                1, 15,
            ),
            16, 10,
        ).cast("long"),
    )


def _score_and_pick(joined: DataFrame, threshold: float) -> DataFrame:
    scored = (
        joined.withColumn(
            "name_sim", S.lev_min_norm_col(F.col("m_norm"), F.col("e_norm"))
        )
        .withColumn("tok_sim", S.jaccard_col(F.col("m_tokens"), F.col("e_tokens")))
        # same-repo mentions prefer same-repo entities (type/context
        # disambiguation in the reference's instance matchers)
        .withColumn(
            "link_score",
            F.round(
                F.lit(0.6) * F.col("name_sim")
                + F.lit(0.3) * F.col("tok_sim")
                + F.when(F.col("m_repo") == F.col("e_repo"), 0.1).otherwise(0.0),
                12,
            ),
        )
        .filter(F.col("link_score") >= threshold)
    )
    w = Window.partitionBy("mention_id").orderBy(
        F.desc("link_score"), F.asc("e_uri")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("mention_id", "entity_id", "link_score")
    )


def link_mentions(
    mentions: DataFrame,
    entities: DataFrame,
    threshold: float = 0.5,
) -> DataFrame:
    """→ (mention_id, entity_id, link_score): top-1 entity per mention,
    deterministic tie-break (score desc, entity uri asc —
    ScoredInstanceComparator semantics).

    Two-stage completion shape (the reference's completion mode,
    AbstractMatcher.java:683-717, reused for linking): stage 1 joins
    same-repo on the exact normalized label (resolves nearly all imports,
    no cross-repo blowup); stage 2 takes only the unresolved mentions
    (anti-join) to a global normalized-label block. At 100 TB stage 1 is a
    co-partitioned join on (repo, label) and stage 2 is small by
    construction."""
    m = mentions.select(
        "mention_id",
        S.norm_name_col(F.col("label")).alias("m_norm"),
        F.col("repo").alias("m_repo"),
    ).withColumn("m_tokens", F.split(F.col("m_norm"), " "))
    e = entities.select(
        "entity_id",
        F.col("uri").alias("e_uri"),
        F.col("norm_name").alias("e_norm"),
        F.col("tokens").alias("e_tokens"),
        F.col("repo").alias("e_repo"),
    )

    # stage 1: same-repo exact-label
    local = _score_and_pick(
        m.join(
            e,
            (m.m_repo == e.e_repo) & (m.m_norm == e.e_norm),
        ),
        threshold,
    )

    # stage 2: global exact-label for unresolved mentions only
    unresolved = m.join(local.select("mention_id"), "mention_id", "left_anti")
    global_links = _score_and_pick(
        unresolved.join(e, unresolved.m_norm == e.e_norm), threshold
    )
    return local.unionByName(global_links)
