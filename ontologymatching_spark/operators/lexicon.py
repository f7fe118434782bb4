"""Lexicon building + LSM synonym matching (SURVEY.md §2.8).

The reference builds per-ontology Lexicons (synonym sets + glosses) from
ontology annotations or WordNet (lexicon/ontology/OntologyLexiconBuilder
.java:56-105, LexiconStore.java:121-143) and LSM scores 1.0 (scaled by a
synonym weight) when two nodes share a synonym (LexicalSynonymMatcher
.java:221-266).

Code graft: a synonym of an entity is any surface form that resolves to it —
its raw name, normalization tiers, and the labels of mentions linked to it
(the alias table WordNet would otherwise provide). Build = explode
(UDTF-shape, LexiconBuilder analog); match = term equi-join + max.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def build_lexicon(entities: DataFrame,
                  links: DataFrame | None = None,
                  mentions: DataFrame | None = None) -> DataFrame:
    """entities(entity_id, local_name, norm_name, stem_name) →
    synonyms(entity_id, term). Optionally extend with linked mention labels
    (links(mention_id, entity_id) + mentions(mention_id, label))."""
    base = entities.select(
        "entity_id",
        F.explode(
            F.array_distinct(
                F.array(
                    F.lower(F.col("local_name")),
                    F.col("norm_name"),
                    F.col("stem_name"),
                )
            )
        ).alias("term"),
    ).filter(F.length("term") > 0)
    if links is not None and mentions is not None:
        mined = (
            links.join(mentions.select("mention_id", "label"), "mention_id")
            .select("entity_id", F.lower(F.col("label")).alias("term"))
            .filter(F.length("term") > 0)
        )
        base = base.unionByName(mined)
    return base.dropDuplicates(["entity_id", "term"])


def lsm(
    src_lexicon: DataFrame,
    dst_lexicon: DataFrame,
    synonym_weight: float = 0.95,
) -> DataFrame:
    """→ (src_id, dst_id, sim_lsm): synonym-set intersection scaled by the
    synonym weight (LexicalSynonymMatcher.java:221-266: 1.0 if synonyms,
    scaled). Pure equi-join on term — never a cross product."""
    s = src_lexicon.select(F.col("entity_id").alias("src_id"), "term")
    d = dst_lexicon.select(F.col("entity_id").alias("dst_id"), "term")
    return (
        s.join(d, "term")
        .select("src_id", "dst_id")
        .dropDuplicates(["src_id", "dst_id"])
        .withColumn("sim_lsm", F.lit(synonym_weight))
    )
