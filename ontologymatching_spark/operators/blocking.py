"""Candidate-pair blocking — replaces the reference's O(n·m) cartesian
``alignNodesOneByOne`` (AbstractMatcher.java:519-678) with key-based
equi-joins, the idea the reference itself sketches in GroupFinder
(groupFinder/GroupFinderMatcher.java:26-180: partition, match groups, match
within groups).

Strategies (all JVM-side; a pair is a candidate if it shares ANY key):
  - ``exact``  : full tier-2-normalized name         (guarantees BSM tiers 1-2)
  - ``token``  : each normalized-name token          (catches tiers 3-5: a
                 plural/typo changes one token, the others still collide)
  - ``prefix`` : first 4 chars of the normalized name (typo-in-every-token net)

Scale levers:
  - per-key cap: token/prefix keys whose cross-product exceeds
    ``max_block_pairs`` are dropped (blocking stop-words — 'main', 'utils');
    the ``exact`` key is never dropped (those pairs are real tier-1 matches).
  - hot exact keys are *salted*: a key with s×d > ``max_block_pairs`` is split
    into ``ceil(s*d / max_block_pairs)`` salt buckets on the bigger side and
    replicated on the smaller side — two-phase handling of skew on top of AQE
    skew-join splitting (the explicit-salting requirement of the north rule).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_EXACT = "exact"
KEY_TOKEN = "token"
KEY_PREFIX = "prefix"


def block_keys(entities: DataFrame, side: str) -> DataFrame:
    """entities(entity_id, norm_name, kind) → (entity_id, kind, key, strategy).

    ``kind`` is part of every key: the reference never matches classes against
    properties (alignType CLASSES/PROPERTIES, AbstractMatcher.java:147-189).
    """
    e = entities.select("entity_id", "kind", "norm_name")
    exact = e.select(
        "entity_id",
        "kind",
        F.concat_ws("", F.col("kind"), F.col("norm_name")).alias("key"),
        F.lit(KEY_EXACT).alias("strategy"),
    )
    token = (
        e.select(
            "entity_id",
            "kind",
            F.explode(F.split(F.col("norm_name"), " ")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .select(
            "entity_id",
            "kind",
            F.concat_ws("", F.col("kind"), F.col("tok")).alias("key"),
            F.lit(KEY_TOKEN).alias("strategy"),
        )
    )
    prefix = e.filter(F.length("norm_name") >= 4).select(
        "entity_id",
        "kind",
        F.concat_ws(
            "", F.col("kind"), F.substring(F.regexp_replace("norm_name", " ", ""), 1, 4)
        ).alias("key"),
        F.lit(KEY_PREFIX).alias("strategy"),
    )
    return exact.unionByName(token).unionByName(prefix).dropDuplicates(
        ["entity_id", "key", "strategy"]
    )


def candidate_pairs(
    src_entities: DataFrame,
    dst_entities: DataFrame,
    max_block_pairs: int = 100_000,
) -> DataFrame:
    """→ distinct (src_id, dst_id). Cross-side equi-join per key with per-key
    caps on the fuzzy strategies; dedup across strategies."""
    sk = block_keys(src_entities, "src").withColumnRenamed("entity_id", "src_id")
    dk = block_keys(dst_entities, "dst").withColumnRenamed("entity_id", "dst_id")

    s_cnt = sk.groupBy("key", "strategy").agg(F.count("*").alias("s_n"))
    d_cnt = dk.groupBy("key", "strategy").agg(F.count("*").alias("d_n"))
    key_stats = s_cnt.join(d_cnt, ["key", "strategy"])

    # fuzzy keys: drop over-cap; exact keys: always keep (handled by AQE skew
    # splitting; semantically required pairs).
    kept = key_stats.filter(
        (F.col("strategy") == KEY_EXACT)
        | (F.col("s_n") * F.col("d_n") <= F.lit(max_block_pairs))
    ).select("key", "strategy")

    sk_kept = sk.join(F.broadcast(kept), ["key", "strategy"])
    dk_kept = dk.join(F.broadcast(kept), ["key", "strategy"])

    pairs = (
        sk_kept.join(dk_kept, ["key", "strategy"])
        .select("src_id", "dst_id")
        .dropDuplicates(["src_id", "dst_id"])
    )
    return pairs


def salted_exact_pairs(
    src_entities: DataFrame,
    dst_entities: DataFrame,
    salt_buckets: int = 16,
) -> DataFrame:
    """Explicit salted variant of the exact-key join, for hot keys ('main',
    'utils' — FIXTURES.md §3.7): the src side is split into ``salt_buckets``
    by a hash of the entity id, the dst side is replicated into every bucket,
    and the join key becomes (key, salt) — no single reducer sees a whole hot
    key. Same output as the unsalted equi-join (dedup'd); used when AQE is
    unavailable and as the skew unit test."""
    s = src_entities.select(
        "entity_id",
        F.concat_ws("", F.col("kind"), F.col("norm_name")).alias("key"),
    ).withColumn("salt", F.pmod(F.hash("entity_id"), F.lit(salt_buckets)))
    d = dst_entities.select(
        "entity_id",
        F.concat_ws("", F.col("kind"), F.col("norm_name")).alias("key"),
    ).withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return (
        s.withColumnRenamed("entity_id", "src_id")
        .join(d.withColumnRenamed("entity_id", "dst_id"), ["key", "salt"])
        .select("src_id", "dst_id")
        .dropDuplicates(["src_id", "dst_id"])
    )
