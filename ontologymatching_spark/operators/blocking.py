"""Candidate-pair blocking — replaces the reference's O(n·m) cartesian
``alignNodesOneByOne`` (AbstractMatcher.java:519-678) with key-based
equi-joins, the idea the reference itself sketches in GroupFinder
(groupFinder/GroupFinderMatcher.java:26-180: partition, match groups, match
within groups).

Strategies (all JVM-side; a pair is a candidate if it shares ANY key):
  - ``exact``  : full tier-2-normalized name → BSM tiers 1-2 never missed
  - ``tier4``  : SORTED tier-4 tokens (stem + digit-strip) → BSM tiers 3-4
                 and word-reorder (ASM inversion,
                 AdvancedSimilarityMatcher.java:31-317) never missed
  - ``token``  : each tier-4 token — a typo'd name still collides on its
                 unchanged tokens (capped)
  - ``prefix`` : first 4 chars of the squashed normalized name —
                 single-token-typo net (capped)

Scale levers:
  - per-key cap: token/prefix keys whose cross-product exceeds
    ``max_block_pairs`` are dropped (blocking stop-words — 'main', 'utils');
    the exact/tier4 keys are never dropped (their pairs are high-sim by
    construction).
  - hot exact keys are *salted* via ``salted_exact_pairs``: explicit
    replicate-small-side salting for when AQE skew splitting is unavailable
    (the north rule's explicit skew handling; unit-tested equivalent output).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

KEY_EXACT = "exact"
KEY_TIER4 = "tier4"
KEY_TOKEN = "token"
KEY_PREFIX = "prefix"

# never capped: these carry the BSM-cascade tiers
UNCAPPED = (KEY_EXACT, KEY_TIER4)


def block_keys(entities: DataFrame, side: str) -> DataFrame:
    """entities(entity_id, norm_name, nodigit_name, kind) →
    (entity_id, kind, key, strategy).

    ``kind`` is part of every key: the reference never matches classes against
    properties (alignType CLASSES/PROPERTIES, AbstractMatcher.java:147-189).
    """
    e = entities.select("entity_id", "kind", "norm_name", "nodigit_name")
    t4key = F.array_join(F.array_sort(F.split(F.col("nodigit_name"), " ")), " ")
    n_toks = F.size(F.split(F.col("norm_name"), " "))
    exact = e.select(
        "entity_id",
        "kind",
        F.concat_ws("|", F.col("kind"), F.col("norm_name")).alias("key"),
        F.lit(KEY_EXACT).alias("strategy"),
    )
    # redundant-emission pruning (shuffle volume, not recall):
    #  - token keys only for multi-token names (a single-token name's token
    #    block IS its tier4 block, which is always emitted — note tier4 must
    #    be emitted UNCONDITIONALLY: pruning it when equal to the norm name
    #    would one-sidedly drop 'parser' from the block that 'parsers' maps
    #    into, losing the stem pair)
    #  - prefix keys only for single-token names (multi-token typos are
    #    caught by the surviving tokens)
    tier4 = e.select(
        "entity_id",
        "kind",
        F.concat_ws("|", F.col("kind"), t4key).alias("key"),
        F.lit(KEY_TIER4).alias("strategy"),
    )
    token = (
        e.filter(n_toks > 1)
        .select(
            "entity_id",
            "kind",
            F.explode(F.split(F.col("nodigit_name"), " ")).alias("tok"),
        )
        .filter(F.length("tok") > 0)
        .select(
            "entity_id",
            "kind",
            F.concat_ws("|", F.col("kind"), F.col("tok")).alias("key"),
            F.lit(KEY_TOKEN).alias("strategy"),
        )
    )
    prefix = e.filter((n_toks == 1) & (F.length("norm_name") >= 4)).select(
        "entity_id",
        "kind",
        F.concat_ws(
            "|",
            F.col("kind"),
            F.substring(F.regexp_replace("norm_name", " ", ""), 1, 4),
        ).alias("key"),
        F.lit(KEY_PREFIX).alias("strategy"),
    )
    return (
        exact.unionByName(tier4)
        .unionByName(token)
        .unionByName(prefix)
        .dropDuplicates(["entity_id", "key", "strategy"])
    )


def candidate_pairs(
    src_entities: DataFrame,
    dst_entities: DataFrame,
    max_block_pairs: int = 10_000,
) -> DataFrame:
    """→ distinct (src_id, dst_id). Cross-side equi-join per key with per-key
    caps on the fuzzy strategies; dedup across strategies.

    Degenerate hot blocks (FIXTURES.md §3.7 — thousands of identical 'main'/
    'utils' names): an exact/tier4 block with s_n*d_n > max_block_pairs would
    emit a quadratic pair set whose members are all near-identical-sim; the
    1-1 selection can keep at most min(s_n, d_n) of them, and for an isolated
    equal-sim complete bipartite block greedy selection equals the rank-zip
    of the two uri-sorted sides. So oversized exact-tier blocks are resolved
    by rank-zip directly (linear, deterministic) instead of expanding n*m
    candidates. This deviates from full reference semantics only inside
    such blocks (where PSM/VMM doc similarity could reorder equal-name
    pairs); test corpora for the P/R gate keep blocks under the cap."""
    need = ["entity_id", "kind", "norm_name", "nodigit_name", "uri"]
    sk = block_keys(src_entities.select(*need), "src").withColumnRenamed(
        "entity_id", "src_id"
    )
    dk = block_keys(dst_entities.select(*need), "dst").withColumnRenamed(
        "entity_id", "dst_id"
    )
    s_uri = src_entities.select(F.col("entity_id").alias("src_id"),
                                F.col("uri").alias("s_uri"))
    d_uri = dst_entities.select(F.col("entity_id").alias("dst_id"),
                                F.col("uri").alias("d_uri"))

    s_cnt = sk.groupBy("key", "strategy").agg(F.count("*").alias("s_n"))
    d_cnt = dk.groupBy("key", "strategy").agg(F.count("*").alias("d_n"))
    key_stats = s_cnt.join(d_cnt, ["key", "strategy"])
    over_cap = F.col("s_n") * F.col("d_n") > F.lit(max_block_pairs)

    kept = key_stats.filter(~over_cap).select("key", "strategy")
    hot_exact = key_stats.filter(
        over_cap & F.col("strategy").isin(*UNCAPPED)
    ).select("key", "strategy")

    sk_kept = sk.join(F.broadcast(kept), ["key", "strategy"])
    dk_kept = dk.join(F.broadcast(kept), ["key", "strategy"])
    pairs = sk_kept.join(dk_kept, ["key", "strategy"]).select("src_id", "dst_id")

    # rank-zip the oversized exact-tier blocks
    from pyspark.sql import Window

    sk_hot = sk.join(F.broadcast(hot_exact), ["key", "strategy"]).join(s_uri, "src_id")
    dk_hot = dk.join(F.broadcast(hot_exact), ["key", "strategy"]).join(d_uri, "dst_id")
    ws = Window.partitionBy("key", "strategy").orderBy("s_uri")
    wd = Window.partitionBy("key", "strategy").orderBy("d_uri")
    zipped = (
        sk_hot.withColumn("rnk", F.row_number().over(ws))
        .select("key", "strategy", "rnk", "src_id")
        .join(
            dk_hot.withColumn("rnk", F.row_number().over(wd)).select(
                "key", "strategy", "rnk", "dst_id"
            ),
            ["key", "strategy", "rnk"],
        )
        .select("src_id", "dst_id")
    )
    return pairs.unionByName(zipped).dropDuplicates(["src_id", "dst_id"])


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
        F.concat_ws("|", F.col("kind"), F.col("norm_name")).alias("key"),
    ).withColumn("salt", F.pmod(F.hash("entity_id"), F.lit(salt_buckets)))
    d = dst_entities.select(
        "entity_id",
        F.concat_ws("|", F.col("kind"), F.col("norm_name")).alias("key"),
    ).withColumn(
        "salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1)))
    )
    return (
        s.withColumnRenamed("entity_id", "src_id")
        .join(d.withColumnRenamed("entity_id", "dst_id"), ["key", "salt"])
        .select("src_id", "dst_id")
        .dropDuplicates(["src_id", "dst_id"])
    )
