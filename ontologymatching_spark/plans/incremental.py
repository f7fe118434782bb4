"""Incremental re-matching — the Iceberg-snapshot-diff story (SCALE.md):
when new/changed files land, only the delta is matched; prior alignments are
carried over via the completion-mode filter (AbstractMatcher.java:683-717 —
"match only nodes not already mapped; copy the rest").

Correctness property (tested): for additive deltas whose entities do not
outscore existing alignments, incremental(prior, delta) == full recompute on
the union. Where a delta entity COULD outscore an existing pair, the
reference's completion mode has the same behavior (existing mappings are
kept, not re-litigated) — this is completion semantics, not an
approximation of full recompute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import blocking, matchers, selection
from ..operators.extract import extract_entities


def _prepare(src_files: DataFrame) -> DataFrame:
    e = matchers.prepare_entities(extract_entities(src_files))
    e = matchers.with_virtual_doc(e)
    org = F.regexp_extract(F.col("repo"), r"org(\d+)", 1).cast("int")
    return e.withColumn(
        "side", F.when(org % 2 == 0, F.lit("src")).otherwise(F.lit("dst"))
    ).filter(F.col("kind").isin("class", "function"))


def incremental_match(
    spark: SparkSession,
    all_src_files: DataFrame,
    delta_src_files: DataFrame,
    prior_alignment: DataFrame,
    threshold: float = 0.6,
    max_block_pairs: int = 10_000,
) -> DataFrame:
    """→ updated alignment: prior pairs + matches involving delta entities.

    Only candidate pairs touching a delta entity are generated and scored
    (blocking runs delta-side x full-other-side); completion filtering drops
    pairs whose src or dst is already mapped; the new pairs then run the
    normal 1-1 selection and union with the prior alignment.

    Note the corpus-level TF-IDF (VMM) is recomputed over the full corpus —
    IDF is a global statistic; at scale this is the stage checkpoint you
    refresh on a cadence rather than per-delta."""
    full = _prepare(all_src_files).cache()
    delta = _prepare(delta_src_files)
    delta_ids = delta.select("entity_id")

    src_e = full.filter(F.col("side") == "src")
    dst_e = full.filter(F.col("side") == "dst")
    d_src = src_e.join(delta_ids, "entity_id", "left_semi")
    d_dst = dst_e.join(delta_ids, "entity_id", "left_semi")

    # pairs touching the delta on either side
    pairs = blocking.candidate_pairs(d_src, dst_e, max_block_pairs).unionByName(
        blocking.candidate_pairs(src_e, d_dst, max_block_pairs)
    ).dropDuplicates(["src_id", "dst_id"])

    # completion: never re-litigate already-mapped entities
    pairs = selection.completion_filter(pairs, prior_alignment)

    pf = matchers.pairs_with_features(pairs, src_e, dst_e)
    pf = matchers.bsm(pf)
    pf = matchers.psm(pf)
    vm = matchers.vmm(pairs, src_e, dst_e)
    pf = pf.join(vm, ["src_id", "dst_id"], "left").fillna({"sim_vmm": 0.0})
    pf = matchers.lwc_average(pf, ["sim_bsm", "sim_psm", "sim_vmm"])
    scored = pf.select(
        "src_id", "dst_id",
        F.col("s_uri").alias("src_uri"), F.col("d_uri").alias("dst_uri"),
        F.round(F.col("sim"), 12).alias("sim"),
    )
    new_pairs = selection.select_one_to_one(scored, threshold)
    return prior_alignment.select(
        "src_id", "dst_id", "src_uri", "dst_uri", "sim"
    ).unionByName(new_pairs)
