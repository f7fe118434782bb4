"""Incremental re-matching: prior alignments carried over (completion
semantics), delta entities matched, result close to full recompute."""

import tempfile

from pyspark.sql import functions as F

from ontologymatching_spark.corpus.generator import generate_corpus
from ontologymatching_spark.plans.checkpoint import CheckpointStore
from ontologymatching_spark.plans.incremental import incremental_match
from ontologymatching_spark.plans.pipeline import KGPipeline


def test_incremental_match(spark):
    src_files, gold = generate_corpus(n_repos=16, files_per_repo=5, seed=11)
    org = src_files.repo.str.extract(r"org(\d+)")[0].astype(int)
    base_pd = src_files[org < 12]
    delta_pd = src_files[org >= 12]

    base = spark.createDataFrame(base_pd)
    full = spark.createDataFrame(src_files)
    delta = spark.createDataFrame(delta_pd)

    prior = KGPipeline(
        spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="inc_base_"))
    ).run(base)["alignment"]

    updated = incremental_match(spark, full, delta, prior).cache()

    # (1) every prior pair survives
    prior_pairs = {(r.src_uri, r.dst_uri) for r in prior.collect()}
    updated_pairs = {(r.src_uri, r.dst_uri) for r in updated.collect()}
    assert prior_pairs <= updated_pairs

    # (2) updated stays 1-1
    pdf = updated.toPandas()
    assert pdf["src_id"].is_unique and pdf["dst_id"].is_unique

    # (3) close to full recompute (completion semantics never re-litigates,
    # and corpus-level IDF drifts, so exact equality is not expected)
    full_align = KGPipeline(
        spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="inc_full_"))
    ).run(full)["alignment"]
    full_pairs = {(r.src_uri, r.dst_uri) for r in full_align.collect()}
    inter = len(updated_pairs & full_pairs)
    union = len(updated_pairs | full_pairs)
    assert inter / union >= 0.85, (inter, union)

    # (4) delta-side matches were actually found (more pairs than prior)
    assert len(updated_pairs) > len(prior_pairs)
