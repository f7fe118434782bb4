"""Incremental re-matching (plans/incremental.py): the hard invariant is
REBUILD EQUALITY — running the incremental pipeline on corpus v2 against the
v1 checkpoint store produces bit-identical outputs to a from-scratch
KGPipeline run on v2 — while re-parsing only the changed files and
re-scoring only pairs with a changed endpoint."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F

from ontologymatching_spark.corpus.generator import generate_corpus
from ontologymatching_spark.plans.checkpoint import CheckpointStore
from ontologymatching_spark.plans.incremental import (
    IncrementalKGPipeline,
    incremental_match,
)
from ontologymatching_spark.plans.pipeline import KGPipeline


def test_incremental_match_completion_semantics(spark):
    """Mode 1 (completion): prior pairs survive verbatim, delta matches are
    added, result stays 1-1 and close to a full recompute."""
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


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


ALIGN_COLS = ["src_uri", "dst_uri", "sim"]
SCORED_COLS = ["src_id", "dst_id", "src_uri", "dst_uri",
               "sim_bsm", "sim_psm", "sim_vmm", "sim"]
NODE_COLS = ["canonical_id", "entity_id", "uri", "kind", "repo", "path",
             "content_sha256"]
EDGE_COLS = ["src_canonical", "dst_canonical", "pred", "repo", "path"]


def _mutate(v1):
    """v2 = v1 with one source file rewritten (entity renamed), one target
    file rewritten, one brand-new file, one file removed."""
    v2 = v1.copy()
    # rename an entity inside an existing src-side file (org0000 is src)
    i_src = v2.index[v2.repo.str.startswith("org0000")][0]
    v2.loc[i_src, "content"] = v2.loc[i_src, "content"].replace(
        "class", "class Renamed", 1
    )
    # rewrite a dst-side file (org0001)
    i_dst = v2.index[v2.repo.str.startswith("org0001")][0]
    v2.loc[i_dst, "content"] = (
        v2.loc[i_dst, "content"] + "\nclass FreshlyAddedWidget {\n}\n"
    )
    # remove one file, add one new file
    drop_idx = v2.index[v2.repo.str.startswith("org0002")][0]
    v2 = v2.drop(index=drop_idx).reset_index(drop=True)
    new_row = v1.iloc[0].copy()
    new_row["path"] = "src/new/added000.scala"
    new_row["content"] = "class AddedHelper {\n}\ndef addedLoad(): Unit = {}\n"
    v2.loc[len(v2)] = new_row
    return v2


@pytest.fixture(scope="module")
def corpora(spark):
    v1, _ = generate_corpus(n_repos=8, files_per_repo=5, seed=11)
    v2 = _mutate(v1)
    store_v1 = CheckpointStore(spark, tempfile.mkdtemp(prefix="inc_v1_"))
    out_v1 = KGPipeline(spark, store_v1).run(spark.createDataFrame(v1))
    out_v1["alignment"].count()  # materialize every stage
    out_v1["edges"].count()
    return v1, v2, store_v1, out_v1


def test_incremental_equals_full_rebuild(spark, corpora):
    _, v2, store_v1, _ = corpora
    full = KGPipeline(
        spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="inc_full_"))
    ).run(spark.createDataFrame(v2))
    inc = IncrementalKGPipeline(
        spark, store_v1, CheckpointStore(spark, tempfile.mkdtemp(prefix="inc_new_"))
    ).run(spark.createDataFrame(v2))

    assert _rows(inc["scored_pairs"], SCORED_COLS) == _rows(
        full["scored_pairs"], SCORED_COLS
    )
    assert _rows(inc["alignment"], ALIGN_COLS) == _rows(
        full["alignment"], ALIGN_COLS
    )
    assert _rows(inc["nodes"], NODE_COLS) == _rows(full["nodes"], NODE_COLS)
    assert _rows(inc["edges"], EDGE_COLS) == _rows(full["edges"], EDGE_COLS)


def test_incremental_rescores_only_the_diff(spark, corpora):
    _, v2, store_v1, _ = corpora
    pipe = IncrementalKGPipeline(
        spark, store_v1, CheckpointStore(spark, tempfile.mkdtemp(prefix="inc_s_"))
    )
    pipe.run(spark.createDataFrame(v2))
    s = pipe.last_stats
    # 3 touched files (2 rewrites + 1 added); the removed file is not in v2
    assert s["n_files_changed"] == 3
    assert s["n_files"] == len(v2)
    # the overwhelming majority of pairs reuse their previous BSM/PSM rows
    assert 0 < s["n_pairs_rescored"] < s["n_pairs"] / 2


def test_incremental_noop_corpus(spark, corpora):
    v1, _, store_v1, out_v1 = corpora
    pipe = IncrementalKGPipeline(
        spark, store_v1, CheckpointStore(spark, tempfile.mkdtemp(prefix="inc_n_"))
    )
    inc = pipe.run(spark.createDataFrame(v1))
    assert pipe.last_stats["n_files_changed"] == 0
    assert pipe.last_stats["n_pairs_rescored"] == 0
    assert _rows(inc["alignment"], ALIGN_COLS) == _rows(
        out_v1["alignment"], ALIGN_COLS
    )


def test_incremental_validates_prev_store(spark, corpora):
    """ADVICE r04: an incomplete prev store or one written under different
    matcher code/config must fail fast in __init__, not surface as an opaque
    mid-plan error or silently reuse stale scores."""
    from ontologymatching_spark.plans.pipeline import PipelineConfig

    _, _, store_v1, _ = corpora
    empty = CheckpointStore(spark, tempfile.mkdtemp(prefix="inc_e_"))
    with pytest.raises(ValueError, match="incomplete"):
        IncrementalKGPipeline(
            spark, empty, CheckpointStore(spark, tempfile.mkdtemp(prefix="inc_e2_"))
        )
    with pytest.raises(ValueError, match="fingerprint"):
        IncrementalKGPipeline(
            spark, store_v1,
            CheckpointStore(spark, tempfile.mkdtemp(prefix="inc_e3_")),
            config=PipelineConfig(threshold=0.7),
        )
    # deliberate override stays available
    IncrementalKGPipeline(
        spark, store_v1,
        CheckpointStore(spark, tempfile.mkdtemp(prefix="inc_e4_")),
        config=PipelineConfig(threshold=0.7), check_fingerprint=False,
    )


def test_incremental_lineage_survives(spark, corpora):
    """Every incremental nodes row still carries the sha256 of its v2
    source file (the per-row invariant from BASELINE.json's input_hint)."""
    _, v2, store_v1, _ = corpora
    inc = IncrementalKGPipeline(
        spark, store_v1, CheckpointStore(spark, tempfile.mkdtemp(prefix="inc_l_"))
    ).run(spark.createDataFrame(v2))
    v2df = spark.createDataFrame(v2).withColumn(
        "sha", F.sha2(F.col("content"), 256)
    )
    bad = inc["nodes"].join(
        v2df.select("repo", "path", "sha"), ["repo", "path"]
    ).filter(F.col("content_sha256") != F.col("sha"))
    assert bad.count() == 0
