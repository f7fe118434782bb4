"""End-to-end: pipeline vs the reference-semantics oracle (the primary bar,
SURVEY.md §5.4 / BASELINE.md P/R >= 0.95), corpus determinism, blocking
recall, resume."""

import tempfile

import pytest

from ontologymatching_spark.corpus.generator import generate_corpus
from ontologymatching_spark.operators.evaluate import precision_recall
from ontologymatching_spark.oracle.matcher_oracle import match_oracle
from ontologymatching_spark.plans.checkpoint import CheckpointStore
from ontologymatching_spark.plans.pipeline import KGPipeline


def test_corpus_deterministic():
    a_files, a_gold = generate_corpus(n_repos=6, files_per_repo=4, seed=42)
    b_files, b_gold = generate_corpus(n_repos=6, files_per_repo=4, seed=42)
    assert a_files.equals(b_files)
    assert a_gold.equals(b_gold)
    # perturbation tiers all present at this size
    assert set(a_gold["tier"]) >= {1, 2, 3}


@pytest.fixture(scope="module")
def e2e(spark, small_corpus):
    src_files, gold = small_corpus
    sf = spark.createDataFrame(src_files)
    store = CheckpointStore(spark, tempfile.mkdtemp(prefix="kg_e2e_"))
    out = KGPipeline(spark, store).run(sf)
    is_src = src_files.repo.str.extract(r"org(\d+)")[0].astype(int) % 2 == 0
    oracle = match_oracle(src_files[is_src], src_files[~is_src])
    return out, oracle, store


def test_pr_vs_oracle(spark, e2e):
    out, oracle, _ = e2e
    pr = precision_recall(out["alignment"], spark.createDataFrame(oracle))
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr


def test_alignment_is_one_to_one(e2e):
    out, _, _ = e2e
    a = out["alignment"].toPandas()
    assert a["src_id"].is_unique
    assert a["dst_id"].is_unique


def test_canonical_ids(e2e):
    out, _, _ = e2e
    nodes = out["nodes"].toPandas()
    # every aligned pair shares a canonical id; canonical = min entity_id
    align = out["alignment"].toPandas()
    canon = dict(zip(nodes["entity_id"], nodes["canonical_id"]))
    for r in align.itertuples():
        assert canon[r.src_id] == canon[r.dst_id]
        assert canon[r.src_id] <= min(r.src_id, r.dst_id)


def test_resume_skips_completed(spark, small_corpus, e2e):
    _, _, store = e2e
    src_files, _ = small_corpus
    sf = spark.createDataFrame(src_files)
    # all manifests exist → run() must be pure read-back (no recompute):
    # invalidating nothing, stage() short-circuits; verify by checking the
    # alignment manifest is not rewritten
    import os

    mpath = store._manifest_path("alignment")
    mtime = os.path.getmtime(mpath)
    out2 = KGPipeline(spark, store).run(sf)
    assert os.path.getmtime(mpath) == mtime
    assert out2["alignment"].count() == store.manifest("alignment")["rows"]


def test_mid_pipeline_restart(spark, small_corpus, e2e):
    out, _, store = e2e
    src_files, _ = small_corpus
    sf = spark.createDataFrame(src_files)
    n_before = out["alignment"].count()
    for st in ["alignment", "nodes", "edges"]:
        store.invalidate(st)
    out2 = KGPipeline(spark, store).run(sf)
    assert out2["alignment"].count() == n_before


def test_structural_boost_pipeline(spark, small_corpus):
    """Optional DSI boost stage runs end-to-end and keeps a valid 1-1
    alignment (rows-only check — the oracle models the base ensemble)."""
    import tempfile

    from ontologymatching_spark.plans.pipeline import PipelineConfig

    src_files, _ = small_corpus
    out = KGPipeline(
        spark,
        CheckpointStore(spark, tempfile.mkdtemp(prefix="kg_boost_")),
        PipelineConfig(structural_boost=True),
    ).run(spark.createDataFrame(src_files))
    a = out["alignment"].toPandas()
    assert len(a) > 0
    assert a["src_id"].is_unique and a["dst_id"].is_unique


def test_kill_and_restart(spark, small_corpus):
    """Kill-and-restart (FIXTURES.md §3.9): crash injected between stages —
    restart completes without recomputing the stages finished before the
    crash."""
    import os
    import tempfile

    src_files, _ = small_corpus
    sf = spark.createDataFrame(src_files)
    store = CheckpointStore(spark, tempfile.mkdtemp(prefix="kg_kill_"))

    os.environ["KG_FAIL_BEFORE_STAGE"] = "scored_pairs"
    try:
        with pytest.raises(RuntimeError, match="injected crash"):
            KGPipeline(spark, store).run(sf)
    finally:
        del os.environ["KG_FAIL_BEFORE_STAGE"]

    # stages before the crash are committed
    for done in ["triples", "entities", "prepared", "candidate_pairs"]:
        assert store.is_complete(done), done
    assert not store.is_complete("scored_pairs")
    mtimes = {
        s: os.path.getmtime(store._manifest_path(s))
        for s in ["triples", "entities", "prepared", "candidate_pairs"]
    }

    out = KGPipeline(spark, store).run(sf)  # restart
    assert out["alignment"].count() > 0
    for s, m in mtimes.items():
        assert os.path.getmtime(store._manifest_path(s)) == m, s


def test_threshold_sweep(spark, e2e, small_corpus):
    from ontologymatching_spark.operators.threshold_analysis import threshold_sweep

    out, oracle, _ = e2e
    scored = out["scored_pairs"].cache()
    gold = spark.createDataFrame(oracle)  # oracle alignment as gold
    sweep = threshold_sweep(scored, gold, thresholds=[0.5, 0.6, 0.8])
    assert [r["threshold"] for r in sweep] == [0.5, 0.6, 0.8]
    # precision rises (weakly) with threshold; at the pipeline's own 0.6 the
    # alignment equals the oracle exactly
    at06 = [r for r in sweep if r["threshold"] == 0.6][0]
    assert at06["precision"] == 1.0 and at06["recall"] == 1.0
    assert sweep[2]["found"] <= sweep[1]["found"] <= sweep[0]["found"]


def test_pr_vs_oracle_second_seed(spark):
    """P/R gate on an independent corpus (different seed, more repos) —
    guards against overfitting blocking/selection to the seed-42 fixture."""
    import tempfile

    src_files, _ = generate_corpus(n_repos=20, files_per_repo=8, seed=7)
    out = KGPipeline(
        spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="kg_seed7_"))
    ).run(spark.createDataFrame(src_files))
    is_src = src_files.repo.str.extract(r"org(\d+)")[0].astype(int) % 2 == 0
    oracle = match_oracle(src_files[is_src], src_files[~is_src])
    pr = precision_recall(out["alignment"], spark.createDataFrame(oracle))
    assert pr["precision"] >= 0.95, pr
    assert pr["recall"] >= 0.95, pr


def test_iism_boost_pipeline(spark, small_corpus):
    import tempfile

    from ontologymatching_spark.plans.pipeline import PipelineConfig

    src_files, _ = small_corpus
    out = KGPipeline(
        spark,
        CheckpointStore(spark, tempfile.mkdtemp(prefix="kg_iism_")),
        PipelineConfig(structural_boost="iism"),
    ).run(spark.createDataFrame(src_files))
    a = out["alignment"].toPandas()
    assert len(a) > 0
    assert a["src_id"].is_unique and a["dst_id"].is_unique


def test_checkpoint_format_gating(spark):
    """fmt='iceberg' needs a configured catalog (jar absent locally) — the
    store must fail fast with a clear message; unknown formats rejected."""
    from ontologymatching_spark.plans.checkpoint import CheckpointStore

    with pytest.raises(RuntimeError, match="spark.sql.catalog.lake"):
        CheckpointStore(spark, "lake.kg", fmt="iceberg")
    with pytest.raises(ValueError, match="unknown checkpoint format"):
        CheckpointStore(spark, "/tmp/x", fmt="orc")
