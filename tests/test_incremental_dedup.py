"""Incremental dedup/ANN (plans/incremental_dedup.py) invariants:

- MinHash: incremental clusters over a modify/add/delete snapshot are
  BIT-IDENTICAL to a from-scratch rebuild (signatures are doc-local and
  deterministic), while reusing the unchanged docs' signature rows.
- IVF below the rebuild gate: previous centroids are kept, unchanged
  vectors keep their assignment rows bit-exactly, and the top-k equals a
  full re-assignment of v2 against the SAME (previous) centroid table —
  i.e. the reuse is exact; only the index refresh is deferred, observably.
- IVF at/above the gate: full retrain, bit-identical to full_ivf on v2.
"""

from __future__ import annotations

import tempfile

import numpy as np
import pytest
from pyspark.sql import functions as F

from ontologymatching_spark.operators.ann import ivf_assign, ivf_probe_topk
from ontologymatching_spark.plans.checkpoint import CheckpointStore
from ontologymatching_spark.plans.incremental_dedup import IncrementalDedupPlan

SF = "/root/testdata/sf0.001"


def _rows(df, cols):
    return sorted(tuple(r) for r in df.select(*cols).collect())


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def doc_corpora(spark):
    v1 = (
        spark.read.parquet(f"{SF}/documents.parquet")
        .select("doc_id", "text").orderBy("doc_id").limit(150).toPandas()
    )
    v2 = v1.copy()
    # modify two docs, delete two, add two (one a near-dup of doc 0)
    v2.loc[v2.index[3], "text"] = v2.loc[v2.index[3], "text"] + " extra token"
    v2.loc[v2.index[7], "text"] = "completely new content for this doc"
    v2 = v2.drop(index=[v2.index[10], v2.index[11]]).reset_index(drop=True)
    base = int(v1["doc_id"].max())
    v2.loc[len(v2)] = {"doc_id": base + 1, "text": v1.loc[0, "text"]}
    v2.loc[len(v2)] = {"doc_id": base + 2, "text": "fresh appended document"}

    store_v1 = CheckpointStore(spark, tempfile.mkdtemp(prefix="idp_v1_"))
    out_v1 = IncrementalDedupPlan(spark, store_v1).full_minhash(
        spark.createDataFrame(v1)
    )
    out_v1["mh_clusters"].count()  # materialize every stage
    return v1, v2, store_v1, out_v1


def test_minhash_incremental_equals_rebuild(spark, doc_corpora):
    _, v2, store_v1, _ = doc_corpora
    full = IncrementalDedupPlan(
        spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="idp_f_"))
    ).full_minhash(spark.createDataFrame(v2))
    plan = IncrementalDedupPlan(
        spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="idp_i_")),
        prev_store=store_v1,
    )
    inc = plan.run_minhash(spark.createDataFrame(v2))

    sig_cols = ["doc_id", "text_sha256"] + [f"sig{j}" for j in range(16)]
    assert _rows(inc["mh_sigs"], sig_cols) == _rows(full["mh_sigs"], sig_cols)
    assert _rows(inc["mh_pairs"], ["doc_a", "doc_b", "est_jaccard"]) == _rows(
        full["mh_pairs"], ["doc_a", "doc_b", "est_jaccard"]
    )
    assert _rows(inc["mh_clusters"], ["doc_id", "component_id"]) == _rows(
        full["mh_clusters"], ["doc_id", "component_id"]
    )
    # 2 modified + 2 added; 146 unchanged signatures reused
    assert plan.last_stats["n_docs_changed"] == 4
    assert plan.last_stats["n_sigs_reused"] == len(v2) - 4


def test_minhash_noop_corpus(spark, doc_corpora):
    v1, _, store_v1, out_v1 = doc_corpora
    plan = IncrementalDedupPlan(
        spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="idp_n_")),
        prev_store=store_v1,
    )
    inc = plan.run_minhash(spark.createDataFrame(v1))
    assert plan.last_stats["n_docs_changed"] == 0
    assert _rows(inc["mh_clusters"], ["doc_id", "component_id"]) == _rows(
        out_v1["mh_clusters"], ["doc_id", "component_id"]
    )


def test_minhash_validates_prev_store(spark, doc_corpora):
    _, v2, store_v1, _ = doc_corpora
    empty = CheckpointStore(spark, tempfile.mkdtemp(prefix="idp_e_"))
    with pytest.raises(ValueError, match="incomplete"):
        IncrementalDedupPlan(
            spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="idp_e2_")),
            prev_store=empty,
        ).run_minhash(spark.createDataFrame(v2))
    # different est_min → signatures fine but fingerprint guards the params
    with pytest.raises(ValueError, match="fingerprint"):
        IncrementalDedupPlan(
            spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="idp_e3_")),
            prev_store=store_v1,
        ).run_minhash(spark.createDataFrame(v2), est_min=0.5)


# ---------------------------------------------------------------------------
# IVF
# ---------------------------------------------------------------------------

IVF_KW = dict(n_centroids=4, nprobe=2, n_iter=2, sample=64, n_salt=4, k=5)


@pytest.fixture(scope="module")
def vec_corpora(spark):
    v1 = (
        spark.read.parquet(f"{SF}/embeddings.parquet")
        .select("vec_id", "embedding").orderBy("vec_id").limit(300).toPandas()
    )
    v2 = v1.copy()
    for i in [5, 17, 42]:  # modify three vectors
        v2.at[v2.index[i], "embedding"] = np.asarray(
            v2.at[v2.index[i], "embedding"], dtype=np.float32
        ) * np.float32(0.9)
    v2 = v2.drop(index=[v2.index[50], v2.index[51]]).reset_index(drop=True)
    base = int(v1["vec_id"].max())
    for j in range(2):  # add two
        v2.loc[len(v2)] = {
            "vec_id": base + 1 + j,
            "embedding": np.asarray(v1.at[j, "embedding"], dtype=np.float32)
            * np.float32(-1.0),
        }
    store_v1 = CheckpointStore(spark, tempfile.mkdtemp(prefix="idp_iv1_"))
    out_v1 = IncrementalDedupPlan(spark, store_v1).full_ivf(
        spark.createDataFrame(v1), **IVF_KW
    )
    out_v1["ivf_topk"].count()
    return v1, v2, store_v1, out_v1


def test_ivf_below_gate_reuses_index_exactly(spark, vec_corpora):
    _, v2, store_v1, out_v1 = vec_corpora
    plan = IncrementalDedupPlan(
        spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="idp_ii_")),
        prev_store=store_v1,
    )
    v2df = spark.createDataFrame(v2)
    inc = plan.run_ivf(v2df, rebuild_frac=0.5, **IVF_KW)

    s = plan.last_stats
    assert s["index_rebuilt"] is False
    assert s["n_vectors_changed"] == 5  # 3 modified + 2 added
    assert s["n_assign_reused"] == len(v2) - 5

    # centroids carried over bit-exactly
    assert _rows(inc["ivf_centroids"], ["cid", "ce"]) == _rows(
        out_v1["ivf_centroids"], ["cid", "ce"]
    )
    # reuse is EXACT: equals re-assigning all of v2 against the previous
    # centroid table and re-running the probe tail
    ranked = ivf_assign(
        v2df, out_v1["ivf_centroids"], nprobe=IVF_KW["nprobe"]
    ).localCheckpoint()
    expect = ivf_probe_topk(
        v2df, ranked, k=IVF_KW["k"], n_salt=IVF_KW["n_salt"]
    )
    cols = ["probe_id", "cand_id", "cosine", "rnk"]
    assert _rows(inc["ivf_topk"], cols) == _rows(expect, cols)


def test_ivf_above_gate_rebuilds_identically(spark, vec_corpora):
    v1, _, store_v1, _ = vec_corpora
    # rewrite EVERY embedding → diff fraction 1.0 ≥ gate → full retrain
    v2b = v1.copy()
    v2b["embedding"] = v2b["embedding"].map(
        lambda e: np.asarray(e, dtype=np.float32) * np.float32(0.8)
    )
    v2bdf = spark.createDataFrame(v2b)
    plan = IncrementalDedupPlan(
        spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="idp_ir_")),
        prev_store=store_v1,
    )
    inc = plan.run_ivf(v2bdf, rebuild_frac=0.5, **IVF_KW)
    assert plan.last_stats["index_rebuilt"] is True
    full = IncrementalDedupPlan(
        spark, CheckpointStore(spark, tempfile.mkdtemp(prefix="idp_if_"))
    ).full_ivf(v2bdf, **IVF_KW)
    cols = ["probe_id", "cand_id", "cosine", "rnk"]
    assert _rows(inc["ivf_topk"], cols) == _rows(full["ivf_topk"], cols)
    assert _rows(inc["ivf_centroids"], ["cid", "ce"]) == _rows(
        full["ivf_centroids"], ["cid", "ce"]
    )
