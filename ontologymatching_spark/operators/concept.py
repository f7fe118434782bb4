"""ConceptMatcher: ancestor/descendant concept-set Jaccard + text blend.

Re-expresses the reference's ConceptMatcher
(`agreementmaker/AgreementMaker-OSGi/AgreementMaker-Matchers/src/main/java/
am/matcher/conceptMatcher/ConceptMatcher.java:264-331`, VERDICT r04 missing
item #1) as DataFrame joins:

  sim = (W1*DescendantSim + W2*AncestorSim + W3*TextSim) / (W1+W2+W3)

- DescendantSim / AncestorSim are the reference's quirky "Jaccard": the
  UNION is a dup-preserving concatenation (`Union`, :216-224), so the score
  is multiset_intersection_size / (|L1| + |L2|) — NOT |∩|/|∪| — and an
  empty union returns 0 (:207-214). The multiset intersection counts each
  concept min(count1, count2) times (the dup-suffix trick at :226-262).
- Concepts: the reference's live code degenerates after the GPL-parser
  removal (htConcepts maps every name to "", :91-105, and target-side
  lookups miss entirely) — we implement the DOCUMENTED algorithm
  (:274-292): each node is represented by its concept, which without
  WordNet reduces to the node's local name. Ancestor sets include the node
  itself per the javadoc (:286-287).
- TextSim = LCS-subsequence(srcName, dstName) / (len1+len2) (:307-308,
  :318-331 — the method says "Substring" but computes the subsequence; the
  quirk is preserved in simkernels.lcs_subseq_len).
- Default weights 0.75/0.75/0.75 (ConceptMatcherParameters.java:7-9) —
  equal, so the blend is the plain mean.

Scale design: the per-pair set intersections are RELATIONAL, never
array-valued — closure tables (node, concept, cnt) join to the pair list on
the concept value and aggregate min(cnt_s, cnt_d), so nothing wider than a
(pair, concept) row ever shuffles and a root node's O(n) descendant set is
spread over its rows rather than carried as one giant array (CLAUDE.md:
ship narrow rows, not fat arrays). The closure itself is a level-by-level
frontier join bounded by the tree depth (O(log n) rounds on the pipeline's
module trees), checkpointed every few levels like similarity_flooding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions.spark_sims import lcs_text_sim_udf

DEFAULT_WEIGHTS = (0.75, 0.75, 0.75)  # ConceptMatcherParameters.java:7-9


def ancestor_closure(
    parent_edges: DataFrame,
    max_levels: int = 30,
) -> DataFrame:
    """(child_id, parent_id) edges → (node_id, anc_id) transitive closure,
    NOT including the node itself. Level-by-level frontier propagation:
    round k holds the distance-k pairs only, so per-round shuffle volume is
    the frontier, not the whole closure (the similarity_flooding r4
    lesson); each frontier is localCheckpointed (the isEmpty probe forces a
    job anyway, and later levels must not re-run earlier joins). Stops
    early when a frontier empties; ``max_levels`` bounds pathological
    cycles."""
    edges = parent_edges.select(
        F.col("child_id").alias("node_id"), F.col("parent_id").alias("anc_id")
    ).dropDuplicates()
    frontier = edges.localCheckpoint(eager=False)
    levels = [frontier]
    for _lvl in range(1, max_levels):
        nxt = (
            frontier.join(
                edges.select(
                    F.col("node_id").alias("anc_id"),
                    F.col("anc_id").alias("next_anc"),
                ),
                "anc_id",
            )
            .select("node_id", F.col("next_anc").alias("anc_id"))
            .dropDuplicates()
        ).localCheckpoint(eager=False)  # materialized by the isEmpty probe
        if nxt.isEmpty():
            break
        frontier = nxt
        levels.append(frontier)
    out = levels[0]
    for f in levels[1:]:
        out = out.unionByName(f)
    # a DAG can reach the same ancestor along several paths → set semantics
    return out.dropDuplicates()


def descendant_closure(parent_edges: DataFrame, max_levels: int = 30) -> DataFrame:
    """(child_id, parent_id) → (node_id, desc_id): transpose of the
    ancestor closure."""
    return ancestor_closure(
        parent_edges.select(
            F.col("parent_id").alias("child_id"),
            F.col("child_id").alias("parent_id"),
        ),
        max_levels=max_levels,
    ).select(F.col("node_id"), F.col("anc_id").alias("desc_id"))


def _concept_counts(
    closure: DataFrame, nodes: DataFrame, member_col: str
) -> DataFrame:
    """closure(node_id, member_col) + nodes(node_id, name) →
    (node_id, concept, cnt): each node's concept MULTISET as counted rows
    (ConceptMatcher represents set members by their concept string, so two
    children with the same name contribute count 2)."""
    names = nodes.select(
        F.col("node_id").alias(member_col), F.col("name").alias("concept")
    )
    return (
        closure.join(names, member_col)
        .groupBy("node_id", "concept")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def concept_match(
    pairs: DataFrame,
    src_nodes: DataFrame,
    dst_nodes: DataFrame,
    src_parent_edges: DataFrame,
    dst_parent_edges: DataFrame,
    weights: tuple[float, float, float] = DEFAULT_WEIGHTS,
    text_sim=None,
    max_levels: int = 30,
) -> DataFrame:
    """ConceptMatcher over candidate ``pairs(src_id, dst_id)``.

    ``src_nodes``/``dst_nodes``: (node_id, name); ``*_parent_edges``:
    (child_id, parent_id). ``text_sim``: optional (srcCol, dstCol) → Column
    kernel override — the default is the reference's LCS-subsequence ratio
    as a pandas UDF; bench oracles substitute an engine-portable kernel the
    same way q_asm_content_words does.

    Returns (src_id, dst_id, desc_sim, anc_sim, text_sim, sim) with ``sim``
    rounded to 12 decimals (repo determinism invariant)."""
    w_desc, w_anc, w_text = weights
    p = pairs.select("src_id", "dst_id")

    # ONE closure loop for everything (latency, not compute: each closure
    # level is 2 blocking driver actions, and 4 independent loops — anc/desc
    # x src/dst — made concept_match a 130-stage, driver-latency-bound plan
    # with ~4x less executor work than wall). Both sides' edges run through
    # a single loop under a (side, id) struct key — components are disjoint,
    # so the union closure IS the union of the per-side closures — and the
    # descendant closure is the TRANSPOSE of the ancestor closure's result
    # (descendants of X = nodes whose ancestor is X), never a second loop.
    def _tag(edges, side):
        return edges.select(
            F.struct(
                F.lit(side).alias("s"), F.col("child_id").alias("i")
            ).alias("child_id"),
            F.struct(
                F.lit(side).alias("s"), F.col("parent_id").alias("i")
            ).alias("parent_id"),
        )

    anc_all = ancestor_closure(
        _tag(src_parent_edges, 0).unionByName(_tag(dst_parent_edges, 1)),
        max_levels,
    ).localCheckpoint()

    def _side(side):
        return anc_all.filter(F.col("node_id.s") == side).select(
            F.col("node_id.i").alias("node_id"), F.col("anc_id.i").alias("anc_id")
        )

    anc_closure_s, anc_closure_d = _side(0), _side(1)
    desc_closure_s = anc_closure_s.select(
        F.col("anc_id").alias("node_id"), F.col("node_id").alias("desc_id")
    )
    desc_closure_d = anc_closure_d.select(
        F.col("anc_id").alias("node_id"), F.col("node_id").alias("desc_id")
    )

    desc_counts_s = _concept_counts(desc_closure_s, src_nodes, "desc_id")
    desc_counts_d = _concept_counts(desc_closure_d, dst_nodes, "desc_id")
    # ancestor sets include the node itself (ConceptMatcher.java:286-287)
    self_s = src_nodes.select(
        F.col("node_id"), F.col("node_id").alias("anc_id")
    )
    self_d = dst_nodes.select(
        F.col("node_id"), F.col("node_id").alias("anc_id")
    )
    anc_counts_s = _concept_counts(
        anc_closure_s.unionByName(self_s), src_nodes, "anc_id"
    )
    anc_counts_d = _concept_counts(
        anc_closure_d.unionByName(self_d), dst_nodes, "anc_id"
    )

    # the two sides' count tables differ, so score each side's table pair
    desc = _pair_multiset_score_two_sided(
        p, desc_counts_s, desc_counts_d, "desc_sim"
    )
    anc = _pair_multiset_score_two_sided(
        p, anc_counts_s, anc_counts_d, "anc_sim"
    )

    sn = src_nodes.select(
        F.col("node_id").alias("src_id"), F.col("name").alias("s_name")
    )
    dn = dst_nodes.select(
        F.col("node_id").alias("dst_id"), F.col("name").alias("d_name")
    )
    named = p.join(sn, "src_id").join(dn, "dst_id")
    if text_sim is None:
        tcol = lcs_text_sim_udf(F.col("s_name"), F.col("d_name"))
    else:
        tcol = text_sim(F.col("s_name"), F.col("d_name"))
    text = named.select("src_id", "dst_id", tcol.alias("text_sim"))

    wsum = w_desc + w_anc + w_text
    return (
        p.join(desc, ["src_id", "dst_id"])
        .join(anc, ["src_id", "dst_id"])
        .join(text, ["src_id", "dst_id"])
        .withColumn(
            "sim",
            F.round(
                (
                    F.col("desc_sim") * F.lit(w_desc)
                    + F.col("anc_sim") * F.lit(w_anc)
                    + F.col("text_sim") * F.lit(w_text)
                )
                / F.lit(wsum),
                12,
            ),
        )
    )


def _pair_multiset_score_two_sided(
    pairs: DataFrame,
    counts_s: DataFrame,
    counts_d: DataFrame,
    out_col: str,
) -> DataFrame:
    """Like _pair_multiset_score but with distinct src/dst count tables
    (the two ontologies have independent closures)."""
    sizes_s = counts_s.groupBy("node_id").agg(F.sum("cnt").alias("sz_s"))
    sizes_d = counts_d.groupBy("node_id").agg(F.sum("cnt").alias("sz_d"))
    cs = counts_s.select(
        F.col("node_id").alias("src_id"), "concept", F.col("cnt").alias("c_s")
    )
    cd = counts_d.select(
        F.col("node_id").alias("dst_id"), "concept", F.col("cnt").alias("c_d")
    )
    inter = (
        pairs.join(cs, "src_id")
        .join(cd, ["dst_id", "concept"])
        .groupBy("src_id", "dst_id")
        .agg(F.sum(F.least("c_s", "c_d")).alias("inter"))
    )
    return (
        pairs.join(sizes_s.withColumnRenamed("node_id", "src_id"), "src_id", "left")
        .join(sizes_d.withColumnRenamed("node_id", "dst_id"), "dst_id", "left")
        .join(inter, ["src_id", "dst_id"], "left")
        .withColumn(
            out_col,
            F.when(
                F.coalesce("sz_s", F.lit(0)) + F.coalesce("sz_d", F.lit(0))
                == 0,
                F.lit(0.0),
            ).otherwise(
                F.coalesce("inter", F.lit(0)).cast("double")
                / (
                    F.coalesce("sz_s", F.lit(0)) + F.coalesce("sz_d", F.lit(0))
                ).cast("double")
            ),
        )
        .select("src_id", "dst_id", out_col)
    )
