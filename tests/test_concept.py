"""ConceptMatcher (conceptMatcher/ConceptMatcher.java:183-331) — parity of
operators.concept.concept_match against a faithful pure-Python port of the
reference's alignTwoNodes, including the dup-preserving Union/Intersection
quirk (:207-262) and the LCS-*subsequence* text kernel (:318-331)."""

import math

import pytest
from pyspark.sql import functions as F

from ontologymatching_spark.functions import simkernels
from ontologymatching_spark.operators.concept import (
    DEFAULT_WEIGHTS, ancestor_closure, concept_match, descendant_closure,
)


# --- pure-Python port of the reference loops --------------------------------

def port_descendants(node, children, names):
    """GetDescendants (:183-193): recursive child walk, concept per node
    (concept == name — the documented algorithm with WordNet removed)."""
    out = []
    for c in children.get(node, []):
        out.append(names[c])
        out.extend(port_descendants(c, children, names))
    return out


def port_ancestors(node, parent, names):
    """GetAncestors (:195-205) + the javadoc's 'plus the node itself'
    (:286-287)."""
    out = [names[node]]
    n = node
    while n in parent:
        n = parent[n]
        out.append(names[n])
    return out


def port_multiset_jaccard(l1, l2):
    """GetJaccardScore (:207-214) with Union=concat (:216-224) and the
    dup-suffix multiset Intersection (:226-262)."""
    union_n = len(l1) + len(l2)
    if union_n == 0:
        return 0.0
    c1, c2 = {}, {}
    for x in l1:
        c1[x] = c1.get(x, 0) + 1
    for x in l2:
        c2[x] = c2.get(x, 0) + 1
    inter = sum(min(n, c2.get(x, 0)) for x, n in c1.items())
    return inter / union_n


def port_align(sname, dname, s_node, d_node, s_children, d_children,
               s_parent, d_parent, s_names, d_names,
               weights=DEFAULT_WEIGHTS):
    """alignTwoNodes (:271-316)."""
    w_desc, w_anc, w_text = weights
    d1 = port_descendants(s_node, s_children, s_names)
    d2 = port_descendants(d_node, d_children, d_names)
    a1 = port_ancestors(s_node, s_parent, s_names)
    a2 = port_ancestors(d_node, d_parent, d_names)
    desc = port_multiset_jaccard(d1, d2)
    anc = port_multiset_jaccard(a1, a2)
    txt = simkernels.lcs_text_sim(sname, dname)
    return (desc * w_desc + anc * w_anc + txt * w_text) / (
        w_desc + w_anc + w_text
    )


# --- fixtures: two small trees with shared + divergent names ---------------

# src tree: ids 0..9; dst tree: ids 0..8. Duplicate names on purpose
# (both sides have two 'widget' leaves) to exercise the multiset counting.
SRC_NODES = {
    0: "root", 1: "vehicle", 2: "person", 3: "truck", 4: "car",
    5: "driver", 6: "widget", 7: "widget", 8: "sedan", 9: "coupe",
}
SRC_PARENT = {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 3, 7: 4, 8: 4, 9: 4}
DST_NODES = {
    0: "root", 1: "vehicle", 2: "human", 3: "truck", 4: "automobile",
    5: "driver", 6: "widget", 7: "widget", 8: "sedan",
}
DST_PARENT = {1: 0, 2: 0, 3: 1, 4: 1, 5: 2, 6: 3, 7: 3, 8: 4}


def _children(parent):
    ch = {}
    for c, p in parent.items():
        ch.setdefault(p, []).append(c)
    for v in ch.values():
        v.sort()
    return ch


@pytest.fixture(scope="module")
def dfs(spark):
    src_nodes = spark.createDataFrame(
        [(k, v) for k, v in SRC_NODES.items()], "node_id long, name string"
    )
    dst_nodes = spark.createDataFrame(
        [(k, v) for k, v in DST_NODES.items()], "node_id long, name string"
    )
    src_edges = spark.createDataFrame(
        [(c, p) for c, p in SRC_PARENT.items()],
        "child_id long, parent_id long",
    )
    dst_edges = spark.createDataFrame(
        [(c, p) for c, p in DST_PARENT.items()],
        "child_id long, parent_id long",
    )
    pairs = spark.createDataFrame(
        [(s, d) for s in SRC_NODES for d in DST_NODES],
        "src_id long, dst_id long",
    )
    return src_nodes, dst_nodes, src_edges, dst_edges, pairs


def test_closures_match_port(spark, dfs):
    src_nodes, _, src_edges, _, _ = dfs
    ch = _children(SRC_PARENT)
    got_desc = {
        (r.node_id, r.desc_id)
        for r in descendant_closure(src_edges).collect()
    }
    want_desc = set()

    def walk(n):
        out = []
        for c in ch.get(n, []):
            out.append(c)
            out.extend(walk(c))
        return out

    for n in SRC_NODES:
        for d in walk(n):
            want_desc.add((n, d))
    assert got_desc == want_desc

    got_anc = {
        (r.node_id, r.anc_id) for r in ancestor_closure(src_edges).collect()
    }
    want_anc = set()
    for n in SRC_NODES:
        m = n
        while m in SRC_PARENT:
            m = SRC_PARENT[m]
            want_anc.add((n, m))
    assert got_anc == want_anc


def test_concept_match_parity_all_pairs(spark, dfs):
    src_nodes, dst_nodes, src_edges, dst_edges, pairs = dfs
    out = concept_match(
        pairs, src_nodes, dst_nodes, src_edges, dst_edges
    ).collect()
    assert len(out) == len(SRC_NODES) * len(DST_NODES)
    s_children, d_children = _children(SRC_PARENT), _children(DST_PARENT)
    for r in out:
        want = port_align(
            SRC_NODES[r.src_id], DST_NODES[r.dst_id], r.src_id, r.dst_id,
            s_children, d_children, SRC_PARENT, DST_PARENT,
            SRC_NODES, DST_NODES,
        )
        assert math.isclose(r.sim, round(want, 12), abs_tol=1e-9), (
            r.src_id, r.dst_id, r.sim, want,
        )


def test_known_values(spark, dfs):
    """Hand-checked cells: identical subtrees score high, disjoint ones 0."""
    src_nodes, dst_nodes, src_edges, dst_edges, pairs = dfs
    out = {
        (r.src_id, r.dst_id): r
        for r in concept_match(
            pairs, src_nodes, dst_nodes, src_edges, dst_edges
        ).collect()
    }
    # src truck(3) has desc {widget}, dst truck(3) desc {widget, widget}:
    # multiset inter=1, union=3 → 1/3; ancestors both {truck, vehicle, root}
    # → 3/6 = 0.5; text identical 'truck' → lcs 5/10 = 0.5
    r = out[(3, 3)]
    assert math.isclose(r.desc_sim, 1 / 3, abs_tol=1e-12)
    assert math.isclose(r.anc_sim, 0.5, abs_tol=1e-12)
    assert math.isclose(r.text_sim, 0.5, abs_tol=1e-12)
    assert math.isclose(r.sim, round((1 / 3 + 0.5 + 0.5) / 3, 12), abs_tol=1e-12)
    # leaf-vs-leaf with no descendants: desc_sim must be the 0/0 → 0 branch
    r = out[(9, 8)]  # coupe vs sedan, both leaves
    assert r.desc_sim == 0.0


def test_lcs_subseq_quirk():
    """The reference's 'LongestCommonSubstringLength' computes the
    SUBSEQUENCE (max-recurrence DP) — preserve the quirk."""
    assert simkernels.lcs_subseq_len("abcdef", "acf") == 3  # not a substring
    assert simkernels.lcs_subseq_len("truck", "truck") == 5
    assert simkernels.lcs_subseq_len("", "abc") == 0
    assert simkernels.lcs_text_sim("", "") == 0.0
