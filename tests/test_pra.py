"""PRAMatcher subtree-pairing (Matcher-PRA/.../PRAMatcher.java:71-651) —
parity of operators.pra.pra_block_pairs against a faithful pure-Python port
of setMatchingPairs (:246-277), the createPRATrees DFS cut (:407-480) and
alignNodes' pair enumeration (:481-614) on a two-tree fixture."""

import pytest

from ontologymatching_spark.operators.pra import (
    ancestor_closure_with_dist, pra_block_pairs, pra_subtree_roots,
)


# --- pure-Python port of the reference loops --------------------------------

def port_pra(src_children, dst_children, src_roots, dst_roots, alignment):
    """Returns (matched_pairs, unmatched_pairs) exactly as the reference
    enumerates them. ``*_children``: dict node -> ordered child list;
    ``alignment``: [(src, dst, sim)] scanned like setMatchingPairs (targets
    ascending, so the LAST nonzero overwrite is the max target id)."""
    matched_s, matched_d, matched_to = set(), set(), {}
    for s, d, v in sorted(alignment, key=lambda x: (x[0], x[1])):
        if v != 0.0:
            matched_s.add(s)
            matched_d.add(d)
            matched_to[s] = d  # overwrite: last (= max) target wins

    def cut(children, matched, roots):
        """createPRATrees: post-order DFS; matched children are removed
        from their parent and become subtree roots."""
        kids = {n: list(c) for n, c in children.items()}
        matched_roots, unmatched_roots = [], []

        def rec(n):
            for c in list(kids.get(n, [])):
                rec(c)
            for c in list(kids.get(n, [])):
                if c in matched:
                    matched_roots.append(c)
                    kids[n].remove(c)

        for r in roots:
            rec(r)
            (matched_roots if r in matched else unmatched_roots).append(r)
        return kids, matched_roots, unmatched_roots

    def subtree(kids, n):
        out = [n]
        for c in kids.get(n, []):
            out.extend(subtree(kids, c))
        return out

    s_kids, s_mroots, s_uroots = cut(src_children, matched_s, src_roots)
    d_kids, d_mroots, d_uroots = cut(dst_children, matched_d, dst_roots)

    matched_pairs = set()
    for S in s_mroots:
        T = matched_to[S]
        for a in subtree(s_kids, S):
            for b in subtree(d_kids, T):
                matched_pairs.add((a, b))
    unmatched_pairs = set()
    for U in s_uroots:
        for V in d_uroots:
            for a in subtree(s_kids, U):
                for b in subtree(d_kids, V):
                    unmatched_pairs.add((a, b))
    return matched_pairs, unmatched_pairs


# --- fixture: two trees, nested matches, multi-target match, unmatched -----

# src tree (ids 0..11): 0 is root; 10 is a SECOND root (forest).
SRC_CHILDREN = {
    0: [1, 2], 1: [3, 4], 2: [5], 3: [6, 7], 5: [8, 9], 10: [11],
}
SRC_ROOTS = [0, 10]
# dst tree (ids 0..10): 0 root; 9 second root.
DST_CHILDREN = {0: [1, 2], 1: [3], 2: [4, 5], 3: [6, 7], 5: [8], 9: [10]}
DST_ROOTS = [0, 9]
# prior alignment: root 0<->0 matched; nested matched pair 1<->1 under it;
# src 3 matched to BOTH 3 and 5 (matchedTo must pick 5); 5<->4; src subtree
# at 10 and dst subtree at 9 unmatched.
ALIGNMENT = [
    (0, 0, 1.0),
    (1, 1, 0.9),
    (3, 3, 0.8),
    (3, 5, 0.7),   # overwrite: matchedTo(3) = 5
    (5, 4, 0.85),
    (4, 6, 0.0),   # zero sim → NOT a match (setMatchingPairs :264)
]


def _edges(children):
    return [(c, p) for p, cs in children.items() for c in cs]


@pytest.fixture(scope="module")
def dfs(spark):
    src_nodes = spark.createDataFrame(
        [(i,) for i in range(12)], "node_id long"
    )
    dst_nodes = spark.createDataFrame(
        [(i,) for i in range(11)], "node_id long"
    )
    src_edges = spark.createDataFrame(
        _edges(SRC_CHILDREN), "child_id long, parent_id long"
    )
    dst_edges = spark.createDataFrame(
        _edges(DST_CHILDREN), "child_id long, parent_id long"
    )
    align = spark.createDataFrame(
        ALIGNMENT, "src_id long, dst_id long, sim double"
    )
    return src_nodes, dst_nodes, src_edges, dst_edges, align


def test_closure_with_dist(spark, dfs):
    _, _, src_edges, _, _ = dfs
    got = {
        (r.node_id, r.anc_id): r.dist
        for r in ancestor_closure_with_dist(src_edges).collect()
    }
    # hand-checked: 8 is child of 5, grandchild of 2, ggchild of 0
    assert got[(8, 5)] == 1 and got[(8, 2)] == 2 and got[(8, 0)] == 3
    assert (8, 1) not in got
    assert got[(11, 10)] == 1


def test_subtree_roots_nearest_matched(spark, dfs):
    src_nodes, _, src_edges, _, _ = dfs
    matched = spark.createDataFrame(
        [(0,), (1,), (3,), (5,)], "node_id long"
    )
    got = {
        r.node_id: r.root_id
        for r in pra_subtree_roots(src_nodes, src_edges, matched).collect()
    }
    # 6,7 under matched 3; 8,9 under matched 5; 4 under matched 1; 2 under
    # matched 0 (its parent); 10,11 unmatched partition (NULL)
    assert got[6] == 3 and got[7] == 3
    assert got[8] == 5 and got[9] == 5
    assert got[4] == 1
    assert got[2] == 0
    assert got[1] == 1 and got[3] == 3 and got[5] == 5 and got[0] == 0
    assert got[10] is None and got[11] is None


def test_pair_enumeration_parity(spark, dfs):
    src_nodes, dst_nodes, src_edges, dst_edges, align = dfs
    want_matched, want_unmatched = port_pra(
        SRC_CHILDREN, DST_CHILDREN, SRC_ROOTS, DST_ROOTS, ALIGNMENT
    )
    mp, us, ud = pra_block_pairs(
        src_nodes, dst_nodes, src_edges, dst_edges, align
    )
    got_matched = {(r.src_id, r.dst_id) for r in mp.collect()}
    assert got_matched == want_matched
    # the unmatched partitions cross-join to the reference's unmatched pairs
    got_us = {r.node_id for r in us.collect()}
    got_ud = {r.node_id for r in ud.collect()}
    assert {(a, b) for a in got_us for b in got_ud} == want_unmatched


def test_matched_to_overwrite_quirk(spark, dfs):
    """src 3 aligned to dst 3 AND dst 5 — the reference's overwrite loop
    keeps the max target id, so subtree(3) pairs with subtree(5)."""
    src_nodes, dst_nodes, src_edges, dst_edges, align = dfs
    mp, _, _ = pra_block_pairs(
        src_nodes, dst_nodes, src_edges, dst_edges, align
    )
    roots_of_3 = {
        (r.src_root, r.dst_root)
        for r in mp.filter("src_id = 3").collect()
    }
    assert roots_of_3 == {(3, 5)}
