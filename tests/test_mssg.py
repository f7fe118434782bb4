"""MSSG sense discovery: a polysemous word's contexts split into the right
senses (the thesis's multi-sense trainer, re-expressed batch-side)."""

from __future__ import annotations

from ontologymatching_spark.operators.embeddings import (
    context_vectors,
    mssg_sense_vectors,
)


def _fixture(spark):
    # 'bank' in two disjoint context families with orthogonal embeddings
    money_docs = [(2 * i, ["money", "bank", "loan"]) for i in range(4)]
    river_docs = [(2 * i + 1, ["river", "bank", "water"]) for i in range(4)]
    docs = spark.createDataFrame(
        money_docs + river_docs, "doc_id long, tokens array<string>"
    )
    vectors = spark.createDataFrame(
        [
            ("money", [1.0, 0.0, 0.0, 0.0]),
            ("loan", [0.9, 0.1, 0.0, 0.0]),
            ("river", [0.0, 0.0, 1.0, 0.0]),
            ("water", [0.0, 0.0, 0.9, 0.1]),
            ("bank", [0.5, 0.5, 0.5, 0.5]),
        ],
        "word string, vector array<float>",
    )
    return docs, vectors


def test_mssg_separates_senses(spark):
    docs, vectors = _fixture(spark)
    ctx = context_vectors(docs, vectors, window=2)
    senses = mssg_sense_vectors(ctx, n_senses=2, min_contexts=4)
    bank = {r.sense: r for r in senses.filter("word = 'bank'").collect()}
    assert len(bank) == 2
    # 4 money contexts and 4 river contexts, one sense each
    assert sorted(r.n_contexts for r in bank.values()) == [4, 4]
    # each sense centroid lives on the right axis pair: money sense loads
    # dims 0-1, river sense dims 2-3
    v0, v1 = bank[0].sense_vec, bank[1].sense_vec
    money_like = v0 if v0[0] > v1[0] else v1
    river_like = v1 if money_like is v0 else v0
    assert money_like[0] > 0.5 and money_like[2] < 0.2
    assert river_like[2] > 0.5 and river_like[0] < 0.2


def test_mssg_deterministic(spark):
    docs, vectors = _fixture(spark)
    ctx = context_vectors(docs, vectors, window=2)
    a = mssg_sense_vectors(ctx, n_senses=2, min_contexts=4).collect()
    b = mssg_sense_vectors(ctx, n_senses=2, min_contexts=4).collect()
    key = lambda rows: sorted(
        (r.word, r.sense, tuple(r.sense_vec), r.n_contexts) for r in rows
    )
    assert key(a) == key(b)


def test_mssg_respects_min_contexts(spark):
    docs, vectors = _fixture(spark)
    ctx = context_vectors(docs, vectors, window=2)
    senses = mssg_sense_vectors(ctx, n_senses=2, min_contexts=5)
    # 'bank' has 8 contexts (kept); 'money' only 4 (dropped at min 5)
    words = {r.word for r in senses.collect()}
    assert "bank" in words and "money" not in words


def _py_dpmeans(ctx_rows, n_senses, lam, grid_bits=20):
    """Pure-Python port of cbow_predict_dpmeans
    (MultiSenseSkipGramEmbeddingModel.scala:111-140): sequential stream in
    (doc_id, pos) order, dist = 1 - cosine(ctx, running-sum/count), new
    cluster when min-dist > lambda under the S cap, online center update."""
    import numpy as np

    grid = float(1 << grid_bits)
    by_word: dict = {}
    for doc_id, pos, word, vec in sorted(ctx_rows):
        x = np.floor(np.array(vec, dtype="float64") * grid) / grid
        sums, cnts, assign = by_word.setdefault(word, ([], [], []))
        sense, min_dist = 0, float("inf")
        for s in range(len(sums)):
            mu = sums[s] / cnts[s]
            denom = float(np.linalg.norm(x) * np.linalg.norm(mu))
            cos = float(x @ mu) / denom if denom > 0 else 0.0
            if 1.0 - cos < min_dist:
                min_dist = 1.0 - cos
                sense = s
        if len(sums) < n_senses and lam < min_dist:
            sums.append(np.zeros_like(x))
            cnts.append(0)
            sense = len(sums) - 1
        sums[sense] = sums[sense] + x
        cnts[sense] += 1
        assign.append(sense)
    out = {}
    for word, (sums, cnts, assign) in by_word.items():
        cents = [
            tuple(np.floor((sums[j] / cnts[j]) * grid) / grid)
            for j in range(len(sums))
        ]
        counts = [assign.count(j) for j in range(len(sums))]
        out[word] = (cents, counts)
    return out


def test_mssg_dpmeans_parity_with_reference_port(spark):
    """NP-MSSG: the dpmeans=True path must reproduce the pure-Python port
    of the reference's nonparametric sense loop exactly (grid-quantized),
    discovering the number of senses from the data."""
    import numpy as np

    docs, vectors = _fixture(spark)
    ctx = context_vectors(docs, vectors, window=2)
    rows = [
        (r.doc_id, r.pos, r.word, tuple(r.ctx))
        for r in ctx.collect()
    ]
    # only words with >= 4 contexts survive (operator's min_contexts)
    eligible = {w for w in {r[2] for r in rows}
                if sum(1 for r in rows if r[2] == w) >= 4}
    want = _py_dpmeans(
        [r for r in rows if r[2] in eligible], n_senses=4, lam=0.5
    )
    got = mssg_sense_vectors(
        ctx, n_senses=4, min_contexts=4, quantize_pow2=20,
        dpmeans=True, create_lambda=0.5,
    ).collect()
    got_by_word: dict = {}
    for r in got:
        cents, counts = got_by_word.setdefault(r.word, ([], []))
        cents.append((r.sense, tuple(r.sense_vec)))
        counts.append((r.sense, r.n_contexts))
    assert set(got_by_word) == set(want)
    for w, (cents, counts) in want.items():
        g_cents = [v for _, v in sorted(got_by_word[w][0])]
        g_counts = [c for _, c in sorted(got_by_word[w][1])]
        assert g_counts == counts, w
        assert len(g_cents) == len(cents), w
        for a, b in zip(g_cents, cents):
            assert np.array_equal(np.array(a), np.array(b)), w
    # 'bank' must have discovered BOTH senses nonparametrically
    assert len(want["bank"][0]) == 2
    # and at a huge lambda no second sense is ever created
    one = mssg_sense_vectors(
        ctx, n_senses=4, min_contexts=4, quantize_pow2=20,
        dpmeans=True, create_lambda=10.0,
    ).filter("word = 'bank'").collect()
    assert len(one) == 1


def test_mssg_quantized_matches_unquantized_clustering(spark):
    """quantize_pow2 (the 2^-20 grid that makes the DuckDB oracle exact)
    must not change the discovered clustering on well-separated senses —
    assignments are identical, centroids within one grid step."""
    docs, vectors = _fixture(spark)
    ctx = context_vectors(docs, vectors, window=2)
    plain = {
        (r.word, r.sense): r
        for r in mssg_sense_vectors(ctx, n_senses=2, min_contexts=4).collect()
    }
    quant = {
        (r.word, r.sense): r
        for r in mssg_sense_vectors(
            ctx, n_senses=2, min_contexts=4, quantize_pow2=20
        ).collect()
    }
    assert set(plain) == set(quant)
    step = 1.0 / (1 << 20)
    for k, p in plain.items():
        q = quant[k]
        assert q.n_contexts == p.n_contexts
        for a, b in zip(p.sense_vec, q.sense_vec):
            assert abs(a - b) <= 2 * step
    # and the quantized path is itself deterministic across invocations
    again = {
        (r.word, r.sense): tuple(r.sense_vec)
        for r in mssg_sense_vectors(
            ctx, n_senses=2, min_contexts=4, quantize_pow2=20
        ).collect()
    }
    assert again == {k: tuple(v.sense_vec) for k, v in quant.items()}
