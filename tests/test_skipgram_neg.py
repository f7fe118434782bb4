"""NEG-sampling skip-gram parity (SkipGramEmbeddingModel.scala:11-74):
the Spark trainer must reproduce a pure-Python port of the reference's
example construction + gradient math exactly (same md5-indexed draws,
same 2^-20 grid), at any parallelism."""
import hashlib
import math

import numpy as np
import pandas as pd
import pytest

from ontologymatching_spark.operators import embeddings as E

GRID = float(1 << 20)


def fg(x):
    return math.floor(x * GRID) / GRID


def md5u32(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)


def py_vocab(texts):
    from collections import Counter

    cnt = Counter(w for t in texts for w in t.strip().split())
    words = sorted(cnt)
    p_raw = [fg(c ** 0.75) for c in (cnt[w] for w in words)]
    tot = 0.0
    for p in p_raw:
        tot += p
    cum, lo_hi = 0.0, []
    # p floored to the grid AFTER normalization (matches skipgram_vocab's
    # round-4 distributed CDF: partial sums become exact 2^-20 multiples,
    # order-independent, and lo = hi0 - p exactly equals the previous hi)
    ps = [fg(p / tot) for p in p_raw]
    for i, p in enumerate(ps):
        lo = cum
        cum = cum + p
        hi = 1.000001 if i == len(ps) - 1 else cum
        lo_hi.append((lo, hi))
    return words, {w: i for i, w in enumerate(words)}, lo_hi


def py_examples(texts, vocab_ids, lo_hi, window=2, negative=2):
    exs = []
    for doc_id, t in enumerate(texts):
        sen = [vocab_ids[w] for w in t.strip().split()]
        for pos, wid in enumerate(sen):
            b = md5u32(f"b|{doc_id}|{pos}") % window
            for off in range(b - window, window - b + 1):
                if off == 0:
                    continue
                c = pos + off
                if 0 <= c < len(sen):
                    exs.append((wid, sen[c], 1))
                    for k in range(negative):
                        u = (md5u32(f"n|{doc_id}|{pos}|{off}|{k}")
                             % (1 << 20)) / GRID
                        nid = next(i for i, (lo, hi) in enumerate(lo_hi)
                                   if lo <= u < hi)
                        exs.append((wid, nid, -1))
    return exs


def py_train(exs, n_words, dim=4, rounds=2, lr=0.05):
    W = np.zeros((n_words, dim))
    for i in range(n_words):
        for d in range(dim):
            u = (md5u32(f"w|{i}|{d}") % (1 << 20)) / GRID
            W[i, d] = fg((u - 0.5) / dim)
    step = lr / len(exs)  # mean-gradient step (matches the operator)
    for _ in range(rounds):
        G = np.zeros_like(W)
        for w, c, lab in exs:
            s = float(W[w] @ W[c])
            if lab == 1:
                f = fg(math.exp(-s) / (1 + math.exp(-s)))
            else:
                f = fg(-1 / (1 + math.exp(-s)))
            G[w] += np.vectorize(fg)(f * W[c])
            G[c] += np.vectorize(fg)(f * W[w])
        W = np.vectorize(fg)(W + step * G)
    return W


TEXTS = [
    "spark line order batch column",
    "order column spark spark fast",
    "line fast batch order column spark",
    "batch spark order",
]


def test_skipgram_neg_examples_parity(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    vocab = E.skipgram_vocab(docs)
    words, ids, lo_hi = py_vocab(TEXTS)
    vp = vocab.toPandas().sort_values("word_id")
    assert list(vp["word"]) == words
    assert np.allclose(vp["lo"], [l for l, _ in lo_hi])
    got = (
        E.skipgram_neg_examples(docs, vocab, window=2, negative=2)
        .groupBy("word", "ctx", "label").count().toPandas()
    )
    want = pd.DataFrame(py_examples(TEXTS, ids, lo_hi),
                        columns=["word", "ctx", "label"])
    want = want.groupby(["word", "ctx", "label"]).size().reset_index(
        name="count")
    g = got.sort_values(["word", "ctx", "label"]).reset_index(drop=True)
    w = want.sort_values(["word", "ctx", "label"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        g.astype("int64"), w.astype("int64"), check_dtype=False
    )


def test_skipgram_neg_train_parity_and_determinism(spark):
    docs = spark.createDataFrame(
        pd.DataFrame({"doc_id": range(len(TEXTS)), "text": TEXTS})
    )
    vocab = E.skipgram_vocab(docs)
    words, ids, lo_hi = py_vocab(TEXTS)
    exs = py_examples(TEXTS, ids, lo_hi)
    want = py_train(exs, len(words), dim=4, rounds=2, lr=0.05)
    examples = E.skipgram_neg_examples(docs, vocab, window=2, negative=2)
    got = (
        E.skipgram_neg_train(examples, vocab, dim=4, rounds=2, lr=0.05)
        .toPandas().sort_values("word_id")
    )
    gmat = np.array(got["embedding"].tolist())
    assert np.array_equal(gmat, want), (
        f"max abs diff {np.abs(gmat - want).max()}"
    )
    # bit-identical across parallelism (grid sums are order-independent)
    got2 = (
        E.skipgram_neg_train(
            E.skipgram_neg_examples(
                docs.repartition(7), vocab, window=2, negative=2
            ).repartition(13),
            vocab, dim=4, rounds=2, lr=0.05,
        ).toPandas().sort_values("word_id")
    )
    assert np.array_equal(np.array(got2["embedding"].tolist()), gmat)
    # training moved weights (non-degenerate)
    assert np.abs(gmat).sum() > 0
