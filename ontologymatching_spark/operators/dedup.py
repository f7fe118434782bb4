"""Document deduplication operators for a training-data pipeline — each
returns clusters or candidate pairs over a documents DataFrame
(doc_id, text):

  exact_dedup       — hash-groupBy on the full normalized text
  minhash_lsh       — word-shingle MinHash + banded LSH candidates
  simhash64         — 64-bit Charikar simhash fingerprint
  ngram_jaccard     — character-n-gram Jaccard over blocked pairs
  embedding_neardup — cosine-over-threshold pairs via LSH buckets

All JVM-side (md5-derived integer hashing — deterministic, engine- and
cluster-size-portable; see benchqueries for the DuckDB-checked variants).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions.spark_sims import jaccard_col, shingles_col
from .ann import lsh_bucket_col


def _norm_text(c):
    return F.regexp_replace(F.trim(F.lower(c)), r"\s+", " ")


def _md5int(c):
    return F.conv(F.substring(F.md5(c), 1, 8), 16, 10).cast("long")


def exact_dedup(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (fingerprint, n_docs, canonical_doc_id, doc_ids): exact clusters on
    normalized text; canonical = min doc_id (stable under parallelism)."""
    return (
        docs.select("doc_id", F.md5(_norm_text(F.col(text_col))).alias("fingerprint"))
        .groupBy("fingerprint")
        .agg(
            F.count("*").alias("n_docs"),
            F.min("doc_id").alias("canonical_doc_id"),
            F.sort_array(F.collect_list("doc_id")).alias("doc_ids"),
        )
    )


def minhash_pairs_from_sigs(
    sig: DataFrame,
    n_sigs: int = 16,
    band_rows: int = 4,
    est_min: float = 0.75,
) -> DataFrame:
    """sig(doc_id, sig0..sig{n_sigs-1}) → (doc_a, doc_b, est_jaccard):
    the GLOBAL half of MinHash dedup — band-key equi-join candidates +
    signature-vector Jaccard estimate. Split out from ``minhash_lsh`` so the
    incremental plan (plans/incremental_dedup.py) can feed a merged
    reused+fresh signature table through the identical tail: signatures are
    doc-local, this join is not."""
    n_bands = n_sigs // band_rows
    bands = None
    for i in range(n_bands):
        b = sig.select(
            "doc_id", F.lit(i).alias("band"),
            F.concat_ws("-", *[F.col(f"sig{band_rows*i+r}") for r in range(band_rows)]
                        ).alias("bkey"),
        )
        bands = b if bands is None else bands.unionByName(b)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bkey")
    c = bands.select(F.col("doc_id").alias("doc_b"), "band", "bkey")
    cand = (
        a.join(c, ["band", "bkey"]).filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b").dropDuplicates(["doc_a", "doc_b"])
    )
    sv = sig.select(
        "doc_id", F.array(*[F.col(f"sig{j}") for j in range(n_sigs)]).alias("sigs")
    )
    est = F.aggregate(
        F.zip_with("sigs_a", "sigs_b", lambda x, y: (x == y).cast("int")),
        F.lit(0), lambda acc, v: acc + v,
    ).cast("double") / n_sigs
    return (
        cand.join(sv.select(F.col("doc_id").alias("doc_a"),
                            F.col("sigs").alias("sigs_a")), "doc_a")
        .join(sv.select(F.col("doc_id").alias("doc_b"),
                        F.col("sigs").alias("sigs_b")), "doc_b")
        .withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= est_min)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def minhash_lsh(
    docs: DataFrame,
    text_col: str = "text",
    n_sigs: int = 16,
    band_rows: int = 4,
    est_min: float = 0.75,
) -> DataFrame:
    """→ (doc_a, doc_b, est_jaccard): near-dup candidates via banded MinHash
    over word-3-shingles (see benchqueries.q_minhash_lsh_pairs for the
    oracle-checked twin)."""
    from .. import benchqueries as B

    sig = B._minhash_sigs(docs.select("doc_id", F.col(text_col).alias("text"))).cache()
    return minhash_pairs_from_sigs(
        sig, n_sigs=n_sigs, band_rows=band_rows, est_min=est_min
    )


def simhash64(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """→ (doc_id, simhash): 64-bit Charikar fingerprint; near-dups share
    low-hamming fingerprints. Two md5-derived 32-bit lanes per token."""
    toks = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    hs_lo = F.transform(toks, lambda t: _md5int(t))
    hs_hi = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 9, 8), 16, 10).cast("long"),
    )
    base = docs.select("doc_id", hs_lo.alias("lo"), hs_hi.alias("hi")).cache()

    def _bitsum(lane: str, off: int):
        def merge(acc, h):
            return acc + (
                F.shiftright(h, off).bitwiseAND(F.lit(1)) * 2 - 1
            ).cast("int")

        return F.aggregate(F.col(lane), F.lit(0), merge)

    # bits 0..62 (63-bit fingerprint: bit 63 would overflow the signed long)
    bits = []
    for b in range(63):
        lane, off = ("lo", b) if b < 32 else ("hi", b - 32)
        s = _bitsum(lane, off)
        bits.append(
            F.when(s > 0, F.lit(1 << b).cast("long")).otherwise(
                F.lit(0).cast("long")
            )
        )
    return base.select("doc_id", sum(bits[1:], bits[0]).alias("simhash"))


def ngram_jaccard_pairs(
    docs: DataFrame, text_col: str = "text", q: int = 5, min_sim: float = 0.7,
    block_prefix: int = 16,
) -> DataFrame:
    """→ (doc_a, doc_b, jaccard): char-q-gram Jaccard over pairs blocked by
    the normalized-text prefix (cheap dedup blocking; near-identical texts
    share their head)."""
    d0 = docs.select(
        "doc_id", _norm_text(F.col(text_col)).alias("t")
    ).withColumn("bk", F.substring("t", 1, block_prefix))
    # shingle ONLY docs whose block has a partner: at corpus scale the vast
    # majority of prefix blocks are singletons, and the q-gram array is the
    # expensive column (len(text) strings per doc) — prune before computing
    multi = (
        d0.groupBy("bk").agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .select("bk")
    )
    d = d0.join(multi, "bk").withColumn("grams", shingles_col(F.col("t"), q))
    a = d.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("ga"), "bk")
    b = d.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("gb"), "bk")
    return (
        a.join(b, "bk")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("jaccard", F.round(jaccard_col(F.col("ga"), F.col("gb")), 6))
        .filter(F.col("jaccard") >= min_sim)
        .select("doc_a", "doc_b", "jaccard")
    )


def embedding_neardup(
    vectors: DataFrame, min_cosine: float = 0.95, n_planes: int = 8, dim: int = 64
) -> DataFrame:
    """→ (doc_a, doc_b, cosine): embedding-cosine near-dups via LSH buckets
    (bucket join, not cross join)."""
    from ..functions.spark_sims import cosine_array_col

    v = vectors.select(
        "vec_id", "embedding",
        lsh_bucket_col(F.col("embedding"), n_planes, dim).alias("bucket"),
    )
    a = v.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("ea"),
                 "bucket")
    b = v.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("eb"),
                 "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("cosine", F.round(cosine_array_col(F.col("ea"), F.col("eb")), 6))
        .filter(F.col("cosine") >= min_cosine)
        .select("doc_a", "doc_b", "cosine")
    )
