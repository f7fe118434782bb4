"""Text-analysis operators for a training-data pipeline (all JVM-side
Column expressions unless noted): language ID (n-gram/stopword heuristic),
quality scoring, token counting (whitespace + BPE-ish regex), document
fingerprinting (polynomial rolling hash).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# tiny per-language stopword profiles (public common-word lists)
LANG_PROFILES: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "it", "that", "for", "with"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "fr": ["le", "la", "de", "et", "les", "des", "en", "du", "que", "pour"],
    "de": ["der", "die", "und", "den", "von", "das", "mit", "dem", "des", "ist"],
}


def tokens_col(text: Column) -> Column:
    return F.split(F.trim(F.lower(text)), r"\s+")


def lang_scores_col(text: Column) -> Column:
    """map<lang, double> of stopword-hit ratios — the n-gram-profile
    heuristic reduced to unigram profiles (JVM-side, no UDF)."""
    toks = tokens_col(text)
    n = F.size(toks)
    entries = []
    for lang, words in LANG_PROFILES.items():
        hits = F.size(F.filter(toks, lambda t: t.isin(words)))
        entries.append(F.lit(lang))
        entries.append(
            F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))
        )
    return F.create_map(*entries)


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Adds lang_guess + lang_score: argmax over the profile map with
    deterministic tie-break (score desc, lang asc); 'und' when no profile
    scores above zero."""
    scores = lang_scores_col(F.col(text_col))
    df = df.withColumn("_scores", scores)
    arr = F.map_entries(F.col("_scores"))
    best = F.array_sort(
        arr, lambda a, b: F.when(a.value > b.value, -1)
        .when(a.value < b.value, 1)
        .when(a.key < b.key, -1)
        .when(a.key > b.key, 1)
        .otherwise(0),
    )[0]
    return (
        df.withColumn(
            "lang_guess",
            F.when(best.value > 0, best.key).otherwise(F.lit("und")),
        )
        .withColumn("lang_score", F.round(best.value, 6))
        .drop("_scores")
    )


# BPE-ish token regex: word pieces, numbers, punctuation runs — the shape of
# a byte-pair pretokenizer (public GPT-2-style pattern, simplified to ASCII)
BPE_ISH_PATTERN = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+"


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """whitespace token count + BPE-ish piece count + char count."""
    t = F.col(text_col)
    ws = F.size(F.split(F.trim(t), r"\s+"))
    bpe = F.size(F.regexp_extract_all(t, F.lit(BPE_ISH_PATTERN), 0))
    return df.withColumn("n_ws_tokens", ws.cast("long")).withColumn(
        "n_bpe_tokens", bpe.cast("long")
    ).withColumn("n_chars", F.length(t).cast("long"))


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality in [0,1]: length band + stopword band + mean word
    length band + non-alnum ratio penalty (corpus-filtering scorer)."""
    t = F.trim(F.col(text_col))
    toks = F.split(t, r"\s+")
    n = F.size(toks)
    stop_ratio = F.size(
        F.filter(toks, lambda x: x.isin(LANG_PROFILES["en"]))
    ).cast("double") / F.greatest(n, F.lit(1))
    mean_len = F.length(t).cast("double") / F.greatest(n, F.lit(1))
    non_alnum = (
        F.length(F.regexp_replace(t, r"[a-zA-Z0-9\s]", "")).cast("double")
        / F.greatest(F.length(t), F.lit(1))
    )
    score = (
        F.when((n >= 10) & (n <= 1000), 0.35).otherwise(0.1)
        + F.when((stop_ratio >= 0.02) & (stop_ratio <= 0.6), 0.25).otherwise(0.0)
        + F.when((mean_len >= 3) & (mean_len <= 12), 0.25).otherwise(0.0)
        + F.when(non_alnum <= 0.1, 0.15).otherwise(0.0)
    )
    return df.withColumn("quality", F.round(score, 4))


FP_P = 1_000_000_007
FP_B = 131


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Order-sensitive polynomial rolling hash over tokens:
    fp = sum(b^i * h(tok_i)) mod p with md5-derived token ints — a content
    fingerprint that is cheap to compare/dedup on and engine-portable
    (same construction as the minhash/simhash md5 integers)."""
    toks = tokens_col(F.col(text_col))
    hs = F.transform(
        toks,
        lambda t: F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long"),
    )
    fp = F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * FP_B + F.pmod(h, F.lit(FP_P))) % FP_P,
    )
    return df.withColumn("fingerprint64", fp)


def word_ngram_hashes_col(text: Column, n: int) -> Column:
    """Lowercased word n-grams of the trimmed text as md5-derived 60-bit
    ints (narrow, engine-portable join keys; 60 bits — 15 md5 hex chars —
    keep the false-collision odds negligible for any-hit membership tests
    at production gram cardinalities, where 32 bits would flag clean docs).
    Documents shorter than n tokens yield an empty array."""
    toks = tokens_col(text)
    k = F.size(toks) - (n - 1)
    grams = F.when(k <= 0, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(1), F.greatest(k, F.lit(1))),
            lambda i: F.array_join(F.slice(toks, i, n), " "),
        )
    )
    from ..functions.spark_sims import md5int_col

    return F.transform(grams, lambda g: md5int_col(g, nhex=15))


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast: bool = True,
) -> DataFrame:
    """Benchmark decontamination for a training corpus: per document, how
    many of its word n-grams appear anywhere in the benchmark set (the
    standard exact-n-gram-collision methodology; n=13 in the GPT-3/PaLM
    data papers — any hit flags the document for removal).

    The benchmark's distinct gram-hash set is normally TINY relative to
    the corpus (benchmarks are ~10^4-10^6 items), so the default
    membership test is a broadcast equi-join on the 60-bit gram hash —
    the corpus side streams map-side, no corpus shuffle. For pathological
    benchmark sizes that exceed the executor broadcast budget, pass
    ``broadcast=False``: the same hashes go through a shuffle hash join
    keyed on the gram hash — only the NARROW exploded (doc_id, gram_hash)
    rows shuffle, never the document text. → (doc_id, n_grams,
    n_contaminated, contamination_ratio, contaminated)."""
    d = docs.select(
        F.col(id_col),
        word_ngram_hashes_col(F.col(text_col), n).alias("_ghs"),
    )
    bench_grams = (
        benchmark.select(
            F.explode(word_ngram_hashes_col(F.col(text_col), n)).alias("_gh")
        )
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    exploded = d.select(
        id_col, F.size("_ghs").alias("n_grams"), F.explode_outer("_ghs").alias("_gh")
    )
    bench_side = (
        F.broadcast(bench_grams) if broadcast
        else bench_grams.hint("shuffle_hash")
    )
    hits = (
        exploded.join(bench_side, "_gh", "left")
        .groupBy(id_col, "n_grams")
        .agg(F.coalesce(F.sum("_hit"), F.lit(0)).alias("n_contaminated"))
    )
    return hits.select(
        id_col,
        F.col("n_grams").cast("long").alias("n_grams"),
        F.col("n_contaminated").cast("long").alias("n_contaminated"),
        F.when(F.col("n_grams") > 0,
               F.col("n_contaminated").cast("double") / F.col("n_grams"))
        .otherwise(0.0).alias("contamination_ratio"),
        (F.col("n_contaminated") > 0).alias("contaminated"),
    )


# PII patterns: identical semantics under Java regex (Spark) and RE2
# (DuckDB) — no backrefs, no lookarounds. Order matters: email before the
# generic digit run (the local part may contain digits).
PII_PATTERNS: list[tuple[str, str, str]] = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b", "<IP>"),
    ("hexsecret", r"\b[0-9a-fA-F]{32,}\b", "<SECRET>"),
    ("longdigits", r"\b\d{9,}\b", "<NUMBER>"),
]


def scrub_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Redact common PII/secret shapes (emails, IPv4s, ≥32-hex-char
    secrets, ≥9-digit runs) with typed placeholders, appending per-type
    match counts and the scrubbed text. Pure sequential regexp_replace /
    regexp_count column expressions — codegen, no UDF, trivially
    distributable at 100 TB."""
    out = df
    scrubbed = F.col(text_col)
    for name, pat, repl in PII_PATTERNS:
        out = out.withColumn(f"n_{name}", F.regexp_count(scrubbed, F.lit(pat)))
        scrubbed = F.regexp_replace(scrubbed, pat, repl)
    return out.withColumn("scrubbed_text", scrubbed)


def repetition_stats(df: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id",
                     top_bigram_max: float = 0.18) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1: pages
    dominated by repeated phrases are low-quality training data): per doc,
    the duplicate-token ratio (1 − distinct/total), the fraction of tokens
    claimed by the most frequent unigram and bigram, and a flag when the
    top-bigram fraction exceeds ``top_bigram_max`` (the Gopher bound).

    distinct/total stays in codegen (array ops); the mode counts are one
    explode + two-level agg partitioned by doc — per-doc work, never a
    corpus-wide shuffle key."""
    toks = tokens_col(F.col(text_col))
    base = df.select(
        F.col(id_col),
        toks.alias("_t"),
        F.size(toks).alias("n_tokens"),
        (1.0 - F.size(F.array_distinct(toks)).cast("double")
         / F.greatest(F.size(toks), F.lit(1))).alias("dup_token_ratio"),
    )
    uni = (
        base.select(id_col, "n_tokens", F.explode("_t").alias("_w"))
        .groupBy(id_col, "n_tokens", "_w").agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col, "n_tokens").agg(F.max("_c").alias("_topu"))
    )
    big = base.select(
        id_col,
        F.when(
            F.col("n_tokens") >= 2,
            F.transform(
                F.sequence(F.lit(1), F.greatest(F.col("n_tokens") - 1, F.lit(1))),
                lambda i: F.array_join(F.slice(F.col("_t"), i, 2), " "),
            ),
        ).otherwise(F.array().cast("array<string>")).alias("_bg"),
    )
    bigf = (
        big.select(id_col, F.size("_bg").alias("_nb"),
                   F.explode_outer("_bg").alias("_b"))
        .groupBy(id_col, "_nb", "_b").agg(F.count(F.lit(1)).alias("_c"))
        .groupBy(id_col, "_nb").agg(
            F.max(F.when(F.col("_b").isNotNull(), F.col("_c"))).alias("_topb")
        )
    )
    out = (
        base.drop("_t")
        .join(uni.select(id_col, "_topu"), id_col, "left")
        .join(bigf, id_col, "left")
    )
    topu = F.coalesce(F.col("_topu"), F.lit(0)).cast("double") / F.greatest(
        F.col("n_tokens"), F.lit(1)
    )
    topb = F.coalesce(F.col("_topb"), F.lit(0)).cast("double") / F.greatest(
        F.col("_nb"), F.lit(1)
    )
    return out.select(
        id_col,
        F.col("n_tokens").cast("long").alias("n_tokens"),
        F.col("dup_token_ratio").alias("dup_token_ratio"),
        topu.alias("top_unigram_frac"),
        topb.alias("top_bigram_frac"),
        (topb > top_bigram_max).alias("repetition_flagged"),
    )


def chunk_documents(df: DataFrame, max_tokens: int = 512, overlap: int = 64,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Split long documents into token-window chunks with overlap — the
    context-window preparation step of a training pipeline. Stride =
    max_tokens − overlap; chunk i covers tokens [1 + i·stride,
    i·stride + max_tokens]; the last window starts at the final stride
    position that still introduces new tokens. All JVM-side array slices
    (sequence + transform + posexplode) — one row in, n_chunks rows out,
    no shuffle, no UDF. → (doc_id, chunk_idx, n_chunk_tokens, chunk_text)."""
    stride = max_tokens - overlap
    if stride <= 0:
        raise ValueError("overlap must be smaller than max_tokens")
    toks = tokens_col(F.col(text_col))
    n = F.size(toks)
    # number of chunks: ceil(max(n - overlap, 1) / stride), at least 1
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap)).cast("double") / stride), F.lit(1)
    ).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * stride + 1, max_tokens), " "
        ),
    )
    out = df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text")
    )
    return out.select(
        id_col, "chunk_idx",
        # empty/whitespace-only docs emit one empty chunk whose token count
        # must be 0, not 1 (split('', ' ') yields [''])
        F.when(F.length("chunk_text") == 0, F.lit(0))
        .otherwise(F.size(F.split(F.col("chunk_text"), " ")))
        .cast("long").alias("n_chunk_tokens"),
        "chunk_text",
    )


def pack_documents(df: DataFrame, budget: int = 2048, n_shards: int = 64,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Sequence packing: assign documents to fixed-token-budget packs so
    short documents share a context window (the streaming-pack
    approximation: within a shard, docs in deterministic id order, pack =
    floor(cumulative tokens-before-this-doc / budget)).

    Packing is SHARDED (shard = pmod(id, n_shards)) exactly like a
    production per-worker packer: a single global cumsum window would
    serialize the corpus through one partition, while per-shard windows
    partition-parallelize and stay deterministic. pack_id = shard·10^9 +
    within-shard pack (globally unique, engine-portable arithmetic). A doc
    longer than the budget spans pack boundaries (chunk first via
    chunk_documents for hard caps). → (doc_id, n_tokens, shard_id,
    pack_id, pack_offset)."""
    from pyspark.sql import Window

    toks = tokens_col(F.col(text_col))
    base = df.select(
        F.col(id_col),
        F.size(toks).cast("long").alias("n_tokens"),
        F.pmod(F.col(id_col), F.lit(n_shards)).cast("long").alias("shard_id"),
    )
    w = Window.partitionBy("shard_id").orderBy(id_col).rowsBetween(
        Window.unboundedPreceding, -1
    )
    before = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        id_col, "n_tokens", "shard_id",
        (F.col("shard_id") * 1_000_000_000
         + F.floor(before / budget)).cast("long").alias("pack_id"),
        F.pmod(before, F.lit(budget)).cast("long").alias("pack_offset"),
    )
