"""Headline queries over the driver testdata (TESTDATA.md tables), each with a
DuckDB oracle (see __spark_entry__.py). One entry per operator family from
SURVEY.md §2 — scans/filters (2.2), joins (2.3), aggregations (2.4), windows/
top-k (2.5), selection (2.6), similarity kernels (2.7) — plus the
training-data-pipeline ops (dedup, similarity search, text analysis).

Parity rules (driver compares row count + schema + order-insensitive value
hash):
  - every computed column aliased identically in Spark and SQL
  - doubles rounded to 6 (sims) / 2-4 (money/avgs) decimals on BOTH sides
  - DuckDB's float32 builtins avoided (cosine computed in double manually)
  - deterministic tie-breaks on every top-k / limit
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# helpers
# ---------------------------------------------------------------------------


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _fan(df: DataFrame) -> DataFrame:
    """Scan-parallelism fix for fan-out plans (guide §2.4/§2.5): each bench
    table is ONE parquet file with ONE row group — a single Spark scan split
    — so any plan whose downstream joins are all broadcast inherits
    parallelism 1 from the scan (the round-3 single-file gotcha, measured at
    bench SF: asm_content_words ran its whole 500k-pair kernel grid in one
    13.9 s task on a 32-core box; 3.4 s after this repartition). A
    round-robin exchange of the narrow base rows (≤ a few MB) buys
    full-core parallelism for every pair kernel downstream. The partition
    count derives from the session's advertised parallelism — scale-adaptive,
    never a local constant; SPARK_GRAFT_FAN_PARTS overrides for cluster
    tuning (on a real cluster multi-file table layouts make this a no-op
    cost: the exchange is still ~row-count bytes)."""
    from .partitions import fan_parts

    return df.repartition(fan_parts(df))


def _doc_tokens(text_col):
    """Whitespace tokens of trimmed text — matches DuckDB
    string_split_regex(trim(text), '\\s+')."""
    return F.split(F.trim(text_col), r"\s+")


_MD5_INT = "conv(substring(md5({t}), 1, 8), 16, 10)"


def _md5int_col(c):
    """First 32 bits of md5 as a bigint — identical in DuckDB via
    ('0x' || substr(md5(t),1,8))::bigint. Canonical recipe lives in
    functions.spark_sims.md5int_col; this alias keeps call sites short."""
    from .functions.spark_sims import md5int_col

    return md5int_col(c)


# MinHash constants (shared with the SQL oracle below): 16 signatures in
# 4 bands x 4 rows → LSH collision threshold ≈ (1/4)^(1/4) ≈ 0.71 Jaccard,
# plus a post-filter est_jaccard = matching-sigs/16 >= 0.75. With 2-row bands
# the common-word corpus put >60% of docs into one bucket (quadratic blowup);
# 4-row bands keep every bucket tiny — this is the property that makes the
# band join scale to 100 TB (bucket size, not corpus size, drives the join).
MH_P = 2147483647
MH_A = [2971, 4111, 5107, 6211, 7309, 8419, 9511, 10631,
        11731, 12823, 13903, 15013, 16103, 17203, 18301, 19403]
MH_B = [1087, 2203, 3301, 4409, 5501, 6607, 7703, 8807,
        9901, 11003, 12101, 13217, 14303, 15401, 16519, 17609]
N_SIGS = 16
N_BANDS = 4
BAND_ROWS = 4
MH_EST_MIN = 0.75

STOPWORDS_SQL = "('the','a','an','and','or','of','in','to','is','it')"

# word-n-gram size for decontamination (13 in the GPT-3/PaLM papers; 5 at
# test SF so collisions actually occur on the tiny corpus)
CONTAM_N = 5
STOPWORDS = ["the", "a", "an", "and", "or", "of", "in", "to", "is", "it"]


# ---------------------------------------------------------------------------
# relational core (scan/filter/agg/join/window — SURVEY.md §2.2-2.5)
# ---------------------------------------------------------------------------


def q_pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: scan + filter + groupBy with 8 aggregates (threshold
    filter + quality-metric aggregation analogs, SURVEY.md §2.2/2.4)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            F.col("l_shipdate") <= F.lit("1998-12-01").cast("timestamp_ntz")
        )
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


SQL_PRICING = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2)                               AS sum_qty,
       ROUND(SUM(l_extendedprice), 2)                          AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)       AS sum_disc_price,
       ROUND(AVG(l_quantity), 4)                               AS avg_qty,
       ROUND(AVG(l_discount), 4)                               AS avg_disc,
       COUNT(*)                                                AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-12-01'
GROUP BY l_returnflag, l_linestatus
"""


def q_top_revenue_orders(spark, sf_dir):
    """TPC-H Q3 shape: 3-way join + agg + deterministic top-10 (equi-join on
    URI / ranked-candidate sort analogs, §2.3/2.5)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    rev = (
        li.groupBy("l_orderkey")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(rev, orders.o_orderkey == rev.l_orderkey)
        .select(
            F.col("o_orderkey"), F.col("c_mktsegment"), F.col("revenue"),
            F.col("o_orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("o_orderkey"))
        .limit(10)
    )


SQL_TOP_REVENUE = """
WITH rev AS (
  SELECT l_orderkey, ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
  FROM lineitem GROUP BY l_orderkey
)
SELECT o.o_orderkey, c.c_mktsegment, rev.revenue, o.o_orderdate
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
JOIN rev ON o.o_orderkey = rev.l_orderkey
ORDER BY rev.revenue DESC, o.o_orderkey ASC
LIMIT 10
"""


def q_topk_orders_per_customer(spark, sf_dir):
    """Window top-k per group (getRowMaxValues, §2.5)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            "o_custkey", "o_orderkey",
            F.round("o_totalprice", 2).alias("totalprice"),
            F.col("rn").cast("int").alias("rnk"),
        )
    )


SQL_TOPK_ORDERS = """
SELECT o_custkey, o_orderkey, ROUND(o_totalprice, 2) AS totalprice, rnk
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey ASC) AS INT) AS rnk
  FROM orders
) WHERE rnk <= 3
"""


def q_region_rollup(spark, sf_dir):
    """Rollup aggregation over region/nation (grouping-sets family, §2.4)."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    c = load(spark, sf_dir, "customer")
    j = c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey).join(
        F.broadcast(r), n.n_regionkey == r.r_regionkey
    )
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.count("*").alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("sum_acctbal"),
        )
        .select(
            F.coalesce(F.col("r_name"), F.lit("ALL")).alias("region"),
            F.coalesce(F.col("n_name"), F.lit("ALL")).alias("nation"),
            "n_customers", "sum_acctbal",
        )
    )


SQL_ROLLUP = """
SELECT COALESCE(r_name, 'ALL') AS region, COALESCE(n_name, 'ALL') AS nation,
       COUNT(*) AS n_customers, ROUND(SUM(c_acctbal), 2) AS sum_acctbal
FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY ROLLUP (r_name, n_name)
"""


def q_events_sessionize(spark, sf_dir):
    """Sessionization: lag + gap>30min cumsum (window-function family; the
    batch analog of session_window, §2.10 note)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # TIMESTAMP_NTZ subtraction yields a day-time interval — session-TZ-proof
    # (an ntz→ltz→epoch cast would shift across DST if the harness session
    # isn't UTC)
    gap = F.col("ts") - F.lag(F.col("ts")).over(w)
    sess = F.sum(
        F.when(
            gap.isNull() | (gap > F.expr("INTERVAL 1800 SECONDS")), 1
        ).otherwise(0)
    ).over(w.rowsBetween(Window.unboundedPreceding, 0))
    return (
        ev.withColumn("sess", sess)
        .groupBy("user_id")
        .agg(
            F.max("sess").cast("long").alias("n_sessions"),
            F.count("*").alias("n_events"),
        )
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch(ts) - epoch(LAG(ts) OVER w) > 1800.0
                OR LAG(ts) OVER w IS NULL THEN 1 ELSE 0 END AS is_new
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS sess
  FROM g
)
SELECT user_id, CAST(MAX(sess) AS BIGINT) AS n_sessions, COUNT(*) AS n_events
FROM s GROUP BY user_id
"""


def q_events_hourly(spark, sf_dir):
    """Tumbling-window aggregation (batch shape of a streaming windowed agg)."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_trunc("hour", F.col("ts")).alias("hour"),
            F.col("event_type"),
        )
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 2).alias("sum_value"),
        )
    )


SQL_EVENTS_HOURLY = """
SELECT date_trunc('hour', ts) AS hour, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 2) AS sum_value
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# matching-engine ops over `documents` (similarity kernels + selection)
# ---------------------------------------------------------------------------


def _doc_names(spark, sf_dir, fan: bool = True):
    """Derive entity-like names from documents: first 3 tokens. Even doc_id =
    source side, odd = target side (mirrors the two-ontology split).

    The scan is fanned out (_fan): 13 pair queries build broadcast-join
    fan-outs directly on this table, and without the repartition every one
    of them runs its kernels at the single-file scan's parallelism of 1.
    ``fan=False`` for callers whose plans re-evaluate this subtree in many
    concurrent branch jobs — there the per-evaluation exchange piles up and
    measures SLOWER than the single-task scan (iism_subprop_union A/B:
    4.5-4.7 s fanned vs 2.6-3.6 s unfanned)."""
    d = load(spark, sf_dir, "documents")
    if fan:
        d = _fan(d)
    toks = _doc_tokens(F.col("text"))
    return d.select(
        "doc_id",
        F.array_join(F.slice(toks, 1, 3), " ").alias("name"),
        F.element_at(toks, 1).alias("block_key"),
    )


_SQL_DOC_NAMES = """
  SELECT doc_id,
         array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), 1, 3), ' ') AS name,
         string_split_regex(trim(text), '\\s+')[1] AS block_key
  FROM documents
"""


def q_lev_blocked_pairs(spark, sf_dir, fan: bool = True):
    """Blocked similarity join with min-length-normalized Levenshtein
    (LevenshteinEditDistance.java semantics; blocking replaces the cartesian,
    §2.3). Output: every cross-side pair sharing a block key, sim >= 0.5."""
    from .functions.spark_sims import lev_min_norm_col

    names = _doc_names(spark, sf_dir, fan=fan)
    s = names.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src_doc_id"),
        F.col("name").alias("s_name"), "block_key",
    )
    d = names.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("dst_doc_id"),
        F.col("name").alias("d_name"), "block_key",
    )
    return (
        s.join(d, "block_key")
        .withColumn("lev_sim", F.round(lev_min_norm_col(F.col("s_name"), F.col("d_name")), 6))
        .filter(F.col("lev_sim") >= 0.5)
        .select("src_doc_id", "dst_doc_id", "lev_sim")
    )


SQL_LEV_PAIRS = f"""
WITH names AS ({_SQL_DOC_NAMES}),
s AS (SELECT doc_id AS src_doc_id, name AS s_name, block_key FROM names WHERE doc_id % 2 = 0),
d AS (SELECT doc_id AS dst_doc_id, name AS d_name, block_key FROM names WHERE doc_id % 2 = 1),
p AS (
  SELECT src_doc_id, dst_doc_id,
         CASE WHEN length(s_name) = 0 AND length(d_name) = 0 THEN 1.0
              WHEN least(length(s_name), length(d_name)) = 0 THEN 0.0
              ELSE 1.0 - least(levenshtein(s_name, d_name),
                               least(length(s_name), length(d_name)))::DOUBLE
                         / least(length(s_name), length(d_name))
         END AS raw_sim
  FROM s JOIN d USING (block_key)
)
SELECT src_doc_id, dst_doc_id, ROUND(raw_sim, 6) AS lev_sim
FROM p WHERE ROUND(raw_sim, 6) >= 0.5
"""


def q_qgram_jaccard_pairs(spark, sf_dir):
    """Character 3-gram Jaccard on blocked pairs (QGramSim, §2.7)."""
    from .functions.spark_sims import jaccard_col, shingles_col

    names = _doc_names(spark, sf_dir)
    s = names.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src_doc_id"),
        shingles_col(F.col("name"), 3).alias("s_sh"), "block_key",
    )
    d = names.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("dst_doc_id"),
        shingles_col(F.col("name"), 3).alias("d_sh"), "block_key",
    )
    return (
        s.join(d, "block_key")
        .withColumn("qgram_sim", F.round(jaccard_col(F.col("s_sh"), F.col("d_sh")), 6))
        .filter(F.col("qgram_sim") >= 0.3)
        .select("src_doc_id", "dst_doc_id", "qgram_sim")
    )


SQL_QGRAM = f"""
WITH names AS ({_SQL_DOC_NAMES}),
sh AS (
  SELECT doc_id, block_key,
         CASE WHEN length(name) = 0 THEN []::VARCHAR[]
              WHEN length(name) < 3 THEN [name]
              ELSE list_transform(range(1, length(name) - 1),
                                  i -> substr(name, i::INT, 3))
         END AS grams
  FROM names
),
s AS (SELECT doc_id AS src_doc_id, grams AS s_sh, block_key FROM sh WHERE doc_id % 2 = 0),
d AS (SELECT doc_id AS dst_doc_id, grams AS d_sh, block_key FROM sh WHERE doc_id % 2 = 1),
p AS (
  SELECT src_doc_id, dst_doc_id,
         len(list_intersect(list_distinct(s_sh), list_distinct(d_sh)))::DOUBLE AS i_n,
         len(list_distinct(list_concat(list_distinct(s_sh), list_distinct(d_sh))))::DOUBLE AS u_n
  FROM s JOIN d USING (block_key)
)
SELECT src_doc_id, dst_doc_id,
       ROUND(CASE WHEN u_n = 0 THEN 1.0 ELSE i_n / u_n END, 6) AS qgram_sim
FROM p
WHERE ROUND(CASE WHEN u_n = 0 THEN 1.0 ELSE i_n / u_n END, 6) >= 0.3
"""


# Dense-vector TF-IDF plan gate: vocabularies at or under this size take the
# dense path (per-doc fixed-width vectors + vectorized pair dot product, no
# term-level join); larger vocabularies keep the sparse inverted term join.
# Both plans compute the same cosine (the dense fold adds exact 0.0 for
# absent terms); override with SPARK_GRAFT_TFIDF_DENSE=0|1 to force a path.
_TFIDF_DENSE_MAX_VOCAB = 4096


def q_tfidf_cosine_pairs(spark, sf_dir):
    """VMM semantics: corpus-level TF-IDF + sparse cosine on blocked pairs
    (MultiWordsMatcher.java:103-176,469-479), fully JVM-side.

    Plan is vocabulary-adaptive (round 4): the sparse form joins each blocked
    pair against the src doc's term rows and intersects on term — at sf1
    that is a 483M-row shuffle (20.8M pairs × ~23 terms/doc) even though the
    corpus dictionary has only a few dozen distinct terms. When the
    vocabulary fits a fixed-width vector (≤ _TFIDF_DENSE_MAX_VOCAB), build
    per-doc DENSE tf-idf vectors over the sorted term dictionary instead and
    compute the pair dot product as a zip_with fold: the pair join becomes
    one narrow broadcast stage with zero term-level rows (measured sf1:
    ~55 s → ~6 s). Values are identical — absent terms contribute an exact
    +0.0 to the fold, and the 6-decimal rounding absorbs summation-order
    noise exactly as the sparse-vs-DuckDB comparison already does."""
    import os

    d = load(spark, sf_dir, "documents")
    docs = d.select(
        "doc_id", F.explode(_doc_tokens(F.col("text"))).alias("term")
    ).filter(F.length("term") > 0)
    n_docs = d.count()
    # tf is the root of everything downstream (df derives from it: one row
    # per (doc, term) makes count(*) per term == count_distinct(doc_id));
    # checkpoint it so the token explode runs once, not once per branch
    tf = docs.groupBy("doc_id", "term").agg(
        F.count("*").alias("tf")
    ).localCheckpoint()
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    names = _doc_names(spark, sf_dir).select("doc_id", "block_key")
    s = names.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src_doc_id"), "block_key"
    )
    dd = names.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("dst_doc_id"), "block_key"
    )
    pairs = s.join(dd, "block_key").select("src_doc_id", "dst_doc_id")

    dense_env = os.environ.get("SPARK_GRAFT_TFIDF_DENSE", "")
    n_terms = dfreq.count()
    use_dense = (
        dense_env == "1"
        or (dense_env != "0" and n_terms <= _TFIDF_DENSE_MAX_VOCAB)
    )

    if use_dense:
        terms = sorted(
            r.term for r in dfreq.select("term").collect()
        )
        term_idx = spark.createDataFrame(
            [(t, i) for i, t in enumerate(terms)], "term string, idx int"
        )
        wv = tf.join(F.broadcast(dfreq), "term").join(
            F.broadcast(term_idx), "term"
        ).withColumn(
            "w", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
        )
        zero = F.lit(0.0)
        vecs = (
            wv.groupBy("doc_id")
            .agg(
                F.map_from_entries(
                    F.collect_list(F.struct("idx", "w"))
                ).alias("m")
            )
            .select(
                "doc_id",
                F.transform(
                    F.sequence(F.lit(0), F.lit(n_terms - 1)),
                    lambda i: F.coalesce(F.element_at(F.col("m"), i), zero),
                ).alias("vec"),
            )
            .withColumn(
                "nrm",
                F.sqrt(
                    F.aggregate(
                        F.col("vec"), zero, lambda a, x: a + x * x
                    )
                ),
            )
            .localCheckpoint()  # referenced twice (src + dst broadcast)
        )
        # one doc-vector row is (id, V doubles, nrm): broadcast when the
        # whole table fits, else let AQE pick the join
        vec_bytes = vecs.count() * (n_terms + 2) * 8
        def _side(df):
            return F.broadcast(df) if vec_bytes <= 64 << 20 else df
        sv = vecs.select(
            F.col("doc_id").alias("src_doc_id"),
            F.col("vec").alias("s_vec"), F.col("nrm").alias("s_nrm"),
        )
        dv = vecs.select(
            F.col("doc_id").alias("dst_doc_id"),
            F.col("vec").alias("d_vec"), F.col("nrm").alias("d_nrm"),
        )
        return (
            pairs.join(_side(sv), "src_doc_id")
            .join(_side(dv), "dst_doc_id")
            .withColumn(
                "dot",
                F.aggregate(
                    F.zip_with(
                        F.col("s_vec"), F.col("d_vec"), lambda a, b: a * b
                    ),
                    zero,
                    lambda a, x: a + x,
                ),
            )
            .withColumn(
                "cosine",
                F.round(F.col("dot") / (F.col("s_nrm") * F.col("d_nrm")), 6),
            )
            .filter(F.col("cosine") >= 0.2)
            .select("src_doc_id", "dst_doc_id", "cosine")
        )

    # sparse inverted-index path (real vocabularies): term-join restricted
    # to blocked candidate pairs, never all-pairs
    w = tf.join(dfreq, "term").withColumn(
        "w", F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("w") * F.col("w"))).alias("nrm")
    )
    sw = w.select(F.col("doc_id").alias("src_doc_id"), "term", F.col("w").alias("sw"))
    dw = w.select(F.col("doc_id").alias("dst_doc_id"), "term", F.col("w").alias("dw"))
    dots = (
        pairs.join(sw, "src_doc_id")
        .join(dw, ["dst_doc_id", "term"])
        .groupBy("src_doc_id", "dst_doc_id")
        .agg(F.sum(F.col("sw") * F.col("dw")).alias("dot"))
    )
    sn = norms.select(F.col("doc_id").alias("src_doc_id"), F.col("nrm").alias("s_nrm"))
    dn = norms.select(F.col("doc_id").alias("dst_doc_id"), F.col("nrm").alias("d_nrm"))
    return (
        dots.join(sn, "src_doc_id")
        .join(dn, "dst_doc_id")
        .withColumn("cosine", F.round(F.col("dot") / (F.col("s_nrm") * F.col("d_nrm")), 6))
        .filter(F.col("cosine") >= 0.2)
        .select("src_doc_id", "dst_doc_id", "cosine")
    )


SQL_TFIDF = f"""
WITH toks AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
),
toks_f AS (SELECT * FROM toks WHERE length(term) > 0),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks_f GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM toks_f GROUP BY 1),
n AS (SELECT COUNT(*)::DOUBLE AS n_docs FROM documents),
w AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(n.n_docs / dfreq.df) AS w
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
norms AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM w GROUP BY 1),
names AS ({_SQL_DOC_NAMES}),
s AS (SELECT doc_id AS src_doc_id, block_key FROM names WHERE doc_id % 2 = 0),
d AS (SELECT doc_id AS dst_doc_id, block_key FROM names WHERE doc_id % 2 = 1),
pairs AS (SELECT src_doc_id, dst_doc_id FROM s JOIN d USING (block_key)),
dots AS (
  SELECT p.src_doc_id, p.dst_doc_id, SUM(ws.w * wd.w) AS dot
  FROM pairs p
  JOIN w ws ON ws.doc_id = p.src_doc_id
  JOIN w wd ON wd.doc_id = p.dst_doc_id AND wd.term = ws.term
  GROUP BY 1, 2
)
SELECT dots.src_doc_id, dots.dst_doc_id,
       ROUND(dot / (ns.nrm * nd.nrm), 6) AS cosine
FROM dots
JOIN norms ns ON ns.doc_id = dots.src_doc_id
JOIN norms nd ON nd.doc_id = dots.dst_doc_id
WHERE ROUND(dot / (ns.nrm * nd.nrm), 6) >= 0.2
"""


def q_matrix_gram(spark, sf_dir):
    """Sparse matrix algebra (operators/matrix.py — SimilarityMatrix
    transpose/plus/times re-expressed relationally): the Gram matrix
    G = A × Aᵀ of the q-gram pair matrix (rows = src docs, cols = dst docs).
    G[s1,s2] = Σ_d sim(s1,d)·sim(s2,d) — co-candidate affinity between
    source docs. Relational matmul: equi-join on the contracted dst key +
    groupBy sum, zero cells never materialized."""
    from .operators.matrix import times, transpose

    # Measured: caching the slim pair table before the self-join does NOT
    # help (12.1 s vs 13.1 s at sf0.1) — the matmul shuffle dominates, and
    # the qgram subtree is cheap codegen (the inverse of the _minhash_sigs
    # lesson: materialize only what's expensive AND fanned out).
    a = q_qgram_jaccard_pairs(spark, sf_dir).select(
        F.col("src_doc_id").alias("row_id"),
        F.col("dst_doc_id").alias("col_id"),
        F.col("qgram_sim").alias("v"),
    )
    g = times(a, transpose(a))
    return g.select(
        F.col("row_id").alias("src_a"),
        F.col("col_id").alias("src_b"),
        F.round("v", 6).alias("gram"),
    )


SQL_MATRIX_GRAM = f"""
WITH qg AS ({SQL_QGRAM})
SELECT a.src_doc_id AS src_a, b.src_doc_id AS src_b,
       ROUND(SUM(a.qgram_sim * b.qgram_sim), 6) AS gram
FROM qg a JOIN qg b ON a.dst_doc_id = b.dst_doc_id
GROUP BY 1, 2
"""


def _mutual_best(pairs):
    """One mutual-best round over a (src_doc_id, dst_doc_id, cosine) pair
    table — shared by q_mutual_best_selection and q_completion_anti_join
    (the latter feeds a materialized pair table so the TF-IDF subtree is
    computed once, not once per branch)."""
    ws = Window.partitionBy("src_doc_id").orderBy(
        F.desc("cosine"), F.asc("dst_doc_id")
    )
    wd = Window.partitionBy("dst_doc_id").orderBy(
        F.desc("cosine"), F.asc("src_doc_id")
    )
    return (
        pairs.withColumn("rs", F.row_number().over(ws))
        .withColumn("rd", F.row_number().over(wd))
        .filter((F.col("rs") == 1) & (F.col("rd") == 1))
        .select("src_doc_id", "dst_doc_id", "cosine")
    )


def q_mutual_best_selection(spark, sf_dir):
    """One mutual-best round over the TF-IDF pairs — the SQL-expressible core
    of the greedy/stable-marriage 1-1 selection (scanWithBothConstraints,
    §2.6)."""
    return _mutual_best(q_tfidf_cosine_pairs(spark, sf_dir))


SQL_MUTUAL_BEST = f"""
WITH pairs AS ({SQL_TFIDF})
SELECT src_doc_id, dst_doc_id, cosine FROM (
  SELECT *,
    ROW_NUMBER() OVER (PARTITION BY src_doc_id ORDER BY cosine DESC, dst_doc_id ASC) AS rs,
    ROW_NUMBER() OVER (PARTITION BY dst_doc_id ORDER BY cosine DESC, src_doc_id ASC) AS rd
  FROM pairs
) WHERE rs = 1 AND rd = 1
"""


# ---------------------------------------------------------------------------
# training-data-pipeline ops: dedup / similarity search / text analysis
# ---------------------------------------------------------------------------


def q_dedup_exact(spark, sf_dir):
    """Exact dedup by content fingerprint (hash-groupBy): canonical = min id."""
    d = load(spark, sf_dir, "documents")
    key = F.md5(F.array_join(F.slice(_doc_tokens(F.col("text")), 1, 5), " "))
    return (
        d.select("doc_id", key.alias("fp"))
        .groupBy("fp")
        .agg(
            F.count("*").alias("dup_count"),
            F.min("doc_id").alias("canonical_doc_id"),
        )
        .filter(F.col("dup_count") >= 1)
    )


SQL_DEDUP_EXACT = """
SELECT md5(array_to_string(list_slice(string_split_regex(trim(text), '\\s+'), 1, 5), ' ')) AS fp,
       COUNT(*) AS dup_count, MIN(doc_id) AS canonical_doc_id
FROM documents GROUP BY 1 HAVING COUNT(*) >= 1
"""


def _word_shingles(text_col, q: int = 3):
    """Distinct word q-shingles (order-sensitive dedup feature — token *sets*
    saturate on a small vocabulary; shingles don't)."""
    toks = _doc_tokens(text_col)
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), n - (q - 1)),
        lambda i: F.concat_ws(
            " ", *[F.element_at(toks, i + k) for k in range(q)]
        ),
    )
    return F.array_distinct(
        F.when(n < q, F.array(F.array_join(toks, " "))).otherwise(grams)
    )


def _minhash_sigs(d: DataFrame) -> DataFrame:
    """→ (doc_id, sig0..sig15): minhash over the distinct word-3-shingle set,
    md5-derived shingle hashes (engine-portable integers — exact parity with
    SQL oracle).

    The shingle-hash array is materialized (cached) BEFORE the 16 signature
    mins: higher-order functions are interpreted (no codegen subexpression
    elimination), so leaving `hs` as an expression re-runs shingling+md5
    16x per row — measured 7x slower. The input is fanned out first
    (single-file scan = 1 split) so the shingle+md5 pass uses every core."""
    hs_df = _fan(d).select(
        "doc_id",
        F.transform(
            _word_shingles(F.col("text")), lambda t: _md5int_col(t)
        ).alias("hs"),
    ).cache()
    return hs_df.select(
        "doc_id",
        *[
            F.array_min(
                F.transform(
                    F.col("hs"), lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MH_P)
                )
            ).alias(f"sig{j}")
            for j, (a, b) in enumerate(zip(MH_A, MH_B))
        ],
    )


def q_minhash_lsh_pairs(spark, sf_dir):
    """MinHash + LSH near-dup detection: 16 signatures, 4 bands x 4 rows;
    docs sharing any band bucket become candidates (a < b), then the full
    signature vectors estimate Jaccard (matching sigs / 16) and pairs below
    MH_EST_MIN are dropped. The band equi-join replaces all-pairs comparison
    — the scale path for dedup on a 100 TB corpus."""
    d = load(spark, sf_dir, "documents")
    # eager materialization: ~10 downstream branches (4 band selects, the
    # candidate join's two sides, two signature re-joins) otherwise race the
    # cold cache CONCURRENTLY — profiled at bench SF as 10 parallel 1-task
    # stages EACH recomputing the full shingle+md5+16-min pass (75 s of
    # executor time for 8 s of work); one count() populates the cache once,
    # 32-way parallel, and every branch then reads it
    sig = _minhash_sigs(d).cache()
    sig.count()
    bands = None
    for i in range(N_BANDS):
        b = sig.select(
            "doc_id",
            F.lit(i).alias("band"),
            F.concat_ws(
                "-", *[F.col(f"sig{BAND_ROWS * i + r}") for r in range(BAND_ROWS)]
            ).alias("bkey"),
        )
        bands = b if bands is None else bands.unionByName(b)
    a = bands.select(F.col("doc_id").alias("doc_a"), "band", "bkey")
    bb = bands.select(F.col("doc_id").alias("doc_b"), "band", "bkey")
    cand = (
        a.join(bb, ["band", "bkey"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sig_arr = sig.select(
        "doc_id", F.array(*[F.col(f"sig{j}") for j in range(N_SIGS)]).alias("sigs")
    )
    sa = sig_arr.select(F.col("doc_id").alias("doc_a"), F.col("sigs").alias("sigs_a"))
    sb = sig_arr.select(F.col("doc_id").alias("doc_b"), F.col("sigs").alias("sigs_b"))
    est = F.aggregate(
        F.zip_with("sigs_a", "sigs_b", lambda x, y: (x == y).cast("int")),
        F.lit(0),
        lambda acc, v: acc + v,
    ).cast("double") / N_SIGS
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
        .withColumn("est_jaccard", F.round(est, 6))
        .filter(F.col("est_jaccard") >= MH_EST_MIN)
        .select("doc_a", "doc_b", "est_jaccard")
    )


def _sql_minhash_sigs() -> str:
    sig_exprs = ",\n         ".join(
        f"list_min(list_transform(toks, t -> ({a} * (('0x' || substr(md5(t),1,8))::BIGINT) + {b}) % {MH_P})) AS sig{j}"
        for j, (a, b) in enumerate(zip(MH_A, MH_B))
    )
    return f"""
  SELECT doc_id, {sig_exprs}
  FROM (SELECT doc_id,
               list_distinct(
                 CASE WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                      ELSE list_transform(range(1, len(t) - 1),
                           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                 END) AS toks
        FROM (SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t
              FROM documents))
"""


def _sql_band_key(i: int) -> str:
    return " || '-' || ".join(f"sig{BAND_ROWS * i + r}" for r in range(BAND_ROWS))


SQL_MINHASH = f"""
WITH sig AS ({_sql_minhash_sigs()}),
bands AS (
  {" UNION ALL ".join(
      f"SELECT doc_id, {i} AS band, {_sql_band_key(i)} AS bkey FROM sig"
      for i in range(N_BANDS)
  )}
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.bkey = b.bkey
  WHERE a.doc_id < b.doc_id
),
sigv AS (SELECT doc_id, [{", ".join(f"sig{j}" for j in range(N_SIGS))}] AS sigs FROM sig)
SELECT c.doc_a, c.doc_b,
       ROUND(len(list_filter(range(1, {N_SIGS} + 1),
                 i -> sa.sigs[i] = sb.sigs[i]))::DOUBLE / {N_SIGS}, 6) AS est_jaccard
FROM cand c
JOIN sigv sa ON sa.doc_id = c.doc_a
JOIN sigv sb ON sb.doc_id = c.doc_b
WHERE len(list_filter(range(1, {N_SIGS} + 1),
          i -> sa.sigs[i] = sb.sigs[i]))::DOUBLE / {N_SIGS} >= {MH_EST_MIN}
"""


def q_embedding_topk(spark, sf_dir):
    """Brute-force cosine top-5 ANN baseline over the embedding column for
    probe vectors (vec_id < 20): JVM-side zip_with/aggregate dot products —
    no Python in the hot path. The scale path is LSH bucketing (next round)."""
    from .functions.spark_sims import cosine_array_col

    e = _fan(load(spark, sf_dir, "embeddings"))
    probes = e.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("probe_id"), F.col("embedding").alias("pe")
    )
    cands = e.select(F.col("vec_id").alias("cand_id"), F.col("embedding").alias("ce"))
    scored = (
        probes.crossJoin(cands)
        .filter(F.col("probe_id") != F.col("cand_id"))
        .withColumn("cosine", F.round(cosine_array_col(F.col("pe"), F.col("ce")), 6))
    )
    w = Window.partitionBy("probe_id").orderBy(F.desc("cosine"), F.asc("cand_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("probe_id", "cand_id", "cosine", F.col("rn").cast("int").alias("rnk"))
    )


SQL_EMBED_TOPK = """
WITH p AS (
  SELECT a.vec_id AS probe_id, b.vec_id AS cand_id,
         ROUND(
           list_sum(list_transform(range(1, len(a.embedding) + 1),
                    i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))),
           6) AS cosine
  FROM embeddings a JOIN embeddings b ON a.vec_id < 20 AND a.vec_id <> b.vec_id
)
SELECT probe_id, cand_id, cosine, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY cosine DESC, cand_id ASC) AS INT) AS rnk
  FROM p
) WHERE rnk <= 5
"""


def q_doc_stats(spark, sf_dir):
    """Text-analysis: token counts, char counts, stopword ratio, fingerprint
    (training-data quality scoring)."""
    d = load(spark, sf_dir, "documents")
    toks = _doc_tokens(F.col("text"))
    n_toks = F.size(toks)
    stop_hits = F.size(
        F.filter(toks, lambda t: t.isin(STOPWORDS))
    )
    return d.select(
        "doc_id",
        n_toks.cast("long").alias("n_tokens"),
        F.length(F.trim(F.col("text"))).cast("long").alias("n_chars_trim"),
        F.round(stop_hits.cast("double") / n_toks, 6).alias("stopword_ratio"),
        F.md5(F.trim(F.col("text"))).alias("fingerprint"),
    )


SQL_DOC_STATS = f"""
WITH t AS (
  SELECT doc_id, trim(text) AS txt,
         string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
)
SELECT doc_id,
       len(toks)::BIGINT AS n_tokens,
       length(txt)::BIGINT AS n_chars_trim,
       ROUND(len(list_filter(toks, x -> x IN {STOPWORDS_SQL}))::DOUBLE / len(toks), 6)
         AS stopword_ratio,
       md5(txt) AS fingerprint
FROM t
"""


def q_doc_quality(spark, sf_dir):
    """Quality score: blend of length band, stopword presence and mean token
    length (heuristic scorer for corpus filtering)."""
    stats = q_doc_stats(spark, sf_dir)
    score = (
        F.when((F.col("n_tokens") >= 20) & (F.col("n_tokens") <= 200), 0.4)
        .otherwise(0.1)
        + F.when(
            (F.col("stopword_ratio") >= 0.05) & (F.col("stopword_ratio") <= 0.5), 0.3
        ).otherwise(0.0)
        + F.when(
            (F.col("n_chars_trim") / F.col("n_tokens") >= 3)
            & (F.col("n_chars_trim") / F.col("n_tokens") <= 12),
            0.3,
        ).otherwise(0.0)
    )
    return stats.select("doc_id", F.round(score, 2).alias("quality"))


SQL_DOC_QUALITY = f"""
WITH stats AS ({SQL_DOC_STATS})
SELECT doc_id,
       ROUND(
         (CASE WHEN n_tokens BETWEEN 20 AND 200 THEN 0.4 ELSE 0.1 END)
       + (CASE WHEN stopword_ratio BETWEEN 0.05 AND 0.5 THEN 0.3 ELSE 0.0 END)
       + (CASE WHEN n_chars_trim::DOUBLE / n_tokens BETWEEN 3 AND 12 THEN 0.3 ELSE 0.0 END)
       , 2) AS quality
FROM stats
"""


# ---------------------------------------------------------------------------
# batch 2: matcher-composition, structural and ANN operators
# ---------------------------------------------------------------------------


def q_asm_sorted_token_match(spark, sf_dir):
    """ASM compound-word inversion (AdvancedSimilarityMatcher.java:31-317):
    sorted-token equality key over part names, BSM-style tier scores
    (exact=1.0, token-reorder=0.95). Even partkeys = source side."""
    p = load(spark, sf_dir, "part")
    key = F.array_join(F.array_sort(F.split(F.col("p_name"), " ")), " ")
    s = p.filter(F.col("p_partkey") % 2 == 0).select(
        F.col("p_partkey").alias("src_part"), F.col("p_name").alias("s_name"),
        key.alias("k"),
    )
    d = p.filter(F.col("p_partkey") % 2 == 1).select(
        F.col("p_partkey").alias("dst_part"), F.col("p_name").alias("d_name"),
        key.alias("k"),
    )
    return s.join(d, "k").select(
        "src_part", "dst_part",
        F.when(F.col("s_name") == F.col("d_name"), 1.0).otherwise(0.95).alias("sim"),
    )


SQL_ASM = """
WITH p AS (
  SELECT p_partkey, p_name,
         array_to_string(list_sort(string_split(p_name, ' ')), ' ') AS k
  FROM part
)
SELECT s.p_partkey AS src_part, d.p_partkey AS dst_part,
       CASE WHEN s.p_name = d.p_name THEN 1.0 ELSE 0.95 END AS sim
FROM p s JOIN p d ON s.k = d.k AND s.p_partkey % 2 = 0 AND d.p_partkey % 2 = 1
"""


def q_asm_content_words(spark, sf_dir):
    """ASM content-word sub-matrix (AdvancedSimilarityMatcher.java:154-323,
    VERDICT r03 missing item #2): 4-token doc names, nonContent bonus /
    NO_MATCH state machine, per-pair greedy 1-1 over the content-token
    kernel grid, computeValue weight switch with literal exp/atan terms.
    Kernel for the oracle twin = min-length-normalized Levenshtein (the
    operator's default AMSUB_AND_EDIT kernel is parity-tested in
    tests/test_asm.py against a pure-Python port of the reference loop —
    DuckDB has no AMSub builtin). Blocked on the first token's first
    letter; even doc_ids = source side. The ~26-letter block key alone
    caps join parallelism at the key count (VERDICT r04 weak #2), so the
    src side is salt-subdivided (blocking.salted_exact_pairs recipe) and
    the dst side replicated — the PAIR SET is identical to the unsalted
    join (salt only redistributes it), so the DuckDB twin is unchanged."""
    from .functions.spark_sims import lev_min_norm_col
    from .operators.matchers import asm_advanced_sim

    n_salt = 16
    d0 = _fan(load(spark, sf_dir, "documents"))
    toks = F.transform(
        F.slice(_doc_tokens(F.col("text")), 1, 4), lambda x: F.lower(x)
    )
    names = d0.select("doc_id", toks.alias("tk")).withColumn(
        "bk", F.substring(F.element_at(F.col("tk"), 1), 1, 1)
    )
    s = names.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src_id"), F.col("tk").alias("src_toks"), "bk"
    ).withColumn("salt", F.pmod(F.hash("src_id"), F.lit(n_salt)))
    d = names.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("dst_id"), F.col("tk").alias("dst_toks"), "bk"
    ).withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1))))
    pairs = s.join(d, ["bk", "salt"]).select(
        "src_id", "dst_id", "src_toks", "dst_toks"
    )
    out = asm_advanced_sim(
        pairs, kernel=lev_min_norm_col, max_tokens=4, row_kernel=True
    )
    return out.select(
        F.col("src_id").alias("src_doc_id"),
        F.col("dst_id").alias("dst_doc_id"),
        "asm_sim",
    )


def _build_sql_asm_content(mt: int = 4) -> str:
    """DuckDB twin of q_asm_content_words. The greedy 1-1 over each pair's
    content-token grid is K=mt unrolled mutual-best rounds (mutual-best
    fixpoint == greedy under the total order (sim6 DESC, i, j); each round
    selects >=1 cell per still-active pair so min(ns,nt) <= mt rounds
    suffice). exp/atan weights come from the SAME asm_weight_tables literals
    the Spark side uses, so both engines compare identical doubles."""
    from .operators.matchers import (
        ASM_ISHAS, ASM_NONCONTENT, ASM_PREP, asm_weight_tables,
    )

    ishas = ", ".join(f"'{w}'" for w in ASM_ISHAS)
    prep = ", ".join(f"'{w}'" for w in ASM_PREP)
    rel = ishas + ", " + prep
    noncontent = ", ".join(f"'{w}'" for w in ASM_NONCONTENT)
    svc, add = asm_weight_tables(mt)
    svc_case = "CASE " + " ".join(
        f"WHEN wd = {d} THEN {svc[d]!r}" for d in range(mt + 1)
    ) + " END"
    add_case = "CASE " + " ".join(
        f"WHEN wd = {d} AND aw = {a} THEN {v!r}"
        for (d, a), v in add.items()
    ) + " END"
    lev = (
        "CASE WHEN length(a) = 0 AND length(b) = 0 THEN 1.0 "
        "WHEN least(length(a), length(b)) = 0 THEN 0.0 "
        "ELSE 1.0 - least(levenshtein(a, b), least(length(a), length(b)))::DOUBLE"
        " / least(length(a), length(b)) END"
    )
    rounds, sels = "", []
    for r in range(1, mt + 1):
        rounds += f"""
b{r} AS (
  SELECT sid, did, i, j, sim6 FROM (
    SELECT c.*,
           row_number() OVER (PARTITION BY sid, did, i ORDER BY sim6 DESC, j) AS rs,
           row_number() OVER (PARTITION BY sid, did, j ORDER BY sim6 DESC, i) AS rd
    FROM cells{r - 1} c) WHERE rs = 1 AND rd = 1
),
cells{r} AS (
  SELECT c.* FROM cells{r - 1} c
  WHERE NOT EXISTS (SELECT 1 FROM b{r} x
                    WHERE x.sid = c.sid AND x.did = c.did
                      AND (x.i = c.i OR x.j = c.j))
),"""
        sels.append(f"SELECT sid, did, sim6 FROM b{r}")
    sel_union = " UNION ALL ".join(sels)

    return f"""
WITH toks AS (
  SELECT doc_id,
         list_transform(list_slice(string_split_regex(trim(text), '\\s+'), 1, {mt}),
                        x -> lower(x)) AS tk
  FROM documents
),
named AS (SELECT doc_id, tk, substr(tk[1], 1, 1) AS bk FROM toks),
pairs AS (
  SELECT s.doc_id AS sid, d.doc_id AS did, s.tk AS st, d.tk AS dt
  FROM named s JOIN named d ON s.bk = d.bk
  WHERE s.doc_id % 2 = 0 AND d.doc_id % 2 = 1
),
rels AS (
  SELECT sid, did, unnest(list_filter(st, x -> x IN ({rel}))) AS s,
         generate_subscripts(list_filter(st, x -> x IN ({rel})), 1) AS si
  FROM pairs
),
reld AS (
  SELECT sid, did, unnest(list_filter(dt, x -> x IN ({rel}))) AS t,
         generate_subscripts(list_filter(dt, x -> x IN ({rel})), 1) AS tj
  FROM pairs
),
oc AS (
  SELECT r.sid, r.did, r.si,
         MIN(CASE WHEN d.t = r.s THEN d.tj END) AS pos_eq,
         MIN(CASE WHEN ((r.s IN ({ishas}) AND d.t IN ({ishas}))
                     OR (r.s IN ({prep}) AND d.t IN ({prep})))
                   AND d.t <> r.s THEN d.tj END) AS pos_conf,
         COUNT(d.tj) AS n_rel_t
  FROM rels r LEFT JOIN reld d ON r.sid = d.sid AND r.did = d.did
  GROUP BY r.sid, r.did, r.si, r.s
),
oc2 AS (
  SELECT sid, did, si,
         CASE WHEN pos_conf IS NOT NULL
                   AND (pos_eq IS NULL OR pos_conf < pos_eq) THEN -1.0
              WHEN pos_eq IS NOT NULL THEN 0.05
              WHEN n_rel_t > 0 THEN 0.0 END AS outcome
  FROM oc
),
bonusp AS (
  SELECT sid, did,
         bool_or(outcome = -1.0) AS nm,
         arg_max(outcome, si) FILTER (WHERE outcome IS NOT NULL) AS last_oc
  FROM oc2 GROUP BY sid, did
),
cw AS (
  SELECT p.sid, p.did,
         COALESCE(b.last_oc, 0.0) AS bonus,
         list_filter(p.st, x -> x NOT IN ({noncontent})) AS sc,
         list_filter(p.dt, x -> x NOT IN ({noncontent})) AS dc
  FROM pairs p LEFT JOIN bonusp b ON p.sid = b.sid AND p.did = b.did
  WHERE NOT COALESCE(b.nm, FALSE)
),
cw2 AS (
  SELECT sid, did, bonus, sc, dc, len(sc) AS ns, len(dc) AS nt
  FROM cw WHERE len(sc) > 0 AND len(dc) > 0
),
scell AS (SELECT sid, did, unnest(sc) AS a, generate_subscripts(sc, 1) AS i FROM cw2),
dcell AS (SELECT sid, did, unnest(dc) AS b, generate_subscripts(dc, 1) AS j FROM cw2),
cells0 AS (
  SELECT s.sid, s.did, s.i, d.j,
         CAST(ROUND(({lev}) * 1e6, 0) AS BIGINT) AS sim6
  FROM scell s JOIN dcell d ON s.sid = d.sid AND s.did = d.did
),{rounds}
sel AS ({sel_union}),
sums AS (SELECT sid, did, SUM(sim6) AS sum6 FROM sel GROUP BY sid, did),
fin AS (
  SELECT c.sid, c.did, c.bonus, c.ns, c.nt, m.sum6,
         ABS(c.ns - c.nt) AS wd, (c.ns + c.nt) // 2 AS aw
  FROM cw2 c JOIN sums m ON c.sid = m.sid AND c.did = m.did
),
cv AS (
  SELECT sid, did, bonus,
         LEAST(1.0, (sum6::DOUBLE / (LEAST(ns, nt)::DOUBLE * 1e6))
                    * ({svc_case}) + ({add_case})) AS cval
  FROM fin
)
SELECT sid AS src_doc_id, did AS dst_doc_id,
       FLOOR((CASE WHEN bonus > 0 THEN LEAST(1.0, cval * (1.0 + bonus))
                   ELSE LEAST(1.0, cval) END) * 1e6) / 1e6 AS asm_sim
FROM cv WHERE cval > 0
"""


SQL_ASM_CONTENT = _build_sql_asm_content(4)


# ranks at depth d of the 4-ary doc tree start at (4^d - 1)/3; 14 bounds
# cover 22M docs per side (sf ~1000). A CASE ladder, not log4 arithmetic —
# floor(log(3r+1)/log(4)) misrounds at exact powers of 4.
_CONCEPT_DEPTH_BOUNDS = [(4 ** d - 1) // 3 for d in range(14)]


def q_concept_match(spark, sf_dir):
    """ConceptMatcher (conceptMatcher/ConceptMatcher.java:264-331, VERDICT
    r04 missing item #1): descendant-set + ancestor-set multiset Jaccard +
    text blend at the reference's default 0.75/0.75/0.75 weights, over two
    deterministic 4-ary trees built on the documents table (even doc_ids =
    source ontology, odd = target; parent(rank) = (rank-1) div 4). Node
    name = lowercased first token. Pairs: internal (has-children) nodes
    blocked on (tree depth, first letter) — ~7x26 block keys, so join
    parallelism is never capped by a single hot key. Text kernel for the
    oracle twin = min-length-normalized Levenshtein (same substitution as
    q_asm_content_words; the reference's LCS-subsequence default kernel is
    parity-tested in tests/test_concept.py). All ratios are exact-integer
    divisions and the blend mirrors the SQL expression order literally, so
    both engines floor identical doubles at 1e-6."""
    from .functions.spark_sims import lev_min_norm_col
    from .operators.concept import concept_match

    d0 = load(spark, sf_dir, "documents")
    name = F.lower(F.element_at(_doc_tokens(F.col("text")), 1))
    depth = F.when(F.col("rnk") < _CONCEPT_DEPTH_BOUNDS[1], 0)
    for dd in range(1, 13):
        depth = depth.when(F.col("rnk") < _CONCEPT_DEPTH_BOUNDS[dd + 1], dd)
    depth = depth.otherwise(13)
    nd = (
        d0.select(
            F.col("doc_id").alias("node_id"),
            name.alias("name"),
            F.expr("doc_id % 2").alias("side"),
            F.expr("doc_id DIV 2").alias("rnk"),
        )
        .withColumn("depth", depth)
        .withColumn("bk", F.substring("name", 1, 1))
    )
    edges = nd.filter(F.col("rnk") >= 1).select(
        F.col("node_id").alias("child_id"),
        (F.expr("(rnk - 1) DIV 4") * 2 + F.col("side")).alias("parent_id"),
        "side",
    )
    internal = edges.select(F.col("parent_id").alias("node_id")).distinct()
    nodes_s = nd.filter(F.col("side") == 0)
    nodes_d = nd.filter(F.col("side") == 1)
    int_s = nodes_s.join(internal, "node_id", "semi")
    int_d = nodes_d.join(internal, "node_id", "semi")
    pairs = (
        int_s.select(
            F.col("node_id").alias("src_id"), "depth", "bk"
        ).join(
            int_d.select(F.col("node_id").alias("dst_id"), "depth", "bk"),
            ["depth", "bk"],
        )
        .select("src_id", "dst_id")
    )
    out = concept_match(
        pairs,
        nodes_s.select("node_id", "name"),
        nodes_d.select("node_id", "name"),
        edges.filter(F.col("side") == 0).select("child_id", "parent_id"),
        edges.filter(F.col("side") == 1).select("child_id", "parent_id"),
        text_sim=lev_min_norm_col,
    )
    blend = (
        F.col("desc_sim") * 0.75
        + F.col("anc_sim") * 0.75
        + F.col("text_sim") * 0.75
    ) / 2.25
    return out.select(
        F.col("src_id").alias("src_doc_id"),
        F.col("dst_id").alias("dst_doc_id"),
        (F.floor(F.col("desc_sim") * 1e6) / 1e6).alias("desc_sim6"),
        (F.floor(F.col("anc_sim") * 1e6) / 1e6).alias("anc_sim6"),
        (F.floor(F.col("text_sim") * 1e6) / 1e6).alias("text_sim6"),
        (F.floor(blend * 1e6) / 1e6).alias("sim6"),
    )


def _build_sql_concept_match() -> str:
    """DuckDB twin of q_concept_match: the ancestor closure is a recursive
    CTE on the same arithmetic tree; the descendant closure is its
    transpose; multiset intersections are min(cnt) equi-joins on the
    concept value — literally the Spark plan in SQL."""
    depth_case = "CASE " + " ".join(
        f"WHEN rnk < {_CONCEPT_DEPTH_BOUNDS[d + 1]} THEN {d}"
        for d in range(13)
    ) + " ELSE 13 END"
    def lev(a: str, b: str) -> str:
        return (
            f"CASE WHEN length({a}) = 0 AND length({b}) = 0 THEN 1.0 "
            f"WHEN least(length({a}), length({b})) = 0 THEN 0.0 "
            f"ELSE 1.0 - least(levenshtein({a}, {b}), "
            f"least(length({a}), length({b})))::DOUBLE"
            f" / least(length({a}), length({b})) END"
        )

    text_expr = lev("p.sname", "p.dname")
    return f"""
WITH RECURSIVE nd AS (
  SELECT doc_id AS node_id,
         lower(string_split_regex(trim(text), '\\s+')[1]) AS name,
         doc_id % 2 AS side,
         doc_id // 2 AS rnk
  FROM documents
),
nd2 AS (
  SELECT node_id, name, side, rnk, {depth_case} AS depth,
         substr(name, 1, 1) AS bk
  FROM nd
),
edges AS (
  SELECT node_id AS child_id, ((rnk - 1) // 4) * 2 + side AS parent_id
  FROM nd2 WHERE rnk >= 1
),
internal AS (SELECT DISTINCT parent_id AS node_id FROM edges),
anc AS (
  SELECT child_id AS node_id, parent_id AS anc_id FROM edges
  UNION ALL
  SELECT a.node_id, e.parent_id
  FROM anc a JOIN edges e ON e.child_id = a.anc_id
),
anc_all AS (
  SELECT node_id, anc_id FROM anc
  UNION ALL
  SELECT node_id, node_id FROM nd2
),
anc_cnt AS (
  SELECT a.node_id, n2.name AS concept, COUNT(*) AS cnt
  FROM anc_all a JOIN nd2 n2 ON n2.node_id = a.anc_id
  GROUP BY a.node_id, n2.name
),
anc_sz AS (SELECT node_id, SUM(cnt) AS sz FROM anc_cnt GROUP BY node_id),
desc_cnt AS (
  SELECT a.anc_id AS node_id, n2.name AS concept, COUNT(*) AS cnt
  FROM anc a JOIN nd2 n2 ON n2.node_id = a.node_id
  GROUP BY a.anc_id, n2.name
),
desc_sz AS (SELECT node_id, SUM(cnt) AS sz FROM desc_cnt GROUP BY node_id),
pairs AS (
  SELECT s.node_id AS sid, d.node_id AS did, s.name AS sname, d.name AS dname
  FROM nd2 s JOIN nd2 d ON s.depth = d.depth AND s.bk = d.bk
  WHERE s.side = 0 AND d.side = 1
    AND s.node_id IN (SELECT node_id FROM internal)
    AND d.node_id IN (SELECT node_id FROM internal)
),
di AS (
  SELECT p.sid, p.did, SUM(LEAST(cs.cnt, cd.cnt)) AS inter
  FROM pairs p
  JOIN desc_cnt cs ON cs.node_id = p.sid
  JOIN desc_cnt cd ON cd.node_id = p.did AND cd.concept = cs.concept
  GROUP BY p.sid, p.did
),
ai AS (
  SELECT p.sid, p.did, SUM(LEAST(cs.cnt, cd.cnt)) AS inter
  FROM pairs p
  JOIN anc_cnt cs ON cs.node_id = p.sid
  JOIN anc_cnt cd ON cd.node_id = p.did AND cd.concept = cs.concept
  GROUP BY p.sid, p.did
),
scored AS (
  SELECT p.sid, p.did,
         COALESCE(di.inter, 0)::DOUBLE
           / (COALESCE(ds.sz, 0) + COALESCE(dd.sz, 0))::DOUBLE AS desc_sim,
         COALESCE(ai.inter, 0)::DOUBLE
           / (COALESCE(asz.sz, 0) + COALESCE(adz.sz, 0))::DOUBLE AS anc_sim,
         {text_expr} AS text_sim
  FROM pairs p
  LEFT JOIN desc_sz ds ON ds.node_id = p.sid
  LEFT JOIN desc_sz dd ON dd.node_id = p.did
  LEFT JOIN anc_sz asz ON asz.node_id = p.sid
  LEFT JOIN anc_sz adz ON adz.node_id = p.did
  LEFT JOIN di ON di.sid = p.sid AND di.did = p.did
  LEFT JOIN ai ON ai.sid = p.sid AND ai.did = p.did
)
SELECT sid AS src_doc_id, did AS dst_doc_id,
       FLOOR(desc_sim * 1e6) / 1e6 AS desc_sim6,
       FLOOR(anc_sim * 1e6) / 1e6 AS anc_sim6,
       FLOOR(text_sim * 1e6) / 1e6 AS text_sim6,
       FLOOR(((desc_sim * 0.75 + anc_sim * 0.75 + text_sim * 0.75) / 2.25)
             * 1e6) / 1e6 AS sim6
FROM scored
"""


SQL_CONCEPT_MATCH = _build_sql_concept_match()


def q_pra_block_pairs(spark, sf_dir):
    """PRAMatcher alignment-guided subtree re-matching
    (Matcher-PRA/.../PRAMatcher.java:71-651, VERDICT r04 missing item #2):
    a prior alignment (equal name + equal depth between internal nodes of
    the two 4-ary doc trees, sim 1.0) cuts both trees at matched nodes;
    output = every candidate pair inside a matched block, i.e. src's
    nearest matched ancestor-or-self S paired with matchedTo(S)'s subtree
    (matchedTo = max matching dst id, the reference's overwrite quirk).
    The unmatched partitions are excluded here by design — production
    routes them through blocking.candidate_pairs' caps (see operators/pra
    docstring). Integer-only output, no float parity concerns."""
    from .operators.pra import pra_block_pairs

    d0 = load(spark, sf_dir, "documents")
    name = F.lower(F.element_at(_doc_tokens(F.col("text")), 1))
    depth = F.when(F.col("rnk") < _CONCEPT_DEPTH_BOUNDS[1], 0)
    for dd in range(1, 13):
        depth = depth.when(F.col("rnk") < _CONCEPT_DEPTH_BOUNDS[dd + 1], dd)
    depth = depth.otherwise(13)
    nd = (
        d0.select(
            F.col("doc_id").alias("node_id"),
            name.alias("name"),
            F.expr("doc_id % 2").alias("side"),
            F.expr("doc_id DIV 2").alias("rnk"),
        )
        .withColumn("depth", depth)
    )
    edges = nd.filter(F.col("rnk") >= 1).select(
        F.col("node_id").alias("child_id"),
        (F.expr("(rnk - 1) DIV 4") * 2 + F.col("side")).alias("parent_id"),
        "side",
    )
    internal = edges.select(F.col("parent_id").alias("node_id")).distinct()
    int_s = nd.filter(F.col("side") == 0).join(internal, "node_id", "semi")
    int_d = nd.filter(F.col("side") == 1).join(internal, "node_id", "semi")
    prior = (
        int_s.select(
            F.col("node_id").alias("src_id"), "name", "depth"
        ).join(
            int_d.select(F.col("node_id").alias("dst_id"), "name", "depth"),
            ["name", "depth"],
        )
        .select("src_id", "dst_id", F.lit(1.0).alias("sim"))
    )
    mp, _, _ = pra_block_pairs(
        nd.filter(F.col("side") == 0).select("node_id"),
        nd.filter(F.col("side") == 1).select("node_id"),
        edges.filter(F.col("side") == 0).select("child_id", "parent_id"),
        edges.filter(F.col("side") == 1).select("child_id", "parent_id"),
        prior,
    )
    return mp.select(
        F.col("src_id").alias("src_doc_id"),
        F.col("dst_id").alias("dst_doc_id"),
        "src_root",
        "dst_root",
    )


def _build_sql_pra() -> str:
    """DuckDB twin of q_pra_block_pairs: the same arithmetic tree, the
    ancestor closure as a recursive CTE carrying distance, nearest matched
    ancestor-or-self via row_number over (dist, anc_id)."""
    depth_case = "CASE " + " ".join(
        f"WHEN rnk < {_CONCEPT_DEPTH_BOUNDS[d + 1]} THEN {d}"
        for d in range(13)
    ) + " ELSE 13 END"
    return f"""
WITH RECURSIVE nd AS (
  SELECT doc_id AS node_id,
         lower(string_split_regex(trim(text), '\\s+')[1]) AS name,
         doc_id % 2 AS side,
         doc_id // 2 AS rnk
  FROM documents
),
nd2 AS (SELECT node_id, name, side, rnk, {depth_case} AS depth FROM nd),
edges AS (
  SELECT node_id AS child_id, ((rnk - 1) // 4) * 2 + side AS parent_id, side
  FROM nd2 WHERE rnk >= 1
),
internal AS (SELECT DISTINCT parent_id AS node_id FROM edges),
prior AS (
  SELECT s.node_id AS src_id, d.node_id AS dst_id
  FROM nd2 s JOIN nd2 d ON s.name = d.name AND s.depth = d.depth
  WHERE s.side = 0 AND d.side = 1
    AND s.node_id IN (SELECT node_id FROM internal)
    AND d.node_id IN (SELECT node_id FROM internal)
),
matched_s AS (SELECT DISTINCT src_id AS node_id FROM prior),
matched_d AS (SELECT DISTINCT dst_id AS node_id FROM prior),
matched_to AS (
  SELECT src_id AS src_root, MAX(dst_id) AS dst_root FROM prior
  GROUP BY src_id
),
anc AS (
  SELECT child_id AS node_id, parent_id AS anc_id, 1 AS dist FROM edges
  UNION ALL
  SELECT a.node_id, e.parent_id, a.dist + 1
  FROM anc a JOIN edges e ON e.child_id = a.anc_id
),
anc_self AS (
  SELECT node_id, anc_id, dist FROM anc
  UNION ALL
  SELECT node_id, node_id, 0 FROM nd2
),
near_s AS (
  SELECT node_id, anc_id AS root_id FROM (
    SELECT a.node_id, a.anc_id,
           row_number() OVER (PARTITION BY a.node_id
                              ORDER BY a.dist, a.anc_id) AS rn
    FROM anc_self a
    JOIN matched_s m ON m.node_id = a.anc_id
    JOIN nd2 n ON n.node_id = a.node_id AND n.side = 0
  ) WHERE rn = 1
),
near_d AS (
  SELECT node_id, anc_id AS root_id FROM (
    SELECT a.node_id, a.anc_id,
           row_number() OVER (PARTITION BY a.node_id
                              ORDER BY a.dist, a.anc_id) AS rn
    FROM anc_self a
    JOIN matched_d m ON m.node_id = a.anc_id
    JOIN nd2 n ON n.node_id = a.node_id AND n.side = 1
  ) WHERE rn = 1
)
SELECT ns.node_id AS src_doc_id, nt.node_id AS dst_doc_id,
       ns.root_id AS src_root, nt.root_id AS dst_root
FROM near_s ns
JOIN matched_to mt ON mt.src_root = ns.root_id
JOIN near_d nt ON nt.root_id = mt.dst_root
"""


SQL_PRA = _build_sql_pra()


def q_jaro_winkler_pairs(spark, sf_dir):
    """Jaro-Winkler string similarity (JaroWinklerSim.java) on single-token
    doc names — Arrow-vectorized pandas UDF; DuckDB's builtin is the oracle
    (boost-threshold Winkler variant; verified token-level agreement).
    Blocked on the token's first letter."""
    from .functions.spark_sims import jaro_winkler_boosted_udf

    d0 = _fan(load(spark, sf_dir, "documents"))
    names = d0.select(
        "doc_id", F.element_at(_doc_tokens(F.col("text")), 1).alias("name")
    ).withColumn("bk", F.substring("name", 1, 1))
    s = names.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src_doc_id"), F.col("name").alias("s_name"), "bk"
    )
    d = names.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("dst_doc_id"), F.col("name").alias("d_name"), "bk"
    )
    return (
        s.join(d, "bk")
        .withColumn(
            "jw_sim",
            F.round(jaro_winkler_boosted_udf(F.col("s_name"), F.col("d_name")), 6),
        )
        .filter(F.col("jw_sim") >= 0.75)
        .select("src_doc_id", "dst_doc_id", "jw_sim")
    )


SQL_JW = """
WITH names AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+')[1] AS name,
         substr(string_split_regex(trim(text), '\\s+')[1], 1, 1) AS bk
  FROM documents
),
s AS (SELECT doc_id AS src_doc_id, name AS s_name, bk FROM names WHERE doc_id % 2 = 0),
d AS (SELECT doc_id AS dst_doc_id, name AS d_name, bk FROM names WHERE doc_id % 2 = 1)
SELECT src_doc_id, dst_doc_id, ROUND(jaro_winkler_similarity(s_name, d_name), 6) AS jw_sim
FROM s JOIN d USING (bk)
WHERE ROUND(jaro_winkler_similarity(s_name, d_name), 6) >= 0.75
"""


def q_lwc_combine(spark, sf_dir):
    """LWC combination (CombinationMatcher.java:93-199): full-outer join of
    two matcher pair-tables (levenshtein + q-gram) + average with missing
    treated as 0 — the AVERAGECOMB mode."""
    lev = q_lev_blocked_pairs(spark, sf_dir)
    qg = q_qgram_jaccard_pairs(spark, sf_dir)
    j = lev.join(qg, ["src_doc_id", "dst_doc_id"], "full_outer")
    # floor-truncate instead of round: the mean of two 6-decimal values can
    # land exactly on a .5 rounding boundary where engines disagree; floor of
    # the identical IEEE double is engine-portable
    avg = (
        F.coalesce(F.col("lev_sim"), F.lit(0.0))
        + F.coalesce(F.col("qgram_sim"), F.lit(0.0))
    ) / 2
    return j.select(
        "src_doc_id", "dst_doc_id",
        (F.floor(avg * 1e6) / 1e6).alias("sim_comb"),
    )


SQL_LWC = f"""
WITH lev AS ({SQL_LEV_PAIRS}), qg AS ({SQL_QGRAM})
SELECT COALESCE(lev.src_doc_id, qg.src_doc_id) AS src_doc_id,
       COALESCE(lev.dst_doc_id, qg.dst_doc_id) AS dst_doc_id,
       floor((COALESCE(lev_sim, 0.0) + COALESCE(qgram_sim, 0.0)) / 2 * 1e6) / 1e6 AS sim_comb
FROM lev FULL OUTER JOIN qg
  ON lev.src_doc_id = qg.src_doc_id AND lev.dst_doc_id = qg.dst_doc_id
"""


def q_lwc_sigmoid(spark, sf_dir):
    """LWC SIGMOIDAVERAGECOMB (operators/matchers.lwc_sigmoid_average;
    CombinationMatcher.java:182-186 + Utility.getSigmoidFunction): average
    of sigmoid-rescaled lev + q-gram sims over the full-outer pair join —
    absent matchers contribute sigmoid(0), per reference semantics."""
    from .operators.matchers import lwc_sigmoid_average

    lev = q_lev_blocked_pairs(spark, sf_dir)
    qg = q_qgram_jaccard_pairs(spark, sf_dir)
    j = lev.join(qg, ["src_doc_id", "dst_doc_id"], "full_outer")
    out = lwc_sigmoid_average(j, ["lev_sim", "qgram_sim"])
    return out.select(
        "src_doc_id", "dst_doc_id",
        F.round(F.col("sim"), 6).alias("sim_sigavg"),
    )


SQL_LWC_SIGMOID = f"""
WITH lev AS ({SQL_LEV_PAIRS}), qg AS ({SQL_QGRAM})
SELECT COALESCE(lev.src_doc_id, qg.src_doc_id) AS src_doc_id,
       COALESCE(lev.dst_doc_id, qg.dst_doc_id) AS dst_doc_id,
       ROUND((1.0 / (1.0 + exp(-5.0 * (COALESCE(lev_sim, 0.0) - 0.5)))
            + 1.0 / (1.0 + exp(-5.0 * (COALESCE(qgram_sim, 0.0) - 0.5)))) / 2,
             6) AS sim_sigavg
FROM lev FULL OUTER JOIN qg
  ON lev.src_doc_id = qg.src_doc_id AND lev.dst_doc_id = qg.dst_doc_id
"""


def q_completion_anti_join(spark, sf_dir):
    """Completion mode (AbstractMatcher.java:683-717): keep only candidate
    pairs whose source AND target are not already mapped by the prior
    (mutual-best) alignment — two anti-joins."""
    # ONE materialization of the TF-IDF pair table feeds everything: the
    # previous lazy pair of caches raced cold across branches and the
    # q_mutual_best_selection call rebuilt the TF-IDF subtree from scratch
    # (profiled ~5 evaluations, 68 s of executor time for a 13 s subtree)
    pairs = q_tfidf_cosine_pairs(spark, sf_dir).localCheckpoint()
    prior = _mutual_best(pairs)
    return (
        pairs.join(prior.select("src_doc_id").distinct(), "src_doc_id", "left_anti")
        .join(prior.select("dst_doc_id").distinct(), "dst_doc_id", "left_anti")
        .select("src_doc_id", "dst_doc_id", "cosine")
    )


SQL_COMPLETION = f"""
WITH pairs AS ({SQL_TFIDF}), prior AS ({SQL_MUTUAL_BEST})
SELECT src_doc_id, dst_doc_id, cosine FROM pairs p
WHERE NOT EXISTS (SELECT 1 FROM prior x WHERE x.src_doc_id = p.src_doc_id)
  AND NOT EXISTS (SELECT 1 FROM prior x WHERE x.dst_doc_id = p.dst_doc_id)
"""


def q_local_confidence(spark, sf_dir):
    """LocalConfidenceQuality (qualityEvaluation/metrics/LocalConfidence
    Quality.java:32-119): per-source row confidence = 1 - avg(non-best sims)
    — the weights of the quality-weighted LWC."""
    lev = q_lev_blocked_pairs(spark, sf_dir)
    agg = lev.groupBy("src_doc_id").agg(
        F.sum("lev_sim").alias("s"), F.max("lev_sim").alias("m"),
        F.count("*").alias("n"),
    )
    return agg.select(
        "src_doc_id",
        F.round(
            F.when(F.col("n") > 1, 1.0 - (F.col("s") - F.col("m")) / (F.col("n") - 1))
            .otherwise(F.lit(1.0)),
            6,
        ).alias("quality"),
        F.col("n").alias("n_candidates"),
    )


SQL_LOCAL_CONF = f"""
WITH lev AS ({SQL_LEV_PAIRS})
SELECT src_doc_id,
       ROUND(CASE WHEN COUNT(*) > 1
             THEN 1.0 - (SUM(lev_sim) - MAX(lev_sim)) / (COUNT(*) - 1)
             ELSE 1.0 END, 6) AS quality,
       COUNT(*) AS n_candidates
FROM lev GROUP BY src_doc_id
"""


def q_pr_evaluation(spark, sf_dir):
    """ReferenceEvaluator (referenceAlignment/ReferenceEvaluator.java:90-108):
    P/R/F of the mutual-best selection against a derived gold (exact-name doc
    pairs across sides) — correct = URI-pair equality join."""
    names = _doc_names(spark, sf_dir)
    s = names.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src_doc_id"), F.col("name").alias("n")
    )
    d = names.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("dst_doc_id"), F.col("name").alias("n")
    )
    # ONE job for all three counts (full-outer flag join): the previous
    # three sequential count() actions evaluated the gold and mutual-best
    # subtrees in separate jobs (both pair sets are unique on the key, so
    # the outer join multiplies nothing and the counts are identical)
    gold = (
        s.join(d, "n").select("src_doc_id", "dst_doc_id")
        .withColumn("_g", F.lit(1))
    )
    ev = (
        q_mutual_best_selection(spark, sf_dir)
        .select("src_doc_id", "dst_doc_id").withColumn("_e", F.lit(1))
    )
    row = (
        ev.join(gold, ["src_doc_id", "dst_doc_id"], "full_outer")
        .agg(
            F.sum("_e").alias("ne"),
            F.sum("_g").alias("ng"),
            F.sum(
                F.when(
                    F.col("_e").isNotNull() & F.col("_g").isNotNull(), 1
                ).otherwise(0)
            ).alias("nc"),
        )
        .collect()[0]
    )
    n_eval = int(row.ne or 0)
    n_gold = int(row.ng or 0)
    n_corr = int(row.nc or 0)
    p = n_corr / n_eval if n_eval else 0.0
    r = n_corr / n_gold if n_gold else 0.0
    f1 = 2 * p * r / (p + r) if (p + r) else 0.0
    return spark.createDataFrame(
        [(n_eval, n_gold, n_corr, round(p, 6), round(r, 6), round(f1, 6))],
        "n_eval long, n_gold long, n_correct long, precision double, recall double, fmeasure double",
    )


SQL_PR_EVAL = f"""
WITH names AS ({_SQL_DOC_NAMES}),
gold AS (
  SELECT s.doc_id AS src_doc_id, d.doc_id AS dst_doc_id
  FROM names s JOIN names d ON s.name = d.name
  WHERE s.doc_id % 2 = 0 AND d.doc_id % 2 = 1
),
ev AS (SELECT src_doc_id, dst_doc_id FROM ({SQL_MUTUAL_BEST})),
c AS (SELECT COUNT(*) AS n_correct FROM ev JOIN gold USING (src_doc_id, dst_doc_id)),
stats AS (
  SELECT (SELECT COUNT(*) FROM ev) AS n_eval,
         (SELECT COUNT(*) FROM gold) AS n_gold,
         (SELECT n_correct FROM c) AS n_correct
)
SELECT n_eval, n_gold, n_correct,
       ROUND(CASE WHEN n_eval > 0 THEN n_correct::DOUBLE / n_eval ELSE 0 END, 6) AS precision,
       ROUND(CASE WHEN n_gold > 0 THEN n_correct::DOUBLE / n_gold ELSE 0 END, 6) AS recall,
       ROUND(CASE WHEN n_correct > 0
             THEN 2.0 * (n_correct::DOUBLE / n_eval) * (n_correct::DOUBLE / n_gold)
                  / (n_correct::DOUBLE / n_eval + n_correct::DOUBLE / n_gold)
             ELSE 0 END, 6) AS fmeasure
FROM stats
"""


def q_mediating_join(spark, sf_dir):
    """MediatingMatcher (mediatingMatcher/MediatingMatcher.java:29-66):
    compose two alignments through a mediating ontology — here customer→
    nation and supplier→nation bridge into customer↔supplier with
    sim = least(sim1, sim2)."""
    c = load(spark, sf_dir, "customer")
    s = load(spark, sf_dir, "supplier")
    a2b = c.select(
        "c_custkey", F.col("c_nationkey").alias("bridge"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.abs(F.col("c_acctbal")) / 1000), 6
                ).alias("sim_c"),
    )
    c2b = s.select(
        "s_suppkey", F.col("s_nationkey").alias("bridge"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.abs(F.col("s_acctbal")) / 1000), 6
                ).alias("sim_s"),
    )
    return a2b.join(c2b, "bridge").select(
        "c_custkey", "s_suppkey",
        F.least(F.col("sim_c"), F.col("sim_s")).alias("sim_bridge"),
    )


SQL_MEDIATING = """
WITH a2b AS (
  SELECT c_custkey, c_nationkey AS bridge,
         ROUND(1.0 / (1.0 + abs(c_acctbal) / 1000), 6) AS sim_c
  FROM customer
),
c2b AS (
  SELECT s_suppkey, s_nationkey AS bridge,
         ROUND(1.0 / (1.0 + abs(s_acctbal) / 1000), 6) AS sim_s
  FROM supplier
)
SELECT c_custkey, s_suppkey, least(sim_c, sim_s) AS sim_bridge
FROM a2b JOIN c2b USING (bridge)
"""


def q_simhash_dedup(spark, sf_dir):
    """SimHash document fingerprint (16-bit, md5-derived per-token bits) +
    duplicate groups: docs sharing a simhash. The bit-majority construction
    is the standard Charikar simhash; exact integer parity with SQL."""
    d = load(spark, sf_dir, "documents")
    hs_df = d.select(
        "doc_id",
        F.transform(_doc_tokens(F.col("text")), lambda t: _md5int_col(t)).alias("hs"),
    ).cache()
    bit_cols = [
        F.when(
            F.aggregate(
                F.col("hs"), F.lit(0),
                lambda acc, h: acc
                + (F.shiftright(h, b).bitwiseAND(F.lit(1)) * 2 - 1).cast("int"),
            )
            > 0,
            F.lit(1 << b),
        ).otherwise(F.lit(0))
        for b in range(16)
    ]
    sh = hs_df.select(
        "doc_id", sum(bit_cols[1:], bit_cols[0]).cast("long").alias("simhash")
    )
    return sh.groupBy("simhash").agg(
        F.count("*").alias("n_docs"), F.min("doc_id").alias("canonical_doc_id")
    )


def _sql_simhash_bits() -> str:
    bits = " + ".join(
        f"(CASE WHEN list_sum(list_transform(hs, h -> CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END)) > 0 THEN {1 << b} ELSE 0 END)"
        for b in range(16)
    )
    return bits


SQL_SIMHASH = f"""
WITH hsv AS (
  SELECT doc_id,
         list_transform(string_split_regex(trim(text), '\\s+'),
                        t -> ('0x' || substr(md5(t),1,8))::BIGINT) AS hs
  FROM documents
),
sh AS (SELECT doc_id, CAST({_sql_simhash_bits()} AS BIGINT) AS simhash FROM hsv)
SELECT simhash, COUNT(*) AS n_docs, MIN(doc_id) AS canonical_doc_id
FROM sh GROUP BY simhash
"""


# random-hyperplane LSH planes: deterministic md5-derived ints, inlined as
# literals on BOTH engines (no RNG, engine-portable)
import hashlib as _hashlib

N_PLANES = 8
EMB_DIM = 64


def _plane(j: int) -> list[int]:
    return [
        int(_hashlib.md5(f"plane{j}_{i}".encode()).hexdigest()[:8], 16) % 2001 - 1000
        for i in range(EMB_DIM)
    ]


PLANES = [_plane(j) for j in range(N_PLANES)]


def q_ann_lsh_buckets(spark, sf_dir):
    """Random-hyperplane LSH bucket assignment over the embedding column —
    the scale path for similarity search (bucket-join replaces brute force;
    companion to q_embedding_topk). Planes are md5-derived integer literals,
    identical in the SQL oracle."""
    e = _fan(load(spark, sf_dir, "embeddings"))
    bit_cols = []
    for j, plane in enumerate(PLANES):
        pl = F.array(*[F.lit(float(v)) for v in plane])
        dot = F.aggregate(
            F.zip_with(F.col("embedding"), pl, lambda x, p: x.cast("double") * p),
            F.lit(0.0), lambda acc, v: acc + v,
        )
        bit_cols.append(F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    return e.select(
        "vec_id", sum(bit_cols[1:], bit_cols[0]).cast("long").alias("bucket")
    )


def _sql_lsh_bucket() -> str:
    parts = []
    for j, plane in enumerate(PLANES):
        lit = "[" + ", ".join(f"{v}.0" for v in plane) + "]"
        parts.append(
            f"(CASE WHEN list_sum(list_transform(range(1, {EMB_DIM} + 1), "
            f"i -> embedding[i]::DOUBLE * ({lit})[i])) > 0 THEN {1 << j} ELSE 0 END)"
        )
    return " + ".join(parts)


SQL_ANN_LSH = f"""
SELECT vec_id, CAST({_sql_lsh_bucket()} AS BIGINT) AS bucket FROM embeddings
"""


ANN_TOPK_PLANES = 4
ANN_TOPK_TABLES = 2
ANN_TOPK_K = 5


def q_ann_lsh_topk(spark, sf_dir):
    """Scalable ANN top-k (operators/ann.lsh_topk): 2 independent LSH tables
    of 4 hyperplanes each, candidates from bucket equi-joins only (never a
    cross join), cosine + deterministic top-5. The md5-derived planes make
    the DuckDB twin mechanical; recall vs the brute-force baseline is gated
    in tests (test_dedup_ann_text)."""
    from .operators.ann import lsh_topk

    e = _fan(load(spark, sf_dir, "embeddings"))
    return lsh_topk(
        e, k=ANN_TOPK_K, n_planes=ANN_TOPK_PLANES, dim=EMB_DIM,
        n_tables=ANN_TOPK_TABLES,
    )


def _sql_ann_lsh_topk() -> str:
    from .operators.ann import _planes

    def bucket_expr(t: int) -> str:
        planes = _planes(t * ANN_TOPK_PLANES + ANN_TOPK_PLANES, EMB_DIM)[
            t * ANN_TOPK_PLANES:
        ]
        parts = []
        for j, plane in enumerate(planes):
            lit = "[" + ", ".join(repr(v) for v in plane) + "]"
            parts.append(
                f"(CASE WHEN list_sum(list_transform(range(1, {EMB_DIM} + 1), "
                f"i -> embedding[i]::DOUBLE * ({lit})[i])) > 0 "
                f"THEN {1 << j} ELSE 0 END)"
            )
        return " + ".join(parts)

    buckets = " UNION ALL ".join(
        f"SELECT vec_id, {t} AS tbl, CAST({bucket_expr(t)} AS BIGINT) AS bucket "
        f"FROM embeddings"
        for t in range(ANN_TOPK_TABLES)
    )
    return f"""
WITH b AS ({buckets}),
cand AS (
  SELECT DISTINCT a.vec_id AS probe_id, c.vec_id AS cand_id
  FROM b a JOIN b c ON a.tbl = c.tbl AND a.bucket = c.bucket
  WHERE a.vec_id <> c.vec_id
),
scored AS (
  SELECT p.probe_id, p.cand_id,
         ROUND(
           list_sum(list_transform(range(1, len(ea.embedding) + 1),
                    i -> ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(ea.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(eb.embedding, x -> x::DOUBLE * x::DOUBLE)))),
           9) AS cosine
  FROM cand p
  JOIN embeddings ea ON ea.vec_id = p.probe_id
  JOIN embeddings eb ON eb.vec_id = p.cand_id
)
SELECT probe_id, cand_id, cosine, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY cosine DESC, cand_id ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {ANN_TOPK_K}
"""


SQL_ANN_LSH_TOPK = _sql_ann_lsh_topk()

# IVF (inverted-file) ANN constants, shared with the generated SQL oracle:
# 8 centroid cells trained with 3 deterministic Lloyd rounds on the 128
# md5-smallest vectors, probes scan their 2 nearest cells. Values floored
# onto the 2^-20 binary grid (exact cross-engine sums — MSSG recipe).
IVF_CENTROIDS = 8
IVF_NPROBE = 2
IVF_ITER = 3
IVF_SAMPLE = 128
IVF_GRID = float(1 << 20)


def q_ann_ivf_topk(spark, sf_dir):
    """Scalable ANN top-k via an IVF index (operators/ann.ivf_topk — the
    FAISS-style coarse quantizer, complementing the LSH scale path): k-means
    cells from a deterministic md5-seeded sample, candidates from the
    nprobe-cell equi-join only (never a cross join), exact cosine re-rank,
    deterministic top-5. The binary-grid k-means makes the DuckDB twin
    mechanical (unrolled Lloyd rounds); recall vs brute force is gated in
    tests (test_dedup_ann_text)."""
    from .operators.ann import ivf_topk

    e = _fan(load(spark, sf_dir, "embeddings"))
    # Index-parameter mode (ADVICE r03: explicit override, not only an
    # implicit row-count gate): SPARK_GRAFT_IVF_MODE = fixed | derived |
    # auto (default). auto keeps the twin's fixed 8 cells at oracle scale
    # (≤2000 vectors) and auto-derives ≈√N cells past it — with 8 fixed
    # cells a 20k-vector sf1 run degenerated to a 100M-pair cell join
    # (284 s vs 54 s derived; the bench-defaults leak VERDICT r02 flagged).
    # Only the fixed branch is oracle-checked (COVERAGE.md).
    mode = os.environ.get("SPARK_GRAFT_IVF_MODE", "auto")
    if mode == "auto":
        mode = "fixed" if e.count() <= 2000 else "derived"
    if mode == "fixed":
        return ivf_topk(
            e, k=ANN_TOPK_K, n_centroids=IVF_CENTROIDS, nprobe=IVF_NPROBE,
            n_iter=IVF_ITER, sample=IVF_SAMPLE,
        )
    return ivf_topk(e, k=ANN_TOPK_K, n_centroids=None, nprobe=IVF_NPROBE,
                    n_iter=IVF_ITER)


def _sql_ann_ivf_topk() -> str:
    """DuckDB twin of q_ann_ivf_topk: the bounded Lloyd loop unrolled as
    per-round assign/update CTE pairs on the 2^-20 grid (every dot term on
    the exact 2^-40 grid → assignments/centroids bit-identical across
    engines and summation orders), then the same nprobe cell join + cosine
    re-rank as the Spark plan."""
    D, Q = EMB_DIM, IVF_GRID
    qcols = ", ".join(
        f"floor(CAST(embedding[{i + 1}] AS DOUBLE) * {Q}) / {Q} AS q{i}"
        for i in range(D)
    )
    qlist = ", ".join(f"q{i}" for i in range(D))
    dot = " + ".join(f"t.q{i} * c.d{i}" for i in range(D))
    means = ", ".join(f"SUM(q{i}) / COUNT(*) AS m{i}" for i in range(D))
    upd = ", ".join(
        f"COALESCE(floor(m.m{i} * {Q}) / {Q}, c.d{i}) AS d{i}"
        for i in range(D)
    )
    parts = [f"""
WITH v AS MATERIALIZED (
  SELECT vec_id, {qcols} FROM embeddings
),
tr AS MATERIALIZED (
  SELECT * FROM (
    SELECT vv.*, row_number() OVER (ORDER BY h, vec_id) AS rn FROM (
      SELECT *, ('0x' || substr(md5(vec_id::VARCHAR), 1, 8))::BIGINT AS h
      FROM v) vv
  ) WHERE rn <= {IVF_SAMPLE}
),
c0 AS MATERIALIZED (
  SELECT CAST(rn - 1 AS BIGINT) AS cid,
         {", ".join(f"q{i} AS d{i}" for i in range(D))}
  FROM tr WHERE rn <= {IVF_CENTROIDS}
)"""]
    for r in range(1, IVF_ITER + 1):
        parts.append(f""",
a{r} AS MATERIALIZED (
  SELECT cid, {qlist} FROM (
    SELECT d.*, row_number() OVER (PARTITION BY vec_id
                                   ORDER BY dot DESC, cid ASC) AS rk
    FROM (SELECT t.vec_id, {", ".join(f"t.q{i}" for i in range(D))},
                 c.cid, ({dot}) AS dot
          FROM tr t CROSS JOIN c{r - 1} c) d
  ) WHERE rk = 1
),
c{r} AS MATERIALIZED (
  SELECT c.cid, {upd}
  FROM c{r - 1} c LEFT JOIN (
    SELECT cid, {means} FROM a{r} GROUP BY cid
  ) m USING (cid)
)""")
    parts.append(f""",
rkd AS MATERIALIZED (
  SELECT vec_id, cid, rk FROM (
    SELECT t.vec_id, c.cid,
           row_number() OVER (PARTITION BY t.vec_id
                              ORDER BY ({dot}) DESC, c.cid ASC) AS rk
    FROM v t CROSS JOIN c{IVF_ITER} c
  ) WHERE rk <= {IVF_NPROBE}
),
cand AS (
  SELECT p.vec_id AS probe_id, s.vec_id AS cand_id
  FROM rkd p JOIN (SELECT vec_id, cid FROM rkd WHERE rk = 1) s USING (cid)
  WHERE p.vec_id <> s.vec_id
),
scored AS (
  SELECT p.probe_id, p.cand_id,
         ROUND(
           list_sum(list_transform(range(1, len(ea.embedding) + 1),
                    i -> ea.embedding[i]::DOUBLE * eb.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(ea.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(eb.embedding, x -> x::DOUBLE * x::DOUBLE)))),
           9) AS cosine
  FROM cand p
  JOIN embeddings ea ON ea.vec_id = p.probe_id
  JOIN embeddings eb ON eb.vec_id = p.cand_id
)
SELECT probe_id, cand_id, cosine, rnk FROM (
  SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY probe_id
            ORDER BY cosine DESC, cand_id ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {ANN_TOPK_K}
""")
    return "".join(parts)


SQL_ANN_IVF_TOPK = _sql_ann_ivf_topk()


def q_ngram_jaccard_dedup(spark, sf_dir):
    """Char-5-gram Jaccard near-dup pairs over documents, blocked by the
    normalized-text 16-char prefix (operators/dedup.ngram_jaccard_pairs —
    the n-gram-Jaccard member of the dedup family; near-identical texts
    share their head, so the block join replaces the cross join)."""
    from .operators.dedup import ngram_jaccard_pairs

    d = load(spark, sf_dir, "documents")
    return ngram_jaccard_pairs(d, q=5, min_sim=0.7, block_prefix=16)


SQL_NGRAM_DEDUP = """
WITH d AS (
  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
sh AS (
  SELECT doc_id, substr(t, 1, 16) AS bk,
         CASE WHEN length(t) = 0 THEN []::VARCHAR[]
              WHEN length(t) < 5 THEN [t]
              ELSE list_transform(range(1, length(t) - 3),
                                  i -> substr(t, i::INT, 5))
         END AS grams
  FROM d
),
p AS (
  SELECT a.doc_id AS doc_a, c.doc_id AS doc_b,
         len(list_intersect(list_distinct(a.grams), list_distinct(c.grams)))::DOUBLE AS i_n,
         len(list_distinct(list_concat(list_distinct(a.grams), list_distinct(c.grams))))::DOUBLE AS u_n
  FROM sh a JOIN sh c ON a.bk = c.bk AND a.doc_id < c.doc_id
)
SELECT doc_a, doc_b,
       ROUND(CASE WHEN u_n = 0 THEN 1.0 ELSE i_n / u_n END, 6) AS jaccard
FROM p
WHERE ROUND(CASE WHEN u_n = 0 THEN 1.0 ELSE i_n / u_n END, 6) >= 0.7
"""


def q_embedding_neardup(spark, sf_dir):
    """Embedding-cosine near-dup candidate pairs via random-hyperplane LSH
    buckets (the scale path: bucket equi-join, never a cross join — bucket
    size, not corpus size, drives the pair count). Threshold 0.25 is tuned
    to the synthetic random embeddings; a production near-dup run uses the
    same plan at ≥0.95."""
    from .functions.spark_sims import cosine_array_col

    e = _fan(load(spark, sf_dir, "embeddings"))
    v = e.join(q_ann_lsh_buckets(spark, sf_dir), "vec_id")
    a = v.select(F.col("vec_id").alias("doc_a"), F.col("embedding").alias("ea"),
                 "bucket")
    c = v.select(F.col("vec_id").alias("doc_b"), F.col("embedding").alias("eb"),
                 "bucket")
    return (
        a.join(c, "bucket")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .withColumn("cosine", F.round(cosine_array_col(F.col("ea"), F.col("eb")), 6))
        .filter(F.col("cosine") >= 0.25)
        .select("doc_a", "doc_b", "cosine")
    )


SQL_EMBED_NEARDUP = f"""
WITH v AS (
  SELECT vec_id, embedding, CAST({_sql_lsh_bucket()} AS BIGINT) AS bucket
  FROM embeddings
),
p AS (
  SELECT a.vec_id AS doc_a, b.vec_id AS doc_b,
         ROUND(
           list_sum(list_transform(range(1, len(a.embedding) + 1),
                    i -> a.embedding[i]::DOUBLE * b.embedding[i]::DOUBLE))
           / (sqrt(list_sum(list_transform(a.embedding, x -> x::DOUBLE * x::DOUBLE)))
              * sqrt(list_sum(list_transform(b.embedding, x -> x::DOUBLE * x::DOUBLE)))),
           6) AS cosine
  FROM v a JOIN v b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
)
SELECT doc_a, doc_b, cosine FROM p WHERE cosine >= 0.25
"""


def q_events_pivot(spark, sf_dir):
    """Pivot: per-user event-type counts (pivot/unpivot family, §2.4)."""
    ev = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        ev.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .fillna(0, subset=types)
        .select(
            "user_id",
            *[F.col(t).cast("long").alias(f"n_{t}") for t in types],
        )
    )


SQL_EVENTS_PIVOT = """
SELECT user_id,
       COUNT(*) FILTER (WHERE event_type = 'click')    AS n_click,
       COUNT(*) FILTER (WHERE event_type = 'error')    AS n_error,
       COUNT(*) FILTER (WHERE event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (WHERE event_type = 'signup')   AS n_signup,
       COUNT(*) FILTER (WHERE event_type = 'view')     AS n_view
FROM events GROUP BY user_id
"""


# ---------------------------------------------------------------------------
# batch 3: canonicalization, as-of, rescale
# ---------------------------------------------------------------------------


def q_connected_components(spark, sf_dir):
    """Hash-min connected-components canonicalization (the north rule's
    iterative DataFrame self-join stage) over the mutual-best alignment
    graph; oracle = DuckDB recursive CTE computing the same min-label
    fixpoint. Output: (entity, component_id)."""
    from .operators.components import connected_components

    edges = q_mutual_best_selection(spark, sf_dir).select(
        F.col("src_doc_id").alias("src_id"), F.col("dst_doc_id").alias("dst_id")
    )
    return connected_components(edges).select(
        F.col("entity_id").alias("entity"), F.col("component_id")
    )


SQL_CC = f"""
WITH RECURSIVE mb AS ({SQL_MUTUAL_BEST}),
edges AS (
  SELECT src_doc_id AS a, dst_doc_id AS b FROM mb
  UNION ALL SELECT dst_doc_id, src_doc_id FROM mb
),
verts AS (SELECT DISTINCT a AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM verts
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
)
SELECT node AS entity, MIN(label) AS component_id FROM reach GROUP BY node
"""


def q_events_asof_error(spark, sf_dir):
    """As-of join (no native Spark operator — expressed as a running
    conditional max window, SURVEY 'common OLAP patterns'): for each event,
    the timestamp of the user's most recent PRIOR 'error' event."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    last_err = F.max(
        F.when(F.col("event_type") == "error", F.col("ts"))
    ).over(w)
    return ev.select(
        "event_id", "user_id", "event_type",
        last_err.alias("last_error_ts"),
    )


SQL_ASOF = """
SELECT event_id, user_id, event_type,
       MAX(CASE WHEN event_type = 'error' THEN ts END) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
       ) AS last_error_ts
FROM events
"""


def q_events_quantiles(spark, sf_dir):
    """Exact percentiles + distinct counts per event type (quality-metric
    aggregation family, §2.4; exact `percentile`, not approx, for oracle
    parity — percentile_approx/approx_count_distinct exist for the 100 TB
    path but are not hash-comparable across engines)."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.percentile(F.col("value"), F.lit(0.5)), 6).alias("p50_value"),
        F.round(F.percentile(F.col("value"), F.lit(0.95)), 6).alias("p95_value"),
        F.count_distinct("user_id").alias("n_users"),
        F.count("*").alias("n_events"),
    )


SQL_EVENTS_QUANTILES = """
SELECT event_type,
       ROUND(quantile_cont(value::DOUBLE, 0.5), 6)  AS p50_value,
       ROUND(quantile_cont(value::DOUBLE, 0.95), 6) AS p95_value,
       COUNT(DISTINCT user_id) AS n_users,
       COUNT(*) AS n_events
FROM events GROUP BY event_type
"""


def q_lang_id(spark, sf_dir):
    """Language-ID heuristic (stopword-profile argmax with deterministic
    tie-break) — operators/text.lang_id over the documents table."""
    from .operators.text import lang_id

    d = load(spark, sf_dir, "documents")
    out = lang_id(d.select("doc_id", "text"))
    return out.select("doc_id", "lang_guess", F.round("lang_score", 6).alias("lang_score"))


def _sql_lang_scores() -> str:
    from .operators.text import LANG_PROFILES

    parts = []
    for lang, words in LANG_PROFILES.items():
        lst = ", ".join(f"'{w}'" for w in words)
        parts.append(
            f"len(list_filter(toks, x -> x IN ({lst})))::DOUBLE / len(toks) AS s_{lang}"
        )
    return ", ".join(parts)


def _sql_lang_guess() -> str:
    from .operators.text import LANG_PROFILES

    langs = sorted(LANG_PROFILES)  # asc tie-break
    g = ", ".join(f"s_{la}" for la in langs)
    cases = " ".join(
        f"WHEN s_{la} = greatest({g}) THEN '{la}'" for la in langs
    )
    return f"CASE WHEN greatest({g}) = 0 THEN 'und' {cases} END"


SQL_LANG_ID = f"""
WITH t AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
s AS (SELECT doc_id, {_sql_lang_scores()} FROM t)
SELECT doc_id, {_sql_lang_guess()} AS lang_guess,
       ROUND(greatest(s_de, s_en, s_es, s_fr), 6) AS lang_score
FROM s
"""


MIX_RATES = {"en": 0.5, "es": 0.25}
MIX_DEFAULT = 0.1


def q_stratified_mix(spark, sf_dir):
    """Domain mixing (operators/sampling.stratified_sample): language-ID
    the corpus, then keep a deterministic md5-coin sample per language
    stratum (en 50%, es 25%, everything else 10%) — the mixture-targeting
    step of a training-data pipeline. Reproducible across runs/engines/
    partitionings (no RNG state); one codegen filter, no shuffle."""
    from .operators.sampling import stratified_sample
    from .operators.text import lang_id

    d = _fan(load(spark, sf_dir, "documents"))
    langs = lang_id(d.select("doc_id", "text")).select("doc_id", "lang_guess")
    return stratified_sample(
        langs, "lang_guess", MIX_RATES, "doc_id", default_rate=MIX_DEFAULT,
    )


def _sql_stratified_mix() -> str:
    cases = " ".join(
        f"WHEN lang_guess = '{k}' THEN {v}"
        for k, v in sorted(MIX_RATES.items())
    )
    return f"""
WITH t AS (
  SELECT doc_id,
         string_split_regex(trim(lower(text)), '\\s+') AS toks
  FROM documents
),
s AS (SELECT doc_id, {_sql_lang_scores()} FROM t),
l AS (SELECT doc_id, {_sql_lang_guess()} AS lang_guess FROM s)
SELECT doc_id, lang_guess FROM l
WHERE ('0x' || substr(md5('mix' || doc_id::VARCHAR), 1, 8))::BIGINT
      / 4294967296.0
      < CASE {cases} ELSE {MIX_DEFAULT} END
"""


SQL_STRATIFIED_MIX = _sql_stratified_mix()


def q_token_profile(spark, sf_dir):
    """Token counting: whitespace tokens + BPE-ish pieces (GPT-2-style
    pretokenizer shape) + chars — operators/text.token_counts."""
    from .operators.text import token_counts

    d = load(spark, sf_dir, "documents")
    return token_counts(d.select("doc_id", "text")).select(
        "doc_id", "n_ws_tokens", "n_bpe_tokens", "n_chars"
    )


SQL_TOKEN_PROFILE = """
SELECT doc_id,
       len(string_split_regex(trim(text), '\\s+'))::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+'))::BIGINT AS n_bpe_tokens,
       length(text)::BIGINT AS n_chars
FROM documents
"""


def q_salted_exact_join(spark, sf_dir):
    """Explicit skew-handling demonstration (north rule): exact-name join on
    doc first-tokens executed as a SALTED join (src side hashed into 8 salt
    buckets, dst side replicated) — output must equal the plain equi-join,
    which IS the DuckDB oracle. Hot Zipf tokens ('the', ...) make this a
    real skew case at sf0.1."""
    d0 = load(spark, sf_dir, "documents")
    names = d0.select(
        "doc_id", F.element_at(_doc_tokens(F.col("text")), 1).alias("name")
    )
    s = names.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src_doc_id"), F.col("name").alias("key")
    ).withColumn("salt", F.pmod(F.hash("src_doc_id"), F.lit(8)))
    d = names.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("dst_doc_id"), F.col("name").alias("key")
    ).withColumn("salt", F.explode(F.sequence(F.lit(0), F.lit(7))))
    return (
        s.join(d, ["key", "salt"])
        .select("src_doc_id", "dst_doc_id")
        .dropDuplicates(["src_doc_id", "dst_doc_id"])
    )


SQL_SALTED = """
WITH names AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+')[1] AS key
  FROM documents
)
SELECT DISTINCT s.doc_id AS src_doc_id, d.doc_id AS dst_doc_id
FROM names s JOIN names d ON s.key = d.key
WHERE s.doc_id % 2 = 0 AND d.doc_id % 2 = 1
"""


def q_sigmoid_rescale(spark, sf_dir):
    """Sigmoid rescale of similarities (LWC sigmoid-average input,
    CombinationMatcher.java:151-153)."""
    from .functions.spark_sims import sigmoid_col

    lev = q_lev_blocked_pairs(spark, sf_dir)
    return lev.select(
        "src_doc_id", "dst_doc_id",
        F.round(sigmoid_col(F.col("lev_sim"), k=10.0, c=0.5), 6).alias(
            "sim_sigmoid"
        ),
    )


SQL_SIGMOID = f"""
WITH lev AS ({SQL_LEV_PAIRS})
SELECT src_doc_id, dst_doc_id,
       ROUND(1.0 / (1.0 + exp(-10.0 * (lev_sim - 0.5))), 6) AS sim_sigmoid
FROM lev
"""


# ---------------------------------------------------------------------------
# iterative / fixpoint operators — SQL-checked via recursive CTEs and
# bounded unrolling (round 2: formerly rows-only; only mssg_senses keeps the
# weaker rows-only check, its k-means tail being genuinely non-SQL)
# ---------------------------------------------------------------------------


def q_one_to_one_full(spark, sf_dir):
    """FULL iterative greedy/stable-marriage 1-1 selection
    (scanWithBothConstraints fixpoint) over the TF-IDF pairs. Oracle: greedy
    matching IS SQL-expressible as a recursive CTE scanning pairs in the
    deterministic total order (sim DESC, src_uri ASC, dst_uri ASC) — the
    iterated mutual-best rounds compute exactly the greedy matching (the
    locally-dominant-edge characterization), so the two formulations
    hash-match."""
    from .operators.selection import select_one_to_one

    pairs = q_tfidf_cosine_pairs(spark, sf_dir).select(
        F.col("src_doc_id").alias("src_id"),
        F.col("dst_doc_id").alias("dst_id"),
        F.col("src_doc_id").cast("string").alias("src_uri"),
        F.col("dst_doc_id").cast("string").alias("dst_uri"),
        F.col("cosine").alias("sim"),
    )
    out = select_one_to_one(pairs, threshold=0.3)
    return out.select(
        F.col("src_id").alias("src_doc_id"),
        F.col("dst_id").alias("dst_doc_id"),
        F.round("sim", 6).alias("sim"),
    )


# Greedy 1-1 as a recursive CTE: rank all pairs by the deterministic total
# order, then scan one pair per recursion step, carrying the used src/dst
# sets as lists. URIs compare as VARCHAR on both sides (the Spark operator
# orders by the *_uri string columns).
SQL_ONE_TO_ONE = f"""
WITH RECURSIVE pr AS (
  SELECT src_doc_id, dst_doc_id, cosine AS sim,
         CAST(src_doc_id AS VARCHAR) AS su, CAST(dst_doc_id AS VARCHAR) AS du
  FROM ({SQL_TFIDF}) WHERE cosine >= 0.3
),
ranked AS MATERIALIZED (
  SELECT src_doc_id, dst_doc_id, sim,
         ROW_NUMBER() OVER (ORDER BY sim DESC, su ASC, du ASC) AS rn
  FROM pr
),
greedy(rn, taken, srcs, dsts) AS (
  SELECT 0::BIGINT, FALSE, []::BIGINT[], []::BIGINT[]
  UNION ALL
  SELECT r.rn,
         NOT list_contains(g.srcs, r.src_doc_id)
           AND NOT list_contains(g.dsts, r.dst_doc_id),
         CASE WHEN NOT list_contains(g.srcs, r.src_doc_id)
                   AND NOT list_contains(g.dsts, r.dst_doc_id)
              THEN list_append(g.srcs, r.src_doc_id) ELSE g.srcs END,
         CASE WHEN NOT list_contains(g.srcs, r.src_doc_id)
                   AND NOT list_contains(g.dsts, r.dst_doc_id)
              THEN list_append(g.dsts, r.dst_doc_id) ELSE g.dsts END
  FROM greedy g JOIN ranked r ON r.rn = g.rn + 1
)
SELECT r.src_doc_id, r.dst_doc_id, ROUND(r.sim, 6) AS sim
FROM greedy g JOIN ranked r ON r.rn = g.rn
WHERE g.taken
"""


def q_similarity_flooding_docs(spark, sf_dir):
    """Melnik similarity-flooding fixpoint over doc pairs; the doc graph
    links each doc to its `source` group (pseudo parent). The bounded
    (max 5 rounds + early convergence) iteration IS SQL-expressible as 5
    unrolled CTE steps — inflow terms are quantized on a binary grid inside
    similarity_flooding, so sums are bit-identical across engines and the
    DuckDB twin hash-matches (SQL_SF_DOCS below)."""
    from .operators.structural import similarity_flooding

    pairs = q_tfidf_cosine_pairs(spark, sf_dir).select(
        F.col("src_doc_id").alias("src_id"),
        F.col("dst_doc_id").alias("dst_id"),
        F.col("cosine").alias("sim"),
    )
    d = load(spark, sf_dir, "documents")
    # md5-derived group id (NOT F.hash: Murmur3 is engine-local) — the
    # established engine-portable integer-hash pattern
    src_hash = _md5int_col(F.col("source")) + F.lit(10_000_000)
    edges = d.select(
        F.col("doc_id").alias("child_id"),
        src_hash.alias("parent_id"),
        F.lit("grouped").alias("pred"),
    )
    # parent pseudo-pairs seeded at 0.5 so flow has somewhere to go
    parents = (
        edges.select(F.col("parent_id")).distinct()
        .select(
            F.col("parent_id").alias("src_id"),
            F.col("parent_id").alias("dst_id"),
            F.lit(0.5).alias("sim"),
        )
    )
    sigma = similarity_flooding(
        pairs.unionByName(parents), edges, edges, max_rounds=5
    )
    return sigma.filter(F.col("src_id") < 10_000_000).select(
        F.col("src_id").alias("src_doc_id"),
        F.col("dst_id").alias("dst_doc_id"),
        F.round("sim_sf", 6).alias("sim_sf"),
    )


def _sql_similarity_flooding_docs(rounds: int = 5, eps: str = "0.001") -> str:
    """DuckDB twin of q_similarity_flooding_docs: the bounded Melnik fixpoint
    unrolled into ``rounds`` CTE steps, with the early-convergence break
    reproduced by selecting the first round whose delta drops under eps.
    Exact parity holds because similarity_flooding quantizes inflow terms on
    a 2^-40 binary grid (order-independent exact sums) and rounds each
    round's sigma to 12 decimals."""
    q = "1099511627776.0"  # 2^40 — the binary quantization grid
    parts = [f"""
WITH sf_edges AS MATERIALIZED (
  SELECT doc_id AS child,
         ('0x' || substr(md5(source), 1, 8))::BIGINT + 10000000 AS parent
  FROM documents
),
sf_p0 AS MATERIALIZED (
  SELECT src_doc_id AS src, dst_doc_id AS dst, cosine AS s0 FROM ({SQL_TFIDF})
  UNION ALL
  SELECT DISTINCT parent, parent, 0.5 FROM sf_edges
),
sf_fwd AS (
  SELECT a.src AS fs, a.dst AS fd, es.parent AS ts, ed.parent AS td
  FROM sf_p0 a
  JOIN sf_edges es ON es.child = a.src
  JOIN sf_edges ed ON ed.child = a.dst
  JOIN sf_p0 b ON b.src = es.parent AND b.dst = ed.parent
),
sf_pcg0 AS (
  SELECT fs, fd, ts, td FROM sf_fwd
  UNION ALL
  SELECT f.ts, f.td, f.fs, f.fd FROM sf_fwd f
),
sf_pcg AS MATERIALIZED (
  SELECT p.fs, p.fd, p.ts, p.td, 1.0 / o.deg AS coeff
  FROM sf_pcg0 p
  JOIN (SELECT fs, fd, COUNT(*) AS deg FROM sf_pcg0 GROUP BY fs, fd) o
    ON o.fs = p.fs AND o.fd = p.fd
),
sf_sig0 AS MATERIALIZED (
  SELECT src, dst, s0, CAST(NULL AS DOUBLE) AS s_cur, s0 AS s FROM sf_p0
)"""]
    for k in range(1, rounds + 1):
        parts.append(f""",
sf_sig{k} AS MATERIALIZED (
  SELECT src, dst, s0, s_cur,
         ROUND(raw / (CASE WHEN MAX(raw) OVER () IS NULL
                             OR MAX(raw) OVER () = 0
                           THEN 1.0 ELSE MAX(raw) OVER () END), 12) AS s
  FROM (
    SELECT p.src, p.dst, p.s0, p.s AS s_cur,
           (p.s0 + p.s) + COALESCE(i.inflow, 0.0) AS raw
    FROM sf_sig{k - 1} p
    LEFT JOIN (
      SELECT c.ts, c.td, SUM(floor(c.coeff * q.s * {q}) / {q}) AS inflow
      FROM sf_pcg c JOIN sf_sig{k - 1} q ON q.src = c.fs AND q.dst = c.fd
      GROUP BY c.ts, c.td
    ) i ON i.ts = p.src AND i.td = p.dst
  )
)""")
    dsel = ", ".join(
        f"(SELECT MAX(ABS(s - s_cur)) FROM sf_sig{k}) AS d{k}"
        for k in range(1, rounds)
    )
    case = " ".join(
        f"WHEN dd.d{k} < {eps} THEN g{k}.s" for k in range(1, rounds)
    )
    joins = " ".join(
        f"JOIN sf_sig{k} g{k} ON g{k}.src = gN.src AND g{k}.dst = gN.dst"
        for k in range(1, rounds)
    )
    parts.append(f""",
sf_d AS (SELECT {dsel})
SELECT gN.src AS src_doc_id, gN.dst AS dst_doc_id,
       ROUND(CASE {case} ELSE gN.s END, 6) AS sim_sf
FROM sf_sig{rounds} gN {joins} CROSS JOIN sf_d dd
WHERE gN.src < 10000000
""")
    return "".join(parts)


SQL_SF_DOCS = _sql_similarity_flooding_docs()


def q_minhash_cc_clusters(spark, sf_dir):
    """Dedup composition: MinHash-LSH near-dup pairs → hash-min connected
    components → canonical cluster ids (the canonicalization the pipeline
    applies to alignments, here applied to near-dup graphs)."""
    from .operators.components import connected_components

    pairs = q_minhash_lsh_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("src_id"), F.col("doc_b").alias("dst_id")
    )
    return connected_components(pairs).select(
        F.col("entity_id").alias("doc_id"), F.col("component_id").alias("cluster_id")
    )


# hash-min fixpoint over the MinHash candidate graph = reachability min-label
# in a recursive CTE (same shape as SQL_CC, composed over SQL_MINHASH)
SQL_MINHASH_CC = f"""
WITH RECURSIVE mh AS ({SQL_MINHASH}),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM mh
  UNION ALL SELECT doc_b, doc_a FROM mh
),
verts AS (SELECT DISTINCT a AS node FROM edges),
reach(node, label) AS (
  SELECT node, node FROM verts
  UNION
  SELECT e.a, r.label FROM edges e JOIN reach r ON r.node = e.b
)
SELECT node AS doc_id, MIN(label) AS cluster_id FROM reach GROUP BY node
"""


def q_hierarchy_mappings(spark, sf_dir):
    """Hierarchy matcher (HierarchyMatcherModified analog, §2.8): derive
    relation-typed subClassOf/superClassOf correspondences from a tight
    equivalence alignment (lev ≥ 0.9 blocked pairs) plus deterministic
    parent edges (decade buckets per side — the SQL-checkable stand-in for
    the KG pipeline's declares-edges; operators/hierarchy.py is the
    pipeline-facing operator)."""
    from .operators.hierarchy import hierarchy_mappings

    align = (
        q_lev_blocked_pairs(spark, sf_dir)
        .filter(F.col("lev_sim") >= 0.9)
        .select(
            F.col("src_doc_id").alias("src_id"),
            F.col("dst_doc_id").alias("dst_id"),
        )
    )
    docs = load(spark, sf_dir, "documents").select("doc_id")
    parents = docs.select(
        F.col("doc_id").alias("child_id"),
        (F.floor(F.col("doc_id") / 10) * 10 + F.col("doc_id") % 2)
        .cast("long")
        .alias("parent_id"),
    ).filter(F.col("child_id") != F.col("parent_id"))
    sp = parents.filter(F.col("child_id") % 2 == 0)
    dp = parents.filter(F.col("child_id") % 2 == 1)
    return hierarchy_mappings(align, sp, dp).select(
        F.col("src_id").alias("src_doc_id"),
        F.col("dst_id").alias("dst_doc_id"),
        "rel",
    )


SQL_HIERARCHY = f"""
WITH names AS ({_SQL_DOC_NAMES}),
s AS (SELECT doc_id AS src_doc_id, name AS s_name, block_key FROM names WHERE doc_id % 2 = 0),
d AS (SELECT doc_id AS dst_doc_id, name AS d_name, block_key FROM names WHERE doc_id % 2 = 1),
p AS (
  SELECT src_doc_id, dst_doc_id,
         CASE WHEN length(s_name) = 0 AND length(d_name) = 0 THEN 1.0
              WHEN least(length(s_name), length(d_name)) = 0 THEN 0.0
              ELSE 1.0 - least(levenshtein(s_name, d_name),
                               least(length(s_name), length(d_name)))::DOUBLE
                         / least(length(s_name), length(d_name))
         END AS raw_sim
  FROM s JOIN d USING (block_key)
),
align AS (
  SELECT src_doc_id AS src_id, dst_doc_id AS dst_id
  FROM p WHERE ROUND(raw_sim, 6) >= 0.9
),
par AS (
  SELECT doc_id AS child_id, (doc_id // 10) * 10 + doc_id % 2 AS parent_id
  FROM documents
  WHERE doc_id != (doc_id // 10) * 10 + doc_id % 2
)
SELECT DISTINCT * FROM (
  SELECT par.child_id AS src_doc_id, align.dst_id AS dst_doc_id,
         'subClassOf' AS rel
  FROM align JOIN par ON par.parent_id = align.src_id AND par.child_id % 2 = 0
  UNION ALL
  SELECT align.src_id AS src_doc_id, par.child_id AS dst_doc_id,
         'superClassOf' AS rel
  FROM align JOIN par ON par.parent_id = align.dst_id AND par.child_id % 2 = 1
)
"""


def q_iism_boosted_pairs(spark, sf_dir):
    """IISM rule families over the lev-blocked pairs (operators/iism.py;
    IterativeInstanceStructuralMatcher semantics): the range/domain rule
    (deterministic signatures — decade-bucket domains, md5-derived range
    types with null gaps and a primitive damp) and the property-values rule
    (token-window value sets), each firing a 0.15 boost toward 1.0. Output:
    per pair, both rule sims and the boosted similarity."""
    from .operators.iism import _boost, range_domain_sim, values_sim

    base = q_lev_blocked_pairs(spark, sf_dir).select(
        F.col("src_doc_id").alias("src_id"),
        F.col("dst_doc_id").alias("dst_id"),
        F.col("lev_sim").alias("sim"),
    )
    d = load(spark, sf_dir, "documents")
    toks = _doc_tokens(F.col("text"))
    decade = (F.floor(F.col("doc_id") / 10) * 10 + F.col("doc_id") % 2).cast(
        "long"
    )
    rng = _md5int_col(F.element_at(toks, 1)) % 50
    kind = F.element_at(
        F.array(F.lit("function"), F.lit("class"), F.lit("module")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    sig = d.select(
        F.col("doc_id").alias("entity_id"),
        kind.alias("kind"),
        F.when(F.col("doc_id") % 7 == 0, F.lit(None).cast("long"))
        .otherwise(decade)
        .alias("domain_id"),
        F.when(F.col("doc_id") % 5 == 0, F.lit(None).cast("long"))
        .otherwise(rng)
        .alias("range_id"),
        (rng % 4 == 0).alias("range_primitive"),
    )
    ad = (
        d.select((F.floor(F.col("doc_id") / 10) * 10).cast("long").alias("s_domain"))
        .distinct()
        .select("s_domain", (F.col("s_domain") + 1).alias("d_domain"))
    )
    vals = d.select(
        F.col("doc_id").alias("entity_id"),
        F.explode(F.slice(toks, 2, 3)).alias("value"),
    )
    cur = range_domain_sim(
        base,
        sig.filter(F.col("entity_id") % 2 == 0),
        sig.filter(F.col("entity_id") % 2 == 1),
        ad,
    )
    cur = cur.withColumn("sim", _boost(F.col("sim"), F.col("sim_rd") >= 0.85, 0.15))
    cur = values_sim(
        cur,
        vals.filter(F.col("entity_id") % 2 == 0),
        vals.filter(F.col("entity_id") % 2 == 1),
    )
    cur = cur.withColumn("sim", _boost(F.col("sim"), F.col("sim_pv") >= 0.5, 0.15))
    return cur.select(
        F.col("src_id").alias("src_doc_id"),
        F.col("dst_id").alias("dst_doc_id"),
        F.round("sim_rd", 6).alias("sim_rd"),
        F.round("sim_pv", 6).alias("sim_pv"),
        F.round("sim", 6).alias("sim_boosted"),
    )


SQL_IISM = f"""
WITH base0 AS ({SQL_LEV_PAIRS}),
base AS (SELECT src_doc_id AS src_id, dst_doc_id AS dst_id, lev_sim AS sim FROM base0),
sig AS (
  SELECT doc_id AS entity_id,
         CASE doc_id % 3 WHEN 0 THEN 'function' WHEN 1 THEN 'class'
              ELSE 'module' END AS kind,
         CASE WHEN doc_id % 7 = 0 THEN NULL
              ELSE (doc_id // 10) * 10 + doc_id % 2 END AS domain_id,
         CASE WHEN doc_id % 5 = 0 THEN NULL ELSE rng END AS range_id,
         rng % 4 = 0 AS range_primitive
  FROM (SELECT doc_id,
               ('0x' || substr(md5(string_split_regex(trim(text), '\\s+')[1]), 1, 8))::BIGINT % 50 AS rng
        FROM documents)
),
ad AS (SELECT DISTINCT (doc_id // 10) * 10 AS s_domain,
                       (doc_id // 10) * 10 + 1 AS d_domain
       FROM documents),
vals AS (SELECT DISTINCT doc_id AS entity_id,
                unnest(list_slice(string_split_regex(trim(text), '\\s+'), 2, 4)) AS value
         FROM documents),
rd AS (
  SELECT b.src_id, b.dst_id, b.sim,
    CASE WHEN ss.kind <> ds.kind THEN 0.0 ELSE (
      CASE WHEN ss.domain_id IS NULL AND ds.domain_id IS NULL THEN 0.8
           WHEN ss.domain_id IS NULL OR ds.domain_id IS NULL THEN 0.0
           WHEN ss.domain_id = ds.domain_id OR a.s_domain IS NOT NULL THEN 1.0
           ELSE 0.0 END
      +
      CASE WHEN ss.range_id IS NULL AND ds.range_id IS NULL THEN 0.8
           WHEN ss.range_id IS NULL OR ds.range_id IS NULL THEN 0.0
           ELSE (CASE WHEN ss.range_id = ds.range_id THEN 1.0 ELSE 0.0 END)
                * (CASE WHEN COALESCE(ds.range_primitive, FALSE) THEN 0.75
                        ELSE 1.0 END)
      END
    ) / 2 END AS sim_rd
  FROM base b
  LEFT JOIN sig ss ON ss.entity_id = b.src_id
  LEFT JOIN sig ds ON ds.entity_id = b.dst_id
  LEFT JOIN ad a ON a.s_domain = ss.domain_id AND a.d_domain = ds.domain_id
),
b1 AS (
  SELECT src_id, dst_id, sim_rd,
         CASE WHEN sim_rd >= 0.85 THEN ROUND(sim + 0.15 * (1.0 - sim), 12)
              ELSE sim END AS sim
  FROM rd
),
nv AS (SELECT entity_id, COUNT(*) AS n FROM vals GROUP BY entity_id),
inter AS (
  SELECT b.src_id, b.dst_id, COUNT(*) AS n_common
  FROM b1 b
  JOIN vals sv ON sv.entity_id = b.src_id
  JOIN vals dv ON dv.entity_id = b.dst_id AND dv.value = sv.value
  GROUP BY b.src_id, b.dst_id
),
pv AS (
  SELECT b.src_id, b.dst_id, b.sim_rd, b.sim,
         CASE WHEN ns.n IS NULL OR nd.n IS NULL THEN 0.0
              ELSE COALESCE(i.n_common, 0)::DOUBLE / greatest(ns.n, nd.n)
         END AS sim_pv
  FROM b1 b
  LEFT JOIN nv ns ON ns.entity_id = b.src_id
  LEFT JOIN nv nd ON nd.entity_id = b.dst_id
  LEFT JOIN inter i ON i.src_id = b.src_id AND i.dst_id = b.dst_id
)
SELECT src_id AS src_doc_id, dst_id AS dst_doc_id,
       ROUND(sim_rd, 6) AS sim_rd,
       ROUND(sim_pv, 6) AS sim_pv,
       ROUND(CASE WHEN sim_pv >= 0.5 THEN ROUND(sim + 0.15 * (1.0 - sim), 12)
                  ELSE sim END, 6) AS sim_boosted
FROM pv
"""


def q_iism_subprop_union(spark, sf_dir):
    """The two IISM certainty rules (operators/iism.py;
    IterativeInstanceStructuralMatcher.java:401 matchSubProperties, :757
    matchUnionClasses) over the lev-blocked pairs: parent = decade-head of
    the same parity with its decade-mates as subs; unions = the two lowest
    same-parity doc ids of each 20-block. Union thresholds here (0.7/0.9)
    are coverage-tuned so the rule fires on this corpus; the reference's
    0.8/0.6 defaults are pinned by unit tests. Output: every new alignment
    each rule infers, tagged by rule."""
    from .operators.iism import (
        subproperty_alignments,
        union_class_alignments,
    )

    # materialized once, UNFANNED: the two rules fan out into ~6 concurrent
    # branch jobs that each re-evaluated the blocked-lev subtree (profiled
    # as six duplicate ~1 s stages at bench SF); with the fan exchange in
    # each branch the pile-up measured SLOWER than the single-task scan
    # (A/B in _doc_names docstring), so this caller opts out of _fan
    base = q_lev_blocked_pairs(spark, sf_dir, fan=False).select(
        F.col("src_doc_id").alias("src_id"),
        F.col("dst_doc_id").alias("dst_id"),
        F.col("lev_sim").alias("sim"),
    ).localCheckpoint()
    d = load(spark, sf_dir, "documents")
    parent = (F.floor(F.col("doc_id") / 10) * 10 + F.col("doc_id") % 2).cast(
        "long"
    )
    subs = d.select(
        parent.alias("parent_id"), F.col("doc_id").alias("sub_id")
    ).filter(F.col("sub_id") != F.col("parent_id"))
    sp = subs.filter(F.col("sub_id") % 2 == 0)
    dp = subs.filter(F.col("sub_id") % 2 == 1)
    unions = d.filter(F.pmod(F.col("doc_id"), F.lit(20)) < 4).select(
        F.floor(F.col("doc_id") / 20).cast("long").alias("union_id"),
        F.col("doc_id").alias("member_id"),
    )
    su = unions.filter(F.col("member_id") % 2 == 0)
    du = unions.filter(F.col("member_id") % 2 == 1)
    new_sub = subproperty_alignments(base, sp, dp, prop_thr=0.75).withColumn(
        "rule", F.lit("subprop")
    )
    new_un = union_class_alignments(
        base, su, du, strong_thr=0.7, weak_thr=0.9
    ).withColumn("rule", F.lit("union"))
    return new_sub.unionByName(new_un).select(
        F.col("src_id").alias("src_doc_id"),
        F.col("dst_id").alias("dst_doc_id"),
        "rule",
    )


SQL_IISM_SUBPROP_UNION = f"""
WITH base0 AS ({SQL_LEV_PAIRS}),
base AS (SELECT src_doc_id AS src_id, dst_doc_id AS dst_id, lev_sim AS sim FROM base0),
subs AS (
  SELECT (doc_id // 10) * 10 + doc_id % 2 AS parent_id, doc_id AS sub_id
  FROM documents WHERE doc_id <> (doc_id // 10) * 10 + doc_id % 2
),
sp AS (SELECT * FROM subs WHERE sub_id % 2 = 0),
dp AS (SELECT * FROM subs WHERE sub_id % 2 = 1),
aligned AS (SELECT DISTINCT src_id, dst_id FROM base WHERE sim >= 0.75),
ns AS (SELECT parent_id, COUNT(*) AS n_s FROM sp GROUP BY 1),
nd AS (SELECT parent_id, COUNT(*) AS n_d FROM dp GROUP BY 1),
pp AS (
  SELECT a.src_id AS s_parent, a.dst_id AS d_parent
  FROM aligned a
  JOIN ns ON ns.parent_id = a.src_id
  JOIN nd ON nd.parent_id = a.dst_id
  WHERE ns.n_s = nd.n_d
),
m AS (
  SELECT pp.s_parent, pp.d_parent, sp.sub_id AS s_sub, dp.sub_id AS d_sub
  FROM pp
  JOIN sp ON sp.parent_id = pp.s_parent
  JOIN dp ON dp.parent_id = pp.d_parent
  JOIN aligned al ON al.src_id = sp.sub_id AND al.dst_id = dp.sub_id
),
ms AS (SELECT DISTINCT s_parent, d_parent, s_sub FROM m),
md AS (SELECT DISTINCT s_parent, d_parent, d_sub FROM m),
rs AS (
  SELECT pp.s_parent, pp.d_parent, sp.sub_id AS s_sub,
         row_number() OVER (PARTITION BY pp.s_parent, pp.d_parent
                            ORDER BY sp.sub_id ASC) AS rk,
         COUNT(*) OVER (PARTITION BY pp.s_parent, pp.d_parent) AS cnt_s
  FROM pp
  JOIN sp ON sp.parent_id = pp.s_parent
  LEFT JOIN ms ON ms.s_parent = pp.s_parent AND ms.d_parent = pp.d_parent
             AND ms.s_sub = sp.sub_id
  WHERE ms.s_sub IS NULL
),
rd AS (
  SELECT pp.s_parent, pp.d_parent, dp.sub_id AS d_sub,
         row_number() OVER (PARTITION BY pp.s_parent, pp.d_parent
                            ORDER BY dp.sub_id ASC) AS rk,
         COUNT(*) OVER (PARTITION BY pp.s_parent, pp.d_parent) AS cnt_d
  FROM pp
  JOIN dp ON dp.parent_id = pp.d_parent
  LEFT JOIN md ON md.s_parent = pp.s_parent AND md.d_parent = pp.d_parent
             AND md.d_sub = dp.sub_id
  WHERE md.d_sub IS NULL
),
new_sub AS (
  SELECT DISTINCT rs.s_sub AS src_id, rd.d_sub AS dst_id
  FROM rs JOIN rd ON rd.s_parent = rs.s_parent AND rd.d_parent = rs.d_parent
                 AND rd.rk = rs.rk
  WHERE rs.cnt_s = rd.cnt_d
),
un AS (
  SELECT doc_id // 20 AS union_id, doc_id AS member_id
  FROM documents WHERE doc_id % 20 < 4
),
two_s AS (
  SELECT union_id, MIN(member_id) AS m0, MAX(member_id) AS m1
  FROM (SELECT DISTINCT union_id, member_id FROM un WHERE member_id % 2 = 0)
  GROUP BY union_id HAVING COUNT(*) = 2
),
two_d AS (
  SELECT union_id, MIN(member_id) AS m0, MAX(member_id) AS m1
  FROM (SELECT DISTINCT union_id, member_id FROM un WHERE member_id % 2 = 1)
  GROUP BY union_id HAVING COUNT(*) = 2
),
sm AS (SELECT m0 AS src_id, m1 AS other_src FROM two_s
       UNION ALL SELECT m1, m0 FROM two_s),
dm AS (SELECT m0 AS dst_id, m1 AS other_dst FROM two_d
       UNION ALL SELECT m1, m0 FROM two_d),
strong AS (SELECT src_id, dst_id FROM base WHERE sim > 0.7),
cand AS (
  SELECT DISTINCT sm.other_src, dm.other_dst
  FROM strong JOIN sm USING (src_id) JOIN dm USING (dst_id)
),
rowmax AS (SELECT src_id, MAX(sim) AS rmax FROM base GROUP BY 1),
colmax AS (SELECT dst_id, MAX(sim) AS cmax FROM base GROUP BY 1),
new_un AS (
  SELECT DISTINCT cand.other_src AS src_id, cand.other_dst AS dst_id
  FROM cand
  LEFT JOIN rowmax ON rowmax.src_id = cand.other_src
  LEFT JOIN colmax ON colmax.dst_id = cand.other_dst
  WHERE COALESCE(rmax, 0.0) < 0.9 AND COALESCE(cmax, 0.0) < 0.9
)
SELECT src_id AS src_doc_id, dst_id AS dst_doc_id, 'subprop' AS rule
FROM new_sub
UNION ALL
SELECT src_id AS src_doc_id, dst_id AS dst_doc_id, 'union' AS rule
FROM new_un
"""


def q_disagreement_variance(spark, sf_dir):
    """Matcher-disagreement metric (VarianceDisagreement.java:30-62,
    VarianceComputation.java:20-50): per-pair population variance of the
    signature vector of three matchers' sims (min-norm Levenshtein, 3-gram
    Jaccard, token Dice) over blocked pairs — the feedback-loop candidate
    ranking. All JVM-side column arithmetic."""
    from .functions.spark_sims import (
        dice_col,
        jaccard_col,
        lev_min_norm_col,
        shingles_col,
    )
    from .operators.evaluate import disagreement_variance

    # NOTE: shingles/tokens are deliberately computed PER PAIR after the
    # join — for short names, recomputing in codegen is cheaper than
    # shipping array columns through the join shuffle (measured 10 s vs
    # 39 s at sf0.1; the inverse of the minhash materialize-first lesson,
    # which holds only for EXPENSIVE array columns fanned out many times)
    names = _doc_names(spark, sf_dir)
    s = names.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src_doc_id"),
        F.col("name").alias("s_name"), "block_key",
    )
    d = names.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("dst_doc_id"),
        F.col("name").alias("d_name"), "block_key",
    )
    p = (
        s.join(d, "block_key")
        .withColumn("sim_lev", lev_min_norm_col(F.col("s_name"), F.col("d_name")))
        .withColumn(
            "sim_qgram",
            jaccard_col(shingles_col(F.col("s_name"), 3),
                        shingles_col(F.col("d_name"), 3)),
        )
        .withColumn(
            "sim_dice",
            dice_col(F.split(F.col("s_name"), " "), F.split(F.col("d_name"), " ")),
        )
    )
    p = disagreement_variance(p, ["sim_lev", "sim_qgram", "sim_dice"])
    return p.select(
        "src_doc_id", "dst_doc_id",
        F.round(F.col("disagreement"), 6).alias("disagreement"),
    ).filter(F.col("disagreement") >= 0.01)


SQL_DISAGREEMENT = f"""
WITH names AS ({_SQL_DOC_NAMES}),
s AS (SELECT doc_id AS src_doc_id, name AS s_name, block_key FROM names WHERE doc_id % 2 = 0),
d AS (SELECT doc_id AS dst_doc_id, name AS d_name, block_key FROM names WHERE doc_id % 2 = 1),
sh AS (
  SELECT src_doc_id, dst_doc_id, s_name, d_name,
         CASE WHEN length(s_name) = 0 AND length(d_name) = 0 THEN 1.0
              WHEN least(length(s_name), length(d_name)) = 0 THEN 0.0
              ELSE 1.0 - least(levenshtein(s_name, d_name),
                               least(length(s_name), length(d_name)))::DOUBLE
                         / least(length(s_name), length(d_name))
         END AS sim_lev
  FROM s JOIN d USING (block_key)
),
gr AS (
  SELECT *,
    (CASE WHEN length(lower(s_name)) = 0 THEN []::VARCHAR[]
          WHEN length(lower(s_name)) < 3 THEN [lower(s_name)]
          ELSE list_transform(range(1, length(s_name) - 1), i -> substr(lower(s_name), i::INT, 3)) END) AS sg,
    (CASE WHEN length(lower(d_name)) = 0 THEN []::VARCHAR[]
          WHEN length(lower(d_name)) < 3 THEN [lower(d_name)]
          ELSE list_transform(range(1, length(d_name) - 1), i -> substr(lower(d_name), i::INT, 3)) END) AS dg,
    string_split(s_name, ' ') AS st, string_split(d_name, ' ') AS dt
  FROM sh
),
sims AS (
  SELECT src_doc_id, dst_doc_id, sim_lev,
    CASE WHEN len(list_distinct(list_concat(list_distinct(sg), list_distinct(dg)))) = 0 THEN 1.0
         ELSE len(list_intersect(list_distinct(sg), list_distinct(dg)))::DOUBLE
              / len(list_distinct(list_concat(list_distinct(sg), list_distinct(dg))))
    END AS sim_qgram,
    CASE WHEN len(list_distinct(st)) + len(list_distinct(dt)) = 0 THEN 1.0
         ELSE 2.0 * len(list_intersect(list_distinct(st), list_distinct(dt)))::DOUBLE
              / (len(list_distinct(st)) + len(list_distinct(dt)))
    END AS sim_dice
  FROM gr
),
v AS (
  SELECT src_doc_id, dst_doc_id,
         ((sim_lev - (sim_lev + sim_qgram + sim_dice) / 3.0) * (sim_lev - (sim_lev + sim_qgram + sim_dice) / 3.0)
          + (sim_qgram - (sim_lev + sim_qgram + sim_dice) / 3.0) * (sim_qgram - (sim_lev + sim_qgram + sim_dice) / 3.0)
          + (sim_dice - (sim_lev + sim_qgram + sim_dice) / 3.0) * (sim_dice - (sim_lev + sim_qgram + sim_dice) / 3.0)) / 3.0 AS disagreement
  FROM sims
)
SELECT src_doc_id, dst_doc_id, ROUND(disagreement, 6) AS disagreement
FROM v WHERE ROUND(disagreement, 6) >= 0.01
"""


def q_order_preservation(spark, sf_dir):
    """Joslyn order-preservation quality of the tight lev alignment against
    the decade-bucket hierarchies (JoslynStructuralQuality.java:149-204 /
    OrderPreservationQM; operators/evaluate.order_preservation): fraction
    of mapping pairs whose ancestor/descendant/noncomparable order agrees
    on both sides."""
    from .operators.evaluate import order_preservation

    align = (
        q_lev_blocked_pairs(spark, sf_dir)
        .filter(F.col("lev_sim") >= 0.9)
        .select(
            F.col("src_doc_id").alias("src_id"),
            F.col("dst_doc_id").alias("dst_id"),
        )
    )
    docs = load(spark, sf_dir, "documents").select("doc_id")
    par = docs.select(
        F.col("doc_id").alias("desc_id"),
        (F.floor(F.col("doc_id") / 10) * 10 + F.col("doc_id") % 2)
        .cast("long")
        .alias("anc_id"),
    ).filter(F.col("desc_id") != F.col("anc_id"))
    sp = par.filter(F.col("desc_id") % 2 == 0)
    dp = par.filter(F.col("desc_id") % 2 == 1)
    # same lake-scale gate as q_joslyn_distance_quality: exact only while
    # the alignment is oracle-sized (mapping pairs are O(n_align²) — the
    # 23k-mapping sf1 alignment ran 272M exact pairs in 48 s; the capped
    # md5 sample is the documented production mode). sf0.01 (14) and
    # sf0.1 (342) stay exact.
    align = align.localCheckpoint()
    n_align = align.count()
    return order_preservation(
        align, sp, dp, max_pairs=None if n_align <= 2000 else 500_000
    )


SQL_ORDER_PRESERVATION = f"""
WITH names AS ({_SQL_DOC_NAMES}),
s AS (SELECT doc_id AS src_doc_id, name AS s_name, block_key FROM names WHERE doc_id % 2 = 0),
d AS (SELECT doc_id AS dst_doc_id, name AS d_name, block_key FROM names WHERE doc_id % 2 = 1),
p AS (
  SELECT src_doc_id, dst_doc_id,
         ROUND(CASE WHEN length(s_name) = 0 AND length(d_name) = 0 THEN 1.0
              WHEN least(length(s_name), length(d_name)) = 0 THEN 0.0
              ELSE 1.0 - least(levenshtein(s_name, d_name),
                               least(length(s_name), length(d_name)))::DOUBLE
                         / least(length(s_name), length(d_name))
         END, 6) AS lev_sim
  FROM s JOIN d USING (block_key)
),
align AS (SELECT DISTINCT src_doc_id AS src_id, dst_doc_id AS dst_id FROM p WHERE lev_sim >= 0.9),
par AS (
  SELECT doc_id AS desc_id, (doc_id // 10) * 10 + doc_id % 2 AS anc_id
  FROM documents WHERE doc_id != (doc_id // 10) * 10 + doc_id % 2
),
pp AS (
  SELECT a1.src_id AS a1, a1.dst_id AS a1p, a2.src_id AS a2, a2.dst_id AS a2p
  FROM align a1, align a2
  WHERE a1.src_id < a2.src_id
     OR (a1.src_id = a2.src_id AND a1.dst_id < a2.dst_id)
),
o AS (
  SELECT pp.*,
    CASE WHEN ls.desc_id IS NOT NULL THEN 'anc'
         WHEN gs.desc_id IS NOT NULL THEN 'desc' ELSE 'nc' END AS ord_src,
    CASE WHEN ld.desc_id IS NOT NULL THEN 'anc'
         WHEN gd.desc_id IS NOT NULL THEN 'desc' ELSE 'nc' END AS ord_dst
  FROM pp
  LEFT JOIN par ls ON ls.anc_id = pp.a1 AND ls.desc_id = pp.a2
  LEFT JOIN par gs ON gs.anc_id = pp.a2 AND gs.desc_id = pp.a1
  LEFT JOIN par ld ON ld.anc_id = pp.a1p AND ld.desc_id = pp.a2p
  LEFT JOIN par gd ON gd.anc_id = pp.a2p AND gd.desc_id = pp.a1p
)
SELECT ROUND(1.0 - COALESCE(AVG(CASE WHEN ord_src != ord_dst THEN 1.0 ELSE 0.0 END), 0.0), 6) AS order_quality,
       COUNT(*) AS n_mapping_pairs
FROM o
"""


def q_joslyn_distance_quality(spark, sf_dir):
    """Joslyn distance-metric family (UpperDistancePreservationQM /
    LowerDistancePreservationQM / OrderDiscrepancyQM via
    JoslynStructuralQuality — operators/evaluate.distance_preservation,
    order_discrepancy) of the tight lev alignment against 3-level
    deterministic hierarchies (doc → decade → century buckets per side).
    One row: upper/lower distance-preservation qualities + raw order
    discrepancy + pair count."""
    from .operators.evaluate import distance_preservation, order_discrepancy

    align = (
        q_lev_blocked_pairs(spark, sf_dir)
        .filter(F.col("lev_sim") >= 0.9)
        .select(
            F.col("src_doc_id").alias("src_id"),
            F.col("dst_doc_id").alias("dst_id"),
        )
        .cache()
    )
    d = load(spark, sf_dir, "documents").select("doc_id")
    dec = (F.floor(F.col("doc_id") / 10) * 10 + F.col("doc_id") % 2).cast("long")
    cen = (F.floor(F.col("doc_id") / 100) * 100 + F.col("doc_id") % 2).cast("long")
    anc = (
        d.select(dec.alias("anc_id"), F.col("doc_id").alias("desc_id"))
        .filter(F.col("anc_id") != F.col("desc_id"))
        .unionByName(
            d.select(cen.alias("anc_id"), F.col("doc_id").alias("desc_id"))
            .filter(F.col("anc_id") != F.col("desc_id"))
        )
        .dropDuplicates(["anc_id", "desc_id"])
        .cache()
    )
    sanc = anc.filter(F.col("desc_id") % 2 == 0)
    danc = anc.filter(F.col("desc_id") % 2 == 1)
    snodes = d.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("node_id")
    )
    dnodes = d.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("node_id")
    )
    from .operators.evaluate import _mapping_pairs

    # one checkpointed mapping-pair enumeration shared by all three metrics
    # (each would otherwise rebuild the indexed explode+join + checkpoint).
    # Exact only while the alignment is oracle-sized: mapping pairs are
    # O(n_align²), and a 23k-mapping sf1 alignment would enumerate 272M
    # pairs (measured hang). Past the gate the documented lake-scale
    # md5-hash sample caps expected pairs at 500k; the sf0.01 oracle
    # (14 mappings) and sf0.1 bench (342) stay in exact mode.
    n_align = align.count()
    mp = _mapping_pairs(
        align, max_pairs=None if n_align <= 2000 else 500_000
    ).localCheckpoint()
    # one fused diameter job per side, shared by BOTH preservation modes:
    # the default path issued 3 counts per side per call = 12 sequential
    # driver actions (profiled: 14 of joslyn's 17 SQL executions were
    # sub-second counts — the wall was action latency, not compute)
    from .operators.evaluate import joslyn_diameter

    diams = (joslyn_diameter(sanc, snodes), joslyn_diameter(danc, dnodes))
    up = distance_preservation(align, sanc, danc, snodes, dnodes,
                               mode="upper", pairs=mp, diameters=diams)
    lo = distance_preservation(align, sanc, danc, snodes, dnodes,
                               mode="lower", pairs=mp, diameters=diams)
    od = order_discrepancy(align, sanc, danc, pairs=mp)
    return (
        up.select(
            F.col("quality").alias("upper_quality"),
            F.col("discrepancy").alias("upper_discrepancy"),
            "n_mapping_pairs",
        )
        .crossJoin(lo.select(
            F.col("quality").alias("lower_quality"),
            F.col("discrepancy").alias("lower_discrepancy"),
        ))
        .crossJoin(od.select("order_discrepancy"))
    )


def _sql_joslyn_distance_quality() -> str:
    """DuckDB twin of q_joslyn_distance_quality (mechanical: same alignment,
    same 3-level closure, same d(a,b) = n(a)+n(b)-2*max_common formula and
    per-side top-bottom diameters)."""

    def diam(par: int) -> str:
        nn = f"(SELECT COUNT(*) FROM documents WHERE doc_id % 2 = {par})"
        roots = (
            f"(SELECT COUNT(*) FROM documents WHERE doc_id % 2 = {par} AND "
            f"doc_id NOT IN (SELECT DISTINCT desc_id FROM anc WHERE desc_id % 2 = {par}))"
        )
        leaves = (
            f"(SELECT COUNT(*) FROM documents WHERE doc_id % 2 = {par} AND "
            f"doc_id NOT IN (SELECT DISTINCT anc_id FROM anc WHERE desc_id % 2 = {par}))"
        )
        return (
            f"GREATEST(({nn} - 1 + CASE WHEN {roots} = 1 THEN 0 ELSE 1 END"
            f" + CASE WHEN {leaves} = 1 THEN 0 ELSE 1 END)::DOUBLE, 1.0)"
        )

    def side(tag: str, par: int, mode: str, xc: str, yc: str) -> str:
        if mode == "upper":
            mem = (f"SELECT desc_id AS node, anc_id AS c FROM anc "
                   f"WHERE desc_id % 2 = {par}")
        else:
            mem = (f"SELECT anc_id AS node, desc_id AS c FROM anc "
                   f"WHERE desc_id % 2 = {par}")
        return f"""
mem_{tag} AS ({mem}),
n_{tag} AS (SELECT node, COUNT(*) AS n FROM mem_{tag} GROUP BY node),
np_{tag} AS (SELECT DISTINCT {xc} AS x, {yc} AS y FROM mp),
com_{tag} AS (
  SELECT q.x, q.y, MAX(COALESCE(nc.n, 0)) AS maxc
  FROM np_{tag} q
  JOIN mem_{tag} m1 ON m1.node = q.x
  JOIN mem_{tag} m2 ON m2.node = q.y AND m2.c = m1.c
  LEFT JOIN n_{tag} nc ON nc.node = m1.c
  GROUP BY q.x, q.y
),
d_{tag} AS (
  SELECT q.x, q.y,
         (COALESCE(na.n, 0) + COALESCE(nb.n, 0)
          - 2 * COALESCE(cm.maxc, 0))::DOUBLE / dm_{tag}.v AS dist
  FROM np_{tag} q
  LEFT JOIN n_{tag} na ON na.node = q.x
  LEFT JOIN n_{tag} nb ON nb.node = q.y
  LEFT JOIN com_{tag} cm ON cm.x = q.x AND cm.y = q.y
  CROSS JOIN dm_{tag}
)"""

    diams = ",\n".join(
        f"dm_{tag} AS (SELECT {diam(par)} AS v)"
        for tag, par in [
            ("su", 0), ("du", 1), ("sl", 0), ("dl", 1),
        ]
    )
    sides = ",".join(
        side(tag, par, mode, xc, yc)
        for tag, par, mode, xc, yc in [
            ("su", 0, "upper", "a1", "a2"),
            ("du", 1, "upper", "a1p", "a2p"),
            ("sl", 0, "lower", "a1", "a2"),
            ("dl", 1, "lower", "a1p", "a2p"),
        ]
    )
    return f"""
WITH names AS ({_SQL_DOC_NAMES}),
s AS (SELECT doc_id AS src_doc_id, name AS s_name, block_key FROM names WHERE doc_id % 2 = 0),
d AS (SELECT doc_id AS dst_doc_id, name AS d_name, block_key FROM names WHERE doc_id % 2 = 1),
p AS (
  SELECT src_doc_id, dst_doc_id,
         ROUND(CASE WHEN length(s_name) = 0 AND length(d_name) = 0 THEN 1.0
              WHEN least(length(s_name), length(d_name)) = 0 THEN 0.0
              ELSE 1.0 - least(levenshtein(s_name, d_name),
                               least(length(s_name), length(d_name)))::DOUBLE
                         / least(length(s_name), length(d_name))
         END, 6) AS lev_sim
  FROM s JOIN d USING (block_key)
),
align AS MATERIALIZED (
  SELECT DISTINCT src_doc_id AS src_id, dst_doc_id AS dst_id
  FROM p WHERE lev_sim >= 0.9
),
dd AS (SELECT doc_id, (doc_id // 10) * 10 + doc_id % 2 AS dec,
              (doc_id // 100) * 100 + doc_id % 2 AS cen
       FROM documents),
anc AS MATERIALIZED (
  SELECT DISTINCT anc_id, desc_id FROM (
    SELECT dec AS anc_id, doc_id AS desc_id FROM dd WHERE dec <> doc_id
    UNION ALL
    SELECT cen AS anc_id, doc_id AS desc_id FROM dd WHERE cen <> doc_id
  )
),
mp AS MATERIALIZED (
  SELECT l.src_id AS a1, l.dst_id AS a1p, r.src_id AS a2, r.dst_id AS a2p
  FROM align l, align r
  WHERE l.src_id < r.src_id
     OR (l.src_id = r.src_id AND l.dst_id < r.dst_id)
),
{diams},
{sides},
qu AS (
  SELECT ROUND(1.0 - COALESCE(AVG(ABS(su.dist - du.dist)), 0.0), 6) AS q,
         ROUND(COALESCE(AVG(ABS(su.dist - du.dist)), 0.0), 6) AS disc,
         COUNT(*) AS n
  FROM mp
  JOIN d_su su ON su.x = mp.a1 AND su.y = mp.a2
  JOIN d_du du ON du.x = mp.a1p AND du.y = mp.a2p
),
ql AS (
  SELECT ROUND(1.0 - COALESCE(AVG(ABS(sl.dist - dl.dist)), 0.0), 6) AS q,
         ROUND(COALESCE(AVG(ABS(sl.dist - dl.dist)), 0.0), 6) AS disc
  FROM mp
  JOIN d_sl sl ON sl.x = mp.a1 AND sl.y = mp.a2
  JOIN d_dl dl ON dl.x = mp.a1p AND dl.y = mp.a2p
),
o AS (
  SELECT mp.*,
    CASE WHEN ls.desc_id IS NOT NULL THEN 'anc'
         WHEN gs.desc_id IS NOT NULL THEN 'desc' ELSE 'nc' END AS ord_src,
    CASE WHEN ld.desc_id IS NOT NULL THEN 'anc'
         WHEN gd.desc_id IS NOT NULL THEN 'desc' ELSE 'nc' END AS ord_dst
  FROM mp
  LEFT JOIN anc ls ON ls.anc_id = mp.a1 AND ls.desc_id = mp.a2
  LEFT JOIN anc gs ON gs.anc_id = mp.a2 AND gs.desc_id = mp.a1
  LEFT JOIN anc ld ON ld.anc_id = mp.a1p AND ld.desc_id = mp.a2p
  LEFT JOIN anc gd ON gd.anc_id = mp.a2p AND gd.desc_id = mp.a1p
),
qo AS (
  SELECT ROUND(COALESCE(AVG(CASE WHEN ord_src != ord_dst THEN 1.0 ELSE 0.0 END), 0.0), 6) AS q
  FROM o
)
SELECT qu.q AS upper_quality, qu.disc AS upper_discrepancy,
       qu.n AS n_mapping_pairs,
       ql.q AS lower_quality, ql.disc AS lower_discrepancy,
       qo.q AS order_discrepancy
FROM qu, ql, qo
"""


SQL_JOSLYN = _sql_joslyn_distance_quality()


def q_alignment_delta(spark, sf_dir):
    """Alignment delta (DeltaFromReference.java:24-44 edit-distance
    classification / AlignmentMetrics.java overlap counts): the pairs kept,
    dropped and unreachable when tightening the threshold 0.5 → 0.8 on the
    lev alignment — full-outer join, status-tagged (threshold-sweep
    companion)."""
    from .operators.evaluate import alignment_delta

    base = q_lev_blocked_pairs(spark, sf_dir)
    a = base.select("src_doc_id", "dst_doc_id")
    b = base.filter(F.col("lev_sim") >= 0.8).select("src_doc_id", "dst_doc_id")
    return alignment_delta(a, b, keys=("src_doc_id", "dst_doc_id"))


SQL_ALIGN_DELTA = f"""
WITH names AS ({_SQL_DOC_NAMES}),
s AS (SELECT doc_id AS src_doc_id, name AS s_name, block_key FROM names WHERE doc_id % 2 = 0),
d AS (SELECT doc_id AS dst_doc_id, name AS d_name, block_key FROM names WHERE doc_id % 2 = 1),
p AS (
  SELECT src_doc_id, dst_doc_id,
         ROUND(CASE WHEN length(s_name) = 0 AND length(d_name) = 0 THEN 1.0
              WHEN least(length(s_name), length(d_name)) = 0 THEN 0.0
              ELSE 1.0 - least(levenshtein(s_name, d_name),
                               least(length(s_name), length(d_name)))::DOUBLE
                         / least(length(s_name), length(d_name))
         END, 6) AS lev_sim
  FROM s JOIN d USING (block_key)
),
a AS (SELECT DISTINCT src_doc_id, dst_doc_id FROM p WHERE lev_sim >= 0.5),
b AS (SELECT DISTINCT src_doc_id, dst_doc_id FROM p WHERE lev_sim >= 0.8)
SELECT COALESCE(a.src_doc_id, b.src_doc_id) AS src_doc_id,
       COALESCE(a.dst_doc_id, b.dst_doc_id) AS dst_doc_id,
       CASE WHEN a.src_doc_id IS NOT NULL AND b.src_doc_id IS NOT NULL THEN 'both'
            WHEN a.src_doc_id IS NOT NULL THEN 'only_a'
            ELSE 'only_b' END AS status
FROM a FULL OUTER JOIN b
  ON a.src_doc_id = b.src_doc_id AND a.dst_doc_id = b.dst_doc_id
"""


def q_streaming_sessionize(spark, sf_dir):
    """Per-user session counts computed by the CUSTOM STATEFUL STREAMING
    operator (applyInPandasWithState sessionizer, streaming/sessions.py)
    driven end-to-end: events land as time-ordered parquet drops, a
    Trigger.AvailableNow query drains them through per-user session state
    across multiple microbatches (+ a far-future sentinel drop to flush
    open sessions), and the emitted closed sessions are aggregated. The
    result is semantically identical to the batch lag+cumsum sessionization,
    so it shares q_events_sessionize's DuckDB oracle — a full value-hash
    check on a streaming stateful operator."""
    import glob
    import os
    import shutil
    import tempfile

    from .streaming.sessions import run_sessionize_available_now

    events = load(spark, sf_dir, "events").select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    root = tempfile.mkdtemp(prefix="q_sess_stream_")
    src, out, chk = (os.path.join(root, d) for d in ("src", "out", "chk"))
    os.makedirs(src)

    def _drop(df, name):
        tmp = tempfile.mkdtemp(prefix="q_sess_stage_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(part, os.path.join(src, name))
        shutil.rmtree(tmp, ignore_errors=True)

    # time-ordered 2-way split WITHOUT a global single-task sort (VERDICT
    # r05 "what's wrong #1": the ntile window over an un-partitioned
    # ORDER BY serialized the whole events table through one task) and
    # without any shuffle at all: cut at the time-range midpoint. Every
    # drop-1 event is <= the cut < every drop-2 event, which is the only
    # property stateful sessionization needs (the sessionizer sorts within
    # each microbatch, and the final session set is identical for ANY
    # time-ordered split, so the oracle hash cannot move with the cut).
    # The min/max agg also serves the sentinel below (one job, not two).
    import pandas as _pd

    rng = events.agg(
        F.min("ts").alias("mn"), F.max("ts").alias("mx")
    ).collect()[0]
    max_ts = rng.mx
    mid = F.lit(rng.mn + (rng.mx - rng.mn) / 2).cast("timestamp_ntz")
    _drop(events.filter(F.col("ts") <= mid), "drop1.parquet")
    _drop(events.filter(F.col("ts") > mid), "drop2.parquet")
    run_sessionize_available_now(spark, src, out, chk)

    sentinel = (
        events.select("user_id").distinct()
        .withColumn("event_id", 10_000_000 + F.col("user_id"))
        .withColumn(
            "ts", F.lit(max_ts + _pd.Timedelta(days=30)).cast("timestamp_ntz")
        )
        .withColumn("event_type", F.lit("sentinel"))
        .withColumn("value", F.lit(0.0))
        .withColumn("props", F.lit(""))
        .select("event_id", "ts", "user_id", "event_type", "value", "props")
    )
    _drop(sentinel, "zz_sentinel.parquet")
    run_sessionize_available_now(spark, src, out, chk)

    got = (
        spark.read.parquet(out)
        .filter(F.col("session_start") <= F.lit(max_ts))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_sessions"),
            F.sum("n_events").cast("long").alias("n_events"),
        )
    )
    # materialize the small aggregate (localCheckpoint cuts the lineage back
    # to the sink parquet) so the temp tree can be removed NOW instead of
    # leaking a copy of the events table into /tmp per bench invocation
    got = got.localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return got


def q_streaming_dedup(spark, sf_dir):
    """Streaming exact-dedup (streaming/dedupstream.py —
    dropDuplicatesWithinWatermark, Spark's built-in bounded-state stateful
    dedup) driven end-to-end: the documents table lands as drop 1, a full
    duplicate copy (shifted ids, later event times) lands as drop 2, and a
    Trigger.AvailableNow query drains both through fingerprint state ACROSS
    the microbatch boundary. Survivors must be exactly the first arrivals —
    the batch first-arrival window twin (SQL_STREAM_DEDUP) hash-checks
    them."""
    import glob
    import os
    import shutil
    import tempfile

    from .streaming.dedupstream import run_dedup_available_now

    epoch = 1_704_067_200  # 2024-01-01 00:00:00 UTC
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    orig = docs.select(
        "doc_id",
        F.timestamp_seconds(F.lit(epoch) + F.col("doc_id") * 60).alias("ts"),
        "text",
    )
    dups = docs.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.timestamp_seconds(
            F.lit(epoch) + (F.col("doc_id") + 600) * 60
        ).alias("ts"),
        "text",
    )
    root = tempfile.mkdtemp(prefix="q_dedup_stream_")
    src, out, chk = (os.path.join(root, d) for d in ("src", "out", "chk"))
    os.makedirs(src)

    def _drop(df, name):
        tmp = tempfile.mkdtemp(prefix="q_dedup_stage_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(part, os.path.join(src, name))
        shutil.rmtree(tmp, ignore_errors=True)

    _drop(orig, "drop1.parquet")  # time-ordered: all dups strictly later
    _drop(dups, "drop2.parquet")
    run_dedup_available_now(spark, src, out, chk, watermark="30 days")
    got = spark.read.parquet(out).select("doc_id", "fingerprint")
    # materialize the small survivor set so the temp tree can be removed
    # now (same no-/tmp-leak discipline as q_streaming_sessionize)
    got = got.localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return got


SQL_STREAM_DEDUP = """
WITH all_rows AS (
  SELECT doc_id, doc_id AS t_min, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000, doc_id + 600, text FROM documents
)
SELECT doc_id, fingerprint FROM (
  SELECT doc_id, md5(text) AS fingerprint,
         row_number() OVER (PARTITION BY md5(text)
                            ORDER BY t_min, doc_id) AS rn
  FROM all_rows
) WHERE rn = 1
"""


def q_streaming_decontam(spark, sf_dir):
    """Streaming decontamination-at-ingest (streaming/decontam.py):
    documents land as two time-ordered microbatch drops; each batch runs
    the batch ngram_contamination operator against the static benchmark
    (doc_id % 97 == 0 docs) inside foreachBatch and only clean docs reach
    the lake. Memoryless (no state store); survivors must equal the batch
    filter's clean set — SQL_STREAM_DECONTAM hash-checks them."""
    import glob
    import os
    import shutil
    import tempfile

    from .streaming.decontam import run_decontam_available_now

    epoch = 1_704_067_200
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    corpus = docs.filter(F.col("doc_id") % 97 != 0).select(
        "doc_id",
        F.timestamp_seconds(F.lit(epoch) + F.col("doc_id") * 60).alias("ts"),
        "text",
    )
    root = tempfile.mkdtemp(prefix="q_decontam_stream_")
    src, out, chk = (os.path.join(root, d) for d in ("src", "out", "chk"))
    os.makedirs(src)

    def _drop(df, name):
        tmp = tempfile.mkdtemp(prefix="q_decontam_stage_")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        (part,) = glob.glob(os.path.join(tmp, "part-*.parquet"))
        shutil.move(part, os.path.join(src, name))
        shutil.rmtree(tmp, ignore_errors=True)

    _drop(corpus.filter(F.col("doc_id") % 3 != 0), "drop1.parquet")
    _drop(corpus.filter(F.col("doc_id") % 3 == 0), "drop2.parquet")
    run_decontam_available_now(spark, src, out, chk, bench, n=CONTAM_N)
    got = spark.read.parquet(out).select(
        "doc_id", F.md5("text").alias("fp")
    ).localCheckpoint(eager=True)
    shutil.rmtree(root, ignore_errors=True)
    return got


SQL_STREAM_DECONTAM = f"""
WITH toks AS (
  SELECT doc_id, text, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
gh AS (
  SELECT doc_id, text,
    CASE WHEN len(t) - {CONTAM_N - 1} <= 0 THEN []::BIGINT[]
         ELSE list_transform(range(1, len(t) - {CONTAM_N - 2}),
              i -> ('0x' || substr(md5(array_to_string(
                       list_slice(t, i, i + {CONTAM_N - 1}), ' ')), 1, 15))::BIGINT)
    END AS ghs
  FROM toks
),
bench AS (SELECT DISTINCT unnest(ghs) AS g FROM gh WHERE doc_id % 97 = 0),
corpus AS (SELECT doc_id, text, ghs FROM gh WHERE doc_id % 97 <> 0)
SELECT doc_id, md5(text) AS fp
FROM corpus c
WHERE NOT EXISTS (
  SELECT 1 FROM bench b WHERE list_contains(c.ghs, b.g)
)
"""


MSSG_DIM = 8


def _mssg_docs_vectors(spark, sf_dir):
    """(docs(doc_id, tokens), vectors(word, vector)) with md5-derived token
    embeddings — deterministic, engine-portable, no RNG."""
    # NOT fanned: the ctx groupBy already provides shuffle parallelism, and
    # the vocab/vectors subtree re-pays the exchange per action (measured
    # +1s on mssg_context_vectors with _fan here)
    d = load(spark, sf_dir, "documents")
    docs = d.select("doc_id", _doc_tokens(F.col("text")).alias("tokens"))
    vocab = docs.select(F.explode("tokens").alias("word")).distinct()
    dims = [
        (
            (
                F.conv(
                    F.substring(
                        F.md5(F.concat(F.col("word"), F.lit(f"_d{i}"))), 1, 8
                    ),
                    16,
                    10,
                ).cast("long")
                % 1000
                - 500
            ).cast("double")
            / 500.0
        ).cast("float")
        for i in range(MSSG_DIM)
    ]
    return docs, vocab.select("word", F.array(*dims).alias("vector"))


def q_mssg_context_vectors(spark, sf_dir):
    """The MSSG front half — per-occurrence context vectors (elementwise
    mean of the ±2-window neighbor embeddings, operators/embeddings.
    context_vectors) — value-hash-checked: per occurrence, the L2 norm and
    the component sum of the context vector. Neighbor sums are exact in any
    order (float32 values summed in double), so the DuckDB twin is
    bit-identical."""
    from .operators.embeddings import context_vectors

    docs, vectors = _mssg_docs_vectors(spark, sf_dir)
    ctx = context_vectors(docs, vectors, window=2)
    norm = F.sqrt(F.aggregate("ctx", F.lit(0.0), lambda a, v: a + v * v))
    tot = F.aggregate("ctx", F.lit(0.0), lambda a, v: a + v)
    return ctx.select(
        "doc_id",
        F.col("pos").cast("long").alias("pos"),
        "word",
        # + 0.0 canonicalizes IEEE −0.0 → +0.0 (engines disagree on the sign
        # of a zero sum; the value-hash sees the string "-0.0")
        (F.round(norm, 6) + F.lit(0.0)).alias("ctx_norm"),
        (F.round(tot, 6) + F.lit(0.0)).alias("ctx_sum"),
    )


def _sql_mssg_vec_dims(word_expr: str) -> list[str]:
    return [
        f"CAST(CAST((('0x' || substr(md5({word_expr} || '_d{i}'), 1, 8))::BIGINT"
        f" % 1000 - 500) AS DOUBLE) / 500.0 AS REAL)"
        for i in range(MSSG_DIM)
    ]


def _sql_mssg_ctx_prefix() -> str:
    """Shared CTE chain producing per-occurrence context components
    ``sel(doc_id, p, word, c0..c{D-1})`` — the front half of both the
    context-vector value-hash oracle and the sense-k-means oracle."""
    vdims = ", ".join(
        f"{e} AS v{i}" for i, e in enumerate(_sql_mssg_vec_dims("nword"))
    )
    sums = ", ".join(
        f"SUM(CAST(v{i} AS DOUBLE)) AS s{i}" for i in range(MSSG_DIM)
    )
    cdims = ", ".join(f"s{i} / n AS c{i}" for i in range(MSSG_DIM))
    return f"""t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
),
occ AS (
  SELECT doc_id, toks, unnest(toks) AS word,
         generate_subscripts(toks, 1) AS p
  FROM t
),
nb AS (
  SELECT doc_id, p, word,
         unnest(list_concat(
           list_slice(toks, greatest(p - 2, 1), p - 1),
           list_slice(toks, p + 1, least(p + 2, len(toks)))
         )) AS nword
  FROM occ
),
nv AS (SELECT doc_id, p, word, {vdims} FROM nb),
agg AS (
  SELECT doc_id, p, word, COUNT(*) AS n, {sums}
  FROM nv GROUP BY doc_id, p, word
),
sel AS (SELECT doc_id, p, word, {cdims} FROM agg)"""


def _sql_mssg_context_vectors() -> str:
    # left-assoc fold chains, matching F.aggregate's element order exactly
    norm2 = "0.0"
    tot = "0.0"
    for i in range(MSSG_DIM):
        norm2 = f"({norm2} + c{i} * c{i})"
        tot = f"({tot} + c{i})"
    return f"""
WITH {_sql_mssg_ctx_prefix()}
SELECT doc_id, CAST(p - 1 AS BIGINT) AS pos, word,
       ROUND(sqrt({norm2}), 6) + 0.0 AS ctx_norm,
       ROUND({tot}, 6) + 0.0 AS ctx_sum
FROM sel
"""


SQL_MSSG_CTX = _sql_mssg_context_vectors()


MSSG_QBITS = 20  # context/centroid quantization grid 2^-20 (see below)


def q_mssg_senses(spark, sf_dir):
    """MSSG multi-sense discovery over document tokens (the reference
    thesis's MultiSenseSkipGramEmbeddingModel re-expressed batch-side,
    operators/embeddings.py): per-occurrence context vectors → per-word
    max-dot k-means into 2 senses, 5 bounded rounds.

    Oracle-checked (round 2, formerly rows-only): contexts and updated
    centroids are floored onto the 2^-20 binary grid (quantize_pow2), so
    every dot-product term lands on the exact 2^-40 grid and every partial
    sum stays exactly representable — assignments and centroids are
    bit-identical in any summation order and any engine, which lets the
    bounded k-means unroll into SQL_MSSG_SENSES's per-round CTE pairs
    (assign via row_number over exact dots, update via exact-mean +
    re-floor, empty senses keep their centroid)."""
    from .operators.embeddings import context_vectors, mssg_sense_vectors

    docs, vectors = _mssg_docs_vectors(spark, sf_dir)
    ctx = context_vectors(docs, vectors, window=2)
    senses = mssg_sense_vectors(
        ctx, n_senses=2, min_contexts=50, quantize_pow2=MSSG_QBITS
    )
    norm = F.sqrt(
        F.aggregate("sense_vec", F.lit(0.0), lambda a, v: a + v * v)
    )
    return senses.select(
        "word", "sense", "n_contexts",
        (F.floor(norm * 1e6) / 1e6).alias("sense_norm"),
    )


def _sql_mssg_senses(
    n_iter: int = 5, min_contexts: int = 50, k: int = 2
) -> str:
    """DuckDB twin of q_mssg_senses: the bounded per-word k-means unrolled
    into ``n_iter`` (assign, update) CTE pairs over the shared context-
    component prefix. Exact parity per the 2^-20 quantization argument in
    q_mssg_senses' docstring; argmax ties break to the lowest sense
    (np.argmax first-max = ORDER BY dot DESC, sense ASC)."""
    D = MSSG_DIM
    Q = f"{float(1 << MSSG_QBITS):.1f}"
    xcols = ", ".join(f"x{i}" for i in range(D))
    cq = ", ".join(f"floor(c{i} * {Q}) / {Q} AS x{i}" for i in range(D))
    dinit = ", ".join(f"x{i} AS d{i}" for i in range(D))
    parts = [f"""
WITH {_sql_mssg_ctx_prefix()},
xq AS MATERIALIZED (
  SELECT s.doc_id, s.p, s.word, {cq},
         row_number() OVER (PARTITION BY s.word ORDER BY s.doc_id, s.p) AS rn
  FROM sel s
  JOIN (SELECT word FROM sel GROUP BY word
        HAVING COUNT(*) >= {min_contexts}) e USING (word)
),
c0 AS MATERIALIZED (
  SELECT word, CAST(rn - 1 AS BIGINT) AS sense, {dinit}
  FROM xq WHERE rn <= {k}
)"""]
    dot = " + ".join(f"x.x{i} * c.d{i}" for i in range(D))
    means = ", ".join(f"SUM(x{i}) / COUNT(*) AS m{i}" for i in range(D))
    upd = ", ".join(
        f"COALESCE(floor(m.m{i} * {Q}) / {Q}, c.d{i}) AS d{i}"
        for i in range(D)
    )
    for r in range(1, n_iter + 1):
        parts.append(f""",
a{r} AS MATERIALIZED (
  SELECT doc_id, p, word, sense, {xcols} FROM (
    SELECT d.*, row_number() OVER (PARTITION BY word, doc_id, p
                                   ORDER BY dot DESC, sense ASC) AS rk
    FROM (SELECT x.doc_id, x.p, x.word, {xcols}, c.sense,
                 ({dot}) AS dot
          FROM xq x JOIN c{r - 1} c USING (word)) d
  ) WHERE rk = 1
),
c{r} AS MATERIALIZED (
  SELECT c.word, c.sense, {upd}
  FROM c{r - 1} c LEFT JOIN (
    SELECT word, sense, {means} FROM a{r} GROUP BY word, sense
  ) m USING (word, sense)
)""")
    norm2 = " + ".join(f"c.d{i} * c.d{i}" for i in range(D))
    parts.append(f"""
SELECT c.word, c.sense, CAST(COALESCE(n.cnt, 0) AS BIGINT) AS n_contexts,
       floor(sqrt({norm2}) * 1e6) / 1e6 AS sense_norm
FROM c{n_iter} c
LEFT JOIN (SELECT word, sense, COUNT(*) AS cnt
           FROM a{n_iter} GROUP BY 1, 2) n USING (word, sense)
""")
    return "".join(parts)


SQL_MSSG_SENSES = _sql_mssg_senses()


def q_contamination_check(spark, sf_dir):
    """Benchmark decontamination (operators/text.ngram_contamination): every
    doc_id % 97 == 0 document plays the held-out benchmark; the rest of the
    corpus is checked for exact word-5-gram collisions against it (n=13 at
    production scale). Broadcast membership join on md5 gram hashes — the
    corpus side never shuffles."""
    from .operators.text import ngram_contamination

    d = _fan(load(spark, sf_dir, "documents"))
    bench = d.filter(F.col("doc_id") % 97 == 0)
    corpus = d.filter(F.col("doc_id") % 97 != 0)
    out = ngram_contamination(corpus, bench, n=CONTAM_N)
    return out.select(
        "doc_id", "n_grams", "n_contaminated",
        F.round("contamination_ratio", 6).alias("contamination_ratio"),
        "contaminated",
    )


SQL_CONTAMINATION = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
gh AS (
  SELECT doc_id,
    CASE WHEN len(t) - {CONTAM_N - 1} <= 0 THEN []::BIGINT[]
         ELSE list_transform(range(1, len(t) - {CONTAM_N - 2}),
              i -> ('0x' || substr(md5(array_to_string(
                       list_slice(t, i, i + {CONTAM_N - 1}), ' ')), 1, 15))::BIGINT)
    END AS ghs
  FROM toks
),
bench AS (SELECT DISTINCT unnest(ghs) AS g FROM gh WHERE doc_id % 97 = 0),
corpus AS (SELECT doc_id, ghs FROM gh WHERE doc_id % 97 <> 0),
ex AS (SELECT doc_id, len(ghs) AS n_grams, unnest(ghs) AS g FROM corpus),
hits AS (
  SELECT c.doc_id, c.n_grams, COUNT(b.g) AS n_contaminated
  FROM ex c LEFT JOIN bench b ON b.g = c.g
  GROUP BY 1, 2
),
empty AS (
  SELECT doc_id, 0 AS n_grams, 0 AS n_contaminated
  FROM corpus WHERE len(ghs) = 0
),
allrows AS (SELECT * FROM hits UNION ALL SELECT * FROM empty)
SELECT doc_id, CAST(n_grams AS BIGINT) AS n_grams,
       CAST(n_contaminated AS BIGINT) AS n_contaminated,
       ROUND(CASE WHEN n_grams > 0
                  THEN n_contaminated::DOUBLE / n_grams ELSE 0.0 END,
             6) AS contamination_ratio,
       n_contaminated > 0 AS contaminated
FROM allrows
"""


def q_repetition_profile(spark, sf_dir):
    """Gopher-style repetition filters (operators/text.repetition_stats):
    duplicate-token ratio, top-unigram and top-bigram token fractions, and
    the >0.18 top-bigram flag (Rae et al. 2021 §A1.1) per document."""
    from .operators.text import repetition_stats

    out = repetition_stats(load(spark, sf_dir, "documents"))
    return out.select(
        "doc_id", "n_tokens",
        F.round("dup_token_ratio", 6).alias("dup_token_ratio"),
        F.round("top_unigram_frac", 6).alias("top_unigram_frac"),
        F.round("top_bigram_frac", 6).alias("top_bigram_frac"),
        "repetition_flagged",
    )


SQL_REPETITION = """
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
base AS (
  SELECT doc_id, t, len(t) AS n_tokens,
         1.0 - len(list_distinct(t))::DOUBLE / GREATEST(len(t), 1)
           AS dup_token_ratio
  FROM toks
),
uni AS (
  SELECT doc_id, MAX(c) AS topu FROM (
    SELECT doc_id, w, COUNT(*) AS c
    FROM (SELECT doc_id, unnest(t) AS w FROM base)
    GROUP BY 1, 2
  ) GROUP BY 1
),
bg AS (
  SELECT doc_id,
         CASE WHEN len(t) >= 2
              THEN list_transform(range(1, len(t)),
                   i -> array_to_string(list_slice(t, i, i + 1), ' '))
              ELSE []::VARCHAR[] END AS b
  FROM base
),
bigtop AS (SELECT doc_id, MAX(nb) AS nb, MAX(topb) AS topb
           FROM (SELECT doc_id, nb, COUNT(*) AS topb
                 FROM (SELECT doc_id, len(b) AS nb, unnest(b) AS w FROM bg)
                 GROUP BY doc_id, nb, w)
           GROUP BY doc_id),
empties AS (SELECT doc_id, 0 AS nb, NULL AS topb FROM bg WHERE len(b) = 0)
SELECT b.doc_id, CAST(b.n_tokens AS BIGINT) AS n_tokens,
       ROUND(b.dup_token_ratio, 6) AS dup_token_ratio,
       ROUND(COALESCE(u.topu, 0)::DOUBLE / GREATEST(b.n_tokens, 1), 6)
         AS top_unigram_frac,
       ROUND(COALESCE(t.topb, 0)::DOUBLE / GREATEST(COALESCE(t.nb, 0), 1), 6)
         AS top_bigram_frac,
       (COALESCE(t.topb, 0)::DOUBLE / GREATEST(COALESCE(t.nb, 0), 1)) > 0.18
         AS repetition_flagged
FROM base b
LEFT JOIN uni u USING (doc_id)
LEFT JOIN (SELECT * FROM bigtop UNION ALL SELECT * FROM empties) t
  USING (doc_id)
"""


CHUNK_MAX, CHUNK_OVERLAP = 24, 8   # 512/64-shaped at production; small at SF
PACK_BUDGET, PACK_SHARDS = 96, 8


def q_doc_chunks(spark, sf_dir):
    """Context-window chunking (operators/text.chunk_documents): token
    windows of 24 with overlap 8 (512/64-shaped at production scale) —
    JVM-side array slices, one row in / n_chunks rows out, no shuffle.
    Rows keep a gram fingerprint of each chunk so the hash check proves
    the exact window boundaries."""
    from .operators.text import chunk_documents

    out = chunk_documents(
        load(spark, sf_dir, "documents"),
        max_tokens=CHUNK_MAX, overlap=CHUNK_OVERLAP,
    )
    return out.select(
        "doc_id", "chunk_idx", "n_chunk_tokens",
        F.md5("chunk_text").alias("chunk_md5"),
    )


SQL_DOC_CHUNKS = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(lower(text)), '\\s+') AS t
  FROM documents
),
nc AS (
  SELECT doc_id, t,
         GREATEST(CAST(ceil((len(t) - {CHUNK_OVERLAP})::DOUBLE
                            / {CHUNK_MAX - CHUNK_OVERLAP}) AS INT), 1) AS k
  FROM toks
),
ex AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_idx,
         array_to_string(
           list_slice(t, i * {CHUNK_MAX - CHUNK_OVERLAP} + 1,
                      i * {CHUNK_MAX - CHUNK_OVERLAP} + {CHUNK_MAX}),
           ' ') AS chunk_text
  FROM nc, unnest(range(0, k)) AS u(i)
)
SELECT doc_id, chunk_idx,
       CASE WHEN length(chunk_text) = 0 THEN 0
            ELSE len(string_split(chunk_text, ' ')) END::BIGINT
         AS n_chunk_tokens,
       md5(chunk_text) AS chunk_md5
FROM ex
"""


def q_doc_packing(spark, sf_dir):
    """Sequence packing (operators/text.pack_documents): 8 shards (the
    per-worker packer analog), 96-token budget, within-shard cumulative
    assignment — globally-unique engine-portable pack ids."""
    from .operators.text import pack_documents

    return pack_documents(
        load(spark, sf_dir, "documents"),
        budget=PACK_BUDGET, n_shards=PACK_SHARDS,
    )


SQL_DOC_PACKING = f"""
WITH base AS (
  SELECT doc_id,
         len(string_split_regex(trim(lower(text)), '\\s+'))::BIGINT AS n_tokens,
         (doc_id % {PACK_SHARDS})::BIGINT AS shard_id
  FROM documents
),
c AS (
  SELECT *, COALESCE(SUM(n_tokens) OVER (
              PARTITION BY shard_id ORDER BY doc_id
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS before
  FROM base
)
SELECT doc_id, n_tokens, shard_id,
       (shard_id * 1000000000 + CAST(floor(before::DOUBLE / {PACK_BUDGET}) AS BIGINT))
         AS pack_id,
       (before % {PACK_BUDGET})::BIGINT AS pack_offset
FROM c
"""


def q_pii_scrub(spark, sf_dir):
    """PII/secret scrubbing (operators/text.scrub_pii): every doc_id % 11
    == 0 document gets a deterministic PII payload appended (email, IPv4,
    32-hex secret, 10-digit id), then the sequential typed-placeholder
    redaction runs over the whole corpus. Output: per-type match counts +
    md5 of the scrubbed text (proving the redaction byte-for-byte)."""
    from .operators.text import scrub_pii

    d = load(spark, sf_dir, "documents")
    injected = d.withColumn(
        "text",
        F.concat(
            F.col("text"),
            F.when(
                F.col("doc_id") % 11 == 0,
                F.concat(
                    F.lit(" contact user"), F.col("doc_id").cast("string"),
                    F.lit("@example.com node 10.0.0."),
                    (F.col("doc_id") % 255).cast("string"),
                    F.lit(" key 0123456789abcdef0123456789abcdef id 9876543210"),
                ),
            ).otherwise(F.lit("")),
        ),
    )
    out = scrub_pii(injected)
    return out.select(
        "doc_id",
        F.col("n_email").cast("long").alias("n_email"),
        F.col("n_ipv4").cast("long").alias("n_ipv4"),
        F.col("n_hexsecret").cast("long").alias("n_hexsecret"),
        F.col("n_longdigits").cast("long").alias("n_longdigits"),
        F.md5("scrubbed_text").alias("scrub_md5"),
    )


_PII_SQL_STEPS = [
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"),
    ("hexsecret", "\\b[0-9a-fA-F]{32,}\\b", "<SECRET>"),
    ("longdigits", "\\b\\d{9,}\\b", "<NUMBER>"),
]


def _sql_pii_scrub() -> str:
    cur = "txt"
    cols = []
    steps = []
    for i, (name, pat, repl) in enumerate(_PII_SQL_STEPS):
        cols.append(
            f"len(regexp_extract_all({cur}, '{pat}')) AS n_{name}"
        )
        nxt = f"t{i}"
        steps.append(f"regexp_replace({cur}, '{pat}', '{repl}', 'g') AS {nxt}")
        cur = nxt
    return f"""
WITH inj AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 11 = 0
           THEN ' contact user' || doc_id::VARCHAR || '@example.com node 10.0.0.'
                || (doc_id % 255)::VARCHAR
                || ' key 0123456789abcdef0123456789abcdef id 9876543210'
           ELSE '' END AS txt
  FROM documents
),
s0 AS (SELECT doc_id, txt, {cols[0]}, {steps[0]} FROM inj),
s1 AS (SELECT doc_id, n_email, {cols[1]}, {steps[1]} FROM s0),
s2 AS (SELECT doc_id, n_email, n_ipv4, {cols[2]}, {steps[2]} FROM s1),
s3 AS (SELECT doc_id, n_email, n_ipv4, n_hexsecret, {cols[3]}, {steps[3]} FROM s2)
SELECT doc_id,
       CAST(n_email AS BIGINT) AS n_email,
       CAST(n_ipv4 AS BIGINT) AS n_ipv4,
       CAST(n_hexsecret AS BIGINT) AS n_hexsecret,
       CAST(n_longdigits AS BIGINT) AS n_longdigits,
       md5(t3) AS scrub_md5
FROM s3
"""


SQL_PII_SCRUB = _sql_pii_scrub()


def q_bsm_cascade(spark, sf_dir):
    """BSM tiered exact-match cascade (Matcher-BaseSimilarity/.../
    BaseSimilarityMatcher.java:286-360 — operators/matchers.bsm): exact
    name 1.0 → tier-2 normalized 0.95 → stem tier 0.9 → digit-strip 0.8,
    one when-cascade in codegen over the blocked candidates. The stem tier
    is identity on this corpus (Porter runs in the pipeline path,
    parity-tested separately) so the tier fires together with tier 2 and
    the DuckDB twin stays mechanical; the digit-strip tier is exercised
    for real (doc names carry digits)."""
    from .operators.matchers import bsm

    names = _doc_names(spark, sf_dir)
    norm = F.trim(F.regexp_replace(F.lower(F.col("name")), "[^a-z0-9]+", " "))
    nodigit = F.trim(F.regexp_replace(norm, "[0-9]", ""))
    ents = names.select(
        "doc_id", "block_key",
        F.col("name").alias("local_name"),
        norm.alias("norm_name"),
        norm.alias("stem_name"),
        nodigit.alias("nodigit_name"),
    )
    s = ents.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src_id"), "block_key",
        *[F.col(c).alias(f"s_{c}") for c in
          ("local_name", "norm_name", "stem_name", "nodigit_name")],
    )
    d = ents.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("dst_id"), "block_key",
        *[F.col(c).alias(f"d_{c}") for c in
          ("local_name", "norm_name", "stem_name", "nodigit_name")],
    )
    out = bsm(s.join(d, "block_key"))
    return (
        out.filter(F.col("sim_bsm") > 0)
        .select("src_id", "dst_id", F.round("sim_bsm", 6).alias("sim_bsm"))
    )


SQL_BSM_CASCADE = f"""
WITH names AS ({_SQL_DOC_NAMES}),
e AS (
  SELECT doc_id, block_key, name AS local_name,
         trim(regexp_replace(lower(name), '[^a-z0-9]+', ' ', 'g')) AS norm_name
  FROM names
),
e2 AS (
  SELECT *, norm_name AS stem_name,
         trim(regexp_replace(norm_name, '[0-9]', '', 'g')) AS nodigit_name
  FROM e
),
p AS (
  SELECT s.doc_id AS src_id, d.doc_id AS dst_id,
         CASE WHEN s.local_name = d.local_name THEN 1.0
              WHEN s.norm_name = d.norm_name THEN 0.95
              WHEN s.stem_name = d.stem_name THEN 0.9
              WHEN s.nodigit_name = d.nodigit_name
                   AND length(s.nodigit_name) > 0 THEN 0.8
              ELSE 0.0 END AS sim_bsm
  FROM e2 s JOIN e2 d USING (block_key)
  WHERE s.doc_id % 2 = 0 AND d.doc_id % 2 = 1
)
SELECT src_id, dst_id, ROUND(sim_bsm, 6) AS sim_bsm FROM p WHERE sim_bsm > 0
"""


def q_instance_linking(spark, sf_dir):
    """Instance/entity linking (LabelInstanceMatcher.java:28-150,
    InstanceMatching.java:22-110 — operators/linking.link_mentions): even
    docs are mentions, odd docs are canonical entities, repos are md5-free
    deterministic doc_id buckets. Two-stage completion shape: same-repo
    exact-normalized-label join resolves first, only the unresolved
    mentions go to the global label block (anti-join); top-1 per mention
    with ScoredInstanceComparator tie-breaks (score DESC, uri ASC)."""
    from .functions.spark_sims import norm_name_col
    from .operators.linking import link_mentions

    names = _doc_names(spark, sf_dir)
    mentions = names.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("mention_id"),
        F.col("name").alias("label"),
        F.concat(F.lit("r"), (F.col("doc_id") % 7).cast("string")).alias("repo"),
    )
    e_norm = norm_name_col(F.col("name"))
    entities = names.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("entity_id"),
        F.format_string("%09d", F.col("doc_id")).alias("uri"),
        e_norm.alias("norm_name"),
        F.split(e_norm, " ").alias("tokens"),
        F.concat(F.lit("r"), (F.col("doc_id") % 7).cast("string")).alias("repo"),
    )
    out = link_mentions(mentions, entities, threshold=0.5)
    return out.select(
        "mention_id", "entity_id", F.round("link_score", 6).alias("link_score")
    )


_SQL_NORM = (
    "trim(regexp_replace(lower(regexp_replace(regexp_replace({c}, "
    "'([A-Z]+)([A-Z][a-z])', '\\1 \\2', 'g'), "
    "'([a-z0-9])([A-Z])', '\\1 \\2', 'g')), '[^a-z0-9]+', ' ', 'g'))"
)

SQL_INSTANCE_LINKING = f"""
WITH names AS ({_SQL_DOC_NAMES}),
m AS (
  SELECT doc_id AS mention_id, {_SQL_NORM.format(c="name")} AS m_norm,
         'r' || (doc_id % 7)::VARCHAR AS m_repo
  FROM names WHERE doc_id % 2 = 0
),
e AS (
  SELECT doc_id AS entity_id, lpad(doc_id::VARCHAR, 9, '0') AS e_uri,
         {_SQL_NORM.format(c="name")} AS e_norm,
         'r' || (doc_id % 7)::VARCHAR AS e_repo
  FROM names WHERE doc_id % 2 = 1
),
score_local AS (
  SELECT m.mention_id, e.entity_id, e.e_uri,
         ROUND(0.6 * (CASE WHEN length(m_norm) = 0 AND length(e_norm) = 0 THEN 1.0
              WHEN least(length(m_norm), length(e_norm)) = 0 THEN 0.0
              ELSE 1.0 - least(levenshtein(m_norm, e_norm),
                               least(length(m_norm), length(e_norm)))::DOUBLE
                         / least(length(m_norm), length(e_norm)) END)
             + 0.3 * (CASE WHEN len(list_distinct(list_concat(
                        list_distinct(string_split(m_norm, ' ')),
                        list_distinct(string_split(e_norm, ' '))))) = 0 THEN 1.0
                 ELSE len(list_intersect(list_distinct(string_split(m_norm, ' ')),
                                         list_distinct(string_split(e_norm, ' '))))::DOUBLE
                      / len(list_distinct(list_concat(
                            list_distinct(string_split(m_norm, ' ')),
                            list_distinct(string_split(e_norm, ' '))))) END)
             + (CASE WHEN m_repo = e_repo THEN 0.1 ELSE 0.0 END), 12) AS link_score
  FROM m JOIN e ON m.m_repo = e.e_repo AND m.m_norm = e.e_norm
),
local AS (
  SELECT mention_id, entity_id, link_score FROM (
    SELECT *, row_number() OVER (PARTITION BY mention_id
                                 ORDER BY link_score DESC, e_uri ASC) AS rn
    FROM score_local WHERE link_score >= 0.5
  ) WHERE rn = 1
),
unresolved AS (
  SELECT * FROM m WHERE mention_id NOT IN (SELECT mention_id FROM local)
),
score_glob AS (
  SELECT m.mention_id, e.entity_id, e.e_uri,
         ROUND(0.6 * (CASE WHEN length(m_norm) = 0 AND length(e_norm) = 0 THEN 1.0
              WHEN least(length(m_norm), length(e_norm)) = 0 THEN 0.0
              ELSE 1.0 - least(levenshtein(m_norm, e_norm),
                               least(length(m_norm), length(e_norm)))::DOUBLE
                         / least(length(m_norm), length(e_norm)) END)
             + 0.3 * (CASE WHEN len(list_distinct(list_concat(
                        list_distinct(string_split(m_norm, ' ')),
                        list_distinct(string_split(e_norm, ' '))))) = 0 THEN 1.0
                 ELSE len(list_intersect(list_distinct(string_split(m_norm, ' ')),
                                         list_distinct(string_split(e_norm, ' '))))::DOUBLE
                      / len(list_distinct(list_concat(
                            list_distinct(string_split(m_norm, ' ')),
                            list_distinct(string_split(e_norm, ' '))))) END)
             + (CASE WHEN m_repo = e_repo THEN 0.1 ELSE 0.0 END), 12) AS link_score
  FROM unresolved m JOIN e ON m.m_norm = e.e_norm
),
glinks AS (
  SELECT mention_id, entity_id, link_score FROM (
    SELECT *, row_number() OVER (PARTITION BY mention_id
                                 ORDER BY link_score DESC, e_uri ASC) AS rn
    FROM score_glob WHERE link_score >= 0.5
  ) WHERE rn = 1
)
SELECT mention_id, entity_id, ROUND(link_score, 6) AS link_score FROM local
UNION ALL
SELECT mention_id, entity_id, ROUND(link_score, 6) AS link_score FROM glinks
"""


_STRUCT_GRID = float(1 << 20)
_PARENT_PAIR_SIM = 0.875  # 7/8: exactly representable, on the binary grid


def q_structural_boost(spark, sf_dir):
    """DSI + SSC structural refinement (dsi/DescendantsSimilarityInheritance
    Matcher.java:63-185, ssc/SiblingsSimilarityContributionMatcher.java:
    77-117 — operators/structural.dsi, .ssc) over the blocked lev matrix
    with a deterministic century hierarchy: each doc's parent is its century
    bucket (offset id spaces per side), same-century parent pairs carry sim
    7/8, so DSI inherits the parent cell and SSC blends same-family sibling
    averages. Sims floored onto the 2^-20 grid → the family sums are exact
    cross-engine (the MSSG lesson). Output: pair + sim, sim_dsi, sim_ssc."""
    from .functions.spark_sims import lev_min_norm_col
    from .operators.structural import dsi, ssc

    names = _doc_names(spark, sf_dir)
    s = names.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src_id"),
        F.col("name").alias("s_name"), "block_key",
    )
    d = names.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("dst_id"),
        F.col("name").alias("d_name"), "block_key",
    )
    g = _STRUCT_GRID
    docp = (
        s.join(d, "block_key")
        .withColumn(
            "sim",
            F.floor(lev_min_norm_col(F.col("s_name"), F.col("d_name")) * g) / g,
        )
        .filter(F.col("sim") >= 0.5)
        .select("src_id", "dst_id", "sim")
    )
    cents = (
        load(spark, sf_dir, "documents")
        .select(F.floor(F.col("doc_id") / 100).cast("long").alias("c"))
        .distinct()
    )
    parentp = cents.select(
        (F.lit(1_000_000) + F.col("c")).alias("src_id"),
        (F.lit(2_000_000) + F.col("c")).alias("dst_id"),
        F.lit(_PARENT_PAIR_SIM).alias("sim"),
    )
    p = docp.unionByName(parentp).localCheckpoint()
    docs = load(spark, sf_dir, "documents").select("doc_id")
    sp = docs.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("child_id"),
        (F.lit(1_000_000) + F.floor(F.col("doc_id") / 100)).cast("long")
        .alias("parent_id"),
    )
    dp = docs.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("child_id"),
        (F.lit(2_000_000) + F.floor(F.col("doc_id") / 100)).cast("long")
        .alias("parent_id"),
    )
    out_dsi = dsi(p, sp, dp, mcp=0.75).select("src_id", "dst_id", "sim_dsi")
    out_ssc = ssc(p, sp, dp, weight=0.25).select("src_id", "dst_id", "sim_ssc")
    return (
        p.join(out_dsi, ["src_id", "dst_id"])
        .join(out_ssc, ["src_id", "dst_id"])
        .filter(F.col("src_id") < 1_000_000)
        .select(
            "src_id", "dst_id",
            F.round("sim", 6).alias("sim"),
            F.round("sim_dsi", 6).alias("sim_dsi"),
            F.round("sim_ssc", 6).alias("sim_ssc"),
        )
    )


SQL_STRUCTURAL_BOOST = f"""
WITH names AS ({_SQL_DOC_NAMES}),
s AS (SELECT doc_id AS src_id, name AS s_name, block_key FROM names WHERE doc_id % 2 = 0),
d AS (SELECT doc_id AS dst_id, name AS d_name, block_key FROM names WHERE doc_id % 2 = 1),
docp AS (
  SELECT src_id, dst_id,
         floor((CASE WHEN length(s_name) = 0 AND length(d_name) = 0 THEN 1.0
              WHEN least(length(s_name), length(d_name)) = 0 THEN 0.0
              ELSE 1.0 - least(levenshtein(s_name, d_name),
                               least(length(s_name), length(d_name)))::DOUBLE
                         / least(length(s_name), length(d_name))
         END) * {_STRUCT_GRID}) / {_STRUCT_GRID} AS sim
  FROM s JOIN d USING (block_key)
),
p AS MATERIALIZED (
  SELECT * FROM docp WHERE sim >= 0.5
  UNION ALL
  SELECT 1000000 + c AS src_id, 2000000 + c AS dst_id, {_PARENT_PAIR_SIM} AS sim
  FROM (SELECT DISTINCT doc_id // 100 AS c FROM documents)
),
sp AS (SELECT doc_id AS src_id, 1000000 + doc_id // 100 AS s_parent
       FROM documents WHERE doc_id % 2 = 0),
dp AS (SELECT doc_id AS dst_id, 2000000 + doc_id // 100 AS d_parent
       FROM documents WHERE doc_id % 2 = 1),
per AS (
  SELECT p.src_id, p.dst_id, sp.s_parent, MAX(ps.sim) AS best
  FROM p JOIN sp USING (src_id) JOIN dp USING (dst_id)
  LEFT JOIN p ps ON ps.src_id = sp.s_parent AND ps.dst_id = dp.d_parent
  GROUP BY 1, 2, 3
),
contrib AS (SELECT src_id, dst_id, AVG(best) AS pc FROM per GROUP BY 1, 2),
dsi AS (
  SELECT p.src_id, p.dst_id,
         ROUND(0.75 * p.sim + 0.25 * COALESCE(c.pc, p.sim), 12) AS sim_dsi
  FROM p LEFT JOIN contrib c USING (src_id, dst_id)
),
fam AS (
  SELECT p.src_id, p.dst_id, p.sim, sp.s_parent, dp.d_parent
  FROM p JOIN sp USING (src_id) JOIN dp USING (dst_id)
),
fs AS (SELECT s_parent, d_parent, SUM(sim) AS fam_sum, COUNT(*) AS fam_n
       FROM fam GROUP BY 1, 2),
sscp AS (
  SELECT src_id, dst_id,
         MAX(ROUND(0.75 * sim + 0.25 *
             (CASE WHEN fam_n > 1 THEN (fam_sum - sim) / (fam_n - 1)
                   ELSE sim END), 12)) AS sim_ssc
  FROM fam JOIN fs USING (s_parent, d_parent)
  GROUP BY 1, 2
)
SELECT p.src_id, p.dst_id, ROUND(p.sim, 6) AS sim,
       ROUND(dsi.sim_dsi, 6) AS sim_dsi,
       ROUND(COALESCE(sscp.sim_ssc, p.sim), 6) AS sim_ssc
FROM p
JOIN dsi USING (src_id, dst_id)
LEFT JOIN sscp USING (src_id, dst_id)
WHERE p.src_id < 1000000
"""


def q_lexicon_match(spark, sf_dir):
    """LSM synonym matching through a built lexicon (lexicon/ontology/
    OntologyLexiconBuilder.java:56-105 build = per-entity synonym explode;
    LexicalSynonymMatcher.java:221-266 match = term equi-join scaled by the
    synonym weight — operators/lexicon.build_lexicon, .lsm). Entities are
    doc names; synonym tiers = raw lowercase + punctuation-normalized form
    (the stem tier is identity here so the DuckDB twin stays mechanical —
    Porter runs in the pipeline path, parity-tested separately)."""
    from .operators.lexicon import build_lexicon, lsm

    # unfanned: the lexicon build re-evaluates the names subtree in several
    # concurrent branches and its kernels are cheap (A/B: 0.67 s vs 1.25 s
    # fanned — same pile-up as iism_subprop_union)
    names = _doc_names(spark, sf_dir, fan=False)
    ents = names.select(
        F.col("doc_id").alias("entity_id"),
        F.col("name").alias("local_name"),
        F.regexp_replace(F.lower(F.col("name")), "[^a-z0-9 ]", "")
        .alias("norm_name"),
        F.regexp_replace(F.lower(F.col("name")), "[^a-z0-9 ]", "")
        .alias("stem_name"),
    )
    lex = build_lexicon(ents)
    src_lex = lex.filter(F.col("entity_id") % 2 == 0)
    dst_lex = lex.filter(F.col("entity_id") % 2 == 1)
    out = lsm(src_lex, dst_lex, synonym_weight=0.95)
    return out.select(
        "src_id", "dst_id", F.round("sim_lsm", 6).alias("sim_lsm")
    )


SQL_LEXICON_MATCH = f"""
WITH names AS ({_SQL_DOC_NAMES}),
lex AS (
  SELECT DISTINCT doc_id AS entity_id, term FROM (
    SELECT doc_id, lower(name) AS term FROM names
    UNION ALL
    SELECT doc_id, regexp_replace(lower(name), '[^a-z0-9 ]', '', 'g') AS term
    FROM names
  ) WHERE length(term) > 0
)
SELECT DISTINCT a.entity_id AS src_id, b.entity_id AS dst_id,
       ROUND(0.95, 6) AS sim_lsm
FROM lex a JOIN lex b USING (term)
WHERE a.entity_id % 2 = 0 AND b.entity_id % 2 = 1
"""


def q_best_match_boost(spark, sf_dir):
    """BestMatchBoosting (boosting/BestMatchBoosting.java:17-79 —
    operators/selection.best_match_boosting): each source row's single best
    pair (deterministic tie-break on the padded dst uri) boosted ×1.2,
    clamped to 1. Applied to the blocked lev matrix."""
    from .functions.spark_sims import lev_min_norm_col
    from .operators.selection import best_match_boosting

    names = _doc_names(spark, sf_dir)
    s = names.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src_id"),
        F.col("name").alias("s_name"), "block_key",
    )
    d = names.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("dst_id"),
        F.col("name").alias("d_name"), "block_key",
    )
    pairs = (
        s.join(d, "block_key")
        .withColumn(
            "sim",
            F.round(lev_min_norm_col(F.col("s_name"), F.col("d_name")), 6),
        )
        .filter(F.col("sim") >= 0.5)
        .withColumn("dst_uri", F.format_string("%09d", F.col("dst_id")))
        .select("src_id", "dst_id", "dst_uri", "sim")
    )
    return best_match_boosting(pairs, boost=1.2).select(
        "src_id", "dst_id", F.round("sim", 6).alias("sim")
    )


SQL_BEST_MATCH_BOOST = f"""
WITH names AS ({_SQL_DOC_NAMES}),
s AS (SELECT doc_id AS src_id, name AS s_name, block_key FROM names WHERE doc_id % 2 = 0),
d AS (SELECT doc_id AS dst_id, name AS d_name, block_key FROM names WHERE doc_id % 2 = 1),
p AS (
  SELECT src_id, dst_id, lpad(dst_id::VARCHAR, 9, '0') AS dst_uri,
         ROUND(CASE WHEN length(s_name) = 0 AND length(d_name) = 0 THEN 1.0
              WHEN least(length(s_name), length(d_name)) = 0 THEN 0.0
              ELSE 1.0 - least(levenshtein(s_name, d_name),
                               least(length(s_name), length(d_name)))::DOUBLE
                         / least(length(s_name), length(d_name))
         END, 6) AS sim
  FROM s JOIN d USING (block_key)
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY src_id
                               ORDER BY sim DESC, dst_uri ASC) AS rn
  FROM p WHERE sim >= 0.5
)
SELECT src_id, dst_id,
       ROUND(CASE WHEN rn = 1 THEN LEAST(sim * 1.2, 1.0) ELSE sim END, 6) AS sim
FROM r
"""


def q_ufl_quality(spark, sf_dir):
    """User-feedback-loop candidate-quality metrics (qualityEvaluation/
    metrics/ufl/CrossCountQuality.java, CrossSumQuality.java,
    SimilarityScoreDefinitness.java, shi/SimilarityDistance.java,
    shi/MultiMatcherConfidence.java, ConsensusQuality.java,
    ExpandedConsensus.java, PropagationImpactMetric.java,
    RevalidationRate.java, IntraCouplingQualityMetric.java — see
    operators/ufl.py) over the blocked 3-matcher signature matrix.

    The ensemble score is the signature mean floored onto the 2^-20 binary
    grid (exact cross-engine sums for the row/col aggregates, per the MSSG
    lesson); user validations are synthesized deterministically from
    md5-derived vote counts (≤ 5 validations per cell, the reference's
    maxRevalidation), so every feedback metric is DuckDB-twinnable.
    SimilarityDistance's per-cell row/col scan is two window passes
    (sorted-adjacent-difference min), never a self-join."""
    from .functions.spark_sims import (
        dice_col,
        jaccard_col,
        lev_min_norm_col,
        shingles_col,
    )
    from .operators.ufl import (
        _cross_count_col,
        _cross_sum_col,
        _STATS_COLS,
        consensus_quality,
        cross_stats,
        expanded_consensus,
        intra_coupling,
        multi_matcher_confidence,
        propagation_impact,
        revalidation_rate,
        similarity_definiteness,
        similarity_distance,
        user_disagreement,
    )

    names = _doc_names(spark, sf_dir)
    s = names.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src_doc_id"),
        F.col("name").alias("s_name"), "block_key",
    )
    d = names.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("dst_doc_id"),
        F.col("name").alias("d_name"), "block_key",
    )
    grid = float(1 << 20)
    p = (
        s.join(d, "block_key")
        .withColumn("sim_lev", lev_min_norm_col(F.col("s_name"), F.col("d_name")))
        .withColumn(
            "sim_qgram",
            jaccard_col(shingles_col(F.col("s_name"), 3),
                        shingles_col(F.col("d_name"), 3)),
        )
        .withColumn(
            "sim_dice",
            dice_col(F.split(F.col("s_name"), " "), F.split(F.col("d_name"), " ")),
        )
        .withColumn(
            "sim",
            F.floor(
                (F.col("sim_lev") + F.col("sim_qgram") + F.col("sim_dice"))
                / 3.0 * grid
            ) / grid,
        )
        .filter(F.col("sim") > 0)
    )
    key = F.concat_ws(
        "_", F.col("src_doc_id").cast("string"), F.col("dst_doc_id").cast("string")
    )
    total = _md5int_col(F.concat(F.lit("v_"), key)) % 6
    h2 = _md5int_col(F.concat(F.lit("p_"), key))
    p = (
        p.withColumn(
            "pos",
            F.when(total == 0, F.lit(0).cast("long")).otherwise(h2 % (total + 1)),
        )
        .withColumn("neg", total - F.col("pos"))
        .select("src_doc_id", "dst_doc_id", "sim_lev", "sim_qgram", "sim_dice",
                "sim", "pos", "neg")
        # eager localCheckpoint, not cache(): ~10 downstream branches (row/
        # col aggs, two windows, scalar norms, intra-coupling) fan out from
        # this matrix — a lazy cache can race/recompute the expensive
        # blocked-join sims per branch (the flooding sigma0 lesson)
        .localCheckpoint()
    )
    # both parity counts in ONE job (two separate count() actions would
    # re-run the doc-name derivation twice)
    parity_counts = {
        int(r["p"]): r["count"]
        for r in names.groupBy((F.col("doc_id") % 2).alias("p")).count().collect()
    }
    n_src = int(parity_counts.get(0, 0))
    n_dst = int(parity_counts.get(1, 0))

    # fused row/col stats: ONE groupBy per side feeds cross_count,
    # cross_sum AND similarity_distance's sparse cell counts (every pair
    # here has sim > 0, so nonzero count == cell count)
    m = cross_stats(p, "src_doc_id", "dst_doc_id", "sim")
    m = m.withColumn("cross_count", _cross_count_col())
    m = m.withColumn("cross_sum", _cross_sum_col())
    m = similarity_definiteness(m, "sim")
    m = multi_matcher_confidence(
        m, ["sim_lev", "sim_qgram", "sim_dice"], threshold=0.7,
        out="mm_confidence",
    )
    m = similarity_distance(
        m, "src_doc_id", "dst_doc_id", "sim", n_rows=n_src, n_cols=n_dst,
    )
    m = consensus_quality(m, "pos", "neg", max_revalidation=5)
    m = expanded_consensus(m, "pos", "neg", "sim", threshold=0.7,
                           max_revalidation=5)
    m = propagation_impact(m, "pos", "neg", validation=5)
    m = revalidation_rate(m, "pos", "neg")
    m = user_disagreement(m, "pos", "neg").drop(*_STATS_COLS)
    ic = intra_coupling(p, "src_doc_id", "dst_doc_id", "sim")

    # floor(x*1e6)/1e6, NOT round(x, 6): the integer-ratio metrics
    # (cross_count over mrc+mcc, consensus over 3, revalidation_rate over
    # maxrep, ...) can land exactly on a .5 tie at the 6th decimal for
    # power-of-two denominators, where Spark HALF_UP and DuckDB may split —
    # the repo's documented MSSG/flooding convention (applied uniformly to
    # every metric column here; all are >= 0 so floor is well-defined).
    def _f6(c):
        return F.floor(F.col(c) * 1e6) / 1e6

    return m.crossJoin(F.broadcast(ic)).select(
        "src_doc_id", "dst_doc_id", "pos", "neg",
        _f6("sim").alias("sim"),
        _f6("cross_count").alias("cross_count"),
        _f6("cross_sum").alias("cross_sum"),
        _f6("definiteness").alias("definiteness"),
        _f6("mm_confidence").alias("mm_confidence"),
        _f6("sim_distance").alias("sim_distance"),
        _f6("consensus").alias("consensus"),
        _f6("expanded_consensus").alias("expanded_consensus"),
        _f6("propagation_impact").alias("propagation_impact"),
        _f6("revalidation_rate").alias("revalidation_rate"),
        _f6("user_disagreement").alias("user_disagreement"),
        _f6("intra_coupling").alias("intra_coupling"),
    )


_UFL_GRID = float(1 << 20)

SQL_UFL_QUALITY = f"""
WITH names AS ({_SQL_DOC_NAMES}),
s AS (SELECT doc_id AS src_doc_id, name AS s_name, block_key FROM names WHERE doc_id % 2 = 0),
d AS (SELECT doc_id AS dst_doc_id, name AS d_name, block_key FROM names WHERE doc_id % 2 = 1),
sh AS (
  SELECT src_doc_id, dst_doc_id, s_name, d_name,
         CASE WHEN length(s_name) = 0 AND length(d_name) = 0 THEN 1.0
              WHEN least(length(s_name), length(d_name)) = 0 THEN 0.0
              ELSE 1.0 - least(levenshtein(s_name, d_name),
                               least(length(s_name), length(d_name)))::DOUBLE
                         / least(length(s_name), length(d_name))
         END AS sim_lev
  FROM s JOIN d USING (block_key)
),
gr AS (
  SELECT *,
    (CASE WHEN length(lower(s_name)) = 0 THEN []::VARCHAR[]
          WHEN length(lower(s_name)) < 3 THEN [lower(s_name)]
          ELSE list_transform(range(1, length(s_name) - 1), i -> substr(lower(s_name), i::INT, 3)) END) AS sg,
    (CASE WHEN length(lower(d_name)) = 0 THEN []::VARCHAR[]
          WHEN length(lower(d_name)) < 3 THEN [lower(d_name)]
          ELSE list_transform(range(1, length(d_name) - 1), i -> substr(lower(d_name), i::INT, 3)) END) AS dg,
    string_split(s_name, ' ') AS st, string_split(d_name, ' ') AS dt
  FROM sh
),
sims AS (
  SELECT src_doc_id, dst_doc_id, sim_lev,
    CASE WHEN len(list_distinct(list_concat(list_distinct(sg), list_distinct(dg)))) = 0 THEN 1.0
         ELSE len(list_intersect(list_distinct(sg), list_distinct(dg)))::DOUBLE
              / len(list_distinct(list_concat(list_distinct(sg), list_distinct(dg))))
    END AS sim_qgram,
    CASE WHEN len(list_distinct(st)) + len(list_distinct(dt)) = 0 THEN 1.0
         ELSE 2.0 * len(list_intersect(list_distinct(st), list_distinct(dt)))::DOUBLE
              / (len(list_distinct(st)) + len(list_distinct(dt)))
    END AS sim_dice
  FROM gr
),
m AS MATERIALIZED (
  SELECT *,
    CASE WHEN total = 0 THEN 0 ELSE h2 % (total + 1) END AS pos,
    total - (CASE WHEN total = 0 THEN 0 ELSE h2 % (total + 1) END) AS neg
  FROM (
    SELECT src_doc_id, dst_doc_id, sim_lev, sim_qgram, sim_dice,
           floor((sim_lev + sim_qgram + sim_dice) / 3.0 * {_UFL_GRID}) / {_UFL_GRID} AS sim,
           ('0x' || substr(md5('v_' || src_doc_id::VARCHAR || '_' || dst_doc_id::VARCHAR), 1, 8))::BIGINT % 6 AS total,
           ('0x' || substr(md5('p_' || src_doc_id::VARCHAR || '_' || dst_doc_id::VARCHAR), 1, 8))::BIGINT AS h2
    FROM sims
  ) WHERE sim > 0
),
rc AS (SELECT src_doc_id, COUNT(*) AS rc FROM m GROUP BY 1),
cc AS (SELECT dst_doc_id, COUNT(*) AS cc FROM m GROUP BY 1),
rs AS (SELECT src_doc_id, SUM(sim) AS rs FROM m GROUP BY 1),
cs AS (SELECT dst_doc_id, SUM(sim) AS cs FROM m GROUP BY 1),
norms AS (
  SELECT (SELECT MAX(rc) FROM rc) AS mrc, (SELECT MAX(cc) FROM cc) AS mcc,
         (SELECT MAX(rs) FROM rs) AS mrs, (SELECT MAX(cs) FROM cs) AS mcs,
         (SELECT COUNT(*) FROM names WHERE doc_id % 2 = 0) AS nsrc,
         (SELECT COUNT(*) FROM names WHERE doc_id % 2 = 1) AS ndst,
         (SELECT GREATEST(MAX(pos) + MAX(neg), 1) FROM m) AS maxrep
),
nb AS (
  SELECT *,
    LEAST(COALESCE(sim - lag(sim) OVER (PARTITION BY src_doc_id ORDER BY sim ASC), 1e9),
          COALESCE(lead(sim) OVER (PARTITION BY src_doc_id ORDER BY sim ASC) - sim, 1e9)) AS rmin,
    LEAST(COALESCE(sim - lag(sim) OVER (PARTITION BY dst_doc_id ORDER BY sim ASC), 1e9),
          COALESCE(lead(sim) OVER (PARTITION BY dst_doc_id ORDER BY sim ASC) - sim, 1e9)) AS cmin
  FROM m
),
ic AS (
  SELECT COUNT(DISTINCT dst_doc_id)::DOUBLE / COUNT(*) AS intra_coupling
  FROM (
    SELECT src_doc_id, dst_doc_id FROM (
      SELECT src_doc_id, dst_doc_id,
             row_number() OVER (PARTITION BY src_doc_id
                                ORDER BY sim DESC, dst_doc_id ASC) AS rn
      FROM m
    ) WHERE rn = 1
  )
)
SELECT nb.src_doc_id, nb.dst_doc_id, nb.pos, nb.neg,
  FLOOR(nb.sim * 1e6) / 1e6 AS sim,
  FLOOR((rc.rc + cc.cc)::DOUBLE / (norms.mrc + norms.mcc) * 1e6) / 1e6 AS cross_count,
  FLOOR((rs.rs + cs.cs) / (norms.mrs + norms.mcs) * 1e6) / 1e6 AS cross_sum,
  FLOOR(2.0 * ABS(nb.sim - 0.5) * 1e6) / 1e6 AS definiteness,
  FLOOR((ABS(0.7 - nb.sim_lev) + ABS(0.7 - nb.sim_qgram) + ABS(0.7 - nb.sim_dice)) / 3.0 * 1e6) / 1e6 AS mm_confidence,
  FLOOR(LEAST(nb.rmin, nb.cmin,
              CASE WHEN rc.rc < norms.ndst THEN ABS(nb.sim) ELSE 1e9 END,
              CASE WHEN cc.cc < norms.nsrc THEN ABS(nb.sim) ELSE 1e9 END) * 1e6) / 1e6 AS sim_distance,
  FLOOR(CASE WHEN nb.pos = nb.neg THEN 0.0
             WHEN nb.pos = 3 OR nb.neg = 3 THEN 1.0
             ELSE ABS(nb.pos - nb.neg)::DOUBLE / 3.0 END * 1e6) / 1e6 AS consensus,
  FLOOR(CASE WHEN p2 = n2 THEN 0.0
             WHEN p2 = 3 OR n2 = 3 THEN 1.0
             ELSE ABS(p2 - n2)::DOUBLE / 3.0 END * 1e6) / 1e6 AS expanded_consensus,
  FLOOR(CASE WHEN nb.pos = 3 OR nb.neg = 3 THEN 0.0
             ELSE LEAST(3 - nb.pos, 3 - nb.neg)::DOUBLE
                  / GREATEST(3 - nb.pos, 3 - nb.neg) END * 1e6) / 1e6 AS propagation_impact,
  FLOOR((nb.pos + nb.neg)::DOUBLE / norms.maxrep * 1e6) / 1e6 AS revalidation_rate,
  FLOOR(CASE WHEN nb.pos + nb.neg = 0 THEN 0.0
             ELSE 4.0 * nb.pos * nb.neg
                  / ((nb.pos + nb.neg)::DOUBLE * (nb.pos + nb.neg)::DOUBLE)
        END * 1e6) / 1e6 AS user_disagreement,
  FLOOR(ic.intra_coupling * 1e6) / 1e6 AS intra_coupling
FROM (
  SELECT *,
    CASE WHEN pos + neg = 1 AND sim > 0.7 THEN pos + 1 ELSE pos END AS p2,
    CASE WHEN pos + neg = 1 AND NOT (sim > 0.7) THEN neg + 1 ELSE neg END AS n2
  FROM nb
) nb
JOIN rc USING (src_doc_id)
JOIN cc USING (dst_doc_id)
JOIN rs USING (src_doc_id)
JOIN cs USING (dst_doc_id)
CROSS JOIN norms CROSS JOIN ic
"""


UFL_PROP_MOD = 509  # md5 pick of validated pairs: ~n_pairs/509 train rows

from .operators.feedback import LN2  # noqa: E402 — shared log-base literal


def q_ufl_propagation(spark, sf_dir):
    """UFL feedback propagation (operators/feedback.propagate_feedback;
    ServerFeedbackPropagation.java logDistance :246-306 and
    qualityPropagation :320-377): user validations are an md5-picked
    subset of the blocked-pair matrix (label = sim > 0.7); every other
    cell moves toward/away from 1.0 by its nearest validated signature
    (3-matcher ssv on the 2^-20 grid, broadcast train set, one argmin
    groupBy — no shuffle of the wide matrix). Output: per pair the
    original, log-propagated and quality-propagated sims."""
    from .functions.spark_sims import (
        dice_col,
        jaccard_col,
        lev_min_norm_col,
        shingles_col,
    )
    from .operators.feedback import propagate_feedback
    from pyspark.sql import Window

    names = _doc_names(spark, sf_dir)
    s = names.filter(F.col("doc_id") % 2 == 0).select(
        F.col("doc_id").alias("src_id"),
        F.col("name").alias("s_name"), "block_key",
    )
    d = names.filter(F.col("doc_id") % 2 == 1).select(
        F.col("doc_id").alias("dst_id"),
        F.col("name").alias("d_name"), "block_key",
    )
    grid = float(1 << 20)
    p = (
        s.join(d, "block_key")
        .withColumn("sim_lev", lev_min_norm_col(F.col("s_name"), F.col("d_name")))
        .withColumn(
            "sim_qgram",
            jaccard_col(shingles_col(F.col("s_name"), 3),
                        shingles_col(F.col("d_name"), 3)),
        )
        .withColumn(
            "sim_dice",
            dice_col(F.split(F.col("s_name"), " "), F.split(F.col("d_name"), " ")),
        )
        .withColumn(
            "sim",
            F.floor(
                (F.col("sim_lev") + F.col("sim_qgram") + F.col("sim_dice"))
                / 3.0 * grid
            ) / grid,
        )
        .filter(F.col("sim") > 0)
        .select("src_id", "dst_id", "sim_lev", "sim_qgram", "sim_dice", "sim")
        .localCheckpoint()  # train + 2 propagation passes fan out from it
    )
    key = F.concat_ws(
        "_", F.col("src_id").cast("string"), F.col("dst_id").cast("string")
    )
    train = (
        p.filter(_md5int_col(F.concat(F.lit("t_"), key)) % UFL_PROP_MOD == 0)
        .withColumn(
            "label", F.when(F.col("sim") > 0.7, 1.0).otherwise(0.0)
        )
        .withColumn(
            "train_idx",
            F.row_number().over(
                Window.partitionBy(F.lit(1)).orderBy("src_id", "dst_id")
            ),
        )
        .localCheckpoint()  # tiny; broadcast into both propagation passes
    )
    forb = train.select("src_id", "dst_id")
    ssv = ["sim_lev", "sim_qgram", "sim_dice"]
    # the nearest-validated argmin is method-independent: share ONE lazy
    # subtree across both passes. Deliberately NOT checkpointed: the
    # isolated materialization ran 6x slower than leaving both branches
    # inside the final fused job (145 s vs 25 s at sf0.1 — the struct-min
    # SortAggregate spills when forced to materialize alone, while the
    # lazy twin branches pipeline inside whole-stage codegen)
    from .operators.feedback import nearest_validated

    nn = nearest_validated(p, train, ssv)
    out = propagate_feedback(
        p, train, ssv, method="logdist", forbidden=forb,
        out_col="sim_logdist", nn=nn,
    )
    out = out.withColumn("mq", 2.0 * F.abs(F.col("sim") - 0.5))
    out = propagate_feedback(
        out, train, ssv, method="quality", ts_quality=0.25,
        mp_quality_col="mq", forbidden=forb, out_col="sim_quality", nn=nn,
    )
    f6 = lambda c: F.floor(F.col(c) * 1e6) / 1e6  # noqa: E731
    return out.select(
        F.col("src_id").alias("src_doc_id"),
        F.col("dst_id").alias("dst_doc_id"),
        f6("sim").alias("sim"),
        f6("sim_logdist").alias("sim_logdist"),
        f6("sim_quality").alias("sim_quality"),
    )


SQL_UFL_PROPAGATION = f"""
WITH names AS ({_SQL_DOC_NAMES}),
s AS (SELECT doc_id AS src_id, name AS s_name, block_key FROM names WHERE doc_id % 2 = 0),
d AS (SELECT doc_id AS dst_id, name AS d_name, block_key FROM names WHERE doc_id % 2 = 1),
sh AS (
  SELECT src_id, dst_id, s_name, d_name,
         CASE WHEN length(s_name) = 0 AND length(d_name) = 0 THEN 1.0
              WHEN least(length(s_name), length(d_name)) = 0 THEN 0.0
              ELSE 1.0 - least(levenshtein(s_name, d_name),
                               least(length(s_name), length(d_name)))::DOUBLE
                         / least(length(s_name), length(d_name))
         END AS sim_lev
  FROM s JOIN d USING (block_key)
),
gr AS (
  SELECT *,
    (CASE WHEN length(lower(s_name)) = 0 THEN []::VARCHAR[]
          WHEN length(lower(s_name)) < 3 THEN [lower(s_name)]
          ELSE list_transform(range(1, length(s_name) - 1), i -> substr(lower(s_name), i::INT, 3)) END) AS sg,
    (CASE WHEN length(lower(d_name)) = 0 THEN []::VARCHAR[]
          WHEN length(lower(d_name)) < 3 THEN [lower(d_name)]
          ELSE list_transform(range(1, length(d_name) - 1), i -> substr(lower(d_name), i::INT, 3)) END) AS dg,
    string_split(s_name, ' ') AS st, string_split(d_name, ' ') AS dt
  FROM sh
),
sims AS (
  SELECT src_id, dst_id, sim_lev,
    CASE WHEN len(list_distinct(list_concat(list_distinct(sg), list_distinct(dg)))) = 0 THEN 1.0
         ELSE len(list_intersect(list_distinct(sg), list_distinct(dg)))::DOUBLE
              / len(list_distinct(list_concat(list_distinct(sg), list_distinct(dg))))
    END AS sim_qgram,
    CASE WHEN len(list_distinct(st)) + len(list_distinct(dt)) = 0 THEN 1.0
         ELSE 2.0 * len(list_intersect(list_distinct(st), list_distinct(dt)))::DOUBLE
              / (len(list_distinct(st)) + len(list_distinct(dt)))
    END AS sim_dice
  FROM gr
),
m AS MATERIALIZED (
  SELECT src_id, dst_id, sim_lev, sim_qgram, sim_dice,
         floor((sim_lev + sim_qgram + sim_dice) / 3.0 * {_UFL_GRID}) / {_UFL_GRID} AS sim,
         floor(sim_lev * {_UFL_GRID}) / {_UFL_GRID} AS qa,
         floor(sim_qgram * {_UFL_GRID}) / {_UFL_GRID} AS qb,
         floor(sim_dice * {_UFL_GRID}) / {_UFL_GRID} AS qc
  FROM sims
  WHERE floor((sim_lev + sim_qgram + sim_dice) / 3.0 * {_UFL_GRID}) / {_UFL_GRID} > 0
),
train AS MATERIALIZED (
  SELECT qa AS ta, qb AS tb, qc AS tc,
         CASE WHEN sim > 0.7 THEN 1.0 ELSE 0.0 END AS label,
         row_number() OVER (ORDER BY src_id, dst_id) AS train_idx,
         src_id AS f_src, dst_id AS f_dst
  FROM m
  WHERE ('0x' || substr(md5('t_' || src_id::VARCHAR || '_' || dst_id::VARCHAR), 1, 8))::BIGINT % {UFL_PROP_MOD} = 0
),
nt AS (SELECT COUNT(*) AS n FROM train),
nn AS (
  SELECT src_id, dst_id, dist, label FROM (
    SELECT m.src_id, m.dst_id, t.label, t.train_idx,
           sqrt((qa - ta) * (qa - ta) + (qb - tb) * (qb - tb)
                + (qc - tc) * (qc - tc)) AS dist,
           row_number() OVER (PARTITION BY m.src_id, m.dst_id
                              ORDER BY sqrt((qa - ta) * (qa - ta)
                                            + (qb - tb) * (qb - tb)
                                            + (qc - tc) * (qc - tc)) ASC,
                                       t.train_idx ASC) AS rn
    FROM m CROSS JOIN train t
    WHERE qa <> 0 OR qb <> 0 OR qc <> 0
  ) WHERE rn = 1
),
el AS (
  SELECT nn.* FROM nn
  LEFT JOIN train f ON f.f_src = nn.src_id AND f.f_dst = nn.dst_id
  CROSS JOIN nt
  WHERE f.f_src IS NULL AND nn.dist <= (nt.n - 1) * 3.0 / 100
),
upd AS (
  SELECT m.src_id, m.dst_id, m.sim,
    CASE WHEN el.dist IS NOT NULL THEN
      GREATEST(0.0, LEAST(1.0,
        CASE WHEN el.label = 1.0
             THEN m.sim + floor(ln(2.0 - floor(el.dist * {_UFL_GRID}) / {_UFL_GRID}) / {LN2!r} * 1.2 * {_UFL_GRID}) / {_UFL_GRID}
             ELSE m.sim - floor(ln(2.0 - floor(el.dist * {_UFL_GRID}) / {_UFL_GRID}) / {LN2!r} * 1.2 * {_UFL_GRID}) / {_UFL_GRID}
        END))
      ELSE m.sim END AS sim_logdist,
    CASE WHEN elq.dist IS NOT NULL THEN
      GREATEST(0.0, LEAST(1.0,
        CASE WHEN elq.label = 1.0
             THEN m.sim + 0.25 * (1.0 - (2.0 * ABS(m.sim - 0.5)) / 2.0)
             ELSE m.sim - 0.25 * (1.0 - (2.0 * ABS(m.sim - 0.5)) / 2.0)
        END))
      ELSE m.sim END AS sim_quality
  FROM m
  LEFT JOIN el ON el.src_id = m.src_id AND el.dst_id = m.dst_id
  LEFT JOIN (
    SELECT nn.* FROM nn
    LEFT JOIN train f ON f.f_src = nn.src_id AND f.f_dst = nn.dst_id
    WHERE f.f_src IS NULL AND nn.dist <= 3 * 3.0 / 100
  ) elq ON elq.src_id = m.src_id AND elq.dst_id = m.dst_id
)
SELECT src_id AS src_doc_id, dst_id AS dst_doc_id,
       floor(sim * 1e6) / 1e6 AS sim,
       floor(sim_logdist * 1e6) / 1e6 AS sim_logdist,
       floor(sim_quality * 1e6) / 1e6 AS sim_quality
FROM upd
"""


def q_fs_extrapolation(spark, sf_dir):
    """ExtrapolatingFS (operators/feedback.extrapolate_fs;
    ExtrapolatingFS.java:50-121 + FamilialSimilarity.java:151-169): strong
    blocked pairs (lev >= 0.9) act as user validations; siblings = same-
    decade same-parity docs with intra-side lev similarity; sibling pairs
    whose familial sims agree within delta are extrapolated at 1.0
    (0.3/0.1 here are coverage-tuned for this corpus; the reference's
    threshold/0.01 defaults are pinned by unit tests)."""
    from .functions.spark_sims import lev_min_norm_col
    from .operators.feedback import extrapolate_fs

    validated = q_lev_blocked_pairs(spark, sf_dir).filter(
        F.col("lev_sim") >= 0.9
    ).select(
        F.col("src_doc_id").alias("src_id"),
        F.col("dst_doc_id").alias("dst_id"),
    )
    names = _doc_names(spark, sf_dir)
    dec = (F.floor(F.col("doc_id") / 10) * 10 + F.col("doc_id") % 2).cast(
        "long"
    )
    n = names.select("doc_id", "name", dec.alias("family"))

    def sibs(parity: int) -> DataFrame:
        a = n.filter(F.col("doc_id") % 2 == parity).select(
            F.col("doc_id").alias("entity_id"),
            F.col("name").alias("e_name"), "family",
        )
        b = n.filter(F.col("doc_id") % 2 == parity).select(
            F.col("doc_id").alias("sibling_id"),
            F.col("name").alias("s_name"), "family",
        )
        return (
            a.join(b, "family")
            .filter(F.col("entity_id") != F.col("sibling_id"))
            .select(
                "entity_id", "sibling_id",
                F.round(
                    lev_min_norm_col(F.col("e_name"), F.col("s_name")), 6
                ).alias("sim"),
            )
        )

    return extrapolate_fs(
        validated, sibs(0), sibs(1), threshold=0.3, delta=0.1
    ).select(
        F.col("src_id").alias("src_doc_id"),
        F.col("dst_id").alias("dst_doc_id"),
        F.col("sim").alias("sim"),
    )


SQL_FS_EXTRAPOLATION = f"""
WITH base0 AS ({SQL_LEV_PAIRS}),
validated AS (SELECT src_doc_id AS src_id, dst_doc_id AS dst_id
              FROM base0 WHERE lev_sim >= 0.9),
names AS ({_SQL_DOC_NAMES}),
fam AS (SELECT doc_id, name, (doc_id // 10) * 10 + doc_id % 2 AS family
        FROM names),
sib AS (
  SELECT a.doc_id AS entity_id, b.doc_id AS sibling_id, a.doc_id % 2 AS parity,
         ROUND(CASE WHEN length(a.name) = 0 AND length(b.name) = 0 THEN 1.0
              WHEN least(length(a.name), length(b.name)) = 0 THEN 0.0
              ELSE 1.0 - least(levenshtein(a.name, b.name),
                               least(length(a.name), length(b.name)))::DOUBLE
                         / least(length(a.name), length(b.name))
         END, 6) AS sim
  FROM fam a JOIN fam b ON a.family = b.family AND a.doc_id <> b.doc_id
),
e1 AS (
  SELECT v.src_id, v.dst_id, s.sibling_id AS s1, s.sim AS sim1
  FROM validated v JOIN sib s ON s.entity_id = v.src_id AND s.parity = 0
  WHERE s.sim >= 0.3
),
e2 AS (
  SELECT v.src_id, v.dst_id, s.sibling_id AS s2, s.sim AS sim2
  FROM validated v JOIN sib s ON s.entity_id = v.dst_id AND s.parity = 1
  WHERE s.sim >= 0.3
)
SELECT DISTINCT e1.s1 AS src_doc_id, e2.s2 AS dst_doc_id, 1.0 AS sim
FROM e1 JOIN e2 ON e1.src_id = e2.src_id AND e1.dst_id = e2.dst_id
WHERE ABS(e1.sim1 - e2.sim2) <= 0.1
"""


SG_DIM, SG_WINDOW, SG_NEG, SG_ROUNDS, SG_LR = 8, 2, 2, 2, 0.05
SG_GRID = float(1 << 20)


def q_skipgram_neg(spark, sf_dir):
    """NEG-sampling skip-gram parity trainer (operators/embeddings.
    skipgram_vocab/_neg_examples/_neg_train; SkipGramEmbeddingModel.scala
    :11-74 example construction + :50-74 objective/gradient,
    VocabBuilder.scala:150-165 unigram^0.75 negative table): 2 synchronous
    full-batch gradient-ascent rounds over the documents corpus on the
    2^-20 grid — weights bit-identical across engines and parallelism.
    Output: one row per vocab word with its trained 8-dim embedding."""
    from .operators.embeddings import (
        skipgram_neg_examples,
        skipgram_neg_train,
        skipgram_vocab,
    )

    docs = load(spark, sf_dir, "documents")
    vocab = skipgram_vocab(docs).localCheckpoint()
    ex = skipgram_neg_examples(docs, vocab, window=SG_WINDOW,
                               negative=SG_NEG)
    wts = skipgram_neg_train(ex, vocab, dim=SG_DIM, rounds=SG_ROUNDS,
                             lr=SG_LR)
    out = wts.join(vocab.select("word", "word_id"), "word_id")
    return out.select(
        "word_id", "word",
        *[
            (F.floor(F.element_at("embedding", d + 1) * 1e6) / 1e6)
            .alias(f"e{d}")
            for d in range(SG_DIM)
        ],
    )


def _sql_skipgram_neg() -> str:
    """DuckDB twin of q_skipgram_neg: vocab CDF, md5-indexed example
    construction, and SG_ROUNDS unrolled gradient rounds over explicit
    e0..e7 weight columns — every gradient term a product of 2^-20-grid
    values, so sums are exact in any order and the weights hash-match."""
    D, G, W, NEG, LR = SG_DIM, SG_GRID, SG_WINDOW, SG_NEG, SG_LR

    def fg(expr):
        return f"floor(({expr}) * {G}) / {G}"

    init_cols = ", ".join(
        fg(
            f"((('0x' || substr(md5('w|' || word_id::VARCHAR || '|' || {d}), 1, 8))::BIGINT % {1 << 20}) / {G} - 0.5) / {D}"
        ) + f" AS e{d}"
        for d in range(D)
    )
    sql = f"""
WITH toks AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS t FROM documents
),
counts AS (
  SELECT u AS word, COUNT(*) AS cnt
  FROM (SELECT unnest(t) AS u FROM toks) GROUP BY 1
),
v0 AS (
  SELECT word, cnt, row_number() OVER (ORDER BY word) - 1 AS word_id,
         {fg("pow(cnt, 0.75)")} AS p_raw
  FROM counts
),
v1 AS (SELECT *, {fg("p_raw / (SELECT SUM(p_raw) FROM v0)")} AS p FROM v0),
vocab AS (
  SELECT word, word_id, cnt,
         SUM(p) OVER (ORDER BY word_id ROWS UNBOUNDED PRECEDING) - p AS lo,
         CASE WHEN word_id = (SELECT MAX(word_id) FROM v1) THEN 1.000001
              ELSE SUM(p) OVER (ORDER BY word_id ROWS UNBOUNDED PRECEDING)
         END AS hi
  FROM v1
),
sen AS (
  SELECT toks.doc_id, CAST(i - 1 AS INT) AS pos, v.word_id AS wid
  FROM toks, unnest(range(1, len(t) + 1)) AS u(i)
  JOIN vocab v ON v.word = t[CAST(i AS INT)]
),
withb AS (
  SELECT *, CAST(('0x' || substr(md5('b|' || doc_id::VARCHAR || '|' || pos::VARCHAR), 1, 8))::BIGINT % {W} AS INT) AS b
  FROM sen
),
offs AS (
  SELECT CAST(o AS INT) AS off
  FROM unnest(range(-{W}, {W} + 1)) AS u(o) WHERE o <> 0
),
ks AS (SELECT CAST(k AS INT) AS k FROM unnest(range(0, {NEG})) AS u(k)),
ctx AS (
  SELECT w.doc_id, w.pos, o.off, w.wid, s2.wid AS cid
  FROM withb w
  JOIN offs o ON o.off BETWEEN w.b - {W} AND {W} - w.b
  JOIN sen s2 ON s2.doc_id = w.doc_id AND s2.pos = w.pos + o.off
),
pos_ex AS (SELECT wid AS word, cid AS ctx, 1.0 AS label FROM ctx),
neg_ex AS (
  SELECT c.wid AS word, v.word_id AS ctx, -1.0 AS label
  FROM (SELECT ctx.*, ks.k FROM ctx CROSS JOIN ks) c
  JOIN vocab v
    ON ((('0x' || substr(md5('n|' || c.doc_id::VARCHAR || '|' || c.pos::VARCHAR || '|' || c.off::VARCHAR || '|' || c.k::VARCHAR), 1, 8))::BIGINT % {1 << 20}) / {G}) >= v.lo
   AND ((('0x' || substr(md5('n|' || c.doc_id::VARCHAR || '|' || c.pos::VARCHAR || '|' || c.off::VARCHAR || '|' || c.k::VARCHAR), 1, 8))::BIGINT % {1 << 20}) / {G}) < v.hi
),
ex AS (SELECT * FROM pos_ex UNION ALL SELECT * FROM neg_ex),
w0 AS (SELECT word_id, {init_cols} FROM vocab)
"""
    prev = "w0"
    for r in range(SG_ROUNDS):
        score = " + ".join(f"a.e{d} * b.e{d}" for d in range(D))
        gsum_cols = ", ".join(
            f"SUM({fg(f'factor * other_e{d}')}) AS g{d}" for d in range(D)
        )
        upd_cols = ", ".join(
            f"CASE WHEN g.word_id IS NULL THEN w.e{d} ELSE "
            + fg(f"w.e{d} + ({LR} / (SELECT COUNT(*) FROM ex)) * g.g{d}")
            + f" END AS e{d}"
            for d in range(D)
        )
        w_other = ", ".join(f"b.e{d} AS other_e{d}" for d in range(D))
        c_other = ", ".join(f"a.e{d} AS other_e{d}" for d in range(D))
        sql += f""",
sc_{r} AS (
  SELECT ex.word, ex.ctx, ex.label,
         {fg(f"CASE WHEN ex.label = 1.0 THEN exp(-({score})) / (1.0 + exp(-({score}))) ELSE -1.0 / (1.0 + exp(-({score}))) END")} AS factor,
         {w_other}, {c_other.replace('other_e', 'self_e')}
  FROM ex
  JOIN {prev} a ON a.word_id = ex.word
  JOIN {prev} b ON b.word_id = ex.ctx
),
contrib_{r} AS (
  SELECT word AS word_id, factor, {', '.join(f'other_e{d}' for d in range(D))} FROM sc_{r}
  UNION ALL
  SELECT ctx AS word_id, factor, {', '.join(f'self_e{d} AS other_e{d}' for d in range(D))} FROM sc_{r}
),
grad_{r} AS (
  SELECT word_id, {gsum_cols} FROM contrib_{r} GROUP BY word_id
),
w{r + 1} AS (
  SELECT w.word_id, {upd_cols}
  FROM {prev} w LEFT JOIN grad_{r} g ON g.word_id = w.word_id
)"""
        prev = f"w{r + 1}"
    out_cols = ", ".join(
        f"floor(w.e{d} * 1e6) / 1e6 AS e{d}" for d in range(D)
    )
    sql += f"""
SELECT w.word_id, v.word, {out_cols}
FROM {prev} w JOIN vocab v ON v.word_id = w.word_id
"""
    return sql


SQL_SKIPGRAM_NEG = _sql_skipgram_neg()


# empty since the MSSG k-means oracle landed (2^-20-grid unrolled Lloyd
# rounds): every registered query has a DuckDB value-hash twin
ROWS_ONLY_QUERIES = {}


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------

# Registry order matters operationally: the driver's CORRECTNESS check
# records only the FIRST 50 entries. Round 5 reverses the round-4 rotation
# (VERDICT r04 "Next round #2"): the 19 queries whose last driver-green row
# is CORRECTNESS_r03 lead the dict, followed by any queries new this round,
# so every registered query has a green driver row in r4 or r5; the 50
# r4-verified entries close the list in their r4 order.
QUERIES = {
    "embedding_neardup": q_embedding_neardup,
    "streaming_sessionize": q_streaming_sessionize,
    "streaming_dedup": q_streaming_dedup,
    "disagreement_variance": q_disagreement_variance,
    "hierarchy_mappings": q_hierarchy_mappings,
    "alignment_delta": q_alignment_delta,
    "order_preservation": q_order_preservation,
    "iism_boosted_pairs": q_iism_boosted_pairs,
    "iism_subprop_union": q_iism_subprop_union,
    "ufl_propagation": q_ufl_propagation,
    "fs_extrapolation": q_fs_extrapolation,
    "skipgram_neg": q_skipgram_neg,
    "joslyn_distance_quality": q_joslyn_distance_quality,
    "pricing_summary": q_pricing_summary,
    "top_revenue_orders": q_top_revenue_orders,
    "topk_orders_per_customer": q_topk_orders_per_customer,
    "region_rollup": q_region_rollup,
    "events_sessionize": q_events_sessionize,
    "events_hourly": q_events_hourly,
    # --- new in round 5 (never driver-verified before) ---
    "concept_match": q_concept_match,
    "pra_block_pairs": q_pra_block_pairs,
    # --- r4-verified (CORRECTNESS_r04 green), r4 order ---
    "asm_content_words": q_asm_content_words,
    "one_to_one_full": q_one_to_one_full,
    "similarity_flooding_docs": q_similarity_flooding_docs,
    "minhash_cc_clusters": q_minhash_cc_clusters,
    "mssg_context_vectors": q_mssg_context_vectors,
    "mssg_senses": q_mssg_senses,
    "ufl_quality": q_ufl_quality,
    "structural_boost": q_structural_boost,
    "lexicon_match": q_lexicon_match,
    "best_match_boost": q_best_match_boost,
    "instance_linking": q_instance_linking,
    "bsm_cascade": q_bsm_cascade,
    "contamination_check": q_contamination_check,
    "pii_scrub": q_pii_scrub,
    "repetition_profile": q_repetition_profile,
    "stratified_mix": q_stratified_mix,
    "streaming_decontam": q_streaming_decontam,
    "doc_chunks": q_doc_chunks,
    "doc_packing": q_doc_packing,
    "lev_blocked_pairs": q_lev_blocked_pairs,
    "qgram_jaccard_pairs": q_qgram_jaccard_pairs,
    "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
    "mutual_best_selection": q_mutual_best_selection,
    "dedup_exact": q_dedup_exact,
    "minhash_lsh_pairs": q_minhash_lsh_pairs,
    "embedding_topk": q_embedding_topk,
    "doc_stats": q_doc_stats,
    "doc_quality": q_doc_quality,
    "asm_sorted_token_match": q_asm_sorted_token_match,
    "jaro_winkler_pairs": q_jaro_winkler_pairs,
    "lwc_combine": q_lwc_combine,
    "completion_anti_join": q_completion_anti_join,
    "local_confidence": q_local_confidence,
    "pr_evaluation": q_pr_evaluation,
    "mediating_join": q_mediating_join,
    "simhash_dedup": q_simhash_dedup,
    "ann_lsh_buckets": q_ann_lsh_buckets,
    "ann_lsh_topk": q_ann_lsh_topk,
    "ann_ivf_topk": q_ann_ivf_topk,
    "lwc_sigmoid": q_lwc_sigmoid,
    "matrix_gram": q_matrix_gram,
    "events_pivot": q_events_pivot,
    "connected_components": q_connected_components,
    "events_asof_error": q_events_asof_error,
    "sigmoid_rescale": q_sigmoid_rescale,
    "salted_exact_join": q_salted_exact_join,
    "lang_id_guess": q_lang_id,
    "token_profile": q_token_profile,
    "events_quantiles": q_events_quantiles,
    "ngram_jaccard_dedup": q_ngram_jaccard_dedup,
    **ROWS_ONLY_QUERIES,
}

ORACLE_SQL = {
    "concept_match": SQL_CONCEPT_MATCH,
    "pra_block_pairs": SQL_PRA,
    "asm_content_words": SQL_ASM_CONTENT,
    "pricing_summary": SQL_PRICING,
    "top_revenue_orders": SQL_TOP_REVENUE,
    "topk_orders_per_customer": SQL_TOPK_ORDERS,
    "region_rollup": SQL_ROLLUP,
    "events_sessionize": SQL_SESSIONIZE,
    "events_hourly": SQL_EVENTS_HOURLY,
    "lev_blocked_pairs": SQL_LEV_PAIRS,
    "qgram_jaccard_pairs": SQL_QGRAM,
    "tfidf_cosine_pairs": SQL_TFIDF,
    "mutual_best_selection": SQL_MUTUAL_BEST,
    "dedup_exact": SQL_DEDUP_EXACT,
    "minhash_lsh_pairs": SQL_MINHASH,
    "embedding_topk": SQL_EMBED_TOPK,
    "doc_stats": SQL_DOC_STATS,
    "doc_quality": SQL_DOC_QUALITY,
    "asm_sorted_token_match": SQL_ASM,
    "jaro_winkler_pairs": SQL_JW,
    "lwc_combine": SQL_LWC,
    "completion_anti_join": SQL_COMPLETION,
    "local_confidence": SQL_LOCAL_CONF,
    "pr_evaluation": SQL_PR_EVAL,
    "mediating_join": SQL_MEDIATING,
    "simhash_dedup": SQL_SIMHASH,
    "ann_lsh_buckets": SQL_ANN_LSH,
    "ann_lsh_topk": SQL_ANN_LSH_TOPK,
    "ann_ivf_topk": SQL_ANN_IVF_TOPK,
    "lwc_sigmoid": SQL_LWC_SIGMOID,
    "matrix_gram": SQL_MATRIX_GRAM,
    "events_pivot": SQL_EVENTS_PIVOT,
    "connected_components": SQL_CC,
    "events_asof_error": SQL_ASOF,
    "sigmoid_rescale": SQL_SIGMOID,
    "salted_exact_join": SQL_SALTED,
    "lang_id_guess": SQL_LANG_ID,
    "token_profile": SQL_TOKEN_PROFILE,
    "events_quantiles": SQL_EVENTS_QUANTILES,
    "ngram_jaccard_dedup": SQL_NGRAM_DEDUP,
    "embedding_neardup": SQL_EMBED_NEARDUP,
    "streaming_sessionize": SQL_SESSIONIZE,
    "streaming_dedup": SQL_STREAM_DEDUP,
    "disagreement_variance": SQL_DISAGREEMENT,
    "hierarchy_mappings": SQL_HIERARCHY,
    "alignment_delta": SQL_ALIGN_DELTA,
    "order_preservation": SQL_ORDER_PRESERVATION,
    "iism_boosted_pairs": SQL_IISM,
    "iism_subprop_union": SQL_IISM_SUBPROP_UNION,
    "ufl_propagation": SQL_UFL_PROPAGATION,
    "fs_extrapolation": SQL_FS_EXTRAPOLATION,
    "skipgram_neg": SQL_SKIPGRAM_NEG,
    "joslyn_distance_quality": SQL_JOSLYN,
    "one_to_one_full": SQL_ONE_TO_ONE,
    "similarity_flooding_docs": SQL_SF_DOCS,
    "minhash_cc_clusters": SQL_MINHASH_CC,
    "mssg_context_vectors": SQL_MSSG_CTX,
    "mssg_senses": SQL_MSSG_SENSES,
    "ufl_quality": SQL_UFL_QUALITY,
    "structural_boost": SQL_STRUCTURAL_BOOST,
    "lexicon_match": SQL_LEXICON_MATCH,
    "best_match_boost": SQL_BEST_MATCH_BOOST,
    "instance_linking": SQL_INSTANCE_LINKING,
    "bsm_cascade": SQL_BSM_CASCADE,
    "contamination_check": SQL_CONTAMINATION,
    "pii_scrub": SQL_PII_SCRUB,
    "repetition_profile": SQL_REPETITION,
    "stratified_mix": SQL_STRATIFIED_MIX,
    "streaming_decontam": SQL_STREAM_DECONTAM,
    "doc_chunks": SQL_DOC_CHUNKS,
    "doc_packing": SQL_DOC_PACKING,
}
