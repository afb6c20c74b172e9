"""Corpus-curation queries over `documents`: deterministic curriculum
sampling, per-source capping, dictionary term masking, and TF-IDF salient
terms. These are the "choose and clean the training mix" operators that sit
downstream of the mixture-weight / quality / dedup signals (q103, q33, q34):
given per-source statistics, actually *materialize* the sampled corpus — and
do it reproducibly, so a re-run on a 1000-executor cluster selects the same
documents.

Relation to earlier queries: q117 samples at *fixed, literal* per-stratum
rates (the audit-table shape); q127 *derives* its rates from corpus
statistics (the temperature-mixture recipe q103 only weights) and q128
enforces an *exact* per-group cap — the three reproducible-sampling shapes
a mix-building pipeline actually chains.

Determinism strategy (shared with plans/dedup.py's SimHash): every random
choice is a pure function of the row key via the md5-60bit engine-portable
uniform — `conv(substring(md5(key),1,15),16,10)` on Spark,
`('0x' || substring(md5(key),1,15))::BIGINT` in DuckDB — so the oracle, a
re-run, and every executor agree bit-for-bit. No rand(), no seed state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import text as X
from .registry import register

# DuckDB mirrors of functions.text.normalize / tokens (same as textops.py)
_SQL_NORM = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
_SQL_TOKS = f"string_split({_SQL_NORM}, ' ')"

_TWO_60 = float(1 << 60)


def _u60(col: Column) -> Column:
    """Engine-portable uniform in [0, 1): first 60 bits of md5(key) scaled
    by 2^-60. Both engines cast the same BIGINT to double (correctly
    rounded, identical) and divide by an exact power of two."""
    h = F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast("bigint")
    return h.cast("double") / F.lit(_TWO_60)


def _sql_u60(expr: str) -> str:
    return (
        f"CAST(('0x' || substring(md5(CAST({expr} AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" / {_TWO_60!r}"
    )


# ---------------------------------------------------------------------------
# q127 — curriculum sampling: materialize the temperature-scaled mixture
# that q103 only *weights*. Per-source acceptance probability
# p = least(1, 1/2 · sqrt(max_tokens / n_tokens)) — the sqrt-temperature
# upsampling recipe (small sources keep a larger fraction), capped at
# keep-everything. A document survives iff its md5-uniform < p(source), so
# the sample is a pure function of (doc_id, corpus stats): re-runs and the
# oracle select the identical subset.
#
# Scale: one partial-aggregated groupBy for source stats (~dozens of rows),
# broadcast back onto the fact scan, one final groupBy. The per-doc filter
# is a codegen'd hash + compare — no rand(), no sort, no sampling skew.
# ---------------------------------------------------------------------------

_Q127_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, CAST(len({_SQL_TOKS}) AS BIGINT) AS n_toks
  FROM documents
), s AS (
  SELECT source, CAST(SUM(n_toks) AS BIGINT) AS src_tokens FROM d GROUP BY source
), p AS (
  SELECT source, src_tokens,
         least(1.0, 0.5 * sqrt(CAST(MAX(src_tokens) OVER () AS DOUBLE)
                               / CAST(src_tokens AS DOUBLE))) AS p_accept
  FROM s
)
SELECT d.source,
       CAST(COUNT(*) AS BIGINT) AS n_kept,
       CAST(SUM(d.n_toks) AS BIGINT) AS kept_tokens,
       ANY_VALUE(p.p_accept) AS p_accept
FROM d JOIN p ON d.source = p.source
WHERE {_sql_u60("d.doc_id")} < p.p_accept
GROUP BY d.source
ORDER BY d.source
"""


@register("q127_curriculum_sample", oracle=_Q127_ORACLE)
def q127_curriculum_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id", "source", X.token_count(F.col("text")).cast("bigint").alias("n_toks")
    )
    s = d.groupBy("source").agg(F.sum("n_toks").cast("bigint").alias("src_tokens"))
    w = Window.partitionBy()
    p = s.select(
        "source",
        F.least(
            F.lit(1.0),
            F.lit(0.5)
            * F.sqrt(
                F.max("src_tokens").over(w).cast("double")
                / F.col("src_tokens").cast("double")
            ),
        ).alias("p_accept"),
    )
    kept = d.join(F.broadcast(p), "source").filter(_u60(F.col("doc_id")) < F.col("p_accept"))
    return (
        kept.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_toks").cast("bigint").alias("kept_tokens"),
            F.any_value(F.col("p_accept")).alias("p_accept"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q128 — per-source cap: keep at most K documents per source, chosen by
# hash order (row_number over md5-uniform) — a deterministic distributed
# reservoir. The standard "no source may dominate the mix" guard; unlike
# df.sampleBy it needs no fraction tuning and is exactly reproducible.
#
# Scale: one shuffle on source for the ranking window; no global sort
# before the cap. With a skewed giant source the window sort is
# O(n log n) per partition — still the minimal work for an exact cap; the
# approximate alternative (threshold on the uniform) is q127's shape.
# ---------------------------------------------------------------------------

_CAP_K = 10

_Q128_ORACLE = f"""
SELECT source, doc_id, rk
FROM (
  SELECT source, doc_id,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY {_sql_u60("doc_id")}, doc_id) AS rk
  FROM documents
) t
WHERE rk <= {_CAP_K}
ORDER BY source, rk
"""


@register("q128_per_source_cap", oracle=_Q128_ORACLE)
def q128_per_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(_u60(F.col("doc_id")), F.col("doc_id"))
    return (
        docs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _CAP_K)
        .select("source", "doc_id", "rk")
        .orderBy("source", "rk")
    )


# ---------------------------------------------------------------------------
# q129 — token-exact term masking with a rewrite certificate. q80 already
# audits regex-denylist redaction per source (counts only); q129 is the
# complementary check a scrub pipeline needs before shipping the rewritten
# corpus: it masks at token granularity (no substring false-positives:
# 'customers' survives a 'customer' denylist) and emits the md5 of each
# masked document, so the oracle certifies the *output text itself*, not
# just the hit counts. (The regex-PII variant — emails, long digit runs —
# is functions/text.redact_pii, pytest-covered on planted fixtures since
# this synthetic corpus contains neither.)
#
# Scale: pure per-row Column expressions (transform + array_to_string +
# md5) — narrow map in whole-stage codegen, zero shuffle before the
# doc_id output sort.
# ---------------------------------------------------------------------------

_MASK_TERMS = ("customer", "supplier")
_MASK = "<masked>"

_SQL_MASK_LIST = "[" + ", ".join(f"'{t}'" for t in _MASK_TERMS) + "]"

_Q129_ORACLE = f"""
WITH m AS (
  SELECT doc_id,
         CAST(len(list_filter({_SQL_TOKS}, t -> list_contains({_SQL_MASK_LIST}, t)))
              AS BIGINT) AS n_masked,
         array_to_string(list_transform({_SQL_TOKS},
             t -> CASE WHEN list_contains({_SQL_MASK_LIST}, t)
                       THEN '{_MASK}' ELSE t END), ' ') AS masked
  FROM documents
)
SELECT doc_id, n_masked, md5(masked) AS masked_fp
FROM m
WHERE n_masked > 0
ORDER BY doc_id
"""


@register("q129_term_mask", oracle=_Q129_ORACLE)
def q129_term_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = X.tokens(F.col("text"))
    deny = F.array(*[F.lit(t) for t in _MASK_TERMS])
    masked = F.array_join(
        F.transform(
            toks,
            lambda t: F.when(F.array_contains(deny, t), F.lit(_MASK)).otherwise(t),
        ),
        " ",
    )
    n_masked = F.size(F.filter(toks, lambda t: F.array_contains(deny, t))).cast("bigint")
    return (
        docs.select(
            "doc_id", n_masked.alias("n_masked"), F.md5(masked).alias("masked_fp")
        )
        .filter(F.col("n_masked") > 0)
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q130 — TF-IDF salient terms per source: rank each source's terms by
# tf(source, term) / df(term), df = number of documents containing the
# term. The grouped complement of q67 (corpus-global top terms): q67
# answers "what characterizes this corpus", q130 "what distinguishes each
# source" — the mixture-debugging view. A log-free ratio keeps every
# value column a bigint or a
# single correctly-rounded IEEE division (cross-engine bit-exact — libm
# log differs between engines; see NOTES.md parity rules), and ordering by
# tf/df is order-equivalent to ordering by tf·idf for fixed N.
#
# Scale: explode once, two partial-aggregated groupBys (term-level df is
# vocab-sized), broadcast the df table into the score join, per-source
# top-k via ranking window — no global sort, no re-tokenization.
# ---------------------------------------------------------------------------

_TFIDF_K = 5

_Q130_ORACLE = f"""
WITH tok AS (
  SELECT doc_id, source, unnest({_SQL_TOKS}) AS t FROM documents
), tf AS (
  SELECT source, t, CAST(COUNT(*) AS BIGINT) AS tf
  FROM tok GROUP BY source, t
), df AS (
  SELECT t, CAST(COUNT(*) AS BIGINT) AS df
  FROM (SELECT DISTINCT doc_id, t FROM tok) GROUP BY t
)
SELECT source, t AS term, tf, df, score, rk
FROM (
  SELECT tf.source, tf.t, tf.tf, df.df,
         CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) AS score,
         ROW_NUMBER() OVER (PARTITION BY tf.source
                            ORDER BY CAST(tf.tf AS DOUBLE) / CAST(df.df AS DOUBLE) DESC,
                                     tf.t) AS rk
  FROM tf JOIN df ON tf.t = df.t
) r
WHERE rk <= {_TFIDF_K}
ORDER BY source, rk
"""


@register("q130_tfidf_terms", oracle=_Q130_ORACLE)
def q130_tfidf_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    tok = (
        docs.select("doc_id", "source", F.explode_outer(X.tokens(F.col("text"))).alias("t"))
        .filter(F.col("t").isNotNull())
    )
    tf = tok.groupBy("source", "t").agg(F.count(F.lit(1)).alias("tf"))
    df_tab = (
        tok.select("doc_id", "t")
        .distinct()
        .groupBy("t")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    score = F.col("tf").cast("double") / F.col("df").cast("double")
    w = Window.partitionBy("source").orderBy(score.desc(), F.col("t"))
    return (
        tf.join(F.broadcast(df_tab), "t")
        .withColumn("score", score)
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= _TFIDF_K)
        .select("source", F.col("t").alias("term"), "tf", "df", "score", "rk")
        .orderBy("source", "rk")
    )
