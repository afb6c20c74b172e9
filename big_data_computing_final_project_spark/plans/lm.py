"""N-gram language-model scoring over `documents` (north-star extension:
the LM-based quality-filtering stage of a pretraining data pipeline —
CCNet-style "score every document against a reference LM, filter the
tail").

Shape: TRAIN bigram/unigram count tables on the deterministic md5-bucket
train split (the q75 split, so both engines agree on membership), then
score the held-out documents with Katz-style backoff — a seen bigram
scores by its inverse train frequency, an unseen bigram pays a fixed
penalty plus the unigram-backoff rarity of its continuation token. All
scores are INTEGER arithmetic (integer division of constant numerators,
like q121's rarity), so a 1000-executor run hash-matches the serial
oracle — no logs, no float sums.

Scale shape: one explode + two hash-joins against the count tables
(bigram table joined on the bigram key, unigram table broadcast-or-
shuffled on the token), partial-aggregated per doc then per source.
Count tables are the classic mergeable LM state: at 100 TB they shard by
n-gram key and the score join stays a plain equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import text as X
from .registry import register
from .textops import _SQL_TOKS

_TRAIN_PCT = 80  # md5 bucket < 80 trains the LM; the rest is scored
_S = 1_000_000  # integer score scale
_PEN = 1_000_000  # unseen-bigram penalty

_Q126_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, {_SQL_TOKS} AS t,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100
           < {_TRAIN_PCT} AS is_train
  FROM documents
), uni AS (
  SELECT u.t AS w, COUNT(*) AS cu
  FROM (SELECT unnest(t) AS t FROM d WHERE is_train) u
  GROUP BY w
), bi AS (
  SELECT bg, COUNT(*) AS c12 FROM (
    SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i+1])) AS bg
    FROM d WHERE is_train
  ) GROUP BY bg
), score_grams AS (
  SELECT doc_id, source, g.bg, g.w2 FROM (
    SELECT doc_id, source,
           list_transform(range(1, len(t)),
                          i -> struct_pack(bg := t[i] || ' ' || t[i+1], w2 := t[i+1])) AS gs
    FROM d WHERE NOT is_train AND len(t) >= 2
  ), LATERAL (SELECT unnest(gs, recursive := true)) g(bg, w2)
), scored AS (
  SELECT doc_id, source,
         CASE WHEN bi.c12 IS NOT NULL THEN {_S} // bi.c12
              ELSE {_PEN} + {_S} // (COALESCE(uni.cu, 0) + 1) END AS s,
         CASE WHEN bi.c12 IS NULL THEN 1 ELSE 0 END AS backoff
  FROM score_grams
  LEFT JOIN bi ON score_grams.bg = bi.bg
  LEFT JOIN uni ON score_grams.w2 = uni.w
)
SELECT source,
       COUNT(DISTINCT doc_id) AS n_docs,
       CAST(SUM(s) AS BIGINT) AS total_score,
       CAST(SUM(backoff) AS BIGINT) AS n_backoff
FROM scored
GROUP BY source
ORDER BY source
"""


@register("q126_bigram_lm_score", oracle=_Q126_ORACLE)
def q126_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("bigint") % 100
    d = docs.select(
        "doc_id",
        "source",
        X.tokens(F.col("text")).alias("t"),
        (bucket < _TRAIN_PCT).alias("is_train"),
    )

    # bigrams as (bg, w2) structs: zip each token with its successor —
    # staged on the projected token array so the tokenizer runs once
    grams = F.zip_with(
        F.slice(F.col("t"), 1, F.greatest(F.size("t") - 1, F.lit(0))),
        F.slice(F.col("t"), 2, F.greatest(F.size("t") - 1, F.lit(0))),
        lambda a, b: F.struct(F.concat(a, F.lit(" "), b).alias("bg"), b.alias("w2")),
    )

    train = d.filter(F.col("is_train"))
    uni = (
        train.select(F.explode_outer("t").alias("w"))
        .filter(F.col("w").isNotNull())
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("cu"))
    )
    bi = (
        train.select(F.explode_outer(grams).alias("g"))
        .filter(F.col("g").isNotNull())
        .select(F.col("g.bg").alias("bg"))
        .groupBy("bg")
        .agg(F.count(F.lit(1)).alias("c12"))
    )

    score_grams = (
        d.filter(~F.col("is_train") & (F.size("t") >= 2))
        .select("doc_id", "source", F.explode_outer(grams).alias("g"))
        .filter(F.col("g").isNotNull())
        .select("doc_id", "source", F.col("g.bg").alias("bg"), F.col("g.w2").alias("w2"))
    )
    seen = F.col("c12").isNotNull()
    s = F.when(seen, F.expr(f"{_S} div c12")).otherwise(
        F.lit(_PEN) + F.expr(f"{_S} div (coalesce(cu, 0) + 1)")
    )
    scored = (
        score_grams.join(bi, "bg", "left")
        .join(uni, score_grams.w2 == uni.w, "left")
        .select(
            "doc_id",
            "source",
            s.alias("s"),
            F.when(seen, F.lit(0)).otherwise(F.lit(1)).alias("backoff"),
        )
    )
    return (
        scored.groupBy("source")
        .agg(
            F.count_distinct("doc_id").alias("n_docs"),
            F.sum("s").alias("total_score"),
            F.sum("backoff").alias("n_backoff"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q202 — bigram collocation mining (Church & Hanks' association-ratio
# family): rank adjacent word pairs by LIFT = p(w1 w2) / (p(w1)*p(w2)),
# the log-free PMI monotone — multi-word expressions ("new york") score
# high, chance co-occurrences near 1. The engine's hash discipline forbids
# transcendental log in oracle-gated values (the q190 note), so the
# emitted statistic is the exact-count ratio itself:
#     lift = (c12 / Nb) / ((c1/Nu) * (c2/Nu)) = (c12 * Nu * Nu) / (Nb * c1 * c2)
# computed as ONE double expression over exact int64 counts — identical
# IEEE operations in both engines, so hash parity holds without rounding.
#
# Scale shape: two hash aggregates (unigrams, bigrams) + two equi-joins of
# the bigram table against the unigram table on the word keys — the
# unigram side is vocabulary-sized (broadcastable at any corpus scale);
# totals ride in as 1-row broadcast aggregates; top-k compiles to
# TakeOrderedAndProject.
# ---------------------------------------------------------------------------

_COLL_MIN_COUNT = 5
_COLL_TOP = 50

_Q202_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_SQL_TOKS} AS t FROM documents
), uni AS (
  SELECT u.t AS w, COUNT(*) AS c
  FROM (SELECT unnest(t) AS t FROM d) u
  GROUP BY w
), bi AS (
  SELECT g.w1, g.w2, COUNT(*) AS c12 FROM (
    SELECT list_transform(range(1, len(t)),
                          i -> struct_pack(w1 := t[i], w2 := t[i+1])) AS gs
    FROM d WHERE len(t) >= 2
  ), LATERAL (SELECT unnest(gs, recursive := true)) g(w1, w2)
  GROUP BY g.w1, g.w2
), tot AS (
  SELECT (SELECT SUM(c) FROM uni) AS nu, (SELECT SUM(c12) FROM bi) AS nb
)
SELECT w1, w2, c12,
       (CAST(c12 AS DOUBLE) * nu * nu) / (CAST(nb AS DOUBLE) * u1.c * u2.c)
         AS lift
FROM bi, tot
JOIN uni u1 ON u1.w = w1
JOIN uni u2 ON u2.w = w2
WHERE c12 >= {_COLL_MIN_COUNT}
ORDER BY lift DESC, w1, w2
LIMIT {_COLL_TOP}
"""


@register("q202_bigram_collocations", oracle=_Q202_ORACLE)
def q202_bigram_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select("doc_id", X.tokens(F.col("text")).alias("t")).localCheckpoint(
        eager=True  # feeds the unigram AND bigram aggregates
    )
    uni = (
        toks.select(F.explode_outer("t").alias("w"))
        .where(F.col("w").isNotNull())
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    grams = F.transform(
        F.sequence(F.lit(1), F.size("t") - 1),
        lambda i: F.struct(
            F.element_at(F.col("t"), i).alias("w1"),
            F.element_at(F.col("t"), i + 1).alias("w2"),
        ),
    )
    bi = (
        toks.where(F.size("t") >= 2)
        .select(F.explode_outer(grams).alias("g"))
        .where(F.col("g").isNotNull())
        .select(F.col("g.w1").alias("w1"), F.col("g.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("c12"))
        .where(F.col("c12") >= _COLL_MIN_COUNT)
    )
    nu = uni.agg(F.sum("c").alias("nu"))
    # nb must count ALL bigrams (the where above prunes the JOIN side only)
    nb = (
        toks.where(F.size("t") >= 2)
        .agg(F.sum(F.size("t") - 1).alias("nb"))
    )
    u1 = uni.select(F.col("w").alias("w1"), F.col("c").alias("c1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("c").alias("c2"))
    lift = (F.col("c12").cast("double") * F.col("nu") * F.col("nu")) / (
        F.col("nb").cast("double") * F.col("c1") * F.col("c2")
    )
    return (
        bi.join(u1, "w1")
        .join(u2, "w2")
        .crossJoin(F.broadcast(nu))
        .crossJoin(F.broadcast(nb))
        .select("w1", "w2", "c12", lift.alias("lift"))
        .orderBy(F.col("lift").desc(), "w1", "w2")
        .limit(_COLL_TOP)
    )
