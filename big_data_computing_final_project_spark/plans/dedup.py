"""Deduplication queries over `documents` (north-star extension):
exact (fingerprint hash-groupBy), n-gram Jaccard near-dup (exact),
MinHash-LSH near-dup (the scale path), SimHash signatures.

Scale design:
- exact dedup is a hash aggregate on md5(normalized text) — one shuffle on
  the fingerprint, no driver involvement;
- the EXACT pairwise Jaccard (q35) explodes shingles and self-joins on the
  shingle — O(Σ postings²) worst case; it is the *oracle* for near-dup and
  stays viable because the shingle join only pairs docs sharing a shingle;
- MinHash-LSH (q36) is the 100 TB path: fixed-width signatures (64 hashes),
  banded bucketing (16 bands × 4 rows), candidate pairs only within equal
  band buckets, then exact-Jaccard verification of the (tiny) candidate set.
  With the banding parameters chosen for recall ≈ 1 at the 0.8 threshold the
  result equals the exact query, so it shares the same DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load_table
from ..functions import text as X
from ..operators.sizing import broadcast_if_small
from .registry import register

from .textops import _SQL_NORM, _SQL_TOKS

# Python twin of functions.text.normalize's collapse class
# ([ \\t\\n\\x0B\\f\\r\\p{Z}]+): Python re has no \\p{Z}, so the Zs/Zl/Zp
# set is spelled out. Python's bare \\s would wrongly include NEL and
# \\x1c-\\x1f and diverge from the Java/RE2 class (code-review finding).
_WS_CLASS = (
    "[ \\t\\n\\x0b\\f\\r"
    "\\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f\\u205f\\u3000]+"
)

# ---------------------------------------------------------------------------
# q34 — exact dedup via fingerprint group (SURVEY §7 step 6 `dropDuplicates`
# generalized: keep min doc_id per fingerprint, count copies).
# ---------------------------------------------------------------------------

_Q34_ORACLE = f"""
SELECT md5({_SQL_NORM}) AS fp, MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
FROM documents
GROUP BY fp
ORDER BY keeper_doc_id
"""


@register("q34_exact_dedup", oracle=_Q34_ORACLE)
def q34_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return (
        docs.groupBy(X.fingerprint(F.col("text")).alias("fp"))
        .agg(F.min("doc_id").alias("keeper_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .orderBy("keeper_doc_id")
    )


# ---------------------------------------------------------------------------
# q35 — exact n-gram (3-shingle) Jaccard near-duplicate pairs, jac >= 0.8.
# ---------------------------------------------------------------------------

_JACCARD_T = 0.8

_SQL_SHINGLES = (
    "list_distinct(list_transform(range(greatest(len(toks)-2, 1)), "
    "i -> array_to_string(toks[i+1:i+3], ' ')))"
)

_Q35_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_SQL_SHINGLES} AS sh
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
), ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b,
       CAST(common AS DOUBLE) / (la.n + lb.n - common) AS jac
FROM pairs
JOIN (SELECT doc_id, len(sh) AS n FROM docs) la ON la.doc_id = doc_a
JOIN (SELECT doc_id, len(sh) AS n FROM docs) lb ON lb.doc_id = doc_b
WHERE CAST(common AS DOUBLE) / (la.n + lb.n - common) >= {_JACCARD_T}
ORDER BY doc_a, doc_b
"""


def _shingled(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return docs.select("doc_id", X.shingles(F.col("text"), 3).alias("sh"))


def _exact_jaccard_pairs(
    sh: DataFrame, threshold: float = _JACCARD_T, sort: bool = True
) -> DataFrame:
    """(doc_a, doc_b, jac) for ALL pairs sharing >=1 shingle, jac >=
    ``threshold`` — the exact (oracle) path: explode + shingle self-join.
    ``sort=False`` skips the trailing global pair sort for consumers that
    immediately re-aggregate (q159's sweep) — at the sweep's 0.50 floor
    the pair set is the largest of any caller and the sort exchange would
    be pure wasted work."""
    sizes = sh.select(F.col("doc_id"), F.size("sh").alias("n"))
    # explode_outer, deliberately: plain explode triggers
    # InferFiltersFromGenerate, which injects a `size(sh) > 0` pre-filter
    # with the WHOLE shingle expression re-inlined below the staging
    # projection — re-running the tokenizer per transform element (~10x on
    # this stage). Shingle arrays are never empty (sequence yields >= 1
    # index), so outer-explode is row-identical here.
    ex = sh.select(F.col("doc_id"), F.explode_outer("sh").alias("s"))
    a = ex.select(F.col("doc_id").alias("doc_a"), F.col("s"))
    b = ex.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s2"))
    pairs = (
        a.join(b, (F.col("s") == F.col("s2")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    la = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    lb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    jac = F.col("common").cast("double") / (F.col("na") + F.col("nb") - F.col("common"))
    out = (
        pairs.join(broadcast_if_small(la), "doc_a")
        .join(broadcast_if_small(lb), "doc_b")
        .select("doc_a", "doc_b", jac.alias("jac"))
        .filter(F.col("jac") >= threshold)
    )
    return out.orderBy("doc_a", "doc_b") if sort else out


def _verify_candidate_pairs(
    sh: DataFrame, candidates: DataFrame, threshold: float = _JACCARD_T
) -> DataFrame:
    """Exact-Jaccard verification restricted to candidate pairs: join each
    pair to its two shingle ARRAYS and intersect per pair. Cost is
    O(|candidates| · shingles-per-doc) — independent of the corpus-wide
    shingle collision structure, which is the whole point of LSH. (The
    explode/self-join of _exact_jaccard_pairs over ALL co-shingled pairs
    would throw the LSH pruning away.)"""
    sh_a = sh.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - common
    jac = common.cast("double") / union
    return (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select("doc_a", "doc_b", jac.alias("jac"))
        .filter(F.col("jac") >= threshold)
        .orderBy("doc_a", "doc_b")
    )


_SKETCH_K = 64


def _sketch_screened_verify(
    sh: DataFrame, candidates: DataFrame, threshold: float = _JACCARD_T
) -> DataFrame:
    """Two-level exact verification (VERDICT r8 item 5): a DETERMINISTIC,
    LOSSLESS bottom-k sketch screen discards clearly-below-threshold
    candidate pairs before the full-array join, then the standard exact
    verify rescores survivors. Output is IDENTICAL to
    _verify_candidate_pairs(sh, candidates) — pytest pins equality.

    STATUS (round-9): MEASURED NEGATIVE RESULT — kept unregistered, as the
    documented twin (the blocked-GEMM precedent). On the bounded tiers the
    screen made q122 ~40-60% SLOWER at every tier (t100 ~123 s-equivalent
    -> 176 s, same-session q36 as the box-speed control): the extra
    screen pass re-shuffles every candidate with two 64-BIGINT sketches
    and evaluates ~200 interpreted higher-order-lambda elements per pair,
    which costs more than the full-array verify bytes it saves. The
    zero-byte PPJoin positional filter inside _prefix_candidates is the
    shipped pruning instead; SCALING.md has the numbers.

    The screen's upper bound: with S_X = the k smallest hash values of
    doc X and v = min(max S_A, max S_B), every element of X that is <= v
    is IN S_X (bottom-k captures its whole prefix of the hash order), so

        |A ∩ B|  <=  |S_A^v ∩ S_B^v| + min(|A| - |S_A^v|, |B| - |S_B^v|)

    where S^v = {s in S : s <= v} (the <= v part of the intersection is
    known EXACTLY; above v, the intersection can't exceed the smaller
    remainder). J = I/(|A|+|B|-I) is increasing in I, so
    J <= I_ub/(na+nb-I_ub): keep the pair iff I_ub*(num+den) >= num*(na+nb)
    (threshold as the exact fraction num/den — integer math, no FP ties).

    Why it pays: a typical negative candidate (J ~ 0) with n ~ 400
    shingles screens at J_ub ~ (n-k)/(n+k) ~ 0.72 < 0.8 and never ships
    its full array; the screen join moves 2*(k+2) BIGINTs per pair
    (~1 KB) instead of the two full shingle arrays (~6.6 KB) — and at the
    bounded 100x tier ~94% of candidates are negatives (43.4M candidates
    -> 2.49M pairs), so the dominant verify shuffle shrinks ~4x. Docs
    with n > ~9k shingles weaken the bound toward 1 (they pass to full
    verify) — bounded-tier docs sit far below that."""
    from fractions import Fraction

    fr = Fraction(threshold).limit_denominator(10**6)
    num, den = fr.numerator, fr.denominator
    base = sh.select(
        "doc_id",
        F.size("sh").alias("n"),
        F.slice(F.array_sort("sh"), 1, _SKETCH_K).alias("sk"),
    )
    a = base.select(
        F.col("doc_id").alias("doc_a"), F.col("n").alias("na"), F.col("sk").alias("sk_a")
    )
    b = base.select(
        F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"), F.col("sk").alias("sk_b")
    )
    j = candidates.join(a, "doc_a").join(b, "doc_b")
    v = F.least(F.element_at("sk_a", -1), F.element_at("sk_b", -1))
    fa = F.filter("sk_a", lambda x: x <= v)
    fb = F.filter("sk_b", lambda x: x <= v)
    j = j.select(
        "doc_a",
        "doc_b",
        "na",
        "nb",
        F.size(F.array_intersect(fa, fb)).alias("o"),
        F.size(fa).alias("ka"),
        F.size(fb).alias("kb"),
    )
    i_ub = F.col("o") + F.least(
        F.col("na") - F.col("ka"), F.col("nb") - F.col("kb")
    )
    survivors = j.filter(
        i_ub * F.lit(num + den) >= F.lit(num) * (F.col("na") + F.col("nb"))
    ).select("doc_a", "doc_b")
    return _verify_candidate_pairs(sh, survivors, threshold)


@register("q35_ngram_jaccard_dedup", oracle=_Q35_ORACLE)
def q35_ngram_jaccard_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    # the shingled frame feeds three consumers (sizes + both sides of the
    # self-join); without materialization the regex-normalize + shingle
    # transform re-runs per consumer — measured 3x the query's total cost
    # at sf0.1. localCheckpoint truncates lineage AND caches the blocks.
    return _exact_jaccard_pairs(_shingled(spark, sf_dir).localCheckpoint(eager=True))


# ---------------------------------------------------------------------------
# q36 — MinHash + LSH near-dup (the scale path). 64 hash functions =
# xxhash64 seeded by index; 16 bands × 4 rows; candidates = pairs sharing a
# band bucket; exact-Jaccard verify on candidates only. Shares q35's oracle
# because banding at these parameters has recall ≈ 1 above jac = 0.8
# (P[miss] <= (1 - 0.8^4)^16 ≈ 2e-4 per pair; the testdata's planted dups
# sit at jac ≈ 0.98 where P[miss] ≈ 1e-22).
# ---------------------------------------------------------------------------

_N_HASHES = 64
_BANDS = 16
_ROWS_PER_BAND = _N_HASHES // _BANDS


def _minhash(sh: F.Column, seed: int) -> F.Column:
    """One MinHash value: min over shingles of xxhash64(seed, shingle) —
    deterministic, JVM-side, no Python."""
    return F.array_min(F.transform(sh, lambda s: F.xxhash64(F.lit(seed), s)))


def band_key_structs(sh: F.Column, bands: int = _BANDS, rows: int = _ROWS_PER_BAND) -> list[F.Column]:
    """One struct<band:int, key:bigint> per band: key = hash of the band's
    `rows` MinHash values.

    Each MinHash expression appears exactly ONCE in the plan (bands are
    built directly from their own hash indices, not by slicing a shared
    signature array — Catalyst's projection collapse would otherwise
    duplicate the full signature into every band slice, a bands× blowup).
    """
    out = []
    for b in range(bands):
        mins = [_minhash(sh, b * rows + r) for r in range(rows)]
        out.append(
            F.struct(F.lit(b).alias("band"), F.xxhash64(*mins).alias("key"))
        )
    return out


def _lsh_band_candidates(
    sh: DataFrame, bands: int = _BANDS, rows: int = _ROWS_PER_BAND
) -> DataFrame:
    """(doc_a, doc_b) pairs sharing >=1 LSH band bucket — the banded
    candidate self-join over a shingled frame."""
    sig = sh.select(
        "doc_id", F.array(*band_key_structs(F.col("sh"), bands, rows)).alias("bk")
    )
    # cache the exploded band keys: both legs of the candidate self-join
    # consume them, and recomputation would re-run the full MinHash pass
    ex = (
        sig.select("doc_id", F.explode_outer("bk").alias("b"))  # outer: skip InferFiltersFromGenerate re-inlining the MinHash pass
        .select("doc_id", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
        .cache()
    )
    a = ex.select(F.col("doc_id").alias("doc_a"), "band", "key")
    b = ex.select(F.col("doc_id").alias("doc_b"), F.col("band").alias("band2"), F.col("key").alias("key2"))
    return (
        a.join(
            b,
            (F.col("band") == F.col("band2"))
            & (F.col("key") == F.col("key2"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


def _dup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, rep) exact-duplicate grouping: identical normalized text
    (the q34 fingerprint) collapses to the group's min doc_id."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    # null text => null fingerprint; such docs must form singleton groups
    # (they share no shingles, so q35 emits no pairs for them), not one
    # big null-keyed "duplicate" group
    fp = docs.select(
        "doc_id",
        F.coalesce(
            X.fingerprint(F.col("text")),
            F.concat(F.lit("\x00null:"), F.col("doc_id").cast("string")),
        ).alias("fp"),
    )
    w = Window.partitionBy("fp")
    return fp.select("doc_id", F.min("doc_id").over(w).alias("rep"))


def lsh_jaccard_pairs(
    spark: SparkSession,
    sf_dir: str,
    threshold: float = _JACCARD_T,
    bands: int = _BANDS,
    rows: int = _ROWS_PER_BAND,
    sort: bool = True,
) -> DataFrame:
    """(doc_a, doc_b, jac) near-dup pairs with jac >= ``threshold`` via
    MinHash banding + exact verification — the sub-quadratic scale path,
    reusable as the pair source for clustering (q68) and sweeping (q159).

    Degenerate-bucket guard: collapse EXACT duplicates before banding.
    Identical normalized text => identical shingle sets => identical
    signatures, so a planted hot bucket of n byte-identical docs would
    otherwise pair quadratically inside the band join AND pay n² exact
    verifies. Banding runs on one representative per distinct content;
    the lossless expansion afterwards re-emits (a) all intra-group pairs
    at jac = 1.0 exactly and (b) every verified rep-pair cross group
    members (Jaccard depends only on content, so J(x, y) = J(rep_x,
    rep_y) for duplicates). Candidate work is bounded by DISTINCT
    content counts; only the (irreducibly quadratic) answer rows are
    materialized. tests: planted-copies bound + oracle parity.

    Recall per pair is 1 - (1 - jac^rows)^bands. Defaults (16×4) give
    ~1 - 2e-4 at jac = 0.8; the sweep path (32×2) gives 0.99989 at
    jac = 0.5 and 1 - 6e-7 at jac = 0.6 — the documented recall floor
    for threshold-0.5 consumers.
    """
    groups = _dup_groups(spark, sf_dir).cache()

    # shingle only the representatives — the CPU-dense MinHash pass never
    # sees duplicate content. Null-shingle docs (null text) are singleton
    # reps that would all collide in every band (xxhash64 of an all-null
    # band is a constant) yet can never verify (null jac), so drop them
    # before banding rather than pay their quadratic candidate join.
    rep_ids = groups.filter(F.col("doc_id") == F.col("rep")).select("doc_id")
    sh = (
        _shingled(spark, sf_dir)
        .join(rep_ids, "doc_id")
        .where(F.col("sh").isNotNull())
        .cache()
    )
    rep_pairs = _verify_candidate_pairs(
        sh, _lsh_band_candidates(sh, bands, rows), threshold
    )

    # (a) intra-group pairs: every ordered pair of same-content docs
    m1 = groups.select(F.col("rep"), F.col("doc_id").alias("doc_a"))
    m2 = groups.select(F.col("rep").alias("rep2"), F.col("doc_id").alias("doc_b"))
    intra = (
        m1.join(m2, (F.col("rep") == F.col("rep2")) & (F.col("doc_a") < F.col("doc_b")))
        .select("doc_a", "doc_b", F.lit(1.0).alias("jac"))
    )
    # (b) verified rep pairs expanded across their groups (disjoint, so
    # least/greatest orients each unordered pair exactly once)
    ga = groups.select(F.col("rep").alias("doc_a"), F.col("doc_id").alias("xa"))
    gb = groups.select(F.col("rep").alias("doc_b"), F.col("doc_id").alias("xb"))
    inter = (
        rep_pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .select(
            F.least("xa", "xb").alias("doc_a"),
            F.greatest("xa", "xb").alias("doc_b"),
            "jac",
        )
    )
    out = intra.unionByName(inter)
    return out.orderBy("doc_a", "doc_b") if sort else out


@register("q36_minhash_lsh_dedup", oracle=_Q35_ORACLE)
def q36_minhash_lsh_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return lsh_jaccard_pairs(spark, sf_dir)


# ---------------------------------------------------------------------------
# q37 — SimHash signatures + near-dup pairs by Hamming distance.
# Oracle-checked: token hashes are the first 60 bits of md5 (the one hash
# both engines compute identically — parsed `conv(hex,16,10)` on Spark,
# `('0x'||hex)::BIGINT` in DuckDB), so the oracle can rebuild the exact
# signatures with explode × bit-position SQL. The production-scale variant
# would swap md5 for xxhash64 (cheaper, JVM-side) with identical structure —
# `simhash64` + the pytest python-reference covers that path.
# ---------------------------------------------------------------------------


def simhash(hashes: F.Column, nbits: int = 64) -> F.Column:
    """SimHash from an array of token hashes: per-bit majority vote,
    assembled with literal shifts (shiftright needs a literal shift
    amount, so bits unroll as a Python loop — nbits aggregate
    expressions, each consuming the shared hash array)."""
    def vote_fn(j: int):
        # closure factory: F.aggregate requires an exactly-2-parameter
        # lambda, so the bit index binds here rather than as a default arg
        return lambda acc, h: acc + (
            F.shiftright(h, j).bitwiseAND(F.lit(1)).cast("int") * F.lit(2) - F.lit(1)
        )

    sig = F.lit(0).cast("bigint")
    for j in range(nbits):
        bit_val = (1 << j) if j < 63 else -(1 << 63)  # bit 63 = sign bit in a signed long
        vote = F.aggregate(hashes, F.lit(0), vote_fn(j))
        sig = sig + F.when(vote > 0, F.lit(bit_val).cast("bigint")).otherwise(F.lit(0).cast("bigint"))
    return sig


def simhash64(hashes: F.Column) -> F.Column:
    """64-bit SimHash (scale path: pair with xxhash64 token hashes)."""
    return simhash(hashes, 64)


_SIMHASH_BITS = 60
_SIMHASH_MAX_HAMMING = 3

_Q37_ORACLE = f"""
WITH tok AS (
  SELECT doc_id,
         unnest(string_split(trim(regexp_replace(lower(text), '[ \\t\\n\\x0b\\f\\r\\p{{Z}}]+', ' ', 'g')), ' ')) AS t
  FROM documents
), th AS (
  SELECT doc_id, ('0x' || substring(md5(t), 1, 15))::BIGINT AS h FROM tok
), votes AS (
  SELECT doc_id, j,
         CASE WHEN SUM(((h >> j) & 1) * 2 - 1) > 0 THEN 1 ELSE 0 END AS bit
  FROM th CROSS JOIN range({_SIMHASH_BITS}) r(j)
  GROUP BY doc_id, j
), sigs AS (
  SELECT doc_id, CAST(SUM(bit * (1::BIGINT << j)) AS BIGINT) AS sig
  FROM votes GROUP BY doc_id
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.sig, b.sig)) AS hamming
FROM sigs a JOIN sigs b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.sig, b.sig)) <= {_SIMHASH_MAX_HAMMING}
ORDER BY doc_a, doc_b
"""


def simhash_votes(tok: DataFrame, id_col: str = "doc_id", hash_col: str = "h",
                  nbits: int = 60) -> DataFrame:
    """(id, sig) from exploded (id, token_hash) rows via ONE codegen'd hash
    aggregate: 60 ±1-vote sums per id, then bit assembly on the id-level
    frame. Same math as `simhash` but the hot loop is whole-stage-codegen
    sums over rows instead of 60 interpreted array folds per document —
    ~20x at sf0.1. Vote sums are integer, so any reduction order is exact.
    """
    aggs = []
    for j in range(nbits):
        bit = F.shiftright(F.col(hash_col), j).bitwiseAND(F.lit(1)).cast("int")
        aggs.append(F.sum(bit * F.lit(2) - F.lit(1)).alias(f"v{j}"))
    votes = tok.groupBy(id_col).agg(*aggs)
    sig = F.lit(0).cast("bigint")
    for j in range(nbits):
        bit_val = (1 << j) if j < 63 else -(1 << 63)  # sign bit of a long
        sig = sig + F.when(F.col(f"v{j}") > 0, F.lit(bit_val).cast("bigint")).otherwise(
            F.lit(0).cast("bigint")
        )
    return votes.select(F.col(id_col), sig.alias("sig"))


# Banding for the Hamming join: 60 bits in (max_hamming + 1) = 4 bands of
# 15. Pigeonhole: <= 3 differing bits can touch at most 3 bands, so every
# qualifying pair matches EXACTLY on >= 1 band — candidate generation via
# equi-join on (band, 15-bit key) is lossless, no cross join anywhere.
# E[candidates] for random sigs ~ bands * C(n,2) / 2^15 — linear-ish in n.
_SIMHASH_BANDS = _SIMHASH_MAX_HAMMING + 1
_SIMHASH_BAND_BITS = _SIMHASH_BITS // _SIMHASH_BANDS


@register("q37_simhash_pairs", oracle=_Q37_ORACLE)
def q37_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    md5_60 = X.md5_60
    tok = docs.select("doc_id", F.explode_outer(X.tokens(F.col("text"))).alias("t")).select(
        "doc_id", md5_60(F.col("t")).alias("h")
    )
    sigs = simhash_votes(tok, nbits=_SIMHASH_BITS).cache()
    band_mask = (1 << _SIMHASH_BAND_BITS) - 1
    bands = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftright(F.col("sig"), i * _SIMHASH_BAND_BITS)
                .bitwiseAND(F.lit(band_mask))
                .alias("key"),
            )
            for i in range(_SIMHASH_BANDS)
        ]
    )
    ex = (
        sigs.select("doc_id", "sig", F.explode_outer(bands).alias("b"))
        .select("doc_id", "sig", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    )
    a = ex.select(F.col("doc_id").alias("doc_a"), F.col("sig").alias("sig_a"), "band", "key")
    b = ex.select(
        F.col("doc_id").alias("doc_b"),
        F.col("sig").alias("sig_b"),
        F.col("band").alias("band2"),
        F.col("key").alias("key2"),
    )
    ham = F.bit_count(F.col("sig_a").bitwiseXOR(F.col("sig_b")))
    return (
        a.join(
            b,
            (F.col("band") == F.col("band2"))
            & (F.col("key") == F.col("key2"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .select("doc_a", "doc_b", ham.alias("hamming"))
        .filter(F.col("hamming") <= _SIMHASH_MAX_HAMMING)
        .distinct()
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# q68 — near-dup CLUSTER assignment: connected components over the jac>=0.8
# pair graph (pairs say "a~b"; clusters say "keep one of {a,b,c}" even when
# a~b and b~c but a!~c). Spark side: iterative min-label propagation
# (operators/graph.py, one shuffle join per round, localCheckpoint'd);
# oracle: DuckDB recursive CTE transitive closure over the same pairs.
# At scale the edge input would be q36's LSH candidates — identical pairs
# at these banding parameters (recall ~= 1, see q36 note).
# ---------------------------------------------------------------------------

_Q68_ORACLE = f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, {_SQL_SHINGLES} AS sh
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
), ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
co AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
),
pairs AS (
  SELECT doc_a, doc_b
  FROM co
  JOIN (SELECT doc_id, len(sh) AS n FROM docs) la ON la.doc_id = doc_a
  JOIN (SELECT doc_id, len(sh) AS n FROM docs) lb ON lb.doc_id = doc_b
  WHERE CAST(common AS DOUBLE) / (la.n + lb.n - common) >= {_JACCARD_T}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach AS (
  SELECT doc_id, doc_id AS x FROM documents
  UNION
  SELECT r.doc_id, e.b AS x FROM reach r JOIN edges e ON e.a = r.x
),
labels AS (SELECT doc_id, MIN(x) AS cluster_id FROM reach GROUP BY doc_id)
SELECT doc_id, cluster_id,
       COUNT(*) OVER (PARTITION BY cluster_id) AS cluster_size
FROM labels
ORDER BY doc_id
"""


def dedup_cluster_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-cached near-dup cluster labels ``(id, component)`` over the
    default LSH pair graph — the shared clustering state of q68 (cluster
    table), q194 (keeper weights), and q226 (dedup-adjusted budget): all
    three ask "which cluster does each doc belong to" under the SAME edge
    config, so the connected-components label-propagation rounds (Spark
    jobs at plan time — one shuffle join + min-aggregate per round) run
    ONCE per (session, sf_dir) instead of per call (VERDICT r10 item 1,
    the same rework shape the quantizer cache closed for IVF). The labels
    frame is connected_components output — already materialized via
    localCheckpoint, so serving it from cache is plan-only. Cache
    mechanics (applicationId keying, input-snapshot validation over
    documents.parquet, unpersist-on-evict): operators/session_cache.py."""
    from ..operators import session_cache
    from ..operators.graph import connected_components

    key = (
        spark.sparkContext.applicationId,
        sf_dir,
        "cc_labels_lsh",
        _JACCARD_T,
        _BANDS,
        _ROWS_PER_BAND,
    )
    snapshot = session_cache.table_snapshot(sf_dir, "documents")
    hit = session_cache.get(key, snapshot)
    if hit is not None:
        return hit
    docs = load_table(spark, sf_dir, "documents").select(F.col("doc_id").alias("id"))
    pairs = lsh_jaccard_pairs(spark, sf_dir, sort=False).select(
        F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
    )
    labels = connected_components(docs, pairs)
    session_cache.put(key, snapshot, labels)
    return labels


@register("q68_dedup_clusters", oracle=_Q68_ORACLE)
def q68_dedup_clusters(
    spark: SparkSession, sf_dir: str, edge_source: str = "lsh"
) -> DataFrame:
    """Near-dup clusters = connected components over the pair graph.

    ``edge_source`` picks the pair detector feeding the components:
    - ``"lsh"`` (default, the scale path): q36's banded MinHash candidates
      + exact verify — candidate work bounded by band buckets, never the
      corpus-wide shingle collision structure. Recall vs the exact edge
      set is 1 - 2e-4 per pair at jac = 0.8 (see lsh_jaccard_pairs), and
      a missed edge only matters if it is the SOLE bridge between two
      sub-clusters — pinned equal to the exact path at the gate SFs in
      tests/test_dedup.py.
    - ``"exact"`` (the oracle twin): the explode/shingle self-join of
      _exact_jaccard_pairs — exact but quadratic in a corpus-wide hot
      shingle's posting list; keep for verification only.
    """
    from pyspark.sql import Window

    from ..operators.graph import connected_components

    if edge_source == "lsh":
        labels = dedup_cluster_labels(spark, sf_dir)  # session-cached CC
    elif edge_source == "exact":
        docs = load_table(spark, sf_dir, "documents").select(
            F.col("doc_id").alias("id")
        )
        pairs = _exact_jaccard_pairs(_shingled(spark, sf_dir), sort=False).select(
            F.col("doc_a").alias("src"), F.col("doc_b").alias("dst")
        )
        labels = connected_components(docs, pairs)
    else:
        raise ValueError(f"unknown edge_source {edge_source!r}")
    return (
        labels.select(F.col("id").alias("doc_id"), F.col("component").alias("cluster_id"))
        .withColumn("cluster_size", F.count(F.lit(1)).over(Window.partitionBy("cluster_id")))
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q69 — winnowing fingerprints (Schleimer/Wilkerson/Aiken, SIGMOD'03 — the
# MOSS local document-fingerprinting algorithm): hash every k-gram, slide a
# w-window over the hash sequence, keep the RIGHTMOST MINIMUM of each
# window. Guarantees: every match of length >= w+k-1 shares a fingerprint,
# density ~ 2/(w+1).
#
# Scale shape: winnowing is document-local, so it compiles to per-row JVM
# array expressions (sequence/slice/array_min/transform) — ZERO shuffle,
# embarrassingly parallel, no UDF. Hashes are the md5-60bit engine-portable
# form (see q37) so the oracle rebuilds identical values; the xxhash64 swap
# is the cheaper production variant with identical structure.
# ---------------------------------------------------------------------------

_WINNOW_K = 3  # tokens per gram
_WINNOW_W = 4  # window length in grams

_Q69_ORACLE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         list_transform(range(1, len(toks) - {_WINNOW_K - 1} + 1),
                        i -> ('0x' || substring(md5(array_to_string(toks[i:i+{_WINNOW_K - 1}], ' ')), 1, 15))::BIGINT) AS h
  FROM t WHERE len(toks) >= {_WINNOW_K}
),
grams AS (SELECT doc_id, unnest(range(1, len(h) + 1)) AS pos, unnest(h) AS hv FROM g),
starts AS (
  SELECT doc_id,
         least({_WINNOW_W}, len(h)) AS wlen,
         unnest(range(1, len(h) - least({_WINNOW_W}, len(h)) + 2)) AS ws
  FROM g
),
win AS (
  SELECT s.doc_id, s.ws, gr.pos, gr.hv
  FROM starts s JOIN grams gr
    ON gr.doc_id = s.doc_id AND gr.pos BETWEEN s.ws AND s.ws + s.wlen - 1
),
mins AS (SELECT doc_id, ws, MIN(hv) AS fp FROM win GROUP BY doc_id, ws),
sel AS (
  SELECT w.doc_id, MAX(w.pos) AS pos, m.fp
  FROM win w JOIN mins m ON m.doc_id = w.doc_id AND m.ws = w.ws AND w.hv = m.fp
  GROUP BY w.doc_id, w.ws, m.fp
)
SELECT DISTINCT doc_id, pos, fp FROM sel ORDER BY doc_id, pos
"""


def winnow_fingerprints(docs: DataFrame) -> DataFrame:
    """(doc_id, pos, fp): the winnowing fingerprint set per document.

    Takes any frame with (doc_id, text); pure per-row array expressions.
    """
    md5_60 = X.md5_60
    # stage the token array first: referencing the tokenizer EXPRESSION
    # inside the transform lambda would re-run the regex split once per
    # gram (HOF lambdas get no loop-invariant hoisting); as a staged
    # attribute the array is computed once per row and only sliced here
    t = docs.select("doc_id", X.tokens(F.col("text")).alias("toks"))
    toks = F.col("toks")
    grams = F.transform(
        F.sequence(F.lit(1), F.size(toks) - F.lit(_WINNOW_K - 1)),
        lambda i: md5_60(F.array_join(F.slice(toks, i, _WINNOW_K), " ")),
    )
    d = t.filter(F.size(toks) >= _WINNOW_K).select("doc_id", grams.alias("h"))
    h = F.col("h")
    wlen = F.least(F.lit(_WINNOW_W), F.size(h))

    def rightmost_min(i):
        minh = F.array_min(F.slice(h, i, wlen))
        pos = F.array_max(
            F.transform(
                F.sequence(F.lit(0), wlen - F.lit(1)),
                lambda j: F.when(F.element_at(h, i + j) == minh, i + j),
            )
        )
        return F.struct(pos.alias("pos"), minh.alias("fp"))

    starts = F.sequence(F.lit(1), F.size(h) - wlen + F.lit(1))
    fps = F.array_distinct(F.transform(starts, rightmost_min))
    return (
        # outer-explode: plain explode would re-inline the whole winnowing
        # pipeline (rightmost_min lambda per window) into an inferred
        # size()>0 pre-filter; fps is never empty (sequence yields >= 1)
        d.select("doc_id", F.explode_outer(fps).alias("s"))
        .select("doc_id", F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))
    )


def winnow_fingerprints_arrow(docs: DataFrame) -> DataFrame:
    """Vectorized winnowing: same (doc_id, pos, fp) contract as
    `winnow_fingerprints`, computed in an Arrow-batched mapInPandas.

    7x faster than the Column-expression form at sf0.1: higher-order array
    functions evaluate interpreted per element, while here the k-gram md5s
    run through CPython's C hashlib and the rightmost-min selection is one
    numpy sliding_window_view argmin per document. Still document-local —
    ZERO shuffle — so the scale story is unchanged; a pytest asserts both
    paths produce identical rows.
    """

    def batches(it):
        import hashlib
        import re

        import numpy as np
        import pandas as pd

        for pdf in it:
            out_doc, out_pos, out_fp = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                toks = re.sub(_WS_CLASS, " ", text.lower()).strip(" ").split(" ")
                m = len(toks) - _WINNOW_K + 1
                if m < 1:
                    continue
                h = np.array(
                    [
                        int(
                            hashlib.md5(" ".join(toks[i : i + _WINNOW_K]).encode()).hexdigest()[:15],
                            16,
                        )
                        for i in range(m)
                    ],
                    dtype=np.int64,
                )
                w = min(_WINNOW_W, m)
                sw = np.lib.stride_tricks.sliding_window_view(h, w)
                rev = sw[:, ::-1]  # rightmost-min = argmin over the reversed window
                pos = (w - 1 - rev.argmin(axis=1)) + np.arange(len(sw))
                sel = np.unique(np.stack([pos, sw.min(axis=1)], axis=1), axis=0)
                out_doc.extend([doc_id] * len(sel))
                out_pos.extend((sel[:, 0] + 1).tolist())
                out_fp.extend(sel[:, 1].tolist())
            yield pd.DataFrame({"doc_id": out_doc, "pos": out_pos, "fp": out_fp})

    return docs.select("doc_id", "text").mapInPandas(batches, "doc_id long, pos int, fp long")


def _winnowed(spark: SparkSession, sf_dir: str) -> DataFrame:
    return winnow_fingerprints_arrow(load_table(spark, sf_dir, "documents"))


@register("q69_winnowing_fingerprints", oracle=_Q69_ORACLE)
def q69_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _winnowed(spark, sf_dir).orderBy("doc_id", "pos")


# ---------------------------------------------------------------------------
# q70 — copy detection over winnowing fingerprints: doc pairs sharing >= 3
# fingerprint values, with containment = shared/|F_a| resp. shared/|F_b|
# (Broder's containment measure — catches subset copies that symmetric
# Jaccard misses). Join is on the fingerprint value — the postings join of
# every fingerprint index; at 100 TB the hot fingerprints (boilerplate
# runs) get df-capped before the self-join, same discipline as a shingle
# index.
# ---------------------------------------------------------------------------

_CONTAIN_MIN_SHARED = 3
_CONTAIN_T = 0.5

_Q70_ORACLE = f"""
WITH t AS (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents),
g AS (
  SELECT doc_id,
         list_transform(range(1, len(toks) - {_WINNOW_K - 1} + 1),
                        i -> ('0x' || substring(md5(array_to_string(toks[i:i+{_WINNOW_K - 1}], ' ')), 1, 15))::BIGINT) AS h
  FROM t WHERE len(toks) >= {_WINNOW_K}
),
grams AS (SELECT doc_id, unnest(range(1, len(h) + 1)) AS pos, unnest(h) AS hv FROM g),
starts AS (
  SELECT doc_id,
         least({_WINNOW_W}, len(h)) AS wlen,
         unnest(range(1, len(h) - least({_WINNOW_W}, len(h)) + 2)) AS ws
  FROM g
),
win AS (
  SELECT s.doc_id, s.ws, gr.pos, gr.hv
  FROM starts s JOIN grams gr
    ON gr.doc_id = s.doc_id AND gr.pos BETWEEN s.ws AND s.ws + s.wlen - 1
),
mins AS (SELECT doc_id, ws, MIN(hv) AS fp FROM win GROUP BY doc_id, ws),
fpsets AS (SELECT DISTINCT doc_id, fp FROM mins),
sizes AS (SELECT doc_id, COUNT(*) AS n FROM fpsets GROUP BY doc_id),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS shared
  FROM fpsets a JOIN fpsets b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
)
SELECT doc_a, doc_b, shared,
       CAST(shared AS DOUBLE) / sa.n AS containment_a,
       CAST(shared AS DOUBLE) / sb.n AS containment_b
FROM pairs
JOIN sizes sa ON sa.doc_id = doc_a
JOIN sizes sb ON sb.doc_id = doc_b
WHERE shared >= {_CONTAIN_MIN_SHARED}
  AND greatest(CAST(shared AS DOUBLE) / sa.n, CAST(shared AS DOUBLE) / sb.n) >= {_CONTAIN_T}
ORDER BY doc_a, doc_b
"""


@register("q70_fingerprint_containment", oracle=_Q70_ORACLE)
def q70_fingerprint_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    fpsets = _winnowed(spark, sf_dir).select("doc_id", "fp").distinct()
    sizes = fpsets.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n"))
    a = fpsets.select(F.col("doc_id").alias("doc_a"), "fp")
    b = fpsets.select(F.col("doc_id").alias("doc_b"), F.col("fp").alias("fp2"))
    pairs = (
        a.join(b, (F.col("fp") == F.col("fp2")) & (F.col("doc_a") < F.col("doc_b")))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("na"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("nb"))
    ca = F.col("shared").cast("double") / F.col("na")
    cb = F.col("shared").cast("double") / F.col("nb")
    return (
        pairs.join(broadcast_if_small(sa), "doc_a")
        .join(broadcast_if_small(sb), "doc_b")
        .filter(
            (F.col("shared") >= _CONTAIN_MIN_SHARED)
            & (F.greatest(ca, cb) >= _CONTAIN_T)
        )
        .select(
            "doc_a", "doc_b", "shared", ca.alias("containment_a"), cb.alias("containment_b")
        )
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# q87 — incremental-ingest dedup: a new batch of documents is deduplicated
# against the EXISTING corpus fingerprint store (and within itself) — the
# shape every continuously-ingesting corpus pipeline runs per crawl drop.
# Existing/incoming split reuses q75's deterministic md5 hash split
# (bucket < 80 = already-ingested corpus, >= 80 = the new drop).
# Attribution order: a hit in the store wins over a within-batch dup.
# Scale shape: the store side reduces to DISTINCT fingerprints before the
# join (shuffle carries one row per unique fp, not per doc); the incoming
# batch is a left join on fp + one ranking window within the batch — both
# shuffles are on the fingerprint, the natural dedup key.
# ---------------------------------------------------------------------------

_Q87_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, md5({_SQL_NORM}) AS fp,
         ('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100 AS bucket
  FROM documents
), store AS (
  SELECT DISTINCT fp FROM d WHERE bucket < 80
), incoming AS (
  SELECT doc_id, source, fp,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM d WHERE bucket >= 80
), verdicts AS (
  SELECT i.source,
         CASE WHEN s.fp IS NOT NULL THEN 'dup_of_existing'
              WHEN i.rn > 1 THEN 'dup_within_batch'
              ELSE 'kept' END AS verdict
  FROM incoming i LEFT JOIN store s ON i.fp = s.fp
)
SELECT source,
       COUNT(*) AS n_incoming,
       COUNT(*) FILTER (verdict = 'kept') AS kept,
       COUNT(*) FILTER (verdict = 'dup_of_existing') AS dup_of_existing,
       COUNT(*) FILTER (verdict = 'dup_within_batch') AS dup_within_batch
FROM verdicts
GROUP BY source
ORDER BY source
"""


@register("q87_incremental_dedup", oracle=_Q87_ORACLE)
def q87_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    bucket = X.md5_bucket(F.col("doc_id"))
    d = docs.select(
        "doc_id", "source", X.fingerprint(F.col("text")).alias("fp"), bucket.alias("bucket")
    )
    store = d.filter(F.col("bucket") < 80).select("fp").distinct()
    w = Window.partitionBy("fp").orderBy("doc_id")
    incoming = (
        d.filter(F.col("bucket") >= 80)
        .withColumn("rn", F.row_number().over(w))
    )
    joined = incoming.join(
        store.withColumnRenamed("fp", "store_fp"),
        incoming.fp == F.col("store_fp"),
        "left",
    )
    verdict = (
        F.when(F.col("store_fp").isNotNull(), "dup_of_existing")
        .when(F.col("rn") > 1, "dup_within_batch")
        .otherwise("kept")
    )
    return (
        joined.select("source", verdict.alias("verdict"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_incoming"),
            F.count(F.when(F.col("verdict") == "kept", 1)).alias("kept"),
            F.count(F.when(F.col("verdict") == "dup_of_existing", 1)).alias("dup_of_existing"),
            F.count(F.when(F.col("verdict") == "dup_within_batch", 1)).alias("dup_within_batch"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q93 — edit-distance near-dup pairs (complements the set-based q35/q36 and
# bit-based q37 with a character-level measure, the classic record-linkage
# primitive): part-name pairs within the same brand at Levenshtein <= 2.
# Scale shape: the brand key BLOCKS the quadratic self-join (pairs only
# form inside a block, like q35's shingle blocking) and the length band
# |len(a)-len(b)| <= 2 — a necessary condition for distance <= 2 — prunes
# candidates before the O(len^2) distance runs. All JVM-side built-ins.
# Dialect note (probe-verified): Spark's levenshtein counts CHARACTERS
# while DuckDB's counts BYTES — they agree only on ASCII (p_name is
# ASCII, so the oracle pairing is valid here). The engine's
# character-level semantics is the correct one for user text and is
# pinned against a Python DP reference on non-ASCII in
# tests/test_dedup_similarity.py.
# ---------------------------------------------------------------------------

_Q93_ORACLE = """
SELECT a.p_partkey AS id_a, b.p_partkey AS id_b, a.p_brand,
       levenshtein(a.p_name, b.p_name) AS edit_dist
FROM part a JOIN part b
  ON a.p_brand = b.p_brand AND a.p_partkey < b.p_partkey
WHERE abs(length(a.p_name) - length(b.p_name)) <= 2
  AND levenshtein(a.p_name, b.p_name) <= 2
ORDER BY id_a, id_b
"""


@register("q93_editdist_name_pairs", oracle=_Q93_ORACLE)
def q93_editdist_name_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    part = load_table(spark, sf_dir, "part")
    # part is dimension-sized, so the scan is one input split — but the
    # blocked self-join below evaluates O(rows^2 / brands) bounded edit
    # distances, so spread the PROBE side across the cluster first (the
    # build side broadcasts); without this the whole quadratic runs in one
    # task regardless of executor count
    a = part.select(
        F.col("p_partkey").alias("id_a"), F.col("p_brand"), F.col("p_name").alias("name_a")
    ).repartition(32, F.col("id_a"))  # explicit N: AQE won't coalesce it away
    b = part.select(
        F.col("p_partkey").alias("id_b"),
        F.col("p_brand").alias("brand_b"),
        F.col("p_name").alias("name_b"),
    )
    return (
        a.join(
            broadcast_if_small(b),
            (F.col("p_brand") == F.col("brand_b"))
            & (F.col("id_a") < F.col("id_b"))
            & (F.abs(F.length("name_a") - F.length("name_b")) <= 2),
        )
        # threshold form runs the banded O(len * k) algorithm with early
        # exit (returns -1 past the bound) instead of the full DP matrix —
        # the distance itself is exact for every surviving pair
        .withColumn("edit_dist", F.levenshtein("name_a", "name_b", 2))
        .filter(F.col("edit_dist") >= 0)
        .select("id_a", "id_b", "p_brand", "edit_dist")
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# q102 — test-set decontamination (cross-split shingle containment).
# The training-pipeline twin of q35: before training, every candidate
# training document is checked for n-gram overlap against the held-out
# benchmark split; a training doc containing >=50% of a benchmark doc's
# 3-shingles is contamination (the doc would leak eval answers into the
# corpus). Splits come from q75's deterministic md5 bucket, so the check is
# reproducible corpus-wide.
#
# Scale shape: the benchmark split is small by construction (here the 10%
# 'test' bucket; in practice a fixed eval suite), so its exploded shingle
# postings BROADCAST — the 100 TB training side streams map-side against
# them, aggregates per (train_doc, bench_doc), and never shuffles raw text.
# ---------------------------------------------------------------------------

_CONTAIN_T = 0.5
_B_TRAIN, _B_BENCH = 80, 90  # q75's split: <80 train, >=90 test(=benchmark)

_SQL_BUCKET = "('0x' || substring(md5(CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT % 100"

_Q102_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_SQL_BUCKET} AS b, {_SQL_SHINGLES} AS sh
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks, text FROM documents)
),
ext AS (SELECT doc_id, unnest(sh) AS s FROM d WHERE b < {_B_TRAIN}),
exb AS (SELECT doc_id, unnest(sh) AS s FROM d WHERE b >= {_B_BENCH}),
pairs AS (
  SELECT ext.doc_id AS train_doc, exb.doc_id AS bench_doc, COUNT(*) AS common
  FROM ext JOIN exb ON ext.s = exb.s
  GROUP BY train_doc, bench_doc
)
SELECT train_doc, bench_doc,
       CAST(common AS DOUBLE) / lb.n AS containment
FROM pairs
JOIN (SELECT doc_id, len(sh) AS n FROM d WHERE b >= {_B_BENCH}) lb
  ON lb.doc_id = bench_doc
WHERE CAST(common AS DOUBLE) / lb.n >= {_CONTAIN_T}
ORDER BY train_doc, bench_doc
"""


@register("q102_decontamination", oracle=_Q102_ORACLE)
def q102_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        X.md5_bucket(F.col("doc_id"))
    )
    base = docs.select("doc_id", X.tokens(F.col("text")).alias("toks"), bucket.alias("b"))
    sh = base.select("doc_id", X.shingles_of_tokens(F.col("toks"), 3).alias("sh"), "b")
    train = sh.filter(F.col("b") < _B_TRAIN)
    bench = sh.filter(F.col("b") >= _B_BENCH)
    # outer-explodes: see _exact_jaccard_pairs — avoids the inferred
    # size()>0 filter re-running tokenize+shingle per element
    ex_t = train.select(F.col("doc_id").alias("train_doc"), F.explode_outer("sh").alias("s"))
    ex_b = bench.select(F.col("doc_id").alias("bench_doc"), F.col("sh").alias("sh_b"))
    ex_b = ex_b.select("bench_doc", F.size("sh_b").alias("n_b"), F.explode_outer("sh_b").alias("s_b"))
    # size-guarded broadcast (VERDICT r3 item 3): an MB-scale eval suite
    # broadcasts; a corpus-proportional bench side degrades to a shuffle
    # join instead of OOMing executors. Estimate from the pre-explode
    # frame (Generate's stats under-count fan-out), 8x for the postings.
    pairs = (
        ex_t.join(broadcast_if_small(ex_b, expansion=8.0, estimate_from=bench), F.col("s") == F.col("s_b"))
        .groupBy("train_doc", "bench_doc", "n_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    containment = F.col("common").cast("double") / F.col("n_b")
    return (
        pairs.select("train_doc", "bench_doc", containment.alias("containment"))
        .filter(F.col("containment") >= _CONTAIN_T)
        .orderBy("train_doc", "bench_doc")
    )


# ---------------------------------------------------------------------------
# q122 — prefix-filtered exact Jaccard join (PPJoin-style; Xiao et al.,
# "Efficient Similarity Joins for Near Duplicate Detection", WWW 2008).
# Same results as q35 (shares its oracle), structurally cheaper candidate
# generation: only each document's PREFIX — its (|d| − ⌈t·|d|⌉ + 1) rarest
# shingles under a global (df, shingle) order — enters the self-join.
# Theorem: J(a,b) ≥ t ⇒ the prefixes intersect, so pruning is lossless;
# a length filter (t·|a| ≤ |b| ≤ |a|/t) cuts further. Exact verification
# then runs only on surviving pairs via array_intersect.
#
# Scale: the full postings self-join explodes on common shingles (its
# candidate count is the sum of squared posting-list sizes); the prefix
# join's posting lists hold only rare-shingle entries, collapsing the
# quadratic hot lists. At 100 TB this is the exact-dedup path when LSH
# recall < 1 is not acceptable; the df table is one extra groupBy.
# ---------------------------------------------------------------------------


def _hashed_shingles(sh: DataFrame) -> DataFrame:
    """q122's shipped representation: shingles as xxhash64 BIGINTs (see
    q122_prefix_jaccard for the correctness argument). The SINGLE hashing
    select shared by the query and prefix_candidate_count, so the pruning
    certificate measures the candidate set q122 actually generates —
    same frame, same canonical (df, hash) order (ADVICE r8)."""
    return sh.select(
        "doc_id", F.transform("sh", lambda s: F.xxhash64(s)).alias("sh")
    )


def _prefix_candidates(sh: DataFrame) -> DataFrame:
    """PPJoin-style candidate pairs from a shingled frame: the prefix
    filter (rarest-first canonical order) plus the length-ratio filter —
    the SINGLE definition consumed by both q122 and the pruning-ratio
    test counter, so the certificate can't drift from the query."""
    # the doc's shingle count RIDES each posting through the explode —
    # (round 8) the former separate `sizes` join broadcast below ~10 MB
    # and flipped to a full sort-merge join of the posting table right at
    # the 100x bounded tier (sizes ~ 500k rows), a measured plan-regime
    # cliff; carrying n inline removes the join at every tier
    ex = sh.select(
        "doc_id", F.size("sh").alias("n"), F.explode_outer("sh").alias("s")
    )
    df_tab = ex.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    # global canonical order = (corpus df ascending, shingle) — rarest
    # first; materialized per doc via a ranking window, no global rank ids
    w = Window.partitionBy("doc_id").orderBy("df", "s")
    pos = ex.join(df_tab, "s").withColumn("rn", F.row_number().over(w))
    prefix = pos.filter(
        F.col("rn") <= F.col("n") - F.ceil(F.lit(_JACCARD_T) * F.col("n")) + F.lit(1)
    )
    a = prefix.select(
        F.col("doc_id").alias("doc_a"),
        "s",
        F.col("n").alias("na"),
        F.col("rn").alias("rn_a"),
    )
    b = prefix.select(
        F.col("doc_id").alias("doc_b"),
        F.col("s").alias("s2"),
        F.col("n").alias("nb"),
        F.col("rn").alias("rn_b"),
    )
    # PPJoin positional filter (Xiao et al. §3.2, round-9): a match at
    # canonical positions (i, j) bounds the pair's overlap by
    # 1 + min(na - i, nb - j) (everything before the match on either side
    # is disjoint at the FIRST common element, and after it at most the
    # shorter suffix can match), while J >= t needs overlap >=
    # t/(1+t)*(na+nb). Lossless at the pair level: a qualifying pair's
    # first common prefix element always satisfies the bound, so the pair
    # survives the distinct even if its later matches are filtered. The
    # threshold as the exact fraction num/den (4/5 for 0.8):
    # overlap*(num+den) >= num*(na+nb) — integer math, no FP ties. Zero
    # extra bytes or joins; it only shrinks the candidate set the verify
    # join ships (the round-9 sketch-screen experiment showed any
    # EXTRA-pass screen costs more than the verify bytes it saves —
    # SCALING.md records the negative result).
    from fractions import Fraction

    fr = Fraction(_JACCARD_T).limit_denominator(10**6)
    num, den = fr.numerator, fr.denominator
    pos_ok = (
        F.lit(1) + F.least(F.col("na") - F.col("rn_a"), F.col("nb") - F.col("rn_b"))
    ) * F.lit(num + den) >= F.lit(num) * (F.col("na") + F.col("nb"))
    return (
        a.join(
            b,
            (F.col("s") == F.col("s2"))
            & (F.col("doc_a") < F.col("doc_b"))
            & (F.col("nb").cast("double") >= F.lit(_JACCARD_T) * F.col("na"))
            & (F.col("na").cast("double") >= F.lit(_JACCARD_T) * F.col("nb"))
            & pos_ok,
        )
        .select("doc_a", "doc_b")
        .distinct()
    )


@register("q122_prefix_jaccard", oracle=_Q35_ORACLE)
def q122_prefix_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # like q35: the shingled frame feeds five consumers (sizes, df table,
    # prefix positions, both verification sides) — checkpoint it so the
    # regex-normalize + shingle transform runs once (3.2s vs 4.3s steady
    # state at sf0.1, 3x better cold).
    #
    # Shingles ride as xxhash64 BIGINTs end-to-end (round-8 bounded-tier
    # finding: the verify stage ships both shingle sets per candidate
    # pair, ~80 GB at the 100x tier with ~35-byte strings — 8-byte hashes
    # cut every posting/verify shuffle ~4x). Correctness: the prefix
    # filter only needs A consistent global canonical order — (df asc,
    # hash asc) qualifies exactly like (df asc, string asc) — and exact
    # Jaccard over hashed shingle SETS equals the string form absent a
    # 64-bit collision inside one doc's ~400 shingles (P ~ 1e-14 per
    # corpus; q35 keeps the pure-string path as the exact anchor).
    sh = _shingled(spark, sf_dir)
    shh = _hashed_shingles(sh).localCheckpoint(eager=True)
    return _verify_candidate_pairs(shh, _prefix_candidates(shh))


def prefix_candidate_count(spark: SparkSession, sf_dir: str) -> tuple[int, int]:
    """(prefix-join candidates, full-postings-join candidates) — the
    pruning ratio the prefix filter buys; pytest asserts it shrinks.
    Runs over the same hashed-shingle frame q122 ships (ADVICE r8)."""
    sh = _hashed_shingles(_shingled(spark, sf_dir))
    ex = sh.select("doc_id", F.explode_outer("sh").alias("s"))
    full = (
        ex.alias("x")
        .join(ex.alias("y"), (F.col("x.s") == F.col("y.s")) & (F.col("x.doc_id") < F.col("y.doc_id")))
        .select(F.col("x.doc_id"), F.col("y.doc_id"))
        .distinct()
        .count()
    )
    pruned = _prefix_candidates(sh).count()
    return pruned, full


# ---------------------------------------------------------------------------
# q146 — cross-source duplication flow matrix: for every exact-duplicate
# group spanning more than one source, count the (keeper_source -> dup
# source) document flows. The corpus-intelligence companion to q34/q144:
# q34 says HOW MANY duplicates exist, q144 decides WHO wins; this says
# WHERE the copies travel between sources (mirror detection, license
# laundering, scraper overlap). Keeper = min doc_id of the group (q34's
# policy), so the matrix is deterministic.
#
# Scale: one shuffle on the fingerprint (the same one q34 pays) to rank
# within groups + a broadcast-sized |sources|^2 aggregate. No pairwise
# join: each non-keeper row contributes exactly one (keeper_source,
# dup_source) edge via a windowed first_value, so cost is linear in
# duplicates, not quadratic in group size.
# ---------------------------------------------------------------------------

_Q146_ORACLE = f"""
WITH d AS (
  SELECT doc_id, source, md5({_SQL_NORM}) AS fp FROM documents
), r AS (
  SELECT doc_id, source, fp,
         FIRST_VALUE(source) OVER (PARTITION BY fp ORDER BY doc_id) AS keeper_source,
         ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
  FROM d
)
SELECT keeper_source, source AS dup_source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(COUNT(DISTINCT fp) AS BIGINT) AS n_groups
FROM r
WHERE rn > 1
GROUP BY keeper_source, dup_source
ORDER BY keeper_source, dup_source
"""


# ---------------------------------------------------------------------------
# q158 — dedup-savings audit: the "what does dedup buy us" report a
# curation pipeline runs BEFORE committing to a corpus rewrite. Exact-dup
# groups (q34's fingerprint) bucketed by group size: how many groups/docs
# sit at each duplication level, how many docs a keep-min-doc_id pass
# would remove, and how many chars of storage that frees (group chars
# minus the keeper's — the keeper is the min-doc_id member, q34/q146's
# keeper rule, so the freed volume is arg_min-exact, not avg-estimated).
#
# Scale: two hash aggregates — one shuffle keyed on fp (the dedup key;
# group state is one row per distinct fingerprint), then a shuffle of
# O(distinct group sizes) rows. Nothing corpus-proportional crosses the
# wire after the first exchange; no join, no window, no driver state.
# ---------------------------------------------------------------------------

_Q158_ORACLE = f"""
WITH g AS (
  SELECT md5({_SQL_NORM}) AS fp,
         COUNT(*) AS sz,
         SUM(n_chars) AS grp_chars,
         arg_min(n_chars, doc_id) AS keeper_chars
  FROM documents
  GROUP BY fp
)
SELECT sz AS group_size,
       COUNT(*) AS n_groups,
       CAST(SUM(sz) AS BIGINT) AS n_docs,
       CAST(SUM(sz - 1) AS BIGINT) AS removable_docs,
       CAST(SUM(grp_chars - keeper_chars) AS BIGINT) AS removable_chars
FROM g
GROUP BY group_size
ORDER BY group_size
"""


@register("q158_dedup_savings", oracle=_Q158_ORACLE)
def q158_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    g = docs.groupBy(X.fingerprint(F.col("text")).alias("fp")).agg(
        F.count(F.lit(1)).alias("sz"),
        F.sum("n_chars").alias("grp_chars"),
        F.min_by("n_chars", "doc_id").alias("keeper_chars"),
    )
    return (
        g.groupBy(F.col("sz").alias("group_size"))
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("sz").cast("bigint").alias("n_docs"),
            F.sum(F.col("sz") - 1).cast("bigint").alias("removable_docs"),
            F.sum(F.col("grp_chars") - F.col("keeper_chars"))
            .cast("bigint")
            .alias("removable_chars"),
        )
        .orderBy("group_size")
    )


# ---------------------------------------------------------------------------
# q159 — near-dup threshold sweep: pair counts at Jaccard thresholds
# 0.50..0.95 — the tuning curve a pipeline reads BEFORE fixing the dedup
# threshold (is 0.8 on the knee or the plateau?). Built on q35's exact
# pair machinery with the filter floor lowered to 0.50; each surviving
# pair map-side explodes into the thresholds it clears (10x a small pair
# set — never a corpus-side blowup), one tiny groupBy, and a 10-row
# left join restores zero-count thresholds. The literal threshold list is
# spelled identically on both engines (same decimal literals -> same
# doubles), so jac >= threshold decides identically.
#
# Scale: pair enumeration is the exact path (the oracle anchor, like
# q35); at 100 TB the same sweep runs over q36's LSH candidate pairs
# instead — banding at 16x4 keeps recall ~1 down to jac ~0.6, below
# which the curve is read from a wider-band config.
# ---------------------------------------------------------------------------

_SWEEP_THRESHOLDS = [0.50, 0.55, 0.60, 0.65, 0.70, 0.75, 0.80, 0.85, 0.90, 0.95]

_Q159_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_SQL_SHINGLES} AS sh
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
), ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
p0 AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
), pairs AS (
  SELECT CAST(common AS DOUBLE) / (la.n + lb.n - common) AS jac
  FROM p0
  JOIN (SELECT doc_id, len(sh) AS n FROM docs) la ON la.doc_id = doc_a
  JOIN (SELECT doc_id, len(sh) AS n FROM docs) lb ON lb.doc_id = doc_b
  WHERE CAST(common AS DOUBLE) / (la.n + lb.n - common) >= 0.50
)
SELECT threshold, COUNT(p.jac) AS n_pairs
FROM (VALUES {", ".join(f"(CAST({t!r} AS DOUBLE))" for t in _SWEEP_THRESHOLDS)})
     ths(threshold)
LEFT JOIN pairs p ON p.jac >= threshold
GROUP BY threshold
ORDER BY threshold
"""


@register("q159_jaccard_threshold_sweep", oracle=_Q159_ORACLE)
def q159_jaccard_threshold_sweep(
    spark: SparkSession, sf_dir: str, pair_source: str = "lsh"
) -> DataFrame:
    """Dedup-rate sweep: pair counts at each candidate Jaccard threshold.

    The sweep's floor is 0.50, below q36's 16×4 banding curve, so the
    ``"lsh"`` scale path re-bands at 32 bands × 2 rows (same 64 MinHash
    values): per-pair recall 1 - (1 - j²)^32 = 0.99989 at j = 0.5 and
    1 - 6e-7 at j = 0.6 — the documented recall floor of the sweep.
    ``"exact"`` keeps the quadratic oracle twin (pinned equal at the gate
    SFs in tests/test_dedup.py)."""
    if pair_source == "lsh":
        pairs = lsh_jaccard_pairs(
            spark, sf_dir, threshold=0.50, bands=32, rows=2, sort=False
        )
    elif pair_source == "exact":
        # localCheckpoint: same three-consumer reuse argument as q35
        pairs = _exact_jaccard_pairs(
            _shingled(spark, sf_dir).localCheckpoint(eager=True),
            threshold=0.50,
            sort=False,
        )
    else:
        raise ValueError(f"unknown pair_source {pair_source!r}")
    ths = F.array(*[F.lit(t) for t in _SWEEP_THRESHOLDS])
    counted = (
        pairs.select(F.explode(ths).alias("threshold"), "jac")
        .where(F.col("jac") >= F.col("threshold"))
        .groupBy("threshold")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    base = spark.range(1).select(F.explode(ths).alias("threshold"))
    return (
        base.join(counted, "threshold", "left")
        .select(
            "threshold", F.coalesce("n_pairs", F.lit(0).cast("bigint")).alias("n_pairs")
        )
        .orderBy("threshold")
    )


@register("q146_dup_flow_matrix", oracle=_Q146_ORACLE)
def q146_dup_flow_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    d = docs.select("doc_id", "source", X.fingerprint(F.col("text")).alias("fp"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    r = d.select(
        "source",
        "fp",
        F.first("source").over(w).alias("keeper_source"),
        F.row_number().over(w).alias("rn"),
    )
    return (
        r.filter(F.col("rn") > 1)
        .groupBy("keeper_source", F.col("source").alias("dup_source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("fp").alias("n_groups"),
        )
        .orderBy("keeper_source", "dup_source")
    )


# ---------------------------------------------------------------------------
# q194 — inverse-propensity dedup weights: dedup SHRINKS the corpus but a
# training pipeline that keeps one representative per near-dup cluster must
# not silently reweight the data distribution — the kept doc carries its
# cluster's multiplicity as a sampling weight (the standard dedup-weighting
# scheme, e.g. "soft dedup" in large-corpus training recipes). Composes the
# q68 cluster labels (LSH candidate edges — the scale path) with one
# aggregate; weight_share makes the weights a distribution over keepers.
# ---------------------------------------------------------------------------

_Q194_ORACLE = f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, {_SQL_SHINGLES} AS sh
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
), ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
co AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
),
pairs AS (
  SELECT doc_a, doc_b
  FROM co
  JOIN (SELECT doc_id, len(sh) AS n FROM docs) la ON la.doc_id = doc_a
  JOIN (SELECT doc_id, len(sh) AS n FROM docs) lb ON lb.doc_id = doc_b
  WHERE CAST(common AS DOUBLE) / (la.n + lb.n - common) >= {_JACCARD_T}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach AS (
  SELECT doc_id, doc_id AS x FROM documents
  UNION
  SELECT r.doc_id, e.b AS x FROM reach r JOIN edges e ON e.a = r.x
),
labels AS (SELECT doc_id, MIN(x) AS cluster_id FROM reach GROUP BY doc_id)
SELECT cluster_id AS keeper_doc_id, COUNT(*) AS weight,
       CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM documents) AS weight_share
FROM labels
GROUP BY cluster_id
ORDER BY keeper_doc_id
"""


@register("q194_dedup_weights", oracle=_Q194_ORACLE)
def q194_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(keeper_doc_id, weight, weight_share): one row per near-dup cluster
    keeper (min doc_id), weighted by cluster multiplicity so downstream
    sampling preserves the pre-dedup distribution. Scale shape: the q68
    component labels (LSH edges, bounded candidate work, session-cached —
    see dedup_cluster_labels) + ONE hash aggregate; the corpus size joins
    in as a broadcast 1-row aggregate."""
    labels = dedup_cluster_labels(spark, sf_dir)
    n_total = labels.agg(F.count(F.lit(1)).alias("__n"))
    return (
        labels.groupBy(F.col("component").alias("keeper_doc_id"))
        .agg(F.count(F.lit(1)).alias("weight"))
        .crossJoin(F.broadcast(n_total))
        .select(
            "keeper_doc_id",
            "weight",
            (F.col("weight").cast("double") / F.col("__n")).alias("weight_share"),
        )
        .orderBy("keeper_doc_id")
    )


# ---------------------------------------------------------------------------
# q195 — n-gram novelty of held-out docs vs the training split: the
# complement of q102's decontamination (q102 finds CONTAMINATED bench docs;
# q195 scores how much genuinely NEW text each held-out doc contributes —
# low-novelty docs are near-paraphrases of training data and inflate eval).
# Shares q75/q102's md5 hash-split buckets (<80 train, >=90 held-out).
# ---------------------------------------------------------------------------

_Q195_ORACLE = f"""
WITH d AS (
  SELECT doc_id, {_SQL_BUCKET} AS b, {_SQL_SHINGLES} AS sh
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
),
train_sh AS (SELECT DISTINCT unnest(sh) AS s FROM d WHERE b < {_B_TRAIN}),
test_ex AS (SELECT doc_id, unnest(sh) AS s FROM d WHERE b >= {_B_BENCH})
SELECT t.doc_id,
       COUNT(*) AS n_shingles,
       COUNT(*) FILTER (WHERE tr.s IS NULL) AS n_novel,
       CAST(COUNT(*) FILTER (WHERE tr.s IS NULL) AS DOUBLE) / COUNT(*)
         AS novelty_ratio
FROM test_ex t LEFT JOIN train_sh tr ON t.s = tr.s
GROUP BY t.doc_id
ORDER BY t.doc_id
"""


@register("q195_ngram_novelty", oracle=_Q195_ORACLE)
def q195_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per held-out doc: total shingles, shingles unseen in ANY training
    doc, and the novelty ratio. Scale shape: one distinct over the train
    shingles (partial-aggregated), one left join keyed on the shingle —
    both shuffles on the natural key; at 100 TB the train shingle set
    would live as a bloom filter (operators/bloom.py) with this exact
    join as the certifying twin."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        X.md5_bucket(F.col("doc_id"))
    )
    base = docs.select("doc_id", X.tokens(F.col("text")).alias("toks"), bucket.alias("b"))
    sh = base.select("doc_id", X.shingles_of_tokens(F.col("toks"), 3).alias("sh"), "b")
    train_sh = (
        sh.filter(F.col("b") < _B_TRAIN)
        .select(F.explode_outer("sh").alias("s"))
        .where(F.col("s").isNotNull())
        .distinct()
        .withColumn("__seen", F.lit(1))
    )
    test_ex = (
        sh.filter(F.col("b") >= _B_BENCH)
        .select("doc_id", F.explode_outer("sh").alias("s"))
        # null-text docs: explode_outer emits one null-shingle row, but the
        # oracle's unnest(NULL) emits none — drop to match (the doc has no
        # shingles to score)
        .where(F.col("s").isNotNull())
    )
    return (
        test_ex.join(train_sh, "s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shingles"),
            F.count(F.when(F.col("__seen").isNull(), 1)).alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            (F.col("n_novel").cast("double") / F.col("n_shingles")).alias(
                "novelty_ratio"
            ),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# q208 — near-dup SOURCE MATRIX: which corpus slices copy from which. The
# verified near-dup pairs (q36's banded-LSH path — candidate work bounded
# by distinct content, never all-pairs) joined back to each side's source
# and folded to an undirected (source, source) matrix with pair counts and
# the jac range. The cross-source rows are the interesting ones for a
# curation pipeline: mirrored feeds, syndication, template spam — q146
# gives this view for EXACT dups, this extends it to near-dups. All
# aggregates are order-free (count/min/max over bit-identical jac values),
# so the LSH path is fully oracle-checkable against the exact self-join.
# ---------------------------------------------------------------------------

_Q208_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_SQL_SHINGLES} AS sh
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
), ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
pairs AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
), scored AS (
  SELECT doc_a, doc_b,
         CAST(common AS DOUBLE) / (la.n + lb.n - common) AS jac
  FROM pairs
  JOIN (SELECT doc_id, len(sh) AS n FROM docs) la ON la.doc_id = doc_a
  JOIN (SELECT doc_id, len(sh) AS n FROM docs) lb ON lb.doc_id = doc_b
  WHERE CAST(common AS DOUBLE) / (la.n + lb.n - common) >= {_JACCARD_T}
)
SELECT least(da.source, db.source) AS src_a,
       greatest(da.source, db.source) AS src_b,
       COUNT(*) AS n_pairs,
       MIN(jac) AS min_jac,
       MAX(jac) AS max_jac
FROM scored
JOIN documents da ON da.doc_id = doc_a
JOIN documents db ON db.doc_id = doc_b
GROUP BY src_a, src_b
ORDER BY src_a, src_b
"""


@register("q208_near_dup_source_matrix", oracle=_Q208_ORACLE)
def q208_near_dup_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    pairs = lsh_jaccard_pairs(spark, sf_dir, sort=False)
    docs = load_table(spark, sf_dir, "documents")
    sa = docs.select(F.col("doc_id").alias("doc_a"), F.col("source").alias("sa"))
    sb = docs.select(F.col("doc_id").alias("doc_b"), F.col("source").alias("sb"))
    return (
        pairs.join(sa, "doc_a")
        .join(sb, "doc_b")
        .groupBy(
            F.least("sa", "sb").alias("src_a"),
            F.greatest("sa", "sb").alias("src_b"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.min("jac").alias("min_jac"),
            F.max("jac").alias("max_jac"),
        )
        .orderBy("src_a", "src_b")
    )


# ---------------------------------------------------------------------------
# q225 — n-gram novelty by source (round-9): what fraction of each
# source's 3-shingle occurrences is UNIQUE to one document corpus-wide
# (document frequency = 1). Low novelty = boilerplate/mirrored content
# (the shingles recur across docs); high novelty = original text. The
# memorization/boilerplate screen a curation pipeline runs next to dedup:
# q34/q36 find the copies, this measures how much of what REMAINS is
# recycled phrasing. Per source: distinct-shingle totals, the
# occurrence-weighted novelty share, and a per-doc novelty distribution
# summary (min/max of the per-doc unique share — order-independent
# extremes, the q33 rule; the mean is deliberately not emitted — a
# cross-row double sum is summation-order-dependent).
#
# All counts are exact BIGINTs; the two shares are single divisions of
# exact sums (the q103/q210 parity rule). Scale: one hash aggregate on
# the shingle (df table — the same aggregate q122's prefix order pays),
# one posting join back (equi-join on the 8-byte hash), one aggregate
# keyed doc_id, one keyed (source). No window over anything
# corpus-proportional.
# ---------------------------------------------------------------------------

_Q225_ORACLE = f"""
WITH sh AS (
  SELECT doc_id, source, unnest({_SQL_SHINGLES}) AS s
  FROM (SELECT doc_id, source, {_SQL_TOKS} AS toks FROM documents WHERE text IS NOT NULL)
), df AS (
  SELECT s, COUNT(*) AS df FROM sh GROUP BY s
), per_doc AS (
  SELECT sh.doc_id, sh.source,
         COUNT(*) AS n_sh,
         SUM(CASE WHEN df.df = 1 THEN 1 ELSE 0 END) AS n_unique
  FROM sh JOIN df USING (s)
  GROUP BY sh.doc_id, sh.source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_sh) AS BIGINT) AS total_shingles,
       CAST(SUM(n_unique) AS BIGINT) AS unique_shingles,
       CAST(SUM(n_unique) AS DOUBLE) / SUM(n_sh) AS novelty_share,
       MIN(CAST(n_unique AS DOUBLE) / n_sh) AS min_doc_novelty,
       MAX(CAST(n_unique AS DOUBLE) / n_sh) AS max_doc_novelty
FROM per_doc
GROUP BY source
ORDER BY source
"""
# Docs with NULL text are excluded on both sides; docs shorter than 3
# words yield their whole text as the single shingle (the
# functions.text.shingles contract), so n_sh >= 1 and the divisions are
# safe. The oracle reuses q35's _SQL_SHINGLES builder over _SQL_TOKS.


@register("q225_ngram_novelty", oracle=_Q225_ORACLE)
def q225_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents").filter(F.col("text").isNotNull())
    # Stage the tokenizer ONCE (q35/q122 rule): a plain explode over the
    # inlined shingle expression triggers InferFiltersFromGenerate, which
    # re-inlines the whole normalize+tokenize transform below the staging
    # projection; explode_outer is row-identical here (shingle arrays of
    # non-null text are never empty). The exploded posting frame feeds TWO
    # consumers (the df aggregate and the join back), so localCheckpoint
    # materializes it once instead of re-running the tokenizer per side.
    toks = docs.select("doc_id", "source", X.tokens(F.col("text")).alias("toks"))
    sh = toks.select(
        "doc_id",
        "source",
        F.explode_outer(X.shingles_of_tokens(F.col("toks"), 3)).alias("s"),
    ).localCheckpoint(eager=True)
    df_tab = sh.groupBy("s").agg(F.count(F.lit(1)).alias("df"))
    per_doc = (
        sh.join(df_tab, "s")
        .groupBy("doc_id", "source")
        .agg(
            F.count(F.lit(1)).alias("n_sh"),
            F.sum((F.col("df") == 1).cast("int")).alias("n_unique"),
        )
    )
    doc_novelty = F.col("n_unique").cast("double") / F.col("n_sh")
    return (
        per_doc.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_sh").cast("bigint").alias("total_shingles"),
            F.sum("n_unique").cast("bigint").alias("unique_shingles"),
            F.min(doc_novelty).alias("min_doc_novelty"),
            F.max(doc_novelty).alias("max_doc_novelty"),
        )
        .select(
            "source",
            "n_docs",
            "total_shingles",
            "unique_shingles",
            (
                F.col("unique_shingles").cast("double") / F.col("total_shingles")
            ).alias("novelty_share"),
            "min_doc_novelty",
            "max_doc_novelty",
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# q234 — near-dup cluster-size distribution (round 11): the shape of the
# duplication, not just its mass. q68 lists the clusters and q226 nets
# out their token mass; this answers the question a data lead asks next:
# is the duplication DIFFUSE (many pairs/triples — organic near-copies,
# dedup is routine) or HEAD-HEAVY (one mega-cluster — a boilerplate
# template or mirror, worth fixing at the crawler)? One row per distinct
# cluster size: how many clusters, how many docs they hold, their doc
# share, and the cumulative share held by clusters AT LEAST this large
# (read top-down: the head line of the distribution).
#
# Scale shape: the session-cached CC labels (dedup_cluster_labels — the
# marginal-cost argument q233 established) + TWO hash aggregates
# (component -> size, size -> count) and window math over O(distinct
# sizes) rows — a bounded-domain frame (the q191 class), never
# corpus-proportional.
# ---------------------------------------------------------------------------

_Q234_ORACLE = f"""
WITH RECURSIVE docs AS (
  SELECT doc_id, {_SQL_SHINGLES} AS sh
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
), ex AS (SELECT doc_id, unnest(sh) AS s FROM docs),
co AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY doc_a, doc_b
),
pairs AS (
  SELECT doc_a, doc_b
  FROM co
  JOIN (SELECT doc_id, len(sh) AS n FROM docs) la ON la.doc_id = doc_a
  JOIN (SELECT doc_id, len(sh) AS n FROM docs) lb ON lb.doc_id = doc_b
  WHERE CAST(common AS DOUBLE) / (la.n + lb.n - common) >= {_JACCARD_T}
),
edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL
  SELECT doc_b AS a, doc_a AS b FROM pairs
),
reach AS (
  SELECT doc_id, doc_id AS x FROM documents
  UNION
  SELECT r.doc_id, e.b AS x FROM reach r JOIN edges e ON e.a = r.x
),
labels AS (SELECT doc_id, MIN(x) AS cluster_id FROM reach GROUP BY doc_id),
sizes AS (
  SELECT cluster_id, CAST(COUNT(*) AS BIGINT) AS cluster_size
  FROM labels GROUP BY cluster_id
),
dist AS (
  SELECT cluster_size, CAST(COUNT(*) AS BIGINT) AS n_clusters,
         CAST(cluster_size * COUNT(*) AS BIGINT) AS n_docs
  FROM sizes GROUP BY cluster_size
)
SELECT cluster_size, n_clusters, n_docs,
       CAST(n_docs AS DOUBLE) / (SELECT COUNT(*) FROM documents) AS doc_share,
       CAST(SUM(n_docs) OVER (ORDER BY cluster_size DESC) AS DOUBLE)
         / (SELECT COUNT(*) FROM documents) AS cum_share_at_least
FROM dist
ORDER BY cluster_size
"""


@register("q234_dedup_cluster_sizes", oracle=_Q234_ORACLE)
def q234_dedup_cluster_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(cluster_size, n_clusters, n_docs, doc_share, cum_share_at_least):
    the near-dup cluster-size histogram over the session-cached component
    labels, with the head-mass readout (share of the corpus sitting in
    clusters >= each size). cum_share_at_least at cluster_size=1 is 1.0
    by construction; the first row BELOW 1.0 going down the table is
    where dedup stops mattering."""
    return cluster_size_distribution(dedup_cluster_labels(spark, sf_dir))


def cluster_size_distribution(
    labels: DataFrame, label_col: str = "component"
) -> DataFrame:
    """q234's histogram math over ANY (doc, label) frame — the batch
    labels and the streaming label store (streaming/events.
    cluster_sizes_from_labels_store) fold through this one body, so the
    live histogram can never drift from the batch definition."""
    n_total = labels.agg(F.count(F.lit(1)).alias("__n"))
    sizes = labels.groupBy(label_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("cluster_size")
    )
    dist = sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_clusters")
    )
    w = Window.orderBy(F.col("cluster_size").desc())
    return (
        dist.select(
            "cluster_size",
            "n_clusters",
            (F.col("cluster_size") * F.col("n_clusters")).cast("bigint").alias("n_docs"),
        )
        .crossJoin(F.broadcast(n_total))
        .select(
            "cluster_size",
            "n_clusters",
            "n_docs",
            (F.col("n_docs").cast("double") / F.col("__n")).alias("doc_share"),
            (
                F.sum("n_docs").over(w).cast("double") / F.col("__n")
            ).alias("cum_share_at_least"),
        )
        .orderBy("cluster_size")
    )


# ---------------------------------------------------------------------------
# q235 — benchmark-leak attribution by source (round 11): q102 lists the
# leaking (train_doc, bench_doc) pairs; this rolls them up to the table a
# data lead acts on — WHICH SOURCE is feeding eval answers into the
# training split, how much of its train mass leaks, and how many bench
# docs it touches. Complements q233 (which nets leaked mass out of the
# budget) with the attribution needed to fix the leak at the crawler.
#
# Scale shape: q102's containment core unchanged (size-guarded broadcast
# of the bench postings, shuffle fallback at corpus-proportional bench
# sides), then one broadcast-size join of the O(leaking docs) pair set
# back to the train docs and two O(sources) hash aggregates.
# ---------------------------------------------------------------------------

_Q235_ORACLE = f"""
WITH docs AS (
  SELECT doc_id, {_SQL_BUCKET} AS b, {_SQL_SHINGLES} AS sh
  FROM (SELECT doc_id, {_SQL_TOKS} AS toks FROM documents)
),
ext AS (SELECT doc_id, unnest(sh) AS s FROM docs WHERE b < {_B_TRAIN}),
exq AS (SELECT doc_id, unnest(sh) AS s FROM docs WHERE b >= {_B_BENCH}),
cp AS (
  SELECT ext.doc_id AS train_doc, exq.doc_id AS bench_doc, COUNT(*) AS common
  FROM ext JOIN exq ON ext.s = exq.s
  GROUP BY train_doc, bench_doc
),
leakp AS (
  SELECT cp.train_doc, cp.bench_doc
  FROM cp
  JOIN (SELECT doc_id, len(sh) AS n FROM docs WHERE b >= {_B_BENCH}) lq
    ON lq.doc_id = cp.bench_doc
  WHERE CAST(common AS DOUBLE) / lq.n >= {_CONTAIN_T}
),
tr AS (
  SELECT doc_id, source FROM documents WHERE {_SQL_BUCKET} < {_B_TRAIN}
),
base AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_train_docs
  FROM tr GROUP BY source
),
lk AS (
  SELECT tr.source,
         CAST(COUNT(DISTINCT l.train_doc) AS BIGINT) AS n_leaking,
         CAST(COUNT(DISTINCT l.bench_doc) AS BIGINT) AS n_bench_hit
  FROM leakp l JOIN tr ON tr.doc_id = l.train_doc
  GROUP BY tr.source
)
SELECT base.source, base.n_train_docs,
       CAST(COALESCE(lk.n_leaking, 0) AS BIGINT) AS n_leaking,
       CAST(COALESCE(lk.n_leaking, 0) AS DOUBLE) / base.n_train_docs
         AS leak_rate,
       CAST(COALESCE(lk.n_bench_hit, 0) AS BIGINT) AS n_bench_hit
FROM base LEFT JOIN lk USING (source)
ORDER BY source
"""


@register("q235_benchmark_leak_by_source", oracle=_Q235_ORACLE)
def q235_benchmark_leak_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(source, n_train_docs, n_leaking, leak_rate, n_bench_hit) over the
    train split: leak attribution per crawl source. Sources with no
    train-split documents have no row (the rate is train-mass relative);
    a leaking source names both its exposure (share of its train docs
    that leak) and its blast radius (distinct bench docs touched)."""
    docs = load_table(spark, sf_dir, "documents")
    train = docs.filter(X.md5_bucket(F.col("doc_id")) < _B_TRAIN).select(
        "doc_id", "source"
    )
    # join keyed on the doc id, NO broadcast hint: train is
    # corpus-proportional (never broadcast it — the retrieval_metrics
    # lesson), and the leak side's size is data-dependent post-filter
    # stats the estimator can't see — AQE converts to broadcast at
    # runtime exactly when the leak set is as small as it should be.
    # ONE aggregate with two COUNT(DISTINCT)s: the single-pass shape a
    # 100-TB leak set wants; its Expand rewrite orders branches
    # session-dependently (the q173 instability), so q235 sits in
    # UNSTABLE — results are deterministic, only the plan TEXT flaps.
    leak = (
        q102_decontamination(spark, sf_dir)
        .select("train_doc", "bench_doc")
        .join(train, F.col("train_doc") == F.col("doc_id"))
        .groupBy("source")
        .agg(
            F.countDistinct("train_doc").alias("n_leaking"),
            F.countDistinct("bench_doc").alias("n_bench_hit"),
        )
    )
    base = train.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_train_docs")
    )
    return (
        base.join(leak, "source", "left")
        .na.fill(0, ["n_leaking", "n_bench_hit"])
        .select(
            "source",
            "n_train_docs",
            F.col("n_leaking").cast("bigint").alias("n_leaking"),
            (
                F.col("n_leaking").cast("double") / F.col("n_train_docs")
            ).alias("leak_rate"),
            F.col("n_bench_hit").cast("bigint").alias("n_bench_hit"),
        )
        .orderBy("source")
    )
