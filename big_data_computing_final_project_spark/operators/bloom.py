"""Broadcast Bloom-filter join pruning (semi-join pushdown).

The scale problem: a fact-fact join (lineitem ⋈ σ(orders)) where the
filtered build side is too large to broadcast *as rows* but its key set
compresses to a tiny bitmap. Shuffling the probe side first means moving
~100 TB across the network to discard most of it at the join. Spark's
optimizer has this pattern built in as runtime bloom filters
(``spark.sql.optimizer.runtime.bloomFilter.*``, InjectRuntimeFilter), but
the aggregate isn't reachable from the public function surface, and the
injection thresholds (10 GB application side) make it untestable at local
scale — so this module implements the same plan shape explicitly:

  1. build side → k hashed bit positions per key → per-word ``bit_or``
     aggregate (JVM-side, ≤ num_bits/64 rows) → driver collect of the
     word array (num_bits/8 bytes — 16 KB at the default 2^17 bits),
  2. probe side → ``WHERE`` over an array *literal*: O(1) ``element_at``
     + bitwise AND per seed, whole-stage-codegen'd, evaluated **before**
     the probe's shuffle, so false-negative-free pruning reaches the scan
     stage (combined with parquet min/max skipping when the key is
     clustered).

False positives are fine — the real join still runs and removes them;
correctness is unconditionally the plain join's (q101's oracle is exactly
that). Like Spark's own runtime filter (and DPP), step 1 executes a small
job at plan-build time; at 100 TB the build-side scan is the σ(orders)
fraction, and the collected state is KBs regardless of data size.

No reference parity: the reference has no joins at all (SURVEY.md §2.5,
J-rows — `sol_2/house_predict.py:622-625` is its only implicit join);
this is a north-star scale extension. Bloom filter per Bloom (1970),
CACM 13(7); sizing per the standard fpp ≈ (1 − e^(−kn/m))^k.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["build_bloom_words", "bloom_might_contain", "bloom_prune"]

_DEFAULT_BITS = 1 << 17
_DEFAULT_SEEDS = (1, 2)


def build_bloom_words(
    build: DataFrame,
    key_col: str,
    num_bits: int = _DEFAULT_BITS,
    seeds: Sequence[int] = _DEFAULT_SEEDS,
) -> list[int]:
    """Aggregate the build side's key set into a bitmap (list of signed
    64-bit words, length num_bits/64). The shuffle carries at most one row
    per word, not per key; the driver receives num_bits/8 bytes."""
    # all seeds' positions in ONE build-side scan (array + explode_outer,
    # not a per-seed union that re-scans σ(build) k times)
    positions = build.select(
        F.explode_outer(
            F.array(
                *[
                    F.pmod(F.xxhash64(F.col(key_col), F.lit(int(s))), F.lit(num_bits))
                    for s in seeds
                ]
            )
        ).alias("pos")
    )
    words_df = (
        positions.select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.call_function(
                "shiftleft", F.lit(1).cast("long"), (F.col("pos") % 64).cast("int")
            ).alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
    )
    words = [0] * ((num_bits + 63) // 64)
    for r in words_df.collect():
        words[r["w"]] = r["word"]
    return words


def bloom_might_contain(
    words: list[int],
    key: Column,
    num_bits: int = _DEFAULT_BITS,
    seeds: Sequence[int] = _DEFAULT_SEEDS,
) -> Column:
    """Membership predicate against a collected bitmap: per seed, one O(1)
    array index + bitwise AND — no join, no shuffle, codegen-friendly.
    Never false-negative; false-positive rate set by num_bits/seeds."""
    arr = F.lit(words)
    cond = None
    for s in seeds:
        pos = F.pmod(F.xxhash64(key, F.lit(int(s))), F.lit(num_bits))
        word = F.get(arr, (pos / 64).cast("int"))
        bit = F.call_function("shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int"))
        hit = word.bitwiseAND(bit) != F.lit(0)
        cond = hit if cond is None else cond & hit
    return cond


def bloom_prune(
    probe: DataFrame,
    probe_key: str,
    build: DataFrame,
    build_key: str,
    num_bits: int = _DEFAULT_BITS,
    seeds: Sequence[int] = _DEFAULT_SEEDS,
) -> DataFrame:
    """Filter the probe side down to rows whose key *might* match the build
    side's key set, ahead of the actual join — the explicit form of
    runtime bloom-filter join pruning."""
    words = build_bloom_words(build, build_key, num_bits, seeds)
    return probe.where(bloom_might_contain(words, F.col(probe_key), num_bits, seeds))
