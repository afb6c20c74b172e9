"""Int8 embedding quantization (north-star extension: the memory/IO side
of similarity search at corpus scale).

A 100 TB embedding store is 4x smaller in int8 than float32, and int8
GEMM (DP4A/VNNI) is the standard ANN serving format — so the engine
provides symmetric per-vector max-abs quantization as a pure Column
expression: no Python, no shuffle, codegen'd alongside the scan.

    q_i  = round_half_up(x_i * 127 / max_j |x_j|)   in [-127, 127]
    x̂_i = q_i * maxabs / 127                        (dequantization)

Per-vector scale (maxabs) keeps the quantization error bounded by
maxabs/254 per component. Everything here is deterministic double
arithmetic + floor, so the DuckDB oracle (q125) reproduces the exact
integer codes: correctly-rounded IEEE ops are engine-independent, unlike
``round()`` whose half-tie behavior differs between Spark and DuckDB —
hence the explicit floor(x + 0.5) form.

No reference parity: the reference has no embedding operations at all;
this extends the q38-q40/q64 similarity family (SCALING.md).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def max_abs(arr: Column) -> Column:
    """Per-vector max |x| — the symmetric quantization scale source."""
    return F.array_max(F.transform(arr, lambda x: F.abs(x)))


def quantize_int8(arr: Column) -> Column:
    """array<double> -> array<int> of symmetric int8 codes in [-127, 127].

    floor(x*127/maxabs + 0.5) is round-half-toward-+inf — chosen over
    round() because both engines' floor of a correctly-rounded double is
    bit-identical, while round() half-tie semantics differ. An all-zero
    vector quantizes to all zeros (no 0/0).
    """
    return quantize_int8_of(arr, max_abs(arr))


def quantize_int8_of(arr: Column, maxabs: Column) -> Column:
    """quantize_int8 with the scale supplied as a column.

    Pass a STAGED ``maxabs`` (aliased in a prior projection) on hot paths:
    inlining ``max_abs(arr)`` here puts an array_max scan inside the
    per-element lambda — O(d^2) per row instead of O(d) (measured 2.5s ->
    1.2s on q131 at sf0.1). Same staging rule as
    functions/text.shingles_of_tokens; the alias survives CollapseProject
    because it is referenced twice (guard + division).
    """
    return F.transform(
        arr,
        lambda x: F.when(maxabs == 0.0, F.lit(0)).otherwise(
            F.floor(x * F.lit(127.0) / maxabs + F.lit(0.5)).cast("int")
        ),
    )


def dequantize(q: Column, maxabs: Column) -> Column:
    """array<int> codes -> array<double> reconstruction (error <=
    maxabs/254 per component)."""
    return F.transform(q, lambda c: c.cast("double") * maxabs / F.lit(127.0))


def int8_dot(q_a: Column, q_b: Column) -> Column:
    """Integer dot product of two code arrays (the ANN serving kernel;
    rescale by maxabs_a*maxabs_b/127^2 for the approximate float dot)."""
    return F.aggregate(
        F.zip_with(q_a, q_b, lambda a, b: (a * b).cast("bigint")),
        F.lit(0).cast("bigint"),
        lambda acc, x: acc + x,
    )
