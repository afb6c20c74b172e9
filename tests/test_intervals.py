"""Unit pins for operators/intervals.py: bucketized candidates must be
COMPLETE (every true overlap shares a bucket) and the verify exact —
pinned against the brute-force quadratic on planted edge cases."""

from __future__ import annotations

from big_data_computing_final_project_spark.operators.intervals import (
    interval_self_overlap_pairs,
)


def _pairs(spark, rows, width):
    df = spark.createDataFrame(rows, "id long, start long, end long").repartition(5, "id")
    return {
        (r.id_a, r.id_b)
        for r in interval_self_overlap_pairs(df, width).collect()
    }


def _brute(rows):
    out = set()
    for i, (a, sa, ea) in enumerate(rows):
        for b, sb, eb in rows[i + 1 :]:
            if sa <= eb and sb <= ea:
                out.add((min(a, b), max(a, b)))
    return out


def test_bucket_boundary_cases(spark):
    """Intervals meeting exactly AT a bucket boundary, touching endpoints
    (closed-interval semantics: [0,10] and [10,20] DO overlap), and
    adjacent-but-disjoint ([0,10] vs [11,20]) — the classic binning
    off-by-ones."""
    rows = [
        (1, 0, 10),
        (2, 10, 20),    # touches 1 at 10 -> overlap
        (3, 11, 20),    # disjoint from 1
        (4, 63, 64),    # straddles the width-64 bucket boundary
        (5, 64, 65),    # touches 4 at 64 -> overlap
        (6, 0, 200),    # spans multiple buckets, overlaps everyone
        (7, 300, 310),  # far away, overlaps only 6? no - 6 ends at 200
    ]
    got = _pairs(spark, rows, 64)
    assert got == _brute(rows)
    assert (1, 2) in got and (1, 3) not in got
    assert (4, 5) in got and (6, 7) not in got


def test_random_intervals_match_bruteforce(spark):
    """200 deterministic pseudo-random intervals at two bucket widths —
    identical pair sets to the quadratic reference (candidate dedup across
    buckets, no boundary misses)."""
    rows = [
        (i, (i * 97) % 1000, (i * 97) % 1000 + (i * 31) % 80)
        for i in range(200)
    ]
    want = _brute(rows)
    assert _pairs(spark, rows, 64) == want
    assert _pairs(spark, rows, 17) == want  # width co-prime to the data
