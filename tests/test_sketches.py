"""Oracle tests for the mergeable t-digest quantile sketch (q88).

The driver's gate is rows-only here (sketches are not bit-exact); the real
correctness statement is a rank-error bound: the estimated quantile's true
rank must sit within EPS of the target rank. t-digest's k1 scale function
gives tighter error at the tails, so the p99 bound is stricter than p50's.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from big_data_computing_final_project_spark.operators.sketches import (
    build_centroids,
    merge_centroids,
    quantile_from_centroids,
    tdigest_quantiles,
)
from big_data_computing_final_project_spark.plans import all_queries


def _rank_of(values: np.ndarray, x: float) -> float:
    return float(np.searchsorted(np.sort(values), x, side="left")) / len(values)


def test_tdigest_rank_error_bounded_single_digest():
    rng = np.random.default_rng(42)
    values = rng.lognormal(mean=10, sigma=1.5, size=200_000)
    m, w = build_centroids(values, delta=200.0)
    assert len(m) <= 200, "centroid budget must be bounded by delta"
    for q, eps in [(0.5, 0.01), (0.9, 0.005), (0.99, 0.002)]:
        est = quantile_from_centroids(m, w, q)
        assert abs(_rank_of(values, est) - q) < eps, (q, est)


def test_tdigest_merge_is_associative_in_accuracy():
    """Sketching 8 shards then merging must be as accurate as one pass —
    the property that lets partial sketches persist across runs."""
    rng = np.random.default_rng(7)
    values = rng.gamma(shape=2.0, scale=3.0, size=160_000)
    shards = np.array_split(values, 8)
    parts = [build_centroids(s, 200.0) for s in shards]
    m = np.concatenate([p[0] for p in parts])
    w = np.concatenate([p[1] for p in parts])
    m, w = merge_centroids(m, w, 200.0)
    assert float(w.sum()) == pytest.approx(len(values))
    for q in (0.5, 0.9, 0.99):
        est = quantile_from_centroids(m, w, q)
        assert abs(_rank_of(values, est) - q) < 0.01, q


def test_q88_matches_exact_percentiles_within_rank_eps(spark, sf_dir):
    got = {r["key"]: r for r in all_queries()["q88_tdigest_quantiles"](spark, sf_dir).collect()}
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    for flag, row in got.items():
        vals = np.array(
            [
                r[0]
                for r in li.filter(F.col("l_returnflag") == flag)
                .select("l_extendedprice")
                .collect()
            ]
        )
        for q in (0.5, 0.9, 0.99):
            est = row[f"p{int(q * 100):02d}"]
            assert abs(_rank_of(vals, est) - q) < 0.01, (flag, q, est)


def test_tdigest_edge_cases():
    m, w = build_centroids(np.array([]), 100.0)
    assert np.isnan(quantile_from_centroids(m, w, 0.5))
    m, w = build_centroids(np.array([3.5]), 100.0)
    assert quantile_from_centroids(m, w, 0.5) == 3.5
    # constant column: every quantile is the constant
    m, w = build_centroids(np.full(10_000, 7.0), 100.0)
    for q in (0.01, 0.5, 0.99):
        assert quantile_from_centroids(m, w, q) == 7.0


def test_tdigest_spark_groups_match_numpy_reference(spark, sf_dir):
    """The distributed two-phase result must equal a single-machine digest
    built from the same values with the same delta (same algorithm, no
    dependence on partitioning) to within the sketch's own resolution."""
    df = spark.read.parquet(f"{sf_dir}/orders.parquet")
    got = {
        r["key"]: r
        for r in tdigest_quantiles(df, "o_orderstatus", "o_totalprice", [0.5, 0.9]).collect()
    }
    pdf = df.select("o_orderstatus", "o_totalprice").toPandas()
    for status, grp in pdf.groupby("o_orderstatus"):
        vals = grp["o_totalprice"].to_numpy()
        for q in (0.5, 0.9):
            est = got[status][f"p{int(q * 100):02d}"]
            assert abs(_rank_of(vals, est) - q) < 0.01, (status, q)


def test_heavy_hitters_bounds_and_containment(spark, sf_dir):
    """Certified bounds: lo <= exact <= hi for every reported item; with
    capacity far above the per-partition vocabulary, intervals collapse and
    the reported top-k IS the exact top-k."""
    from pyspark.sql import functions as F

    from big_data_computing_final_project_spark.functions import text as X

    from big_data_computing_final_project_spark.operators.sketches import heavy_hitters_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(X.tokens(F.col("text")).alias("toks"))
    got = heavy_hitters_topk(toks, "toks", k=20, capacity=4096).collect()
    exact = {
        r["item"]: r["n"]
        for r in toks.select(F.explode("toks").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in got:
        assert r["count_lo"] <= exact[r["item"]] <= r["count_hi"], r
    true_topk = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    assert {it for it, _ in true_topk} == {r["item"] for r in got}
    # at ample capacity nothing is truncated anywhere: bounds are tight
    assert all(r["count_lo"] == r["count_hi"] for r in got)
    # the oracle-paired q100 (sketch candidates -> exact rescore) must
    # emit exactly the true top-20 with exact counts
    q100 = all_queries()["q100_vocab_heavy_hitters"](spark, sf_dir).collect()
    want = [(t, n) for t, n in sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))
            if t != ""][:20]
    assert [(r["term"], r["n_occurrences"]) for r in q100] == want


def test_heavy_hitters_truncation_keeps_bounds_valid(spark, sf_dir):
    """With a deliberately tiny capacity the counters truncate; the interval
    must still contain the exact count for every reported item."""
    from pyspark.sql import functions as F

    from big_data_computing_final_project_spark.functions import text as X
    from big_data_computing_final_project_spark.operators.sketches import heavy_hitters_topk

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(X.tokens(F.col("text")).alias("toks"))
    got = heavy_hitters_topk(toks, "toks", k=10, capacity=30).collect()
    exact = {
        r["item"]: r["n"]
        for r in toks.select(F.explode("toks").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(got) == 10
    for r in got:
        assert r["count_lo"] <= exact[r["item"]] <= r["count_hi"], r


def test_certified_candidates_flat_vocab_refuses_or_contains(spark):
    """ADVICE r4: on a flat (non-Zipfian) vocabulary with heavy truncation,
    count_lo-ranked candidates can miss a true top-k term. The certificate
    must either (a) return None — forcing the caller's exact fallback — or
    (b) return a candidate set that provably contains the exact top-k.
    Planted data: 64 terms with near-equal counts spread over 8 partitions,
    capacity far below the vocabulary so almost everything truncates."""
    import itertools

    from big_data_computing_final_project_spark.operators.sketches import (
        certified_hh_candidates,
        heavy_hitters_partials,
    )

    terms = [f"t{i:02d}" for i in range(64)]
    # near-flat: counts 100..100+63, one doc per occurrence batch of 4
    rows = []
    rid = itertools.count()
    for i, t in enumerate(terms):
        for _ in range(100 + i):
            rows.append((next(rid), [t] * 4))
    df = spark.createDataFrame(rows, ["id", "toks"]).repartition(8, "id")
    partials = heavy_hitters_partials(df, "toks", capacity=8)
    cand = certified_hh_candidates(partials, k=10, cand_max=4096)
    exact_topk = sorted(terms, key=lambda t: (-(100 + terms.index(t)) * 4, t))[:10]
    if cand is not None:
        assert set(exact_topk) <= set(cand), (sorted(cand), exact_topk)


def test_certified_candidates_zipf_certifies_and_contains(spark, sf_dir):
    """On the gate corpus (Zipf-ish, ample capacity) the certificate must
    PASS and the candidate set must contain the exact top-20 — i.e. q100
    takes the cheap sketch path, not the fallback."""
    from pyspark.sql import functions as F

    from big_data_computing_final_project_spark.functions import text as X
    from big_data_computing_final_project_spark.operators.sketches import (
        certified_hh_candidates,
        heavy_hitters_partials,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = docs.select(
        F.filter(X.tokens(F.col("text")), lambda t: t != "").alias("toks")
    )
    cand = certified_hh_candidates(
        heavy_hitters_partials(toks, "toks", capacity=4096), k=20
    )
    assert cand is not None and len(cand) >= 20
    exact = (
        toks.select(F.explode("toks").alias("item"))
        .groupBy("item")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    true_topk = {
        r["item"]
        for r in sorted(exact, key=lambda r: (-r["n"], r["item"]))[:20]
    }
    assert true_topk <= set(cand)


def test_certified_candidates_refuses_below_k_witnesses(spark):
    """Code-review r5 counterexample: capacity=2, k=3, counts 100/90/5 in
    ONE partition. The sketch keeps only A,B (dmax=5); thr=min(100,90)=90
    and drop_total=5 < thr would 'pass' the unseen-item check, but the
    dropped 5-count item IS the true 3rd — with fewer than k surviving
    rows and any truncation the certificate must refuse (None)."""
    from big_data_computing_final_project_spark.operators.sketches import (
        certified_hh_candidates,
        heavy_hitters_partials,
    )

    rows = [(i, ["A"]) for i in range(100)]
    rows += [(100 + i, ["B"]) for i in range(90)]
    rows += [(200 + i, ["C"]) for i in range(5)]
    df = spark.createDataFrame(rows, ["id", "toks"]).coalesce(1)
    cand = certified_hh_candidates(
        heavy_hitters_partials(df, "toks", capacity=2), k=3
    )
    assert cand is None

    # same shape with NO truncation (ample capacity): 3 survivors < k=5
    # but drop_total=0 — the survivors are the whole domain, certify all
    cand2 = certified_hh_candidates(
        heavy_hitters_partials(df, "toks", capacity=100), k=5
    )
    assert cand2 is not None and set(cand2) == {"A", "B", "C"}


def test_certified_candidates_empty_and_cap(spark):
    """Empty input certifies the empty set; a cand_max below the certified
    set size must refuse (None) rather than silently truncate."""
    from big_data_computing_final_project_spark.operators.sketches import (
        certified_hh_candidates,
        heavy_hitters_partials,
    )

    empty = spark.createDataFrame([], "id long, toks array<string>")
    assert certified_hh_candidates(
        heavy_hitters_partials(empty, "toks", capacity=8), k=5
    ) == []

    rows = [(i, [f"t{i % 30:02d}"]) for i in range(300)]
    df = spark.createDataFrame(rows, ["id", "toks"])
    cand = certified_hh_candidates(
        heavy_hitters_partials(df, "toks", capacity=64), k=10, cand_max=3
    )
    assert cand is None


def test_hll_precision_sweep(spark, sf_dir):
    """Datasketches HLL error budget vs lgConfigK: the estimate at each
    precision must sit inside the published RSE bound (~1.04/sqrt(2^lgK),
    3-sigma margin), and the widest-precision estimate must not be further
    from exact than the 3-sigma envelope of the narrowest. Certifies the
    knob q79's at-scale mode exposes: memory (2^lgK bytes/partition) buys
    accuracy at a known exchange rate."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    exact = ev.select(F.countDistinct("user_id")).first()[0]
    for lg_k in (8, 12, 16):
        est = ev.select(
            F.hll_sketch_estimate(F.hll_sketch_agg("user_id", F.lit(lg_k)))
        ).first()[0]
        rse = 1.04 / (2 ** (lg_k / 2.0))
        assert abs(est - exact) <= max(3 * rse * exact, 1.0), (
            f"lgK={lg_k}: est {est} vs exact {exact} outside 3-sigma ({rse=})"
        )


def test_cdf_inverts_quantile_and_is_monotone():
    """cdf_from_centroids is the inverse of quantile_from_centroids on a
    single digest: cdf(quantile(q)) ~ q for interior q, and the CDF is
    monotone over a probe grid spanning past both tails."""
    import numpy as np

    from big_data_computing_final_project_spark.operators.sketches import (
        build_centroids,
        cdf_from_centroids,
        quantile_from_centroids,
    )

    rng = np.random.RandomState(11)
    vals = rng.lognormal(mean=3.0, sigma=1.0, size=20_000)
    m, w = build_centroids(vals, delta=200.0)
    for q in (0.1, 0.25, 0.5, 0.75, 0.9, 0.99):
        x = quantile_from_centroids(m, w, q)
        assert abs(cdf_from_centroids(m, w, x) - q) < 0.01, q
    lo, hi = float(vals.min()), float(vals.max())
    probes = np.linspace(lo - 1.0, hi + 1.0, 200)
    cdfs = [cdf_from_centroids(m, w, float(x)) for x in probes]
    assert cdfs == sorted(cdfs)
    assert cdfs[0] == 0.0 and cdfs[-1] == 1.0


def test_ks_from_digests_reads_atom_tail_jumps():
    """Code-review r5: a constant reference population (one centroid) vs a
    shifted current population has true KS = 1.0; probing only centroid
    means read the mid-atom 0.5 — the one-ulp side probes must recover
    ~1.0. Disjoint continuous samples must also read ~1.0, and empty
    digests read NaN."""
    import numpy as np

    from big_data_computing_final_project_spark.operators.sketches import (
        build_centroids,
        ks_from_digests,
    )

    const_m, const_w = build_centroids(np.full(5000, 10.0), 200.0)
    above = np.linspace(20.0, 30.0, 5000)
    am, aw = build_centroids(above, 200.0)
    assert ks_from_digests(const_m, const_w, am, aw) > 0.999

    below = np.linspace(-5.0, 5.0, 5000)
    bm, bw = build_centroids(below, 200.0)
    assert ks_from_digests(bm, bw, am, aw) > 0.999

    empty = np.array([])
    assert np.isnan(ks_from_digests(empty, empty, am, aw))
