"""Drift-monitor semantics on PLANTED distribution shift (plans/drift.py).

The gate proves cross-engine hash parity on the synthetic orders table,
where both hash-split halves follow the same distribution (drift ~ 0);
these tests plant a REAL shift — the current split's o_totalprice moved —
and verify the statistics against independent numpy computations: the
exact KS ECDF gap, per-bin PSI terms, and that all three monitors read
near-zero on an unshifted planting (no false alarms).
"""

from __future__ import annotations

import hashlib
import math
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from big_data_computing_final_project_spark.plans import all_queries

_PRIOS = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]


def _bucket(key: int) -> int:
    # mirrors plans/drift._obucket (first 60 bits of md5, mod 100)
    return int(hashlib.md5(str(key).encode()).hexdigest()[:15], 16) % 100


def _write_orders(path, n: int, shift: float) -> tuple[np.ndarray, np.ndarray]:
    """Plant n orders; reference rows ~ deterministic pseudo-normal, current
    rows shifted by ``shift``. Returns (ref_values, cur_values)."""
    keys = np.arange(n, dtype=np.int64)
    is_ref = np.array([_bucket(int(k)) < 80 for k in keys])
    # deterministic pseudo-normal via Irwin-Hall of per-key hash uniforms
    u = np.array(
        [
            sum(
                int(hashlib.md5(f"{k}:{j}".encode()).hexdigest()[:8], 16) / 16**8
                for j in range(4)
            )
            for k in keys
        ]
    )
    v = 1000.0 + 200.0 * (u - 2.0)
    v = np.where(is_ref, v, v + shift)
    # reference: uniform over 5 priorities; current: only the first two —
    # a genuine categorical-distribution shift (an index OFFSET would keep
    # the shares uniform and chi2 silent)
    prio = [
        _PRIOS[int(k) % 5] if r else _PRIOS[int(k) % 2]
        for k, r in zip(keys, is_ref)
    ]
    tbl = pa.table(
        {
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_custkey": pa.array(keys % 100, pa.int64()),
            "o_orderstatus": pa.array(["F"] * n, pa.string()),
            "o_totalprice": pa.array(v, pa.float64()),
            "o_orderpriority": pa.array(prio, pa.string()),
        }
    )
    pq.write_table(tbl, str(path / "orders.parquet"))
    return v[is_ref], v[~is_ref]


def _ks_numpy(a: np.ndarray, b: np.ndarray) -> float:
    vals = np.unique(np.concatenate([a, b]))
    fa = np.searchsorted(np.sort(a), vals, side="right") / a.size
    fb = np.searchsorted(np.sort(b), vals, side="right") / b.size
    return float(np.max(np.abs(fa - fb)))


def test_ks_matches_numpy_on_planted_shift(spark, tmp_path):
    ref, cur = _write_orders(tmp_path, 2000, shift=120.0)
    row = all_queries()["q152_ks_drift"](spark, str(tmp_path)).first()
    assert row["n_ref"] == ref.size and row["n_cur"] == cur.size
    want = _ks_numpy(ref, cur)
    assert row["ks_stat"] == pytest.approx(want, abs=1e-12)
    assert row["ks_stat"] > 0.15  # the planted shift is detectable


def test_psi_matches_numpy_and_detects_shift(spark, tmp_path):
    ref, cur = _write_orders(tmp_path, 2000, shift=120.0)
    rows = all_queries()["q151_psi_drift"](spark, str(tmp_path)).collect()
    assert [r["bin"] for r in rows] == sorted({r["bin"] for r in rows})
    lo, hi = ref.min(), ref.max()
    width = (hi - lo) / 10.0
    bins = np.clip(np.floor((np.concatenate([ref, cur]) - lo) / width).astype(int), 0, 9)
    is_ref = np.array([True] * ref.size + [False] * cur.size)
    total_psi = 0.0
    for r in rows:
        nr = int(((bins == r["bin"]) & is_ref).sum())
        nc = int(((bins == r["bin"]) & ~is_ref).sum())
        assert (r["n_ref"], r["n_cur"]) == (nr, nc)
        p, q = nr / ref.size, nc / cur.size
        term = (q - p) * math.log(max(q, 1e-9) / max(p, 1e-9))
        assert r["psi_term"] == pytest.approx(term, abs=1e-9)
        total_psi += term
    assert total_psi > 0.2  # "significant shift" on the standard PSI scale


def test_monitors_quiet_without_shift(spark, tmp_path):
    ref, cur = _write_orders(tmp_path, 4000, shift=0.0)
    ks = all_queries()["q152_ks_drift"](spark, str(tmp_path)).first()["ks_stat"]
    assert ks == pytest.approx(_ks_numpy(ref, cur), abs=1e-12)
    assert ks < 0.06  # same distribution: no alarm
    psi = sum(
        r["psi_term"]
        for r in all_queries()["q151_psi_drift"](spark, str(tmp_path)).collect()
    )
    assert abs(psi) < 0.02
    chi = all_queries()["q153_chi2_drift"](spark, str(tmp_path)).collect()
    # priorities were planted DIFFERENT across splits (current uses only
    # the first two categories): chi2 fires even though the numerics match
    assert sum(r["chi2_ref_term"] + r["chi2_cur_term"] for r in chi) > 10.0


def test_chi2_quiet_on_identical_categoricals(spark, tmp_path):
    # rebuild with identical priority assignment across splits
    n = 2000
    keys = np.arange(n, dtype=np.int64)
    prio = [_PRIOS[int(k) % 5] for k in keys]
    tbl = pa.table(
        {
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_custkey": pa.array(keys % 100, pa.int64()),
            "o_orderstatus": pa.array(["F"] * n, pa.string()),
            "o_totalprice": pa.array(np.full(n, 100.0), pa.float64()),
            "o_orderpriority": pa.array(prio, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    chi = all_queries()["q153_chi2_drift"](spark, str(tmp_path)).collect()
    assert sum(r["chi2_ref_term"] + r["chi2_cur_term"] for r in chi) < 5.0


def test_stream_psi_store_equals_batch_q151(spark, tmp_path):
    """Streaming twin: the current split arrives as 3 micro-batches binned
    against FROZEN reference edges; the store-derived per-bin PSI must
    equal batch q151 on the same planted data exactly."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_computing_final_project_spark.streaming.events import (
        psi_from_store,
        run_stream_psi_counts,
    )

    ref, cur = _write_orders(tmp_path, 2000, shift=120.0)
    want = [
        tuple(r)
        for r in all_queries()["q151_psi_drift"](spark, str(tmp_path)).collect()
    ]

    # frozen reference edges + histogram, binned exactly like q151
    lo, hi = float(ref.min()), float(ref.max())
    width = (hi - lo) / 10.0
    bins = np.clip(np.floor((ref - lo) / width).astype(int), 0, 9)
    ref_counts = spark.createDataFrame(
        [(int(b), int((bins == b).sum())) for b in sorted(set(bins))],
        "bin int, n_ref bigint",
    )

    # stream the current split in 3 drops
    src = tmp_path / "cur_stream"
    src.mkdir()
    parts = np.array_split(cur, 3)
    for i, p in enumerate(parts):
        pq.write_table(
            pa.table({"v": pa.array(p, pa.float64())}), str(src / f"drop_{i}.parquet")
        )
    stream = spark.readStream.schema("v double").option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    store = str(tmp_path / "psistore")
    run_stream_psi_counts(stream, lo, width, 10, store, str(tmp_path / "ckpt_psi"))

    got = [tuple(r) for r in psi_from_store(spark, store, ref_counts).collect()]
    assert got == want


def test_embedding_drift_reads_planted_shift(spark, tmp_path):
    """q154 on planted embeddings: current-split vectors are the reference
    distribution plus a constant per-dim offset; the per-dim centroid
    shift must recover that offset (within the sample-mean noise of the
    two independent halves)."""
    n, dims, delta = 1500, 4, np.array([0.5, -0.25, 0.0, 1.0])
    keys = np.arange(n, dtype=np.int64)
    is_ref = np.array([_bucket(int(k)) < 80 for k in keys])
    base = np.array(
        [
            [
                int(hashlib.md5(f"{k}:{d}".encode()).hexdigest()[:8], 16) / 16**8
                for d in range(dims)
            ]
            for k in keys
        ]
    )
    vecs = np.where(is_ref[:, None], base, base + delta[None, :]).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(keys, pa.int64()),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
            "label": pa.array([int(k) % 3 for k in keys], pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))
    rows = all_queries()["q154_embedding_drift"](spark, str(tmp_path)).collect()
    assert [r["dim"] for r in rows] == list(range(dims))
    for r in rows:
        # uniform[0,1) halves: sample-mean gap ~ O(1/sqrt(n)) ~ 0.02
        assert r["shift"] == pytest.approx(float(delta[r["dim"]]), abs=0.05)
        assert r["shift2"] == pytest.approx(r["shift"] * r["shift"], abs=1e-12)


def test_token_js_drift_flags_planted_vocab_shift(spark, tmp_path):
    """q155 on a planted corpus: the current split introduces a new head
    term ('zebra') absent from the reference; its JS contribution must
    dominate, shared terms must sit near zero, and the total must stay
    within JS divergence's [0, 1] log2 bound."""
    n = 1200
    keys = np.arange(n, dtype=np.int64)
    is_ref = np.array([_bucket(int(k)) < 80 for k in keys])
    texts = [
        "the quick brown fox" if r else "the quick zebra zebra"
        for r in is_ref
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(keys, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(["s"] * n, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))
    rows = {r["term"]: r for r in all_queries()["q155_token_js_drift"](spark, str(tmp_path)).collect()}
    assert set(rows) == {"the", "quick", "brown", "fox", "zebra"}
    assert rows["zebra"]["n_ref"] == 0 and rows["zebra"]["n_cur"] > 0
    assert rows["zebra"]["js_term"] > rows["the"]["js_term"]
    total = sum(r["js_term"] for r in rows.values())
    assert 0.0 < total <= 1.0


def test_sketch_ks_tracks_exact_ks(spark, sf_dir, tmp_path):
    """q156 (t-digest KS, the unbounded-domain scale path) must track the
    exact q152 statistic within sketch resolution on the gate data AND on
    a planted shift, and agree exactly on the split sizes."""
    exact = all_queries()["q152_ks_drift"](spark, sf_dir).first()
    approx = all_queries()["q156_ks_drift_sketch"](spark, sf_dir).first()
    assert (approx["n_ref"], approx["n_cur"]) == (exact["n_ref"], exact["n_cur"])
    assert abs(approx["ks_stat_approx"] - exact["ks_stat"]) < 0.02

    ref, cur = _write_orders(tmp_path, 3000, shift=120.0)
    exact2 = all_queries()["q152_ks_drift"](spark, str(tmp_path)).first()
    approx2 = all_queries()["q156_ks_drift_sketch"](spark, str(tmp_path)).first()
    assert abs(approx2["ks_stat_approx"] - exact2["ks_stat"]) < 0.02
    assert approx2["ks_stat_approx"] > 0.15  # still detects the shift


def test_stream_ks_digest_store_tracks_exact(spark, tmp_path):
    """Streaming KS twin: current-split values stream through the t-digest
    partial store; the store-vs-frozen-reference-digest statistic must
    track the exact KS (and q156's batch sketch) within sketch
    resolution."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_computing_final_project_spark.operators.sketches import (
        build_centroids,
    )
    from big_data_computing_final_project_spark.streaming.events import (
        ks_from_digest_store,
        run_stream_tdigest,
    )

    ref, cur = _write_orders(tmp_path, 3000, shift=120.0)
    exact = all_queries()["q152_ks_drift"](spark, str(tmp_path)).first()

    # frozen reference digest (training-time artifact)
    ref_m, ref_w = build_centroids(ref, delta=200.0)

    # stream the current split in 3 drops through the sketch store
    src = tmp_path / "cur_vals"
    src.mkdir()
    for i, p in enumerate(np.array_split(cur, 3)):
        pq.write_table(
            pa.table({"v": pa.array(p, pa.float64())}), str(src / f"drop_{i}.parquet")
        )
    stream = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .selectExpr("'cur' AS k", "v")
    )
    store = str(tmp_path / "kstore")
    run_stream_tdigest(stream, "k", "v", store, str(tmp_path / "ckpt_ks"))

    ks, n_cur = ks_from_digest_store(spark, store, ref_m, ref_w)
    assert n_cur == cur.size
    assert abs(ks - exact["ks_stat"]) < 0.02
    assert ks > 0.15  # the planted shift is still detected from sketches

    # empty store contract
    nan_ks, n0 = ks_from_digest_store(spark, str(tmp_path / "missing"), ref_m, ref_w)
    assert n0 == 0 and nan_ks != nan_ks


def test_drift_transcendental_terms_cross_engine_fuzz(spark):
    """Fuzz parity for the drift fragments that pass through ln/log2/pow —
    the q54 transcendental-rounding contract at its boundary: for random
    and adversarial integer count tuples, the Spark expressions and the
    DuckDB oracle forms must agree after their 12/9-dp rounding. The gate
    exercises only the counts the synthetic tables produce; this probes
    extremes (zero bins, singletons, near-2^40 totals, ratios straddling
    1.0) where a last-ulp log divergence would surface in the rounded
    digit if the rounding were too tight."""
    import random

    import duckdb
    from pyspark.sql import functions as F

    from big_data_computing_final_project_spark.plans.drift import psi_term_expr

    random.seed(13)
    rows = []
    for i in range(400):
        tr = random.choice([1, 7, 100, 12345, 10**6, 2**40])
        tc = random.choice([1, 9, 250, 54321, 10**6, 2**40])
        nr = random.randint(0, tr)
        nc = random.randint(0, tc)
        rows.append((i, nr, nc, tr, tc))
    # adversarial: equal shares (term exactly 0), zero/zero, all-mass bins
    rows += [
        (1000, 50, 50, 100, 100),
        (1001, 0, 0, 100, 100),
        (1002, 100, 0, 100, 100),
        (1003, 0, 100, 100, 100),
        (1004, 1, 1, 2**40, 2**40),
    ]
    df = spark.createDataFrame(rows, "id long, nr long, nc long, tr long, tc long")
    p = F.col("nr").cast("double") / F.col("tr")
    q = F.col("nc").cast("double") / F.col("tc")
    m = (p + q) / 2.0
    js = F.when(p > 0, 0.5 * p * F.log2(p / m)).otherwise(F.lit(0.0)) + F.when(
        q > 0, 0.5 * q * F.log2(q / m)
    ).otherwise(F.lit(0.0))
    got = {
        r["id"]: (r["psi"], r["js"])
        for r in df.select(
            "id",
            F.round(psi_term_expr(p, q), 12).alias("psi"),
            F.round(js, 12).alias("js"),
        ).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE t(id BIGINT, nr BIGINT, nc BIGINT, tr BIGINT, tc BIGINT)")
    con.executemany("INSERT INTO t VALUES (?, ?, ?, ?, ?)", rows)
    sp = "(CAST(nr AS DOUBLE) / tr)"
    sq = "(CAST(nc AS DOUBLE) / tc)"
    sm = f"(({sp} + {sq}) / 2.0)"
    js_sql = (
        f"CASE WHEN {sp} > 0 THEN 0.5 * {sp} * log2({sp} / {sm}) ELSE 0.0 END"
        f" + CASE WHEN {sq} > 0 THEN 0.5 * {sq} * log2({sq} / {sm}) ELSE 0.0 END"
    )
    psi_sql = (
        f"({sq} - {sp}) * ln(GREATEST({sq}, 1e-09) / GREATEST({sp}, 1e-09))"
    )
    want = {
        i: (psi, js)
        for i, psi, js in con.execute(
            f"SELECT id, ROUND({psi_sql}, 12), ROUND({js_sql}, 12) FROM t"
        ).fetchall()
    }
    bad = [i for i in got if got[i] != want[i]]
    assert not bad, [(i, rows_by_id, got[i], want[i]) for i, rows_by_id in
                     [(i, [r for r in rows if r[0] == i][0]) for i in bad[:3]]]


def test_sketch_ks_graceful_on_one_sided_split(spark, tmp_path):
    """Code-review r5: q156 must not crash when every key hashes to one
    side of the 80/20 split — an absent population reads NaN with a zero
    count, mirroring ks_from_digests' empty-digest grace."""
    # key 4 buckets >= 80 (verified via the same md5 rule the query uses)
    keys = [k for k in range(200) if _bucket(k) >= 80][:3]
    tbl = pa.table(
        {
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_custkey": pa.array([0] * len(keys), pa.int64()),
            "o_orderstatus": pa.array(["F"] * len(keys), pa.string()),
            "o_totalprice": pa.array([100.0] * len(keys), pa.float64()),
            "o_orderpriority": pa.array(["5-LOW"] * len(keys), pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))
    row = all_queries()["q156_ks_drift_sketch"](spark, str(tmp_path)).first()
    assert row["n_ref"] == 0 and row["n_cur"] == len(keys)
    assert row["ks_stat_approx"] != row["ks_stat_approx"]  # NaN


def test_stream_drift_monitor_alerts_on_shift_only(spark, tmp_path):
    """Operational monitor: three drops of a SHIFTED current population
    must leave an evaluation log whose final row alerts (cumulative PSI
    past 0.2), while the same monitor over an UNSHIFTED population logs
    three quiet rows — and the monitor's counts store remains exactly the
    run_stream_psi_counts store (same per-bin PSI terms)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_computing_final_project_spark.streaming.events import (
        drift_monitor_log,
        psi_from_store,
        run_stream_drift_monitor,
    )

    def _run(shift: float, tag: str):
        data_dir = tmp_path / tag
        data_dir.mkdir()
        ref, cur = _write_orders(data_dir, 2000, shift)
        lo, hi = float(ref.min()), float(ref.max())
        width = (hi - lo) / 10.0
        bins = np.clip(np.floor((ref - lo) / width).astype(int), 0, 9)
        ref_counts = spark.createDataFrame(
            [(int(b), int((bins == b).sum())) for b in sorted(set(bins))],
            "bin int, n_ref bigint",
        )
        src = tmp_path / f"stream_{tag}"
        src.mkdir()
        for i, p in enumerate(np.array_split(cur, 3)):
            pq.write_table(
                pa.table({"v": pa.array(p, pa.float64())}),
                str(src / f"drop_{i}.parquet"),
            )
        stream = spark.readStream.schema("v double").option(
            "maxFilesPerTrigger", "1"
        ).parquet(str(src))
        store = str(tmp_path / f"store_{tag}")
        run_stream_drift_monitor(
            stream, ref_counts, lo, width, 10, store, str(tmp_path / f"ck_{tag}")
        )
        return drift_monitor_log(spark, store).collect(), store, ref_counts, cur

    log, store, ref_counts, cur = _run(120.0, "shifted")
    assert [r["batch_id"] for r in log] == [0, 1, 2]
    assert log[-1]["n_cur"] == cur.size  # cumulative counts after drain
    assert log[-1]["alert"] is True
    # the embedded counts store is the psi store: terms readable directly
    import os

    terms = psi_from_store(spark, os.path.join(store, "counts"), ref_counts).collect()
    assert abs(sum(r["psi_term"] for r in terms) - log[-1]["psi_total"]) < 1e-9

    quiet_log, _, _, quiet_cur = _run(0.0, "quiet")
    assert [r["alert"] for r in quiet_log] == [False, False, False]
    assert quiet_log[-1]["n_cur"] == quiet_cur.size


def _plant_segment_shift(tmp_path, n: int = 16000):
    """Planted per-segment shift shared by the q160 twins: uniform values
    (every frozen bin filled — a normal's empty tail bin plus the eps
    floor reads ~0.4 phantom drift at this n), only the 1-URGENT
    segment's current rows moved. Writes orders.parquet and the current
    split as 3 stream drops; returns (edges_rows, count_rows, src_dir)
    with the frozen per-segment edges/histograms derived INDEPENDENTLY
    in numpy.

    n is sized for the quiet assertions: PSI's pure-sampling expectation
    is ~bins/n_cur + bins/n_ref per segment; at n=16000 each segment
    holds ~640 current rows -> noise floor ~0.02, far under the 0.1 line
    (n=4000 measured 0.13 on an unshifted segment — honest noise)."""
    keys = np.arange(n, dtype=np.int64)
    is_ref = np.array([_bucket(int(k)) < 80 for k in keys])
    prio = np.array([_PRIOS[int(k) % 5] for k in keys])  # all prios, BOTH splits
    u = np.array(
        [int(hashlib.md5(f"{k}:v".encode()).hexdigest()[:8], 16) / 16**8 for k in keys]
    )
    v = 1000.0 + 200.0 * u
    v = np.where(~is_ref & (prio == _PRIOS[0]), v + 150.0, v)  # shift ONE segment
    tbl = pa.table(
        {
            "o_orderkey": pa.array(keys, pa.int64()),
            "o_custkey": pa.array(keys % 100, pa.int64()),
            "o_orderstatus": pa.array(["F"] * n, pa.string()),
            "o_totalprice": pa.array(v, pa.float64()),
            "o_orderpriority": pa.array(prio, pa.string()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "orders.parquet"))

    edges_rows, count_rows = [], []
    for seg in _PRIOS:
        rv = v[is_ref & (prio == seg)]
        lo, hi = float(rv.min()), float(rv.max())
        width = (hi - lo) / 10.0
        bins = np.clip(np.floor((rv - lo) / width).astype(int), 0, 9)
        edges_rows.append((seg, lo, width))
        count_rows += [
            (seg, int(b), int((bins == b).sum())) for b in sorted(set(bins))
        ]

    src = tmp_path / "cur_stream"
    src.mkdir()
    cur_idx = np.flatnonzero(~is_ref)
    for i, idx in enumerate(np.array_split(cur_idx, 3)):
        pq.write_table(
            pa.table(
                {
                    "key": pa.array(prio[idx], pa.string()),
                    "v": pa.array(v[idx], pa.float64()),
                }
            ),
            str(src / f"drop_{i}.parquet"),
        )
    return edges_rows, count_rows, str(src)


def _keyed_stream(spark, src_dir: str):
    return (
        spark.readStream.schema("key string, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(src_dir)
    )


def test_keyed_psi_store_equals_batch_q160_and_localizes_shift(spark, tmp_path):
    """q160 per-segment PSI on a planted PER-SEGMENT shift: only the
    1-URGENT segment's current rows moved, so its per-bin terms must sum
    past the 0.2 alert line while every other segment stays quiet — the
    localization a corpus-level PSI (q151) cannot give. The keyed
    streaming store, fed the current split in 3 micro-batches against
    INDEPENDENTLY numpy-derived frozen edges/histograms, must reproduce
    batch q160 row-for-row."""
    from big_data_computing_final_project_spark.streaming.events import (
        psi_by_key_from_store,
        run_stream_psi_counts_by_key,
    )

    edges_rows, count_rows, src_dir = _plant_segment_shift(tmp_path)
    want = [
        tuple(r)
        for r in all_queries()["q160_psi_by_segment"](spark, str(tmp_path)).collect()
    ]
    by_seg: dict[str, float] = {}
    for row in want:
        by_seg[row[0]] = by_seg.get(row[0], 0.0) + row[6]
    assert by_seg[_PRIOS[0]] > 0.2, "shifted segment must alert"
    for seg in _PRIOS[1:]:
        # < 0.1 is the standard "no significant change" PSI reading
        assert abs(by_seg[seg]) < 0.1, f"unshifted segment {seg} must stay quiet"

    ref_edges = spark.createDataFrame(edges_rows, "key string, lo double, width double")
    ref_counts = spark.createDataFrame(count_rows, "key string, bin int, n_ref bigint")
    store = str(tmp_path / "psistore_keyed")
    run_stream_psi_counts_by_key(
        _keyed_stream(spark, src_dir), ref_edges, store, str(tmp_path / "ckpt_psi_keyed")
    )

    got = [tuple(r) for r in psi_by_key_from_store(spark, store, ref_counts).collect()]
    assert got == want


def test_keyed_drift_monitor_alerts_only_shifted_segment(spark, tmp_path):
    """The keyed monitor's per-batch log must flag ONLY the shifted
    segment — in every batch (the shift is present from the first drop) —
    and its final psi_total must equal batch q160's per-segment term sum
    (rounded-terms composition, same floats)."""
    from big_data_computing_final_project_spark.streaming.events import (
        drift_monitor_log_by_key,
        run_stream_drift_monitor_by_key,
    )

    edges_rows, count_rows, src_dir = _plant_segment_shift(tmp_path)
    ref_edges = spark.createDataFrame(edges_rows, "key string, lo double, width double")
    ref_counts = spark.createDataFrame(count_rows, "key string, bin int, n_ref bigint")
    store = str(tmp_path / "monitor_keyed")
    run_stream_drift_monitor_by_key(
        _keyed_stream(spark, src_dir),
        ref_edges,
        ref_counts,
        store,
        str(tmp_path / "ckpt_monitor_keyed"),
    )

    log = drift_monitor_log_by_key(spark, store).collect()
    assert {r["batch_id"] for r in log} == {0, 1, 2}
    assert len(log) == 15  # 3 batches x 5 segments
    for r in log:
        assert r["alert"] == (r["key"] == _PRIOS[0]), (r["batch_id"], r["key"])

    want_by_seg: dict[str, float] = {}
    for row in all_queries()["q160_psi_by_segment"](spark, str(tmp_path)).collect():
        want_by_seg[row["segment"]] = (
            want_by_seg.get(row["segment"], 0.0) + row["psi_term"]
        )
    final = {r["key"]: r["psi_total"] for r in log if r["batch_id"] == 2}
    for seg in _PRIOS:
        assert final[seg] == pytest.approx(want_by_seg[seg], abs=1e-12), seg


def test_token_js_by_source_localizes_the_shifted_feed(spark, tmp_path):
    """q161 on a planted two-source corpus: only srcB's current docs swap
    their vocabulary ('fox' -> 'zebra'); srcB's per-term JS contributions
    must carry the drift (zebra dominates, total past 0.1) while srcA —
    identical text in both splits — reads exactly zero everywhere."""
    n = 1200
    keys = np.arange(n, dtype=np.int64)
    is_ref = np.array([_bucket(int(k)) < 80 for k in keys])
    src = np.where(keys % 2 == 0, "srcA", "srcB")
    texts = [
        "the quick zebra zebra"
        if (not r) and s == "srcB"
        else "the quick brown fox"
        for r, s in zip(is_ref, src)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array(keys, pa.int64()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(["en"] * n, pa.string()),
            "source": pa.array(src, pa.string()),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    rows = all_queries()["q161_token_js_by_source"](spark, str(tmp_path)).collect()
    by_src: dict[str, float] = {}
    terms: dict[str, dict[str, float]] = {}
    for r in rows:
        by_src[r["source"]] = by_src.get(r["source"], 0.0) + r["js_term"]
        terms.setdefault(r["source"], {})[r["term"]] = r["js_term"]
    assert by_src["srcA"] == 0.0  # identical shares split-to-split: every term exactly 0
    assert by_src["srcB"] > 0.1, "shifted feed must carry the divergence"
    assert terms["srcB"]["zebra"] > terms["srcB"]["the"]
    assert "zebra" not in terms["srcA"]


def test_embedding_drift_by_label_localizes_the_shifted_class(spark, tmp_path):
    """q162 on planted embeddings: only label 1's current vectors carry a
    per-dim offset; the per-(label, dim) shifts must recover that offset
    for label 1 and read ~0 for labels 0 and 2."""
    n, dims, delta = 2400, 4, np.array([0.5, -0.25, 0.0, 1.0])
    keys = np.arange(n, dtype=np.int64)
    is_ref = np.array([_bucket(int(k)) < 80 for k in keys])
    label = (keys % 3).astype(np.int32)
    base = np.array(
        [
            [
                int(hashlib.md5(f"{k}:{d}".encode()).hexdigest()[:8], 16) / 16**8
                for d in range(dims)
            ]
            for k in keys
        ]
    )
    shifted = (~is_ref) & (label == 1)
    vecs = np.where(shifted[:, None], base + delta[None, :], base).astype(np.float32)
    tbl = pa.table(
        {
            "vec_id": pa.array(keys, pa.int64()),
            "embedding": pa.array([list(v) for v in vecs], pa.list_(pa.float32())),
            "label": pa.array(label, pa.int32()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "embeddings.parquet"))

    rows = all_queries()["q162_embedding_drift_by_label"](spark, str(tmp_path)).collect()
    assert len(rows) == 3 * dims
    for r in rows:
        want = float(delta[r["dim"]]) if r["label"] == 1 else 0.0
        # per-label halves are ~n/3 of the q154 fixture: mean noise ~0.03
        assert r["shift"] == pytest.approx(want, abs=0.08), (r["label"], r["dim"])
        assert r["shift2"] == pytest.approx(r["shift"] * r["shift"], abs=1e-12)


def test_keyed_monitor_alerts_on_vanished_segment_and_survives_unknown_keys(
    spark, tmp_path
):
    """Two hardening contracts of the keyed store (code-review findings):
    (1) a segment present in the reference but ABSENT from the stream —
    the most extreme drift — must read share-0 (eps-floored) and ALERT,
    not NaN-and-never-alert; (2) a first micro-batch whose keys are all
    unknown to ref_edges stages a part-file-less counts dir, which the
    in-batch evaluation must read as empty (explicit schema) instead of
    crashing the stream on parquet schema inference."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_computing_final_project_spark.streaming.events import (
        drift_monitor_log_by_key,
        run_stream_drift_monitor_by_key,
    )

    ref_edges = spark.createDataFrame(
        [("segA", 0.0, 0.1), ("segB", 0.0, 0.1)], "key string, lo double, width double"
    )
    ref_counts = spark.createDataFrame(
        [("segA", b, 10) for b in range(10)] + [("segB", b, 10) for b in range(10)],
        "key string, bin int, n_ref bigint",
    )

    src = tmp_path / "drops"
    src.mkdir()
    # drop 0: ONLY unknown keys (edges join drops every row -> empty stage)
    pq.write_table(
        pa.table({"key": pa.array(["mystery"] * 5), "v": pa.array([0.5] * 5)}),
        str(src / "drop_0.parquet"),
    )
    # drop 1: segA flows (uniform over the reference bins); segB never arrives
    pq.write_table(
        pa.table(
            {
                "key": pa.array(["segA"] * 100),
                "v": pa.array([(i % 10) * 0.1 + 0.05 for i in range(100)]),
            }
        ),
        str(src / "drop_1.parquet"),
    )
    os.utime(str(src / "drop_0.parquet"), (1_000_000_000, 1_000_000_000))
    os.utime(str(src / "drop_1.parquet"), (1_000_000_100, 1_000_000_100))

    stream = (
        spark.readStream.schema("key string, v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    store = str(tmp_path / "monitor")
    run_stream_drift_monitor_by_key(
        stream, ref_edges, ref_counts, store, str(tmp_path / "ckpt")
    )

    log = {(r["batch_id"], r["key"]): r for r in drift_monitor_log_by_key(spark, store).collect()}

    # batch 0 (unknown keys only): both ref segments have tc=0 -> share-0
    # guard -> finite psi ~= ref-mass * ln(1/eps), alert=True — total loss
    # of a segment is the LOUDEST signal, not a NaN
    for key in ("segA", "segB"):
        r = log[(0, key)]
        assert not math.isnan(r["psi_total"])
        assert r["alert"], (0, key)
    # batch 1: segA matches its uniform reference exactly -> quiet;
    # segB still absent -> still alerting
    assert log[(1, "segA")]["psi_total"] == pytest.approx(0.0, abs=1e-9)
    assert not log[(1, "segA")]["alert"]
    assert log[(1, "segB")]["alert"]


def test_ks_monitor_alerts_on_shift_and_quiet_otherwise(spark, tmp_path):
    """The KS monitor's per-batch log on a planted shift: every batch's
    cumulative statistic clears the alert line, the final entry matches a
    direct post-hoc store evaluation, and an UNSHIFTED planting stays
    quiet in the final (full-population) entry."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_computing_final_project_spark.operators.sketches import (
        build_centroids,
    )
    from big_data_computing_final_project_spark.streaming.events import (
        ks_from_digest_store,
        ks_monitor_log,
        run_stream_ks_monitor,
    )

    for case, shift in (("shifted", 120.0), ("quiet", 0.0)):
        ref, cur = _write_orders(tmp_path, 3000, shift=shift)
        ref_m, ref_w = build_centroids(ref, delta=200.0)
        src = tmp_path / f"vals_{case}"
        src.mkdir()
        for i, p in enumerate(np.array_split(cur, 3)):
            pq.write_table(
                pa.table({"v": pa.array(p, pa.float64())}),
                str(src / f"drop_{i}.parquet"),
            )
        stream = (
            spark.readStream.schema("v double")
            .option("maxFilesPerTrigger", "1")
            .parquet(str(src))
            .selectExpr("'cur' AS k", "v")
        )
        store = str(tmp_path / f"ksmon_{case}")
        run_stream_ks_monitor(
            stream, "k", "v", ref_m, ref_w, store, str(tmp_path / f"ckpt_{case}")
        )
        log = ks_monitor_log(spark, store).collect()
        assert [r["batch_id"] for r in log] == [0, 1, 2]
        assert log[-1]["n_cur"] == cur.size
        ks_direct, n_direct = ks_from_digest_store(
            spark, os.path.join(store, "partials"), ref_m, ref_w
        )
        assert log[-1]["ks_stat"] == pytest.approx(ks_direct, abs=1e-12)
        assert n_direct == cur.size
        if shift:
            # the shift is visible from the very first drop's cumulative view
            assert all(r["alert"] for r in log), case
        else:
            # same distribution: the full-population entry must be quiet
            # (early 1/3-size views carry more sketch+sample noise)
            assert not log[-1]["alert"], case
            assert log[-1]["ks_stat"] < 0.1


def test_ks_monitor_survives_empty_first_drop(spark, tmp_path):
    """A dead feed from the very first micro-batch (zero-row drop) must
    log an n_cur=0 ALERT — not crash the stream on parquet schema
    inference over the part-file-less partials delta (the _psi_fold
    hardening contract, applied to the digest store)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_computing_final_project_spark.operators.sketches import (
        build_centroids,
    )
    from big_data_computing_final_project_spark.streaming.events import (
        ks_monitor_log,
        run_stream_ks_monitor,
    )

    ref_m, ref_w = build_centroids(np.linspace(0.0, 1.0, 200), delta=200.0)
    src = tmp_path / "vals"
    src.mkdir()
    empty = pa.table({"v": pa.array([], pa.float64())})
    pq.write_table(empty, str(src / "drop_0.parquet"))
    pq.write_table(
        pa.table({"v": pa.array(np.linspace(0.0, 1.0, 100))}),
        str(src / "drop_1.parquet"),
    )
    os.utime(str(src / "drop_0.parquet"), (1_000_000_000, 1_000_000_000))
    os.utime(str(src / "drop_1.parquet"), (1_000_000_100, 1_000_000_100))

    stream = (
        spark.readStream.schema("v double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
        .selectExpr("'cur' AS k", "v")
    )
    store = str(tmp_path / "ksmon")
    run_stream_ks_monitor(
        stream, "k", "v", ref_m, ref_w, store, str(tmp_path / "ckpt")
    )
    log = ks_monitor_log(spark, store).collect()
    assert [r["batch_id"] for r in log] == [0, 1]
    assert log[0]["n_cur"] == 0 and log[0]["alert"]  # dead feed: loudest signal
    assert log[1]["n_cur"] == 100 and not log[1]["alert"]  # same distribution
