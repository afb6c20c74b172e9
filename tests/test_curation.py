"""Corpus-curation surface (plans/curation.py, functions/text PII helpers).

Oracle parity for q127-q130 runs via test_oracle_parity.py; these tests pin
the *properties* the oracles can't see: determinism across runs, cap/sample
invariants, and the regex-PII redactor on planted fixtures (the synthetic
corpus contains no PII, so the redactor needs its own data).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from big_data_computing_final_project_spark.functions import text as X
from big_data_computing_final_project_spark.plans import all_queries

_Q = all_queries()


def test_redact_pii_planted(spark):
    rows = [
        ("a", "contact me at jane.doe+x@example.co.uk please"),
        ("b", "call +1 (415) 555-0199 or 4155550199 now"),
        ("c", "ssn-ish 123456789 and short 12345 stays"),
        ("d", "clean text with no identifiers at all"),
        # ADVICE r3: generic numeric text must survive the phone pattern
        ("e", "dated 2023-01-01 and again 2024-12-31 end"),
        ("f", "readings 1.5 2.3 4.5 6.7 recorded"),
        ("g", None),
        # code-review r4: SPACE-adjacent dates / long decimal lists must
        # not fuse into one "phone"; long digit runs must mask WHOLE (no
        # 10-digit prefix match leaking the tail); spaced international
        # +CC numbers still mask
        ("h", "window 2023-01-01 2024-12-31 closed"),
        ("i", "series 1.5 2.3 4.5 6.7 8.9 0.1 done"),
        ("j", "card 123456789012345 end"),
        ("k", "ring +44 20 7946 0958 now"),
        # ADVICE r4: separator-JOINED numeric runs are not phones either —
        # dotted version/section strings and dash-joined date ranges must
        # survive the bare-run branch (it now requires contiguous digits)
        ("l", "section 1.2.3.4.5.6.7.8.9.10.1 cited"),
        ("m", "range 2023-01-01-2024-12-31 active"),
    ]
    df = spark.createDataFrame(rows, ["k", "t"])
    out = {
        r["k"]: (r["red"], r["hits"])
        for r in df.select(
            "k",
            X.redact_pii(F.col("t")).alias("red"),
            X.pii_hits(F.col("t")).alias("hits"),
        ).collect()
    }
    assert out["a"] == ("contact me at <pii> please", 1)
    # the (415) form matches the phone pattern; the bare 10-digit run
    # matches phone first (longer match wins at the same start offset)
    assert out["b"][0] == "call <pii> or <pii> now"
    assert out["b"][1] == 2
    # 9-digit run masked, 5-digit run kept
    assert out["c"] == ("ssn-ish <pii> and short 12345 stays", 1)
    assert out["d"] == ("clean text with no identifiers at all", 0)
    # dates and decimal-number sequences are NOT phone numbers (ADVICE r3)
    assert out["e"] == ("dated 2023-01-01 and again 2024-12-31 end", 0)
    assert out["f"] == ("readings 1.5 2.3 4.5 6.7 recorded", 0)
    # null text: hits is 0, not NULL — audit sums must not drop the row
    assert out["g"] == (None, 0)
    assert out["h"] == ("window 2023-01-01 2024-12-31 closed", 0)
    assert out["i"] == ("series 1.5 2.3 4.5 6.7 8.9 0.1 done", 0)
    assert out["j"] == ("card <pii> end", 1)  # whole run, no digit tail
    assert out["k"] == ("ring <pii> now", 1)
    assert out["l"] == ("section 1.2.3.4.5.6.7.8.9.10.1 cited", 0)
    assert out["m"] == ("range 2023-01-01-2024-12-31 active", 0)


def test_redact_pii_no_double_count(spark):
    # an email whose local part contains a long digit run must count once
    df = spark.createDataFrame([("x", "mail 123456789@example.com end")], ["k", "t"])
    r = df.select(
        X.redact_pii(F.col("t")).alias("red"), X.pii_hits(F.col("t")).alias("hits")
    ).collect()[0]
    assert r["red"] == "mail <pii> end"
    assert r["hits"] == 1


def test_q127_deterministic_and_bounded(spark, sf_dir):
    a = _Q["q127_curriculum_sample"](spark, sf_dir).collect()
    b = _Q["q127_curriculum_sample"](spark, sf_dir).collect()
    assert a == b
    totals = {
        r["source"]: r["n_docs"]
        for r in _Q["q103_mixture_weights"](spark, sf_dir).collect()
    }
    for r in a:
        assert 0.0 < r["p_accept"] <= 1.0
        assert 0 < r["n_kept"] <= totals[r["source"]]
    # smallest source gets the max acceptance probability (temperature
    # upsampling), and at least one source is actually subsampled
    assert any(r["p_accept"] < 1.0 or r["n_kept"] < totals[r["source"]] for r in a)


def test_q128_cap_invariants(spark, sf_dir):
    rows = _Q["q128_per_source_cap"](spark, sf_dir).collect()
    per_src: dict[str, list[int]] = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r["rk"])
    for rks in per_src.values():
        assert rks == list(range(1, len(rks) + 1))
        assert len(rks) <= 10
    # deterministic across runs
    assert rows == _Q["q128_per_source_cap"](spark, sf_dir).collect()


def test_q129_mask_counts_match_manual(spark, sf_dir):
    out = _Q["q129_term_mask"](spark, sf_dir)
    joined = (
        out.alias("m")
        .join(
            spark.read.parquet(f"{sf_dir}/documents.parquet").alias("d"),
            "doc_id",
        )
        .select(
            "m.n_masked",
            F.size(
                F.filter(
                    X.tokens(F.col("d.text")),
                    lambda t: t.isin("customer", "supplier"),
                )
            ).cast("bigint").alias("manual"),
        )
        .collect()
    )
    assert joined and all(r["n_masked"] == r["manual"] for r in joined)


def test_q130_topk_ordered(spark, sf_dir):
    rows = _Q["q130_tfidf_terms"](spark, sf_dir).collect()
    per_src: dict[str, list] = {}
    for r in rows:
        per_src.setdefault(r["source"], []).append(r)
    for rs in per_src.values():
        assert len(rs) <= 5
        scores = [r["score"] for r in rs]
        assert scores == sorted(scores, reverse=True)
        for r in rs:
            assert abs(r["score"] - r["tf"] / r["df"]) < 1e-12


def test_q132_funnel_stages_on_planted_corpus(spark, tmp_path):
    """Every funnel stage must fire: plant a corpus with a known-bad doc
    (quality), an exact duplicate pair (dedup), and a doc containing a
    bench-split document's shingles (decontamination) — then require the
    Spark funnel to hash-match the DuckDB oracle on the SAME planted data
    (the sf tables contain no exact dups, so this is where the dedup and
    decontam stages earn their counts)."""
    import hashlib

    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_computing_final_project_spark.plans import all_oracles
    from tools.check_oracle import frame_digest

    def bucket(i: int) -> int:
        return int(hashlib.md5(str(i).encode()).hexdigest()[:15], 16) % 100

    train_ids = [i for i in range(400) if bucket(i) < 80]
    bench_ids = [i for i in range(400) if bucket(i) >= 90]
    good = "the data is good and it is fine for the test " * 8
    bench_text = "alpha beta gamma delta epsilon zeta"
    contaminated = good + bench_text
    rows = [
        # srcA: two good docs + one exact duplicate pair member + one junk
        (train_ids[0], good + "one", "en", "srcA"),
        (train_ids[1], good + "two", "en", "srcA"),
        (train_ids[2], good + "two", "en", "srcA"),   # dup of previous
        (train_ids[3], "@@@@ ####", "en", "srcA"),    # fails quality
        # srcB: a good doc + the contaminated doc
        (train_ids[4], good + "three", "en", "srcB"),
        (train_ids[5], contaminated, "en", "srcB"),
        # bench split: the eval document
        (bench_ids[0], bench_text, "en", "benchsrc"),
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    sdf = _Q["q132_corpus_funnel"](spark, str(tmp_path))
    srows = {r["source"]: r for r in sdf.collect()}

    a = srows["srcA"]
    assert (a["n_raw"], a["n_quality"], a["n_dedup"]) == (4, 3, 2)
    assert a["n_clean"] == 2  # nothing contaminated in srcA
    b = srows["srcB"]
    assert (b["n_raw"], b["n_quality"], b["n_dedup"]) == (2, 2, 2)
    assert b["n_clean"] == 1  # the planted contaminated doc dropped
    assert "benchsrc" not in srows  # bench split is not part of the corpus

    con = duckdb.connect()
    con.sql(
        f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'"
    )
    res = con.sql(all_oracles()["q132_corpus_funnel"])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    got = [tuple(r) for r in sdf.collect()]
    assert len(got) == len(drows)
    assert frame_digest(sdf.columns, got) == frame_digest(dcols, drows)


def test_q144_priority_keeper_beats_min_docid(spark, tmp_path):
    """Priority dedup must keep the higher-tier copy even when the lower
    tier has the smaller doc_id (the exact case where q34's min-doc_id
    policy and q144's tier policy disagree), and the result must
    hash-match the DuckDB oracle on the planted data."""
    import duckdb
    import pyarrow as pa
    import pyarrow.parquet as pq

    from big_data_computing_final_project_spark.plans import all_oracles
    from tools.check_oracle import frame_digest

    # src10 -> tier 1, src21 -> tier 0 (higher priority), src2 -> tier 2,
    # 'webcrawl' (no trailing digits) -> fallback tier 3 (least trusted)
    rows = [
        (1, "dup text one", "en", "src10"),   # lower doc_id, tier 1
        (2, "dup text one", "en", "src21"),   # higher doc_id, tier 0 -> keeper
        (3, "dup text one", "en", "src2"),    # tier 2 -> lost
        (4, "unique text", "en", "src10"),
        (0, "dup text one", "en", "webcrawl"),  # lowest doc_id but NO tier:
        # must NOT win the group (Spark null would sort first; the
        # coalesce-to-3 fallback pins it last in both engines)
    ]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
            "lang": pa.array([r[2] for r in rows], pa.string()),
            "source": pa.array([r[3] for r in rows], pa.string()),
            "n_chars": pa.array([len(r[1]) for r in rows], pa.int64()),
        }
    )
    pq.write_table(tbl, str(tmp_path / "documents.parquet"))

    sdf = _Q["q144_priority_dedup"](spark, str(tmp_path))
    got = {r["source"]: (r["tier"], r["n_kept"], r["n_lost"]) for r in sdf.collect()}
    assert got["src21"] == (0, 1, 0)   # tier-0 copy kept despite doc_id 2
    assert got["src10"] == (1, 1, 1)   # doc 1 lost to the tier-0 twin, doc 4 kept
    assert got["src2"] == (2, 0, 1)
    assert got["webcrawl"] == (3, 0, 1)  # digit-less source loses, never errors

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    res = con.sql(all_oracles()["q144_priority_dedup"])
    drows = res.fetchall()
    assert frame_digest(sdf.columns, [tuple(r) for r in sdf.collect()]) == frame_digest(
        [d[0] for d in res.description], drows
    )


def test_q145_shards_balanced_and_deterministic(spark, sf_dir):
    """The md5 shard assignment must (a) be identical across runs — the
    whole point of a reproducible shuffle — and (b) spread docs uniformly:
    no shard more than 2x the mean at this corpus size."""
    a = _Q["q145_shuffle_shard_manifest"](spark, sf_dir).collect()
    b = _Q["q145_shuffle_shard_manifest"](spark, sf_dir).collect()
    assert [tuple(r) for r in a] == [tuple(r) for r in b]
    counts = [r["n_docs"] for r in a]
    mean = sum(counts) / len(counts)
    assert max(counts) <= 2 * mean
    # key ranges are valid hex intervals (readers use them as resume points)
    for r in a:
        assert r["key_lo"] <= r["key_hi"]
        assert len(r["key_hi"]) == 32


def test_q147_budget_conserved_and_upsamples_small_sources(spark, sf_dir):
    rows = _Q["q147_token_budget_plan"](spark, sf_dir).collect()
    assert len(rows) >= 2
    total_planned = sum(r["planned_tokens"] for r in rows)
    # floor rounding loses at most 1 token per source, never over-allocates
    assert 10_000_000 - len(rows) <= total_planned <= 10_000_000
    # sqrt temperature: the smallest source gets the largest repeat factor
    by_tokens = sorted(rows, key=lambda r: r["n_tokens"])
    assert by_tokens[0]["repeat_factor"] == max(r["repeat_factor"] for r in rows)
    for r in rows:
        assert r["planned_tokens"] > 0
        assert abs(r["repeat_factor"] - r["planned_tokens"] / r["n_tokens"]) < 1e-12


def test_q157_report_card_on_planted_corpus(spark, tmp_path):
    """Per-source report card on a planted corpus: the dup exposure is
    CROSS-source (doc 1's copies live in srcB, yet srcA's dup_docs counts
    doc 1), token/char/lang stats are per-source exact. Hash-matched
    against the DuckDB oracle on the same data."""
    import duckdb

    from _fixtures import write_planted_corpus
    from big_data_computing_final_project_spark.plans import all_oracles
    from tools.check_oracle import frame_digest

    rows = [
        (1, "Shared Text One", "en", "srcA"),    # in a 3-group: dup
        (2, "shared  text  one", "en", "srcB"),  # dup
        (3, "shared text one", "en", "srcB"),    # dup
        (4, "unique alpha", "en", "srcA"),
        (5, "unique beta", "de", "srcB"),
        (6, "SOLO GAMMA", "en", "srcC"),
    ]
    write_planted_corpus(tmp_path, rows)

    sdf = _Q["q157_corpus_report_card"](spark, str(tmp_path))
    got = [tuple(r) for r in sdf.collect()]
    assert got == [
        ("srcA", 2, 5, (15 + 12) / 2, 1, 1, 0.5),
        ("srcB", 3, 8, (17 + 15 + 11) / 3, 2, 2, 2 / 3),
        ("srcC", 1, 2, 10.0, 1, 0, 0.0),
    ]

    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{tmp_path}/documents.parquet'")
    res = con.sql(all_oracles()["q157_corpus_report_card"])
    assert frame_digest(sdf.columns, got) == frame_digest(
        [d[0] for d in res.description], res.fetchall()
    )


# ---------------------------------------------------------------------------
# q190 weighted sampling (A-ES)
# ---------------------------------------------------------------------------


def test_weighted_sample_deterministic_and_k_per_source(spark, sf_dir):
    q = all_queries()["q190_weighted_sample"]
    a = [tuple(r) for r in q(spark, sf_dir).collect()]
    b = [tuple(r) for r in q(spark, sf_dir).collect()]
    assert a == b and a
    per_src = {}
    n_docs_per_src = {}
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    for r in docs.groupBy("source").count().collect():
        n_docs_per_src[r.source] = r["count"]
    for row in a:
        per_src[row[1]] = per_src.get(row[1], 0) + 1
    for src, n in per_src.items():
        assert n == min(50, n_docs_per_src[src])


def test_weighted_sample_inclusion_matches_aes_theory(spark):
    """K=1 A-ES property: P(pick i) = w_i / sum(w) exactly. 600 salts over
    weights (1, 3, 6) in ONE job; frequencies must converge (binomial sd
    ~0.02 at n=600; tolerance 4 sd)."""
    from pyspark.sql import functions as F

    from big_data_computing_final_project_spark.plans.curation import (
        weighted_sample,
    )

    # 600 independent trials: each trial is its own source with FRESH doc
    # ids (the sampler's uniform hashes doc_id, so ids must differ across
    # trials for the draws to be independent)
    docs = spark.createDataFrame(
        [(1, 1.0), (2, 3.0), (3, 6.0)], "base long, weight double"
    )
    trials = spark.range(600).select(F.col("id").alias("trial"))
    tagged = docs.crossJoin(trials).select(
        (F.col("trial") * 10 + F.col("base")).alias("doc_id"),
        F.concat(F.lit("s"), "trial").alias("source"),
        "weight",
    )
    picked = weighted_sample(tagged, 1, F.col("weight"), salt="prop")
    freq = {
        r.base: r["count"]
        for r in picked.select((F.col("doc_id") % 10).alias("base"))
        .groupBy("base")
        .count()
        .collect()
    }
    n = sum(freq.values())
    assert n == 600
    for doc, w in ((1, 0.1), (2, 0.3), (3, 0.6)):
        got = freq.get(doc, 0) / n
        assert abs(got - w) < 0.08, (doc, got)


def test_q132_contaminated_join_aqe_broadcasts_when_small(spark, sf_dir):
    """VERDICT r7 item 1 (q132 leg): the contaminated-doc join is UNHINTED
    — static Catalyst stats after explode+join+groupBy are useless for a
    size guard, so AQE must decide from the TRUE runtime size. Evidence
    that the design works: at gate SF the finished adaptive plan shows the
    flagged-vs-contaminated join promoted to a broadcast join (so the
    common case pays no shuffle-join penalty), while a genuinely large
    contaminated set would keep the shuffle join instead of OOMing."""
    import re

    df = _Q["q132_corpus_funnel"](spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in plan
    assert re.search(
        r"BroadcastHashJoin \[doc_id#\d+L?\], \[train_doc#\d+L?\]", plan
    ), plan[:1500]


def test_q223_fertility_quality_matrix_invariants(spark, sf_dir):
    """q223 (round-9): per-source band shares sum to 1; band doc counts
    and char/word totals partition q210's per-source totals exactly (same
    text IS NOT NULL population, different grouping); the band label is
    consistent with the q33 composite at the cut points."""
    from collections import defaultdict

    from big_data_computing_final_project_spark.plans import all_queries

    q = all_queries()
    out = q["q223_fertility_quality_matrix"](spark, sf_dir).collect()
    assert {r.q_band for r in out} <= {"low", "mid", "high"}
    by_src = defaultdict(lambda: [0, 0, 0, 0.0])
    for r in out:
        acc = by_src[r.source]
        acc[0] += r.n_docs
        acc[1] += r.total_chars
        acc[2] += r.total_words
        acc[3] += r.source_share
        assert abs(r.chars_per_word - r.total_chars / r.total_words) < 1e-12
    fert = {r.source: r for r in q["q210_tokenizer_fertility"](spark, sf_dir).collect()}
    assert set(by_src) == set(fert)
    for src, (n, ch, wo, share) in by_src.items():
        assert (n, ch, wo) == (
            fert[src].n_docs, fert[src].total_chars, fert[src].total_words
        ), src
        assert abs(share - 1.0) < 1e-9, src


def test_q224_segment_calibration_invariants(spark, sf_dir):
    """q224: bins partition each segment's customer count; seg_max_gap is
    the max of the segment's per-bin gaps; flagged follows the 0.1 rule."""
    from collections import defaultdict

    from big_data_computing_final_project_spark.catalog import load_table
    from big_data_computing_final_project_spark.plans import all_queries

    out = all_queries()["q224_segment_calibration"](spark, sf_dir).collect()
    per = defaultdict(list)
    for r in out:
        per[r.segment].append(r)
    cust = load_table(spark, sf_dir, "customer")
    seg_counts = {
        r.segment: r.n
        for r in cust.groupBy(cust.c_mktsegment.alias("segment")).count()
        .withColumnRenamed("count", "n").collect()
    }
    assert set(per) == set(seg_counts)
    for seg, rows in per.items():
        assert sum(r.n for r in rows) == seg_counts[seg]
        mx = max(r.gap for r in rows)
        for r in rows:
            assert r.seg_max_gap == mx
            assert r.flagged == (mx > 0.1)
            assert 0.0 <= r.mean_pred <= 1.0 and 0.0 <= r.frac_pos <= 1.0


def test_q225_ngram_novelty_planted_and_invariants(spark, tmp_path, sf_dir):
    """q225 on a planted corpus: a mirrored pair has zero unique shingles,
    an original doc is fully unique; and on the real corpus the exact-sum
    invariants hold (unique <= total, shares in [0,1], min <= max)."""
    from _fixtures import write_planted_corpus

    from big_data_computing_final_project_spark.plans import all_queries

    q = all_queries()["q225_ngram_novelty"]
    corpus = write_planted_corpus(
        tmp_path / "nov",
        [
            (1, "alpha beta gamma delta epsilon", "en", "mirror"),
            (2, "alpha beta gamma delta epsilon", "en", "mirror"),
            (3, "one two three four five six", "en", "orig"),
        ],
    )
    rows = {r.source: r for r in q(spark, corpus).collect()}
    assert rows["mirror"].unique_shingles == 0
    assert rows["mirror"].novelty_share == 0.0
    assert rows["mirror"].max_doc_novelty == 0.0
    assert rows["orig"].novelty_share == 1.0
    assert rows["orig"].min_doc_novelty == 1.0

    for r in q(spark, sf_dir).collect():
        assert 0 <= r.unique_shingles <= r.total_shingles
        assert 0.0 <= r.novelty_share <= 1.0
        assert 0.0 <= r.min_doc_novelty <= r.max_doc_novelty <= 1.0


def test_q226_dedup_adjusted_budget_planted_and_invariants(spark, tmp_path, sf_dir):
    """q226 on a planted corpus: doc 2 (srcB) is a byte-identical copy of
    doc 1 (srcA), so the cluster's tokens count ONCE at the keeper's
    source — srcA keeps its full mass (dup_discount 1.0) while srcB's
    effective mass drops by exactly the duplicated document. On the real
    corpus the exact-sum invariants hold."""
    from _fixtures import write_planted_corpus

    from big_data_computing_final_project_spark.plans import all_queries

    q = all_queries()["q226_dedup_adjusted_budget"]
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    corpus = write_planted_corpus(
        tmp_path / "budget",
        [
            (1, shared, "en", "srcA"),
            (2, shared, "en", "srcB"),
            (3, "one two three four five six seven eight nine ten", "en", "srcB"),
        ],
    )
    rows = {r.source: r for r in q(spark, corpus).collect()}
    a, b = rows["srcA"], rows["srcB"]
    assert a.eff_tokens == a.raw_tokens and a.dup_discount == 1.0
    # doc 2's tokens (== doc 1's: identical text) vanish from srcB's
    # effective mass; doc 3 is its only keeper
    assert b.eff_tokens == b.raw_tokens - a.raw_tokens
    assert 0.0 < b.dup_discount < 1.0
    for r in (a, b):
        assert r.wt == int(float(r.eff_tokens) ** 0.5)
        assert r.planned_tokens >= 0
        if r.eff_tokens > 0:
            assert abs(r.repeat_factor - r.planned_tokens / r.eff_tokens) < 1e-12

    out = q(spark, sf_dir).collect()
    assert out
    from big_data_computing_final_project_spark.plans.curation import _BUDGET_TOKENS

    assert sum(r.planned_tokens for r in out) <= _BUDGET_TOKENS
    for r in out:
        assert 0 < r.eff_tokens <= r.raw_tokens
        assert 0.0 < r.dup_discount <= 1.0


def test_q232_curation_scorecard_planted_flags(spark, tmp_path, sf_dir):
    """q232 on a planted corpus where each flag fires in isolation:
    srcDup (3 identical docs -> dup + zero-novelty flags, 'reduce'),
    srcBad (ids = 7/14/21 -> every blob malformed by the q220 planting
    rule, 'review'), srcWide (long words -> fertility flag, 'review'),
    srcClean (none, 'renew'). On the real corpus: flag arithmetic and
    the recommendation mapping hold row-by-row."""
    from _fixtures import write_planted_corpus

    from big_data_computing_final_project_spark.plans import all_queries
    from big_data_computing_final_project_spark.plans.curation import (
        _SC_CPW_T,
        _SC_DUP_T,
        _SC_MAL_T,
        _SC_NOV_T,
    )

    q = all_queries()["q232_curation_scorecard"]
    dup = "alpha beta gamma delta epsilon zeta eta theta"
    corpus = write_planted_corpus(
        tmp_path / "scorecard",
        [
            (1, "one two three four five six seven eight", "en", "srcClean"),
            (2, "nine ten eleven twelve thirteen fourteen", "en", "srcClean"),
            (4, dup, "en", "srcDup"),
            (5, dup, "en", "srcDup"),
            (6, dup, "en", "srcDup"),
            (7, "crawl fetch parse index rank serve cache", "en", "srcBad"),
            (14, "shard merge sort spill flush commit sync", "en", "srcBad"),
            (21, "queue retry backoff jitter deadline abort", "en", "srcBad"),
            (8, "supercalifragilisticexpialidocious anthropomorphization internationalization incomprehensibilities", "en", "srcWide"),
        ],
    )
    rows = {r.source: r for r in q(spark, corpus).collect()}
    assert rows["srcClean"].n_flags == 0
    assert rows["srcClean"].recommendation == "renew"
    assert rows["srcDup"].dup_rate == 1.0 and rows["srcDup"].novelty_share == 0.0
    assert rows["srcDup"].n_flags == 2 and rows["srcDup"].recommendation == "reduce"
    assert rows["srcBad"].malformed_share == 1.0
    assert rows["srcBad"].n_flags == 1 and rows["srcBad"].recommendation == "review"
    assert rows["srcWide"].chars_per_word > _SC_CPW_T
    assert rows["srcWide"].n_flags == 1 and rows["srcWide"].recommendation == "review"

    out = q(spark, sf_dir).collect()
    assert len(out) > 0
    for r in out:
        expect = sum(
            [
                r.dup_rate > _SC_DUP_T,
                r.malformed_share > _SC_MAL_T,
                r.novelty_share < _SC_NOV_T,
                r.chars_per_word > _SC_CPW_T,
            ]
        )
        assert r.n_flags == expect
        assert r.recommendation == {0: "renew", 1: "review"}.get(r.n_flags, "reduce")


def test_q233_clean_token_budget_planted_and_invariants(spark, tmp_path, sf_dir):
    """q233 on a planted corpus: cluster {1,2} (jac 58/68) has a
    CONTAMINATED dedup keeper (doc 1 contains 3/3 of bench doc 9's
    shingles; md5 buckets: 1-8,10 train, 9/11 bench) — the clean mass
    falls to the clean twin doc 2; srcB's only doc fully contains bench
    doc 11 so its clean mass is 0; clean singletons keep everything.
    On the real corpus: clean <= eff <= raw and the plan math holds."""
    from _fixtures import write_planted_corpus

    from big_data_computing_final_project_spark.plans import all_queries

    q = all_queries()["q233_clean_token_budget"]
    tail = " ".join(f"w{i}" for i in range(1, 61))
    corpus = write_planted_corpus(
        tmp_path / "cleanbudget",
        [
            (1, "leak1 leak2 leak3 leak4 leak5 " + tail, "en", "srcA"),
            (2, "x1 x2 x3 x4 x5 " + tail, "en", "srcA"),
            (3, "secret one two three four filler words here more stuff", "en", "srcB"),
            (4, "clean unrelated content entirely different words here today", "en", "srcC"),
            (9, "leak1 leak2 leak3 leak4 leak5", "en", "srcEval"),
            (11, "secret one two three four", "en", "srcEval"),
        ],
    )
    rows = {r.source: r for r in q(spark, corpus).collect()}
    a = rows["srcA"]
    assert (a.n_docs, a.raw_tokens, a.eff_tokens, a.clean_tokens) == (2, 130, 65, 65)
    assert a.clean_share == 0.5
    b = rows["srcB"]
    assert (b.raw_tokens, b.eff_tokens, b.clean_tokens) == (10, 10, 0)
    assert b.repeat_factor is None and b.wt == 0
    c = rows["srcC"]
    assert c.eff_tokens == c.clean_tokens == c.raw_tokens
    ev = rows["srcEval"]  # bench docs are never "contaminated train docs"
    assert ev.clean_tokens == ev.raw_tokens == 10

    from big_data_computing_final_project_spark.plans.curation import _BUDGET_TOKENS

    out = q(spark, sf_dir).collect()
    assert out and sum(r.planned_tokens for r in out) <= _BUDGET_TOKENS
    # per source clean <=/>= eff is NOT an invariant: a contaminated
    # dedup keeper moves the cluster's clean mass to a different member
    # (different nt, possibly a different source) — observed at sf0.01.
    for r in out:
        assert 0 <= r.clean_tokens <= r.raw_tokens
        assert 0 <= r.eff_tokens <= r.raw_tokens
        assert r.wt == int(float(r.clean_tokens) ** 0.5)
