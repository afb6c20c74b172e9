"""Structured Streaming over the events table (SURVEY.md §2.10).

The reference has no streaming; the engine defines the streaming surface as
*the same logical plans as plans/events.py* executed incrementally:

    readStream (file source) → withWatermark → window agg → writeStream

Batch/stream equivalence is the correctness contract: a tumbling-window
aggregation run with an ``availableNow`` trigger over the static events
file must produce exactly the batch result (tests/test_streaming.py), which
itself is DuckDB-oracle-checked (q27). Late-data semantics (watermark) and
stateful dedup (`dropDuplicatesWithinWatermark`) follow Spark's documented
model — SURVEY §4 notes there is no reference behavior to copy.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..catalog import _stored_as_nanos, epoch_us, normalize_events_ts
from ..functions.stats import dec_sum


def stream_events(spark: SparkSession, sf_dir: str, watermark: str = "1 hour") -> DataFrame:
    """File-source stream of the events table with event-time watermark.

    At scale the source would be Kafka/queue; the file source keeps the
    identical downstream plan. The stream schema is taken from a batch read
    of the same file (a footer-only operation), so whichever physical
    timestamp encoding the file uses (nanos-as-long legacy files or native
    micros) flows through the same normalization as the batch catalog.
    """
    if _stored_as_nanos(f"{sf_dir}/events.parquet"):
        # a TIMESTAMP(NANOS) file physically cannot be scanned without this
        # legacy conf; set only when the footer proves it (read-only on
        # session state for the micros files the driver generates today)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    file_schema = spark.read.parquet(f"{sf_dir}/events.parquet").schema
    raw = (
        spark.readStream.schema(file_schema)
        .option("pathGlobFilter", "events.parquet")
        .parquet(sf_dir)
    )
    # Watermarks require TimestampType (EVENT_TIME_IS_NOT_ON_TIMESTAMP_TYPE
    # rejects TIMESTAMP_NTZ), so the stream path converts the normalized
    # NTZ wall clock to the equivalent UTC instant. timestamp_micros(long)
    # is a zone-free construction — no session-timezone detour — so the
    # stream's window bounds land on the same wall clocks as the NTZ batch
    # plans under a UTC-rendering collect.
    ntz = normalize_events_ts(raw)
    return ntz.withColumn(
        "ts", F.timestamp_micros(epoch_us(F.col("ts")))
    ).withWatermark("ts", watermark)


def tumbling_counts(events: DataFrame, duration: str = "1 hour") -> DataFrame:
    """The q27 plan, streaming-ready: incremental stateful window agg."""
    return (
        events.groupBy(F.window("ts", duration).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum(F.col("value")).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def enrich_stream(events: DataFrame, customer: DataFrame) -> DataFrame:
    """Stream-static join + aggregate (the q83 plan with a streaming fact):
    the static customer dim broadcasts to every micro-batch, so the only
    stateful operator is the final windowless aggregate. At scale the dim
    refreshes by re-resolving the batch side per trigger — Spark re-plans
    stream-static joins each micro-batch."""
    cust = customer.select("c_custkey", "c_mktsegment")
    return (
        events.join(F.broadcast(cust), events.user_id == cust.c_custkey)
        .groupBy("c_mktsegment", "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), dec_sum(F.col("value")).alias("total_value"))
    )


def view_click_join_stream(
    views: DataFrame, clicks: DataFrame, window: str = "10 minutes"
) -> DataFrame:
    """Stream-stream interval join (the q84 plan, incremental): clicks
    attribute to a same-user view within (v_ts, v_ts + window]. Both sides
    must carry a watermark; the time bound lets Spark expire view-side
    state once the click watermark passes v_ts + window — bounded state,
    the thing an unconstrained stream-stream join can't promise."""
    v = views.select(
        F.col("user_id"),
        F.col("event_id").alias("view_id"),
        F.col("ts").alias("v_ts"),
    )
    c = clicks.select(
        F.col("user_id").alias("c_user"),
        F.col("event_id").alias("click_id"),
        F.col("ts").alias("c_ts"),
    )
    return v.join(
        c,
        F.expr(
            f"user_id = c_user AND c_ts > v_ts AND c_ts <= v_ts + interval {window}"
        ),
    ).select(
        "user_id",
        "view_id",
        "click_id",
        (epoch_us(F.col("c_ts")) - epoch_us(F.col("v_ts"))).alias("gap_us"),
    )



def _drain_available_now(q, timeout_sec: int, label: str) -> None:
    """Wait for an availableNow query to drain its backlog, stop it, and
    RAISE if the timeout lapsed first: a timed-out drain leaves partially
    ingested stores/sinks, and returning silently would let callers fold
    confidently wrong answers out of the missing-tail state."""
    done = q.awaitTermination(timeout_sec)
    if q.isActive:
        q.stop()
    if not done:
        raise TimeoutError(
            f"{label}: streaming backlog did not drain within {timeout_sec}s; "
            "store/sink state is partial"
        )


def _run_foreach_batch(
    src: DataFrame,
    fn,
    checkpoint_dir: str,
    timeout_sec: int,
    label: str,
    output_mode: str | None = None,
) -> None:
    """The shared foreachBatch runner: checkpointed availableNow trigger,
    drained with a hard timeout (see _drain_available_now)."""
    w = src.writeStream.foreachBatch(fn)
    if output_mode is not None:
        w = w.outputMode(output_mode)
    q = (
        w.option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _drain_available_now(q, timeout_sec, label)


def run_stream_to_memory(
    result: DataFrame, query_name: str, checkpoint_dir: str, timeout_sec: int = 120
) -> None:
    """Execute a streaming result with trigger(availableNow): process the
    full backlog incrementally, then stop — the batch-equivalence harness."""
    q = (
        result.writeStream.format("memory")
        .queryName(query_name)
        .outputMode("complete")
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    _drain_available_now(q, timeout_sec, "run_stream_to_memory")


def run_stream_to_parquet(
    result: DataFrame, out_dir: str, checkpoint_dir: str, timeout_sec: int = 120
) -> None:
    """Append-mode parquet file sink with checkpointing — the streaming
    twin of sources/io.write_parquet (S2 for streams). The checkpoint's
    WAL + file-manifest commit protocol gives exactly-once file output
    across restarts; availableNow drains the backlog then stops."""
    q = (
        result.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    _drain_available_now(q, timeout_sec, "run_stream_to_parquet")


def run_stream_upsert(
    result: DataFrame,
    key_cols: list[str],
    out_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch upsert sink: maintain a keyed parquet table where each
    micro-batch's rows REPLACE prior rows with the same key (the streaming
    materialized-view pattern for update-mode window aggregates, which the
    plain file sink can't express — it only appends).

    Each batch runs merge = (current ∖ batch-keys) ∪ batch as an ordinary
    batch job — a left_anti join against the (small, aggregated) batch keys
    — then atomically swaps the table directory. At warehouse scale the
    swap becomes a Delta/Iceberg MERGE INTO with the identical foreachBatch
    body; plain parquet keeps this container-runnable. foreachBatch may
    re-run a batch on recovery: the merge is idempotent on keys, so
    replays converge (at-least-once in, exactly-once effect).
    """
    import os
    import shutil

    spark = result.sparkSession

    def upsert(batch: DataFrame, batch_id: int) -> None:
        data_dir = os.path.join(out_dir, "data")
        tmp_dir = os.path.join(out_dir, f"_stage_{batch_id}")
        if os.path.exists(data_dir):
            current = spark.read.parquet(data_dir)
            merged = current.join(
                F.broadcast(batch.select(*key_cols).distinct()), key_cols, "left_anti"
            ).unionByName(batch)
        else:
            merged = batch
        merged.write.mode("overwrite").parquet(tmp_dir)
        if os.path.exists(data_dir):
            shutil.rmtree(data_dir)
        os.replace(tmp_dir, data_dir)

    _run_foreach_batch(
        result, upsert, checkpoint_dir, timeout_sec, "run_stream_upsert", output_mode="update"
    )


def run_stream_tdigest(
    events: DataFrame,
    key_col: str,
    value_col: str,
    store_dir: str,
    checkpoint_dir: str,
    delta: float = 200.0,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch incremental sketching: every micro-batch appends its
    t-digest PARTIALS (key, means[], weights[]) to a parquet store; any
    later reader answers quantile queries from the store alone via
    ``sketch_store_quantiles`` — no raw event is ever revisited.

    This is the streaming face of the mergeable-summary property
    (operators/sketches): partial states are associative, so
    batch-at-a-time appends commute with one big batch build. The store
    grows O(batches × keys × δ) rows; a periodic compaction (read store →
    merge per key → overwrite) bounds it, same shape as the upsert sink
    above. foreachBatch may replay a batch on recovery; appends are staged
    per-batch-id so a replay overwrites its own directory instead of
    double-counting (exactly-once effect on the store).
    """
    from ..operators.sketches import tdigest_partials

    def append_partials(batch: DataFrame, batch_id: int) -> None:
        (
            tdigest_partials(batch, key_col, value_col, delta)
            .write.mode("overwrite")
            .parquet(os.path.join(store_dir, f"batch_id={batch_id}"))
        )

    _run_foreach_batch(
        events, append_partials, checkpoint_dir, timeout_sec, "run_stream_tdigest"
    )


def sketch_store_quantiles(
    spark: SparkSession, store_dir: str, probs: list[float], delta: float = 200.0
) -> DataFrame:
    """Answer per-key quantiles from an incremental sketch store (KBs),
    merging all appended partials — the 100 TB corpus itself is not read."""
    from ..operators.sketches import tdigest_finalize

    partials = spark.read.parquet(store_dir).select("key", "means", "weights")
    return tdigest_finalize(partials, probs, delta)


def run_stream_heavy_hitters(
    stream: DataFrame,
    items_col: str,
    store_dir: str,
    checkpoint_dir: str,
    capacity: int = 4096,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch incremental heavy hitters: each micro-batch appends its
    SpaceSaving partials (pid, item, cnt, dmax) to a parquet store under
    ``batch_id=N``; ``hh_store_topk`` answers certified top-k from the
    store alone. Partial ids become (batch_id, pid) so every partial's
    truncation mass counts exactly once in the merged bounds; per-batch-id
    staged writes make replays idempotent, same as run_stream_tdigest."""
    from ..operators.sketches import heavy_hitters_partials

    def append_partials(batch: DataFrame, batch_id: int) -> None:
        (
            heavy_hitters_partials(batch, items_col, capacity)
            .write.mode("overwrite")
            .parquet(os.path.join(store_dir, f"batch_id={batch_id}"))
        )

    _run_foreach_batch(
        stream, append_partials, checkpoint_dir, timeout_sec, "run_stream_heavy_hitters"
    )


def hh_store_topk(spark: SparkSession, store_dir: str, k: int = 20) -> DataFrame:
    """Certified top-k from an incremental heavy-hitters store: merges all
    appended truncated-counter partials; batch_id comes back as a partition
    column from the ``batch_id=N`` directory layout."""
    from ..operators.sketches import heavy_hitters_finalize

    partials = spark.read.parquet(store_dir)
    return heavy_hitters_finalize(partials, k, partial_id_cols=("batch_id", "pid"))


def rate_stream(spark: SparkSession, rows_per_batch: int = 1000) -> DataFrame:
    """Deterministic synthetic stream (``rate-micro-batch`` source):
    exactly ``rows_per_batch`` (timestamp, value) rows per trigger, no
    external infra — the soak/throughput harness for streaming operators.
    Shaped into the events contract (ts, user_id, event_type, value) so
    every downstream streaming plan accepts it unchanged."""
    raw = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", rows_per_batch)
        .load()
    )
    return raw.select(
        F.col("timestamp").alias("ts"),
        (F.col("value") % 97).alias("user_id"),
        F.element_at(
            F.array(F.lit("view"), F.lit("click"), F.lit("purchase")),
            (F.col("value") % 3 + 1).cast("int"),
        ).alias("event_type"),
        (F.col("value") % 1000).cast("double").alias("value"),
    ).withWatermark("ts", "10 seconds")


def run_stream_dq_audit(
    events: DataFrame,
    checks: dict,
    store_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch streaming data-quality audit: every micro-batch runs
    the one-pass predicate audit (operators/quality.check_predicates) and
    writes its report under ``store_dir/batch_id=N``. Violation counts are
    additive, so the store's per-constraint sum equals the batch audit of
    everything ingested — the ingest-gate invariant, maintained
    incrementally with no raw-row retention.

    Idempotent under foreachBatch replays: a re-run batch OVERWRITES its
    own batch_id directory, so at-least-once delivery still sums to
    exactly-once counts.
    """
    import os

    from ..operators.quality import check_predicates

    def audit(batch: DataFrame, batch_id: int) -> None:
        report = check_predicates(batch, checks)
        report.write.mode("overwrite").parquet(os.path.join(store_dir, f"batch_id={batch_id}"))

    _run_foreach_batch(
        events, audit, checkpoint_dir, timeout_sec, "run_stream_dq_audit"
    )


def run_stream_integrity_audit(
    facts: DataFrame,
    fk_col: str,
    dim: DataFrame,
    pk_col: str,
    store_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch referential-integrity monitor — q206's FK audit AT
    INGEST: every micro-batch of ``facts`` is anti-joined against the
    (static/broadcastable) ``dim`` key; per-batch row/null-FK totals and
    per-key orphan counts are staged under batch_id=N (overwrite =
    idempotent on replay). Counts are additive across batches and orphan
    keys fold by distinct at read, so the store report equals the batch
    audit of everything ingested — no raw-row retention, state linear in
    ORPHANS (rare by construction), not rows.

    At 100 TB the dim side is the same estimate-guarded broadcast the
    batch audit uses; a dim too big to broadcast shuffles per batch on
    the key — still bounded by batch size, never history.
    """
    from ..operators.sizing import broadcast_if_small

    def audit(batch: DataFrame, batch_id: int) -> None:
        counts = batch.agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count(F.when(F.col(fk_col).isNull(), 1)).alias("n_null_fk"),
        )
        counts.write.mode("overwrite").parquet(
            os.path.join(store_dir, "counts", f"batch_id={batch_id}")
        )
        orphans = (
            batch.filter(F.col(fk_col).isNotNull())
            .join(
                broadcast_if_small(dim.select(F.col(pk_col).alias("__pk"))),
                F.col(fk_col) == F.col("__pk"),
                "left_anti",
            )
            .groupBy(F.col(fk_col).alias("fk"))
            .agg(F.count(F.lit(1)).alias("n"))
        )
        orphans.write.mode("overwrite").parquet(
            os.path.join(store_dir, "orphans", f"batch_id={batch_id}")
        )

    _run_foreach_batch(
        facts, audit, checkpoint_dir, timeout_sec, "run_stream_integrity_audit"
    )


def integrity_report_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """One-row fold of the integrity store: total rows, null FKs, orphan
    rows, distinct orphan keys — reads only the staged partials (counts
    are 1 row/batch; orphans are linear in actual violations)."""
    counts = (
        _read_store_deltas(
            spark, os.path.join(store_dir, "counts"), "n_rows bigint, n_null_fk bigint"
        )
        .agg(
            F.sum("n_rows").cast("bigint").alias("n_rows"),
            F.sum("n_null_fk").cast("bigint").alias("n_null_fk"),
        )
    )
    odir = os.path.join(store_dir, "orphans")
    if os.path.exists(odir):
        orph = (
            spark.read.option("basePath", odir)
            .parquet(f"{odir}/batch_id=*")
            .agg(
                F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_orphans"),
                F.countDistinct("fk").cast("bigint").alias("n_orphan_keys"),
            )
        )
    else:
        orph = counts.sparkSession.createDataFrame(
            [(0, 0)], "n_orphans bigint, n_orphan_keys bigint"
        )
    return counts.crossJoin(F.broadcast(orph))


def dq_store_report(spark: SparkSession, store_dir: str) -> DataFrame:
    """Fold the per-batch audit store into one report (sum of additive
    violation counts per constraint)."""
    return (
        _read_store_deltas(
            spark, store_dir, "constraint string, n_violations bigint, n_checked bigint"
        )
        .groupBy("constraint")
        .agg(
            F.sum("n_violations").alias("n_violations"),
            F.sum("n_checked").alias("n_checked"),
        )
        .orderBy("constraint")
    )


def mixture_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """q134's per-window mixture shares derived from an upsert store of
    streamed tumbling counts (run_stream_upsert over tumbling_counts keyed
    by (window_start, event_type)) — the ingest-drift monitor: the store
    is updated per micro-batch, and once the backlog drains this report
    equals the batch q134 exactly (pytest-pinned). The share division runs
    over the kilobyte-sized store, never the event stream."""
    c = spark.read.parquet(f"{store_dir}/data").select(
        "window_start", "event_type", F.col("n_events").cast("bigint").alias("n_events")
    )
    ww = Window.partitionBy("window_start")
    return (
        c.withColumn(
            "share",
            F.col("n_events").cast("double") / F.sum("n_events").over(ww).cast("double"),
        )
        .orderBy("window_start", "event_type")
    )


def _dup_flow_ingest(
    batch: DataFrame, batch_id: int, store_dir: str, kept_dir: str | None = None
) -> None:
    """One micro-batch of the dup-flow store (see run_stream_dup_flow):
    rank the batch within fp, look up the keeper store for batches < this
    one, stage this batch's new keepers and duplicate-flow edges under
    their batch_id directories (idempotent on replay; ids remap above the
    compaction floor — see _effective_batch_id — so a replay of a folded
    raw id can never overwrite the compacted keeper/edge history).

    ``kept_dir`` (round-10, the ingest-suite path): additionally stage a
    per-source (kept_docs, kept_tokens) partial over THIS batch's new
    keepers — the batch must then carry ``n_toks``. Kept mass is additive
    across batches (each fp group's keeper is new exactly once), which is
    what lets dedup_adjusted_budget_from_store re-plan the token budget
    incrementally without ever re-reading the corpus."""
    spark = batch.sparkSession
    keepers_dir = os.path.join(store_dir, "keepers")
    # heal a crashed compaction BEFORE writing (see _effective_batch_id)
    _recover_compaction(keepers_dir)
    _recover_compaction(os.path.join(store_dir, "edges"))
    eff_id = _effective_batch_id(store_dir, batch_id)
    w = Window.partitionBy("fp").orderBy("doc_id")
    cols = ["doc_id", "source", "fp"] + (["n_toks"] if kept_dir is not None else [])
    ranked = batch.select(*cols).withColumn(
        "rn", F.row_number().over(w)
    )
    # keeper_doc_id (round 11): which document created the keeper entry —
    # read as null from pre-r11 deltas (explicit schema over parquet
    # missing the column), which simply disables the self-edge guard for
    # that row, matching the old behavior
    prior = (
        _read_store_deltas(
            spark, keepers_dir, "fp string, keeper_source string, keeper_doc_id long"
        )
        .where(F.col("batch_id") < eff_id)
        .select(
            "fp",
            F.col("keeper_source").alias("store_keeper"),
            F.col("keeper_doc_id").alias("store_keeper_doc"),
        )
    )
    # cached: both writes below consume it, and recomputation would scan
    # the (ever-growing) keeper store and re-run the rn window twice per
    # batch. The prior read filters batch_id < this batch, so the edges
    # action seeing the store AFTER the keeper write is still consistent.
    hit = ranked.join(prior, "fp", "left").cache()
    try:
        new_keeper_rows = hit.where(
            F.col("store_keeper").isNull() & (F.col("rn") == 1)
        )
        new_keeper_rows.select(
            "fp",
            F.col("source").alias("keeper_source"),
            F.col("doc_id").alias("keeper_doc_id"),
        ).write.mode("overwrite").parquet(
            os.path.join(keepers_dir, f"batch_id={eff_id}")
        )
        if kept_dir is not None:
            k_eff = _effective_batch_id(kept_dir, batch_id, flat=True)
            new_keeper_rows.groupBy("source").agg(
                F.count(F.lit(1)).cast("bigint").alias("kept_docs"),
                F.sum("n_toks").cast("bigint").alias("kept_tokens"),
            ).write.mode("overwrite").parquet(
                os.path.join(kept_dir, f"batch_id={k_eff}")
            )
        # within-batch keeper source per fp (the rn==1 row's source)
        batch_first = hit.where(F.col("rn") == 1).select(
            "fp", F.col("source").alias("batch_keeper")
        )
        dup_rows = (
            hit.join(batch_first, "fp")
            .where(F.col("store_keeper").isNotNull() | (F.col("rn") > 1))
            # self-edge guard (VERDICT r10 item 7): a document can never be
            # a duplicate of ITSELF. The only way doc_id equals the store
            # keeper's doc id is the bounded-double-count replay schedule
            # (this batch's keeper delta was compacted before its commit,
            # so the replay sees its OWN keeper entry below the floor) —
            # drop exactly those rows, so the accepted one-batch edge
            # double-count can never also manufacture a self-edge. Null
            # store_keeper_doc (pre-r11 delta) keeps the old behavior.
            .where(
                F.col("store_keeper_doc").isNull()
                | (F.col("doc_id") != F.col("store_keeper_doc"))
            )
            .select(
                "fp",
                F.coalesce("store_keeper", "batch_keeper").alias("keeper_source"),
                F.col("source").alias("dup_source"),
            )
        )
        edges = dup_rows.groupBy("fp", "keeper_source", "dup_source").agg(
            F.count(F.lit(1)).alias("n_docs")
        )
        edges.write.mode("overwrite").parquet(
            os.path.join(store_dir, "edges", f"batch_id={eff_id}")
        )
    finally:
        hit.unpersist()


def run_stream_dup_flow(
    docs: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch incremental duplication-flow store: the streaming twin
    of batch q146 (plans/dedup.py) over the incremental-ingest dedup shape
    (q87) — dedup AT INGEST, per crawl drop, instead of batch-only.

    ``docs`` is a streaming frame of (doc_id, source, fp). Two append-only
    parquet tables, both staged per batch_id so a replayed batch overwrites
    its own directories (at-least-once in, exactly-once effect — the
    run_stream_heavy_hitters idiom):

      keepers/batch_id=N/  (fp, keeper_source, keeper_doc_id) — fps FIRST
                           kept by batch N (within-batch min doc_id, not
                           already kept by any batch < N; the lookup
                           filters batch_id < N, so a replay never sees
                           its own earlier write). keeper_doc_id feeds
                           the self-edge guard: a folded-id replay that
                           sees its OWN compacted keeper entry is
                           recognized by doc identity and never emits
                           itself as a duplicate.
      edges/batch_id=N/    (fp, keeper_source, dup_source, n_docs) — batch
                           N's duplicate flows: every row whose fp was
                           already kept (by the store, or by an earlier
                           doc_id in this batch) adds one to the edge
                           keeper_source -> its own source.

    ``dup_flow_matrix_from_store`` folds the edge deltas into the q146
    matrix. Equals batch q146 exactly whenever arrival order respects
    doc_id order (the ingest contract: crawl drops arrive in id order);
    under out-of-order arrival the attribution is first-ARRIVAL wins —
    the only semantics a store that never revisits raw docs can offer.

    Scale shape: every shuffle is keyed on fp (the natural dedup key);
    the keeper-store lookup is an fp-equi join whose store side holds one
    row per distinct kept fingerprint — at 100 TB that store lives
    bucketed on fp so the per-batch join co-locates without a full-store
    shuffle, and the per-batch_id deltas get periodically compacted (read
    -> merge -> overwrite, the run_stream_tdigest compaction note).
    """

    def ingest(batch: DataFrame, batch_id: int) -> None:
        _dup_flow_ingest(batch, batch_id, store_dir)

    _run_foreach_batch(
        docs, ingest, checkpoint_dir, timeout_sec, "run_stream_dup_flow"
    )


def dup_flow_matrix_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """q146's (keeper_source, dup_source, n_docs, n_groups) matrix from an
    incremental dup-flow store — read only the edge deltas (linear in
    duplicates), never the corpus."""
    edges_dir = os.path.join(store_dir, "edges")
    edges = _read_store_deltas(
        spark,
        edges_dir,
        "fp string, keeper_source string, dup_source string, n_docs bigint",
    )
    return (
        edges.groupBy("keeper_source", "dup_source")
        .agg(
            F.sum("n_docs").alias("n_docs"),
            F.countDistinct("fp").alias("n_groups"),
        )
        .orderBy("keeper_source", "dup_source")
    )


# ---------------------------------------------------------------------------
# PSI-store core shared by the unkeyed (q151) and keyed (q160) twins: the
# unkeyed case IS the keyed case with key_cols=[] — one implementation so
# a store-contract fix cannot apply to one twin and miss the other.
# ---------------------------------------------------------------------------


def _counts_read_schema(key_cols: list[str]) -> str:
    return ", ".join([f"{k} string" for k in key_cols] + ["bin int", "n bigint"])


def _stage_bin_counts(
    binned: DataFrame, batch_id: int, store_dir: str, key_cols: list[str]
) -> None:
    # batch_id arrives pre-remapped above the store's compaction floor
    # (see _effective_batch_id) by every caller.
    (
        binned.groupBy(*key_cols, "bin")
        .agg(F.count(F.lit(1)).alias("n"))
        .write.mode("overwrite")
        .parquet(os.path.join(store_dir, f"batch_id={batch_id}"))
    )


def _psi_fold(
    spark: SparkSession,
    store_dir: str,
    ref_counts: DataFrame,
    key_cols: list[str],
    eps: float,
) -> DataFrame:
    """Per-(key..., bin) PSI terms of the accumulated store vs the frozen
    reference histograms. Two hardening contracts beyond the happy path:

    - EXPLICIT read schema: an empty micro-batch (or a keyed edges join
      that dropped every row) stages a part-file-less batch_id dir, and
      schema INFERENCE over zero parquet files raises — the declared
      schema reads it as simply empty instead of crashing the monitor.
    - ZERO-TOTAL guard: a population with tr=0 or tc=0 (vanished segment,
      key unseen at training time) would make n/0 shares NaN, and NaN
      poisons psi_total while `NaN >= alert` is False — the most extreme
      drift would never alert. Shares are 0.0 when their total is 0, so
      the eps floor turns total loss into the LARGEST signal instead.
    """
    from ..plans.drift import psi_term_expr

    # zero micro-batches processed: empty fold -> ref-only bins, n_cur = 0
    # via the full_outer + fill below (uniform empty-store contract)
    cur = (
        _read_store_deltas(spark, store_dir, _counts_read_schema(key_cols))
        .groupBy(*key_cols, "bin")
        .agg(F.sum("n").alias("n_cur"))
    )
    joined = (
        ref_counts.select(*key_cols, "bin", "n_ref")
        .join(cur, [*key_cols, "bin"], "full_outer")
        .na.fill(0, ["n_ref", "n_cur"])
    )
    totals = [F.sum("n_ref").alias("tr"), F.sum("n_cur").alias("tc")]
    if key_cols:
        tot = joined.groupBy(*key_cols).agg(*totals)
        with_tot = joined.join(F.broadcast(tot), list(key_cols))
    else:
        tot = joined.agg(*totals)
        with_tot = joined.crossJoin(F.broadcast(tot))
    ref_share = F.when(
        F.col("tr") > 0, F.col("n_ref").cast("double") / F.col("tr")
    ).otherwise(F.lit(0.0))
    cur_share = F.when(
        F.col("tc") > 0, F.col("n_cur").cast("double") / F.col("tc")
    ).otherwise(F.lit(0.0))
    return (
        with_tot.select(
            *key_cols,
            "bin",
            "n_ref",
            "n_cur",
            ref_share.alias("ref_share"),
            cur_share.alias("cur_share"),
            F.round(psi_term_expr(ref_share, cur_share, eps), 12).alias("psi_term"),
        )
        .orderBy(*key_cols, "bin")
    )


def _monitor_ingest(
    batch: DataFrame,
    batch_id: int,
    binner,
    counts_dir: str,
    log_dir: str,
    ref_counts: DataFrame,
    key_cols: list[str],
    psi_alert: float,
) -> None:
    """One monitor micro-batch: stage this batch's bin counts, evaluate
    the cumulative store, stage one log row per key (or one total row
    when unkeyed). Both writes land under batch_id=N — replay idempotent.
    N is the raw id remapped above the counts store's compaction floor
    (the log dir follows the same effective id so a fresh-checkpoint
    restart can't overwrite a genuine old log row either)."""
    spark = batch.sparkSession
    batch_id = _effective_batch_id(counts_dir, batch_id, flat=True)
    _stage_bin_counts(binner(batch), batch_id, counts_dir, key_cols)
    rows = _psi_fold(spark, counts_dir, ref_counts, key_cols, 1e-9).collect()
    if key_cols:
        per: dict[tuple, list[float]] = {}
        for r in rows:
            acc = per.setdefault(tuple(r[k] for k in key_cols), [0.0, 0])
            acc[0] += r["psi_term"]
            acc[1] += r["n_cur"]
        out = [
            (*k, float(psi), int(n), float(psi) >= psi_alert)
            for k, (psi, n) in sorted(per.items())
        ]
        schema = (
            ", ".join(f"{k} string" for k in key_cols)
            + ", psi_total double, n_cur bigint, alert boolean"
        )
    else:
        psi_total = float(sum(r["psi_term"] for r in rows))
        n_cur = int(sum(r["n_cur"] for r in rows))
        out = [(psi_total, n_cur, psi_total >= psi_alert)]
        schema = "psi_total double, n_cur bigint, alert boolean"
    spark.createDataFrame(out, schema).write.mode("overwrite").parquet(
        os.path.join(log_dir, f"batch_id={batch_id}")
    )


def _keyed_binner(ref_edges: DataFrame, n_bins: int):
    """(key, v) batch -> (key, bin) rows against per-key frozen edges
    (``ref_edges``: key, lo, width). Rows whose key has no reference
    edges are dropped — the same contract as q160's inner edges join (a
    segment never seen at training time has no frozen bins to count
    into); ``n_bins`` must match the frozen reference histograms."""
    from ..plans.drift import bin_expr

    edges = ref_edges.select("key", "lo", "width")

    def binner(batch: DataFrame) -> DataFrame:
        return batch.join(F.broadcast(edges), "key").select(
            "key",
            bin_expr(F.col("v"), F.col("lo"), F.col("width"), n_bins).alias("bin"),
        )

    return binner


def run_stream_psi_counts(
    values: DataFrame,
    lo: float,
    width: float,
    n_bins: int,
    store_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch drift-monitor ingestion: bin a numeric stream (column
    ``v``) with FROZEN reference bin edges — the deployed-model monitor
    contract of batch q151 (plans/drift.py): edges are fixed when the
    reference window is frozen, never re-derived from live data — and
    append per-batch bin counts under ``batch_id=N`` (staged overwrite:
    replays are idempotent, the run_stream_heavy_hitters idiom). The
    store is O(batches x bins) rows of pure additive state;
    ``psi_from_store`` answers the drift question from kilobytes."""

    from ..plans.drift import bin_expr

    def bin_counts(batch: DataFrame, batch_id: int) -> None:
        _stage_bin_counts(
            batch.select(
                bin_expr(F.col("v"), F.lit(lo), F.lit(width), n_bins).alias("bin")
            ),
            _effective_batch_id(store_dir, batch_id, flat=True),
            store_dir,
            [],
        )

    _run_foreach_batch(
        values, bin_counts, checkpoint_dir, timeout_sec, "run_stream_psi_counts"
    )


def psi_from_store(
    spark: SparkSession,
    store_dir: str,
    ref_counts: DataFrame,
    eps: float = 1e-9,
) -> DataFrame:
    """Per-bin PSI terms of the streamed current population vs a frozen
    reference histogram (``ref_counts``: bin, n_ref). Bin counts are
    additive across micro-batches, so once the backlog drains this equals
    batch q151 on the same split/edges exactly (pytest-pinned); the term
    math is IMPORTED from plans/drift (bin_expr there too), so the twins
    cannot drift apart by construction."""
    return _psi_fold(spark, store_dir, ref_counts, [], eps)


def ks_from_digest_store(
    spark: SparkSession,
    store_dir: str,
    ref_means,
    ref_weights,
    key: str | None = None,
    delta: float = 200.0,
) -> tuple[float, int]:
    """Approximate two-sample KS of a STREAMED population against a FROZEN
    reference t-digest — the streaming face of q156 (plans/drift.py), and
    the drift monitor q152's scale story ends at: the reference digest is
    built once (training time) and persisted as kilobytes; the live
    population accumulates through run_stream_tdigest's per-batch partial
    appends; answering "did the input move?" reads ONLY sketch rows —
    no raw event is ever revisited, at any corpus size.

    ``key`` selects ONE population from a keyed store
    (run_stream_tdigest sketches per key). Omitting it requires the store
    to hold exactly one key — merging several keys' centroids would
    silently answer for a population nobody asked about, so a multi-key
    store without ``key`` raises instead.

    Returns (ks_stat_approx, n_current). Empty store/key (zero
    micro-batches) -> (nan, 0)."""
    import numpy as np

    from ..operators.sketches import (
        _SKETCH_SCHEMA,
        ks_from_digests,
        merge_partial_rows,
    )

    _recover_compaction(store_dir)
    if not os.path.exists(store_dir):
        return float("nan"), 0
    # explicit schema: an empty micro-batch stages a part-file-less
    # batch_id dir (tdigest_partials yields nothing for zero rows), and
    # schema inference over zero parquet files would raise instead of
    # reading empty — the _psi_fold hardening contract
    store = spark.read.schema(_SKETCH_SCHEMA).parquet(store_dir)
    if key is not None:
        store = store.where(F.col("key") == key)
    else:
        keys = [r["key"] for r in store.select("key").distinct().collect()]
        if len(keys) > 1:
            raise ValueError(
                f"digest store {store_dir} holds keys {sorted(keys)}; pass "
                "key=... to select the population to compare"
            )
    rows = store.select("means", "weights").collect()
    if not rows:
        return float("nan"), 0
    cur_m, cur_w = merge_partial_rows(rows, delta)
    ref_m = np.asarray(ref_means, dtype=np.float64)
    ref_w = np.asarray(ref_weights, dtype=np.float64)
    return (
        float(ks_from_digests(ref_m, ref_w, cur_m, cur_w)),
        int(round(float(cur_w.sum()))),
    )


def _read_store_deltas(spark: SparkSession, store_dir: str, schema: str) -> DataFrame:
    """Shared staged-store delta reader (ADVICE r9 fold — this pattern was
    repeated verbatim at every ``*_from_store`` / prior-state site): heal a
    crashed compaction, then read every ``batch_id=*`` delta with the
    DECLARED schema plus the ``batch_id`` partition column. The explicit
    schema is the PSI-store lesson — an empty micro-batch stages a
    part-file-less batch_id dir, and schema INFERENCE over zero parquet
    files raises; the declared schema reads it as simply empty. A store
    that has never been written returns an empty frame of the same shape,
    so every fold's zero-batch contract is uniform."""
    _recover_compaction(store_dir)
    full = schema + ", batch_id bigint"
    if not os.path.exists(store_dir):
        return spark.createDataFrame([], full)
    return (
        spark.read.schema(full)
        .option("basePath", store_dir)
        .parquet(f"{store_dir}/batch_id=*")
    )


def _monitor_log(spark: SparkSession, log_dir: str, schema: str) -> DataFrame:
    """Shared append-only evaluation-log reader (see _read_store_deltas),
    ordered by batch then any key columns."""
    cols = [c.split()[0] for c in schema.split(", ")]
    return _read_store_deltas(spark, log_dir, schema).select(
        "batch_id", *cols
    ).orderBy("batch_id", *[c for c in cols if c in ("key", "source")])


def run_stream_drift_monitor(
    values: DataFrame,
    ref_counts: DataFrame,
    lo: float,
    width: float,
    n_bins: int,
    store_dir: str,
    checkpoint_dir: str,
    psi_alert: float = 0.2,
    timeout_sec: int = 120,
) -> None:
    """Operational endpoint of the drift family: per micro-batch, append
    the frozen-edge bin counts (the run_stream_psi_counts store) AND an
    evaluation-log row (batch_id, psi_total, n_cur_total, alert) computed
    from the store's cumulative counts vs the frozen reference histogram.
    The alert fires when total PSI crosses ``psi_alert`` (0.2 is the
    standard "significant shift" reading on the PSI scale).

    The psi_total here is a driver-side float sum over n_bins rounded
    terms — an operational signal, deliberately NOT an oracle-checked
    quantity (the per-bin terms, which ARE oracle-paired via q151, stay
    in the store for exact auditing). Both the counts and the log are
    staged per batch_id, so replays overwrite their own rows and the log
    is an append-only audit trail of what the monitor saw after each
    drop."""
    from ..plans.drift import bin_expr

    counts_dir = os.path.join(store_dir, "counts")
    log_dir = os.path.join(store_dir, "log")

    def binner(batch: DataFrame) -> DataFrame:
        return batch.select(
            bin_expr(F.col("v"), F.lit(lo), F.lit(width), n_bins).alias("bin")
        )

    def monitor(batch: DataFrame, batch_id: int) -> None:
        _monitor_ingest(
            batch, batch_id, binner, counts_dir, log_dir, ref_counts, [], psi_alert
        )

    _run_foreach_batch(
        values, monitor, checkpoint_dir, timeout_sec, "run_stream_drift_monitor"
    )


def drift_monitor_log(spark: SparkSession, store_dir: str) -> DataFrame:
    """The monitor's append-only evaluation log, ordered by batch."""
    return _monitor_log(
        spark,
        os.path.join(store_dir, "log"),
        "psi_total double, n_cur bigint, alert boolean",
    )


def _volume_ingest(batch: DataFrame, batch_id: int, store_dir: str) -> None:
    """One micro-batch of the volume store (see run_stream_volume_counts):
    stage per-(source, lang) additive partials under batch_id=N (remapped
    above the compaction floor — see _effective_batch_id)."""
    eff_id = _effective_batch_id(store_dir, batch_id, flat=True)
    (
        batch.groupBy("source", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
            F.sum("n_chars").cast("bigint").alias("n_chars"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(store_dir, f"batch_id={eff_id}"))
    )


def run_stream_volume_counts(
    docs: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """Per-batch corpus-volume partials: the streaming half of q157's
    report card (plans/curation.py) that the dup-flow store doesn't carry.
    ``docs`` is a streaming frame of (source, lang, n_chars, n_toks); each
    micro-batch appends one (source, lang, n_docs, n_tokens, n_chars) row
    group under ``batch_id=N`` (staged overwrite — replays idempotent, the
    run_stream_heavy_hitters idiom). All five measures are additive, so
    the fold is a plain sum; lang is kept as a key (NOT count-distincted
    here) because distinct-language counts are the one non-additive
    report-card column — the store holds (source, lang) cells and
    ``report_card_from_store`` distinct-counts at read time.

    Scale: per batch one narrow map + one tiny groupBy; store growth is
    O(batches x sources x langs) rows of pure additive state."""

    def partials(batch: DataFrame, batch_id: int) -> None:
        _volume_ingest(batch, batch_id, store_dir)

    _run_foreach_batch(
        docs, partials, checkpoint_dir, timeout_sec, "run_stream_volume_counts"
    )


_VOLUME_MONITOR_LOG_SCHEMA = (
    "source string, n_docs bigint, share double, quiet boolean, "
    "quiet_streak int, alert boolean"
)


def run_stream_volume_monitor(
    docs: DataFrame,
    known_sources: list[str],
    store_dir: str,
    checkpoint_dir: str,
    min_share: float = 0.01,
    k: int = 3,
    timeout_sec: int = 120,
) -> None:
    """Volume-QUIET alert monitor (VERDICT r9 item 4) — the report-card
    volume store's operational twin, mirroring the decode-health monitor:
    per micro-batch, ingest the batch's (source, lang) volume partials
    into ``store_dir/counts`` (the exact staged-delta contract of
    run_stream_volume_counts — ``report_card_from_store`` reads the counts
    dir directly) AND append one evaluation-log row PER KNOWN SOURCE: the
    source's doc count and share OF THIS BATCH, whether the source went
    quiet (share below ``min_share`` — the PSI zero-mass idiom: a feed's
    total silence is the strongest drift signal, so share is 0.0 when the
    source is absent or the batch is empty, never a skipped term), the
    consecutive-quiet streak carried forward from the log itself, and
    ``alert = quiet_streak >= k``. A crawl feed whose upstream died — the
    collapse q157's batch report card only surfaces at audit time —
    alerts on exactly the k-th quiet drop.

    Scale shape: per batch one tiny groupBy over the batch, one read of
    the batch's own just-staged partial rows (O(sources x langs), never
    the corpus), one read of the log's latest row per source (O(batches x
    sources) additive-log rows until compaction of counts; the log itself
    is the monitor's state, the q165 EWMA-carry idiom). Both writes stage
    under the same effective batch id (compaction-floor remapped, see
    _effective_batch_id) — replay idempotent: a replayed batch overwrites
    its own counts delta AND its own log rows, and its streak was derived
    from strictly earlier log rows only."""
    counts_dir = os.path.join(store_dir, "counts")
    log_dir = os.path.join(store_dir, "log")

    def monitor(batch: DataFrame, batch_id: int) -> None:
        from ..functions import text as X

        spark = batch.sparkSession
        eff_id = _effective_batch_id(counts_dir, batch_id, flat=True)
        # raw documents schema in (the run_stream_ingest_suite contract);
        # token counts derived once per batch, same as the suite
        _volume_ingest(
            batch.select(
                "source",
                "lang",
                "n_chars",
                X.token_count(F.col("text")).cast("bigint").alias("n_toks"),
            ),
            batch_id,
            counts_dir,
        )
        # this batch's per-source totals from its own just-staged partials
        own = (
            _read_store_deltas(
                spark,
                counts_dir,
                "source string, lang string, n_docs bigint, n_tokens bigint, "
                "n_chars bigint",
            )
            .where(F.col("batch_id") == eff_id)
            .groupBy("source")
            .agg(F.sum("n_docs").cast("bigint").alias("n_docs"))
        )
        known = spark.createDataFrame([(s,) for s in known_sources], "source string")
        total = own.agg(F.sum("n_docs").alias("__total"))
        # latest streak per source from strictly earlier log rows
        prev = (
            _read_store_deltas(spark, log_dir, _VOLUME_MONITOR_LOG_SCHEMA)
            .where(F.col("batch_id") < eff_id)
            .groupBy("source")
            .agg(F.max_by("quiet_streak", "batch_id").alias("prev_streak"))
        )
        share = F.when(
            F.coalesce(F.col("__total"), F.lit(0)) > 0,
            F.coalesce(F.col("n_docs"), F.lit(0)).cast("double") / F.col("__total"),
        ).otherwise(F.lit(0.0))
        quiet = F.col("share") < F.lit(min_share)
        streak = F.when(
            F.col("quiet"), F.coalesce(F.col("prev_streak"), F.lit(0)) + F.lit(1)
        ).otherwise(F.lit(0))
        out = (
            known.join(own, "source", "left")
            .crossJoin(F.broadcast(total))
            .join(prev, "source", "left")
            .select(
                "source",
                F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
                share.alias("share"),
                "prev_streak",
            )
            .withColumn("quiet", quiet)
            .withColumn("quiet_streak", streak.cast("int"))
            .withColumn("alert", F.col("quiet_streak") >= F.lit(k))
            .select(
                "source", "n_docs", "share", "quiet", "quiet_streak", "alert"
            )
        )
        out.write.mode("overwrite").parquet(
            os.path.join(log_dir, f"batch_id={eff_id}")
        )

    _run_foreach_batch(
        docs, monitor, checkpoint_dir, timeout_sec, "run_stream_volume_monitor"
    )


def volume_monitor_log(spark: SparkSession, store_dir: str) -> DataFrame:
    """The volume-quiet monitor's append-only evaluation log, ordered by
    (batch, source)."""
    return _monitor_log(
        spark, os.path.join(store_dir, "log"), _VOLUME_MONITOR_LOG_SCHEMA
    )


def report_card_from_store(
    spark: SparkSession, vol_store_dir: str, flow_store_dir: str
) -> DataFrame:
    """q157's per-source report card folded from two ingest stores — the
    volume partials (run_stream_volume_counts) and the dup-flow store
    (run_stream_dup_flow) run over the SAME document stream — reading
    only store rows, never the corpus.

    Dup exposure is recovered from the flow edges: a doc sits in a
    multi-copy group iff it is either a recorded duplicate (one edge row
    per dup, attributed to dup_source) or the keeper of a group that has
    at least one edge (one distinct fp per keeper_source). Unlike q146's
    keeper ATTRIBUTION, this per-source total is arrival-order-INDEPENDENT:
    whoever arrives first, each member of a multi-copy group is counted
    exactly once for its own source — so the fold equals batch q157 under
    any arrival order, not just id-ordered drops (pytest pins both)."""
    vol = _read_store_deltas(
        spark,
        vol_store_dir,
        "source string, lang string, n_docs bigint, n_tokens bigint, n_chars bigint",
    )
    agg = vol.groupBy("source").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    edges = _read_store_deltas(
        spark,
        os.path.join(flow_store_dir, "edges"),
        "fp string, keeper_source string, dup_source string, n_docs bigint",
    )
    dup_side = edges.groupBy(F.col("dup_source").alias("source")).agg(
        F.sum("n_docs").cast("bigint").alias("n_dup")
    )
    keeper_side = edges.groupBy(F.col("keeper_source").alias("source")).agg(
        F.countDistinct("fp").alias("n_keep")
    )
    exposure = (
        dup_side.join(keeper_side, "source", "full_outer")
        .na.fill(0, ["n_dup", "n_keep"])
        .select("source", (F.col("n_dup") + F.col("n_keep")).alias("dup_docs"))
    )
    return (
        agg.join(exposure, "source", "left")
        .na.fill(0, ["dup_docs"])
        .select(
            "source",
            "n_docs",
            "n_tokens",
            (F.col("sum_chars").cast("double") / F.col("n_docs")).alias("avg_chars"),
            "n_langs",
            F.col("dup_docs").cast("bigint").alias("dup_docs"),
            (F.col("dup_docs").cast("double") / F.col("n_docs")).alias("dup_rate"),
        )
        .orderBy("source")
    )


_KEPT_SCHEMA = "source string, kept_docs bigint, kept_tokens bigint"


def dedup_adjusted_budget_from_store(
    spark: SparkSession,
    vol_store_dir: str,
    kept_store_dir: str,
    budget_tokens: int | None = None,
) -> DataFrame:
    """The incremental twin of the dedup-adjusted token-budget plan
    (q226's exact-dedup sibling, over stores only): per source — raw
    token mass from the volume partials, EFFECTIVE mass from the kept
    store (each exact-fp group's tokens counted once, at its
    first-arrival keeper's source — the dup-flow store's keeper
    contract), the dup discount, and q147's sqrt-temperature plan re-run
    on the effective mass. Reads O(batches × sources) additive rows,
    never the corpus: the budget re-plans after every crawl drop for the
    cost of two tiny folds.

    Matches the batch computation (min-doc_id keeper per fingerprint)
    whenever arrival order respects doc_id order — the same contract as
    q146's flow matrix (pytest-pinned). Sources whose every document
    duplicates an earlier arrival keep a row with eff 0 / weight 0."""
    if budget_tokens is None:
        from ..plans.curation import _BUDGET_TOKENS as budget_tokens
    raw = (
        _read_store_deltas(
            spark,
            vol_store_dir,
            "source string, lang string, n_docs bigint, n_tokens bigint, "
            "n_chars bigint",
        )
        .groupBy("source")
        .agg(
            F.sum("n_docs").cast("bigint").alias("n_docs"),
            F.sum("n_tokens").cast("bigint").alias("raw_tokens"),
        )
    )
    eff = (
        _read_store_deltas(spark, kept_store_dir, _KEPT_SCHEMA)
        .groupBy("source")
        .agg(F.sum("kept_tokens").cast("bigint").alias("eff_tokens"))
    )
    from ..plans.curation import budget_plan_columns

    j = raw.join(eff, "source", "left").na.fill(0, ["eff_tokens"])
    return budget_plan_columns(j, budget_tokens)


def compact_kept_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the kept-mass store: per-source kept docs/tokens are
    additive (each fp group's keeper is staged exactly once across the
    stream — additive ⇒ the section contract's one-batch double-count
    caveat applies to an uncommitted delta compacted outside the
    maintenance window). dedup_adjusted_budget_from_store reads
    identically before and after."""
    floor = _compact_partitioned(
        spark,
        store_dir,
        _KEPT_SCHEMA,
        lambda df: df.groupBy("source").agg(
            F.sum("kept_docs").alias("kept_docs"),
            F.sum("kept_tokens").alias("kept_tokens"),
        ),
    )
    if floor is not None:
        _write_compaction_floor(store_dir, floor)


def run_stream_ingest_suite(
    docs: DataFrame,
    root_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
    near_dup: bool = False,
    scorecard: bool = False,
) -> tuple[str, ...]:
    """ONE pass over the raw document stream feeding the corpus-health
    stores — the deployment shape for dedup-at-ingest: a crawl drop is
    read once, fingerprint and token count are computed once per batch,
    and the same cached micro-batch drives the dup-flow ingest (keepers +
    edges) and the volume ingest (per-(source, lang) partials). Running
    the two stores as separate streams re-reads and re-tokenizes every
    drop; here the normalize/tokenize map runs once for all consumers.

    ``docs`` is the raw documents schema (doc_id, text, lang, source,
    n_chars). Stores land under ``root_dir/flow``, ``root_dir/volume``
    and ``root_dir/kept`` — exactly the layouts
    dup_flow_matrix_from_store, report_card_from_store and
    dedup_adjusted_budget_from_store read. Returns (flow_dir, volume_dir,
    kept_dir).

    All ingests stage by batch_id, so the suite inherits their replay
    idempotence; a crash between the writes is healed by the replay
    overwriting every directory for that batch_id.

    ``near_dup=True`` (round 11) widens the same single pass to the
    near-dup stores: the cached batch additionally drives the LSH ingest
    (``root_dir/lsh``) and the cluster-label store (``root_dir/labels``)
    — shingling and banding run once per drop alongside the fingerprint
    stores, so EVERY corpus-health fold (flow matrix, report card,
    exact-fp budget, NEAR-dup budget) maintains itself from one read of
    the crawl. Returns two extra dirs in that case.

    ``scorecard=True`` (round 11) further widens the pass to the three
    stores the live curation scorecard needs beyond flow+volume —
    fertility sums (``root_dir/fert``), decode-health counts
    (``root_dir/health``) and shingle-occurrence counts
    (``root_dir/shingles``) — so curation_scorecard_from_stores can
    re-derive batch q232's exact table after every drop without ever
    re-reading the corpus. Returns those dirs appended."""

    flow_dir = os.path.join(root_dir, "flow")
    vol_dir = os.path.join(root_dir, "volume")
    kept_dir = os.path.join(root_dir, "kept")
    lsh_dir = os.path.join(root_dir, "lsh")
    labels_dir = os.path.join(root_dir, "labels")
    fert_dir = os.path.join(root_dir, "fert")
    health_dir = os.path.join(root_dir, "health")
    sh_dir = os.path.join(root_dir, "shingles")

    def ingest(batch: DataFrame, batch_id: int) -> None:
        # LSH shingles / scorecard tokenizer need the text
        enriched = _enriched_docs_batch(
            batch, with_text=near_dup or scorecard
        ).cache()
        try:
            _dup_flow_ingest(enriched, batch_id, flow_dir, kept_dir=kept_dir)
            _volume_ingest(enriched, batch_id, vol_dir)
            if near_dup:
                _lsh_dedup_ingest(enriched, batch_id, lsh_dir, labels_dir=labels_dir)
            if scorecard:
                _scorecard_ingest(enriched, batch_id, fert_dir, health_dir, sh_dir)
        finally:
            enriched.unpersist()

    _run_foreach_batch(
        docs, ingest, checkpoint_dir, timeout_sec, "run_stream_ingest_suite"
    )
    out = [flow_dir, vol_dir, kept_dir]
    if near_dup:
        out += [lsh_dir, labels_dir]
    if scorecard:
        out += [fert_dir, health_dir, sh_dir]
    return tuple(out)


def _enriched_docs_batch(batch: DataFrame, with_text: bool) -> DataFrame:
    """The one-pass ingest projection shared by run_stream_ingest_suite
    and run_stream_scorecard_monitor: fingerprint + token count computed
    once per micro-batch for every downstream store."""
    from ..functions import text as X

    return batch.select(
        "doc_id",
        *(["text"] if with_text else []),
        "source",
        "lang",
        "n_chars",
        X.fingerprint(F.col("text")).alias("fp"),
        X.token_count(F.col("text")).cast("bigint").alias("n_toks"),
    )


_FERT_SCHEMA = "source string, n_docs bigint, norm_chars bigint, n_words bigint"
_SHINGLE_SCHEMA = "sh bigint, source string, cnt bigint"


def _scorecard_ingest(
    batch: DataFrame, batch_id: int, fert_dir: str, health_dir: str, sh_dir: str
) -> None:
    """One micro-batch of the scorecard stores (the q232 signals flow +
    volume don't already carry):

    - fert: per-source additive (n_docs, normalized chars, whitespace
      words) over non-null text — q210's fertility numerator/denominator.
    - health: decode-health counts via the SHARED _decode_health_ingest
      (the real header decoders, q220's contract) over the batch's media.
    - shingles: per (shingle-hash, source) occurrence counts — q225's
      posting-list masses, additive across batches. The key is xxhash64
      of the 3-shingle, not the string: 8 bytes/row instead of the
      shingle text. A 64-bit collision merges two shingles' df (novelty
      reads marginally LOW, never high); at test corpus sizes collision
      probability is ~1e-8, and at 10^12 corpus shingles the expected
      handful of collisions moves a share ratio in the 12th decimal —
      the honest trade for a 3-5x smaller store.

    All three stage additive rows under batch_id=N (remapped above each
    store's own compaction floor), so replays overwrite their own deltas
    and the folds commute with arrival order."""
    from ..functions import text as X
    from ..operators.multimodal import attach_media_mix

    nn = batch.filter(F.col("text").isNotNull())
    eff_f = _effective_batch_id(fert_dir, batch_id, flat=True)
    (
        nn.groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.length(X.normalize(F.col("text"))).cast("bigint"))
            .cast("bigint")
            .alias("norm_chars"),
            # the suite already tokenized once per doc (token_count ==
            # size(tokens) on non-null text) — reuse its n_toks column
            # instead of a second tokenize pass
            F.sum("n_toks").cast("bigint").alias("n_words"),
        )
        .write.mode("overwrite")
        .parquet(os.path.join(fert_dir, f"batch_id={eff_f}"))
    )
    _decode_health_ingest(
        attach_media_mix(batch.select("doc_id", "source")), batch_id, health_dir
    )
    eff_s = _effective_batch_id(sh_dir, batch_id, flat=True)
    (
        nn.select(
            "source",
            F.explode_outer(
                X.shingles_of_tokens(X.tokens(F.col("text")), 3)
            ).alias("s"),
        )
        .groupBy(F.xxhash64("s").alias("sh"), "source")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
        .write.mode("overwrite")
        .parquet(os.path.join(sh_dir, f"batch_id={eff_s}"))
    )


def curation_scorecard_from_stores(spark: SparkSession, root_dir: str) -> DataFrame:
    """Batch q232's per-source curation scorecard folded ENTIRELY from the
    ingest-suite stores — the one table a data lead reads, maintained
    live: after any crawl drop the fold re-derives dup exposure (flow +
    volume stores), tokenizer fertility (fert store), media decode health
    (health store) and n-gram novelty (shingle store), then applies the
    SAME scorecard_columns formula as the batch plan. Reads O(batches x
    sources) additive rows everywhere except the shingle fold, which is
    one hash aggregate over O(distinct shingles) store rows — the store
    IS the posting-list df table, so novelty costs a groupBy, not a
    corpus re-tokenize.

    Tuple-exact equal to batch q232 after full ingest (pinned fwd +
    reversed arrival + mid-stream compaction in tests/test_streaming.py);
    novelty's only divergence channel is a 64-bit shingle-hash collision
    (see _scorecard_ingest)."""
    from ..plans.curation import scorecard_columns

    rep = report_card_from_store(
        spark, os.path.join(root_dir, "volume"), os.path.join(root_dir, "flow")
    ).select("source", "n_docs", "n_tokens", "dup_rate")
    fert = (
        _read_store_deltas(spark, os.path.join(root_dir, "fert"), _FERT_SCHEMA)
        .groupBy("source")
        .agg(
            (
                F.sum("norm_chars").cast("double") / F.sum("n_words")
            ).alias("chars_per_word")
        )
    )
    health = _read_store_deltas(
        spark, os.path.join(root_dir, "health"), _HEALTH_COUNT_SCHEMA
    )
    med = health.groupBy("source").agg(
        (
            F.sum(F.when(F.col("status") != "ok", F.col("n_docs")).otherwise(0))
            .cast("double")
            / F.sum("n_docs")
        ).alias("malformed_share")
    )
    sh = (
        _read_store_deltas(spark, os.path.join(root_dir, "shingles"), _SHINGLE_SCHEMA)
        .groupBy("sh", "source")
        .agg(F.sum("cnt").alias("cnt"))
    )
    df_tab = sh.groupBy("sh").agg(F.sum("cnt").alias("df"))
    nov = (
        sh.join(df_tab, "sh")
        .groupBy("source")
        .agg(
            (
                F.sum(F.when(F.col("df") == 1, F.col("cnt")).otherwise(0))
                .cast("double")
                / F.sum("cnt")
            ).alias("novelty_share")
        )
    )
    j = (
        rep.join(fert, "source", "left")
        .join(med, "source", "left")
        .join(nov, "source", "left")
    )
    return scorecard_columns(j)


def compact_fert_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the fertility store: per-source sums are additive;
    curation_scorecard_from_stores reads identically before and after.
    Additive ⇒ the section contract's one-batch double-count caveat
    applies to an uncommitted delta compacted outside the maintenance
    window."""
    floor = _compact_partitioned(
        spark,
        store_dir,
        _FERT_SCHEMA,
        lambda df: df.groupBy("source").agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("norm_chars").alias("norm_chars"),
            F.sum("n_words").alias("n_words"),
        ),
    )
    if floor is not None:
        _write_compaction_floor(store_dir, floor)


def compact_shingle_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the shingle-occurrence store: (sh, source) counts merge by
    summation — the df fold and novelty shares read identically before
    and after. This is the store that earns compaction: its deltas grow
    with distinct shingles per batch, and the fold collapses every
    shingle's history to one row."""
    floor = _compact_partitioned(
        spark,
        store_dir,
        _SHINGLE_SCHEMA,
        lambda df: df.groupBy("sh", "source").agg(F.sum("cnt").alias("cnt")),
    )
    if floor is not None:
        _write_compaction_floor(store_dir, floor)


_SCORECARD_LOG_SCHEMA = (
    "source string, n_flags int, recommendation string, degraded boolean"
)

def _rec_rank() -> F.Column:
    """renew < review < reduce as an ordinal (built lazily — Column
    construction needs a live SparkContext, so no module-level exprs)."""
    return (
        F.when(F.col("recommendation") == "renew", 0)
        .when(F.col("recommendation") == "review", 1)
        .otherwise(2)
    )


def run_stream_scorecard_monitor(
    docs: DataFrame,
    root_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """Operational endpoint of the live scorecard: the same one-pass
    scorecard-store ingest as run_stream_ingest_suite(scorecard=True),
    plus one evaluation-log row PER SOURCE after every drop — the current
    flag count and recommendation, and ``degraded``: did this drop push
    the source's recommendation strictly WORSE (renew→review→reduce) than
    its last logged verdict? A crawl source that starts flooding
    duplicates or broken media pages the data lead on the drop that
    crossed the threshold, months before the renewal review reads q232.

    Scale shape: per batch the suite's staged ingests (additive rows) +
    the scorecard fold (store rows only, the shingle fold's hash
    aggregate dominating — O(distinct shingles), so a paging cadence at
    large corpus scale wants compact_shingle_store run on a maintenance
    schedule to keep the fold at one row per shingle) + an O(sources)
    log row set. The log stages by effective batch id like every monitor
    — replay idempotent, the degraded flag computed against
    strictly-earlier rows only."""

    flow_dir = os.path.join(root_dir, "flow")
    vol_dir = os.path.join(root_dir, "volume")
    kept_dir = os.path.join(root_dir, "kept")
    fert_dir = os.path.join(root_dir, "fert")
    health_dir = os.path.join(root_dir, "health")
    sh_dir = os.path.join(root_dir, "shingles")
    log_dir = os.path.join(root_dir, "log")

    def monitor(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        enriched = _enriched_docs_batch(batch, with_text=True).cache()
        try:
            _dup_flow_ingest(enriched, batch_id, flow_dir, kept_dir=kept_dir)
            _volume_ingest(enriched, batch_id, vol_dir)
            _scorecard_ingest(enriched, batch_id, fert_dir, health_dir, sh_dir)
        finally:
            enriched.unpersist()
        eff_id = _effective_batch_id(log_dir, batch_id, flat=True)
        sc = curation_scorecard_from_stores(spark, root_dir).select(
            "source", "n_flags", "recommendation", _rec_rank().alias("rk")
        )
        prev = (
            _read_store_deltas(spark, log_dir, _SCORECARD_LOG_SCHEMA)
            .where(F.col("batch_id") < eff_id)
            .groupBy("source")
            .agg(F.max_by("recommendation", "batch_id").alias("recommendation"))
            .select("source", _rec_rank().alias("prev_rk"))
        )
        (
            sc.join(prev, "source", "left")
            .select(
                "source",
                "n_flags",
                "recommendation",
                # first sighting of a source is a baseline, not a downgrade
                (F.col("rk") > F.coalesce(F.col("prev_rk"), F.col("rk"))).alias(
                    "degraded"
                ),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(log_dir, f"batch_id={eff_id}"))
        )

    _run_foreach_batch(
        docs, monitor, checkpoint_dir, timeout_sec, "run_stream_scorecard_monitor"
    )


def scorecard_monitor_log(spark: SparkSession, root_dir: str) -> DataFrame:
    """The scorecard monitor's append-only evaluation log, ordered by
    (batch, source)."""
    return _monitor_log(
        spark, os.path.join(root_dir, "log"), _SCORECARD_LOG_SCHEMA
    )


def run_stream_psi_counts_by_key(
    values: DataFrame,
    ref_edges: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    n_bins: int = 10,
    timeout_sec: int = 120,
) -> None:
    """Keyed drift-monitor ingestion — the streaming twin of batch q160
    (plans/drift.py): bin a (key, v) stream against PER-KEY frozen
    reference edges (``ref_edges``: key, lo, width — computed once when
    the per-segment reference windows froze) and append per-batch
    (key, bin) counts under batch_id=N (staged overwrite, replay
    idempotent). Rows whose key has no reference edges are dropped — the
    same contract as q160's inner edges join (a segment never seen at
    training time has no frozen bins to count into).

    Scale: the edges side is O(segments) rows (broadcast per batch); the
    store grows O(batches x segments x bins) of additive state."""
    binner = _keyed_binner(ref_edges, n_bins)

    def bin_counts(batch: DataFrame, batch_id: int) -> None:
        _stage_bin_counts(
            binner(batch),
            _effective_batch_id(store_dir, batch_id, flat=True),
            store_dir,
            ["key"],
        )

    _run_foreach_batch(
        values, bin_counts, checkpoint_dir, timeout_sec, "run_stream_psi_counts_by_key"
    )


def psi_by_key_from_store(
    spark: SparkSession,
    store_dir: str,
    ref_counts: DataFrame,
    eps: float = 1e-9,
) -> DataFrame:
    """Per-(key, bin) PSI terms of the streamed populations vs per-key
    frozen reference histograms (``ref_counts``: key, bin, n_ref). Counts
    are additive across micro-batches, so once the backlog drains this
    equals batch q160 on the same splits/edges exactly (pytest-pinned);
    bin and term math are IMPORTED from plans/drift, so the twins cannot
    drift apart by construction."""
    return _psi_fold(spark, store_dir, ref_counts, ["key"], eps)


def run_stream_drift_monitor_by_key(
    values: DataFrame,
    ref_edges: DataFrame,
    ref_counts: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    n_bins: int = 10,
    psi_alert: float = 0.2,
    timeout_sec: int = 120,
) -> None:
    """Keyed operational drift monitor — run_stream_drift_monitor's
    multi-population face (q160's deployment): per micro-batch, append
    the per-key frozen-edge bin counts (the run_stream_psi_counts_by_key
    store) AND one evaluation-log row PER KEY (batch_id, key, psi_total,
    n_cur, alert) computed from the cumulative store vs the per-key
    reference histograms. One segment crossing ``psi_alert`` raises its
    own flag without the quiet segments' mass diluting it — the
    localization a corpus-level monitor can't give.

    Like the unkeyed monitor, psi_total is a driver-side float sum of the
    per-(key, bin) rounded terms — an operational signal; the per-bin
    terms (oracle-paired via q160) stay in the store for exact auditing.
    Counts and log are both staged per batch_id (replay idempotent)."""
    counts_dir = os.path.join(store_dir, "counts")
    log_dir = os.path.join(store_dir, "log")
    binner = _keyed_binner(ref_edges, n_bins)

    def monitor(batch: DataFrame, batch_id: int) -> None:
        _monitor_ingest(
            batch, batch_id, binner, counts_dir, log_dir, ref_counts, ["key"], psi_alert
        )

    _run_foreach_batch(
        values, monitor, checkpoint_dir, timeout_sec, "run_stream_drift_monitor_by_key"
    )


def drift_monitor_log_by_key(spark: SparkSession, store_dir: str) -> DataFrame:
    """The keyed monitor's append-only evaluation log, ordered by
    (batch, key)."""
    return _monitor_log(
        spark,
        os.path.join(store_dir, "log"),
        "key string, psi_total double, n_cur bigint, alert boolean",
    )


# ---------------------------------------------------------------------------
# Incremental MinHash-LSH near-dup detection at ingest (VERDICT r5 item 7):
# the streaming twin of batch q36 (plans/dedup.py lsh_jaccard_pairs). The
# q87/q146 fingerprint stores catch EXACT duplicates at ingest; a 100-TB
# pipeline also near-dups at ingest — each arriving crawl drop's docs must
# be checked against every previously ingested doc without rescanning the
# corpus. Band buckets make that an equi-join against stored band keys.
# ---------------------------------------------------------------------------

_LSH_STATE_SCHEMA = (
    "doc_id bigint, sh array<string>, bands array<struct<band:int,key:bigint>>"
)
_LSH_PAIRS_SCHEMA = "doc_a bigint, doc_b bigint, jac double"


def _lsh_dedup_ingest(
    batch: DataFrame, batch_id: int, store_dir: str, labels_dir: str | None = None
) -> None:
    """One micro-batch of the LSH near-dup store: shingle + band the batch,
    find candidates within the batch AND against the stored band keys of
    batches < this one, exact-Jaccard-verify candidates only, stage the
    batch's new pairs and its state rows under batch_id=N (idempotent on
    replay — both writes are per-batch overwrites, and the state lookup
    filters batch_id < N so a replay never joins its own earlier write).

    Compaction safety (ADVICE r6, collision-proofed ADVICE r7): once a
    compaction has folded history into the max batch_id and recorded it in
    the `_compaction_floor` marker, EVERY subsequent batch id is remapped
    to floor+1+batch_id — uniformly, not only ids at or below the floor.
    Uniform remap makes effective ids injective and strictly monotone in
    the raw id (the earlier below-floor-only remap let a replayed/fresh
    batch b collide with a genuine continuing batch floor+1+b, and
    mode('overwrite') would silently destroy one delta). So: a replay of a
    folded id (crash between write and checkpoint commit, or a
    fresh-checkpoint restart at 0) lands above the compacted delta, its
    state filter still sees the compacted history, and already-ingested
    doc_ids are dropped by the anti-join — a no-op instead of a
    double-ingest. Across compactions the floor only grows and the
    maintenance-window contract folds every existing delta first, so no
    live partition ever sits above a newer floor's remap range."""
    from ..functions import text as X
    from ..plans.dedup import _JACCARD_T, band_key_structs

    spark = batch.sparkSession
    state_dir = os.path.join(store_dir, "state")
    _recover_compaction(os.path.join(store_dir, "pairs"))  # heal crashed compaction
    eff_id = _effective_batch_id(store_dir, batch_id)
    # null-shingle docs (null text) can never verify; drop like batch q36
    cur = (
        batch.select("doc_id", X.shingles(F.col("text"), 3).alias("sh"))
        .where(F.col("sh").isNotNull())
        .withColumn("bands", F.array(*band_key_structs(F.col("sh"))))
    )
    state = (
        _read_store_deltas(spark, state_dir, _LSH_STATE_SCHEMA)
        .where(F.col("batch_id") < eff_id)
        .drop("batch_id")
    )
    # idempotence across compaction: a doc whose id is already in state
    # (its batch was folded into the compacted delta) must not re-ingest
    cur = cur.join(state.select("doc_id"), "doc_id", "left_anti")
    cur = cur.localCheckpoint(eager=True)  # four consumers; shingling is the cost

    def exploded(df: DataFrame, side: str) -> DataFrame:
        return df.select(F.col("doc_id").alias(side), F.explode("bands").alias("b")).select(
            side, F.col("b.band").alias(f"band_{side}"), F.col("b.key").alias(f"key_{side}")
        )

    exb = exploded(cur, "doc_a").localCheckpoint(eager=True)  # both joins consume it
    # within-batch candidates (doc_a < doc_b orients each pair once)
    exb2 = exb.select(
        F.col("doc_a").alias("doc_b"),
        F.col("band_doc_a").alias("band_doc_b"),
        F.col("key_doc_a").alias("key_doc_b"),
    )
    intra = exb.join(
        exb2,
        (F.col("band_doc_a") == F.col("band_doc_b"))
        & (F.col("key_doc_a") == F.col("key_doc_b"))
        & (F.col("doc_a") < F.col("doc_b")),
    ).select("doc_a", "doc_b")
    # batch-vs-store candidates: exactly one side is new, so every stored
    # pair is emitted exactly once — by the batch that completes it
    exs = exploded(state, "doc_b")
    cross = exb.join(
        exs,
        (F.col("band_doc_a") == F.col("band_doc_b"))
        & (F.col("key_doc_a") == F.col("key_doc_b"))
        & (F.col("doc_a") != F.col("doc_b")),  # no self-pairs, ever
    ).select(
        F.least("doc_a", "doc_b").alias("doc_a"),
        F.greatest("doc_a", "doc_b").alias("doc_b"),
    )
    candidates = intra.unionByName(cross).distinct()
    # exact verify on candidates only (the q36 contract): shingle lookup
    # spans this batch plus the stored state
    sh_all = cur.select("doc_id", "sh").unionByName(state.select("doc_id", "sh"))
    sh_a = sh_all.select(F.col("doc_id").alias("doc_a"), F.col("sh").alias("sh_a"))
    sh_b = sh_all.select(F.col("doc_id").alias("doc_b"), F.col("sh").alias("sh_b"))
    common = F.size(F.array_intersect(F.col("sh_a"), F.col("sh_b")))
    union = F.size(F.col("sh_a")) + F.size(F.col("sh_b")) - common
    pairs = (
        candidates.join(sh_a, "doc_a")
        .join(sh_b, "doc_b")
        .select("doc_a", "doc_b", (common.cast("double") / union).alias("jac"))
        .filter(F.col("jac") >= _JACCARD_T)
    )
    pairs_delta = os.path.join(store_dir, "pairs", f"batch_id={eff_id}")
    pairs.write.mode("overwrite").parquet(pairs_delta)
    cur.select("doc_id", "sh", "bands").write.mode("overwrite").parquet(
        os.path.join(state_dir, f"batch_id={eff_id}")
    )
    if labels_dir is not None:
        # near-dup cluster-label maintenance (round 11): the batch must
        # carry (source, n_toks). Pairs are read BACK from the staged
        # delta — already materialized, so the candidate join never
        # recomputes, and a folded-id replay (empty cur ⇒ empty delta)
        # makes the label update a no-op by construction.
        _near_dup_label_ingest(
            batch.select("doc_id", "source", "n_toks"),
            batch_id,
            labels_dir,
            spark.read.schema(_LSH_PAIRS_SCHEMA).parquet(pairs_delta),
        )


def run_stream_lsh_dedup(
    docs: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch incremental MinHash-LSH near-dup store — near-dup
    detection AT INGEST. ``docs`` is a streaming frame of (doc_id, text);
    two staged-delta parquet tables:

      state/batch_id=N/ (doc_id, sh, bands) — shingle sets + band keys of
                        batch N's docs (the lookup side for later batches).
      pairs/batch_id=N/ (doc_a, doc_b, jac) — near-dup pairs COMPLETED by
                        batch N: both docs in N, or one in N and one in an
                        earlier batch (oriented least/greatest, so each
                        unordered pair is staged exactly once — by the
                        batch that sees its second member).

    ``near_dup_pairs_from_store`` folds the deltas into batch q36's exact
    output, and the fold is arrival-order-independent (each pair is
    emitted once with a content-determined jac), pinned for in-order AND
    reversed drops in tests/test_streaming.py.

    Scale shape: per batch, candidate generation is an equi-join on
    (band, key) between the batch's exploded band keys and the store's —
    never an all-pairs pass; verification touches candidates only. The
    state read grows with store size until compaction
    (compact_lsh_dedup_store) folds the deltas; at 100 TB the state lives
    bucketed on (band, key) so the per-batch join co-locates without a
    full-store shuffle. Unlike batch q36 there is no exact-dup collapse:
    a batch is one crawl drop, and the irreducible output of a planted
    everyone-identical corpus (quadratic pairs) dominates the candidate
    work anyway."""

    def ingest(batch: DataFrame, batch_id: int) -> None:
        _lsh_dedup_ingest(batch, batch_id, store_dir)

    _run_foreach_batch(
        docs, ingest, checkpoint_dir, timeout_sec, "run_stream_lsh_dedup"
    )


def near_dup_pairs_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Batch q36's (doc_a, doc_b, jac) folded from the LSH ingest store —
    reads only the pair deltas (linear in near-dups), never the corpus."""
    return (
        _read_store_deltas(spark, os.path.join(store_dir, "pairs"), _LSH_PAIRS_SCHEMA)
        .select("doc_a", "doc_b", "jac")
        .orderBy("doc_a", "doc_b")
    )


# ---------------------------------------------------------------------------
# Incremental NEAR-dup cluster labels + kept-mass accounting (VERDICT r10
# item 3): the exact-fp kept store nets out only byte-identical
# duplication, so its budget OVERSTATES each source's effective tokens vs
# batch q226 (which nets near-dup clusters via connected components). The
# LSH ingest already completes every near-dup pair at ingest; this store
# maintains CLUSTER-STABLE incremental keepers on top of it.
#
# Invariant that makes it fold-simple: a cluster's label is its min
# doc_id, and min-label propagation only ever DECREASES a doc's label —
# so the store stages (doc_id, source, nt, label) rows where the CURRENT
# label of a doc is the MIN over its staged rows. The fold is a
# commutative, idempotent min — replaying a batch (even the folded-id
# schedule that double-counts additive stores) re-stages rows whose min
# is unchanged, so this store has NO bounded-double-count caveat. A doc
# is its cluster's keeper iff label == doc_id, which is exactly batch
# q226's min-doc_id keeper — making the budget fold two tiny aggregates.
#
# Per batch, the merge works on the LABEL-CONTRACTED graph: each new pair
# connects its endpoints' CURRENT labels; connected components over that
# (tiny — bounded by 2x the batch's new pairs) yield the label remap, and
# every doc whose current label was remapped gets one update row. A label
# value, once remapped away, is never current again, so update rows are
# found by a broadcast join of the staged rows against the remap — no
# corpus-wide fold per batch.
# ---------------------------------------------------------------------------

_ND_LABELS_SCHEMA = "doc_id bigint, source string, nt bigint, label bigint"


def _near_dup_label_ingest(
    meta: DataFrame, batch_id: int, labels_dir: str, pairs: DataFrame
) -> None:
    """One micro-batch of the near-dup label store. ``meta`` is the
    batch's (doc_id, source, n_toks); ``pairs`` the near-dup pairs this
    batch COMPLETED (from the LSH ingest's staged delta — both docs in
    this batch, or one here and one stored)."""
    spark = meta.sparkSession
    eff_id = _effective_batch_id(labels_dir, batch_id, flat=True)
    prior_rows = (
        _read_store_deltas(spark, labels_dir, _ND_LABELS_SCHEMA)
        .where(F.col("batch_id") < eff_id)
        .drop("batch_id")
    )
    # docs new to the store start self-labeled (their own singleton
    # cluster); a folded-id replay finds them all already present
    new_docs = (
        meta.join(prior_rows.select("doc_id"), "doc_id", "left_anti")
        .select(
            "doc_id",
            "source",
            F.col("n_toks").cast("bigint").alias("nt"),
            F.col("doc_id").alias("label"),
        )
        .localCheckpoint(eager=True)  # consumed by endpoint lookup + delta
    )
    all_rows = prior_rows.unionByName(new_docs)
    if pairs.isEmpty():
        new_docs.write.mode("overwrite").parquet(
            os.path.join(labels_dir, f"batch_id={eff_id}")
        )
        return
    # current labels of the pairs' endpoints (tiny set): min over a doc's
    # staged rows IS its current label
    ep_ids = (
        pairs.select(F.col("doc_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_b").alias("doc_id")))
        .distinct()
    )
    ep = (
        all_rows.join(F.broadcast(ep_ids), "doc_id")
        .groupBy("doc_id")
        .agg(F.min("label").alias("label"))
    )
    la = ep.select(F.col("doc_id").alias("doc_a"), F.col("label").alias("src"))
    lb = ep.select(F.col("doc_id").alias("doc_b"), F.col("label").alias("dst"))
    label_edges = (
        pairs.join(la, "doc_a")
        .join(lb, "doc_b")
        .where(F.col("src") != F.col("dst"))
        .select("src", "dst")
        .distinct()
        .localCheckpoint(eager=True)  # consumed by the guard + CC rounds
    )
    if label_edges.isEmpty():
        # every pair lies within an existing cluster — no merges; the
        # steady-state fast path once clusters have formed
        new_docs.write.mode("overwrite").parquet(
            os.path.join(labels_dir, f"batch_id={eff_id}")
        )
        return
    verts = (
        label_edges.select(F.col("src").alias("id"))
        .unionByName(label_edges.select(F.col("dst").alias("id")))
        .distinct()
    )
    from ..operators.graph import connected_components

    comp = connected_components(verts, label_edges)
    remap = comp.where(F.col("id") != F.col("component"))
    # one update row per doc whose CURRENT label was merged away; stale
    # rows never match (a remapped-away label is never current again)
    changed = (
        all_rows.join(F.broadcast(remap), all_rows["label"] == remap["id"])
        .select("doc_id", "source", "nt", F.col("component").alias("label"))
    )
    new_docs.unionByName(changed).write.mode("overwrite").parquet(
        os.path.join(labels_dir, f"batch_id={eff_id}")
    )


def run_stream_neardup_ingest_suite(
    docs: DataFrame,
    root_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> tuple[str, str]:
    """ONE pass over the raw document stream feeding near-dup detection
    AND cluster-keeper accounting: each crawl drop is shingled once by
    the LSH ingest (state + completed pairs under ``root_dir/lsh``), and
    the same batch's pairs drive the cluster-label store under
    ``root_dir/labels`` — so ``dedup_adjusted_budget_from_labels_store``
    re-plans the q226 budget (NEAR-dup-netted, not just exact-fp) after
    every drop without re-reading the corpus. ``docs`` is the raw
    documents schema. Returns (lsh_dir, labels_dir)."""
    from ..functions import text as X

    lsh_dir = os.path.join(root_dir, "lsh")
    labels_dir = os.path.join(root_dir, "labels")

    def ingest(batch: DataFrame, batch_id: int) -> None:
        enriched = batch.select(
            "doc_id",
            "text",
            "source",
            X.token_count(F.col("text")).cast("bigint").alias("n_toks"),
        ).cache()
        try:
            _lsh_dedup_ingest(enriched, batch_id, lsh_dir, labels_dir=labels_dir)
        finally:
            enriched.unpersist()

    _run_foreach_batch(
        docs, ingest, checkpoint_dir, timeout_sec, "run_stream_neardup_ingest_suite"
    )
    return lsh_dir, labels_dir


def dedup_adjusted_budget_from_labels_store(
    spark: SparkSession, labels_dir: str, budget_tokens: int | None = None
) -> DataFrame:
    """Batch q226 folded from the near-dup label store: current labels
    are the min per doc over the staged rows; keepers are docs whose
    label is their own id (batch q226's min-doc_id keeper, by the CC
    label convention); effective mass counts each CLUSTER once at its
    keeper's source. Equals batch q226 exactly after the backlog drains —
    arrival-order-independent, because the pair set is (pinned) and the
    min-label fold is commutative. Reads O(docs + updates) narrow store
    rows, never the corpus."""
    if budget_tokens is None:
        from ..plans.curation import _BUDGET_TOKENS as budget_tokens
    from ..plans.curation import budget_plan_columns

    cur = (
        _read_store_deltas(spark, labels_dir, _ND_LABELS_SCHEMA)
        .groupBy("doc_id")
        .agg(
            F.min("label").alias("label"),
            F.max("source").alias("source"),
            F.max("nt").alias("nt"),
        )
    )
    raw = cur.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nt").cast("bigint").alias("raw_tokens"),
    )
    eff = (
        cur.where(F.col("doc_id") == F.col("label"))
        .groupBy("source")
        .agg(F.sum("nt").cast("bigint").alias("eff_tokens"))
    )
    j = raw.join(eff, "source", "left").na.fill(0, ["eff_tokens"])
    return budget_plan_columns(j, budget_tokens)


def cluster_sizes_from_labels_store(
    spark: SparkSession, labels_dir: str
) -> DataFrame:
    """Batch q234's cluster-size histogram folded from the near-dup label
    store: current labels are the min per doc over the staged rows (the
    idempotent fold), then q234's own histogram math
    (plans/dedup.cluster_size_distribution) — the live answer to "did
    this drop grow a mega-template?" without re-running LSH or CC.
    Equals batch q234 exactly after the backlog drains, for the same
    reason the budget fold equals q226 (converged min labels ARE the
    component labels, pinned)."""
    from ..plans.dedup import cluster_size_distribution

    cur = (
        _read_store_deltas(spark, labels_dir, _ND_LABELS_SCHEMA)
        .groupBy("doc_id")
        .agg(F.min("label").alias("label"))
    )
    return cluster_size_distribution(cur, label_col="label")


def compact_near_dup_labels_store(spark: SparkSession, labels_dir: str) -> None:
    """Compact the near-dup label store to one row per doc at its current
    (min) label. The fold is idempotent min/max, so compaction is exact
    under any schedule; the floor marker keeps later ingest ids above the
    folded delta like every flat store."""
    floor = _compact_partitioned(
        spark,
        labels_dir,
        _ND_LABELS_SCHEMA,
        lambda df: df.groupBy("doc_id").agg(
            F.max("source").alias("source"),
            F.max("nt").alias("nt"),
            F.min("label").alias("label"),
        ).select("doc_id", "source", "nt", "label"),
    )
    if floor is not None:
        _write_compaction_floor(labels_dir, floor)


# ---------------------------------------------------------------------------
# Store compaction: the maintenance half of the staged-delta contract.
# Every foreachBatch store above appends one batch_id=N delta per
# micro-batch, so store reads (keeper lookups, PSI folds) grow linearly
# with batch COUNT even when the folded state is tiny. Compaction merges
# all deltas into a single batch_id=0 delta with the identical fold.
#
# CONTRACT: run only while no stream is writing the store AND the last
# drain completed (all batches committed). A replayed batch overwrites
# its own batch_id dir; compacting an uncommitted batch's delta into
# batch_id=0 would double-count it on replay, and the dup-flow keeper
# lookup's `batch_id < N` filter would see batch N's own compacted
# keepers. Between availableNow drains — the natural maintenance window
# — both hazards are impossible.
#
# BOUNDED DOUBLE-COUNT CAVEAT (ADVICE r9): the floor remap trades replay
# idempotence for history safety on exactly ONE pathological schedule —
# an uncommitted batch whose delta was compacted anyway (a violation of
# the window contract above: crash between the delta write and the
# checkpoint commit, compaction run before the stream resumes). The
# replayed raw id then lands ABOVE the floor instead of overwriting its
# own (now folded) delta, so ADDITIVE stores (counts/volume/basket/
# attribution-revenue/revenue-partials/decode-health/dup-flow edges)
# count that one batch twice; latest-wins folds (CDC) and unique-row
# folds (LSH state) are unchanged. The dup-flow SELF-edge this schedule
# could once manufacture (the replayed keeper counted as a dup of
# itself) is gone since round 11: the keeper store records
# keeper_doc_id and the ingest drops any dup row whose doc IS the
# stored keeper (VERDICT r10 item 7) — only the bounded edge
# double-count remains.
# The alternative — skipping raw ids at-or-below a folded high-water mark
# — cannot distinguish this replay from a fresh-checkpoint restart (both
# re-present low raw ids) without introspecting the engine's checkpoint,
# and would silently DROP data on the restart path; a bounded duplicate
# of one batch is the better failure. Honoring the maintenance-window
# contract makes the schedule impossible in the first place.
# ---------------------------------------------------------------------------


_FLOOR_MARKER = "_compaction_floor"


def _floor_marker_path(store_dir: str) -> str:
    """Where a store's compaction-floor marker lives: INSIDE the store
    directory, for every store shape (ADVICE r9). Two-level stores keep it
    in the stable parent beside the swapped subdirs; flat stores keep it
    beside their ``batch_id=*`` partition dirs — the leading underscore
    makes Spark's parquet reader skip it, and _compact_partitioned copies
    it into the rebuilt directory BEFORE the rename-rename swap, so the
    marker always travels with the store (a directory-level copy, move,
    or backup can no longer detach the floor from the data it protects)."""
    return os.path.join(store_dir, _FLOOR_MARKER)


def _read_compaction_floor(store_dir: str, flat: bool = False) -> int | None:
    """The highest batch_id folded by the last compaction (None before the
    first compaction). Written by every compact_*_store; once present,
    ingests remap EVERY batch id above it (see _effective_batch_id).
    ``flat`` additionally checks the pre-r10 sibling location
    (``<store>._compaction_floor``) so stores written by earlier rounds
    keep their floor."""
    try:
        with open(_floor_marker_path(store_dir)) as f:
            return int(f.read().strip())
    except (OSError, ValueError):
        pass
    if flat:
        try:
            with open(store_dir.rstrip(os.sep) + "." + _FLOOR_MARKER) as f:
                return int(f.read().strip())
        except (OSError, ValueError):
            pass
    return None


def _write_compaction_floor(store_dir: str, floor: int) -> None:
    path = _floor_marker_path(store_dir)
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        f.write(str(floor))
    os.replace(tmp, path)


def _effective_batch_id(store_dir: str, batch_id: int, flat: bool = False) -> int:
    """Remap a raw micro-batch id above the store's compaction floor
    (ADVICE r6/r7, generalized to every compactable store in ADVICE r8):
    compaction folds history into the MAX existing batch_id, so a replay
    of that raw id — crash between the delta write and the checkpoint
    commit with a compaction run before the stream resumes, or a
    fresh-checkpoint restart whose ids begin again at 0 — would otherwise
    mode('overwrite') the single folded delta and silently destroy all
    prior history. Once a floor exists, EVERY raw id maps to
    floor+1+raw_id: injective and strictly monotone, so replayed and
    continuing batches can never collide with each other or with the
    compacted delta. Before the first compaction this is the identity.

    Flat stores are also HEALED here (round-9 hardening): a compaction
    that died between its two renames leaves the live dir missing with
    `.old` holding all history; an ingest that recreated the live dir
    would make the next _recover_compaction delete the backup — silent
    history loss. Healing before the first post-crash write closes the
    stream-resumes-before-any-fold window. Two-level stores heal their
    swapped SUBDIRS at their own ingest sites (the marker parent is never
    swapped)."""
    if flat:
        _recover_compaction(store_dir)
    floor = _read_compaction_floor(store_dir, flat=flat)
    return batch_id if floor is None else floor + 1 + batch_id


def _recover_compaction(store_dir: str) -> None:
    """Heal a compaction interrupted between its two renames: if the live
    name is missing but the `.old` backup exists, restore the backup (and
    drop the half-promoted build). Called by _compact_partitioned and by
    every store fold, so a crashed compaction can never read as an empty
    store — at worst the next compaction redoes the merge."""
    import shutil

    old = store_dir + ".old"
    if os.path.exists(store_dir):
        if os.path.exists(old):  # completed swap, stale backup
            shutil.rmtree(old, ignore_errors=True)
    elif os.path.exists(old):
        os.rename(old, store_dir)
        shutil.rmtree(store_dir + ".compacting", ignore_errors=True)


def _compact_partitioned(
    spark: SparkSession, store_dir: str, schema: str, merge
) -> int | None:
    """Read every batch_id delta with the declared schema, merge, swap the
    store for a single-delta copy living at the MAX existing batch_id —
    not 0, so a stream mistakenly restarted on a FRESH checkpoint (ids
    restart at 0) overwrites at most an empty low-id delta instead of the
    whole compacted history. The swap is rename-rename with a `.old`
    backup; a crash between the renames is healed by _recover_compaction
    (run this in the maintenance window — no concurrent readers/writers)."""
    import re
    import shutil

    _recover_compaction(store_dir)
    if not os.path.exists(store_dir):
        return None
    ids = [
        int(m.group(1))
        for d in os.listdir(store_dir)
        if (m := re.match(r"batch_id=(\d+)$", d))
    ]
    target = max(ids) if ids else 0
    df = (
        spark.read.schema(schema)
        .option("basePath", store_dir)
        .parquet(f"{store_dir}/batch_id=*")
    )
    merged = merge(df)
    tmp = store_dir + ".compacting"
    shutil.rmtree(tmp, ignore_errors=True)
    merged.write.mode("overwrite").parquet(os.path.join(tmp, f"batch_id={target}"))
    # carry the floor marker into the rebuilt dir BEFORE the swap: a crash
    # between the swap and the caller's _write_compaction_floor must leave
    # the previous floor in place, never strip it (an unfloored store would
    # let a folded-id replay overwrite the compacted delta).
    marker = _floor_marker_path(store_dir)
    if os.path.exists(marker):
        shutil.copyfile(marker, _floor_marker_path(tmp))
    old = store_dir + ".old"
    shutil.rmtree(old, ignore_errors=True)
    os.rename(store_dir, old)
    os.rename(tmp, store_dir)
    shutil.rmtree(old, ignore_errors=True)
    return target


def compact_counts_store(
    spark: SparkSession, store_dir: str, key_cols: list[str] | None = None
) -> None:
    """Compact a (keyed or unkeyed) PSI bin-counts store: additive counts
    merge by summation; psi(_by_key)_from_store reads identically before
    and after (pytest-pinned). Additive ⇒ subject to the one-batch
    double-count caveat in the section contract above if an uncommitted
    delta is compacted outside the maintenance window."""
    keys = list(key_cols or [])
    floor = _compact_partitioned(
        spark,
        store_dir,
        _counts_read_schema(keys),
        lambda df: df.groupBy(*keys, "bin").agg(F.sum("n").alias("n")),
    )
    if floor is not None:
        _write_compaction_floor(store_dir, floor)


def compact_volume_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the report-card volume store: all five measures are
    additive per (source, lang) cell — additive ⇒ the one-batch
    double-count caveat (section contract above) applies to an
    uncommitted delta compacted outside the maintenance window."""
    floor = _compact_partitioned(
        spark,
        store_dir,
        "source string, lang string, n_docs bigint, n_tokens bigint, n_chars bigint",
        lambda df: df.groupBy("source", "lang").agg(
            F.sum("n_docs").alias("n_docs"),
            F.sum("n_tokens").alias("n_tokens"),
            F.sum("n_chars").alias("n_chars"),
        ),
    )
    if floor is not None:
        _write_compaction_floor(store_dir, floor)


def compact_dup_flow_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the dup-flow store: keepers are one row per distinct kept
    fingerprint (the union IS the merged state — fp is unique across
    deltas by construction, so this is a plain rewrite), edges sum their
    n_docs per (fp, keeper_source, dup_source). Continued ingestion after
    compaction keeps working: the floor marker remaps every later ingest
    id above the compacted delta (see _effective_batch_id), and the keeper
    lookup's `batch_id < N` filter always includes it. Edge counts are
    additive ⇒ a folded-id replay (window-contract violation) double-counts
    that one batch's edges — but can no longer add self-edges (the
    keeper_doc_id guard in _dup_flow_ingest); see the section contract's
    bounded double-count caveat."""
    k_floor = _compact_partitioned(
        spark,
        os.path.join(store_dir, "keepers"),
        "fp string, keeper_source string, keeper_doc_id long",
        lambda df: df.select("fp", "keeper_source", "keeper_doc_id"),
    )
    e_floor = _compact_partitioned(
        spark,
        os.path.join(store_dir, "edges"),
        "fp string, keeper_source string, dup_source string, n_docs bigint",
        lambda df: df.groupBy("fp", "keeper_source", "dup_source").agg(
            F.sum("n_docs").alias("n_docs")
        ),
    )
    floors = [f for f in (k_floor, e_floor) if f is not None]
    if floors:
        _write_compaction_floor(store_dir, max(floors))


def compact_lsh_dedup_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the LSH near-dup store: state rows are one per ingested doc
    (doc_id unique across deltas by the ingest contract) and each unordered
    pair lives in exactly one delta, so both merges are plain rewrites.
    Continued ingestion keeps working: new batches land above the
    checkpoint's high-water mark and the state lookup's `batch_id < N`
    filter always includes the compacted delta. The folded high-water mark
    is recorded in a `_compaction_floor` marker; every later ingest remaps
    its batch id to floor+1+id (uniformly — injective and monotone, see
    _lsh_dedup_ingest), so neither a replay of a folded id nor a
    fresh-checkpoint restart can overwrite the compacted delta or another
    batch's delta (ADVICE r6/r7)."""
    floor = _compact_partitioned(
        spark,
        os.path.join(store_dir, "state"),
        _LSH_STATE_SCHEMA,
        lambda df: df.select("doc_id", "sh", "bands"),
    )
    pairs_floor = _compact_partitioned(
        spark,
        os.path.join(store_dir, "pairs"),
        _LSH_PAIRS_SCHEMA,
        lambda df: df.select("doc_a", "doc_b", "jac"),
    )
    floors = [f for f in (floor, pairs_floor) if f is not None]
    if floors:
        _write_compaction_floor(store_dir, max(floors))


def run_stream_ks_monitor(
    events: DataFrame,
    key_col: str,
    value_col: str,
    ref_means,
    ref_weights,
    store_dir: str,
    checkpoint_dir: str,
    key: str | None = None,
    ks_alert: float = 0.1,
    delta: float = 200.0,
    timeout_sec: int = 120,
) -> None:
    """Operational KS monitor — the t-digest counterpart of
    run_stream_drift_monitor, closing the drift family's last
    evaluate-at-ingest gap: per micro-batch, append the batch's t-digest
    partials (the run_stream_tdigest store) AND one evaluation-log row
    (batch_id, ks_stat, n_cur, alert) from the CUMULATIVE store vs the
    frozen reference digest (``ref_means``/``ref_weights``, the
    training-time artifact). No raw event is ever revisited: each
    evaluation merges O(batches x delta) centroid rows.

    Alert contract: fires when the approximate KS crosses ``ks_alert``,
    AND when the monitored population has zero accumulated mass while a
    reference exists (n_cur = 0 -> ks is NaN, and ``NaN >= x`` is False —
    the same silent-never-alert trap the PSI store's zero-total guard
    closes; total loss of an expected population is the loudest drift).
    Both writes stage per batch_id — replay idempotent."""
    from ..operators.sketches import tdigest_partials

    partials_dir = os.path.join(store_dir, "partials")
    log_dir = os.path.join(store_dir, "log")

    def monitor(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        (
            tdigest_partials(batch, key_col, value_col, delta)
            .write.mode("overwrite")
            .parquet(os.path.join(partials_dir, f"batch_id={batch_id}"))
        )
        ks, n_cur = ks_from_digest_store(
            spark, partials_dir, ref_means, ref_weights, key=key, delta=delta
        )
        alert = bool(ks >= ks_alert) or n_cur == 0
        spark.createDataFrame(
            [(float(ks), int(n_cur), alert)],
            "ks_stat double, n_cur bigint, alert boolean",
        ).write.mode("overwrite").parquet(
            os.path.join(log_dir, f"batch_id={batch_id}")
        )

    _run_foreach_batch(
        events, monitor, checkpoint_dir, timeout_sec, "run_stream_ks_monitor"
    )


def ks_monitor_log(spark: SparkSession, store_dir: str) -> DataFrame:
    """The KS monitor's append-only evaluation log, ordered by batch."""
    return _monitor_log(
        spark,
        os.path.join(store_dir, "log"),
        "ks_stat double, n_cur bigint, alert boolean",
    )


# ---------------------------------------------------------------------------
# CDC-at-ingest: the streaming twin of batch q164 (plans/cdc.py). The op
# log arrives as micro-batches; the store keeps latest-op-per-key deltas;
# the fold applies them to a base snapshot with the SAME apply/fingerprint
# code the batch query uses (imported — batch==stream cannot drift apart).
# ---------------------------------------------------------------------------


def run_stream_cdc_ops(
    ops: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch latest-wins op store: each micro-batch of CDC op rows
    (``plans.cdc.CDC_OPS_SCHEMA``: k, seq unique per key, op I/U/D,
    payload) is pre-collapsed to its own latest-op-per-key and staged
    under ``batch_id=N`` — a replayed batch overwrites its own delta
    (at-least-once in, exactly-once effect, the run_stream_heavy_hitters
    idiom). The fold re-merges deltas by max seq, so out-of-order arrival
    ACROSS batches is also correct (latest-wins is associative under the
    unique-seq contract) — strictly stronger than the arrival-order
    contract the dup-flow store needs.

    Scale shape: per-batch work is one keyed hash aggregate over the
    batch (map-side combinable), O(batch) writes, and NO read of the
    existing store — unlike a swap-per-batch upsert, ingest cost never
    grows with state size; the store is bounded by distinct touched keys
    after compact_cdc_store."""
    from ..plans.cdc import latest_cdc_ops

    def ingest(batch: DataFrame, batch_id: int) -> None:
        latest_cdc_ops(batch).write.mode("overwrite").parquet(
            os.path.join(
                store_dir,
                f"batch_id={_effective_batch_id(store_dir, batch_id, flat=True)}",
            )
        )

    _run_foreach_batch(ops, ingest, checkpoint_dir, timeout_sec, "run_stream_cdc_ops")


def _cdc_store_latest(spark: SparkSession, store_dir: str) -> DataFrame:
    from ..plans.cdc import CDC_OPS_SCHEMA, latest_cdc_ops

    return latest_cdc_ops(_read_store_deltas(spark, store_dir, CDC_OPS_SCHEMA))


def cdc_snapshot_from_store(
    spark: SparkSession, base: DataFrame, store_dir: str
) -> DataFrame:
    """Batch q164's post-apply per-status fingerprint, computed from the
    accumulated op store instead of a one-shot log: merge the deltas
    (max seq per key), then the shared apply + fingerprint. With zero
    micro-batches processed this is the fingerprint of the unchanged
    base (empty-store contract, as dup_flow_matrix_from_store)."""
    from ..plans.cdc import apply_cdc_ops, cdc_status_fingerprint

    return cdc_status_fingerprint(
        apply_cdc_ops(base, _cdc_store_latest(spark, store_dir))
    )


def compact_cdc_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the CDC op store to one latest-op-per-key delta: the merge
    IS latest_cdc_ops (associative under unique seqs), so folds before and
    after compaction agree exactly and continued ingestion keeps working
    (new ids land above the checkpoint's high-water mark)."""
    from ..plans.cdc import CDC_OPS_SCHEMA, latest_cdc_ops

    floor = _compact_partitioned(spark, store_dir, CDC_OPS_SCHEMA, latest_cdc_ops)
    if floor is not None:
        _write_compaction_floor(store_dir, floor)


# ---------------------------------------------------------------------------
# Last-touch attribution at ingest: the streaming twin of batch q179
# (plans/customer.py). Two per-batch-staged stores (the dup-flow idiom —
# batch_id directories make replays idempotent):
#
#   clicks/batch_id=N/   (user_id, click_key) — batch N's per-user BEST
#                        packed click key (attribution_click_key: ts, id,
#                        campaign in one decimal; max = latest click).
#   revenue/batch_id=N/  (campaign, n_purchases, rev_units) — batch N's
#                        purchases attributed against (store clicks from
#                        batches < N) ∪ (same-batch clicks strictly before
#                        the purchase, the q179 window applied within the
#                        batch). Revenue in exact 1e-4 int units.
#
# The packed key makes the store lookup pure range algebra: a click is
# eligible for a purchase at ts_p iff click_key ∈ [(ts_p - 7d)·1e9,
# ts_p·1e9) — strictly-before and the 7-day lookback in one decimal range,
# no timestamp column needed. Because eligibility is enforced by the key
# range (not by arrival order), a store click "from the future" of some
# replayed purchase can never win; the only contract is the usual one:
# a click must not ARRIVE in a later batch than a purchase it should have
# attributed (time-ordered drops), same as the dup-flow store.
# ---------------------------------------------------------------------------


def _attribution_ingest(batch: DataFrame, batch_id: int, store_dir: str) -> None:
    from ..plans.customer import (
        ATTR_WINDOW_US,
        attribution_campaign_expr,
        attribution_click_key,
    )

    spark = batch.sparkSession
    clicks_dir = os.path.join(store_dir, "clicks")
    # heal a crashed compaction, then remap above the floor (see
    # _effective_batch_id): a replay of a folded raw id must never
    # overwrite the compacted clicks/revenue
    _recover_compaction(clicks_dir)
    _recover_compaction(os.path.join(store_dir, "revenue"))
    eff_id = _effective_batch_id(store_dir, batch_id)
    ts_us = epoch_us(F.col("ts"))
    ck = F.when(
        F.col("event_type") == "click",
        attribution_click_key(
            ts_us, F.col("event_id"), attribution_campaign_expr("props")
        ),
    )
    enriched = batch.select(
        "event_id",
        "user_id",
        "event_type",
        "value",
        ts_us.alias("ts_us"),
        ck.alias("click_key"),
    )
    fr = (
        Window.partitionBy("user_id")
        .orderBy("ts_us")
        .rangeBetween(-ATTR_WINDOW_US, -1)
    )
    # cached: consumed by the clicks write AND the purchase attribution
    wb = enriched.withColumn("batch_best", F.max("click_key").over(fr)).cache()
    try:
        wb.where(F.col("click_key").isNotNull()).groupBy("user_id").agg(
            F.max("click_key").alias("click_key")
        ).write.mode("overwrite").parquet(
            os.path.join(clicks_dir, f"batch_id={eff_id}")
        )

        purch = wb.where(F.col("event_type") == "purchase").select(
            "event_id", "user_id", "ts_us", "value", "batch_best"
        )
        # prior clicks from batches before this one (an empty prior — the
        # first-ever batch — left-joins to null store_best, the same
        # no-store contract the old else branch hand-built)
        prior = (
            _read_store_deltas(
                spark, clicks_dir, "user_id bigint, click_key decimal(38,0)"
            )
            .where(F.col("batch_id") < eff_id)
            .select("user_id", F.col("click_key").alias("store_key"))
        )
        from ..plans.customer import ATTR_KEY_UNITS_PER_US

        lo = (F.col("ts_us") - F.lit(ATTR_WINDOW_US)).cast(
            "decimal(16,0)"
        ) * F.lit(ATTR_KEY_UNITS_PER_US)
        hi = F.col("ts_us").cast("decimal(16,0)") * F.lit(ATTR_KEY_UNITS_PER_US)
        store_best = (
            purch.join(prior, "user_id")
            .where((F.col("store_key") >= lo) & (F.col("store_key") < hi))
            .groupBy("event_id")
            .agg(F.max("store_key").alias("store_best"))
        )
        purch = purch.join(store_best, "event_id", "left")

        best = F.greatest("batch_best", "store_best")
        out = (
            purch.groupBy(
                F.coalesce(best % 100, F.lit(-1)).cast("bigint").alias("campaign")
            )
            .agg(
                F.count(F.lit(1)).alias("n_purchases"),
                F.sum(F.round(F.col("value") * F.lit(1e4)).cast("long")).alias(
                    "rev_units"
                ),
            )
        )
        out.write.mode("overwrite").parquet(
            os.path.join(store_dir, "revenue", f"batch_id={eff_id}")
        )
    finally:
        wb.unpersist()


def run_stream_attribution(
    events: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch incremental last-touch attribution (see the block
    comment above). ``events`` is a streaming frame with the events-table
    schema. Equals batch q179 exactly whenever drops arrive in event-time
    order per user."""

    def ingest(batch: DataFrame, batch_id: int) -> None:
        _attribution_ingest(batch, batch_id, store_dir)

    _run_foreach_batch(
        events, ingest, checkpoint_dir, timeout_sec, "run_stream_attribution"
    )


def attribution_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Fold the revenue deltas into q179's (campaign, n_purchases,
    attributed_revenue) — reads only the per-batch aggregates, never the
    event stream. The unit recombination mirrors dec_sum exactly (decimal
    total × 10^-4, one correctly-rounded cast), so the doubles match the
    batch query bit-for-bit."""
    from decimal import Decimal

    rows = _read_store_deltas(
        spark,
        os.path.join(store_dir, "revenue"),
        "campaign bigint, n_purchases bigint, rev_units bigint",
    )
    return (
        rows.groupBy("campaign")
        .agg(
            F.sum("n_purchases").cast("bigint").alias("n_purchases"),
            (
                F.sum("rev_units").cast("decimal(38,0)")
                * F.lit(Decimal(1).scaleb(-4))
            )
            .cast("double")
            .alias("attributed_revenue"),
        )
        .orderBy("campaign")
    )


# ---------------------------------------------------------------------------
# Revenue anomaly monitor at ingest: the streaming twin of batch q169
# (plans/timeseries.py). Per micro-batch of orders:
#
#   partials/batch_id=N/  (day_idx, u_partial) — the batch's per-day
#                         revenue in exact 1e-4 integer units (additive,
#                         order-free, replay-idempotent per batch dir).
#   monitor/batch_id=N/   one evaluation row: the folded daily series
#                         scored with q169's trailing-28d rule — how many
#                         days currently flag, the loudest |z|, and its
#                         day — the ops signal per drop.
#
# The fold reconstructs q169's (day_idx, revenue, u) EXACTLY: summed units
# are the same integers the batch query derives from its decimal sums, and
# revenue re-emerges via one decimal-scaled correctly-rounded cast — so
# revenue_anomalies_from_store == batch q169, tuple for tuple, no matter
# how the orders were split into batches (day partials are commutative;
# this store is arrival-order-INDEPENDENT, unlike the attribution store).
# ---------------------------------------------------------------------------


def _daily_units(batch: DataFrame):
    from ..plans.timeseries import order_epoch_day

    # exact decimal -> integer units (same derivation as batch q169): the
    # per-batch decimal sum has scale 4, so *1e4 is integral and the product
    # stays inside 38 digits — no double round-trip, hence no 2^53 magnitude
    # precondition on the batch==stream tuple-exact fold.
    return batch.groupBy(order_epoch_day().alias("day_idx")).agg(
        (F.sum(F.col("o_totalprice").cast("decimal(38,4)")) * F.lit(10000))
        .cast("decimal(38,0)")
        .cast("long")
        .alias("u_partial")
    )


def _fold_daily_series(spark: SparkSession, partials_dir: str) -> DataFrame:
    from decimal import Decimal

    rows = (
        spark.read.schema("day_idx int, u_partial bigint, batch_id bigint")
        .option("basePath", partials_dir)
        .parquet(f"{partials_dir}/batch_id=*")
    )
    return rows.groupBy("day_idx").agg(
        (F.sum("u_partial").cast("decimal(38,0)") * F.lit(Decimal(1).scaleb(-4)))
        .cast("double")
        .alias("revenue"),
        F.sum("u_partial").cast("long").alias("u"),
    )


def run_stream_revenue_monitor(
    orders: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch revenue-anomaly monitor (see block comment). ``orders``
    is a streaming frame with at least (o_orderdate, o_totalprice)."""
    from ..plans.timeseries import score_daily_anomalies

    def ingest(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        partials_dir = os.path.join(store_dir, "partials")
        _recover_compaction(partials_dir)  # heal crashed compaction
        batch_id = _effective_batch_id(store_dir, batch_id)
        _daily_units(batch).write.mode("overwrite").parquet(
            os.path.join(partials_dir, f"batch_id={batch_id}")
        )
        flagged = score_daily_anomalies(
            _fold_daily_series(spark, partials_dir)
        ).cache()
        try:
            top = flagged.orderBy(F.abs(F.col("zscore")).desc(), "day_idx").limit(1)
            row = top.collect()
            n = flagged.count()
            spark.createDataFrame(
                [
                    (
                        batch_id,
                        n,
                        float(row[0].zscore) if row else None,
                        int(row[0].day_idx) if row else None,
                    )
                ],
                "batch_id bigint, n_anomalies bigint, max_abs_z double, max_z_day bigint",
            ).write.mode("overwrite").parquet(
                os.path.join(store_dir, "monitor", f"batch_id={batch_id}")
            )
        finally:
            flagged.unpersist()

    _run_foreach_batch(
        orders, ingest, checkpoint_dir, timeout_sec, "run_stream_revenue_monitor"
    )


def revenue_anomalies_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Fold the partials into the daily series and score with q169's rule —
    equals batch q169 tuple-for-tuple under any batch split."""
    from ..plans.timeseries import score_daily_anomalies

    partials_dir = os.path.join(store_dir, "partials")
    if not os.path.exists(partials_dir):
        return spark.createDataFrame(
            [],
            "day_idx bigint, revenue double, n_prior bigint, "
            "mean_28 double, sd_28 double, zscore double",
        )
    return score_daily_anomalies(_fold_daily_series(spark, partials_dir))


def revenue_monitor_log(spark: SparkSession, store_dir: str) -> DataFrame:
    mon_dir = os.path.join(store_dir, "monitor")
    if not os.path.exists(mon_dir):
        return spark.createDataFrame(
            [], "batch_id bigint, n_anomalies bigint, max_abs_z double, max_z_day bigint"
        )
    return (
        spark.read.schema(
            "batch_id bigint, n_anomalies bigint, max_abs_z double, max_z_day bigint"
        )
        .option("basePath", mon_dir)
        .parquet(f"{mon_dir}/batch_id=*")
        .orderBy("batch_id")
    )


# ---------------------------------------------------------------------------
# Market-basket mining at ingest: the streaming twin of batch q178. The
# ingest contract is the natural one — a basket (order) arrives WHOLE in
# one micro-batch and never repeats — under which every q178 input is a
# plain additive count: per-batch partials
#
#   pairs/batch_id=N/    (p1, p2, n_both)   distinct co-occurrence counts
#   items/batch_id=N/    (p, n_p)           per-item basket counts
#   baskets/batch_id=N/  (n_orders)         basket count
#
# fold by SUM, and the folded rules equal batch q178 exactly under ANY
# arrival order (unlike the dup-flow/attribution stores, nothing here is
# order-sensitive). Pair work per batch is bounded by basket size, same
# as batch; the store grows with distinct pairs, and the same compaction
# helpers apply.
# ---------------------------------------------------------------------------


def run_stream_basket_counts(
    lineitems: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch basket-count partials (see block comment). ``lineitems``
    is a streaming frame with (l_orderkey, l_partkey)."""

    def ingest(batch: DataFrame, batch_id: int) -> None:
        for sub in ("pairs", "items", "baskets"):  # heal crashed compaction
            _recover_compaction(os.path.join(store_dir, sub))
        batch_id = _effective_batch_id(store_dir, batch_id)
        li = batch.select("l_orderkey", "l_partkey")
        a = li.select("l_orderkey", F.col("l_partkey").alias("p1"))
        b = li.select("l_orderkey", F.col("l_partkey").alias("p2"))
        # cached: three partial writes share the batch's projection
        li = li.cache()
        try:
            pairs = (
                a.join(b, "l_orderkey")
                .filter(F.col("p1") < F.col("p2"))
                .groupBy("p1", "p2")
                .agg(F.countDistinct("l_orderkey").alias("n_both"))
            )
            pairs.write.mode("overwrite").parquet(
                os.path.join(store_dir, "pairs", f"batch_id={batch_id}")
            )
            items = li.groupBy(F.col("l_partkey").alias("p")).agg(
                F.countDistinct("l_orderkey").alias("n_p")
            )
            items.write.mode("overwrite").parquet(
                os.path.join(store_dir, "items", f"batch_id={batch_id}")
            )
            li.agg(F.countDistinct("l_orderkey").alias("n_orders")).write.mode(
                "overwrite"
            ).parquet(os.path.join(store_dir, "baskets", f"batch_id={batch_id}"))
        finally:
            li.unpersist()

    _run_foreach_batch(
        lineitems, ingest, checkpoint_dir, timeout_sec, "run_stream_basket_counts"
    )


def basket_rules_from_store(
    spark: SparkSession, store_dir: str, min_both: int = 3, topk: int = 50
) -> DataFrame:
    """Fold the partials into q178's rule table (same thresholds, same
    deterministic (lift, antecedent, consequent) top-k)."""
    pairs = (
        spark.read.schema("p1 bigint, p2 bigint, n_both bigint, batch_id bigint")
        .option("basePath", os.path.join(store_dir, "pairs"))
        .parquet(os.path.join(store_dir, "pairs", "batch_id=*"))
        .groupBy("p1", "p2")
        .agg(F.sum("n_both").alias("n_both"))
    )
    items = (
        spark.read.schema("p bigint, n_p bigint, batch_id bigint")
        .option("basePath", os.path.join(store_dir, "items"))
        .parquet(os.path.join(store_dir, "items", "batch_id=*"))
        .groupBy("p")
        .agg(F.sum("n_p").alias("n_p"))
    )
    baskets = (
        spark.read.schema("n_orders bigint, batch_id bigint")
        .option("basePath", os.path.join(store_dir, "baskets"))
        .parquet(os.path.join(store_dir, "baskets", "batch_id=*"))
        .agg(F.sum("n_orders").alias("n_orders"))
    )
    i1 = items.select(F.col("p").alias("p1"), F.col("n_p").alias("n_ante_fwd"))
    i2 = items.select(F.col("p").alias("p2"), F.col("n_p").alias("n_cons_fwd"))
    enriched = (
        pairs.join(F.broadcast(i1), "p1")
        .join(F.broadcast(i2), "p2")
        .crossJoin(F.broadcast(baskets))
    )
    fwd = enriched.select(
        F.col("p1").alias("antecedent"),
        F.col("p2").alias("consequent"),
        "n_both",
        F.col("n_ante_fwd").alias("n_ante"),
        F.col("n_cons_fwd").alias("n_cons"),
        "n_orders",
    )
    rev = enriched.select(
        F.col("p2").alias("antecedent"),
        F.col("p1").alias("consequent"),
        "n_both",
        F.col("n_cons_fwd").alias("n_ante"),
        F.col("n_ante_fwd").alias("n_cons"),
        "n_orders",
    )
    rules = fwd.unionAll(rev).filter(F.col("n_both") >= min_both)
    lift = (F.col("n_both") * F.col("n_orders")).cast("double") / (
        F.col("n_ante") * F.col("n_cons")
    ).cast("double")
    return (
        rules.select(
            "antecedent",
            "consequent",
            F.col("n_both").cast("bigint").alias("n_both"),
            (F.col("n_both").cast("double") / F.col("n_orders")).alias("support"),
            (F.col("n_both").cast("double") / F.col("n_ante")).alias("confidence"),
            lift.alias("lift"),
        )
        .orderBy(F.col("lift").desc(), "antecedent", "consequent")
        .limit(topk)
    )


def compact_basket_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the basket-count store: every partial is additive (⇒ the
    section contract's one-batch double-count caveat applies to an
    uncommitted delta compacted outside the maintenance window)."""
    floors = [
        _compact_partitioned(
            spark,
            os.path.join(store_dir, "pairs"),
            "p1 bigint, p2 bigint, n_both bigint",
            lambda df: df.groupBy("p1", "p2").agg(F.sum("n_both").alias("n_both")),
        ),
        _compact_partitioned(
            spark,
            os.path.join(store_dir, "items"),
            "p bigint, n_p bigint",
            lambda df: df.groupBy("p").agg(F.sum("n_p").alias("n_p")),
        ),
        _compact_partitioned(
            spark,
            os.path.join(store_dir, "baskets"),
            "n_orders bigint",
            lambda df: df.agg(F.sum("n_orders").alias("n_orders")),
        ),
    ]
    floors = [f for f in floors if f is not None]
    if floors:
        _write_compaction_floor(store_dir, max(floors))


def compact_revenue_monitor_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the revenue-monitor store's day partials (additive ⇒ the
    section contract's one-batch double-count caveat applies). The
    monitor/ directory is an immutable evaluation LOG, not mergeable state
    — it stays as written (the shared floor remap keeps later log ids
    clear of existing rows too, since the ingest stamps both dirs with
    the same effective id)."""
    floor = _compact_partitioned(
        spark,
        os.path.join(store_dir, "partials"),
        "day_idx int, u_partial bigint",
        lambda df: df.groupBy("day_idx").agg(F.sum("u_partial").alias("u_partial")),
    )
    if floor is not None:
        _write_compaction_floor(store_dir, floor)


def compact_attribution_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the attribution store. revenue/ deltas are additive (⇒ the
    section contract's one-batch double-count caveat applies to them).
    clicks/ compact to the per-user MAX key, which is sufficient under the
    store's time-ordered contract: keys grow with ts, so a user's newest
    click is the only one any FUTURE purchase's [lo, hi) range can pick —
    if the newest is older than lo, every discarded older click was too."""
    r_floor = _compact_partitioned(
        spark,
        os.path.join(store_dir, "revenue"),
        "campaign bigint, n_purchases bigint, rev_units bigint",
        lambda df: df.groupBy("campaign").agg(
            F.sum("n_purchases").alias("n_purchases"),
            F.sum("rev_units").alias("rev_units"),
        ),
    )
    c_floor = _compact_partitioned(
        spark,
        os.path.join(store_dir, "clicks"),
        "user_id bigint, click_key decimal(38,0)",
        lambda df: df.groupBy("user_id").agg(F.max("click_key").alias("click_key")),
    )
    floors = [f for f in (r_floor, c_floor) if f is not None]
    if floors:
        _write_compaction_floor(store_dir, max(floors))


# ---------------------------------------------------------------------------
# Decode-health-at-ingest: the streaming twin of batch q220
# (plans/multimodal_queries.py). A multimodal pipeline wants decode error
# rates PER ARRIVING DROP, not just in a batch audit — a crawl source
# whose malformed-blob rate spikes mid-ingest should alert before the
# corpus lands. Same staged-delta contract as the volume store: additive
# (source, fmt, status) counts per batch_id, plain-sum fold, replay
# idempotent via per-batch overwrite.
# ---------------------------------------------------------------------------

_HEALTH_COUNT_SCHEMA = "source string, fmt string, status string, n_docs bigint"


def _decode_health_ingest(batch: DataFrame, batch_id: int, store_dir: str) -> None:
    """One micro-batch of the decode-health store: classify every blob
    through the real header decoders (operators/multimodal.decode_health —
    per-blob rejection becomes a row, never a failed batch) and stage the
    additive (source, fmt, status) counts under batch_id=N (remapped above
    the compaction floor — see _effective_batch_id: a replay of a folded
    raw id must never overwrite the compacted history)."""
    from ..operators.multimodal import decode_health

    eff_id = _effective_batch_id(store_dir, batch_id, flat=True)
    (
        decode_health(batch.select("doc_id", "source", "content"))
        .groupBy("source", "fmt", "status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .write.mode("overwrite")
        .parquet(os.path.join(store_dir, f"batch_id={eff_id}"))
    )


def run_stream_decode_health(
    media: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch decode-health partials over a streaming frame of
    (doc_id, source, content). Scale: per batch one Arrow decode pass +
    one tiny groupBy; store growth is O(batches x sources x 6 formats x
    status classes) rows of additive counts."""

    def partials(batch: DataFrame, batch_id: int) -> None:
        _decode_health_ingest(batch, batch_id, store_dir)

    _run_foreach_batch(
        media, partials, checkpoint_dir, timeout_sec, "run_stream_decode_health"
    )


def decode_health_report_from_store(spark: SparkSession, store_dir: str) -> DataFrame:
    """Fold the staged deltas into q220's report shape: (source, fmt,
    status, n_docs, share_of_fmt). Counts are additive across batches, so
    the fold is a plain sum; the share window runs over the aggregated
    frame only. Arrival-order-independent (counts commute) — pinned for
    forward AND reversed drops in tests/test_streaming.py."""
    from pyspark.sql import Window

    deltas = _read_store_deltas(spark, store_dir, _HEALTH_COUNT_SCHEMA)
    counts = deltas.groupBy("source", "fmt", "status").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs")
    )
    w = Window.partitionBy("source", "fmt")
    return counts.select(
        "source",
        "fmt",
        "status",
        "n_docs",
        (F.col("n_docs").cast("double") / F.sum("n_docs").over(w)).alias(
            "share_of_fmt"
        ),
    ).orderBy("source", "fmt", "status")


def compact_decode_health_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the decode-health store: counts merge by summation;
    decode_health_report_from_store reads identically before and after.
    Records the folded high-water mark in the store's floor marker so
    later ingests remap above the compacted delta (ADVICE r8). Additive ⇒
    the section contract's one-batch double-count caveat applies to an
    uncommitted delta compacted outside the maintenance window."""
    floor = _compact_partitioned(
        spark,
        store_dir,
        _HEALTH_COUNT_SCHEMA,
        lambda df: df.groupBy("source", "fmt", "status").agg(
            F.sum("n_docs").alias("n_docs")
        ),
    )
    if floor is not None:
        _write_compaction_floor(store_dir, floor)


def run_stream_decode_health_monitor(
    media: DataFrame,
    store_dir: str,
    checkpoint_dir: str,
    alert_share: float = 0.2,
    timeout_sec: int = 120,
) -> None:
    """Operational decode-health ALERT monitor (VERDICT r8 item 3) — the
    drift-monitor twin of run_stream_decode_health: per micro-batch,
    ingest the batch's (source, fmt, status) counts into
    ``store_dir/counts`` (the same staged-delta contract as the plain
    store; ``decode_health_report_from_store`` reads the counts dir
    directly) AND append one evaluation-log row PER SOURCE computed from
    the CUMULATIVE store: total docs seen, malformed docs (any status
    other than 'ok' — planted-format rejections and magic-less garbage
    alike), the malformed share, and whether it crossed ``alert_share``.
    A crawl source whose blob corruption spikes mid-ingest alerts on the
    very drop that crossed the line, before the corpus lands.

    Scale shape: per batch one Arrow decode pass over the batch plus a
    fold of O(batches x sources x formats x statuses) additive count rows
    — never the blobs again; the log row set is O(sources). Both writes
    stage under the same effective batch id (compaction-floor remapped,
    see _effective_batch_id) — replay idempotent."""
    counts_dir = os.path.join(store_dir, "counts")
    log_dir = os.path.join(store_dir, "log")

    def monitor(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        eff_id = _effective_batch_id(counts_dir, batch_id, flat=True)
        _decode_health_ingest(batch, batch_id, counts_dir)
        bad = F.sum(F.when(F.col("status") != "ok", F.col("n_docs")).otherwise(F.lit(0)))
        per_source = (
            _read_store_deltas(spark, counts_dir, _HEALTH_COUNT_SCHEMA)
            .groupBy("source")
            .agg(
                F.sum("n_docs").cast("bigint").alias("n_docs"),
                bad.cast("bigint").alias("n_malformed"),
            )
            .select(
                "source",
                "n_docs",
                "n_malformed",
                (F.col("n_malformed").cast("double") / F.col("n_docs")).alias(
                    "malformed_share"
                ),
                (
                    F.col("n_malformed").cast("double")
                    >= F.lit(alert_share) * F.col("n_docs")
                ).alias("alert"),
            )
        )
        per_source.write.mode("overwrite").parquet(
            os.path.join(log_dir, f"batch_id={eff_id}")
        )

    _run_foreach_batch(
        media, monitor, checkpoint_dir, timeout_sec, "run_stream_decode_health_monitor"
    )


def decode_health_monitor_log(spark: SparkSession, store_dir: str) -> DataFrame:
    """The decode-health monitor's append-only evaluation log, ordered by
    (batch, source)."""
    return _monitor_log(
        spark,
        os.path.join(store_dir, "log"),
        "source string, n_docs bigint, n_malformed bigint, "
        "malformed_share double, alert boolean",
    )


# ---------------------------------------------------------------------------
# Incremental IVF index maintenance at ingest (VERDICT r10 item 4): the
# serving-index lifecycle is auditable (q222) and evaluable (q229) but new
# vectors only entered the index by re-fitting. This store assigns each
# arriving embedding to the FROZEN coarse-quantizer cells (the _ivf_fit
# centers — the only state a 100-TB ingest tier ships) with the numpy-GEMM
# Arrow kernel (ivf_cell_udf: the inline nlist×dim column expression
# overflows janino codegen and drops to interpreted; the GEMM stays
# vectorized), stages per-batch assignments + cell-count partials, and
# appends a live cell-balance log row per batch — alerting the moment the
# LIVE imbalance factor crosses q222's rebalance threshold, instead of at
# the next audit. The monitor math is IMPORTED from
# plans/similarity.cell_balance_from_counts, so the live monitor and the
# batch audit cannot drift on thresholds.
#
# Store layout (marker + _effective_batch_id contract like dup-flow):
#   centers/           (cell, centroid) — the frozen quantizer, written
#                      once by the runner; probing reads it back so the
#                      store IS a self-contained servable index.
#   assign/batch_id=N/ (vec_id, cell) — batch N's NEW vectors (an
#                      anti-join drops ids already indexed, so a folded-id
#                      replay is a no-op like the LSH state store).
#   counts/batch_id=N/ (cell, n_vecs) — additive per-cell partials of
#                      batch N's new vectors.
#   log/batch_id=N/    one row: cumulative n_vecs, imbalance_factor,
#                      empty_cell_rate, alert.
# ---------------------------------------------------------------------------

_IVF_ASSIGN_SCHEMA = "vec_id bigint, cell int"
_IVF_COUNTS_SCHEMA = "cell int, n_vecs bigint"
_IVF_MONITOR_LOG_SCHEMA = (
    "n_vecs bigint, imbalance_factor double, empty_cell_rate double, alert boolean"
)


def run_stream_ivf_assign(
    vectors: DataFrame,
    centers: list,
    store_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch incremental IVF maintenance: ``vectors`` is a
    streaming frame of (vec_id, embedding); ``centers`` the [nlist][dim]
    frozen coarse centroids (from plans/similarity._ivf_fit, or any
    quantizer with the same shape)."""
    from ..plans.similarity import as_double, cell_balance_from_counts, ivf_cell_udf

    nlist = len(centers)
    assign_dir = os.path.join(store_dir, "assign")
    counts_dir = os.path.join(store_dir, "counts")
    log_dir = os.path.join(store_dir, "log")
    centers_dir = os.path.join(store_dir, "centers")
    cell_of = ivf_cell_udf(centers)

    def ingest(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if not os.path.exists(centers_dir):
            spark.createDataFrame(
                [(i, [float(x) for x in c]) for i, c in enumerate(centers)],
                "cell int, centroid array<double>",
            ).coalesce(1).write.mode("overwrite").parquet(centers_dir)
        _recover_compaction(assign_dir)
        _recover_compaction(counts_dir)
        eff_id = _effective_batch_id(store_dir, batch_id)
        prior = (
            _read_store_deltas(spark, assign_dir, _IVF_ASSIGN_SCHEMA)
            .where(F.col("batch_id") < eff_id)
            .select("vec_id")
        )
        new_vecs = batch.join(prior, "vec_id", "left_anti").select(
            "vec_id", cell_of(as_double(F.col("embedding"))).alias("cell")
        )
        new_vecs.write.mode("overwrite").parquet(
            os.path.join(assign_dir, f"batch_id={eff_id}")
        )
        # counts partial from the just-staged delta (materialized — the
        # Arrow assignment never recomputes)
        own = spark.read.schema(_IVF_ASSIGN_SCHEMA).parquet(
            os.path.join(assign_dir, f"batch_id={eff_id}")
        )
        own.groupBy("cell").agg(
            F.count(F.lit(1)).cast("bigint").alias("n_vecs")
        ).write.mode("overwrite").parquet(
            os.path.join(counts_dir, f"batch_id={eff_id}")
        )
        # live balance over the CUMULATIVE counts (<= this batch): one
        # fold of O(batches x nlist) additive rows, then q222's math on
        # exactly nlist rows
        cum = (
            _read_store_deltas(spark, counts_dir, _IVF_COUNTS_SCHEMA)
            .where(F.col("batch_id") <= eff_id)
            .groupBy("cell")
            .agg(F.sum("n_vecs").cast("bigint").alias("n_vecs"))
        )
        balance = cell_balance_from_counts(cum, nlist)
        (
            balance.agg(
                F.sum("n_vecs").cast("bigint").alias("n_vecs"),
                F.max("imbalance_factor").alias("imbalance_factor"),
                F.max("empty_cell_rate").alias("empty_cell_rate"),
                F.max((F.col("recommendation") == "rebalance").cast("boolean")).alias(
                    "alert"
                ),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(log_dir, f"batch_id={eff_id}"))
        )

    _run_foreach_batch(
        vectors, ingest, checkpoint_dir, timeout_sec, "run_stream_ivf_assign"
    )


def ivf_balance_from_store(spark: SparkSession, store_dir: str, nlist: int) -> DataFrame:
    """Batch q222's audit frame folded from the IVF ingest store's count
    partials — equals q222 on the same corpus + quantizer exactly (the
    assignment kernel ties to KMeans.transform, pinned), reading
    O(batches x nlist) additive rows, never the vectors."""
    from ..plans.similarity import cell_balance_from_counts

    counts = (
        _read_store_deltas(spark, os.path.join(store_dir, "counts"), _IVF_COUNTS_SCHEMA)
        .groupBy("cell")
        .agg(F.sum("n_vecs").cast("bigint").alias("n_vecs"))
    )
    return cell_balance_from_counts(counts, nlist)


def ivf_monitor_log(spark: SparkSession, store_dir: str) -> DataFrame:
    """The live cell-balance evaluation log, one row per drained batch."""
    return _monitor_log(
        spark, os.path.join(store_dir, "log"), _IVF_MONITOR_LOG_SCHEMA
    )


def ivf_topk_from_store(
    spark: SparkSession, sf_dir: str, store_dir: str, nprobe: int | None = None
) -> DataFrame:
    """q64's probe-and-rerank over the STORE-built index: centers from
    the store's frozen quantizer, cell assignments from the store fold,
    float vectors + norms joined back from the embeddings table (the
    store ships codes-and-cells, not floats — the IVF serving layout).
    Probes and reranks through plans/similarity.ivf_probe_scored/
    ivf_topk — the same code as the session-fit index, so recall can
    only differ through the assignment itself (pinned equal)."""
    from ..catalog import load_table
    from ..plans.similarity import (
        _IVF_NPROBE,
        as_double,
        ivf_probe_scored,
        ivf_topk,
        norm,
    )

    centers_rows = (
        spark.read.schema("cell int, centroid array<double>")
        .parquet(os.path.join(store_dir, "centers"))
        .orderBy("cell")
        .collect()
    )
    centers = [list(r.centroid) for r in centers_rows]
    assign = _read_store_deltas(
        spark, os.path.join(store_dir, "assign"), _IVF_ASSIGN_SCHEMA
    ).select("vec_id", "cell")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    assigned = emb.join(assign, "vec_id").select(
        "vec_id", "e", norm(F.col("e")).alias("nc"), "cell"
    )
    return ivf_topk(
        ivf_probe_scored(
            spark, centers, assigned, nprobe if nprobe is not None else _IVF_NPROBE
        )
    )


def ivf_retrieval_metrics_from_store(
    spark: SparkSession, sf_dir: str, store_dir: str
) -> DataFrame:
    """q229's ranking-quality eval over the STORE-built index: nDCG@k /
    capped recall@k of ivf_topk_from_store's ranking through the shared
    retrieval-metric core — the full serving lifecycle without a re-fit:
    maintain the index at ingest, probe it, and score the live ranking
    with the same yardstick as the exact baseline."""
    from ..catalog import load_table
    from ..plans.similarity import _N_QUERIES, retrieval_metrics

    lab = load_table(spark, sf_dir, "embeddings").select("vec_id", "label")
    return retrieval_metrics(
        ivf_topk_from_store(spark, sf_dir, store_dir).select("q_id", "cand_id", "rk"),
        lab,
        query_lab=lab.filter(F.col("vec_id") < _N_QUERIES),
    )


def compact_ivf_assign_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the IVF ingest store: assignments are unique per vec_id
    (the anti-join ingest contract — plain rewrite), counts sum per
    cell. The log is an append-only evaluation record and is kept."""
    a_floor = _compact_partitioned(
        spark,
        os.path.join(store_dir, "assign"),
        _IVF_ASSIGN_SCHEMA,
        lambda df: df.select("vec_id", "cell"),
    )
    c_floor = _compact_partitioned(
        spark,
        os.path.join(store_dir, "counts"),
        _IVF_COUNTS_SCHEMA,
        lambda df: df.groupBy("cell").agg(F.sum("n_vecs").cast("bigint").alias("n_vecs")),
    )
    floors = [f for f in (a_floor, c_floor) if f is not None]
    if floors:
        _write_compaction_floor(store_dir, max(floors))


# ---------------------------------------------------------------------------
# Incremental PQ index maintenance at ingest (round 11): the PQ serving
# store (q200's codes + norms) gains the same lifecycle the IVF index got
# — new vectors are ENCODED at ingest against the FROZEN per-subspace
# codebooks (the only state a 100-TB ingest tier ships; encoding is
# plans/similarity._pq_encode_frame, the SAME numpy Arrow kernel the batch
# store uses, so stored codes are bit-identical to a batch rebuild), staged as
# additive deltas, and served through the shared ADC+rerank core. A
# per-(subspace, code) count partial feeds a codebook-health monitor:
# a hot code means a degenerate subspace codebook (vectors crowding one
# centroid — the PQ analogue of a hot IVF cell), measured with the SAME
# cell_balance_from_counts math as q222, per subspace.
#
# Store layout (marker + _effective_batch_id contract like the IVF store):
#   books/             (m, k, centroid) — frozen codebooks, written once;
#                      reading them back makes the store self-contained.
#   codes/batch_id=N/  (vec_id, codes, nc) — batch N's NEW vectors
#                      (anti-join; folded-id replay is a no-op).
#   counts/batch_id=N/ (m, code, n_vecs) — additive code-usage partials.
#   log/batch_id=N/    one row: cumulative n_vecs, worst per-subspace
#                      imbalance factor, alert.
# ---------------------------------------------------------------------------

_PQ_CODES_SCHEMA = "vec_id bigint, codes array<int>, nc double"
_PQ_COUNTS_SCHEMA = "m int, code int, n_vecs bigint"
_PQ_MONITOR_LOG_SCHEMA = "n_vecs bigint, imbalance_factor double, alert boolean"


def run_stream_pq_encode(
    vectors: DataFrame,
    books: list,
    store_dir: str,
    checkpoint_dir: str,
    timeout_sec: int = 120,
) -> None:
    """foreachBatch incremental PQ maintenance: ``vectors`` is a streaming
    frame of (vec_id, embedding); ``books`` the [m][k][sub_dim] frozen
    codebooks (from plans/similarity._pq_books, or sources/ann_index's
    loaded index)."""
    from ..plans.similarity import (
        _pq_encode_frame,
        as_double,
        cell_balance_from_counts,
    )

    books_dir = os.path.join(store_dir, "books")
    codes_dir = os.path.join(store_dir, "codes")
    counts_dir = os.path.join(store_dir, "counts")
    log_dir = os.path.join(store_dir, "log")

    def ingest(batch: DataFrame, batch_id: int) -> None:
        spark = batch.sparkSession
        if not os.path.exists(books_dir):
            spark.createDataFrame(
                [
                    (m, k, [float(x) for x in c])
                    for m, book in enumerate(books)
                    for k, c in enumerate(book)
                ],
                "m int, k int, centroid array<double>",
            ).coalesce(1).write.mode("overwrite").parquet(books_dir)
        _recover_compaction(codes_dir)
        _recover_compaction(counts_dir)
        eff_id = _effective_batch_id(store_dir, batch_id)
        prior = (
            _read_store_deltas(spark, codes_dir, _PQ_CODES_SCHEMA)
            .where(F.col("batch_id") < eff_id)
            .select("vec_id")
        )
        new_codes = _pq_encode_frame(
            batch.join(prior, "vec_id", "left_anti").select(
                "vec_id", as_double(F.col("embedding")).alias("e")
            ),
            books,
        )
        new_codes.write.mode("overwrite").parquet(
            os.path.join(codes_dir, f"batch_id={eff_id}")
        )
        # code-usage partial from the just-staged delta (materialized —
        # the encode expression never recomputes)
        own = spark.read.schema(_PQ_CODES_SCHEMA).parquet(
            os.path.join(codes_dir, f"batch_id={eff_id}")
        )
        (
            own.select(F.posexplode("codes").alias("m", "code"))
            .groupBy("m", "code")
            .agg(F.count(F.lit(1)).cast("bigint").alias("n_vecs"))
            .write.mode("overwrite")
            .parquet(os.path.join(counts_dir, f"batch_id={eff_id}"))
        )
        # codebook health over the CUMULATIVE counts: q222's balance math
        # per subspace (K cells each), alert on the worst subspace
        cum = (
            _read_store_deltas(spark, counts_dir, _PQ_COUNTS_SCHEMA)
            .where(F.col("batch_id") <= eff_id)
            .groupBy("m", "code")
            .agg(F.sum("n_vecs").cast("bigint").alias("n_vecs"))
        )
        per_sub = [
            cell_balance_from_counts(
                cum.where(F.col("m") == m).select(
                    F.col("code").alias("cell"), "n_vecs"
                ),
                len(books[m]),
            ).agg(
                F.sum("n_vecs").cast("bigint").alias("n_vecs"),
                F.max("imbalance_factor").alias("imbalance_factor"),
                F.max(
                    (F.col("recommendation") == "rebalance").cast("boolean")
                ).alias("alert"),
            )
            for m in range(len(books))
        ]
        worst = per_sub[0]
        for frame in per_sub[1:]:
            worst = worst.unionByName(frame)
        (
            worst.agg(
                F.max("n_vecs").cast("bigint").alias("n_vecs"),
                F.max("imbalance_factor").alias("imbalance_factor"),
                F.max("alert").alias("alert"),
            )
            .write.mode("overwrite")
            .parquet(os.path.join(log_dir, f"batch_id={eff_id}"))
        )

    _run_foreach_batch(
        vectors, ingest, checkpoint_dir, timeout_sec, "run_stream_pq_encode"
    )


def pq_code_balance_from_store(
    spark: SparkSession, store_dir: str
) -> DataFrame:
    """Per-(subspace, code) usage audit folded from the count partials:
    q222's balance columns per subspace, reading O(batches x M x K)
    additive rows, never the vectors. A 'rebalance' row means that
    subspace's codebook no longer matches the data distribution — the
    refit signal for the PQ half of the index lifecycle."""
    from ..plans.similarity import cell_balance_from_counts

    books_rows = (
        spark.read.schema("m int, k int, centroid array<double>")
        .parquet(os.path.join(store_dir, "books"))
        .groupBy("m")
        .agg(F.count(F.lit(1)).alias("kk"))
        .orderBy("m")
        .collect()
    )
    cum = (
        _read_store_deltas(spark, os.path.join(store_dir, "counts"), _PQ_COUNTS_SCHEMA)
        .groupBy("m", "code")
        .agg(F.sum("n_vecs").cast("bigint").alias("n_vecs"))
    )
    out = None
    for r in books_rows:
        part = cell_balance_from_counts(
            cum.where(F.col("m") == r["m"]).select(
                F.col("code").alias("cell"), "n_vecs"
            ),
            int(r["kk"]),
        ).select(F.lit(r["m"]).alias("m"), "*")
        out = part if out is None else out.unionByName(part)
    return out.orderBy("m", "cell")


def pq_monitor_log(spark: SparkSession, store_dir: str) -> DataFrame:
    """The codebook-health evaluation log, one row per drained batch."""
    return _monitor_log(
        spark, os.path.join(store_dir, "log"), _PQ_MONITOR_LOG_SCHEMA
    )


def pq_topk_from_store(
    spark: SparkSession, sf_dir: str, store_dir: str
) -> DataFrame:
    """q200's ADC-shortlist + exact-rerank ranking over the STORE-built
    code table: books from the store's frozen codebooks, codes from the
    store fold, float vectors joined back from the embeddings table for
    queries and rerank survivors only. Ranks through the SAME
    _pq_adc_rank body as q200, so the incrementally-maintained index is
    pinned row-for-row to the session-built one."""
    from ..catalog import load_table
    from ..plans.similarity import _pq_adc_rank, as_double

    rows = spark.read.schema("m int, k int, centroid array<double>").parquet(
        os.path.join(store_dir, "books")
    ).collect()
    by_m: dict = {}
    for r in rows:
        by_m.setdefault(r["m"], {})[r["k"]] = [float(x) for x in r["centroid"]]
    books = [[by_m[m][k] for k in sorted(by_m[m])] for m in sorted(by_m)]
    store = _read_store_deltas(
        spark, os.path.join(store_dir, "codes"), _PQ_CODES_SCHEMA
    ).select("vec_id", "codes", "nc")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", as_double(F.col("embedding")).alias("e")
    )
    return _pq_adc_rank(spark, emb, books, store)


def compact_pq_code_store(spark: SparkSession, store_dir: str) -> None:
    """Compact the PQ ingest store: codes are unique per vec_id (anti-join
    ingest contract — plain rewrite), counts sum per (m, code). The log
    is an append-only evaluation record and is kept."""
    c_floor = _compact_partitioned(
        spark,
        os.path.join(store_dir, "codes"),
        _PQ_CODES_SCHEMA,
        lambda df: df.select("vec_id", "codes", "nc"),
    )
    u_floor = _compact_partitioned(
        spark,
        os.path.join(store_dir, "counts"),
        _PQ_COUNTS_SCHEMA,
        lambda df: df.groupBy("m", "code").agg(
            F.sum("n_vecs").cast("bigint").alias("n_vecs")
        ),
    )
    floors = [f for f in (c_floor, u_floor) if f is not None]
    if floors:
        _write_compaction_floor(store_dir, max(floors))
