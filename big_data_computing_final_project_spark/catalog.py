"""Table catalog: explicit schemas + temp-view registration for the
driver-provided star schema (TESTDATA.md).

The reference infers schemas at CSV-read time and then treats them as fixed
(SURVEY.md §1, `house_predict.py:565-566`); at 100 TB schema inference is a
full extra scan, so this engine declares every schema explicitly. Parquet
carries its own schema, but declaring expected StructTypes lets us fail fast
on drift and keeps column pruning predictable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

SCHEMAS: dict[str, T.StructType] = {
    "region": T.StructType(
        [
            T.StructField("r_regionkey", T.IntegerType()),
            T.StructField("r_name", T.StringType()),
        ]
    ),
    "nation": T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    ),
    "customer": T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_nationkey", T.IntegerType()),
            T.StructField("c_acctbal", T.DoubleType()),
            T.StructField("c_mktsegment", T.StringType()),
        ]
    ),
    "supplier": T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_name", T.StringType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    ),
    "part": T.StructType(
        [
            T.StructField("p_partkey", T.LongType()),
            T.StructField("p_name", T.StringType()),
            T.StructField("p_brand", T.StringType()),
            T.StructField("p_type", T.StringType()),
            T.StructField("p_size", T.IntegerType()),
            T.StructField("p_retailprice", T.DoubleType()),
        ]
    ),
    "orders": T.StructType(
        [
            T.StructField("o_orderkey", T.LongType()),
            T.StructField("o_custkey", T.LongType()),
            T.StructField("o_orderstatus", T.StringType()),
            T.StructField("o_totalprice", T.DoubleType()),
            T.StructField("o_orderdate", T.TimestampType()),
            T.StructField("o_orderpriority", T.StringType()),
        ]
    ),
    "lineitem": T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_partkey", T.LongType()),
            T.StructField("l_suppkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("l_quantity", T.DoubleType()),
            T.StructField("l_extendedprice", T.DoubleType()),
            T.StructField("l_discount", T.DoubleType()),
            T.StructField("l_tax", T.DoubleType()),
            T.StructField("l_returnflag", T.StringType()),
            T.StructField("l_linestatus", T.StringType()),
            T.StructField("l_shipdate", T.TimestampType()),
        ]
    ),
    "events": T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("ts", T.TimestampType()),
            T.StructField("user_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("props", T.StringType()),
        ]
    ),
    "documents": T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
            T.StructField("lang", T.StringType()),
            T.StructField("source", T.StringType()),
            T.StructField("n_chars", T.LongType()),
        ]
    ),
    "embeddings": T.StructType(
        [
            T.StructField("vec_id", T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
            T.StructField("label", T.IntegerType()),
        ]
    ),
}


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one star-schema table from ``{sf_dir}/{name}.parquet``.

    Parquet scans keep the file's own physical schema (so statistics and
    pushdown stay intact); SCHEMAS documents the expected logical shape.
    """
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    if name == "events":
        # Some generations of events.parquet store TIMESTAMP(NANOS), which
        # Spark rejects by default (PARQUET_TYPE_ILLEGAL). Set the legacy
        # nanos-as-long conf here — not only in session.get_spark() —
        # because callers (e.g. an external driver) may hand us a session we
        # didn't configure. The conf is read at scan planning, so a runtime
        # set works; it is a no-op for micros-typed files.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        # Timestamp semantics (NTZ→LTZ reinterpretation below, and every
        # downstream unix_micros/window bucket) assume a UTC session. Our
        # own get_spark() sets this; pin it here too for caller-provided
        # sessions (e.g. the correctness driver).
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    if name == "events":
        df = normalize_events_ts(df)
    key = _FAN_OUT_KEYS.get(name)
    if key is not None:
        df = fan_out(df, spark, key)
    return df


# Tables whose consumers are CPU-dense per-row pipelines (tokenize/shingle/
# hash for documents, vector math for embeddings) rather than scan-bound
# aggregates. For these, scan parallelism IS the throughput ceiling.
_FAN_OUT_KEYS = {"documents": "doc_id", "embeddings": "vec_id"}


def fan_out(df: DataFrame, spark: SparkSession, key: str | None) -> DataFrame:
    """Give CPU-dense narrow stages at least ``defaultParallelism`` tasks.

    A small parquet file (or one with a single row group — splits can't cut
    a row group) plans as ONE scan task, so every downstream narrow
    transform runs on one core no matter how many are free. Repartitioning
    by the table's key fans the work out; measured 3.3s -> 0.4s on q102's
    shingle stage at sf0.1 on local[32].

    Scale behavior: guarded on the planned scan-split count, so on a real
    cluster reading a multi-split table this is a no-op — no gratuitous
    full-table shuffle at 100 TB. Hash-partitioning by the primary key also
    pre-aligns later groupBy(key)/join(key) stages (their exchange is
    satisfied by this one).
    """
    target = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target, key) if key is not None else df.repartition(target)
    return df


def normalize_events_ts(df: DataFrame) -> DataFrame:
    """Normalize events.ts to TimestampType (µs, UTC session) regardless of
    how the file stored it:

    - TIMESTAMP(NANOS) + nanosAsLong → long nanos: truncate to µs
    - TIMESTAMP(MICROS, NTZ)         → TIMESTAMP_NTZ: reinterpret as UTC
      instant (session TZ is UTC, so the wall clock is kept and
      unix_micros(ts) equals the file's naive epoch-µs — the same value
      DuckDB's epoch_us(ts) sees)
    - TIMESTAMP(MICROS, UTC-adjusted) → already TimestampType: unchanged
    """
    from pyspark.sql import functions as F

    ts_type = dict(df.dtypes)["ts"]
    if ts_type == "bigint":
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    if ts_type != "timestamp":
        return df.withColumn("ts", F.col("ts").cast(T.TimestampType()))
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Register every table as a temp view; returns {name: DataFrame}."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
