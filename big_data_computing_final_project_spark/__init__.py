"""PySpark-native analytics engine re-expressing the capability surface of
the reference project ``lxs1998418-spec/big-data-computing-final-project``
(see SURVEY.md) plus LLM-data-pipeline extensions, designed Spark-first
for 100 TB scale.

Layout
------
- :mod:`.session`   — SparkSession builder (AQE, Arrow, UTC, shuffle sizing)
- :mod:`.catalog`   — explicit StructType schemas + temp-view registration
- :mod:`.sources`   — CSV / Parquet / model IO (SURVEY §2.1)
- :mod:`.functions` — derived-column expression library, stats parity fns
- :mod:`.operators` — profiling, binning, joins, top-k, dedup, similarity
- :mod:`.ml`        — pipeline / estimators / evaluation (SURVEY §2.8)
- :mod:`.streaming` — event-window analytics, batch+stream (SURVEY §2.10)
- :mod:`.plans`     — the query registry consumed by ``__spark_entry__.py``
"""

__version__ = "0.1.0"
