"""Run the oracle gate under a BARE SparkSession — no configs from
session.get_spark() — to mimic the external driver's environment.

Round 1 lesson: every events-reading query failed under the driver because
spark.sql.legacy.parquet.nanosAsLong was only set in get_spark();
catalog.load_table now sets it at read time. This script proves fixes like
that hold without our session bootstrap.

Usage:  python tools/check_bare_session.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession  # noqa: E402


def bare_spark() -> SparkSession:
    return (
        SparkSession.builder.master("local[8]")
        .appName("bare-driver-check")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )


def main() -> int:
    import tools.check_oracle as gate

    # monkey-patch the session factory so the shared gate logic runs bare
    gate.get_spark = lambda *_a, **_k: bare_spark()
    return gate.main()


if __name__ == "__main__":
    raise SystemExit(main())
