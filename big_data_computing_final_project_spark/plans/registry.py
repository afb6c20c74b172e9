"""Query registry: the single source of truth consumed by
``__spark_entry__.py`` (driver contract) and by the test suite.

Each query registers a builder ``(spark, sf_dir) -> DataFrame`` and, when
SQL-expressible, a DuckDB oracle SQL string over the pre-registered views
(region nation customer supplier part orders lineitem events documents
embeddings). Non-SQL-expressible operators (ML fits, LSH) register with
``oracle=None`` and get the driver's rows-only check plus a pytest oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

_QUERIES: dict[str, QueryFn] = {}
_ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: add a query (and optional DuckDB oracle SQL) to the registry."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in _QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        _QUERIES[name] = fn
        if oracle is not None:
            _ORACLES[name] = oracle
        return fn

    return deco


def all_queries() -> dict[str, QueryFn]:
    _load_plans()
    return dict(_QUERIES)


def all_oracles() -> dict[str, str]:
    _load_plans()
    return dict(_ORACLES)


def _load_plans() -> None:
    """Import every plan module exactly once so decorators run."""
    from . import (  # noqa: F401
        analytics,
        cdc,
        curation,
        customer,
        decision_support,
        dedup,
        drift,
        events,
        graph,
        impurity,
        layout,
        lm,
        misc,
        ml_queries,
        multimodal_queries,
        profiling,
        relational,
        scale,
        similarity,
        temporal,
        textops,
        timeseries,
    )
