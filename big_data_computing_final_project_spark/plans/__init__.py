"""Query plans: operator-inventory coverage (SURVEY.md §2) as registered,
oracle-checked queries."""

from .registry import all_oracles, all_queries, register  # noqa: F401
