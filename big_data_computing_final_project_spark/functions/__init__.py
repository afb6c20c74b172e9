"""Expression & statistics function library (SURVEY.md §2.3, §2.6)."""

from . import expressions, stats, text  # noqa: F401
