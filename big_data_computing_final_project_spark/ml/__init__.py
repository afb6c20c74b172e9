"""ML operator surface (SURVEY.md §2.8): preprocessing pipeline builders,
estimator wrappers, evaluation aggregates, and search helpers — all
`pyspark.ml`-first, with model fit/transform treated as dataflow operators.
"""

from . import evaluation, models, pipeline, selection, viz  # noqa: F401
