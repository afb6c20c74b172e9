"""Reusable operator implementations that back the query plans.

Most relational/profiling operators are pure Column/DataFrame compositions
and live directly in plans/ (the registry is their public surface); this
package holds the operators with real machinery of their own:

- :mod:`.multimodal` — binary media columns + mapInPandas decode/feature
  pipeline (Arrow-batched; the sanctioned Python path per SURVEY §2.9)
- :mod:`.profiling` — the generic describe/value_counts/corr/crosstab API
  with exact (oracle-parity) and sketch (100 TB) modes
"""

from . import multimodal, profiling  # noqa: F401
