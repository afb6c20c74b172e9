"""Sources & sinks (SURVEY.md §2.1 S1-S4)."""

from .io import read_csv, read_parquet, write_csv, write_parquet, write_submission  # noqa: F401
from .models import load_pipeline_model, save_pipeline_model  # noqa: F401
