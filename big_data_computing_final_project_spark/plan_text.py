"""Normalized physical-plan text and fingerprints.

One normalizer shared by the snapshot archive (tools/snapshot_plans.py,
tests/test_plan_snapshots.py) and bench.py's per-query ``plan_sha`` field,
so "same plan, slower clock" is machine-distinguishable from a real plan
regression (VERDICT r4 item 1: an ambient ~20% slowdown must never read
as a 2x gate failure — the fingerprint proves the physical plan did not
move while the wall clock did).

Normalization strips everything that legitimately differs run-to-run or
machine-to-machine: expression/plan/RDD ids, JIT call sites, the SF
directory, lambda counters, and huge collected-state literal arrays
(bloom bitmaps).
"""

from __future__ import annotations

import hashlib
import io
import re
from contextlib import redirect_stdout

from pyspark.sql import DataFrame


def normalize_plan(plan: str) -> str:
    plan = re.sub(r"/root/testdata/sf[0-9.]+", "<SF_DIR>", plan)
    plan = re.sub(r"#\d+L?", "#N", plan)  # expression ids differ run-to-run
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    plan = re.sub(r"RDD\[\d+\]", "RDD[N]", plan)  # RDD ids depend on job history
    plan = re.sub(r"lambda ([a-z]+)_\d+", r"lambda \1_N", plan)  # session-global counter
    plan = re.sub(r" at \S+:\d+", " at <SITE>:0", plan)  # call-site string is JIT-dependent
    # collected-state literals (e.g. bloom bitmap word arrays) are data-dependent
    plan = re.sub(r"\[[0-9,\- ]{500,}\]", "<LIT_ARRAY>", plan)
    return plan


def plan_text(df: DataFrame) -> str:
    """Normalized ``explain(mode="formatted")`` output of ``df``."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode="formatted")
    return normalize_plan(buf.getvalue())


def plan_fingerprint(df: DataFrame) -> str:
    """Short stable hash of the normalized physical plan (12 hex chars —
    enough to diff across rounds, short enough for one bench JSON line)."""
    return hashlib.sha256(plan_text(df).encode()).hexdigest()[:12]
