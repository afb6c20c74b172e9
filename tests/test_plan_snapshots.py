"""Physical-plan snapshot regression: every covered query's normalized
``explain(formatted)`` output must match the committed archive in
``plans_snapshot/`` (regenerate deliberately with tools/snapshot_plans.py).

test_plan_shape.py asserts a handful of named properties (broadcast, top-k,
pushdown); this test pins the ENTIRE plan, so any silent change — a new
exchange, a widened ReadSchema, a lost partial aggregate — fails loudly
with a plan diff instead of shipping as a 100×-at-scale surprise.

Queries whose builders execute Spark jobs at plan time (ML fits, iterative
graph/k-means loops, localCheckpoint materialization) are left to the
snapshot tool; this test covers the pure-plan queries, built against the
same sf0.01 the archive was generated from (plan shape can legitimately
depend on input statistics, so the SF must match).
"""

from __future__ import annotations

import difflib
import os

import pytest

from big_data_computing_final_project_spark.plan_text import plan_text
from big_data_computing_final_project_spark.plans import all_queries

SNAP_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans_snapshot")
SNAP_SF_DIR = "/root/testdata/sf0.01"

# pure-plan queries: building the DataFrame runs no job
PLAN_ONLY = {
    *(f"q{i:02d}" for i in range(1, 35)),
    "q38", "q41", "q42", "q43", "q51", "q52", "q53", "q54", "q55", "q56",
    "q57", "q58", "q59", "q63", "q65", "q66", "q67", "q69", "q70", "q71",
    "q73", "q75", "q76", "q77", "q78", "q79", "q80", "q81", "q82", "q83",
    "q84", "q85", "q86", "q87", "q88", "q89", "q90", "q91", "q92", "q93",
    "q94", "q95", "q96", "q97", "q98", "q99", "q100", "q102", "q103",
    "q104", "q105", "q106", "q107", "q108", "q109", "q110", "q111", "q112", "q134",
    "q113", "q114", "q115", "q116", "q117", "q118", "q119", "q120", "q121",
    "q135", "q136", "q137", "q138", "q139", "q140", "q141", "q142", "q143", "q144",
    "q125", "q126", "q127", "q128", "q129", "q130", "q131", "q132", "q133", "q145", "q146", "q147", "q148", "q149", "q150",
    "q151", "q152", "q153", "q154", "q155", "q157", "q158", "q160",
    "q161", "q162", "q163", "q164", "q165", "q166", "q167", "q168", "q169",
    "q170", "q171", "q172", "q173", "q176", "q177", "q178", "q179", "q180",
    "q181", "q182", "q183", "q184", "q185", "q186", "q187", "q188", "q189",
    "q191", "q195", "q196", "q197", "q198", "q203",
    "q204", "q206", "q207", "q208", "q209", "q210", "q211", "q212", "q213", "q214", "q215", "q216", "q217", "q218",
    "q219", "q220", "q221", "q223", "q224",
}
# q225 left out since round 10: its posting frame localCheckpoints at build
# time (two-consumer materialization), so the snapshot tool owns its pin.
# Multi-COUNT(DISTINCT) Expand rewrites order their column lists
# nondeterministically across sessions (ExpressionSet iteration) — same
# plan, shuffled projection order — so exact text comparison is unstable.
UNSTABLE = {"q60", "q173"}  # q173: five COUNT(DISTINCT)s, same Expand rewrite


def _snapshot_cases() -> list[str]:
    return sorted(
        name
        for name in all_queries()
        if name.split("_")[0] in PLAN_ONLY and name.split("_")[0] not in UNSTABLE
    )


@pytest.mark.parametrize("name", _snapshot_cases())
def test_plan_matches_snapshot(spark, name):
    path = os.path.join(SNAP_DIR, f"{name}.txt")
    assert os.path.exists(path), f"missing snapshot {path}; run tools/snapshot_plans.py"
    df = all_queries()[name](spark, SNAP_SF_DIR)
    got = plan_text(df)
    with open(path) as f:
        want = f.read()
    if got != want:
        diff = "\n".join(
            difflib.unified_diff(want.splitlines(), got.splitlines(), "snapshot", "current", lineterm="")
        )
        pytest.fail(f"physical plan for {name} changed:\n{diff[:4000]}")


# --- sf0.1 headline pins (VERDICT r4 item 6) -------------------------------
# test_plan_matches_snapshot pins every query at the sf0.01 gate SF, but
# bench.py runs at sf0.1, where size estimates and AQE thresholds can
# legitimately flip join strategies. These pins freeze the bench set's
# broadcast/shuffle decisions at the bench SF, so an estimate-threshold
# drift (e.g. a broadcast_if_small flip) surfaces as a plan diff instead
# of an unexplained timing anomaly. Queries that execute jobs at
# plan-build time (q100's sketch candidates, q101's bloom bitmap) are
# deterministic per SF, so their plans pin too.

SNAP01_DIR = os.path.join(os.path.dirname(SNAP_DIR), "plans_snapshot", "sf0.1")
SNAP01_SF_DIR = "/root/testdata/sf0.1"


def _headline_cases() -> list[str]:
    from bench import HEADLINE

    return sorted(n for n in HEADLINE if n in all_queries())


@pytest.mark.parametrize("name", _headline_cases())
def test_headline_plan_matches_sf01_snapshot(spark, name):
    path = os.path.join(SNAP01_DIR, f"{name}.txt")
    assert os.path.exists(path), (
        f"missing snapshot {path}; run tools/snapshot_plans.py "
        f"{SNAP01_SF_DIR} plans_snapshot/sf0.1 <headline names>"
    )
    df = all_queries()[name](spark, SNAP01_SF_DIR)
    got = plan_text(df)
    with open(path) as f:
        want = f.read()
    if got != want:
        diff = "\n".join(
            difflib.unified_diff(want.splitlines(), got.splitlines(), "snapshot", "current", lineterm="")
        )
        pytest.fail(f"sf0.1 physical plan for {name} changed:\n{diff[:4000]}")
