"""One-command round-close verification ritual (VERDICT r4 item 8).

Runs, in order, the full battery NOTES.md used to cite as five manual
commands, each in its own subprocess so session-level settings (timezone,
partition count) apply cleanly:

  1. pytest            python -m pytest tests/ -q
  2. gate @ sf0.01     tools/check_oracle.py /root/testdata/sf0.01
  3. gate @ sf0.1      tools/check_oracle.py /root/testdata/sf0.1
  4. gate @ sf0.01 under TZ=America/New_York (dialect/timezone sweep)
  5. gate @ sf0.1 under SPARK_GRAFT_CPUS=7 (different partition counts →
     different reduction orders; catches order-dependent float math)

Writes ONE JSON record (git head, per-step pass/fail/summary, wall
seconds) to the output path, and exits non-zero if any step fails — so
NOTES.md can cite a single artifact instead of five terminal scrollbacks.

Usage: python tools/verify_round.py [out_json] [--skip pytest,sf01,...]
                                     [--touched BASE_REF]
  step keys: pytest sf001 sf01 tz lowpart

--touched BASE_REF (registry runtime budget, VERDICT r6 item 10): the tz
and lowpart sweeps exist to catch dialect/reduction-order sensitivity in
QUERIES THAT CHANGED; with --touched they run only the queries whose
defining plans/*.py file differs from BASE_REF (the primary sf0.01+sf0.1
gates still cover the full registry). The pytest step narrows the same
way (VERDICT r7 item 7): only suites mentioning a touched query, test
files that themselves changed, and the cross-cutting contract/snapshot
pins run mid-round; the full battery still closes the round. If any
SHARED engine file changed (operators/ functions/ sources/
catalog/session), the subset is unsafe and every step falls back to the
full run automatically.
"""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd: list[str], env_extra: dict[str, str] | None = None) -> tuple[int, str]:
    env = dict(os.environ)
    env.update(env_extra or {})
    p = subprocess.run(
        cmd, cwd=ROOT, env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        text=True,
    )
    return p.returncode, p.stdout


def _gate_summary(output: str) -> dict:
    # check_oracle prints "N pass, M fail, K rows-only" last
    m = re.search(r"(\d+) pass, (\d+) fail, (\d+) rows-only", output)
    fails = re.findall(r"^FAIL\s+([^:\s]+)", output.replace("\r", "\n"), re.M)
    return {
        "pass": int(m.group(1)) if m else None,
        "fail": int(m.group(2)) if m else None,
        "rows_only": int(m.group(3)) if m else None,
        "failed_queries": fails,
    }


def _pytest_summary(output: str) -> dict:
    m = re.search(r"(\d+) passed(?:, (\d+) skipped)?", output)
    f = re.search(r"(\d+) failed", output)
    return {
        "passed": int(m.group(1)) if m else None,
        "skipped": int(m.group(2)) if m and m.group(2) else 0,
        "failed": int(f.group(1)) if f else 0,
    }


STEPS = {
    "pytest": (
        [sys.executable, "-m", "pytest", "tests/", "-q"],
        {},
        _pytest_summary,
        lambda s: s["failed"] == 0 and (s["passed"] or 0) > 0,
    ),
    "sf001": (
        [sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.01"],
        {},
        _gate_summary,
        lambda s: s["fail"] == 0 and (s["pass"] or 0) > 0,
    ),
    "sf01": (
        [sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.1"],
        {},
        _gate_summary,
        lambda s: s["fail"] == 0 and (s["pass"] or 0) > 0,
    ),
    "tz": (
        [sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.01"],
        {"TZ": "America/New_York"},
        _gate_summary,
        lambda s: s["fail"] == 0 and (s["pass"] or 0) > 0,
    ),
    "lowpart": (
        [sys.executable, "tools/check_oracle.py", "/root/testdata/sf0.1"],
        {"SPARK_GRAFT_CPUS": "7"},
        _gate_summary,
        lambda s: s["fail"] == 0 and (s["pass"] or 0) > 0,
    ),
}


def _touched_queries(base_ref: str) -> list[str] | None:
    """Queries whose defining plans/*.py changed vs base_ref, or None when
    a shared engine file changed (subset unsafe -> full sweep)."""
    diff = subprocess.run(
        ["git", "diff", "--name-only", base_ref, "HEAD", "--",
         "big_data_computing_final_project_spark"],
        cwd=ROOT, capture_output=True, text=True,
    )
    changed = [ln.strip() for ln in diff.stdout.splitlines() if ln.strip()]
    plans_prefix = "big_data_computing_final_project_spark/plans/"
    shared = [c for c in changed if not c.startswith(plans_prefix)]
    if shared:
        print(f"--touched: shared engine files changed {shared[:5]} -> full sweep")
        return None
    changed_files = {os.path.basename(c) for c in changed}
    if not changed_files:
        return []
    import inspect

    sys.path.insert(0, ROOT)
    from big_data_computing_final_project_spark.plans import all_queries

    out = []
    for name, fn in all_queries().items():
        src = inspect.getsourcefile(inspect.unwrap(fn)) or ""
        if os.path.basename(src) in changed_files:
            out.append(name)
    return sorted(out)


def _touched_tests(base_ref: str, subset: list[str]) -> list[str]:
    """Pytest files to run for a plans-only diff (VERDICT r7 item 7): the
    suites that mention a touched query by name, any test files that
    themselves changed vs base_ref, and the always-on cross-cutting pins
    (driver contract, oracle parity, plan snapshots — the snapshot suite
    re-pins every touched query's physical plan). Only used when
    _touched_queries returned a subset; a shared-engine diff already fell
    back to the full battery."""
    import glob

    diff = subprocess.run(
        ["git", "diff", "--name-only", base_ref, "HEAD", "--", "tests"],
        cwd=ROOT, capture_output=True, text=True,
    )
    hits = {
        ln.strip()
        for ln in diff.stdout.splitlines()
        if ln.strip().startswith("tests/test_") and
        os.path.exists(os.path.join(ROOT, ln.strip()))
    }
    for tf in glob.glob(os.path.join(ROOT, "tests", "test_*.py")):
        with open(tf) as f:
            text = f.read()
        if any(q in text for q in subset):
            hits.add(os.path.relpath(tf, ROOT))
    for always in (
        "tests/test_entry.py",
        "tests/test_oracle_parity.py",
        "tests/test_plan_snapshots.py",
    ):
        if os.path.exists(os.path.join(ROOT, always)):
            hits.add(always)
    return sorted(hits)


def main() -> None:
    out_path = None
    skip: set[str] = set()
    touched_base: str | None = None
    args = sys.argv[1:]
    i = 0
    while i < len(args):
        a = args[i]
        if a.startswith("--skip"):
            if "=" in a:
                skip = set(a.split("=", 1)[1].split(","))
            elif i + 1 < len(args):
                i += 1
                skip = set(args[i].split(","))
        elif a.startswith("--touched"):
            if "=" in a:
                touched_base = a.split("=", 1)[1]
            elif i + 1 < len(args):
                i += 1
                touched_base = args[i]
        elif a.startswith("--"):
            # never bind an unrecognized flag (e.g. --help) as the output
            # path — that once committed a stray file literally named
            # '--help' at the repo root (ADVICE r8)
            sys.exit(f"unknown option {a!r}; see the module docstring for usage")
        else:
            out_path = a
        i += 1
    unknown = skip - set(STEPS)
    if unknown:
        sys.exit(f"unknown --skip step(s) {sorted(unknown)}; valid: {sorted(STEPS)}")
    head = subprocess.run(
        ["git", "rev-parse", "--short", "HEAD"], cwd=ROOT, capture_output=True, text=True
    ).stdout.strip()
    record: dict = {"git_head": head, "steps": {}}
    subset: list[str] | None = None
    if touched_base is not None:
        subset = _touched_queries(touched_base)
        record["touched_base"] = touched_base
        record["touched_queries"] = subset
        if subset is not None:
            print(f"--touched {touched_base}: {len(subset)} queries for tz/lowpart")
            record["touched_tests"] = _touched_tests(touched_base, subset)
    ok = True
    for name, (cmd, env, summarize, passed) in STEPS.items():
        if name in skip:
            record["steps"][name] = {"skipped": True}
            continue
        if name in ("tz", "lowpart") and subset is not None:
            if not subset:
                record["steps"][name] = {"skipped": True, "reason": "no touched queries"}
                continue
            cmd = cmd + subset
        if name == "pytest" and subset is not None:
            tests = record.get("touched_tests") or []
            if not tests:
                record["steps"][name] = {"skipped": True, "reason": "no touched tests"}
                continue
            cmd = [c for c in cmd if c != "tests/"] + tests
        t0 = time.time()
        rc, output = _run(cmd, env)
        s = summarize(output)
        step_ok = rc == 0 and passed(s)
        record["steps"][name] = {
            "ok": step_ok,
            "wall_sec": round(time.time() - t0, 1),
            **s,
        }
        print(f"{'ok  ' if step_ok else 'FAIL'} {name}: {record['steps'][name]}")
        if not step_ok:
            ok = False
            tail = "\n".join(output.replace("\r", "\n").splitlines()[-25:])
            record["steps"][name]["tail"] = tail
    record["ok"] = ok
    line = json.dumps(record)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    print(line)
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
