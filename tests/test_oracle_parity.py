"""Every registered query with an oracle must hash-match DuckDB at sf0.001.

This mirrors the driver's correctness gate (row count + column set +
order-insensitive value hash) so regressions surface in `pytest` before the
driver runs its own compare at sf0.01.
"""

from __future__ import annotations

import pytest

from big_data_computing_final_project_spark.plans import all_oracles, all_queries

from tools.check_oracle import frame_digest

_QUERIES = all_queries()
_ORACLES = all_oracles()


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_query_matches_oracle(name, spark, duck, sf_dir):
    sdf = _QUERIES[name](spark, sf_dir)
    srows = [tuple(r) for r in sdf.collect()]
    res = duck.sql(_ORACLES[name])
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    assert len(srows) == len(drows), f"rowcount {len(srows)} != {len(drows)}"
    assert sorted(sdf.columns) == sorted(dcols)
    assert frame_digest(sdf.columns, srows) == frame_digest(dcols, drows), (
        f"value mismatch; spark sample={srows[:3]}, duck sample={drows[:3]}"
    )


@pytest.mark.parametrize("name", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_queries_run(name, spark, sf_dir):
    sdf = _QUERIES[name](spark, sf_dir)
    assert sdf.count() >= 0
