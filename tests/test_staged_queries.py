"""queries/staged.py — the gate-staged queries, verified against their
DuckDB oracles with the EXACT driver comparison (row count, column
set, order-insensitive value hash, HUGEINT dtype lint) at sf0.001.

These specs are finished but deliberately NOT in the registry: the
round-7 verification window is already full (49/50). This test is the
same evidence the external gate would produce; the specs flip to
`register(...)` next round.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from metar_pipeline_spark.io import TABLES
from metar_pipeline_spark.queries.staged import STAGED
from tools.check_oracle import canon

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF, t)}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(STAGED))
def test_staged_query_matches_oracle(spark, duck, name):
    spec = STAGED[name]
    sdf = spec.spark_fn(spark, SF)
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]

    cur = duck.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    otypes = {
        r[0]: str(r[1])
        for r in duck.execute(f"DESCRIBE {spec.oracle}").fetchall()
    }
    for c, t in otypes.items():
        assert "HUGEINT" not in t.upper() and "INT128" not in t.upper(), (
            f"{name}: oracle column {c} is {t} (driver pandas-converts "
            f"to float — CAST to BIGINT)"
        )

    assert sorted(scols) == sorted(ocols), name
    assert len(srows) == len(orows), name
    assert len(srows) > 0, f"{name}: empty result is weak gate evidence"
    cs, co = canon(srows, scols), canon(orows, ocols)
    ndiff = sum(1 for a, b in zip(cs, co) if a != b)
    assert cs == co, f"{name}: {ndiff} rows differ; first: " + str(
        next(((a, b) for a, b in zip(cs, co) if a != b), None)
    )


def test_staged_plan_lint(spark):
    """The registry-wide scale-hygiene lint, applied to the STAGED set:
    no CartesianProduct, no row-at-a-time Python eval, and no
    unpartitioned data-grain window (the round-7 class the rewrites
    eliminated — staged queries must not reintroduce it; rank_bounded
    packs bounded survivor sets without a WindowExec)."""
    from tools.sweep_windows import unpartitioned_windows

    offenders = {}
    for name, spec in STAGED.items():
        p = (
            spec.spark_fn(spark, SF)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        if "CartesianProduct" in p:
            offenders[name] = "CartesianProduct"
        if "BatchEvalPython" in p:
            offenders[name] = "BatchEvalPython"
        hits = unpartitioned_windows(p)
        if hits:
            offenders[name] = f"unpartitioned window: {hits[:1]}"
    assert not offenders, offenders
