"""queries/staged.py — the round-7-staged query family.

As of round 8 these specs are dual-registered into the live REGISTRY,
so their oracle parity (the exact driver comparison at sf0.001) is
covered by tests/test_queries_oracle.py like every other registered
query. This file keeps the family-scoped plan-hygiene lint (cheap,
and it predates the registry-wide sweep for these 11)."""

from __future__ import annotations

from metar_pipeline_spark.queries.staged import STAGED

SF = "/root/testdata/sf0.001"


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
