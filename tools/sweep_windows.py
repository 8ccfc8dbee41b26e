"""Sweep every registered query's physical plan for unpartitioned
WindowExec nodes — the single-partition-sort scale killer class.

An unpartitioned window (``Window.orderBy`` with no partitionBy) moves
its ENTIRE input frame to one task. Round 7 removed every data-grain
instance (corpus/user/key-grain ranks now use
operators/ranking.distributed_rank or rank_bounded); the only windows
allowed to remain unpartitioned are CALENDAR-GRAIN rolling frames,
whose row count is bounded by the calendar (~2.4k day rows for the
2024-2030 test span), not by data volume — a global sort of a day-grain
aggregate is the correct plan at any scale.

Usage: python tools/sweep_windows.py [sf_dir]
Exit 1 if any query outside ALLOWED_CALENDAR_GRAIN shows an
unpartitioned window. tests/test_plans.py runs the same check.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Queries whose plans legitimately contain an unpartitioned window:
# every entry must be a rolling/cumulative frame over a DAY-grain (or
# coarser) aggregate — bounded by the calendar, never by data volume.
# (test_plans.py verifies each listed query's offending windows really
# do order by the day column.)
ALLOWED_CALENDAR_GRAIN: dict[str, str] = {
    "anomaly_daily_event_spikes": (
        "trailing-7-day mean/stddev over the daily-count aggregate; "
        "frame = days elapsed"
    ),
    "daily_value_max_drawdown": (
        "running cumulative sum + running max over daily totals; "
        "frame = days elapsed"
    ),
    "order_backlog_sweepline": (
        "sweep-line running sum of per-day net order flow; "
        "frame = distinct days"
    ),
    "seasonal_decompose_daily": (
        "centered ±3-day moving average over the daily series; "
        "frame = days elapsed"
    ),
    "skyline_price_date_frontier": (
        "strict running min over the per-day best price; "
        "frame = days elapsed"
    ),
    "user_growth_curve": (
        "cumulative sum of per-day new-user counts; frame = days elapsed"
    ),
}


def unpartitioned_windows(plan: str) -> list[str]:
    """Lines of ``plan`` whose windowspecdefinition has no partition
    columns. Partition columns precede the first sort-ordered argument;
    an unpartitioned spec's first argument carries ASC/DESC."""
    out = []
    for line in plan.splitlines():
        if "windowspecdefinition" not in line:
            continue
        first_arg = line.split("windowspecdefinition(", 1)[1].split(",", 1)[0]
        if " ASC" in first_arg or " DESC" in first_arg:
            out.append(line.strip())
    return out


def sweep(spark, sf_dir: str, skip=(), only=None) -> dict[str, list[str]]:
    """{query_name: [offending plan lines]} for every registered query
    NOT in ``skip`` whose plan shows an unpartitioned window and which
    is not justified in ALLOWED_CALENDAR_GRAIN."""
    from metar_pipeline_spark.queries import all_queries

    bad: dict[str, list[str]] = {}
    for name, spec in sorted(all_queries().items()):
        if name in skip or (only is not None and name not in only):
            continue
        try:
            df = spec.spark_fn(spark, sf_dir)
            plan = df._jdf.queryExecution().executedPlan().toString()
        except Exception as e:  # noqa: BLE001 — surface as a finding
            bad[name] = [f"PLAN BUILD FAILED: {e}"]
            continue
        hits = unpartitioned_windows(plan)
        if hits and name not in ALLOWED_CALENDAR_GRAIN:
            bad[name] = hits
    return bad


def main() -> None:
    from metar_pipeline_spark.session import get_spark

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    spark = get_spark("sweep_windows")
    bad = sweep(spark, sf_dir)
    if bad:
        for name, lines in bad.items():
            print(f"UNPARTITIONED WINDOW: {name}")
            for l in lines:
                print(f"  {l[:200]}")
        sys.exit(1)
    print("sweep clean: no unpartitioned WindowExec outside the "
          "calendar-grain allow-list")


if __name__ == "__main__":
    main()
