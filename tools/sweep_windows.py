"""Sweep every registered query's physical plan for the two
single-task-sort scale-killer window classes:

1. UNPARTITIONED WindowExec (``Window.orderBy`` with no partitionBy)
   — moves the ENTIRE input frame to one task. Round 7 removed every
   data-grain instance (corpus/user/key-grain ranks now use
   operators/ranking.distributed_rank or rank_bounded); the only ones
   allowed to remain are CALENDAR-GRAIN rolling frames, whose row
   count is bounded by the calendar (~2.4k day rows for the 2024-2030
   test span), not by data volume.

2. BOUNDED-LITERAL-KEY windows (round 10, the MaxSim class): a window
   partitioned by a handful of values (3 query ids, a literal label
   set) still moves each group's ENTIRE frame — possibly the whole
   corpus — into one task; the sweep for class 1 cannot see it.
   Detection is observational: a window whose partition columns all
   survive into the query's OUTPUT and show ≤ MAX_PART_CARD distinct
   values there is flagged, unless (a) it is the bounded level-2 of a
   salted two-level top-k (a sibling window in the same plan
   partitions by the same keys + ``__salt`` — ranking.grouped_topk),
   or (b) it is justified in ALLOWED_BOUNDED_INPUT (the window's
   INPUT is bounded by construction — broadcast probe grain,
   day-grain aggregates — which plan text alone cannot prove).

Usage: python tools/sweep_windows.py [sf_dir]
Exit 1 on any unjustified finding in either class.
tests/test_plans.py runs the same check.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Queries whose plans legitimately contain an unpartitioned window:
# every entry must be a rolling/cumulative frame over a DAY-grain (or
# coarser) aggregate — bounded by the calendar, never by data volume.
# (test_plans.py verifies each listed query's offending windows really
# do order by the day column — or, when the calendar-bounded frame is
# a day-DERIVED grain under another name, by the column declared with
# an `order=<name>` marker in the justification text.)
ALLOWED_CALENDAR_GRAIN: dict[str, str] = {
    # (km_conversion_survival's duration-grain cumulative runs inside
    # its materialized life-table stage — the registered query's plan
    # is post-checkpoint opaque, so it needs no entry here; the frame
    # is calendar-bounded by construction, documented in the query.)
    "forecast_baseline_backtest": (
        "lag-1/2/3/7 features + row index over the daily-count "
        "aggregate; frame = days elapsed"
    ),
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


# Windows partitioned by a low-cardinality key whose INPUT is bounded
# by construction — invisible to the observational check, justified
# here. Every entry names the bounding structure.
ALLOWED_BOUNDED_INPUT: dict[str, str] = {
    "spearman_daily_count_value": (
        "rank windows over the per-type (event_type, day) AGGREGATE — "
        "calendar-day grain per key (~2.4k rows/type for the test "
        "span), never event grain; the fact is reduced to day grain "
        "in one hash agg before any window"
    ),
    "cohort_ltv_curve": (
        "cumulative revenue over the (cohort-week, age-days) "
        "AGGREGATE — calendar-bounded per key (ages <= days span), "
        "never event grain; the fact reduces to that grain in one "
        "hash agg before the window"
    ),
    "interpolate_daily_gaps": (
        "IGNORE-NULLS first/last windows over the per-type DATE SPINE "
        "(sequence(min_day, max_day)) — calendar-day grain per key, "
        "never event grain; the fact is reduced to (type, day) before "
        "any window"
    ),
}

# A window partition key with more distinct values than this is not
# "a handful of literals" — per-group frames shrink proportionally.
MAX_PART_CARD = 8


def _window_partition_sets(plan: str) -> list[tuple[str, ...]]:
    """Partition-column name tuples of every windowspecdefinition in
    ``plan`` (simple columns only — a computed partition expression
    returns a non-identifier token and the caller skips the set)."""
    import re

    sets: list[tuple[str, ...]] = []
    for line in plan.splitlines():
        for chunk in line.split("windowspecdefinition(")[1:]:
            depth, arg, args = 0, "", []
            for ch in chunk:
                if ch == "(":
                    depth += 1
                elif ch == ")":
                    if depth == 0:
                        break
                    depth -= 1
                if ch == "," and depth == 0:
                    args.append(arg)
                    arg = ""
                else:
                    arg += ch
            args.append(arg)
            keys = []
            for a in args:
                if " ASC" in a or " DESC" in a:
                    break
                keys.append(a.strip())
            if keys:
                sets.append(
                    tuple(
                        re.sub(r"#\d+[A-Za-z]*$", "", k) for k in keys
                    )
                )
    return sets


def bounded_literal_windows(plan: str, df, max_card: int = MAX_PART_CARD):
    """[(partition_keys, observed_distinct)] for windows whose
    partition columns all reach the query OUTPUT with ≤ ``max_card``
    distinct values — the MaxSim class. Level-2 windows of a salted
    two-level top-k (grouped_topk) are skipped: a sibling spec with
    the same keys + __salt proves their input is survivor-bounded."""
    import re

    sets = set(_window_partition_sets(plan))
    # Rank-limit windows whose plan carries a PARTIAL WindowGroupLimit
    # on the same keys are engine-bounded: each map task forwards only
    # the per-group top-k BEFORE the exchange, so the reducer-side
    # window input is k×tasks rows, never the group's full frame.
    gl_bounded = {
        tuple(
            re.sub(r"#\d+[A-Za-z]*$", "", k.strip())
            for k in line.split("WindowGroupLimit [", 1)[1]
            .split("]", 1)[0]
            .split(",")
        )
        for line in plan.splitlines()
        if "WindowGroupLimit [" in line and "Partial" in line
    }
    hits = []
    for keys in sorted(sets):
        if not all(re.fullmatch(r"[A-Za-z_][A-Za-z0-9_]*", k) for k in keys):
            continue  # computed partition expression — out of scope
        if keys in gl_bounded:
            continue  # Partial WindowGroupLimit bounds the input
        if any(
            set(keys) < set(o) and "__salt" in o for o in sets
        ):
            continue  # bounded level-2 of ranking.grouped_topk
        if not all(k in df.columns for k in keys):
            continue  # key does not survive to the output — can't observe
        card = df.select(*keys).distinct().count()
        if card <= max_card:
            hits.append((keys, card))
    return hits


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
            continue
        if name in ALLOWED_BOUNDED_INPUT:
            continue
        try:
            lowcard = bounded_literal_windows(plan, df)
        except Exception as e:  # noqa: BLE001 — surface as a finding
            bad[name] = [f"LOW-CARD CHECK FAILED: {e}"]
            continue
        if lowcard:
            bad[name] = [
                f"BOUNDED-LITERAL PARTITION KEY {keys}: "
                f"{card} distinct values in the output"
                for keys, card in lowcard
            ]
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
          "calendar-grain allow-list, no unjustified bounded-literal "
          "partition keys")


if __name__ == "__main__":
    main()
