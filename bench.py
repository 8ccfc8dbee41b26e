"""Benchmark harness — runs the registered queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": N, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is fully executed via the no-op sink (format("noop")) so
projections and windows are not pruned away, but no rows land on the
driver — the measured path is scan → plan → execute, the same shape a
cluster run has.

Two-run protocol: host contention makes single-run totals swing ±20%
(r6's phantom 2× on one query was exactly this), so set
SPARK_GRAFT_BENCH_RUNS=2 to time the full registry twice in one JVM;
bench_details.json then records BOTH totals under "run_totals" and the
per-query map from the LAST (warmest) run. A real regression shows in
both runs; contention shows in one. The driver's per-round invocation
stays single-run (default 1) so BENCH_r{N}.json timing stays
comparable with earlier rounds.

Noisy-host re-measure pass (round 9): in-bench per-query seconds can
read 2-3× an isolated warm run (JVM/order state — r8's
dedup_minhash_lsh_pairs read 4.8 s in a contended driver run vs 1.0 s
isolated), so after the timed pass the SLOWEST
$SPARK_GRAFT_BENCH_REMEASURE (default 25) queries are re-run once in
slowest-first order and each reports min(first, second). The stdout
"queries" map carries these minima (the regression-watch set); "value"
stays the plain single-pass total for cross-round comparability, and
"min_total" substitutes the minima into it. bench_details.json records
both observations per re-measured query.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

from metar_pipeline_spark.queries import all_queries
from metar_pipeline_spark.session import get_spark


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    specs = all_queries()

    # Warm the JVM + parquet footers + Python/Arrow workers once so
    # timings reflect execution, not first-touch class loading or
    # daemon startup.
    # include the first registry entry: after a registry reorder the
    # lead query otherwise pays the whole-stage-codegen cold start.
    # Guarded like the main loop — a broken warm-up query must not
    # zero the whole bench either.
    lead = list(specs)[:3]  # the verification-window reorder moves
    # fresh queries to the head each round; warm them so their timings
    # are steady-state like every mid-registry query's
    for warm_q in (*lead, "dwh_daily_metrics", "pandas_token_count"):
        try:
            specs[warm_q].spark_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
        except Exception:  # noqa: BLE001 — the timed loop will report it
            pass

    n_runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1")))
    run_totals: list[float] = []
    timings: dict[str, float] = {}
    errors: dict[str, str] = {}
    for _run in range(n_runs):
        timings = {}
        errors = {}
        for name, spec in specs.items():
            t0 = time.time()
            # One broken query must not zero the whole bench: record the
            # failure and keep going (r2 lesson — a single
            # AnalysisException cost every timing that round).
            try:
                df = spec.spark_fn(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                timings[name] = round(time.time() - t0, 3)
            except Exception as exc:  # noqa: BLE001
                errors[name] = f"{type(exc).__name__}: {exc}"[:500]
        run_totals.append(round(sum(timings.values()), 3))

    total = run_totals[-1]
    # Re-measure pass: min-of-2 for the slowest K queries (module
    # docstring). Order is slowest-first — deliberately different from
    # registry order, so order-dependent JVM state can't inflate the
    # same query twice.
    n_remeasure = max(
        0, int(os.environ.get("SPARK_GRAFT_BENCH_REMEASURE", "25"))
    )
    remeasured: dict[str, dict[str, float]] = {}
    # Re-measure failures are recorded SEPARATELY: the query's timed
    # pass succeeded (its timing stands in `value`/`min_total`), so
    # folding such a failure into `errors` would inflate `n_errors` —
    # which means "queries that failed the TIMED pass" across rounds.
    remeasure_errors: dict[str, str] = {}
    for name, _first in sorted(timings.items(), key=lambda kv: -kv[1])[
        :n_remeasure
    ]:
        t0 = time.time()
        try:
            specs[name].spark_fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            second = round(time.time() - t0, 3)
        except Exception as exc:  # noqa: BLE001
            remeasure_errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            continue
        remeasured[name] = {
            "first": timings[name],
            "second": second,
            "min": min(timings[name], second),
        }
    min_timings = {
        name: remeasured[name]["min"] if name in remeasured else t
        for name, t in timings.items()
    }
    min_total = round(sum(min_timings.values()), 3)
    # The harness that invokes us keeps only the LAST ~2000 chars of
    # output and parses the JSON line from there — a full 92-entry
    # per-query dict (~4 KB) therefore never parses (r1/r2 lesson:
    # "parsed": null both rounds). Emit a compact line that always fits:
    # summary stats + the slowest 15 queries; the complete per-query
    # timing map goes to bench_details.json beside this script.
    detail = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
        "n_queries": len(timings),
        "mean_sec": round(total / max(len(timings), 1), 3),
        # two-run protocol (module docstring): both totals recorded so
        # one-run contention can't masquerade as a regression
        "run_totals": run_totals,
        # noisy-host re-measure pass: both observations per query
        "remeasured": remeasured,
        "min_total": min_total,
    }
    if errors:
        detail["errors"] = errors
    if remeasure_errors:
        detail["remeasure_errors"] = remeasure_errors
    detail_path = Path(__file__).resolve().parent / "bench_details.json"
    detail_path.write_text(json.dumps(detail, indent=1))

    # the regression-watch set carries min-of-2 figures (contention-
    # robust); "value"/"mean_sec" stay plain single-pass for
    # cross-round comparability
    slowest = dict(
        sorted(min_timings.items(), key=lambda kv: -kv[1])[:15]
    )
    out = {
        "metric": "total_query_wall_seconds",
        "value": total,
        "unit": "sec",
        "sf": sf,
        # the registry grows round over round; mean-per-query is
        # the count-stable comparison number
        "n_queries": len(timings),
        "mean_sec": round(total / max(len(timings), 1), 3),
        "min_total": min_total,
        "min_mean_sec": round(min_total / max(len(timings), 1), 3),
        "n_errors": len(errors),
        "queries": slowest,
        "detail": "bench_details.json",
    }
    line = json.dumps(out)
    if len(line) > 1900:  # belt-and-braces: drop per-query detail
        out["queries"] = {}
        line = json.dumps(out)
    print(line)


if __name__ == "__main__":
    main()
