"""Profile registered queries one at a time (optimization guide §1).

Usage::

    python tools/profile_query.py <query> [<query> ...]

For each query: run it twice against $SPARK_GRAFT_SF_DIR through the
noop sink (same timed action as bench.py), then read the Spark UI REST
API (/api/v1) to break the LAST run down into its jobs — start offset,
duration, stage count, task count, description.  The per-job table is
what tells you whether a 6-second query is one slow stage or thirty
sequential 0.2-second jobs (two very different optimization targets).

The profiling session enables the UI (the engine default is
spark.ui.enabled=false) purely to expose the REST status endpoint.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from metar_pipeline_spark.queries import all_queries
from metar_pipeline_spark.session import get_spark


def run_once(spark, spec, sf_dir: str) -> float:
    t0 = time.time()
    spec.spark_fn(spark, sf_dir).write.format("noop").mode(
        "overwrite"
    ).save()
    return time.time() - t0


def api(base: str, path: str):
    with urllib.request.urlopen(f"{base}{path}", timeout=10) as r:
        return json.loads(r.read())


def ts(s: str) -> float:
    # "2026-08-17T12:34:56.789GMT"
    from datetime import datetime, timezone

    return (
        datetime.strptime(s[:23], "%Y-%m-%dT%H:%M:%S.%f")
        .replace(tzinfo=timezone.utc)
        .timestamp()
    )


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(
        "profile",
        extra_conf={
            "spark.ui.enabled": "true",
            "spark.ui.port": "4050",
        },
    )
    app_id = spark.sparkContext.applicationId
    base = f"http://localhost:4050/api/v1/applications/{app_id}"
    specs = all_queries()
    for name in names:
        spec = specs[name]
        t_warm = run_once(spark, spec, sf_dir)
        before = {j["jobId"] for j in api(base, "/jobs")}
        t = run_once(spark, spec, sf_dir)
        jobs = [
            j
            for j in api(base, "/jobs")
            if j["jobId"] not in before and "completionTime" in j
        ]
        jobs.sort(key=lambda j: j["jobId"])
        print(f"\n=== {name}: warm {t_warm:.2f}s, profiled {t:.2f}s, "
              f"{len(jobs)} jobs")
        if not jobs:
            continue
        t0 = min(ts(j["submissionTime"]) for j in jobs)
        tot = 0.0
        prev_end = t0
        for j in jobs:
            sub = ts(j["submissionTime"])
            end = ts(j["completionTime"])
            dur = end - sub
            tot += dur
            gap = sub - prev_end
            prev_end = max(prev_end, end)
            desc = (j.get("description") or j.get("name") or "")[:70]
            print(
                f"  job {j['jobId']:4d} +{sub - t0:7.2f}s "
                f"gap {gap:5.2f}s dur {dur:6.2f}s "
                f"stages {len(j.get('stageIds', [])):2d} "
                f"tasks {j.get('numTasks', 0):4d}  {desc}"
            )
        print(
            f"  -> Σjob {tot:.2f}s over wall {t:.2f}s "
            f"(wall − Σjob ≈ driver/planning/py4j)"
        )
        if "--sql" in sys.argv:
            # Operator-level attribution: the SQL executions of the
            # LAST run, every plan node with its key metrics.
            for ex in api(base, "/sql?length=200"):
                if ex.get("status") != "COMPLETED":
                    continue
                ids = {x["jobId"] for x in jobs}
                if not (set(ex.get("successJobIds", [])) & ids):
                    continue
                print(f"  sql exec {ex['id']} dur {ex.get('duration', 0)/1000:.2f}s")
                for nd in api(base, f"/sql/{ex['id']}?details=true&planDescription=false").get("nodes", []):
                    mets = {
                        m["name"]: m["value"]
                        for m in nd.get("metrics", [])
                    }
                    interesting = {
                        k: v
                        for k, v in mets.items()
                        if any(
                            s in k
                            for s in (
                                "time total",
                                "stage duration",
                                "task total",
                                "rows",
                                "build time",
                                "collect time",
                            )
                        )
                    }
                    if interesting:
                        print(f"    node {nd['nodeId']:3d} {nd['nodeName'][:50]:50s} {interesting}")
        if "--stages" in sys.argv:
            stages = {s["stageId"]: s for s in api(base, "/stages")}
            for j in jobs:
                if ts(j["completionTime"]) - ts(j["submissionTime"]) < 0.8:
                    continue
                print(f"  slow job {j['jobId']} stages:")
                for sid in sorted(j.get("stageIds", [])):
                    s = stages.get(sid)
                    if not s or s.get("status") == "SKIPPED":
                        continue
                    print(
                        f"    stage {sid:4d} tasks {s['numCompleteTasks']:4d} "
                        f"exRunMs {s.get('executorRunTime', 0):6d} "
                        f"cpuMs {s.get('executorCpuTime', 0) // 1000000:6d} "
                        f"in {s.get('inputBytes', 0):>10d}B "
                        f"sh-r {s.get('shuffleReadBytes', 0):>9d}B  "
                        f"{(s.get('name') or '')[:60]}"
                    )


if __name__ == "__main__":
    main()
