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


if __name__ == "__main__":
    main()
