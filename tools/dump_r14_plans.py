"""Dump .explain("formatted") for the round-14 optimization targets.

Usage: python tools/dump_r14_plans.py <suffix> [query ...]
Writes plans/r14/<query>_<suffix>.txt for each query (default list
below). Run with suffix=before from the pre-optimization tree and
suffix=after from the final tree; the judge compares the two.
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from metar_pipeline_spark.queries import all_queries
from metar_pipeline_spark.session import get_spark

SF_DIR = "/root/testdata/sf0.001"

DEFAULT = [
    # round-14 touched queries (pagerank overlap, BFS piece-union,
    # ppr cross-join exoneration, dedup_incremental_batch exoneration)
    "pagerank_warm_start_delta",
    "pagerank_supply_graph",
    "supply_bfs_hops",
    "lpa_incremental_delta",
    "ppr_seed_expansion",
    "dedup_incremental_batch",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r14"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-r14-plans")
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    specs = all_queries()
    for name in names:
        df = specs[name].spark_fn(spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            em.fromString("formatted")
        )
        (out_dir / f"{name}_{suffix}.txt").write_text(plan)
        print("wrote", name, suffix)


if __name__ == "__main__":
    main()
