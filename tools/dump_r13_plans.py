"""Dump .explain("formatted") for the round-13 optimization targets.

Usage: python tools/dump_r13_plans.py <suffix> [query ...]
Writes plans/r13/<query>_<suffix>.txt for each query (default list
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
    "dwh_daily_metrics",
    "tpch_q3_shipping_priority",
    "pagerank_supply_graph",
    "pagerank_warm_start_delta",
    "ppr_seed_expansion",
    "pca_top2_projection",
    "embedding_gram_matrix",
    "fm_sketch_set_ops",
    "brr_mean_ci_value",
    "supply_bfs_hops",
    "dedup_connected_components",
    "semantic_dedup_cells",
    "quality_classifier_platt",
    "split_leakage_audit_report",
    "dsir_importance_resample",
]


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or DEFAULT
    out_dir = Path(__file__).resolve().parent.parent / "plans" / "r13"
    out_dir.mkdir(parents=True, exist_ok=True)
    spark = get_spark("dump-r13-plans")
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
