"""Query registry — the driver contract surface.

Each named query is a pair (spark_fn, oracle_sql):
- spark_fn(spark, sf_dir) -> DataFrame, built from the engine's operators;
- oracle_sql: equivalent SQL DuckDB runs on the same parquet views.

Determinism rules (so the driver's order-insensitive value-hash matches):
- float SUM/AVG go through exact DECIMAL accumulation, then ONE double
  division/round — accumulation order can then never change the result;
- every window/top-k has a total order (explicit tiebreak columns);
- no raw unrounded float arithmetic chains in outputs.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass
class QuerySpec:
    name: str
    spark_fn: Callable[[SparkSession, str], DataFrame]
    oracle: Optional[str]  # None → non-SQL-expressible (rows-only check)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: Optional[str], doc: str = ""):
    def deco(fn):
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


# The driver's correctness gate verifies the FIRST 50 registry entries
# per round. Order therefore encodes verification priority: queries with
# no driver-green CORRECTNESS row yet (the r1/r2 gates stopped at entry
# 50, leaving the dedup/ANN/text/TPC-H tail unchecked) and queries whose
# code or oracle changed this round come first; long-green unchanged
# queries keep their earlier green rows as evidence and sort last.
VERIFY_FIRST = [
    # never driver-checked (registry tail in r1/r2)
    "recursive_date_spine_gapfill",
    "text_token_stats",
    "text_quality_scores",
    "text_lang_id",
    "doc_fingerprints",
    "dedup_exact_groups",
    "dedup_prefix_groups",
    "dedup_unigram_jaccard_pairs",
    "dedup_minhash_lsh_pairs",
    "dedup_simhash_pairs",
    "ann_bruteforce_topk",
    "ann_lsh_topk",
    "embedding_neardup_pairs",
    "ann_ivf_topk",
    "doc_tfidf_top_terms",
    "dedup_connected_components",
    "text_repetition_signals",
    "gopher_quality_filter",
    "doc_top_bigram_share",
    "sliding_window_event_stats",
    "session_window_stats",
    "range_join_event_windows",
    "stats_moments_exact",
    "deterministic_stratified_sample",
    "value_histogram",
    "similar_value_series_topk",
    "tpch_q7_volume_shipping",
    "tpch_q8_market_share",
    "tpch_q9_product_profit",
    "tpch_q12_priority_shipping",
    "tpch_q13_customer_distribution",
    "tpch_q14_promo_revenue",
    "tpch_q15_top_supplier",
    "tpch_q16_supplier_part_cnt",
    "tpch_q17_small_qty_revenue",
    "tpch_q19_discounted_revenue",
    "tpch_q20_promo_suppliers",
    "tpch_q22_idle_customers",
    "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock",
    "tpch_q21_suppliers_kept_waiting",
    # changed/new/red this round — need fresh driver rows
    "sessionize_events",
    "stream_daily_rollup_complete",
    "stream_daily_rollup_append",
    "pivot_daily_event_type_counts",
    "map_event_type_counts",
    "array_function_surface",
    "audio_features_stub",
    "longest_daily_streak",
    # new this round — first driver row (medallion_end_to_end rotated
    # out: driver-green in both r1 and r2, unchanged since)
    "decontaminate_ngram_overlap",
]
# The 50-entry window cannot hold every never-green query this round:
# the 41 never-checked SURVEY-§2 tail entries plus the 8 changed/red
# ones take priority; the remaining r3 additions (curation, try_*,
# scripting, arrow, anomaly, incremental dedup, …) are locally
# oracle-verified now and rotate into the window automatically next
# round, once this round's window entries go green.


def _driver_green() -> set[str]:
    """Query names whose LATEST driver verdict is fully green.

    Verdicts come from the CORRECTNESS_r*.json files the external gate
    writes at repo root; a later round's row overrides an earlier one,
    so a query that regressed (green r1, red r2) counts as NON-green
    and re-enters the verification window. A query absent from later
    files keeps its older verdict (it was rotated out while green)."""
    import json
    from pathlib import Path

    verdict: dict[str, bool] = {}
    root = Path(__file__).resolve().parents[2]
    for p in sorted(root.glob("CORRECTNESS_r*.json")):
        try:
            data = json.loads(p.read_text())
        except Exception:  # noqa: BLE001 — unreadable file: ignore
            continue
        for name, row in data.items():
            if isinstance(row, dict):
                verdict[name] = (
                    row.get("rows_match") is True
                    and row.get("hash_match") is True
                )
    return {n for n, ok in verdict.items() if ok}


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect: populate REGISTRY.
    from metar_pipeline_spark.queries import (  # noqa: F401
        core,
        curation_q,
        extended,
        multimodal_q,
        pipeline_q,
        scale_q,
        sql_api,
        text_ml,
        timeseries_q,
        tpch_more,
    )

    # Automatic rotation: VERIFY_FIRST names lead unconditionally (the
    # manual boost beats a green verdict — that is the whole point of
    # boosting a query whose code changed after it went green), then
    # queries whose latest driver verdict is not green, then green ones
    # (their rows stand as evidence). Ties keep registration order
    # (sorted() is stable).
    green = _driver_green()
    pri = {n: i for i, n in enumerate(VERIFY_FIRST)}

    def key(n: str) -> tuple:
        if n in pri:
            return (0, pri[n])
        return (1 if n not in green else 2, 0)

    names = sorted(REGISTRY, key=key)
    return {n: REGISTRY[n] for n in names}
