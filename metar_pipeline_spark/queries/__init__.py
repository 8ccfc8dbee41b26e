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


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect: populate REGISTRY.
    from metar_pipeline_spark.queries import (  # noqa: F401
        core,
        extended,
        multimodal_q,
        pipeline_q,
        scale_q,
        sql_api,
        text_ml,
        timeseries_q,
        tpch_more,
    )

    return dict(REGISTRY)
