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
        # Fail loudly at import time on a duplicate name (round-9
        # ADVICE): a silent REGISTRY overwrite would make which spec
        # the driver verifies depend on module import order.
        if name in REGISTRY:
            raise ValueError(f"duplicate query registration: {name!r}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


# The driver's correctness gate verifies the FIRST 50 registry entries
# per round. Order therefore encodes verification priority:
#   0. VERIFY_FIRST — this round's manually-flagged changed/red queries;
#   1. queries with no driver-green CORRECTNESS row yet;
#   2. driver-green queries whose implementing source or oracle changed
#      since their green hash was recorded (auto-boost — see
#      _query_hash / green_hashes.json below);
#   3. long-green unchanged queries (their rows stand as evidence).
# Rotation protocol per round: (a) at round START, before any edit,
# regenerate green_hashes.json (tools/update_green_hashes.py) so it
# snapshots the source the driver just verified; (b) add any query
# whose semantics you change to VERIFY_FIRST anyway (belt and braces —
# the auto-boost catches direct query/oracle edits and one-hop operator
# module edits, but not deeper transitive changes).
VERIFY_FIRST: list[str] = [
    # Round 13 OPTIMIZATION round: no new queries; this is the set
    # whose SPARK-SIDE IMPLEMENTATION was restructured for performance
    # this round (results proven identical against the oracle at
    # sf0.001 + sf0.01 after every change — see OPTIMIZATION_r13.md).
    # Most-restructured first: string-built expression trees (fm/BRR/
    # simhash), the vectorized streaming sessionizer, parallelized
    # store writes, then the fan_out reshapes (one added round-robin
    # exchange at the generator seam). The previous window's filelog/
    # txn queries went 50/50 green in the r12 gate and their hashes
    # are unchanged; the auto-boost (priority 2) fills the rest of the
    # window from the remaining hash-drifted names.
    "fm_sketch_set_ops",
    "fm_distinct_users_by_type",
    "fm_mergeable_daily_users",
    "fm_distinct_users_estimate",
    "brr_mean_ci_value",
    "stream_sessionize_stateful",
    "stream_ingest_dedup",
    "doc_fingerprints",
    "dedup_simhash_pairs",
    "stream_profile_anomaly_store",
    "stream_ivm_delta_view",
    "stream_cms_sketch_store",
    "stream_trailing_drift_metrics",
    "dedup_unigram_jaccard_pairs",
    "record_linkage_parts",
    "semantic_dedup_cells",
    "embedding_mislabel_candidates",
    "lm_perplexity_scores",
    "quality_classifier_platt",
    "dsir_importance_resample",
    "corpus_removable_span_report",
    "substring_dup_spans",
    "dedup_connected_components",
    "dedup_incremental_components",
    "pagerank_warm_start_delta",
    # Exactly 25 names: the gate window is 50 and the r12-continuation
    # tier (25 filelog/txn/codec queries) is still PENDING its first
    # driver verdict — those take the other 25 slots via the automatic
    # priority-1 boost, so the window invariant
    # (test_rotation::test_window_is_saturated_with_pending_queries)
    # holds with zero pending overflow. The remaining fan_out-reshaped
    # queries (neardup_*, split_leakage, ann/kmeans twins,
    # pagerank_supply_graph, corpus_span_removal_audit,
    # source_centroid_affinity, dedup_minhash/incremental_batch/
    # canonical_keep) were all re-verified locally at sf0.001 + sf0.01
    # this round and stay hash-drifted, so the priority-2 auto-boost
    # rotates them into later windows. (ann_maxsim_recall_at_10 was
    # also re-verified both SFs, but its verified-surface hash is
    # unchanged — the stale-boost lint correctly excludes it.)
]


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


def _query_hash(spec: QuerySpec) -> str:
    """Content hash of a query's verified surface: its spark_fn source,
    its oracle SQL, and — one hop out — the source of every
    metar_pipeline_spark function/module the spark_fn references by name
    (co_names), so an edit to e.g. operators/dedup.py re-boosts the
    dedup queries that call it. Deliberately one hop, not transitive:
    deep engine changes are covered by the full sf0.001 pytest oracle
    suite; the hash exists to re-open the EXTERNAL gate for the common
    regression class (direct query/oracle/operator-module edits)."""
    import ast
    import hashlib
    import inspect
    import textwrap
    import types
    from pathlib import Path

    import importlib

    h = hashlib.sha256()
    try:
        src = inspect.getsource(spec.spark_fn)
    except OSError:
        src = repr(spec.spark_fn.__code__.co_code)
    h.update(src.encode())
    h.update((spec.oracle or "").encode())
    g = spec.spark_fn.__globals__
    for name in sorted(set(spec.spark_fn.__code__.co_names)):
        v = g.get(name)
        if isinstance(v, types.ModuleType):
            if (v.__name__ or "").startswith("metar_pipeline_spark"):
                try:
                    h.update(Path(v.__file__).read_bytes())
                except (OSError, TypeError):
                    pass
        elif callable(v) and getattr(v, "__module__", "").startswith(
            "metar_pipeline_spark"
        ):
            try:
                h.update(inspect.getsource(v).encode())
            except (OSError, TypeError):
                pass
    # Function-LOCAL imports (`from metar_pipeline_spark.x import y`
    # inside the body) never appear as module-level globals, so the
    # co_names walk above misses them — hash those modules too, or an
    # edit there silently fails to re-open the gate (the round-5
    # udtf_fns revert escaped the auto-boost exactly this way).
    # Parsed with ast, not a regex: parenthesized multi-line, aliased,
    # and plain `import pkg.mod` forms all count (round-5 review found
    # the regex skipped paren-form imports — scd/lm edits escaped).
    # IMPORTANT: `from pkg.operators import textops` resolves the
    # import target to the PACKAGE, whose __init__.py bytes never
    # change — each imported NAME must be probed as a submodule and
    # hashed when it is one.
    targets: set[str] = set()
    try:
        tree = ast.parse(textwrap.dedent(src))
    except SyntaxError:
        tree = None
    for node in ast.walk(tree) if tree else ():
        if isinstance(node, ast.Import):
            for alias in node.names:
                if alias.name.startswith("metar_pipeline_spark"):
                    targets.add(alias.name)
        elif isinstance(node, ast.ImportFrom):
            base = node.module or ""
            if node.level == 0 and base.startswith("metar_pipeline_spark"):
                targets.add(base)
                for alias in node.names:
                    targets.add(f"{base}.{alias.name}")
    for mod_name in sorted(targets):
        try:
            m = importlib.import_module(mod_name)
        except Exception:  # noqa: BLE001 — name isn't a module: skip
            continue
        try:
            h.update(Path(m.__file__).read_bytes())
        except (OSError, TypeError):
            pass
    return h.hexdigest()


def _green_hashes() -> dict[str, str]:
    """green_hashes.json: query name → _query_hash at the moment the
    source was last snapshotted as driver-verified (regenerated at each
    round start by tools/update_green_hashes.py). A green query whose
    current hash differs was edited after verification and auto-boosts
    back into the window."""
    import json
    from pathlib import Path

    p = Path(__file__).resolve().parent / "green_hashes.json"
    try:
        return json.loads(p.read_text())
    except Exception:  # noqa: BLE001 — missing/corrupt manifest: boost all
        return {}


def all_queries() -> dict[str, QuerySpec]:
    # Import side-effect: populate REGISTRY.
    from metar_pipeline_spark.queries import (  # noqa: F401
        analytics_q,
        core,
        corpus_q,
        curation_q,
        extended,
        geo_q,
        multimodal_q,
        pca_q,
        pipeline_q,
        scale_q,
        sql_api,
        staged,
        text_ml,
        timeseries_q,
        tpch_more,
        vocab_q,
    )

    # Automatic rotation: VERIFY_FIRST names lead unconditionally (the
    # manual boost beats a green verdict — that is the whole point of
    # boosting a query whose code changed after it went green), then
    # queries whose latest driver verdict is not green, then green ones
    # whose source hash drifted from the verified snapshot (auto-boost),
    # then unchanged green ones (their rows stand as evidence). Ties
    # keep registration order (sorted() is stable).
    green = _driver_green()
    manifest = _green_hashes()
    pri = {n: i for i, n in enumerate(VERIFY_FIRST)}

    def key(n: str) -> tuple:
        if n in pri:
            return (0, pri[n])
        if n not in green:
            return (1, 0)
        if manifest.get(n) != _query_hash(REGISTRY[n]):
            return (2, 0)
        return (3, 0)

    names = sorted(REGISTRY, key=key)
    return {n: REGISTRY[n] for n in names}
