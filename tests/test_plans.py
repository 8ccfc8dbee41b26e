"""Physical-plan audits: the scale properties that make these queries
viable at 100 TB, asserted from .explain output so regressions in plan
shape fail CI — not just correctness (SURVEY.md §4).
"""

from __future__ import annotations

import pytest

from metar_pipeline_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"


def plan_str(df, mode: str = "formatted") -> str:
    em = df.sparkSession._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(em.fromString(mode))


@pytest.fixture(scope="module")
def plans(spark):
    specs = all_queries()

    def get(name):
        return plan_str(specs[name].spark_fn(spark, SF_DIR))

    return get


def test_q1_filter_pushdown_and_column_pruning(plans):
    p = plans("tpch_q1_pricing_summary")
    # shipdate predicate must reach the parquet scan
    assert "PushedFilters:" in p and "l_shipdate" in p.split("PushedFilters:")[1].split("\n")[0]
    # projection pruning: untouched columns never leave the scan
    read_schema = p.split("ReadSchema:")[1].split("\n")[0]
    for col in ("l_partkey", "l_suppkey", "l_linenumber"):
        assert col not in read_schema


def test_broadcast_joins_on_dims(plans):
    for q in (
        "tpch_q3_shipping_priority",
        "tpch_q5_local_supplier_volume",
        "tpch_q18_large_volume_customers",
    ):
        p = plans(q)
        assert "BroadcastHashJoin" in p, q
        assert "CartesianProduct" not in p, q


def test_broadcast_joins_on_dims_extended(plans):
    # the adapted TPC-H batch: every dim join must broadcast, fact-fact
    # joins shuffle — no plan may degrade to a nested loop / cartesian
    for q in (
        "tpch_q7_volume_shipping",
        "tpch_q8_market_share",
        "tpch_q9_product_profit",
        "tpch_q14_promo_revenue",
        "tpch_q16_supplier_part_cnt",
        "tpch_q17_small_qty_revenue",
        "tpch_q19_discounted_revenue",
        "tpch_q20_promo_suppliers",
    ):
        p = plans(q)
        assert "BroadcastHashJoin" in p, q
        assert "CartesianProduct" not in p, q


def test_q15_scalar_max_is_broadcast_not_window(plans):
    # the global-max scalar subquery must be a broadcast 1-row join, not
    # a single-partition window (which would serialize at scale)
    p = plans("tpch_q15_top_supplier")
    assert "BroadcastHashJoin" in p
    assert "Window" not in p


def test_q22_anti_join_shape(plans):
    p = plans("tpch_q22_idle_customers")
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p


def test_q12_date_filter_pushdown(plans):
    p = plans("tpch_q12_priority_shipping")
    pushed = [
        seg.split("\n")[0] for seg in p.split("PushedFilters:")[1:]
    ]
    assert any("l_shipdate" in seg for seg in pushed), pushed


def test_partial_aggregation(plans):
    # HashAggregate appears twice per agg: map-side partial + final
    p = plans("dwh_daily_metrics")
    assert p.count("HashAggregate") >= 2


def test_asof_join_is_not_a_range_join(plans):
    p = plans("asof_join_latest_order")
    assert "Window" in p
    for bad in ("CartesianProduct", "BroadcastNestedLoopJoin"):
        assert bad not in p


def test_no_accidental_nested_loops(plans):
    # every equi-joinable query must plan an equi join; the brute-force
    # ANN scorer is the single intentional non-equi (broadcast) join
    equi_queries = (
        "dedup_minhash_lsh_pairs",
        "dedup_simhash_pairs",
        "embedding_neardup_pairs",
        "semi_join_heavy_orders",
        "fk_violations_events_supplier",
    )
    for q in equi_queries:
        p = plans(q)
        assert "CartesianProduct" not in p, q


def test_whole_stage_codegen_on_hot_paths(spark):
    # the scan→filter→project→agg pipeline of Q1 must be codegen'd
    # (codegen explain mode — AQE's formatted plan hides codegen spans
    # until the final plan materializes)
    specs = all_queries()
    df = specs["tpch_q1_pricing_summary"].spark_fn(spark, SF_DIR)
    df.collect()  # materialize so AQE finalizes the executed plan
    p = df._jdf.queryExecution().executedPlan().toString()
    # '*(n)' prefixes mark WholeStageCodegen spans in the plan string;
    # scan-side stage 1 (filter+project+partial agg) must be one span
    import re

    assert re.search(r"\*\(\d+\) HashAggregate", p)
    assert re.search(r"\*\(\d+\) Filter", p)


def test_scan_riding_queries_have_no_exchange(plans):
    """Per-row filter/signal queries must ride the scan: zero shuffles —
    at 100 TB an accidental Exchange here would move the whole corpus."""
    for q in (
        "text_repetition_signals",
        "gopher_quality_filter",
        "array_function_surface",
        "stg_typed_projection",
        "text_token_stats",
    ):
        p = plans(q)
        assert "Exchange" not in p, q


def test_mode_query_is_two_level_agg_no_window(plans):
    """Exact mode = two hash-agg levels with map-side combine; a window
    formulation would sort every group — assert it never regresses."""
    p = plans("event_type_mode_daily")
    assert "Window" not in p
    assert p.count("HashAggregate") >= 4  # two rounds x partial+final


def test_curation_queries_stay_jvm_side(plans):
    """All four curation ops are pure column math / window / join —
    no Python evaluation stage may appear in any of their plans."""
    for q in (
        "pack_training_sequences",
        "mixture_quota_sample",
        "decontaminate_ngram_overlap",
        "pii_redaction_stats",
    ):
        p = plans(q)
        assert "Python" not in p and "Pandas" not in p, q


def test_decontamination_broadcasts_eval_side(plans):
    """The eval-set digest table is the small side; the corpus n-gram
    stream must join against it broadcast, never via a shuffled join."""
    p = plans("decontaminate_ngram_overlap")
    assert "BroadcastHashJoin" in p


def test_pack_sequences_single_exchange(plans):
    """Packing is one cumsum window per domain: exactly one Exchange
    (hashpartitioning by source) feeds the window sort."""
    import re

    p = plans("pack_training_sequences")
    assert len(re.findall(r"\(\d+\) Exchange\b", p)) == 1


def test_pii_redaction_rides_the_scan(plans):
    """Regex scrub is per-row projection — no Exchange at all."""
    p = plans("pii_redaction_stats")
    assert "Exchange" not in p


def test_package_has_no_driver_side_materialization():
    """Every operator must stay distributed: no .collect()/.toPandas()
    anywhere in the package. The only permitted driver-side reads are
    `.first()` on ALREADY-AGGREGATED scalar frames (watermark max, byte
    totals, convergence sums, layout bounds) — each .first() call site
    must sit on an agg/aggregated expression."""
    import re
    from pathlib import Path

    pkg = Path(__file__).resolve().parent.parent / "metar_pipeline_spark"
    # Scoped allowance: a `.collect()` tagged `# bounded-collect:` in an
    # ALLOWLISTED file reads a dimension-grain aggregated frame (pca.py
    # collects the d per-dim means and the d*(d+1)/2 Gram cells for the
    # driver-side eigensolve — bounded by embedding width, never data;
    # the MLlib computeGramianMatrix shape; layout.py collects the
    # PRUNED FILE LIST from the skipping manifest — one row per file,
    # metadata grain, and it must reach the driver to become the
    # spark.read.parquet(*files) argument, exactly like Delta/Iceberg
    # planning reads their manifests driver-side). Both conditions are
    # required, so an untagged collect anywhere — or a tagged one in
    # any other file — still fails the lint.
    # Round-13 additions: filelog.py collects the per-file footer
    # stats of the files a commit just WROTE (commit grain — one row
    # per new file — they go into the commit json, the Delta
    # stats-in-log shape); scale_q.py's filelog backfill collects the
    # AFFECTED DAY list (partition-value grain) because
    # overwrite_partitions takes partition values as a driver-side
    # argument — the replaceWhere shape.
    bounded_collect_files = {"pca.py", "layout.py", "filelog.py",
                             "scale_q.py"}
    offenders = []
    for f in sorted(pkg.rglob("*.py")):
        text = f.read_text()
        for i, line in enumerate(text.splitlines(), 1):
            if re.search(r"\.collect\(|\.toPandas\(|\.toLocalIterator\(", line):
                if (
                    f.name in bounded_collect_files
                    and "bounded-collect:" in line
                ):
                    continue
                offenders.append(f"{f.name}:{i}: {line.strip()}")
            if ".first()" in line:
                # scalar-read allowance: the expression must aggregate
                window = "\n".join(text.splitlines()[max(0, i - 3):i])
                if not re.search(r"\.agg\(|F\.max\(|F\.sum\(|F\.min\(", window):
                    offenders.append(f"{f.name}:{i}: {line.strip()}")
    assert not offenders, offenders


def test_runtime_bloom_filter_default_on():
    """The runtime bloom-filter flag must stay a session default (the
    injection plan shape itself is pinned in
    test_scale_ops.py::test_runtime_bloom_filter_join_pruning)."""
    from metar_pipeline_spark.session import get_spark

    spark = get_spark("plan-tests")
    assert (
        spark.conf.get("spark.sql.optimizer.runtime.bloomFilter.enabled")
        == "true"
    )


def test_scd2_incremental_touches_only_batch_keys(plans):
    # incremental SCD2: the batch key set drives broadcast semi/anti
    # joins (closed history passes through untouched), the window math
    # hash-partitions on the dimension key, and nothing degenerates to
    # a sort-merge or cartesian plan at this scale
    p = plans("scd2_incremental_apply")
    assert "LeftSemi" in p
    assert "LeftAnti" in p
    assert "BroadcastHashJoin" in p
    assert "hashpartitioning(o_custkey" in p
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p


def test_freq_tokens_sketch_partial_agg(plans):
    # the frequent-items sketch must combine map-side: a partial
    # approx_top_k aggregate below the exchange, final above — the
    # vocabulary itself never shuffles
    p = plans("freq_tokens_sketch_topk")
    assert "partial_approx_top_k" in p
    assert "approx_top_k" in p


def _nodes(p: str, kind: str) -> int:
    # formatted explain prints each node twice (tree + detail); count
    # the numbered detail headers to count NODES
    import re

    return len(re.findall(rf"\(\d+\) {kind}\b", p))


def test_funnel_single_user_shuffle(plans):
    # one-pass funnel: exactly two exchanges (per-user agg + the
    # one-row summary), never one per step
    p = plans("funnel_view_click_purchase")
    assert _nodes(p, "Exchange") == 2, p
    assert "CartesianProduct" not in p


def test_ols_trend_one_agg_pass(plans):
    # moments fit = one partial+final hash aggregate; only the final
    # 5-row orderBy may add a range exchange
    p = plans("ols_trend_by_event_type")
    assert _nodes(p, "Exchange") <= 2
    assert "partial_sum" in p  # map-side combine before the exchange


def test_lm_model_joins_broadcast(plans):
    # the bigram model and prefix totals are charset-bounded — both
    # must broadcast; doc scoring may never shuffle the corpus join
    p = plans("lm_perplexity_scores")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p


def test_bm25_stats_broadcast_and_prefilter(plans):
    # BM25: df + (N, avgdl) stats come back broadcast (never a
    # sort-merge), and the query-term filter reaches the (doc, term)
    # stream BEFORE its aggregate so the tf shuffle is query-sized
    p = plans("bm25_keyword_search")
    assert p.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_skyline_has_no_dominance_join(plans):
    # skyline: date-grain MIN partials + one running-min window; the
    # fact is aggregated once and never joined against itself
    p = plans("skyline_price_date_frontier")
    assert "Join" not in p, p
    assert _nodes(p, "Scan parquet") == 1
    assert "partial_min" in p  # map-side combine on the fact scan


def test_pq_codebook_joins_broadcast(plans):
    # PQ: codebooks and query distance tables broadcast; the corpus
    # codes pass must not sort-merge or cartesian against either
    p = plans("ann_pq_adc_topk")
    assert "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p
    assert "CartesianProduct" not in p


def test_winnow_no_generate_filter_blowup(plans):
    # InferFiltersFromGenerate once pushed a size(fps)>0 predicate
    # through the staged projections, inlining the whole hash chain
    # into one filter that replayed every md5 per reference (26 s vs
    # 4 s at sf0.1). The localCheckpoint before the explode cuts
    # lineage, so the executed plan must carry (almost) no digest
    # expressions — a couple on the checkpointed side at most, never
    # the ~200 of the inlined form.
    p = plans("dedup_winnow_span_pairs")
    assert p.count("md5") <= 4, p.count("md5")
    assert "CartesianProduct" not in p


def test_length_bucket_padding_single_sort(plans):
    # NTILE now comes from distributed_rank (range exchange inside the
    # localCheckpoint) + closed-form bucket: the visible plan must show
    # a PARTITIONED window (by __pid) — never an unpartitioned one that
    # would single-task the corpus — and a map-side-combined bucket agg
    p = plans("length_bucket_padding_stats")
    assert "CartesianProduct" not in p
    for line in p.splitlines():
        if "windowspecdefinition" in line:
            first_arg = line.split("windowspecdefinition(", 1)[1].split(
                ",", 1
            )[0]
            assert " ASC" not in first_arg and " DESC" not in first_arg, (
                "unpartitioned window:\n" + line
            )
    assert "partial_count" in p and "partial_sum" in p  # map-side combine
    # exactly one corpus-grain hash exchange survives outside the
    # checkpoint: the pid-window one; the bucket agg exchanges only
    # bucket-grain partials
    assert "hashpartitioning(__pid" in p


def test_curation_funnel_bounded_scans(plans):
    # six funnel stages, but the corpus is NOT scanned once per stage:
    # stages 0-4 are flags folded by one conditional aggregate, so the
    # documents file appears in at most 4 lineages (flag pass, the two
    # gram-join sides, threshold/stage-5 reuse) — a per-stage design
    # would show 6+
    p = plans("corpus_curation_funnel")
    assert 0 < p.count("documents.parquet") <= 4, p.count(
        "documents.parquet"
    )
    # the only joins are the broadcast gram/threshold joins and the
    # one-row summary combines — never a shuffled sort-merge pass over
    # the corpus
    assert "SortMergeJoin" not in p


def test_semdedup_pairs_cell_blocked(plans, spark):
    """SemDeDup's pair generation must be an equi-join on the cell id
    (Σ|cell|² work), never a cartesian. The shared assignment is
    localCheckpoint-ed (three consumers), so the assignment-broadcast
    pin targets ivf_assignments directly (opaque-plan protocol)."""
    p = plans("semantic_dedup_cells")
    assert "CartesianProduct" not in p
    # the within-cell self-join keys on cid
    assert "cid" in p
    # assignment step: centroid table (n_centroids rows) broadcasts
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators import similarity as sim

    emb = spark.range(40).select(
        F.col("id").alias("vec_id"),
        F.array(
            *[(F.col("id") % (i + 3)).cast("float") for i in range(4)]
        ).alias("embedding"),
    )
    ap = plan_str(
        sim.ivf_assignments(emb, "vec_id", "embedding", 8, keep_cscore=True)
    )
    assert "BroadcastHashJoin" in ap or "BroadcastNestedLoopJoin" in ap
    assert "CartesianProduct" not in ap
    # assignment is a ZERO-EXCHANGE projection: the corpus side must
    # show no hash exchange at all (the only exchange is the
    # single-row centroid pack) and no groupBy(id)/max_by re-aggregate
    assert "hashpartitioning(" not in ap
    assert "max_by" not in ap


def test_record_linkage_blocked_join(plans):
    """Record linkage candidates come from the blocking equi-join —
    the plan must join on the block keys, not cross-compare records."""
    p = plans("record_linkage_parts")
    assert "CartesianProduct" not in p
    assert "__blk0" in p  # blocking key is the join key


def test_dsir_model_broadcast_and_bounded_topk(plans):
    """DSIR: the combined (raw+target) LM must come back as a
    broadcast join — the corpus-side bigram counts never reshuffle for
    scoring — and the Gumbel top-50 must plan as a bounded top-k
    (TakeOrderedAndProject), not a global sort."""
    p = plans("dsir_importance_resample")
    assert "BroadcastHashJoin" in p
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p


def test_platt_final_plan_scores_with_literal_weights(plans):
    """Platt training collapses to two scalars per step (one-row
    aggregate reads) — the returned plan must be pure scoring: the
    learned weights appear as inlined LITERALS in a projection over
    the checkpointed scores, the top-20 is a bounded
    TakeOrderedAndProject, and no data-sized collect or join remains."""
    p = plans("quality_classifier_platt")
    assert "EXP(-round(" in p  # sigmoid over a literal-weight logit
    assert "TakeOrderedAndProject" in p
    assert "CartesianProduct" not in p and "BatchEvalPython" not in p


def test_corpus_topk_queries_plan_bounded(plans):
    """Every corpus-scale top-k (bm25 top-20, Zipf top-1000, Gumbel
    sample top-50) must plan as TakeOrderedAndProject (per-partition
    heaps), never a one-partition global sort of the scored frame.
    The source spells orderBy+limit explicitly rather than relying on
    LimitPushDownThroughWindow to rewrite a rank filter."""
    for name in (
        "bm25_keyword_search",
        "vocab_zipf_fit",
        "weighted_sample_docs",
    ):
        p = plans(name)
        assert "TakeOrderedAndProject" in p, name
        assert "CartesianProduct" not in p, name


# (ann_ivf_store_upsert intentionally has no plan pin here: the query
# returns a localCheckpoint of the probe — its visible plan is an
# opaque checkpoint scan. Its store/probe scale shape is pinned by
# test_scale_ops.py::test_ivf_store_upsert_is_incremental instead.)


def test_registry_wide_plan_lint(spark):
    """Sweeping scale-hygiene lint over EVERY registered query's
    physical plan at sf0.001: no CartesianProduct (an unbounded
    cross is never acceptable; one-row summary combines plan as
    BroadcastNestedLoopJoin and are fine), and no BatchEvalPython
    (row-at-a-time Python in a plan means a hot path left the JVM —
    Arrow forms show as ArrowEvalPython/MapInPandas/
    FlatMapGroupsInPandas and are allowed).

    Measured exemption: udtf_token_chunks deliberately uses the
    pickled UDTF path (BatchEvalPythonUDTF) — its useArrow=True form
    benched 2.6x slower at sf0.1 (1.00 s vs 0.38 s; round-5 finding,
    see functions/udtf_fns.py docstring): short variable-length
    string rows make per-batch Arrow conversion cost more than
    pickle. The exemption is name-scoped so any OTHER query landing a
    pickled Python eval still fails the lint."""
    measured_python_exempt = {"udtf_token_chunks": "BatchEvalPythonUDTF"}
    specs = all_queries()
    offenders = {}
    for name, spec in specs.items():
        try:
            p = plan_str(spec.spark_fn(spark, SF_DIR))
        except Exception as e:  # noqa: BLE001 — surface, don't mask
            offenders[name] = f"plan build failed: {e}"
            continue
        if "CartesianProduct" in p:
            offenders[name] = "CartesianProduct"
        # the exemption is node-kind-scoped, not a blanket pass: strip
        # only the measured node's occurrences, then any REMAINING
        # pickled Python eval (e.g. a row-at-a-time scalar UDF added
        # later to the same query) still fails the lint
        residual = p.replace(measured_python_exempt.get(name, "\0"), "")
        if "BatchEvalPython" in residual:
            offenders[name] = "BatchEvalPython"
    assert not offenders, offenders


def test_embedding_decontamination_broadcasts_eval_set(plans):
    """Eval-set decontamination must be one corpus scan probing a
    BROADCAST eval set (small by definition) and reduce with a hash
    aggregate — no window over the corpus, no vector shuffle, no
    cartesian."""
    p = plans("decontaminate_embedding_cosine")
    assert "BroadcastHashJoin" in p or "BroadcastNestedLoopJoin" in p
    assert "CartesianProduct" not in p
    assert "Window" not in p
    assert "HashAggregate" in p


def test_window_sweep_calendar_allowlist_and_fixed_families(spark):
    """The unpartitioned-window sweep contract (tools/sweep_windows.py;
    the full-registry run gates PLANS.md regeneration each round):

    1. every allow-listed query's unpartitioned windows really do
       order by the DAY column — calendar-bounded frames only;
    2. the families round 7 converted to distributed_rank/rank_bounded
       stay window-free (regression guard at test speed)."""
    import sys
    from pathlib import Path

    sys.path.insert(
        0, str(Path(__file__).resolve().parent.parent / "tools")
    )
    from sweep_windows import (
        ALLOWED_CALENDAR_GRAIN,
        sweep,
        unpartitioned_windows,
    )

    specs = all_queries()
    assert set(ALLOWED_CALENDAR_GRAIN) <= set(specs)
    for name, why in ALLOWED_CALENDAR_GRAIN.items():
        p = specs[name].spark_fn(spark, SF_DIR)
        plan = p._jdf.queryExecution().executedPlan().toString()
        hits = unpartitioned_windows(plan)
        assert hits, f"{name} no longer needs its allow-list entry"
        # default: order by the day column; an `order=<name>` marker in
        # the justification declares a day-DERIVED grain column (e.g.
        # the duration-days life table)
        col = "day"
        if "order=" in why:
            col = why.split("order=", 1)[1].split()[0].strip(".,)")
        for line in hits:
            first = line.split("windowspecdefinition(", 1)[1].split(
                ",", 1
            )[0]
            assert first.startswith(f"{col}#"), (name, line[:160])

    fixed = {
        "activity_gini_coefficient",
        "value_decile_concentration",
        "length_bucket_padding_stats",
        "skew_key_report",
        "weighted_sample_docs",
        "bm25_keyword_search",
        "quality_classifier_platt",
        "hybrid_search_rrf",
        "freq_tokens_sketch_topk",
    }
    assert sweep(spark, SF_DIR, only=fixed) == {}


def test_corpus_dup_spans_one_pass_gram_window(plans):
    # duplicated_span_stats: ONE generator pass over documents, the
    # corpus-wide occurrence count as a gram-PARTITIONED window (the
    # groupBy+join-back form scans/explodes twice — measured 2.4x
    # slower at sf0.1), then the per-doc rollup. No join anywhere.
    p = plans("substring_dup_spans")
    assert _nodes(p, "Scan parquet") == 1, p
    assert _nodes(p, "Window") == 1
    assert "Join" not in p
    # the window is keyed on the gram, never unpartitioned
    assert "windowspecdefinition(gram" in p


def test_corpus_pmi_checkpointed_single_explode(plans):
    # pmi_collocations: the (doc, distinct-token) frame is
    # materialized once (localCheckpoint) and reused by all four
    # consumers — the final plan must contain NO parquet re-scan of
    # documents, and top-k must be per-partition heaps
    p = plans("cooccurrence_pmi")
    assert _nodes(p, "Scan parquet") == 0, p
    assert _nodes(p, "TakeOrderedAndProject") == 1
    assert "CartesianProduct" not in p


def test_corpus_jsd_checkpointed_vocab_grain(plans):
    # unigram_js_divergence: vocab-grain counts checkpointed, so the
    # corpus explode runs once; the totals row comes back as a
    # broadcast nested-loop (1-row) cross join, never a cartesian
    p = plans("corpus_js_divergence")
    assert _nodes(p, "Scan parquet") == 0, p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" in p


def test_snapshot_diff_narrow_fingerprint_join(plans):
    # snapshot_diff: both snapshots reduce to (key, md5 fingerprint)
    # BEFORE the full-outer join — the join carries two narrow frames
    p = plans("table_snapshot_diff")
    assert _nodes(p, "SortMergeJoin") == 1
    assert "FullOuter" in p
    assert "md5" in p
    assert "CartesianProduct" not in p


def test_event_funnel_no_cartesian(plans):
    # strict-order funnel: user-grain min-agg chain; the three summary
    # counts cross back as 1-row broadcasts
    p = plans("event_funnel_conversion")
    assert "CartesianProduct" not in p
    assert "SortMergeJoin" not in p  # user-key joins broadcast at this
    # scale via AQE; at 100 TB they become co-partitioned SMJs, which
    # is also fine — the pin is about the 1-row summary joins never
    # degenerating. Guarded loosely on purpose.


def test_span_removal_gram_window_and_anti_join(plans):
    """remove_duplicated_spans (round 9): gram duplication is ONE
    count-over-window on the gram (never groupBy+join-back, which
    would re-run the generator twice); the rebuild path is an anti-join
    keyed at (doc, pos); nothing degrades to a cartesian."""
    p = plans("corpus_span_removal_audit")
    assert "windowspecdefinition(__gram" in p
    assert "LeftAnti" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_ivm_delta_join_three_terms_no_cartesian(plans):
    """zset_delta_join: three equi-join terms unioned, weights as plain
    integer arithmetic — no cartesian/nested-loop anywhere, and the
    consolidation is a single hash aggregate."""
    p = plans("ivm_delta_join_view")
    assert p.count("Join Inner") + p.count("BroadcastHashJoin") >= 3
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashAggregate" in p


def test_maxsim_broadcast_queries_single_scan(plans):
    """Late-interaction MaxSim: the 3 query rows broadcast into one
    corpus scan; all 16 segment dots are per-row column math (no
    Python eval in the scoring path)."""
    p = plans("ann_maxsim_late_interaction")
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_maxsim_ivf_rerank_candidate_bounded(plans):
    """Round-10 MaxSim scale path: the frame entering the final top-k
    is CANDIDATE-BOUNDED (a cid equi-join against the broadcast IVF
    probes — a partition-pruned cell read at 100 TB), and every
    corpus-touching window is the grouped_topk two-level form (salted
    level 1) — no per-query full-corpus single-task sort remains."""
    p = plans("ann_maxsim_ivf_rerank")
    # stage-1 pruning: candidates ride the cid equi-join
    assert "BroadcastHashJoin" in p
    # two-level top-k: level-1 window is salted
    assert "__salt" in p
    assert "CartesianProduct" not in p
    assert "BatchEvalPython" not in p and "ArrowEvalPython" not in p


def test_maxsim_brute_topk_is_two_level(plans):
    """The brute MaxSim baseline's final top-k is the salted two-level
    grouped_topk, not a bare partitionBy(query_id) corpus sort."""
    p = plans("ann_maxsim_late_interaction")
    assert "__salt" in p


def test_bfs_hops_equi_joins_only(spark):
    """bfs_min_hops: every level is an equi-join + anti-join on the
    node id — pin the OPERATOR's per-level plan (the registered query
    returns post-checkpoint frames, so its final plan is opaque)."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.graph import bfs_min_hops
    from metar_pipeline_spark.io import load_table

    li = load_table(spark, SF_DIR, "lineitem")
    fwd = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    )
    edges = fwd.unionByName(
        fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).distinct()
    seeds = spark.range(1, 3).select((F.col("id") * 2).alias("node"))
    out = bfs_min_hops(edges, seeds, max_hops=2)
    p = plan_str(out)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p


def test_ivm_agg_merge_is_group_grain(plans):
    """ivm_delta_agg_view: the delta is one hash aggregate and the
    merge ONE full-outer join at group grain — no cartesian/nested
    loop, facts never rejoin."""
    p = plans("ivm_delta_agg_view")
    assert "FullOuter" in p
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashAggregate" in p


def test_kcore_rounds_are_equi_joins_only(spark):
    """k_core: every peel round is a degree hash agg + two node-keyed
    semi-join filters — pin the operator's per-round plan (the query
    returns post-checkpoint frames)."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.io import load_table
    from metar_pipeline_spark.operators.kcore import k_core

    li = load_table(spark, SF_DIR, "lineitem")
    ep = li.select(
        (F.col("l_suppkey") * 2).alias("src"),
        (F.col("l_partkey") * 2 + 1).alias("dst"),
    ).distinct()
    edges = ep.unionByName(
        ep.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    out = k_core(edges, k=3, rounds=1)
    p = plan_str(out)
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashAggregate" in p


def test_ks_cumulative_is_pid_partitioned(plans):
    """ks_two_sample_click_view: the running ECDF totals come from
    distributed_prefix_sum — the only windows in the plan are
    pid-partitioned; the sample sizes ride a broadcast 1-row
    carrier."""
    p = plans("ks_two_sample_click_view")
    for line in p.splitlines():
        if "windowspecdefinition" in line:
            assert "__pid" in line, line
    assert "BroadcastNestedLoopJoin" in p or "BroadcastHashJoin" in p


def test_mannwhitney_cumulative_is_pid_partitioned(plans):
    """mannwhitney_u_click_view: the pooled running counts come from
    distributed_prefix_sum — every window in the plan is
    pid-partitioned (never a value-grain single-task cumulative)."""
    p = plans("mannwhitney_u_click_view")
    for line in p.splitlines():
        if "windowspecdefinition" in line:
            assert "__pid" in line, line
    assert "HashAggregate" in p


def test_cusum_windows_pid_partitioned_and_day_grain(plans):
    """cusum_changepoint_daily: cumulative count and row index both
    ride distributed_prefix_sum over the DAY-grain aggregate; the
    final argmax is a bounded TakeOrderedAndProject."""
    p = plans("cusum_changepoint_daily")
    for line in p.splitlines():
        if "windowspecdefinition" in line:
            assert "__pid" in line, line
    assert "TakeOrderedAndProject" in p


def test_theilsen_pair_join_is_day_grain_broadcast(plans):
    """theilsen_daily_trend: the pairwise-slope join is a broadcast
    nested loop over the CALENDAR-GRAIN daily aggregate (bounded by
    days², never data grain) and the order-statistic selection's
    windows are pid-partitioned."""
    p = plans("theilsen_daily_trend")
    assert "BroadcastNestedLoopJoin" in p
    for line in p.splitlines():
        if "windowspecdefinition" in line:
            assert "__pid" in line, line


def test_spearman_windows_run_over_day_grain_aggregate(plans):
    """spearman_daily_count_value: every rank window runs AFTER the
    (type, day) hash aggregate (calendar-bounded input — the
    ALLOWED_BOUNDED_INPUT justification), and no join degrades to a
    cartesian."""
    p = plans("spearman_daily_count_value")
    assert "HashAggregate" in p
    assert "CartesianProduct" not in p
    # the fact is reduced before any window: scans feed an aggregate,
    # and the window partition keys are the type (+ value) columns
    assert "windowspecdefinition(event_type" in p


def test_ktruss_rounds_are_equi_joins_only(spark):
    """k_truss: triangle enumeration is ordered equi-joins + a hash
    aggregate to edge-support grain — never a cartesian/nested loop
    (the operator is exercised directly; the registered query returns
    post-checkpoint frames with opaque plans)."""
    from pyspark.sql import functions as F

    from metar_pipeline_spark.operators.truss import _support

    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3), (3, 4)], "a int, b int"
    )
    p = plan_str(_support(edges))
    assert "CartesianProduct" not in p
    assert "BroadcastNestedLoopJoin" not in p
    assert "HashAggregate" in p


def test_incremental_lpa_store_only_broadcast_joined(spark):
    # incremental LPA (round-11 VERDICT #4): the maintenance pass never
    # reads the label store at all, and the serving assembly touches it
    # only through a BROADCAST anti-join against the (small) write set
    # — the store is never shuffled or sort-merge-joined. Pins target
    # the operator/assembly directly (the registered query checkpoints,
    # which makes its plan opaque).
    import pyspark.sql.functions as F

    from metar_pipeline_spark.operators.graph import (
        incremental_lpa,
        label_propagation,
    )

    old = spark.createDataFrame(
        [(i, i + 1) for i in range(0, 400, 2)], "id_a long, id_b long"
    )
    delta = spark.createDataFrame([(1, 2), (100, 401)], "id_a long, id_b long")
    all_edges = old.unionByName(delta)

    dz = incremental_lpa(all_edges, delta, iterations=2)
    p = plan_str(dz)
    # ball-membership cuts are broadcast semi-joins; nothing in the
    # maintenance pass shuffles at store grain
    assert "LeftSemi" in p and "BroadcastHashJoin" in p
    assert "SortMergeJoin" not in p and "CartesianProduct" not in p

    store = label_propagation(old, iterations=2).localCheckpoint(
        eager=True
    )
    assembled = store.join(
        F.broadcast(dz.select("node")), "node", "anti"
    ).unionByName(dz)
    ap = plan_str(assembled)
    assert "LeftAnti" in ap and "BroadcastHashJoin" in ap
    assert "SortMergeJoin" not in ap
    # semantics check riding the pin: assembly ≡ full recompute
    full = label_propagation(all_edges, iterations=2)
    assert sorted(map(tuple, assembled.collect())) == sorted(
        map(tuple, full.collect())
    )
