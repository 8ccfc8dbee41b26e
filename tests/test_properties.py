"""Property-based tests (hypothesis) for the algebraic operator
rewrites — the invariants the engine's scale forms rely on:

- salted_agg(keys) ≡ groupBy(keys).agg for ANY data and salt count
  (the skew rewrite must be result-transparent);
- latest_per_key max_by form ≡ ROW_NUMBER form incl. timestamp ties
  (the two W1 physical strategies are interchangeable);
- as-of join ≡ a per-row Python reference (the union+window linear
  formulation equals the quadratic definition);
- exact dedup partitions the corpus (group sizes sum to row count,
  canonical id is the group min);
- strict vs inclusive high-watermark differ exactly by the boundary
  rows (the L1/L2 `>` vs `>=` contract);
- approx_count_distinct is within its rsd bound of the exact count.

Examples are deliberately small (Spark job per example); sizes chosen
to still hit ties, duplicates, empty groups, and boundary collisions.
"""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

from metar_pipeline_spark.operators.incremental import high_watermark_filter
from metar_pipeline_spark.operators.joins import asof_join
from metar_pipeline_spark.operators.skew import salted_agg
from metar_pipeline_spark.operators.windows import (
    latest_per_key_maxby,
    latest_per_key_rn,
)

SETTINGS = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)

# Tiny domains on purpose: collisions (shared keys, tied timestamps,
# duplicate ids) are where these laws can break.
keys = st.integers(min_value=0, max_value=4)
ids = st.integers(min_value=0, max_value=30)
vals = st.integers(min_value=-100, max_value=100)
ts_offsets = st.integers(min_value=0, max_value=5)

rows = st.lists(st.tuples(keys, ids, vals, ts_offsets), min_size=0, max_size=40)

T0 = datetime(2020, 1, 1)


def _df(spark, data):
    return spark.createDataFrame(
        [
            (k, i, float(v), T0 + timedelta(hours=t))
            for (k, i, v, t) in data
        ],
        "key long, id long, value double, ts timestamp",
    )


@given(data=rows, n_salts=st.integers(min_value=1, max_value=5))
@SETTINGS
def test_salted_agg_transparent(spark, data, n_salts):
    df = _df(spark, data)
    plain = {
        (r["key"],): (r["n"], r["s"], r["mx"])
        for r in df.groupBy("key")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("s"),
            F.max("value").alias("mx"),
        )
        .collect()
    }
    salted = {
        (r["key"],): (r["n"], r["s"], r["mx"])
        for r in salted_agg(
            df,
            keys=["key"],
            salt_source="id",
            partials={
                "n": (F.count(F.lit(1)), F.sum("n")),
                "s": (F.sum(F.col("value").cast("decimal(18,2)")), F.sum("s")),
                "mx": (F.max("value"), F.max("mx")),
            },
            n_salts=n_salts,
        ).collect()
    }
    assert plain == salted


@given(data=rows)
@SETTINGS
def test_latest_per_key_forms_agree(spark, data):
    # make (key, ts, id) a total order: dedupe (key, id) pairs
    seen, uniq = set(), []
    for k, i, v, t in data:
        if (k, i) not in seen:
            seen.add((k, i))
            uniq.append((k, i, v, t))
    df = _df(spark, uniq)
    a = latest_per_key_maxby(df, ["key"], "ts", tiebreak="id")
    b = latest_per_key_rn(df, ["key"], [F.desc("ts"), F.desc("id")])
    assert sorted(map(tuple, a.select("key", "id").collect())) == sorted(
        map(tuple, b.select("key", "id").collect())
    )


@given(data=rows, right_data=rows)
@SETTINGS
def test_asof_join_matches_reference(spark, data, right_data):
    left = _df(spark, data).select("key", "id", "ts")
    # dedupe right on (key, ts, id) so the as-of winner is unique
    seen, uniq = set(), []
    for k, i, v, t in right_data:
        if (k, t, i) not in seen:
            seen.add((k, t, i))
            uniq.append((k, i, v, t))
    right = _df(spark, uniq).select(
        "key", F.col("id").alias("rid"), "value", "ts"
    )
    out = asof_join(
        left,
        right,
        left_key="key",
        right_key="key",
        left_ts="ts",
        right_ts="ts",
        payload=["rid", "value"],
        tiebreak="rid",
    )
    got = {
        (r["key"], r["id"], r["ts"]): (r["rid"], r["value"])
        for r in out.collect()
    }
    # quadratic reference: greatest (ts, rid) with right.ts <= left.ts
    rrows = right.collect()
    for lr in left.collect():
        cands = [
            r
            for r in rrows
            if r["key"] == lr["key"] and r["ts"] <= lr["ts"]
        ]
        lk = (lr["key"], lr["id"], lr["ts"])
        if not cands:
            assert lk not in got
        else:
            best = max(cands, key=lambda r: (r["ts"], r["rid"]))
            assert got[lk] == (best["rid"], best["value"])


@given(data=rows)
@SETTINGS
def test_watermark_strict_vs_inclusive_boundary(spark, data):
    df = _df(spark, data)
    target = df.limit(max(1, len(data) // 2))
    if not data:
        return
    wm = target.agg(F.max("ts")).first()[0]
    strict = high_watermark_filter(df, target, "ts", inclusive=False)
    incl = high_watermark_filter(df, target, "ts", inclusive=True)
    s_ids = {tuple(r) for r in strict.select("key", "id", "ts").collect()}
    i_ids = {tuple(r) for r in incl.select("key", "id", "ts").collect()}
    assert s_ids.issubset(i_ids)
    # the difference is exactly the boundary-instant rows
    assert i_ids - s_ids == {
        tuple(r)
        for r in df.filter(F.col("ts") == F.lit(wm))
        .select("key", "id", "ts")
        .collect()
    }


@given(data=rows)
@SETTINGS
def test_exact_dedup_partitions_corpus(spark, data):
    from metar_pipeline_spark.operators.dedup import exact_dedup_groups

    df = _df(spark, data).select(
        "id", F.concat_ws(":", "key", "value").alias("text")
    )
    groups = exact_dedup_groups(df, "id", "text").collect()
    assert sum(r["n_copies"] for r in groups) == df.count()
    # canonical id is the min id of its content group
    by_text = {}
    for r in df.collect():
        by_text.setdefault(r["text"], []).append(r["id"])
    canon = sorted(min(v) for v in by_text.values())
    assert sorted(r["canonical_id"] for r in groups) == canon


def test_approx_count_distinct_within_rsd(spark):
    from metar_pipeline_spark.io import load_table

    events = load_table(spark, "/root/testdata/sf0.001", "events")
    exact = events.select("user_id").distinct().count()
    approx = events.agg(
        F.approx_count_distinct("user_id", rsd=0.05).alias("a")
    ).first()["a"]
    assert abs(approx - exact) <= max(3.0, 4 * 0.05 * exact)


# ---------------------------------------------------------------------------
# Curation invariants
# ---------------------------------------------------------------------------
@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 40),            # doc_id (dups possible → dedup below)
            st.text("ab ", min_size=0, max_size=30),  # text
            st.sampled_from(["s0", "s1"]),  # domain
        ),
        min_size=1,
        max_size=25,
    ),
    window=st.sampled_from([4, 7, 16]),
)
@SETTINGS
def test_packing_conserves_tokens_and_orders_offsets(spark, docs, window):
    """pack_sequences invariants for ANY corpus and window size:
    offsets stay inside the window, pack ids are the floor-div of the
    running token count, and rendering the windows conserves every
    token exactly once (window sizes sum to the domain token count;
    all but each domain's last window are exactly full)."""
    from metar_pipeline_spark.operators.curation import (
        pack_sequences,
        render_packed_windows,
    )

    uniq = {d: (t, s) for d, t, s in docs}
    rows = [(d, t, s) for d, (t, s) in uniq.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")

    packed = pack_sequences(df, window_tokens=window).collect()
    for r in packed:
        assert 0 <= r.offset_in_pack < window

    rendered = render_packed_windows(df, window_tokens=window).collect()
    by_domain_total = {}
    for r in rendered:
        assert 1 <= r.n_tokens <= window
        by_domain_total[r.source] = by_domain_total.get(r.source, 0) + r.n_tokens
    expect_total = {}
    for d, t, s in rows:
        n = len([x for x in t.lower().split() if x])
        expect_total[s] = expect_total.get(s, 0) + n
    assert by_domain_total == {k: v for k, v in expect_total.items() if v}
    # every window except the domain-last is exactly full
    last = {r.source: max(x.window_id for x in rendered if x.source == r.source)
            for r in rendered}
    for r in rendered:
        if r.window_id != last[r.source]:
            assert r.n_tokens == window


@given(
    ids=st.lists(st.integers(0, 1000), min_size=1, max_size=40, unique=True),
    quota=st.integers(1, 10),
)
@SETTINGS
def test_mixture_sample_is_partitioning_invariant(spark, ids, quota):
    """The hash-ranked quota sample returns the identical id set no
    matter how the input is partitioned (the reproducibility contract
    that rand()-based sampling cannot give)."""
    from metar_pipeline_spark.operators.curation import mixture_sample

    rows = [(i, "d0") for i in ids]
    a = spark.createDataFrame(rows, "doc_id long, source string")
    b = spark.createDataFrame(rows, "doc_id long, source string").repartition(7)
    got_a = {r.doc_id for r in mixture_sample(a, F.lit(quota)).collect()}
    got_b = {r.doc_id for r in mixture_sample(b, F.lit(quota)).collect()}
    assert got_a == got_b
    assert len(got_a) == min(quota, len(ids))


@given(
    corpus=st.lists(st.text("abc ", min_size=0, max_size=25),
                    min_size=1, max_size=10),
    eval_set=st.lists(st.text("abc ", min_size=0, max_size=25),
                      min_size=1, max_size=5),
)
@SETTINGS
def test_ngram_overlap_matches_set_reference(spark, corpus, eval_set):
    """decontamination counts equal a brute-force Python set reference
    for ANY corpus/eval texts (distinct bigrams, md5-free ground truth)."""
    from metar_pipeline_spark.operators.curation import ngram_overlap

    def grams(t, n=2):
        toks = [x for x in t.lower().split() if x]
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    eval_grams = set().union(*(grams(t) for t in eval_set)) if eval_set else set()
    cdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(corpus)], "doc_id long, text string"
    )
    edf = spark.createDataFrame(
        [(1000 + i, t) for i, t in enumerate(eval_set)],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_grams, r.n_overlap, r.contaminated)
        for r in ngram_overlap(cdf, edf, n=2).collect()
    }
    for i, t in enumerate(corpus):
        g = grams(t)
        if not g:
            assert i not in got  # gram-less docs have no overlap row
            continue
        n_overlap = len(g & eval_grams)
        assert got[i] == (len(g), n_overlap, n_overlap > 0), (i, t)


@given(
    data=st.lists(
        st.tuples(keys, st.integers(min_value=0, max_value=2), ts_offsets),
        min_size=0,
        max_size=40,
    ),
    split=st.integers(min_value=0, max_value=6),
)
@SETTINGS
def test_scd2_apply_matches_full_rebuild(spark, data, split):
    """scd2_apply(dim(hist), batch) == scd2_from_changes(hist ∪ batch)
    for ANY change log and ANY time split — tied timestamps, repeated
    attribute values, keys living only in one side included."""
    from metar_pipeline_spark.operators.scd import (
        scd2_apply,
        scd2_from_changes,
    )

    rows_ = [
        (k, f"a{a}", T0 + timedelta(hours=t), i)
        for i, (k, a, t) in enumerate(data)
    ]
    df = spark.createDataFrame(
        rows_, "k long, attr string, ts timestamp, tb long"
    )
    cut = T0 + timedelta(hours=split)
    hist = df.filter(F.col("ts") < F.lit(cut))
    batch = df.filter(F.col("ts") >= F.lit(cut))
    dim = scd2_from_changes(hist, "k", "attr", "ts", "tb")
    merged = scd2_apply(dim, batch, "k", "attr", "ts", "tb")
    full = scd2_from_changes(df, "k", "attr", "ts", "tb")
    # None-safe sort key: open intervals carry valid_to=NULL, and when
    # two rows tie on every earlier field Python's tuple sort would
    # compare None against a datetime and throw (hypothesis found the
    # duplicate-change-row case) — rank Nones explicitly instead.
    def canon(df_):
        return sorted(
            (tuple((v is None, v) for v in t) for t in map(tuple, df_.collect()))
        )

    assert canon(merged) == canon(full)


@given(data=rows)
@SETTINGS
def test_ewma_fold_matches_reference_recurrence(spark, data):
    """The JVM aggregate fold computes exactly the textbook EWMA
    recurrence e_i = a*v_i + (1-a)*e_{i-1} over time-ordered values."""
    df = _df(spark, data)
    grouped = df.groupBy("key").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("ts", "id", "value"))),
            lambda s: s["value"],
        ).alias("vals")
    )
    ewma = F.aggregate(
        F.expr("slice(vals, 2, greatest(size(vals) - 1, 0))"),
        F.element_at(F.col("vals"), 1),
        lambda acc, x: F.lit(0.2) * x + F.lit(0.8) * acc,
    )
    got = {
        r.key: r.e
        for r in grouped.select("key", ewma.alias("e")).collect()
        if r.e is not None
    }
    # reference: python recurrence over the same (ts, id) order
    from collections import defaultdict

    series = defaultdict(list)
    for k, i, v, t in data:
        series[k].append((T0 + timedelta(hours=t), i, float(v)))
    for k, rows_ in series.items():
        e = None
        for _, _, v in sorted(rows_):
            e = v if e is None else 0.2 * v + 0.8 * e
        assert abs(got[k] - e) < 1e-9, k


@given(data=rows)
@SETTINGS
def test_cohort_matrix_conserves_user_days(spark, data):
    """Every distinct (user, active-day) lands in exactly one
    (cohort_day, day_offset) cell; offsets are never negative and the
    zero-offset diagonal counts every cohort's full population."""
    df = _df(spark, data)
    days = df.select("key", F.to_date("ts").alias("active_day"))
    first = days.groupBy("key").agg(F.min("active_day").alias("cohort_day"))
    active = days.distinct()
    cells = (
        active.join(first, "key")
        .groupBy(
            "cohort_day",
            F.datediff("active_day", "cohort_day").cast("int").alias("off"),
        )
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    )
    assert all(r.off >= 0 for r in cells)
    assert sum(r.n for r in cells) == active.count()
    zero = {r.cohort_day: r.n for r in cells if r.off == 0}
    pops = {
        r.cohort_day: r.n
        for r in first.groupBy("cohort_day").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert zero == pops  # day-0 retention is definitionally 100%


# ---------------------------------------------------------------------------
# Round-5 operator laws
# ---------------------------------------------------------------------------

small_rows = st.lists(
    st.tuples(keys, st.sampled_from(["a", "b", "c"]), ts_offsets),
    min_size=0,
    max_size=24,
)


@given(data=small_rows)
@SETTINGS
def test_funnel_monotone_and_order_free(spark, data):
    """Funnel law: step counts never increase down the funnel, and the
    result is invariant to input row order (the collect_list arrays
    are order-insensitive through array_min/filter)."""
    from metar_pipeline_spark.operators.funnel import funnel_user_steps

    rows = [
        (k, t, datetime(2024, 1, 1) + timedelta(hours=off))
        for k, t, off in data
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp"
    ) if rows else spark.createDataFrame(
        [], "user_id bigint, event_type string, ts timestamp"
    )
    steps = ["a", "b", "c"]
    out = funnel_user_steps(df, steps).collect()
    counts = [
        sum(1 for r in out if r[f"step{i}_ts"] is not None)
        for i in range(3)
    ]
    assert counts[0] >= counts[1] >= counts[2]
    for r in out:  # chain timestamps are non-decreasing while present
        ts = [r["step0_ts"], r["step1_ts"], r["step2_ts"]]
        present = [t for t in ts if t is not None]
        assert present == sorted(present)
    rev = funnel_user_steps(
        spark.createDataFrame(
            list(reversed(rows)),
            "user_id bigint, event_type string, ts timestamp",
        )
        if rows
        else df,
        steps,
    ).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, rev))


@given(data=rows, mask=st.lists(st.booleans(), min_size=40, max_size=40))
@SETTINGS
def test_rollup_merge_split_invariance(spark, data, mask):
    """Additive-rollup law: merging the partials of ANY 2-way split
    equals the full-recompute rollup exactly (DECIMAL partials)."""
    from metar_pipeline_spark.operators.incremental import (
        merge_partial_rollups,
    )

    rows_v = [(k, i % 3, float(v)) for (k, i, v, _) in data]
    df = spark.createDataFrame(rows_v, "k int, d int, v double") if rows_v else None
    if df is None:
        return

    def partial(x):
        return x.groupBy("k", "d").agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("v").cast("decimal(18,2)")).alias("s"),
        )

    full = {tuple(r[:2]): tuple(r[2:]) for r in partial(df).collect()}
    m = [mask[i % len(mask)] for i in range(len(rows_v))]
    a = [r for r, keep in zip(rows_v, m) if keep]
    b = [r for r, keep in zip(rows_v, m) if not keep]
    parts = []
    for chunk in (a, b):
        if chunk:
            parts.append(
                partial(spark.createDataFrame(chunk, "k int, d int, v double"))
            )
    merged = {
        tuple(r[:2]): tuple(r[2:])
        for r in merge_partial_rollups(parts, ["k", "d"], ["n", "s"]).collect()
    }
    assert merged == full


@given(data=st.lists(st.tuples(keys, keys), min_size=0, max_size=20))
@SETTINGS
def test_triangle_census_orientation_invariant(spark, data):
    """Triangle law: the census is invariant to edge orientation and
    duplication (canonicalization owns both)."""
    from metar_pipeline_spark.operators.graph import triangle_census

    edges = [(a, b) for a, b in data if a != b]
    if not edges:
        return
    df1 = spark.createDataFrame(edges, "id_a int, id_b int")
    flipped = [(b, a) for a, b in edges] + edges  # reversed + doubled
    df2 = spark.createDataFrame(flipped, "id_a int, id_b int")
    r1 = triangle_census(df1).collect()[0]
    r2 = triangle_census(df2).collect()[0]
    assert tuple(r1) == tuple(r2)


@given(
    data=st.lists(
        st.tuples(ids, st.integers(1, 5), st.sampled_from("IUD"), vals),
        min_size=0,
        max_size=24,
    )
)
@SETTINGS
def test_cdc_replay_idempotent(spark, data):
    """CDC law: applying a feed twice (doubled rows) gives the same
    state as applying it once — the D>U>I tie-break makes at-least-
    once delivery converge."""
    from metar_pipeline_spark.sources.cdc import apply_changelog

    if not data:
        return
    schema = "k int, seq int, op string, v int"
    once = {
        tuple(r)
        for r in apply_changelog(
            spark.createDataFrame(data, schema), ["k"]
        ).collect()
    }
    twice = {
        tuple(r)
        for r in apply_changelog(
            spark.createDataFrame(data + data, schema), ["k"]
        ).collect()
    }
    assert once == twice


@given(
    docs=st.lists(
        st.tuples(
            st.integers(0, 30),
            st.text("xy ", min_size=0, max_size=40),
        ),
        min_size=1,
        max_size=15,
    ),
    chunk=st.sampled_from([3, 5, 8]),
    overlap=st.integers(0, 2),
)
@SETTINGS
def test_chunking_covers_tokens_with_exact_overlap(spark, docs, chunk, overlap):
    """chunk_documents invariants for ANY corpus: every doc yields >= 1
    chunk; chunk k starts at token k*stride (so consecutive chunks
    share exactly `overlap` tokens while both are full); sizes are
    chunk_tokens except possibly the last; chunk ids are dense from 0;
    and total coverage equals n_tokens + overlap*(n_chunks-1)."""
    from metar_pipeline_spark.operators.curation import chunk_documents

    uniq = {d: t for d, t in docs}
    rows = [(d, t) for d, t in uniq.items()]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_documents(df, chunk, overlap).collect()

    stride = chunk - overlap
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == {d for d, _ in rows}  # no doc disappears
    for d, t in rows:
        toks = [x for x in t.lower().split() if x]
        n = len(toks)
        chunks = sorted(by_doc[d], key=lambda r: r.chunk_id)
        assert [c.chunk_id for c in chunks] == list(range(len(chunks)))
        import math

        expect_chunks = max(1, math.ceil(max(n - overlap, 0) / stride)) if n else 1
        assert len(chunks) == expect_chunks
        for k, c in enumerate(chunks):
            want = toks[k * stride : k * stride + chunk]
            assert c.n_tokens == len(want)


# ---------------------------------------------------------------------------
# Round-6 operators: record linkage & SemDeDup laws
# ---------------------------------------------------------------------------

_link_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=20),        # id (dedup below)
        st.sampled_from(["a b", "a c", "b c", "d e"]),  # name
        st.sampled_from(["B1", "B2"]),                  # block
        st.sampled_from(["T1", "T2"]),                  # type
        st.integers(min_value=0, max_value=6),          # size
    ),
    min_size=0,
    max_size=14,
)


@SETTINGS
@given(_link_rows)
def test_record_linkage_laws(spark, data):
    """For ANY record set: (1) pairs are canonical (id_a < id_b) and
    unique; (2) scores stay within [min_score, max possible weight];
    (3) every pair shares a block; (4) identical-on-all-fields records
    in one block always link at max score."""
    from metar_pipeline_spark.operators.linkage import record_linkage_pairs

    uniq = {}
    for (i, n, b, t, sz) in data:
        uniq[i] = (i, n, b, t, sz)
    recs = list(uniq.values())
    df = spark.createDataFrame(
        recs or [(0, "x y", "B1", "T1", 0)],
        "pid bigint, name string, brand string, typ string, size int",
    )
    if not recs:
        df = df.limit(0)
    out = record_linkage_pairs(
        df, "pid", ["brand"], "name",
        name_weight=4.0, exact_cols=[("typ", 2.0)],
        numeric_cols=[("size", 1.0, 1.0)],
        min_score=4.0,
    ).collect()
    seen = set()
    by_id = {r[0]: r for r in recs}
    for row in out:
        assert row["id_a"] < row["id_b"]
        key = (row["id_a"], row["id_b"])
        assert key not in seen
        seen.add(key)
        assert 4.0 <= row["score"] <= 7.0
        assert by_id[row["id_a"]][2] == by_id[row["id_b"]][2]  # same block
    # completeness: identical records must link at the ceiling
    for a in recs:
        for b in recs:
            if a[0] < b[0] and a[1:] == b[1:]:
                assert (a[0], b[0]) in seen
                row = next(r for r in out if (r["id_a"], r["id_b"]) == (a[0], b[0]))
                assert row["score"] == 7.0


_vec_rows = st.lists(
    st.tuples(
        st.integers(min_value=2, max_value=25),
        st.sampled_from([(1.0, 0.0), (0.0, 1.0), (1.0, 0.1), (0.1, 1.0)]),
    ),
    min_size=0,
    max_size=10,
)


@SETTINGS
@given(_vec_rows)
def test_semdedup_verdict_laws(spark, data):
    """For ANY vector set over the 2-centroid plane: exactly one row
    per vector, every cell's drops are justified by a kept-order
    predecessor, and per cell at least one vector survives (a
    non-empty near-dup neighborhood can never drop ALL its members —
    its minimal element has no predecessor)."""
    from metar_pipeline_spark.operators import similarity as sim

    uniq = {}
    for (i, v) in data:
        uniq[i] = v
    rows = [(0, [1.0, 0.0]), (1, [0.0, 1.0])] + [
        (i, [x, y]) for i, (x, y) in uniq.items()
    ]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
    out = sim.semdedup_verdicts(
        df, "vec_id", "embedding", n_centroids=2, threshold=0.999
    ).collect()
    assert len(out) == len(rows)
    cells = {}
    for r in out:
        cells.setdefault(r["cid"], []).append(r)
    for members in cells.values():
        assert any(m["is_kept"] for m in members)


# ---------------------------------------------------------------------------
# ranking laws: distributed_rank ≡ global row_number; ntile_from_rank ≡ NTILE
# ---------------------------------------------------------------------------
@SETTINGS
@given(data=rows, nparts=st.integers(min_value=1, max_value=6))
def test_distributed_rank_law_matches_row_number(spark, data, nparts):
    """For ANY frame (ties, duplicates, empty) and ANY partition count,
    distributed_rank over (value, ts, id) equals the unpartitioned
    row_number — the law that let every converted query keep its
    oracle."""
    from pyspark.sql import Window

    from metar_pipeline_spark.operators.ranking import distributed_rank

    df = _df(spark, data)
    # make the order total: id alone may repeat in the generated data,
    # so dedupe to one row per id (the operators' call sites always
    # rank frames with a unique tiebreak)
    df = df.groupBy("id").agg(
        F.max("value").alias("value"), F.max("ts").alias("ts")
    )
    order = [F.asc("value"), F.desc("ts"), F.asc("id")]
    want = sorted(
        (r.id, r.rank)
        for r in df.withColumn(
            "rank",
            F.row_number().over(Window.orderBy(*order)).cast("long"),
        ).collect()
    )
    got = sorted(
        (r.id, r.rank)
        for r in distributed_rank(
            df, order, num_partitions=nparts
        ).collect()
    )
    assert got == want


@SETTINGS
@given(
    n=st.integers(min_value=0, max_value=40),
    k=st.integers(min_value=1, max_value=12),
)
def test_ntile_from_rank_law(spark, n, k):
    """Closed-form ntile equals the window NTILE for every (n, k) —
    including n < k, n = 0, and non-divisible sizes."""
    from pyspark.sql import Window

    from metar_pipeline_spark.operators.ranking import ntile_from_rank

    if n == 0:
        return
    df = spark.range(1, n + 1).withColumnRenamed("id", "r")
    want = sorted(
        (r.r, r.b)
        for r in df.withColumn(
            "b", F.ntile(k).over(Window.orderBy("r"))
        ).collect()
    )
    got = sorted(
        (r.r, r.b)
        for r in df.withColumn(
            "b", ntile_from_rank(F.col("r"), F.lit(n).cast("long"), k)
        ).collect()
    )
    assert got == want


# --- Z-set IVM laws (round 10) -----------------------------------------

# A changelog is a list of (op, group, value): op 0=insert into old
# state (applied before the batch), 1=batch insert, 2=batch delete of
# a present row, 3=batch update (+delta) of a present row. Hypothesis
# drives arbitrary interleavings; the law is old ⊕ Δ ≡ recompute(new).
_ivm_groups = st.integers(min_value=0, max_value=3)
_ivm_vals = st.integers(min_value=-50, max_value=50)
_ivm_rows = st.lists(
    st.tuples(_ivm_groups, _ivm_vals), min_size=0, max_size=25
)


@given(old=_ivm_rows, ins=_ivm_rows, mutate_mask=st.integers(0, 2**25 - 1))
@SETTINGS
def test_ivm_agg_delta_law(spark, old, ins, mutate_mask):
    """apply_agg_delta(view(old), zset_weighted_agg(Δ)) equals the
    grouped aggregate of the mutated state, for ARBITRARY old states
    and batches of inserts + deletes + updates (bit i of mutate_mask
    deletes old row i; bit i+1 updates it by +7)."""
    from metar_pipeline_spark.operators.ivm import (
        apply_agg_delta,
        zset_weighted_agg,
    )

    deletes, updates, kept = [], [], []
    for i, r in enumerate(old):
        if (mutate_mask >> (i % 24)) & 1 and i % 2 == 0:
            deletes.append(r)
        elif (mutate_mask >> ((i + 1) % 24)) & 1:
            updates.append(r)
            kept.append((r[0], r[1] + 7))
        else:
            kept.append(r)
    new_state = kept + ins

    schema = "g long, v long"
    old_df = spark.createDataFrame(old, schema) if old else (
        spark.createDataFrame([], schema)
    )
    dz_rows = (
        [(g, v, 1) for g, v in ins]
        + [(g, v, -1) for g, v in deletes]
        + [(g, v, -1) for g, v in updates]
        + [(g, v + 7, 1) for g, v in updates]
    )
    zschema = "g long, v long, _w int"
    dz = spark.createDataFrame(dz_rows, zschema) if dz_rows else (
        spark.createDataFrame([], zschema)
    )
    view = old_df.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("v").alias("total"),
    )
    got = apply_agg_delta(
        view, zset_weighted_agg(dz, ["g"], sums={"total": F.col("v")}),
        ["g"], ["total"],
    )
    want_df = (
        spark.createDataFrame(new_state, schema)
        if new_state
        else spark.createDataFrame([], schema)
    ).groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("v").alias("total"),
    )
    assert sorted(
        (r.g, r._n, r.total) for r in got.collect()
    ) == sorted((r.g, r._n, r.total) for r in want_df.collect())


@given(old=_ivm_rows, ins=_ivm_rows)
@SETTINGS
def test_ivm_delta_merge_is_batch_order_free(spark, old, ins):
    """Applying one batch as TWO arbitrary sub-batches (split by row
    parity) in sequence equals applying it whole — the property the
    streaming fold relies on (a consistent changelog nets count and
    sum to zero together, so intermediate net-zero drops lose
    nothing)."""
    from metar_pipeline_spark.operators.ivm import (
        apply_agg_delta,
        zset_weighted_agg,
    )

    schema = "g long, v long"
    zschema = "g long, v long, _w int"

    def z(rows):
        return (
            spark.createDataFrame(rows, zschema)
            if rows
            else spark.createDataFrame([], zschema)
        )

    view = (
        spark.createDataFrame(old, schema)
        if old
        else spark.createDataFrame([], schema)
    ).groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("v").alias("total"),
    )
    batch = [(g, v, 1) for g, v in ins] + [(g, v, -1) for g, v in old]
    whole = apply_agg_delta(
        view,
        zset_weighted_agg(z(batch), ["g"], sums={"total": F.col("v")}),
        ["g"], ["total"],
    )
    s1 = [r for i, r in enumerate(batch) if i % 2 == 0]
    s2 = [r for i, r in enumerate(batch) if i % 2 == 1]
    step = view
    for sub in (s1, s2):
        step = apply_agg_delta(
            step,
            zset_weighted_agg(z(sub), ["g"], sums={"total": F.col("v")}),
            ["g"], ["total"],
        )
    assert sorted(
        (r.g, r._n, r.total) for r in whole.collect()
    ) == sorted((r.g, r._n, r.total) for r in step.collect())


# --- round 11: IVM extreme/top-k maintenance laws ----------------------

# A CDC scenario over a keyed integer base: per row id, op in
# {keep, delete, update(+delta)}; inserted rows get fresh ids. The law
# under test: maintained view (algebra + rescan fallback) ≡ recompute
# over the post-batch base — for ANY combination of retractions hitting
# or missing the stored extremes / top-k members.
cdc_base = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),   # group
        st.integers(min_value=-50, max_value=50),  # value
        st.sampled_from(["keep", "del", "upd"]),
    ),
    min_size=0,
    max_size=30,
)
cdc_inserts = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),
        st.integers(min_value=-50, max_value=50),
    ),
    min_size=0,
    max_size=10,
)


def _cdc_frames(spark, base, inserts):
    """(view_input, dz, base_new) frames for the scenario; row ids are
    positional so updates retract the exact stored row."""
    old_rows = [(g, i, v) for i, (g, v, _) in enumerate(base)]
    new_rows = [
        (g, i, v + 7 if op == "upd" else v)
        for i, (g, v, op) in enumerate(base)
        if op != "del"
    ] + [(g, 1000 + j, v) for j, (g, v) in enumerate(inserts)]
    dz_rows = []
    for i, (g, v, op) in enumerate(base):
        if op == "del":
            dz_rows.append((g, i, v, -1))
        elif op == "upd":
            dz_rows.append((g, i, v, -1))
            dz_rows.append((g, i, v + 7, 1))
    for j, (g, v) in enumerate(inserts):
        dz_rows.append((g, 1000 + j, v, 1))
    schema_b = "g long, id long, v long"
    old = spark.createDataFrame(old_rows, schema_b) if old_rows else (
        spark.range(0).select(
            F.col("id").alias("g"), F.col("id"), F.col("id").alias("v")
        )
    )
    new = spark.createDataFrame(new_rows, schema_b) if new_rows else (
        spark.range(0).select(
            F.col("id").alias("g"), F.col("id"), F.col("id").alias("v")
        )
    )
    dz = spark.createDataFrame(
        dz_rows, "g long, id long, v long, _w int"
    ) if dz_rows else spark.range(0).select(
        F.col("id").alias("g"), F.col("id"),
        F.col("id").alias("v"), F.lit(1).alias("_w"),
    )
    return old, new, dz


@given(base=cdc_base, inserts=cdc_inserts)
@SETTINGS
def test_minmax_delta_law(spark, base, inserts):
    """apply_minmax_delta ≡ full recompute for ANY CDC batch."""
    from metar_pipeline_spark.operators.ivm import apply_minmax_delta

    old, new, dz = _cdc_frames(spark, base, inserts)
    view = old.groupBy("g").agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.min("v").alias("min_v"),
        F.max("v").alias("max_v"),
    )
    got = sorted(
        (r.g, r._n, r.min_v, r.max_v)
        for r in apply_minmax_delta(
            view, dz, new.select("g", "v"), ["g"], "v"
        ).collect()
    )
    want = sorted(
        (r.g, r._n, r.min_v, r.max_v)
        for r in new.groupBy("g")
        .agg(
            F.count(F.lit(1)).cast("long").alias("_n"),
            F.min("v").alias("min_v"),
            F.max("v").alias("max_v"),
        )
        .collect()
    )
    assert got == want


@given(base=cdc_base, inserts=cdc_inserts,
       k=st.integers(min_value=1, max_value=4))
@SETTINGS
def test_topk_delta_law(spark, base, inserts, k):
    """apply_topk_delta ≡ full recompute top-k for ANY CDC batch and k
    (including ties broken by id and k larger than the group)."""
    from metar_pipeline_spark.operators.ivm import apply_topk_delta
    from metar_pipeline_spark.operators.ranking import grouped_topk

    old, new, dz = _cdc_frames(spark, base, inserts)
    order = [F.desc("v"), F.asc("id")]
    salt = F.pmod(F.col("id"), F.lit(8))
    view = grouped_topk(old, ["g"], order, k, salt=salt).drop("rank")
    got = sorted(
        (r.g, r.id, r.v, r.rank)
        for r in apply_topk_delta(
            view, dz, new, ["g"], "id", "v", k
        ).collect()
    )
    want = sorted(
        (r.g, r.id, r.v, r.rank)
        for r in grouped_topk(new, ["g"], order, k, salt=salt).collect()
    )
    assert got == want
