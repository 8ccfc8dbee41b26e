"""Markov-chain attribution with removal effects.

The principled upgrade of position-based attribution
(linear_attribution_revenue splits credit by touch count): model the
user journey as a first-order Markov chain over channel states, then
credit each channel by its REMOVAL EFFECT — how much the conversion
probability drops when the channel is deleted from the chain and its
incoming mass redirected to the null absorber (Anderl et al. 2014,
"Mapping the customer journey"). A channel that merely appears often
but never moves users toward conversion earns ~0 here, where linear
attribution overpays it.

Scale shape, in three strictly-shrinking grains:
1. JOURNEY pass (the only corpus-width work): two windows partitioned
   by user_id (row_number + lead — data grain, fully parallel), one
   hash aggregate to (src, dst) transition-count grain.
2. VARIANT expansion: transition COUNTS (exact integers) cross-joined
   with the ~5-row variant frame, redirect-and-reaggregate — integer
   arithmetic, so the redirected mass is exact.
3. ABSORPTION power iteration: |variants| x |states| (~35 rows) per
   step, each step one broadcast equi-join + a DECIMAL(38,18) matvec
   aggregate rounded to 12 decimals (the pagerank determinism
   recipe); the chain is linear so it stays lazy (see absorb_power).
   Nothing after step 1 ever touches the fact again.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

START = "START"
NULL_STATE = "NULL"


def journey_transitions(
    events: DataFrame,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    order_cols: tuple[str, ...] = ("ts", "event_id"),
) -> DataFrame:
    """(src, dst, c): first-order transition counts over per-user
    journeys CUT at the first conversion event (inclusive — the
    conversion state absorbs; nothing after it counts). Non-converting
    journeys end with an explicit transition to ``NULL``; every
    journey starts with ``START`` -> first touch. Total order inside a
    user: (ts, event_id) — deterministic under ties.
    """
    w = Window.partitionBy(user_col).orderBy(*[F.asc(c) for c in order_cols])
    # Observed-state guard (round-11 ADVICE): an event type literally
    # named 'START' or 'NULL' would silently merge with the absorber
    # states this function INJECTS below, corrupting transition mass.
    # This is the only place the collision is detectable — downstream
    # (removal_variant_probs) the injected rows are indistinguishable
    # from observed ones, so its 'full' guard cannot be extended here.
    # (convert_type needs no guard: an observed type equal to it IS the
    # conversion by definition.) One codegen'd equality pair per row.
    guarded_type = (
        F.when(
            F.col(type_col).isin(START, NULL_STATE),
            F.raise_error(
                F.concat(
                    F.lit(
                        "observed event type collides with an injected "
                        "absorber state: "
                    ),
                    F.col(type_col),
                )
            ).cast("string"),
        )
        .otherwise(F.col(type_col))
        .alias(type_col)
    )
    seq = events.select(
        user_col, guarded_type, F.row_number().over(w).alias("rn")
    )
    firstp = (
        seq.filter(F.col(type_col) == convert_type)
        .groupBy(user_col)
        .agg(F.min("rn").alias("prn"))
    )
    j = seq.join(firstp, user_col, "left").filter(
        F.col("prn").isNull() | (F.col("rn") <= F.col("prn"))
    )
    jw = Window.partitionBy(user_col).orderBy("rn")
    j2 = j.select(
        user_col,
        type_col,
        "rn",
        F.lead(type_col).over(jw).alias("nxt"),
    )
    trans = (
        j2.filter(F.col("rn") == 1)
        .select(
            F.lit(START).alias("src"), F.col(type_col).alias("dst")
        )
        .unionAll(
            j2.filter(F.col(type_col) != convert_type).select(
                F.col(type_col).alias("src"),
                F.coalesce(F.col("nxt"), F.lit(NULL_STATE)).alias("dst"),
            )
        )
    )
    return trans.groupBy("src", "dst").agg(
        F.count(F.lit(1)).alias("c")
    )


def removal_variant_probs(
    tcnt: DataFrame,
    channels: list[str],
    convert_type: str = "purchase",
) -> DataFrame:
    """(variant, src, dst, p): the transition-probability matrix of
    the full chain plus one removal variant per channel (channel rows
    dropped, mass INTO the channel redirected to ``NULL`` — all in
    exact integer counts, so re-aggregation cannot drift), with
    explicit self-loops on the two absorbers.

    ``tcnt`` is localCheckpoint-pinned here: it is the post-corpus
    REDUCED frame (~|states|² rows) and feeds two branches (tv -> tot
    and tv -> probs) — unpinned, every branch re-ran the whole journey
    pass (measured 17 s -> 0.2 s at sf0.1). The literal variant/
    absorber frames are built JVM-side (range + explode(array(lit)))
    — spark.createDataFrame ships the rows through a Python worker on
    EVERY evaluation (~5 s per literal frame per action in local
    mode)."""
    spark = tcnt.sparkSession
    reserved = {"full", START, NULL_STATE, convert_type}
    bad = reserved.intersection(channels)
    if bad:
        # 'full' is the baseline variant label and START/NULL/convert
        # are absorber states: a channel carrying one of these names
        # would make the baseline variant drop that state's rows (the
        # src != variant filter below), silently corrupting every
        # removal effect (round-10 ADVICE).
        raise ValueError(f"channel names collide with reserved labels: {sorted(bad)}")
    # Observed-state guard, ENGINE-side (no driver materialization): an
    # observed state literally named 'full' would corrupt the baseline
    # variant, so the state columns carry a raise_error branch — the
    # first action over a colliding frame fails loudly instead of
    # silently dropping rows.
    def _guarded(c: str):
        return (
            F.when(
                F.col(c) == F.lit("full"),
                F.raise_error(
                    F.lit(
                        "observed state collides with reserved label 'full'"
                    )
                ).cast("string"),
            )
            .otherwise(F.col(c))
            .alias(c)
        )

    tcnt = tcnt.select(_guarded("src"), _guarded("dst"), "c")
    tcnt = tcnt.localCheckpoint(eager=True)
    variants = spark.range(1).select(
        F.explode(
            F.array(*[F.lit(v) for v in ["full", *channels]])
        ).alias("variant")
    )
    tv = (
        tcnt.crossJoin(F.broadcast(variants))
        .filter(F.col("src") != F.col("variant"))
        .select(
            "variant",
            "src",
            F.when(F.col("dst") == F.col("variant"), F.lit(NULL_STATE))
            .otherwise(F.col("dst"))
            .alias("dst"),
            "c",
        )
        .groupBy("variant", "src", "dst")
        .agg(F.sum("c").alias("c"))
    )
    # tot is derived FROM tv — rename its keys so the join does not
    # trip the ambiguous-self-join analyzer.
    tot = tv.groupBy(
        F.col("variant").alias("__tvar"), F.col("src").alias("__tsrc")
    ).agg(F.sum("c").alias("tot"))
    probs = tv.join(
        tot,
        (F.col("variant") == F.col("__tvar"))
        & (F.col("src") == F.col("__tsrc")),
    ).select(
        "variant",
        "src",
        "dst",
        (F.col("c").cast("double") / F.col("tot").cast("double")).alias(
            "p"
        ),
    )
    absorbers = spark.range(1).select(
        F.explode(
            F.array(F.lit(convert_type), F.lit(NULL_STATE))
        ).alias("state")
    )
    loops = variants.crossJoin(absorbers).select(
        "variant",
        F.col("state").alias("src"),
        F.col("state").alias("dst"),
        F.lit(1.0).alias("p"),
    )
    return probs.unionByName(loops)


def absorb_power(tp: DataFrame, steps: int) -> DataFrame:
    """(variant, state, val): mass distribution after ``steps``
    transitions from START, per variant. Each step is one broadcast
    equi-join + a DECIMAL(38,18) matvec aggregate rounded to 12
    decimals (bit-equal on any engine / partitioning). The transition
    frame is checkpointed ONCE (cuts lineage and pins the ~45-row
    frame for the 8 broadcast builds); the step chain itself stays
    LAZY — it is linear (each v feeds exactly one consumer), so a
    single downstream action evaluates it once. Measured: the lazy
    8-step chain over a checkpointed frame runs in ~0.6 s; per-step
    eager checkpoints and a pivoted pure-projection form were both
    10-30x worse (job overhead / py4j + analysis cost). Callers that
    consume the result more than once should checkpoint the RETURNED
    frame."""
    tpin = tp.localCheckpoint(eager=True)
    # Renamed join-side columns: v is re-derived from tj every step, so
    # unrenamed frames would trip the ambiguous-self-join analyzer.
    tj = tpin.select(
        F.col("variant").alias("__tv"),
        F.col("src").alias("__ts"),
        "dst",
        "p",
    )
    v = (
        tpin.select("variant")
        .distinct()
        .select(
            "variant",
            F.lit(START).alias("state"),
            F.lit(1.0).alias("val"),
        )
    )
    for _ in range(steps):
        v = (
            v.join(
                F.broadcast(tj),
                (F.col("variant") == F.col("__tv"))
                & (F.col("state") == F.col("__ts")),
            )
            .groupBy(
                F.col("__tv").alias("variant"),
                F.col("dst").alias("state"),
            )
            .agg(
                F.round(
                    F.sum(
                        (F.col("val") * F.col("p")).cast(
                            "decimal(38,18)"
                        )
                    ).cast("double"),
                    12,
                ).alias("val")
            )
        )
    return v
