"""Markov removal-effect attribution (operators/markov.py): hand-chain
semantics pins plus an independent numpy recomputation of the full
registered query — the numpy path builds journeys with pandas and runs
the absorption as plain matrix algebra, independent of both engines'
SQL formulations.
"""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from metar_pipeline_spark.operators.markov import (
    absorb_power,
    journey_transitions,
    removal_variant_probs,
)
from metar_pipeline_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"
SPECS = all_queries()


def _events(spark, rows):
    return spark.createDataFrame(
        [
            (i, dt.datetime(2024, 1, 1, 0, 0, i), u, t, None, None)
            for i, (u, t) in enumerate(rows)
        ],
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    )


def test_journey_transitions_hand_chain(spark):
    """User 1 converts mid-stream (post-purchase events dropped);
    user 2 never converts (explicit -> NULL)."""
    rows = [
        (1, "view"), (1, "click"), (1, "purchase"), (1, "view"),
        (2, "view"), (2, "signup"),
    ]
    got = {
        (r.src, r.dst): r.c
        for r in journey_transitions(_events(spark, rows)).collect()
        # bounded-collect: hand chain
    }
    assert got == {
        ("START", "view"): 2,
        ("view", "click"): 1,
        ("click", "purchase"): 1,
        ("view", "signup"): 1,
        ("signup", "NULL"): 1,
    }


def test_removal_redirects_mass_and_absorbs(spark):
    """Removing 'click' from START->view->click->purchase redirects
    view's outgoing mass to NULL, so conversion drops to zero; the
    full chain absorbs fully by step 3 (mass conservation)."""
    rows = [(1, "view"), (1, "click"), (1, "purchase")]
    tcnt = journey_transitions(_events(spark, rows))
    tp = removal_variant_probs(tcnt, ["view", "click"])
    out = absorb_power(tp, 3).collect()  # bounded-collect: state grain
    conv = {
        r.variant: r.val for r in out if r.state == "purchase"
    }
    assert conv["full"] == pytest.approx(1.0, abs=1e-9)
    assert conv.get("click", 0.0) == pytest.approx(0.0, abs=1e-9)
    for variant in ("full", "view", "click"):
        mass = sum(r.val for r in out if r.variant == variant)
        assert mass == pytest.approx(1.0, abs=1e-9), variant


def test_markov_query_matches_numpy(spark):
    ev = pd.read_parquet(f"{SF_DIR}/events.parquet").sort_values(
        ["user_id", "ts", "event_id"]
    )
    states = ["START", "view", "click", "signup", "error",
              "purchase", "NULL"]
    idx = {s: i for i, s in enumerate(states)}
    counts = np.zeros((7, 7))
    for _, g in ev.groupby("user_id"):
        types = list(g.event_type)
        if "purchase" in types:
            types = types[: types.index("purchase") + 1]
        path = ["START"] + types + (
            [] if types[-1] == "purchase" else ["NULL"]
        )
        for a, b in zip(path, path[1:]):
            counts[idx[a], idx[b]] += 1

    def p_conv(removed):
        c = counts.copy()
        if removed is not None:
            r = idx[removed]
            c[:, idx["NULL"]] += c[:, r]
            c[:, r] = 0
            c[r, :] = 0
        t = np.zeros((7, 7))
        totals = c.sum(axis=1)
        for i in range(7):
            if totals[i]:
                t[i] = c[i] / totals[i]
        t[idx["purchase"], idx["purchase"]] = 1.0
        t[idx["NULL"], idx["NULL"]] = 1.0
        v = np.zeros(7)
        v[idx["START"]] = 1.0
        for _ in range(8):
            v = v @ t
        return v[idx["purchase"]]

    pfull = p_conv(None)
    effects = {
        ch: 1 - p_conv(ch) / pfull
        for ch in ("view", "click", "signup", "error")
    }
    tot = sum(round(e, 6) for e in effects.values())
    got = {
        r.channel: r
        for r in SPECS["markov_attribution_removal"]
        .spark_fn(spark, SF_DIR)
        .collect()  # bounded-collect: 4 channels
    }
    assert set(got) == set(effects)
    for ch, eff in effects.items():
        r = got[ch]
        assert r.p_conv_full == pytest.approx(pfull, abs=1e-5)
        assert r.removal_effect == pytest.approx(eff, abs=1e-5)
        assert r.attribution_share == pytest.approx(
            round(eff, 6) / tot, abs=1e-5
        )


def test_journey_transitions_rejects_absorber_named_states(spark):
    """Round-11 ADVICE: an observed event type literally named START or
    NULL would silently merge with the injected absorber states — the
    guard must fire on the first action, pre-injection (downstream the
    injected rows are indistinguishable from observed ones)."""
    for bad in ("START", "NULL"):
        rows = [(1, "view"), (1, bad), (1, "purchase")]
        with pytest.raises(Exception, match="collides with an injected"):
            journey_transitions(_events(spark, rows)).collect()
