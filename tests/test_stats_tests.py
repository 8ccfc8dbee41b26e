"""Independent numerical verification of the classical-statistics
queries: each statistic is recomputed from the raw parquet with
numpy's textbook formulation (average ranks, explicit pairwise
slopes, explicit CUSUM path) and compared to the registered query's
output — independent of BOTH engines' SQL formulations, so an
identical-but-wrong algebraic identity in Spark + oracle cannot pass.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from metar_pipeline_spark.queries import all_queries

SF_DIR = "/root/testdata/sf0.001"

SPECS = all_queries()


@pytest.fixture(scope="module")
def events_pd():
    return pd.read_parquet(f"{SF_DIR}/events.parquet")


def _avg_ranks(v):
    v = np.asarray(v, dtype=float)
    order = v.argsort(kind="stable")
    sv = v[order]
    r = np.empty(len(v))
    i = 0
    while i < len(sv):
        j = i
        while j + 1 < len(sv) and sv[j + 1] == sv[i]:
            j += 1
        r[i : j + 1] = (i + 1 + j + 1) / 2
        i = j + 1
    out = np.empty(len(v))
    out[order] = r
    return out


def test_mannwhitney_matches_numpy(spark, events_pd):
    df = events_pd[events_pd.event_type.isin(["click", "view"])]
    df = df[df.value.notna()]
    x = df[df.event_type == "click"].value.to_numpy()
    y = df[df.event_type == "view"].value.to_numpy()
    ranks = _avg_ranks(np.concatenate([x, y]))
    n1, n2 = len(x), len(y)
    u1 = ranks[:n1].sum() - n1 * (n1 + 1) / 2
    _, counts = np.unique(np.concatenate([x, y]), return_counts=True)
    big_n = n1 + n2
    sigma = np.sqrt(
        n1 * n2 / 12
        * ((big_n + 1) - (counts**3 - counts).sum() / (big_n * (big_n - 1)))
    )
    z = (u1 - n1 * n2 / 2) / sigma
    row = (
        SPECS["mannwhitney_u_click_view"]
        .spark_fn(spark, SF_DIR)
        .collect()[0]  # bounded-collect: 1-row statistic
    )
    assert row.n1 == n1 and row.n2 == n2
    assert row.u1 == pytest.approx(u1, abs=1e-6)
    assert row.u2 == pytest.approx(n1 * n2 - u1, abs=1e-6)
    assert row.z_score == pytest.approx(z, abs=1e-5)


def test_cusum_matches_numpy(spark, events_pd):
    daily = (
        events_pd.assign(day=events_pd.ts.dt.floor("D"))
        .groupby("day")
        .size()
        .sort_index()
    )
    x = daily.to_numpy(dtype=float)
    s = np.cumsum(x) - np.arange(1, len(x) + 1) * x.mean()
    k = int(np.abs(s).argmax())  # numpy argmax: first max = earliest day
    row = (
        SPECS["cusum_changepoint_daily"]
        .spark_fn(spark, SF_DIR)
        .collect()[0]  # bounded-collect: LIMIT 1
    )
    assert row.n_days == len(x)
    assert str(row.day) == str(daily.index[k].date())
    assert row.cusum_abs == pytest.approx(abs(s[k]), abs=1e-5)


def test_theilsen_matches_numpy(spark, events_pd):
    daily = (
        events_pd.assign(day=events_pd.ts.dt.floor("D"))
        .groupby("day")
        .size()
        .sort_index()
    )
    d = np.array([t.toordinal() for t in daily.index.date])
    y = daily.to_numpy(dtype=float)
    slopes = sorted(
        (y[j] - y[i]) / (d[j] - d[i])
        for i in range(len(y))
        for j in range(i + 1, len(y))
    )
    m = len(slopes)
    med = (slopes[(m + 1) // 2 - 1] + slopes[(m + 2) // 2 - 1]) / 2
    row = (
        SPECS["theilsen_daily_trend"]
        .spark_fn(spark, SF_DIR)
        .collect()[0]  # bounded-collect: 1-row statistic
    )
    assert row.n_days == len(y) and row.n_pairs == m
    assert row.slope_per_day == pytest.approx(med, abs=1e-6)


def test_spearman_matches_numpy(spark, events_pd):
    df = events_pd[events_pd.value.notna()].assign(
        day=events_pd.ts.dt.floor("D")
    )
    got = {
        r.event_type: (r.n_days, r.spearman_rho)
        for r in SPECS["spearman_daily_count_value"]
        .spark_fn(spark, SF_DIR)
        .collect()  # bounded-collect: one row per event type
    }
    for et, g in df.groupby("event_type"):
        daily = g.groupby("day").agg(x=("value", "size"), y=("value", "mean"))
        rx = _avg_ranks(daily.x.to_numpy())
        ry = _avg_ranks(daily.y.to_numpy())
        rho = np.corrcoef(rx, ry)[0, 1]
        n_days, got_rho = got[et]
        assert n_days == len(daily)
        assert got_rho == pytest.approx(rho, abs=1e-5), et


def test_k_anonymity_audit_matches_pandas(spark):
    cust = pd.read_parquet(f"{SF_DIR}/customer.parquet")
    sizes = cust.groupby(["c_nationkey", "c_mktsegment"]).size()
    hist = sizes.value_counts().sort_index()
    got = {
        r.cls_size: (r.n_classes, r.n_rows, r.below_k)
        for r in SPECS["k_anonymity_audit"]
        .spark_fn(spark, SF_DIR)
        .collect()  # bounded-collect: class-size histogram grain
    }
    assert set(got) == set(hist.index)
    for size, n_classes in hist.items():
        assert got[size] == (n_classes, size * n_classes, size < 5)


def test_l_diversity_audit_matches_pandas(spark, events_pd):
    df = events_pd.assign(day=events_pd.ts.dt.floor("D"))
    nd = df.groupby(["event_type", "day"]).user_id.nunique()
    got = {
        r.event_type: r
        for r in SPECS["l_diversity_audit"]
        .spark_fn(spark, SF_DIR)
        .collect()  # bounded-collect: one row per event type
    }
    for et, g in nd.groupby(level=0):
        r = got[et]
        below = int((g < 3).sum())
        assert r.n_classes == len(g)
        assert r.min_distinct == int(g.min())
        assert r.classes_below_l == below
        assert r.frac_below_l == pytest.approx(below / len(g), abs=1e-6)


def test_ktruss_hand_graph(spark):
    """K5 + a pendant triangle + a chain edge: the 4-truss is exactly
    K5 (every K5 edge closes 3 triangles; the pendant triangle's edges
    close only 1 and peel in round one; the chain edge closes none),
    and the peel has converged by round 2 (rounds=2 == rounds=3)."""
    from itertools import combinations

    from metar_pipeline_spark.operators.truss import k_truss

    k5 = list(combinations(range(1, 6), 2))
    g = k5 + [(5, 6), (5, 7), (6, 7), (7, 8)]
    edges = spark.createDataFrame(g, "a int, b int")
    out = sorted(
        (r.a, r.b, r.support)
        for r in k_truss(edges, k=4, rounds=2).collect()
        # bounded-collect: hand graph
    )
    assert out == [(a, b, 3) for a, b in k5]
    out3 = sorted(
        (r.a, r.b, r.support)
        for r in k_truss(edges, k=4, rounds=3).collect()
        # bounded-collect: hand graph
    )
    assert out3 == out


def test_vocab_coverage_curve_matches_pandas(spark):
    docs = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    from collections import Counter

    cnt = Counter()
    for t in docs.text:
        cnt.update(w for w in t.lower().split() if w)
    total = sum(cnt.values())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    got = {
        r.n_top: (r.covered_tokens, r.total_tokens, r.coverage)
        for r in SPECS["vocab_coverage_curve"]
        .spark_fn(spark, SF_DIR)
        .collect()  # bounded-collect: <=5 curve points
    }
    for n_top, row in got.items():
        covered = sum(f for _, f in ranked[:n_top])
        assert row == (
            covered,
            total,
            pytest.approx(covered / total, abs=1e-6),
        ), n_top


def test_embedding_mislabel_candidates_matches_numpy(spark):
    emb = pd.read_parquet(f"{SF_DIR}/embeddings.parquet")
    x = np.stack(emb.embedding.to_numpy()).astype(np.float64)
    labels = emb.label.to_numpy()
    cents = np.stack(
        [x[labels == l].mean(axis=0) for l in sorted(set(labels))]
    )
    lab_ids = sorted(set(labels))
    cos = (x @ cents.T) / (
        np.linalg.norm(x, axis=1)[:, None]
        * np.linalg.norm(cents, axis=1)[None, :]
    )
    best = cos.argmax(axis=1)  # ties -> lowest index = lowest label
    exp = {}
    for i, vid in enumerate(emb.vec_id.to_numpy()):
        bl = lab_ids[best[i]]
        if bl != labels[i]:
            own_idx = lab_ids.index(labels[i])
            exp[vid] = (labels[i], bl, cos[i, own_idx], cos[i, best[i]])
    got = {
        r.vec_id: (r.label, r.best_label, r.own_cos, r.best_cos)
        for r in SPECS["embedding_mislabel_candidates"]
        .spark_fn(spark, SF_DIR)
        .collect()  # bounded-collect: mislabel shortlist
    }
    assert set(got) == set(exp)
    for vid, (lab, bl, oc, bc) in exp.items():
        g = got[vid]
        assert g[0] == lab and g[1] == bl, vid
        assert g[2] == pytest.approx(oc, abs=1e-5)
        assert g[3] == pytest.approx(bc, abs=1e-5)


def test_fm_sketch_set_ops_matches_numpy(spark, events_pd):
    """Replicate the m-mins hash rows + LEAST merge in numpy and
    compare every estimate column exactly (the hash is fixed integer
    arithmetic, so the replication is bit-exact up to the final
    rounds); also sanity-bound the estimator error at ~4/sqrt(m)."""
    from metar_pipeline_spark.operators.sketches import (
        _CMS_P,
        fm_constants,
    )

    df = events_pd.assign(day=events_pd.ts.dt.floor("D"))
    # explicit datetime cast: string isin on datetime64 is deprecated
    # (a future pandas would silently match nothing)
    days = pd.to_datetime(["2024-01-05", "2024-01-06"])
    df = df[df.day.isin(days)]
    uid = df.user_id.to_numpy().astype(object)  # python ints: no overflow
    is_a = (df.day == days[0]).to_numpy()
    m = 64

    def side_mins(mask):
        keys = uid[mask]
        mins = []
        for i in range(m):
            a1, b1, a2 = fm_constants(i)
            h1 = (keys * a1 + b1) % _CMS_P
            h = (h1 * h1 + h1 * a2) % _CMS_P
            mins.append(min(int(x) / _CMS_P for x in h))
        return mins

    ma, mb = side_mins(is_a), side_mins(~is_a)

    def est(mins):
        s = mins[0]
        for v in mins[1:]:
            s = s + v
        return m / s - 1.0

    ea, eb = est(ma), est(mb)
    eu = est([min(a, b) for a, b in zip(ma, mb)])
    row = (
        SPECS["fm_sketch_set_ops"].spark_fn(spark, SF_DIR).collect()[0]
    )  # bounded-collect: 1-row sketch summary
    assert row.na_est == pytest.approx(round(ea, 2), abs=1e-9)
    assert row.nb_est == pytest.approx(round(eb, 2), abs=1e-9)
    assert row.nu_est == pytest.approx(round(eu, 2), abs=1e-9)
    assert row.ni_est == pytest.approx(round(ea + eb - eu, 2), abs=1e-9)
    # estimator quality: union error within ~4 sigma of 1/sqrt(m)
    assert abs(row.nu_est - row.nu_exact) <= max(
        4 * row.nu_exact / (m**0.5), 10
    )
    assert row.ni_exact == row.na_exact + row.nb_exact - row.nu_exact


def test_rfm_segment_census_matches_pandas(spark, events_pd):
    df = events_pd.assign(day=events_pd.ts.dt.floor("D"))
    anchor = df.day.max()
    u = df.groupby("user_id").agg(
        last_day=("day", "max"),
        freq=("day", "size"),
        monetary=("value", lambda v: v.dropna().sum()),
    )
    u["r_days"] = (anchor - u.last_day).dt.days
    n = len(u)

    def ntile(order_key, k=5):
        ranked = sorted(u.index, key=order_key)
        q, m = divmod(n, k)
        out = {}
        pos = 0
        for b in range(1, k + 1):
            size = q + (1 if b <= m else 0)
            for uid in ranked[pos : pos + size]:
                out[uid] = b
            pos += size
        return out

    rq = ntile(lambda i: (u.r_days[i], i))
    fq = ntile(lambda i: (-u.freq[i], i))
    mq = ntile(lambda i: (-u.monetary[i], i))
    exp = {}
    for uid in u.index:
        key = (rq[uid], fq[uid], mq[uid])
        cnt, tot = exp.get(key, (0, 0.0))
        exp[key] = (cnt + 1, tot + u.monetary[uid])
    got = {
        (r.r_q, r.f_q, r.m_q): (r.n_users, r.avg_monetary)
        for r in SPECS["rfm_segment_census"]
        .spark_fn(spark, SF_DIR)
        .collect()  # bounded-collect: <=125 segments
    }
    assert set(got) == set(exp)
    for key, (cnt, tot) in exp.items():
        assert got[key][0] == cnt
        assert got[key][1] == pytest.approx(tot / cnt, abs=1e-4), key


def test_forecast_backtest_matches_pandas(spark, events_pd):
    daily = (
        events_pd.assign(day=events_pd.ts.dt.floor("D"))
        .groupby("day")
        .size()
        .sort_index()
        .astype(float)
    )
    y = daily.to_numpy()
    days = daily.index
    max_day = days.max()
    exp = {}
    for method, pred in (
        ("naive", lambda i: y[i - 1]),
        ("seasonal_naive", lambda i: y[i - 7]),
        ("ma3", lambda i: (y[i - 1] + y[i - 2] + y[i - 3]) / 3.0),
    ):
        errs = [
            y[i] - pred(i)
            for i in range(len(y))
            if i + 1 > 7 and days[i] > max_day - pd.Timedelta(days=14)
        ]
        mae = sum(abs(e) for e in errs) / len(errs)
        rmse = (sum(e * e for e in errs) / len(errs)) ** 0.5
        exp[method] = (len(errs), mae, rmse)
    got = {
        r.method: (r.n_eval, r.mae, r.rmse)
        for r in SPECS["forecast_baseline_backtest"]
        .spark_fn(spark, SF_DIR)
        .collect()  # bounded-collect: 3 methods
    }
    assert set(got) == set(exp)
    for m, (n_e, mae, rmse) in exp.items():
        assert got[m][0] == n_e
        assert got[m][1] == pytest.approx(mae, abs=1e-6)
        assert got[m][2] == pytest.approx(rmse, abs=1e-6)


def test_km_conversion_survival_matches_numpy(spark, events_pd):
    """Textbook Kaplan-Meier recomputation (sorted event times,
    at-risk counts, running product) from raw parquet — independent
    of both engines' recursive-CTE formulation."""
    df = events_pd.assign(day=events_pd.ts.dt.floor("D"))
    max_day = df.day.max()
    obs = []
    for _, g in df.groupby("user_id"):
        first = g.day.min()
        conv = g.loc[g.event_type == "purchase", "day"].min()
        if pd.isna(conv):
            obs.append(((max_day - first).days, 0))
        else:
            obs.append(((conv - first).days, 1))
    exp = {}
    s = 1.0
    n_risk = len(obs)
    for dur in sorted({d for d, _ in obs}):
        d_i = sum(1 for d, e in obs if d == dur and e == 1)
        leaving = sum(1 for d, _ in obs if d == dur)
        if d_i > 0:
            s = s * (1.0 - d_i / n_risk)
            exp[dur] = (n_risk, d_i, s)
        n_risk -= leaving
    got = {
        r.duration_days: (r.n_risk, r.n_events, r.survival)
        for r in SPECS["km_conversion_survival"]
        .spark_fn(spark, SF_DIR)
        .collect()  # bounded-collect: duration-grain life table
    }
    assert set(got) == set(exp)
    for dur, (n_r, d_i, s_v) in exp.items():
        g = got[dur]
        assert g[0] == n_r and g[1] == d_i, dur
        assert g[2] == pytest.approx(s_v, abs=1e-6), dur
    # survival is non-increasing and within (0, 1]
    vals = [got[d][2] for d in sorted(got)]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    # S hits exactly 0 when the final at-risk set all converts (no
    # censoring at the smallest scale factor) — 0 is legitimate.
    assert 0 <= vals[-1] <= 1


def test_brr_mean_ci_matches_numpy(spark, events_pd):
    """Replicate the 32 hash half-samples in numpy exactly, plus a
    calibration bound: the BRR standard error must sit near the
    textbook sigma/sqrt(n)."""
    from metar_pipeline_spark.operators.sketches import (
        _CMS_P,
        fm_constants,
    )

    df = events_pd[events_pd.value.notna()]
    ids = df.event_id.to_numpy().astype(object)
    vals = df.value.to_numpy()
    n = len(vals)
    mean = float(
        pd.Series(vals).astype("float64").sum() / n
    )  # matches DECIMAL-exact to <1e-9 at this scale
    reps = []
    for i in range(32):
        a1, b1, a2 = fm_constants(i)
        h1 = (ids * a1 + b1) % _CMS_P
        h = (h1 * h1 + h1 * a2) % _CMS_P
        pick = np.array([int(x) / _CMS_P < 0.5 for x in h])
        reps.append(vals[pick].sum() / pick.sum())
    dev = 0.0
    for r in reps:
        dev = dev + (r - mean) * (r - mean)
    se = (dev / 32.0) ** 0.5
    row = (
        SPECS["brr_mean_ci_value"].spark_fn(spark, SF_DIR).collect()[0]
    )  # bounded-collect: 1-row statistic
    assert row.n == n
    assert row.mean == pytest.approx(mean, abs=1e-6)
    assert row.se == pytest.approx(se, abs=1e-5)
    assert row.ci_lo == pytest.approx(mean - 1.959963984540054 * se, abs=1e-4)
    # calibration: BRR se within 3x of sigma/sqrt(n) (chi-square
    # spread of 32 replicates)
    sigma = vals.std(ddof=1)
    assert se < 3 * sigma / n**0.5 and se > sigma / (3 * n**0.5)


def _write_events(tmp_path, rows):
    """Write a synthetic events.parquet the query fns can read."""
    df = pd.DataFrame(
        rows,
        columns=["event_id", "ts", "user_id", "event_type", "value"],
    )
    df["props"] = None
    df.to_parquet(tmp_path / "events.parquet", index=False)
    return str(tmp_path)


def test_mannwhitney_invariant_under_monotone_transform(
    spark, tmp_path
):
    """U and z are RANK statistics: any strictly-increasing transform
    of value must leave them unchanged — the defining property a
    parametric (mean-based) test would fail."""
    import datetime as dt

    base = dt.datetime(2024, 1, 1)
    rows, rows_t = [], []
    vals = [3.0, 1.5, 9.0, 2.5, 7.0, 7.0, 0.5, 4.0, 8.0, 6.5,
            2.0, 5.5, 1.0, 9.5, 3.5, 6.0]
    for i, v in enumerate(vals):
        et = "click" if i % 2 == 0 else "view"
        rows.append((i, base + dt.timedelta(minutes=i), i % 4, et, v))
        rows_t.append(
            (i, base + dt.timedelta(minutes=i), i % 4, et,
             float(np.exp(v / 3.0)))  # strictly increasing
        )
    (tmp_path / "a").mkdir()
    (tmp_path / "b").mkdir()
    d1 = _write_events(tmp_path / "a", rows)
    d2 = _write_events(tmp_path / "b", rows_t)
    q = SPECS["mannwhitney_u_click_view"].spark_fn
    r1 = q(spark, d1).collect()[0]  # bounded-collect: 1-row statistic
    r2 = q(spark, d2).collect()[0]  # bounded-collect: 1-row statistic
    assert (r1.u1, r1.u2, r1.z_score) == (r2.u1, r2.u2, r2.z_score)
    assert (r1.n1, r1.n2) == (r2.n1, r2.n2)


def test_cusum_detects_planted_level_shift(spark, tmp_path):
    """A series with a clear level shift must put the argmax-|S| day
    exactly at the last day of the low regime."""
    import datetime as dt

    rows = []
    eid = 0
    for day in range(20):
        # 5 events/day for days 0-9, 50/day for days 10-19
        n = 5 if day < 10 else 50
        for k in range(n):
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 1, 1 + day, 0, 0, k % 60, eid % 59),
                    eid % 7,
                    "view",
                    1.0,
                )
            )
            eid += 1
    (tmp_path / "c").mkdir()
    d = _write_events(tmp_path / "c", rows)
    row = SPECS["cusum_changepoint_daily"].spark_fn(spark, d).collect()[
        0
    ]  # bounded-collect: LIMIT 1
    assert str(row.day) == "2024-01-10"
    assert row.n_days == 20


def test_theilsen_exact_on_noiseless_trend(spark, tmp_path):
    """On a perfectly linear daily series every pairwise slope equals
    the true slope, so the median IS the slope — and one wild outlier
    day must not move it (the 29% breakdown property, in miniature)."""
    import datetime as dt

    rows = []
    eid = 0
    for day in range(12):
        n = 10 + 3 * day  # slope 3/day
        if day == 6:
            n = 200  # outlier day
        for k in range(n):
            rows.append(
                (
                    eid,
                    dt.datetime(2024, 2, 1 + day, 1, 0, k % 60, eid % 53),
                    eid % 5,
                    "view",
                    1.0,
                )
            )
            eid += 1
    (tmp_path / "d").mkdir()
    d = _write_events(tmp_path / "d", rows)
    row = SPECS["theilsen_daily_trend"].spark_fn(spark, d).collect()[
        0
    ]  # bounded-collect: 1-row statistic
    assert row.slope_per_day == pytest.approx(3.0, abs=0.26)


def test_ab_test_proportions_matches_numpy(spark, events_pd):
    a = events_pd[events_pd.user_id % 2 == 0]
    b = events_pd[events_pd.user_id % 2 == 1]
    n0, c0 = len(a), int((a.event_type == "purchase").sum())
    n1, c1 = len(b), int((b.event_type == "purchase").sum())
    pool = (c0 + c1) / (n0 + n1)
    z = (c0 / n0 - c1 / n1) / (
        pool * (1 - pool) * (1 / n0 + 1 / n1)
    ) ** 0.5
    row = (
        SPECS["ab_test_proportions"].spark_fn(spark, SF_DIR).collect()[0]
    )  # bounded-collect: 1-row statistic
    assert (row.n_a, row.conv_a, row.n_b, row.conv_b) == (n0, c0, n1, c1)
    assert row.rate_a == pytest.approx(c0 / n0, abs=1e-6)
    assert row.rate_b == pytest.approx(c1 / n1, abs=1e-6)
    assert row.z_score == pytest.approx(z, abs=1e-5)


def test_cohort_ltv_curve_matches_pandas(spark, events_pd):
    df = events_pd.assign(day=events_pd.ts.dt.floor("D"))
    d0 = df.groupby("user_id").day.min().rename("d0")
    j = df.join(d0, on="user_id")
    j["cohort"] = j.d0.dt.to_period("W").dt.start_time
    j["age"] = (j.day - j.d0).dt.days
    sizes = d0.dt.to_period("W").dt.start_time.value_counts()
    got = {
        (str(r.cohort), r.age_days): (r.n_users, r.ltv_per_user)
        for r in SPECS["cohort_ltv_curve"]
        .spark_fn(spark, SF_DIR)
        .collect()  # bounded-collect: cohorts x 5 ages
    }
    jr = j[j.value.notna()]
    for (cohort, age), (n_users, ltv) in got.items():
        cdt = pd.Timestamp(cohort)
        assert n_users == sizes[cdt], (cohort, age)
        cum = jr[(jr.cohort == cdt) & (jr.age <= age)].value.sum()
        assert ltv == pytest.approx(cum / n_users, abs=1e-4), (cohort, age)
    # ltv is non-decreasing in age within every cohort
    for cohort in {c for c, _ in got}:
        ages = sorted(a for c, a in got if c == cohort)
        vals = [got[(cohort, a)][1] for a in ages]
        assert all(x <= y + 1e-9 for x, y in zip(vals, vals[1:]))


def test_did_value_uplift_matches_pandas(spark, events_pd):
    df = events_pd[events_pd.value.notna()].assign(
        day=events_pd.ts.dt.floor("D")
    )
    df["grp"] = df.user_id % 2
    df["post"] = (df.day >= "2024-01-16").astype(int)
    m = df.groupby(["grp", "post"]).value.mean()
    did = (m[1, 1] - m[1, 0]) - (m[0, 1] - m[0, 0])
    row = (
        SPECS["did_value_uplift"].spark_fn(spark, SF_DIR).collect()[0]
    )  # bounded-collect: 1-row design summary
    assert row.n_total == len(df)
    assert row.a_pre == pytest.approx(m[0, 0], abs=1e-5)
    assert row.b_post == pytest.approx(m[1, 1], abs=1e-5)
    assert row.did_estimate == pytest.approx(did, abs=1e-5)


def test_equidepth_histogram_matches_pandas(spark, events_pd):
    v = events_pd[events_pd.value.notna()].sort_values(
        ["value", "event_id"]
    )
    n = len(v)
    q, m = divmod(n, 10)
    got = {
        r.bin: (r.n_rows, r.lo, r.hi)
        for r in SPECS["equidepth_histogram_value"]
        .spark_fn(spark, SF_DIR)
        .collect()  # bounded-collect: 10 bins
    }
    pos = 0
    for b in range(1, 11):
        size = q + (1 if b <= m else 0)
        chunk = v.value.iloc[pos : pos + size]
        assert got[b][0] == size
        assert got[b][1] == pytest.approx(chunk.min(), abs=1e-6)
        assert got[b][2] == pytest.approx(chunk.max(), abs=1e-6)
        pos += size
    # equi-depth contract: bin sizes differ by at most 1, boundaries
    # are non-decreasing across bins
    sizes = [got[b][0] for b in range(1, 11)]
    assert max(sizes) - min(sizes) <= 1
    his = [got[b][2] for b in range(1, 11)]
    assert all(x <= y + 1e-9 for x, y in zip(his, his[1:]))


def test_langid_agreement_matrix_consistent_with_text_lang_id(spark):
    """The matrix must be exactly the census of text_lang_id's rows
    (shared scorer), with per-claimed shares summing to 1."""
    from collections import Counter

    per_doc = (
        SPECS["text_lang_id"].spark_fn(spark, SF_DIR).collect()
    )  # bounded-collect: sf0.001 docs
    exp = Counter((r.claimed_lang, r.predicted_lang) for r in per_doc)
    rows = (
        SPECS["langid_agreement_matrix"].spark_fn(spark, SF_DIR).collect()
    )  # bounded-collect: lang-pair grain
    got = {(r.claimed_lang, r.predicted_lang): r.n_docs for r in rows}
    assert got == dict(exp)
    by_claimed = {}
    for r in rows:
        by_claimed.setdefault(r.claimed_lang, 0.0)
        by_claimed[r.claimed_lang] += r.share_of_claimed
        assert r.is_match == (r.claimed_lang == r.predicted_lang)
    for cl, s in by_claimed.items():
        assert s == pytest.approx(1.0, abs=1e-4), cl


def test_eb_shrunk_rates_matches_pandas(spark, events_pd):
    u = events_pd.groupby("user_id").agg(
        n=("event_type", "size"),
        conv=("event_type", lambda s: int((s == "purchase").sum())),
    )
    p0 = u.conv.sum() / u.n.sum()
    got = {
        r.user_id: r
        for r in SPECS["eb_shrunk_conversion_rates"]
        .spark_fn(spark, SF_DIR)
        .collect()  # bounded-collect: user grain at sf0.001
    }
    assert set(got) == set(u.index)
    for uid, row in u.iterrows():
        g = got[uid]
        assert (g.n, g.conv) == (row.n, row.conv)
        assert g.raw_rate == pytest.approx(row.conv / row.n, abs=1e-6)
        assert g.shrunk_rate == pytest.approx(
            (row.conv + 20 * p0) / (row.n + 20), abs=1e-6
        )
        # shrinkage contract: shrunk sits strictly between raw and
        # prior (or equals both when raw == prior)
        lo, hi = sorted((row.conv / row.n, p0))
        assert lo - 1e-9 <= g.shrunk_rate <= hi + 1e-9
