"""Verification-window rotation: the driver checks only the FIRST 50
registry entries, so ordering is a correctness-process contract —
never-green queries must lead, and a driver-green query whose source or
oracle drifted from the verified snapshot must auto-boost back into the
window (the gate would otherwise never re-check a rotated-out query)."""

from __future__ import annotations

import metar_pipeline_spark.queries as q


def test_window_is_saturated_with_pending_queries():
    """The gate verifies the FIRST 50 registry entries. Invariant: no
    window slot may be wasted — while pending (never-green) queries
    exist beyond the window, every window slot must hold a pending or
    manually-boosted query, and the overflow must stay small enough to
    clear in one following round (the registry grows ~15-20/round
    against a 50/round gate)."""
    names = list(q.all_queries())
    green = q._driver_green()
    never = [n for n in names if n not in green]
    window = names[:50]
    left_out = [n for n in never if n not in window]
    manifest = q._green_hashes()
    specs = q.all_queries()
    if left_out:
        # oversubscribed: every slot must then be spent on pending work
        # (a manual boost is NOT an excuse — see the stale-boost test)
        wasted = [
            n for n in window
            if n in green and manifest.get(n) == q._query_hash(specs[n])
            and n not in q.VERIFY_FIRST
        ]
        assert not wasted, f"window slot wasted on stable-green: {wasted}"
    # Tight bound: the registry grows ≤ a handful of queries per round
    # against a 50/round gate, so pending work must clear within ONE
    # following gate round. (Round 4's breadth push temporarily relaxed
    # this to 60; ratcheted back down once the round-5 window covered
    # the whole backlog.)
    assert len(left_out) <= 10, (
        f"{len(left_out)} pending queries overflow the window — "
        f"verification debt must clear in one gate round: {left_out}"
    )


def test_no_stale_manual_boost():
    """A VERIFY_FIRST name that is simultaneously driver-green AND
    hash-stable (source unchanged since its green verdict) has no
    business being boosted — it would crowd a never-green query out of
    the 50-slot window. This is the loophole that let rounds 3 and 4
    each ship a stale boost list."""
    specs = q.all_queries()
    green = q._driver_green()
    manifest = q._green_hashes()
    stale = [
        n for n in q.VERIFY_FIRST
        if n in green and manifest.get(n) == q._query_hash(specs[n])
    ]
    assert not stale, f"stale VERIFY_FIRST entries (green + unchanged): {stale}"


def test_verify_first_names_exist():
    names = set(q.all_queries())
    assert not [n for n in q.VERIFY_FIRST if n not in names]


def test_query_hash_tracks_oracle_and_source():
    specs = q.all_queries()
    name = next(iter(specs))
    spec = specs[name]
    h0 = q._query_hash(spec)
    assert h0 == q._query_hash(spec)  # deterministic
    tampered = q.QuerySpec(spec.name, spec.spark_fn, (spec.oracle or "") + " -- x")
    assert q._query_hash(tampered) != h0


def test_drifted_green_query_autoboosts(monkeypatch):
    """Tamper one green query's manifest hash → it must move ahead of
    every unchanged green query (into the auto-boost group)."""
    specs = q.all_queries()
    green = q._driver_green()
    manifest = q._green_hashes()
    victims = [
        n for n in specs
        if n in green and n not in q.VERIFY_FIRST and n in manifest
    ]
    assert victims, "no green manifest entries — run tools/update_green_hashes.py"
    victim = victims[-1]

    bad = dict(manifest)
    bad[victim] = "0" * 64
    monkeypatch.setattr(q, "_green_hashes", lambda: bad)
    names = list(q.all_queries())
    unchanged_green = [
        n for n in names
        if n in green and n != victim and n not in q.VERIFY_FIRST
        and manifest.get(n) == q._query_hash(specs[n])
    ]
    assert unchanged_green
    assert names.index(victim) < min(names.index(n) for n in unchanged_green)


def test_query_hash_excludes_universal_io_dep():
    """io.py (load_table) is referenced by essentially every query, so
    hashing it one-hop floods the drift set on any shared-path edit and
    priority-2 degenerates to registration order (round-13 verdict #8).
    An io.py edit must NOT drift a query hash — shared-path regressions
    are caught by the full-registry oracle suite instead. An operator-
    module edit must still drift (covered by the tamper tests below)."""
    from pathlib import Path

    specs = q.all_queries()
    # a plain tpch-style query whose only engine dep is load_table
    spec = specs["dwh_daily_metrics"]
    h0 = q._query_hash(spec)
    io_path = Path(q.__file__).resolve().parents[1] / "io.py"
    original = io_path.read_bytes()
    try:
        io_path.write_bytes(original + b"\n# tamper\n")
        assert q._query_hash(spec) == h0, (
            "io.py edit drifted a query hash — _UNIVERSAL_DEPS exclusion broken"
        )
    finally:
        io_path.write_bytes(original)


def test_query_hash_covers_function_local_imports():
    """udtf_token_chunks imports its UDTF class inside the function
    body; a change to functions/udtf_fns.py must still drift the hash
    (the co_names walk only sees module-level globals)."""
    import inspect
    from pathlib import Path

    spec = q.all_queries()["udtf_token_chunks"]
    src = inspect.getsource(spec.spark_fn)
    assert "from metar_pipeline_spark.functions.udtf_fns import" in src
    h0 = q._query_hash(spec)
    # tampering the locally-imported module's file must change the hash
    mod_path = Path(q.__file__).resolve().parents[1] / "functions" / "udtf_fns.py"
    original = mod_path.read_bytes()
    try:
        mod_path.write_bytes(original + b"\n# tamper\n")
        assert q._query_hash(spec) != h0
    finally:
        mod_path.write_bytes(original)


def test_query_hash_covers_paren_form_local_imports():
    """`from metar_pipeline_spark.operators.scd import (\n scd2_apply,
    ...)` — the multi-line parenthesized form the old regex matcher
    skipped entirely (round-5 advice). The ast-based scan must hash the
    module, so an operators/scd.py edit drifts scd2_incremental_apply."""
    import inspect
    from pathlib import Path

    spec = q.all_queries()["scd2_incremental_apply"]
    src = inspect.getsource(spec.spark_fn)
    assert "from metar_pipeline_spark.operators.scd import (" in src
    h0 = q._query_hash(spec)
    mod_path = Path(q.__file__).resolve().parents[1] / "operators" / "scd.py"
    original = mod_path.read_bytes()
    try:
        mod_path.write_bytes(original + b"\n# tamper\n")
        assert q._query_hash(spec) != h0
    finally:
        mod_path.write_bytes(original)


def test_query_hash_covers_package_form_local_imports():
    """`from metar_pipeline_spark.operators import textops as tx`
    resolves the import target to the PACKAGE; the hash must probe each
    imported name as a submodule, or textops.py edits silently escape
    the auto-boost (round-5 review finding)."""
    import inspect
    from pathlib import Path

    spec = q.all_queries()["quality_quantile_filter"]
    src = inspect.getsource(spec.spark_fn)
    assert "from metar_pipeline_spark.operators import" in src
    h0 = q._query_hash(spec)
    mod_path = (
        Path(q.__file__).resolve().parents[1] / "operators" / "textops.py"
    )
    original = mod_path.read_bytes()
    try:
        mod_path.write_bytes(original + b"\n# tamper\n")
        assert q._query_hash(spec) != h0
    finally:
        mod_path.write_bytes(original)
