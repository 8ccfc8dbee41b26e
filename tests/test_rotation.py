"""Verification-window rotation: the driver checks only the FIRST 50
registry entries, so ordering is a correctness-process contract —
never-green queries must lead, and a driver-green query whose source or
oracle drifted from the verified snapshot must auto-boost back into the
window (the gate would otherwise never re-check a rotated-out query)."""

from __future__ import annotations

import metar_pipeline_spark.queries as q


def test_never_green_queries_fit_in_window():
    names = list(q.all_queries())
    green = q._driver_green()
    never = [n for n in names if n not in green]
    assert len(never) <= 50, "never-green set no longer fits the gate window"
    left_out = [n for n in never if n not in names[:50]]
    assert not left_out, (
        f"never-green query rotated OUT of the first-50 window: {left_out}"
    )


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
