"""Snapshot the source hash of every driver-green query.

Run at ROUND START, before any edit: green_hashes.json then records the
exact source the external gate just verified, and any later edit to a
green query (or a module it references) auto-boosts it back into the
verification window (see queries/__init__.py:_query_hash).

Usage: python tools/update_green_hashes.py [--keep-drifted NAME ...]

--keep-drifted: names whose CURRENT source must NOT be blessed as
verified — their latest green verdict predates a restructure the driver
never re-checked (round-13 lesson: the r13 window missed ~51 edited
queries; snapshotting them at round start would have hidden the debt).
Excluded names keep (or lose) their old manifest entry, so they stay
hash-drifted and the priority-2 auto-boost keeps them in the window.
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from metar_pipeline_spark.queries import (  # noqa: E402
    _driver_green,
    _green_hashes,
    _query_hash,
    all_queries,
)


def main() -> None:
    keep_drifted: set[str] = set()
    if "--keep-drifted" in sys.argv:
        keep_drifted = set(sys.argv[sys.argv.index("--keep-drifted") + 1 :])
    specs = all_queries()
    unknown = keep_drifted - set(specs)
    if unknown:
        sys.exit(f"--keep-drifted names not registered: {sorted(unknown)}")
    green = _driver_green()
    old = _green_hashes()
    manifest = {
        n: _query_hash(specs[n])
        for n in sorted(green)
        if n in specs and n not in keep_drifted
    }
    for n in sorted(keep_drifted & set(old)):
        manifest[n] = old[n]  # stale on purpose — stays drifted
    out = (
        Path(__file__).resolve().parent.parent
        / "metar_pipeline_spark"
        / "queries"
        / "green_hashes.json"
    )
    out.write_text(json.dumps(manifest, indent=1, sort_keys=True) + "\n")
    print(f"wrote {len(manifest)} green hashes to {out}")


if __name__ == "__main__":
    main()
