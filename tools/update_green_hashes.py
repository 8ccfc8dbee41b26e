"""Snapshot the source hash of every driver-green query.

Run at ROUND START, before any edit: green_hashes.json then records the
exact source the external gate just verified, and any later edit to a
green query (or a module it references) auto-boosts it back into the
verification window (see queries/__init__.py:_query_hash).

Usage: python tools/update_green_hashes.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from metar_pipeline_spark.queries import (  # noqa: E402
    _driver_green,
    _query_hash,
    all_queries,
)


def main() -> None:
    specs = all_queries()
    green = _driver_green()
    manifest = {n: _query_hash(specs[n]) for n in sorted(green) if n in specs}
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
