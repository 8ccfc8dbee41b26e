"""The four-axis validation matrix, one command.

Runs tools/check_oracle.py four times — sf0.001, sf0.01, sf0.1, and
sf0.01 with SPARK_GRAFT_SHUFFLE_PARTITIONS=7 — each in a FRESH python
process (the shuffle-partition axis must rebuild the SparkSession; an
in-process conf change would silently not apply). Prints one summary
line per axis and exits non-zero if any axis fails.

The fourth axis is the determinism contract's direct test: if any
query's values depended on partition count or shuffle order (float
reduction order, undeterministic tiebreaks, rand(seed)), it
hash-mismatches there first.

Usage: python tools/validate_matrix.py [axis ...]
Axis names: sf0.001 sf0.01 sf0.1 sf0.01@sp7 (default: all four).
The full matrix runs ~25 min on this host — when driving it from a
harness with a 10-minute command cap, run one axis per command.
"""

from __future__ import annotations

import os
import subprocess
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
CHECKER = str(ROOT / "tools" / "check_oracle.py")

AXES = [
    ("sf0.001", "/root/testdata/sf0.001", {}),
    ("sf0.01", "/root/testdata/sf0.01", {}),
    ("sf0.1", "/root/testdata/sf0.1", {}),
    (
        "sf0.01@sp7",
        "/root/testdata/sf0.01",
        {"SPARK_GRAFT_SHUFFLE_PARTITIONS": "7"},
    ),
]


def main() -> int:
    wanted = set(sys.argv[1:])
    unknown = wanted - {a[0] for a in AXES}
    if unknown:
        sys.exit(f"unknown axes: {sorted(unknown)}")
    axes = [a for a in AXES if not wanted or a[0] in wanted]
    failed = []
    for name, sf_dir, env_extra in axes:
        env = dict(os.environ, **env_extra)
        t0 = time.time()
        proc = subprocess.run(
            [sys.executable, CHECKER, sf_dir],
            env=env,
            capture_output=True,
            text=True,
        )
        tail = (proc.stdout or "").strip().splitlines()
        verdict = tail[-1] if tail else "(no output)"
        dt = time.time() - t0
        ok = proc.returncode == 0 and verdict.startswith("all ")
        print(f"{'ok  ' if ok else 'FAIL'} {name}: {verdict} [{dt:.0f}s]")
        if not ok:
            failed.append(name)
            for line in tail:
                if "FAIL" in line:
                    print("     ", line)
    if failed:
        print(f"matrix FAILED on: {', '.join(failed)}")
        return 1
    print("matrix: all axes green")
    return 0


if __name__ == "__main__":
    sys.exit(main())
