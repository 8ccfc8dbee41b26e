"""Local mimic of the driver's correctness gate.

Runs every registered query on Spark AND its DuckDB oracle at the given
sf dir, compares row count, column names, and an order-insensitive value
hash (rows sorted, columns sorted by name, values normalized to strings).

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb

from metar_pipeline_spark.io import TABLES
from metar_pipeline_spark.queries import all_queries
from metar_pipeline_spark.session import get_spark


def _norm_cell(v):
    import datetime
    import math

    if v is None:
        return "∅"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return repr(v)
    if isinstance(v, datetime.datetime):
        return v.isoformat()
    if isinstance(v, datetime.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(_norm_cell(x) for x in v) + "]"
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(_norm_cell(r[i]) for i in order) for r in rows
    )
    return out


def main():
    # Pin the PROCESS timezone before the JVM starts: PySpark's
    # collect() materializes TimestampType through OS-local
    # fromtimestamp(), so under TZ=America/New_York every raw
    # timestamp output column would shift against DuckDB's naive-UTC
    # values (16 false failures measured). The comparison semantics
    # are UTC wall clock; make the checker immune to the ambient TZ.
    import time as _time

    os.environ["TZ"] = "UTC"
    _time.tzset()

    args = sys.argv[1:]
    drifted_only = "--drifted" in args
    pending_only = "--pending" in args
    staged_only = "--staged" in args
    args = [a for a in args if a not in ("--drifted", "--pending", "--staged")]
    # the sf_dir positional is optional: `--drifted some_query` must
    # treat some_query as a query name, not a data directory
    if args and os.path.isdir(args[0]):
        sf_dir, only = args[0], set(args[1:])
    else:
        sf_dir, only = "/root/testdata/sf0.01", set(args)
    # A mistyped data dir must not silently become a query-name filter
    # that matches nothing and exits green (r5 advice).
    pathlike = [a for a in only if os.sep in a]
    if pathlike:
        sys.exit(f"not a directory (typo in sf_dir?): {pathlike}")

    if staged_only:
        # --staged: the gate-staged specs (queries/staged.py) — finished
        # but deliberately NOT registered while the verification window
        # is full. Same comparison, same determinism bar.
        from metar_pipeline_spark.queries.staged import STAGED

        specs = dict(STAGED)
        print(f"selected {len(specs)} STAGED (unregistered) queries")
    else:
        specs = all_queries()
    if drifted_only or pending_only:
        # --drifted: driver-green queries whose source/oracle hash no
        # longer matches the verified snapshot (the set the auto-boost
        # will re-gate next round) — run after editing green queries.
        # --pending: queries with no driver-green row yet (the current
        # verification-window backlog).
        import metar_pipeline_spark.queries as q

        green = q._driver_green()
        manifest = q._green_hashes()
        sel = set()
        if drifted_only:
            sel |= {
                n for n, s in specs.items()
                if n in green and manifest.get(n) != q._query_hash(s)
            }
        if pending_only:
            sel |= {n for n in specs if n not in green}
        specs = {k: v for k, v in specs.items() if k in sel}
        print(f"selected {len(specs)} queries"
              f"{' (drifted)' if drifted_only else ''}"
              f"{' (pending)' if pending_only else ''}")
    if only:
        # Validate names against the FULL registry even under
        # --drifted/--pending: a typo'd name must never silently
        # verify nothing and exit green (r6 review). Under --staged the
        # staged set IS the full namespace.
        unknown = only - (
            set(specs) if staged_only else set(all_queries())
        )
        if unknown:
            sys.exit(f"unknown query names: {sorted(unknown)}")
        skipped = only - set(specs)
        if skipped:
            print(f"not in {'drifted' if drifted_only else ''}"
                  f"{'+' if drifted_only and pending_only else ''}"
                  f"{'pending' if pending_only else ''} set "
                  f"(unchanged since last green): {sorted(skipped)}")
        specs = {k: v for k, v in specs.items() if k in only}
        if not specs:
            sys.exit("none of the named queries selected — "
                     "nothing verified")
    if not specs and not (drifted_only or pending_only):
        # --drifted/--pending legitimately select zero (count printed
        # above); an empty plain run means a selection typo — fail loud.
        sys.exit("no queries selected — nothing verified")

    spark = get_spark("check-oracle")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{os.path.join(sf_dir, t)}.parquet')"
        )

    failures = []
    for name, spec in specs.items():
        t0 = time.time()
        try:
            sdf = spec.spark_fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if spec.oracle is None:
            print(f"ok   {name}: rows-only ({len(srows)} rows) [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(spec.oracle)
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            # Dtype lint: the external gate compares pandas frames,
            # where DuckDB HUGEINT (e.g. an uncast SUM(CASE…)) converts
            # to float — hash-mismatching Spark's BIGINT even when every
            # value is equal (the r2 pivot failure; the r3 q12 failure).
            # The cursor description MASKS HUGEINT as generic 'NUMBER'
            # (how q12 escaped the r3 lint), so inspect the real types
            # via DESCRIBE <oracle>. Oracles must CAST such sums to
            # BIGINT.
            otypes = {
                r[0]: str(r[1])
                for r in con.execute(f"DESCRIBE {spec.oracle}").fetchall()
            }
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        for c, t in otypes.items():
            if "HUGEINT" in t.upper() or "INT128" in t.upper():
                problems.append(
                    f"oracle column {c} is {t} (pandas-converts to "
                    f"float; CAST it to BIGINT)"
                )
        if sorted(scols) != sorted(ocols):
            problems.append(f"columns spark={sorted(scols)} oracle={sorted(ocols)}")
        if len(srows) != len(orows):
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            cs, co = canon(srows, scols), canon(orows, ocols)
            if cs != co:
                ndiff = sum(1 for a, b in zip(cs, co) if a != b)
                problems.append(f"values differ ({ndiff} rows)")
                for a, b in list(zip(cs, co))[:200]:
                    if a != b:
                        problems.append(f"  spark={a}")
                        problems.append(f"  duck ={b}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems[:4]))
            failures.append(name)
        else:
            print(f"ok   {name}: {len(srows)} rows match [{time.time()-t0:.1f}s]")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print(f"all {len(specs)} queries match")


if __name__ == "__main__":
    main()
