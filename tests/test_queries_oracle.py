"""Every registered query vs its DuckDB oracle at sf0.001 — the same
comparison the driver runs at sf0.01 (rowcount + columns + order-
insensitive value hash)."""

from __future__ import annotations

import os

import duckdb
import pytest

from metar_pipeline_spark.io import TABLES
from metar_pipeline_spark.queries import all_queries
from tools.check_oracle import canon

SF_DIR = "/root/testdata/sf0.001"

SPECS = all_queries()


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{os.path.join(SF_DIR, t)}.parquet')"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(SPECS))
def test_query_matches_oracle(spark, duck, name):
    spec = SPECS[name]
    sdf = spec.spark_fn(spark, SF_DIR)
    # Driver-compat guard: its pandas canonicalizer cannot sort
    # array/map/struct cells (unhashable) — every registered query must
    # emit only atomic columns (serialize collections to strings).
    from pyspark.sql import types as T

    for f in sdf.schema.fields:
        assert not isinstance(
            f.dataType, (T.ArrayType, T.MapType, T.StructType)
        ), f"{name}.{f.name} is {f.dataType.simpleString()}"
    scols = sdf.columns
    srows = [tuple(r) for r in sdf.collect()]
    if spec.oracle is None:
        assert srows is not None  # rows-only check (driver's weaker gate)
        return
    cur = duck.execute(spec.oracle)
    ocols = [d[0] for d in cur.description]
    orows = cur.fetchall()
    assert sorted(scols) == sorted(ocols)
    assert len(srows) == len(orows)
    assert canon(srows, scols) == canon(orows, ocols)


def test_oracle_no_hugeint_columns(duck):
    """DESCRIBE every oracle: no HUGEINT output columns allowed.

    The driver compares pandas frames; DuckDB HUGEINT (an uncast
    SUM(CASE…)) converts to float64 and hash-mismatches Spark's int64
    even when every value is equal — the r2 pivot and r3 q12 failures.
    The cursor description masks HUGEINT as generic 'NUMBER', so only
    DESCRIBE sees it."""
    offenders = []
    for name, spec in SPECS.items():
        if spec.oracle is None:
            continue
        for row in duck.execute(f"DESCRIBE {spec.oracle}").fetchall():
            col, typ = row[0], row[1]
            t = str(typ).upper()
            if "HUGEINT" in t or "INT128" in t:
                offenders.append(f"{name}.{col}: {typ}")
    assert not offenders, offenders


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    assert df.count() > 0
    assert set(e.oracle_sql()).issubset(set(e.queries()))
