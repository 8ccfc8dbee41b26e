from __future__ import annotations

import os
import sys
import time
from pathlib import Path

import pytest

# Pin the PROCESS timezone before the JVM starts (same guard as
# tools/check_oracle.py): PySpark's collect() materializes TimestampType
# through OS-local fromtimestamp(), so under an ambient TZ every raw
# timestamp column would shift against DuckDB's naive-UTC values and the
# whole oracle suite would false-fail. Comparison semantics are UTC wall
# clock; make the tests immune to the machine's TZ.
os.environ["TZ"] = "UTC"
time.tzset()

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from metar_pipeline_spark.session import get_spark

SF_SMOKE = "/root/testdata/sf0.001"
SF_ORACLE = "/root/testdata/sf0.001"


@pytest.fixture(scope="session")
def spark():
    s = get_spark("tests", shuffle_partitions=8)
    yield s
