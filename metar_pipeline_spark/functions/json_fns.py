"""JSON extraction + typed casting (P6/P13, SURVEY.md §2.2).

Reproduces the stg model's ``payload ->> 'k'`` + cast projection
(/root/reference/dbt/models/stg/stg_metar_observations.sql:22-40) in two
forms:

- ``from_json_typed``: parse once against an explicit StructType
  (PERMISSIVE → NULL for missing keys, matching ``->>``), then select
  struct fields. One parse per row, columnar after that — the preferred
  scale path.
- ``get_json_fields``: per-field ``get_json_object`` — the literal
  translation, kept for parity tests; O(fields) parses per row, so not
  the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def from_json_typed(
    df: DataFrame, payload_col: str, schema: T.StructType, keep: list[str] | None = None
) -> DataFrame:
    parsed = df.withColumn("_p", F.from_json(F.col(payload_col), schema))
    fields = [f"_p.{f.name}" for f in schema.fields]
    keep = keep or [c for c in df.columns if c != payload_col]
    return parsed.select(*keep, *fields)


def get_json_fields(
    payload: Column, fields: dict[str, T.DataType]
) -> list[Column]:
    """[payload ->> k :: type AS k for k in fields] — per-field extract."""
    return [
        F.get_json_object(payload, f"$.{name}").cast(dtype).alias(name)
        for name, dtype in fields.items()
    ]


def to_json_row(df: DataFrame, out: str = "payload") -> DataFrame:
    """Whole-row JSON serialization (P13) ≡ ``json.dumps(doc)``
    (/root/reference/src/etl/mongo_to_postgres.py:81)."""
    return df.withColumn(out, F.to_json(F.struct(*df.columns)))
