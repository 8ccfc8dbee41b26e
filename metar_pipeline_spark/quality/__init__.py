"""Data-quality assertion runner (SURVEY.md §2.10)."""

from metar_pipeline_spark.quality.assertions import (
    Assertion,
    accepted_values,
    not_null,
    quarantine_violations,
    relationships,
    run_assertions,
    singular,
    unique,
)

__all__ = [
    "Assertion",
    "not_null",
    "unique",
    "accepted_values",
    "relationships",
    "singular",
    "run_assertions",
    "quarantine_violations",
]
