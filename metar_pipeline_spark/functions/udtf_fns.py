"""Python UDTF surface (SURVEY.md §2.9): one input row → N output rows
from Python, the table-function shape `explode` can't express when the
row logic is genuinely imperative.

Exhibit: fixed-size token chunking (the "context window splitter" of a
training-data pipeline — each document becomes its ordered sequence of
token chunks). Deliberately also expressible as pure SQL unnest math so
the UDTF path is hash-verified end to end like every other operator.

Scale note (MEASURED, round 5): ``useArrow=True`` was tried in round 4
to satisfy the registry-wide no-BatchEvalPython lint, and benched
2.6x SLOWER at sf0.1 (min 1.00 s vs 0.38 s over 3 runs) — for a UDTF
whose rows are short variable-length strings, per-batch Arrow
conversion overhead exceeds pickle serialization. Reverted to the
default pickled path; the plan lint carries a named, justified
exemption for exactly this query. Still an API surface exhibit — the
engine's bulk chunker is the same arithmetic as a JVM
transform+explode (see the oracle), which is what a hot path should
use."""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int")
class TokenChunks:
    """(text, chunk_size) -> one row per chunk of whitespace tokens."""

    def eval(self, text: str, chunk_size: int):
        toks = [t for t in (text or "").lower().split() if t]
        for i in range(0, len(toks), chunk_size):
            chunk = toks[i : i + chunk_size]
            yield i // chunk_size, " ".join(chunk), len(chunk)
