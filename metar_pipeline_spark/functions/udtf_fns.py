"""Python UDTF surface (SURVEY.md §2.9): one input row → N output rows
from Python, the table-function shape `explode` can't express when the
row logic is genuinely imperative.

Exhibit: fixed-size token chunking (the "context window splitter" of a
training-data pipeline — each document becomes its ordered sequence of
token chunks). Deliberately also expressible as pure SQL unnest math so
the UDTF path is hash-verified end to end like every other operator.

Scale note: the UDTF is declared ``useArrow=True`` so rows cross the
JVM/Python boundary in Arrow batches (ArrowEvalPythonUDTF — the
registry-wide plan lint forbids row-at-a-time BatchEvalPython
anywhere); still an API surface exhibit — the engine's bulk chunker is
the same arithmetic as a JVM transform+explode (see the oracle), which
is what a hot path should use."""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx int, chunk string, n_tokens int", useArrow=True)
class TokenChunks:
    """(text, chunk_size) -> one row per chunk of whitespace tokens."""

    def eval(self, text: str, chunk_size: int):
        toks = [t for t in (text or "").lower().split() if t]
        for i in range(0, len(toks), chunk_size):
            chunk = toks[i : i + chunk_size]
            yield i // chunk_size, " ".join(chunk), len(chunk)
