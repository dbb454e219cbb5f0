"""Native Python UDTFs (Spark 4 table functions, SQL-composable).

The U4 (table-generating) surface is mostly served by ``explode`` /
``posexplode`` over built-in array expressions — that is the fast path
and stays preferred (operators/chunking.py is the expression-only
counterpart of the UDTF below). This module exercises the real
``@udtf`` escape hatch: a Python class invoked per input row, usable
from SQL via ``LATERAL``, for row-expansion logic that genuinely needs
imperative Python.

Scale posture: a Python UDTF is a Python-process boundary like any
other Python UDF — Arrow-batched (``spark.sql.execution.pythonUDTF.
arrow.enabled`` is on in session.RUNTIME_CONFS), stateless across rows,
so it partitions exactly like the scan feeding it and adds no shuffle.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="pos int, chunk string, n_tokens int")
class ChunkTokens:
    """Split a document into NON-overlapping ``width``-token chunks.

    Emits (pos, chunk, n_tokens): 0-based chunk position, the
    space-rejoined chunk, and its token count (the final chunk may be
    short). Null text emits no rows. The overlapping-window variant
    with a stride lives in operators/chunking.py as pure expressions —
    use that in hot paths; this is the SQL-composable imperative form.
    """

    def eval(self, text: str, width: int):  # noqa: D102 - see class doc
        if text is None or width is None or width <= 0:
            return
        toks = text.split(" ")
        for pos, start in enumerate(range(0, len(toks), width)):
            chunk = toks[start : start + width]
            yield pos, " ".join(chunk), len(chunk)


def register_udtfs(spark) -> None:
    """Register every engine UDTF in the session's SQL catalog
    (idempotent — re-registration replaces the same definition)."""
    spark.udtf.register("chunk_tokens", ChunkTokens)
