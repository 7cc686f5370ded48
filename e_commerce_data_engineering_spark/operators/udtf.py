"""Python UDTF (Spark 4 user-defined table function) — the IMPERATIVE
escape hatch, demonstrated and fenced.

The engine's analytics surface is zero-Python-UDF by design (SURVEY
§2.10, plan-asserted): everything registered in ``plans/`` compiles to
native Catalyst expressions. But a complete engine also documents the
escape hatch for logic that genuinely cannot be expressed as columns —
per-row expansion with complex Python state, third-party tokenizers,
etc. This module shows the blessed pattern: a UDTF whose semantics are
PINNED to a native twin by test (tests/test_operators.py asserts
``chunk_docs`` emits byte-identical rows to the t29 HOF segmentation),
so anyone swapping imperative code in knows exactly what contract to
hold. No registered query uses it — the native form is always the
production path.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="chunk_idx: int, chunk: string, n_tokens: int")
class ChunkDocs:
    """Expand a document into non-overlapping ``width``-token chunks —
    the UDTF twin of the native sequence+slice segmentation
    (operators/dedup.dedupe_segments). Stateless per row: safe under
    retries and any partitioning."""

    def eval(self, text: str, width: int):
        toks = [t for t in (text or "").split(" ") if t]
        for i in range(0, len(toks), width):
            part = toks[i : i + width]
            yield i // width, " ".join(part), len(part)


def register_udtfs(spark) -> None:
    """Register the demo UDTF for SQL lateral use:
    ``SELECT d.doc_id, c.* FROM documents d, LATERAL chunk_docs(d.text, 8) c``
    """
    spark.udtf.register("chunk_docs", ChunkDocs)
