"""Spark 4 Python UDTFs — the official table-function extension point.

One registered UDTF, ``split_sentences``: text → one row per sentence
with (sentence_idx, sentence, n_words) — the canonical
one-row-to-many-rows shape a chunking/packing pipeline needs, used
from SQL as a LATERAL join::

    SELECT d.doc_id, s.sentence_idx, s.n_words
    FROM documents d, LATERAL split_sentences(d.text) s

Positioning (mirrors sources/pyds.py's honesty note): UDTFs run in
Python workers — they are the *pluggable* path, not the fast path.
The repo's hot-path chunkers (docs_chunk_overlap, paragraph_dedup,
docs_seq_packing) stay pure JVM column expressions; the UDTF exists
to cover Spark's official table-function API with a real, tested
implementation, and for logic that genuinely can't be expressed as
column HOFs. ``useArrow=True`` picks the Arrow-optimized transport.

The reference engine's closest analogue is the op1/op2 user
executable emitting multiple output records per input batch
(reference rainstorm/rainstorm.go:357-450); a UDTF is Spark's typed,
planned version of that contract.
"""

from __future__ import annotations

from pyspark.sql.functions import udtf


@udtf(returnType="sentence_idx int, sentence string, n_words int", useArrow=True)
class SplitSentences:
    """Split on sentence-final punctuation (., !, ? followed by
    whitespace or end) — deterministic, dependency-free."""

    def eval(self, text: str):  # noqa: D102 — UDTF contract method
        if text is None:
            return
        import re

        parts = [p.strip() for p in re.split(r"(?<=[.!?])\s+", text)]
        for i, p in enumerate(parts):
            if p:
                yield i, p, len(p.split())


def register_udtfs(spark) -> None:
    """Register every UDTF on the session (idempotent)."""
    spark.udtf.register("split_sentences", SplitSentences)
