"""Python UDTF (Spark 4 table-function API): split_sentences must
agree with an independent Python reference on the real corpus and
compose with LATERAL joins in SQL."""

from __future__ import annotations

import re

from distributed_file_system_with_stream_processing_spark.functions.udtfs import (
    SplitSentences,
    register_udtfs,
)
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def _ref(text: str):
    parts = [p.strip() for p in re.split(r"(?<=[.!?])\s+", text)]
    return [(i, p, len(p.split())) for i, p in enumerate(parts) if p]


def test_split_sentences_lateral_matches_reference(spark):
    register_udtfs(spark)
    docs = load_table(spark, SF_SMOKE, "documents")
    docs.createOrReplaceTempView("udtf_docs")
    got = {}
    rows = spark.sql(
        "SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_words "
        "FROM udtf_docs d, LATERAL split_sentences(d.text) s"
    ).collect()
    for r in rows:
        got.setdefault(r["doc_id"], []).append(
            (r["sentence_idx"], r["sentence"], r["n_words"])
        )
    ref = {
        r["doc_id"]: _ref(r["text"])
        for r in docs.select("doc_id", "text").collect()
    }
    ref = {k: v for k, v in ref.items() if v}
    assert {k: sorted(v) for k, v in got.items()} == {
        k: sorted(v) for k, v in ref.items()
    }


def test_split_sentences_null_and_empty(spark):
    register_udtfs(spark)
    df = spark.createDataFrame([(1, None), (2, ""), (3, "One. Two!")],
                               "doc_id long, text string")
    df.createOrReplaceTempView("udtf_edge")
    rows = spark.sql(
        "SELECT d.doc_id, s.sentence FROM udtf_edge d, "
        "LATERAL split_sentences(d.text) s"
    ).collect()
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], []).append(r["sentence"])
    assert 1 not in by_doc and 2 not in by_doc
    assert by_doc[3] == ["One.", "Two!"]
