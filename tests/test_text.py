"""Known-answer tests for the text function library."""

from __future__ import annotations

from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.functions import text as T


def _one(spark, text, col):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(col.alias("v")).collect()[0]["v"]


def test_token_count(spark):
    assert _one(spark, "a  b \t c", T.token_count(F.col("text"))) == 3
    assert _one(spark, "", T.token_count(F.col("text"))) == 0


def test_bpe_estimate(spark):
    assert _one(spark, "abcdefgh", T.bpe_token_estimate(F.col("text"))) == 2


def test_norm_text(spark):
    assert _one(spark, "  Hello   WORLD  ", T.norm_text(F.col("text"))) == "hello world"


def test_word_ngrams(spark):
    ws = T.words(F.col("text"))
    grams = _one(spark, "a b c d", T.word_ngrams(ws, 3))
    assert grams == ["a b c", "b c d"]
    assert _one(spark, "a b", T.word_ngrams(ws, 3)) == []


def test_stopword_and_punct_ratio(spark):
    ws = T.words(F.col("text"))
    assert _one(spark, "the cat", T.stopword_ratio(ws)) == 0.5
    assert _one(spark, "ab,.", T.punct_ratio(F.col("text"))) == 0.5


def test_lang_predict_markers(spark):
    ws = T.words(F.col("text"))
    assert _one(spark, "the table is big", T.lang_predict(ws)) == "en"
    assert _one(spark, "el perro la casa los gatos", T.lang_predict(ws)) == "es"
    assert _one(spark, "der hund und die katze nicht", T.lang_predict(ws)) == "de"
    assert _one(spark, "le chien les chats une est", T.lang_predict(ws)) == "fr"
    assert _one(spark, "xyz qqq", T.lang_predict(ws)) == "und"


def test_hash32_range_and_determinism(spark):
    v1 = _one(spark, "abc", T.hash32(F.col("text")))
    v2 = _one(spark, "abc", T.hash32(F.col("text")))
    assert v1 == v2
    assert 0 <= v1 < 2**32


def test_minhash_signature_shape(spark):
    sig = _one(spark, "a b c d e", T.minhash_signature(T.shingles(F.col("text"), 2), 8))
    assert len(sig) == 8
    assert all(0 <= h < T.MINHASH_PRIME for h in sig)
    # deterministic and sensitive to content
    sig2 = _one(spark, "a b c d e", T.minhash_signature(T.shingles(F.col("text"), 2), 8))
    assert sig == sig2
    other = _one(spark, "x y z w v", T.minhash_signature(T.shingles(F.col("text"), 2), 8))
    assert other != sig


def test_simhash32_identical_texts_equal(spark):
    a = _one(spark, "a b c d e f g", T.simhash32(T.shingles(F.col("text"), 3)))
    b = _one(spark, "a b c d e f g", T.simhash32(T.shingles(F.col("text"), 3)))
    assert a == b
    assert 0 <= a < 2**32


def test_redact_pii_planted(spark):
    s = (
        "write bob.smith+x@corp.example.co.uk or visit "
        "https://a.example.com/path?q=1 or call 415-555-0137 today"
    )
    got = _one(spark, s, T.redact_pii(F.col("text")))
    assert got == "write <EMAIL> or visit <URL> or call <PHONE> today"


def test_redact_pii_no_match_identity(spark):
    s = "plain text with no contact info at all"
    assert _one(spark, s, T.redact_pii(F.col("text"))) == s


def test_url_count_and_first(spark):
    s = "see https://one.example.com and http://two.example.com/x end"
    assert _one(spark, s, T.url_count(F.col("text"))) == 2
    assert _one(spark, s, T.first_url(F.col("text"))) == "https://one.example.com"
    assert _one(spark, "no links", T.url_count(F.col("text"))) == 0
    assert _one(spark, "no links", T.first_url(F.col("text"))) == ""


def test_doc_char_entropy_empty_doc(spark, duck, tmp_path):
    """Regression (round-2 ADVICE): Spark's sequence(1, 0) is the
    DESCENDING range [1, 0], so an unguarded char array reported an
    empty doc as 2 chars / 1 distinct while the oracle's range(1, 1)
    is empty. Empty docs must report 0 chars, 0 distinct, 0 entropy in
    BOTH engines."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops2 import (
        DOC_CHAR_ENTROPY_SQL,
        doc_char_entropy,
    )

    spark.createDataFrame(
        [(1, ""), (2, "ab1")], "doc_id long, text string"
    ).write.parquet(str(tmp_path / "documents.parquet"))
    rows = {
        r["doc_id"]: r for r in doc_char_entropy(spark, str(tmp_path)).collect()
    }
    assert rows[1]["n_chars_total"] == 0
    assert rows[1]["n_distinct_chars"] == 0
    assert rows[1]["char_entropy"] == 0.0
    assert rows[1]["digit_ratio"] == 0.0
    assert rows[2]["n_distinct_chars"] == 3

    duck.execute(
        "CREATE OR REPLACE VIEW documents AS "
        f"SELECT * FROM read_parquet('{tmp_path}/documents.parquet/*.parquet')"
    )
    orows = {r[0]: r for r in duck.execute(DOC_CHAR_ENTROPY_SQL).fetchall()}
    for did in (1, 2):
        s, o = rows[did], orows[did]
        assert (s["n_chars_total"], s["n_distinct_chars"]) == (o[1], o[2])
        assert abs(s["char_entropy"] - o[3]) < 1e-9
        assert abs(s["digit_ratio"] - o[4]) < 1e-9


def test_winnowing_shared_run_guarantee(spark, tmp_path):
    """Winnowing's defining property (SIGMOD'03): two documents sharing
    a run of >= K + W - 1 = 6 words MUST share >= 1 fingerprint, and
    disjoint-vocabulary docs share none."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops2 import (
        doc_winnowing_fingerprint,
    )

    shared = "quick brown foxes jump over fences"  # 6-word shared run
    docs = [
        (1, f"intro words here {shared} tail one ending now"),
        (2, f"totally different prefix {shared} and another suffix"),
        (3, "disjoint vocabulary entirely unrelated content words everywhere"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").write.parquet(
        str(tmp_path / "documents.parquet")
    )
    rows = doc_winnowing_fingerprint(spark, str(tmp_path)).collect()
    fps = {}
    for r in rows:
        fps.setdefault(r["doc_id"], set()).add(r["fp"])
    assert fps[1] & fps[2], "shared 6-word run produced no shared fingerprint"
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
