"""BPE merge training: the Spark rule sequence must equal an
independent pure-Python BPE on the same word-frequency table, and
applying the rules must reconstruct every word exactly."""

from __future__ import annotations

import collections

from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.operators import bpe as B
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE

N_MERGES = 6


def _py_bpe(wc: dict, n: int):
    syms = {w: list(w) for w in wc}
    out = []
    for rank in range(1, n + 1):
        pc = collections.Counter()
        for w, n_ in wc.items():
            s = syms[w]
            for i in range(len(s) - 1):
                pc[(s[i], s[i + 1])] += n_
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1]))
        out.append((rank, a, b, a + b, cnt))
        for w in syms:
            s = syms[w]
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            syms[w] = ns
    return out, syms


def _word_counts(spark):
    wc = collections.Counter()
    for r in load_table(spark, SF_SMOKE, "documents").select("text").collect():
        for w in r["text"].split():
            wc[w.lower()] += 1
    return wc


def test_bpe_rules_match_python_reference(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    rules = B.bpe_train(docs, n_merges=N_MERGES)
    got = [
        (r["rank"], r["left"], r["right"], r["merged"], r["pair_count"]) for r in rules
    ]
    ref, _ = _py_bpe(_word_counts(spark), N_MERGES)
    assert got == ref and len(got) == N_MERGES


def test_bpe_apply_reconstructs_words_and_matches_reference(spark):
    docs = load_table(spark, SF_SMOKE, "documents")
    rules = B.bpe_train(docs, n_merges=N_MERGES)
    applied = B.bpe_apply(docs, rules)
    # every word must be the concatenation of its tokens
    bad = applied.filter(
        F.concat_ws("", F.col("tokens")) != F.col("word")
    ).count()
    assert bad == 0
    # and the token sequences must equal the reference's final symbols
    _, ref_syms = _py_bpe(_word_counts(spark), N_MERGES)
    got = {r["word"]: list(r["tokens"]) for r in applied.collect()}
    assert got == ref_syms


def test_bpe_merge_pair_fold_is_left_to_right_nonoverlapping(spark):
    """'aaa' with rule (a,a) → [aa, a]; 'abab' with (a,b) → [ab, ab]."""
    df = spark.createDataFrame([("aaa",), ("abab",)], "word string")
    out = {
        r["word"]: list(r["m"])
        for r in df.select(
            "word",
            B.merge_pair(B.chars_of(F.col("word")), "a", "a").alias("m"),
        ).collect()
    }
    assert out["aaa"] == ["aa", "a"]
    out2 = {
        r["word"]: list(r["m"])
        for r in df.select(
            "word",
            B.merge_pair(B.chars_of(F.col("word")), "a", "b").alias("m"),
        ).collect()
    }
    assert out2["abab"] == ["ab", "ab"]


def test_bpe_tokenize_topk_counts_match_reference(spark):
    """The registered apply-side query's token frequencies must equal
    the Python reference's (sum of word counts per final symbol)."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops4 import (
        _BPE_MERGES,
        bpe_tokenize_topk,
    )

    wc = _word_counts(spark)
    _, syms = _py_bpe(wc, _BPE_MERGES)
    ref = collections.Counter()
    for w, n in wc.items():
        for t in syms[w]:
            ref[t] += n
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:50]
    got = [(r["token"], r["cnt"]) for r in bpe_tokenize_topk(spark, SF_SMOKE).collect()]
    assert got == want
