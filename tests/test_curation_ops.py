"""Semantic properties of the targeted-curation ops (llm_ops3) — the
oracle parity in test_queries proves arithmetic equivalence; these pin
the *meaning*: SemDeDup's keep rule, BM25's ranking behavior, DSIR's
target-tilt direction."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from distributed_file_system_with_stream_processing_spark.plans import llm_ops3 as M
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table
from tests.conftest import SF_SMOKE


def test_semdedup_kmeans_keep_rule(spark):
    """keep=False ⇔ a lower-id same-cell member with cosine ≥ t exists
    — recomputed brute-force WITHIN each cell from the op's own cell
    assignment (the oracle proves the cells; this proves the rule)."""
    from distributed_file_system_with_stream_processing_spark.functions import vector as V

    out = M.semantic_dedup_kmeans(spark, SF_SMOKE)
    emb = load_table(spark, SF_SMOKE, "embeddings").select(
        "vec_id", V.as_double(F.col("embedding")).alias("v")
    )
    j = out.join(emb, "vec_id")
    a = j.select(F.col("vec_id").alias("ia"), F.col("v").alias("va"), "cluster")
    b = j.select(F.col("vec_id").alias("ib"), F.col("v").alias("vb"), "cluster")
    dup = (
        a.join(b, "cluster")
        .filter(F.col("ia") < F.col("ib"))
        .filter(V.cosine(F.col("va"), F.col("vb")) >= M._SD_THRESHOLD)
        .select(F.col("ib").alias("vec_id"))
        .distinct()
    )
    expect = {r["vec_id"] for r in dup.collect()}
    got = {r["vec_id"] for r in out.filter(~F.col("keep")).collect()}
    assert got == expect
    assert len(got) > 0, "fixture should contain semantic duplicates"
    # every cell's lowest id is always kept
    low = {
        r["m"]
        for r in out.groupBy("cluster").agg(F.min("vec_id").alias("m")).collect()
    }
    assert low <= {r["vec_id"] for r in out.filter(F.col("keep")).collect()}


def test_semdedup_kmeans_covers_whole_table(spark):
    out = M.semantic_dedup_kmeans(spark, SF_SMOKE)
    n = load_table(spark, SF_SMOKE, "embeddings").count()
    assert out.count() == n
    assert out.select("vec_id").distinct().count() == n


def test_bm25_scores_positive_and_hit_counts_reconstruct(spark):
    """Lucene idf is always positive, so every emitted score must be
    > 0 with 1..|Q| hit terms; one doc's n_hit_terms is reconstructed
    from raw tokens to pin the tokenizer/casing wiring."""
    rows = M.docs_bm25_score(spark, SF_SMOKE).collect()
    assert rows, "query terms must hit the corpus"
    assert all(r["bm25"] > 0 for r in rows)
    assert all(1 <= r["n_hit_terms"] <= len(M._BM25_TERMS) for r in rows)
    # reconstruct one doc's n_hit_terms from raw tokens — catches a
    # wrong tokenizer/casing wiring that oracle symmetry would mask
    docs = load_table(spark, SF_SMOKE, "documents")
    from distributed_file_system_with_stream_processing_spark.functions import text as T

    one = rows[0]
    ws = [
        w.lower()
        for w in docs.filter(F.col("doc_id") == one["doc_id"])
        .select(T.words(F.col("text")).alias("ws"))
        .collect()[0]["ws"]
    ]
    n_hit = len({w for w in ws if w in M._BM25_TERMS})
    assert n_hit == one["n_hit_terms"]


def test_dsir_tilts_toward_target(spark):
    """The mean importance log-weight of target-domain (en) docs must
    exceed the non-target mean — the defining property of importance
    weights log p_target/p_raw (Xie et al. 2023): docs distributed
    like the target score higher."""
    w = M.dsir_importance_weights(spark, SF_SMOKE)
    docs = load_table(spark, SF_SMOKE, "documents").select("doc_id", "lang")
    j = w.join(docs, "doc_id")
    means = {
        r["t"]: r["m"]
        for r in j.groupBy((F.col("lang") == M._DSIR_TARGET_LANG).alias("t"))
        .agg(F.avg("log_weight").alias("m"))
        .collect()
    }
    assert means[True] > means[False], means


def test_dsir_covers_all_nonempty_docs(spark):
    w = M.dsir_importance_weights(spark, SF_SMOKE)
    n_docs = load_table(spark, SF_SMOKE, "documents").filter(
        F.length(F.trim(F.col("text"))) > 0
    ).count()
    assert w.count() == n_docs


def test_bloom_decontaminate_superset_of_exact(spark):
    """One-sided guarantee: every doc the exact shingle semi-join
    flags must be Bloom-flagged with AT LEAST the exact hit count
    (no false negatives, ever); and the over-flagging must be bounded
    (false-positive shingles are rare at 16-bit positions × 3
    hashes)."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
        decontaminate_ngram,
    )
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops5 import (
        decontaminate_bloom,
    )
    from tests.conftest import SF_SMOKE

    exact = {
        r["doc_id"]: r["n_hit_ngrams"]
        for r in decontaminate_ngram(spark, SF_SMOKE).collect()
    }
    bloom = {
        r["doc_id"]: r["n_hit_ngrams"]
        for r in decontaminate_bloom(spark, SF_SMOKE).collect()
    }
    assert exact, "exact decontamination found nothing at sf0.001"
    for doc_id, n in exact.items():
        assert doc_id in bloom and bloom[doc_id] >= n, (doc_id, n, bloom.get(doc_id))
    # bounded over-flagging: the flagged-doc overshoot stays small
    assert len(bloom) <= max(2 * len(exact), len(exact) + 5), (len(exact), len(bloom))


def test_kn_perplexity_sane_and_discount_active(spark):
    """KN must score every multi-token doc, produce finite positive
    perplexities, and DIFFER from the add-k bigram LM (the
    continuation term is real, not a re-labelled copy)."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops4 import (
        docs_bigram_perplexity,
    )
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops5 import (
        docs_kn_perplexity,
    )
    from tests.conftest import SF_SMOKE

    kn = {r["doc_id"]: r["kn_ppl"] for r in docs_kn_perplexity(spark, SF_SMOKE).collect()}
    addk = {
        r["doc_id"]: r["bigram_ppl"]
        for r in docs_bigram_perplexity(spark, SF_SMOKE).collect()
    }
    assert set(kn) == set(addk)
    assert all(p > 0 and p < 1e9 for p in kn.values())
    n_diff = sum(1 for d in kn if abs(kn[d] - addk[d]) > 1e-6)
    assert n_diff > len(kn) * 0.9, n_diff


def test_neardup_pagerank_matches_python_reference(spark):
    """The unrolled-plan PageRank must equal a pure-Python power
    iteration with identical nano-quantized arithmetic on the same
    pair set — and ranks must form a probability-like vector (sum ≈ 1
    up to quantization, all positive)."""
    from distributed_file_system_with_stream_processing_spark.operators import dedup as D
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops5 import (
        _PR_DAMP,
        _PR_ITERS,
        _PR_NANO,
        neardup_pagerank,
    )
    from distributed_file_system_with_stream_processing_spark.sources.tables import load_table
    from tests.conftest import SF_SMOKE

    pairs = {
        (r["doc_id_a"], r["doc_id_b"])
        for r in D.minhash_lsh_pairs(
            load_table(spark, SF_SMOKE, "documents")
        ).select("doc_id_a", "doc_id_b").distinct().collect()
    }
    assert pairs, "no near-dup pairs at sf0.001"
    edges = {}
    for a, b in pairs:
        edges.setdefault(a, []).append(b)
        edges.setdefault(b, []).append(a)
    nodes = sorted(edges)
    n = len(nodes)
    p = {v: 1.0 / n for v in nodes}
    for _ in range(_PR_ITERS):
        inflow = {v: 0 for v in nodes}
        for src in nodes:
            c = p[src] / len(edges[src]) * _PR_NANO
            q = int(math.floor(c + 0.5)) if c >= 0 else -int(math.floor(-c + 0.5))
            for dst in edges[src]:
                inflow[dst] += q
        p = {
            v: (1.0 - _PR_DAMP) / n + _PR_DAMP * (float(inflow[v]) / _PR_NANO)
            for v in nodes
        }
    want = {v: round(p[v] * 1000, 6) for v in nodes}
    got = {r["doc_id"]: r["pagerank_milli"] for r in neardup_pagerank(spark, SF_SMOKE).collect()}
    assert got == want
    total = sum(got.values()) / 1000
    assert abs(total - 1.0) < 1e-3, total
    assert all(v > 0 for v in got.values())


def test_transition_matrix_rows_are_distributions(spark):
    """P(next|prev) must sum to 1 per prev_type (within rounding) and
    every count must be consistent with its row total."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops5 import (
        events_transition_matrix,
    )

    rows = events_transition_matrix(spark, SF_SMOKE).collect()
    assert rows
    by_prev: dict[str, float] = {}
    for r in rows:
        by_prev[r["prev_type"]] = by_prev.get(r["prev_type"], 0.0) + r["p"]
        assert r["n"] > 0 and 0 < r["p"] <= 1
    for prev, tot in by_prev.items():
        assert abs(tot - 1.0) < 1e-4, (prev, tot)


def test_temperature_mix_flattens_toward_uniform(spark):
    """Weights must sum to 1, and alpha<1 must UP-weight small sources
    relative to proportional sampling: every below-average source gets
    weight > its token share, every above-average source gets less."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops5 import (
        source_temperature_mix,
    )

    rows = source_temperature_mix(spark, SF_SMOKE).collect()
    assert rows
    total_w = sum(r["weight"] for r in rows)
    assert abs(total_w - 1.0) < 1e-4, total_w
    total_tok = sum(r["n_tokens"] for r in rows)
    for r in rows:
        share = r["n_tokens"] / total_tok
        if share < 1.0 / len(rows) * 0.95:
            assert r["weight"] > share, (r["source"], r["weight"], share)
        elif share > 1.0 / len(rows) * 1.05:
            assert r["weight"] < share, (r["source"], r["weight"], share)


def test_dedup_agreement_matrix_equals_set_algebra(spark):
    """The matrix must equal the set algebra computed independently
    from each method's own registered output (exact recomputed with
    the same normalization in pure Python)."""
    import re

    from distributed_file_system_with_stream_processing_spark.operators import dedup as D
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops4 import (
        dedup_exact_substring,
    )
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops5 import (
        dedup_agreement_matrix,
    )

    docs = load_table(spark, SF_SMOKE, "documents")
    norm: dict[str, list[int]] = {}
    for r in docs.select("doc_id", "text").collect():
        key = re.sub(r"\s+", " ", r["text"]).strip().lower()
        norm.setdefault(key, []).append(r["doc_id"])
    sets = {"exact": {i for ids in norm.values() if len(ids) > 1 for i in ids}}

    def eps(rows):
        out = set()
        for r in rows:
            out.add(r["doc_id_a"])
            out.add(r["doc_id_b"])
        return out

    sets["minhash"] = eps(D.minhash_lsh_pairs(docs).collect())
    sets["simhash"] = eps(D.simhash_pairs(docs, n=3, max_hamming=3).collect())
    sets["substring"] = eps(dedup_exact_substring(spark, SF_SMOKE).collect())

    want = {
        (a, b): len(sets[a] & sets[b])
        for a in sets
        for b in sets
        if sets[a] and sets[b]
    }
    want = {k: v for k, v in want.items() if v > 0}
    got = {
        (r["method_a"], r["method_b"]): r["n_both"]
        for r in dedup_agreement_matrix(spark, SF_SMOKE).collect()
    }
    assert got == want
    # methods disagree somewhere, or the dashboard would be pointless
    diag = {m: got.get((m, m), 0) for m in sets}
    offdiag = [v for (a, b), v in got.items() if a != b]
    assert any(v < max(diag.values()) for v in offdiag), got


def test_markov_stationary_matches_python_reference(spark):
    """The unrolled stationary-distribution plan must equal a
    pure-Python power iteration with identical nano-quantized
    arithmetic, and the result must be a probability vector."""
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops5 import (
        _MS_ITERS,
        _MS_NANO,
        events_markov_stationary,
        events_transition_matrix,
    )

    rows = events_transition_matrix(spark, SF_SMOKE).collect()
    n_prev: dict[str, int] = {}
    for r in rows:
        n_prev[r["prev_type"]] = n_prev.get(r["prev_type"], 0) + r["n"]
    P = {(r["prev_type"], r["next_type"]): r["n"] / n_prev[r["prev_type"]] for r in rows}
    states = sorted({u for u, _ in P} | {v for _, v in P})
    pi = {s: 1.0 / len(states) for s in states}
    for _ in range(_MS_ITERS):
        inflow = {s: 0 for s in states}
        for (u, v), p in P.items():
            c = pi[u] * p * _MS_NANO
            q = int(math.floor(c + 0.5)) if c >= 0 else -int(math.floor(-c + 0.5))
            inflow[v] += q
        pi = {s: float(inflow[s]) / _MS_NANO for s in states}
    want = {s: round(pi[s], 6) for s in states}
    got = {
        r["event_type"]: r["stationary_p"]
        for r in events_markov_stationary(spark, SF_SMOKE).collect()
    }
    assert got == want
    assert all(v >= 0 for v in got.values())
    assert abs(sum(got.values()) - 1.0) < 1e-3
