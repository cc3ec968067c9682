"""Corpus-statistics & chunking queries — second LLM-pipeline module.

Same contract as ``llm_ops``: every Spark plan is declarative DataFrame
code (JVM expressions only, no Python row UDFs) with a DuckDB oracle
mirroring the exact arithmetic expression tree, so value hashes match
without tolerances. Portability conventions (hash32, words, explicit
DOUBLE casts) are documented in ``llm_ops``'s module docstring.

Ops here:
- ``tfidf_top_terms``   — per-doc salient terms (rational tf-idf).
- ``doc_char_entropy``  — shuffle-free per-doc character entropy QA.
- ``docs_chunk_overlap``— sliding-window chunking (size 64 / stride 48).
- ``minhash_jaccard_estimate`` — sketch-accuracy QA: MinHash estimate
  vs exact shingle Jaccard on the LSH candidate pairs.
- ``events_value_zscore`` — outlier flagging from EXACT integer
  moments (partial-agg-order-free, the q9 integer-cents trick applied
  to second moments).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.functions import text as T
from distributed_file_system_with_stream_processing_spark.operators import dedup as D
from distributed_file_system_with_stream_processing_spark.operators._util import gate_broadcast, spread
from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
    _MINHASH_PAIRS_BODY,
    _WS,
)
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

# ---------------------------------------------------------------------------
# tfidf_top_terms


def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 salient terms per document by a rational tf-idf.

    salience = (tf · N) / (len_d · df): term frequency over document
    length, normalized by the term's corpus document-frequency share.
    All-integer numerator and denominator with ONE double division, so
    the score is bit-identical in any engine (no transcendental idf) —
    same ranking order as tf·log-idf for the per-doc top-k.

    100 TB shape: tokenize → (doc_id, term) partial-agg [shuffle 1] →
    df per term [shuffle 2, high-cardinality key] → term-keyed
    sort-merge join back → per-doc top-k window [shuffle 3 on doc_id].
    The corpus size N is a 1-row broadcast attached via
    BroadcastNestedLoopJoin BuildRight — with a 1-row build side that
    is "append a scalar column", zero fan-out, and the scored side
    never reshuffles. (A synthetic constant equi-key does not improve
    the plan: Catalyst constant-folds foldable join keys back to the
    same BNLJ — allow-listed with the BuildRight assertion in
    tests/test_plans.py.) No driver collect, no low-cardinality
    shuffle key anywhere.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", T.words(F.col("text")).alias("ws"))
    # explode_outer + null filter: keeps InferFiltersFromGenerate from
    # pushing the tokenizer below the spread repartition (see
    # dedup._exploded_shingles for the pathology). len_d rides THROUGH
    # the explode and the (doc, term) aggregation (constant per group,
    # reduced with max) instead of a separate lens branch — saves a
    # second documents scan and a doc_id-keyed join back (measured
    # 1.53 → 1.24 s at sf0.1 local[32]).
    ex = (
        toks.select(
            "doc_id",
            F.size("ws").cast("long").alias("len_d"),
            F.explode_outer("ws").alias("w"),
        )
        .filter(F.col("w").isNotNull())
        .select("doc_id", "len_d", F.lower(F.col("w")).alias("term"))
    )
    tf = ex.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"), F.max("len_d").alias("len_d")
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = d.agg(F.count(F.lit(1)).alias("n_docs"))
    sal = (F.col("tf") * F.col("n_docs")).cast("double") / (
        F.col("len_d") * F.col("df")
    ).cast("double")
    w = Window.partitionBy("doc_id").orderBy(F.desc("_sal"), F.asc("term"))
    return (
        tf.join(df_t, "term")
        .crossJoin(broadcast(n_docs))
        .select("doc_id", "term", "tf", "df", sal.alias("_sal"))
        .withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", F.round("_sal", 6).alias("salience"), "rank")
    )


TFIDF_TOP_TERMS_SQL = rf"""
WITH toks AS (SELECT doc_id, {_WS} AS ws FROM documents),
ex AS (SELECT doc_id, CAST(len(ws) AS BIGINT) AS len_d, lower(unnest(ws)) AS term
       FROM toks),
tf AS (SELECT doc_id, term, count(*) AS tf, max(len_d) AS len_d
       FROM ex GROUP BY doc_id, term),
df AS (SELECT term, count(*) AS df FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents),
scored AS (
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(tf.len_d * df.df AS DOUBLE) AS sal
    FROM tf JOIN df USING (term) CROSS JOIN n
),
ranked AS (
    SELECT doc_id, term, tf, df, sal,
           row_number() OVER (PARTITION BY doc_id ORDER BY sal DESC, term) AS rank
    FROM scored
)
SELECT doc_id, term, tf, df, round(sal, 6) AS salience, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= 3
"""


# ---------------------------------------------------------------------------
# doc_char_entropy


def doc_char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document character-distribution stats: Shannon entropy
    (bits), distinct-char count, digit ratio — the classic gibberish /
    binary-spill / mojibake quality signals.

    Deliberately a PURE MAP (zero shuffles): the char histogram is
    computed per row with array expressions — O(distinct_chars · len)
    comparisons per doc, fully inside codegen'd HOFs — instead of the
    explode → two-shuffle groupBy form, which at 100 TB would shuffle
    one row PER CHARACTER. Distinct chars are sorted before the
    entropy sum so the float accumulation order is engine-identical
    (Spark's sequential ``aggregate`` equals the negation of DuckDB's
    ``list_sum``; negation is exact, so the twins agree bit-for-bit up
    to log2's ulp, absorbed by round-4).

    Long-doc bound (measured, round 3): on 100 KB documents the
    interpreted-HOF histogram sustains ~3.1 M chars/s on local[8] —
    FASTER than the explode → groupBy(doc, char) → re-agg twin
    (~2.1 M chars/s), because natural text has ≤~100 distinct chars
    and the O(distinct·len) comparison loop stays cache-resident
    while the twin pays two corpus-wide shuffles of one row per
    CHARACTER. The crossover is distinct-char cardinality, not doc
    length: for content where distinct ~ len (CJK corpora, binary
    spill) the quadratic term bites and the explode form wins — at
    which point this op's QA verdict ("that's not text") is already
    made.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    staged = d.selectExpr(
        "doc_id",
        "lower(text) AS _lt",
    ).selectExpr(
        "doc_id",
        "_lt",
        # sequence(1, 0) is the DESCENDING range [1, 0], not empty —
        # an empty doc would report 2 chars (both '') and 1 distinct
        # char where the oracle's range(1, 1) is empty and yields 0.
        # Guard so empty docs produce an empty char array.
        """CASE WHEN length(_lt) > 0
             THEN transform(sequence(1, length(_lt)), i -> substring(_lt, i, 1))
             ELSE cast(array() AS array<string>) END AS _cs""",
    ).selectExpr(
        "doc_id",
        "_lt",
        "_cs",
        "array_sort(array_distinct(_cs)) AS _dc",
    ).selectExpr(
        "doc_id",
        "_lt",
        "_dc",
        "transform(_dc, c -> cast(size(filter(_cs, x -> x = c)) AS DOUBLE)) AS _pc",
    )
    n = "cast(length(_lt) AS DOUBLE)"
    return staged.selectExpr(
        "doc_id",
        "cast(length(_lt) AS BIGINT) AS n_chars_total",
        "cast(size(_dc) AS BIGINT) AS n_distinct_chars",
        f"""-- ok-round: irrational (p*ln p entropy term)
           round(CASE WHEN length(_lt) > 0 THEN
              aggregate(_pc, cast(0.0 AS DOUBLE),
                        (acc, p) -> acc - (p / {n}) * log2(p / {n}))
              ELSE cast(0.0 AS DOUBLE) END, 4) AS char_entropy""",
        # r9 conversion (wave 3): digit count / char count — exact
        # truncating integer division at 4 dp
        """CASE WHEN length(_lt) > 0 THEN
              cast(((length(_lt) - length(regexp_replace(_lt, '[0-9]', '')))
                    * 10000) div length(_lt) AS DOUBLE) / 10000.0
              ELSE cast(0.0 AS DOUBLE) END AS digit_ratio""",
    )


DOC_CHAR_ENTROPY_SQL = """
WITH base AS (SELECT doc_id, lower(text) AS lt FROM documents),
cs AS (
    SELECT doc_id, lt,
           list_transform(range(1, length(lt) + 1), i -> lt[i:i]) AS cs
    FROM base
),
dc AS (SELECT doc_id, lt, cs, list_sort(list_distinct(cs)) AS dc FROM cs),
pc AS (
    SELECT doc_id, lt, dc,
           list_transform(dc, c -> CAST(len(list_filter(cs, x -> x = c)) AS DOUBLE)) AS pc
    FROM dc
)
SELECT doc_id,
       CAST(length(lt) AS BIGINT) AS n_chars_total,
       CAST(len(dc) AS BIGINT) AS n_distinct_chars,
       -- ok-round: irrational (p*ln p entropy term)
       round(CASE WHEN length(lt) > 0 THEN
             - list_sum(list_transform(pc,
                 p -> (p / CAST(length(lt) AS DOUBLE)) * log2(p / CAST(length(lt) AS DOUBLE))))
             ELSE CAST(0.0 AS DOUBLE) END, 4) AS char_entropy,
       CASE WHEN length(lt) > 0 THEN
             CAST(((length(lt) - length(regexp_replace(lt, '[0-9]', '', 'g')))
                   * 10000) // length(lt) AS DOUBLE) / 10000.0
             ELSE CAST(0.0 AS DOUBLE) END AS digit_ratio
FROM pc
"""


# ---------------------------------------------------------------------------
# docs_chunk_overlap

_CHUNK = 64
_STRIDE = 48


def docs_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking with overlap — the standard LLM
    context-window preprocessing step (chunk 64 tokens, stride 48, so
    consecutive chunks share 16 tokens).

    Pure map + generate (zero shuffles): chunk starts come from a
    per-row ``sequence``, the chunk itself is a token-array ``slice``.
    Chunk identity is an md5 over the joined tokens so downstream
    chunk-level dedup can run without re-materializing text.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", T.words(F.col("text")).alias("ws"))
    starts = F.when(
        F.size("ws") >= 1, F.sequence(F.lit(1), F.size("ws"), F.lit(_STRIDE))
    )
    # posexplode_outer + null filter: the InferFiltersFromGenerate
    # guard again (plain posexplode would push the tokenizer into the
    # scan as a single-partition predicate)
    chunk = F.slice(F.col("ws"), F.col("start"), _CHUNK)
    return (
        toks.select("doc_id", "ws", F.posexplode_outer(starts).alias("idx", "start"))
        .filter(F.col("start").isNotNull())
        .select(
            "doc_id",
            F.col("idx").cast("long").alias("chunk_idx"),
            F.col("start").cast("long").alias("start_token"),
            F.size(chunk).cast("long").alias("n_chunk_tokens"),
            F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
        )
    )


DOCS_CHUNK_OVERLAP_SQL = rf"""
WITH toks AS (SELECT doc_id, {_WS} AS ws FROM documents),
st AS (
    SELECT doc_id, ws, range(1, len(ws) + 1, {_STRIDE}) AS starts
    FROM toks WHERE len(ws) >= 1
),
ex AS (
    SELECT doc_id, ws,
           unnest(range(0, len(starts))) AS chunk_idx,
           unnest(starts) AS start
    FROM st
)
SELECT doc_id,
       CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start_token,
       CAST(len(ws[start:start + {_CHUNK - 1}]) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(ws[start:start + {_CHUNK - 1}], ' ')) AS chunk_hash
FROM ex
"""


# ---------------------------------------------------------------------------
# minhash_jaccard_estimate


def minhash_jaccard_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy QA: for every MinHash-LSH candidate pair, the
    signature-overlap Jaccard ESTIMATE next to the exact shingle-set
    Jaccard — the measurement you run before trusting a (k, bands)
    configuration on a new corpus.

    100 TB shape: the candidate pairs (LSH output, tiny vs corpus when
    the dup rate is healthy) are SIZE-GATED-broadcast back onto the
    shingle table twice, so the corpus-scale side never reshuffles and
    the exact intersection runs only on candidates. The gate
    (operators/_util.gate_broadcast: persist + count + row bound)
    replaces the previous unconditional hint — pair volume tracks
    corpus size × dup rate, so a hinted broadcast has no graceful
    failure mode at 100×; over the bound both joins fall back to a
    doc_id shuffle. Under the gate, BOTH joins stay hinted: the second
    join's left side (candidates enriched with sha) is
    candidate-sized, but Catalyst's size estimate for a join output is
    unknowable at 100 TB and a mis-estimate would flip it to a
    corpus-wide sort-merge shuffle (plan shape asserted in
    tests/test_plans.py::test_minhash_jaccard_corpus_never_shuffles).
    """
    d = load_table(spark, sf_dir, "documents")
    pairs, hinted = gate_broadcast(D.minhash_lsh_pairs(d, n=3, num_hashes=12, bands=6))
    sh = spread(d).select(
        "doc_id", T.shingles(F.col("text"), 3).alias("sh")
    )
    pa = sh.select(F.col("doc_id").alias("doc_id_a"), F.col("sh").alias("sha"))
    pb = sh.select(F.col("doc_id").alias("doc_id_b"), F.col("sh").alias("shb"))
    inter = F.size(F.array_intersect(F.col("sha"), F.col("shb")))
    enriched = pa.join(pairs, "doc_id_a")
    return (
        (broadcast(enriched) if hinted else enriched)
        .join(pb, "doc_id_b")
        .withColumn("_i", inter.cast("long"))
        .withColumn("_u", (F.size("sha") + F.size("shb")).cast("long") - F.col("_i"))
        .select(
            "doc_id_a",
            "doc_id_b",
            "est_jaccard",
            # r9 conversion (wave 3): exact integer Jaccard —
            # truncating integer division at 6 dp
            (F.expr("(_i * 1000000) div _u").cast("double") / 1e6).alias(
                "exact_jaccard"
            ),
        )
    )


MINHASH_JACCARD_EST_SQL = (
    _MINHASH_PAIRS_BODY
    + """
SELECT da AS doc_id_a, db AS doc_id_b,
       CAST((list_sum(list_transform(range(1, 13),
             i -> CASE WHEN sa[i] = sb[i] THEN 1 ELSE 0 END)) * 1000000)
            // 12 AS DOUBLE) / 1000000.0 AS est_jaccard,
       CAST((len(list_filter(x.sh, s -> list_contains(y.sh, s))) * 1000000)
            // (len(x.sh) + len(y.sh)
                - len(list_filter(x.sh, s -> list_contains(y.sh, s))))
            AS DOUBLE) / 1000000.0 AS exact_jaccard
FROM cand JOIN sh x ON cand.da = x.doc_id JOIN sh y ON cand.db = y.doc_id
"""
)


# ---------------------------------------------------------------------------
# events_value_zscore

_MILLI = 1000


def events_value_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type z-score outliers (|z| > 2.5) from EXACT integer
    moments.

    Float sum() of values and squares is partial-agg-order-dependent
    (the q9 trap, squared): instead values are quantized to exact
    milli-units, first moments summed as BIGINT and second moments as
    DECIMAL(38,0) (overflow headroom: 1e12 rows · (5·10⁵)² ≈ 2.5e23 —
    past BIGINT, nowhere near 38 digits). mean/var/σ then come from a
    fixed sequence of exact-input IEEE divisions, bit-stable at any
    parallelism in any engine. z is computed on the quantized value so
    the 2.5 threshold cuts identically everywhere.

    100 TB shape: one partial-agg shuffle on event_type (low
    cardinality, but the map-side combine reduces each partition to
    |types| rows first), stats broadcast back — no second shuffle.
    """
    e = spread(load_table(spark, sf_dir, "events"))
    vq = F.round(F.col("value") * _MILLI).cast("long")
    ev = e.select("event_id", "event_type", vq.alias("v_mu"))
    stats = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v_mu").alias("s1"),
        F.sum((F.col("v_mu") * F.col("v_mu")).cast("decimal(38,0)")).alias("s2"),
    )
    mean = F.col("s1").cast("double") / F.lit(float(_MILLI)) / F.col("n")
    ex2 = F.col("s2").cast("double") / F.lit(float(_MILLI * _MILLI)) / F.col("n")
    vqd = F.col("v_mu").cast("double") / F.lit(float(_MILLI))
    scored = (
        ev.join(broadcast(stats), "event_type")
        .withColumn("_mean", mean)
        .withColumn("_std", F.sqrt(ex2 - F.col("_mean") * F.col("_mean")))
        .filter(F.col("_std") > 0)
        .withColumn("_z", (vqd - F.col("_mean")) / F.col("_std"))
        .filter(F.abs(F.col("_z")) > 2.5)
    )
    return scored.select(
        "event_id",
        "event_type",
        F.col("v_mu").alias("value_milli"),
        F.round("_z", 4).alias("z"),
    )


EVENTS_VALUE_ZSCORE_SQL = f"""
WITH ev AS (
    SELECT event_id, event_type,
           CAST(round(value * {_MILLI}) AS BIGINT) AS v_mu
    FROM events
),
stats AS (
    SELECT event_type, count(*) AS n,
           sum(v_mu) AS s1,
           sum(v_mu * v_mu) AS s2
    FROM ev GROUP BY event_type
),
scored AS (
    SELECT ev.event_id, ev.event_type, ev.v_mu,
           CAST(s.s1 AS DOUBLE) / {float(_MILLI)} / s.n AS mean,
           sqrt(CAST(s.s2 AS DOUBLE) / {float(_MILLI * _MILLI)} / s.n
                - (CAST(s.s1 AS DOUBLE) / {float(_MILLI)} / s.n)
                  * (CAST(s.s1 AS DOUBLE) / {float(_MILLI)} / s.n)) AS std
    FROM ev JOIN stats s USING (event_type)
)
SELECT event_id, event_type, v_mu AS value_milli,
       -- ok-round: irrational (sqrt in the denominator)
       round((CAST(v_mu AS DOUBLE) / {float(_MILLI)} - mean) / std, 4) AS z
FROM scored
WHERE std > 0 AND abs((CAST(v_mu AS DOUBLE) / {float(_MILLI)} - mean) / std) > 2.5
"""


# ---------------------------------------------------------------------------
# embedding_kmeans_assign / ann_ivf_trained

_KM_K = 8
_KM_ITERS = 2
_DIM = 64


def embedding_kmeans_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed Lloyd's k-means (k=8, 2 update rounds, deterministic
    lowest-id seeds) over the embedding table; output is each vector's
    final cluster — integer-only, so the value hash is float-free.

    The oracle is the SAME algorithm UNROLLED into chained CTEs (one
    assignment + one centroid CTE per iteration) — possible only
    because every step is bit-stable: exact integer component sums,
    fixed division sequence, lockstep distance accumulation, (dist,
    cluster) tie-break. See operators/clustering.py for the contract.
    """
    from distributed_file_system_with_stream_processing_spark.operators import clustering as C

    return C.kmeans_assign(
        load_table(spark, sf_dir, "embeddings"), k=_KM_K, iters=_KM_ITERS, dim=_DIM
    )


def _km_dist(v: str, cv: str) -> str:
    return (
        f"list_sum(list_transform(range(1, {_DIM + 1}), "
        f"i -> ({v}[i] - {cv}[i]) * ({v}[i] - {cv}[i])))"
    )


def _kmeans_oracle_parts(k: int | str, iters: int, e_where: str = "") -> list[str]:
    """The unrolled-Lloyd CTE chain ending in ``fin(vec_id, v, c)`` —
    shared by the kmeans-assign oracle, llm_ops3's SemDeDup-over-
    cells oracle, and the trained-IVF ANN oracle (same bit-stable
    pipeline, different epilogue). ``e_where`` restricts the training
    set (the IVF path trains on base vectors only); the final
    centroid CTE is named ``c{iters}`` for epilogues that need it.

    ``k`` may be a SQL scalar-subquery string (e.g. the ⌈√n⌉ rule the
    kNN-graph family uses so cell count scales with the corpus); only
    the seed CTE depends on k, so the rest of the chain is unchanged —
    assignment cross-joins whatever seed rows exist."""
    sums = ", ".join(
        f"sum(CAST(round(v[{i + 1}] * 1000000) AS BIGINT)) AS s{i}"
        for i in range(_DIM)
    )
    means = ", ".join(f"CAST(s{i} AS DOUBLE) / 1000000.0 / n" for i in range(_DIM))

    def assign(name: str, cents: str) -> str:
        return f"""{name} AS (
    SELECT vec_id, v, c FROM (
        SELECT e.vec_id, e.v, s.c,
               row_number() OVER (PARTITION BY e.vec_id
                                  ORDER BY {_km_dist('e.v', 's.v')}, s.c) AS rn
        FROM e CROSS JOIN {cents} s)
    WHERE rn = 1)"""

    if isinstance(k, str):
        seed = f"""seed AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
    FROM e
    QUALIFY row_number() OVER (ORDER BY vec_id) <= ({k}))"""
    else:
        seed = f"""seed AS (
    SELECT row_number() OVER (ORDER BY vec_id) - 1 AS c, v
    FROM (SELECT vec_id, v FROM e ORDER BY vec_id LIMIT {k}))"""
    parts = [
        f"WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings{e_where})",
        seed,
    ]
    cents = "seed"
    for t in range(iters):
        parts.append(assign(f"a{t}", cents))
        parts.append(
            f"u{t} AS (SELECT c, count(*) AS n, {sums} FROM a{t} GROUP BY c)"
        )
        parts.append(
            f"""c{t + 1} AS (
    SELECT {cents}.c,
           CASE WHEN u{t}.n IS NULL THEN {cents}.v ELSE [{means}] END AS v
    FROM {cents} LEFT JOIN u{t} USING (c))"""
        )
        cents = f"c{t + 1}"
    parts.append(assign("fin", cents))
    return parts


def _kmeans_oracle_sql(k: int, iters: int) -> str:
    return (
        ",\n".join(_kmeans_oracle_parts(k, iters))
        + "\nSELECT vec_id, CAST(c AS BIGINT) AS cluster FROM fin"
    )


EMBEDDING_KMEANS_SQL = _kmeans_oracle_sql(_KM_K, _KM_ITERS)


def ann_ivf_trained(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN over TRAINED (k-means) cells — see
    operators/clustering.ivf_trained_ann. Fully oracled: the DuckDB
    twin chains the unrolled-Lloyd CTE (trained on base vectors only,
    the same lowest-id seeds / exact-integer-sum updates) into the
    probe-3 cell join and exact cosine re-rank, so the driver hash
    covers training, cell assignment, probing, and ranking end to
    end. Recall@5 vs the exact baseline stays pinned in
    tests/test_ann.py.

    r8: the top-k table is a session-persisted backbone
    (plans/_backbones.ivf_topk — centroids train once per (session,
    sf_dir) and ``ann_recall_audit`` grades the same
    materialization)."""
    from distributed_file_system_with_stream_processing_spark.plans import _backbones as B

    return B.ivf_topk(spark, sf_dir)


def _ivf_trained_oracle_sql() -> str:
    """Unrolled-Lloyd (base-only training) chained into probe-3 cell
    join + exact cosine top-5 — the full ivf_trained_ann pipeline as
    one DuckDB statement. Tie-breaks mirror the engine exactly:
    assignment/probing order by (dist, cell), ranking by (-sim,
    neighbor_id)."""
    dot = "list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i]))"
    parts = _kmeans_oracle_parts(16, _KM_ITERS, e_where=" WHERE vec_id >= 10")
    return (
        ",\n".join(parts)
        + f""",
qp AS (
    SELECT query_id, qv, cell FROM (
        SELECT q.vec_id AS query_id, q.v AS qv, s.c AS cell,
               row_number() OVER (PARTITION BY q.vec_id
                                  ORDER BY {_km_dist('q.v', 's.v')}, s.c) AS rn
        FROM (SELECT vec_id, embedding::DOUBLE[] AS v
              FROM embeddings WHERE vec_id < 10) q
        CROSS JOIN c{_KM_ITERS} s)
    WHERE rn <= 3),
bc AS (SELECT vec_id AS neighbor_id, v AS bv, c AS cell FROM fin),
sim AS (
    SELECT query_id, neighbor_id,
           {dot.format(a='qv', b='bv')} /
           (sqrt({dot.format(a='qv', b='qv')}) * sqrt({dot.format(a='bv', b='bv')})) AS s
    FROM qp JOIN bc USING (cell)),
rk AS (
    SELECT query_id, neighbor_id, s,
           row_number() OVER (PARTITION BY query_id
                              ORDER BY s DESC, neighbor_id ASC) AS rank
    FROM sim)
SELECT query_id, neighbor_id, round(s, 6) AS sim, CAST(rank AS BIGINT) AS rank
FROM rk WHERE rank <= 5
"""
    )


ANN_IVF_TRAINED_SQL = _ivf_trained_oracle_sql()


# ---------------------------------------------------------------------------
# doc_winnowing_fingerprint

_WIN_K = 3  # words per gram
_WIN_W = 4  # gram hashes per winnowing window


def doc_winnowing_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing document fingerprints (Schleimer/Wilkerson/Aiken,
    SIGMOD'03 — the MOSS algorithm): hash every ``_WIN_K``-word gram,
    slide a ``_WIN_W``-hash window, keep each window's MINIMUM hash.
    Guarantees: any shared run of >= K + W - 1 words between two docs
    yields >= 1 shared fingerprint, while selecting only ~2/(W+1) of
    the hashes — the local, position-robust dedup signal that plain
    MinHash (global, order-blind) can't give.

    Pure map + generate, zero shuffles; output is exploded
    (doc_id, fp) DISTINCT-per-doc rows, ready for a fingerprint
    equi-join (same downstream shape as the LSH band join — uniform
    64-bit-ish key, scale-safe). hash32 is the repo's portable md5
    prefix, so the oracle winnows bit-identically.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    # the short-doc guard is a CASE inside T.winnow_fingerprints, NOT
    # a .filter(size >= W): an explicit filter on a derived column
    # gets pushed below the spread repartition into the scan with the
    # whole tokenizer expression inlined as a single-partition scan
    # predicate (the InferFiltersFromGenerate-class pathology —
    # guarded by test_no_heavy_expressions_in_scan_predicates). The
    # expression is shared with the streaming twin
    # (tests/test_rainstorm_streaming.py) — same column math in both.
    staged = (
        d.select("doc_id", T.words(F.col("text")).alias("ws"))
        .select("doc_id", T.gram_hashes(F.col("ws"), _WIN_K).alias("hs"))
        .select(
            "doc_id",
            T.winnow_from_hashes(F.col("hs"), _WIN_W).alias("fps"),
        )
    )
    # explode_outer + null filter: the InferFiltersFromGenerate guard
    # (see dedup._exploded_shingles)
    return (
        staged.select("doc_id", F.explode_outer("fps").alias("fp"))
        .filter(F.col("fp").isNotNull())
    )


DOC_WINNOWING_SQL = rf"""
WITH t AS (SELECT doc_id, {_WS} AS ws FROM documents),
g AS (
    SELECT doc_id,
           list_transform(range(1, len(ws) - {_WIN_K - 2}),
               i -> ('0x' || substr(md5(array_to_string(ws[i:i+{_WIN_K - 1}], ' ')), 1, 8))::BIGINT) AS hs
    FROM t WHERE len(ws) >= {_WIN_K}
),
w AS (
    SELECT doc_id,
           list_distinct(list_transform(range(1, len(hs) - {_WIN_W - 2}),
               j -> list_min(hs[j:j+{_WIN_W - 1}]))) AS fps
    FROM g WHERE len(hs) >= {_WIN_W}
)
SELECT doc_id, unnest(fps) AS fp FROM w
"""


# ---------------------------------------------------------------------------
# embedding_norm_stats

_NORM_MILLI = 1000


def embedding_norm_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label embedding QA: vector count, mean squared norm, and
    degenerate (near-zero-norm) count — the sanity gate before any
    cosine-based pipeline stage (a zero vector makes cosine undefined;
    a drifting norm distribution flags a broken encoder shard).

    Exactness: components quantize to milli-units, per-vector squared
    norm is an integer ``aggregate``, label sums go through
    DECIMAL(38,0) (headroom: 1e12 vectors × 64·(1.5e3)² ≈ 1.4e20 —
    past BIGINT, 18 digits clear of 38), and the near-zero test is a
    pure integer compare (norm² < 0.01 ⇔ milli-sum < 1e4). One
    low-cardinality partial-agg shuffle; nothing else moves.
    """
    e = spread(load_table(spark, sf_dir, "embeddings"))
    q = lambda x: F.round(x.cast("double") * _NORM_MILLI).cast("long")
    sq = F.aggregate(
        F.col("embedding"),
        F.lit(0).cast("long"),
        lambda acc, x: acc + q(x) * q(x),
    )
    per_vec = e.select("label", sq.alias("_sq"))
    return (
        per_vec.groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum(F.col("_sq").cast("decimal(38,0)")).alias("_s"),
            F.sum(
                F.when(F.col("_sq") < _NORM_MILLI * _NORM_MILLI // 100, 1).otherwise(0)
            ).alias("n_near_zero"),
        )
        .select(
            F.col("label").cast("long").alias("label"),
            "n_vecs",
            # r9 conversion (wave 3): Σsq/(10⁶·n) at 6 dp is the
            # exact rational (Σsq div n)/10⁶ — truncating integer
            # division on the milli²-quantized sums
            (F.expr("_s div n_vecs").cast("double") / 1e6).alias(
                "mean_sq_norm"
            ),
            "n_near_zero",
        )
    )


EMBEDDING_NORM_STATS_SQL = f"""
WITH pv AS (
    SELECT label,
           list_sum(list_transform(embedding::DOUBLE[],
               x -> CAST(round(x * {_NORM_MILLI}) AS BIGINT)
                    * CAST(round(x * {_NORM_MILLI}) AS BIGINT))) AS sq
    FROM embeddings
)
SELECT CAST(label AS BIGINT) AS label,
       count(*) AS n_vecs,
       CAST(sum(sq) // count(*) AS DOUBLE) / 1000000.0 AS mean_sq_norm,
       CAST(sum(CASE WHEN sq < {_NORM_MILLI * _NORM_MILLI // 100} THEN 1 ELSE 0 END)
           AS BIGINT) AS n_near_zero
FROM pv GROUP BY label
"""


# ---------------------------------------------------------------------------
# semantic_dedup


_SEM_DEDUP_BUCKET_CAP = 50


def semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023): for
    every vector, its semantic-duplicate group and whether it is the
    group's canonical representative. Composition of two scale paths
    already proven separately: banded sign-LSH near-dup pairs
    (embedding_neardup's plan — band equi-join, no all-pairs) →
    large-star/small-star connected components (diameter-independent)
    → keep = lowest vec_id per component; singletons are their own
    cluster via the left join + coalesce, so the output covers the
    WHOLE table (the downstream filter is just ``WHERE keep``).

    Pair-blowup bound: candidate generation runs with the band-bucket
    cap (the shingle df≤50 stance applied to sign-LSH buckets): a
    bucket pair is generated only if its lower-id member is among the
    bucket's ``_SEM_DEDUP_BUCKET_CAP`` lowest ids, so per-bucket
    fan-out is ≤ cap·|bucket| — LINEAR in bucket size, the minimum
    that keeps every member attached — instead of C(|bucket|,2): the
    10× rehearsal's mirrored replicas inflated uncapped pairs 311×
    (21.7× wall) precisely because replica floods share every band.
    Connectivity on true-duplicate floods is preserved (every member
    still pairs with representative #1 at cosine 1, so the CC and the
    keep-list are UNCHANGED for exact-dup floods); recall vs the
    uncapped twin is pinned on planted fixtures (tests/test_ann.py).

    Oracle: the capped near-dup candidate body + recursive-CTE
    transitive closure, the dedup_clusters pattern on embedding pairs.
    """
    from distributed_file_system_with_stream_processing_spark.operators import dedup as D
    from distributed_file_system_with_stream_processing_spark.operators import similarity as S

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = S.banded_neardup_pairs(
        emb, threshold=0.35, bands=8, rows_per_band=8, dim=64,
        bucket_cap=_SEM_DEDUP_BUCKET_CAP,
    )
    cc = D.connected_components(pairs, src="id_a", dst="id_b")
    return (
        emb.select("vec_id")
        .join(cc, F.col("vec_id") == F.col("node"), "left")
        .select(
            "vec_id",
            F.coalesce("cluster_id", F.col("vec_id")).cast("long").alias("cluster_id"),
        )
        .withColumn("keep", F.col("vec_id") == F.col("cluster_id"))
    )


def _semantic_dedup_sql() -> str:
    from distributed_file_system_with_stream_processing_spark.plans.llm_ops import (
        _banded_neardup_body,
    )

    body = _banded_neardup_body(bucket_cap=_SEM_DEDUP_BUCKET_CAP)
    return (
        body.replace("WITH e AS", "WITH RECURSIVE e AS", 1)
        + """,
pairs AS (SELECT id_a, id_b FROM s WHERE sim >= CAST(0.35 AS DOUBLE)),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b AS a, id_a AS b FROM pairs),
reach(node, r) AS (
    SELECT a, a FROM edges
    UNION
    SELECT reach.node, e2.b FROM reach JOIN edges e2 ON reach.r = e2.a
),
cc AS (SELECT node, min(r) AS cluster_id FROM reach GROUP BY node)
SELECT e.vec_id,
       CAST(coalesce(cc.cluster_id, e.vec_id) AS BIGINT) AS cluster_id,
       coalesce(cc.cluster_id, e.vec_id) = e.vec_id AS keep
FROM e LEFT JOIN cc ON e.vec_id = cc.node
"""
    )


SEMANTIC_DEDUP_SQL = _semantic_dedup_sql()


# ---------------------------------------------------------------------------
# docs_gopher_rules

_GOPHER_STOP = ("the", "a", "and", "of", "to", "in", "is")


def docs_gopher_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition-free quality rules (Rae et al. 2021,
    "Scaling Language Models: ... Gopher", Appendix A1.1) adapted to
    the portable-arithmetic contract: word-count bounds, mean word
    length bounds, alphabetic-word ratio, and stopword presence, plus
    the combined pass flag a pretraining filter would gate on.

    Every ratio is exact-int / exact-int with ONE double division
    (sum of token lengths and alphabetic-token counts are integers),
    so the twins agree bit-for-bit. Pure map, zero shuffles — the
    same shape Gopher's filter runs at corpus scale.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    ws = T.words(F.col("text"))
    staged = d.select(
        "doc_id",
        F.size(ws).cast("long").alias("n_words"),
        F.aggregate(
            ws, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
        ).alias("_len_sum"),
        F.size(
            F.filter(ws, lambda w: F.lower(w).rlike("[a-z]"))
        ).cast("long").alias("_n_alpha"),
        F.size(
            F.filter(ws, lambda w: F.lower(w).isin(*_GOPHER_STOP))
        ).cast("long").alias("n_stopwords"),
    )
    mwl = F.col("_len_sum").cast("double") / F.col("n_words")
    alpha = F.col("_n_alpha").cast("double") / F.col("n_words")
    return (
        staged.filter(F.col("n_words") > 0)
        .select(
            "doc_id",
            "n_words",
            # r9 conversion (wave 3): exact truncating integer
            # division at 4 dp (the boolean gate below keeps the raw
            # single IEEE division — a comparison of one
            # correctly-rounded quotient is bit-stable across
            # engines; only round(quotient) was exposure)
            (F.expr("(_len_sum * 10000) div n_words").cast("double") / 1e4)
            .alias("mean_word_len"),
            (F.expr("(_n_alpha * 10000) div n_words").cast("double") / 1e4)
            .alias("alpha_word_ratio"),
            "n_stopwords",
            (
                F.col("n_words").between(15, 100000)
                & mwl.between(3.0, 10.0)
                & (alpha >= 0.8)
                & (F.col("n_stopwords") >= 2)
            ).alias("passes"),
        )
    )


DOCS_GOPHER_RULES_SQL = rf"""
WITH t AS (SELECT doc_id, {_WS} AS ws FROM documents),
c AS (
    SELECT doc_id,
           CAST(len(ws) AS BIGINT) AS n_words,
           CAST(list_sum(list_transform(ws, w -> length(w))) AS BIGINT) AS len_sum,
           CAST(len(list_filter(ws, w -> regexp_matches(lower(w), '[a-z]'))) AS BIGINT)
               AS n_alpha,
           CAST(len(list_filter(ws, w -> list_contains(
               {list(_GOPHER_STOP)!r}, lower(w)))) AS BIGINT) AS n_stopwords
    FROM t WHERE len(ws) > 0
)
SELECT doc_id, n_words,
       CAST((len_sum * 10000) // n_words AS DOUBLE) / 10000.0 AS mean_word_len,
       CAST((n_alpha * 10000) // n_words AS DOUBLE) / 10000.0 AS alpha_word_ratio,
       n_stopwords,
       (n_words BETWEEN 15 AND 100000
        AND CAST(len_sum AS DOUBLE) / n_words BETWEEN 3.0 AND 10.0
        AND CAST(n_alpha AS DOUBLE) / n_words >= 0.8
        AND n_stopwords >= 2) AS passes
FROM c
"""


def docs_gopher_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Gopher-gate acceptance matrix: how many docs each
    source contributes and what fraction survives the quality gate —
    the dashboard a data-mixing owner reads before re-weighting
    sources (a source whose acceptance collapses is broken upstream).

    Reuses docs_gopher_rules' exact per-doc gate, then ONE
    low-cardinality shuffle on source; share = exact-int / exact-int
    with one double division. The per-doc stage stays a pure map.
    """
    gated = docs_gopher_rules(spark, sf_dir)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "source")
    return (
        gated.join(d, "doc_id")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("passes"), 1).otherwise(0)).alias("n_pass"),
        )
        .select(
            "source",
            "n_docs",
            "n_pass",
            # r9 conversion (wave 3): truncating integer division
            (F.expr("(n_pass * 10000) div n_docs").cast("double") / 1e4)
            .alias("pass_share"),
        )
    )


# the per-doc gate SQL, wrapped as a subquery so the matrix oracle
# reuses the EXACT same rule arithmetic
DOCS_GOPHER_BY_SOURCE_SQL = rf"""
WITH g AS ({DOCS_GOPHER_RULES_SQL}),
j AS (SELECT g.doc_id, g.passes, d.source
      FROM g JOIN documents d ON g.doc_id = d.doc_id)
SELECT source,
       count(*) AS n_docs,
       CAST(sum(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT) AS n_pass,
       CAST((sum(CASE WHEN passes THEN 1 ELSE 0 END) * 10000) // count(*)
            AS DOUBLE) / 10000.0 AS pass_share
FROM j GROUP BY source
"""


def docs_neardup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplication rate per source — the dedup-QA dashboard
    sibling of docs_gopher_by_source: what fraction of each source's
    docs appear in at least one MinHash-LSH candidate pair. A source
    whose dup share spikes is re-crawling or mirroring content; the
    mixing owner down-weights it before training.

    Scale shape: the pair list is LSH output (tiny vs corpus when the
    dup rate is healthy); its distinct member ids are SIZE-GATED-
    broadcast into the documents join (operators/_util.gate_broadcast —
    over the row bound the hint drops and the join falls back to a
    doc_id shuffle, the graceful path for a pathological dup rate),
    and the final agg is one low-cardinality shuffle — the
    corpus-scale documents table never reshuffles beyond the LSH pass
    itself.
    """
    d = load_table(spark, sf_dir, "documents")
    pairs = D.minhash_lsh_pairs(d, n=3, num_hashes=12, bands=6)
    members, _ = gate_broadcast(
        pairs.select(F.col("doc_id_a").alias("doc_id"))
        .unionByName(pairs.select(F.col("doc_id_b").alias("doc_id")))
        .distinct()
        .withColumn("_dup", F.lit(1))
    )
    return (
        d.select("doc_id", "source")
        .join(members, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.coalesce(F.col("_dup"), F.lit(0))).alias("n_dup"),
        )
        .select(
            "source",
            "n_docs",
            "n_dup",
            # r9 conversion (wave 3): truncating integer division
            (F.expr("(n_dup * 10000) div n_docs").cast("double") / 1e4)
            .alias("dup_share"),
        )
    )


NEARDUP_RATE_BY_SOURCE_SQL = (
    _MINHASH_PAIRS_BODY
    + """,
members AS (SELECT DISTINCT doc_id FROM (
    SELECT da AS doc_id FROM cand UNION ALL SELECT db AS doc_id FROM cand)),
j AS (
    SELECT d.source, CASE WHEN m.doc_id IS NULL THEN 0 ELSE 1 END AS dup
    FROM documents d LEFT JOIN members m ON d.doc_id = m.doc_id)
SELECT source, count(*) AS n_docs, CAST(sum(dup) AS BIGINT) AS n_dup,
       CAST((sum(dup) * 10000) // count(*) AS DOUBLE) / 10000.0 AS dup_share
FROM j GROUP BY source
"""
)


# ---------------------------------------------------------------------------
# docs_unigram_perplexity

_PPL_MICRO = 1_000_000


def docs_unigram_perplexity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document perplexity under a corpus-trained unigram LM — the
    CCNet-style quality signal (Wenzek et al. 2020 score with a KenLM
    5-gram; the unigram variant keeps the identical pipeline shape
    with no external model): low perplexity ≈ in-distribution prose,
    high ≈ gibberish/outliers.

    Float-determinism: summing tf·log p(w) per doc is the q9 trap
    (partial-agg-order-dependent), so each term's log-prob quantizes
    ONCE to exact micro-units — l_mu = the rounded log(count/N)·1e6 quantization as
    BIGINT, identical in any engine — and the per-doc reduction is an
    exact integer sum. ppl = exp(−Σ tf·l_mu / 1e6 / n_tokens): a
    fixed sequence of exact-input IEEE ops, bit-stable at any
    parallelism.

    100 TB shape: (doc, term) partial agg [shuffle 1, the tfidf
    backbone], term counts [shuffle 2, high-cardinality key],
    term-keyed join back, per-doc integer sum [shuffle 3 on doc_id].
    The corpus total is a 1-row BuildRight broadcast (the tfidf/q11
    allow-listed shape).
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = d.select("doc_id", T.words(F.col("text")).alias("ws"))
    ex = (
        toks.select("doc_id", F.explode_outer("ws").alias("w"))
        .filter(F.col("w").isNotNull())
        .select("doc_id", F.lower(F.col("w")).alias("term"))
    )
    # r10 optimization: the old (doc, term) tf aggregate fed two
    # consumers (term rollup + scoring join) and per-branch pruning
    # re-ran the corpus explode for each. The per-doc statistic only
    # needs per-TOKEN log-probs — Σ tf·l_mu ≡ Σ_token l_mu and
    # Σ tf ≡ count(*), exact integers either way — so ONE vocab-scale
    # term-count table (size-gated broadcast: hinted under the row
    # gate, key-shuffle fallback above) scores tokens directly. The
    # corpus-scale (doc, term) Exchange is gone at any scale.
    from distributed_file_system_with_stream_processing_spark.operators._util import (
        gate_broadcast,
    )

    ct = ex.groupBy("term").agg(F.count(F.lit(1)).alias("ctot"))
    ct, _ = gate_broadcast(ct)
    n_tot = ct.agg(F.sum("ctot").alias("n_corpus"))
    # ok-round: irrational (ln) quantization
    l_mu = F.round(
        F.log(F.col("ctot").cast("double") / F.col("n_corpus")) * _PPL_MICRO
    ).cast("long")
    scored = (
        ex.join(ct, "term")
        .crossJoin(broadcast(n_tot))
        .select("doc_id", l_mu.alias("_l"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_tokens"), F.sum("_l").alias("_s"))
    )
    ppl = F.exp(
        -(F.col("_s").cast("double") / _PPL_MICRO) / F.col("n_tokens")
    )
    return scored.select(
        "doc_id", "n_tokens", F.round(ppl, 4).alias("perplexity")
    )


DOCS_UNIGRAM_PPL_SQL = rf"""
WITH toks AS (SELECT doc_id, {_WS} AS ws FROM documents),
ex AS (SELECT doc_id, lower(unnest(ws)) AS term FROM toks),
tf AS (SELECT doc_id, term, count(*) AS tf FROM ex GROUP BY doc_id, term),
ct AS (SELECT term, sum(tf) AS ctot FROM tf GROUP BY term),
n AS (SELECT sum(ctot) AS n_corpus FROM ct),
scored AS (
    SELECT tf.doc_id, tf.tf,
           -- ok-round: irrational (ln) quantization
           tf.tf * CAST(round(ln(CAST(ct.ctot AS DOUBLE) / n.n_corpus)
                              * {_PPL_MICRO}) AS BIGINT) AS tl
    FROM tf JOIN ct USING (term) CROSS JOIN n
),
agg AS (
    SELECT doc_id, sum(tf) AS n_tokens, sum(tl) AS s
    FROM scored GROUP BY doc_id
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       -- ok-round: irrational (exp/ln family)
       round(exp(-(CAST(s AS DOUBLE) / {_PPL_MICRO}) / n_tokens), 4) AS perplexity
FROM agg
"""


# ---------------------------------------------------------------------------
# multimodal_audio_stats


def multimodal_audio_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal AUDIO decode path as a driver-checked query —
    the audio twin of multimodal_image_stats. The stub codec tiles 16
    md5 bytes into 1024 pseudo-samples and computes REAL feature math
    (rms, zero-crossing rate) in numpy over Arrow batches; because
    1024 is an exact multiple of the 16-byte period, both features
    reduce to closed forms over the byte pattern that the oracle
    reproduces in SQL (rms = mean over the 16 bytes; zero-crossings =
    64·(in-period sign changes) + 63·(wraparound change), over 1023
    diffs) — the pandas-UDF stage is value-hash-verified end to end.
    """
    from distributed_file_system_with_stream_processing_spark.operators import multimodal as M

    media = M.media_from_documents(load_table(spark, sf_dir, "documents"))
    feats = M.audio_features(media)
    return feats.select(
        "media_id",
        "duration_ms",
        "sample_rate",
        F.round("rms", 4).alias("rms"),
        F.round("zero_cross", 4).alias("zero_cross"),
    )


MULTIMODAL_AUDIO_STATS_SQL = """
WITH b AS (
    SELECT doc_id AS media_id,
           CAST((length(text) % 50 + 1) * 1000 AS INT) AS duration_ms,
           list_transform(range(0, 16),
               i -> ('0x' || substr(md5(text), CAST(i*2+1 AS INT), 2))::BIGINT) AS bys
    FROM documents WHERE doc_id % 3 = 1
),
s AS (
    SELECT media_id, duration_ms,
           list_transform(bys, x -> (CAST(x AS DOUBLE) - 127.5) / 127.5) AS sm,
           list_transform(bys, x -> CASE WHEN x >= 128 THEN 1 ELSE -1 END) AS sg
    FROM b
),
f AS (
    SELECT media_id, duration_ms,
           sqrt(list_sum(list_transform(sm, v -> v * v)) / 1024.0 * 64.0) AS rms,
           (64.0 * list_sum(list_transform(range(1, 16),
                j -> CASE WHEN sg[CAST(j AS INT)] <> sg[CAST(j AS INT) + 1]
                          THEN 1 ELSE 0 END))
            + 63.0 * (CASE WHEN sg[16] <> sg[1] THEN 1 ELSE 0 END)) / 1023.0 AS zc
    FROM s
)
SELECT media_id, duration_ms, CAST(16000 AS INT) AS sample_rate,
       round(rms, 4) AS rms, round(zc, 4) AS zero_cross
FROM f
"""


QUERIES = {
    "tfidf_top_terms": tfidf_top_terms,
    "doc_char_entropy": doc_char_entropy,
    "docs_chunk_overlap": docs_chunk_overlap,
    "minhash_jaccard_estimate": minhash_jaccard_estimate,
    "events_value_zscore": events_value_zscore,
    "embedding_kmeans_assign": embedding_kmeans_assign,
    "ann_ivf_trained": ann_ivf_trained,
    "doc_winnowing_fingerprint": doc_winnowing_fingerprint,
    "embedding_norm_stats": embedding_norm_stats,
    "semantic_dedup": semantic_dedup,
    "docs_gopher_rules": docs_gopher_rules,
    "docs_gopher_by_source": docs_gopher_by_source,
    "docs_unigram_perplexity": docs_unigram_perplexity,
    "docs_neardup_rate_by_source": docs_neardup_rate_by_source,
    "multimodal_audio_stats": multimodal_audio_stats,
}

ORACLES = {
    "embedding_kmeans_assign": EMBEDDING_KMEANS_SQL,
    "ann_ivf_trained": ANN_IVF_TRAINED_SQL,
    "tfidf_top_terms": TFIDF_TOP_TERMS_SQL,
    "doc_char_entropy": DOC_CHAR_ENTROPY_SQL,
    "docs_chunk_overlap": DOCS_CHUNK_OVERLAP_SQL,
    "minhash_jaccard_estimate": MINHASH_JACCARD_EST_SQL,
    "events_value_zscore": EVENTS_VALUE_ZSCORE_SQL,
    "doc_winnowing_fingerprint": DOC_WINNOWING_SQL,
    "embedding_norm_stats": EMBEDDING_NORM_STATS_SQL,
    "semantic_dedup": SEMANTIC_DEDUP_SQL,
    "docs_gopher_rules": DOCS_GOPHER_RULES_SQL,
    "docs_gopher_by_source": DOCS_GOPHER_BY_SOURCE_SQL,
    "docs_unigram_perplexity": DOCS_UNIGRAM_PPL_SQL,
    "docs_neardup_rate_by_source": NEARDUP_RATE_BY_SOURCE_SQL,
    "multimodal_audio_stats": MULTIMODAL_AUDIO_STATS_SQL,
}
