"""Round-6 batch I: corpus-profiling screens a curation pipeline runs
before committing to a training mix — stopword/sentence shape, hapax
mass, repetitiveness, prefix/casefold duplication.

Same contract as ``llm_ops``…``llm_ops9``: declarative DataFrame plans
(JVM expressions only) with DuckDB oracles mirroring the exact
arithmetic, so value hashes match without tolerances.

Ops here (all oracled):
- ``docs_stopword_profile`` — per-lang histogram of stopword-ratio
  deciles, integer-only (the bin is exact integer floor division
  n_stop·10 // n_tokens, never a float compare).
- ``docs_hapax_by_source`` — per-source vocabulary size, hapax count
  and hapax share (Zipf's low-frequency tail mass — a source whose
  vocabulary is mostly hapax is OCR noise or boilerplate-free prose;
  one whose hapax share collapses is template spam).
- ``docs_compression_proxy`` — per-source distinct/total char-4-gram
  ratio, the cheap stand-in for a compression-ratio quality gate
  (low ratio = repetitive = compresses well = likely boilerplate).
- ``docs_prefix_dup_rate`` — per-source share of docs whose 32-char
  normalized prefix collides with another doc in the source (the
  crawler-boilerplate screen exact-dup misses when tails differ).
- ``docs_casefold_dup_lift`` — how many MORE docs become duplicates
  under casefold+whitespace normalization than under raw equality —
  prices the normalization step of the exact-dedup pass.
- ``docs_sentence_length_profile`` — per-lang histogram of sentence
  lengths in 5-token bands (the prose-vs-list shape screen: listy
  sources pile into band 0).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from distributed_file_system_with_stream_processing_spark.functions import text as T
from distributed_file_system_with_stream_processing_spark.operators._util import spread
from distributed_file_system_with_stream_processing_spark.plans.llm_ops import _WS
from distributed_file_system_with_stream_processing_spark.sources.tables import load_table

_STOP_SQL = "['the','a','and','of','to','in','is']"

# ---------------------------------------------------------------------------
# docs_stopword_profile


def docs_stopword_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language decile histogram of the stopword ratio — the
    cheap fluency screen's DISTRIBUTION, not just its mean: prose
    piles around deciles 2-4, keyword-stuffed or non-linguistic text
    sits at 0, template chrome spikes high.

    Exactness: the decile is exact integer floor division
    ``least(n_stop·10 // n_tokens, 9)`` on two integer counts — no
    float ever enters, so the output is integer-only (0-token docs
    pin to decile 0, the no-NULL contract).

    100 TB shape: one narrow map over the scan (two sizes per doc)
    + a (lang, decile) rollup — metadata-scale output, no joins.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    ws = T.words(F.col("text"))
    n_tok = F.size(ws).cast("long")
    n_stop = F.size(
        F.filter(ws, lambda w: F.lower(w).isin(*T.STOPWORDS))
    ).cast("long")
    dec = F.when(
        n_tok > 0, F.least(F.floor(n_stop * 10 / n_tok), F.lit(9))
    ).otherwise(F.lit(0))
    return (
        d.select("lang", dec.cast("long").alias("decile"))
        .groupBy("lang", "decile")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


DOCS_STOPWORD_PROFILE_SQL = rf"""
WITH t AS (SELECT lang, {_WS} AS ws FROM documents),
c AS (
    SELECT lang, len(ws) AS n_tok,
           len(list_filter(ws, w -> list_contains({_STOP_SQL}, lower(w)))) AS n_stop
    FROM t
)
SELECT lang,
       CAST(CASE WHEN n_tok > 0 THEN least(n_stop * 10 // n_tok, 9) ELSE 0 END
            AS BIGINT) AS decile,
       CAST(count(*) AS BIGINT) AS n_docs
FROM c GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# docs_hapax_by_source


def docs_hapax_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary size, hapax-legomena count (terms seen
    exactly once in the source) and hapax share — the Zipf tail-mass
    screen: healthy prose keeps a fat hapax share; template spam's
    collapses, OCR noise inflates it past ~0.7.

    Exactness: term frequencies and both counts are exact integers
    (lower-cased whitespace tokens, the corpus tokenizer); the share
    divides once at 6 dp. vocab > 0 whenever the source has any
    token, and sources with NO tokens produce no row in either
    engine (GROUP BY over an empty term set) — no NULL path.

    100 TB shape: one (source, term) partial-agg shuffle (map-side
    combine eats the Zipf head), then a source rollup of the
    (source, term) table — the same two-shuffle economics as
    source_token_entropy.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    ex = (
        d.select("source", F.explode_outer(T.words(F.col("text"))).alias("w"))
        .filter(F.col("w").isNotNull())
        .select("source", F.lower(F.col("w")).alias("term"))
    )
    tf = ex.groupBy("source", "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.groupBy("source").agg(
        F.count(F.lit(1)).alias("vocab"),
        F.sum(F.when(F.col("tf") == 1, 1).otherwise(0)).alias("hapax"),
    ).select(
        "source",
        "vocab",
        "hapax",
        # r8 conversion: exact truncating integer-division rate
        (F.expr("(hapax * 1000000) div vocab").cast("double") / 1e6).alias(
            "hapax_share"
        ),
    )


DOCS_HAPAX_SQL = rf"""
WITH t AS (SELECT source, {_WS} AS ws FROM documents),
ex AS (SELECT source, lower(unnest(ws)) AS term FROM t),
tf AS (SELECT source, term, count(*) AS tf FROM ex GROUP BY source, term)
SELECT source,
       CAST(count(*) AS BIGINT) AS vocab,
       CAST(sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) AS BIGINT) AS hapax,
       CAST((sum(CASE WHEN tf = 1 THEN 1 ELSE 0 END) * 1000000)
            // count(*) AS DOUBLE) / 1000000.0 AS hapax_share
FROM tf GROUP BY source
"""


# ---------------------------------------------------------------------------
# docs_compression_proxy

_CP_N = 4


def docs_compression_proxy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source distinct÷total char-4-gram ratio over normalized
    text — the closed-form stand-in for the gzip-ratio quality gate
    (CCNet/Gopher use real compressors; the distinct-ngram share is
    the declarative proxy): repetitive/boilerplate text reuses the
    same grams, pushing the ratio down.

    Exactness: both counts are exact integers; one 6-dp division.
    Docs shorter than 4 normalized chars contribute nothing; a
    source with NO grams produces no row in either engine.

    100 TB shape: the gram explode is the cost — total grams ≈ total
    chars — but it feeds one (source, gram) partial-agg shuffle
    whose map-side combine collapses the Zipf head; the rollup is
    source-scale. No joins.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    nt = T.norm_text(F.col("text"))
    # substring with a per-element start index needs the expr form
    # (F.substring takes a literal start).
    d2 = d.select("source", nt.alias("_nt")).select(
        "source",
        F.expr(
            f"transform(sequence(1, greatest(length(_nt) - {_CP_N - 1}, 0)), "
            f"i -> substring(_nt, i, {_CP_N}))"
        ).alias("grams"),
    )
    ex = (
        d2.select("source", F.explode_outer("grams").alias("g"))
        .filter(F.col("g").isNotNull())
    )
    per = ex.groupBy("source", "g").agg(F.count(F.lit(1)).alias("n"))
    return per.groupBy("source").agg(
        F.count(F.lit(1)).alias("distinct_grams"),
        F.sum("n").alias("total_grams"),
    ).select(
        "source",
        "distinct_grams",
        F.col("total_grams").cast("long").alias("total_grams"),
        # r8 conversion: exact truncating integer-division rate
        (
            F.expr("(distinct_grams * 1000000) div total_grams")
            .cast("double") / 1e6
        ).alias("distinct_ratio"),
    )


DOCS_COMPRESSION_PROXY_SQL = rf"""
WITH t AS (
    SELECT source,
           lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS nt
    FROM documents
),
g AS (
    SELECT source,
           unnest(list_transform(range(1, greatest(length(nt) - {_CP_N - 1}, 0) + 1),
                                 i -> substr(nt, i, {_CP_N}))) AS g
    FROM t
),
per AS (SELECT source, g, count(*) AS n FROM g GROUP BY source, g)
SELECT source,
       CAST(count(*) AS BIGINT) AS distinct_grams,
       CAST(sum(n) AS BIGINT) AS total_grams,
       CAST((count(*) * 1000000) // sum(n) AS DOUBLE) / 1000000.0 AS distinct_ratio
FROM per GROUP BY source
"""


# ---------------------------------------------------------------------------
# docs_prefix_dup_rate

_PFX_LEN = 32


def docs_prefix_dup_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source count and share of docs whose first ``_PFX_LEN``
    normalized characters collide with another doc of the SAME
    source — the crawler-boilerplate screen exact-dedup misses when
    page tails differ (same headers, different comments).

    Exactness: collision counts are exact integers over a
    deterministic key (normalized prefix); the share divides once at
    6 dp against the source's total doc count.

    100 TB shape: one (source, prefix) partial-agg shuffle (the key
    is 32 chars — bounded width), a groups-scale rollup back to
    source, and a broadcastable per-source total join. No explode.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    pfx = F.substring(T.norm_text(F.col("text")), 1, _PFX_LEN)
    groups = (
        d.select("source", pfx.alias("pfx"))
        .groupBy("source", "pfx")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    dup = groups.groupBy("source").agg(
        F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)).alias("dup_docs"),
        F.sum("n").alias("n_docs"),
    )
    return dup.select(
        "source",
        F.col("dup_docs").cast("long").alias("dup_docs"),
        F.col("n_docs").cast("long").alias("n_docs"),
        # r8 conversion: exact truncating integer-division rate
        (F.expr("(dup_docs * 1000000) div n_docs").cast("double") / 1e6).alias(
            "dup_share"
        ),
    )


DOCS_PREFIX_DUP_SQL = rf"""
WITH t AS (
    SELECT source,
           substr(lower(trim(regexp_replace(text, '\s+', ' ', 'g'))), 1, {_PFX_LEN}) AS pfx
    FROM documents
),
g AS (SELECT source, pfx, count(*) AS n FROM t GROUP BY source, pfx)
SELECT source,
       CAST(sum(CASE WHEN n > 1 THEN n ELSE 0 END) AS BIGINT) AS dup_docs,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST((sum(CASE WHEN n > 1 THEN n ELSE 0 END) * 1000000) // sum(n)
            AS DOUBLE) / 1000000.0
           AS dup_share
FROM g GROUP BY source
"""


# ---------------------------------------------------------------------------
# docs_casefold_dup_lift


def docs_casefold_dup_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How much MORE duplication casefold+whitespace normalization
    surfaces than raw byte equality — the one-row audit that prices
    the normalization step of an exact-dedup pass before running it:
    if extra_dup_docs ≈ 0 the cheap raw pass suffices.

    Exactness: integer-only (group counts and doc counts under the
    two keys); the share divides once at 6 dp over the corpus total
    (always > 0). Fixture caveat: below sf0.1 the synthetic corpus
    has no exact-duplicate texts, so all four counts are legitimately
    0 and the share is 0.0 — still hashable, never NULL.

    100 TB shape: two text-keyed partial-agg shuffles (raw key and
    normalized key) over the same scan + a 1-row fold; at real scale
    the keys would be fingerprints (doc_fingerprint's md5 trick) to
    bound shuffle width.
    """
    d = spread(load_table(spark, sf_dir, "documents"))

    def dup_docs(key):
        return (
            d.select(key.alias("k"))
            .groupBy("k")
            .agg(F.count(F.lit(1)).alias("n"))
            .agg(
                F.coalesce(
                    F.sum(F.when(F.col("n") > 1, F.col("n")).otherwise(0)), F.lit(0)
                ).alias("dup_docs"),
                F.coalesce(F.sum("n"), F.lit(0)).alias("total"),
            )
        )

    raw = dup_docs(F.col("text")).select(
        F.col("dup_docs").alias("raw_dup_docs"), F.col("total").alias("n_docs")
    )
    norm = dup_docs(T.norm_text(F.col("text"))).select(
        F.col("dup_docs").alias("norm_dup_docs")
    )
    out = raw.crossJoin(norm)
    return out.select(
        F.col("n_docs").cast("long").alias("n_docs"),
        F.col("raw_dup_docs").cast("long").alias("raw_dup_docs"),
        F.col("norm_dup_docs").cast("long").alias("norm_dup_docs"),
        (F.col("norm_dup_docs") - F.col("raw_dup_docs"))
        .cast("long")
        .alias("extra_dup_docs"),
        # r8 conversion: exact truncating integer-division rate
        (
            F.expr("((norm_dup_docs - raw_dup_docs) * 1000000) div n_docs")
            .cast("double") / 1e6
        ).alias("extra_share"),
    )


DOCS_CASEFOLD_LIFT_SQL = r"""
WITH raw AS (
    SELECT coalesce(sum(CASE WHEN n > 1 THEN n ELSE 0 END), 0) AS dup_docs,
           coalesce(sum(n), 0) AS total
    FROM (SELECT text AS k, count(*) AS n FROM documents GROUP BY text)
),
nrm AS (
    SELECT coalesce(sum(CASE WHEN n > 1 THEN n ELSE 0 END), 0) AS dup_docs
    FROM (SELECT lower(trim(regexp_replace(text, '\s+', ' ', 'g'))) AS k,
                 count(*) AS n
          FROM documents GROUP BY 1)
)
SELECT CAST(raw.total AS BIGINT) AS n_docs,
       CAST(raw.dup_docs AS BIGINT) AS raw_dup_docs,
       CAST(nrm.dup_docs AS BIGINT) AS norm_dup_docs,
       CAST(nrm.dup_docs - raw.dup_docs AS BIGINT) AS extra_dup_docs,
       CAST(((nrm.dup_docs - raw.dup_docs) * 1000000) // raw.total AS DOUBLE)
           / 1000000.0
           AS extra_share
FROM raw CROSS JOIN nrm
"""


# ---------------------------------------------------------------------------
# docs_sentence_length_profile

_SLP_BAND = 5
_SLP_MAX_BAND = 8


def docs_sentence_length_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language histogram of sentence lengths in 5-token bands
    (band 8 = 41+ tokens) — the prose-vs-list shape screen: listy or
    chrome-heavy sources pile into band 0, run-on OCR into the top
    band. Sentences split on ``[.!?]+``; fragments with no tokens
    (e.g. between consecutive terminators) vanish in both engines.

    Exactness: band = exact integer ``least((n_words-1) // 5, 8)``
    over integer token counts — integer-only output.

    100 TB shape: sentence explode (rows ≈ sentence count) into a
    (lang, band) rollup — metadata-scale output, no joins.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    sent = d.select(
        "lang", F.explode_outer(F.split(F.col("text"), r"[.!?]+")).alias("frag")
    ).filter(F.col("frag").isNotNull())
    n_w = F.size(T.words(F.col("frag"))).cast("long")
    banded = sent.select(
        "lang", F.least(F.floor((n_w - 1) / _SLP_BAND), F.lit(_SLP_MAX_BAND)).alias("band"), n_w.alias("nw")
    ).filter(F.col("nw") > 0)
    return (
        banded.groupBy("lang", F.col("band").cast("long").alias("band"))
        .agg(F.count(F.lit(1)).alias("n_sentences"))
    )


DOCS_SENTENCE_PROFILE_SQL = rf"""
WITH s AS (
    SELECT lang, unnest(string_split_regex(text, '[.!?]+')) AS frag
    FROM documents
),
c AS (
    SELECT lang,
           len(list_filter(string_split_regex(frag, '\s+'), w -> w <> '')) AS nw
    FROM s
)
SELECT lang,
       CAST(least((nw - 1) // {_SLP_BAND}, {_SLP_MAX_BAND}) AS BIGINT) AS band,
       CAST(count(*) AS BIGINT) AS n_sentences
FROM c WHERE nw > 0 GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# events_retention_matrix

_WEEK_S = 604800


def events_retention_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention triangle: users grouped by their
    first-event week, counted once per (cohort, week-offset) they
    were active in — THE product-analytics table every retention
    readout renders (events_cohort_retention is the daily variant;
    this is the weekly triangle with absolute week indices).

    Exactness: tz-free integer weeks (epoch_sec // 604800 — never a
    calendar function, so hostile session timezones can't move a
    boundary); all counts exact integers, no floats at all.

    100 TB shape: one (user, week) distinct shuffle, a user-keyed
    min-rollup that REUSES the same partitioning, a co-partitioned
    join back on user, and a triangle-sized rollup.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    uw = e.select(
        "user_id", (sec / _WEEK_S).cast("long").alias("week")
    ).distinct()
    cohort = uw.groupBy("user_id").agg(F.min("week").alias("cohort_week"))
    return (
        uw.join(cohort, "user_id")
        .groupBy(
            "cohort_week",
            (F.col("week") - F.col("cohort_week")).alias("week_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


EVENTS_RETENTION_MATRIX_SQL = f"""
WITH uw AS (
    SELECT DISTINCT user_id, epoch_us(ts) // 1000000 // {_WEEK_S} AS week
    FROM events
),
c AS (SELECT user_id, min(week) AS cohort_week FROM uw GROUP BY user_id)
SELECT CAST(c.cohort_week AS BIGINT) AS cohort_week,
       CAST(uw.week - c.cohort_week AS BIGINT) AS week_offset,
       CAST(count(*) AS BIGINT) AS n_users
FROM uw JOIN c USING (user_id)
GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# events_funnel_dropoff_time

_FUNNEL_STAGES = (("signup", "view"), ("view", "click"), ("click", "purchase"))


def events_funnel_dropoff_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per funnel stage, how LONG converting users took: exact p50
    and p90 of first-occurrence-to-first-occurrence seconds for each
    adjacent stage pair — the time-to-value companion of
    ``events_user_funnel`` (which counts who converts; this times
    them). Users whose later stage precedes the earlier one are not
    conversions for that stage (delta < 0 excluded), matching the
    funnel's ordering semantics.

    Exactness: deltas are integer epoch seconds between per-user
    first timestamps; p50/p90 are percentile_disc — rank
    ceil(p·n) in a deterministic (delta) order, integers end to end
    (rank ties on equal deltas return the same VALUE regardless of
    permutation).

    100 TB shape: one user-keyed conditional-min rollup (4 mins in a
    single pass), a 3-row-per-user stage explode, and per-stage rank
    windows over the (small) converting set; output is 3 rows. The
    per-stage sort is the exact-auditor cost (percentile_disc
    stance — the GK-sketch twin is order_percentiles_approx).
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    firsts = e.groupBy("user_id").agg(
        *[
            F.min(F.when(F.col("event_type") == t, sec)).alias(f"t_{t}")
            for t in ("signup", "view", "click", "purchase")
        ]
    )
    stages = [
        firsts.select(
            F.lit(f"{a}>{b}").alias("stage"),
            (F.col(f"t_{b}") - F.col(f"t_{a}")).alias("delta_s"),
        ).filter(F.col("delta_s").isNotNull() & (F.col("delta_s") >= 0))
        for a, b in _FUNNEL_STAGES
    ]
    deltas = stages[0].unionByName(stages[1]).unionByName(stages[2])
    w = Window.partitionBy("stage").orderBy("delta_s")
    ranked = deltas.select(
        "stage",
        "delta_s",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("stage")).alias("n"),
    )
    pick = lambda p: F.max(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.col("n") * p), F.col("delta_s"))
    )
    return ranked.groupBy("stage").agg(
        F.max("n").cast("long").alias("n_users"),
        pick(0.5).cast("long").alias("p50_s"),
        pick(0.9).cast("long").alias("p90_s"),
    )


EVENTS_FUNNEL_DROPOFF_SQL = """
WITH f AS (
    SELECT user_id,
           min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) // 1000000 END) AS t_signup,
           min(CASE WHEN event_type = 'view' THEN epoch_us(ts) // 1000000 END) AS t_view,
           min(CASE WHEN event_type = 'click' THEN epoch_us(ts) // 1000000 END) AS t_click,
           min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) // 1000000 END) AS t_purchase
    FROM events GROUP BY user_id
),
d AS (
    SELECT 'signup>view' AS stage, t_view - t_signup AS delta_s FROM f
    UNION ALL
    SELECT 'view>click', t_click - t_view FROM f
    UNION ALL
    SELECT 'click>purchase', t_purchase - t_click FROM f
)
SELECT stage,
       CAST(count(*) AS BIGINT) AS n_users,
       CAST(percentile_disc(0.5) WITHIN GROUP (ORDER BY delta_s) AS BIGINT) AS p50_s,
       CAST(percentile_disc(0.9) WITHIN GROUP (ORDER BY delta_s) AS BIGINT) AS p90_s
FROM d WHERE delta_s IS NOT NULL AND delta_s >= 0
GROUP BY stage
"""


# ---------------------------------------------------------------------------
# events_burstiness


def events_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Histogram of per-user inter-arrival burstiness (coefficient of
    variation of the gap series, in 0.5-wide buckets, bucket 9 =
    CV ≥ 4.5): CV ≈ 0 is a metronome (bot), CV ≈ 1 is Poisson
    (organic), CV ≫ 1 is bursty sessions — the behavioral-mix screen
    next to events_interarrival_stats' corpus-level moments. Users
    with fewer than 3 events (fewer than 2 gaps) carry no CV and are
    excluded.

    Exactness: per-user (n, Σg, Σg²) are exact integer folds of
    integer-second gaps (gap MULTISET is permutation-stable on
    equal-second ties, the events_user_gaps argument); CV² =
    n·Σg²/(Σg)² − 1 evaluates in ONE fixed double sequence from
    exact DECIMAL products in both engines, so the bucket floor sees
    bit-identical doubles. All-zero-gap users (Σg = 0) pin to bucket
    0 (metronome), never a division.

    100 TB shape: ONE shuffle on user_id (lag window + rollup share
    it), then a 10-row histogram.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    w = Window.partitionBy("user_id").orderBy(sec)
    gaps = e.select(
        "user_id", (sec - F.lag(sec).over(w)).alias("g")
    ).filter(F.col("g").isNotNull())
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    per = gaps.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("g").alias("sg"),
        F.sum(dec("g") * dec("g")).alias("sgg"),
    ).filter(F.col("n") >= 2)
    cv = F.sqrt(
        F.greatest(
            (dec("n") * F.col("sgg")).cast("double")
            / (dec("sg") * dec("sg")).cast("double")
            - 1.0,
            F.lit(0.0),
        )
    )
    bucket = F.when(
        F.col("sg") > 0, F.least(F.floor(cv * 2), F.lit(9))
    ).otherwise(F.lit(0))
    return (
        per.select(bucket.cast("long").alias("cv_bucket"))
        .groupBy("cv_bucket")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


EVENTS_BURSTINESS_SQL = """
WITH g AS (
    SELECT user_id,
           epoch_us(ts) // 1000000
           - lag(epoch_us(ts) // 1000000) OVER (
                 PARTITION BY user_id ORDER BY epoch_us(ts) // 1000000
             ) AS g
    FROM events
),
per AS (
    SELECT user_id, count(*) AS n, sum(g) AS sg,
           sum(CAST(g AS HUGEINT) * g) AS sgg
    FROM g WHERE g IS NOT NULL GROUP BY user_id
    HAVING count(*) >= 2
),
b AS (
    SELECT CASE WHEN sg > 0
                THEN least(CAST(floor(sqrt(greatest(
                         CAST(CAST(n AS HUGEINT) * sgg AS DOUBLE)
                         / CAST(CAST(sg AS HUGEINT) * sg AS DOUBLE) - 1.0,
                         0.0)) * 2) AS BIGINT), 9)
                ELSE 0 END AS cv_bucket
    FROM per
)
SELECT CAST(cv_bucket AS BIGINT) AS cv_bucket,
       CAST(count(*) AS BIGINT) AS n_users
FROM b GROUP BY cv_bucket
"""


# ---------------------------------------------------------------------------
# events_hour_entropy_by_type

_HE_NANO = 1_000_000_000


def events_hour_entropy_by_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-event-type Shannon entropy of the hour-of-day histogram —
    the diurnal-shape screen: organic user actions spread across
    waking hours (entropy near ln 24 ≈ 3.18), cron-driven or
    synthetic types spike one hour (entropy → 0). Complements
    events_hourly_profile (which shows the shape; this scores it).

    Exactness: hour-of-day is tz-free integer arithmetic
    ((epoch_sec % 86400) // 3600); each −p·ln p term nano-quantizes
    from exact (count, total) integers (the source_token_entropy
    discipline), so the per-type reduction is an exact integer sum.

    100 TB shape: one narrow map + a (type, hour) rollup (≤ 24·|types|
    rows) + a type-level fold — metadata-scale end to end.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    hr = (sec % 86400 / 3600).cast("long")
    tc = (
        e.select("event_type", hr.alias("hour"))
        .groupBy("event_type", "hour")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    totals = tc.groupBy("event_type").agg(
        F.sum("c").alias("n_events"), F.count(F.lit(1)).alias("n_hours")
    )
    p = F.col("c").cast("double") / F.col("n_events")
    contrib = F.round(-(p * F.log(p)) * _HE_NANO).cast("long")
    ent = (
        tc.join(broadcast(totals), "event_type")
        .select("event_type", contrib.alias("e_nano"))
        .groupBy("event_type")
        .agg(F.sum("e_nano").alias("s"))
    )
    return totals.join(ent, "event_type").select(
        "event_type",
        F.col("n_events").cast("long").alias("n_events"),
        F.col("n_hours").cast("long").alias("n_hours"),
        # ok-round: exact nano grid (6 dp)
        F.round(F.col("s").cast("double") / _HE_NANO, 6).alias("hour_entropy"),
    )


EVENTS_HOUR_ENTROPY_SQL = f"""
WITH tc AS (
    SELECT event_type, (epoch_us(ts) // 1000000 % 86400) // 3600 AS hour,
           count(*) AS c
    FROM events GROUP BY 1, 2
),
totals AS (
    SELECT event_type, sum(c) AS n_events, count(*) AS n_hours
    FROM tc GROUP BY event_type
),
ent AS (
    SELECT tc.event_type,
           -- ok-round: irrational (p*ln p entropy term)
           sum(CAST(round(-(CAST(tc.c AS DOUBLE) / t.n_events
                            * ln(CAST(tc.c AS DOUBLE) / t.n_events))
                          * {_HE_NANO}) AS BIGINT)) AS s
    FROM tc JOIN totals t USING (event_type)
    GROUP BY tc.event_type
)
SELECT t.event_type,
       CAST(t.n_events AS BIGINT) AS n_events,
       CAST(t.n_hours AS BIGINT) AS n_hours,
       -- ok-round: exact nano grid (6 dp)
       round(CAST(e.s AS DOUBLE) / {_HE_NANO}, 6) AS hour_entropy
FROM totals t JOIN ent e USING (event_type)
"""


# ---------------------------------------------------------------------------
# events_lag1_autocorr


def events_lag1_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 autocorrelation of the hourly event-count series
    (missing hours counted as ZERO — the series is dense over
    [min_hour, max_hour]) — the load-predictability number: r near 1
    means this hour forecasts the next (smooth diurnal load), r near
    0 means white noise, negative means alternating bursts.

    Exactness: hourly counts are exact integers over tz-free integer
    hours; the dense series materializes by exploding the 1-row
    (min, max) span; the five Pearson sums fold in DECIMAL(38,0) ↔
    HUGEINT and r evaluates once, zero-variance pinned to 0.0 (the
    NULL-free contract).

    100 TB shape: one hour-keyed partial-agg rollup (metadata scale:
    8,760 rows/year), a 1-row span broadcast for the dense explode,
    and an hour+1 equi-join of the series with itself — no window,
    no single-partition sort.
    """
    e = load_table(spark, sf_dir, "events")
    sec = F.col("ts").cast("long")
    counts = (
        e.select((sec / 3600).cast("long").alias("h"))
        .groupBy("h")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    span = counts.agg(F.min("h").alias("lo"), F.max("h").alias("hi"))
    dense = span.select(
        F.explode(F.sequence(F.col("lo"), F.col("hi"))).alias("h")
    ).join(counts, "h", "left").select(
        "h", F.coalesce("c", F.lit(0)).alias("c")
    )
    x = dense.select(F.col("h").alias("hx"), F.col("c").alias("x"))
    y = dense.select((F.col("h") - 1).alias("hx"), F.col("c").alias("y"))
    pairs = x.join(y, "hx")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = pairs.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(dec("x") * dec("y")).alias("sxy"),
        F.sum(dec("x") * dec("x")).alias("sxx"),
        F.sum(dec("y") * dec("y")).alias("syy"),
    )
    n = F.col("n").cast("decimal(38,0)")
    num = (n * F.col("sxy") - dec("sx") * dec("sy")).cast("double")
    vx = (n * F.col("sxx") - dec("sx") * dec("sx"))
    vy = (n * F.col("syy") - dec("sy") * dec("sy"))
    den = F.sqrt(vx.cast("double")) * F.sqrt(vy.cast("double"))
    return sums.select(
        F.col("n").cast("long").alias("n_pairs"),
        # ok-round: irrational (sqrt in the denominator)
        F.when((vx > 0) & (vy > 0), F.round(num / den, 6))
        .otherwise(F.lit(0.0))
        .alias("lag1_r"),
    )


EVENTS_LAG1_AUTOCORR_SQL = """
WITH counts AS (
    SELECT epoch_us(ts) // 1000000 // 3600 AS h, count(*) AS c
    FROM events GROUP BY 1
),
span AS (SELECT min(h) AS lo, max(h) AS hi FROM counts),
dense AS (
    SELECT t.h, coalesce(counts.c, 0) AS c
    FROM (SELECT unnest(range((SELECT lo FROM span),
                              (SELECT hi FROM span) + 1)) AS h) t
    LEFT JOIN counts ON t.h = counts.h
),
pairs AS (
    SELECT a.c AS x, b.c AS y
    FROM dense a JOIN dense b ON b.h = a.h + 1
),
s AS (
    SELECT count(*) AS n, sum(x) AS sx, sum(y) AS sy,
           sum(CAST(x AS HUGEINT) * y) AS sxy,
           sum(CAST(x AS HUGEINT) * x) AS sxx,
           sum(CAST(y AS HUGEINT) * y) AS syy
    FROM pairs
)
SELECT CAST(n AS BIGINT) AS n_pairs,
       CASE WHEN CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx > 0
             AND CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy > 0
       -- ok-round: irrational (sqrt in the denominator)
            THEN round(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
                       / (sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE))
                          * sqrt(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))),
                  6)
            ELSE CAST(0.0 AS DOUBLE) END AS lag1_r
FROM s
"""


# ---------------------------------------------------------------------------
# events_value_benford


def events_value_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-significant-digit distribution of event values next to
    the Benford expectation log10(1 + 1/d) — the classic synthetic-
    data / fraud screen: organic transaction amounts track Benford,
    generated or capped ones don't.

    Exactness: the first digit comes from the DECIMAL STRING of the
    exact integer cents (round(value·100) — never float log10 of the
    value, whose power-of-ten edges differ between engines);
    non-positive cents are excluded. Shares divide once at 6 dp; the
    expected share is a per-digit closed form both engines evaluate
    from exact small integers.

    100 TB shape: one narrow map + a 9-row rollup; the grand total
    reuses a window over the 9-row histogram — no second pass.
    """
    e = load_table(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("long")
    d = (
        e.select(cents.alias("cents"))
        .filter(F.col("cents") > 0)
        .select(F.substring(F.col("cents").cast("string"), 1, 1).cast("long").alias("digit"))
    )
    hist = d.groupBy("digit").agg(F.count(F.lit(1)).alias("n_events"))
    total = F.sum("n_events").over(Window.partitionBy())
    # r8 conversion: exact truncating integer-division rate
    return hist.withColumn("t", total).select(
        "digit",
        "n_events",
        (F.expr("(n_events * 1000000) div t").cast("double") / 1e6).alias(
            "share"
        ),
        # ok-round: irrational (log10 expectation)
        F.round(F.log10(1.0 + 1.0 / F.col("digit")), 6).alias("benford_expected"),
    )


EVENTS_VALUE_BENFORD_SQL = """
WITH c AS (
    SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM events
),
d AS (
    SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS BIGINT) AS digit
    FROM c WHERE cents > 0
),
h AS (SELECT digit, count(*) AS n_events FROM d GROUP BY digit)
SELECT digit,
       CAST(n_events AS BIGINT) AS n_events,
       CAST((n_events * 1000000) // sum(n_events) OVER () AS DOUBLE)
           / 1000000.0 AS share,
       -- ok-round: irrational (log10 expectation)
       round(log10(1.0 + 1.0 / digit), 6) AS benford_expected
FROM h
"""


QUERIES = {
    "docs_stopword_profile": docs_stopword_profile,
    "docs_hapax_by_source": docs_hapax_by_source,
    "docs_compression_proxy": docs_compression_proxy,
    "docs_prefix_dup_rate": docs_prefix_dup_rate,
    "docs_casefold_dup_lift": docs_casefold_dup_lift,
    "docs_sentence_length_profile": docs_sentence_length_profile,
    "events_retention_matrix": events_retention_matrix,
    "events_funnel_dropoff_time": events_funnel_dropoff_time,
    "events_burstiness": events_burstiness,
    "events_hour_entropy_by_type": events_hour_entropy_by_type,
    "events_lag1_autocorr": events_lag1_autocorr,
    "events_value_benford": events_value_benford,
}

ORACLES = {
    "docs_stopword_profile": DOCS_STOPWORD_PROFILE_SQL,
    "docs_hapax_by_source": DOCS_HAPAX_SQL,
    "docs_compression_proxy": DOCS_COMPRESSION_PROXY_SQL,
    "docs_prefix_dup_rate": DOCS_PREFIX_DUP_SQL,
    "docs_casefold_dup_lift": DOCS_CASEFOLD_LIFT_SQL,
    "docs_sentence_length_profile": DOCS_SENTENCE_PROFILE_SQL,
    "events_retention_matrix": EVENTS_RETENTION_MATRIX_SQL,
    "events_funnel_dropoff_time": EVENTS_FUNNEL_DROPOFF_SQL,
    "events_burstiness": EVENTS_BURSTINESS_SQL,
    "events_hour_entropy_by_type": EVENTS_HOUR_ENTROPY_SQL,
    "events_lag1_autocorr": EVENTS_LAG1_AUTOCORR_SQL,
    "events_value_benford": EVENTS_VALUE_BENFORD_SQL,
}
