"""Text-analysis Column builders — all JVM-side expressions.

Every helper returns a ``pyspark.sql.Column`` built from built-in
functions (split/transform/aggregate/md5/conv…), so the hot path stays
inside whole-stage codegen — no Python UDFs. Each primitive has an
exact DuckDB twin used by the oracle SQL strings in
``plans/llm_ops.py``; portability notes live next to each builder.

These are the building blocks for the LLM-data-pipeline operators
(dedup, fingerprinting, language-ID, quality scoring) that the
reference engine does not have but a 100 TB training-data pipeline
needs (SURVEY.md §2).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic, engine-portable stopword list (present in the test
# corpus vocabulary; order matters only for documentation).
STOPWORDS: tuple[str, ...] = ("the", "a", "and", "of", "to", "in", "is")

# Language marker words for the n-gram/stopword-vote language-ID
# heuristic. Deterministic and tiny by design — real pipelines plug a
# model here; the engine contract is the distributed shape.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "is", "and", "of"),
    "es": ("el", "la", "los", "las", "una"),
    "de": ("der", "die", "das", "und", "nicht"),
    "fr": ("le", "les", "des", "une", "est"),
}


def norm_text(col: Column) -> Column:
    """Whitespace-collapsed, trimmed, lower-cased text.
    DuckDB twin: ``lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))``."""
    return F.lower(F.trim(F.regexp_replace(col, r"\s+", " ")))


def words(col: Column) -> Column:
    """Whitespace tokens, empties removed.
    DuckDB twin: ``list_filter(string_split_regex(text, '\\s+'), w -> w <> '')``."""
    return F.filter(F.split(col, r"\s+"), lambda w: w != "")


def word_ngrams(ws: Column, n: int) -> Column:
    """Space-joined word n-grams of a token array (empty below n tokens).
    DuckDB twin: ``list_transform(range(1, len(ws)-n+2), i ->
    array_to_string(ws[i:i+n-1], ' '))`` guarded by a CASE."""
    grams = F.transform(
        F.sequence(F.lit(1), F.size(ws) - F.lit(n - 1)),
        lambda i: F.array_join(F.slice(ws, i, n), " "),
    )
    return F.when(F.size(ws) >= n, grams).otherwise(F.array().cast("array<string>"))


def shingles(col: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingle set of a text column."""
    return F.array_distinct(word_ngrams(words(col), n))


def hash32(col: Column) -> Column:
    """Portable 32-bit hash as BIGINT: first 8 hex chars of md5.
    DuckDB twin: ``('0x' || substr(md5(x), 1, 8))::BIGINT``."""
    return F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")


# MinHash universal-hash family: ONE md5 per shingle (hash32), then k
# cheap affine transforms (a_k·h + b_k) mod p. Constants are derived in
# Python and embedded as literals, so the DuckDB twin is identical
# arithmetic. p is the first prime above 2^32; a < 2^20 keeps
# a·h + b < 2^53 — no BIGINT overflow in either engine.
MINHASH_PRIME = 4294967311


def mh_params(k: int) -> tuple[int, int]:
    """Deterministic (a, b) for hash function k; a forced odd."""
    import hashlib

    a = int(hashlib.md5(f"mh-a|{k}".encode()).hexdigest()[:5], 16) | 1
    b = int(hashlib.md5(f"mh-b|{k}".encode()).hexdigest()[:8], 16)
    return a, b


def minhash_signature(sh: Column, k: int) -> Column:
    """MinHash signature as array<bigint>: element i = min over
    shingles of (a_i·hash32(s) + b_i) mod p. DuckDB twin per element:
    ``list_aggregate(list_transform(hs, h -> (a*h + b) % p), 'min')``
    over ``hs = list_transform(sh, s -> ('0x'||substr(md5(s),1,8))::BIGINT)``."""
    hs = F.transform(sh, hash32)

    def affine(a: int, b: int):
        # factory keeps the Column lambda single-arg (PySpark inspects
        # the signature to bind higher-order-function variables)
        return lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(MINHASH_PRIME)

    mins = []
    for i in range(k):
        a, b = mh_params(i)
        mins.append(F.array_min(F.transform(hs, affine(a, b))))
    return F.array(*mins)


def simhash32(sh: Column) -> Column:
    """32-bit SimHash of a shingle set, as BIGINT.

    bit j = sign of sum over shingles of ±1 on hash32(shingle) bit j.
    Expressed with nested higher-order functions (no UDF); DuckDB twin
    uses list_sum/list_transform with ``//`` and ``<<``.
    """
    hs = F.transform(sh, hash32)
    # 2^j via pow (exact for j ≤ 31); shiftleft's Python API needs a
    # literal int, which a lambda-bound j is not.
    pow2 = lambda j: F.pow(F.lit(2.0), j).cast("long")  # noqa: E731
    return F.aggregate(
        F.sequence(F.lit(0), F.lit(31)),
        F.lit(0).cast("long"),
        lambda acc, j: acc
        + F.when(
            F.aggregate(
                hs,
                F.lit(0).cast("long"),
                lambda a, h: a
                + F.when((h / pow2(j)).cast("long") % 2 == 1, 1).otherwise(-1),
            )
            >= 0,
            pow2(j),
        ).otherwise(0),
    )


def token_count(col: Column) -> Column:
    """Whitespace token count (BIGINT)."""
    return F.size(words(col)).cast("long")


def bpe_token_estimate(col: Column) -> Column:
    """BPE-ish token estimate: ceil(chars/4) — the standard rough LLM
    token heuristic; portable arithmetic."""
    return F.ceil(F.length(col) / F.lit(4.0)).cast("long")


def stopword_ratio(ws: Column) -> Column:
    """Fraction of tokens that are stopwords (0.0 when no tokens)."""
    n_stop = F.size(F.filter(ws, lambda w: F.lower(w).isin(*STOPWORDS)))
    return F.when(F.size(ws) > 0, n_stop / F.size(ws)).otherwise(F.lit(0.0))


def punct_ratio(col: Column) -> Column:
    """Fraction of characters that are sentence punctuation."""
    stripped = F.regexp_replace(col, r"[.,!?;:]", "")
    return F.when(
        F.length(col) > 0, (F.length(col) - F.length(stripped)) / F.length(col)
    ).otherwise(F.lit(0.0))


def avg_token_len(ws: Column) -> Column:
    total = F.aggregate(ws, F.lit(0).cast("long"), lambda a, w: a + F.length(w))
    return F.when(F.size(ws) > 0, total / F.size(ws)).otherwise(F.lit(0.0))


def quality_score(n_tokens: Column, stop_ratio: Column, p_ratio: Column) -> Column:
    """Deterministic linear quality heuristic clamped to [0, 1].
    Identical arithmetic order to the DuckDB twin."""
    raw = (
        F.lit(0.25)
        + F.lit(0.002) * n_tokens
        + F.lit(1.2) * stop_ratio
        - F.lit(3.0) * p_ratio
    )
    return F.least(F.lit(1.0), F.greatest(F.lit(0.0), raw))


def _contains_any(markers: tuple[str, ...]):
    # Plain closure (no default-arg binding): Spark's lambda factory
    # inspects arity, so a second default parameter would be bound to a
    # Column and break isin().
    def pred(w: Column) -> Column:
        return F.lower(w).isin(*markers)

    return pred


def lang_scores(ws: Column) -> dict[str, Column]:
    """Marker-word hit counts per candidate language."""
    return {
        lang: F.size(F.filter(ws, _contains_any(markers)))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_predict(ws: Column) -> Column:
    """Argmax over marker votes with a fixed precedence (en,es,de,fr);
    'und' when no marker hits at all."""
    s = lang_scores(ws)
    en, es, de, fr = s["en"], s["es"], s["de"], s["fr"]
    return (
        F.when((en > 0) & (en >= es) & (en >= de) & (en >= fr), F.lit("en"))
        .when((es > 0) & (es >= de) & (es >= fr), F.lit("es"))
        .when((de > 0) & (de >= fr), F.lit("de"))
        .when(fr > 0, F.lit("fr"))
        .otherwise(F.lit("und"))
    )


# -- PII redaction / URL extraction (training-data scrubbing) --------------

# Patterns kept to the RE2-compatible subset so the Spark (Java regex)
# and DuckDB (RE2) twins behave identically.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
PHONE_RE = r"\d{3}[-.]\d{3}[-.]\d{4}"


def redact_pii(col: Column) -> Column:
    """Replace emails, then URLs, then phone-shaped numbers with typed
    placeholder tags — the standard scrub stage before training-data
    tokenization. Pure JVM regexp_replace chain (codegen'd; no UDF)."""
    out = F.regexp_replace(col, EMAIL_RE, "<EMAIL>")
    out = F.regexp_replace(out, URL_RE, "<URL>")
    return F.regexp_replace(out, PHONE_RE, "<PHONE>")


def url_count(col: Column) -> Column:
    """Number of URLs in the text (BIGINT)."""
    return F.size(F.regexp_extract_all(col, F.lit(URL_RE), 0)).cast("long")


def first_url(col: Column) -> Column:
    """First URL in the text; empty string when none."""
    return F.regexp_extract(col, URL_RE, 0)


def winnow_from_hashes(hs: Column, w: int = 4) -> Column:
    """Winnowing selection over a PRECOMPUTED gram-hash array: slide a
    w-hash window, keep each window's minimum — distinct. Empty array
    below w hashes. Take a materialized COLUMN REF for ``hs`` (stage
    it in its own select first): HOFs are interpreted, so an inlined
    subexpression referenced here 3× would re-hash every gram 3×.

    Guard note: the short-array case is a CASE inside the expression —
    callers must NOT re-filter on a derived size (scan-predicate
    inlining pathology, see the batch plan's docstring) — and the CASE
    also dodges sequence(1, n<1) descending-range wraparound."""
    wins = F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.size(hs) - F.lit(w - 1)),
            lambda j: F.array_min(F.slice(hs, j, w)),
        )
    )
    return F.when(F.size(hs) >= w, wins).otherwise(F.array().cast("array<long>"))


def gram_hashes(ws: Column, k: int = 3) -> Column:
    """hash32 of every k-word gram of a token array — the winnowing
    input. Shared by the batch plan
    (plans/llm_ops2.doc_winnowing_fingerprint) and the streaming twin
    (streaming/rainstorm.winnow_stream); pure column expression."""
    return F.transform(word_ngrams(ws, k), hash32)
