"""Property-based invariants (hypothesis): the guarantees that must
hold for ANY input, not just the fixtures — salted ops equal their
unsalted twins, merge equals union, redaction leaves no PII behind.

max_examples is kept small: every example runs real Spark jobs.
"""

from __future__ import annotations

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

keys = st.sampled_from(["a", "b", "hot", "x"])
rows = st.lists(st.tuples(keys, st.floats(-1e6, 1e6)), min_size=1, max_size=50)


@given(data=rows, salt=st.integers(2, 8))
@settings(**SETTINGS)
def test_salted_agg_equals_plain_for_any_input(spark, data, salt):
    from distributed_file_system_with_stream_processing_spark.operators import skew as K

    df = spark.createDataFrame(data, "k string, v double")
    plain = {
        r["k"]: (r["cnt"], round(r["s"] or 0.0, 6))
        for r in df.groupBy("k")
        .agg(F.count(F.lit(1)).alias("cnt"), F.sum("v").alias("s"))
        .collect()
    }
    salted = {
        r["k"]: (r["cnt"], round(r["s"] or 0.0, 6))
        for r in K.salted_agg(
            df, ["k"], {"cnt": ("count", "*"), "s": ("sum", "v")}, salt=salt
        ).collect()
    }
    assert plain == salted


@given(
    base=st.lists(st.integers(0, 100), min_size=1, max_size=10),
    batches=st.lists(
        st.lists(st.integers(0, 100), min_size=1, max_size=5), max_size=3
    ),
)
@settings(**SETTINGS)
def test_tablestore_merge_equals_union(spark, tmp_path_factory, base, batches):
    from distributed_file_system_with_stream_processing_spark.dfs import TableStore

    store = TableStore(spark, str(tmp_path_factory.mktemp("prop_store")))
    mk = lambda xs: spark.createDataFrame([(x,) for x in xs], "v long")  # noqa: E731
    store.create("t", mk(base))
    for b in batches:
        store.append("t", mk(b))
    store.merge("t")
    got = sorted(r["v"] for r in store.get("t").collect())
    want = sorted(base + [x for b in batches for x in b])
    assert got == want


@given(
    pre=st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30),
    post=st.text(alphabet=st.characters(blacklist_categories=("Cs",)), max_size=30),
)
@settings(**SETTINGS)
def test_redact_always_removes_planted_email(spark, pre, post):
    from distributed_file_system_with_stream_processing_spark.functions import text as T

    s = f"{pre} contact.me@example.org {post}"
    df = spark.createDataFrame([(s,)], "text string")
    out = df.select(T.redact_pii(F.col("text")).alias("r")).first()["r"]
    assert "contact.me@example.org" not in out
    assert "<EMAIL>" in out


word = st.text(alphabet="abcdefg", min_size=1, max_size=4)
doc_words = st.lists(word, min_size=0, max_size=30)


@given(
    shared=st.lists(word, min_size=6, max_size=6),
    pre_a=doc_words, post_a=doc_words, pre_b=doc_words, post_b=doc_words,
)
@settings(**SETTINGS)
def test_winnowing_guarantee_for_any_shared_run(
    spark, shared, pre_a, post_a, pre_b, post_b
):
    """Winnowing's SIGMOD'03 guarantee as a PROPERTY: for ANY two
    documents sharing a run of k + w - 1 = 6 words, the fingerprint
    sets intersect — whatever surrounds the run."""
    from distributed_file_system_with_stream_processing_spark.functions import text as T

    mk = lambda ws: " ".join(ws)  # noqa: E731
    df = spark.createDataFrame(
        [(1, mk(pre_a + shared + post_a)), (2, mk(pre_b + shared + post_b))],
        "doc_id long, text string",
    )
    fps = {
        r["doc_id"]: set(r["fps"])
        for r in df.select(
            "doc_id",
            T.winnow_from_hashes(
                T.gram_hashes(T.words(F.col("text")), 3), 4
            ).alias("fps"),
        ).collect()
    }
    assert fps[1] & fps[2], (fps, shared)


@given(
    base=st.lists(st.integers(0, 100), min_size=1, max_size=8),
    batches=st.lists(
        st.lists(st.integers(0, 100), min_size=1, max_size=4), min_size=2, max_size=4
    ),
)
@settings(**SETTINGS)
def test_compact_appends_preserves_get_for_any_log(
    spark, tmp_path_factory, base, batches
):
    """For ANY append log, compact_appends changes nothing a reader
    can observe: get() multiset, per-row _append_seq stamps, and the
    post-merge table all equal the uncompacted twin's."""
    from distributed_file_system_with_stream_processing_spark.dfs import TableStore

    mk = lambda xs: spark.createDataFrame([(x,) for x in xs], "v long")  # noqa: E731
    root = tmp_path_factory.mktemp("prop_compact")
    plain, compacted = TableStore(spark, str(root / "p")), TableStore(spark, str(root / "c"))
    for store in (plain, compacted):
        store.create("t", mk(base))
    seqs = {}
    for b in batches:
        s_p = plain.append("t", mk(b))
        s_c = compacted.append("t", mk(b))
        seqs[s_c] = s_p
    assert compacted.compact_appends("t") == len(batches)

    obs = lambda st_, with_seq: sorted(  # noqa: E731
        tuple(r) for r in st_.get("t", with_seq=with_seq).collect()
    )
    assert obs(compacted, False) == obs(plain, False)
    # per-row stamps survive compaction (modulo each store's own seq names)
    c_rows = sorted((r["v"], r["_append_seq"]) for r in compacted.get("t", with_seq=True).collect())
    p_rows = sorted((r["v"], seqs.get(r["_append_seq"], r["_append_seq"]))
                    for r in plain.get("t", with_seq=True).collect())
    assert [(v, seqs.get(s, s)) for v, s in c_rows] == p_rows
    compacted.merge("t"); plain.merge("t")
    assert obs(compacted, False) == obs(plain, False)
