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
