"""TableStore tests mirroring the reference's HyDFS test suite
(reference user/tests.go): create/get round-trip (test1), metadata
listing (test2/3), append-then-get merge ordering (test4), concurrent
multiappend convergence (test5)."""

from __future__ import annotations

import pytest

from distributed_file_system_with_stream_processing_spark.dfs import TableStore, TableStoreError


@pytest.fixture()
def store(spark, tmp_path):
    return TableStore(spark, str(tmp_path / "hydfs"))


def _df(spark, rows):
    return spark.createDataFrame([(i, v) for i, v in rows], "id long, val string")


def test_create_get_roundtrip(store, spark):
    df = _df(spark, [(1, "a"), (2, "b")])
    store.create("t1", df)
    got = sorted((r["id"], r["val"]) for r in store.get("t1").collect())
    assert got == [(1, "a"), (2, "b")]


def test_create_twice_fails(store, spark):
    store.create("t1", _df(spark, [(1, "a")]))
    with pytest.raises(TableStoreError, match="already exists"):
        store.create("t1", _df(spark, [(2, "b")]))


def test_get_missing_fails(store):
    with pytest.raises(TableStoreError, match="doesn't exist"):
        store.get("nope")


def test_append_deferred_then_visible(store, spark):
    store.create("t", _df(spark, [(1, "base")]))
    store.append("t", _df(spark, [(2, "x")]))
    store.append("t", _df(spark, [(3, "y")]))
    # reads see merged view (get triggers merge semantics lazily)
    got = sorted(r["id"] for r in store.get("t").collect())
    assert got == [1, 2, 3]
    assert len(store.ls("t")["pending_appends"]) == 2


def test_merge_folds_appends_in_order(store, spark):
    store.create("t", _df(spark, [(0, "base")]))
    store.append("t", _df(spark, [(1, "first")]))
    store.append("t", _df(spark, [(2, "second")]))
    n = store.merge("t")
    assert n == 2
    assert store.ls("t")["pending_appends"] == []
    # order preserved: base then appends in sequence order
    seqs = store.get("t", with_seq=True).select("id").collect()
    assert sorted(r["id"] for r in seqs) == [0, 1, 2]
    # merge is idempotent
    assert store.merge("t") == 0
    assert sorted(r["id"] for r in store.get("t").collect()) == [0, 1, 2]


def test_get_from_replica_reads_single_batch(store, spark):
    store.create("t", _df(spark, [(1, "base")]))
    seq = store.append("t", _df(spark, [(2, "batch")]))
    only = store.get_from_replica("t", seq).collect()
    assert [r["id"] for r in only] == [2]
    base = store.get_from_replica("t").collect()
    assert [r["id"] for r in base] == [1]


def test_multiappend_converges(store, spark):
    """Reference test5: concurrent appends from several clients all land
    and merge deterministically by sequence."""
    store.create("t", _df(spark, [(0, "base")]))
    seqs = store.multiappend("t", [_df(spark, [(i, f"c{i}")]) for i in range(1, 5)])
    assert len(seqs) == len(set(seqs)) == 4
    store.merge("t")
    got = sorted(r["id"] for r in store.get("t").collect())
    assert got == [0, 1, 2, 3, 4]


def test_store_lists_tables(store, spark):
    store.create("alpha", _df(spark, [(1, "a")]))
    store.create("beta", _df(spark, [(2, "b")]))
    assert set(store.store()) >= {"alpha", "beta"}


def test_list_members(spark):
    from distributed_file_system_with_stream_processing_spark.dfs import list_members

    members = list_members(spark)
    assert len(members) >= 1  # local mode: the driver executor
    assert all("host" in m for m in members)


def test_cli_roundtrip(spark, tmp_path):
    """The reference's command loop, end to end: create → append →
    ls → merge → get → store → list_mem_ids."""
    from distributed_file_system_with_stream_processing_spark.__main__ import main

    src = str(tmp_path / "in.parquet")
    _df(spark, [(1, "a"), (2, "b")]).write.parquet(src)
    root = str(tmp_path / "store")
    run = lambda *a: main(["--root", root, *a])  # noqa: E731
    assert run("create", "t", src) == 0
    assert run("append", "t", src) == 0
    assert run("ls", "t") == 0
    assert run("merge", "t") == 0
    assert run("get", "t") == 0
    assert run("store") == 0
    assert run("list_mem_ids") == 0
