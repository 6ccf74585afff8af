"""ZooKeeper tree algorithm parity (reference: ZooKeeperHelper.java:24-169)."""

import pytest

from data_misc_tools_spark.operators import zookeeper as Z
from data_misc_tools_spark.testing.fakezk import FakeZK


def _tree():
    return FakeZK({"/a": "va", "/a/b": "vb", "/a/b/c": "vc", "/x": "vx"})


def test_merge_paths_dedups_descendants():
    assert Z.merge_paths(["/a", "/a/b", "/a/b/c", "/x", "/ab"]) == ["/a", "/ab", "/x"]


def test_read_tree_dfs_order():
    rows = Z.read_tree(_tree(), "/a")
    assert rows == [("/a", "va"), ("/a/b", "vb"), ("/a/b/c", "vc")]


def test_read_overlapping_paths_no_duplicates():
    rows = Z.read_tree(_tree(), "/a", "/a/b")
    assert [p for p, _ in rows] == ["/a", "/a/b", "/a/b/c"]


def test_read_missing_path_is_empty():
    assert Z.read_tree(_tree(), "/nope") == []


def test_write_tree_creates_parents_returns_old():
    zk = _tree()
    old = Z.write_tree(zk, {"/a/b": "new-b", "/p/q/r": "vr"})
    assert ("/a/b", "vb") in old      # old value returned
    assert ("/p/q/r", None) in old    # previously absent
    assert zk.get_value("/a/b") == "new-b"
    assert zk.exists("/p") and zk.exists("/p/q")  # ancestors auto-created
    assert zk.get_value("/p/q/r") == "vr"


def test_delete_tree_deepest_first_returns_subtree():
    zk = _tree()
    deleted = Z.delete_tree(zk, "/a")
    assert deleted == [("/a", "va"), ("/a/b", "vb"), ("/a/b/c", "vc")]
    assert not zk.exists("/a") and zk.exists("/x")


def test_fakezk_refuses_nonempty_delete():
    zk = _tree()
    with pytest.raises(ValueError):
        zk.delete_node("/a")  # guards the deepest-first invariant


def test_zk_dataframes(spark):
    zk = _tree()
    df = Z.zk_read_df(spark, zk, "/a")
    assert [tuple(r) for r in df.collect()] == [
        ("/a", "va"), ("/a/b", "vb"), ("/a/b/c", "vc")
    ]
    wrote = Z.zk_write_df(spark, zk, {"/a": "v2"})
    assert [tuple(r) for r in wrote.collect()] == [("/a", "va")]
    gone = Z.zk_delete_df(spark, zk, "/x")
    assert [tuple(r) for r in gone.collect()] == [("/x", "vx")]
