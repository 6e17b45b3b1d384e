"""Merge-on-read deletion vectors (sources/lake.py delete_keys_dv /
fold_dv — r10 VERDICT missing #4): point deletes commit a (partition,
key) sidecar and byte-carry every data file; reads anti-join their own
version's sidecar; copy-on-write commits fold the vector partition by
partition, and fold_dv retires it entirely."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from poc_spark.sources.lake import (
    _DV_DIR,
    create_stats_index_tree,
    delete_keys_dv,
    fold_dv,
    merge_upsert_partitioned,
    read_snapshot,
    read_tree_with_skipping,
    read_version,
    list_versions,
    resolve_snapshot,
    write_partitioned,
)


@pytest.fixture(params=["posix", "fake-objectstore"])
def lake_fs(request, spark):
    if request.param == "fake-objectstore":
        spark.conf.set("spark.poc.lake.fs", "fake-objectstore")
    try:
        yield request.param
    finally:
        if request.param == "fake-objectstore":
            spark.conf.unset("spark.poc.lake.fs")


def _mk_tree(spark, root):
    rows = [(i, f"p{i % 3}", i * 10) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "k long, part string, v long")
    write_partitioned(df, root, ["part"])
    return df


def _keys(spark, *ks):
    return spark.createDataFrame([(k,) for k in ks], "k long")


def _data_inos(version_dir):
    out = {}
    for pd in os.listdir(version_dir):
        full = os.path.join(version_dir, pd)
        if os.path.isdir(full) and "=" in pd:
            out[pd] = sorted(
                os.stat(os.path.join(full, f)).st_ino
                for f in os.listdir(full)
                if f.endswith(".parquet")
            )
    return out


def test_dv_delete_masks_carries_and_time_travels(spark, tmp_path, lake_fs):
    root = str(tmp_path / "t")
    _mk_tree(spark, root)
    # establish a versioned base (retain 3 so pre-delete stays readable)
    spark.conf.set("spark.poc.lake.retain", "3")
    try:
        n = delete_keys_dv(spark, root, _keys(spark, 7, 8, 30), "k", "part")
        assert n == 3  # keys 7,8,30 span partitions p0/p1/p2
        got = sorted(r["k"] for r in read_snapshot(spark, root).collect())
        assert got == sorted(set(range(1, 61)) - {7, 8, 30})

        v_cur = resolve_snapshot(root, spark)
        if lake_fs == "posix":
            vs = list_versions(root)
            prev = v_cur.rsplit(".v", 1)[0] + f".v{vs[-2]:06d}"
            # merge-on-read: EVERY data file byte-carried (same inodes)
            assert _data_inos(v_cur) == _data_inos(prev)

        # time travel: the pre-delete version serves the full table
        vs = list_versions(root)
        full = read_version(spark, root, vs[-2])
        assert full.count() == 60

        # second delete accumulates; re-delete of a masked key no-ops
        n2 = delete_keys_dv(spark, root, _keys(spark, 8, 9), "k", "part")
        assert n2 == 4
        assert read_snapshot(spark, root).count() == 56
    finally:
        spark.conf.unset("spark.poc.lake.retain")


def test_merge_folds_dv_per_partition_and_reinserts(spark, tmp_path, lake_fs):
    root = str(tmp_path / "t")
    _mk_tree(spark, root)
    delete_keys_dv(spark, root, _keys(spark, 7, 9), "k", "part")  # p1, p0
    # re-insert key 9 into p0: the merge rewrites p0, dropping p0's DV
    # rows — the fresh row must NOT be masked by the old tombstone
    up = spark.createDataFrame([(9, "p0", -999)], "k long, part string, v long")
    merge_upsert_partitioned(spark, root, up, "k", "part")
    snap = read_snapshot(spark, root)
    assert [r["v"] for r in snap.filter("k = 9").collect()] == [-999]
    assert snap.filter("k = 7").count() == 0  # p1's tombstone survives
    cur = resolve_snapshot(root, spark)
    dv = spark.read.parquet(os.path.join(cur, _DV_DIR, "keys"))
    assert [(r["_dv_part"], r["_dv_key"]) for r in dv.collect()] == [("p1", 7)]


def test_fold_dv_retires_sidecar(spark, tmp_path, lake_fs):
    root = str(tmp_path / "t")
    _mk_tree(spark, root)
    delete_keys_dv(spark, root, _keys(spark, 7, 10), "k", "part")  # p1 only
    before = _data_inos(resolve_snapshot(root, spark))
    folded = fold_dv(spark, root)
    assert folded == ["p1"]
    cur = resolve_snapshot(root, spark)
    assert not os.path.exists(os.path.join(cur, _DV_DIR))
    got = sorted(r["k"] for r in read_snapshot(spark, root).collect())
    assert got == sorted(set(range(1, 61)) - {7, 10})
    if lake_fs == "posix":
        after = _data_inos(cur)
        assert after["part=p0"] == before["part=p0"]  # carried
        assert after["part=p2"] == before["part=p2"]
        assert after["part=p1"] != before["part=p1"]  # rewritten
    assert fold_dv(spark, root) == []  # nothing left to fold


def test_dv_composes_with_commit_scoped_index(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk_tree(spark, root)
    create_stats_index_tree(spark, root, ["v"], name="sv")
    delete_keys_dv(spark, root, _keys(spark, 15), "k", "part")
    # index carried through the DV commit, still validates; the pruned
    # scan must not resurface the deleted row (v=150 is in range)
    df, n_sel, n_tot = read_tree_with_skipping(spark, root, "v", 100, 200, "sv")
    got = sorted(r["k"] for r in df.collect())
    assert got == [k for k in range(10, 21) if k != 15]
    assert 0 < n_sel <= n_tot


def test_dv_key_discipline_guard(spark, tmp_path):
    root = str(tmp_path / "t")
    _mk_tree(spark, root)
    delete_keys_dv(spark, root, _keys(spark, 7), "k", "part")
    with pytest.raises(ValueError, match="one key discipline"):
        delete_keys_dv(
            spark,
            root,
            spark.createDataFrame([(1,)], "v long"),
            "v",
            "part",
        )
