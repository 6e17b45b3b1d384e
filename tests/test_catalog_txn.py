"""Atomic multi-table catalog transactions (sources/catalog_txn.py):
all-or-nothing visibility, epoch conflicts, pin lifecycle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poc_spark.sources.catalog_txn import (
    catalog_init,
    catalog_read_table,
    catalog_txn_upsert,
)
from poc_spark.sources.lake import (
    ConcurrentCommitError,
    list_refs,
    vacuum_tree,
    write_partitioned,
)

SCHEMA = "k long, part string, val long"


@pytest.fixture()
def setup(spark, tmp_path_repo):
    a = str(tmp_path_repo / "facts")
    b = str(tmp_path_repo / "summary")
    write_partitioned(
        spark.createDataFrame([(1, "x", 10), (2, "y", 20)], SCHEMA), a, ["part"]
    )
    write_partitioned(
        spark.createDataFrame([(100, "x", 1), (200, "y", 1)], SCHEMA), b, ["part"]
    )
    cat = str(tmp_path_repo / "catalog.json")
    catalog_init(spark, cat, {"facts": a, "summary": b})
    return cat, a, b


def _vals(spark, cat, name):
    return {
        r["k"]: r["val"] for r in catalog_read_table(spark, cat, name).collect()
    }


def test_txn_is_all_or_nothing(spark, setup):
    cat, a, b = setup
    seen_mid = {}

    def probe():
        seen_mid["facts"] = _vals(spark, cat, "facts")
        seen_mid["summary"] = _vals(spark, cat, "summary")

    upd_a = spark.createDataFrame([(1, "x", 11)], SCHEMA)
    upd_b = spark.createDataFrame([(100, "x", 2)], SCHEMA)
    catalog_txn_upsert(
        spark,
        cat,
        {"facts": (upd_a, "k", "part"), "summary": (upd_b, "k", "part")},
        _pre_commit_hook=probe,
    )
    # mid-txn (data staged, catalog not flipped): BOTH tables still old
    assert seen_mid["facts"][1] == 10 and seen_mid["summary"][100] == 1
    # post-commit: BOTH new
    assert _vals(spark, cat, "facts")[1] == 11
    assert _vals(spark, cat, "summary")[100] == 2


def test_concurrent_txn_loses_loudly_and_releases_pins(spark, setup):
    cat, a, b = setup
    upd1 = spark.createDataFrame([(1, "x", 11)], SCHEMA)
    upd2 = spark.createDataFrame([(1, "x", 12)], SCHEMA)

    def competing_commit():
        catalog_txn_upsert(spark, cat, {"facts": (upd1, "k", "part")})

    with pytest.raises(ConcurrentCommitError):
        catalog_txn_upsert(
            spark,
            cat,
            {"facts": (upd2, "k", "part")},
            _pre_commit_hook=competing_commit,
        )
    # the winner's state is served; the loser changed nothing
    assert _vals(spark, cat, "facts")[1] == 11
    # loser's txn branches and next-epoch tags are gone
    names = set(list_refs(a))
    assert not any(n.startswith("txn-") for n in names)
    # exactly the current epoch's tags remain pinned
    assert any(n.startswith("cat2-") for n in names)


def test_untouched_tables_carry_and_old_pins_release(spark, setup):
    cat, a, b = setup
    upd = spark.createDataFrame([(1, "x", 11)], SCHEMA)
    catalog_txn_upsert(spark, cat, {"facts": (upd, "k", "part")})
    # summary untouched: still readable at its pinned version
    assert _vals(spark, cat, "summary") == {100: 1, 200: 1}
    # epoch-1 tags were dropped on both tables
    assert not any(n.startswith("cat1-") for n in list_refs(a))
    assert not any(n.startswith("cat1-") for n in list_refs(b))
    # pins hold through vacuum: catalog reads survive aggressive cleanup
    for i in range(3):
        catalog_txn_upsert(
            spark,
            cat,
            {"facts": (spark.createDataFrame([(1, "x", 20 + i)], SCHEMA), "k", "part")},
        )
    vacuum_tree(a, spark=spark)
    vacuum_tree(b, spark=spark)
    assert _vals(spark, cat, "facts")[1] == 22
    assert _vals(spark, cat, "summary") == {100: 1, 200: 1}


def test_unknown_table_rejected(spark, setup):
    cat, a, b = setup
    upd = spark.createDataFrame([(1, "x", 11)], SCHEMA)
    with pytest.raises(ValueError, match="no tables"):
        catalog_txn_upsert(spark, cat, {"nope": (upd, "k", "part")})
