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


def test_commit_point_is_cas_not_check_then_put(spark, setup):
    # the lost-update window the epoch re-check had: competitor
    # commits BETWEEN our epoch re-read and our PUT. With the claim
    # object as the commit point the window is gone by construction —
    # simulate it by letting the competitor win the claim inside the
    # pre-commit hook (after we staged from the same epoch) and assert
    # the winner's state is never clobbered.
    cat, a, b = setup
    upd_winner = spark.createDataFrame([(1, "x", 77)], SCHEMA)
    upd_loser = spark.createDataFrame([(1, "x", 88)], SCHEMA)

    def competitor():
        catalog_txn_upsert(spark, cat, {"facts": (upd_winner, "k", "part")})

    with pytest.raises(ConcurrentCommitError, match="claimed"):
        catalog_txn_upsert(
            spark,
            cat,
            {"facts": (upd_loser, "k", "part")},
            _pre_commit_hook=competitor,
        )
    assert _vals(spark, cat, "facts")[1] == 77


def test_stale_hint_still_serves_committed_epoch(spark, setup):
    # crash between the epoch claim and the hint refresh: readers must
    # resolve the committed epoch through the claim chain
    import json

    from poc_spark.sources.lake import _fs

    cat, a, b = setup
    fs = _fs(spark, cat)
    old_hint = fs.get_bytes(cat)
    upd = spark.createDataFrame([(1, "x", 55)], SCHEMA)
    catalog_txn_upsert(spark, cat, {"facts": (upd, "k", "part")})
    # simulate the crash by restoring the stale hint
    fs.put_atomic(cat, old_hint)
    assert _vals(spark, cat, "facts")[1] == 55
    # and a follow-up txn picks up from the REAL epoch, not the hint's
    upd2 = spark.createDataFrame([(1, "x", 56)], SCHEMA)
    new_cat = catalog_txn_upsert(spark, cat, {"facts": (upd2, "k", "part")})
    assert new_cat["epoch"] == 3
    assert json.loads(fs.get_bytes(cat))["epoch"] == 3
    assert _vals(spark, cat, "facts")[1] == 56


def test_losing_catalog_init_leaks_no_pins(spark, setup, tmp_path_repo):
    # a second creator at the same catalog path loses the conditional
    # PUT and must delete its own attempt-unique cat1-* tags (tags-
    # first ordering with loser-side cleanup, r12 ADVICE — the winner's
    # catalog must never name an unpinned version, so tagging cannot
    # move after the claim)
    cat, a, b = setup
    c = str(tmp_path_repo / "other")
    write_partitioned(
        spark.createDataFrame([(7, "x", 1)], SCHEMA), c, ["part"]
    )
    with pytest.raises(ValueError, match="already exists"):
        catalog_init(spark, cat, {"other": c})
    assert not any(n.startswith("cat1-") for n in list_refs(c))


def test_catalog_init_pins_exist_at_commit(spark, tmp_path_repo):
    # no unpinned window: the moment catalog_init returns, every table
    # the catalog names carries an epoch-1 pin tag (created BEFORE the
    # epoch-1 claim — a concurrent vacuum between claim and tag could
    # otherwise prune a version the committed catalog points at)
    a = str(tmp_path_repo / "t1")
    write_partitioned(
        spark.createDataFrame([(1, "x", 10)], SCHEMA), a, ["part"]
    )
    cat = str(tmp_path_repo / "cat.json")
    catalog_init(spark, cat, {"t1": a})
    assert any(n.startswith("cat1-t1-") for n in list_refs(a))


def test_unknown_table_rejected(spark, setup):
    cat, a, b = setup
    upd = spark.createDataFrame([(1, "x", 11)], SCHEMA)
    with pytest.raises(ValueError, match="no tables"):
        catalog_txn_upsert(spark, cat, {"nope": (upd, "k", "part")})


def test_deeply_stale_hint_probes_full_claim_chain(spark, setup):
    # hint left THREE epochs behind: the reader must walk the
    # contiguous claim chain e2 -> e3 -> e4 to the committed epoch
    import json

    from poc_spark.sources.lake import _fs

    cat, a, b = setup
    fs = _fs(spark, cat)
    old_hint = fs.get_bytes(cat)  # epoch 1
    for i in range(3):
        catalog_txn_upsert(
            spark,
            cat,
            {
                "facts": (
                    spark.createDataFrame([(1, "x", 60 + i)], SCHEMA),
                    "k",
                    "part",
                )
            },
        )
    fs.put_atomic(cat, old_hint)  # simulate three crashed hint writes
    assert _vals(spark, cat, "facts")[1] == 62
    new_cat = catalog_txn_upsert(
        spark,
        cat,
        {"facts": (spark.createDataFrame([(1, "x", 99)], SCHEMA), "k", "part")},
    )
    assert new_cat["epoch"] == 5
    assert json.loads(fs.get_bytes(cat))["epoch"] == 5
