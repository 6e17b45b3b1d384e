"""Branch/tag refs on the version-pointer tree (sources/lake.py):
isolation, fast-forward, pinning against retention/vacuum, tag
immutability, shared version number line."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poc_spark.sources.lake import (
    ConcurrentCommitError,
    create_branch,
    create_tag,
    delete_ref,
    fast_forward_main,
    list_refs,
    list_versions,
    merge_upsert_branch,
    merge_upsert_partitioned,
    read_ref,
    read_snapshot,
    vacuum_tree,
    write_partitioned,
)

SCHEMA = "k long, part string, val long"
BASE = [(1, "a", 10), (2, "a", 20), (3, "b", 30), (4, "b", 40)]


@pytest.fixture()
def tree(spark, tmp_path_repo):
    root = str(tmp_path_repo / "tree")
    write_partitioned(spark.createDataFrame(BASE, SCHEMA), root, ["part"])
    return root


def _state(spark, df):
    return {r["k"]: (r["part"], r["val"]) for r in df.collect()}


def _upd(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def test_branch_commits_are_isolated_until_fast_forward(spark, tree):
    create_branch(spark, tree, "dev")
    merge_upsert_branch(spark, tree, "dev", _upd(spark, [(1, "a", 11)]), "k", "part")
    merge_upsert_branch(spark, tree, "dev", _upd(spark, [(5, "c", 50)]), "k", "part")
    # branch sees both commits, main sees none
    assert _state(spark, read_ref(spark, tree, "dev")) == {
        1: ("a", 11), 2: ("a", 20), 3: ("b", 30), 4: ("b", 40), 5: ("c", 50),
    }
    assert _state(spark, read_snapshot(spark, tree)) == {
        1: ("a", 10), 2: ("a", 20), 3: ("b", 30), 4: ("b", 40),
    }
    v = fast_forward_main(spark, tree, "dev")
    assert _state(spark, read_snapshot(spark, tree))[1] == ("a", 11)
    assert v == list_versions(tree)[-1]
    # main can keep committing on the shared number line after the ff
    merge_upsert_partitioned(spark, tree, _upd(spark, [(6, "a", 60)]), "k", "part")
    assert _state(spark, read_snapshot(spark, tree))[6] == ("a", 60)


def test_branch_is_reusable_across_fast_forward_cycles(spark, tree):
    # commit→FF→commit→FF: the FF advances the branch's fork base to
    # the merged head, so the branch is NOT one-shot
    create_branch(spark, tree, "dev")
    merge_upsert_branch(spark, tree, "dev", _upd(spark, [(1, "a", 11)]), "k", "part")
    fast_forward_main(spark, tree, "dev")
    refs = list_refs(tree)["dev"]
    assert refs["base"] == refs["current"]
    merge_upsert_branch(spark, tree, "dev", _upd(spark, [(2, "a", 22)]), "k", "part")
    v2 = fast_forward_main(spark, tree, "dev")
    assert _state(spark, read_snapshot(spark, tree))[2] == ("a", 22)
    assert v2 == list_versions(tree)[-1]
    # repeat FF when main already sits at the branch head: no-op
    assert fast_forward_main(spark, tree, "dev") == v2
    assert _state(spark, read_snapshot(spark, tree))[2] == ("a", 22)


def test_divergence_refuses_fast_forward(spark, tree):
    create_branch(spark, tree, "dev")
    merge_upsert_branch(spark, tree, "dev", _upd(spark, [(1, "a", 11)]), "k", "part")
    # main advances independently -> histories diverge
    merge_upsert_partitioned(spark, tree, _upd(spark, [(2, "a", 21)]), "k", "part")
    with pytest.raises(ValueError, match="diverged"):
        fast_forward_main(spark, tree, "dev")


def test_main_claim_skips_branch_version_numbers(spark, tree):
    create_branch(spark, tree, "dev")
    merge_upsert_branch(spark, tree, "dev", _upd(spark, [(1, "a", 11)]), "k", "part")
    # a main commit AFTER the branch took a higher number must not
    # collide with it (shared number line)
    merge_upsert_partitioned(spark, tree, _upd(spark, [(2, "a", 21)]), "k", "part")
    assert _state(spark, read_snapshot(spark, tree))[2] == ("a", 21)
    assert _state(spark, read_ref(spark, tree, "dev"))[1] == ("a", 11)


def test_tag_pins_against_retention_and_vacuum(spark, tree):
    create_tag(spark, tree, "run7")
    tagged = _state(spark, read_ref(spark, tree, "run7"))
    # default retain=2: three more commits would normally prune the base
    for i in range(3):
        merge_upsert_partitioned(
            spark, tree, _upd(spark, [(1, "a", 100 + i)]), "k", "part"
        )
    vacuum_tree(tree, spark=spark)
    assert _state(spark, read_ref(spark, tree, "run7")) == tagged
    # dropping the ref releases the pin; the next vacuum collects it
    pinned_version = list_refs(tree)["run7"]["version"]
    delete_ref(tree, "run7")
    vacuum_tree(tree, spark=spark)
    assert pinned_version not in list_versions(tree)


def test_tags_are_immutable_and_names_unique(spark, tree):
    create_tag(spark, tree, "run7")
    with pytest.raises(ValueError, match="immutable"):
        merge_upsert_branch(
            spark, tree, "run7", _upd(spark, [(1, "a", 11)]), "k", "part"
        )
    with pytest.raises(ValueError, match="immutable"):
        fast_forward_main(spark, tree, "run7")
    with pytest.raises(ValueError, match="already exists"):
        create_branch(spark, tree, "run7")
    with pytest.raises(ValueError, match="invalid"):
        create_branch(spark, tree, "../escape")


def test_stale_branch_head_commit_conflicts(spark, tree):
    create_branch(spark, tree, "dev")
    from poc_spark.sources.lake import _fs, _read_ref_payload

    fs = _fs(spark, tree)
    stale = _read_ref_payload(tree, "dev", fs)
    merge_upsert_branch(spark, tree, "dev", _upd(spark, [(1, "a", 11)]), "k", "part")
    # a writer that still holds the pre-commit head must lose loudly
    import os

    from poc_spark.sources.lake import _publish_ref

    with pytest.raises(ConcurrentCommitError):
        _publish_ref(
            tree,
            "dev",
            os.path.join(os.path.dirname(tree), stale["current"]),
            os.path.join(os.path.dirname(tree), stale["current"]),
            fs,
        )
