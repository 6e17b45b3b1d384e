"""Dimension CRUD tests (SURVEY §2.7): insert / None-skip update /
delete / point lookup / ordered scan over versioned parquet snapshots."""

from __future__ import annotations

from poc_spark.operators.dims import DimTable

USERS = [
    ("u1", "Alice", "alice@x.io", "h1", None),
    ("u2", "Bob", "bob@x.io", "h2", "b.png"),
]
SCHEMA = "user_id string, name string, email string, password string, avatar string"


def _users(spark, tmp):
    dim = DimTable(spark, str(tmp / "users"), key="user_id")
    dim.init(spark.createDataFrame(USERS, SCHEMA))
    return dim


def test_insert_and_scan(spark, tmp_path_repo):
    dim = _users(spark, tmp_path_repo)
    n = dim.insert(spark.createDataFrame([("u3", "Carol", "c@x.io", "h3", None)], SCHEMA))
    assert n == 1
    page = dim.scan(limit=100).collect()
    assert [r["user_id"] for r in page] == ["u1", "u2", "u3"]


def test_update_none_skip(spark, tmp_path_repo):
    dim = _users(spark, tmp_path_repo)
    # $set {"name": "Alicia"} — email None must be SKIPPED, not nulled
    matched = dim.update(
        spark.createDataFrame([("u1", "Alicia", None)], "user_id string, name string, email string")
    )
    assert matched == 1
    row = dim.point_lookup("u1").collect()[0]
    assert row["name"] == "Alicia"
    assert row["email"] == "alice@x.io"  # untouched
    assert row["password"] == "h1"       # column absent from update → kept


def test_update_unmatched_returns_zero(spark, tmp_path_repo):
    dim = _users(spark, tmp_path_repo)
    assert dim.update(
        spark.createDataFrame([("zzz", "Nobody")], "user_id string, name string")
    ) == 0  # caller 404s, like matched_count == 0


def test_delete(spark, tmp_path_repo):
    dim = _users(spark, tmp_path_repo)
    assert dim.delete("u2") == 1
    assert dim.delete("u2") == 0  # second delete → 404 path
    assert [r["user_id"] for r in dim.scan().collect()] == ["u1"]


def test_point_lookup_missing(spark, tmp_path_repo):
    dim = _users(spark, tmp_path_repo)
    assert dim.point_lookup("nope").count() == 0


def test_row_factories_uuid_and_now(spark, tmp_path_repo):
    from poc_spark.operators.dims import make_research_rows, make_user_rows

    users = make_user_rows(spark, [("Eve", "e@x.io", "h", None)]).collect()
    assert len(users) == 1 and len(users[0]["user_id"]) == 36  # uuid4 shape
    # two generations yield different keys (non-deterministic by design)
    again = make_user_rows(spark, [("Eve", "e@x.io", "h", None)]).collect()
    assert users[0]["user_id"] != again[0]["user_id"]

    res = make_research_rows(
        spark, [("study", "desc", "2023-01-01", "2023-02-01", 50)]
    ).collect()
    assert res[0]["created_at"] is not None
    assert res[0]["message_limit"] == 50


def test_versions_and_vacuum(spark, tmp_path_repo):
    dim = _users(spark, tmp_path_repo)
    dim.insert(spark.createDataFrame([("u3", "C", "c@x", "h", None)], SCHEMA))
    dim.delete("u1")
    assert len(dim._versions()) == 3
    dim.vacuum(keep=1)
    assert len(dim._versions()) == 1
    assert {r["user_id"] for r in dim.read().collect()} == {"u2", "u3"}
