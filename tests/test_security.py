"""OP-FN-HASH parity: salted credential digest + verify-by-recompute
(reference: bcrypt.hashpw/checkpw, backend/main.py:135,148,181)."""

from __future__ import annotations

from pyspark.sql import functions as F

from poc_spark.functions.security import (
    credential_digest,
    verify_credential,
    with_credential,
)


def test_digest_format_and_determinism(spark):
    df = spark.createDataFrame(
        [("alice", "hunter2"), ("bob", "pa55w0rd")], "user string, pw string"
    ).select(
        "user",
        credential_digest(F.col("pw"), F.lit("a1b2c3d4e5f60718")).alias("d1"),
        credential_digest(F.col("pw"), F.lit("a1b2c3d4e5f60718")).alias("d2"),
        credential_digest(F.col("pw"), F.lit("ffffffffffffffff")).alias("d3"),
    )
    rows = {r["user"]: r for r in df.collect()}
    for r in rows.values():
        assert r["d1"] == r["d2"]  # same salt -> same digest
        assert r["d1"] != r["d3"]  # salt changes the digest
        scheme, salt, hexd = r["d1"].split("$")
        assert scheme == "sha256" and salt == "a1b2c3d4e5f60718"
        assert len(hexd) == 64 and int(hexd, 16) >= 0
    assert rows["alice"]["d1"] != rows["bob"]["d1"]


def test_verify_roundtrip_and_salt_entropy(spark):
    users = spark.createDataFrame(
        [("alice", "hunter2"), ("bob", "pa55w0rd"), ("carol", "hunter2")],
        "user string, pw string",
    )
    stored = with_credential(users, "pw", out_col="stored").cache()
    # per-user random salts: same password, different digests
    digs = [r["stored"] for r in stored.collect()]
    assert len(set(digs)) == 3

    ok = stored.select(verify_credential(F.col("pw"), F.col("stored")).alias("v"))
    assert all(r["v"] for r in ok.collect())
    bad = stored.select(
        verify_credential(F.lit("wrong"), F.col("stored")).alias("v")
    )
    assert not any(r["v"] for r in bad.collect())
    # malformed stored value -> false, never a crash (ANSI-safe F.get)
    malformed = stored.select(
        verify_credential(F.col("pw"), F.lit("garbage-no-dollars")).alias("v")
    )
    assert not any(r["v"] for r in malformed.collect())
