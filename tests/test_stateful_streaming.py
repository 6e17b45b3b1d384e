"""applyInPandasWithState cross-batch dedup: duplicates dropped within
a batch AND across separate runs sharing a checkpoint."""

from __future__ import annotations

import pytest

from poc_spark.streaming.ingest import parse_chat_stream, stream_chat_lines
from poc_spark.streaming.stateful import dedup_stream

BATCH1 = """[1.10.2023, 08:00:00] Alice: hello world
[1.10.2023, 08:01:00] Bob: unique message
[1.10.2023, 08:02:00] Alice: hello   WORLD
[1.10.2023, 08:03:00] Bob: hello world
"""
# Alice's second line normalizes to her first -> dropped (same batch);
# Bob's "hello world" is a DIFFERENT key (sender in the hash) -> kept.

BATCH2 = """[2.10.2023, 09:00:00] Alice: hello world
[2.10.2023, 09:01:00] Alice: brand new
"""
# Alice's repeat arrives a batch later -> dropped by state; new kept.


def _run(spark, landing, out, ckpt):
    q = (
        dedup_stream(parse_chat_stream(stream_chat_lines(spark, str(landing))))
        .writeStream.format("parquet")
        .outputMode("append")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return sorted(
        (str(r["ts"]), r["sender"], r["message"])
        for r in spark.read.parquet(str(out)).collect()
    )


def test_cross_batch_dedup(spark, tmp_path_repo):
    landing = tmp_path_repo / "landing"
    landing.mkdir()
    (landing / "b1.txt").write_text(BATCH1, encoding="utf-8")
    out, ckpt = tmp_path_repo / "out", tmp_path_repo / "ckpt"

    got1 = _run(spark, landing, out, ckpt)
    assert got1 == [
        ("2023-10-01 08:00:00", "Alice", "hello world"),
        ("2023-10-01 08:01:00", "Bob", "unique message"),
        ("2023-10-01 08:03:00", "Bob", "hello world"),
    ]

    (landing / "b2.txt").write_text(BATCH2, encoding="utf-8")
    got2 = _run(spark, landing, out, ckpt)
    # only the genuinely new message was added; Alice's cross-batch
    # duplicate was suppressed by the state store
    assert len(got2) == 4
    assert ("2023-10-02 09:01:00", "Alice", "brand new") in got2
    assert ("2023-10-02 09:00:00", "Alice", "hello world") not in got2
