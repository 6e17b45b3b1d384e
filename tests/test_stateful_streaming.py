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


def test_emit_first_spans_arrow_chunks():
    """The min-ts row must win even when it arrives in a LATER pandas
    chunk of the same group (Arrow chunking is an implementation detail,
    not an ordering guarantee)."""
    import pandas as pd

    from poc_spark.streaming.stateful import emit_first_occurrence

    class FakeState:
        exists = False

        def update(self, v):
            self.exists = True

    def row(ts, msg):
        return {
            "text_sha": "k",
            "file_path": "f",
            "ts": pd.Timestamp(ts),
            "sender": "Alice",
            "message": msg,
        }

    # chunk 1 holds later rows; the true first occurrence is in chunk 2
    chunks = iter(
        [
            pd.DataFrame([row("2023-10-01 09:00:00", "late"),
                          row("2023-10-01 09:05:00", "later")]),
            pd.DataFrame([]),
            pd.DataFrame([row("2023-10-01 08:00:00", "FIRST"),
                          row("2023-10-01 08:30:00", "second")]),
        ]
    )
    out = list(emit_first_occurrence(("k",), chunks, FakeState()))
    assert len(out) == 1
    assert out[0]["message"].iloc[0] == "FIRST"

    # already-seen key: nothing emitted regardless of content
    seen = FakeState()
    seen.exists = True
    assert (
        list(
            emit_first_occurrence(
                ("k",), iter([pd.DataFrame([row("2023-10-01 07:00:00", "x")])]), seen
            )
        )
        == []
    )


def test_first_event_stream_cross_batch(spark, tmp_path_repo):
    """first_event_stream emits each key's min event time exactly once
    across micro-batches: a key re-seen in a later batch is dropped by
    the state, and the first batch's min wins under time-ordered files."""
    import os
    import time
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    from poc_spark.streaming.stateful import first_event_stream

    staged = str(tmp_path_repo / "dedup_src")
    os.makedirs(staged)
    sch = pa.schema([("user_id", pa.int64()), ("event_type", pa.string()),
                     ("ts", pa.timestamp("us", tz="UTC"))])

    def write(name, rows, mtime):
        tbl = pa.table(
            {"user_id": pa.array([r[0] for r in rows], pa.int64()),
             "event_type": pa.array([r[1] for r in rows], pa.string()),
             "ts": pa.array([r[2] for r in rows],
                            pa.timestamp("us", tz="UTC"))},
            schema=sch)
        p = os.path.join(staged, name)
        pq.write_table(tbl, p)
        os.utime(p, (mtime, mtime))

    t0 = time.time() - 300
    # batch 1: key (1, click) twice (min 100), key (2, view) once
    write("f1.parquet", [(1, "click", 100), (1, "click", 200),
                         (2, "view", 150)], t0)
    # batch 2: key (1, click) again (must be DROPPED), new key (3, buy)
    write("f2.parquet", [(1, "click", 300), (3, "buy", 250)], t0 + 30)

    src = (spark.readStream
           .schema("user_id long, event_type string, ts timestamp")
           .option("maxFilesPerTrigger", "1").parquet(staged))
    qname = "dedup_t_" + uuid.uuid4().hex[:8]
    q = (first_event_stream(src).writeStream.format("memory")
         .queryName(qname).outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination()
    got = {(r["user_id"], r["event_type"]): r["first_ts_us"]
           for r in spark.table(qname).collect()}
    assert got == {(1, "click"): 100, (2, "view"): 150, (3, "buy"): 250}
