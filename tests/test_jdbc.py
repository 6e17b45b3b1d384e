"""Live JDBC sink round-trip (OP-SINK-JDBC): the reference inserts
parsed chat rows into MySQL (backend/main.py:380-387); the engine's
`append_messages_jdbc` must drive a real JDBC connection. The sandbox
has no MySQL, but Spark ships Apache Derby (embedded JDBC database) —
a genuine JDBC driver + SQL engine, so the sink's execution path
(driver class loading, DDL inference, batched inserts, append mode,
read-back) is exercised for real, not just the parquet analog."""

from __future__ import annotations

import pytest

from poc_spark.operators.etl import append_messages_jdbc, parse_chat_table
from poc_spark.sources.chat import read_chat_lines

CHAT = """[1.10.2023, 08:00:00] Group Chat: created
[1.10.2023, 08:01:00] Alice: hello
[1.10.2023, 08:02:00] Bob: hi there
[1.10.2023, 08:03:00] Alice: bye
"""

DERBY_PROPS = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}


@pytest.fixture()
def messages(spark, tmp_path_repo):
    f = tmp_path_repo / "chat.txt"
    f.write_text(CHAT, encoding="utf-8")
    return parse_chat_table(read_chat_lines(spark, str(f)))


def test_jdbc_round_trip_and_append(spark, messages, tmp_path_repo):
    url = f"jdbc:derby:{tmp_path_repo}/derbydb;create=true"

    append_messages_jdbc(messages, url, "whatsapp_messages", **DERBY_PROPS)
    back = spark.read.jdbc(url, "whatsapp_messages", properties=DERBY_PROPS)

    rows = sorted(
        (r["group_name"], r["date_time"], r["sender"], r["message"])
        for r in back.collect()
    )
    # first matched line's sender is the group name and its row (plus any
    # later row by the group name itself) is excluded — EP-2 semantics
    assert rows == [
        ("Group Chat", "1.10.2023, 08:01:00", "Alice", "hello"),
        ("Group Chat", "1.10.2023, 08:02:00", "Bob", "hi there"),
        ("Group Chat", "1.10.2023, 08:03:00", "Alice", "bye"),
    ]

    # append mode: a second batch lands on top, never truncates
    append_messages_jdbc(messages, url, "whatsapp_messages", **DERBY_PROPS)
    assert (
        spark.read.jdbc(url, "whatsapp_messages", properties=DERBY_PROPS).count()
        == 6
    )
