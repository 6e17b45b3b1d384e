"""Serving-edge tests: the reference's JSON response shapes."""

from __future__ import annotations

from poc_spark.functions.chat_parse import parse_chat_lines
from poc_spark.serve import (
    analyze_network,
    analyze_words_response,
    upload_chats_response,
)
from poc_spark.sources.chat import chat_lines_from_strings

CHAT = """[7.10.2023, 19:43:25] Group Chat: created
[7.10.2023, 19:44:00] Alice: hello there world
[7.10.2023, 19:45:00] Bob: hello again
[8.10.2023, 09:00:00] Alice: world peace
"""


def _write(tmp, name="c.txt"):
    p = tmp / name
    p.write_text(CHAT, encoding="utf-8")
    return str(p)


def test_analyze_network_response_shape(spark, tmp_path_repo):
    resp = analyze_network(spark, _write(tmp_path_repo), limit=50)
    assert {n["id"] for n in resp["nodes"]} == {"GroupChat", "Alice", "Bob"}
    links = {(l["source"], l["target"]): l["weight"] for l in resp["links"]}
    assert links[("Alice", "Bob")] == 2
    assert all(l["source"] <= l["target"] for l in resp["links"])


def test_upload_chats_response(spark, tmp_path_repo):
    resp = upload_chats_response(
        spark, _write(tmp_path_repo), str(tmp_path_repo / "tbl")
    )
    assert resp["status"] == "success"
    assert resp["group_name"] == "Group Chat"   # raw, unnormalized (EP-2)
    assert resp["inserted_rows"] == 3
    assert spark.read.parquet(str(tmp_path_repo / "tbl")).count() == 3


def test_analyze_words_response(spark):
    msgs = parse_chat_lines(chat_lines_from_strings(spark, CHAT.splitlines()))
    resp = analyze_words_response(msgs, k=3)
    assert resp["analysis"]["hello"] == 2
    assert len(resp["analysis"]) == 3
