"""Serving edge: shape engine results into the reference's JSON API
responses (OP-PROJ-NODES / OP-PROJ-LINKS — the only place collect() is
allowed; everything upstream stays distributed).

Reference responses reproduced:
  GET /analyze/network/{filename} → {"nodes": [{"id": ...}],
      "links": [{"source","target","weight"}]}   (backend/main.py:328-338)
  POST /upload-chats → {"status","inserted_rows","group_name"}
      (backend/main.py:391-395)
  word-frequency contract → {"analysis": {word: count}}
      (frontend/src/components/Formgibui.jsx:63-83)
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession

from poc_spark.functions.chat_parse import parse_chat_lines
from poc_spark.operators.etl import parse_chat_table
from poc_spark.operators.network import interaction_graph
from poc_spark.operators.text import top_k_words, word_freq
from poc_spark.sources.chat import read_chat_lines


def network_response(nodes: DataFrame, edges: DataFrame) -> dict:
    """EP-1 response shape. Node order is not part of the contract (the
    reference iterates a Python set); links carry canonical source <=
    target."""
    return {
        "nodes": [{"id": r["id"]} for r in nodes.collect()],
        "links": [
            {"source": r["source"], "target": r["target"], "weight": r["weight"]}
            for r in edges.collect()
        ],
    }


def analyze_network(
    spark: SparkSession,
    path: str,
    start_date: str | dt.date | None = None,
    end_date: str | dt.date | None = None,
    limit: int | None = None,
) -> dict:
    """GET /analyze/network/{filename} end to end: text scan → parse →
    filters → graph → JSON (backend/main.py:255-342). Missing file →
    FileNotFoundError (OP-FIL-EXISTS: the reference 404s,
    backend/main.py:264-266) instead of a Java stack trace."""
    import os

    if not os.path.exists(path):
        raise FileNotFoundError(f"File '{os.path.basename(path)}' not found.")
    msgs = parse_chat_lines(read_chat_lines(spark, path))
    nodes, edges = interaction_graph(msgs, start_date, end_date, limit)
    return network_response(nodes, edges)


def upload_chats_response(spark: SparkSession, path: str, table_path: str) -> dict:
    """POST /upload-chats end to end: parse → group-name exclusion →
    append sink → counts (backend/main.py:349-395)."""
    from poc_spark.operators.etl import append_messages

    # cache: the parsed table feeds both the group-name probe and the
    # append sink. try/finally unpersist — a serving process handles
    # many uploads per session, and CacheManager entries never free
    # themselves (VERDICT r4 #7).
    msgs = parse_chat_table(read_chat_lines(spark, path)).cache()
    try:
        group = msgs.select("group_name").limit(1).collect()
        inserted = append_messages(msgs, table_path)
        return {
            "status": "success",
            "inserted_rows": inserted,
            "group_name": group[0]["group_name"] if group else None,
        }
    finally:
        msgs.unpersist()


def analyze_words_response(messages: DataFrame, k: int = 10) -> dict:
    """The revived /analyze/{filename} contract: top-k word histogram."""
    wf = top_k_words(word_freq(messages, "message"), k)
    return {"analysis": {r["word"]: r["freq"] for r in wf.collect()}}
