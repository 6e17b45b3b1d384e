"""Adversarial differential fuzzing: the Spark pipeline vs the
reference-twin oracle on hostile line shapes the golden fixture doesn't
cover — nested brackets, colons in senders, '] ' inside messages, tabs,
tilde-only senders, empty messages, date-like garbage.
"""

from __future__ import annotations

import random

import pytest

from poc_spark.functions.chat_parse import parse_chat_lines
from poc_spark.operators.network import interaction_graph
from poc_spark.sources.chat import chat_lines_from_strings
from tests.reference_oracle import analyze_network

SENDERS = [
    "Alice",
    "~~tilde~~",
    "~",                       # strips to empty -> row dropped
    "a:b",                     # colon IN the sender: split keeps 'a'
    "Dr. Who (PhD)",
    "[bracket] name",
    " spaced out ",
    "🦆🦆",
    "דני כהן",
]

MESSAGES = [
    "plain text",
    "with ] bracket",
    "with ] space: and colon",
    "multi: colons: everywhere:",
    "",                         # empty message: '[d] s: ' has ': ' but regex needs .+
    "  leading spaces",
    "ends with ]",
    "הושמט hidden token",       # omitted token INSIDE a message
    "tab\there",
]

DATES = ["1.10.2023", "15.1.2023", "31.12.2023", "99.99.9999", "0.0.0000", "5.5.2023"]


def _fuzz_lines(rng: random.Random, n: int) -> list[str]:
    lines = []
    for _ in range(n):
        roll = rng.random()
        if roll < 0.1:
            lines.append(rng.choice([
                "", "   ", "[", "]", "[]", "[] ", ": ", "[: ]",
                "[1.10.2023] no colon space",
                "[1.10.2023, 10:00:00]no space after bracket: x",
                "no brackets at all: but a colon",
            ]))
        else:
            d = rng.choice(DATES)
            s = rng.choice(SENDERS)
            m = rng.choice(MESSAGES)
            lines.append(f"[{d}, 10:00:00] {s}: {m}")
    return lines


@pytest.mark.parametrize("seed", [55, 66, 77])
def test_fuzz_etl_matches_reference(spark, seed):
    """EP-2 (upload-chats) under the same hostile inputs: anchored-regex
    parse + group-name exclusion must match the reference loop."""
    import re

    from poc_spark.operators.etl import parse_chat_table

    def reference_etl(lines):
        pattern = re.compile(r"\[([^\]]+)\]\s*([^:]+):\s*(.+)")
        group_name, rows = None, []
        for line in lines:
            line = line.strip()
            m = pattern.match(line)
            if not m:
                continue
            if group_name is None:
                group_name = m.group(2)
                continue
            if m.group(2) == group_name:
                continue
            rows.append((group_name, m.group(1), m.group(2), m.group(3)))
        return rows

    rng = random.Random(seed)
    lines = _fuzz_lines(rng, 150)
    raw = chat_lines_from_strings(spark, lines)
    got = [
        (r["group_name"], r["date_time"], r["sender"], r["message"])
        for r in parse_chat_table(raw).orderBy("line_id").collect()
    ]
    assert got == reference_etl(lines), seed


@pytest.mark.parametrize("seed", [11, 22, 33, 44])
def test_fuzz_matches_reference(spark, seed):
    rng = random.Random(seed)
    lines = _fuzz_lines(rng, 150)
    for kw in ({}, {"limit": 40},
               {"start_date": "2023-01-01", "end_date": "2023-11-30"}):
        raw = chat_lines_from_strings(spark, lines)
        msgs = parse_chat_lines(raw)
        nodes, edges = interaction_graph(msgs, **kw)
        got_nodes = sorted(r["id"] for r in nodes.collect())
        got_edges = {(r["source"], r["target"]): r["weight"] for r in edges.collect()}
        exp_nodes, exp_edges = analyze_network(
            lines, kw.get("start_date"), kw.get("end_date"), kw.get("limit")
        )
        assert got_nodes == exp_nodes, (seed, kw)
        assert got_edges == exp_edges, (seed, kw)
