"""Test-only pure-Python oracle reimplementing the reference's flagship
analysis loop verbatim (behavioral twin of
/root/reference/backend/main.py:255-342) for differential testing.

This is ~40 lines of observed semantics, re-expressed from the SURVEY —
not copied code. It exists so randomized chats can be checked against
the Spark pipeline (SURVEY.md §5.2 item 4).
"""

from __future__ import annotations

import datetime as dt
from collections import defaultdict


def analyze_network(
    lines: list[str],
    start_date: str | None = None,
    end_date: str | None = None,
    limit: int | None = None,
) -> tuple[list[str], dict[tuple[str, str], int]]:
    """Return (sorted node ids, {(source<=target): weight})."""
    start = dt.datetime.strptime(start_date, "%Y-%m-%d") if start_date else None
    end = dt.datetime.strptime(end_date, "%Y-%m-%d") if end_date else None

    nodes: set[str] = set()
    edges: dict[tuple[str, str], int] = defaultdict(int)
    previous_sender: str | None = None
    count = 0

    for line in lines:
        try:
            # reference: `if limit and count >= limit` — limit=0 is falsy (no limit)
            if limit and count >= limit:
                break
            if "הושמטה" in line or "הושמט" in line:
                continue
            if not (line.startswith("[") and "]" in line and ": " in line):
                continue
            date_part, message_part = line.split("] ", 1)
            date_str = date_part.strip("[]").split(",")[0]
            try:
                current_datetime = dt.datetime.strptime(date_str, "%d.%m.%Y")
            except ValueError:
                continue
            if start and end:
                if not (start <= current_datetime <= end):
                    continue
            sender = message_part.split(":")[0].strip("~").replace(" ", "").strip()
            if not sender:
                continue
            nodes.add(sender)
            if previous_sender and previous_sender != sender:
                edge = tuple(sorted([previous_sender, sender]))
                edges[edge] += 1
            previous_sender = sender
            count += 1
        except Exception:
            # reference wraps the per-line body in a catch-all and skips
            # (e.g. a line with "]" but no "] " raises on unpack)
            continue

    return sorted(nodes), dict(edges)
