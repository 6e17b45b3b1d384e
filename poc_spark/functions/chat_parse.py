"""Chat-line parsing and normalization expressions.

Every function returns a Column (pure expression builders — everything
stays inside whole-stage codegen; no Python UDFs anywhere on this path).

Reference semantics reproduced exactly (citations into /root/reference):
  - media-omitted filter: skip lines containing Hebrew "הושמטה"/"הושמט"
    (backend/main.py:288-289).
  - format predicate: startswith "[" and contains "]" and ": "
    (backend/main.py:292-293).
  - structural split: text before FIRST "] " → date part, strip "[]" from
    the ends, take text before first "," as the date string
    (backend/main.py:294-295).
  - tolerant date parse: %d.%m.%Y with non-zero-padded day/month; parse
    failure skips the row, never fails the job (backend/main.py:298-302).
  - sender normalization: text before first ":", strip leading/trailing
    "~", delete ALL spaces (interior included), strip whitespace
    (backend/main.py:310).
  - regex message parse: \\[([^\\]]+)\\]\\s*([^:]+):\\s*(.+)
    (backend/main.py:347).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# identical to the reference regex (backend/main.py:347); works verbatim
# in Spark's regexp_extract (Java regex superset covers it).
CHAT_LINE_PATTERN = r"\[([^\]]+)\]\s*([^:]+):\s*(.+)"

OMITTED_TOKENS = ("הושמטה", "הושמט")


def is_media_omitted(line: Column) -> Column:
    """OP-FIL-OMITTED. The short token is a substring of the long one, so
    one contains() suffices; both kept for fidelity with the reference."""
    cond = F.lit(False)
    for tok in OMITTED_TOKENS:
        cond = cond | line.contains(tok)
    return cond


def is_message_format(line: Column) -> Column:
    """OP-FIL-FORMAT: `[` prefix, `]` somewhere, `: ` somewhere."""
    return line.startswith("[") & line.contains("]") & line.contains(": ")


def _after_first_bracket(line: Column) -> Column:
    """Text after the FIRST `] ` — Python `line.split("] ", 1)[1]`.

    Null (not error) when the line has no "] ": the reference's
    per-line catch-all skips such rows (the unpack raises,
    backend/main.py:325-327); under ANSI mode getItem(1) would CRASH
    the job, so this must be the null-tolerant get()."""
    return F.get(F.split(line, r"\] ", 2), 1)


def _before_first_bracket(line: Column) -> Column:
    """Text before the FIRST `] ` — Python `line.split("] ", 1)[0]`."""
    return F.split(line, r"\] ", 2).getItem(0)


def date_string(line: Column) -> Column:
    """OP-PARSE-SPLIT: `[7.10.2023, 19:43:25] x: y` → `7.10.2023`.
    Python strip("[]") removes the char-set only from the ends."""
    stripped = F.regexp_replace(
        _before_first_bracket(line), r"^[\[\]]+|[\[\]]+$", ""
    )
    return F.split(stripped, ",").getItem(0)


def parse_msg_date(date_str: Column) -> Column:
    """OP-PARSE-DATE: tolerant d.M.yyyy (no zero padding); null on failure."""
    return F.try_to_timestamp(date_str, F.lit("d.M.yyyy")).cast("date")


def normalize_sender(text_before_colon: Column) -> Column:
    """OP-NORM-SENDER: strip edge '~', delete every space, trim whitespace.

    Python `.strip('~')` strips a *set* of chars from both ends →
    regexp anchors; `.replace(' ', '')` removes interior spaces too
    ("~ John Doe" → "JohnDoe").
    """
    no_tilde = F.regexp_replace(text_before_colon, r"^~+|~+$", "")
    no_spaces = F.regexp_replace(no_tilde, " ", "")
    return F.trim(no_spaces)


def extract_sender(line: Column) -> Column:
    """Sender from a format-valid line: message-part text before the first
    `:`, normalized (backend/main.py:310)."""
    return normalize_sender(F.substring_index(_after_first_bracket(line), ":", 1))


def extract_message_text(line: Column) -> Column:
    """Message text after `sender:`, leading whitespace swallowed (the
    reference regex group 3 behind `:\\s*`)."""
    msg = _after_first_bracket(line)
    # get(): a message part without any ":" yields null, not an
    # ANSI index error (the ": " the format predicate saw may sit in
    # the timestamp part)
    after_colon = F.get(F.split(msg, ":", 2), 1)
    return F.regexp_replace(after_colon, r"^\s+", "")


def parse_chat_lines(raw_chat: DataFrame) -> DataFrame:
    """raw_chat(value, file_path, line_id) → survivors of the reference's
    filter→parse→filter chain (EP-1 stages 3-4, backend/main.py:284-312):

      omitted-filter → format predicate → date parse (skip on failure) →
      sender normalization → non-empty-sender guard.

    Date-range and limit are applied downstream (operators/network.py) so
    this parse layer is reusable by ETL, word-freq and streaming paths.
    Output: (file_path, line_id, msg_date, sender, message).

    All filters precede any window/aggregate, so Catalyst pushes them into
    the text scan (PushedFilters / early WholeStageCodegen stage).
    """
    line = F.col("value")
    return (
        raw_chat.filter(~is_media_omitted(line))
        .filter(is_message_format(line))
        .withColumn("msg_date", parse_msg_date(date_string(line)))
        .filter(F.col("msg_date").isNotNull())
        .withColumn("sender", extract_sender(line))
        .filter(F.length("sender") > 0)
        .withColumn("message", extract_message_text(line))
        .select("file_path", "line_id", "msg_date", "sender", "message")
    )
