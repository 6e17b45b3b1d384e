"""Custom stateful streaming operators via applyInPandasWithState —
the escape hatch for semantics Structured Streaming's built-in
aggregations can't express (here: exactly-once cross-batch dedup).

State design notes (100 TB posture):
  - state is per-key and lives in the state store (RocksDB on a real
    cluster: spark.sql.streaming.stateStore.providerClass) — the
    operator never holds the corpus in memory;
  - the key should be a content hash, uniformly distributed, so state
    shards evenly across partitions;
  - for bounded state growth use a TTL timeout; dedup-forever keeps
    state per distinct key (the honest cost of exact streaming dedup —
    a probabilistic variant would bloom-filter per window).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_OUT_SCHEMA = (
    "text_sha string, file_path string, ts timestamp, sender string, "
    "message string"
)


def dedup_stream(parsed: DataFrame) -> DataFrame:
    """Streaming exact dedup of parsed chat messages: the FIRST
    occurrence of each normalized message text (per sender) is emitted;
    every later duplicate — same batch or any later batch — is dropped.

    Grouping key = sha2(sender || normalized text). State = one boolean
    per seen key."""
    keyed = parsed.withColumn(
        "text_sha",
        F.sha2(
            F.concat_ws(
                "|",
                F.col("sender"),
                F.lower(F.trim(F.regexp_replace("message", r"\s+", " "))),
            ),
            256,
        ),
    )

    def emit_first(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            return  # key seen in an earlier batch: drop everything
        first: pd.DataFrame | None = None
        for pdf in pdfs:
            if first is None and len(pdf):
                first = pdf.sort_values("ts").iloc[[0]]
        if first is not None:
            state.update((True,))
            yield first[
                ["text_sha", "file_path", "ts", "sender", "message"]
            ]

    return keyed.groupBy("text_sha").applyInPandasWithState(
        emit_first,
        outputStructType=DEDUP_OUT_SCHEMA,
        stateStructType="seen boolean",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
