"""Chat-export text source (OP-SRC-TEXT / OP-SRC-WHOLETEXT).

Reference behavior: open the uploaded file and iterate lines in file
order (/root/reference/backend/main.py:281-282); the whole-file variant
decodes with errors="replace" and splitlines (backend/main.py:357-360).

The file's line order is the single load-bearing order in the whole
system (edge construction is lag-over-line-order), so the source must
attach a stable 0-based `line_id`.

Scale notes:
  - `zipWithIndex` is the order-exact path: it runs one lightweight count
    job over partitions and then assigns globally contiguous ids without
    collecting data. Partitions of a single text file are split-ordered,
    so ids equal file line numbers.
  - For a directory of many files (the 100 TB shape: one file per chat
    group), pass per_file=True to number lines *within* each file via a
    window over (file, partition, intra-partition position) — every
    downstream window then partitions by file_path and nothing global
    remains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def read_chat_lines(
    spark: SparkSession, path: str, per_file: bool = False
) -> DataFrame:
    """Return raw_chat(value, file_path, line_id) for a chat export."""
    raw = spark.read.text(path).select(
        F.col("value"),
        F.input_file_name().alias("file_path"),
    )
    if not per_file:
        # single-file (reference-parity) path: global contiguous ids.
        rdd = raw.rdd.zipWithIndex().map(
            lambda pair: (pair[0]["value"], pair[0]["file_path"], pair[1])
        )
        return spark.createDataFrame(rdd, "value string, file_path string, line_id long")

    # many-files path: ids contiguous within each file, no global shuffle.
    # monotonically_increasing_id is increasing within a partition and
    # partitions of one file are split-ordered, so ordering by it within
    # file_path reproduces file order.
    with_mid = raw.withColumn("_mid", F.monotonically_increasing_id())
    w = Window.partitionBy("file_path").orderBy("_mid")
    return with_mid.select(
        "value",
        "file_path",
        (F.row_number().over(w) - F.lit(1)).alias("line_id"),
    )


def chat_lines_from_strings(spark: SparkSession, lines: list[str]) -> DataFrame:
    """Build raw_chat from in-memory lines (test/serving convenience;
    mirrors OP-SRC-WHOLETEXT splitlines semantics)."""
    rows = [(line, "<memory>", i) for i, line in enumerate(lines)]
    return spark.createDataFrame(rows, "value string, file_path string, line_id long")
