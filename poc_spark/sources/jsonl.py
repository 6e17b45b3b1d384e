"""JSONL (newline-delimited JSON) source/sink — the lingua franca of
LLM training corpora (every public text dataset ships as *.jsonl[.gz]).

Spark's json reader/writer IS newline-delimited by default, so both
directions are native scans/sinks; what this module adds is the
production discipline:

  - EXPLICIT schema on read, always. Schema inference is a full extra
    pass over 100 TB before the real job starts; a fixed StructType
    makes the read a single streaming scan and pins the types the
    pipeline was tested with.
  - PERMISSIVE mode + a corrupt-record column: a malformed line in a
    billion-line crawl must quarantine the ROW, never kill the job.
    Callers split the frame on `_corrupt_record IS NULL` and route the
    rejects to a quarantine sink.
  - Writes stay partitioned (one part file per task) — no coalesce(1);
    downstream consumers read the directory, not a file.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# the documents table's canonical JSONL schema (TESTDATA.md columns)
DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("lang", T.StringType()),
        T.StructField("source", T.StringType()),
        T.StructField("n_chars", T.LongType()),
    ]
)


def write_jsonl(df: DataFrame, path: str) -> None:
    """Write a DataFrame as a directory of JSONL part files (one per
    task — the parallel sink shape; never coalesce to a single file)."""
    df.write.mode("overwrite").json(path)


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-first JSONL scan: PERMISSIVE parse with a corrupt-record
    column so malformed lines become quarantined rows, not job
    failures. Returns only well-formed rows unless `keep_corrupt`;
    pass keep_corrupt=True and filter `_corrupt_record IS NOT NULL`
    to build the quarantine stream. Caveat (Spark restriction
    QUERY_ONLY_CORRUPT_RECORD_COLUMN): a query over the raw files may
    not reference ONLY the corrupt column — materialize or select at
    least one data column alongside it (a quarantine sink naturally
    writes full rows, so this never bites in practice)."""
    full = T.StructType(
        schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
