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
    sentinel pinned on BOTH sides — NULL rides as the unquoted token
    `\\N` (NULL_TOKEN), empty string as quoted `""`; readers
    (including DuckDB's: nullstr='\\N', allow_quoted_nulls=false)
    must distinguish the two or a null column silently becomes ''.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

# NULL sentinel: written unquoted, so quoted "" stays an empty STRING
NULL_TOKEN = "\\N"


def write_csv(df: DataFrame, path: str) -> None:
    """Directory of CSV part files, RFC-4180 quoting (doubled quotes),
    header row per file — one file per task, never coalesce(1). NULLs
    write as the unquoted `\\N` sentinel, empty strings as quoted ""
    (see module doc)."""
    (
        df.write.mode("overwrite")
        .option("header", True)
        .option("escape", '"')
        .option("nullValue", NULL_TOKEN)
        .option("emptyValue", '""')
        .csv(path)
    )


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType,
    keep_corrupt: bool = False,
    multi_line: bool = True,
) -> DataFrame:
    """Schema-first CSV scan: PERMISSIVE + quarantine column, RFC-4180
    quoting. Same quarantine caveat as the JSONL reader
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN).

    `multi_line` (default True) parses quoted embedded newlines
    correctly but makes every file NON-SPLITTABLE — one task per part
    file, a real throughput cliff when part files are large (r5
    ADVICE). For corpora known to have no embedded newlines, pass
    False to restore line-splittable parallel scans; when True, keep
    part files bounded at write time (e.g.
    `df.write.option("maxRecordsPerFile", n)`) so the per-file task
    granularity stays acceptable."""
    full = T.StructType(
        schema.fields + [T.StructField(CORRUPT_COL, T.StringType())]
    )
    df = (
        spark.read.schema(full)
        .option("header", True)
        .option("escape", '"')
        .option("multiLine", multi_line)
        .option("nullValue", NULL_TOKEN)
        .option("emptyValue", "")
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .csv(path)
    )
    if keep_corrupt:
        return df
    return df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
