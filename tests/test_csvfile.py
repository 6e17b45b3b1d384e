"""CSV source/sink: RFC-4180 round-trip, quoting/newline survival,
corrupt-row quarantine."""

from __future__ import annotations

from poc_spark.sources.csvfile import CORRUPT_COL, read_csv, write_csv
from poc_spark.sources.jsonl import DOCUMENTS_SCHEMA


def test_csv_roundtrip_lossless(spark, sf_dir, tmp_path_repo):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path_repo / "docs_csv")
    write_csv(docs, path)
    back = read_csv(spark, path, DOCUMENTS_SCHEMA)
    a = sorted(docs.collect(), key=lambda r: r["doc_id"])
    b = sorted(back.collect(), key=lambda r: r["doc_id"])
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_csv_quoting_newlines_unicode(spark, tmp_path_repo):
    """Embedded delimiters, doubled quotes, NEWLINES inside quoted
    fields, Hebrew/emoji — the cases naive CSV handling corrupts."""
    rows = [
        (1, 'a,b,"quoted",c', "en", "s", 0),
        (2, "line1\nline2", "en", "s", 0),
        (3, "שלום 🦆", "he", "s", 0),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    path = str(tmp_path_repo / "tricky")
    write_csv(df, path)
    back = {r["doc_id"]: r["text"] for r in
            read_csv(spark, path, DOCUMENTS_SCHEMA).collect()}
    assert back == {1: rows[0][1], 2: rows[1][1], 3: rows[2][1]}


def test_csv_corrupt_rows_quarantine(spark, tmp_path_repo):
    p = tmp_path_repo / "mixed.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,ok,en,s,2\n"
        "not_a_number,bad,en,s,3\n"
        "2,also ok,en,s,7\n"
    )
    good = read_csv(spark, str(p), DOCUMENTS_SCHEMA)
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    full = read_csv(spark, str(p), DOCUMENTS_SCHEMA, keep_corrupt=True)
    rows = full.collect()
    quarantined = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(quarantined) == 1
    assert "not_a_number" in quarantined[0][CORRUPT_COL]


def test_csv_null_vs_empty_string_distinct(spark, tmp_path_repo):
    """NULL and '' must survive the round-trip as DIFFERENT values:
    NULL rides as unquoted \\N, empty string as quoted "" (the default
    readers of other engines collapse them — the module pins both
    sides, and the src_csv_roundtrip oracle pins DuckDB's)."""
    from pyspark.sql import types as T

    rows = [(1, None), (2, ""), (3, "x")]
    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    df = spark.createDataFrame(rows, schema)
    path = str(tmp_path_repo / "nulls")
    write_csv(df, path)
    back = {r["doc_id"]: r["text"] for r in
            read_csv(spark, path, schema).collect()}
    assert back == {1: None, 2: "", 3: "x"}

    # DuckDB reads the same artifact with the pinned options and agrees
    import duckdb

    got = dict(
        duckdb.sql(
            f"SELECT doc_id, text FROM read_csv('{path}/*.csv', "
            "header = true, nullstr = '\\N', allow_quoted_nulls = false, "
            "columns = {'doc_id': 'BIGINT', 'text': 'VARCHAR'})"
        ).fetchall()
    )
    assert got == {1: None, 2: "", 3: "x"}


def test_csv_multiline_false_is_splittable(spark, tmp_path_repo):
    """The splittability receipt for the r5 ADVICE fix (VERDICT r6 #7):
    with multi_line=False a SINGLE large part file scans as >1 input
    partition (line-boundary splits at maxPartitionBytes), while
    multi_line=True pins the same file to exactly 1 task — and both
    reads return identical content. At 100 TB this is the difference
    between per-file and per-128MB task granularity on big CSV drops."""
    from pyspark.sql import types as T

    schema = T.StructType(
        [
            T.StructField("doc_id", T.LongType()),
            T.StructField("text", T.StringType()),
        ]
    )
    # one ~1 MB single-file CSV, no embedded newlines
    p = tmp_path_repo / "big.csv"
    with open(p, "w") as fh:
        fh.write("doc_id,text\n")
        for i in range(20000):
            fh.write(f"{i},row {i} {'x' * 40}\n")

    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        spark.conf.set("spark.sql.files.maxPartitionBytes", str(128 * 1024))
        split = read_csv(spark, str(p), schema, multi_line=False)
        whole = read_csv(spark, str(p), schema, multi_line=True)
        n_split = split.rdd.getNumPartitions()
        n_whole = whole.rdd.getNumPartitions()
        assert n_split > 1, f"multiLine=false should split: {n_split}"
        assert n_whole == 1, f"multiLine=true must be 1 task/file: {n_whole}"
        a = sorted(map(tuple, split.collect()))
        b = sorted(map(tuple, whole.collect()))
        assert a == b and len(a) == 20000
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)
