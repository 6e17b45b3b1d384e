"""JSONL source/sink: schema-first read, corrupt-line quarantine,
lossless round-trip of the documents table."""

from __future__ import annotations

from pyspark.sql import functions as F

from poc_spark.sources.jsonl import (
    CORRUPT_COL,
    DOCUMENTS_SCHEMA,
    read_jsonl,
    write_jsonl,
)


def test_roundtrip_lossless(spark, sf_dir, tmp_path_repo):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    path = str(tmp_path_repo / "docs_jsonl")
    write_jsonl(docs, path)
    back = read_jsonl(spark, path, DOCUMENTS_SCHEMA)
    a = sorted(docs.collect(), key=lambda r: r["doc_id"])
    b = sorted(back.collect(), key=lambda r: r["doc_id"])
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_corrupt_lines_quarantine_not_fail(spark, tmp_path_repo):
    """A malformed line must become a quarantined row (PERMISSIVE),
    never a job failure; well-formed rows still parse."""
    p = tmp_path_repo / "mixed.jsonl"
    p.write_text(
        '{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}\n'
        "this is not json at all\n"
        '{"doc_id": 2, "text": "also ok", "lang": "en", "source": "s", "n_chars": 7}\n'
        '{"doc_id": 3, "text": "truncated...\n',
    )
    good = read_jsonl(spark, str(p), DOCUMENTS_SCHEMA)
    assert {r["doc_id"] for r in good.collect()} == {1, 2}
    # Spark disallows projecting ONLY the corrupt column from raw
    # files (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — materialize full rows
    # first, exactly what a quarantine sink write does anyway
    full = read_jsonl(spark, str(p), DOCUMENTS_SCHEMA, keep_corrupt=True)
    rows = full.collect()
    quarantined = [r for r in rows if r[CORRUPT_COL] is not None]
    assert len(quarantined) == 2
    assert "this is not json at all" in {r[CORRUPT_COL] for r in quarantined}


def test_unicode_and_newlines_survive(spark, tmp_path_repo):
    """Hebrew, emoji, embedded newlines, quotes: the write must escape,
    the read must restore byte-identical strings."""
    rows = [
        (1, 'line1\nline2 "quoted" \t tab', "en", "s", 0),
        (2, "שלום 🦆 עולם", "he", "s", 0),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_SCHEMA)
    path = str(tmp_path_repo / "uni")
    write_jsonl(df, path)
    back = {r["doc_id"]: r["text"] for r in
            read_jsonl(spark, path, DOCUMENTS_SCHEMA).collect()}
    assert back == {1: rows[0][1], 2: rows[1][1]}


def test_streaming_jsonl_ingest_equals_batch(spark, sf_dir, tmp_path_repo):
    """The JSONL source works as a Structured Streaming source with the
    SAME explicit schema (readStream.json requires one — exactly the
    schema-first discipline): availableNow ingestion of the exported
    corpus must land the identical row set the batch reader sees."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path_repo / "jsonl_src")
    write_jsonl(docs, src)

    stream = (
        spark.readStream.schema(DOCUMENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .json(src)
    )
    assert stream.isStreaming
    out = str(tmp_path_repo / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path_repo / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    # assert the return value: on timeout the sink is still writing and
    # the parquet read below would race it with a confusing diff
    assert q.awaitTermination(300), "streaming ingest did not finish"
    landed = sorted(
        tuple(r) for r in spark.read.parquet(out).collect()
    )
    batch = sorted(
        tuple(r) for r in read_jsonl(spark, src, DOCUMENTS_SCHEMA).collect()
    )
    assert landed == batch and len(landed) == docs.count()
