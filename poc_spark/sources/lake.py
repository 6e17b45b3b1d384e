"""Data-lake layout sinks/sources: hive-partitioned parquet and ORC.

At 100 TB the dominant cost of every downstream query is the scan, and
the single biggest lever is NOT reading most of the data at all. Two
layout tools live here:

  - **Hive-partitioned parquet** (`partitionBy` directory layout,
    `lang=en/part-*.parquet`): a filter on the partition column becomes
    partition PRUNING — Spark enumerates only the matching directories,
    so a two-language query over a five-language corpus touches 2/5 of
    the files before a single row is decoded. This is the standard
    lake layout every engine (Spark, DuckDB, Trino, Hive) agrees on,
    which the contract entry exploits: DuckDB re-reads the SAME
    directory tree with `hive_partitioning = true` as the oracle.
    Partition columns must be low-cardinality (lang, date, source
    bucket) — partitioning by a high-cardinality key creates millions
    of tiny files and kills the NameNode/listing; that guidance is the
    caller's contract, not enforced here.
  - **ORC** round-trip: Spark's second native columnar format (stripe
    layout, built-in bloom-filter support via `orc.bloom.filter.columns`
    — handy when a sort-neutral point-lookup column needs skipping
    structure). Reads are schema-first for the same reason as JSONL:
    no inference pass over 100 TB. DuckDB has no ORC reader, so the
    contract oracle checks losslessness against the ORIGINAL parquet
    table rather than cross-engine parsing the artifact (the CSV/JSONL
    twins cover cross-engine artifact parsing).

Reference behavior parity: the reference's only persistence is NDJSON
upload + MySQL/Mongo rows (backend/main.py:137-176); lake layouts are
part of the 100 TB extension surface, same tier as sources/jsonl.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T


def write_partitioned(
    df: DataFrame, path: str, partition_cols: list[str]
) -> None:
    """Hive-layout parquet sink: one directory level per partition
    column value. Parallel (no coalesce); `overwrite` replaces the
    whole tree so re-runs can't leave orphan partitions from a
    previous schema of the world."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    """Scan a hive-partitioned tree. Partition columns come back typed
    by directory-name inference (strings stay strings); filters on
    them prune at file-listing time — `.explain` shows the pruned
    `PartitionFilters`, and InMemoryFileIndex lists only matching
    directories."""
    return spark.read.parquet(path)


def _list_parquet_sizes(spark: SparkSession, path: str) -> list[int]:
    """Byte sizes of the .parquet files directly under `path` (file
    status only — no data scan).

    Scheme-less (local-filesystem) paths list via os.scandir, which
    works everywhere including Spark Connect. Paths with a scheme
    (s3://, hdfs://) need the Hadoop FileSystem, reached through the
    py4j gateway internals (sparkContext._jvm) — CLASSIC SPARK ONLY
    (r5 ADVICE: those handles don't exist under Spark Connect; there,
    list remote stores with the store's own SDK and pass sizes to the
    caller)."""
    if "://" not in path:
        import os

        with os.scandir(path) as it:
            return [
                e.stat().st_size
                for e in it
                if e.is_file() and e.name.endswith(".parquet")
            ]
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    fs = p.getFileSystem(conf)
    return [
        f.getLen()
        for f in fs.listStatus(p)
        if f.getPath().getName().endswith(".parquet")
    ]


def _list_partition_dirs(spark: SparkSession, root: str) -> list[str]:
    """Names of `key=value` partition directories directly under
    `root`. Same local/remote split as _list_parquet_sizes."""
    if "://" not in root:
        import os

        with os.scandir(root) as it:
            return [e.name for e in it if e.is_dir() and "=" in e.name]
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(root)
    fs = p.getFileSystem(conf)
    return [
        st.getPath().getName()
        for st in fs.listStatus(p)
        if st.isDirectory() and "=" in st.getPath().getName()
    ]


def compact(
    spark: SparkSession,
    src_path: str,
    dst_path: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> int:
    """Small-files compaction — the standing maintenance op of every
    real lake: streaming/ingest jobs leave thousands of KB-sized part
    files per table, and scan cost at 100 TB is dominated by per-file
    open/footer/seek overhead (plus driver-side listing memory) long
    before byte count. Rewrite the directory into
    `ceil(total_bytes / target_bytes)` uniform files.

    The output file count is sized from the SOURCE LISTING (file
    status only — no data scan, no inference pass), then one
    round-robin `repartition(n)` shuffle writes uniform-size parts.
    Round-robin (not range/hash) is deliberate: compaction must not
    skew file sizes when the data is skewed on any particular column.
    Returns n. At cluster scale the same call runs per-partition-dir
    (compact(part_dir) in a loop or via a driver-side job per
    partition), keeping each rewrite independent and retryable."""
    import math

    total = sum(_list_parquet_sizes(spark, src_path))
    if total == 0:
        # fail fast rather than silently rewrite an unexpectedly-shaped
        # source (e.g. a hive-partitioned tree, whose files sit one
        # level down) into a single mis-sized file — compact each
        # partition directory instead
        raise ValueError(
            f"compact: no .parquet files directly under {src_path}; "
            "for partitioned trees, compact per partition directory"
        )
    n = max(1, math.ceil(total / target_bytes))
    df = spark.read.parquet(src_path)
    df.repartition(n).write.mode("overwrite").parquet(dst_path)
    return n


def compact_partitioned(
    spark: SparkSession,
    src_root: str,
    dst_root: str,
    target_bytes: int = 128 * 1024 * 1024,
) -> dict[str, int]:
    """Per-partition compaction of a hive tree: each `key=value`
    directory is compacted independently into its twin under
    `dst_root`, preserving the partition layout. Independent rewrites
    are the point at scale — each partition job is retryable on its
    own, a failed partition doesn't invalidate the others, and the
    driver loop parallelizes trivially (at 100 TB, submit the per-dir
    jobs through a thread pool; Spark's scheduler interleaves them).
    Returns {partition_dir_name: n_output_files}."""
    out: dict[str, int] = {}
    for name in _list_partition_dirs(spark, src_root):
        out[name] = compact(
            spark,
            f"{src_root}/{name}",
            f"{dst_root}/{name}",
            target_bytes=target_bytes,
        )
    if not out:
        raise ValueError(
            f"compact_partitioned: no key=value partition directories "
            f"under {src_root}"
        )
    return out


def write_clustered(
    df: DataFrame, path: str, cluster_col: str, n_files: int | None = None
) -> None:
    """Range-clustered parquet: `repartitionByRange` gives each output
    file a DISJOINT value range of `cluster_col` (sampled boundaries,
    deterministic key→partition), and `sortWithinPartitions` makes
    every row group's min/max stats tight within the file. A range or
    point predicate on the cluster column then skips whole files and
    row groups on footer stats alone — the sort-layout complement to
    hive partitioning, and the right tool when the filter column is
    too high-cardinality to be a directory key (ids, timestamps,
    sizes). The single-column form of Z-order clustering (multi-column
    interleave lives in q_zorder_cells)."""
    if n_files is not None and n_files < 1:
        # a falsy 0 must not silently fall back to the default
        # shuffle-partition count — that produces hundreds of tiny
        # files, the exact anti-pattern compact() exists to fix
        raise ValueError(f"write_clustered: n_files must be >= 1, got {n_files}")
    part = (
        df.repartitionByRange(n_files, cluster_col)
        if n_files is not None
        else df.repartitionByRange(cluster_col)
    )
    part.sortWithinPartitions(cluster_col).write.mode(
        "overwrite"
    ).parquet(path)


def read_evolved(spark: SparkSession, path: str) -> DataFrame:
    """Schema-evolution read: a long-lived corpus directory accretes
    batches over years, and later batches add columns (a new quality
    score, a new provenance field). `mergeSchema` unions the footer
    schemas across part files — rows from older files surface NULL for
    columns they predate, no rewrite of petabytes of history required.
    Costs a footer read per file at planning time (not a data scan);
    for hot paths, pin the merged schema explicitly once known. The
    cross-engine twin is DuckDB's `union_by_name = true`."""
    return spark.read.option("mergeSchema", "true").parquet(path)


def write_orc(df: DataFrame, path: str) -> None:
    """ORC sink (native writer, zlib default). Parallel part files,
    overwrite semantics — same sink discipline as write_jsonl."""
    df.write.mode("overwrite").orc(path)


def read_orc(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-first ORC scan: explicit StructType skips footer-based
    schema merging across part files (a listing+footer pass that grows
    with file count) and pins the types the pipeline was tested with."""
    return spark.read.schema(schema).orc(path)


def merge_upsert_partitioned(
    spark: SparkSession,
    root: str,
    updates: DataFrame,
    key_col: str,
    partition_col: str,
) -> list[str]:
    """COPY-ON-WRITE MERGE INTO a hive-partitioned tree (the Delta /
    Iceberg `MERGE INTO ... WHEN MATCHED UPDATE WHEN NOT MATCHED
    INSERT` shape, re-expressed on plain parquet): upsert `updates`
    by `key_col`, rewriting ONLY the partitions that hold an old
    version of an updated key or receive new rows — every other
    partition's files are untouched bytes.

    Mechanics:
      1. affected = partitions named by the updates ∪ partitions whose
         EXISTING rows match an update key (a key may move partitions:
         its old partition is rewritten without it, its new partition
         with it). Both probes are partition-column DISTINCTs —
         bounded by the lake layout's low-cardinality contract, the
         same reason hive partitioning works at all.
      2. one dataframe = (affected-partition rows, update keys
         anti-joined away) ∪ updates, written with DYNAMIC partition
         overwrite — Spark replaces exactly the partitions present in
         the output and leaves the rest of the tree alone.

    At 100 TB this is the write-amplification profile that matters:
    cost scales with the affected partitions' bytes, not the table's.
    Returns the affected partition values (sorted, as strings)."""
    tree = spark.read.parquet(root)
    from pyspark.sql import functions as F

    up_parts = {
        str(r[0]) for r in updates.select(partition_col).distinct().collect()
    }
    old_parts = {
        str(r[0])
        for r in tree.join(
            F.broadcast(updates.select(key_col)), key_col, "leftsemi"
        )
        .select(partition_col)
        .distinct()
        .collect()
    }
    affected = sorted(up_parts | old_parts)
    if not affected:
        return []
    # materialize BEFORE the write: the merge output reads the very
    # files the dynamic overwrite replaces (self-referential write).
    # Without the barrier, any post-write execution of this plan — the
    # write's own task retries included — would re-list deleted part
    # files and FAILED_READ_FILE (measured). The checkpoint holds only
    # the AFFECTED partitions' rows, i.e. exactly the rewrite set; at
    # real cluster scale, stage to a sibling directory and swap instead
    # of holding the rewrite set in the block manager.
    merged = (
        tree.filter(F.col(partition_col).cast("string").isin(affected))
        .join(F.broadcast(updates.select(key_col)), key_col, "left_anti")
        .unionByName(updates.select(*tree.columns))
    ).localCheckpoint(eager=True)
    # dynamic overwrite only replaces partitions PRESENT in the output:
    # a partition the merge leaves EMPTY (its only rows moved elsewhere)
    # keeps its stale files unless deleted explicitly (pinned in
    # test_merge_upsert_key_moves_partition). Compute pre-write.
    present = {
        str(r[0])
        for r in merged.select(partition_col).distinct().collect()
    }
    (
        merged.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy(partition_col)
        .parquet(root)
    )
    for value in set(affected) - present:
        _delete_dir(spark, f"{root}/{partition_col}={value}")
    # the session FileStatusCache still lists the replaced part files —
    # a subsequent read of the tree would FAILED_READ_FILE on them
    spark.catalog.refreshByPath(root)
    return affected


def _delete_dir(spark: SparkSession, path: str) -> None:
    """Recursive directory delete; same local/remote split as
    _list_parquet_sizes (os path locally, Hadoop FS for schemes)."""
    if "://" not in path:
        import shutil

        shutil.rmtree(path, ignore_errors=True)
        return
    jvm = spark.sparkContext._jvm
    conf = spark.sparkContext._jsc.hadoopConfiguration()
    p = jvm.org.apache.hadoop.fs.Path(path)
    p.getFileSystem(conf).delete(p, True)


def snapshot_diff(
    spark: SparkSession,
    left_root: str,
    right_root: str,
    key_cols: list[str],
    compare_cols: list[str] | None = None,
) -> DataFrame:
    """Row-level diff of two table snapshots — the data-quality
    regression check between pipeline runs ("what did this rerun
    actually change?"): full outer join on the key, rows classified
    added / removed / changed / unchanged by null-side and a content
    hash over the compared columns.

    Plan at 100 TB: both sides project to (key, fingerprint(compare
    columns)) — the narrowest possible shuffle — then one full outer
    hash join on the key; no value columns cross the shuffle, just the
    fingerprints. The fingerprint is TWO independently-seeded xxhash64
    values (128 combined bits): this is billed as a regression check,
    and a single 64-bit hash makes a changed-row false-negative a
    2^-64-per-pair event — with two seeds the collision tolerance is
    ~2^-128, below any realistic row count's birthday bound. Returns
    (key..., status); value columns are deliberately NOT carried —
    join back by key for details."""
    left = spark.read.parquet(left_root)
    right = spark.read.parquet(right_root)
    if compare_cols is None:
        shared = [c for c in left.columns if c in set(right.columns)]
        compare_cols = [c for c in shared if c not in set(key_cols)]
    if not compare_cols:
        raise ValueError(
            "snapshot_diff: no compare columns — the snapshots share no "
            "non-key columns, so changed-vs-unchanged is undefined; pass "
            "compare_cols explicitly"
        )
    from pyspark.sql import functions as F

    cmp_cols = [F.col(c) for c in compare_cols]
    lh = left.select(
        *key_cols,
        F.xxhash64(*cmp_cols).alias("_lh"),
        F.xxhash64(F.lit("snapdiff:seed2"), *cmp_cols).alias("_lh2"),
    )
    rh = right.select(
        *key_cols,
        F.xxhash64(*cmp_cols).alias("_rh"),
        F.xxhash64(F.lit("snapdiff:seed2"), *cmp_cols).alias("_rh2"),
    )
    joined = lh.join(rh, key_cols, "full_outer")
    status = (
        F.when(F.col("_lh").isNull(), F.lit("added"))
        .when(F.col("_rh").isNull(), F.lit("removed"))
        .when(
            (F.col("_lh") != F.col("_rh")) | (F.col("_lh2") != F.col("_rh2")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(*key_cols, status.alias("status"))
