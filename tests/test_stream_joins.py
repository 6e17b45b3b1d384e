"""streaming/joins.py: stream-stream interval join vs its batch twin.

The differential is the point: the watermarked streaming join
(availableNow over file sources) and the bucketized batch backfill must
produce the identical attribution set.
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from poc_spark.streaming.joins import attribute_clicks, attribute_clicks_batch

IMPRESSIONS = [
    (1, "2024-01-01 10:00:00"),
    (1, "2024-01-01 10:20:00"),
    (2, "2024-01-01 10:00:00"),
    (3, "2024-01-01 12:00:00"),
]
CLICKS = [
    (1, "2024-01-01 10:25:00"),  # matches both ad-1 impressions
    (2, "2024-01-01 10:31:00"),  # outside the 30-min window → no match
    (2, "2024-01-01 10:29:00"),  # inside
    (3, "2024-01-01 11:59:00"),  # click BEFORE impression → no match
    (4, "2024-01-01 10:05:00"),  # no impression for ad 4
]


def _write(spark, rows, path):
    spark.createDataFrame(rows, "ad_id int, ts_s string").select(
        "ad_id", F.col("ts_s").cast("timestamp").alias("ts")
    ).write.mode("overwrite").parquet(path)


@pytest.fixture()
def landing(spark, tmp_path_repo):
    imp, clk = str(tmp_path_repo / "imp"), str(tmp_path_repo / "clk")
    _write(spark, IMPRESSIONS, imp)
    _write(spark, CLICKS, clk)
    return imp, clk


EXPECTED = {
    (1, "2024-01-01 10:00:00", "2024-01-01 10:25:00"),
    (1, "2024-01-01 10:20:00", "2024-01-01 10:25:00"),
    (2, "2024-01-01 10:00:00", "2024-01-01 10:29:00"),
}


def _as_set(rows):
    return {
        (r["ad_id"], str(r["imp_ts"]), str(r["click_ts"])) for r in rows
    }


def test_streaming_interval_join(spark, landing, tmp_path_repo):
    imp_dir, clk_dir = landing
    schema = "ad_id int, ts timestamp"
    imp = spark.readStream.schema(schema).parquet(imp_dir)
    clk = spark.readStream.schema(schema).parquet(clk_dir)
    out = attribute_clicks(imp, clk)
    assert out.isStreaming
    q = (
        out.writeStream.format("parquet")
        .option("path", str(tmp_path_repo / "attr"))
        .option("checkpointLocation", str(tmp_path_repo / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = _as_set(spark.read.parquet(str(tmp_path_repo / "attr")).collect())
    assert got == EXPECTED


def test_batch_twin_matches(spark, landing):
    imp_dir, clk_dir = landing
    imp, clk = spark.read.parquet(imp_dir), spark.read.parquet(clk_dir)
    got = _as_set(attribute_clicks_batch(imp, clk).collect())
    assert got == EXPECTED


def test_batch_twin_plan_is_equi(spark, landing):
    imp_dir, clk_dir = landing
    imp, clk = spark.read.parquet(imp_dir), spark.read.parquet(clk_dir)
    plan = (
        attribute_clicks_batch(imp, clk)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan

def test_watermark_eviction_drops_late_click(spark, tmp_path_repo):
    """A click arriving two batches after the watermark advanced past it
    must NOT join (its impression state is evicted and the input is
    late), while the identical click delivered on time DOES join. Pins
    the one-batch watermark-propagation lag workaround used by the
    stream_watermark_eviction contract entry: the late file arrives two
    batches after the advance."""
    import os
    import time
    import uuid

    import pyarrow as pa
    import pyarrow.parquet as pq

    staged = str(tmp_path_repo / "evict_src")
    os.makedirs(staged)
    sch = pa.schema([("side", pa.string()), ("ad_id", pa.int64()),
                     ("ts", pa.timestamp("us", tz="UTC"))])

    def us(s):
        import datetime as dt
        return int(dt.datetime.fromisoformat(s + "+00:00").timestamp() * 1e6)

    def write(name, rows, mtime):
        tbl = pa.table(
            {"side": pa.array([r[0] for r in rows], pa.string()),
             "ad_id": pa.array([r[1] for r in rows], pa.int64()),
             "ts": pa.array([us(r[2]) for r in rows],
                            pa.timestamp("us", tz="UTC"))},
            schema=sch)
        path = os.path.join(staged, name)
        pq.write_table(tbl, path)
        os.utime(path, (mtime, mtime))

    t0 = time.time() - 300
    # f1: impression for ad 1 + an on-time click that joins
    write("f1.parquet", [("imp", 1, "2024-01-01 10:00:00"),
                         ("clk", 1, "2024-01-01 10:10:00")], t0)
    # f2/f3: sentinels 100 days later advance BOTH watermarks (twice,
    # for the measured one-batch filter-propagation lag)
    write("f2.parquet", [("imp", -1, "2024-04-11 10:00:00"),
                         ("clk", -2, "2024-04-11 10:00:00")], t0 + 30)
    write("f3.parquet", [("imp", -3, "2024-04-11 11:00:00"),
                         ("clk", -4, "2024-04-11 11:00:00")], t0 + 60)
    # f4: a late click for ad 1, inside the 30-min window
    write("f4.parquet", [("clk", 1, "2024-01-01 10:20:00")], t0 + 90)

    schema = "side string, ad_id long, ts timestamp"

    def src():
        return spark.readStream.schema(schema).option(
            "maxFilesPerTrigger", "1"
        ).parquet(staged)

    imp = src().filter("side = 'imp'").select("ad_id", "ts")
    clk = src().filter("side = 'clk'").select("ad_id", "ts")
    out = attribute_clicks(
        imp, clk, attribution_window="30 minutes",
        imp_watermark="10 minutes", click_watermark="10 minutes",
    )
    qname = "evict_test_" + uuid.uuid4().hex[:8]
    q = (
        out.writeStream.format("memory").queryName(qname)
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    removed = sum(
        so.get("numRowsRemoved", 0)
        for p in q.recentProgress
        for so in p.get("stateOperators", [])
    )
    got = {(r["ad_id"], str(r["imp_ts"]), str(r["click_ts"]))
           for r in spark.table(qname).collect()
           if r["ad_id"] > 0}
    assert got == {(1, "2024-01-01 10:00:00", "2024-01-01 10:10:00")}, got
    assert removed > 0, "state was never evicted"


def test_attribute_clicks_outer_batch_semantics(spark):
    """Batch-mode differential for the LEFT OUTER form: withWatermark
    is a no-op on bounded inputs, so the operator must reduce to the
    relational left interval join — matched imps pair with each
    qualifying click, unmatched imps emit exactly one NULL-click row.
    The streaming eviction-driven null emission is pinned in-gate by
    the stream_outer_join contract entry."""
    from datetime import datetime

    from poc_spark.streaming.joins import attribute_clicks_outer

    imp = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 0)),
            (2, datetime(2024, 1, 1, 11, 0)),   # no click at all
            (3, datetime(2024, 1, 1, 12, 0)),   # click outside window
        ],
        "ad_id long, ts timestamp",
    )
    clk = spark.createDataFrame(
        [
            (1, datetime(2024, 1, 1, 10, 10)),
            (1, datetime(2024, 1, 1, 10, 20)),  # both inside 30 min
            (3, datetime(2024, 1, 1, 13, 0)),   # 60 min late: no match
        ],
        "ad_id long, ts timestamp",
    )
    rows = attribute_clicks_outer(
        imp, clk, attribution_window="30 minutes"
    ).collect()
    got = {(r["ad_id"], str(r["imp_ts"]), r["click_ts"] and str(r["click_ts"]))
           for r in rows}
    assert got == {
        (1, "2024-01-01 10:00:00", "2024-01-01 10:10:00"),
        (1, "2024-01-01 10:00:00", "2024-01-01 10:20:00"),
        (2, "2024-01-01 11:00:00", None),
        (3, "2024-01-01 12:00:00", None),
    }
