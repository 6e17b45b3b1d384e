"""Stream-stream interval join: attribute clicks to impressions.

The canonical event-correlation shape a 100 TB event pipeline needs
and plain batch joins can't provide online: two unbounded streams,
joined on a key AND a time interval, with watermarks bounding how much
per-key state either side retains.

State-size argument (why this scales): with watermarks `wm_left` /
`wm_right` and window `gap`, Spark keeps only rows newer than
(max event time − watermark − gap) per side; state is
O(arrival_rate × (watermark + gap)) per key — independent of stream
length. Without BOTH watermarks and a two-sided time condition Spark
rejects the inner interval join outright (state would be unbounded).

Batch twin: `attribute_clicks_batch` runs the identical predicate as a
bucketized range join (plans/range_join.py) for backfills — one
semantics, two execution modes, mirroring the chat batch/stream pair.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def attribute_clicks(
    impressions: DataFrame,
    clicks: DataFrame,
    key: str = "ad_id",
    attribution_window: str = "30 minutes",
    imp_watermark: str = "1 hour",
    click_watermark: str = "2 hours",
) -> DataFrame:
    """Streaming inner join: each click matches impressions of the same
    `key` whose timestamp precedes the click by at most
    `attribution_window`. Inputs need columns (key, ts); outputs
    (key, imp_ts, click_ts).

    Both sides are watermarked and the join condition bounds click_ts
    from BOTH directions relative to imp_ts, so the state store can
    evict: impressions older than click watermark + window, clicks
    older than the impression watermark.
    """
    imp = impressions.withWatermark("ts", imp_watermark).select(
        F.col(key).alias("_k"), F.col("ts").alias("imp_ts")
    )
    clk = clicks.withWatermark("ts", click_watermark).select(
        F.col(key).alias(key), F.col("ts").alias("click_ts")
    )
    cond = (
        (clk[key] == imp["_k"])
        & (clk["click_ts"] >= imp["imp_ts"])
        & (
            clk["click_ts"]
            <= imp["imp_ts"] + F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return clk.join(imp, cond).select(key, "imp_ts", "click_ts")


def attribute_clicks_outer(
    impressions: DataFrame,
    clicks: DataFrame,
    key: str = "ad_id",
    attribution_window: str = "30 minutes",
    imp_watermark: str = "1 hour",
    click_watermark: str = "2 hours",
) -> DataFrame:
    """LEFT OUTER stream-stream join: every impression emits — matched
    ones paired with each qualifying click, unmatched ones with a NULL
    click_ts once the watermark proves no qualifying click can still
    arrive. Inputs need (key, ts); output (key, imp_ts, click_ts?).

    This is the funnel-completeness shape an attribution pipeline needs
    ("which impressions never converted?") that the inner form cannot
    answer online. Outer-null emission is tied to state EVICTION: an
    impression's null row appears only after the watermark passes
    imp_ts + window, so results are late by exactly the watermark —
    the documented Structured Streaming outer-join trade-off. State
    bounds are the inner join's: O(rate × (watermark + window)) per
    key (see module doc)."""
    imp = impressions.withWatermark("ts", imp_watermark).select(
        F.col(key).alias(key), F.col("ts").alias("imp_ts")
    )
    clk = clicks.withWatermark("ts", click_watermark).select(
        F.col(key).alias("_k"), F.col("ts").alias("click_ts")
    )
    cond = (
        (imp[key] == clk["_k"])
        & (clk["click_ts"] >= imp["imp_ts"])
        & (
            clk["click_ts"]
            <= imp["imp_ts"] + F.expr(f"INTERVAL {attribution_window}")
        )
    )
    return imp.join(clk, cond, "leftOuter").select(key, "imp_ts", "click_ts")


def attribute_clicks_batch(
    impressions: DataFrame,
    clicks: DataFrame,
    key: str = "ad_id",
    attribution_window_sec: int = 1800,
) -> DataFrame:
    """Backfill twin of attribute_clicks on bounded tables, via the
    bucketized range-join rewrite (no BroadcastNestedLoopJoin): points
    are click epochs, intervals are [imp_ts, imp_ts + window] per key.
    The bucket equi-key is (key, time bucket) — compounded by packing
    the key into the bucketed frames before the join."""
    from poc_spark.plans.range_join import bucketized_range_join

    clk = clicks.select(
        F.col(key), F.col("ts").alias("click_ts"),
        F.unix_timestamp("ts").cast("double").alias("click_epoch"),
    )
    imp = impressions.select(
        F.col(key).alias("_k"), F.col("ts").alias("imp_ts"),
        F.unix_timestamp("ts").cast("double").alias("lo"),
        (F.unix_timestamp("ts") + attribution_window_sec)
        .cast("double")
        .alias("hi"),
    )
    joined = bucketized_range_join(
        clk,
        imp,
        "click_epoch",
        "lo",
        "hi",
        float(attribution_window_sec),
        extra_keys=[(key, "_k")],
    )
    return joined.select(key, "imp_ts", "click_ts")
