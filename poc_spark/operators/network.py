"""Interaction-graph operators (the reference's flagship analysis).

Reference: GET /analyze/network/{filename}
(/root/reference/backend/main.py:255-342). Semantics reproduced:

  - OP-FIL-DATERANGE: inclusive [start, end] filter applied ONLY when
    BOTH bounds are given (backend/main.py:304-307) — a lone bound is
    ignored. Observable quirk; preserved deliberately.
  - OP-LIMIT-N: keep the first `limit` messages in total order counted
    AFTER all filters pass (backend/main.py:284-285,321). Spark `limit`
    is unordered, so this is row_number over the total order on the
    *filtered* set.
  - OP-LAG-EDGE: an edge connects each surviving message to the previous
    *surviving* message's sender when the sender changed
    (backend/main.py:316-319). Rows dropped by any filter never advance
    the chain, so two in-range messages separated by filtered-out ones
    DO link — computing lag after the filters reproduces this exactly.
  - OP-AGG-EDGEW: undirected canonical pair (source <= target) counted
    (backend/main.py:317-318) → groupBy + count (Spark's partial+final
    hash aggregate).
  - OP-AGG-NODES: distinct senders of surviving messages — includes
    senders that never formed an edge (backend/main.py:313).

Scale design: the window that orders the chain is partitioned by
`partition_cols` (default: file_path — one chat per file). A single
chat is at most a few hundred MB, so per-partition windows keep the
plan shuffle-light at any corpus size; nothing is global. For a single
giant totally-ordered stream, the operators below SELF-DISPATCH: when
no partition cols are given and Catalyst's size estimate crosses the
threshold (plans/dispatch.py, default ≈1M rows), they route to the
exactly-equal range-chunked plans in plans/chunked_lag.py (boundary
stitching, SURVEY.md §4.3) instead of a single-partition window.
Equality of the two paths is pinned by tests/test_chunked_lag.py and
tests/test_dispatch.py.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from poc_spark.plans.dispatch import use_chunked


def ordered_limit(
    df: DataFrame,
    n: int | None,
    order_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """OP-LIMIT-N: first n rows per partition in the given total order.

    NOT `df.limit(n)` (unordered in Spark); row_number over the filtered
    set is the faithful mapping of the reference's `count >= limit`
    break. Reference counts globally per file; partition by file_path.
    """
    if not n:
        return df
    if not partition_cols and use_chunked(df):
        from poc_spark.plans.chunked_lag import chunked_ordered_limit

        return chunked_ordered_limit(df, n, order_cols)
    w = (
        Window.partitionBy(*partition_cols).orderBy(*order_cols)
        if partition_cols
        else Window.orderBy(*order_cols)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n)
        .drop("_rn")
    )


def lag_edges(
    df: DataFrame,
    sender_col: str,
    order_cols: Sequence[str],
    partition_cols: Sequence[str] = (),
    group_output: bool = False,
) -> DataFrame:
    """OP-LAG-EDGE + OP-AGG-EDGEW: consecutive-sender transitions over the
    surviving rows → undirected weighted edges (source <= target).

    Self-transitions (same sender twice) emit nothing but still advance
    the chain — lag gives that for free.

    `partition_cols` bounds the chain windows (per-file / per-group —
    no cross-group edge ever forms); by default the weights still
    aggregate into ONE corpus-wide graph (the reference's one-graph-
    per-request shape). `group_output=True` instead keeps the group
    columns in the result — one graph PER group, the true production
    shape at scale: every window and the final aggregate shuffle on
    the group key, nothing is global."""
    if not partition_cols and use_chunked(df):
        from poc_spark.plans.chunked_lag import chunked_lag_edges

        return chunked_lag_edges(df, sender_col, order_cols)
    w = (
        Window.partitionBy(*partition_cols).orderBy(*order_cols)
        if partition_cols
        else Window.orderBy(*order_cols)
    )
    keep = list(partition_cols) if group_output else []
    s = F.col(sender_col)
    prev = F.lag(sender_col).over(w)
    return (
        df.select(*keep, prev.alias("_prev"), s.alias("_cur"))
        .filter(F.col("_prev").isNotNull() & (F.col("_prev") != F.col("_cur")))
        .select(
            *keep,
            F.least("_prev", "_cur").alias("source"),
            F.greatest("_prev", "_cur").alias("target"),
        )
        .groupBy(*keep, "source", "target")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def lag_edges_limited(
    df: DataFrame,
    sender_col: str,
    order_cols: Sequence[str],
    limit: int,
    partition_cols: Sequence[str] = (),
) -> DataFrame:
    """Fused OP-LIMIT-N + OP-LAG-EDGE: row_number and lag share one
    window spec, so Spark computes both in a single sort/exchange pass
    instead of two. Correct because the limit keeps a prefix of the
    order: each surviving row's predecessor is also in the prefix, so
    lag-then-filter(rn <= n) equals filter-then-lag.

    Above the scale threshold the fused single window would itself be
    the bottleneck — dispatch to chunked limit-then-lag (equal by the
    same prefix property; the chunked limit prunes whole chunks before
    the lag ever runs)."""
    if not partition_cols and use_chunked(df):
        from poc_spark.plans.chunked_lag import (
            chunked_lag_edges,
            chunked_ordered_limit,
        )

        # localCheckpoint (NOT .cache): the chunked lag re-derives chunk
        # boundaries over the prefix (an approxQuantile pass + the final
        # job), so a materialization barrier is required — but .cache()
        # registers in the session CacheManager forever; checkpointed
        # blocks are dropped when the DataFrame is garbage-collected, so
        # repeated calls in a long session can't accumulate storage.
        # (Lineage is truncated: on executor loss the block recomputes
        # from the checkpoint's parent, acceptable for a derived prefix.)
        prefix = chunked_ordered_limit(df, limit, order_cols).localCheckpoint(
            eager=True
        )
        return chunked_lag_edges(prefix, sender_col, order_cols)
    w = (
        Window.partitionBy(*partition_cols).orderBy(*order_cols)
        if partition_cols
        else Window.orderBy(*order_cols)
    )
    s = F.col(sender_col)
    return (
        df.select(
            F.row_number().over(w).alias("_rn"),
            F.lag(sender_col).over(w).alias("_prev"),
            s.alias("_cur"),
        )
        .filter(
            (F.col("_rn") <= limit)
            & F.col("_prev").isNotNull()
            & (F.col("_prev") != F.col("_cur"))
        )
        .select(
            F.least("_prev", "_cur").alias("source"),
            F.greatest("_prev", "_cur").alias("target"),
        )
        .groupBy("source", "target")
        .agg(F.count(F.lit(1)).alias("weight"))
    )


def interaction_graph(
    messages: DataFrame,
    start_date: str | dt.date | None = None,
    end_date: str | dt.date | None = None,
    limit: int | None = None,
    sender_col: str = "sender",
    date_col: str = "msg_date",
    order_cols: Sequence[str] = ("line_id",),
    partition_cols: Sequence[str] = (),
) -> tuple[DataFrame, DataFrame]:
    """EP-1: (nodes, edges) for the filtered + limited message stream.

    Returns nodes(id) and edges(source, target, weight).
    """
    df = messages
    # both-bounds-only quirk (backend/main.py:305): a lone bound is a no-op.
    if start_date and end_date:
        df = df.filter(F.col(date_col).between(F.lit(start_date), F.lit(end_date)))

    if limit:
        if not partition_cols and use_chunked(df):
            # scale path: chunked ordered limit prunes chunks before the
            # chunked lag; both per-chunk, never single-partition.
            # localCheckpoint, not cache — see lag_edges_limited.
            from poc_spark.plans.chunked_lag import (
                chunked_lag_edges,
                chunked_ordered_limit,
            )

            prefix = chunked_ordered_limit(df, limit, order_cols).localCheckpoint(
            eager=True
        )
            nodes = prefix.select(F.col(sender_col).alias("id")).distinct()
            edges = chunked_lag_edges(prefix, sender_col, order_cols)
            return nodes, edges
        # fused single-window pass: row_number + lag share the window
        # spec, so the ordered limit and the edge chain cost ONE
        # sort/exchange instead of two.
        w = (
            Window.partitionBy(*partition_cols).orderBy(*order_cols)
            if partition_cols
            else Window.orderBy(*order_cols)
        )
        base = df.select(
            F.row_number().over(w).alias("_rn"),
            F.lag(sender_col).over(w).alias("_prev"),
            F.col(sender_col).alias("_cur"),
        ).filter(F.col("_rn") <= limit)
        nodes = base.select(F.col("_cur").alias("id")).distinct()
        edges = (
            base.filter(F.col("_prev").isNotNull() & (F.col("_prev") != F.col("_cur")))
            .select(
                F.least("_prev", "_cur").alias("source"),
                F.greatest("_prev", "_cur").alias("target"),
            )
            .groupBy("source", "target")
            .agg(F.count(F.lit(1)).alias("weight"))
        )
        return nodes, edges

    nodes = df.select(F.col(sender_col).alias("id")).distinct()
    edges = lag_edges(df, sender_col, order_cols, partition_cols)
    return nodes, edges


def induced_subgraph(
    edges: DataFrame, nodes_filtered: DataFrame
) -> DataFrame:
    """OP-JOIN-SEMI: keep edges whose BOTH endpoints survive a node filter
    (the client-side substring-search behavior,
    frontend/src/pages/Form.jsx:165-171). Node sets are small →
    broadcast both semi-joins; no shuffle of the edge set."""
    ids = F.broadcast(nodes_filtered.select("id"))
    return (
        edges.join(ids, edges.source == ids.id, "leftsemi")
        .join(ids, edges.target == ids.id, "leftsemi")
    )


def search_nodes(nodes: DataFrame, query: str) -> DataFrame:
    """OP-FIL-SUBSTR: case-insensitive node-id substring search
    (frontend/src/pages/Form.jsx:159-163)."""
    return nodes.filter(F.lower(F.col("id")).contains(query.lower()))
