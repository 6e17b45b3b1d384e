"""Sketch operators: mergeable approximate aggregates for 100 TB-scale
profiling — HyperLogLog cardinality (Apache DataSketches HLL via
hll_sketch_agg / hll_union_agg), approximate quantiles, and frequent
items.

Why sketches are the scale path: an exact COUNT(DISTINCT x) shuffles
every distinct value; an HLL sketch is a few KB per partition, merges
associatively (partial agg -> one tiny final merge), and can be stored
per partition/day and re-unioned later without touching the raw data.
Same for quantiles (mergeable percentile_approx / KLL-style) vs a full
sort.

Accuracy contracts (rel-err bounds) are pinned in tests/test_sketches.py
against exact answers; the DuckDB oracle for the contract entry checks
the BOUND (a boolean both engines can verify against their own sketch
implementation), not bit-equality of estimates — sketch binaries are
implementation-defined.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def approx_distinct_by(
    df: DataFrame, keys: Sequence[str], col: str, rsd: float = 0.05
) -> DataFrame:
    """(keys..., n_exact, n_approx, within_bound) — grouped
    approx_count_distinct next to the exact count, with the bound check
    materialized (|approx-exact|/exact <= 3*rsd; HLL++ rsd is a std
    dev, 3 sigma is the practical guarantee). The exact count is here
    for the contract only — at scale you run the approx alone."""
    exact = F.countDistinct(F.col(col)).alias("n_exact")
    approx = F.approx_count_distinct(col, rsd).alias("n_approx")
    out = df.groupBy(*keys).agg(exact, approx)
    bound = (
        F.abs(F.col("n_approx") - F.col("n_exact"))
        / F.greatest(F.col("n_exact"), F.lit(1))
    ) <= 3 * rsd
    return out.select(*keys, "n_exact", "n_approx", bound.alias("within_bound"))


def hll_cardinality_by(
    df: DataFrame, keys: Sequence[str], col: str, lg_k: int = 12
) -> DataFrame:
    """(keys..., estimate) — DataSketches HLL cardinality per group.
    The sketch is a mergeable binary: partial-aggregates per partition,
    one small shuffle of ~2^lg_k-byte sketches, final merge — never a
    shuffle of the values themselves."""
    return df.groupBy(*keys).agg(
        F.hll_sketch_estimate(
            F.hll_sketch_agg(F.col(col), F.lit(lg_k))
        ).alias("estimate")
    )


def hll_union_estimate(
    df: DataFrame, keys: Sequence[str], col: str, lg_k: int = 12
) -> DataFrame:
    """1-row (estimate) — build per-group sketches, then UNION the
    sketches and estimate the global cardinality. This is the
    re-aggregation story: per-day/per-partition sketches stored once,
    any rollup answered later by unioning a handful of KB-sized
    binaries instead of rescanning 100 TB."""
    per_group = df.groupBy(*keys).agg(
        F.hll_sketch_agg(F.col(col), F.lit(lg_k)).alias("sk")
    )
    return per_group.agg(
        F.hll_sketch_estimate(
            F.hll_union_agg(F.col("sk"), F.lit(False))  # same lg_k everywhere
        ).alias("estimate")
    )


def approx_quantiles_by(
    df: DataFrame,
    keys: Sequence[str],
    col: str,
    probs: Sequence[float] = (0.25, 0.5, 0.75),
    accuracy: int = 10000,
) -> DataFrame:
    """(keys..., q_<p>...) — grouped percentile_approx (mergeable
    quantile summary, cf. Greenwald-Khanna/KLL). Error is rank-based:
    rank(result) within n/accuracy of the true rank."""
    aggs = [
        F.percentile_approx(F.col(col), F.lit(p), F.lit(accuracy)).alias(
            f"q_{str(p).replace('.', '_')}"
        )
        for p in probs
    ]
    return df.groupBy(*keys).agg(*aggs)


def frequent_items(
    df: DataFrame, col: str, min_share: float = 0.01
) -> DataFrame:
    """1-row (items: array) — single-pass frequent-items candidates
    (Karp et al. misra-gries variant via DataFrame.freqItems): every
    value with frequency > min_share*n is guaranteed present (possibly
    with false positives — filter with one exact pass over the
    candidate set when precision matters)."""
    return df.freqItems([col], support=min_share).select(
        F.col(f"{col}_freqItems").alias("items")
    )
