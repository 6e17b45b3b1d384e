"""Z-order (Morton) interleaved layout — the multi-dimensional
data-skipping primitive (Delta/Iceberg `OPTIMIZE ZORDER BY`): rows
sorted by the bit-interleave of several bucketed dimensions cluster
near each other in EVERY dimension at once, so per-file min/max stats
prune scans for predicates on any of the z-ordered columns, not just
the leading sort key.

Pure integer bit arithmetic (shifts + masks), identical in any SQL
dialect, so the z-value itself is exactly oracle-able. The layout step
is repartitionByRange(z) + sortWithinPartitions(z): range partitioning
gives files DISJOINT z-ranges (pinned in tests/test_zorder.py), which
is precisely the property file-skipping needs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def interleave_bits(cols: list[Column], bits: int) -> Column:
    """Morton z-value: bit j of column d lands at position
    j * len(cols) + d. Inputs must already be non-negative ints in
    [0, 2^bits); use `bucketize` or a modulo to get there."""
    z = F.lit(0).cast("long")
    for j in range(bits):
        for d, c in enumerate(cols):
            bit = F.shiftright(c.cast("long"), j).bitwiseAND(F.lit(1))
            z = z.bitwiseOR(F.shiftleft(bit, j * len(cols) + d))
    return z


def bucketize(c: Column, lo: float, hi: float, bits: int) -> Column:
    """Clamp-and-quantize a numeric column into [0, 2^bits) bins over
    the KNOWN domain [lo, hi) — domain literals, not data-derived
    min/max, so the binning (and the z-value) is append-stable: new
    data never re-bins old rows. floor (not cast) per the module-wide
    truncation rule."""
    n = 1 << bits
    scaled = (c.cast("double") - F.lit(float(lo))) / F.lit(float(hi - lo))
    return F.greatest(
        F.lit(0).cast("long"),
        F.least(
            F.lit(n - 1).cast("long"),
            F.floor(scaled * F.lit(float(n))).cast("long"),
        ),
    )


def zorder_layout(
    df: DataFrame, zcol: Column, n_partitions: int = 32
) -> DataFrame:
    """Physically cluster by z-value: range-partition (disjoint
    z-ranges per output file) then sort within partitions (monotone
    z inside each file → tight per-page min/max). At 100 TB this is
    the write-side step before parquet, making every subsequent
    predicate on any z-ordered dimension a partial scan."""
    return (
        df.withColumn("_z", zcol)
        .repartitionByRange(n_partitions, "_z")
        .sortWithinPartitions("_z")
    )
