"""Size-threshold dispatch between global-window and chunked plans.

The reference's flagship semantics need a TOTAL order (one chat
stream); a global `Window.orderBy(...)` expresses it but collapses to a
single partition — fine below ~1M rows (the chunked form costs 2 extra
fixed jobs and benches slower there), hostile at 100 TB. CLAUDE.md
policy: global-window forms are the default below ~1M rows; the chunked
scale paths (plans/chunked_lag.py) take over above.

This module makes the operators enforce that policy automatically:
`use_chunked(df)` consults Catalyst's optimized-plan sizeInBytes
estimate — free, no job, filter-selectivity-aware — against a
configurable byte threshold. Callers (operators/network.py) route to
the exactly-equal chunked implementation when it trips. Unknown/huge
estimates (post-join plans without stats) dispatch chunked: the safe
direction at scale.

Conf keys:
  spark.poc.chunkedWindow.minBytes  estimate threshold (default 24 MiB
                                    ≈ 1.1M event rows at the measured
                                    ~22 B/row parquet-scan estimate)
  spark.poc.chunkedWindow.force     "true"/"false" overrides the
                                    estimate entirely (tests; ops)
"""

from __future__ import annotations

from pyspark.sql import DataFrame

CHUNK_MIN_BYTES_KEY = "spark.poc.chunkedWindow.minBytes"
CHUNK_FORCE_KEY = "spark.poc.chunkedWindow.force"
DEFAULT_MIN_BYTES = 24 * 1024 * 1024


def estimated_size_bytes(df: DataFrame) -> int:
    """Catalyst's optimized-plan size estimate in bytes. No job runs;
    for parquet scans this is file size scaled by filter selectivity."""
    return int(df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())


def use_chunked(df: DataFrame) -> bool:
    """True when a global-window operator should take the range-chunked
    scale path for this input."""
    conf = df.sparkSession.conf
    force = conf.get(CHUNK_FORCE_KEY, None)
    if force is not None:
        return force.strip().lower() == "true"
    threshold = int(conf.get(CHUNK_MIN_BYTES_KEY, str(DEFAULT_MIN_BYTES)))
    return estimated_size_bytes(df) >= threshold
