"""The driver creates its own SparkSession, possibly not UTC — every
contract query must return identical results under any session
timezone (events.ts is TIMESTAMP_NTZ precisely for this)."""

from __future__ import annotations

import pytest

from poc_spark import contract

SENSITIVE = [
    "op_fil_daterange",
    "op_graph_flagship",
    "op_limit_n",
    "q_user_sessions",
    "q_asof_last_click",
    "q_running_sum",
    "q_union_except",
]


@pytest.mark.parametrize("tz", ["America/New_York", "Asia/Kathmandu"])
def test_results_identical_across_session_timezones(spark, sf_dir, tz):
    def run_all():
        out = {}
        for name in SENSITIVE:
            df = contract.REGISTRY[name].spark(spark, sf_dir)
            rows = df.collect()
            out[name] = sorted(tuple(r) for r in rows)
        return out

    original = spark.conf.get("spark.sql.session.timeZone")
    baseline = run_all()
    try:
        spark.conf.set("spark.sql.session.timeZone", tz)
        shifted = run_all()
    finally:
        spark.conf.set("spark.sql.session.timeZone", original)
    for name in SENSITIVE:
        assert shifted[name] == baseline[name], f"{name} drifts under {tz}"
