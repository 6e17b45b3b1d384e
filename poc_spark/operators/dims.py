"""Dimension-table maintenance (users / research CRUD, SURVEY §2.7).

Reference semantics (MongoDB via motor, /root/reference/backend/main.py):
  - insert_one          (users backend/main.py:116,138; research :417)
  - find_one by key     (:99,131,147,187) → point lookup
  - find().to_list(100) (:169)            → scan with page size
  - update_one $set with None fields skipped (:178-185) — matched_count
    0 → caller 404s; non-None fields only = per-column coalesce(new, old)
  - delete_one (:217-227) — deleted_count 0 → 404

Storage: versioned parquet snapshots (`<path>/v=N/`). Spark cannot
safely overwrite a parquet dataset it is lazily reading, and Delta is
not in this environment, so every mutation writes the next version
directory and readers always load the latest — the same
copy-on-write idea Delta/Iceberg formalize. Dimensions are small
(≪ executor memory), so full-snapshot rewrites are the right
trade-off; fact tables never go through this path.

Concurrency note (100 TB posture): single-writer per dimension is
assumed, like the reference's single app process. Multi-writer needs a
transactional table format; swap `DimTable` for Delta `MERGE INTO` /
`DELETE` there — the operator API below is shaped to make that a
drop-in change.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_VERSION_RE = re.compile(r"^v=(\d+)$")


def make_user_rows(
    spark: SparkSession, users: list[tuple[str, str, str, str | None]]
) -> DataFrame:
    """Row factory for user registration: engine-generated uuid() key
    (OP-FN-UUID, reference backend/main.py:114,136). Non-deterministic by
    design — excluded from hash-checked queries (SURVEY §7.3)."""
    df = spark.createDataFrame(
        users, "name string, email string, password string, avatar string"
    )
    return df.select(
        F.uuid().alias("user_id"), "name", "email", "password", "avatar"
    )


def make_research_rows(
    spark: SparkSession,
    rows: list[tuple[str, str, str, str, int]],
) -> DataFrame:
    """Row factory for research metadata with the engine-side audit
    timestamp (OP-FN-NOW, reference backend/main.py:413)."""
    df = spark.createDataFrame(
        rows,
        "name string, description string, start_date string, "
        "end_date string, message_limit int",
    )
    return df.withColumn("created_at", F.current_timestamp())


class DimTable:
    """A small, mutable dimension stored as versioned parquet snapshots."""

    def __init__(self, spark: SparkSession, path: str, key: str):
        self.spark = spark
        self.path = path
        self.key = key

    # -- snapshot plumbing -------------------------------------------------

    def _versions(self) -> list[int]:
        if not os.path.isdir(self.path):
            return []
        out = []
        for name in os.listdir(self.path):
            m = _VERSION_RE.match(name)
            if m:
                out.append(int(m.group(1)))
        return sorted(out)

    def _latest_dir(self) -> str | None:
        vs = self._versions()
        return os.path.join(self.path, f"v={vs[-1]}") if vs else None

    def _write_next(self, df: DataFrame) -> None:
        vs = self._versions()
        nxt = (vs[-1] + 1) if vs else 1
        df.write.mode("overwrite").parquet(os.path.join(self.path, f"v={nxt}"))

    # -- reads ---------------------------------------------------------------

    def read(self) -> DataFrame:
        latest = self._latest_dir()
        if latest is None:
            raise FileNotFoundError(f"dimension {self.path} has no data yet")
        return self.spark.read.parquet(latest)

    def point_lookup(self, value) -> DataFrame:
        """OP-JOIN-POINT / OP-SRC-DOC-POINT: find_one by key."""
        return self.read().filter(F.col(self.key) == F.lit(value)).limit(1)

    def scan(self, limit: int = 100) -> DataFrame:
        """OP-SRC-DOC-SCAN: find().to_list(limit), ordered by key so the
        page is deterministic (Mongo natural order isn't reproducible)."""
        return self.read().orderBy(self.key).limit(limit)

    # -- mutations -----------------------------------------------------------

    def init(self, df: DataFrame) -> None:
        """Create the dimension from an initial DataFrame."""
        self._write_next(df)

    def insert(self, rows: DataFrame) -> int:
        """OP-MUT-INSERT: append rows (insert_one, set-based)."""
        if self._versions():
            merged = self.read().unionByName(rows, allowMissingColumns=True)
        else:
            merged = rows
        n = rows.count()
        self._write_next(merged)
        return n

    def update(self, updates: DataFrame) -> int:
        """OP-MUT-UPDATE: $set with None-skip — for each key in `updates`,
        non-null columns replace the stored value, null columns keep it
        (coalesce(new, old)). Returns matched count (0 → caller 404s).
        """
        cur = self.read()
        upd = updates
        # suffix update columns to avoid ambiguity in the join
        renamed = upd.select(
            [F.col(c).alias(c if c == self.key else f"__new_{c}") for c in upd.columns]
        )
        joined = cur.join(F.broadcast(renamed), on=self.key, how="left")
        merged = joined.select(
            [F.col(self.key)]
            + [
                (
                    F.coalesce(F.col(f"__new_{c}"), F.col(c)).alias(c)
                    if f"__new_{c}" in joined.columns
                    else F.col(c)
                )
                for c in cur.columns
                if c != self.key
            ]
        )
        matched = cur.join(
            F.broadcast(upd.select(self.key)), on=self.key, how="leftsemi"
        ).count()
        self._write_next(merged)
        return matched

    def delete(self, value) -> int:
        """OP-MUT-DELETE: delete_one by key via anti-join rewrite.
        Returns deleted count (0 → caller 404s)."""
        cur = self.read()
        deleted = cur.filter(F.col(self.key) == F.lit(value)).count()
        if deleted:
            self._write_next(cur.filter(F.col(self.key) != F.lit(value)))
        return deleted

    def vacuum(self, keep: int = 2) -> None:
        """Drop all but the newest `keep` snapshot versions."""
        import shutil

        for v in self._versions()[:-keep]:
            shutil.rmtree(os.path.join(self.path, f"v={v}"), ignore_errors=True)
