"""Declarative data-quality expectations — the Delta Live Tables /
Great Expectations shape, re-expressed as plain aggregates.

A 100 TB ingestion pipeline gates every landing batch on a rule set
("text not null", "key unique", "every lineitem has an order") and
records per-rule violation counts before anything downstream reads the
data. Three rule families, deliberately kept as separate functions
because their COST SHAPES differ and a caller sizing a 100 TB gate
needs to see that:

  - row-local predicates (`expect_rows`): ONE aggregate pass over the
    table, all rules fused — each rule adds a `sum(when(...))` column
    to the same scan, so 50 rules cost one read;
  - key uniqueness (`expect_unique`): one hash aggregation on the key
    (map-side partial), violations = rows beyond the first per key;
  - referential containment (`expect_subset`): one left-anti join
    against the (broadcast-able, distinct-projected) parent keys.

All three return the same (rule, n_rows, n_violations) schema so a
gate unions them into one report. Null handling is explicit: a rule
evaluating to NULL (e.g. `n_chars = length(text)` on a NULL text) is a
VIOLATION — unknown is not a pass, the conservative gate convention.

Reference parity: the reference validates nothing on upload (rows land
in MySQL as-matched, backend/main.py:380-384); expectations are part
of the 100 TB extension surface.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

REPORT_SCHEMA = ("rule", "n_rows", "n_violations")


def expect_rows(df: DataFrame, rules: dict[str, Column]) -> DataFrame:
    """(rule, n_rows, n_violations) for row-local boolean rules, all
    evaluated in ONE aggregate pass (one scan regardless of rule
    count). A rule is violated when it is false OR NULL."""
    if not rules:
        raise ValueError("expect_rows: empty rule set")
    agg = df.agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(
                F.when(~F.coalesce(cond, F.lit(False)), 1).otherwise(0)
            ).alias(f"_v_{i}")
            for i, cond in enumerate(rules.values())
        ],
    )
    names = list(rules)
    pairs = F.array(
        *[
            F.struct(
                F.lit(name).alias("rule"),
                F.col(f"_v_{i}").cast("long").alias("v"),
            )
            for i, name in enumerate(names)
        ]
    )
    return (
        agg.select(F.col("_n").alias("n_rows"), F.explode(pairs).alias("p"))
        .select(
            F.col("p.rule").alias("rule"),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.col("p.v").alias("n_violations"),
        )
    )


def expect_unique(
    df: DataFrame, key_cols: list[str], rule: str | None = None
) -> DataFrame:
    """Uniqueness rule: violations = rows BEYOND the first per key
    (so a clean table reports 0 and a fully-duplicated table reports
    n/2 — the count of rows a dedup would remove). One hash agg."""
    name = rule or f"unique({', '.join(key_cols)})"
    counts = df.groupBy(*key_cols).agg(F.count(F.lit(1)).alias("_c"))
    return counts.agg(
        F.lit(name).alias("rule"),
        F.sum("_c").cast("long").alias("n_rows"),
        F.sum(F.col("_c") - 1).cast("long").alias("n_violations"),
    )


def expect_subset(
    child: DataFrame,
    child_col: str,
    parent: DataFrame,
    parent_col: str,
    rule: str | None = None,
) -> DataFrame:
    """Referential rule: every child key must exist in the parent.
    One left-anti join against the distinct parent keys (broadcast
    when the parent key set is small — the usual dimension case).
    NULL child keys count as violations (they reference nothing)."""
    name = rule or f"{child_col} in {parent_col}"
    pk = (
        parent.select(F.col(parent_col).alias(child_col))
        .distinct()
        .withColumn("_present", F.lit(1))
    )
    # ONE outer join + ONE aggregate (an anti-join would need a second
    # scan — or a nested-loop cross join — to also produce the total)
    flagged = child.select(child_col).join(pk, child_col, "left")
    return flagged.agg(
        F.lit(name).alias("rule"),
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.when(F.col("_present").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_violations"),
    )


def quarantine(
    df: DataFrame, rules: dict[str, Column]
) -> tuple[DataFrame, DataFrame]:
    """Split rows into (passing, quarantined) against ALL row-local
    rules at once; quarantined rows carry a `failed_rules` array
    naming every rule they broke — the triage column a human (or a
    re-ingestion job) needs. One scan, no shuffle."""
    if not rules:
        raise ValueError("quarantine: empty rule set")
    failed = F.filter(
        F.array(
            *[
                F.when(
                    ~F.coalesce(cond, F.lit(False)), F.lit(name)
                ).otherwise(F.lit(None))
                for name, cond in rules.items()
            ]
        ),
        lambda x: x.isNotNull(),
    )
    tagged = df.withColumn("failed_rules", failed)
    passing = tagged.filter(F.size("failed_rules") == 0).drop("failed_rules")
    return passing, tagged.filter(F.size("failed_rules") > 0)
