"""Incremental maintenance of a MATERIALIZED JOIN VIEW — the IVM rung
above the aggregate rollup (sources/lake.py rollup_incremental): keep a
denormalized fact⋈dim view table current under fact AND dim deltas
without ever re-running the full join.

Delta algebra (classic view maintenance):
  - fact delta ΔA (upserted/new fact rows): their view rows are
    ΔA ⋈ B_current — the dim side is the POST-delta dim table, so a
    batch that changes both sides stays consistent;
  - dim delta ΔB (changed dim rows): the affected view rows are the
    view's own rows with those dim keys — their fact columns are
    already IN the view, so the rebuild is view ⋈ ΔB with the dim
    columns replaced, never a rescan of the fact table;
  - a fact key present in ΔA wins over its ΔB-side rebuild (its ΔA row
    already joined the new dim state).

Cost ∝ |ΔA| + |view rows touching ΔB| — both land through the lake's
copy-on-write upsert, so only the view partitions holding affected
keys rewrite; everything else byte-carries. The reference has no
derived-view machinery at all (every query recomputes,
backend/main.py:255-342); this is the engine-side extension that makes
a 100 TB denormalized serving table maintainable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def join_view_rows(
    facts: DataFrame,
    dims: DataFrame,
    fact_key: str,
    dim_key: str,
    dim_cols: list[str],
) -> DataFrame:
    """The view's defining query: facts INNER JOIN dims on
    facts[dim_key] == dims[dim_key], carrying all fact columns plus
    `dim_cols` from the dim side. The dim side broadcasts (dims are
    small relative to facts by definition of the pattern)."""
    d = dims.select(dim_key, *dim_cols)
    return facts.join(F.broadcast(d), dim_key)


def fact_delta_view_rows(
    fact_delta: DataFrame,
    dims_current: DataFrame,
    fact_key: str,
    dim_key: str,
    dim_cols: list[str],
) -> DataFrame:
    """View rows for a fact delta: ΔA ⋈ B_current (post-delta dims)."""
    return join_view_rows(fact_delta, dims_current, fact_key, dim_key, dim_cols)


def dim_delta_view_rows(
    view_current: DataFrame,
    dim_delta: DataFrame,
    fact_key: str,
    dim_key: str,
    dim_cols: list[str],
    exclude_fact_keys: DataFrame | None = None,
) -> DataFrame:
    """Rebuilt view rows for a dim delta: the view's own affected rows
    (fact columns read from the view, never the fact table) with the
    dim columns replaced by ΔB's new values. `exclude_fact_keys` drops
    rows a concurrent fact delta already rebuilt (ΔA precedence)."""
    keep = [c for c in view_current.columns if c not in dim_cols]
    affected = view_current.select(*keep).join(
        F.broadcast(dim_delta.select(dim_key, *dim_cols)), dim_key
    )
    if exclude_fact_keys is not None:
        affected = affected.join(
            F.broadcast(exclude_fact_keys.select(fact_key)),
            fact_key,
            "left_anti",
        )
    return affected
