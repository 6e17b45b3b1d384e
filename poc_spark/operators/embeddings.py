"""Embedding-column transforms for training/retrieval pipelines:
int8 quantization (the storage/serving compression step) and fixed
random projection (Johnson-Lindenstrauss reduction — the dim-cut
applied before ANN indexing or clustering at scale).

Everything is built-in expressions over the array column — JVM-side,
whole-stage-codegen, no UDFs, no shuffle (narrow per-row transforms
that pipeline with the scan). Float discipline follows the module-wide
rules: cast float->double FIRST, keep the expression shape identical
to the DuckDB oracle (same association order), round only at the
output edge.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from poc_spark.operators.dedup import _dot


def _as_double(vec_col: Column) -> Column:
    return F.transform(vec_col, lambda x: x.cast("double"))


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", id_col: str = "vec_id"
) -> DataFrame:
    """Symmetric per-vector int8 quantization, long form: one row per
    component (id, i, code) plus the per-vector dequant scale.

    code_i = floor(x_i * 127 / amax + 0.5)  (round-half-up — floor+0.5
    instead of round() because SQL round() is half-even in some engines
    and half-away in others; floor is identical everywhere), with
    amax = max_i |x_i|. All-zero vectors quantize to all-zero codes
    with scale 0. `scale` is rounded to 6 only at the edge; codes are
    exact integers, so the output hashes bit-for-bit cross-engine.

    Scale shape: narrow projection + posexplode — pipelines with the
    scan, no shuffle; at 100 TB this is a pure map stage whose output
    is 1/4 the input width (int8 codes vs float32).
    """
    v = _as_double(F.col(vec_col))
    amax = F.array_max(F.transform(v, F.abs))
    base = df.select(
        F.col(id_col).alias("id"), v.alias("v"), amax.alias("amax")
    )
    code = F.when(F.col("amax") == 0.0, F.lit(0)).otherwise(
        F.floor(F.col("x") * F.lit(127.0) / F.col("amax") + F.lit(0.5))
    )
    exploded = base.select(
        "id", "amax", F.posexplode(F.col("v")).alias("i", "x")
    )
    return exploded.select(
        "id",
        F.col("i").cast("int").alias("i"),
        code.cast("int").alias("code"),
        F.round(F.col("amax") / F.lit(127.0), 6).alias("scale"),
    )


def dequantize_int8(
    codes: DataFrame,
    id_col: str = "id",
    scale_col: str = "scale",
) -> DataFrame:
    """Inverse of quantize_int8 (long form in, long form out):
    x_hat_i = code_i * scale. Reconstruction error is bounded by
    scale/2 per component — pinned in tests/test_embeddings.py."""
    return codes.select(
        id_col,
        "i",
        (F.col("code").cast("double") * F.col(scale_col)).alias("x_hat"),
    )


def random_projection(
    df: DataFrame,
    planes: list[list[float]],
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Fixed-matrix random projection (JL transform) to len(planes)
    dims, long form: (id, j, value) with value = round(dot(x, R_j), 6).

    The projection matrix arrives as literal rows (same literals embed
    in the DuckDB oracle — the discipline sim_ann_lsh established), so
    the reduction is deterministic, engine-reproducible, and needs no
    fitted state. dot() is the ordered left fold both engines share.

    Scale shape: narrow per-row map (k dot products per vector),
    no shuffle; the 100 TB use is cutting 1024-dim embeddings to
    64-128 dims before ANN indexing/IVF clustering, shrinking every
    downstream shuffle by the same factor.
    """
    v = _as_double(F.col(vec_col))
    proj = F.array(
        *[
            F.round(_dot(v, F.array(*[F.lit(float(x)) for x in plane])), 6)
            for plane in planes
        ]
    )
    return df.select(
        F.col(id_col).alias("id"), F.posexplode(proj).alias("j", "value")
    ).select("id", F.col("j").cast("int").alias("j"), "value")
