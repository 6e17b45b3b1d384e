"""Embedding transforms: int8 quantization roundtrip bound and the
fixed random projection vs a hand-computed expectation."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from poc_spark.operators.embeddings import (
    dequantize_int8,
    quantize_int8,
    random_projection,
)

VECS = [
    (0, [1.0, -2.0, 0.5, 0.0]),
    (1, [0.0, 0.0, 0.0, 0.0]),  # all-zero edge: scale 0, codes 0
    (2, [-1e-3, 1e-3, 2e-3, -2e-3]),  # tiny magnitudes
    (3, [127.0, -127.0, 63.5, 1.0]),
]


@pytest.fixture(scope="module")
def emb(spark):
    return spark.createDataFrame(
        VECS, "vec_id long, embedding array<double>"
    )


def test_quantize_codes_in_range_and_zero_vec(spark, emb):
    rows = quantize_int8(emb).collect()
    assert len(rows) == 4 * 4
    assert all(-127 <= r["code"] <= 127 for r in rows)
    zero = [r for r in rows if r["id"] == 1]
    assert all(r["code"] == 0 and r["scale"] == 0.0 for r in zero)


def test_quantize_extremes_hit_127(spark, emb):
    rows = {(r["id"], r["i"]): r["code"] for r in quantize_int8(emb).collect()}
    assert rows[(3, 0)] == 127
    assert rows[(3, 1)] == -127


def test_dequantize_error_bounded_by_half_scale(spark, emb):
    q = quantize_int8(emb)
    deq = {(r["id"], r["i"]): r["x_hat"] for r in dequantize_int8(q).collect()}
    scales = {r["id"]: r["scale"] for r in q.collect()}
    for vid, vec in VECS:
        for i, x in enumerate(vec):
            # scale is rounded to 6 at the edge; widen the bound by the
            # rounding slack
            bound = scales[vid] / 2 + 5e-7 * 127
            assert abs(deq[(vid, i)] - x) <= bound + 1e-12


def test_random_projection_matches_manual_dot(spark, emb):
    planes = [[1.0, 0.0, 0.0, 0.0], [0.5, 0.5, -0.5, 2.0]]
    out = {
        (r["id"], r["j"]): r["value"]
        for r in random_projection(emb, planes).collect()
    }
    for vid, vec in VECS:
        for j, plane in enumerate(planes):
            want = round(sum(x * p for x, p in zip(vec, plane)), 6)
            assert math.isclose(out[(vid, j)], want, abs_tol=1e-9)


def test_quantize_plan_has_no_shuffle(spark, emb):
    plan = quantize_int8(emb)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_quantize_empty_input(spark):
    df = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert quantize_int8(df).count() == 0


def test_random_projection_empty_planes_and_input(spark, emb):
    assert random_projection(emb, []).count() == 0
    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    assert random_projection(empty, [[1.0, 0.0, 0.0, 0.0]]).count() == 0
