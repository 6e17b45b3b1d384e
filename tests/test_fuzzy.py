"""Edit-distance join: PassJoin segment blocking must equal the
quadratic form exactly — random corpora spanning the short-string
fallback stratum, plus hand cases for every edit type."""

from __future__ import annotations

import random

import pytest


def _lev(a, b):
    m, n = len(a), len(b)
    dp = list(range(n + 1))
    for i in range(1, m + 1):
        prev, dp[0] = dp[0], i
        for j in range(1, n + 1):
            cur = dp[j]
            dp[j] = min(dp[j] + 1, dp[j - 1] + 1, prev + (a[i - 1] != b[j - 1]))
            prev = cur
    return dp[n]


def test_edit_distance_join_hand_cases(spark):
    from poc_spark.operators.fuzzy import edit_distance_join

    rows = [
        (1, "jonathan smith"),
        (2, "jonathan smyth"),   # substitution -> 1
        (3, "jonathn smith"),    # deletion -> 1 vs 1, 2 vs 2
        (4, "jonathan smith jr"),  # 3 inserts -> out at k=2
        (5, "completely different"),
        (6, "ab"),               # short stratum
        (7, "ba"),               # ed 2 from 'ab' (two subs)
    ]
    got = {
        (r["id_a"], r["id_b"]): r["dist"]
        for r in edit_distance_join(
            spark.createDataFrame(rows, "id long, name string"), k=2
        ).collect()
    }
    exp = {}
    for i in range(len(rows)):
        for j in range(i + 1, len(rows)):
            d = _lev(rows[i][1], rows[j][1])
            if d <= 2:
                exp[(rows[i][0], rows[j][0])] = d
    assert got == exp
    assert got[(1, 2)] == 1 and got[(6, 7)] == 2
    assert (1, 4) not in got


@pytest.mark.parametrize("seed,k", [(7, 2), (11, 1), (13, 2)])
def test_edit_distance_join_equals_quadratic(spark, seed, k):
    """Random corpus over a small alphabet (maximizes near-collisions),
    lengths 1..14 so both the pigeonhole path and the short-string
    fallback strata carry pairs."""
    from poc_spark.operators.fuzzy import edit_distance_join

    rng = random.Random(seed)
    names = [
        "".join(rng.choice("abcdef") for _ in range(rng.randint(1, 14)))
        for _ in range(120)
    ]
    df = spark.createDataFrame(
        list(enumerate(names)), "id long, name string"
    )
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_join(df, k=k).collect()
    }
    exp = {
        (i, j, _lev(names[i], names[j]))
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if _lev(names[i], names[j]) <= k
    }
    assert got == exp


def test_k1_fastss_equals_passjoin(spark):
    """The k=1 deletion-neighborhood path (r14 opt) must produce the
    exact pair set of the forced PassJoin path on a corpus that hits
    every stratum: shared constant prefixes (the degenerate PassJoin
    case it exists for), short strings, empty-adjacent strings, and
    repeated characters (duplicate deletion keys)."""
    import random

    from pyspark.sql import functions as F  # noqa: F401

    from poc_spark.operators.fuzzy import edit_distance_join

    rng = random.Random(5)
    names = [f"Customer#{rng.randint(0, 40):06d}" for _ in range(60)] + [
        "".join(rng.choice("ab") for _ in range(rng.randint(0, 6)))
        for _ in range(60)
    ]
    df = spark.createDataFrame(list(enumerate(names)), "id long, name string")

    def run():
        return {
            (r["id_a"], r["id_b"], r["dist"])
            for r in edit_distance_join(df, k=1).collect()
        }

    spark.conf.set("spark.poc.fuzzy.k1Strategy", "fastss")
    try:
        fastss = run()
    finally:
        spark.conf.set("spark.poc.fuzzy.k1Strategy", "passjoin")
    try:
        passjoin = run()
    finally:
        spark.conf.unset("spark.poc.fuzzy.k1Strategy")
    assert fastss == passjoin
    assert len(fastss) > 0
