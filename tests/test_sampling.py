"""Determinism, partition, and packing invariants for the sampling /
mixing / packing operators."""

from __future__ import annotations

from collections import defaultdict

from pyspark.sql import functions as F

from poc_spark.operators.sampling import (
    deterministic_sample,
    hash_bucket,
    mix_sources,
    pack_sequences,
    split_train_val_test,
)


def _docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def test_sample_is_deterministic_and_close_to_frac(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    a = {r["doc_id"] for r in deterministic_sample(docs, 0.25).select("doc_id").collect()}
    b = {r["doc_id"] for r in deterministic_sample(docs, 0.25).select("doc_id").collect()}
    assert a == b  # no RNG state anywhere
    n = docs.count()
    assert 0.15 * n <= len(a) <= 0.35 * n  # binomial tolerance at n=500


def test_sample_is_monotone_in_frac(spark, sf_dir):
    """A row kept at frac f stays kept at every f' > f (bucket filter
    is a prefix of the bucket space) — lets you grow a sample without
    resampling what's already processed."""
    docs = _docs(spark, sf_dir)
    small = {r["doc_id"] for r in deterministic_sample(docs, 0.1).select("doc_id").collect()}
    big = {r["doc_id"] for r in deterministic_sample(docs, 0.3).select("doc_id").collect()}
    assert small <= big


def test_split_disjoint_exhaustive_stable(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    rows = split_train_val_test(docs, val_frac=0.2, test_frac=0.2).select(
        "doc_id", "split"
    ).collect()
    assert len(rows) == docs.count()
    by_split = defaultdict(set)
    for r in rows:
        by_split[r["split"]].add(r["doc_id"])
    assert set(by_split) == {"train", "val", "test"}
    assert not (by_split["train"] & by_split["val"])
    assert not (by_split["val"] & by_split["test"])
    assert not (by_split["train"] & by_split["test"])
    # append-stability: splitting a SUBSET assigns identical labels
    sub = split_train_val_test(
        docs.filter(F.col("doc_id") % 2 == 0), val_frac=0.2, test_frac=0.2
    ).select("doc_id", "split").collect()
    full = {r["doc_id"]: r["split"] for r in rows}
    assert all(full[r["doc_id"]] == r["split"] for r in sub)


def test_mix_sources_respects_weights(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    out = mix_sources(docs, {"src0": 1.0, "src1": 0.5})
    per_src = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(per_src) <= {"src0", "src1"}  # unlisted sources dropped
    assert per_src["src0"] == 25  # frac 1.0 keeps everything
    assert 5 <= per_src.get("src1", 0) <= 20  # frac 0.5 of 25


def test_pack_sequences_invariants(spark, sf_dir):
    docs = _docs(spark, sf_dir)
    from poc_spark.operators.textstats import token_count

    sized = docs.select("doc_id", token_count(F.col("text")).alias("n_tokens"))
    packed = pack_sequences(sized, budget=200, n_shards=8).collect()
    assert len(packed) == docs.count()
    by_shard = defaultdict(list)
    for r in packed:
        by_shard[r["shard"]].append(r)
    assert set(r["shard"] for r in packed) <= set(range(8))
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r["doc_id"])
        prefix = 0
        for r in rows:
            assert r["seq_bin"] == prefix // 200, (shard, r)
            prefix += r["n_tokens"]
        # bins are dense from 0
        bins = sorted({r["seq_bin"] for r in rows})
        assert bins == list(range(len(bins)))


def test_hash_bucket_matches_duckdb(spark, sf_dir):
    """The bucket function is the cross-engine contract — pin it
    directly against DuckDB's md5-60bit expression, salted and not."""
    import duckdb

    docs = _docs(spark, sf_dir).limit(50)
    for purpose in ("", ":split"):
        got = {
            r["doc_id"]: r["b"]
            for r in docs.select(
                "doc_id", hash_bucket(F.col("doc_id"), purpose=purpose).alias("b")
            ).collect()
        }
        con = duckdb.connect()
        want = dict(
            con.execute(
                f"""
                SELECT doc_id,
                       ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '{purpose}'),
                                       1, 15))::BIGINT % 1000000 AS b
                FROM read_parquet('{sf_dir}/documents.parquet')
                """
            ).fetchall()
        )
        assert all(want[k] == v for k, v in got.items())


def test_sample_and_split_are_independent(spark, sf_dir):
    """Purpose salts decorrelate the layers: within a 50% sample the
    train/val/test proportions must match the configured fractions.
    (Unsalted, a 0.2 sample kept EXACTLY the buckets a 0.2 test split
    labels 'test' — a composed pipeline shipped test data as train.)"""
    docs = _docs(spark, sf_dir)
    sampled = deterministic_sample(docs, 0.5)
    rows = split_train_val_test(sampled, val_frac=0.2, test_frac=0.2).collect()
    n = len(rows)
    counts = defaultdict(int)
    for r in rows:
        counts[r["split"]] += 1
    # binomial 3-sigma bands at n≈250
    assert 0.45 * n <= counts["train"] <= 0.75 * n
    assert 0.10 * n <= counts["val"] <= 0.32 * n
    assert 0.10 * n <= counts["test"] <= 0.32 * n
    # and the worst case of the old bug: a 0.2 sample must NOT equal
    # the 'test' split of a 0.2-test split
    s02 = {r["doc_id"] for r in deterministic_sample(docs, 0.2).select("doc_id").collect()}
    t02 = {
        r["doc_id"]
        for r in split_train_val_test(docs, val_frac=0.1, test_frac=0.2)
        .filter(F.col("split") == "test").select("doc_id").collect()
    }
    overlap = len(s02 & t02) / max(len(s02 | t02), 1)
    assert overlap < 0.5  # independent draws overlap ~ Jaccard 0.11


def test_sample_k_per_stratum(spark, sf_dir):
    from poc_spark.operators.sampling import sample_k_per_stratum

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sample_k_per_stratum(docs, k=10, stratum_col="lang")
    per = {r["lang"]: r["n"] for r in got.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    sizes = {r["lang"]: r["n"] for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert per == {lang: min(10, n) for lang, n in sizes.items()}
    # deterministic: same picks on re-run
    again = sample_k_per_stratum(docs, k=10, stratum_col="lang")
    assert {tuple(r) for r in got.select("doc_id").collect()} == {
        tuple(r) for r in again.select("doc_id").collect()
    }


def test_weighted_sample(spark, sf_dir):
    from poc_spark.operators.sampling import weighted_sample

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    # prob 0 keeps nothing, prob 1 keeps everything
    assert weighted_sample(docs, F.lit(0.0)).count() == 0
    assert weighted_sample(docs, F.lit(1.0)).count() == docs.count()
    # a mid probability keeps roughly that fraction (binomial 4-sigma)
    n = docs.count()
    kept = weighted_sample(docs, F.lit(0.5)).count()
    assert abs(kept - 0.5 * n) < 4 * (0.25 * n) ** 0.5
    # column-driven: only rows whose own prob admits them
    p = F.when(F.col("doc_id") % 2 == 0, F.lit(1.0)).otherwise(F.lit(0.0))
    got = weighted_sample(docs, p).select("doc_id").collect()
    assert all(r["doc_id"] % 2 == 0 for r in got)
    assert len(got) == docs.filter("doc_id % 2 = 0").count()


def test_temperature_mix_rates(spark):
    from poc_spark.operators.sampling import temperature_mix

    # source 'big' 10x the mass of 'small': big keeps ~sqrt(1/1)=100%?
    # no — big IS c_max so rate 1.0; small keeps sqrt(small/big)
    rows = [(i, "big") for i in range(4000)] + [
        (10_000 + i, "small") for i in range(400)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    kept = temperature_mix(df).groupBy("source").count().collect()
    got = {r["source"]: r["count"] for r in kept}
    # c_max source passes through whole (rate 1.0 keeps every bucket)
    assert got["big"] == 4000
    import math

    expect_small = 400 * math.sqrt(400 / 4000)
    assert abs(got["small"] - expect_small) < 0.15 * expect_small


def test_temperature_mix_deterministic_and_append_stable(spark):
    from poc_spark.operators.sampling import temperature_mix

    rows = [(i, f"s{i % 3}") for i in range(900)]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    a = {r["doc_id"] for r in temperature_mix(df).collect()}
    b = {r["doc_id"] for r in temperature_mix(df.repartition(7)).collect()}
    assert a == b  # layout-independent (content-addressed)


def test_weighted_k_sample_biases_toward_heavy_rows(spark):
    """A-ES sanity: with weights spanning 100x, the top-k under
    -ln(u)/w must over-select heavy rows vs their population share,
    and the result is layout-independent."""
    from poc_spark.contract import REGISTRY
    from poc_spark import contract

    rows = [(i, 1000 if i < 100 else 10) for i in range(1000)]
    df = spark.createDataFrame(rows, "doc_id long, n_chars long")
    orig = contract._t
    try:
        contract._t = lambda s, d, n: df
        picked = [
            r["doc_id"]
            for r in REGISTRY["sample_weighted_k"].spark(spark, "x").collect()
        ]
    finally:
        contract._t = orig
    heavy = sum(1 for i in picked if i < 100)
    # heavy rows are 10% of the population with 100x the weight;
    # expect far more than 10 of the 100 picks (measured ~90+)
    assert heavy > 50
    assert len(picked) == 100


def test_temperature_mix_degenerate_inputs(spark):
    from poc_spark.operators.sampling import temperature_mix

    empty = spark.createDataFrame([], "doc_id long, source string")
    assert temperature_mix(empty).count() == 0
    # single source IS c_max: rate 1.0 keeps everything
    one = spark.createDataFrame(
        [(i, "only") for i in range(200)], "doc_id long, source string"
    )
    assert temperature_mix(one).count() == 200


def test_leakage_safe_split_dupes_never_straddle(spark):
    """Content-keyed split: byte-identical (post-normalization) docs
    must land in the same split, exactly the property an id-keyed
    split lacks on duplicated corpora."""
    from poc_spark.operators.sampling import leakage_safe_split

    rows = [
        (i, t)
        for i, t in enumerate(
            ["the quick brown fox %d" % (k % 7) for k in range(70)]
            + ["  The  quick brown fox 3  "]  # normalizes into group 3
        )
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = leakage_safe_split(docs, val_frac=0.3, test_frac=0.3).select(
        F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))).alias("norm"),
        "split",
    )
    per_group = (
        out.groupBy("norm")
        .agg(F.countDistinct("split").alias("n_splits"))
        .collect()
    )
    assert all(r["n_splits"] == 1 for r in per_group)
    # with 7 content groups and 30/30/40 cuts, at least two splits occur
    assert out.select("split").distinct().count() >= 2


def test_leakage_safe_split_disjoint_exhaustive(spark, sf_dir):
    from poc_spark.operators.sampling import leakage_safe_split

    docs = _docs(spark, sf_dir)
    out = leakage_safe_split(docs).select("doc_id", "split").collect()
    assert len(out) == docs.count()
    assert {r["split"] for r in out} <= {"train", "val", "test"}


def test_epoch_order_permutes_independently(spark):
    """Each epoch is a full permutation (no rows lost, positions
    dense), different epochs order differently, and the ordering is
    layout-independent (repartitioned input gives the identical
    order)."""
    from poc_spark.operators.sampling import epoch_order

    df = spark.createDataFrame(
        [(i, f"d{i}") for i in range(100)], "doc_id long, text string"
    )

    def order(d, e):
        return [
            r["doc_id"]
            for r in epoch_order(d, e).orderBy("pos").collect()
        ]

    e0, e1 = order(df, 0), order(df, 1)
    assert sorted(e0) == list(range(100)) and sorted(e1) == list(range(100))
    assert e0 != e1  # different epochs, different permutations
    assert order(df.repartition(7), 0) == e0  # layout-independent
    # dense 1-based positions
    pos = [r["pos"] for r in epoch_order(df, 0).orderBy("pos").collect()]
    assert pos == list(range(1, 101))
