"""Deterministic sampling, splitting, source mixing, and sequence
packing — the data-mixing layer of a training pipeline.

Everything here is CONTENT-ADDRESSED (hash of a stable key), never
RNG-state-addressed: re-running on appended data keeps every prior
keep/drop/split decision, any engine reproduces the same sample, and
there is no driver-coordinated seed. The hash is the md5-60bit bucket
(poc_spark/operators/dedup.py token_hash 'md5_60'), reproducible in
DuckDB as ('0x'||substr(md5(k),1,15))::BIGINT, so every operator in
this module is exactly oracle-able.

Scale shape: sampling/splitting/mixing are stateless narrow filters
(pipeline with the scan, no shuffle). Packing windows are PARTITIONED
by a hash shard — no global window, each shard packs independently
(exactly how distributed training pipelines pack: per-worker bins,
never a cluster-wide sequential scan).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from poc_spark.operators.dedup import token_hash

# bucket resolution: fractions are exact multiples of 1e-6
_BUCKETS = 1_000_000


def hash_bucket(
    key: Column, n_buckets: int = _BUCKETS, purpose: str = ""
) -> Column:
    """Uniform deterministic bucket in [0, n_buckets) from the md5-60bit
    of the key's string form, salted by `purpose`.

    The purpose salt makes independent decisions INDEPENDENT: without
    it, sample/split/mix all rank rows by the same hash, so a 10%
    sample keeps exactly the rows a 10% test split labels 'test' and a
    composed pipeline yields a catastrophically skewed split. Each
    operator passes its own salt; DuckDB twin:
    ('0x'||substr(md5(k::VARCHAR || '<purpose>'),1,15))::BIGINT % n."""
    salted = (
        F.concat(key.cast("string"), F.lit(purpose))
        if purpose
        else key.cast("string")
    )
    return F.pmod(token_hash(salted, "md5_60"), F.lit(n_buckets)).cast("long")


def deterministic_sample(
    df: DataFrame, frac: float, key_col: str = "doc_id"
) -> DataFrame:
    """Bernoulli-style sample keeping rows whose hash bucket falls below
    frac — stable across runs, engines, and cluster layouts (unlike
    df.sample, whose output depends on partitioning + seed)."""
    return df.filter(
        hash_bucket(F.col(key_col), purpose=":sample") < int(round(frac * _BUCKETS))
    )


def split_train_val_test(
    df: DataFrame,
    key_col: str = "doc_id",
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> DataFrame:
    """Adds a 'split' column ('train'/'val'/'test') by hash bucket:
    disjoint, exhaustive, append-stable (a doc never migrates between
    splits when the corpus grows)."""
    b = hash_bucket(F.col(key_col), purpose=":split")
    n_test = int(round(test_frac * _BUCKETS))
    n_val = int(round(val_frac * _BUCKETS))
    split = (
        F.when(b < n_test, F.lit("test"))
        .when(b < n_test + n_val, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def leakage_safe_split(
    df: DataFrame,
    text_col: str = "text",
    val_frac: float = 0.1,
    test_frac: float = 0.1,
) -> DataFrame:
    """Adds a 'split' column keyed on the CONTENT hash (sha-256 of the
    whitespace-normalized text, dedup.normalized_text), not the row id —
    so byte-identical duplicates can NEVER straddle train and test.

    Why this exists next to split_train_val_test: an id-keyed split
    sends two copies of the same document to different splits whenever
    the corpus has duplicates — the classic eval-contamination bug
    (test "held-out" docs the model saw verbatim in train). Keying the
    bucket on the content digest makes the guarantee structural: equal
    content ⇒ equal bucket ⇒ equal split, with no join against a dedup
    table. Near-duplicates still need an upstream cluster-aware
    assignment (dedup_clusters + a representative-keyed broadcast);
    this operator closes the exact-duplicate half at zero extra cost.

    Same stateless narrow-filter shape as split_train_val_test — the
    sha and the md5 bucket both pipeline with the scan, no shuffle.
    Purpose-salted (':lsplit') so it stays independent of every other
    sampling decision."""
    from poc_spark.operators.dedup import normalized_text

    key = F.sha2(normalized_text(F.col(text_col)), 256)
    b = hash_bucket(key, purpose=":lsplit")
    n_test = int(round(test_frac * _BUCKETS))
    n_val = int(round(val_frac * _BUCKETS))
    split = (
        F.when(b < n_test, F.lit("test"))
        .when(b < n_test + n_val, F.lit("val"))
        .otherwise(F.lit("train"))
    )
    return df.withColumn("split", split)


def mix_sources(
    df: DataFrame,
    weights: dict[str, float],
    source_col: str = "source",
    key_col: str = "doc_id",
) -> DataFrame:
    """Deterministic per-source downsampling to a target mixture: each
    source keeps its own fraction (sources absent from `weights` keep
    0.0 — an explicit mixture is a whitelist). The weight map rides as
    a literal when-chain (tiny, known at plan time) — no join."""
    thr: Column = F.lit(0)
    for src, frac in sorted(weights.items()):
        thr = F.when(
            F.col(source_col) == src, F.lit(int(round(frac * _BUCKETS)))
        ).otherwise(thr)
    return df.filter(hash_bucket(F.col(key_col), purpose=":mix") < thr)


def pack_sequences(
    df: DataFrame,
    budget: int,
    n_shards: int = 32,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_tokens, shard, seq_bin) — contiguous token-budget packing:
    within each hash shard, docs are taken in id order and a doc joins
    bin floor(prefix_tokens_before_it / budget). This is the streaming
    prefix-sum approximation of greedy bin packing (a doc may straddle
    a budget boundary; trainers truncate/pad at the seam).

    The window is PARTITIONED by shard — n_shards independent packers,
    no global sort. At 1000 executors raise n_shards to ~4x the
    parallelism; determinism is unaffected because shard assignment is
    content-addressed."""
    shard = hash_bucket(F.col(id_col), n_shards, purpose=":shard")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    with_shard = df.select(
        F.col(id_col), F.col(token_col), shard.alias("shard")
    )
    prefix_before = F.sum(token_col).over(w) - F.col(token_col)
    return with_shard.select(
        id_col,
        token_col,
        "shard",
        F.floor(prefix_before / budget).cast("long").alias("seq_bin"),
    )


def sample_k_per_stratum(
    df: DataFrame,
    k: int,
    stratum_col: str,
    key_col: str = "doc_id",
    purpose: str = ":kper",
) -> DataFrame:
    """Exactly min(k, |stratum|) rows per stratum — the class-balancing
    counterpart of the fraction-based ops above (mix_sources keeps a
    RATE per source; this keeps a COUNT, e.g. "500 docs per language
    for the eval set"). Rows rank within their stratum by
    (hash_bucket, key): content-addressed like everything here, so the
    picked set is engine- and layout-independent, and ties in the
    bucket break on the key. Pass a distinct `purpose` salt per use
    (e.g. ":domaincap" for per-domain caps) so independent selections
    stay independent.

    Skew note (verified in the physical plan AND measured —
    tools/topk_skew_demo.py): Catalyst's InferWindowGroupLimit
    (Spark >= 3.5) rewrites this rank-filter pattern into partial
    per-map-task top-k BEFORE the shuffle, so at most map_tasks x k
    rows of any stratum cross the wire and a hot stratum never sorts
    its full row set in one task. The plain window IS the two-phase
    skew-safe plan; plans/skew.salted_top_k exists only as the
    explicit fallback for engines/patterns the rule can't match.
    """
    h = hash_bucket(F.col(key_col), purpose=purpose)
    w = Window.partitionBy(stratum_col).orderBy(h.asc(), F.col(key_col).asc())
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def weighted_sample(
    df: DataFrame, prob_col, key_col: str = "doc_id"
) -> DataFrame:
    """Keep each row with ITS OWN probability (a Column in [0,1]) —
    quality-weighted selection (DCLM-style: upweight high-quality docs)
    as a deterministic content-addressed filter, not an RNG draw. Same
    stateless narrow-filter shape as deterministic_sample, but the
    threshold comes from the row, so any score column drives the mix.
    floor() on the threshold (NOT cast) — CAST(double AS BIGINT) rounds
    in DuckDB but truncates in Spark."""
    prob = prob_col if isinstance(prob_col, Column) else F.col(prob_col)
    thr = F.floor(prob * _BUCKETS).cast("long")
    return df.filter(hash_bucket(F.col(key_col), purpose=":wsample") < thr)


def temperature_mix(
    df: DataFrame,
    source_col: str = "source",
    key_col: str = "doc_id",
    mass_col: str | None = None,
    buckets: int = _BUCKETS,
) -> DataFrame:
    """Temperature-based source rebalancing (the mC4/ROOTS mixing
    shape): downsample each source s at rate sqrt(c_s / c_max), so
    over-represented sources shrink toward the largest source's
    sqrt-scaled mass while small sources pass through whole. c_s is
    row count by default; pass `mass_col` (e.g. n_chars or a token
    count) to mix by BYTE/TOKEN mass — what LM mixing actually
    balances, since sources differ more in document length than in
    document count.

    alpha is FIXED at 0.5 because sqrt is correctly-rounded IEEE in
    every engine — pow(x, alpha) is libm-dependent and would break the
    cross-engine oracle. The keep decision is the module's standard
    content-addressed filter: md5-60 bucket < floor(rate * buckets),
    an integer compare, so the kept set is append-stable and exactly
    reproducible.

    Plan: one tiny per-source count aggregate, a 1-row max broadcast
    (constant, not a quadratic risk), then a stateless narrow filter —
    the scan dominates at any scale.
    """
    # integer-typed mass sums exactly in any order; fractional mass
    # columns would make the sum order-dependent and break the oracle
    mass = F.count(F.lit(1)) if mass_col is None else F.sum(mass_col)
    counts = df.groupBy(source_col).agg(mass.alias("_c"))
    cmax = counts.agg(F.max("_c").alias("_cmax"))
    rates = counts.crossJoin(F.broadcast(cmax)).select(
        source_col,
        F.floor(
            F.sqrt(F.col("_c").cast("double") / F.col("_cmax").cast("double"))
            * F.lit(float(buckets))
        ).alias("_cut"),
    )
    return (
        df.join(F.broadcast(rates), source_col)
        .filter(hash_bucket(F.col(key_col), buckets, ":temp") < F.col("_cut"))
        .drop("_cut")
    )


def epoch_order(
    df: DataFrame, epoch: int, key_col: str = "doc_id"
) -> DataFrame:
    """Deterministic per-epoch global shuffle order — the train-loader
    primitive: every epoch visits the full dataset in a DIFFERENT but
    fully reproducible permutation, independent of cluster layout,
    partition count, or insertion order. The sort key is the md5-60
    of (key, ':epoch:<n>') — the same purpose-salt discipline as the
    other sampling ops, so epoch permutations are mutually
    independent and also independent of every sample/split decision.

    Returns (pos, epoch, <key>) with pos the 1-based position in the
    epoch's order. At 100 TB nobody collects a total order to the
    driver: the global sort is `repartitionByRange + sortWithin`
    (Spark's total-order sort) feeding a sorted write, and the
    training job streams the files in name order — `pos` here is a
    row_number over the same ordering for the contract's benefit; the
    ORDER, not the position column, is the product. Ties are
    impossible in practice (60-bit hash on distinct keys) but the key
    itself is the secondary sort, making even a collision
    deterministic."""
    from pyspark.sql import Window

    k = F.col(key_col)
    order_key = token_hash(
        F.concat(k.cast("string"), F.lit(f":epoch:{int(epoch)}")), "md5_60"
    )
    w = Window.orderBy(order_key, k)
    return df.select(
        F.row_number().over(w).cast("long").alias("pos"),
        F.lit(int(epoch)).cast("long").alias("epoch"),
        k.alias(key_col),
    )
