"""Repetition-based quality rules + benchmark decontamination.

The two pre-training gates doc_stats (textstats.py) doesn't cover:

- Gopher-style REPETITION rules (Rae et al. 2021, §A1.1): a document
  dominated by one repeated n-gram, or with a collapsed vocabulary, is
  boilerplate/spam regardless of its length or punctuation profile.
  Signals here are token-level (the corpus is whitespace-tokenizable):
  `dup_token_frac` (1 - vocabulary/total) and `top_bigram_frac`
  (share of bigram slots taken by the single most frequent bigram).

- DECONTAMINATION (GPT-3 paper §C / PaLM §7): drop training docs that
  share any n-gram with an evaluation benchmark. Expressed as
  explode-to-ngrams → distinct benchmark grams (small, broadcast) →
  LEFT SEMI join — at 100 TB the benchmark side is a few MB of hashed
  grams, so the probe is a map-side broadcast-hash-join; the fact
  table shuffles nothing.

All arithmetic is exact (int counts, one final double division), so
every output is DuckDB-oracle-able bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _tokens(text: F.Column) -> F.Column:
    """Whitespace tokens, empties dropped (split on runs of whitespace)."""
    return F.filter(F.split(text, r"\s+"), lambda t: t != "")


def _bigrams(toks: F.Column) -> F.Column:
    """Adjacent-token bigrams: size-1 slots (empty array below 2 tokens)."""
    return F.when(F.size(toks) < 2, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - 2),
            lambda i: F.concat_ws(" ", F.element_at(toks, i + 1), F.element_at(toks, i + 2)),
        )
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document repetition profile:
    (id, n_tokens, dup_token_frac, top_bigram_frac, repetitive).

    `repetitive` applies Gopher-flavored thresholds: >60 % duplicate
    tokens, or one bigram filling >18 % of bigram slots — the bigram
    rule only for docs of ≥20 tokens (on shorter docs the most frequent
    bigram trivially exceeds any fraction). One explode +
    one two-level aggregate; group keys are (doc_id, gram) — uniform,
    shuffle-safe at any corpus size."""
    toks = _tokens(F.col(text_col))
    base = df.select(
        F.col(id_col),
        toks.alias("_toks"),
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("_n_vocab"),
    )
    grams = base.select(
        id_col,
        "n_tokens",
        "_n_vocab",
        F.explode_outer(_bigrams(F.col("_toks"))).alias("_g"),
    )
    per_gram = grams.groupBy(id_col, "n_tokens", "_n_vocab", "_g").agg(
        F.count(F.lit(1)).alias("_c")
    )
    per_doc = per_gram.groupBy(id_col, "n_tokens", "_n_vocab").agg(
        F.max(F.when(F.col("_g").isNotNull(), F.col("_c"))).alias("_max_c"),
        F.sum(F.when(F.col("_g").isNotNull(), F.col("_c")).otherwise(0)).alias(
            "_n_grams"
        ),
    )
    dup_frac = (
        (F.col("n_tokens") - F.col("_n_vocab"))
        / F.greatest(F.col("n_tokens"), F.lit(1))
    ).cast("double")
    top_frac = (
        F.coalesce(F.col("_max_c"), F.lit(0))
        / F.greatest(F.col("_n_grams"), F.lit(1))
    ).cast("double")
    return per_doc.select(
        F.col(id_col),
        "n_tokens",
        dup_frac.alias("dup_token_frac"),
        top_frac.alias("top_bigram_frac"),
        (
            (dup_frac > 0.6) | ((top_frac > 0.18) & (F.col("n_tokens") >= 20))
        ).alias("repetitive"),
    )


def ngrams(df: DataFrame, n: int, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(id, gram) pairs of adjacent word n-grams, distinct per doc.

    The token array is materialized as a COLUMN in a separate project
    before the higher-order transform: lambdas don't participate in
    subexpression elimination, so inlining `_tokens(text)` would
    re-run split+filter for every element_at reference (n per slot ×
    ~|tokens| slots — measured 15 s vs ~2 s on the sf0.1 corpus)."""
    toked = df.select(F.col(id_col), _tokens(F.col(text_col)).alias("_toks"))
    toks = F.col("_toks")
    grams = F.when(F.size(toks) < n, F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - n),
            lambda i: F.concat_ws(
                " ", *[F.element_at(toks, i + j + 1) for j in range(n)]
            ),
        )
    )
    return toked.select(F.col(id_col), F.explode(grams).alias("gram")).distinct()


def decontaminate(
    train: DataFrame,
    benchmark: DataFrame,
    n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Flag training docs sharing any word n-gram with the benchmark:
    (id, contaminated). The benchmark gram set is distinct-ed and
    BROADCAST (benchmarks are small by construction); the training side
    explodes to grams once and semi-joins map-side — no fact shuffle."""
    train_grams = ngrams(train, n, text_col, id_col)
    bench_grams = ngrams(benchmark, n, text_col, id_col).select("gram").distinct()
    hits = (
        train_grams.join(F.broadcast(bench_grams), "gram", "leftsemi")
        .select(id_col)
        .distinct()
        .withColumn("contaminated", F.lit(True))
    )
    return (
        train.select(id_col)
        .join(hits, id_col, "left")
        .select(
            id_col, F.coalesce("contaminated", F.lit(False)).alias("contaminated")
        )
    )


def weak_label_col(
    text: F.Column,
    low_max_ratio: float = 0.40,
    high_min_ratio: float = 0.60,
) -> F.Column:
    """The weak-supervision label as a COLUMN ('low' / 'high' / NULL
    for the abstained middle band) — the expression form of
    quality_weak_labels, so fused pipelines can carry the label through
    a gram pass without a docs-vs-labels self-join."""
    toks = _tokens(text)
    ratio = F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    )
    return (
        F.when(ratio <= F.lit(low_max_ratio), F.lit("low"))
        .when(ratio >= F.lit(high_min_ratio), F.lit("high"))
    )


def quality_weak_labels(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    low_max_ratio: float = 0.40,
    high_min_ratio: float = 0.60,
) -> DataFrame:
    """(id, distinct_ratio, label) — WEAK supervision for the trained
    quality classifier (the CCNet-style labeling stage): documents
    whose distinct-token ratio is at or below `low_max_ratio` are
    weak-labeled 'low' (duplicated-token spam), at or above
    `high_min_ratio` 'high'; the ambiguous middle band gets NULL and is
    EXCLUDED from training — standard weak-supervision practice, the
    classifier then generalizes over the whole corpus including the
    band the rule abstains on. Thresholds are fixed constants (not
    learned quantiles) so the rule replays bit-identically in any
    engine: ratio is one exact-int division."""
    toks = _tokens(F.col(text_col))
    ratio = F.size(F.array_distinct(toks)).cast("double") / F.greatest(
        F.size(toks), F.lit(1)
    )
    return df.select(
        F.col(id_col),
        F.round(ratio, 6).alias("distinct_ratio"),
        F.when(ratio <= F.lit(low_max_ratio), F.lit("low"))
        .when(ratio >= F.lit(high_min_ratio), F.lit("high"))
        .alias("label"),
    )


def quality_classifier_score(
    df: DataFrame,
    model: DataFrame,
    n_features: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """APPLY the trained quality classifier (model = textstats.
    langid_ngram_train over quality_weak_labels output — the same
    hashed char-trigram count relation, labels {'low','high'} instead
    of languages): per-class score s = Σ tf·c / total (exact integer
    numerator, one double division), then
      quality    = s_high / (s_high + s_low)   (absent class -> 0.0)
      pred_label = 'high' iff s_high >= s_low.
    Returns (id, q_low, q_high, quality, pred_label); documents whose
    trigrams hit no model bucket have no row (both engines agree).

    Scale shape is the langid scorer's: corpus-sized work is the gram
    explode + two map-side-combining hash aggs keyed by id; the model
    (<= 2 x n_features rows) broadcasts — the corpus never shuffles
    against it."""
    from poc_spark.operators.textstats import _char_trigrams, _gram_bucket

    docg = (
        df.select(
            F.col(id_col).alias("id"),
            F.explode(_char_trigrams(text_col)).alias("g"),
        )
        .select("id", _gram_bucket(F.col("g"), n_features).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    per = (
        docg.join(F.broadcast(model), "bucket")
        .groupBy("id", "lang")
        .agg(
            F.sum(F.col("tf") * F.col("c")).cast("long").alias("num"),
            F.max("total").alias("total"),  # constant within the group
        )
        .select(
            "id",
            "lang",
            (F.col("num").cast("double") / F.col("total").cast("double")).alias(
                "sc"
            ),
        )
    )
    sh = F.coalesce(F.sum(F.when(F.col("lang") == "high", F.col("sc"))), F.lit(0.0))
    sl = F.coalesce(F.sum(F.when(F.col("lang") == "low", F.col("sc"))), F.lit(0.0))
    return (
        per.groupBy("id")
        .agg(sh.alias("sh"), sl.alias("sl"))
        .select(
            "id",
            F.round("sl", 6).alias("q_low"),
            F.round("sh", 6).alias("q_high"),
            F.round(F.col("sh") / (F.col("sh") + F.col("sl")), 6).alias(
                "quality"
            ),
            F.when(F.col("sh") >= F.col("sl"), F.lit("high"))
            .otherwise(F.lit("low"))
            .alias("pred_label"),
        )
    )


def quality_classifier_train_score(
    df: DataFrame,
    train_label: F.Column,
    n_features: int = 4096,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """FUSED weak-train + full-corpus score — ONE gram pass where the
    train-then-score composition (quality_weak_labels →
    langid_ngram_train → quality_classifier_score) runs TWO: the
    training label (`train_label`, a COLUMN that is NULL off the
    training split — functionally dependent on the document) rides the
    scorer's per-(id, bucket) term-frequency aggregate as an extra
    group key, so the model's per-(label, bucket) counts are the SUM
    of those tf rows (count of gram occurrences ≡ sum of per-doc
    counts — exact integers) instead of a second corpus explode.

    Output and semantics are IDENTICAL to quality_classifier_score
    over a langid_ngram_train model: same buckets (md5 ':lid' salt),
    same integer numerators, one double division, round 6.

    Scale shape (the point of the fusion): corpus-sized work is ONE
    explode + ONE map-side-combining hash agg; the model leg reduces
    the checkpointed tf relation to ≤ 2×n_features rows with a
    model-sized shuffle; the score leg broadcast-joins that model.
    The un-fused chain paid the explode + md5 bucketing TWICE (train
    split + full corpus ≈ 1.75× the corpus at a 3/4 split) plus a
    docs-vs-weak-labels self-join this form never materializes."""
    from pyspark.sql import Window

    from poc_spark.operators.textstats import _char_trigrams, _gram_bucket

    # two measured shape traps here (sf0.1, local[32]):
    # - the label must be a COLUMN of the Generate's child (computed in
    #   this projection, once per doc): inlined next to explode() it is
    #   re-evaluated per OUTPUT gram row (29 s vs 6 s — the
    #   split+array_distinct inside the weak label × 10M grams);
    # - the gram ARRAY must stay inline in the generator: pre-projecting
    #   it as a column materializes UnsafeArrayData per doc before the
    #   explode unpacks it again (12 s vs 6 s).
    pre = df.select(
        F.col(id_col).alias("id"), train_label.alias("tl"), text_col
    )
    docg = (
        pre.select("id", "tl", F.explode(_char_trigrams(text_col)).alias("g"))
        .select("id", "tl", _gram_bucket(F.col("g"), n_features).alias("bucket"))
        .groupBy("id", "tl", "bucket")
        .agg(F.count(F.lit(1)).alias("tf"))
        # one barrier feeds the model leg (via broadcast build) and the
        # score leg — the corpus pass runs once
        .localCheckpoint(eager=False)
    )
    model = (
        docg.filter(F.col("tl").isNotNull())
        .groupBy(F.col("tl").alias("lang"), "bucket")
        .agg(F.sum("tf").cast("long").alias("c"))
    )
    total = F.sum("c").over(Window.partitionBy("lang"))
    model = model.select(
        "lang", "bucket", "c", total.cast("long").alias("total")
    )
    per = (
        docg.join(F.broadcast(model), "bucket")
        .groupBy("id", "lang")
        .agg(
            F.sum(F.col("tf") * F.col("c")).cast("long").alias("num"),
            F.max("total").alias("total"),  # constant within the group
        )
        .select(
            "id",
            "lang",
            (F.col("num").cast("double") / F.col("total").cast("double")).alias(
                "sc"
            ),
        )
    )
    sh = F.coalesce(F.sum(F.when(F.col("lang") == "high", F.col("sc"))), F.lit(0.0))
    sl = F.coalesce(F.sum(F.when(F.col("lang") == "low", F.col("sc"))), F.lit(0.0))
    return (
        per.groupBy("id")
        .agg(sh.alias("sh"), sl.alias("sl"))
        .select(
            "id",
            F.round("sl", 6).alias("q_low"),
            F.round("sh", 6).alias("q_high"),
            F.round(F.col("sh") / (F.col("sh") + F.col("sl")), 6).alias(
                "quality"
            ),
            F.when(F.col("sh") >= F.col("sl"), F.lit("high"))
            .otherwise(F.lit("low"))
            .alias("pred_label"),
        )
    )
