"""Contract entries for operators/textquality.py (repetition rules +
benchmark decontamination). Oracles rebuild the token/bigram pipeline
in DuckDB list-lambda SQL; all comparisons are exact-int or one final
double division (see contract.py module doc for the equality rules).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from poc_spark.contract import _t, register
from poc_spark.operators.textquality import decontaminate, repetition_stats

# DuckDB token list shared by both oracles: whitespace split, empties out
_TOKS = (
    "SELECT doc_id, list_filter(string_split_regex(text, '\\s+'),"
    " t -> t <> '') AS t FROM documents"
)


@register(
    "text_repetition",
    f"""
    WITH toks AS ({_TOKS}),
    base AS (
      SELECT doc_id, len(t)::BIGINT AS n_tokens,
             len(list_distinct(t))::BIGINT AS n_vocab, t
      FROM toks
    ),
    grams AS (
      SELECT doc_id, t[i] || ' ' || t[i+1] AS g
      FROM base, LATERAL (SELECT unnest(generate_series(1, len(t) - 1)) AS i) s
      WHERE len(t) >= 2
    ),
    gc AS (SELECT doc_id, g, count(*) AS c FROM grams GROUP BY doc_id, g),
    agg AS (SELECT doc_id, max(c) AS max_c, sum(c)::BIGINT AS n_grams
            FROM gc GROUP BY doc_id)
    SELECT b.doc_id, b.n_tokens,
           CAST(b.n_tokens - b.n_vocab AS DOUBLE)
             / greatest(b.n_tokens, 1) AS dup_token_frac,
           CAST(COALESCE(a.max_c, 0) AS DOUBLE)
             / greatest(COALESCE(a.n_grams, 0), 1) AS top_bigram_frac,
           (CAST(b.n_tokens - b.n_vocab AS DOUBLE) / greatest(b.n_tokens, 1) > 0.6
            OR (CAST(COALESCE(a.max_c, 0) AS DOUBLE)
                  / greatest(COALESCE(a.n_grams, 0), 1) > 0.18
                AND b.n_tokens >= 20)) AS repetitive
    FROM base b LEFT JOIN agg a USING (doc_id)
    """,
)
def text_repetition(spark, sf_dir):
    """Gopher-style repetition profile over every document."""
    return repetition_stats(_t(spark, sf_dir, "documents"))


@register(
    "text_decontaminate",
    f"""
    WITH toks AS ({_TOKS}),
    g AS (
      SELECT doc_id,
             t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' '
                  || t[i+3] || ' ' || t[i+4] AS gram
      FROM toks, LATERAL (SELECT unnest(generate_series(1, len(t) - 4)) AS i) s
      WHERE len(t) >= 5
    ),
    gd AS (SELECT DISTINCT doc_id, gram FROM g),
    bench AS (SELECT DISTINCT gram FROM gd WHERE doc_id % 97 = 0),
    train_ids AS (SELECT doc_id FROM documents WHERE doc_id % 97 <> 0),
    hits AS (
      SELECT DISTINCT doc_id FROM gd
      WHERE doc_id % 97 <> 0 AND gram IN (SELECT gram FROM bench)
    )
    SELECT t.doc_id, (h.doc_id IS NOT NULL) AS contaminated
    FROM train_ids t LEFT JOIN hits h USING (doc_id)
    """,
)
def text_decontaminate(spark, sf_dir):
    """5-gram decontamination of the corpus against a deterministic
    pseudo-benchmark (every 97th doc stands in for the eval set)."""
    docs = _t(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 97 == 0)
    train = docs.filter(F.col("doc_id") % 97 != 0)
    return decontaminate(train, bench, n=5)


@register(
    "text_quality_classifier",
    """
    WITH base AS (
      SELECT doc_id, lower(text) AS t,
             len(list_distinct(list_filter(string_split_regex(text, '\\s+'),
                                           x -> x <> '')))::DOUBLE
               / greatest(len(list_filter(string_split_regex(text, '\\s+'),
                                          x -> x <> '')), 1) AS ratio
      FROM documents
    ),
    split AS (
      SELECT doc_id, t,
             CASE WHEN ratio <= 0.40 THEN 'low'
                  WHEN ratio >= 0.60 THEN 'high' END AS label,
             ('0x' || substr(md5(t || ':qcsplit'), 1, 15))::BIGINT % 4 AS s
      FROM base
    ),
    tg AS (
      SELECT label AS lang,
             ('0x' || substr(md5(g.gram || ':lid'), 1, 15))::BIGINT % 4096
               AS bucket
      FROM split,
           UNNEST(CASE WHEN length(t) >= 3
                  THEN list_transform(range(1, length(t) - 1),
                                      i -> substr(t, i, 3))
                  ELSE [] END) AS g(gram)
      WHERE s < 3 AND label IS NOT NULL
    ),
    model AS (
      SELECT lang, bucket, count(*)::BIGINT AS c FROM tg
      GROUP BY lang, bucket
    ),
    totals AS (SELECT lang, sum(c)::BIGINT AS total FROM model GROUP BY lang),
    dg AS (
      SELECT doc_id,
             ('0x' || substr(md5(g.gram || ':lid'), 1, 15))::BIGINT % 4096
               AS bucket
      FROM split,
           UNNEST(CASE WHEN length(t) >= 3
                  THEN list_transform(range(1, length(t) - 1),
                                      i -> substr(t, i, 3))
                  ELSE [] END) AS g(gram)
      WHERE s = 3
    ),
    docg AS (
      SELECT doc_id, bucket, count(*)::BIGINT AS tf FROM dg
      GROUP BY doc_id, bucket
    ),
    per AS (
      SELECT d.doc_id, m.lang,
             sum(d.tf * m.c)::BIGINT::DOUBLE / max(tt.total)::DOUBLE AS sc
      FROM docg d
      JOIN model m USING (bucket)
      JOIN totals tt ON m.lang = tt.lang
      GROUP BY d.doc_id, m.lang
    ),
    piv AS (
      SELECT doc_id,
             coalesce(sum(CASE WHEN lang = 'high' THEN sc END), 0.0) AS sh,
             coalesce(sum(CASE WHEN lang = 'low' THEN sc END), 0.0) AS sl
      FROM per GROUP BY doc_id
    )
    SELECT doc_id, round(sl, 6) AS q_low, round(sh, 6) AS q_high,
           round(sh / (sh + sl), 6) AS quality,
           CASE WHEN sh >= sl THEN 'high' ELSE 'low' END AS pred_label
    FROM piv
    """,
)
def text_quality_classifier(spark, sf_dir):
    """TRAINED quality classifier (r11 VERDICT #5 — the CCNet/fastText
    quality-filtering stage, the one standard pretraining step that had
    no trained form; operators/textquality.py quality_weak_labels +
    quality_classifier_score, trainer shared with the langid classifier
    textstats.py langid_ngram_train): weak labels from the fixed-
    threshold distinct-token-ratio rule (<= 0.40 'low' spam, >= 0.60
    'high', middle band abstains), a leakage-safe content-addressed 3/4
    split trains per-(label, hashed char-trigram bucket) counts, and
    the held-out quarter — ALL its docs, labeled or not — is scored
    s_class = Σ tf·c / total with quality = s_high / (s_high + s_low).
    The ENTIRE weak-label + train + apply chain replays relationally in
    the oracle, so the model the SQL builds must equal Spark's bucket
    for bucket. Model <= 2 x 4096 rows (broadcast at apply; corpus work
    is two map-side-combining hash aggs) — the 100 TB shape. HONESTY:
    on the synthetic corpus the weak-label signal IS the distinct-ratio
    rule; QUALITY_RECALL.json measures real generalization on planted
    degenerate/clean docs the rule never labeled."""
    from poc_spark.operators.textstats import langid_ngram_train
    from poc_spark.operators.textquality import (
        quality_classifier_score,
        quality_weak_labels,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    labels = quality_weak_labels(docs)
    s = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lower("text"), F.lit(":qcsplit"))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
        F.lit(4),
    )
    split = docs.join(labels.select("doc_id", "label"), "doc_id").withColumn(
        "s", s
    )
    train = split.filter("s < 3 AND label IS NOT NULL").withColumnRenamed(
        "label", "lang"
    )
    model = langid_ngram_train(train)
    preds = quality_classifier_score(split.filter("s = 3"), model)
    return preds.select(
        F.col("id").alias("doc_id"), "q_low", "q_high", "quality",
        "pred_label",
    )


@register(
    "pipeline_quality_filter",
    """
    WITH base AS (
      SELECT doc_id, lang, lower(text) AS t,
             md5(lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp,
             len(list_distinct(list_filter(string_split_regex(text, '\\s+'),
                                           x -> x <> '')))::DOUBLE
               / greatest(len(list_filter(string_split_regex(text, '\\s+'),
                                          x -> x <> '')), 1) AS ratio
      FROM documents
    ),
    split AS (
      SELECT doc_id, lang, t, fp,
             CASE WHEN ratio <= 0.40 THEN 'low'
                  WHEN ratio >= 0.60 THEN 'high' END AS label,
             ('0x' || substr(md5(t || ':qcsplit'), 1, 15))::BIGINT % 4 AS s
      FROM base
    ),
    tg AS (
      SELECT label AS clz,
             ('0x' || substr(md5(g.gram || ':lid'), 1, 15))::BIGINT % 4096
               AS bucket
      FROM split,
           UNNEST(CASE WHEN length(t) >= 3
                  THEN list_transform(range(1, length(t) - 1),
                                      i -> substr(t, i, 3))
                  ELSE [] END) AS g(gram)
      WHERE s < 3 AND label IS NOT NULL
    ),
    model AS (
      SELECT clz, bucket, count(*)::BIGINT AS c FROM tg GROUP BY clz, bucket
    ),
    totals AS (SELECT clz, sum(c)::BIGINT AS total FROM model GROUP BY clz),
    dg AS (
      SELECT doc_id,
             ('0x' || substr(md5(g.gram || ':lid'), 1, 15))::BIGINT % 4096
               AS bucket
      FROM split,
           UNNEST(CASE WHEN length(t) >= 3
                  THEN list_transform(range(1, length(t) - 1),
                                      i -> substr(t, i, 3))
                  ELSE [] END) AS g(gram)
    ),
    docg AS (
      SELECT doc_id, bucket, count(*)::BIGINT AS tf FROM dg
      GROUP BY doc_id, bucket
    ),
    per AS (
      SELECT d.doc_id, m.clz,
             sum(d.tf * m.c)::BIGINT::DOUBLE / max(tt.total)::DOUBLE AS sc
      FROM docg d
      JOIN model m USING (bucket)
      JOIN totals tt ON m.clz = tt.clz
      GROUP BY d.doc_id, m.clz
    ),
    piv AS (
      SELECT doc_id,
             coalesce(sum(CASE WHEN clz = 'high' THEN sc END), 0.0) AS sh,
             coalesce(sum(CASE WHEN clz = 'low' THEN sc END), 0.0) AS sl
      FROM per GROUP BY doc_id
    ),
    kept AS (
      SELECT doc_id FROM piv WHERE round(sh / (sh + sl), 6) >= 0.5
    ),
    surv AS (
      SELECT min(b.doc_id) AS doc_id
      FROM base b JOIN kept k USING (doc_id)
      GROUP BY b.fp
    )
    SELECT b.lang,
           count(*)::BIGINT AS n_total,
           count(k.doc_id)::BIGINT AS n_quality_kept,
           count(sv.doc_id)::BIGINT AS n_final
    FROM base b
    LEFT JOIN kept k USING (doc_id)
    LEFT JOIN surv sv USING (doc_id)
    GROUP BY b.lang
    """,
)
def pipeline_quality_filter(spark, sf_dir):
    """The trained quality classifier AS A PIPELINE STAGE — the CCNet
    corpus-filtering composition: weak-label + train (identical chain
    to text_quality_classifier), score the ENTIRE corpus, keep docs
    with quality >= 0.5, exact-dedup the survivors on the normalized
    md5 fingerprint (min doc_id survives per group), and report the
    funnel per lang: (lang, n_total, n_quality_kept, n_final). Every
    stage — model, scores, threshold, dedup rank — replays relationally
    in the oracle. Scale shape: the classifier's broadcast-model aggs +
    one fingerprint hash agg; no corpus-vs-corpus shuffle anywhere."""
    from poc_spark.operators.textstats import fingerprints
    from poc_spark.operators.textquality import (
        quality_classifier_train_score,
        weak_label_col,
    )

    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    s = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lower("text"), F.lit(":qcsplit"))), 1, 15
            ),
            16,
            10,
        ).cast("long"),
        F.lit(4),
    )
    # FUSED train+score (r14 opt, guide §2.4 — share one pass): this
    # entry trains on the s<3 weak-labeled split and scores the ENTIRE
    # corpus, so the un-fused weak-label-join → train-explode →
    # score-explode chain paid the corpus gram pass ~1.75×. The train
    # label is a pure COLUMN of the doc (weak label where s<3), so it
    # rides the scorer's (id, bucket) tf aggregate and the model is a
    # model-sized reduction of that — values bit-identical (integer
    # sums; the oracle's tg/model/dg/docg chain is unchanged).
    label = weak_label_col(F.col("text"))
    tl = F.when((s < 3) & label.isNotNull(), label)
    scored = quality_classifier_train_score(docs, tl)
    # barrier: `kept` feeds TWO plan legs (the fingerprint leftsemi and
    # the report's left join) — without it the entire weak-label +
    # train + score chain (the two corpus-sized trigram explodes) is
    # planned and EXECUTED once per leg. The checkpointed frame is a
    # doc_id list, KBs. (Guide §2.4 / the repo's multi-leg-recompute
    # discipline, same as mm_phash / image_dedup_survivors.)
    kept = scored.filter(F.col("quality") >= 0.5).select(
        F.col("id").alias("doc_id")
    ).localCheckpoint(eager=False)
    fps = fingerprints(docs)
    surv = (
        fps.join(kept, "doc_id", "leftsemi")
        .groupBy("fp")
        .agg(F.min("doc_id").alias("doc_id"))
        .select("doc_id")
    )
    return (
        docs.select("doc_id", "lang")
        .join(kept.withColumn("_q", F.lit(1)), "doc_id", "left")
        .join(surv.withColumn("_s", F.lit(1)), "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.count("_q").alias("n_quality_kept"),
            F.count("_s").alias("n_final"),
        )
    )


@register(
    "text_doc_packing",
    """
    WITH t AS (
      SELECT doc_id,
             len(list_filter(string_split_regex(lower(text), '\\s+'),
                             x -> len(x) > 0))::BIGINT AS n_toks
      FROM documents
    ),
    c AS (
      SELECT doc_id, n_toks,
             SUM(n_toks) OVER (ORDER BY doc_id
                               ROWS UNBOUNDED PRECEDING) - n_toks
               AS cum_before
      FROM t
    ),
    p AS (SELECT doc_id, n_toks,
               (cum_before::BIGINT // 256)::BIGINT AS seq_id FROM c)
    SELECT seq_id, count(*)::BIGINT AS n_docs,
           sum(n_toks)::BIGINT AS n_tokens,
           min(doc_id) AS min_doc, max(doc_id) AS max_doc,
           round(sum(n_toks)::DOUBLE / 256.0, 6) AS fill_ratio
    FROM p GROUP BY seq_id
    """,
)
def text_doc_packing(spark, sf_dir):
    """SEQUENCE PACKING for pretraining (textstats.pack_documents_
    greedy): docs concatenate in doc_id order, each assigned wholly to
    the 256-token sequence its first token lands in (pack-until-
    overflow). The Spark plan is the TWO-PASS distributed prefix sum —
    per-chunk totals to the driver (n_chunks rows), parallel per-chunk
    local cumsums plus literal offsets — never a global-order window;
    the oracle's single global window proves the chunked plan equal
    (the chunk count is a pure parallelism knob, the result is
    identical for any contiguous chunking). Exact LONG arithmetic;
    fill_ratio is one double division by the constant."""
    from poc_spark.operators.textstats import pack_documents_greedy

    return pack_documents_greedy(
        _t(spark, sf_dir, "documents"), seq_len=256, n_chunks=8
    )
