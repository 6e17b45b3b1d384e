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
