"""Full-text retrieval primitives over the documents corpus (training
data pipelines need them for query-based corpus curation and eval-set
mining; the reference's only text search is the message-substring
filter, /root/reference/backend/main.py:297 — these are the engine-side
generalization).

Relational design: the inverted index IS a DataFrame (term, doc_id, tf)
— posting lists are rows, so building it is one explode + one hash
aggregate, querying it is a semi-join + group-filter, and every
downstream engine feature (partition pruning on term, broadcast of tiny
query termsets, AQE) applies for free. BM25 scoring folds per-document
term contributions in sorted term order (the ordered-fold discipline
shared with char_entropy / pagerank oracles) so the summed doubles are
bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from poc_spark.operators.textstats import _tokens


def build_postings(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(term, doc_id, tf) — the inverted index in relational form.
    One explode + one hash aggregate; at scale, write partitioned by
    a term hash bucket so a query's terms prune to a few partitions."""
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    return toks.groupBy("term", "doc_id").agg(F.count(F.lit(1)).alias("tf"))


def conjunctive_search(
    df: DataFrame,
    terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, matched_terms, total_tf) for documents containing ALL
    query terms — boolean AND retrieval over the posting lists.

    Plan: filter the postings to the (tiny, literal) query termset —
    Catalyst pushes the IN filter into the scan — then one group-filter
    on the match count. No join against the full index is ever needed;
    the termset filter is the posting-list lookup.

    AND semantics are over the DISTINCT termset: postings contribute
    one row per distinct term per doc, so a duplicated query term must
    not inflate the required match count (it would make the predicate
    unsatisfiable and silently return nothing) — the query is deduped
    up front, order-preserving."""
    if not terms:
        raise ValueError("conjunctive_search needs at least one term")
    terms = tuple(dict.fromkeys(terms))
    postings = build_postings(df, text_col, id_col)
    hits = postings.filter(F.col("term").isin(*terms))
    return (
        hits.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("matched_terms"),
            F.sum("tf").alias("total_tf"),
        )
        .filter(F.col("matched_terms") == len(terms))
    )


def bm25_topk(
    df: DataFrame,
    terms: tuple[str, ...],
    k: int = 15,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, score) — BM25 top-k for a bag-of-words query (Lucene's
    idf form: ln(1 + (N - df + 0.5)/(df + 0.5))).

    Determinism: tf / dl / df / N / T are exact integers; avgdl is one
    int/int double division; each term's contribution is a fixed double
    expression over those; the per-document sum folds in sorted term
    order (array_sort + aggregate HOF) so the total is bit-identical to
    the oracle's list_reduce. Score is rounded to 6dp BEFORE the top-k
    ordering, with doc_id as the total tie-break.

    Scale shape: corpus stats (N, T) ride as a broadcast 1-row
    aggregate; the query termset filter prunes the postings scan; the
    only wide exchange is the per-document regroup of <= |terms| rows
    per doc."""
    if not terms:
        raise ValueError("bm25_topk needs at least one term")
    toks = df.select(
        F.col(id_col).alias("doc_id"),
        F.explode(_tokens(F.col(text_col))).alias("term"),
    )
    dl = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("dl"))
    tf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    corpus = df.agg(F.count(F.lit(1)).alias("n_docs")).crossJoin(
        toks.agg(F.count(F.lit(1)).alias("n_tokens"))
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(corpus))
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("n_docs").cast("double") - F.col("df").cast("double") + F.lit(0.5))
        / (F.col("df").cast("double") + F.lit(0.5))
    )
    avgdl = F.col("n_tokens").cast("double") / F.col("n_docs").cast("double")
    tf_d = F.col("tf").cast("double")
    contrib = idf * (
        tf_d
        * F.lit(k1 + 1.0)
        / (tf_d + F.lit(k1) * (F.lit(1.0 - b) + F.lit(b) * F.col("dl").cast("double") / avgdl))
    )
    per_term = scored.select("doc_id", "term", contrib.alias("s"))
    folded = per_term.groupBy("doc_id").agg(
        F.round(
            F.aggregate(
                F.array_sort(F.collect_list(F.struct("term", "s"))),
                F.lit(0.0),
                lambda acc, x: acc + x["s"],
            ),
            6,
        ).alias("score")
    )
    return folded.orderBy(F.desc("score"), "doc_id").limit(k)
