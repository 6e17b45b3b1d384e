"""Contract entries for the retrieval / link-prediction / statistical
analytics tier (round-11 extensions): inverted-index search and BM25
ranking over `documents`, Adamic-Adar link prediction and local
clustering coefficients over the interaction graph, an exact-decimal
Pearson correlation matrix, RFM customer segmentation, and PMI
collocation mining.

Equality discipline (see contract.py module doc): every float output is
one of (a) a single fixed expression over exact integers/decimals
(corr, PMI, clustering coefficient), (b) an ordered fold of such
expressions over a SMALL group (BM25 — sorted-struct aggregate HOF on
the Spark side, `list(expr ORDER BY key)` + list_reduce on the DuckDB
side), or (c) an order-free exact sum of QUANTIZED contributions
(Adamic-Adar's picounit longs, the JSD's round-12 decimals) when the
group is unbounded — partial aggregation stays available and both
engines' hash aggregates agree exactly. Rounded to 6dp before any
ORDER BY that consumes the value.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from poc_spark.contract import (
    _EDGES_CTE,
    EVENT_ORDER,
    _content_agg,
    _export_path,
    _overlap,
    _stream_shuffle,
    _t,
    register,
)
from poc_spark.operators.graph import adamic_adar, clustering_coefficient
from poc_spark.operators.network import lag_edges
from poc_spark.operators.search import bm25_topk, conjunctive_search


def _assert_insert_offset_free(docs, entry: str, offset: int = 100000) -> None:
    """The change-feed / IVM entries synthesize INSERT keys as
    doc_id + 100000 and guard their DELETEs with doc_id < 100000 in the
    oracle. If documents ever carried doc_id >= 100000 (a larger scale
    factor), inserts would COLLIDE with existing rows (silently becoming
    upserts) and Spark's matched-delete would diverge from the oracle's
    guarded delete — a data-dependent oracle mismatch. Fail loudly
    instead (r12 ADVICE); 1-row scalar."""
    max_id = docs.agg(F.max("doc_id")).first()[0]
    if max_id is not None and max_id >= offset:
        raise RuntimeError(
            f"{entry}: insert offset {offset} collides with existing "
            f"doc_id range (max={max_id}); raise the offset in BOTH the "
            "entry and its oracle before running at this scale"
        )

# DuckDB token pipeline shared by the retrieval oracles — identical to
# the text_tfidf oracle's tokenizer (lowercase, whitespace split, empties
# dropped) so the index the oracle builds matches textstats._tokens.
_TOK = (
    "SELECT doc_id, unnest(list_filter(string_split_regex(lower(text), "
    "'\\s+'), x -> len(x) > 0)) AS term FROM documents"
)

_QUERY4 = ("merge", "spark", "stream", "vector")
_QUERY3 = ("merge", "spark", "vector")


@register(
    "text_inverted_index",
    f"""
    WITH tok AS ({_TOK}),
    tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
      WHERE term IN ('merge', 'spark', 'stream', 'vector')
      GROUP BY 1, 2
    )
    SELECT doc_id, count(*)::BIGINT AS matched_terms,
           sum(tf)::BIGINT AS total_tf
    FROM tf GROUP BY doc_id HAVING count(*) = 4
    """,
)
def text_inverted_index(spark, sf_dir):
    """Boolean AND retrieval over relational posting lists: documents
    containing ALL four query terms, with match count and summed term
    frequency. The index is (term, doc_id, tf) rows — build is one
    explode + hash aggregate, lookup is a pushed-down IN filter (no
    join against the full index). Extension of the reference's
    substring message filter (backend/main.py:297) to indexed
    multi-term retrieval."""
    return conjunctive_search(_t(spark, sf_dir, "documents"), _QUERY4)


@register(
    "text_bm25_topk",
    f"""
    WITH tok AS ({_TOK}),
    dl AS (SELECT doc_id, count(*)::BIGINT AS dl FROM tok GROUP BY 1),
    tf AS (
      SELECT doc_id, term, count(*)::BIGINT AS tf FROM tok
      WHERE term IN ('merge', 'spark', 'vector')
      GROUP BY 1, 2
    ),
    dfreq AS (SELECT term, count(*)::BIGINT AS df FROM tf GROUP BY 1),
    corpus AS (
      SELECT (SELECT count(*) FROM documents)::BIGINT AS n_docs,
             (SELECT count(*) FROM tok)::BIGINT AS n_tokens
    ),
    per AS (
      SELECT t.doc_id, t.term,
             ln(1.0 + (c.n_docs::DOUBLE - f.df::DOUBLE + 0.5)
                      / (f.df::DOUBLE + 0.5))
             * (t.tf::DOUBLE * (1.2 + 1.0)
                / (t.tf::DOUBLE
                   + 1.2 * (0.25 + 0.75 * d.dl::DOUBLE
                            / (c.n_tokens::DOUBLE / c.n_docs::DOUBLE)))) AS s
      FROM tf t JOIN dfreq f USING (term) JOIN dl d USING (doc_id), corpus c
    ),
    folded AS (
      SELECT doc_id,
             round(list_reduce(list_prepend(0.0, list(s ORDER BY term)),
                               (a, b) -> a + b), 6) AS score
      FROM per GROUP BY doc_id
    )
    SELECT doc_id, score FROM folded ORDER BY score DESC, doc_id LIMIT 15
    """,
)
def text_bm25_topk(spark, sf_dir):
    """BM25 top-15 for a three-term query (k1=1.2, b=0.75, Lucene idf).
    Corpus stats ride as a broadcast 1-row aggregate; per-document term
    contributions fold in sorted term order so the summed doubles hash
    bit-identically (ordered-fold discipline of text_entropy /
    graph_pagerank); scores round to 6dp before the top-k order."""
    return bm25_topk(_t(spark, sf_dir, "documents"), _QUERY3, k=15)


@register(
    "graph_adamic_adar",
    _EDGES_CTE
    + """
    , deg AS (SELECT src AS z, count(*)::BIGINT AS dz FROM directed GROUP BY 1),
    nbr AS (SELECT src AS z, dst AS n FROM directed),
    pairs AS (
      SELECT a.n AS u, b.n AS v, a.z AS z
      FROM nbr a JOIN nbr b ON a.z = b.z AND a.n < b.n
    ),
    cand AS (
      SELECT p.u, p.v, p.z FROM pairs p
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.source = p.u AND e.target = p.v
      )
    ),
    contrib AS (
      SELECT c.u, c.v,
             CAST(round(1000000000000.0 / ln(d.dz::DOUBLE), 0) AS BIGINT)
               AS cc
      FROM cand c JOIN deg d USING (z)
    ),
    scored AS (
      SELECT u, v,
             round(CAST(sum(cc) AS DOUBLE) / 1000000000000.0, 6) AS score
      FROM contrib GROUP BY u, v
    )
    SELECT u, v, score FROM scored ORDER BY score DESC, u, v LIMIT 20
    """,
)
def graph_adamic_adar(spark, sf_dir):
    """Adamic-Adar link prediction, top-20 non-adjacent pairs: the
    'who should be connected' extension of the reference's interaction
    graph. Candidates come from the shared-neighbor wedge join (never
    all-pairs); per-pair scores are order-free LONG sums of picounit-
    quantized 1/ln(deg z) contributions, so both engines' hash
    aggregates agree bit-for-bit with no per-pair array fold."""
    edges = lag_edges(_t(spark, sf_dir, "events"), "user_id", EVENT_ORDER)
    return adamic_adar(edges, top_k=20)


@register(
    "graph_adamic_adar_capped",
    _EDGES_CTE
    + """
    , deg AS (
      SELECT src AS z, count(*)::BIGINT AS dz FROM directed
      GROUP BY 1 HAVING count(*) <= 90
    ),
    nbr AS (
      SELECT d.z AS z, n.dst AS n FROM directed n JOIN deg d ON n.src = d.z
    ),
    pairs AS (
      SELECT a.n AS u, b.n AS v, a.z AS z
      FROM nbr a JOIN nbr b ON a.z = b.z AND a.n < b.n
    ),
    cand AS (
      SELECT p.u, p.v, p.z FROM pairs p
      WHERE NOT EXISTS (
        SELECT 1 FROM edges e WHERE e.source = p.u AND e.target = p.v
      )
    ),
    contrib AS (
      SELECT c.u, c.v,
             CAST(round(1000000000000.0 / ln(d.dz::DOUBLE), 0) AS BIGINT)
               AS cc
      FROM cand c JOIN deg d USING (z)
    ),
    scored AS (
      SELECT u, v,
             round(CAST(sum(cc) AS DOUBLE) / 1000000000000.0, 6) AS score
      FROM contrib GROUP BY u, v
    )
    SELECT u, v, score FROM scored ORDER BY score DESC, u, v LIMIT 20
    """,
)
def graph_adamic_adar_capped(spark, sf_dir):
    """Adamic-Adar with the production hub-degree cap engaged
    (max_wedge_degree=90 — BINDING at sf0.01, where degrees span
    68–109, so roughly half the z nodes are pruned): z nodes above the
    cap produce no wedges at all. This is the form a 100× power-law
    graph must run — one 10⁶-degree hub otherwise emits ~5·10¹¹ wedge
    rows (operators/graph.py:adamic_adar docstring); the oracle applies
    the identical HAVING cap to its degree CTE, so scores stay
    hash-equal while the plan exercises both the build-side filter and
    the probe-side broadcast semi-join prune."""
    edges = lag_edges(_t(spark, sf_dir, "events"), "user_id", EVENT_ORDER)
    return adamic_adar(edges, top_k=20, max_wedge_degree=90)


@register(
    "graph_cluster_coeff",
    _EDGES_CTE
    + """
    , deg AS (SELECT src AS id, count(*)::BIGINT AS degree FROM directed GROUP BY 1),
    wedge AS (
      SELECT ab.source AS a, ab.target AS b, bc.target AS c
      FROM edges ab JOIN edges bc ON ab.target = bc.source
    ),
    tri AS (
      SELECT w.a, w.b, w.c FROM wedge w
      JOIN edges ac ON ac.source = w.a AND ac.target = w.c
    ),
    members AS (
      SELECT a AS id FROM tri UNION ALL
      SELECT b FROM tri UNION ALL
      SELECT c FROM tri
    ),
    tcnt AS (SELECT id, count(*)::BIGINT AS triangles FROM members GROUP BY id)
    SELECT d.id, d.degree,
           COALESCE(t.triangles, 0)::BIGINT AS triangles,
           CASE WHEN d.degree >= 2
                THEN 2.0 * COALESCE(t.triangles, 0)::DOUBLE
                     / (d.degree::DOUBLE * (d.degree - 1)::DOUBLE)
                ELSE 0.0 END AS clustering_coeff
    FROM deg d LEFT JOIN tcnt t USING (id)
    """,
)
def graph_cluster_coeff(spark, sf_dir):
    """Local clustering coefficient per node — 2T/(d(d-1)), 0.0 below
    degree 2. One int/int double division from exact triangle/degree
    counts; reuses the ordered-wedge triangle join."""
    edges = lag_edges(_t(spark, sf_dir, "events"), "user_id", EVENT_ORDER)
    return clustering_coefficient(edges)


# correlation variables: every numeric lineitem measure
_CORR_VARS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")
_CORR_PAIRS = [
    (a, b) for i, a in enumerate(_CORR_VARS) for b in _CORR_VARS[i + 1 :]
]


def _corr_sql() -> str:
    sums = ["count(*)::BIGINT AS n"]
    for v in _CORR_VARS:
        c = f"CAST({v} AS DECIMAL(18,2))"
        sums.append(f"CAST(sum({c}) AS DOUBLE) AS s_{v}")
        sums.append(f"CAST(sum({c} * {c}) AS DOUBLE) AS ss_{v}")
    for a, b in _CORR_PAIRS:
        ca = f"CAST({a} AS DECIMAL(18,2))"
        cb = f"CAST({b} AS DECIMAL(18,2))"
        sums.append(f"CAST(sum({ca} * {cb}) AS DOUBLE) AS sp_{a}_{b}")
    rows = []
    for a, b in _CORR_PAIRS:
        rows.append(
            f"""
    SELECT '{a}' AS var_x, '{b}' AS var_y, n AS n_rows,
           round((n::DOUBLE * sp_{a}_{b} - s_{a} * s_{b})
                 / (sqrt(n::DOUBLE * ss_{a} - s_{a} * s_{a})
                    * sqrt(n::DOUBLE * ss_{b} - s_{b} * s_{b})), 6) AS corr_r
    FROM agg"""
        )
    return (
        "WITH agg AS (SELECT "
        + ", ".join(sums)
        + " FROM lineitem)"
        + " UNION ALL ".join(rows)
    )


@register("q_corr_matrix", _corr_sql())
def q_corr_matrix(spark, sf_dir):
    """Pearson correlation matrix over the four lineitem measures, in
    ONE scan: all moment sums (Σx, Σx², Σxy) accumulate in exact
    DECIMAL arithmetic — no float-summation-order drift at any
    partition count — and r is a fixed double expression over the
    exact moments, rounded to 6dp. The 6 pairs unpivot from the single
    moment row (driver-free explode)."""
    li = _t(spark, sf_dir, "lineitem")

    def dec(c: str) -> F.Column:
        return F.col(c).cast("decimal(18,2)")

    aggs = [F.count(F.lit(1)).alias("n")]
    for v in _CORR_VARS:
        aggs.append(F.sum(dec(v)).cast("double").alias(f"s_{v}"))
        aggs.append(F.sum(dec(v) * dec(v)).cast("double").alias(f"ss_{v}"))
    for a, b in _CORR_PAIRS:
        aggs.append(F.sum(dec(a) * dec(b)).cast("double").alias(f"sp_{a}_{b}"))
    agg = li.agg(*aggs)

    n_d = F.col("n").cast("double")
    pair_structs = []
    for a, b in _CORR_PAIRS:
        r = F.round(
            (n_d * F.col(f"sp_{a}_{b}") - F.col(f"s_{a}") * F.col(f"s_{b}"))
            / (
                F.sqrt(n_d * F.col(f"ss_{a}") - F.col(f"s_{a}") * F.col(f"s_{a}"))
                * F.sqrt(n_d * F.col(f"ss_{b}") - F.col(f"s_{b}") * F.col(f"s_{b}"))
            ),
            6,
        )
        pair_structs.append(
            F.struct(
                F.lit(a).alias("var_x"),
                F.lit(b).alias("var_y"),
                r.alias("corr_r"),
            )
        )
    return agg.select(
        F.col("n").alias("n_rows"), F.explode(F.array(*pair_structs)).alias("p")
    ).select("p.var_x", "p.var_y", "n_rows", "p.corr_r")


@register(
    "q_rfm_segmentation",
    """
    WITH per AS (
      SELECT o_custkey AS custkey,
             max(o_orderdate) AS last_order_ts,
             count(*)::BIGINT AS frequency,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
               AS monetary
      FROM orders GROUP BY 1
    ),
    scored AS (
      SELECT custkey, last_order_ts, frequency, monetary,
             CAST(ntile(4) OVER (ORDER BY last_order_ts DESC, custkey)
                  AS BIGINT) AS r_score,
             CAST(ntile(4) OVER (ORDER BY frequency DESC, custkey)
                  AS BIGINT) AS f_score,
             CAST(ntile(4) OVER (ORDER BY monetary DESC, custkey)
                  AS BIGINT) AS m_score
      FROM per
    )
    SELECT custkey, last_order_ts, frequency, monetary,
           r_score, f_score, m_score,
           CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS segment
    FROM scored
    """,
)
def q_rfm_segmentation(spark, sf_dir):
    """RFM customer segmentation: per-customer recency / frequency /
    monetary quartiles (ntile 4 over total orders, custkey tie-break —
    deterministic across engines) concatenated into the classic '444'
    segment label. Monetary sums in exact DECIMAL, cast to double once.
    Below ~1M customers the three global windows are one exchange; the
    chunked-ntile dispatch (plans/ntile.py) is the >1M path."""
    from pyspark.sql import Window

    per = (
        _t(spark, sf_dir, "orders")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.max("o_orderdate").alias("last_order_ts"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("monetary"),
        )
    )
    r_w = Window.orderBy(F.desc("last_order_ts"), "custkey")
    f_w = Window.orderBy(F.desc("frequency"), "custkey")
    m_w = Window.orderBy(F.desc("monetary"), "custkey")
    scored = per.select(
        "custkey",
        "last_order_ts",
        "frequency",
        "monetary",
        F.ntile(4).over(r_w).cast("long").alias("r_score"),
        F.ntile(4).over(f_w).cast("long").alias("f_score"),
        F.ntile(4).over(m_w).cast("long").alias("m_score"),
    )
    return scored.withColumn(
        "segment",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ),
    )


@register(
    "text_pmi_collocations",
    f"""
    WITH tok AS ({_TOK}),
    uni AS (SELECT term, count(*)::BIGINT AS c FROM tok GROUP BY 1),
    tot AS (SELECT count(*)::BIGINT AS t FROM tok),
    lists AS (
      SELECT doc_id, list_filter(string_split_regex(lower(text), '\\s+'),
                                 x -> len(x) > 0) AS t
      FROM documents
    ),
    bi AS (
      SELECT t[i] AS x, t[i+1] AS y
      FROM lists, LATERAL (
        SELECT unnest(generate_series(1, len(t) - 1)) AS i
      ) s
      WHERE len(t) >= 2
    ),
    bc AS (SELECT x, y, count(*)::BIGINT AS c_xy FROM bi GROUP BY 1, 2),
    btot AS (SELECT count(*)::BIGINT AS b FROM bi),
    pmi AS (
      SELECT bc.x, bc.y, bc.c_xy,
             round(ln((bc.c_xy::DOUBLE / btot.b::DOUBLE)
                      * (tot.t::DOUBLE / ux.c::DOUBLE)
                      * (tot.t::DOUBLE / uy.c::DOUBLE)), 6) AS pmi
      FROM bc
      JOIN uni ux ON ux.term = bc.x
      JOIN uni uy ON uy.term = bc.y, tot, btot
      WHERE bc.c_xy >= 5
    )
    SELECT x, y, c_xy, pmi FROM pmi ORDER BY pmi DESC, x, y LIMIT 20
    """,
)
def text_pmi_collocations(spark, sf_dir):
    """PMI collocation mining: top-20 bigrams by pointwise mutual
    information ln(p(xy)/(p(x)p(y))), count floor 5 (the phrase-mining
    primitive for tokenizer/vocab curation). All counts exact ints; the
    PMI is one fixed double expression, rounded before the top-k order.
    Scale shape: two hash aggregates (unigrams, bigrams) + two joins of
    the bigram table against the Zipf-bounded unigram table."""
    docs = _t(spark, sf_dir, "documents")
    from poc_spark.operators.textstats import _tokens

    lists = docs.select(_tokens(F.col("text")).alias("t")).filter(
        F.size("t") >= 2
    )
    bi = lists.select(
        F.explode(
            F.zip_with(
                F.slice(F.col("t"), 1, F.size("t") - 1),
                F.slice(F.col("t"), 2, F.size("t") - 1),
                lambda a, b: F.struct(a.alias("x"), b.alias("y")),
            )
        ).alias("p")
    ).select(F.col("p.x").alias("x"), F.col("p.y").alias("y"))
    toks = docs.select(F.explode(_tokens(F.col("text"))).alias("term"))
    uni = toks.groupBy("term").agg(F.count(F.lit(1)).alias("c"))
    tot = toks.agg(F.count(F.lit(1)).alias("t_total"))
    bc = (
        bi.groupBy("x", "y")
        .agg(F.count(F.lit(1)).alias("c_xy"))
        .filter(F.col("c_xy") >= 5)
    )
    btot = bi.agg(F.count(F.lit(1)).alias("b_total"))
    ux = uni.select(F.col("term").alias("x"), F.col("c").alias("cx"))
    uy = uni.select(F.col("term").alias("y"), F.col("c").alias("cy"))
    scored = (
        bc.join(ux, "x")
        .join(uy, "y")
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(btot))
        .select(
            "x",
            "y",
            "c_xy",
            F.round(
                F.log(
                    (F.col("c_xy").cast("double") / F.col("b_total").cast("double"))
                    * (F.col("t_total").cast("double") / F.col("cx").cast("double"))
                    * (F.col("t_total").cast("double") / F.col("cy").cast("double"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.desc("pmi"), "x", "y").limit(20)


@register(
    "lake_merge_full",
    """
    WITH mx AS (SELECT max(doc_id) AS m FROM documents),
    src_upd AS (
      SELECT doc_id, text || ' upd' AS text, lang, source,
             n_chars + 8 AS n_chars
      FROM documents WHERE doc_id % 7 = 0 AND doc_id % 11 <> 0
    ),
    src_del AS (
      SELECT doc_id FROM documents WHERE doc_id % 11 = 0
    ),
    src_ins AS (
      SELECT doc_id + mx.m + 1 AS doc_id,
             'full doc ' || doc_id::VARCHAR AS text,
             'xx' AS lang, 'synthetic' AS source,
             length('full doc ' || doc_id::VARCHAR)::BIGINT AS n_chars
      FROM documents, mx WHERE doc_id < 10
    ),
    src_all AS (
      SELECT doc_id FROM src_upd UNION ALL SELECT doc_id FROM src_del
      UNION ALL SELECT doc_id FROM src_ins
    ),
    merged AS (
      SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
      FROM documents d
      WHERE d.doc_id NOT IN (SELECT doc_id FROM src_all)
        AND d.lang <> 'fr'
      UNION ALL SELECT * FROM src_upd
      UNION ALL SELECT * FROM src_ins
    )
    SELECT lang, source,
           count(*) AS n_docs,
           sum(n_chars)::BIGINT AS sum_chars,
           sum(('0x' || substr(md5(text), 1, 10))::BIGINT)::BIGINT
             AS content_sum
    FROM merged GROUP BY lang, source
    """,
)
def lake_merge_full(spark, sf_dir):
    """Full tri-clause MERGE (sources/lake.py merge_full_partitioned)
    exercising all four clauses in ONE commit on a fresh hive tree:
    matched UPDATE (doc_id % 7, text suffixed), matched conditional
    DELETE (doc_id % 11, tombstone predicate n_chars < 0 — keys
    divisible by both take the update branch because the source
    excludes them from the update set), NOT MATCHED INSERT (10 new
    docs into a new lang=xx partition), and NOT MATCHED BY SOURCE
    DELETE scoped to the lang=fr partition (unmatched fr rows vanish;
    unmatched rows elsewhere survive). The merged tree is read back
    through the version pointer and content-aggregated; the oracle
    replays the same four-clause outcome relationally from the base
    table, so clause precedence — delete beats update beats carry,
    scope bounds the by-source clause — is value-checked, not just
    row-counted."""
    from poc_spark.sources.lake import (
        merge_full_partitioned,
        read_snapshot,
        write_partitioned,
    )

    docs = _t(spark, sf_dir, "documents")
    root = _export_path("mergefull", sf_dir)
    # fresh base every run (stale-artifact rule all sink entries follow)
    write_partitioned(docs, root, ["lang"])
    max_id = docs.agg(F.max("doc_id")).collect()[0][0]
    upd = docs.filter("doc_id % 7 = 0 AND doc_id % 11 <> 0").select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" upd")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + F.lit(8)).alias("n_chars"),
    )
    dele = docs.filter("doc_id % 11 = 0").select(
        "doc_id",
        "text",
        "lang",
        "source",
        F.lit(-1).cast("long").alias("n_chars"),  # tombstone marker
    )
    new_text = F.concat(F.lit("full doc "), F.col("doc_id").cast("string"))
    ins = docs.filter("doc_id < 10").select(
        (F.col("doc_id") + F.lit(max_id + 1)).alias("doc_id"),
        new_text.alias("text"),
        F.lit("xx").alias("lang"),
        F.lit("synthetic").alias("source"),
        F.length(new_text).cast("long").alias("n_chars"),
    )
    merge_full_partitioned(
        spark,
        root,
        upd.unionByName(dele).unionByName(ins),
        "doc_id",
        "lang",
        matched_delete=F.col("n_chars") < 0,
        unmatched_source_delete=True,
        scope_partitions=["fr"],
    )
    return _content_agg(read_snapshot(spark, root), "lang", "source")


@register(
    "stream_outer_join",
    """
    WITH i AS (
      SELECT user_id AS ad_id, ts AS imp_ts
      FROM events WHERE event_type = 'view'
    ),
    c AS (
      SELECT user_id AS ad_id, ts AS click_ts
      FROM events WHERE event_type = 'click'
    ),
    p AS (
      SELECT i.ad_id, i.imp_ts, c.click_ts
      FROM i LEFT JOIN c
        ON c.ad_id = i.ad_id
       AND c.click_ts >= i.imp_ts
       AND c.click_ts <= i.imp_ts + INTERVAL 24 HOURS
    )
    SELECT ad_id,
           count(*)::BIGINT AS n_rows,
           count(click_ts)::BIGINT AS n_matched,
           coalesce(sum(epoch_us(click_ts) - epoch_us(imp_ts)), 0)::BIGINT
             AS sum_delta_us
    FROM p GROUP BY ad_id
    """,
)
def stream_outer_join(spark, sf_dir):
    """LEFT OUTER stream-stream join in-gate (streaming/joins.py
    attribute_clicks_outer): impressions that never convert must emit
    a NULL-click row — and that emission only happens when the
    watermark passes the impression's join window, i.e. it RIDES state
    eviction. Three staged landing files drain as three micro-batches
    (maxFilesPerTrigger=1, mtime-ordered): (1) the real view/click
    events — inner matches emit here; (2) sentinel rows 100 days ahead
    advancing both watermarks past every real impression's window;
    (3) a second sentinel batch, because the advanced watermark reaches
    the eviction/emission machinery one batch late (the measured
    propagation lag stream_watermark_eviction documents). The entry
    fails loudly unless >= 3 data batches ran AND at least one real
    NULL-click outer row actually emitted — so it can never silently
    degrade into an inner join. Sentinels carry negative ad_ids and are
    filtered before the rollup; the far-future sentinel impression
    itself stays un-evicted (its window end is beyond the final
    watermark), so it never reaches the sink. Oracle: the relational
    LEFT JOIN over the real events — n_rows counts matched pairs plus
    one null row per unconverted impression, exactly the streaming
    outer contract."""
    import glob as _glob
    import shutil as _shutil
    import time as _time
    import uuid

    from poc_spark.streaming.joins import attribute_clicks_outer

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type").isin("view", "click"))
        .select(
            "event_type",
            F.col("user_id").alias("ad_id"),
            F.expr(
                "timestamp_micros(timestampdiff(MICROSECOND, "
                "TIMESTAMP_NTZ '1970-01-01 00:00:00', ts))"
            ).alias("ts"),
        )
    )
    # ONE scan of events for the whole staging (r11 verdict nit)
    ev = ev.persist()
    max_row = ev.agg(F.max("ts").alias("mx")).collect()[0]  # 1-row scalar
    max_us = int(max_row["mx"].timestamp() * 1_000_000)
    staged = _export_path("stream_outer_src", sf_dir)
    _shutil.rmtree(staged, ignore_errors=True)
    os.makedirs(staged, exist_ok=True)

    def _stage(df, name: str, mtime: float) -> None:
        tmp = os.path.join(staged, name + ".stage")
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        part = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(staged, name)
        os.replace(part, dest)
        _shutil.rmtree(tmp)
        os.utime(dest, (mtime, mtime))

    def _sentinels(pairs, us: int):
        # 1-slice parallelize: coalesce(1) over a default-parallelism
        # createDataFrame walks all 32 python partitions in one task
        # (~4-5 s per sentinel file, measured)
        return spark.createDataFrame(
            spark.sparkContext.parallelize(list(pairs), 1),
            "event_type string, ad_id long",
        ).select(
            "event_type", "ad_id", F.expr(f"timestamp_micros({us})").alias("ts")
        )

    t0 = _time.time() - 300
    _stage(ev, "f1_real.parquet", t0)
    ev.unpersist()
    adv = max_us + 100 * 24 * 3_600_000_000
    _stage(
        _sentinels([("view", -1), ("click", -2)], adv),
        "f2_advance.parquet",
        t0 + 30,
    )
    _stage(
        _sentinels([("view", -3), ("click", -4)], adv + 3_600_000_000),
        "f3_advance2.parquet",
        t0 + 60,
    )

    src_schema = "event_type string, ad_id long, ts timestamp"

    def source():
        return (
            spark.readStream.schema(src_schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(staged)
        )

    imps = source().filter("event_type = 'view'").select("ad_id", "ts")
    clks = source().filter("event_type = 'click'").select("ad_id", "ts")
    joined = attribute_clicks_outer(
        imps,
        clks,
        key="ad_id",
        attribution_window="24 hours",
        imp_watermark="1 hour",
        click_watermark="1 hour",
    )
    qname = "stream_outer_" + uuid.uuid4().hex[:12]
    with _stream_shuffle(spark):
        q = (
            joined.writeStream.format("memory")
            .queryName(qname)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    progress = q.recentProgress
    n_batches = sum(1 for p in progress if p["numInputRows"] > 0)
    if n_batches < 3:
        raise RuntimeError(
            f"outer-join scenario degraded: {n_batches} micro-batches < 3 "
            "(watermark advance never arrived as its own batch)"
        )
    pairs = spark.table(qname).filter(F.col("ad_id") >= 0)
    n_null = pairs.filter(F.col("click_ts").isNull()).count()
    if n_null == 0:
        raise RuntimeError(
            "no NULL-click outer rows emitted — eviction-driven outer "
            "emission is unverified this run (inner-join degradation)"
        )
    return pairs.groupBy("ad_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count("click_ts").alias("n_matched"),
        F.coalesce(
            F.sum(F.unix_micros("click_ts") - F.unix_micros("imp_ts")),
            F.lit(0),
        )
        .cast("long")
        .alias("sum_delta_us"),
    )


@register(
    "q_rolling_zscore",
    """
    WITH v AS (
      SELECT event_id, user_id, ts,
             round(value, 6) AS vd,
             CAST(round(value, 6) AS DECIMAL(18,6)) AS vdec
      FROM events
    ),
    w AS (
      SELECT event_id, user_id, vd,
             count(*) OVER f AS n_hist,
             CAST(sum(vdec) OVER f AS DOUBLE) AS s,
             CAST(sum(vdec * vdec) OVER f AS DOUBLE) AS ss
      FROM v
      WINDOW f AS (PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN 10 PRECEDING AND 1 PRECEDING)
    )
    SELECT event_id, user_id, n_hist::BIGINT AS n_hist,
           CASE WHEN n_hist >= 5
                     AND ss / n_hist::DOUBLE
                         - (s / n_hist::DOUBLE) * (s / n_hist::DOUBLE) > 0.0
                THEN round((vd - s / n_hist::DOUBLE)
                           / sqrt(ss / n_hist::DOUBLE
                                  - (s / n_hist::DOUBLE)
                                    * (s / n_hist::DOUBLE)), 6)
                ELSE NULL END AS zscore,
           coalesce(CASE WHEN n_hist >= 5
                              AND ss / n_hist::DOUBLE
                                  - (s / n_hist::DOUBLE) * (s / n_hist::DOUBLE)
                                  > 0.0
                         THEN abs((vd - s / n_hist::DOUBLE)
                                  / sqrt(ss / n_hist::DOUBLE
                                         - (s / n_hist::DOUBLE)
                                           * (s / n_hist::DOUBLE))) > 3.0
                         ELSE NULL END, FALSE) AS is_anomaly
    FROM w
    """,
)
def q_rolling_zscore(spark, sf_dir):
    """Per-user rolling z-score anomaly flags — the online
    time-series outlier primitive (each event scored against its own
    trailing 10-event window, >= 5 history rows required). The window
    moments accumulate in exact DECIMAL(18,6) after one cross-engine
    round, so the trailing sums are bit-identical no matter how each
    engine walks the frame (DuckDB's segment-tree window aggregation
    vs Spark's running fold would drift in plain doubles); mean/var/z
    are then one fixed double expression. Partitioned window — scales
    by user key, no global exchange."""
    from pyspark.sql import Window

    v = _t(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        "ts",
        F.round("value", 6).alias("vd"),
        F.round("value", 6).cast("decimal(18,6)").alias("vdec"),
    )
    f = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-10, -1)
    )
    w = v.select(
        "event_id",
        "user_id",
        "vd",
        F.count(F.lit(1)).over(f).alias("n_hist"),
        F.sum("vdec").over(f).cast("double").alias("s"),
        F.sum(F.col("vdec") * F.col("vdec")).over(f).cast("double").alias("ss"),
    )
    n_d = F.col("n_hist").cast("double")
    mean = F.col("s") / n_d
    var = F.col("ss") / n_d - mean * mean
    z = (F.col("vd") - mean) / F.sqrt(var)
    ok = (F.col("n_hist") >= 5) & (var > 0.0)
    return w.select(
        "event_id",
        F.col("user_id"),
        F.col("n_hist").cast("long").alias("n_hist"),
        F.when(ok, F.round(z, 6)).otherwise(F.lit(None)).alias("zscore"),
        F.coalesce(
            F.when(ok, F.abs(z) > 3.0).otherwise(F.lit(None)), F.lit(False)
        ).alias("is_anomaly"),
    )


@register(
    "q_scd2_build",
    """
    WITH bounds AS (
      SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
    ),
    iv AS (
      SELECT user_id, event_type, ts AS eff_from,
             LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
               AS eff_to
      FROM events
    ),
    nv AS (
      SELECT user_id, count(*)::BIGINT AS n_versions FROM iv GROUP BY 1
    ),
    pit AS (
      SELECT i.user_id, i.event_type AS state_at_t0, i.eff_from
      FROM iv i, bounds b
      WHERE epoch_us(i.eff_from) <= b.lo + (b.hi - b.lo) // 2
        AND (i.eff_to IS NULL
             OR epoch_us(i.eff_to) > b.lo + (b.hi - b.lo) // 2)
    )
    SELECT p.user_id, p.state_at_t0, p.eff_from, n.n_versions
    FROM pit p JOIN nv n USING (user_id)
    """,
)
def q_scd2_build(spark, sf_dir):
    """SCD Type 2 dimension build + point-in-time lookup — the
    warehouse change-history primitive: each user's event stream
    becomes validity intervals [eff_from, eff_to) via one LEAD window
    (open-ended current row = NULL eff_to), then a PIT query answers
    "what was every user's state at T0?" for T0 = the corpus midpoint
    (a broadcast 1-row scalar, integer-µs arithmetic — no float time
    math). Exactly one interval per user covers any instant, so the
    result is one deterministic row per user plus the version count.
    Partitioned window + broadcast scalar: scales by user key."""
    from pyspark.sql import Window

    ev = _t(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_type",
        F.col("ts").alias("eff_from"),
        F.lead("ts")
        .over(Window.partitionBy("user_id").orderBy("ts", "event_id"))
        .alias("eff_to"),
    )
    nv = iv.groupBy("user_id").agg(F.count(F.lit(1)).alias("n_versions"))
    # events.ts is TIMESTAMP_NTZ here: unix_micros() rejects it, so the
    # epoch-us scalar uses the timestampdiff-from-NTZ-epoch idiom the
    # streaming entries established
    ntz_us = lambda c: F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        + c + ")"
    )
    bounds = ev.agg(
        F.min(ntz_us("ts")).alias("lo"),
        F.max(ntz_us("ts")).alias("hi"),
    )
    t0 = F.col("lo") + F.floor((F.col("hi") - F.col("lo")) / 2).cast("long")
    pit = (
        iv.crossJoin(F.broadcast(bounds))
        .filter(
            (ntz_us("eff_from") <= t0)
            & (F.col("eff_to").isNull() | (ntz_us("eff_to") > t0))
        )
        .select("user_id", F.col("event_type").alias("state_at_t0"), "eff_from")
    )
    return pit.join(nv, "user_id").select(
        "user_id", "state_at_t0", "eff_from", "n_versions"
    )


@register(
    "text_domain_divergence",
    f"""
    WITH tok AS (
      SELECT doc_id, unnest(list_filter(string_split_regex(lower(text),
             '\\s+'), x -> len(x) > 0)) AS term, source
      FROM documents
    ),
    g AS (SELECT term, count(*)::BIGINT AS qc FROM tok GROUP BY 1),
    tq AS (SELECT count(*)::BIGINT AS tq FROM tok),
    s AS (SELECT source, term, count(*)::BIGINT AS pc
          FROM tok GROUP BY 1, 2),
    tp AS (SELECT source, count(*)::BIGINT AS tp FROM tok GROUP BY 1),
    contrib AS (
      SELECT s.source, s.term, g.qc,
             CAST(round(
               0.5 * ((s.pc::DOUBLE / tp.tp::DOUBLE)
                      * ln((s.pc::DOUBLE / tp.tp::DOUBLE)
                           / ((s.pc::DOUBLE / tp.tp::DOUBLE)
                              + (g.qc::DOUBLE / tq.tq::DOUBLE))
                           * 2.0)
                      + (g.qc::DOUBLE / tq.tq::DOUBLE)
                        * ln((g.qc::DOUBLE / tq.tq::DOUBLE)
                             / ((s.pc::DOUBLE / tp.tp::DOUBLE)
                                + (g.qc::DOUBLE / tq.tq::DOUBLE))
                             * 2.0)), 12) AS DECIMAL(20,12)) AS c
      FROM s JOIN g USING (term) JOIN tp ON tp.source = s.source, tq
    )
    SELECT c.source, tp.tp AS n_tokens,
           round(CAST(sum(c.c) AS DOUBLE)
                 + 0.5 * ln(2.0)
                   * ((tq.tq - sum(c.qc))::DOUBLE / tq.tq::DOUBLE), 6) AS jsd
    FROM contrib c JOIN tp ON tp.source = c.source, tq
    GROUP BY c.source, tp.tp, tq.tq
    """,
)
def text_domain_divergence(spark, sf_dir):
    """Jensen-Shannon divergence of every source's unigram distribution
    against the whole corpus — the distribution-drift signal a training
    pipeline watches across domains and snapshots ("did srcN's language
    shift?"). JSD = ½KL(P‖M) + ½KL(Q‖M) with M = (P+Q)/2.

    NO source×vocab grid: terms ABSENT from a source contribute exactly
    ½·q·ln2 each (p=0 ⇒ m=q/2), so their total is the closed form
    ½·ln2·(1 − coverage) with coverage = Σ_present qc / T — an
    integer-exact correction added after the present-term aggregation.
    That keeps the work proportional to the per-source posting lists
    (one term-keyed shuffle join), not |sources|×|vocab|. Present-term
    contributions are quantized to 12dp and summed in exact DECIMAL —
    order-free, so the per-source aggregate is a plain partial-combine
    hash agg (no vocab-sized array per source) and still hashes
    bit-identically against the oracle."""
    docs = _t(spark, sf_dir, "documents")
    from poc_spark.operators.textstats import _tokens

    tok = docs.select(
        "source", F.explode(_tokens(F.col("text"))).alias("term")
    )
    g = tok.groupBy("term").agg(F.count(F.lit(1)).alias("qc"))
    tq = tok.agg(F.count(F.lit(1)).alias("tq"))
    s = tok.groupBy("source", "term").agg(F.count(F.lit(1)).alias("pc"))
    tp = tok.groupBy("source").agg(F.count(F.lit(1)).alias("tp"))
    joined = (
        s.join(g, "term")
        .join(F.broadcast(tp), "source")
        .crossJoin(F.broadcast(tq))
    )
    p = F.col("pc").cast("double") / F.col("tp").cast("double")
    q = F.col("qc").cast("double") / F.col("tq").cast("double")
    contrib = (
        F.round(
            F.lit(0.5)
            * (
                p * F.log(p / (p + q) * F.lit(2.0))
                + q * F.log(q / (p + q) * F.lit(2.0))
            ),
            12,
        )
    ).cast("decimal(20,12)")
    per = joined.select(
        "source", "term", "tp", "tq", "qc", contrib.alias("c")
    )
    folded = per.groupBy(
        "source", F.col("tp").alias("n_tokens"), "tq"
    ).agg(
        F.sum("c").cast("double").alias("base"),
        F.sum("qc").alias("covered"),
    )
    absent = (
        F.lit(0.5)
        * F.log(F.lit(2.0))
        * (
            (F.col("tq") - F.col("covered")).cast("double")
            / F.col("tq").cast("double")
        )
    )
    return folded.select(
        "source",
        "n_tokens",
        F.round(F.col("base") + absent, 6).alias("jsd"),
    )


@register(
    "pipeline_entity_resolution",
    """
    WITH RECURSIVE c AS (
      SELECT c_custkey AS id, c_name AS name
      FROM customer WHERE c_custkey % 7 = 0
    ),
    p AS (
      SELECT a.id AS s, b.id AS t
      FROM c a JOIN c b
        ON a.id < b.id AND levenshtein(a.name, b.name) <= 1
    ),
    und AS (SELECT s AS a, t AS b FROM p UNION SELECT t, s FROM p),
    reach AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    ),
    lbl AS (SELECT a AS id, LEAST(a, MIN(b)) AS comp FROM reach GROUP BY a),
    resolved AS (
      SELECT c.id, c.name, COALESCE(l.comp, c.id) AS comp
      FROM c LEFT JOIN lbl l USING (id)
    )
    SELECT comp AS cluster_id,
           count(*)::BIGINT AS n_members,
           sum(id)::BIGINT AS sum_keys,
           count(DISTINCT name)::BIGINT AS n_names
    FROM resolved GROUP BY comp
    """,
)
def pipeline_entity_resolution(spark, sf_dir):
    """Entity resolution end-to-end, the record-linkage composition:
    (1) candidate pairs by PassJoin segment blocking + levenshtein <= 1
    verify (operators/fuzzy.py — never all-pairs; k=1 because the
    synthetic Customer#NNN names chain transitively into one giant
    cluster at distance 2 — measured, 84 clusters vs 1), (2) transitive
    closure into entity clusters via pointer-jumping connected
    components (operators/graph.py), (3) canonical id = min member key,
    singletons kept as their own entity. Output is the per-cluster
    summary (size, key-sum signature, distinct surface forms). The
    oracle replays blocking-free: quadratic levenshtein + recursive-CTE
    closure — so the blocked plan's cluster assignments are checked
    against ground truth, the same discipline as fuzzy_name_join and
    graph_components."""
    from poc_spark.operators.fuzzy import edit_distance_join
    from poc_spark.operators.graph import connected_components

    c = (
        _t(spark, sf_dir, "customer")
        .filter("c_custkey % 7 = 0")
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("name"))
    )
    pairs = edit_distance_join(c, k=1, text_col="name", id_col="id")
    edges = pairs.select(
        F.col("id_a").alias("source"),
        F.col("id_b").alias("target"),
        F.lit(1).cast("long").alias("weight"),
    )
    labels = connected_components(edges)
    resolved = c.join(labels, "id", "left").select(
        "id", "name", F.coalesce("component", F.col("id")).alias("comp")
    )
    return resolved.groupBy(F.col("comp").alias("cluster_id")).agg(
        F.count(F.lit(1)).alias("n_members"),
        F.sum("id").alias("sum_keys"),
        F.countDistinct("name").alias("n_names"),
    )


@register(
    "graph_modularity",
    _EDGES_CTE.replace("WITH chain", "WITH RECURSIVE chain", 1)
    + """
    , strong AS (SELECT source, target FROM edges WHERE weight >= 4),
    und AS (
      SELECT source AS a, target AS b FROM strong
      UNION SELECT target, source FROM strong
    ),
    reach AS (
      SELECT a, b FROM und
      UNION
      SELECT r.a, u.b FROM reach r JOIN und u ON r.b = u.a
    ),
    lbl AS (SELECT a AS id, LEAST(a, MIN(b)) AS community
            FROM reach GROUP BY a),
    nodes AS (SELECT src AS id FROM directed GROUP BY src),
    nl AS (
      SELECT n.id, COALESCE(l.community, n.id) AS community
      FROM nodes n LEFT JOIN lbl l USING (id)
    ),
    mm AS (SELECT count(*)::BIGINT AS m FROM edges),
    deg AS (SELECT src AS id, count(*)::BIGINT AS degree
            FROM directed GROUP BY 1),
    dper AS (
      SELECT community, count(*)::BIGINT AS n_nodes,
             sum(degree)::BIGINT AS d_total
      FROM nl JOIN deg USING (id) GROUP BY 1
    ),
    eper AS (
      SELECT ls.community, count(*)::BIGINT AS e_within
      FROM edges e
      JOIN nl ls ON ls.id = e.source
      JOIN nl lt ON lt.id = e.target
      WHERE ls.community = lt.community
      GROUP BY 1
    )
    SELECT d.community, d.n_nodes,
           COALESCE(e.e_within, 0)::BIGINT AS e_within, d.d_total,
           round((4 * mm.m * COALESCE(e.e_within, 0)
                  - d.d_total * d.d_total)::DOUBLE
                 / (4 * mm.m * mm.m)::DOUBLE, 9) AS q_contrib
    FROM dper d LEFT JOIN eper e USING (community), mm
    """,
)
def graph_modularity(spark, sf_dir):
    """Newman modularity of the strong-tie partition over the FULL
    interaction graph: communities = connected components of the
    weight >= 3 subgraph (nodes outside it are singletons), scored
    per community as Q_c = e_c/m − (d_c/2m)² — 'how well do strong
    ties explain all interactions'. The contribution is the single
    exact-integer expression (4·m·e_c − d_c²)/(4m²) cast to double
    once (no float folds anywhere). Spark: pointer-jumping components
    + two broadcast label joins; oracle: recursive-CTE closure + the
    same integer algebra."""
    from poc_spark.operators.graph import (
        connected_components,
        modularity_by_community,
    )

    edges = lag_edges(_t(spark, sf_dir, "events"), "user_id", EVENT_ORDER)
    comms = connected_components(edges.filter(F.col("weight") >= 4))
    return modularity_by_community(
        edges, comms.select("id", F.col("component").alias("community"))
    )


@register(
    "lake_branching",
    """
    WITH up1 AS (
      SELECT doc_id, text || ' branched' AS text, lang, source,
             n_chars + 9 AS n_chars
      FROM documents WHERE doc_id % 6 = 0
    ),
    m1 AS (
      SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
      FROM documents d WHERE d.doc_id % 6 <> 0
      UNION ALL SELECT * FROM up1
    ),
    up2 AS (
      SELECT doc_id, text || ' twice' AS text, lang, source,
             n_chars + 6 AS n_chars
      FROM m1 WHERE doc_id % 10 = 0
    ),
    m2 AS (
      SELECT m.doc_id, m.text, m.lang, m.source, m.n_chars
      FROM m1 m WHERE m.doc_id % 10 <> 0
      UNION ALL SELECT * FROM up2
    )
    SELECT lang, source,
           count(*) AS n_docs,
           sum(n_chars)::BIGINT AS sum_chars,
           sum(('0x' || substr(md5(text), 1, 10))::BIGINT)::BIGINT
             AS content_sum
    FROM m2 GROUP BY lang, source
    """,
)
def lake_branching(spark, sf_dir):
    """Branch/tag refs end-to-end (sources/lake.py create_branch /
    merge_upsert_branch / fast_forward_main — the Iceberg/Nessie
    write-audit-merge workflow on the plain-parquet tree): a fresh
    base is tagged, a branch takes TWO copy-on-write upserts while the
    entry ASSERTS main still serves the untouched base (isolation —
    the thing branches exist for), then main fast-forwards to the
    branch head and the merged tree is content-aggregated. The tag
    must still serve the pre-branch base afterwards (pinned against
    the ff's retention pruning). The oracle replays both upserts
    relationally; loud RuntimeErrors guard isolation and tag
    stability, so a pointer leak in either direction can never pass
    silently."""
    from poc_spark.sources.lake import (
        create_branch,
        create_tag,
        delete_ref,
        fast_forward_main,
        list_refs,
        merge_upsert_branch,
        read_ref,
        read_snapshot,
        write_partitioned,
    )

    docs = _t(spark, sf_dir, "documents")
    root = _export_path("branchtree", sf_dir)
    # fresh base every run, INCLUDING refs: a stale ref would collide
    # on create and pin last run's versions (the stale-artifact rule)
    for stale in list_refs(root):
        delete_ref(root, stale)
    write_partitioned(docs, root, ["lang"])
    base_count = docs.count()
    base_sum = docs.agg(F.sum("n_chars")).collect()[0][0]

    create_tag(spark, root, "base")
    create_branch(spark, root, "dev")
    up1 = docs.filter("doc_id % 6 = 0").select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" branched")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + F.lit(9)).alias("n_chars"),
    )
    merge_upsert_branch(spark, root, "dev", up1, "doc_id", "lang")
    branch1 = read_ref(spark, root, "dev")
    up2 = branch1.filter("doc_id % 10 = 0").select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" twice")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + F.lit(6)).alias("n_chars"),
    )
    merge_upsert_branch(spark, root, "dev", up2, "doc_id", "lang")

    # isolation gate: main must still serve the untouched base
    main_sum = read_snapshot(spark, root).agg(F.sum("n_chars")).collect()[0][0]
    if main_sum != base_sum:
        raise RuntimeError(
            f"branch isolation broken: main n_chars sum moved "
            f"{base_sum} -> {main_sum} before the fast-forward"
        )
    fast_forward_main(spark, root, "dev")
    # tag stability gate: the pinned pre-branch snapshot is intact
    tag_count = read_ref(spark, root, "base").count()
    if tag_count != base_count:
        raise RuntimeError(
            f"tag 'base' no longer serves the pre-branch snapshot: "
            f"{tag_count} rows vs {base_count}"
        )
    return _content_agg(read_snapshot(spark, root), "lang", "source")


@register(
    "lake_catalog_txn",
    """
    WITH upd AS (
      SELECT doc_id, text || ' cat' AS text, lang, source,
             n_chars + 4 AS n_chars
      FROM documents WHERE doc_id % 9 = 0
    ),
    facts AS (
      SELECT d.doc_id, d.text, d.lang, d.source, d.n_chars
      FROM documents d WHERE d.doc_id % 9 <> 0
      UNION ALL SELECT * FROM upd
    ),
    f AS (
      SELECT 'facts' AS tbl, lang AS grp, count(*) AS n_rows,
             sum(n_chars)::BIGINT AS sum_chars
      FROM facts GROUP BY lang
    ),
    s AS (
      SELECT 'summary' AS tbl, source AS grp, count(*) AS n_rows,
             sum(n_chars)::BIGINT AS sum_chars
      FROM facts GROUP BY source
    )
    SELECT * FROM f UNION ALL SELECT * FROM s
    """,
)
def lake_catalog_txn(spark, sf_dir):
    """ATOMIC MULTI-TABLE transaction (sources/catalog_txn.py — the
    catalog-level commit, one rung above single-table refs): a facts
    table (documents by lang) and its DERIVED summary table (per-source
    counts/sums) must move together — a reader that sees new facts with
    the old summary has a broken invariant no single-table pointer can
    prevent. The entry updates BOTH tables in one transaction: facts
    get a text/n_chars upsert, the summary is recomputed from the
    post-update facts. A mid-transaction probe (pre-commit hook) reads
    both tables THROUGH THE CATALOG and fails loudly unless both are
    still old (all-or-nothing); after the commit, the entry verifies
    the cross-table invariant (summary == aggregate of facts) before
    returning both tables' states under one discriminator column. The
    oracle replays the upsert and both aggregations relationally."""
    from poc_spark.sources.catalog_txn import (
        catalog_init,
        catalog_read_table,
        catalog_txn_upsert,
    )
    from poc_spark.sources.lake import write_partitioned

    docs = _t(spark, sf_dir, "documents")
    base = _export_path("cattxn", sf_dir)
    facts_root = os.path.join(base, "facts")
    summary_root = os.path.join(base, "summary")
    catalog_path = os.path.join(base, "catalog.json")
    # fresh world every run (stale-artifact rule): tables, refs, catalog
    import shutil as _shutil

    _shutil.rmtree(base, ignore_errors=True)
    os.makedirs(base, exist_ok=True)
    summary0 = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("sum_chars"),
    )
    # the two seed tables and the probe's expected total are mutually
    # independent (distinct output roots / a pure read of the immutable
    # input), so their jobs overlap from driver threads (r14 opt,
    # guide §2.6 — same _overlap discipline as the ivfpq entries);
    # catalog_init still runs strictly after both tables exist
    _seed: dict = {}
    _overlap(
        lambda: write_partitioned(docs, facts_root, ["lang"]),
        lambda: write_partitioned(summary0, summary_root, ["source"]),
        lambda: _seed.__setitem__(
            "base_sum", docs.agg(F.sum("n_chars")).collect()[0][0]
        ),
    )
    catalog_init(
        spark, catalog_path, {"facts": facts_root, "summary": summary_root}
    )

    upd = docs.filter("doc_id % 9 = 0").select(
        "doc_id",
        F.concat(F.col("text"), F.lit(" cat")).alias("text"),
        "lang",
        "source",
        (F.col("n_chars") + F.lit(4)).alias("n_chars"),
    )
    new_facts = docs.filter("doc_id % 9 <> 0").unionByName(upd)
    new_summary = new_facts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("sum_chars"),
    )
    base_sum = _seed["base_sum"]

    def probe():
        f_sum = (
            catalog_read_table(spark, catalog_path, "facts")
            .agg(F.sum("n_chars"))
            .collect()[0][0]
        )
        s_sum = (
            catalog_read_table(spark, catalog_path, "summary")
            .agg(F.sum("sum_chars"))
            .collect()[0][0]
        )
        if f_sum != base_sum or s_sum != base_sum:
            raise RuntimeError(
                "catalog transaction is not atomic: mid-txn reader saw "
                f"facts={f_sum} summary={s_sum}, expected both {base_sum}"
            )

    catalog_txn_upsert(
        spark,
        catalog_path,
        {
            "facts": (upd, "doc_id", "lang"),
            "summary": (new_summary, "source", "source"),
        },
        _pre_commit_hook=probe,
    )
    facts = catalog_read_table(spark, catalog_path, "facts")
    summary = catalog_read_table(spark, catalog_path, "summary")
    # cross-table invariant gate: summary must equal facts' aggregate
    # (two independent reads — overlapped, guide §2.6)
    _gate: dict = {}
    _overlap(
        lambda: _gate.__setitem__(
            "f", facts.agg(F.sum("n_chars")).collect()[0][0]
        ),
        lambda: _gate.__setitem__(
            "s", summary.agg(F.sum("sum_chars")).collect()[0][0]
        ),
    )
    f_sum, s_sum = _gate["f"], _gate["s"]
    if f_sum != s_sum:
        raise RuntimeError(
            f"cross-table invariant broken after commit: facts={f_sum} "
            f"summary={s_sum}"
        )
    f_out = facts.groupBy(F.col("lang").alias("grp")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("n_chars").alias("sum_chars"),
    ).select(F.lit("facts").alias("tbl"), "grp", "n_rows", "sum_chars")
    s_out = summary.select(
        F.lit("summary").alias("tbl"),
        F.col("source").alias("grp"),
        "n_rows",
        "sum_chars",
    )
    return f_out.unionByName(s_out)


@register(
    "lake_ivm_join",
    """
    WITH mx AS (SELECT max(o_orderkey) AS m FROM orders),
    f0 AS (
      SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      FROM orders
    ),
    upd AS (
      SELECT o_orderkey, o_custkey,
             o_totalprice + 10 AS o_totalprice,
             CASE WHEN o_orderkey % 26 = 0 THEN '1-URGENT'
                  ELSE o_orderpriority END AS o_orderpriority
      FROM f0 WHERE o_orderkey % 13 = 0
    ),
    ins AS (
      SELECT o_orderkey + mx.m + 1 AS o_orderkey, o_custkey,
             o_totalprice, '5-LOW' AS o_orderpriority
      FROM f0, mx WHERE o_orderkey < 50
    ),
    fa AS (
      SELECT * FROM f0 WHERE o_orderkey % 13 <> 0
      UNION ALL SELECT * FROM upd
      UNION ALL SELECT * FROM ins
    ),
    cb AS (
      SELECT c_custkey, c_name,
             CASE WHEN c_custkey % 11 = 0 THEN 'MOVED'
                  ELSE c_mktsegment END AS c_mktsegment
      FROM customer
    ),
    v AS (
      SELECT fa.o_orderkey, fa.o_custkey, fa.o_totalprice,
             fa.o_orderpriority, cb.c_name, cb.c_mktsegment
      FROM fa JOIN cb ON cb.c_custkey = fa.o_custkey
    )
    SELECT o_orderpriority, c_mktsegment,
           count(*) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           count(DISTINCT o_custkey) AS n_custs
    FROM v GROUP BY 1, 2
    """,
)
def lake_ivm_join(spark, sf_dir):
    """INCREMENTAL JOIN-VIEW MAINTENANCE (operators/ivm.py — the IVM
    rung above rollup_incremental): a denormalized orders⋈customer
    view is kept current under a FACT delta (price updates, partition-
    MOVING priority changes, brand-new orders) and then a DIM delta
    (market segments reassigned) without ever re-running the full
    join — the fact delta joins only the broadcast dim table, the dim
    delta rebuilds only the view's own affected rows (their fact
    columns are read from the view, never the fact table), and both
    land through the copy-on-write upsert so untouched view partitions
    byte-carry. The oracle replays both deltas and the defining join
    relationally, so a view row the maintenance missed, duplicated, or
    left stale fails the value hash."""
    import shutil as _shutil

    from poc_spark.operators.ivm import (
        dim_delta_view_rows,
        fact_delta_view_rows,
        join_view_rows,
    )
    from poc_spark.sources.lake import (
        merge_upsert_partitioned,
        read_snapshot,
        write_partitioned,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    dims0 = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_mktsegment"
    )
    dim_cols = ["c_name", "c_mktsegment"]
    view_root = _export_path("ivmview", sf_dir)
    _shutil.rmtree(view_root, ignore_errors=True)
    _shutil.rmtree(view_root + ".refs", ignore_errors=True)

    view0 = join_view_rows(orders, dims0, "o_orderkey", "o_custkey", dim_cols)
    write_partitioned(view0, view_root, ["o_orderpriority"])

    # fact delta: price bump + partition-moving priority + new orders
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]
    upd = orders.filter("o_orderkey % 13 = 0").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + F.lit(10)).alias("o_totalprice"),
        F.when(F.col("o_orderkey") % 26 == 0, F.lit("1-URGENT"))
        .otherwise(F.col("o_orderpriority"))
        .alias("o_orderpriority"),
    )
    ins = orders.filter("o_orderkey < 50").select(
        (F.col("o_orderkey") + F.lit(max_key + 1)).alias("o_orderkey"),
        "o_custkey",
        "o_totalprice",
        F.lit("5-LOW").alias("o_orderpriority"),
    )
    fact_delta = upd.unionByName(ins)
    merge_upsert_partitioned(
        spark,
        view_root,
        fact_delta_view_rows(fact_delta, dims0, "o_orderkey", "o_custkey", dim_cols),
        "o_orderkey",
        "o_orderpriority",
    )

    # dim delta: segment reassignment for custkey % 11 == 0
    dim_delta = dims0.filter("o_custkey % 11 = 0").select(
        "o_custkey", "c_name", F.lit("MOVED").alias("c_mktsegment")
    )
    view_cur = read_snapshot(spark, view_root)
    merge_upsert_partitioned(
        spark,
        view_root,
        dim_delta_view_rows(
            view_cur, dim_delta, "o_orderkey", "o_custkey", dim_cols
        ),
        "o_orderkey",
        "o_orderpriority",
    )

    final = read_snapshot(spark, view_root)
    return final.groupBy("o_orderpriority", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.countDistinct("o_custkey").alias("n_custs"),
    )


@register(
    "stream_ivm_join",
    """
    WITH fa AS (
      SELECT o_orderkey, o_custkey,
             CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 10
                  ELSE o_totalprice END AS o_totalprice,
             o_orderpriority
      FROM orders
    ),
    v AS (
      SELECT fa.o_orderkey, fa.o_custkey, fa.o_totalprice,
             fa.o_orderpriority, c.c_name, c.c_mktsegment
      FROM fa JOIN customer c ON c.c_custkey = fa.o_custkey
    )
    SELECT o_orderpriority, c_mktsegment,
           count(*) AS n_rows,
           CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
             AS sum_price,
           count(DISTINCT o_custkey) AS n_custs
    FROM v GROUP BY 1, 2
    """,
)
def stream_ivm_join(spark, sf_dir):
    """STREAMING incremental join-view maintenance (streaming/ingest.py
    maintain_view_stream — the composition of the r11 IVM operator with
    the exactly-once micro-batch discipline): three staged fact-delta
    files (price bumps for o_orderkey % 7 == 0, sliced by key range,
    executor-side staging) drain as three micro-batches; each joins
    only the broadcast customer dim and lands in the orders⋈customer
    view as one atomic copy-on-write upsert carrying its batch id.
    After the drain, an injected CRASH-REPLAY re-applies batch id 0
    with POISON rows — the txn metadata must absorb it (returns False,
    view untouched; asserted loudly). The oracle replays the bumped
    join relationally, so a lost batch, a double-applied batch, or a
    poisoned replay all fail the value hash."""
    import glob as _glob
    import shutil as _shutil
    import time as _time
    import uuid

    from poc_spark.sources.lake import read_snapshot, write_partitioned
    from poc_spark.operators.ivm import join_view_rows
    from poc_spark.streaming.ingest import (
        maintain_view_batch_exactly_once,
        maintain_view_stream,
    )

    orders = _t(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority"
    )
    dims = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_name", "c_mktsegment"
    )
    dim_cols = ["c_name", "c_mktsegment"]
    base = _export_path("streamivm", sf_dir)
    view_root = os.path.join(base, "view")
    landing = os.path.join(base, "landing")
    ckpt = os.path.join(base, "ckpt-" + uuid.uuid4().hex[:8])
    _shutil.rmtree(base, ignore_errors=True)
    os.makedirs(landing, exist_ok=True)

    write_partitioned(
        join_view_rows(orders, dims, "o_orderkey", "o_custkey", dim_cols),
        view_root,
        ["o_orderpriority"],
    )

    delta = orders.filter("o_orderkey % 7 = 0").select(
        "o_orderkey",
        "o_custkey",
        (F.col("o_totalprice") + F.lit(10)).alias("o_totalprice"),
        "o_orderpriority",
    )
    max_key = orders.agg(F.max("o_orderkey")).collect()[0][0]  # 1-row scalar
    t0 = _time.time() - 300
    for i, (lo, hi) in enumerate(
        [(0, max_key // 3), (max_key // 3, 2 * max_key // 3),
         (2 * max_key // 3, max_key + 1)]
    ):
        part = delta.filter(
            (F.col("o_orderkey") >= lo) & (F.col("o_orderkey") < hi)
        )
        tmp = os.path.join(landing, f"f{i}.stage")
        part.coalesce(1).write.mode("overwrite").parquet(tmp)
        src = _glob.glob(os.path.join(tmp, "part-*.parquet"))[0]
        dest = os.path.join(landing, f"f{i}_delta.parquet")
        os.replace(src, dest)
        _shutil.rmtree(tmp)
        os.utime(dest, (t0 + 30 * i, t0 + 30 * i))

    schema = (
        "o_orderkey long, o_custkey long, o_totalprice double, "
        "o_orderpriority string"
    )
    with _stream_shuffle(spark):
        n_batches = maintain_view_stream(
            spark,
            landing,
            schema,
            view_root,
            dims,
            "o_orderkey",
            "o_custkey",
            dim_cols,
            "o_orderpriority",
            checkpoint=ckpt,
        )
    if n_batches < 3:
        raise RuntimeError(
            f"stream degraded: {n_batches} micro-batches < 3 (the delta "
            "files did not drain as separate batches)"
        )
    # injected crash-replay: batch id 0 again, with poison rows — the
    # txn metadata must absorb it without touching the view
    poison = dims.limit(1).select(
        F.lit(-1).cast("long").alias("o_orderkey"),
        F.col("o_custkey"),
        F.lit(-(10.0 ** 9)).alias("o_totalprice"),
        F.lit("1-URGENT").alias("o_orderpriority"),
        "c_name",
        F.lit("POISON").alias("c_mktsegment"),
    )
    applied = maintain_view_batch_exactly_once(
        spark, view_root, poison, 0, "o_orderkey", "o_orderpriority"
    )
    if applied:
        raise RuntimeError(
            "crash-replay of batch 0 was APPLIED — exactly-once metadata "
            "failed to absorb the redelivery"
        )
    final = read_snapshot(spark, view_root)
    return final.groupBy("o_orderpriority", "c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
        .cast("double")
        .alias("sum_price"),
        F.countDistinct("o_custkey").alias("n_custs"),
    )


@register(
    "text_keywords",
    f"""
    WITH tok AS ({_TOK}),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
    dfreq AS (SELECT term, count(*) AS df FROM tf GROUP BY 1),
    n AS (SELECT count(*) AS n_docs FROM documents),
    w AS (
      SELECT doc_id, term, tf, df,
             round(tf * ln(n_docs::DOUBLE / df), 6) AS tfidf
      FROM tf JOIN dfreq USING (term), n
    ),
    ranked AS (
      SELECT doc_id, term, tfidf,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tfidf DESC, term) AS rnk
      FROM w
    )
    SELECT doc_id, term, tfidf, rnk::BIGINT AS rnk
    FROM ranked WHERE rnk <= 3
    """,
)
def text_keywords(spark, sf_dir):
    """Per-document KEYWORD EXTRACTION: top-3 terms by TF-IDF with a
    deterministic (score desc, term) tie-break — the document-labeling
    primitive on top of text_tfidf's weights. The per-doc rank rides
    InferWindowGroupLimit (partial top-k before the exchange), so the
    full weight table never shuffles whole."""
    from pyspark.sql import Window

    from poc_spark.operators.textstats import tf_idf

    w = tf_idf(_t(spark, sf_dir, "documents"))
    rnk = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    )
    return (
        w.select("doc_id", "term", "tfidf", rnk.alias("rnk"))
        .filter(F.col("rnk") <= 3)
        .withColumn("rnk", F.col("rnk").cast("long"))
    )


# generic long-format profiler: every metric one (column, metric, value)
# row, so ONE entry profiles heterogeneous columns without a wide schema
_PROFILE_COLS = ("o_totalprice", "o_custkey", "o_orderstatus")


@register(
    "q_profile_generic",
    """
    SELECT 'o_totalprice' AS col, 'count' AS metric,
           CAST(count(o_totalprice) AS DOUBLE) AS value FROM orders
    UNION ALL SELECT 'o_totalprice', 'nulls',
           CAST(count(*) - count(o_totalprice) AS DOUBLE) FROM orders
    UNION ALL SELECT 'o_totalprice', 'distinct',
           CAST(count(DISTINCT o_totalprice) AS DOUBLE) FROM orders
    UNION ALL SELECT 'o_totalprice', 'min',
           CAST(min(o_totalprice) AS DOUBLE) FROM orders
    UNION ALL SELECT 'o_totalprice', 'max',
           CAST(max(o_totalprice) AS DOUBLE) FROM orders
    UNION ALL SELECT 'o_custkey', 'count',
           CAST(count(o_custkey) AS DOUBLE) FROM orders
    UNION ALL SELECT 'o_custkey', 'nulls',
           CAST(count(*) - count(o_custkey) AS DOUBLE) FROM orders
    UNION ALL SELECT 'o_custkey', 'distinct',
           CAST(count(DISTINCT o_custkey) AS DOUBLE) FROM orders
    UNION ALL SELECT 'o_custkey', 'min',
           CAST(min(o_custkey) AS DOUBLE) FROM orders
    UNION ALL SELECT 'o_custkey', 'max',
           CAST(max(o_custkey) AS DOUBLE) FROM orders
    UNION ALL SELECT 'o_orderstatus', 'count',
           CAST(count(o_orderstatus) AS DOUBLE) FROM orders
    UNION ALL SELECT 'o_orderstatus', 'nulls',
           CAST(count(*) - count(o_orderstatus) AS DOUBLE) FROM orders
    UNION ALL SELECT 'o_orderstatus', 'distinct',
           CAST(count(DISTINCT o_orderstatus) AS DOUBLE) FROM orders
    """,
)
def q_profile_generic(spark, sf_dir):
    """GENERIC column profiler in LONG format — (col, metric, value)
    rows for heterogeneous columns (numeric get min/max, strings
    don't), the table-health report shape that scales to any schema
    without widening. ONE aggregate scan computes every metric
    (Catalyst fuses the per-column aggregates); the long format is a
    driver-free explode of the single aggregate row."""
    o = _t(spark, sf_dir, "orders")
    aggs = []
    for c in _PROFILE_COLS:
        aggs += [
            F.count(c).cast("double").alias(f"{c}__count"),
            (F.count(F.lit(1)) - F.count(c)).cast("double").alias(f"{c}__nulls"),
            F.countDistinct(c).cast("double").alias(f"{c}__distinct"),
        ]
        if c != "o_orderstatus":
            aggs += [
                F.min(c).cast("double").alias(f"{c}__min"),
                F.max(c).cast("double").alias(f"{c}__max"),
            ]
    agg = o.agg(*aggs)
    cells = [
        F.struct(
            F.lit(name.split("__")[0]).alias("col"),
            F.lit(name.split("__")[1]).alias("metric"),
            F.col(name).alias("value"),
        )
        for name in agg.columns
    ]
    return agg.select(F.explode(F.array(*cells)).alias("p")).select(
        "p.col", "p.metric", "p.value"
    )


@register(
    "lake_change_feed",
    """
    WITH ins AS (
      SELECT doc_id + 100000 AS doc_id FROM documents WHERE doc_id % 50 = 0
    ),
    upd2 AS (SELECT doc_id FROM documents WHERE doc_id % 5 = 0),
    del3 AS (SELECT doc_id FROM documents WHERE doc_id % 7 = 0)
    SELECT doc_id, 'insert' AS change_type, 2::BIGINT AS version FROM ins
    UNION ALL
    SELECT doc_id, 'update', 2::BIGINT FROM upd2
    UNION ALL
    SELECT doc_id, 'delete', 3::BIGINT FROM del3
    """,
)
def lake_change_feed(spark, sf_dir):
    """CHANGE DATA FEED between lake versions (sources/lake.py
    change_feed — the Delta-CDF capability derived by diffing the
    immutable retained snapshots; produce-direction twin of
    cdc_latest_state): a fresh base takes one mixed INSERT+UPDATE
    commit (new +100000 ids for doc_id % 50, ' v2' text rewrites for
    doc_id % 5) and one DELETE commit (merge_full matched-delete of
    doc_id % 7), then the feed over versions 1→3 must emit exactly the
    per-commit row-level changes — (doc_id, change_type, version) —
    the oracle derives from the same modular rules. Each commit costs
    one narrow (key, fingerprint) full-outer join; the loop is bounded
    by retention depth, never table size."""
    from poc_spark.sources.lake import (
        change_feed,
        drop_tree,
        list_versions,
        merge_full_partitioned,
        merge_upsert_partitioned,
        write_partitioned,
    )

    docs = _t(spark, sf_dir, "documents")
    _assert_insert_offset_free(docs, "lake_change_feed")
    root = _export_path("cdftree", sf_dir)
    drop_tree(root)  # fresh versions 1..3 every run (stale-artifact rule)
    # the feed needs all three snapshots retained (default retain=2
    # would prune the base right when commit 3 publishes); try/finally
    # so an exception in the commits can't leak retain=3 into every
    # later lake entry of the sweep (r12 ADVICE)
    spark.conf.set("spark.poc.lake.retain", "3")
    try:
        write_partitioned(docs, root, ["lang"])
        updates = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
            "text", F.concat("text", F.lit(" v2"))
        ).withColumn("n_chars", F.col("n_chars") + 3)
        inserts = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
            "doc_id", F.col("doc_id") + 100000
        )
        merge_upsert_partitioned(
            spark, root, updates.unionByName(inserts), "doc_id", "lang"
        )
        dels = docs.filter(F.col("doc_id") % 7 == 0)
        merge_full_partitioned(
            spark, root, dels, "doc_id", "lang", matched_delete=F.lit(True)
        )
    finally:
        spark.conf.unset("spark.poc.lake.retain")
    vs = list_versions(root)
    if len(vs) != 3:
        raise RuntimeError(
            f"lake_change_feed: expected 3 retained versions, got {vs}"
        )
    return change_feed(spark, root, vs[0], vs[-1], ["doc_id"])


@register(
    "lake_ivm_agg",
    """
    WITH ins AS (
      SELECT doc_id + 100000 AS doc_id, text, lang, source, n_chars
      FROM documents WHERE doc_id % 50 = 0
    ),
    upd AS (
      SELECT doc_id, text || ' v2' AS text, lang, source,
             n_chars + 3 AS n_chars
      FROM documents WHERE doc_id % 5 = 0
    ),
    v2 AS (
      SELECT doc_id, text, lang, source, n_chars FROM documents
      WHERE doc_id % 5 <> 0
      UNION ALL SELECT doc_id, text, lang, source, n_chars FROM upd
      UNION ALL SELECT doc_id, text, lang, source, n_chars FROM ins
    ),
    v3 AS (
      SELECT * FROM v2 WHERE NOT (doc_id % 7 = 0 AND doc_id < 100000)
    )
    SELECT lang, count(*)::BIGINT AS n_rows,
           sum(n_chars)::BIGINT AS sum_val
    FROM v3 GROUP BY lang
    """,
)
def lake_ivm_agg(spark, sf_dir):
    """INCREMENTAL AGGREGATE maintenance under RETRACTIONS
    (operators/ivm.py agg_delta_for_commit / maintain_agg_from_feed —
    the Materialize/DBToaster delta algebra, closing the IVM family's
    gap: lake_ivm_join maintains a join view, rollup_incremental
    absorbs inserts, but nothing maintained an aggregate through
    UPDATES and DELETES): a per-lang (n_rows, sum n_chars) rollup is
    folded forward through one mixed insert+update commit and one
    matched-delete commit by consuming the CHANGE FEED — deletes
    retract their OLD row (−1), updates retract old and assert new,
    zero-count groups disappear. Per commit the corpus-sized work is
    only the changed-key snapshot reads (feed-key semi-joins); the
    view/delta combine is |groups| rows. The gate LOUDLY asserts the
    maintained view equals a direct re-aggregation of the final
    snapshot before returning it; the oracle replays the final state
    relationally."""
    from poc_spark.operators.ivm import maintain_agg_from_feed
    from poc_spark.sources.lake import (
        drop_tree,
        list_versions,
        merge_full_partitioned,
        merge_upsert_partitioned,
        read_version,
        write_partitioned,
    )

    docs = _t(spark, sf_dir, "documents")
    _assert_insert_offset_free(docs, "lake_ivm_agg")
    root = _export_path("ivmaggtree", sf_dir)
    drop_tree(root)  # fresh versions every run (stale-artifact rule)
    spark.conf.set("spark.poc.lake.retain", "3")
    try:
        write_partitioned(docs, root, ["lang"])
        updates = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
            "text", F.concat("text", F.lit(" v2"))
        ).withColumn("n_chars", F.col("n_chars") + 3)
        inserts = docs.filter(F.col("doc_id") % 50 == 0).withColumn(
            "doc_id", F.col("doc_id") + 100000
        )
        merge_upsert_partitioned(
            spark, root, updates.unionByName(inserts), "doc_id", "lang"
        )
        merge_full_partitioned(
            spark,
            root,
            docs.filter(F.col("doc_id") % 7 == 0),
            "doc_id",
            "lang",
            matched_delete=F.lit(True),
        )
        vs = list_versions(root)
        if len(vs) != 3:
            raise RuntimeError(
                f"lake_ivm_agg: expected 3 retained versions, got {vs}"
            )
        maintained = maintain_agg_from_feed(
            spark, root, vs[0], vs[-1], ["doc_id"], ["lang"], "n_chars"
        )
        direct = (
            read_version(spark, root, vs[-1])
            .groupBy("lang")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("n_chars").cast("long").alias("sum_val"),
            )
        )
        got = {r["lang"]: (r["n_rows"], r["sum_val"]) for r in maintained.collect()}
        want = {r["lang"]: (r["n_rows"], r["sum_val"]) for r in direct.collect()}
        if got != want:
            raise RuntimeError(
                f"lake_ivm_agg: maintained view diverged from the "
                f"re-aggregated snapshot: {got} != {want}"
            )
        return maintained
    finally:
        spark.conf.unset("spark.poc.lake.retain")
