"""Fuzzy string matching: edit-distance join via PassJoin-style
segment blocking (Li, Deng, Feng — "PASS-JOIN: a partition-based
method for similarity joins", PVLDB 2011).

The record-linkage primitive of metadata cleaning: near-identical
author names / titles / URLs that exact dedup can't see. All-pairs
levenshtein is quadratic; the sound blocking here is the pigeonhole
lemma — partition each indexed string into k+1 segments; any string
within edit distance k must contain at least one of those segments
EXACTLY, at a position shifted by at most k. Candidates come from an
equi-join on (indexed-length, segment-index, segment-text); only
candidates pay the levenshtein verify (Spark's builtin — JVM codegen).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _seg_len(length: Column, i: Column, k: int) -> Column:
    """Length of segment i when a string of `length` chars splits into
    k+1 even parts — the first (length mod (k+1)) segments take the
    extra char."""
    n = F.lit(k + 1)
    return ((length / n).cast("int") + F.when(i < length % n, 1).otherwise(0)).cast(
        "int"
    )


def _seg_start(length: Column, i: Column, k: int) -> Column:
    """0-based start of segment i = i*floor(L/n) + min(i, L mod n)."""
    n = F.lit(k + 1)
    return (i * (length / n).cast("int") + F.least(i, length % n)).cast("int")


def _fastss_pairs(base: DataFrame, k: int = 1) -> DataFrame:
    """All pairs (id_a < id_b, dist ≤ 1) via DELETION-NEIGHBORHOOD
    blocking (the FastSS family — Bocek et al., "Fast Similarity
    Search in Large Dictionaries", 2007): each string keys on xxhash64
    of itself and of each single-character deletion; two strings at
    edit distance ≤ 1 share a key (equal → identity key; substitution
    → deletion at the differing position; insert/delete → the longer
    side's deletion IS the shorter string). Complete for k = 1 only.

    Why it exists next to PassJoin (r14 opt): on real identifier-like
    name data ("Customer#000000042") PassJoin's first segment is a
    shared constant prefix, so its candidate set degenerates toward
    all same-length pairs (~2.3M candidate ids on the sf0.1 entity
    stratum); deletion keys differ wherever the strings differ, so
    candidates stay near the true-pair count (~10³). Keys are 8-byte
    hashes — L+1 per string, so the blocking relation is
    O(corpus × length); the `fastssMaxLen` dispatch bound in
    edit_distance_join keeps it off long-string corpora where
    PassJoin's constant 18-row probe grid wins. Hash collisions only
    add candidates; the exact levenshtein verify removes them."""
    s = F.col("s")
    dels = F.transform(
        F.sequence(F.lit(1), F.col("len")),
        lambda i: F.xxhash64(
            F.concat(
                F.substring(s, F.lit(1), i - 1),
                F.substring(s, i + 1, F.col("len") - i),
            )
        ),
    )
    keys = F.array_distinct(
        F.concat(
            F.when(F.col("len") > 0, dels).otherwise(
                F.array().cast("array<bigint>")
            ),
            F.array(F.xxhash64(s)),
        )
    )
    rows = base.select(F.col("id"), F.explode(keys).alias("key"))
    cand_ids = (
        rows.alias("a")
        .join(
            rows.alias("b"),
            (F.col("a.key") == F.col("b.key"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    names = base.select("id", "s")
    dist = F.levenshtein(F.col("s_a"), F.col("s_b"))
    return (
        cand_ids.join(
            names.select(F.col("id").alias("id_a"), F.col("s").alias("s_a")),
            "id_a",
        )
        .join(
            names.select(F.col("id").alias("id_b"), F.col("s").alias("s_b")),
            "id_b",
        )
        .filter(dist <= F.lit(k))
        .select("id_a", "id_b", dist.cast("long").alias("dist"))
    )


def edit_distance_join(
    df: DataFrame,
    k: int = 2,
    text_col: str = "name",
    id_col: str = "id",
) -> DataFrame:
    """All pairs (id_a < id_b, dist) with levenshtein(text_a, text_b)
    ≤ k, found via PassJoin segment blocking — never all-pairs.

    Plan: the index side explodes each string into its k+1 segments,
    keyed by (own-length, segment-index, segment-text); the probe side
    explodes each string over candidate indexed lengths |b|-k..|b|+k ×
    segment indexes × position shifts -k..+k, extracting the substring
    the matching segment would occupy. An EQUI-join on those keys
    yields candidates (probe explode factor ≤ (2k+1)²(k+1), a
    constant); only candidates run the levenshtein verify, placed LAST
    in the conjunction after the id order (the measured conjunct-order
    rule). The pigeonhole lemma holds in both orientations, so keeping
    only id_a < id_b post-join loses nothing.

    Strings shorter than 2k+1 chars can defeat the pigeonhole (k edits
    can erase every 1-char segment), so the SHORT stratum — a bounded,
    rare set in real name/title data — falls back to a
    length-band-blocked exact verify, as does the short×long cross
    stratum. Sound overall: equality with the quadratic form is pinned
    in tests and against the DuckDB all-pairs oracle."""
    base = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("s"),
        F.length(F.col(text_col)).cast("int").alias("len"),
    ).filter(F.col("s").isNotNull())
    # ADAPTIVE k=1 strategy (r14 opt): deletion-neighborhood blocking
    # (_fastss_pairs) replaces PassJoin when every string is short
    # enough that L+1 deletion keys beat the constant 18-row probe
    # grid AND the prefix-degeneracy risk — identifier-like name data
    # is exactly this stratum, and PassJoin's candidate set there
    # degenerates toward all same-length pairs (docstring of
    # _fastss_pairs; measured 4.0 s → sub-second on the entity
    # pipeline's 2,143-name sf0.1 stratum, identical pairs). The max-
    # length probe is one cheap agg over the name relation; conf
    # spark.poc.fuzzy.k1Strategy ∈ {auto, fastss, passjoin} forces
    # either path (the forced sweep exercises passjoin), and
    # spark.poc.fuzzy.fastssMaxLen bounds the auto dispatch.
    if k == 1:
        spark = df.sparkSession
        strategy = spark.conf.get("spark.poc.fuzzy.k1Strategy", "auto")
        if strategy == "fastss":
            return _fastss_pairs(base, k)
        if strategy == "auto":
            max_len = int(
                spark.conf.get("spark.poc.fuzzy.fastssMaxLen", "64")
            )
            mx = base.agg(F.max("len")).first()[0]
            if mx is not None and mx <= max_len:
                return _fastss_pairs(base, k)
    long_side = base.filter(F.col("len") >= 2 * k + 1)
    short_side = base.filter(F.col("len") < 2 * k + 1)

    # index side: k+1 segments per string, keyed by (len_a, i, seg)
    seg_structs = F.transform(
        F.sequence(F.lit(0), F.lit(k)),
        lambda i: F.struct(
            i.cast("int").alias("i"),
            F.substring(
                F.col("s"),
                _seg_start(F.col("len"), i, k) + 1,
                _seg_len(F.col("len"), i, k),
            ).alias("seg"),
        ),
    )
    idx = long_side.select(
        F.col("id").alias("id_a"),
        F.col("len").alias("len_a"),
        F.explode(seg_structs).alias("g"),
    ).select("id_a", "len_a", F.col("g.i").alias("i"), F.col("g.seg").alias("seg"))

    # probe side: (la, i, d) grid per string; substring at the shifted
    # expected position, kept only when fully inside the string
    grid = F.flatten(
        F.transform(
            F.sequence(F.col("len") - F.lit(k), F.col("len") + F.lit(k)),
            lambda la: F.flatten(
                F.transform(
                    F.sequence(F.lit(0), F.lit(k)),
                    lambda i: F.transform(
                        F.sequence(F.lit(-k), F.lit(k)),
                        lambda d: F.struct(
                            la.cast("int").alias("la"),
                            i.cast("int").alias("i"),
                            d.cast("int").alias("d"),
                        ),
                    ),
                )
            ),
        )
    )
    la = F.col("cand.la")
    i_ = F.col("cand.i")
    start = _seg_start(la, i_, k) + F.col("cand.d")
    slen = _seg_len(la, i_, k)
    probe = (
        long_side.select(
            F.col("id").alias("id_b"),
            F.col("s").alias("s_b"),
            F.col("len").alias("len_b"),
            F.explode(grid).alias("cand"),
        )
        .filter(
            (la >= 2 * k + 1)
            & (start >= 0)
            & (start + slen <= F.col("len_b"))
        )
        .select(
            "id_b",
            la.alias("len_a"),
            i_.alias("i"),
            F.substring(F.col("s_b"), start + 1, slen).alias("seg"),
        )
    )

    # candidates narrow to ID PAIRS before the dedupe: real name data
    # has constant prefixes ("Customer#..."), which makes one segment
    # collide for every same-length pair — the candidate set degenerates
    # toward all-pairs, and a distinct over rows CARRYING both strings
    # shuffles the strings once per duplicate candidate (measured ~17 s
    # at sf0.1). Dedupe 16-byte id pairs instead (id_a < id_b first —
    # the lemma holds in both orientations, so half the rows), then
    # attach the two strings back with ordinary hash joins (AQE
    # broadcasts the name table when it is small) and verify last.
    cand_ids = (
        idx.join(probe, ["len_a", "i", "seg"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    names = long_side.select("id", "s")
    dist = F.levenshtein(F.col("s_a"), F.col("s_b"))
    long_pairs = (
        cand_ids.join(names.select(F.col("id").alias("id_a"), F.col("s").alias("s_a")), "id_a")
        .join(names.select(F.col("id").alias("id_b"), F.col("s").alias("s_b")), "id_b")
        .filter(dist <= F.lit(k))
        .select("id_a", "id_b", dist.cast("long").alias("dist"))
    )

    # short stratum + short×long cross: LENGTH-band block, expressed as
    # an EQUI-join (one side explodes its ±k band, the other joins on
    # its own length) so the planner builds a hash join, never a
    # BroadcastNestedLoopJoin — a pair at |Δlen| ≤ k matches for
    # exactly one exploded delta, so no duplicates. Verify stays LAST
    # in the condition (conjunct-order rule).
    sa_band = short_side.select(
        F.col("id").alias("id_a"),
        F.col("s").alias("s_a"),
        F.explode(
            F.sequence(F.col("len") - F.lit(k), F.col("len") + F.lit(k))
        ).alias("band_len"),
    )
    sb = short_side.alias("sb")
    short_dist = F.levenshtein(F.col("s_a"), F.col("sb.s"))
    short_pairs = sa_band.join(
        sb,
        (F.col("band_len") == F.col("sb.len"))
        & (F.col("id_a") < F.col("sb.id"))
        & (short_dist <= F.lit(k)),
    ).select(
        "id_a",
        F.col("sb.id").alias("id_b"),
        short_dist.cast("long").alias("dist"),
    )
    lb = long_side.alias("lb")
    cx_dist = F.levenshtein(F.col("s_a"), F.col("lb.s"))
    cross = sa_band.join(
        lb,
        (F.col("band_len") == F.col("lb.len")) & (cx_dist <= F.lit(k)),
    ).select(
        F.least(F.col("id_a"), F.col("lb.id")).alias("id_a"),
        F.greatest(F.col("id_a"), F.col("lb.id")).alias("id_b"),
        cx_dist.cast("long").alias("dist"),
    )
    return long_pairs.unionByName(short_pairs).unionByName(cross)
