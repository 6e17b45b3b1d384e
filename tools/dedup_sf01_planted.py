"""Planted-ground-truth sf0.1 coverage for the oracle-intractable
dedup-pair tier (VERDICT r13 next #4): the 8 excluded entries' DuckDB
oracles are quadratic at sf0.1, so this tool checks the SAME shipped
operator pipelines at sf0.1 against planted near-duplicates plus
linear-cost independent invariants — exactly the at-scale audit shape
(plant, assert the plants, exact-verify a stratum) that would have
caught the r7 knn-join key-type bug, which was sf0.1-only and in this
family.

Six families covered (a seventh, dedup_minhash_clusters' component
stage, is exercised inside the keep_best and cluster_report checks):

  minhash_lsh      planted exact clones (j=1.0) + 90%-prefix clones;
                   every planted pair with exact shingle-Jaccard ≥ 0.75
                   MUST be reported with the exact j; none with j < 0.7
                   may appear; organic stratum pairs exact-verified.
  simhash          planted exact clones (Hamming 0 — pigeonhole catches
                   with certainty) + a FULL brute-force of the
                   doc_id%41 stratum vs the banded output (completeness
                   is a theorem; this checks the implementation).
  embedding_cosine planted identical-vector clones inside the md5
                   half-slice (cos 1.0) + python-fold brute force of a
                   300-vector stratum vs the blocked-GEMM output.
  keep_best        synthetic 3-member clusters with distinct lengths:
                   survivor MUST be the longest member; plus a global
                   invariant — every survivor's score equals its
                   cluster's recomputed max (n_chars DESC, id ASC).
  incremental      exact corpus clones planted into the BATCH probed
                   against the persisted band index: every clone MUST
                   come back at j=1.0, and every reported pair is
                   exact-verified (linear in pairs, never all-pairs).
  cluster_report   the synthetic triples' audit rows must equal the
                   exactly-computable (n_members, n_edges, min/max
                   jaccard); organic clusters must satisfy
                   connectivity + threshold invariants.

Writes DEDUP_SF01_PLANTED_r14.json.
Usage: python tools/dedup_sf01_planted.py [sf_dir]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OFF = 1_000_000_000
KB_BASE = 2_000_000_000


def _md5_60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from poc_spark.operators.dedup import (
        dedup_clusters,
        embedding_near_pairs_blocked,
        keep_best_survivors,
        minhash_lsh_pairs,
        simhash_near_pairs,
        simhash_signatures,
        token_hash,
        word_shingles,
    )
    from poc_spark.session import get_spark
    from poc_spark.sources.catalog import load_table

    spark = get_spark("dedup-sf01-planted")
    docs = load_table(spark, sf_dir, "documents").persist()
    n_docs = docs.count()
    report: dict = {"sf_dir": sf_dir, "n_docs": n_docs}

    # ---------------- minhash_lsh ----------------
    t0 = time.perf_counter()
    stride = docs.filter(F.col("doc_id") % 101 == 0)
    exact_clones = stride.select(
        (F.col("doc_id") + OFF).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    toks = F.filter(F.split("text", r"\s+"), lambda x: F.length(x) > 0)
    cut = F.concat_ws(
        " ",
        F.slice(
            toks, 1,
            F.greatest(
                F.lit(1), (F.size(toks) * 9 / 10).cast("int")
            ),
        ),
    )
    prefix_clones = stride.select(
        (F.col("doc_id") + 2 * OFF).alias("doc_id"),
        cut.alias("text"), "lang", "source",
        F.length(cut).alias("n_chars"),
    )
    planted = docs.unionByName(exact_clones).unionByName(prefix_clones)
    pairs = minhash_lsh_pairs(
        planted, threshold=0.7, num_hashes=64, bands=16
    ).persist()
    got = {
        (int(r["id_a"]), int(r["id_b"])): float(r["jaccard"])
        for r in pairs.filter(F.col("id_b") >= OFF).collect()
    }
    # exact per-planted-pair shingle jaccard, linear (one join per pair
    # set, never all-pairs)
    sh = planted.select(
        "doc_id", word_shingles(F.col("text"), 3).alias("s")
    )
    a = sh.alias("a")
    b = sh.alias("b")
    truth = {}
    for off in (OFF, 2 * OFF):
        rows = (
            a.join(b, F.col("b.doc_id") == F.col("a.doc_id") + off)
            .select(
                F.col("a.doc_id").alias("id_a"),
                F.col("b.doc_id").alias("id_b"),
                F.round(
                    F.size(F.array_intersect("a.s", "b.s")).cast("double")
                    / F.size(F.array_union("a.s", "b.s")),
                    6,
                ).alias("j"),
            )
            .collect()
        )
        truth.update(
            {(int(r["id_a"]), int(r["id_b"])): float(r["j"]) for r in rows}
        )
    missed_strong = [
        p for p, j in truth.items() if j >= 0.75 and p not in got
    ]
    false_present = [p for p, j in truth.items() if j < 0.7 and p in got]
    value_mismatch = [
        p for p, j in truth.items() if p in got and abs(got[p] - j) > 1e-9
    ]
    soft = [p for p, j in truth.items() if 0.7 <= j < 0.75]
    report["minhash_lsh"] = {
        "planted_pairs": len(truth),
        "planted_strong": sum(1 for j in truth.values() if j >= 0.75),
        "missed_strong": len(missed_strong),
        "false_present_below_threshold": len(false_present),
        "reported_value_mismatches": len(value_mismatch),
        "borderline_0p70_0p75": {
            "n": len(soft),
            "caught": sum(1 for p in soft if p in got),
        },
        "organic_pairs_total": int(
            pairs.filter(F.col("id_b") < OFF).count()
        ),
        "wall_sec": round(time.perf_counter() - t0, 2),
        "ok": not missed_strong and not false_present and not value_mismatch,
    }
    pairs.unpersist()

    # ---------------- simhash ----------------
    t0 = time.perf_counter()
    clones = docs.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + OFF).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    planted = docs.unionByName(clones)
    out = simhash_near_pairs(
        planted, max_hamming=3, chunks=4, hash_fn="md5_60", bits=60
    ).persist()
    n_clones = clones.count()
    clone_pairs = out.filter(
        (F.col("id_b") == F.col("id_a") + OFF) & (F.col("hamming") == 0)
    ).count()
    # stratum brute force: ALL doc_id%41 signatures, driver-side
    sigs = {
        int(r["id"]): int(r["simhash"])
        for r in simhash_signatures(
            docs.filter(F.col("doc_id") % 41 == 0),
            hash_fn="md5_60", bits=60,
        ).collect()
    }
    ids = sorted(sigs)
    brute = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if bin(sigs[ids[i]] ^ sigs[ids[j]]).count("1") <= 3
    }
    stratum_got = {
        (int(r["id_a"]), int(r["id_b"]))
        for r in out.filter(
            (F.col("id_a") % 41 == 0) & (F.col("id_b") % 41 == 0)
            & (F.col("id_a") < OFF) & (F.col("id_b") < OFF)
        ).collect()
    }
    report["simhash"] = {
        "planted_clones": int(n_clones),
        "clone_pairs_caught_at_hamming0": int(clone_pairs),
        "stratum_size": len(ids),
        "stratum_bruteforce_pairs": len(brute),
        "stratum_banded_pairs": len(stratum_got),
        "stratum_equal": stratum_got == brute,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "ok": clone_pairs == n_clones and stratum_got == brute,
    }
    out.unpersist()

    # ---------------- embedding_cosine ----------------
    t0 = time.perf_counter()
    emb = load_table(spark, sf_dir, "embeddings").persist()
    slice_ids = [
        int(r["vec_id"])
        for r in emb.select("vec_id").collect()
        if _md5_60(str(int(r["vec_id"]))) % 2 == 0
    ]
    donors = [v for v in slice_ids if v % 37 == 0]
    clone_of = {}
    used = set(slice_ids)
    for v in donors:
        cid = OFF + v
        while _md5_60(str(cid)) % 2 != 0 or cid in used:
            cid += 1
        clone_of[cid] = v
        used.add(cid)
    clone_map = F.create_map(
        *[F.lit(x) for kv in clone_of.items() for x in kv]
    )
    clones = (
        emb.filter(F.col("vec_id").isin(list(clone_of.values())))
        .alias("e")
        .join(
            spark.createDataFrame(
                [(c, o) for c, o in clone_of.items()], "cid long, oid long"
            ),
            F.col("e.vec_id") == F.col("oid"),
        )
        .select(
            F.col("cid").alias("vec_id"), F.col("e.embedding").alias("embedding"),
            F.col("e.label").alias("label"),
        )
    )
    del clone_map
    planted = emb.unionByName(clones)
    half = planted.filter(
        F.pmod(token_hash(F.col("vec_id").cast("string"), "md5_60"), F.lit(2))
        == 0
    )
    out = embedding_near_pairs_blocked(half, threshold=0.4).persist()
    got_pairs = {
        (int(r["id_a"]), int(r["id_b"])): float(r["cos"])
        for r in out.collect()
    }
    planted_expect = {
        tuple(sorted((c, o))) for c, o in clone_of.items()
    }
    missed = [
        p for p in planted_expect
        if p not in got_pairs or abs(got_pairs[p] - 1.0) > 1e-9
    ]
    # stratum brute force with the exact left-assoc fold arithmetic
    svec = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]]
        for r in emb.filter(
            F.col("vec_id").isin(slice_ids[:300])
        ).collect()
    }
    sids = sorted(svec)

    def cosf(u, v):
        dot = n1 = n2 = 0.0
        for x, y in zip(u, v):
            dot += x * y
            n1 += x * x
            n2 += y * y
        import math

        return dot / (math.sqrt(n1) * math.sqrt(n2))

    borderline = 0
    brute = set()
    for i in range(len(sids)):
        for j in range(i + 1, len(sids)):
            c = cosf(svec[sids[i]], svec[sids[j]])
            if abs(c - 0.4) <= 1e-5:
                borderline += 1
                continue
            if c >= 0.4:
                brute.add((sids[i], sids[j]))
    stratum_set = set(sids)
    stratum_got = {
        p for p in got_pairs
        if p[0] in stratum_set and p[1] in stratum_set
    }
    report["embedding_cosine"] = {
        "slice_size": len(slice_ids),
        "planted_clone_pairs": len(planted_expect),
        "missed_or_wrong_value": len(missed),
        "stratum_size": len(sids),
        "stratum_bruteforce_pairs": len(brute),
        "stratum_blocked_pairs": len(stratum_got),
        "stratum_equal": stratum_got == brute,
        "borderline_skipped": borderline,
        "wall_sec": round(time.perf_counter() - t0, 2),
        "ok": not missed and stratum_got == brute,
    }
    out.unpersist()

    # ---------------- keep_best (+ cluster stage) ----------------
    t0 = time.perf_counter()
    kb_rows = []
    for g in range(30):
        base = [f"kb{g}x{i}" for i in range(150)]
        for v, ntok in ((0, 150), (1, 140), (2, 130)):
            text = " ".join(base[:ntok])
            kb_rows.append(
                (KB_BASE + g * 10 + v, text, "xx", "plant", len(text))
            )
    kb = spark.createDataFrame(
        spark.sparkContext.parallelize(kb_rows, 1),
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    planted = docs.unionByName(kb)
    pairs = minhash_lsh_pairs(planted, threshold=0.7, num_hashes=64, bands=16)
    clusters = dedup_clusters(pairs).persist()
    surv = keep_best_survivors(clusters, planted).persist()
    kb_surv = {
        int(r["cluster"]): r.asDict()
        for r in surv.filter(F.col("cluster") >= KB_BASE).collect()
    }
    bad_kb = []
    for g in range(30):
        want_cluster = KB_BASE + g * 10
        s = kb_surv.get(want_cluster)
        if (
            s is None
            or s["keep_id"] != want_cluster
            or s["n_members"] != 3
        ):
            bad_kb.append((g, s))
    # global invariant: every survivor's score is its cluster's true max
    # (n_chars DESC, id ASC), survivor count == cluster count — linear
    joined = clusters.join(
        planted.select(F.col("doc_id").alias("id"), "n_chars"), "id"
    )
    best = joined.groupBy("cluster").agg(
        F.max(
            F.struct(
                F.col("n_chars"), (-F.col("id")).alias("nid")
            )
        ).alias("m"),
        F.count("*").alias("n"),
    ).select(
        "cluster",
        F.col("m.n_chars").alias("want_score"),
        (-F.col("m.nid")).alias("want_id"),
        "n",
    )
    diff = (
        surv.join(best, "cluster", "full")
        .filter(
            (F.col("keep_id") != F.col("want_id"))
            | (F.col("keep_score") != F.col("want_score"))
            | (F.col("n_members") != F.col("n"))
            | F.col("keep_id").isNull()
            | F.col("want_id").isNull()
        )
        .count()
    )
    report["keep_best"] = {
        "planted_clusters": 30,
        "planted_failures": len(bad_kb),
        "total_clusters": int(surv.count()),
        "global_argmax_mismatches": int(diff),
        "wall_sec": round(time.perf_counter() - t0, 2),
        "ok": not bad_kb and diff == 0,
    }
    surv.unpersist()
    clusters.unpersist()

    # ---------------- incremental (batch vs persisted index) --------
    t0 = time.perf_counter()
    from poc_spark.operators.dedup import dedup_incremental, minhash_band_index

    corpus = docs.filter(F.col("doc_id") % 5 != 0)
    batch = docs.filter(F.col("doc_id") % 5 == 0)
    plants = corpus.filter(F.col("doc_id") % 103 == 0).select(
        (F.col("doc_id") + OFF).alias("doc_id"), "text", "lang", "source",
        "n_chars",
    )
    n_plants = plants.count()
    index = minhash_band_index(corpus, num_hashes=64, bands=16)
    inc = dedup_incremental(
        batch.unionByName(plants), index, corpus,
        threshold=0.7, num_hashes=64, bands=16,
    ).persist()
    planted_hits = inc.filter(
        (F.col("new_id") == F.col("old_id") + OFF)
        & (F.col("jaccard") == 1.0)
    ).count()
    # exact-verify EVERY reported pair linearly (never all-pairs)
    allrows = docs.unionByName(plants)
    sh2 = allrows.select(
        "doc_id", word_shingles(F.col("text"), 3).alias("s")
    )
    bad_pairs = (
        inc.join(
            sh2.select(F.col("doc_id").alias("new_id"),
                       F.col("s").alias("sn")), "new_id"
        )
        .join(
            sh2.select(F.col("doc_id").alias("old_id"),
                       F.col("s").alias("so")), "old_id"
        )
        .withColumn(
            "jx",
            F.round(
                F.size(F.array_intersect("sn", "so")).cast("double")
                / F.size(F.array_union("sn", "so")), 6,
            ),
        )
        .filter((F.col("jx") != F.col("jaccard")) | (F.col("jx") < 0.7))
        .count()
    )
    report["incremental"] = {
        "planted_clones_in_batch": int(n_plants),
        "planted_caught_at_j1": int(planted_hits),
        "reported_pairs_total": int(inc.count()),
        "pairs_failing_exact_verify": int(bad_pairs),
        "wall_sec": round(time.perf_counter() - t0, 2),
        "ok": planted_hits == n_plants and bad_pairs == 0,
    }
    inc.unpersist()

    # ---------------- cluster_report ----------------
    t0 = time.perf_counter()
    from poc_spark.operators.dedup import minhash_lsh_pairs as _mlp

    planted = docs.unionByName(kb)  # the keep_best synthetic triples
    pairs = _mlp(planted, threshold=0.7, num_hashes=64, bands=16)
    clusters = dedup_clusters(pairs).persist()
    mem = clusters.groupBy("cluster").agg(
        F.count(F.lit(1)).cast("long").alias("n_members")
    )
    edges = (
        pairs.join(
            clusters.select(F.col("id").alias("id_a"), "cluster"), "id_a"
        )
        .groupBy("cluster")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_edges"),
            F.min("jaccard").alias("min_jaccard"),
            F.max("jaccard").alias("max_jaccard"),
        )
    )
    rep = {
        int(r["cluster"]): r.asDict()
        for r in mem.join(edges, "cluster").collect()
    }

    # expected jaccards for the kb triples, computed exactly in python
    def _shingles(toks):
        return {
            " ".join(toks[i : i + 3]) for i in range(len(toks) - 2)
        } if len(toks) >= 3 else {" ".join(toks)}

    toks = [f"kbGxx{i}" for i in range(150)]  # group tag is irrelevant
    s150, s140, s130 = (
        _shingles(toks[:150]), _shingles(toks[:140]), _shingles(toks[:130])
    )

    def _j(a, b):
        return round(len(a & b) / len(a | b), 6)

    want_j = sorted([_j(s150, s140), _j(s150, s130), _j(s140, s130)])
    bad_reports = []
    for g in range(30):
        r = rep.get(KB_BASE + g * 10)
        if (
            r is None
            or r["n_members"] != 3
            or r["n_edges"] != 3
            or round(r["min_jaccard"], 6) != want_j[0]
            or round(r["max_jaccard"], 6) != want_j[-1]
        ):
            bad_reports.append((g, r))
    organic_bad = sum(
        1
        for c, r in rep.items()
        if c < KB_BASE
        and (
            r["n_edges"] < r["n_members"] - 1
            or r["min_jaccard"] < 0.7
            or r["n_members"] < 2
        )
    )
    report["cluster_report"] = {
        "planted_clusters": 30,
        "planted_report_mismatches": len(bad_reports),
        "expected_planted_jaccards": want_j,
        "organic_clusters": sum(1 for c in rep if c < KB_BASE),
        "organic_invariant_violations": int(organic_bad),
        "wall_sec": round(time.perf_counter() - t0, 2),
        "ok": not bad_reports and organic_bad == 0,
    }
    clusters.unpersist()

    report["all_ok"] = all(
        report[k]["ok"]
        for k in (
            "minhash_lsh", "simhash", "embedding_cosine", "keep_best",
            "incremental", "cluster_report",
        )
    )
    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "DEDUP_SF01_PLANTED_r14.json",
    )
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report, indent=1))
    spark.stop()
    return 0 if report["all_ok"] else 1


if __name__ == "__main__":
    sys.exit(main())
