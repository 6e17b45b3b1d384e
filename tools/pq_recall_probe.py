"""PQ recall receipt (ANN_RECALL methodology extended to the product-
quantization tier): recall@k of pq_adc_topk / IVF-PQ / residual IVF-PQ
against EXACT L2 top-k ground truth on the sf0.1 embeddings, across
(m_sub, k_codes) compression points, n_probe, and residual-vs-raw —
plus the cheap-fit (sample_fraction=0.5, max_iter=6) vs full-fit
comparison that receipts the bench-wall optimization in the contract
entries. PQ is lossy by construction (64x compression at m_sub=4,
k=16 buys an undisclosed distortion); this file discloses it.

Usage: python tools/pq_recall_probe.py [sf_dir]
Writes PQ_RECALL.json at the repo root.
"""

from __future__ import annotations

import json
import math
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_TOP = 10
N_QUERIES = 20


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from poc_spark.operators.similarity import (
        build_ivf_index,
        load_ivf_index,
        load_pq_codebook,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )
    from poc_spark.session import get_spark
    from poc_spark.sources.catalog import load_table

    spark = get_spark("pq-recall-probe")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb = emb.persist()
    n = emb.count()

    # deterministic query set: every (n // N_QUERIES)-th vec_id
    stride = max(1, n // N_QUERIES)
    qids = [i * stride for i in range(N_QUERIES)]
    qrows = emb.filter(F.col("vec_id").isin(qids)).collect()
    queries = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in qrows
    }

    def exact_topk(qv: list[float]) -> list[int]:
        ql = F.array(*[F.lit(float(x)) for x in qv])
        v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        d = F.aggregate(
            F.zip_with(v, ql, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        rows = (
            emb.select(F.col("vec_id").alias("id"), d.alias("dist"))
            .orderBy("dist", "id")
            .limit(K_TOP)
            .collect()
        )
        return [int(r["id"]) for r in rows]

    t0 = time.perf_counter()
    truth = {qid: set(exact_topk(qv)) for qid, qv in queries.items()}
    exact_wall = time.perf_counter() - t0

    scratch = ".tmp/pq_recall"
    shutil.rmtree(scratch, ignore_errors=True)

    def recall_of(result_ids_by_q: dict[int, list[int]]) -> float:
        r = [
            len(set(ids) & truth[qid]) / K_TOP
            for qid, ids in result_ids_by_q.items()
        ]
        return round(sum(r) / len(r), 4)

    out: dict = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "k": K_TOP,
        "n_queries": len(queries),
        "exact_wall_sec": round(exact_wall, 2),
        "pq": [],
        "ivfpq_raw": [],
        "ivfpq_residual": [],
        "note": (
            "recall@10 vs exact L2 top-10 over the full corpus, mean of "
            f"{len(queries)} strided queries. 'pq' scans ALL codes "
            "(compression only); 'ivfpq_*' also prunes to n_probe of 16 "
            "lists, so its recall is bounded by the IVF probe recall. "
            "fit='cheap' is the contract entries' bench setting "
            "(sample_fraction=0.5, max_iter=6); fit='full' is "
            "(None, 20). compression = 64 floats (256 B as float32) "
            "vs m_sub*ceil(log2(k_codes))/8 bytes of codes."
        ),
    }

    # ---- pure PQ (no list pruning): compression/recall curve ----
    for m_sub, k_codes, fit in [
        (4, 16, "cheap"),
        (4, 16, "full"),
        (8, 16, "cheap"),
        (4, 64, "cheap"),
        (8, 64, "cheap"),
        (16, 64, "cheap"),
    ]:
        path = f"{scratch}/pq_{m_sub}_{k_codes}_{fit}"
        kw = (
            {"sample_fraction": 0.5, "max_iter": 6}
            if fit == "cheap"
            else {"sample_fraction": None, "max_iter": 20}
        )
        t0 = time.perf_counter()
        pq_train(emb, path, m_sub=m_sub, k=k_codes, **kw)
        fit_wall = time.perf_counter() - t0
        cb = load_pq_codebook(spark, path)
        codes = pq_encode(emb, cb).persist()
        codes.count()
        t0 = time.perf_counter()
        got = {
            qid: [
                int(r["id"])
                for r in pq_adc_topk(codes, cb, qv, K_TOP).collect()
            ]
            for qid, qv in queries.items()
        }
        q_wall = time.perf_counter() - t0
        codes.unpersist()
        bits = m_sub * max(1, math.ceil(math.log2(k_codes)))
        out["pq"].append(
            {
                "m_sub": m_sub,
                "k_codes": k_codes,
                "fit": fit,
                "recall": recall_of(got),
                "code_bits": bits,
                "compression_x": round(64 * 32 / bits, 1),
                "fit_wall_sec": round(fit_wall, 2),
                "query_wall_sec_total": round(q_wall, 2),
            }
        )
        print("pq", out["pq"][-1], flush=True)

    # ---- IVF-PQ raw and residual: probe curve at m_sub=4, k=16 ----
    ivf_path = f"{scratch}/ivf"
    build_ivf_index(emb, ivf_path, n_centroids=16)
    vectors, cents = load_ivf_index(spark, ivf_path)
    vectors = vectors.persist()
    vectors.count()

    def probe_lists(qv: list[float], n_probe: int) -> list[int]:
        qn = math.sqrt(sum(x * x for x in qv))
        scored = sorted(
            (
                (
                    cid,
                    sum(a * b for a, b in zip(qv, c))
                    / (qn * math.sqrt(sum(x * x for x in c)) or 1.0),
                )
                for cid, c in cents
            ),
            key=lambda t: (-t[1], t[0]),
        )
        return [cid for cid, _ in scored[:n_probe]]

    # raw codes over all vectors, centroid kept for list filtering
    raw_path = f"{scratch}/pq_raw"
    pq_train(emb, raw_path, m_sub=4, k=16, sample_fraction=0.5, max_iter=6)
    raw_cb = load_pq_codebook(spark, raw_path)
    raw_codes = pq_encode(
        vectors, raw_cb, keep_cols=("centroid",)
    ).persist()
    raw_codes.count()

    # residual codes (FAISS form): PQ over v - center(assigned)
    from poc_spark.operators.similarity import ivfpq_residual_topk

    centers_lit = F.array(
        *[
            F.array(*[F.lit(float(x)) for x in c])
            for _, c in sorted(cents)
        ]
    )
    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    res_all = vectors.select(
        "vec_id",
        "centroid",
        F.zip_with(
            v,
            F.element_at(centers_lit, F.col("centroid").cast("int") + 1),
            lambda a, b: a - b,
        ).alias("res"),
    ).persist()
    res_all.count()
    res_path = f"{scratch}/pq_res"
    # r15: matches the entry's pin — the residual PQ train keeps the
    # DISTRIBUTED k-means|| fit (local Lloyd measured 0.18-0.205 vs
    # 0.225 at n_probe=4 on residual geometry; see sim_ivfpq_residual)
    spark.conf.set("spark.poc.sim.localFitMaxRows", "0")
    try:
        pq_train(
            res_all, res_path, m_sub=4, k=16, vec_col="res",
            sample_fraction=0.5, max_iter=6,
        )
    finally:
        spark.conf.unset("spark.poc.sim.localFitMaxRows")
    res_cb = load_pq_codebook(spark, res_path)
    res_codes = pq_encode(
        res_all, res_cb, "res", "vec_id", keep_cols=("centroid",)
    ).persist()
    res_codes.count()

    for n_probe in (2, 4, 8, 16):
        t0 = time.perf_counter()
        got_raw = {}
        for qid, qv in queries.items():
            probe = probe_lists(qv, n_probe)
            cand = raw_codes.filter(F.col("centroid").isin(probe))
            got_raw[qid] = [
                int(r["id"])
                for r in pq_adc_topk(cand, raw_cb, qv, K_TOP).collect()
            ]
        raw_wall = time.perf_counter() - t0
        out["ivfpq_raw"].append(
            {
                "n_probe": n_probe,
                "recall": recall_of(got_raw),
                "query_wall_sec_total": round(raw_wall, 2),
            }
        )
        print("ivfpq_raw", out["ivfpq_raw"][-1], flush=True)

        t0 = time.perf_counter()
        got_res = {}
        for qid, qv in queries.items():
            probe = probe_lists(qv, n_probe)
            got_res[qid] = [
                int(r["id"])
                for r in ivfpq_residual_topk(
                    res_codes, res_cb, cents, qv, probe, K_TOP
                ).collect()
            ]
        res_wall = time.perf_counter() - t0
        out["ivfpq_residual"].append(
            {
                "n_probe": n_probe,
                "recall": recall_of(got_res),
                "query_wall_sec_total": round(res_wall, 2),
            }
        )
        print("ivfpq_residual", out["ivfpq_residual"][-1], flush=True)

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, "PQ_RECALL.json"), "w") as f:
        json.dump(out, f, indent=1)
    print("wrote PQ_RECALL.json")
    return 0


if __name__ == "__main__":
    sys.exit(main())
