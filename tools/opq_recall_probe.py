"""OPQ recall receipt (VERDICT r13 next #6): recall@10 of ADC over
OPQ-rotated codes vs raw-PQ codes at the same bit budget (16 and 32
bits), against exact L2 top-10 ground truth — Ge et al.'s claim that a
learned rotation buys recall at fixed code budget, measured honestly
on this corpus. Also reports recall after a k'=50 exact re-rank of
each shortlist (the serving configuration).

Appends an "opq" block to PQ_RECALL.json.
Usage: python tools/opq_recall_probe.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K_TOP = 10
N_QUERIES = 20
CONFIGS = [(4, 16), (8, 16)]  # (m_sub, k_codes) = 16 / 32 bits


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from poc_spark.operators.similarity import (
        load_opq_rotation,
        load_pq_codebook,
        opq_encode,
        pq_adc_topk,
        pq_encode,
        pq_rerank_topk,
        pq_train,
        opq_train,
        rotate_query,
    )
    from poc_spark.session import get_spark
    from poc_spark.sources.catalog import load_table

    spark = get_spark("opq-recall")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    ).persist()
    n = emb.count()

    stride = max(1, n // N_QUERIES)
    qids = [i * stride for i in range(N_QUERIES)]
    qrows = emb.filter(F.col("vec_id").isin(qids)).collect()
    queries = {
        int(r["vec_id"]): [float(x) for x in r["embedding"]] for r in qrows
    }

    def exact_topk(qv):
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

    truth = {qid: set(exact_topk(qv)) for qid, qv in queries.items()}
    scratch = ".tmp/opq_recall"
    shutil.rmtree(scratch, ignore_errors=True)

    block = []
    for m_sub, k_codes in CONFIGS:
        bits = m_sub * 4
        # raw PQ baseline
        pq_path = f"{scratch}/pq_{m_sub}"
        pq_train(emb, pq_path, m_sub=m_sub, k=k_codes,
                 sample_fraction=0.5, max_iter=6)
        cb_pq = load_pq_codebook(spark, pq_path)
        codes_pq = pq_encode(emb, cb_pq).persist()
        codes_pq.count()
        # OPQ
        opq_path = f"{scratch}/opq_{m_sub}"
        opq_train(emb, opq_path, m_sub=m_sub, k=k_codes,
                  n_iter=6, sample_rows=4096)
        rot = load_opq_rotation(spark, opq_path)
        cb_opq = load_pq_codebook(spark, opq_path)
        codes_opq = opq_encode(emb, rot, cb_opq).persist()
        codes_opq.count()
        t0 = time.perf_counter()
        res = {"pq_adc": [], "opq_adc": [], "pq_rerank50": [],
               "opq_rerank50": []}
        for qid, qv in queries.items():
            qr = rotate_query(rot, qv)
            got_pq = {int(r["id"])
                      for r in pq_adc_topk(codes_pq, cb_pq, qv, K_TOP
                                           ).collect()}
            got_opq = {int(r["id"])
                       for r in pq_adc_topk(codes_opq, cb_opq, qr, K_TOP
                                            ).collect()}
            rr_pq = {int(r["id"])
                     for r in pq_rerank_topk(emb, codes_pq, cb_pq, qv,
                                             k=K_TOP, k_prime=50).collect()}
            # OPQ re-rank: shortlist by rotated ADC, exact re-rank in
            # the ORIGINAL space (L2 is rotation-invariant)
            from poc_spark.operators.similarity import pq_adc_topk as _adc
            sl = _adc(codes_opq, cb_opq, qr, 50).select("id")
            ql = F.array(*[F.lit(float(x)) for x in qv])
            v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
            d = F.aggregate(
                F.zip_with(v, ql, lambda a, b: (a - b) * (a - b)),
                F.lit(0.0), lambda acc, x: acc + x,
            )
            rr_opq = {
                int(r["id"])
                for r in emb.join(
                    F.broadcast(sl.withColumnRenamed("id", "_sl")),
                    F.col("vec_id") == F.col("_sl"),
                )
                .select(F.col("vec_id").alias("id"),
                        F.round(d, 6).alias("dist"))
                .orderBy("dist", "id")
                .limit(K_TOP)
                .collect()
            }
            t = truth[qid]
            res["pq_adc"].append(len(got_pq & t) / K_TOP)
            res["opq_adc"].append(len(got_opq & t) / K_TOP)
            res["pq_rerank50"].append(len(rr_pq & t) / K_TOP)
            res["opq_rerank50"].append(len(rr_opq & t) / K_TOP)
        block.append(
            {
                "bits": bits,
                "m_sub": m_sub,
                "k_codes": k_codes,
                "fit": "pq cheap-fit / opq driver-local 6 rounds",
                **{
                    k: round(sum(v) / len(v), 4) for k, v in res.items()
                },
                "wall_sec": round(time.perf_counter() - t0, 2),
            }
        )
        print(block[-1])
        codes_pq.unpersist()
        codes_opq.unpersist()

    # ---- planted anisotropy: the regime OPQ exists for ----
    # The corpus embeddings are near-uniform (rotation-invariant), so
    # the block above is expected to be a wash. To prove the
    # IMPLEMENTATION recovers what rotation can recover, build an
    # anisotropic twin: scale dims by a decaying spectrum, then mix
    # with a fixed scrambling rotation Q — raw PQ's coordinate-order
    # split now straddles the principal directions; OPQ should undo Q.
    import numpy as np

    rng = np.random.RandomState(42)
    Q, _ = np.linalg.qr(rng.randn(64, 64))
    scales = 0.85 ** np.arange(64)
    rows = emb.collect()
    ids = [int(r["vec_id"]) for r in rows]
    X = np.array([[float(x) for x in r["embedding"]] for r in rows])
    Xa = (X * scales[None, :]) @ Q.T
    aniso = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in zip(ids, Xa)],
        "vec_id long, embedding array<double>",
    ).persist()
    aniso.count()

    def exact_topk_aniso(qv):
        ql = F.array(*[F.lit(float(x)) for x in qv])
        v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
        d = F.aggregate(
            F.zip_with(v, ql, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        return [
            int(r["id"])
            for r in aniso.select(
                F.col("vec_id").alias("id"), d.alias("dist")
            ).orderBy("dist", "id").limit(K_TOP).collect()
        ]

    qa = {qid: [float(x) for x in Xa[ids.index(qid)]] for qid in queries}
    truth_a = {qid: set(exact_topk_aniso(qv)) for qid, qv in qa.items()}
    aniso_block = []
    for m_sub, k_codes in CONFIGS:
        pq_path = f"{scratch}/apq_{m_sub}"
        pq_train(aniso, pq_path, m_sub=m_sub, k=k_codes,
                 sample_fraction=0.5, max_iter=6)
        cb_pq = load_pq_codebook(spark, pq_path)
        codes_pq = pq_encode(aniso, cb_pq).persist()
        codes_pq.count()
        opq_path = f"{scratch}/aopq_{m_sub}"
        opq_train(aniso, opq_path, m_sub=m_sub, k=k_codes,
                  n_iter=6, sample_rows=4096)
        rot = load_opq_rotation(spark, opq_path)
        cb_opq = load_pq_codebook(spark, opq_path)
        codes_opq = opq_encode(aniso, rot, cb_opq).persist()
        codes_opq.count()
        r_pq, r_opq = [], []
        for qid, qv in qa.items():
            got_pq = {int(r["id"]) for r in pq_adc_topk(
                codes_pq, cb_pq, qv, K_TOP).collect()}
            got_opq = {int(r["id"]) for r in pq_adc_topk(
                codes_opq, cb_opq, rotate_query(rot, qv), K_TOP).collect()}
            r_pq.append(len(got_pq & truth_a[qid]) / K_TOP)
            r_opq.append(len(got_opq & truth_a[qid]) / K_TOP)
        aniso_block.append({
            "bits": m_sub * 4, "m_sub": m_sub, "k_codes": k_codes,
            "pq_adc": round(sum(r_pq) / len(r_pq), 4),
            "opq_adc": round(sum(r_opq) / len(r_opq), 4),
        })
        print("aniso", aniso_block[-1])
        codes_pq.unpersist()
        codes_opq.unpersist()

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PQ_RECALL.json",
    )
    data = json.load(open(out_path))
    data["opq"] = block
    data["opq_aniso"] = aniso_block
    data["opq_aniso_note"] = (
        "same corpus scaled by a 0.85^i spectrum and mixed by a fixed "
        "scrambling rotation Q — the anisotropic regime OPQ (Ge et al.) "
        "targets; raw PQ's coordinate split straddles the principal "
        "directions, OPQ learns to undo Q. recall@10, ADC only."
    )
    data["opq_note"] = (
        "OPQ (learned orthonormal rotation, Ge et al. 2014) vs raw PQ "
        "at the same bit budget, ADC-only and with k'=50 exact re-rank; "
        "recall@10 vs exact L2 ground truth, 20 strided queries. "
        "Synthetic near-uniform embeddings are close to rotation-"
        "invariant, so gains here are a floor, not a ceiling."
    )
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"appended opq block to {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
