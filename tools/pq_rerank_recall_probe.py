"""Re-rank recall receipt (VERDICT r12 #4): recall@10 of the TWO-STAGE
pq_rerank_topk (ADC shortlist of k' -> exact L2 re-rank of the
shortlist) as a function of k', against exact L2 top-10 ground truth —
the curve that justifies the FAISS serving architecture: ADC alone
saturates ~0.17-0.52 (PQ_RECALL.json 'pq' block); re-ranking a small
multiple of k recovers most of it while touching only k' float vectors.

Appends a "rerank" block to PQ_RECALL.json (the rest of the file is
left untouched).

Usage: python tools/pq_rerank_recall_probe.py [sf_dir]
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
K_PRIMES = [10, 20, 50, 100, 200]
CONFIGS = [(4, 16), (8, 16)]  # (m_sub, k_codes), both cheap-fit


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from poc_spark.operators.similarity import (
        load_pq_codebook,
        pq_encode,
        pq_rerank_topk,
        pq_train,
    )
    from poc_spark.session import get_spark
    from poc_spark.sources.catalog import load_table

    spark = get_spark("pq-rerank-recall")
    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    emb = emb.persist()
    n = emb.count()

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

    truth = {qid: set(exact_topk(qv)) for qid, qv in queries.items()}

    scratch = ".tmp/pq_rerank_recall"
    shutil.rmtree(scratch, ignore_errors=True)

    block = []
    for m_sub, k_codes in CONFIGS:
        path = f"{scratch}/pq_{m_sub}_{k_codes}"
        pq_train(
            emb, path, m_sub=m_sub, k=k_codes,
            sample_fraction=0.5, max_iter=6,
        )
        cb = load_pq_codebook(spark, path)
        codes = pq_encode(emb, cb).persist()
        codes.count()
        for kp in K_PRIMES:
            t0 = time.perf_counter()
            rec = []
            for qid, qv in queries.items():
                got = {
                    int(r["id"])
                    for r in pq_rerank_topk(
                        emb, codes, cb, qv, k=K_TOP, k_prime=kp
                    ).collect()
                }
                rec.append(len(got & truth[qid]) / K_TOP)
            block.append(
                {
                    "m_sub": m_sub,
                    "k_codes": k_codes,
                    "fit": "cheap",
                    "k_prime": kp,
                    "recall_after_rerank": round(sum(rec) / len(rec), 4),
                    "query_wall_sec_total": round(
                        time.perf_counter() - t0, 2
                    ),
                }
            )
            print(block[-1])
        codes.unpersist()

    out_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "PQ_RECALL.json",
    )
    data = json.load(open(out_path))
    data["rerank"] = block
    data["rerank_note"] = (
        "two-stage pq_rerank_topk: ADC shortlist of k' (cheap-fit codes, "
        "the contract entries' setting) then exact L2 re-rank of the "
        "shortlist only; recall@10 vs the same exact-L2 ground truth as "
        "the 'pq' block. k'=10 equals pure ADC order re-scored (exact "
        "distances can only reorder, not recover, the shortlist), so the "
        "lift over the 'pq' row is the value of over-fetching."
    )
    with open(out_path, "w") as f:
        json.dump(data, f, indent=1)
    print(f"appended rerank block to {out_path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
