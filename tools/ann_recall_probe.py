"""ANN recall receipt: measure recall@k of the two approximate batch
retrieval paths (hyperplane-LSH bucket join, IVF centroid-probe join)
against the EXACT tiled k-NN join ground truth on the sf0.1 embeddings,
across their pruning knobs, with wall clock per setting. The pytest
suite pins recall lower bounds at fixed params; this records the whole
recall/cost curve so the approximate paths are quantified, not just
bounded.

Usage: python tools/ann_recall_probe.py [sf_dir]
Writes ANN_RECALL.json at the repo root.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 5


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from poc_spark.operators.similarity import (
        ann_join_hyperplane,
        build_ivf_index,
        ivf_join,
        knn_join_tiled,
    )
    from poc_spark.session import get_spark
    from poc_spark.sources.catalog import load_table

    spark = get_spark("ann-recall-probe")
    emb = load_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    emb = emb.persist()
    n = emb.count()

    t0 = time.perf_counter()
    exact = knn_join_tiled(emb, k=K).select("id", "neighbor_id")
    exact = exact.persist()
    n_exact = exact.count()
    exact_wall = time.perf_counter() - t0

    def recall(approx) -> float:
        """fraction of exact (query, neighbor) pairs the approximate
        result reproduces — computed as one join, no driver loops."""
        hit = exact.join(
            approx.select("id", "neighbor_id"), ["id", "neighbor_id"]
        ).count()
        return hit / n_exact

    out: dict = {
        "sf_dir": sf_dir,
        "n_vectors": n,
        "k": K,
        "exact": {"wall_sec": round(exact_wall, 2), "pairs": n_exact},
        "hyperplane": [],
        "ivf": [],
        "note": (
            "recall@k vs the exact tiled GEMM join over all "
            f"{n} vectors. Both approximate paths are "
            "candidate-generation-by-bucket with exact verify, so "
            "precision is 1.0 by construction and recall is the only "
            "quality axis. The knobs trade candidate-set size (the "
            "100 TB cost driver) against recall; pytest pins lower "
            "bounds at the contract params, this file records the "
            "curve."
        ),
    }

    for n_planes, probe_bits in [(8, 0), (8, 1), (8, 2), (12, 1), (12, 2)]:
        t0 = time.perf_counter()
        approx = ann_join_hyperplane(
            emb, k=K, n_planes=n_planes, probe_bits=probe_bits
        )
        r = recall(approx)
        out["hyperplane"].append(
            {
                "n_planes": n_planes,
                "probe_bits": probe_bits,
                "recall_at_k": round(r, 4),
                "wall_sec": round(time.perf_counter() - t0, 2),
                "bucket_fraction": round(
                    sum(
                        __import__("math").comb(n_planes, b)
                        for b in range(probe_bits + 1)
                    )
                    / (1 << n_planes),
                    4,
                ),
            }
        )
        print("hyperplane", out["hyperplane"][-1])

    for n_centroids, n_probe in [(16, 1), (16, 2), (16, 4), (32, 2), (32, 4)]:
        path = f".tmp/ann_recall_ivf_{n_centroids}"
        shutil.rmtree(path, ignore_errors=True)
        build_ivf_index(emb, path, n_centroids=n_centroids)
        index_df = spark.read.parquet(f"{path}/vectors")
        cents = [
            (r["centroid_id"], list(r["center"]))
            for r in spark.read.parquet(f"{path}/centroids").collect()
        ]
        t0 = time.perf_counter()
        approx = ivf_join(index_df, cents, k=K, n_probe=n_probe)
        r = recall(approx)
        out["ivf"].append(
            {
                "n_centroids": n_centroids,
                "n_probe": n_probe,
                "recall_at_k": round(r, 4),
                "wall_sec": round(time.perf_counter() - t0, 2),
                "list_fraction": round(n_probe / n_centroids, 4),
            }
        )
        print("ivf", out["ivf"][-1])

    # --- planted near-duplicates: the retrieval case that actually
    # occurs in training-data pipelines (near-dup docs/images), where
    # the neighbor is FAR above the noise floor. One jittered copy per
    # vector (deterministic hash noise, cos(base, copy) ~ 0.99); the
    # metric is the fraction of copies whose top-k contains their base.
    jit = emb.select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"),
        F.transform(
            "embedding",
            lambda x, i: x
            + 0.1
            * (
                F.pmod(F.xxhash64(F.col("vec_id"), i), F.lit(1000)).cast(
                    "double"
                )
                / 500.0
                - 1.0
            ),
        ).alias("embedding"),
    )
    corpus = emb.unionByName(jit).persist()
    n2 = corpus.count()
    out["planted"] = []
    for tag, fn in (
        ("hyperplane n_planes=8 probe_bits=1",
         lambda: ann_join_hyperplane(corpus, k=K, n_planes=8, probe_bits=1)),
        ("hyperplane n_planes=8 probe_bits=2",
         lambda: ann_join_hyperplane(corpus, k=K, n_planes=8, probe_bits=2)),
    ):
        t0 = time.perf_counter()
        a = fn()
        hits = a.filter(
            (F.col("id") >= 1_000_000)
            & (F.col("neighbor_id") == F.col("id") - 1_000_000)
        ).count()
        out["planted"].append(
            {
                "method": tag,
                "planted_recall": round(hits / n, 4),
                "wall_sec": round(time.perf_counter() - t0, 2),
            }
        )
        print("planted", out["planted"][-1])
    ivf_path = ".tmp/ann_recall_ivf_planted"
    shutil.rmtree(ivf_path, ignore_errors=True)
    build_ivf_index(corpus, ivf_path, n_centroids=16)
    index_df = spark.read.parquet(f"{ivf_path}/vectors")
    cents = [
        (r["centroid_id"], list(r["center"]))
        for r in spark.read.parquet(f"{ivf_path}/centroids").collect()
    ]
    for n_probe in (1, 2):
        t0 = time.perf_counter()
        a = ivf_join(index_df, cents, k=K, n_probe=n_probe)
        hits = a.filter(
            (F.col("id") >= 1_000_000)
            & (F.col("neighbor_id") == F.col("id") - 1_000_000)
        ).count()
        out["planted"].append(
            {
                "method": f"ivf n_centroids=16 n_probe={n_probe}",
                "planted_recall": round(hits / n, 4),
                "wall_sec": round(time.perf_counter() - t0, 2),
            }
        )
        print("planted", out["planted"][-1])
    out["note_planted"] = (
        "the random-noise sections above are the WORST case for ANN "
        "(synthetic embeddings have median pairwise cos ~0 and p99 "
        "~0.29, so exact top-k is barely above the noise floor — "
        "there is no structure to exploit); planted_recall measures "
        "the realistic near-duplicate retrieval case (cos ~0.99 "
        "neighbor), where bucket methods are designed to operate."
    )

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "ANN_RECALL.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
