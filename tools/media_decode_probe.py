"""Media-codec throughput receipt: measure the real decode kernels
(JPEG 4:4:4, JPEG 4:2:0, PNG) over Arrow-batched mapInPandas at sf0.1
and at 4x the rows, and record images/sec, per-core cost, quarantine
counts, and the input-scaling ratio. The point for the 100 TB story:
the SPARK side (schema, partitioning, batch shape, quarantine) is
format-independent and scales with executors; the per-image Python
kernel cost is the number you'd buy back by swapping libjpeg-turbo /
libpng behind the SAME mapInPandas signature.

Usage: python tools/media_decode_probe.py [sf_dir]
Writes MEDIA_DECODE.json at the repo root.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"

    from pyspark.sql import functions as F

    from poc_spark.operators.multimodal import (
        decode_jpeg,
        decode_png,
        synthesize_jpeg420_media,
        synthesize_jpeg_media,
        synthesize_png_media,
    )
    from poc_spark.session import get_spark
    from poc_spark.sources.catalog import load_table

    spark = get_spark("media-decode-probe")
    n_cores = spark.sparkContext.defaultParallelism
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    docs4 = docs.unionByName(
        docs.select((F.col("doc_id") + 1_000_000).alias("doc_id"), "text")
    ).unionByName(
        docs.select((F.col("doc_id") + 2_000_000).alias("doc_id"), "text")
    ).unionByName(
        docs.select((F.col("doc_id") + 3_000_000).alias("doc_id"), "text")
    )

    codecs = {
        "jpeg_444": (synthesize_jpeg_media, decode_jpeg),
        "jpeg_420": (synthesize_jpeg420_media, decode_jpeg),
        "png": (synthesize_png_media, decode_png),
    }
    out: dict = {
        "sf_dir": sf_dir,
        "cores": n_cores,
        "codecs": {},
        "model": (
            "decode is mapInPandas over (media_id, payload) with a "
            "pure-Python kernel; partitions are independent, so "
            "throughput scales with executors. scaling_ratio ~1.0 "
            "(4x images, same wall) means the 1x run did NOT saturate "
            "the 32 cores — the 4x images_per_sec is the honest "
            "machine rate and the per-core rate at 4x is the per-core "
            "kernel cost to extrapolate from (e.g. ~260-300 JPEG "
            "img/s/core -> ~300k img/s on a 1000-core cluster). A "
            "production deployment swaps libjpeg-turbo/libpng into the "
            "same batch signature for another ~50-100x per core; the "
            "Spark plumbing (schema, quarantine, partitioning) is "
            "codec-agnostic."
        ),
    }
    for name, (synth, dec) in codecs.items():
        entry = {}
        for tag, d in (("1x", docs), ("4x", docs4)):
            media = synth(d)
            media = media.persist()
            n = media.count()  # materialize synthesis OUTSIDE the timing
            payload_mb = (
                media.select(
                    F.sum(F.octet_length("payload")).alias("b")
                ).collect()[0]["b"]
                / 1e6
            )
            t0 = time.perf_counter()
            res = dec(media)
            n_null = res.filter(F.col("width").isNull()).count()
            wall = time.perf_counter() - t0
            media.unpersist()
            entry[tag] = {
                "images": n,
                "payload_mb": round(payload_mb, 1),
                "wall_sec": round(wall, 2),
                "images_per_sec": round(n / wall, 0),
                "images_per_sec_per_core": round(n / wall / n_cores, 1),
                "quarantined": n_null,
            }
        entry["scaling_ratio_4x_over_1x"] = round(
            entry["4x"]["wall_sec"] / max(entry["1x"]["wall_sec"], 1e-9), 2
        )
        out["codecs"][name] = entry
        print(name, json.dumps(entry))

    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "MEDIA_DECODE.json",
    )
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print(f"wrote {path}")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
