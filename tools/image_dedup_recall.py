"""Planted-ground-truth receipt for the perceptual image-dedup tier
(VERDICT r13 next #2): per-variant pHash Hamming margins and banded
recall/precision, measured with the SHIPPED operators (imagedup.phash64
/ phash_near_pairs) over real PNG and real JPEG containers.

Variant kinds per base image (spectral field, multimodal.py):
  reencode   — identical pixels, byte-different PNG container
  rescale    — same continuous field at 13/10 × 14/10 the raster
  downscale  — same field at 4/5 × 3/4 the raster
  jpeg       — REAL baseline-JPEG recompress of the base pixels
               (forward DCT + quantizer 20, through _jpeg_encode_blocks
               and decoded back by the real _decode_jpeg path)
  distinct   — the next base id's independent spectrum (control)

Writes IMAGE_DEDUP_RECALL.json.
Usage: python tools/image_dedup_recall.py [n_base]
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_BASE = 300


def _jpeg_recompress_gray(gray, q: int):
    """Real JPEG round-trip of an (h, w) uint8 gray plane: forward
    orthonormal DCT per 8×8 block (edge-replicated padding), uniform
    quantizer q, entropy-coded into a spec-valid baseline container
    via multimodal's own encoder."""
    import numpy as np

    from poc_spark.operators.multimodal import (
        _JPEG_ZIGZAG,
        _jpeg_encode_blocks,
        _jpeg_idct_basis,
    )

    h, w = gray.shape
    ph, pw = (h + 7) // 8 * 8, (w + 7) // 8 * 8
    padded = np.pad(gray, ((0, ph - h), (0, pw - w)), mode="edge")
    a = _jpeg_idct_basis()
    qtable = [max(1, min(255, q))] * 64
    qblocks = []
    for by in range(0, ph, 8):
        for bx in range(0, pw, 8):
            blk = padded[by : by + 8, bx : bx + 8].astype(np.float64) - 128.0
            coef = a @ blk @ a.T
            zz = [0] * 64
            for k in range(64):
                nat = _JPEG_ZIGZAG[k]
                zz[k] = int(round(coef[nat // 8, nat % 8] / qtable[k]))
            qblocks.append(zz)
    return _jpeg_encode_blocks([qblocks], w, h, qtable)


def main() -> int:
    n_base = int(sys.argv[1]) if len(sys.argv) > 1 else N_BASE

    import numpy as np
    from pyspark.sql import functions as F

    from poc_spark.operators.imagedup import phash64, phash_near_pairs
    from poc_spark.operators.multimodal import (
        _png_encode,
        _spectral_pixels,
    )
    from poc_spark.session import get_spark

    spark = get_spark("image-dedup-recall")

    # Build the corpus driver-side (bounded: n_base * ~5 small images),
    # then hash it with the SHIPPED Spark operator.
    rows = []
    for did in range(n_base):
        w, h = 36 + did % 29, 36 + (did * 3) % 23
        base_rgb = _spectral_pixels(did, w, h)
        rows.append((did * 10 + 0, did, "base", _png_encode(base_rgb, w, h, did)))
        rows.append(
            (did * 10 + 1, did, "reencode", _png_encode(base_rgb, w, h, did + 7))
        )
        w2, h2 = (w * 13) // 10, (h * 14) // 10
        rows.append(
            (
                did * 10 + 2,
                did,
                "rescale",
                _png_encode(_spectral_pixels(did, w2, h2), w2, h2, did),
            )
        )
        w3, h3 = (w * 4) // 5, (h * 3) // 4
        rows.append(
            (
                did * 10 + 3,
                did,
                "downscale",
                _png_encode(_spectral_pixels(did, w3, h3), w3, h3, did),
            )
        )
        gray = np.frombuffer(base_rgb, dtype=np.uint8).reshape(h, w, 3)[:, :, 0]
        rows.append((did * 10 + 4, did, "jpeg", _jpeg_recompress_gray(gray, 20)))
    corpus = spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 16),
        "media_id long, base_id long, kind string, payload binary",
    )
    hashes = phash64(corpus).cache()
    hmap = {
        int(r["media_id"]): int(r["phash"]) & ((1 << 64) - 1)
        for r in hashes.collect()
        if r["phash"] is not None
    }
    assert len(hmap) == 5 * n_base, "every payload must decode"

    def ham(a, b):
        return bin(a ^ b).count("1")

    dists: dict[str, list[int]] = {k: [] for k in
                                   ("reencode", "rescale", "downscale",
                                    "jpeg", "distinct")}
    for did in range(n_base):
        hb = hmap[did * 10]
        for code, kind in ((1, "reencode"), (2, "rescale"),
                           (3, "downscale"), (4, "jpeg")):
            dists[kind].append(ham(hb, hmap[did * 10 + code]))
        dists["distinct"].append(ham(hb, hmap[((did + 1) % n_base) * 10]))

    def qtiles(v):
        v = sorted(v)
        return {
            "min": v[0],
            "p50": v[len(v) // 2],
            "p90": v[int(len(v) * 0.9)],
            "max": v[-1],
        }

    # banded recall/precision vs planted truth at both production
    # settings; candidates from the SHIPPED pigeonhole banding
    settings = [
        {"max_hamming": 3, "chunks": 4},
        {"max_hamming": 7, "chunks": 8},
    ]
    truth_near = {
        kind: {
            tuple(sorted((did * 10, did * 10 + code)))
            for did in range(n_base)
        }
        for code, kind in ((1, "reencode"), (2, "rescale"),
                           (3, "downscale"), (4, "jpeg"))
    }
    out_settings = []
    for s in settings:
        pairs = {
            tuple(sorted((int(r["id_a"]), int(r["id_b"]))))
            for r in phash_near_pairs(
                hashes, max_hamming=s["max_hamming"], chunks=s["chunks"]
            ).collect()
        }
        # completeness: banding found EVERY brute-force pair at radius
        ids = sorted(hmap)
        brute = {
            (ids[i], ids[j])
            for i in range(len(ids))
            for j in range(i + 1, len(ids))
            if ham(hmap[ids[i]], hmap[ids[j]]) <= s["max_hamming"]
        }
        planted_all = set().union(*truth_near.values())
        cross_base = {
            p for p in pairs if p[0] // 10 != p[1] // 10
        }
        out_settings.append(
            {
                **s,
                "n_candidate_pairs": len(pairs),
                "banding_complete_vs_bruteforce": pairs == brute,
                "recall_by_kind": {
                    k: round(len(pairs & t) / len(t), 4)
                    for k, t in truth_near.items()
                },
                "false_merges_across_bases": len(cross_base),
                "planted_pair_share": round(
                    len(pairs & planted_all) / max(1, len(pairs)), 4
                ),
            }
        )

    # full-tail scan over the sf0.1 id range (driver-side numpy — the
    # exact arithmetic of the shipped operator): the 300-base sample
    # above misses the rescale tail; the oracled entries' radius must
    # clear the WORST planted pair over every id the driver will run
    from poc_spark.operators.imagedup import _bilinear_32, _dct32
    from poc_spark.operators.multimodal import _spectral_pixels as _sp

    def _ph_local(did, w, h):
        rgb = np.frombuffer(_sp(did, w, h), dtype=np.uint8).reshape(h, w, 3)
        gray = (
            77 * rgb[:, :, 0].astype(np.int64)
            + 150 * rgb[:, :, 1].astype(np.int64)
            + 29 * rgb[:, :, 2].astype(np.int64)
        ).astype(np.float64) / 256.0
        coef = _dct32() @ _bilinear_32(gray) @ _dct32().T
        block = coef[:8, :8].flatten()[1:]
        med = float(np.median(block))
        return sum(1 << i for i, v in enumerate(block) if v > med)

    tail_rescale = []
    tail_distinct_min = 64
    prev_base = None
    for did in range(5000):
        w, h = 36 + did % 29, 36 + (did * 3) % 23
        hb = _ph_local(did, w, h)
        hr = _ph_local(did, (w * 13) // 10, (h * 14) // 10)
        tail_rescale.append(ham(hb, hr))
        if prev_base is not None:
            tail_distinct_min = min(tail_distinct_min, ham(prev_base, hb))
        prev_base = hb

    payload = {
        "n_base": n_base,
        "n_images": 5 * n_base,
        "hamming_by_kind": {k: qtiles(v) for k, v in dists.items()},
        "tail_5000_ids": {
            "rescale": qtiles(tail_rescale),
            "distinct_consecutive_min": tail_distinct_min,
            "note": (
                "every sf0.1 planted rescale pair vs the entry radius "
                "(6): worst observed must stay below it"
            ),
        },
        "settings": out_settings,
        "note": (
            "pairs within a base triple (reencode<->rescale etc.) are "
            "planted near-dups too; false_merges_across_bases counts "
            "only cross-base candidates surviving the Hamming verify"
        ),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "IMAGE_DEDUP_RECALL.json")
    with open(out, "w") as f:
        json.dump(payload, f, indent=1)
    print(json.dumps(payload, indent=1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
