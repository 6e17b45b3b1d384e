"""Perceptual image near-duplicate detection — the standard image-dedup
stage of multimodal pretraining pipelines (LAION-style): a 64-bit DCT
pHash over DECODED pixels + Hamming-radius candidate generation via
pigeonhole banding (dedup.hamming_band_pairs — the SimHash machinery,
signature-agnostic).

pHash (public algorithm, as popularized by the pHash.org DCT hash and
imagehash's `phash`): decode → grayscale (BT.601 weights) → bilinear
resample to 32×32 → 2-D DCT-II → keep the low 8×8 coefficient block
minus DC → threshold each coefficient against the block median → 64
bits. Identical pixels hash identically; rescales/recompressions move
a few bits; distinct images land ~32 bits apart (IMAGE_DEDUP_RECALL
receipt measures the margins on planted variants).

Spark-first shape: the hash is computed INSIDE the Arrow-batched
decode lane (mapInPandas — codec work is the one place Python is
unavoidable, same story as multimodal.decode_png); everything after
the hash is a LONG column, so candidate generation, Hamming verify,
and clustering run as codegen'd joins/aggregations on 8 bytes per
image — the corpus's pixel bytes are touched exactly once.

Reference parity: the reference has no media pipeline at all (SURVEY
§2.1; backend/main.py:232-417 is chat-text analytics) — this is part
of the 100 TB multimodal extension surface (VERDICT r13 missing #2).
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from poc_spark.operators.dedup import dedup_clusters, hamming_band_pairs
from poc_spark.operators.multimodal import _decode_jpeg, _decode_png

PHASH_SCHEMA = "media_id long, width int, height int, phash long"

_DCT32 = None


def _dct32():
    """32-point DCT-II basis (rows = frequencies). Unnormalized —
    the hash compares coefficients to their own median, so any
    frequency-uniform scale cancels (the DC row's 2× scale never
    enters: DC is excluded from the block)."""
    global _DCT32
    if _DCT32 is None:
        import numpy as np

        k = np.arange(32, dtype=np.float64)[:, None]
        i = np.arange(32, dtype=np.float64)[None, :]
        _DCT32 = np.cos((2 * i + 1) * k * math.pi / 64.0)
    return _DCT32


def _bilinear_32(gray):
    """Bilinear resample an (h, w) float plane to 32×32, sampling at
    destination-pixel centers mapped into source space (the standard
    align-corners=False convention) — smooth under re-rasterization,
    unlike nearest-neighbor's aliasing."""
    import numpy as np

    h, w = gray.shape

    def axis(n_src):
        pos = (np.arange(32) + 0.5) * n_src / 32.0 - 0.5
        lo = np.clip(np.floor(pos).astype(np.int64), 0, n_src - 1)
        hi = np.clip(lo + 1, 0, n_src - 1)
        return lo, hi, np.clip(pos - lo, 0.0, 1.0)

    rlo, rhi, rf = axis(h)
    clo, chi, cf = axis(w)
    top = gray[rlo][:, clo] * (1 - cf) + gray[rlo][:, chi] * cf
    bot = gray[rhi][:, clo] * (1 - cf) + gray[rhi][:, chi] * cf
    return top * (1 - rf[:, None]) + bot * rf[:, None]


def _phash_one(payload: bytes):
    """(width, height, phash signed-64) for one PNG or JPEG payload
    (container sniffed by signature), or (None, None, None) on any
    corruption — quarantine, never a task failure."""
    import numpy as np

    if payload is None:
        return None, None, None
    buf = bytes(payload)
    if buf[:8] == b"\x89PNG\r\n\x1a\n":
        d = _decode_png(buf)
        if d is None:
            return None, None, None
        w, h, _, ctype, recon = d
        bpp = 3 if ctype == 2 else 1
        px = np.frombuffer(recon, dtype=np.uint8).reshape(h, w, bpp)
    elif buf[:2] == b"\xff\xd8":
        d = _decode_jpeg(buf)
        if d is None:
            return None, None, None
        w, h, nc, raw = d
        px = np.frombuffer(raw, dtype=np.uint8).reshape(h, w, nc)
    else:
        return None, None, None
    if px.shape[2] == 3:
        gray = (
            77 * px[:, :, 0].astype(np.int64)
            + 150 * px[:, :, 1].astype(np.int64)
            + 29 * px[:, :, 2].astype(np.int64)
        ).astype(np.float64) / 256.0
    else:
        gray = px[:, :, 0].astype(np.float64)
    small = _bilinear_32(gray)
    d32 = _dct32()
    coef = d32 @ small @ d32.T
    block = coef[:8, :8].flatten()[1:]  # 63 low-freq coefficients, no DC
    med = float(np.median(block))
    bits = 0
    for i, v in enumerate(block):
        if v > med:
            bits |= 1 << i
    if bits >= 1 << 63:  # two's-complement into a Spark LONG
        bits -= 1 << 64
    return w, h, bits


def phash64(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(media_id, width, height, phash) — 64-bit perceptual hash per
    image payload, computed in one Arrow-batched pass over the decode
    lane. Corrupt/NULL/unknown-container payloads degrade to all-null
    rows (the multimodal quarantine convention), so one torn blob
    never fails a 100 TB scan. Downstream, the corpus is 8 bytes per
    image: candidate generation and verification never touch pixels
    again."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = [
                (mid, *_phash_one(payload))
                for mid, payload in zip(pdf[id_col], pdf[payload_col])
            ]
            yield pd.DataFrame(
                rows, columns=["media_id", "width", "height", "phash"]
            )

    return df.select(
        F.col(id_col).alias(id_col), F.col(payload_col)
    ).mapInPandas(batches, schema=PHASH_SCHEMA)


def phash_near_pairs(
    hashes: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """(id_a < id_b, hamming ≤ max_hamming) over pHash signatures via
    pigeonhole banding — complete recall for max_hamming < chunks, a
    bucket join never all-pairs (see hamming_band_pairs for the piece-
    width vs bucket-occupancy scale tradeoff; 4×16-bit chunks is the
    radius-≤3 production setting: 65 536 buckets per chunk)."""
    # barrier before the banding SELF-join: without it each join side
    # re-executes the whole upstream (decode + hash — the multi-leg
    # recompute trap); the checkpointed frame is 8 bytes + id per image
    sigs = hashes.filter(F.col(hash_col).isNotNull()).localCheckpoint(
        eager=False
    )
    return hamming_band_pairs(
        sigs, max_hamming, chunks, 64, id_col=id_col, sig_col=hash_col
    )


def phash_band_index(
    hashes: DataFrame,
    chunks: int = 8,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """(chunk, piece, id, phash) — the persisted pHash BAND INDEX for
    continuous ingestion (dedup.minhash_band_index's image twin): one
    row per (image, chunk), bucketed by the chunk's bit piece. An
    incoming batch probes it with an equi-join instead of re-pairing
    the corpus; write it partitioned/bucketed by (chunk, piece) at
    scale so probes prune to touched buckets."""
    width = 64 // chunks
    mask = (1 << width) - 1
    sigs = hashes.filter(F.col(hash_col).isNotNull())
    return sigs.select(
        F.col(id_col).alias("id"),
        F.col(hash_col).alias("phash"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(F.col(hash_col), c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("piece"),
                    )
                    for c in range(chunks)
                ]
            )
        ).alias("cp"),
    ).select("cp.chunk", "cp.piece", "id", "phash")


def phash_incremental_pairs(
    new_hashes: DataFrame,
    index_df: DataFrame,
    max_hamming: int = 6,
    chunks: int = 8,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """(new_id, old_id, hamming ≤ max_hamming) — an incoming image
    batch probed against a PERSISTED pHash band index: the
    continuous-ingestion steady state (nobody re-pairs the corpus per
    batch; LAION-scale multimodal pipelines dedup each crawl increment
    against the standing index). The batch's band rows equi-join the
    index on (chunk, piece) — batch-sized work, never corpus-sized —
    and candidates verify by exact bit_count on the two 8-byte
    signatures. Pigeonhole completeness holds batch-vs-index exactly
    as it does within one corpus (max_hamming < chunks). Pairs among
    the batch itself are out of scope (same contract as
    dedup.dedup_incremental — run the batch through
    phash_near_pairs for intra-batch)."""
    if max_hamming >= chunks:
        raise ValueError("pigeonhole completeness needs max_hamming < chunks")
    probes = phash_band_index(new_hashes, chunks, id_col, hash_col)
    return (
        probes.alias("p")
        .join(
            index_df.alias("ix"),
            (F.col("p.chunk") == F.col("ix.chunk"))
            & (F.col("p.piece") == F.col("ix.piece"))
            & (F.col("p.id") != F.col("ix.id")),
        )
        .select(
            F.col("p.id").alias("new_id"),
            F.col("ix.id").alias("old_id"),
            F.bit_count(
                F.col("p.phash").bitwiseXOR(F.col("ix.phash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def image_dedup_survivors(
    hashes: DataFrame,
    max_hamming: int = 3,
    chunks: int = 4,
    id_col: str = "media_id",
    hash_col: str = "phash",
) -> DataFrame:
    """(survivor, n_members) — pHash near-pairs → connected components
    (pointer jumping) → one row per duplicate GROUP with the min-id
    survivor and the member count. Images with no near-duplicate are
    singleton groups (survivor = self, n_members = 1), so the output
    is the full keep-list: 'keep every survivor' IS the dedup action."""
    # one barrier feeds the pair stage, the iterative component rounds,
    # AND the keep-list leg — the upstream (tar read + decode + hash)
    # runs once
    hashes = hashes.localCheckpoint(eager=False)
    pairs = phash_near_pairs(hashes, max_hamming, chunks, id_col, hash_col)
    clusters = dedup_clusters(pairs)
    ids = hashes.filter(F.col(hash_col).isNotNull()).select(
        F.col(id_col).alias("id")
    )
    assigned = ids.join(clusters, "id", "left").select(
        "id", F.coalesce("cluster", F.col("id")).alias("cluster")
    )
    return assigned.groupBy("cluster").agg(
        F.min("id").alias("survivor"), F.count("*").alias("n_members")
    ).select("survivor", "n_members")
