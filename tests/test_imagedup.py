"""Perceptual image near-dup (operators/imagedup.py): pHash
invariance/robustness/separation on planted spectral PNGs, banding
completeness vs brute force, end-to-end survivor grouping, quarantine."""

from __future__ import annotations

from pyspark.sql import functions as F

from poc_spark.operators.imagedup import (
    image_dedup_survivors,
    phash64,
    phash_near_pairs,
)
from poc_spark.operators.multimodal import synthesize_spectral_png_media


def _corpus(spark, n=40):
    docs = spark.range(0, n).select(F.col("id").alias("doc_id"))
    return synthesize_spectral_png_media(docs)


def _hashes(spark, n=40):
    return phash64(_corpus(spark, n)).cache()


def test_phash_reencode_is_exact_rescale_is_near_distinct_is_far(spark):
    h = {r["media_id"]: r for r in _hashes(spark).collect()}
    assert len(h) == 120
    for did in range(40):
        base, re_, rs = h[did * 10], h[did * 10 + 1], h[did * 10 + 2]
        assert base["phash"] is not None
        # re-encode: byte-different container, identical pixels → 0 bits
        assert re_["phash"] == base["phash"]
        # rescale: same continuous content, different raster → within
        # the entries' radius (worst over the full 5000-id tail is 4 —
        # IMAGE_DEDUP_RECALL.json tail_5000_ids)
        ham_rs = bin((base["phash"] ^ rs["phash"]) & ((1 << 64) - 1)).count("1")
        assert ham_rs <= 6, (did, ham_rs)
        assert (rs["width"], rs["height"]) != (base["width"], base["height"])
        # distinct: independent spectrum → far
        other = h[((did + 1) % 40) * 10]
        ham_d = bin((base["phash"] ^ other["phash"]) & ((1 << 64) - 1)).count(
            "1"
        )
        assert ham_d >= 10, (did, ham_d)


def test_banding_pairs_match_brute_force(spark):
    hashes = _hashes(spark, 25)
    got = {
        (r["id_a"], r["id_b"], r["hamming"])
        for r in phash_near_pairs(hashes, max_hamming=3, chunks=4).collect()
    }
    rows = hashes.collect()
    want = set()
    for i, a in enumerate(rows):
        for b in rows[i + 1 :]:
            x, y = sorted((a["media_id"], b["media_id"]))
            ham = bin((a["phash"] ^ b["phash"]) & ((1 << 64) - 1)).count("1")
            if ham <= 3:
                want.add((x, y, ham))
    assert got == want
    assert len(want) >= 25 * 3  # every planted triple is pairwise-near


def test_survivor_groups_are_the_planted_triples(spark):
    surv = image_dedup_survivors(_hashes(spark, 30)).collect()
    got = {(r["survivor"], r["n_members"]) for r in surv}
    assert got == {(did * 10, 3) for did in range(30)}


def test_cross_modal_pairs_come_from_the_right_modality(spark):
    """pipeline_multimodal_dedup's premise: the image-dup member is
    invisible to caption MinHash and the caption-dup member invisible
    to pHash — each modality contributes exactly its own pair class."""
    from pyspark.sql import functions as F

    from poc_spark.operators.dedup import minhash_lsh_pairs
    from poc_spark.operators.multimodal import synthesize_spectral_png_media

    docs = spark.range(0, 12).select(F.col("id").alias("doc_id"))
    corpus = synthesize_spectral_png_media(
        docs, variants=("base", "reencode", "distinct")
    )
    img_pairs = {
        (r["id_a"] % 10, r["id_b"] % 10, r["id_a"] // 10 == r["id_b"] // 10)
        for r in phash_near_pairs(
            phash64(corpus), max_hamming=6, chunks=8
        ).collect()
    }
    # pHash: base<->reencode within a doc only; never the distinct image
    assert img_pairs == {(0, 1, True)}
    did = F.expr("media_id DIV 10")
    cap = F.when(
        F.col("media_id") % 10 == 1,
        F.concat(F.lit("acap"), did.cast("string"), F.lit(" only tokens")),
    ).otherwise(
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(0), F.lit(29)),
                lambda i: F.concat(
                    F.lit("cap"), did.cast("string"), F.lit("x"),
                    i.cast("string"),
                ),
            ),
        )
    )
    cap_pairs = {
        (r["id_a"] % 10, r["id_b"] % 10, r["id_a"] // 10 == r["id_b"] // 10)
        for r in minhash_lsh_pairs(
            corpus.select(
                F.col("media_id").alias("doc_id"), cap.alias("text")
            ),
            threshold=0.7, num_hashes=64, bands=16,
        ).collect()
    }
    # MinHash: base<->distinct-image (shared caption) within a doc only
    assert cap_pairs == {(0, 3, True)}


def test_incremental_probe_matches_batch_vs_index_brute_force(spark):
    """phash_incremental_pairs == brute-force batch×index Hamming ≤ t
    (pigeonhole completeness across the index boundary), and contains
    NO intra-batch pairs by contract."""
    from poc_spark.operators.imagedup import (
        phash_band_index,
        phash_incremental_pairs,
    )

    corpus = phash64(_corpus(spark, 20)).cache()  # media ids 0..199
    index_side = corpus.filter(F.col("media_id") % 10 == 0)
    batch_side = corpus.filter(F.col("media_id") % 10 != 0)
    index = phash_band_index(index_side)
    got = {
        (r["new_id"], r["old_id"], r["hamming"])
        for r in phash_incremental_pairs(
            batch_side, index, max_hamming=6, chunks=8
        ).collect()
    }
    idx_rows = index_side.collect()
    want = set()
    for b in batch_side.collect():
        for o in idx_rows:
            ham = bin((b["phash"] ^ o["phash"]) & ((1 << 64) - 1)).count("1")
            if ham <= 6:
                want.add((b["media_id"], o["media_id"], ham))
    assert got == want
    # each batch variant matched exactly its own base, nothing else
    assert len(got) == batch_side.count()
    assert all(n // 10 == o // 10 for n, o, _ in got)


def test_corrupt_and_unknown_payloads_quarantine(spark):
    df = spark.createDataFrame(
        [
            (1, None),
            (2, b"not an image at all"),
            (3, b"\x89PNG\r\n\x1a\n" + b"torn"),
            (4, b"\xff\xd8\xff\xe0torn jpeg"),
        ],
        "media_id long, payload binary",
    )
    rows = {r["media_id"]: r for r in phash64(df).collect()}
    assert len(rows) == 4
    for r in rows.values():
        assert r["phash"] is None and r["width"] is None


def test_phash_reads_real_jpeg_payloads(spark):
    # signature sniffing: the synthesized JPEG tier hashes through the
    # same operator (content differs from PNGs — only the plumbing is
    # shared)
    from poc_spark.operators.multimodal import synthesize_jpeg_media

    docs = spark.range(0, 8).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("text "), F.col("id").cast("string")).alias("text"),
    )
    media = synthesize_jpeg_media(docs, corrupt_every=None)
    rows = phash64(media).collect()
    assert len(rows) == 8
    assert all(r["phash"] is not None for r in rows)
