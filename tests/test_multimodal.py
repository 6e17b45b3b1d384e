"""Multimodal plumbing tests: binary payload stats, Arrow-batched decode
stub, frame-sampling fan-out."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from poc_spark.operators.multimodal import (
    decode_media,
    frame_sample_plan,
    payload_stats,
)


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "image", b"\x89PNG fake bytes here", {"src": "a"}),
        (1, "video", b"\x00\x00ftypmp42 fake video payload bytes", {"src": "b"}),
        (2, "audio", b"RIFF fake wav", {"src": "c"}),
        (3, "image", b"", {"src": "d"}),
    ]
    return spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, meta map<string,string>"
    )


def test_payload_stats(spark, media):
    got = {r["media_id"]: r for r in payload_stats(media).collect()}
    assert got[0]["n_bytes"] == 20
    assert got[3]["n_bytes"] == 0
    assert len(got[0]["sha256"]) == 64
    assert got[0]["sha256"] != got[1]["sha256"]


def test_decode_stub_raises_without_codecs(spark, media):
    with pytest.raises(Exception, match="NotImplementedError|codecs not available"):
        decode_media(media, fake=False).collect()


def test_fake_decode_schema_and_determinism(spark, media):
    out = decode_media(media, fake=True)
    assert out.schema.simpleString() == (
        "struct<media_id:bigint,kind:string,width:int,height:int,"
        "n_frames:int,feature:array<float>>"
    )
    rows1 = {r["media_id"]: r for r in out.collect()}
    rows2 = {r["media_id"]: r for r in decode_media(media, fake=True).collect()}
    assert rows1.keys() == rows2.keys()
    for k in rows1:
        assert rows1[k]["feature"] == rows2[k]["feature"]  # deterministic
        assert len(rows1[k]["feature"]) == 8
    assert rows1[0]["n_frames"] == 1          # image
    assert rows1[1]["n_frames"] > 1           # video


def test_frame_sample_plan(spark, media):
    decoded = decode_media(media, fake=True)
    plan = frame_sample_plan(decoded, every_n=10)
    rows = plan.collect()
    assert all(r["frame_idx"] % 10 == 0 for r in rows)
    vid = decoded.filter("kind = 'video'").collect()[0]
    expect = len(range(0, vid["n_frames"], 10))
    assert len([r for r in rows if r["media_id"] == 1]) == expect
