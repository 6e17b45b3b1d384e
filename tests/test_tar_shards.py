"""WebDataset tar-shard source/sink (sources/tar_shards.py): sample
grouping, key/ext split, round-trip, quarantine classes, resync,
compressed shards, interop with stock ``tarfile``-produced archives."""

from __future__ import annotations

import gzip
import io
import os
import tarfile

import pytest
from pyspark.sql import functions as F

from poc_spark.sources.tar_shards import (
    BLOCK,
    MAX_MEMBER_BYTES,
    _split_key_ext,
    read_tar_shards,
    write_tar_shards,
)


def _samples_df(spark, n=60):
    return spark.range(0, n).select(
        F.format_string("%06d", F.col("id")).alias("key"),
        F.create_map(
            F.lit("txt"),
            F.encode(
                F.concat(F.lit("caption "), F.col("id").cast("string")),
                "utf-8",
            ),
            F.lit("json"),
            F.encode(
                F.concat(
                    F.lit('{"id":'), F.col("id").cast("string"), F.lit("}")
                ),
                "utf-8",
            ),
        ).alias("parts"),
    )


def test_key_ext_split():
    assert _split_key_ext("000123.jpg") == ("000123", "jpg")
    # WebDataset: everything after the FIRST dot of the basename is ext
    assert _split_key_ext("a/b/000123.seg.png") == ("a/b/000123", "seg.png")
    assert _split_key_ext("nodot") == ("nodot", "")
    assert _split_key_ext("dir.v2/file.txt") == ("dir.v2/file", "txt")


def test_roundtrip_groups_members_into_samples(spark, tmp_path_repo):
    path = str(tmp_path_repo / "shards")
    n = write_tar_shards(_samples_df(spark), path, n_shards=4)
    assert n == 60
    back = read_tar_shards(spark, path)
    rows = {r["key"]: r for r in back.collect()}
    assert len(rows) == 60
    assert back.filter("error IS NOT NULL").count() == 0
    r = rows["000007"]
    assert r["n_members"] == 2
    assert bytes(r["parts"]["txt"]) == b"caption 7"
    assert bytes(r["parts"]["json"]) == b'{"id":7}'
    assert r["total_bytes"] == len(b"caption 7") + len(b'{"id":7}')


def test_sample_never_spans_shards(spark, tmp_path_repo):
    # the WebDataset invariant: every member of a key sits in ONE shard
    path = str(tmp_path_repo / "shards")
    write_tar_shards(_samples_df(spark), path, n_shards=8)
    back = read_tar_shards(spark, path)
    per_key_files = (
        back.groupBy("key")
        .agg(F.countDistinct("file").alias("nf"))
        .agg(F.max("nf"))
        .collect()[0][0]
    )
    assert per_key_files == 1


def test_null_parts_skipped_and_empty_samples_dropped(spark, tmp_path_repo):
    df = spark.createDataFrame(
        [
            ("a", {"txt": b"hello", "png": None}),
            ("b", {}),
        ],
        "key string, parts map<string,binary>",
    )
    path = str(tmp_path_repo / "shards")
    n = write_tar_shards(df, path, n_shards=1)
    assert n == 1  # sample b had no non-null parts
    back = read_tar_shards(spark, path).collect()
    assert len(back) == 1
    assert back[0]["key"] == "a"
    assert set(back[0]["parts"]) == {"txt"}


def test_reads_stock_tarfile_archives_including_gz(spark, tmp_path_repo):
    # interop: archives produced by the stdlib (GNU format, gzip whole-
    # file compression) parse identically — the reader is not coupled
    # to our own writer
    path = str(tmp_path_repo / "stock")
    os.makedirs(path)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.GNU_FORMAT) as tf:
        for i in range(5):
            for ext, data in (
                ("jpg", b"\xff\xd8" + bytes([i]) * 10),
                ("txt", f"cap {i}".encode()),
            ):
                info = tarfile.TarInfo(name=f"{i:05d}.{ext}")
                data_b = data
                info.size = len(data_b)
                tf.addfile(info, io.BytesIO(data_b))
    with open(os.path.join(path, "s0.tar"), "wb") as f:
        f.write(buf.getvalue())
    with open(os.path.join(path, "s1.tar.gz"), "wb") as f:
        f.write(gzip.compress(buf.getvalue()))
    back = read_tar_shards(spark, path)
    assert back.filter("error IS NOT NULL").count() == 0
    # 5 samples per archive, 2 archives
    assert back.count() == 10
    r = back.filter("key = '00003' AND file LIKE '%.tar.gz'").collect()[0]
    assert bytes(r["parts"]["jpg"]).startswith(b"\xff\xd8")


def test_gnu_long_names_apply_to_next_member(spark, tmp_path_repo):
    path = str(tmp_path_repo / "long")
    os.makedirs(path)
    longkey = "d/" * 60 + "sample0001"  # > 100 chars, forces GNU 'L'
    with tarfile.open(
        os.path.join(path, "s.tar"), "w", format=tarfile.GNU_FORMAT
    ) as tf:
        info = tarfile.TarInfo(name=longkey + ".txt")
        info.size = 4
        tf.addfile(info, io.BytesIO(b"data"))
    back = read_tar_shards(spark, path).collect()
    assert len(back) == 1
    assert back[0]["key"] == longkey
    assert bytes(back[0]["parts"]["txt"]) == b"data"


def test_corrupt_header_quarantines_and_resyncs(spark, tmp_path_repo):
    path = str(tmp_path_repo / "shards")
    write_tar_shards(_samples_df(spark, n=30), path, n_shards=1)
    shard = os.path.join(path, os.listdir(path)[0])
    raw = bytearray(open(shard, "rb").read())
    # stomp the THIRD header block (first sample's second member or the
    # second sample — either way mid-archive)
    raw[2 * BLOCK : 2 * BLOCK + 16] = b"GARBAGEGARBAGEGA"
    open(shard, "wb").write(bytes(raw))
    back = read_tar_shards(spark, path)
    quarantined = back.filter("error IS NOT NULL").collect()
    assert len(quarantined) == 1
    assert "resync" in quarantined[0]["error"]
    # the stream recovered: later samples parse clean
    assert back.filter("error IS NULL AND key = '000029'").count() == 1


def test_truncated_archive_quarantines_tail(spark, tmp_path_repo):
    path = str(tmp_path_repo / "shards")
    write_tar_shards(_samples_df(spark, n=10), path, n_shards=1)
    shard = os.path.join(path, os.listdir(path)[0])
    raw = open(shard, "rb").read()
    # cut INSIDE a payload (half a block past a header somewhere mid-file)
    open(shard, "wb").write(raw[: 5 * BLOCK + 100])
    back = read_tar_shards(spark, path)
    errs = [r["error"] for r in back.filter("error IS NOT NULL").collect()]
    assert any("truncated" in e for e in errs)


def test_oversized_member_quarantines_without_oom(spark, tmp_path_repo):
    # hand-craft a header CLAIMING a > MAX_MEMBER_BYTES payload; the
    # reader must quarantine on the header alone (never allocating)
    path = str(tmp_path_repo / "bomb")
    os.makedirs(path)
    info = tarfile.TarInfo(name="big.bin")
    info.size = MAX_MEMBER_BYTES + 1
    hdr = info.tobuf(format=tarfile.GNU_FORMAT)
    with open(os.path.join(path, "s.tar"), "wb") as f:
        f.write(hdr)  # header only; EOF right after (no real payload)
    back = read_tar_shards(spark, path).collect()
    errs = [r["error"] for r in back]
    assert any("member-too-large" in e for e in errs)
    # EOF right after the header also flags the missing end marker
    assert any("truncated-archive" in e for e in errs)


def test_empty_dir_raises(spark, tmp_path_repo):
    d = str(tmp_path_repo / "empty")
    os.makedirs(d)
    with pytest.raises(ValueError, match="no .tar"):
        read_tar_shards(spark, d)


def test_writer_members_are_deterministic(spark, tmp_path_repo):
    # two writes of the same data produce byte-identical MEMBER streams
    # (names are also deterministic — shard-%06d by partition id, see
    # the numbered-names test; here the content of the sample set is
    # pinned: mtime 0, fixed owner/mode, sorted exts)
    import hashlib

    def content_fingerprint(p):
        hs = []
        for f in sorted(os.listdir(p)):
            with tarfile.open(os.path.join(p, f)) as tf:
                for m in tf.getmembers():
                    data = tf.extractfile(m).read()
                    hs.append(
                        (m.name, m.mtime, m.mode, m.uid,
                         hashlib.md5(data).hexdigest())
                    )
        return sorted(hs)

    p1 = str(tmp_path_repo / "w1")
    p2 = str(tmp_path_repo / "w2")
    write_tar_shards(_samples_df(spark), p1, n_shards=3)
    write_tar_shards(_samples_df(spark), p2, n_shards=3)
    f1, f2 = content_fingerprint(p1), content_fingerprint(p2)
    assert f1 == f2
    assert all(m[1] == 0 for m in f1)  # mtime pinned


def test_extension_pushdown_skips_payloads(spark, tmp_path_repo):
    """extensions= is projection pushdown into the container: only the
    requested members' payloads are materialized, skipped members
    vanish from parts/counts, and a sample with no wanted member is
    absent entirely — while quarantine behavior is unchanged."""
    path = str(tmp_path_repo / "shards")
    df = spark.createDataFrame(
        [
            ("a", {"png": b"\x89PNG" + b"x" * 1000, "txt": b"caption a"}),
            ("b", {"png": b"\x89PNG" + b"y" * 1000}),  # image-only
            ("c", {"txt": b"caption c"}),
        ],
        "key string, parts map<string,binary>",
    )
    write_tar_shards(df, path, n_shards=1)
    got = {
        r["key"]: r.asDict()
        for r in read_tar_shards(spark, path, extensions={"txt"}).collect()
    }
    assert set(got) == {"a", "c"}  # image-only sample b is absent
    assert set(got["a"]["parts"]) == {"txt"}
    assert got["a"]["n_members"] == 1
    assert got["a"]["total_bytes"] == len(b"caption a")
    # full read still sees everything
    full = {
        r["key"]: r.asDict() for r in read_tar_shards(spark, path).collect()
    }
    assert set(full) == {"a", "b", "c"}
    assert set(full["a"]["parts"]) == {"png", "txt"}


def test_quarantine_mid_sample_does_not_split_it(spark, tmp_path_repo):
    """A corrupt member BETWEEN two good members of the same sample
    yields one error row but the sample still reassembles into ONE
    output row (per-key grouping downstream must not double-count)."""
    path = str(tmp_path_repo / "midq")
    os.makedirs(path)
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.USTAR_FORMAT) as tf:
        for ext, data in (("p1", b"first"), ("bad", b"doomed"), ("p2", b"second")):
            info = tarfile.TarInfo(name=f"a.{ext}")
            info.size = len(data)
            tf.addfile(info, io.BytesIO(data))
    raw = bytearray(buf.getvalue())
    # stomp the SECOND member's header (block 2: hdr0@0, payload@1, hdr1@2)
    raw[2 * BLOCK : 2 * BLOCK + 16] = b"GARBAGEGARBAGEGA"
    with open(os.path.join(path, "s.tar"), "wb") as f:
        f.write(bytes(raw))
    back = read_tar_shards(spark, path).collect()
    errs = [r for r in back if r["error"] is not None]
    good = [r for r in back if r["error"] is None]
    assert len(errs) == 1 and "resync" in errs[0]["error"]
    assert len(good) == 1  # ONE row for key 'a', not two
    assert good[0]["key"] == "a"
    assert set(good[0]["parts"]) == {"p1", "p2"}
    assert bytes(good[0]["parts"]["p1"]) == b"first"
    assert bytes(good[0]["parts"]["p2"]) == b"second"


def test_empty_partitions_keep_shards_numbering_gap_free(spark, tmp_path_repo):
    """Far fewer samples than shards: every partition still emits its
    (possibly empty) shard, so shard-%06d numbering is contiguous
    0..n-1 — the brace-notation contract — and empty shards read back
    as zero samples, zero errors."""
    path = str(tmp_path_repo / "gapfree")
    df = spark.createDataFrame(
        [("a", {"txt": b"x"}), ("b", {"txt": b"y"})],
        "key string, parts map<string,binary>",
    )
    n = write_tar_shards(df, path, n_shards=8)
    assert n == 2
    names = sorted(os.listdir(path))
    assert names == [f"shard-{i:06d}.tar" for i in range(8)]
    back = read_tar_shards(spark, path)
    assert back.filter("error IS NOT NULL").count() == 0
    assert back.count() == 2


def test_members_key_sorted_within_shard(spark, tmp_path_repo):
    """sortWithinPartitions(key) before the sink: member order inside
    each shard is key-sorted (and therefore deterministic regardless of
    shuffle arrival order)."""
    path = str(tmp_path_repo / "sorted")
    write_tar_shards(_samples_df(spark), path, n_shards=3)
    for f in os.listdir(path):
        with tarfile.open(os.path.join(path, f)) as tf:
            keys = [_split_key_ext(m.name)[0] for m in tf.getmembers()]
        assert keys == sorted(keys)


def test_shard_names_are_numbered_and_deterministic(spark, tmp_path_repo):
    """WebDataset numbered-shard convention: shard-%06d.tar by
    partition id, identical file sets across runs."""
    p1 = str(tmp_path_repo / "w1")
    p2 = str(tmp_path_repo / "w2")
    write_tar_shards(_samples_df(spark), p1, n_shards=3)
    write_tar_shards(_samples_df(spark), p2, n_shards=3)
    n1, n2 = sorted(os.listdir(p1)), sorted(os.listdir(p2))
    assert n1 == n2
    assert all(
        len(n) == len("shard-000000.tar") and n.startswith("shard-")
        for n in n1
    )
