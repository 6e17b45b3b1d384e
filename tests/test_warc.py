"""WARC source (sources/warc.py): spec round-trip, member-level
quarantine classes, deterministic resync, plain (uncompressed) form."""

from __future__ import annotations

import gzip
import os

import pytest
from pyspark.sql import functions as F

from poc_spark.sources.warc import (
    MAX_RECORD_BYTES,
    _iter_members,
    _parse_record,
    _render_record,
    read_warc,
    write_warc,
)


def _rec(i: int, text: str = None) -> bytes:
    payload = (text if text is not None else f"doc {i} body").encode()
    return _render_record(
        f"<urn:uuid:{i:032x}>",
        "conversion",
        f"urn:poc:doc/{i}",
        "2024-01-01T00:00:00Z",
        "text/plain",
        payload,
    )


def _gz(raw: bytes) -> bytes:
    return gzip.compress(raw, mtime=0)


def test_roundtrip_write_read(spark, tmp_path):
    df = spark.createDataFrame(
        [
            (f"<urn:uuid:{i}>", "conversion", f"urn:poc:doc/{i}",
             "2024-01-01T00:00:00Z", "text/plain",
             f"body {i} éא".encode())
            for i in range(20)
        ],
        "record_id string, warc_type string, target_uri string, "
        "warc_date string, content_type string, payload binary",
    )
    path = str(tmp_path / "warc")
    n = write_warc(df, path, n_files=3)
    assert n == 20
    files = [f for f in os.listdir(path) if f.endswith(".warc.gz")]
    assert 1 <= len(files) <= 3
    back = read_warc(spark, path)
    rows = back.collect()
    assert len(rows) == 20
    assert all(r["error"] is None for r in rows)
    got = sorted(
        (r["target_uri"], bytes(r["payload"]).decode()) for r in rows
    )
    assert got[0] == ("urn:poc:doc/0", "body 0 éא")
    # content_length is the parsed header value and must equal bytes
    assert all(
        r["content_length"] == len(bytes(r["payload"])) for r in rows
    )


def test_plain_uncompressed_warc(spark, tmp_path):
    p = tmp_path / "w"
    p.mkdir()
    with open(p / "f.warc", "wb") as f:
        f.write(_rec(1) + _rec(2))
    rows = read_warc(spark, str(p)).collect()
    assert [r["error"] for r in rows] == [None, None]
    assert sorted(r["target_uri"] for r in rows) == [
        "urn:poc:doc/1", "urn:poc:doc/2"
    ]


def test_corrupt_member_quarantines_and_resyncs(spark, tmp_path):
    """One truncated gzip member costs ONE quarantine row; the reader
    resyncs at the next gzip magic and parses the rest of the file."""
    p = tmp_path / "w"
    p.mkdir()
    good1, bad, good2 = _gz(_rec(1)), _gz(_rec(2))[:20], _gz(_rec(3))
    with open(p / "f.warc.gz", "wb") as f:
        f.write(good1 + bad + good2)
    rows = read_warc(spark, str(p)).collect()
    errs = [r for r in rows if r["error"] is not None]
    oks = [r for r in rows if r["error"] is None]
    assert len(errs) == 1 and "gzip-error" in errs[0]["error"]
    assert sorted(r["target_uri"] for r in oks) == [
        "urn:poc:doc/1", "urn:poc:doc/3"
    ]


def test_header_violations_quarantine_per_class():
    assert "bad-magic" in _parse_record(b"HTTP/1.1 200 OK\r\n\r\n")["error"]
    assert (
        "no-header-terminator"
        in _parse_record(b"WARC/1.0\r\nWARC-Type: x")["error"]
    )
    assert (
        "unsupported-version"
        in _parse_record(b"WARC/9.9\r\nA: b\r\n\r\n")["error"]
    )
    assert (
        "missing-mandatory-headers"
        in _parse_record(b"WARC/1.0\r\nWARC-Type: response\r\n\r\n")["error"]
    )
    full = (
        b"WARC/1.0\r\nWARC-Type: t\r\nWARC-Record-ID: <r>\r\n"
        b"WARC-Date: d\r\nContent-Length: 10\r\n\r\nshort"
    )
    assert "truncated-payload" in _parse_record(full)["error"]
    badlen = full.replace(b"Content-Length: 10", b"Content-Length: xx")
    assert "bad-content-length" in _parse_record(badlen)["error"]
    bomb = full.replace(
        b"Content-Length: 10",
        b"Content-Length: " + str(MAX_RECORD_BYTES + 1).encode(),
    )
    assert "content-length-out-of-bounds" in _parse_record(bomb)["error"]


def test_member_iteration_handles_trailing_garbage():
    buf = _gz(_rec(1)) + b"\x00garbage-without-magic"
    out = list(_iter_members(buf))
    assert out[0][1] is None and out[0][0].startswith(b"WARC/1.0")
    assert out[1][1] is not None  # quarantined tail, loop terminates


def test_streaming_iterators_tiny_chunks_bit_equal():
    """The streaming member/plain iterators must produce identical
    output at ANY read granularity — chunk_size=5 forces members to
    span dozens of reads, resync magics to straddle chunk seams, and
    headers/payloads to split mid-token."""
    import io

    from poc_spark.sources.warc import (
        _iter_members_stream,
        _iter_plain_records,
        _iter_plain_records_stream,
    )

    big = _rec(9, "x" * 5000)
    blob = _gz(_rec(1)) + _gz(big)[:33] + _gz(_rec(2)) + _gz(big)
    want = list(_iter_members(blob))
    for cs in (5, 17, 1 << 20):
        got = list(_iter_members_stream(io.BytesIO(blob), chunk_size=cs))
        assert got == want, f"chunk_size={cs} diverged"
    assert [e is None for _, e in want] == [True, False, True, True]

    plain = _rec(1) + big + _rec(2)
    want_p = list(_iter_plain_records(plain))
    for cs in (5, 17, 1 << 20):
        got = list(
            _iter_plain_records_stream(io.BytesIO(plain), chunk_size=cs)
        )
        assert got == want_p, f"plain chunk_size={cs} diverged"
    assert [e for _, e in want_p] == [None, None, None]


def test_read_wet_text_documents_shape(spark, tmp_path):
    """read_wet_text: conversion records only, (url, text) projection,
    quarantined members excluded."""
    from poc_spark.sources.warc import read_wet_text

    p = tmp_path / "w"
    p.mkdir()
    info = _render_record(
        "<urn:uuid:info>", "warcinfo", None,
        "2024-01-01T00:00:00Z", "application/warc-fields",
        b"software: poc\r\n",
    )
    with open(p / "f.warc.gz", "wb") as f:
        f.write(
            _gz(info)
            + _gz(_rec(1, "hello é"))
            + _gz(_rec(2))[:15]  # corrupt: quarantined, must not surface
            + _gz(_rec(3, "world"))
        )
    rows = sorted(
        (r["url"], r["text"]) for r in read_wet_text(spark, str(p)).collect()
    )
    assert rows == [("urn:poc:doc/1", "hello é"), ("urn:poc:doc/3", "world")]


def test_empty_dir_raises(spark, tmp_path):
    p = tmp_path / "w"
    p.mkdir()
    with pytest.raises(ValueError, match="no .warc"):
        read_warc(spark, str(p))


def test_wet_filter_shape(spark, tmp_path):
    """WET files are WARC with warcinfo + conversion records: the
    reader returns both; consumers filter warc_type='conversion'."""
    p = tmp_path / "w"
    p.mkdir()
    info = _render_record(
        "<urn:uuid:info>", "warcinfo", None,
        "2024-01-01T00:00:00Z", "application/warc-fields",
        b"software: poc\r\n",
    )
    with open(p / "f.warc.gz", "wb") as f:
        f.write(_gz(info) + _gz(_rec(7)))
    df = read_warc(spark, str(p))
    assert df.filter(F.col("error").isNotNull()).count() == 0
    conv = df.filter(F.col("warc_type") == "conversion").collect()
    assert [r["target_uri"] for r in conv] == ["urn:poc:doc/7"]
    assert df.count() == 2


def test_quarantine_drains_unread_tail_and_offsets():
    """r10 ADVICE pins: (1) a terminal plain-WARC quarantine drains the
    UNREAD stream remainder into the quarantine row (the old form
    silently discarded bytes past the buffered prefix), bounded by
    MAX_RECORD_BYTES with the bound stated in the error; (2) gzip
    quarantine errors carry the member's compressed-byte offset."""
    import io

    from poc_spark.sources.warc import (
        _iter_members_stream,
        _iter_plain_records_stream,
    )

    # (1) headerless stream far longer than one chunk: every byte must
    # land in the single quarantine row
    junk = b"not-a-warc-" * 1000  # 11 kB, chunk_size=64 below
    out = list(_iter_plain_records_stream(io.BytesIO(junk), chunk_size=64))
    assert len(out) == 1
    assert out[0][0] == junk and "no-header-terminator" in out[0][1]

    # unresolvable Content-Length: record head + a long tail, all kept
    bad = b"WARC/1.0\r\nContent-Length: xx\r\n\r\n" + junk
    out = list(_iter_plain_records_stream(io.BytesIO(bad), chunk_size=64))
    assert len(out) == 1
    assert out[0][0] == bad and "unresolvable-content-length" in out[0][1]

    # bound: a tail beyond MAX_RECORD_BYTES is truncated LOUDLY
    class _Endless(io.RawIOBase):
        def __init__(self, n):
            self.left = n

        def read(self, k=-1):
            k = min(k if k > 0 else 1 << 20, self.left)
            self.left -= k
            return b"\xff" * k

    out = list(
        _iter_plain_records_stream(
            _Endless(MAX_RECORD_BYTES + 100), chunk_size=1 << 20
        )
    )
    assert len(out) == 1
    assert len(out[0][0]) == MAX_RECORD_BYTES
    assert "trailing bytes beyond MAX_RECORD_BYTES" in out[0][1]

    # (2) gzip member offset: corrupt the SECOND member; the error must
    # name a byte offset at/near that member's start
    m1, m2 = _gz(_rec(1)), _gz(_rec(2))
    blob = m1 + m2[:20] + _gz(_rec(3))
    rows = list(_iter_members_stream(io.BytesIO(blob), chunk_size=7))
    errs = [e for _, e in rows if e is not None]
    assert len(errs) == 1
    assert f"near offset {len(m1)}" in errs[0], errs[0]
