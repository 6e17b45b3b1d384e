"""WARC (Web ARChive, ISO 28500) source — the container every real
crawl-to-corpus pipeline STARTS from (Common Crawl ships ~1 GB
``.warc.gz`` segment files; WET "extracted text" files are the same
container with ``conversion`` records).

Format essentials (public spec, ISO 28500 / IIPC warc-specifications):
a WARC file is a concatenation of records; each record is::

    WARC/1.0\\r\\n
    <header-name>: <value>\\r\\n ...      (must include WARC-Type,
    \\r\\n                                 WARC-Record-ID, WARC-Date,
    <Content-Length bytes of payload>     Content-Length)
    \\r\\n\\r\\n

and the near-universal compressed form gzips EVERY RECORD AS ITS OWN
GZIP MEMBER, concatenated — the convention that makes ``.warc.gz``
streamable and record-seekable without a global decompress.

Spark-first shape: WARC is not splittable mid-file (gzip members don't
announce their offsets), so the unit of parallelism is the FILE — the
same contract every production WARC reader uses (one ~1 GB segment per
task; Common Crawl publishes ~72k segments per snapshot, far more than
any cluster's cores, so per-file parallelism saturates 1000 executors).
The reader is a file-list DataFrame fanned out through ``mapInPandas``:
each task streams its files member-by-member with a bounded-memory
zlib loop — never materializing a whole file — and yields one row per
record. Malformed members QUARANTINE (error column + deterministic
resync to the next gzip magic), never kill the job: at 100 TB of
crawl data there is always a truncated segment somewhere.

The writer exists for fixtures and for the export path (re-sharding a
corpus back into WARC): one ``.warc.gz`` per task partition, records
gzipped member-per-record per the convention.

Reference parity: the reference ingests only its own NDJSON uploads
(backend/main.py:137-176); crawl containers are part of the 100 TB
extension surface (SURVEY §2.9), the last missing source format after
parquet/JSONL/CSV/ORC.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

GZIP_MAGIC = b"\x1f\x8b\x08"

#: hard ceiling on one record's decompressed payload — the same
#: allocation-bound discipline as the PNG/JPEG decoders (a corrupt
#: Content-Length or a gzip bomb must not OOM an executor)
MAX_RECORD_BYTES = 64 * 1024 * 1024

RECORDS_SCHEMA = T.StructType(
    [
        T.StructField("file", T.StringType()),
        T.StructField("record_id", T.StringType()),
        T.StructField("warc_type", T.StringType()),
        T.StructField("target_uri", T.StringType()),
        T.StructField("warc_date", T.StringType()),
        T.StructField("content_type", T.StringType()),
        T.StructField("content_length", T.LongType()),
        T.StructField("payload", T.BinaryType()),
        T.StructField("error", T.StringType()),
    ]
)


def _parse_record(member: bytes) -> dict:
    """Parse ONE decompressed WARC record. Returns a RECORDS_SCHEMA
    row dict (without `file`); `error` is set and payload None when
    the record violates the spec."""
    if not member.startswith(b"WARC/"):
        return {"error": "bad-magic: record does not start with WARC/"}
    sep = member.find(b"\r\n\r\n")
    if sep < 0:
        return {"error": "no-header-terminator"}
    head = member[:sep].decode("utf-8", "replace").split("\r\n")
    version = head[0]
    if not version.startswith("WARC/1."):
        return {"error": f"unsupported-version: {version!r}"}
    fields: dict[str, str] = {}
    for line in head[1:]:
        if ":" not in line:
            return {"error": f"malformed-header-line: {line!r}"}
        k, v = line.split(":", 1)
        fields[k.strip().lower()] = v.strip()
    missing = [
        k
        for k in ("warc-type", "warc-record-id", "warc-date", "content-length")
        if k not in fields
    ]
    if missing:
        return {"error": f"missing-mandatory-headers: {missing}"}
    try:
        n = int(fields["content-length"])
    except ValueError:
        return {"error": f"bad-content-length: {fields['content-length']!r}"}
    if n < 0 or n > MAX_RECORD_BYTES:
        return {"error": f"content-length-out-of-bounds: {n}"}
    body = member[sep + 4:]
    if len(body) < n:
        return {"error": f"truncated-payload: {len(body)} < {n}"}
    payload = body[:n]
    # two CRLFs terminate the record; tolerate their absence only at
    # member end for interop with lax writers (warcio accepts this)
    trailer = body[n:]
    if trailer not in (b"", b"\r\n\r\n"):
        return {"error": f"bad-record-trailer: {trailer[:8]!r}"}
    return {
        "record_id": fields["warc-record-id"],
        "warc_type": fields["warc-type"],
        "target_uri": fields.get("warc-target-uri"),
        "warc_date": fields["warc-date"],
        "content_type": fields.get("content-type"),
        "content_length": n,
        "payload": payload,
        "error": None,
    }


#: streaming read granularity — one disk read / decompress feed unit
CHUNK_BYTES = 4 * 1024 * 1024


def _iter_members_stream(fh, chunk_size: int = CHUNK_BYTES):
    """Yield (decompressed_member_bytes | None, error | None) for each
    gzip member of a ``.warc.gz`` STREAM, reading `chunk_size` bytes at
    a time — the file is never materialized (r9 ADVICE: the old
    whole-buffer form held the full segment AND re-sliced it per
    member, O(file × members) copying at Common Crawl scale).

    Memory bound: one member's DECOMPRESSED output is capped at
    MAX_RECORD_BYTES (gzip-bomb guard), and the member's COMPRESSED
    bytes are retained only until it completes (they seed the resync
    scan on corruption) — so peak memory is O(one record), never
    O(file). On a corrupt member, quarantine it and RESYNC
    deterministically at the next gzip magic — one bad record costs
    one quarantine row, not the file tail."""
    import zlib
    from collections import deque

    unfed: deque[bytes] = deque()  # read but not yet decompressed
    eof = False
    n_pulled = 0  # cumulative compressed bytes read from the stream

    def pull() -> bool:
        nonlocal eof, n_pulled
        if eof:
            return False
        c = fh.read(chunk_size)
        if not c:
            eof = True
            return False
        n_pulled += len(c)
        unfed.append(c)
        return True

    while unfed or pull():
        # compressed-byte offset of this member's first byte — the
        # triage pointer quarantine errors carry (a corrupt member in
        # a ~1 GB segment is otherwise unlocatable)
        member_off = n_pulled - sum(len(c) for c in unfed)
        d = zlib.decompressobj(wbits=47)  # gzip wrapper
        parts: list[bytes] = []
        fed: list[bytes] = []  # this member's compressed bytes (resync seed)
        n_out, err = 0, None
        while True:
            if d.unconsumed_tail:
                chunk = d.unconsumed_tail  # output-cap leftover
            elif unfed:
                chunk = unfed.popleft()
                fed.append(chunk)
            elif pull():
                continue
            else:
                err = (
                    f"gzip-error near offset {member_off}: "
                    "truncated gzip member"
                )
                break
            try:
                piece = d.decompress(chunk, MAX_RECORD_BYTES + 1 - n_out)
            except zlib.error as e:
                err = f"gzip-error near offset {member_off}: {e}"
                break
            parts.append(piece)
            n_out += len(piece)
            if n_out > MAX_RECORD_BYTES:
                err = (
                    f"gzip-error near offset {member_off}: "
                    "member exceeds MAX_RECORD_BYTES"
                )
                break
            if d.eof:
                break
        if err is None:
            yield b"".join(parts), None
            if d.unused_data:  # next member starts inside the last feed
                unfed.appendleft(d.unused_data)
            continue
        yield None, err
        # resync: the next gzip magic STRICTLY AFTER this member's
        # start — scan the member's own bytes first (corruption may sit
        # mid-member with a clean member packed right behind it), then
        # stream forward chunk by chunk with a 2-byte seam overlap
        window = b"".join(fed) + b"".join(unfed)
        unfed.clear()
        start = 1
        while True:
            nxt = window.find(GZIP_MAGIC, start)
            if nxt >= 0:
                unfed.append(window[nxt:])
                break
            if eof:
                return
            c = fh.read(chunk_size)
            if not c:
                eof = True
                return
            keep = window[-(len(GZIP_MAGIC) - 1):] if window else b""
            window = keep + c
            start = 0


def _iter_members(buf: bytes):
    """Byte-string convenience wrapper over the streaming member
    iterator (fixtures/tests; read_warc streams from the file)."""
    import io

    yield from _iter_members_stream(io.BytesIO(buf))


#: headers are a handful of short lines per spec; a terminator not
#: found within this bound means the "record" is not a WARC record
MAX_HEADER_BYTES = 1024 * 1024


def _iter_plain_records_stream(fh, chunk_size: int = CHUNK_BYTES):
    """Yield raw record byte spans of an UNCOMPRESSED ``.warc`` stream
    by walking Content-Length (the only spec-sound way to split —
    scanning for 'WARC/' would tear payloads that contain it). Reads
    `chunk_size` at a time; peak memory is O(one record)."""
    buf = b""
    eof = False

    def fill(target: int) -> None:
        """Grow buf to >= target bytes (or to stream end)."""
        nonlocal buf, eof
        while len(buf) < target and not eof:
            c = fh.read(chunk_size)
            if not c:
                eof = True
                return
            buf += c

    def quarantine_tail(err: str):
        """Terminal quarantine: the split walk cannot continue, so the
        ENTIRE unread remainder belongs to the quarantine row — drain
        it (bounded by MAX_RECORD_BYTES, the same bomb guard as the
        happy path) so no byte of the file vanishes unaccounted."""
        nonlocal buf
        fill(MAX_RECORD_BYTES + 1)
        if len(buf) > MAX_RECORD_BYTES:
            return (
                buf[:MAX_RECORD_BYTES],
                f"{err}: trailing bytes beyond MAX_RECORD_BYTES "
                "discarded from quarantine payload",
            )
        return buf, err

    while True:
        fill(1)
        if not buf:
            return
        sep = buf.find(b"\r\n\r\n")
        while sep < 0 and not eof and len(buf) <= MAX_HEADER_BYTES:
            scan_from = max(0, len(buf) - 3)  # seam overlap
            fill(len(buf) + chunk_size)
            sep = buf.find(b"\r\n\r\n", scan_from)
        if sep < 0:
            yield quarantine_tail("no-header-terminator")
            return
        head = buf[:sep]
        n = None
        for line in head.split(b"\r\n"):
            if line.lower().startswith(b"content-length:"):
                try:
                    n = int(line.split(b":", 1)[1])
                except ValueError:
                    n = None
        if n is None or n < 0 or n > MAX_RECORD_BYTES:
            # cannot locate the record end: quarantine the file's tail
            yield quarantine_tail("unresolvable-content-length")
            return
        end = sep + 4 + n + 4
        fill(end)
        cut = min(end, len(buf))
        yield buf[:cut], None
        buf = buf[cut:]
        if not buf and eof:
            return


def _iter_plain_records(buf: bytes):
    """Byte-string convenience wrapper over the streaming plain-WARC
    iterator."""
    import io

    yield from _iter_plain_records_stream(io.BytesIO(buf))


def read_warc(
    spark: SparkSession, path: str, n_tasks: int = 64
) -> DataFrame:
    """Scan a directory of ``.warc[.gz]`` files into one row per WARC
    record (RECORDS_SCHEMA). Malformed members/records surface as rows
    with ``error`` set and NULL payload — filter ``error IS NULL`` for
    the clean stream, its complement for the quarantine sink.

    Scale: the file list (bounded, one status call per file — the same
    driver-side budget as every manifest) fans out via mapInPandas;
    each task STREAMS its files member-by-member (CHUNK_BYTES reads
    feeding one decompressobj — a 1 GB segment is never held in
    memory; r9 ADVICE) and FLUSHES rows to Arrow in bounded batches
    (BATCH_ROWS rows or BATCH_BYTES of payload, whichever first), so
    peak task memory is O(one record + one batch) regardless of file
    size. Parallelism is #files, the inherent WARC contract (gzip
    members are not seekable) — crawls ship thousands of ~1 GB
    segments precisely so this saturates a cluster."""
    import os

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith((".warc", ".warc.gz"))
    )
    if not files:
        raise ValueError(f"read_warc: no .warc/.warc.gz under {path}")

    BATCH_ROWS = 1024
    BATCH_BYTES = MAX_RECORD_BYTES  # ~64 MB of payload per Arrow batch

    def scan(batches):
        import pandas as pd

        cols = [f.name for f in RECORDS_SCHEMA.fields]
        rows: list[list] = []
        n_bytes = 0

        def flush():
            nonlocal rows, n_bytes
            out = pd.DataFrame(rows, columns=cols)
            rows, n_bytes = [], 0
            return out

        for pdf in batches:
            for fname in pdf["file"]:
                with open(fname, "rb") as fh:
                    magic = fh.read(len(GZIP_MAGIC))
                    fh.seek(0)
                    if magic == GZIP_MAGIC:
                        members = _iter_members_stream(fh)
                    else:
                        members = _iter_plain_records_stream(fh)
                    for member, err in members:
                        if err is not None:
                            rec = {"error": err}
                        else:
                            rec = _parse_record(member)
                        rows.append(
                            [
                                fname,
                                rec.get("record_id"),
                                rec.get("warc_type"),
                                rec.get("target_uri"),
                                rec.get("warc_date"),
                                rec.get("content_type"),
                                rec.get("content_length"),
                                rec.get("payload"),
                                rec.get("error"),
                            ]
                        )
                        n_bytes += len(rec.get("payload") or b"")
                        if len(rows) >= BATCH_ROWS or n_bytes >= BATCH_BYTES:
                            yield flush()
        if rows:
            yield flush()

    fdf = spark.createDataFrame([(f,) for f in files], "file string")
    return fdf.repartition(min(len(files), n_tasks)).mapInPandas(
        scan, RECORDS_SCHEMA
    )


def read_wet_text(
    spark: SparkSession, path: str, n_tasks: int = 64
) -> DataFrame:
    """WET convenience path — the first mile of a crawl-to-corpus
    pipeline: filter the clean ``conversion`` records of a WET
    directory (WET = WARC whose records carry extracted plain text)
    and project them into the ``documents`` shape the downstream
    text/dedup/sampling tiers consume: (url, text). The payload→string
    step is a binary cast (JVM-side, zero-copy UTF-8 wrap — WET
    payloads are UTF-8 text by the format's own convention; bytes that
    aren't valid UTF-8 pass through rather than erroring, matching how
    crawl pipelines treat stray mojibake: a later quality filter drops
    it, the reader never dies on it). Quarantined records (error set)
    and non-conversion records (warcinfo, request/response in full
    WARC) are excluded by definition."""
    from pyspark.sql import functions as F

    recs = read_warc(spark, path, n_tasks=n_tasks)
    return recs.filter(
        F.col("error").isNull() & (F.col("warc_type") == "conversion")
    ).select(
        F.col("target_uri").alias("url"),
        F.col("payload").cast("string").alias("text"),
    )


def _render_record(
    record_id: str,
    warc_type: str,
    target_uri: str | None,
    warc_date: str,
    content_type: str | None,
    payload: bytes,
) -> bytes:
    head = [
        "WARC/1.0",
        f"WARC-Type: {warc_type}",
        f"WARC-Record-ID: {record_id}",
        f"WARC-Date: {warc_date}",
    ]
    if target_uri is not None:
        head.append(f"WARC-Target-URI: {target_uri}")
    if content_type is not None:
        head.append(f"Content-Type: {content_type}")
    head.append(f"Content-Length: {len(payload)}")
    return (
        "\r\n".join(head).encode() + b"\r\n\r\n" + payload + b"\r\n\r\n"
    )


def write_warc(
    df: DataFrame,
    path: str,
    n_files: int = 8,
    compress: bool = True,
) -> int:
    """Distributed WARC sink: `df` must carry columns (record_id,
    warc_type, target_uri, warc_date, content_type, payload). Each
    task partition writes ONE ``.warc[.gz]`` file (records gzipped
    member-per-record — the streamable convention), the per-crawler-
    task shape real archivers produce. Returns the number of records
    written. Partitioning by hash of record_id keeps the assignment
    deterministic; record order inside a file is the partition's scan
    order (WARC imposes none)."""
    import gzip
    import os
    import shutil
    import uuid as _uuid

    from pyspark.sql import functions as F

    if os.path.isdir(path):
        shutil.rmtree(path)  # overwrite semantics, like every sink here
    os.makedirs(path, exist_ok=True)
    ext = ".warc.gz" if compress else ".warc"

    out_schema = T.StructType(
        [
            T.StructField("file", T.StringType()),
            T.StructField("n_records", T.LongType()),
        ]
    )

    def sink(batches):
        import pandas as pd

        fname = os.path.join(path, f"part-{_uuid.uuid4().hex[:12]}{ext}")
        n = 0
        with open(fname, "wb") as fh:
            for pdf in batches:
                for r in pdf.itertuples(index=False):
                    raw = _render_record(
                        r.record_id,
                        r.warc_type,
                        r.target_uri,
                        r.warc_date,
                        r.content_type,
                        bytes(r.payload),
                    )
                    if compress:
                        # mtime=0 pins byte-determinism of the member
                        fh.write(
                            gzip.compress(raw, compresslevel=6, mtime=0)
                        )
                    else:
                        fh.write(raw)
                    n += 1
        if n == 0:  # empty partition: no empty container files
            os.unlink(fname)
        yield pd.DataFrame(
            [[fname, n]], columns=["file", "n_records"]
        )

    cols = [
        "record_id", "warc_type", "target_uri", "warc_date",
        "content_type", "payload",
    ]
    result = (
        df.select(*cols)
        .repartition(n_files, "record_id")
        .mapInPandas(sink, out_schema)
        .agg(F.sum("n_records"))
        .collect()[0][0]
    )
    return int(result or 0)
