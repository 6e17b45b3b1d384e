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


def _iter_members(buf: bytes):
    """Yield (decompressed_member_bytes | None, error | None) for each
    gzip member of a .warc.gz byte string. On a corrupt member,
    quarantine it and RESYNC deterministically at the next gzip magic
    — one bad record costs one quarantine row, not the file tail."""
    import zlib

    pos, total = 0, len(buf)
    while pos < total:
        d = zlib.decompressobj(wbits=47)  # gzip wrapper
        try:
            out = d.decompress(buf[pos:], MAX_RECORD_BYTES + 1)
            if not d.eof:
                if len(out) > MAX_RECORD_BYTES:
                    raise zlib.error("member exceeds MAX_RECORD_BYTES")
                raise zlib.error("truncated gzip member")
        except zlib.error as e:
            nxt = buf.find(GZIP_MAGIC, pos + 1)
            yield None, f"gzip-error at offset {pos}: {e}"
            if nxt < 0:
                return
            pos = nxt
            continue
        yield out, None
        consumed = len(buf) - pos - len(d.unused_data)
        if consumed <= 0:  # defensive: never loop in place
            return
        pos += consumed


def _iter_plain_records(buf: bytes):
    """Yield raw record byte spans of an UNCOMPRESSED .warc file by
    walking Content-Length (the only spec-sound way to split —
    scanning for 'WARC/' would tear payloads that contain it)."""
    pos, total = 0, len(buf)
    while pos < total:
        sep = buf.find(b"\r\n\r\n", pos)
        if sep < 0:
            yield buf[pos:], "no-header-terminator"
            return
        head = buf[pos:sep]
        n = None
        for line in head.split(b"\r\n"):
            if line.lower().startswith(b"content-length:"):
                try:
                    n = int(line.split(b":", 1)[1])
                except ValueError:
                    n = None
        if n is None or n < 0 or n > MAX_RECORD_BYTES:
            # cannot locate the record end: quarantine the file tail
            yield buf[pos:], "unresolvable-content-length"
            return
        end = min(sep + 4 + n + 4, total)
        yield buf[pos:end], None
        pos = end


def read_warc(
    spark: SparkSession, path: str, n_tasks: int = 64
) -> DataFrame:
    """Scan a directory of ``.warc[.gz]`` files into one row per WARC
    record (RECORDS_SCHEMA). Malformed members/records surface as rows
    with ``error`` set and NULL payload — filter ``error IS NULL`` for
    the clean stream, its complement for the quarantine sink.

    Scale: the file list (bounded, one status call per file — the same
    driver-side budget as every manifest) fans out via mapInPandas;
    each task streams members with bounded memory (MAX_RECORD_BYTES
    ceiling per record). Parallelism is #files, the inherent WARC
    contract (gzip members are not seekable) — crawls ship thousands
    of ~1 GB segments precisely so this saturates a cluster."""
    import os

    files = sorted(
        os.path.join(path, f)
        for f in os.listdir(path)
        if f.endswith((".warc", ".warc.gz"))
    )
    if not files:
        raise ValueError(f"read_warc: no .warc/.warc.gz under {path}")

    def scan(batches):
        import pandas as pd

        cols = [f.name for f in RECORDS_SCHEMA.fields]
        for pdf in batches:
            rows = []
            for fname in pdf["file"]:
                with open(fname, "rb") as fh:
                    buf = fh.read()
                if buf[:3] == GZIP_MAGIC:
                    members = _iter_members(buf)
                else:
                    members = _iter_plain_records(buf)
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
            yield pd.DataFrame(rows, columns=cols)

    fdf = spark.createDataFrame([(f,) for f in files], "file string")
    return fdf.repartition(min(len(files), n_tasks)).mapInPandas(
        scan, RECORDS_SCHEMA
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
