"""WARC source + sink — the web-archive container format.

Public precedent: WARC 1.1 (ISO 28500; the IIPC spec at
iipc.github.io/warc-specifications) is how web crawls ship — Common
Crawl publishes ~1 GB ``.warc.gz`` files whose records are individually
gzipped members, so a reader can seek to a record without decompressing
the file. The reference repo reads documents from object stores but has
no web-archive container support (its S1-S5 scans fetch loose files);
a web-scale extraction tier starts FROM WARC, so this source is part of
the training-data-pipeline surface the build brief adds.

Spark-first shape:

- listing/scan/pruning ride on Spark's ``binaryFile`` source (one row
  per archive file — the same junk-filter / size-gate machinery as
  ``readers.scan_binary_files``), so store selection stays a URI scheme
  and partition parallelism = number of archive files, which is exactly
  how Common Crawl shards (100k × ~1 GB files → 100k tasks).
- record parsing is a from-scratch byte scanner in ``mapInPandas``
  (Arrow-batched; the one genuinely imperative per-byte job in the
  repo — no container/codec library exists for it in pyspark.sql.functions).
  Parsing streams record-by-record and yields in bounded chunks, so a
  1 GB archive never materializes its record list at once.
- malformed records are ROWS (error column), never task failures (repo
  invariant); the parser resyncs on the next ``\\r\\nWARC/`` magic so
  one torn record doesn't sink the rest of the archive.
- the sink serializes each PARTITION to one ``.warc.gz`` (per-record
  gzip members, Common Crawl layout) via ``mapPartitions`` — the
  documented last-resort tier, used because a binary container sink has
  no DataFrameWriter format; records never pass through the driver.
"""

from __future__ import annotations

import gzip
import io
import uuid
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

_CRLF = b"\r\n"
_HDR_END = b"\r\n\r\n"
_MAGIC = b"WARC/"
_GZ_MAGIC = b"\x1f\x8b"

WARC_RECORD_SCHEMA = StructType(
    [
        StructField("warc_file", StringType()),
        StructField("record_id", StringType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("http_status", IntegerType()),
        StructField("http_content_type", StringType()),
        StructField("payload", BinaryType()),
        StructField("n_bytes", LongType()),
        StructField("error", StringType()),
    ]
)


# --- parsing (pure functions; Spark-free, unit-testable) --------------------


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().lower().decode("ascii", "replace")] = (
                v.strip().decode("utf-8", "replace")
            )
    return headers


def _split_http(content: bytes) -> tuple[int | None, str | None, bytes]:
    """HTTP response content block → (status, content-type, body).
    Non-HTTP content comes back unsplit with NULL status."""
    if not content.startswith(b"HTTP/"):
        return None, None, content
    end = content.find(_HDR_END)
    if end < 0:
        return None, None, content
    head = content[:end]
    status_line = head.split(_CRLF, 1)[0].split(b" ")
    try:
        status = int(status_line[1])
    except (IndexError, ValueError):
        status = None
    ctype = _parse_headers(head).get("content-type")
    return status, ctype, content[end + len(_HDR_END):]


def parse_warc_bytes(
    data: bytes, warc_file: str = ""
) -> Iterator[tuple]:
    """Yield WARC_RECORD_SCHEMA tuples from raw (or gzipped) WARC bytes.

    Gzip is detected by magic; Python's gzip handles the multi-member
    (per-record) Common Crawl layout transparently. Malformed records
    yield an error row, then the scanner resyncs at the next record
    magic (Spec: records are separated by two CRLFs)."""
    if data[:2] == _GZ_MAGIC:
        try:
            data = gzip.decompress(data)
        except OSError as e:
            yield (warc_file, None, None, None, None, None, None, None, 0,
                   f"gzip: {e}")
            return
    pos = 0
    n = len(data)
    while pos < n:
        start = data.find(_MAGIC, pos)
        if start < 0:
            if data[pos:].strip():
                yield (warc_file, None, None, None, None, None, None, None,
                       0, "trailing garbage after last record")
            return
        hdr_end = data.find(_HDR_END, start)
        if hdr_end < 0:
            yield (warc_file, None, None, None, None, None, None, None, 0,
                   "truncated header block")
            return
        headers = _parse_headers(data[start:hdr_end])
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError):
            yield (warc_file, headers.get("warc-record-id"),
                   headers.get("warc-type"), headers.get("warc-target-uri"),
                   headers.get("warc-date"), None, None, None, 0,
                   "missing/bad Content-Length")
            pos = hdr_end + len(_HDR_END)  # resync at next magic
            continue
        body_start = hdr_end + len(_HDR_END)
        if body_start + clen > n:
            yield (warc_file, headers.get("warc-record-id"),
                   headers.get("warc-type"), headers.get("warc-target-uri"),
                   headers.get("warc-date"), None, None, None, 0,
                   f"truncated content block (want {clen} bytes)")
            return
        content = data[body_start:body_start + clen]
        status, ctype, payload = (
            _split_http(content)
            if headers.get("warc-type") == "response"
            else (None, headers.get("content-type"), content)
        )
        yield (
            warc_file,
            headers.get("warc-record-id"),
            headers.get("warc-type"),
            headers.get("warc-target-uri"),
            headers.get("warc-date"),
            status,
            ctype,
            payload,
            len(payload),
            None,
        )
        pos = body_start + clen + len(_HDR_END)


# --- serialization (the sink's per-record unit; also the test writer) -------


def warc_record_bytes(
    warc_type: str,
    payload: bytes,
    target_uri: str | None = None,
    record_id: str | None = None,
    warc_date: str = "2026-01-01T00:00:00Z",
    http_status: int | None = None,
    http_content_type: str | None = None,
) -> bytes:
    """One spec-shaped record. ``http_status`` wraps the payload in an
    HTTP response block (the Common Crawl 'response' layout)."""
    content = payload
    if http_status is not None:
        head = f"HTTP/1.1 {http_status} OK\r\n"
        if http_content_type:
            head += f"Content-Type: {http_content_type}\r\n"
        content = head.encode("ascii") + _CRLF + payload
    rid = record_id or f"<urn:uuid:{uuid.uuid5(uuid.NAMESPACE_URL, (target_uri or '') + str(len(payload)))}>"
    lines = [
        b"WARC/1.1",
        f"WARC-Type: {warc_type}".encode(),
        f"WARC-Record-ID: {rid}".encode(),
        f"WARC-Date: {warc_date}".encode(),
        f"Content-Length: {len(content)}".encode(),
    ]
    if target_uri:
        lines.append(f"WARC-Target-URI: {target_uri}".encode())
    return _CRLF.join(lines) + _HDR_END + content + _HDR_END


def _gzip_member(record: bytes) -> bytes:
    buf = io.BytesIO()
    # mtime=0: reproducible bytes (gzip stamps wall-clock otherwise)
    with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
        g.write(record)
    return buf.getvalue()


# --- Spark source / sink ----------------------------------------------------


def read_warc(
    spark: SparkSession,
    path: str,
    record_types: tuple[str, ...] | None = ("response",),
    glob: str | None = "*.warc*",
) -> DataFrame:
    """Archive scan → one row per WARC record (WARC_RECORD_SCHEMA).

    Built on ``scan_binary_files`` so junk rules / size gates / store
    schemes are shared with every other scan; parallelism = archive
    count (the Common Crawl sharding unit). Record filtering happens
    INSIDE the scanner, so request/metadata records of a filtered read
    never cross Arrow."""
    from docling_jobkit_spark.sources.readers import scan_binary_files

    files = scan_binary_files(spark, path, glob=glob).select("path", "content")
    wanted = tuple(record_types) if record_types else None

    def scan(batches):
        import pandas as pd

        for pdf in batches:
            out: list[tuple] = []
            for fpath, content in zip(pdf["path"], pdf["content"]):
                for rec in parse_warc_bytes(bytes(content), fpath):
                    if wanted is None or rec[2] in wanted or rec[9] is not None:
                        out.append(rec)
                    if len(out) >= 1024:
                        yield pd.DataFrame(
                            out, columns=WARC_RECORD_SCHEMA.fieldNames()
                        )
                        out = []
            if out:
                yield pd.DataFrame(out, columns=WARC_RECORD_SCHEMA.fieldNames())

    return files.mapInPandas(scan, WARC_RECORD_SCHEMA)


def write_warc(
    df: DataFrame,
    out_dir: str,
    url_col: str = "url",
    payload_col: str = "html",
    http_content_type: str = "text/html",
) -> int:
    """Distributed WARC sink: each partition serializes its rows as
    per-record gzip members into ``part-<pid>-<uuid>.warc.gz`` under
    ``out_dir`` (local/shared FS — a binary container has no
    DataFrameWriter format, so this is the documented mapPartitions
    tier). Returns the number of records written; rows never pass
    through the driver."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    run = uuid.uuid4().hex[:8]

    def dump(it: Iterable) -> Iterator[int]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        n = 0
        fname = os.path.join(out_dir, f"part-{pid:05d}-{run}.warc.gz")
        f = None  # opened on first record: empty partitions write nothing,
        # and a 1-file-per-partition stream never buffers the partition
        try:
            for row in it:
                payload = row[payload_col]
                if isinstance(payload, str):
                    payload = payload.encode("utf-8")
                if f is None:
                    f = open(fname, "wb")
                f.write(
                    _gzip_member(
                        warc_record_bytes(
                            "response",
                            payload,
                            target_uri=row[url_col],
                            http_status=200,
                            http_content_type=http_content_type,
                        )
                    )
                )
                n += 1
        finally:
            if f is not None:
                f.close()
        yield n

    counts = df.select(url_col, payload_col).rdd.mapPartitions(dump).collect()
    return sum(counts)
