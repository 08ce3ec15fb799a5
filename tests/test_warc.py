"""WARC source/sink (sources/warc.py): pure-parser unit tests (spec
shapes, malformed-record resync, truncation, gzip members) plus the
distributed write→read roundtrip against the documents corpus."""

from __future__ import annotations

import glob
import gzip
import os

import pytest
from pyspark.sql import functions as F

from docling_jobkit_spark.sources.warc import (
    _gzip_member,
    parse_warc_bytes,
    read_warc,
    warc_record_bytes,
    write_warc,
)


def _resp(uri: str, body: bytes, status: int = 200) -> bytes:
    return warc_record_bytes(
        "response", body, target_uri=uri, http_status=status,
        http_content_type="text/html",
    )


# --- parser ------------------------------------------------------------------


def test_parse_single_response():
    recs = list(parse_warc_bytes(_resp("http://a/", b"<html>hi</html>"), "f"))
    assert len(recs) == 1
    (file, rid, wtype, uri, date, status, ctype, payload, nb, err) = recs[0]
    assert (file, wtype, uri, status) == ("f", "response", "http://a/", 200)
    assert ctype == "text/html"
    assert payload == b"<html>hi</html>" and nb == len(payload)
    assert err is None and rid.startswith("<urn:uuid:")


def test_parse_multiple_and_non_response_types():
    data = (
        warc_record_bytes("warcinfo", b"software: test")
        + _resp("http://a/", b"A")
        + warc_record_bytes("request", b"GET / HTTP/1.1", target_uri="http://a/")
        + _resp("http://b/", b"B", status=404)
    )
    recs = list(parse_warc_bytes(data))
    assert [r[2] for r in recs] == ["warcinfo", "response", "request", "response"]
    assert recs[1][7] == b"A" and recs[3][7] == b"B"
    assert recs[3][5] == 404
    # non-response records keep their raw content block, NULL status
    assert recs[2][5] is None and recs[2][7] == b"GET / HTTP/1.1"


def test_parse_gzip_members_roundtrip():
    raw = _resp("http://a/", b"A") + _resp("http://b/", b"B")
    gz = _gzip_member(_resp("http://a/", b"A")) + _gzip_member(
        _resp("http://b/", b"B")
    )
    assert gz[:2] == b"\x1f\x8b"
    assert list(parse_warc_bytes(gz)) == list(parse_warc_bytes(raw))


def test_malformed_record_resyncs_not_fatal():
    bad = b"WARC/1.1\r\nWARC-Type: response\r\nWARC-Target-URI: http://bad/\r\n\r\n"
    data = bad + _resp("http://good/", b"G")
    recs = list(parse_warc_bytes(data))
    assert len(recs) == 2
    assert recs[0][9] == "missing/bad Content-Length"
    assert recs[0][3] == "http://bad/"
    assert recs[1][3] == "http://good/" and recs[1][9] is None


def test_truncated_content_is_error_row():
    rec = _resp("http://a/", b"0123456789")
    recs = list(parse_warc_bytes(rec[: len(rec) - 16]))
    assert len(recs) == 1 and "truncated content" in recs[0][9]


def test_trailing_garbage_reported():
    recs = list(parse_warc_bytes(_resp("http://a/", b"A") + b"not a record"))
    assert recs[-1][9] == "trailing garbage after last record"


def test_http_block_without_headers_end_kept_raw():
    raw = warc_record_bytes("response", b"")  # empty content block
    recs = list(parse_warc_bytes(raw))
    assert recs[0][5] is None and recs[0][7] == b""


# --- Spark roundtrip ---------------------------------------------------------


@pytest.fixture(scope="module")
def warc_dir(spark, sf_dir, tmp_path_factory):
    from docling_jobkit_spark.sources.readers import pages_from_documents

    out = str(tmp_path_factory.mktemp("warc") / f"shard-{os.getpid()}")
    pages = pages_from_documents(spark, sf_dir).select("url", "html")
    n = write_warc(pages.repartition(4), out)
    return out, pages, n


def test_write_warc_counts_and_layout(warc_dir):
    out, pages, n = warc_dir
    assert n == pages.count()
    files = glob.glob(f"{out}/part-*.warc.gz")
    assert 1 <= len(files) <= 4
    with open(files[0], "rb") as f:
        assert f.read(2) == b"\x1f\x8b"


def test_read_warc_roundtrips_payloads_exactly(spark, warc_dir):
    out, pages, n = warc_dir
    got = read_warc(spark, out)
    assert got.where(F.col("error").isNotNull()).count() == 0
    want = {
        (r["url"], r["html"].encode("utf-8") if isinstance(r["html"], str) else bytes(r["html"]))
        for r in pages.collect()
    }
    have = {(r["target_uri"], bytes(r["payload"])) for r in got.collect()}
    assert have == want
    row = got.limit(1).collect()[0]
    assert row["http_status"] == 200
    assert row["http_content_type"] == "text/html"


def test_read_warc_type_filter(spark, warc_dir, tmp_path):
    mixed = (
        warc_record_bytes("warcinfo", b"software: test")
        + _resp("http://a/", b"A")
    )
    p = tmp_path / "mixed.warc"
    p.write_bytes(mixed)
    only_resp = read_warc(spark, str(tmp_path))
    assert [r["warc_type"] for r in only_resp.collect()] == ["response"]
    everything = read_warc(spark, str(tmp_path), record_types=None)
    assert sorted(r["warc_type"] for r in everything.collect()) == [
        "response",
        "warcinfo",
    ]


def test_read_warc_surfaces_error_rows(spark, tmp_path):
    p = tmp_path / "bad.warc"
    p.write_bytes(
        b"WARC/1.1\r\nWARC-Type: response\r\n\r\n" + _resp("http://ok/", b"K")
    )
    rows = read_warc(spark, str(tmp_path)).collect()
    errs = [r for r in rows if r["error"] is not None]
    oks = [r for r in rows if r["error"] is None]
    assert len(errs) == 1 and "Content-Length" in errs[0]["error"]
    assert len(oks) == 1 and oks[0]["target_uri"] == "http://ok/"
