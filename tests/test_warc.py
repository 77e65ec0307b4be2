"""WARC / WET container tests — ISO 28500 / WARC 1.0 framing pins,
gzip member splitting (Common-Crawl record-per-member layout), HTTP
response stripping incl. chunked transfer-encoding, and the Ray
read/write roundtrip feeding the flagship HTML-extract pipeline.
"""

import gzip

import numpy as np
import pyarrow as pa
import pytest

from gdal_ray.warc import (
    build_http_response_block,
    build_warc_record,
    inflate_warc,
    parse_warc_records,
    read_warc,
    strip_http_response,
    table_to_warc_bytes,
    warc_bytes_to_table,
    write_warc,
)

TS = 1_735_689_600_000_000  # 2025-01-01T00:00:00Z in epoch us


def test_record_framing_pin():
    rec = build_warc_record("response", "http://a.example/x", TS,
                            b"BLOCK")
    # spec framing: version line, named fields, blank line, block,
    # two CRLFs
    assert rec.startswith(b"WARC/1.0\r\nWARC-Type: response\r\n")
    assert b"WARC-Date: 2025-01-01T00:00:00Z\r\n" in rec
    assert b"WARC-Target-URI: http://a.example/x\r\n" in rec
    assert b"Content-Length: 5\r\n" in rec
    assert rec.endswith(b"\r\n\r\nBLOCK\r\n\r\n")
    # deterministic record id (no RNG in the write path)
    rec2 = build_warc_record("response", "http://a.example/x", TS,
                             b"BLOCK")
    assert rec == rec2


def test_parse_roundtrip():
    recs = (build_warc_record("response", "http://a/1", TS,
                              build_http_response_block(b"<p>hi</p>"))
            + build_warc_record("conversion", "http://a/1", TS, b"hi")
            + build_warc_record("warcinfo", "", TS, b"software: x"))
    got = list(parse_warc_records(recs))
    assert [h["warc-type"] for h, _ in got] == [
        "response", "conversion", "warcinfo"]
    payload, status = strip_http_response(got[0][1])
    assert payload == b"<p>hi</p>" and status == 200
    assert got[1][1] == b"hi"


def test_chunked_transfer_encoding():
    body = (b"HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n"
            b"4\r\nWiki\r\n5\r\npedia\r\n0\r\n\r\n")
    payload, status = strip_http_response(body)
    assert payload == b"Wikipedia" and status == 200


def test_gzip_member_split():
    a = build_warc_record("conversion", "u1", TS, b"one")
    b = build_warc_record("conversion", "u2", TS, b"two")
    blob = (gzip.compress(a, mtime=0) + gzip.compress(b, mtime=0))
    assert inflate_warc(blob) == a + b
    t = warc_bytes_to_table(blob)
    assert t["url"].to_pylist() == ["u1", "u2"]
    assert t["payload"].to_pylist() == [b"one", b"two"]


def test_table_roundtrip():
    t = pa.table({
        "url": ["http://e/1", "http://e/2"],
        "warc_ts": pa.array([TS, TS + 1_000_000],
                            pa.timestamp("us")),
        "payload": [b"<html>a</html>", b"<html>b</html>"],
    })
    blob = table_to_warc_bytes(t)
    back = warc_bytes_to_table(blob)
    assert back["url"].to_pylist() == t["url"].to_pylist()
    assert back["warc_ts"].to_pylist() == t["warc_ts"].to_pylist()
    assert back["payload"].to_pylist() == t["payload"].to_pylist()
    assert back["http_status"].to_pylist() == [200, 200]
    assert back["record_type"].to_pylist() == ["response"] * 2
    # uncompressed form parses identically
    raw = table_to_warc_bytes(t, compress=False)
    assert warc_bytes_to_table(raw).equals(back)


def test_warcinfo_and_request_filtered():
    recs = (build_warc_record("warcinfo", "", TS, b"x")
            + build_warc_record("request", "http://e", TS, b"GET /")
            + build_warc_record("response", "http://e", TS,
                                build_http_response_block(b"ok")))
    t = warc_bytes_to_table(recs)
    assert t.num_rows == 1
    assert t["record_type"].to_pylist() == ["response"]


def test_ray_roundtrip_and_pipeline(ray_session, tmp_path):
    # documents -> synthetic HTML pages -> WARC shards -> read back
    # -> extract_text == direct extraction (flagship wire format)
    import ray.data as rd

    from gdal_ray.stages.html import extract_text, synthesize_html

    rows = [{"url": f"http://ex.com/{i}",
             "warc_ts": TS + i * 1_000_000,
             "payload": synthesize_html(
                 f"http://ex.com/{i}",
                 f"Document {i} body text with words " * 3)}
            for i in range(97)]
    ds = rd.from_items(rows).repartition(5)
    out = str(tmp_path / "crawl")
    paths = write_warc(ds, out)
    assert len(paths) >= 2  # sharded, not one giant file
    back = read_warc(out).take_all()
    assert len(back) == 97
    by_url = {r["url"]: r for r in back}
    for r in rows:
        g = by_url[r["url"]]
        assert g["payload"] == r["payload"]
        assert g["warc_ts"] == __import__("datetime").datetime.fromtimestamp(
            r["warc_ts"] / 1e6, __import__("datetime").timezone.utc
        ).replace(tzinfo=None)
        assert extract_text(g["payload"]) == extract_text(r["payload"])


def test_write_warc_resume(ray_session, tmp_path):
    # a second write over the same output dir reuses finished shards
    import os

    import ray.data as rd

    rows = [{"url": f"u{i}", "warc_ts": TS, "payload": b"x" * i}
            for i in range(20)]
    out = str(tmp_path / "w")
    p1 = write_warc(rd.from_items(rows).repartition(3), out)
    mtimes = {p: os.path.getmtime(p) for p in p1}
    p2 = write_warc(rd.from_items(rows).repartition(3), out)
    assert p1 == p2
    for p in p2:
        assert os.path.getmtime(p) == mtimes[p]


def test_cli_warc_roundtrip(ray_session, tmp_path):
    # read parquet -> write .warc.d shards -> read the shards back
    # through the CLI source dispatch
    import ray.data as rd

    from gdal_ray import cli

    rows = [{"url": f"http://c/{i}", "warc_ts": TS,
             "payload": f"<p>page {i}</p>".encode()} for i in range(9)]
    src = str(tmp_path / "pages.parquet")
    rd.from_items(rows).write_parquet(src)
    out = str(tmp_path / "crawl.warc.d")
    cli.run_pipeline(f"read {src} ! write {out}")
    n, kind = cli.run_pipeline(f"read {out} ! count")
    assert kind == "count" and n == 9
