"""WARC / WET web-archive container — the flagship pipeline's native
wire format (Common-Crawl-style pages), re-derived from the public
ISO 28500 / WARC 1.0 specification.  No warcio; the container has
none — framing is hand-parsed.

A WARC file is a sequence of records:

    WARC/1.0\\r\\n
    <name>: <value>\\r\\n ...            (WARC named fields)
    \\r\\n
    <Content-Length bytes of block>\\r\\n\\r\\n

``response`` records carry an HTTP response in the block (status
line + headers + payload); ``conversion`` records (WET) carry
extracted text.  Common Crawl gzips each record as its OWN gzip
member (``.warc.gz``) so readers can split on member boundaries —
the multi-member form is what ``_split_gzip_members`` consumes.

Scale shape: one WARC file per task (the Common-Crawl layout is
~1 GiB per file, thousands of files per crawl — file-level
parallelism is the natural shard).  ``read_warc`` ships only paths;
every task reads and inflates ONLY its own file.  ``write_warc``
is a resumable partitioned sink: each task writes its own
``part-NNNNN.warc.gz`` shard idempotently; the driver writes nothing.
"""

from __future__ import annotations

import gzip
import io
import zlib

import numpy as np

_CRLF = b"\r\n"


# ---------------------------------------------------------------------------
# record-level parse / build
# ---------------------------------------------------------------------------


def _parse_headers(blob: bytes) -> tuple[dict, int]:
    """Header lines up to the blank line → ({lower-name: value}, end)."""
    end = blob.find(b"\r\n\r\n")
    if end < 0:
        raise ValueError("WARC: unterminated header block")
    headers: dict[str, str] = {}
    for line in blob[:end].split(_CRLF)[1:]:  # [0] is the version line
        if not line:
            continue
        k, _, v = line.partition(b":")
        headers[k.strip().lower().decode("ascii")] = v.strip().decode(
            "utf-8", "replace")
    return headers, end + 4


def parse_warc_records(data: bytes):
    """Plain (inflated) WARC bytes → iterator of
    (headers dict, block bytes)."""
    pos = 0
    n = len(data)
    while pos < n:
        # tolerate inter-record padding
        while pos < n and data[pos:pos + 1] in (b"\r", b"\n"):
            pos += 1
        if pos >= n:
            return
        if not data.startswith(b"WARC/", pos):
            raise ValueError(f"WARC: bad record marker at {pos}")
        headers, hlen = _parse_headers(data[pos:])
        clen = int(headers.get("content-length", "0"))
        start = pos + hlen
        yield headers, data[start:start + clen]
        pos = start + clen
        if data[pos:pos + 4] == b"\r\n\r\n":
            pos += 4


def strip_http_response(block: bytes) -> tuple[bytes, int]:
    """HTTP response block → (payload, status). Handles chunked
    transfer-encoding; anything else is length-of-block framed."""
    end = block.find(b"\r\n\r\n")
    if end < 0 or not block.startswith(b"HTTP/"):
        return block, 0
    head = block[:end].split(_CRLF)
    try:
        status = int(head[0].split()[1])
    except (IndexError, ValueError):
        status = 0
    payload = block[end + 4:]
    chunked = any(b"transfer-encoding" in h.lower()
                  and b"chunked" in h.lower() for h in head[1:])
    if chunked:
        out = bytearray()
        pos = 0
        while True:
            nl = payload.find(_CRLF, pos)
            if nl < 0:
                break
            try:
                size = int(payload[pos:nl].split(b";")[0], 16)
            except ValueError:
                break
            if size == 0:
                break
            out += payload[nl + 2:nl + 2 + size]
            pos = nl + 2 + size + 2
        payload = bytes(out)
    return payload, status


def _warc_date_to_us(s: str) -> int:
    """ISO-8601 WARC-Date → epoch microseconds (no tz libs needed:
    the spec fixes UTC 'Z')."""
    import datetime as dt

    s = s.strip().rstrip("Z")
    fmt = "%Y-%m-%dT%H:%M:%S.%f" if "." in s else "%Y-%m-%dT%H:%M:%S"
    d = dt.datetime.strptime(s, fmt).replace(tzinfo=dt.timezone.utc)
    return int(d.timestamp() * 1_000_000)


def _us_to_warc_date(us: int) -> str:
    import datetime as dt

    d = dt.datetime.fromtimestamp(us / 1_000_000, dt.timezone.utc)
    return d.strftime("%Y-%m-%dT%H:%M:%SZ")


def build_warc_record(rtype: str, url: str, ts_us: int, block: bytes,
                      content_type: str | None = None,
                      record_id: str | None = None) -> bytes:
    """One WARC 1.0 record (uncompressed). record_id defaults to a
    deterministic urn:uuid derived from (url, ts) — reproducible
    output, no Date.now/random in the write path."""
    import hashlib

    if record_id is None:
        h = hashlib.sha256(f"{url}\x00{ts_us}".encode()).hexdigest()
        record_id = (f"urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-"
                     f"{h[16:20]}-{h[20:32]}")
    if content_type is None:
        content_type = ("application/http; msgtype=response"
                        if rtype == "response" else "text/plain")
    lines = [b"WARC/1.0",
             b"WARC-Type: " + rtype.encode(),
             b"WARC-Record-ID: <" + record_id.encode() + b">",
             b"WARC-Date: " + _us_to_warc_date(ts_us).encode()]
    if url:
        lines.append(b"WARC-Target-URI: " + url.encode())
    lines += [b"Content-Type: " + content_type.encode(),
              b"Content-Length: " + str(len(block)).encode()]
    return _CRLF.join(lines) + _CRLF * 2 + block + _CRLF * 2


def build_http_response_block(payload: bytes,
                              mime: str = "text/html") -> bytes:
    return (b"HTTP/1.1 200 OK\r\nContent-Type: " + mime.encode()
            + b"\r\nContent-Length: " + str(len(payload)).encode()
            + _CRLF * 2 + payload)


# ---------------------------------------------------------------------------
# gzip member framing (.warc.gz)
# ---------------------------------------------------------------------------


def _split_gzip_members(data: bytes):
    """Multi-member gzip → iterator of inflated member bytes (the
    Common-Crawl record-per-member layout)."""
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        out = d.decompress(data[pos:])
        yield out + d.flush()
        consumed = (n - pos) - len(d.unused_data)
        if consumed <= 0:
            raise ValueError("gzip member made no progress")
        pos += consumed


def inflate_warc(data: bytes) -> bytes:
    """.warc or .warc.gz bytes → plain WARC bytes."""
    if data[:2] == b"\x1f\x8b":
        return b"".join(_split_gzip_members(data))
    return data


# ---------------------------------------------------------------------------
# table <-> records
# ---------------------------------------------------------------------------


def warc_bytes_to_table(data: bytes, keep_types=("response",
                                                 "conversion")):
    """WARC(.gz) bytes → pyarrow Table
    (url, warc_ts, record_type, http_status, payload)."""
    import pyarrow as pa

    urls, tss, types, stats, payloads = [], [], [], [], []
    for headers, block in parse_warc_records(inflate_warc(data)):
        rtype = headers.get("warc-type", "")
        if rtype not in keep_types:
            continue
        if rtype == "response":
            payload, status = strip_http_response(block)
        else:
            payload, status = block, 0
        urls.append(headers.get("warc-target-uri", ""))
        tss.append(_warc_date_to_us(headers.get(
            "warc-date", "1970-01-01T00:00:00Z")))
        types.append(rtype)
        stats.append(status)
        payloads.append(payload)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "record_type": pa.array(types, pa.string()),
        "http_status": pa.array(stats, pa.int32()),
        "payload": pa.array(payloads, pa.binary()),
    })


def table_to_warc_bytes(table, payload_col: str = "payload",
                        rtype: str = "response",
                        compress: bool = True) -> bytes:
    """Arrow batch → WARC(.gz) bytes, one gzip member per record
    (the Common-Crawl random-access layout)."""
    urls = table["url"].to_pylist() if "url" in table.column_names \
        else [""] * table.num_rows
    if "warc_ts" in table.column_names:
        ts = table["warc_ts"].cast("int64").to_pylist()
    else:
        ts = [0] * table.num_rows
    payloads = table[payload_col].to_pylist()
    types = (table["record_type"].to_pylist()
             if "record_type" in table.column_names
             else [rtype] * table.num_rows)
    out = io.BytesIO()
    for url, t, body, rt in zip(urls, ts, payloads, types):
        if isinstance(body, str):
            body = body.encode()
        block = (build_http_response_block(body)
                 if rt == "response" else body)
        rec = build_warc_record(rt, url, t or 0, block)
        if compress:
            out.write(gzip.compress(rec, 6, mtime=0))
        else:
            out.write(rec)
    return out.getvalue()


# ---------------------------------------------------------------------------
# Ray Data surface
# ---------------------------------------------------------------------------


def read_warc(paths, keep_types=("response", "conversion")):
    """WARC file list → Dataset (url, warc_ts, record_type,
    http_status, payload).  One file per task — the driver ships
    PATHS only (Common-Crawl shard shape; see module docstring)."""
    import pyarrow as pa
    import ray.data as rd

    from gdal_ray.vsi import vsi_read_bytes

    if isinstance(paths, str):
        import glob as _g
        import os

        if os.path.isdir(paths):
            paths = sorted(
                _g.glob(os.path.join(paths, "**", "*.warc*"),
                        recursive=True))
        else:
            paths = [paths]
    ds = rd.from_items([{"path": p} for p in paths])
    keep = tuple(keep_types)

    def load(batch: pa.Table) -> pa.Table:
        tabs = [warc_bytes_to_table(vsi_read_bytes(p), keep)
                for p in batch["path"].to_pylist()]
        return pa.concat_tables(tabs)

    return ds.map_batches(load, batch_format="pyarrow")


def write_warc(ds, out_dir: str, rtype: str = "response",
               payload_col: str = "payload") -> list[str]:
    """Dataset → directory of part-NNNNN.warc.gz shards.  Encoding +
    writing happen inside tasks (one shard per block, idempotent
    tempfile+rename — the engine's resumable-sink contract); the
    driver gets back only the shard paths."""
    import os

    import pyarrow as pa

    os.makedirs(out_dir, exist_ok=True)

    def dump(batch: pa.Table, ctx=None) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"path": pa.array([], pa.string()),
                             "records": pa.array([], pa.int64())})
        import hashlib

        blob = table_to_warc_bytes(batch, payload_col, rtype)
        tag = hashlib.sha256(blob).hexdigest()[:12]
        path = os.path.join(out_dir, f"part-{tag}.warc.gz")
        tmp = path + ".tmp"
        if not os.path.exists(path):  # resume: skip finished shards
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, path)
        return pa.table({"path": pa.array([path]),
                         "records": pa.array([batch.num_rows],
                                             pa.int64())})

    manifest = ds.map_batches(dump, batch_format="pyarrow")
    rows = manifest.take_all()
    return sorted(r["path"] for r in rows)
