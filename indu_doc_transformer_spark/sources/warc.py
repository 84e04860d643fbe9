"""WARC ingestion: read Common-Crawl-style web archives into the
engine's input shape (url, warc_ts, html, lang).

The north-star input is an Iceberg table of Common-Crawl-style pages;
this module covers the step BEFORE that table exists — the raw crawl
archives. WARC/1.x 'response' records are parsed by a pure-Python
record walker (unit-testable without Spark), and the Spark surface
reads archive files through ``binaryFile`` + ``mapInPandas``.

Scale design (the honest version): a ``.warc.gz`` is a concatenation
of per-record gzip members, which is NOT seekable mid-file without the
companion index, so the parallel unit is the FILE — exactly how
Common Crawl ships data (~1 GiB x tens of thousands of files per
crawl, ample parallelism for any cluster). Per-record splitting would
need a custom input format plus the .warc.gz record index; with files
this shape it buys nothing. Malformed records become skips counted in
``n_bad`` per file (surfaced via ``warc_file_stats``), never task
failures (the E2 rule).
"""

from __future__ import annotations

import gzip
import io
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

WARC_SCHEMA = (
    "url string, warc_ts timestamp, html binary, lang string, "
    "warc_file string"
)


def _split_headers(block: bytes) -> tuple[dict, bytes]:
    """(headers, rest-after-blank-line); header names lower-cased."""
    head, sep, rest = block.partition(b"\r\n\r\n")
    if not sep:  # tolerate bare-LF writers
        head, sep, rest = block.partition(b"\n\n")
    headers: dict = {}
    for line in head.split(b"\n"):
        line = line.strip(b"\r")
        if b":" in line:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = v.strip().decode(
                "latin-1"
            )
    return headers, rest


def parse_warc(data: bytes) -> Iterator[dict]:
    """Walk WARC records in raw (already-decompressed) bytes, yielding
    {'url', 'ts', 'html', 'lang'} for each well-formed *response*
    record. Content-Length is authoritative for the block; the HTTP
    envelope inside a response block is stripped down to the payload.
    Yields {'bad': True} markers for malformed records (the caller
    counts them; parsing continues at the next version line)."""
    pos = 0
    n = len(data)
    while pos < n:
        nxt = data.find(b"WARC/", pos)
        if nxt < 0:
            break
        pos = nxt
        hdr_end = data.find(b"\r\n\r\n", pos)
        lf_only = False
        if hdr_end < 0 or (0 <= data.find(b"\n\n", pos) < hdr_end):
            alt = data.find(b"\n\n", pos)
            if alt >= 0 and (hdr_end < 0 or alt < hdr_end):
                hdr_end, lf_only = alt, True
        if hdr_end < 0:
            break
        headers, _ = _split_headers(data[pos : hdr_end + 2])
        body_start = hdr_end + (2 if lf_only else 4)
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:
            # missing/garbage/NEGATIVE length: a negative value would
            # move the scan position BACKWARDS (infinite loop) — treat
            # as malformed and resume at the next version line
            yield {"bad": True}
            pos = body_start
            continue
        block = data[body_start : body_start + length]
        pos = body_start + length
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        ts = headers.get("warc-date")
        if not url or not ts:
            yield {"bad": True}
            continue
        http_headers, payload = _split_headers(block)
        if not http_headers:  # no HTTP envelope: block IS the payload
            payload = block
        yield {
            "url": url,
            "ts": ts,
            "html": payload,
            "lang": http_headers.get("content-language"),
        }


def _decompress(content: bytes) -> bytes:
    """Transparent multi-member gzip (the .warc.gz layout: one member
    per record; Python's gzip.decompress consumes all members)."""
    if content[:2] == b"\x1f\x8b":
        return gzip.decompress(content)
    return content


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC archive files -> (url, warc_ts, html, lang, warc_file):
    one Arrow-batched parse pass per file, no driver-side I/O. The
    binaryFile source prunes to (path, content); parallelism = files
    (see module docstring)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls, tss, htmls, langs, files = [], [], [], [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                try:
                    data = _decompress(bytes(content))
                except OSError:
                    continue  # corrupt archive: whole-file skip, no task failure
                for rec in parse_warc(data):
                    if rec.get("bad"):
                        continue
                    urls.append(rec["url"])
                    tss.append(rec["ts"])
                    htmls.append(rec["html"])
                    langs.append(rec["lang"])
                    files.append(p)
            out = pd.DataFrame(
                {
                    "url": urls,
                    "warc_ts": pd.to_datetime(
                        pd.Series(tss, dtype="object"), utc=True, errors="coerce"
                    ).dt.tz_localize(None),
                    "html": htmls,
                    "lang": langs,
                    "warc_file": files,
                }
            )
            yield out

    src = spark.read.format("binaryFile").load(path).select("path", "content")
    return src.mapInPandas(kernel, schema=WARC_SCHEMA)


def warc_file_stats(spark: SparkSession, path: str) -> DataFrame:
    """Per-archive ingest counters (the E3 pattern for the crawl
    source): (warc_file, n_records, n_response, n_bad)."""

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for p, content in zip(pdf["path"], pdf["content"]):
                n_rec = n_resp = n_bad = 0
                try:
                    data = _decompress(bytes(content))
                except OSError:
                    rows.append((p, 0, 0, -1))  # -1 = unreadable archive
                    continue
                for rec in parse_warc(data):
                    n_rec += 1
                    if rec.get("bad"):
                        n_bad += 1
                    else:
                        n_resp += 1
                rows.append((p, n_rec, n_resp, n_bad))
            yield pd.DataFrame(
                rows, columns=["warc_file", "n_records", "n_response", "n_bad"]
            )

    src = spark.read.format("binaryFile").load(path).select("path", "content")
    return src.mapInPandas(
        kernel,
        schema="warc_file string, n_records long, n_response long, n_bad long",
    )


def write_warc(records: list[dict], path: str, per_record_gzip: bool = True) -> None:
    """Serialize (url, ts, html[, lang]) dicts as a WARC/1.0 file —
    per-record gzip members when ``per_record_gzip`` (the .warc.gz
    layout), plain otherwise. Used by tests and as the export analog
    of the reader; deterministic given its input."""
    out = io.BytesIO()
    for r in records:
        http = b"HTTP/1.1 200 OK\r\nContent-Type: text/html"
        if r.get("lang"):
            http += b"\r\nContent-Language: " + r["lang"].encode()
        http += b"\r\n\r\n"
        block = http + bytes(r["html"])
        head = (
            b"WARC/1.0\r\n"
            b"WARC-Type: response\r\n"
            b"WARC-Target-URI: " + r["url"].encode() + b"\r\n"
            b"WARC-Date: " + r["ts"].encode() + b"\r\n"
            b"Content-Length: " + str(len(block)).encode() + b"\r\n\r\n"
        )
        rec = head + block + b"\r\n\r\n"
        out.write(gzip.compress(rec) if per_record_gzip else rec)
    with open(path, "wb") as f:
        f.write(out.getvalue())
