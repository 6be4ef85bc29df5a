"""WARC source — the native Common-Crawl interchange format (ISO 28500).

The corpus this engine targets (north rule: "Parquet tables of
Common-Crawl-style web pages") is DERIVED from WARC crawl segments; this
module closes the loop so a user can start from the crawl itself:
``read_warc`` turns a directory of ``.warc`` / ``.warc.gz`` segment files
into the exact pages Dataset the index build consumes (url, warc_ts,
html, text, lang — text null, extracted later by the build's own clean
stage), and the ``ingest-warc`` CLI materializes it as shard-partitioned
pages parquet.

Ray-Data-first shape (same as sources/jsonl.py): segment file names
enumerate on the driver (metadata only); contents are read DISTRIBUTED
via ``read_binary_files`` — one task per segment, the correct unit
because gzip members are not splittable and crawls already bound segment
size (~1 GB). Parsing is stdlib-only.

Format notes (the subset that matters, ISO 28500 / WARC 1.0-1.1):

* a record is ``WARC/1.x CRLF`` + named headers + ``CRLF`` + a content
  block of exactly ``Content-Length`` bytes + ``CRLF CRLF``;
* Common Crawl compresses each record as its OWN gzip member,
  concatenated — stdlib ``gzip.decompress`` handles multi-member
  streams, so one call restores the whole segment;
* only ``WARC-Type: response`` records carry pages; their block is an
  HTTP response — headers up to the first blank line, body = the HTML
  payload. warcinfo / request / metadata records are skipped;
* ``WARC-Date`` is ISO-8601 UTC (``2024-01-01T00:00:00Z``) →
  ``warc_ts`` timestamp[us], the same column the parquet corpus carries.

Malformed records are counted and skipped per task (never silently:
logged), mirroring the JSONL reader's bad-line contract.
"""

from __future__ import annotations

import gzip
import logging
import os
from datetime import datetime, timezone

import pyarrow as pa

log = logging.getLogger(__name__)

PAGES_SCHEMA = pa.schema([
    ("url", pa.string()),
    ("warc_ts", pa.timestamp("us")),
    ("html", pa.binary()),
    ("text", pa.string()),
    ("lang", pa.string()),
])

_CRLF2 = b"\r\n\r\n"


def _parse_warc_date(s: str) -> int:
    """ISO-8601 UTC WARC-Date -> microseconds since epoch."""
    s = s.strip()
    if s.endswith("Z"):
        s = s[:-1] + "+00:00"
    dt = datetime.fromisoformat(s)
    if dt.tzinfo is None:
        dt = dt.replace(tzinfo=timezone.utc)
    return int(dt.timestamp() * 1_000_000)


def parse_warc_records(raw: bytes):
    """Yield ``(url, ts_us, html_bytes)`` for each response record of one
    (already decompressed) WARC segment. Non-response records are
    skipped; structurally broken records abort the remainder of the
    segment (a truncated segment tail — counted by the caller)."""
    pos = 0
    n = len(raw)
    while pos < n:
        # tolerate inter-record padding (spec says exactly CRLF CRLF,
        # some writers emit more)
        while pos < n and raw[pos:pos + 2] == b"\r\n":
            pos += 2
        if pos >= n:
            return
        if not raw.startswith(b"WARC/", pos):
            raise ValueError(f"expected record header at offset {pos}")
        hdr_end = raw.find(_CRLF2, pos)
        if hdr_end < 0:
            raise ValueError("truncated record header")
        headers: dict[str, str] = {}
        for line in raw[pos:hdr_end].split(b"\r\n")[1:]:
            k, _, v = line.partition(b":")
            headers[k.strip().lower().decode("latin-1")] = \
                v.strip().decode("latin-1")
        try:
            clen = int(headers["content-length"])
        except (KeyError, ValueError) as e:
            raise ValueError("missing/bad Content-Length") from e
        block = raw[hdr_end + 4:hdr_end + 4 + clen]
        if len(block) != clen:
            raise ValueError("truncated record block")
        pos = hdr_end + 4 + clen
        if headers.get("warc-type") != "response":
            continue
        url = headers.get("warc-target-uri")
        date = headers.get("warc-date")
        if not url or not date:
            raise ValueError("response record without URI/Date")
        # HTTP response block: status+headers, blank line, body
        sep = block.find(_CRLF2)
        body = block[sep + 4:] if sep >= 0 else block
        yield url, _parse_warc_date(date), body


def list_warc_files(root: str) -> list[str]:
    """``.warc`` / ``.warc.gz`` files under ``root`` (or [root] for a
    single file), sorted for deterministic task order."""
    if os.path.isfile(root):
        return [root]
    out = []
    for dirpath, dirnames, filenames in os.walk(root):
        dirnames[:] = [d for d in dirnames if not d.startswith(".")]
        out += [os.path.join(dirpath, f) for f in filenames
                if not f.startswith(".")
                and f.endswith((".warc", ".warc.gz"))]
    return sorted(out)


def _parse_file_batch(batch: pa.Table) -> pa.Table:
    """One batch of (path, bytes) segment blobs -> pages rows."""
    urls, tss, htmls = [], [], []
    n_bad = 0
    for path, blob in zip(batch.column("path").to_pylist(),
                          batch.column("bytes").to_pylist()):
        raw = gzip.decompress(blob) if blob[:2] == b"\x1f\x8b" else blob
        try:
            for url, ts, html in parse_warc_records(raw):
                urls.append(url)
                tss.append(ts)
                htmls.append(html)
        except ValueError as e:
            n_bad += 1
            log.warning("warc: skipping rest of %s: %s", path, e)
    if n_bad:
        log.warning("warc: %d segment(s) truncated/malformed in task",
                    n_bad)
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(tss, pa.timestamp("us")),
        "html": pa.array(htmls, pa.binary()),
        "text": pa.array([None] * len(urls), pa.string()),
        "lang": pa.array([""] * len(urls), pa.string()),
    }, schema=PAGES_SCHEMA)


def read_warc(root: str | list[str]):
    """Directory (or list) of WARC segments -> pages Dataset, ready for
    ``build_index`` / any pages-consuming pipeline. ``text`` is null —
    the build's clean stage extracts it from ``html``, preserving the
    byte-identical-extraction contract."""
    import ray.data as rd

    files = (list_warc_files(root) if isinstance(root, str)
             else [f for r in root for f in list_warc_files(r)])
    if not files:
        raise FileNotFoundError(f"no .warc/.warc.gz files under {root!r}")
    return rd.read_binary_files(files, include_paths=True) \
        .map_batches(_parse_file_batch, batch_format="pyarrow")


# ------------------------- fixture / test writer -------------------------
def write_warc(path: str, records: list[dict],
               gzip_per_record: bool = True) -> int:
    """Write a valid WARC 1.0 segment — the deterministic test/fixture
    twin of ``parse_warc_records`` (and a usable exporter). ``records``
    are dicts with ``url``, ``html`` (bytes), optional ``ts_us`` and
    ``warc_type``. Per-record gzip members by default (the Common Crawl
    layout). Returns the number of records written."""
    import hashlib

    out = []
    for r in records:
        wtype = r.get("warc_type", "response")
        ts = r.get("ts_us", 1704067200000000)
        dt = datetime.fromtimestamp(ts / 1e6, tz=timezone.utc)
        date = dt.strftime("%Y-%m-%dT%H:%M:%SZ")
        if wtype == "response":
            body = r["html"]
            http = (b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                    + b"Content-Length: " + str(len(body)).encode()
                    + b"\r\n\r\n" + body)
        else:
            http = r.get("html", b"")
        rid = hashlib.md5(
            (r.get("url", "") + str(ts) + wtype).encode()).hexdigest()
        hdrs = [b"WARC/1.0",
                b"WARC-Type: " + wtype.encode(),
                b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">",
                b"WARC-Date: " + date.encode()]
        if wtype == "response":
            hdrs.append(b"WARC-Target-URI: " + r["url"].encode())
            hdrs.append(b"Content-Type: application/http;msgtype=response")
        hdrs.append(b"Content-Length: " + str(len(http)).encode())
        rec = b"\r\n".join(hdrs) + _CRLF2 + http + _CRLF2
        out.append(gzip.compress(rec) if gzip_per_record else rec)
    with open(path, "wb") as f:
        f.write(b"".join(out))
    return len(records)
