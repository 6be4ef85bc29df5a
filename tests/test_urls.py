"""URL-level curation family (functions/urls.py): domain extraction,
blocklist filter, per-domain cap, per-domain stats — engine vs literal
DuckDB twins on a synthetic multi-domain pages table."""

import json
import os
import subprocess
import sys

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data as rd

from search_engine_ray.functions.urls import (
    cap_per_domain,
    domain_of_batch,
    domain_stats,
    extract_domains,
    filter_domains,
)

DOMAIN_SQL = (
    "regexp_replace(lower(coalesce(regexp_extract(url, "
    "'^[A-Za-z][A-Za-z0-9+.\\-]*://(?:[^/@?#]*@)?([^/:?#]+)', 1), '')), "
    "'^www\\.', '')"
)


def _pages(n_domains=6, per=(7, 5, 4, 3, 2, 1)):
    urls, ts, langs, texts = [], [], [], []
    for d in range(n_domains):
        host = f"site{d}.example.com"
        for i in range(per[d]):
            scheme = "https" if (d + i) % 2 else "http"
            www = "www." if i % 3 == 0 else ""
            port = ":8080" if i % 4 == 3 else ""
            urls.append(f"{scheme}://{www}{host}{port}/p/{i}?q={d}")
            ts.append(1_700_000_000_000_000 + d * 1000 + (i % 3) * 7)
            langs.append(["en", "de", "fr"][i % 3])
            texts.append(f"doc {d} {i} " + "tok " * (d + i))
    return pa.table({
        "url": pa.array(urls, pa.string()),
        "warc_ts": pa.array(ts, pa.timestamp("us")),
        "html": pa.array([b""] * len(urls), pa.binary()),
        "text": pa.array(texts, pa.string()),
        "lang": pa.array(langs, pa.string()),
    })


def test_domain_kernel_cases():
    cases = {
        "https://www.Example.COM/a/b?x=1": "example.com",
        "http://example.com:8080/": "example.com",
        "ftp://user:pw@Files.Example.org/x": "files.example.org",
        "https://www.www.double.net/": "www.double.net",  # ONE www strip
        "not a url": "",
        "": "",
        "https://nopath.io": "nopath.io",
        "https://host/#frag": "host",
    }
    got = domain_of_batch(pa.array(list(cases), pa.string())).to_pylist()
    assert got == list(cases.values())


def test_domain_stats_matches_duckdb(ray_session, tmp_path):
    pages = _pages()
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    eng = domain_stats(rd.read_parquet(p)).to_pandas() \
        .sort_values("domain").reset_index(drop=True)
    want = duckdb.sql(f"""
        SELECT {DOMAIN_SQL} AS domain,
               count(*)::BIGINT AS n_docs,
               count(DISTINCT lang)::BIGINT AS n_langs,
               sum(length(text))::BIGINT AS total_chars
        FROM read_parquet('{p}') GROUP BY 1 ORDER BY 1
    """).df()
    assert eng[["domain", "n_docs", "n_langs", "total_chars"]] \
        .equals(want)


def test_filter_domains_and_invert(ray_session, tmp_path):
    pages = _pages()
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    blocked = ["WWW.site0.example.com", "site3.example.com"]
    kept = filter_domains(rd.read_parquet(p), blocked).to_pandas()
    dropped = filter_domains(rd.read_parquet(p), blocked,
                             invert=True).to_pandas()
    assert len(kept) + len(dropped) == pages.num_rows
    assert len(dropped) == 7 + 3  # per-domain page counts in _pages
    assert not any("site0.example.com" in u or "site3.example.com" in u
                   for u in kept["url"])
    assert all("site0" in u or "site3" in u for u in dropped["url"])


def test_cap_per_domain_matches_window_sql(ray_session, tmp_path):
    pages = _pages()
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    capped = cap_per_domain(rd.read_parquet(p), cap=3).to_pandas()
    want = duckdb.sql(f"""
        SELECT url FROM (
          SELECT url, row_number() OVER (
            PARTITION BY {DOMAIN_SQL}
            ORDER BY warc_ts DESC, url ASC) AS rn
          FROM read_parquet('{p}')) WHERE rn <= 3 ORDER BY url
    """).df()["url"].tolist()
    assert sorted(capped["url"]) == want
    # full rows survive intact (semi_join projects nothing away)
    assert sorted(capped.columns) == sorted(
        ["url", "warc_ts", "html", "text", "lang"])
    # idempotent: capping the capped corpus is a no-op
    out2 = str(tmp_path / "capped.parquet")
    pq.write_table(pa.Table.from_pandas(capped, preserve_index=False), out2)
    again = cap_per_domain(rd.read_parquet(out2), cap=3).to_pandas()
    assert sorted(again["url"]) == sorted(capped["url"])
    with pytest.raises(ValueError):
        cap_per_domain(rd.read_parquet(p), cap=0)


def test_cap_counts_distinct_urls(ray_session, tmp_path):
    """A url carrying exact-dup copies ranks ONCE; its copies follow it
    through the semi join (cap-before-dedup ordering stays sane)."""
    base = _pages(n_domains=1, per=(4,))
    dup = base.slice(0, 2)  # two extra copies of the first two urls
    pages = pa.concat_tables([base, dup])
    p = str(tmp_path / "dup.parquet")
    pq.write_table(pages, p)
    capped = cap_per_domain(rd.read_parquet(p), cap=3).to_pandas()
    assert capped["url"].nunique() == 3  # the cap binds on distinct urls
    want = duckdb.sql(f"""
        SELECT url FROM (
          SELECT url, row_number() OVER (
            PARTITION BY {DOMAIN_SQL}
            ORDER BY warc_ts DESC, url ASC) AS rn
          FROM (SELECT DISTINCT url, warc_ts
                FROM read_parquet('{p}'))) WHERE rn <= 3
    """).df()["url"].tolist()
    assert set(capped["url"]) == set(want)


def test_extract_domains_column(ray_session, tmp_path):
    pages = _pages(n_domains=2, per=(2, 1))
    p = str(tmp_path / "pages.parquet")
    pq.write_table(pages, p)
    t = extract_domains(rd.read_parquet(p)).to_pandas()
    assert set(t["domain"]) == {"site0.example.com", "site1.example.com"}


def test_domains_cli(ray_session, tmp_path):
    pages = _pages()
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "p.parquet"))
    blockfile = tmp_path / "block.txt"
    blockfile.write_text("site5.example.com\n")
    env = {**os.environ, "RAY_ADDRESS": "local"}
    out = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "domains",
         "--input", str(pdir), "--out", str(tmp_path / "curated"),
         "--block", str(blockfile), "--cap", "2"],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert out.returncode == 0, out.stderr[-2000:]
    rep = json.loads(out.stdout.strip().splitlines()[-1])
    # 6 domains x min(per, 2) minus blocked site5 (1 page, capped to 1)
    assert rep == {"mode": "curate", "n_kept": 2 * 5,
                   "out": str(tmp_path / "curated")}
    stats = subprocess.run(
        [sys.executable, "-m", "search_engine_ray.jobs", "domains",
         "--input", str(pdir), "--out", str(tmp_path / "dstats"),
         "--stats"],
        capture_output=True, text=True, cwd="/root/repo", env=env)
    assert stats.returncode == 0, stats.stderr[-2000:]
    rep2 = json.loads(stats.stdout.strip().splitlines()[-1])
    assert rep2["n_domains"] == 6
