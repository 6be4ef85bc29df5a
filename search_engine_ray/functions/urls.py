"""URL-level corpus curation: domain extraction, blocklist filtering,
per-domain caps, per-domain stats.

Web-corpus pipelines curate at the DOMAIN granularity before any
content-level gate runs: C4 dropped pages from a bad-word blocklist of
domains, RefinedWeb caps the number of pages any single registered
domain contributes (head domains are crawler traps / boilerplate farms
— capping them is the cheapest diversity win per byte), and per-domain
stats drive both lists. The reference engine has no URL notion (its
unit is a file path); this family extends the engine's pages corpus
(`url:string, warc_ts, html, text, lang` — SURVEY.md §1) the way the
webtext gates extend its content path.

Scale shapes:

* domain extraction — pure per-batch Arrow regex kernel, zero shuffle;
* blocklist filter — the list is bounded (10^4..10^6 domains), so it is
  broadcast once via ``ray.put`` and each batch filters with one hashed
  ``pc.is_in`` — no exchange, the C4-style cheap gate;
* per-domain cap — domain cardinality is unbounded and head domains are
  exactly the skewed keys, so the rank runs as a bucketed exchange of
  ~70 B/doc METADATA triples (url, domain, warc_ts), then the corpus
  joins the survivor set through the distributed ``semi_join`` (one
  corpus-sized exchange, no driver-side keep set — the mix/dedup keep
  pattern, VERDICT r4 #1);
* per-domain stats — bucketed aggregate on the domain key; output is
  domain-count-bounded (the ``source_stats`` shape, webtext.py:116).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

# scheme://[userinfo@]host[:port][/...] — host stops at :, /, ?, #.
# Scheme-less strings do not match and map to "" (kept by filters,
# counted under domain "" by stats — the caller's malformed-url bucket).
_HOST_RE = (r"^[A-Za-z][A-Za-z0-9+.\-]*://(?:[^/@?#]*@)?"
            r"(?P<host>[^/:?#]+)")


def domain_of_batch(urls: pa.ChunkedArray | pa.Array) -> pa.Array:
    """Registered-domain kernel: lowercased host with one leading
    ``www.`` stripped; non-URL strings → \"\". One vectorized Arrow
    regex per batch — no Python row loop."""
    host = pc.struct_field(
        pc.extract_regex(urls, _HOST_RE), "host")
    host = pc.utf8_lower(pc.coalesce(host, ""))
    return pc.replace_substring_regex(host, r"^www\.", "",
                                      max_replacements=1)


def extract_domains(ds, url_col: str = "url", out_col: str = "domain"):
    """Append a ``domain`` column (the curation key) to a pages Dataset."""

    def add(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            out_col, domain_of_batch(batch.column(url_col)))

    return ds.map_batches(add, batch_format="pyarrow")


def filter_domains(ds, blocked, url_col: str = "url",
                   invert: bool = False):
    """Drop every page whose domain is in ``blocked`` (C4-style domain
    blocklist). ``invert=True`` keeps ONLY the blocked domains (the
    audit view). The list is broadcast once (bounded size by contract);
    each batch tests membership with one hashed ``pc.is_in``."""
    import ray

    blocked_ref = ray.put(pa.array(
        sorted({d.lower().removeprefix("www.") for d in blocked}),
        pa.string()))

    def keep(batch: pa.Table) -> pa.Table:
        hit = pc.is_in(domain_of_batch(batch.column(url_col)),
                       value_set=ray.get(blocked_ref))
        return batch.filter(hit if invert else pc.invert(hit))

    return ds.map_batches(keep, batch_format="pyarrow")


def cap_per_domain(ds, cap: int, url_col: str = "url",
                   ts_col: str = "warc_ts",
                   num_buckets: int | None = None):
    """Keep at most ``cap`` pages per domain (RefinedWeb §3.1's source
    diversity cap). Deterministic keeper rule: the ``cap`` NEWEST pages
    by (``warc_ts`` desc, url asc) survive — recrawls prefer fresh
    copies, and the tiebreak makes reruns byte-stable.

    Plan: metadata triples → bucketed per-domain rank → survivor urls →
    ``semi_join`` of the full corpus (no driver-side keep set).

    The url is the doc identity (idhash.py; M6 dedups by url), so the
    cap counts DISTINCT urls — a url still carrying exact-dup copies
    (cap ran before the dedup stage) ranks once by its newest copy and
    every copy follows its url's fate through the semi join."""
    import pandas as pd

    from search_engine_ray.functions.join import semi_join
    from search_engine_ray.stages.agg import bucketed_group_agg

    if cap < 1:
        raise ValueError("cap must be >= 1")

    def to_meta(batch: pa.Table) -> pa.Table:
        return pa.table({
            url_col: batch.column(url_col),
            "domain": domain_of_batch(batch.column(url_col)),
            ts_col: batch.column(ts_col),
        })

    meta = ds.map_batches(to_meta, batch_format="pyarrow")

    def rank_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values([ts_col, url_col],
                          ascending=[False, True], kind="mergesort")
        g = g.drop_duplicates(subset=[url_col], keep="first")
        kept = g.groupby("domain", sort=False).head(cap)
        return kept[[url_col]]

    survivors = bucketed_group_agg(meta, ["domain"], rank_bucket,
                                   num_buckets=num_buckets)
    return semi_join(ds, survivors, on=url_col)


def domain_stats(ds, url_col: str = "url", num_buckets: int | None = 64):
    """Per-domain curation stats: page count, distinct languages, char
    volume. Output rows are domain-count-bounded; ordered consumption
    is the caller's sort."""
    import pandas as pd

    from search_engine_ray.stages.agg import bucketed_group_agg

    def to_meta(batch: pa.Table) -> pa.Table:
        return pa.table({
            "domain": domain_of_batch(batch.column(url_col)),
            "lang": batch.column("lang"),
            "n_chars": pc.coalesce(
                pc.utf8_length(batch.column("text")), 0),
        })

    meta = ds.map_batches(to_meta, batch_format="pyarrow")

    def per_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("domain", as_index=False).agg(
            n_docs=("lang", "size"),
            n_langs=("lang", "nunique"),
            total_chars=("n_chars", "sum"),
        )
        out["n_docs"] = out["n_docs"].astype("int64")
        out["n_langs"] = out["n_langs"].astype("int64")
        out["total_chars"] = out["total_chars"].astype("int64")
        return out

    return bucketed_group_agg(meta, ["domain"], per_bucket,
                              num_buckets=num_buckets)
