"""Deterministic synthetic Common-Crawl-style page corpus (FIXTURES.md §1-2).

Seeded generator producing the BASELINE.json ``input_hint`` schema:
``(url:string, warc_ts:timestamp[us], html:binary, text:string, lang:string)``.

Properties (all seeded, reproducible):
* Zipf-distributed vocabulary -> head-term skew present at every scale,
* per-doc unique sentinel words (df=1) for exact-hit property tests,
* ~2% rows with ``text = null`` (must be recovered from ``html`` —
  extraction invariant: byte-identical text per url),
* ~1% duplicate urls with a later ``warc_ts`` (exact-dedup exercise; the
  reference skips already-indexed paths,
  ref: engine/src/main/java/org/search/engine/index/DocumentIndexManager.java:334-336 —
  our batch rule is "keep latest warc_ts", deterministic),
* first four rows are the reference's own test fixtures verbatim
  (ref: engine/src/test/resources/TestFileOne.txt, testFolder/{one,two}.txt,
  analyzer/StandardTokenizerTest.java:23).
"""

from __future__ import annotations

import html as _html
from datetime import datetime, timezone

import numpy as np
import pyarrow as pa

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("warc_ts", pa.timestamp("us")),
        ("html", pa.binary()),
        ("text", pa.string()),
        ("lang", pa.string()),
    ]
)

PARITY_TEXTS = [
    "What authority surfeits on would relieve us",
    "mama mila doma hi mama i am here",
    "ama milak ruka ram mila",
    'I\'am " ? test, !  ,  example string. ',
]

_EPOCH = int(datetime(2024, 1, 1, tzinfo=timezone.utc).timestamp() * 1_000_000)

_SYL = ["ba", "ko", "ri", "ta", "lu", "me", "zo", "vi", "sha", "den",
        "par", "qua", "nix", "hol", "ger", "tu", "wem", "fos", "cay", "bri"]


def vocabulary(size: int = 2000) -> list[str]:
    """Deterministic pseudo-word vocabulary (no RNG needed)."""
    words = []
    i = 0
    while len(words) < size:
        a, b, c = _SYL[i % 20], _SYL[(i // 20) % 20], _SYL[(i // 400) % 20]
        words.append(a + b + c if i >= 400 else a + b)
        i += 1
    return words


def _make_html(text: str, i: int) -> bytes:
    return (
        f"<html><head><title>t{i}</title>"
        f"<script>var x={i};</script></head>"
        f"<body><p>{_html.escape(text)}</p></body></html>"
    ).encode("utf-8")


def generate_pages(
    n_rows: int,
    seed: int = 42,
    split: str = "small",
    vocab_size: int = 2000,
    words_per_doc: tuple[int, int] = (20, 120),
    include_parity: bool = True,
) -> pa.Table:
    """Build the pages table. Deterministic for fixed arguments."""
    rng = np.random.default_rng(seed)
    vocab = vocabulary(vocab_size)

    urls: list[str] = []
    texts: list[str | None] = []
    htmls: list[bytes] = []
    langs: list[str] = []
    tss: list[int] = []

    def add(i: int, url: str, text: str, lang: str, ts_off: int, null_text: bool):
        urls.append(url)
        texts.append(None if null_text else text)
        htmls.append(_make_html(text, i))
        langs.append(lang)
        tss.append(_EPOCH + ts_off * 1_000_000)

    start = 0
    if include_parity:
        for j, t in enumerate(PARITY_TEXTS):
            add(j, f"https://example.org/parity/{j + 1:08d}", t, "en", j, False)
        start = len(PARITY_TEXTS)

    for i in range(start, n_rows):
        n_words = int(rng.integers(words_per_doc[0], words_per_doc[1] + 1))
        idx = np.minimum(rng.zipf(1.3, size=n_words) - 1, vocab_size - 1)
        words = [vocab[k] for k in idx]
        # inject a unique sentinel in ~30% of docs (df=1 terms)
        if rng.random() < 0.3:
            words.insert(int(rng.integers(0, len(words))), f"sentinel{i:07d}")
        # punctuate + line-break deterministically
        parts: list[str] = []
        for w_i, w in enumerate(words):
            parts.append(w)
            if (w_i + 1) % 12 == 0:
                parts.append("\n")
            elif (w_i + 1) % 7 == 0:
                parts.append(", ")
            else:
                parts.append(" ")
        text = "".join(parts).rstrip()
        lang = "en" if rng.random() < 0.9 else ("de" if rng.random() < 0.5 else "")
        null_text = rng.random() < 0.02
        add(i, f"https://example.org/{split}/{i:08d}", text, lang, i, null_text)

    # ~1% duplicate urls: re-crawl with different text at a later warc_ts
    n_dups = max(1, n_rows // 100) if n_rows >= 8 else 0
    dup_targets = rng.choice(np.arange(start, n_rows), size=n_dups, replace=False)
    for j, t in enumerate(sorted(int(x) for x in dup_targets)):
        new_text = texts[t] if texts[t] is not None else ""
        new_text = (new_text or "") + "\nrecrawl extra " + vocab[j % vocab_size]
        add(10_000_000 + j, urls[t], new_text, langs[t], n_rows + j + 1, False)

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
        },
        schema=PAGES_SCHEMA,
    )


def write_pages(path: str, n_rows: int, seed: int = 42, split: str = "small",
                row_group_size: int = 4096, n_files: int = 1, **kw) -> str:
    """Write the corpus as one or more parquet files under ``path``."""
    import os

    import pyarrow.parquet as pq

    table = generate_pages(n_rows, seed=seed, split=split, **kw)
    os.makedirs(path, exist_ok=True)
    n = table.num_rows
    per = (n + n_files - 1) // n_files
    for f in range(n_files):
        chunk = table.slice(f * per, per)
        if chunk.num_rows:
            pq.write_table(chunk, os.path.join(path, f"pages-{f:05d}.parquet"),
                           row_group_size=row_group_size)
    return path
