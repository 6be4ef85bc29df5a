"""Deterministic document IDs.

The reference assigns doc IDs from a global ``AtomicInteger`` in discovery
order (ref: engine/src/main/java/org/search/engine/index/
DocumentIndexManager.java:36,279,296) — the one mechanism there that cannot
scale: it is order-dependent, so IDs would differ across cluster sizes,
retries and resume. We instead derive ``doc_id = blake2b64(url)`` — a pure
function of the row, stable forever (stdlib blake2b, not a third-party hash
whose value could change across library versions). Collisions are checked at
build time (build.py) — at 2^64 and realistic corpus sizes the probability is
negligible, but the check is cheap (a groupby we already do for dedup).

IDs are int64 (Arrow-friendly); the top bit is cleared so they are
non-negative and round-trip exactly through float-free paths, DuckDB, and
pandas.
"""

from __future__ import annotations

import hashlib

import numpy as np


def doc_id_for_url(url: str) -> int:
    """blake2b-8 of the UTF-8 url, as a non-negative int64."""
    h = hashlib.blake2b(url.encode("utf-8"), digest_size=8).digest()
    return int.from_bytes(h, "little") & 0x7FFF_FFFF_FFFF_FFFF


def doc_ids_for_urls(urls) -> np.ndarray:
    """Vectorized-ish batch version (urls: iterable of str) -> int64 ndarray.

    blake2b on short strings is ~1-2 us/url in CPython — negligible next to
    tokenization, and deterministic across machines and versions.
    """
    b2 = hashlib.blake2b
    mask = 0x7FFF_FFFF_FFFF_FFFF
    out = np.fromiter(
        (
            int.from_bytes(b2(u.encode("utf-8"), digest_size=8).digest(), "little")
            & mask
            for u in urls
        ),
        dtype=np.int64,
        count=len(urls),
    )
    return out
