"""HTML -> text extraction (frozen, versioned).

The per-row correctness invariant (BASELINE.json ``input_hint``) is
*byte-identical extracted text per url*: for corpus rows where ``text`` is
null, extraction from ``html`` must reproduce the ground-truth text exactly.

The extractor is deliberately simple and FROZEN — its version participates in
the index ``config_hash`` so any change invalidates existing index artifacts,
mirroring the reference's cache invalidation
(ref: engine/src/main/java/org/search/engine/SearchEngineInitializer.java:108-114).

Rule: take the content of ``<body>...</body>`` (whole document if no body
tag), drop ``<script>``/``<style>`` elements, strip all remaining tags,
unescape HTML entities. No whitespace normalization (byte-identity).
"""

from __future__ import annotations

import html as _html
import re

EXTRACTOR_VERSION = "strip-tags-v1"

_BODY_RE = re.compile(rb"<body[^>]*>(.*)</body>", re.DOTALL | re.IGNORECASE)
_SCRIPT_STYLE_RE = re.compile(
    rb"<(script|style)[^>]*>.*?</\1\s*>", re.DOTALL | re.IGNORECASE
)
_TAG_RE = re.compile(rb"<[^>]*>")


def extract_text(html: bytes | None) -> str:
    """Extract visible text from an HTML byte string (UTF-8, frozen rule)."""
    if not html:
        return ""
    m = _BODY_RE.search(html)
    body = m.group(1) if m else html
    body = _SCRIPT_STYLE_RE.sub(b"", body)
    body = _TAG_RE.sub(b"", body)
    return _html.unescape(body.decode("utf-8", errors="replace"))
