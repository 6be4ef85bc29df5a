"""search_engine_ray — a Ray-Data-native distributed inverted-index + BM25 engine.

A from-scratch re-architecture (NOT a port) of the capabilities of
``mmazurkevich/search-engine`` (an in-memory, single-JVM radix-tree full-text
index; see /root/reference) as Ray Data pipelines over Parquet web pages:

* tokenize -> term-partitioned posting lists (delta+varbyte, block-max)
* BM25 top-k (term-at-a-time vectorized + block-max WAND)
* exact / prefix / multi-term-OR queries (reference SearchType semantics)
* incremental maintenance (add/update/delete deltas), manifest-based resume
* plus large-scale training-data utilities: dedup, ANN, text analysis.

Correctness contract vs the reference: byte-identical extracted text per url
and token streams identical to ``StandardTokenizer.java`` /
``WhitespaceTokenizer.java`` (see analyzer/tokenizers.py). Ranking is checked
against the in-repo pure-Python oracle (oracle.py).
"""

__version__ = "0.1.0"

from search_engine_ray.analyzer.tokenizers import (  # noqa: F401
    StandardTokenizer,
    WhitespaceTokenizer,
    get_tokenizer,
)
