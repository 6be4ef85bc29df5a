"""Stage 2: tokenize + explode to per-(doc, term) rows.

The reference streams one file -> lines -> tokens, inserting each token
individually into a shared tree (ref: engine/src/main/java/org/search/engine/
index/IndexationSchedulerTask.java:42-45). Here tokenization is a stateless
``map_batches`` over Arrow batches of cleaned docs that emits the
postings-input table — ONE row per (doc, term) with the term frequency
pre-aggregated (an inherent map-side combine: the groupby that builds
postings later never sees per-occurrence rows).

Output schema (tokens format v2):
    term: string, doc_id: int64, tf: int32,
    pos_vb: large_binary (delta+varbyte blob of the row's packed
            (row<<32)|col positions, absolute first value; empty when
            positions are disabled),
    bucket: int32  (hash(term) % num_buckets — the shuffle key),
    salt:   int32  (doc_id % salt — sub-splits head-skewed buckets)

Positions are PRE-ENCODED here (codec.encode_positions_rowwise): each
(term, doc) blob is independently delta-coded, so a term's final
``pos_vb`` is exactly the byte concatenation of its per-doc blobs in
doc-id order — the postings reducer concatenates bytes instead of
decoding + re-encoding, and the shuffled artifact carries ~1-2 bytes per
position instead of a list<int64>'s 8 (the reducer stage is memory-
bandwidth-bound, so shuffled bytes ARE its wall-clock). ``doc_len`` no
longer rides on every token row; the reducer gathers it from a broadcast
ordinal->doc_len array instead (state/ordinals.doclens_by_ordinal).

The tokenizer instance is constructed once per actor/task (``__init__``),
and the compiled regex does the per-line work in C.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from search_engine_ray.analyzer.tokenizers import (
    _LINE_RE,
    get_tokenizer,
    re2_document_token_pattern,
    split_lines,
)
from search_engine_ray.codec import encode_positions_rowwise

TOKENS_SCHEMA = pa.schema(
    [
        ("term", pa.string()),
        ("doc_id", pa.int64()),
        ("tf", pa.int32()),
        ("pos_vb", pa.large_binary()),
        ("bucket", pa.int32()),
        ("salt", pa.int32()),
        # duplicate of ``bucket`` consumed by write_parquet(partition_cols):
        # the partition column is stripped from the files, so ``bucket``
        # itself survives as a data column for the downstream groupby while
        # the directory layout still allows per-bucket path pruning on resume.
        ("bucket_part", pa.int32()),
    ]
)


def positions_blob_array(pos_lists: list[list[int]]) -> pa.LargeBinaryArray:
    """Vectorized per-row position-blob column: one global delta+varbyte
    encode over the batch's flattened positions, sliced by per-row byte
    offsets (no per-row Python encode calls). Rows with no positions
    (store_positions off) become empty blobs."""
    n = len(pos_lists)
    seg_lens = np.fromiter((len(p) for p in pos_lists), dtype=np.int64,
                           count=n)
    total = int(seg_lens.sum()) if n else 0
    flat = np.fromiter(
        (p for pl in pos_lists for p in pl), dtype=np.int64, count=total,
    )
    data, offsets = encode_positions_rowwise(flat, seg_lens)
    return pa.Array.from_buffers(
        pa.large_binary(), n,
        [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)],
    )


def term_bucket(term: str, num_buckets: int) -> int:
    """Stable term -> bucket hash (blake2b, like doc ids; never Python's
    per-process-salted hash())."""
    h = hashlib.blake2b(term.encode("utf-8"), digest_size=4).digest()
    return int.from_bytes(h, "little") % num_buckets


class TokenizeBatch:
    def __init__(
        self,
        tokenizer: str = "standard",
        num_buckets: int = 16,
        salt: int = 1,
        store_positions: bool = True,
    ):
        self._tok = get_tokenizer(tokenizer)
        self._re = self._tok._token_re
        # document-level pattern: separators + line terminators in ONE
        # class, so a single C-level findall/split over the whole doc
        # yields the identical token stream to per-line tokenization
        # (analyzer/tokenizers.re2_document_token_pattern; equivalence
        # pinned by test_tokenize_fast_path_equals_reference)
        import re as _re

        self._doc_re = _re.compile(
            re2_document_token_pattern(self._tok.separators))
        self.num_buckets = num_buckets
        self.salt = max(1, salt)
        self.store_positions = store_positions
        # content-folding hook (standard_folded): None for the identity
        # tokenizers so the hot paths stay branch-free
        self._fold = self._tok.fold if self._tok.folding else None
        # term -> bucket memo (per actor/task): the vocabulary is Zipf, so
        # nearly every (doc, term) row hits the cache instead of blake2b.
        # Bounded so a pathological vocabulary can't grow the worker heap.
        self._bucket_memo: dict[str, int] = {}

    def __call__(self, batch: pa.Table, ordinals_ref=None) -> pa.Table:
        texts = batch.column("text").to_pylist()
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if ordinals_ref is not None:
            # postings store dense ORDINALS, not raw hash ids — see
            # state/ordinals.py. The broadcast sorted-id array is a local
            # object-store hit after the first call.
            import ray

            from search_engine_ray.state.ordinals import to_ordinals

            doc_ids = to_ordinals(doc_ids, ray.get(ordinals_ref))

        # Vectorized tokenize (v3): the only per-token Python work left is
        # C-level findall/split and a list extend. Everything downstream is
        # Arrow / numpy over the WHOLE BATCH:
        #   1. one findall per doc (doc pattern folds line terminators into
        #      the separator class — identical token stream to per-line);
        #   2. token char offsets WITHOUT match objects, from the
        #      findall/split length structure (text = sep0+tok0+sep1+...),
        #      lengths via Arrow utf8_length (codepoints == Python len);
        #   3. one batch-level dictionary_encode + ONE stable argsort of
        #      (doc, term-code) keys groups per-(doc, term) rows; tf =
        #      segment lengths; positions stay in scan order per group;
        #   4. term->bucket hashed once per DICTIONARY entry, not per row.
        # Row ORDER within the batch differs from the reference loop
        # (sorted per doc by dictionary code, not first-occurrence); every
        # consumer sorts by (term, doc) — value-equivalence is pinned by
        # tests/test_tokenizers.py::test_tokenize_fast_path_equals_reference
        # and the end-to-end byte-identity build tests.
        import pyarrow.compute as pc

        dfind = self._doc_re.findall
        dsplit = self._doc_re.split
        store_pos = self.store_positions

        all_toks: list[str] = []
        all_seps: list[str] = []
        per_doc_nt: list[int] = []
        kept_docs: list[int] = []
        kept_texts: list[str] = []
        for text, doc_id in zip(texts, doc_ids):
            if not text:
                continue
            toks = dfind(text)
            if not toks:
                continue
            all_toks.extend(toks)
            if store_pos:
                all_seps.extend(dsplit(text))
                kept_texts.append(text)
            per_doc_nt.append(len(toks))
            kept_docs.append(int(doc_id))

        if not all_toks:
            empty_pos = pa.Array.from_buffers(
                pa.large_binary(), 0,
                [None, pa.py_buffer(np.zeros(1, np.int64).tobytes()),
                 pa.py_buffer(b"")])
            return pa.table(
                {"term": pa.array([], pa.string()),
                 "doc_id": pa.array([], pa.int64()),
                 "tf": pa.array([], pa.int32()),
                 "pos_vb": empty_pos,
                 "bucket": pa.array([], pa.int32()),
                 "salt": pa.array([], pa.int32()),
                 "bucket_part": pa.array([], pa.int32())},
                schema=TOKENS_SCHEMA)

        nt = np.asarray(per_doc_nt, dtype=np.int64)
        n_docs = len(kept_docs)
        doc_ids_arr = np.asarray(kept_docs, dtype=np.int64)
        toks_arr = pa.array(all_toks, pa.string())
        dict_arr = pc.dictionary_encode(toks_arr)
        codes = dict_arr.indices.to_numpy().astype(np.int64, copy=False)
        dictionary = dict_arr.dictionary
        n_dict = len(dictionary)
        if self._fold is not None:
            # fold at DICTIONARY granularity (vocab << rows), then
            # re-encode so entries that collide after folding merge to
            # one code — positions below still measure the ORIGINAL
            # tokens (tok_lens comes from toks_arr, pre-fold)
            folded = pc.dictionary_encode(pa.array(
                [self._fold(t) for t in dictionary.to_pylist()],
                pa.string()))
            codes = folded.indices.to_numpy().astype(
                np.int64, copy=False)[codes]
            dictionary = folded.dictionary
            n_dict = len(dictionary)
        # per-token doc index
        doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), nt)

        if store_pos:
            tok_lens = pc.utf8_length(toks_arr).to_numpy() \
                .astype(np.int64, copy=False)
            sep_lens = pc.utf8_length(
                pa.array(all_seps, pa.string())).to_numpy() \
                .astype(np.int64, copy=False)
            tok_ends = np.cumsum(nt)
            tok_starts = tok_ends - nt
            packed = np.empty(len(codes), dtype=np.int64)
            finditer = _LINE_RE.finditer
            for d in range(n_docs):
                s, e = tok_starts[d], tok_ends[d]
                n_t = e - s
                sl = sep_lens[s + d:e + d + 1]  # n_t + 1 separators
                starts = np.cumsum(sl[:-1])
                if n_t > 1:
                    starts[1:] += np.cumsum(tok_lens[s:e - 1])
                line_ends = np.fromiter(
                    (m.end() for m in finditer(kept_texts[d])), np.int64)
                line_starts = np.concatenate(
                    (np.zeros(1, np.int64), line_ends))
                rows = np.searchsorted(line_starts, starts, side="right")
                packed[s:e] = (rows << 32) | (starts -
                                              line_starts[rows - 1])
        else:
            packed = np.empty(0, dtype=np.int64)

        # ONE stable sort groups per-(doc, term) rows; positions keep scan
        # order within each group
        key = doc_idx * n_dict + codes
        order = np.argsort(key, kind="stable")
        ks = key[order]
        bounds = np.flatnonzero(np.r_[True, ks[1:] != ks[:-1]])
        seg_lens_rows = np.diff(np.r_[bounds, len(ks)])
        row_codes = codes[order][bounds]
        row_docpos = doc_idx[order][bounds]

        if store_pos:
            flat = packed[order]
            data, offsets = encode_positions_rowwise(flat, seg_lens_rows)
        else:
            data, offsets = encode_positions_rowwise(
                np.empty(0, np.int64), np.zeros(len(bounds), np.int64))
        pos_col = pa.Array.from_buffers(
            pa.large_binary(), len(bounds),
            [None, pa.py_buffer(offsets.tobytes()), pa.py_buffer(data)],
        )

        # bucket per dictionary entry (vocab << rows), memoized per actor
        memo = self._bucket_memo
        nb = self.num_buckets

        def bucket_of(t: str) -> int:
            b = memo.get(t)
            if b is None:
                b = term_bucket(t, nb)
                if len(memo) < 2_000_000:
                    memo[t] = b
            return b

        dict_buckets = np.fromiter(
            (bucket_of(t) for t in dictionary.to_pylist()),
            dtype=np.int32, count=n_dict)
        buckets = dict_buckets[row_codes]
        out_docs = doc_ids_arr[row_docpos]
        salts_arr = (out_docs % self.salt).astype(np.int32)
        return pa.table(
            {
                "term": pc.take(dictionary, pa.array(row_codes)),
                "doc_id": pa.array(out_docs),
                "tf": pa.array(seg_lens_rows.astype(np.int32)),
                "pos_vb": pos_col,
                "bucket": pa.array(buckets, pa.int32()),
                "salt": pa.array(salts_arr),
                "bucket_part": pa.array(buckets, pa.int32()),
            },
            schema=TOKENS_SCHEMA,
        )

    def call_reference(self, batch: pa.Table, ordinals_ref=None) -> pa.Table:
        """The original per-line reference loop (dict-accumulated), kept as
        the equivalence twin for the vectorized ``__call__`` — test-only."""
        texts = batch.column("text").to_pylist()
        doc_ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        if ordinals_ref is not None:
            import ray

            from search_engine_ray.state.ordinals import to_ordinals

            doc_ids = to_ordinals(doc_ids, ray.get(ordinals_ref))

        terms: list[str] = []
        out_doc: list[int] = []
        tfs: list[int] = []
        pos_lists: list[list[int]] = []
        salts: list[int] = []

        finditer = self._re.finditer
        findall = self._re.findall
        fold = self._fold
        for text, doc_id in zip(texts, doc_ids):
            if self.store_positions:
                per_doc: dict[str, list[int]] = {}
                if text:
                    for row, line in enumerate(split_lines(text), start=1):
                        base = row << 32
                        for m in finditer(line):
                            t = m.group() if fold is None \
                                else fold(m.group())
                            per_doc.setdefault(t, []).append(
                                base | m.start()
                            )
                items = ((t, len(p), p) for t, p in per_doc.items())
            else:
                counts: dict[str, int] = {}
                if text:
                    for line in split_lines(text):
                        for t in findall(line):
                            if fold is not None:
                                t = fold(t)
                            counts[t] = counts.get(t, 0) + 1
                items = ((t, c, []) for t, c in counts.items())

            s = int(doc_id) % self.salt
            for t, tf, poss in items:
                terms.append(t)
                out_doc.append(int(doc_id))
                tfs.append(tf)
                pos_lists.append(poss)
                salts.append(s)

        memo = self._bucket_memo
        nb = self.num_buckets

        def bucket_of(t: str) -> int:
            b = memo.get(t)
            if b is None:
                b = term_bucket(t, nb)
                if len(memo) < 2_000_000:
                    memo[t] = b
            return b

        buckets = np.fromiter(
            (bucket_of(t) for t in terms), dtype=np.int32, count=len(terms),
        )
        return pa.table(
            {
                "term": pa.array(terms, pa.string()),
                "doc_id": pa.array(out_doc, pa.int64()),
                "tf": pa.array(tfs, pa.int32()),
                "pos_vb": positions_blob_array(pos_lists),
                "bucket": pa.array(buckets, pa.int32()),
                "salt": pa.array(salts, pa.int32()),
                "bucket_part": pa.array(buckets, pa.int32()),
            },
            schema=TOKENS_SCHEMA,
        )
