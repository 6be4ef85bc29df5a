"""Checkpoint / lineage / resume tests (FIXTURES.md §5, SURVEY.md §4.3).

The reference's analogue is the startup mtime-diff catch-up
(SearchEngineInitializer.calculateIndexChanges:133-211); ours is
per-partition manifest diffing: committed partitions with matching
config_hash + input lineage are skipped.
"""

import os
import shutil

import pyarrow.parquet as pq
import pytest

from search_engine_ray.build import BuildConfig, build_index
from search_engine_ray.corpus import generate_pages
from search_engine_ray.state.manifest import manifest_path


@pytest.fixture()
def corpus_dir(tmp_path):
    pages = generate_pages(80, seed=3)
    pdir = tmp_path / "pages"
    pdir.mkdir()
    pq.write_table(pages, str(pdir / "p.parquet"))
    return str(pdir)


def _bucket_file(root, b):
    return os.path.join(root, "buckets", f"bucket={b}", "postings.parquet")


def test_full_rerun_skips_everything(ray_session, corpus_dir, tmp_path):
    root = str(tmp_path / "idx")
    cfg = BuildConfig(num_buckets=4)
    build_index(corpus_dir, root, cfg)
    mtimes = {b: os.path.getmtime(_bucket_file(root, b)) for b in range(4)}
    m2 = build_index(corpus_dir, root, cfg)
    assert m2["stages"]["clean"]["skipped"]
    assert m2["stages"]["tokenize"]["skipped"]
    assert m2["stages"]["postings"]["buckets_built"] == 0
    assert m2["stages"]["postings"]["buckets_skipped"] == 4
    for b in range(4):
        assert os.path.getmtime(_bucket_file(root, b)) == mtimes[b]


def test_resume_mid_shuffle_rebuilds_only_missing_buckets(
    ray_session, corpus_dir, tmp_path
):
    """Kill-after-stage-2 simulation: docs_clean + tokens committed, two of
    four buckets missing. Resume must rebuild ONLY those, and the final
    artifacts must be byte-identical to an uninterrupted build."""
    root = str(tmp_path / "idx")
    cfg = BuildConfig(num_buckets=4)
    build_index(corpus_dir, root, cfg)
    pristine = {b: open(_bucket_file(root, b), "rb").read() for b in range(4)}

    # simulate the crash: drop two bucket artifacts + their manifests
    for b in (1, 3):
        bdir = os.path.join(root, "buckets", f"bucket={b}")
        shutil.rmtree(bdir)
        os.unlink(manifest_path(bdir))
    kept_mtime = os.path.getmtime(_bucket_file(root, 0))

    m = build_index(corpus_dir, root, cfg)
    assert m["stages"]["clean"]["skipped"]          # not re-tokenized
    assert m["stages"]["tokenize"]["skipped"]
    assert m["stages"]["postings"]["buckets_built"] == 2
    assert os.path.getmtime(_bucket_file(root, 0)) == kept_mtime
    for b in range(4):
        assert open(_bucket_file(root, b), "rb").read() == pristine[b], b


def test_config_change_invalidates(ray_session, corpus_dir, tmp_path):
    root = str(tmp_path / "idx")
    build_index(corpus_dir, root, BuildConfig(num_buckets=4))
    m = build_index(corpus_dir, root,
                    BuildConfig(num_buckets=4, tokenizer="whitespace"))
    assert not m["stages"]["clean"]["skipped"]
    assert not m["stages"]["tokenize"]["skipped"]
    assert m["stages"]["postings"]["buckets_built"] == 4


def test_input_change_invalidates_clean(ray_session, corpus_dir, tmp_path):
    root = str(tmp_path / "idx")
    cfg = BuildConfig(num_buckets=4)
    build_index(corpus_dir, root, cfg)
    # append one more input fragment
    extra = generate_pages(10, seed=99, include_parity=False)
    pq.write_table(extra, os.path.join(corpus_dir, "p2.parquet"))
    m = build_index(corpus_dir, root, cfg)
    assert not m["stages"]["clean"]["skipped"]
    assert m["n_docs"] > 80


def test_uncommitted_manifest_not_trusted(ray_session, corpus_dir, tmp_path):
    root = str(tmp_path / "idx")
    cfg = BuildConfig(num_buckets=4)
    build_index(corpus_dir, root, cfg)
    # corrupt: mark docs_clean manifest as in-progress
    p = manifest_path(os.path.join(root, "docs_clean"))
    with open(p) as f:
        content = f.read()
    with open(p, "w") as f:
        f.write(content.replace("committed", "inprogress"))
    m = build_index(corpus_dir, root, cfg)
    assert not m["stages"]["clean"]["skipped"]


def test_resume_restores_missing_docmap(ray_session, corpus_dir, tmp_path):
    """A resumed build whose docs_clean is fresh but whose docmap artifact
    never landed (first run died mid-stage-2/3) must rewrite docmap/ —
    otherwise DocMap silently serves from the O(corpus) fallback."""
    from search_engine_ray.state.docmap import DOCMAP_DIR

    root = str(tmp_path / "idx")
    build_index(corpus_dir, root, BuildConfig(num_buckets=4))
    dm = os.path.join(root, DOCMAP_DIR)
    assert os.path.isdir(dm)
    shutil.rmtree(dm)
    m = build_index(corpus_dir, root, BuildConfig(num_buckets=4))
    assert m["stages"]["clean"]["skipped"]
    assert os.path.isdir(dm) and os.listdir(dm)
