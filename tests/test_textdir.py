"""Text-folder source: the reference's indexFolder/indexFile input mode
(S1-S3 + hidden-file filter M4) adapted to the Ray engine."""

import os

import pytest

from search_engine_ray.build import BuildConfig
from search_engine_ray.search import LocalSearcher
from search_engine_ray.sources.textdir import (
    index_file,
    index_folder,
    list_text_files,
    read_text_folder,
)

CFG = BuildConfig(num_buckets=4)


@pytest.fixture()
def folder(tmp_path):
    root = tmp_path / "docs"
    (root / "sub").mkdir(parents=True)
    (root / ".hiddendir").mkdir()
    (root / "a.txt").write_text("mama mila doma\nsecond line here")
    (root / "sub" / "b.txt").write_text("quick brown fox onlyinb")
    (root / ".hidden.txt").write_text("secretword never indexed")
    (root / ".hiddendir" / "c.txt").write_text("alsohidden never indexed")
    return str(root)


def test_list_skips_hidden(folder):
    files = list_text_files(folder)
    names = [os.path.relpath(f, folder) for f in files]
    assert names == ["a.txt", "sub/b.txt"]
    with_hidden = list_text_files(folder, include_hidden=True)
    assert len(with_hidden) == 4


def test_read_text_folder_schema(ray_session, folder):
    rows = read_text_folder(folder).take_all()
    assert len(rows) == 2
    by_url = {r["url"]: r for r in rows}
    a = by_url["file://" + os.path.join(os.path.abspath(folder), "a.txt")]
    assert a["text"] == "mama mila doma\nsecond line here"
    assert a["html"] == b""


def test_index_folder_and_search(ray_session, folder, tmp_path):
    idx = str(tmp_path / "idx")
    m = index_folder(folder, idx, CFG)
    assert m["n_docs"] == 2
    s = LocalSearcher(idx)
    hit = s.search(["onlyinb"], "exact", k=5)
    assert hit.num_rows == 1
    assert hit.column("url")[0].as_py().endswith("sub/b.txt")
    # hidden content never searchable
    assert s.search(["secretword"], "exact", k=5).num_rows == 0
    assert s.search(["alsohidden"], "exact", k=5).num_rows == 0
    # unchanged folder -> full resume (every stage skipped)
    m2 = index_folder(folder, idx, CFG)
    assert m2["stages"]["clean"]["skipped"]
    assert m2["stages"]["tokenize"]["skipped"]
    assert m2["stages"]["postings"]["buckets_built"] == 0


def test_index_folder_picks_up_edit(ray_session, folder, tmp_path):
    idx = str(tmp_path / "idx")
    index_folder(folder, idx, CFG)
    # edit a file (newer mtime -> newer warc_ts wins the dedup rule)
    p = os.path.join(folder, "a.txt")
    os.utime(p, ns=(os.stat(p).st_atime_ns,
                    os.stat(p).st_mtime_ns + 2_000_000_000))
    with open(p, "w") as f:
        f.write("editedword replaces everything")
    os.utime(p, ns=(os.stat(p).st_atime_ns,
                    os.stat(p).st_mtime_ns + 2_000_000_000))
    index_folder(folder, idx, CFG)
    s = LocalSearcher(idx)
    assert s.search(["editedword"], "exact", k=5).num_rows == 1
    assert s.search(["mila"], "exact", k=5).num_rows == 0


def test_index_file_delta(ray_session, folder, tmp_path):
    idx = str(tmp_path / "idx")
    index_folder(folder, idx, CFG)
    new = os.path.join(folder, "late.txt")
    with open(new, "w") as f:
        f.write("latecomer document freshterm")
    index_file(new, idx)
    s = LocalSearcher(idx)
    hit = s.search(["freshterm"], "exact", k=5)
    assert hit.num_rows == 1
    assert hit.column("url")[0].as_py().endswith("late.txt")
    assert s.n_docs == 3
