import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def ray_session():
    """ONE Ray session for the whole pytest run (task brief requirement)."""
    import ray

    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    from ray.data import DataContext

    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    import logging

    logging.getLogger("ray.data").setLevel(logging.ERROR)
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def built_index(ray_session, small_pages, tmp_path_factory):
    """One index built over the small corpus, shared across query tests."""
    import pyarrow.parquet as pq

    from search_engine_ray.build import BuildConfig, build_index

    root = tmp_path_factory.mktemp("idx")
    pages_dir = root / "pages"
    pages_dir.mkdir()
    pq.write_table(small_pages, str(pages_dir / "pages-0.parquet"))
    index_root = str(root / "index")
    build_index(str(pages_dir), index_root, BuildConfig(num_buckets=8))
    return index_root


@pytest.fixture(scope="session")
def small_pages():
    """The deterministic 'small' fixture corpus (FIXTURES.md §1-2)."""
    from search_engine_ray.corpus import generate_pages

    return generate_pages(200, seed=42, split="small")


@pytest.fixture(scope="session")
def small_oracle(small_pages):
    from search_engine_ray.oracle import OracleIndex

    return OracleIndex.build(small_pages)
