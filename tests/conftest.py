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
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def small_pages():
    """The deterministic 'small' fixture corpus (FIXTURES.md §1-2)."""
    from search_engine_ray.corpus import generate_pages

    return generate_pages(200, seed=42, split="small")


@pytest.fixture(scope="session")
def small_oracle(small_pages):
    from search_engine_ray.oracle import OracleIndex

    return OracleIndex.build(small_pages)
