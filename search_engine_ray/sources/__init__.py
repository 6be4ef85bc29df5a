from search_engine_ray.sources.pages import (  # noqa: F401
    read_pages,
    read_url,
    snapshot_inputs,
)
