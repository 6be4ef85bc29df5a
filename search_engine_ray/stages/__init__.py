from search_engine_ray.stages.clean import CleanBatch, dedup_group  # noqa: F401
from search_engine_ray.stages.tokenize import TokenizeBatch  # noqa: F401
