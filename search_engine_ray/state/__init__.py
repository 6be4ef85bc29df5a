from search_engine_ray.state.manifest import (  # noqa: F401
    atomic_write_json,
    config_hash,
    input_fingerprint,
    invalidate,
    manifest_path,
    read_manifest,
    write_manifest,
)
