"""Environment-compat shims shared by modules that run Ray Data from
multiple threads (build_index's background docmap/stats sections,
build_sharded's concurrent shard builds)."""

from __future__ import annotations


def patch_http_fs_probe() -> None:
    """Make Ray Data's ``_is_http_filesystem`` probe thread-safe in this
    environment. It does ``from fsspec.implementations.http import
    HTTPFileSystem`` on EVERY ``read_parquet`` (the failed import is
    never cached), catching only ModuleNotFoundError; without aiohttp,
    CONCURRENT importers hit CPython's partial-module window and get a
    plain ImportError ("cannot import name ...") instead — which
    escapes and kills a builder thread. Any ImportError here means "no
    http filesystem", so answer False for it too."""
    import ray.data.datasource.path_util as _pu

    orig = getattr(_pu._is_http_filesystem, "__wrapped__", None) \
        or _pu._is_http_filesystem
    if getattr(_pu._is_http_filesystem, "_ser_safe", False):
        return

    def safe(fs):
        try:
            return orig(fs)
        except ImportError:
            return False

    safe._ser_safe = True
    safe.__wrapped__ = orig
    _pu._is_http_filesystem = safe
