from search_engine_ray.sources.pages import (  # noqa: F401
    read_pages,
    read_url,
    snapshot_inputs,
)


def sized_read_parquet(path, *, columns=None,
                       min_block_bytes: int = 4 << 20, **kw):
    """``read_parquet`` for EXCHANGE-BOUND pipelines: stop Ray from
    over-splitting small inputs.

    Ray targets read parallelism ~2x CPUs, so a single small fact table
    splits into ~64 tiny blocks; every downstream sort-shuffle
    (``groupby().map_groups()``) then schedules a SortMap task per block
    and the exchange cost is pure task overhead (measured: the sf0.1
    orders⨝customer join runs 2.4 s warm at 128 union blocks vs 0.8 s
    at 20 — the Sort operator alone was 2.08 s). When the on-disk size
    is known and SMALL (< CPUs x ``min_block_bytes``), cap the block
    count at ceil(bytes / min_block_bytes) so blocks stay
    exchange-sized; larger inputs keep Ray's own sizing (their blocks
    are already big). Use for reads that feed a bucketed exchange, NOT
    for compute-heavy reads (tokenization wants max parallelism even on
    small files).

    Post-exchange parallelism is unaffected: the bucketed shuffle
    re-partitions to ``num_buckets`` output blocks regardless of input
    block count."""
    import ray
    import ray.data as rd

    from search_engine_ray.stages.agg import parquet_input_bytes

    nb = None
    b = parquet_input_bytes(path)
    if b is not None:
        cpus = (int(ray.cluster_resources().get("CPU", 32))
                if ray.is_initialized() else 32)
        if b < cpus * min_block_bytes:
            nb = max(1, -(-b // min_block_bytes))
    return rd.read_parquet(path, columns=columns,
                           override_num_blocks=nb, **kw)
