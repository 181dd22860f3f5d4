from .runner import compile_distributed, shard_catalog_blocks, collect_result  # noqa: F401
