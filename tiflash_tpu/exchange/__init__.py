from .shuffle import shuffle_block, broadcast_block, allgather_block  # noqa: F401
