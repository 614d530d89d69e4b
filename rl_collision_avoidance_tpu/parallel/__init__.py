from .mesh import (DATA_AXIS, make_mesh, arena_sharding, replicated,
                   shard_arenas, replicate, setup_distributed)

__all__ = ["DATA_AXIS", "make_mesh", "arena_sharding", "replicated",
           "shard_arenas", "replicate", "setup_distributed"]
