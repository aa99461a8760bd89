from aps_tpu.parallel.mesh import (build_mesh, data_sharding,
                                   replicate_sharding, shard_egs)

__all__ = ["build_mesh", "data_sharding", "replicate_sharding", "shard_egs"]
