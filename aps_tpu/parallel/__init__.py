from aps_tpu.parallel.mesh import (build_mesh, data_sharding,
                                   pad_batch_to_multiple, replicate_sharding,
                                   shard_egs, tp_param_shardings)

__all__ = [
    "build_mesh", "data_sharding", "pad_batch_to_multiple",
    "replicate_sharding", "shard_egs", "tp_param_shardings"
]
