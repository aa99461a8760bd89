from aps_tpu.parallel.mesh import (build_mesh, data_sharding,
                                   fit_batch_to_mesh, replicate_sharding,
                                   seq_sharding, shard_egs,
                                   tp_param_shardings)

__all__ = [
    "build_mesh", "data_sharding", "fit_batch_to_mesh",
    "replicate_sharding", "seq_sharding", "shard_egs", "tp_param_shardings"
]
