#!/usr/bin/env python
"""Distributed facade.

Parity surface: /root/reference/aps/distributed/backend.py:33-127
(init/rank/local_rank/world_size/all_reduce over NCCL|horovod).

TPU design: JAX is SPMD — one process per HOST drives all its local chips, so
"rank" means process index and "world size" means process count; the per-chip
parallelism lives in the mesh (aps_tpu.parallel). `all_reduce` maps to a host
level psum via jax collectives when inside pjit, or a no-op mean outside.
"""

from typing import Optional

import jax
import numpy as np

BACKEND = "none"


def init(backend: str = "none",
         coordinator_address: str = "",
         num_processes: int = 1,
         process_id: int = 0) -> None:
    """Initialise multi-host JAX (no-op for single-host 'none' backend)."""
    global BACKEND
    if backend not in ("none", "jax"):
        raise ValueError(f"Unknown distributed backend: {backend}")
    BACKEND = backend
    if backend == "jax" and num_processes > 1:
        try:
            # CPU meshes need a cross-process collective backend; this
            # config is ignored by TPU platforms (ICI handles collectives)
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:
            pass
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)


def rank() -> int:
    return jax.process_index()


def local_rank() -> int:
    return jax.process_index()


def world_size() -> int:
    return jax.process_count()


def local_world_size() -> int:
    return 1


def num_devices() -> int:
    return jax.device_count()


def all_reduce(value, average: bool = True):
    """Mean/sum a host value across processes. Single-process: identity.

    Inside a pjit'd step, cross-device reduction happens via the mesh
    (jax.lax.pmean over the "data" axis); this facade only covers host-side
    scalars (loss sanity checks, metric reduction).
    """
    if jax.process_count() == 1:
        return value
    # multi-host: gather per-process values then reduce on host
    from jax.experimental import multihost_utils
    arr = np.asarray(value, dtype=np.float32)
    out = multihost_utils.process_allgather(arr)
    red = out.sum(axis=0)
    return red / jax.process_count() if average else red
