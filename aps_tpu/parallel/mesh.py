#!/usr/bin/env python
"""Device mesh & sharding helpers — the TPU replacement for the reference's
NCCL DDP layer (/root/reference/aps/distributed/backend.py).

One logical mesh with named axes:
  "data"  — batch-parallel axis (required for parity: the reference only has DP)
  "model" — tensor-parallel axis (size 1 by default; room for TP/SP on long
            sequence SSE workloads — see SURVEY.md §2.10)

Everything trains as a single pjit'd SPMD program: batches are sharded over
"data" via NamedSharding, gradients are reduced by XLA-inserted collectives
riding ICI — no hand-written all_reduce.
"""

from typing import Dict, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

BATCH_KEYS_1D = ("src_len", "tgt_len", "len", "x_len", "y_len")


def build_mesh(devices: Optional[Sequence] = None,
               data: int = -1,
               model: int = 1) -> Mesh:
    """Create a ("data", "model") mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if model > n:
        raise ValueError(
            f"requested model={model} parallelism but only {n} device(s) "
            f"visible; for CPU-simulated meshes set JAX_PLATFORMS=cpu and "
            f"XLA_FLAGS=--xla_force_host_platform_device_count=<N> before "
            f"the JAX backend initializes")
    if data < 0:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    dev_array = np.asarray(devices).reshape(data, model)
    return Mesh(dev_array, axis_names=("data", "model"))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over "data", replicate the rest."""
    spec = P("data", *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def seq_sharding(mesh: Mesh, ndim: int, axis: int = 1) -> NamedSharding:
    """Sequence-parallel input sharding: batch over "data" AND the time
    axis (samples of a wav, frames of a feature tensor — `axis`, default
    dim 1) over "model". GSPMD propagates the time split through
    framing/STFT/elementwise/conv front-ends and inserts the collectives
    where an op genuinely needs cross-shard context (attention,
    bidirectional RNN scans) — per-chip activation memory of the
    front-end drops by the model-axis factor. New capability beyond the
    reference (SURVEY §5 long-context: "may optionally add true SP");
    requires 1 <= axis < ndim."""
    if not 1 <= axis < ndim:
        raise ValueError(f"seq_sharding: axis {axis} out of range "
                         f"for ndim {ndim}")
    spec = [None] * ndim
    spec[0], spec[axis] = "data", "model"
    return NamedSharding(mesh, P(*spec))


def replicate_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_egs(mesh: Mesh, egs: Dict) -> Dict:
    """Place a host egs dict on the mesh: arrays sharded on dim-0 over "data",
    python scalars (#utt/#tok) left on host."""
    out = {}
    for k, v in egs.items():
        if isinstance(v, (np.ndarray, jax.Array)) and v.ndim > 0:
            out[k] = jax.device_put(v, data_sharding(mesh, v.ndim))
        else:
            out[k] = v
    return out


def tp_param_shardings(mesh: Mesh, params, min_dim: int = 256):
    """Megatron-lite tensor parallelism via GSPMD: shard every large 2D
    kernel's output dim over "model" and let XLA propagate/insert the
    collectives. Embeddings (vocab x D) shard the vocab dim. Everything
    small (biases, norms, conv kernels) stays replicated — at speech model
    sizes the communication of finer-grained TP outweighs the memory win.
    Returns a pytree of NamedShardings matching `params`."""
    tp = mesh.shape["model"]

    def spec_of(p):
        if tp > 1 and getattr(p, "ndim", 0) == 2 and \
                p.shape[1] % tp == 0 and min(p.shape) >= min_dim:
            return NamedSharding(mesh, P(None, "model"))
        return NamedSharding(mesh, P())

    return jax.tree_util.tree_map(spec_of, params)


def fit_batch_to_mesh(egs: Dict, multiple: int) -> Dict:
    """Make the batch axis divide the mesh's data axis by dropping the
    trailing remainder rows (standard drop-remainder semantics: only the
    last uneven batch of an epoch loses < multiple utterances — far
    cheaper than replicating the whole batch onto every device). Batches
    smaller than `multiple` are returned unchanged (the trainer replicates
    those). Host-side "#utt"/"#tok" stats are recomputed for the kept rows
    so the reporter's weighted reductions stay honest."""
    is_batch_arr = lambda v: isinstance(v, (np.ndarray, jax.Array)) and \
        getattr(v, "ndim", 0) > 0
    sizes = [v.shape[0] for v in egs.values() if is_batch_arr(v)]
    sizes += [
        v[0].shape[0] for v in egs.values()
        if isinstance(v, list) and v and is_batch_arr(v[0])
    ]
    if not sizes:
        return egs
    bsz = min(sizes)
    keep = (bsz // multiple) * multiple
    if keep in (bsz, 0):
        return egs
    out = {}
    for k, v in egs.items():
        if is_batch_arr(v) and v.shape[0] == bsz:
            out[k] = v[:keep]
        elif isinstance(v, list) and v and is_batch_arr(v[0]):
            out[k] = [r[:keep] for r in v]
        else:
            out[k] = v
    if "#utt" in out:
        out["#utt"] = keep
    if "#tok" in out and "tgt_len" in egs:
        out["#tok"] = int(np.sum(np.asarray(egs["tgt_len"][:keep]))) + keep
    elif "#tok" in out:
        out["#tok"] = max(1, int(egs["#tok"] * keep / bsz))
    return out
