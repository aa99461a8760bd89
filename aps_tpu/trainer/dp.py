#!/usr/bin/env python
"""Data-parallel SPMD trainer over a jax device mesh.

Parity surface: /root/reference/aps/trainer/ddp.py (DdpTrainer:22,
train_one_step:124) + hvd.py + apex.py — all three collapse into this one
trainer: XLA inserts the gradient all-reduce (riding ICI) when the batch is
sharded over the "data" mesh axis, so there is no NCCL/DDP wrapper, no
no_sync() bookkeeping and no loss-consistency check to run by hand.

Mechanics:
  * one jitted value_and_grad step per input-shape bucket (donated params)
  * optax chain: clip_by_global_norm -> optimizer (lr=1), scaled by the
    host-scheduled lr passed in as a traced scalar (no recompiles)
  * gradient accumulation via optax.MultiSteps
  * non-finite loss/grad-norm steps are skipped on-device (params kept)
  * batches whose size divides the mesh are sharded, others replicated
"""

from collections import deque
from functools import partial
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from aps_tpu.const import OOM_STRING
from aps_tpu.libs import ApsRegisters
from aps_tpu.parallel import (build_mesh, data_sharding, fit_batch_to_mesh,
                              replicate_sharding, seq_sharding,
                              tp_param_shardings)
from aps_tpu.trainer.base import Trainer

OPTIMIZERS = {
    "sgd": lambda kw: optax.sgd(1.0, momentum=kw.get("momentum", 0) or None,
                                nesterov=kw.get("nesterov", False)),
    "adam": lambda kw: optax.adam(1.0, b1=kw.get("beta1", 0.9),
                                  b2=kw.get("beta2", 0.999),
                                  eps=kw.get("eps", 1e-8)),
    "adamw": lambda kw: optax.adamw(
        1.0, b1=kw.get("beta1", 0.9), b2=kw.get("beta2", 0.999),
        eps=kw.get("eps", 1e-8), weight_decay=kw.get("weight_decay", 1e-2)),
    "adamax": lambda kw: optax.adamax(1.0),
    "adadelta": lambda kw: optax.adadelta(1.0, rho=kw.get("rho", 0.9)),
    "adagrad": lambda kw: optax.adagrad(1.0),
    "rmsprop": lambda kw: optax.rmsprop(1.0, decay=kw.get("alpha", 0.99),
                                        momentum=kw.get("momentum", 0)),
    "noam_adam": lambda kw: optax.adam(1.0, b1=kw.get("beta1", 0.9),
                                       b2=kw.get("beta2", 0.98),
                                       eps=kw.get("eps", 1e-9)),
}

RNG_COLLECTIONS = ("aug", "dropout", "ss")


@ApsRegisters.trainer.register("dp")
class DataParallelTrainer(Trainer):

    def __init__(self, task, tensor_parallel: int = 1,
                 sequence_parallel: bool = False, devices=None,
                 pipeline_depth: int = 1, **kwargs):
        super(DataParallelTrainer, self).__init__(task, **kwargs)
        self.tensor_parallel = tensor_parallel
        # pipelined step sync: keep up to pipeline_depth steps in flight
        # before blocking on their on-device `finite` flag, so the host
        # dispatches step N+1 while the device runs step N (hides the
        # host->device round trip — significant when the chip sits behind
        # a network tunnel — and keeps the MXU busy during host-side
        # loader/reporting work). Correctness is unaffected: non-finite
        # steps are already rolled back ON DEVICE inside train_step; the
        # host-side flag only feeds logging and the error circuit breaker
        # (which now sees results pipeline_depth steps late). 0 = block
        # every step (the reference's synchronous semantics).
        self.pipeline_depth = max(int(pipeline_depth), 0)
        self._in_flight = deque()
        # SP shards the TIME axis of acoustic inputs over the "model" axis
        # (see parallel.seq_sharding); only meaningful with
        # tensor_parallel > 1, where the model axis exists to split over
        self.sequence_parallel = sequence_parallel and tensor_parallel > 1
        self.mesh = build_mesh(devices=devices, model=tensor_parallel)
        self.ndev = self.mesh.devices.size
        self.params = None
        self.opt_state = None
        self.reporter.log(
            f"Mesh: {self.ndev} devices {self.mesh.shape} "
            f"({jax.devices()[0].platform})")
        # base optimizer (lr folded out, scheduled on host)
        if self.optimizer_name not in OPTIMIZERS:
            raise ValueError(f"Unsupported optimizer: {self.optimizer_name}")
        base = OPTIMIZERS[self.optimizer_name](self.optimizer_kwargs)
        chain = [base]
        if self.clip_gradient:
            chain = [optax.clip_by_global_norm(self.clip_gradient)] + chain
        tx = optax.chain(*chain)
        if self.acmu_gradient > 1:
            tx = optax.MultiSteps(tx, every_k_schedule=self.acmu_gradient)
        self.tx = tx
        self._rng = jax.random.PRNGKey(self.seed)
        self._step_fn = None
        self._eval_fn = None

    # ------------------------------------------------------------------
    def _next_rng(self):
        self._rng, sub = jax.random.split(self._rng)
        return sub

    def _device_egs(self, egs: Dict, train: bool = True) -> Dict:
        """Shard batch arrays over "data". Uneven train batches are trimmed
        to a multiple of the mesh's data axis first (drop-remainder); only
        batches smaller than the device count fall back to replication.
        Eval batches are never trimmed — validation loss (which drives
        early stopping and best-checkpoint selection) must see every dev
        utterance, so uneven dev batches replicate instead."""
        if train:
            egs = fit_batch_to_mesh(egs, self.ndev)
        sp = self.mesh.shape["model"] if self.sequence_parallel else 0
        out = {}
        for k, v in egs.items():
            if isinstance(v, (np.ndarray, jax.Array)) and getattr(
                    v, "ndim", 0) > 0:
                if v.shape[0] % self.ndev == 0:
                    # SP: float arrays of rank >= 2 are acoustic inputs
                    # (wavs N x S, N x C x S multi-channel, features
                    # N x T x F) — shard their time axis over "model" too
                    # when it divides. The time axis is the LONGEST
                    # non-batch axis (samples/frames dwarf channel or
                    # feature dims), so multi-channel wavs shard S, not
                    # the C channel axis; int arrays (token ids, lengths)
                    # stay batch-sharded only
                    t_ax = 1 + int(np.argmax(v.shape[1:])) \
                        if v.ndim >= 2 else 0
                    if sp > 1 and v.ndim >= 2 and \
                            np.issubdtype(v.dtype, np.floating) and \
                            v.shape[t_ax] % sp == 0:
                        out[k] = jax.device_put(
                            v, seq_sharding(self.mesh, v.ndim, axis=t_ax))
                    else:
                        out[k] = jax.device_put(
                            v, data_sharding(self.mesh, v.ndim))
                else:
                    out[k] = jax.device_put(v, replicate_sharding(self.mesh))
            elif isinstance(v, (int, float, np.integer, np.floating)):
                # keep scalars (like #utt/#tok) on host: not part of compute
                out[k] = v
            else:
                out[k] = v
        return out

    def _split_egs(self, egs: Dict):
        """(host_stats, device_arrays) split."""
        host = {k: v for k, v in egs.items() if not isinstance(
            v, (np.ndarray, jax.Array, list))}
        dev = {k: v for k, v in egs.items() if k not in host}
        return host, dev

    # ------------------------------------------------------------------
    def init_state(self, egs: Dict) -> None:
        if self.params is not None:
            return
        _, dev_egs = self._split_egs(egs)
        rngs = {"params": self._next_rng()}
        for name in RNG_COLLECTIONS:
            rngs[name] = self._next_rng()
        variables = self.task.init(rngs, dev_egs, training=True)
        params = variables["params"]
        mstate = {k: v for k, v in variables.items() if k != "params"}
        # restore / warm start
        if self.cpt_stats is not None:
            loaded = self.cpt_stats["params"]
            if self.init_mode == "init":
                params = _merge_params(params, loaded, self.reporter.log)
            else:
                params = jax.tree_util.tree_map(jnp.asarray, loaded)
        repl = replicate_sharding(self.mesh)
        if self.tensor_parallel > 1:
            # Megatron-lite TP: large 2D kernels shard their output dim
            # over "model"; GSPMD propagates and inserts the collectives
            shardings = tp_param_shardings(self.mesh, params)
            self.params = jax.tree_util.tree_map(jax.device_put, params,
                                                 shardings)
        else:
            self.params = jax.device_put(params, repl)
        if self.cpt_stats is not None and "mstate" in self.cpt_stats:
            mstate = self.cpt_stats["mstate"]
        self.mstate = jax.device_put(mstate, repl)
        # optimizer moments inherit the parameter shardings (replicated or
        # TP) from tx.init on the already-placed params; restored leaves
        # are put back with the same shardings so resume-under-TP keeps
        # the memory layout of a fresh run
        self.opt_state = self.tx.init(self.params)
        if self.cpt_stats is not None and self.init_mode == "resume" and \
                "opt_state" in self.cpt_stats:

            def place(ref, v):
                if not isinstance(ref, jax.Array):
                    return v
                # moments inherit the param shardings from tx.init; leaves
                # tx.init created itself (step counts) sit uncommitted on
                # one device — replicate those over the mesh instead
                sharding = ref.sharding if len(
                    ref.sharding.device_set) == self.ndev else repl
                return jax.device_put(jnp.asarray(v), sharding)

            self.opt_state = jax.tree_util.tree_map(
                place, self.opt_state, self.cpt_stats["opt_state"])
        num_params = sum(
            np.prod(p.shape)
            for p in jax.tree_util.tree_leaves(self.params)) / 1e6
        self.num_params = float(num_params)
        self.reporter.log(f"#param: {self.num_params:.2f}M")
        self._build_steps()

    def _build_steps(self):
        task = self.task

        def train_step(params, mstate, opt_state, egs, lr, ssr, noise, rng):
            keys = jax.random.split(rng, len(RNG_COLLECTIONS) + 1)
            rngs = dict(zip(RNG_COLLECTIONS, keys[:-1]))
            egs = dict(egs)
            egs["#ssr"] = ssr
            if self.weight_noise_std:
                # gaussian weight noise (reference WeightNoiseAdder): added
                # permanently to the parameters on scheduled steps; `noise`
                # is a traced 0/1 flag so the schedule never recompiles
                leaves, treedef = jax.tree_util.tree_flatten(params)
                nkeys = jax.random.split(keys[-1], len(leaves))
                leaves = [
                    p + noise * self.weight_noise_std *
                    jax.random.normal(k, p.shape, p.dtype)
                    for p, k in zip(leaves, nkeys)
                ]
                params = jax.tree_util.tree_unflatten(treedef, leaves)

            def loss_fn(p):
                with jax.default_matmul_precision(self.matmul_precision):
                    if mstate:
                        out, new_mstate = task.apply(
                            {"params": p, **mstate}, egs, training=True,
                            rngs=rngs, mutable=list(mstate.keys()))
                    else:
                        out = task.apply({"params": p}, egs, training=True,
                                         rngs=rngs)
                        new_mstate = mstate
                return out["loss"], (out, new_mstate)

            (loss, (out, new_mstate)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(params)
            grad_norm = optax.global_norm(grads)
            finite = jnp.isfinite(loss) & jnp.isfinite(grad_norm)
            grads = jax.tree_util.tree_map(
                lambda g: jnp.where(finite, g, jnp.zeros_like(g)), grads)
            updates, new_opt = self.tx.update(grads, opt_state, params)
            updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
            new_params = optax.apply_updates(params, updates)
            select = lambda a, b: jax.tree_util.tree_map(
                lambda x, y: jnp.where(finite, x, y), a, b)
            new_params = select(new_params, params)
            new_opt = select(new_opt, opt_state)
            new_mstate = select(new_mstate, mstate) if mstate else mstate
            stats = dict(out)
            stats["norm"] = grad_norm
            return new_params, new_mstate, new_opt, stats, finite

        def eval_step(params, mstate, egs):
            with jax.default_matmul_precision(self.matmul_precision):
                return task.apply({"params": params, **mstate}, egs,
                                  training=False)

        self._step_fn = jax.jit(train_step, donate_argnums=(0, 1, 2))
        self._eval_fn = jax.jit(eval_step)

    # ------------------------------------------------------------------
    def checkpoint_states(self, epoch: int) -> Dict:
        stats = super(DataParallelTrainer, self).checkpoint_states(epoch)
        tree = (self.params, self.mstate, self.opt_state)
        # kick off every device->host copy before materializing any of
        # them: the transfers overlap instead of paying one round trip
        # per leaf (hundreds of leaves; the chip may sit behind a tunnel)
        for leaf in jax.tree_util.tree_leaves(tree):
            if isinstance(leaf, jax.Array):
                leaf.copy_to_host_async()
        host = jax.tree_util.tree_map(
            lambda x: np.asarray(x) if isinstance(x, jax.Array) else x,
            tree)
        stats["params"], stats["mstate"], stats["opt_state"] = host
        return stats

    # ------------------------------------------------------------------
    def _weight_noise_now(self) -> bool:
        """Weight-noise schedule (reference WeightNoiseAdder: cfg =
        [beg, step, end], noise on every `step`-th step in [beg, end])."""
        if not self.weight_noise_std:
            return False
        beg, step, end = self.weight_noise_cfg
        if self.cur_step < beg or (end > 0 and self.cur_step > end):
            return False
        return (self.cur_step - beg) % max(step, 1) == 0

    def train_one_step(self, egs: Dict):
        """Dispatch one training step; returns the list of COMPLETED step
        results (possibly empty while the pipeline fills, possibly several
        after an OOM flush) — the caller feeds each into the error
        breaker, so deferred failures are counted exactly once each."""
        # trim BEFORE splitting off host stats so fit_batch_to_mesh's
        # #utt/#tok recompute reaches the reporter's weighted reductions
        egs = fit_batch_to_mesh(egs, self.ndev)
        host, dev = self._device_split(egs)
        lr = jnp.float32(self.lr_scheduler.get_lr())
        ssr = jnp.float32(self.ssr)
        noise = jnp.float32(1.0 if self._weight_noise_now() else 0.0)
        try:
            (self.params, self.mstate, self.opt_state, stats,
             finite) = self._step_fn(self.params, self.mstate,
                                     self.opt_state, dev, lr, ssr, noise,
                                     self._next_rng())
        except Exception as exc:  # device OOM skip (reference ddp.py:145)
            if OOM_STRING not in repr(exc):
                raise
            # donate_argnums: if XLA already consumed the train state the
            # run cannot continue — only skip when the buffers survived
            # (typical for OOM while allocating a new bucket's executable)
            for leaf in jax.tree_util.tree_leaves(
                    (self.params, self.mstate, self.opt_state)):
                if isinstance(leaf, jax.Array) and leaf.is_deleted():
                    raise RuntimeError(
                        "device OOM invalidated the donated train state; "
                        "cannot skip this batch") from exc
            shapes = [
                x.shape for x in jax.tree_util.tree_leaves(dev)
                if hasattr(x, "shape")
            ]
            self.reporter.log(f"Step {self.cur_step}: device OOM on batch "
                              f"{shapes}, skipped")
            # flush steps still in flight (dispatch order) and append this
            # failure — every result reaches the breaker exactly once
            return self.drain() + [False]
        stats = dict(stats)
        stats["rate"] = self.lr_scheduler.get_lr()
        self._in_flight.append((self.cur_step, host, stats, finite))
        # async dispatch: only block on the oldest step once more than
        # pipeline_depth results are outstanding (a non-finite step was
        # already rolled back on-device; its flag reaches the breaker
        # when synced)
        if len(self._in_flight) <= self.pipeline_depth:
            return []
        return [self._sync_oldest()]

    def _device_split(self, egs: Dict):
        host, dev = self._split_egs(egs)
        return host, self._device_egs(dev)

    def _sync_oldest(self) -> bool:
        step, host, stats, finite = self._in_flight.popleft()
        ok = bool(finite)
        self.reporter.update(host)
        self.reporter.update(stats)
        if not ok:
            self.reporter.log(
                f"Step {step}: non-finite loss/grad, skipped")
        return ok

    def drain(self):
        """Block on every in-flight step (end of epoch, before eval/
        checkpoint/stat reads). Returns the drained results in dispatch
        order — empty when nothing was in flight, so feeding them to the
        error breaker never injects a vacuous success."""
        out = []
        while self._in_flight:
            out.append(self._sync_oldest())
        return out

    def valid_one_step(self, egs: Dict) -> None:
        host, dev = self._split_egs(egs)
        dev = self._device_egs(dev, train=False)
        stats = self._eval_fn(self.params, self.mstate, dev)
        self.reporter.update(host)
        self.reporter.update(stats)


def _merge_params(init_params, loaded, log):
    """strict=False warm start: copy where path+shape matches."""
    flat_init = jax.tree_util.tree_flatten_with_path(init_params)[0]
    flat_loaded = dict(
        jax.tree_util.tree_flatten_with_path(loaded)[0])
    merged = {}
    num = 0
    for path, value in flat_init:
        if path in flat_loaded and flat_loaded[path].shape == value.shape:
            merged[path] = jnp.asarray(flat_loaded[path])
            num += 1
        else:
            merged[path] = value
    log(f"Warm start: loaded {num}/{len(flat_init)} parameter tensors")
    # rebuild pytree
    treedef = jax.tree_util.tree_structure(init_params)
    leaves = [merged[path] for path, _ in flat_init]
    return jax.tree_util.tree_unflatten(treedef, leaves)
