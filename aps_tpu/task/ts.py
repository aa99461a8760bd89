#!/usr/bin/env python
"""Teacher-student (knowledge distillation) task for SSE.

Parity surface: /root/reference/aps/task/ts.py (SseFreqTsTask:18). The
frozen teacher's params are loaded from a checkpoint directory and applied
with stop_gradient."""

from typing import Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.libs import ApsRegisters
from aps_tpu.task.base import Task
from aps_tpu.task.objf import hybrid_permu_objf


@ApsRegisters.task.register("sse@ts")
class SseFreqTsTask(Task):
    """Frequency-domain KD: student mimics a frozen teacher's outputs."""
    teacher: str = ""
    teacher_tag: str = "best"
    objf_name: str = "L1"
    permute: bool = True
    num_spks: int = 2

    def setup(self):
        from aps_tpu.eval.wrapper import load_checkpoint
        stats = load_checkpoint(self.teacher, cpt_tag=self.teacher_tag)
        self.teacher_nnet = stats["nnet"]
        self.teacher_params = jax.tree_util.tree_map(
            jax.lax.stop_gradient,
            jax.tree_util.tree_map(jnp.asarray, stats["params"]))

    def objf(self, out, ref):
        fn = jnp.abs if self.objf_name == "L1" else jnp.square
        return jnp.sum(fn(out - ref), -1)

    def __call__(self, egs: Dict, training: bool = True) -> Dict:
        mix = egs["mix"]
        ref = self.teacher_nnet.apply({"params": self.teacher_params}, mix,
                                      training=False)
        out = self.nnet(mix, training=training)
        if not isinstance(out, (list, tuple)):
            out, ref = [out], [ref]
        loss = hybrid_permu_objf(list(out), list(ref), self.objf,
                                 permute=self.permute,
                                 permu_num_spks=self.num_spks)
        return {"loss": jnp.mean(loss)}
