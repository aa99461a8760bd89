#!/usr/bin/env python
"""Task base: glues network forward and loss computation.

Parity surface: /root/reference/aps/task/base.py (Task:14, TsTask:33).
A Task is a linen Module holding the nnet as submodule; __call__(egs) returns
{"loss": scalar, ...weighted stats}. The trainer value-and-grads this through
a single pjit'd step."""

from typing import Any, Optional

from flax import linen as nn

from aps_tpu.utils import get_logger

logger = get_logger(__name__)


class Task(nn.Module):
    """Base task. Subclasses set `nnet` (a linen module) and implement
    __call__(egs, training=...) -> Dict[str, jnp.ndarray]."""
    nnet: nn.Module
    description: str = "unknown"

    def __call__(self, egs, training: bool = True):
        raise NotImplementedError


class TsTask(Task):
    """Teacher-student task base: loads a frozen teacher from a checkpoint
    directory. Teacher params are stored as constants (stop-gradient)."""
    cpt: str = ""
    cpt_tag: str = "best"

    def setup(self):
        from aps_tpu.eval.wrapper import load_checkpoint
        stats = load_checkpoint(self.cpt, cpt_tag=self.cpt_tag)
        self.teacher = stats["nnet"]
        self.teacher_params = stats["params"]
        logger.info(f"Loaded teacher from {self.cpt}, "
                    f"epoch: {stats['epoch']}, tag: {self.cpt_tag}")
