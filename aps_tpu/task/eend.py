#!/usr/bin/env python
"""EEND diarization task (PIT binary cross-entropy).

Parity surface: /root/reference/aps/task/eend.py (EendTask:14)."""

from typing import Optional

import jax
import jax.numpy as jnp

from aps_tpu.task.sse import TimeDomainTask


class EendTask(TimeDomainTask):
    """Permutation-invariant BCE for end-to-end diarization."""

    def objf(self, out, ref):
        """out: N x T (logits), ref: N x T {0,1} -> N."""
        out = jnp.squeeze(out)
        loss = jnp.maximum(out, 0) - out * ref + jnp.log1p(
            jnp.exp(-jnp.abs(out)))
        return jnp.sum(loss, -1)
