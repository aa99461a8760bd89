#!/usr/bin/env python
"""Real-time DFSMN enhancement.

Parity surface: /root/reference/aps/rt_sse/enh/dfsmn.py (DFSMN:18
"rt_sse@dfsmn", infer:105, reset/step:132; consumed by csrc/enh/dfsmn.cc)."""

from typing import List, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.libs import ApsRegisters
from aps_tpu.rt_sse.base import RealTimeSSEBase
from aps_tpu.sse.base import MaskNonLinear, tf_masking
from aps_tpu.streaming_asr.base.encoder import StreamingFSMNEncoder


@ApsRegisters.sse.register("rt_sse@dfsmn")
class DFSMN(RealTimeSSEBase):
    dim: int = 1024
    num_bins: int = 257
    num_branchs: int = 1
    num_layers: int = 4
    project: int = 512
    dropout: float = 0.0
    residual: bool = True
    lctx: Union[List[int], int] = 3
    rctx: Union[List[int], int] = 3
    norm: str = "BN"
    complex_mask: bool = True
    non_linear: str = "relu"
    training_mode: str = "freq"

    def setup(self):
        assert self.enh_transform is not None
        out = self.num_bins * self.num_branchs * (2 if self.complex_mask
                                                  else 1)
        self.dfsmn = StreamingFSMNEncoder(inp_features=self.num_bins,
                                          out_features=out,
                                          dim=self.dim,
                                          norm=self.norm,
                                          project=self.project,
                                          dropout=self.dropout,
                                          num_layers=self.num_layers,
                                          residual=self.residual,
                                          lctx=self.lctx,
                                          rctx=self.rctx)
        self.mask_act = MaskNonLinear(
            "none" if self.complex_mask else self.non_linear,
            enable="all" if self.complex_mask else "common")

        def context(num_layers, ctx):
            return num_layers * ctx if isinstance(ctx, int) else sum(ctx)

        self.lctx_total = context(self.num_layers, self.lctx)
        self.rctx_total = context(self.num_layers, self.rctx)

    def _mask_post(self, proj):
        """proj: N x T x S*F -> list of N x F x T (x2) masks."""
        masks = jnp.swapaxes(self.mask_act(proj), 1, 2)
        masks = jnp.split(masks, self.num_branchs, axis=1)
        if self.complex_mask:
            masks = [jnp.stack(jnp.split(m, 2, axis=1), -1) for m in masks]
        return masks

    def _infer(self, mix, mode: str, training: bool):
        stft, _ = self.enh_transform.encode(mix, None)
        feats = self.enh_transform(stft, training=training)
        # pad the total network context (valid convs consume it)
        feats = jnp.pad(feats, ((0, 0), (self.lctx_total, self.rctx_total),
                                (0, 0)))
        proj, _ = self.dfsmn(feats, None, training=training)
        masks = self._mask_post(proj)
        if mode == "time":
            bss_stft = [tf_masking(stft, m) for m in masks]
            packed = self.enh_transform.decode(bss_stft)
        else:
            packed = masks
        return packed[0] if self.num_branchs == 1 else packed

    def __call__(self, mix: jnp.ndarray, training: bool = False):
        self.check_args(mix, training=True, valid_dim=[2])
        return self._infer(mix, self.training_mode, training)

    def infer(self, mix: jnp.ndarray, mode: str = "time"):
        self.check_args(mix, training=False, valid_dim=[1])
        ret = self._infer(mix[None, :], mode, False)
        return ret[0] if self.num_branchs == 1 else [r[0] for r in ret]

    def step(self, chunk, state=None):
        """chunk: N x (T + lctx + rctx) x F context-extended features ->
        masks for the central T frames."""
        proj, state = self.dfsmn.step(chunk, state=state)
        masks = self._mask_post(proj)
        masks = jnp.stack(masks)
        return (masks[0] if self.num_branchs == 1 else masks), state

    def mask_predict(self, feats: jnp.ndarray) -> jnp.ndarray:
        """Deployment entry driven by csrc/enh/dfsmn.h through
        aps_tpu.deploy.RtModel (parity: reference csrc/enh/dfsmn.cc feeding
        the TorchScript module). feats: N x W x F context block (W =
        lctx_total + 1 + rctx_total) -> first-branch mask, N x T' x F
        (real) or N x T' x F x 2 (complex, re/im interleaved in memory)."""
        proj, _ = self.dfsmn(feats, None, training=False)
        mask = jnp.split(self.mask_act(proj), self.num_branchs, axis=-1)[0]
        if self.complex_mask:
            re, im = jnp.split(mask, 2, axis=-1)
            mask = jnp.stack([re, im], axis=-1)
        return mask
