#!/usr/bin/env python
"""Deep FSMN enhancement (parity: /root/reference/aps/sse/enh/dfsmn.py,
DFSMN:16 "sse@dfsmn"): FSMN stack predicting real or complex TF masks."""

from typing import List, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.encoder import FSMNEncoder
from aps_tpu.libs import ApsRegisters
from aps_tpu.sse.base import MaskNonLinear, SSEBase, tf_masking


@ApsRegisters.sse.register("sse@dfsmn")
class DFSMN(SSEBase):
    dim: int = 1024
    num_bins: int = 257
    num_branchs: int = 1
    num_layers: int = 4
    project: int = 512
    dropout: float = 0.0
    residual: bool = True
    lctx: int = 3
    rctx: int = 3
    norm: str = "BN"
    dilation: Union[List[int], int] = 1
    complex_mask: bool = True
    non_linear: str = "relu"
    training_mode: str = "freq"

    def setup(self):
        assert self.enh_transform is not None
        out = self.num_bins * self.num_branchs * (2 if self.complex_mask
                                                  else 1)
        self.dfsmn = FSMNEncoder(inp_features=self.num_bins,
                                 out_features=out,
                                 dim=self.dim,
                                 norm=self.norm,
                                 project=self.project,
                                 dropout=self.dropout,
                                 num_layers=self.num_layers,
                                 residual=self.residual,
                                 lctx=self.lctx,
                                 rctx=self.rctx,
                                 dilation=self.dilation)
        self.mask_act = MaskNonLinear(
            "none" if self.complex_mask else self.non_linear,
            enable="all" if self.complex_mask else "common")

    def _tf_mask(self, feats, training: bool) -> List[jnp.ndarray]:
        proj, _ = self.dfsmn(feats, None, training=training)
        # N x T x S*F -> N x S*F x T
        masks = jnp.swapaxes(self.mask_act(proj), 1, 2)
        return jnp.split(masks, self.num_branchs, axis=1)

    def _infer(self, mix, mode: str, training: bool):
        stft, _ = self.enh_transform.encode(mix, None)
        feats = self.enh_transform(stft, training=training)
        masks = self._tf_mask(feats, training)
        if self.complex_mask:
            # N x 2F x T -> N x F x T x 2
            masks = [jnp.stack(jnp.split(m, 2, axis=1), -1) for m in masks]
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

    def mask_predict(self, feats: jnp.ndarray) -> jnp.ndarray:
        masks = self._tf_mask(feats, False)
        if self.complex_mask:
            masks = [jnp.stack(jnp.split(m, 2, axis=1), -1) for m in masks]
        masks = jnp.stack(masks)
        return masks[0] if self.num_branchs == 1 else masks
