#!/usr/bin/env python
"""Frequency-domain transformer masking model (parity:
/root/reference/aps/sse/bss/transformer.py, FreqXfmr:16 "sse@freq_xfmr")."""

from typing import Dict, List, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.transformer.encoder import TransformerEncoder
from aps_tpu.libs import ApsRegisters
from aps_tpu.sse.base import MaskNonLinear, SSEBase, tf_masking


@ApsRegisters.sse.register("sse@freq_xfmr")
class FreqXfmr(SSEBase):
    input_size: int = 257
    num_spks: int = 2
    num_bins: int = 257
    rctx: int = -1
    lctx: int = -1
    arch: str = "xfmr"
    pose: str = "rel"
    arch_kwargs: Dict = None
    pose_kwargs: Dict = None
    proj_kwargs: Dict = None
    num_layers: int = 6
    non_linear: str = "sigmoid"
    training_mode: str = "freq"

    def setup(self):
        assert self.enh_transform is not None
        self.xfmr = TransformerEncoder(arch=self.arch,
                                       input_size=self.input_size,
                                       output_proj=self.num_bins *
                                       self.num_spks,
                                       num_layers=self.num_layers,
                                       chunk_size=1,
                                       lctx=self.lctx,
                                       rctx=self.rctx,
                                       proj="linear",
                                       proj_kwargs=self.proj_kwargs or {},
                                       pose=self.pose,
                                       pose_kwargs=self.pose_kwargs or {},
                                       arch_kwargs=self.arch_kwargs or {})
        self.mask_act = MaskNonLinear(self.non_linear, enable="common")

    def _tf_mask(self, feats, training: bool) -> List[jnp.ndarray]:
        out, _ = self.xfmr(feats, None, training=training)
        # N x T x S*F -> N x S*F x T
        mask = jnp.swapaxes(self.mask_act(out), 1, 2)
        return jnp.split(mask, self.num_spks, axis=1)

    def _infer(self, mix, mode: str, training: bool):
        stft, _ = self.enh_transform.encode(mix, None)
        feats = self.enh_transform(stft, training=training)
        masks = self._tf_mask(feats, training)
        if mode == "time":
            bss_stft = [tf_masking(stft, m) for m in masks]
            packed = self.enh_transform.decode(bss_stft)
        else:
            packed = masks
        return packed[0] if self.num_spks == 1 else packed

    def __call__(self, s: jnp.ndarray, training: bool = False):
        self.check_args(s, training=True, valid_dim=[2])
        return self._infer(s, self.training_mode, training)

    def infer(self, mix: jnp.ndarray, mode: str = "time"):
        self.check_args(mix, training=False, valid_dim=[1])
        sep = self._infer(mix[None, :], mode, False)
        return sep[0] if self.num_spks == 1 else [s[0] for s in sep]

    def mask_predict(self, feats: jnp.ndarray) -> jnp.ndarray:
        masks = jnp.stack(self._tf_mask(feats, False))
        return masks[0] if self.num_spks == 1 else masks
