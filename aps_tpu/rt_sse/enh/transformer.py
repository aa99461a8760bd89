#!/usr/bin/env python
"""Real-time transformer enhancement (parity:
/root/reference/aps/rt_sse/enh/transformer.py, FreqXfmr:15
"rt_sse@freq_xfmr")."""

from typing import Dict, List, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.libs import ApsRegisters
from aps_tpu.rt_sse.base import RealTimeSSEBase
from aps_tpu.sse.base import MaskNonLinear, tf_masking
from aps_tpu.streaming_asr.transformer.encoder import \
    StreamingTransformerEncoder


@ApsRegisters.sse.register("rt_sse@freq_xfmr")
class FreqXfmr(RealTimeSSEBase):
    num_bins: int = 257
    num_branchs: int = 1
    num_layers: int = 6
    chunk: int = 1
    lctx: int = 3
    arch: str = "xfmr"
    proj_kwargs: Dict = None
    pose: str = "rel"
    pose_kwargs: Dict = None
    arch_kwargs: Dict = None
    complex_mask: bool = True
    non_linear: str = "relu"
    training_mode: str = "freq"

    def setup(self):
        assert self.enh_transform is not None
        output_dim = self.num_bins * self.num_branchs * (
            2 if self.complex_mask else 1)
        self.xfmr = StreamingTransformerEncoder(
            arch=self.arch,
            input_size=self.num_bins,
            output_proj=output_dim,
            num_layers=self.num_layers,
            chunk=self.chunk,
            lctx=self.lctx,
            proj="linear",
            proj_kwargs=self.proj_kwargs or {},
            pose="rel",
            pose_kwargs=self.pose_kwargs or {},
            arch_kwargs=self.arch_kwargs or {})
        self.mask_act = MaskNonLinear(
            "none" if self.complex_mask else self.non_linear,
            enable="all" if self.complex_mask else "common")

    def _mask_post(self, proj):
        masks = jnp.swapaxes(self.mask_act(proj), 1, 2)
        masks = jnp.split(masks, self.num_branchs, axis=1)
        if self.complex_mask:
            masks = [jnp.stack(jnp.split(m, 2, axis=1), -1) for m in masks]
        return masks

    def _infer(self, mix, mode: str, training: bool):
        stft, _ = self.enh_transform.encode(mix, None)
        feats = self.enh_transform(stft, training=training)
        proj, _ = self.xfmr(feats, None, training=training)
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
        """chunk: N x chunk x F features -> (masks, state)."""
        proj, state = self.xfmr.step(chunk, state=state)
        masks = self._mask_post(proj)
        masks = jnp.stack(masks)
        return (masks[0] if self.num_branchs == 1 else masks), state

    def mask_predict(self, feats: jnp.ndarray) -> jnp.ndarray:
        """Deployment entry driven by csrc/enh/transformer.h through
        aps_tpu.deploy.RtModel. feats: N x W x F rolling window (W =
        att_lctx * chunk + chunk) -> first-branch masks for all W frames,
        N x W x F (real) or N x W x F x 2 (complex); the native runtime
        picks the frame with full left context."""
        proj, _ = self.xfmr(feats, None, training=False)
        mask = jnp.split(self.mask_act(proj), self.num_branchs, axis=-1)[0]
        if self.complex_mask:
            re, im = jnp.split(mask, 2, axis=-1)
            mask = jnp.stack([re, im], axis=-1)
        return mask
