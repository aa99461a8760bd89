#!/usr/bin/env python
"""Transformer/Conformer encoder wrapper.

Parity surface: /root/reference/aps/asr/transformer/encoder.py
(TransformerEncoder:18-106): proj -> pose -> N encoder layers (-> outp),
with optional chunked-context masking (lctx/rctx/chunk_size). Batch-first."""

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.attention import padding_mask
from aps_tpu.asr.transformer.impl import get_xfmr_encoder
from aps_tpu.asr.transformer.pose import get_xfmr_pose
from aps_tpu.asr.transformer.proj import get_xfmr_proj
from aps_tpu.asr.transformer.utils import prep_context_mask


class TransformerEncoder(nn.Module):
    """arch in {xfmr, cfmr}; pose in {abs, rel, xl, conv1d}."""
    arch: str
    input_size: int
    output_proj: int = -1
    num_layers: int = 6
    lctx: int = -1
    rctx: int = -1
    chunk_size: int = 1
    proj: str = "conv2d"
    proj_kwargs: Dict = None
    pose: str = "abs"
    pose_kwargs: Dict = None
    arch_kwargs: Dict = None

    def setup(self):
        arch_kwargs = dict(self.arch_kwargs or {})
        att_dim = arch_kwargs["att_dim"]
        if self.proj == "none":
            self.proj_layer = None
        else:
            self.proj_layer = get_xfmr_proj(self.proj, self.input_size,
                                            att_dim,
                                            **(self.proj_kwargs or {}))
        pose_dim = att_dim // arch_kwargs["nhead"] if self.pose == "rel" \
            else att_dim
        self.pose_layer = get_xfmr_pose(self.pose, pose_dim,
                                        **(self.pose_kwargs or {}))
        self.pose_type = "abs" if self.pose == "conv1d" else self.pose
        self.encoder = get_xfmr_encoder(self.arch, self.pose_type,
                                        self.num_layers, arch_kwargs)
        self.att_dim = att_dim
        if self.output_proj > 0:
            self.outp = nn.Dense(self.output_proj)
        else:
            self.outp = None

    def output_dim(self) -> int:
        return self.output_proj if self.output_proj > 0 else \
            (self.arch_kwargs or {})["att_dim"]

    def num_frames(self, inp_len):
        """Output frame count after the projection subsampling."""
        if inp_len is None:
            return None
        if self.proj_layer is None:
            return inp_len
        return self.proj_layer.num_frames(inp_len)

    def __call__(self, inp_pad: jnp.ndarray, inp_len,
                 training: bool = False):
        """inp_pad: N x Ti x F -> (enc_out N x To x D, out_len)."""
        if self.proj_layer is None:
            enc_inp = inp_pad
        else:
            enc_inp, inp_len = self.proj_layer(inp_pad, inp_len,
                                               training=training)
        nframes = enc_inp.shape[1]
        src_pad_mask = None if inp_len is None else padding_mask(
            inp_len, nframes)
        if self.pose_type == "abs":
            if self.pose == "conv1d":
                enc_inp = self.pose_layer(enc_inp, training=training)
            else:
                enc_inp = self.pose_layer(enc_inp, training=training)
            inj_pose = None
        else:
            if self.pose_type == "rel":
                inj_pose = self.pose_layer(
                    jnp.arange(-nframes + 1, nframes), training=training)
            else:
                inj_pose = self.pose_layer(
                    jnp.arange(0, 2 * nframes - 1, dtype=jnp.float32),
                    training=training)
        if self.lctx != -1 or self.rctx != -1:
            src_mask = prep_context_mask(nframes, self.chunk_size,
                                         lctx=self.lctx, rctx=self.rctx)
        else:
            src_mask = None
        enc_out = self.encoder(enc_inp,
                               inj_pose=inj_pose,
                               src_mask=src_mask,
                               src_key_padding_mask=src_pad_mask,
                               training=training)
        if self.outp is not None:
            enc_out = self.outp(enc_out)
        return enc_out, inp_len
