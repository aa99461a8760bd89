#!/usr/bin/env python
"""Streaming (chunked, bounded-left-context) transformer encoder.

Parity surface: /root/reference/aps/streaming_asr/transformer/encoder.py
(StreamingTransformerEncoder:19) + transformer/impl.py (chunked rel-pos
layers with bounded context).

TPU design: offline/training path reuses the dense encoder with a
chunk/lctx/rctx=0 context mask (mathematically identical to the reference's
chunked layers); the `step` API processes a rolling window of
(lctx + 1) * chunk frames per call — fixed shapes, state = input feature
ring buffer (recompute-within-window instead of per-layer KV caches)."""

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.attention import padding_mask
from aps_tpu.asr.transformer.impl import get_xfmr_encoder
from aps_tpu.asr.transformer.pose import get_xfmr_pose
from aps_tpu.asr.transformer.proj import get_xfmr_proj
from aps_tpu.asr.transformer.utils import prep_context_mask


class StreamingTransformerEncoder(nn.Module):
    arch: str
    input_size: int
    output_proj: int = -1
    num_layers: int = 6
    chunk: int = 1
    lctx: int = 3
    proj: str = "conv2d"
    proj_kwargs: Dict = None
    pose: str = "rel"
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
        if self.pose != "rel":
            raise ValueError("Now only support rel position encodings")
        pose_kwargs = dict(self.pose_kwargs or {})
        pose_kwargs["lradius"] = self.lctx
        pose_kwargs["rradius"] = self.chunk - 1
        self.pose_layer = get_xfmr_pose("rel",
                                        att_dim // arch_kwargs["nhead"],
                                        **pose_kwargs)
        self.encoder = get_xfmr_encoder(self.arch, "rel", self.num_layers,
                                        arch_kwargs)
        if self.output_proj > 0:
            self.outp = nn.Dense(self.output_proj)
        else:
            self.outp = None

    def output_dim(self) -> int:
        return self.output_proj if self.output_proj > 0 else \
            (self.arch_kwargs or {})["att_dim"]

    def num_frames(self, inp_len):
        if inp_len is None or self.proj_layer is None:
            return inp_len
        return self.proj_layer.num_frames(inp_len)

    def __call__(self, inp_pad: jnp.ndarray, inp_len,
                 training: bool = False):
        """Offline path: context-masked dense attention (== chunked
        streaming computation). inp_pad: N x T x F."""
        if self.proj_layer is None:
            enc_inp = inp_pad
        else:
            enc_inp, inp_len = self.proj_layer(inp_pad, inp_len,
                                               training=training)
        nframes = enc_inp.shape[1]
        src_pad_mask = None if inp_len is None else padding_mask(
            inp_len, nframes)
        inj_pose = self.pose_layer(jnp.arange(-nframes + 1, nframes),
                                   training=training)
        src_mask = prep_context_mask(nframes, self.chunk, lctx=self.lctx,
                                     rctx=0)
        enc_out = self.encoder(enc_inp, inj_pose=inj_pose,
                               src_mask=src_mask,
                               src_key_padding_mask=src_pad_mask,
                               training=training)
        if self.outp is not None:
            enc_out = self.outp(enc_out)
        return enc_out, inp_len

    def init_step_state(self, batch: int):
        """Rolling input-feature buffer covering (lctx+1) chunks."""
        window = (self.lctx + 1) * self.chunk
        att_dim = (self.arch_kwargs or {})["att_dim"]
        dim = self.input_size if self.proj_layer is None else att_dim
        return jnp.zeros((batch, window, self.input_size
                          if self.proj_layer is None else dim))

    def step(self, chunk: jnp.ndarray, state=None, training: bool = False):
        """chunk: N x chunk x F projected features (when proj != none, the
        caller should feed enough frames for the conv front-end; linear proj
        works frame-wise). Returns (out N x chunk x D, state)."""
        if self.proj_layer is not None:
            chunk, _ = self.proj_layer(chunk, None, training=False)
        if state is None:
            state = jnp.zeros(
                (chunk.shape[0], (self.lctx + 1) * self.chunk,
                 chunk.shape[-1]))
        buf = jnp.concatenate([state, chunk], axis=1)[:,
                                                      chunk.shape[1]:]
        W = buf.shape[1]
        inj_pose = self.pose_layer(jnp.arange(-W + 1, W), training=False)
        src_mask = prep_context_mask(W, self.chunk, lctx=self.lctx, rctx=0)
        out = self.encoder(buf, inj_pose=inj_pose, src_mask=src_mask,
                           training=False)
        out = out[:, -chunk.shape[1]:]
        if self.outp is not None:
            out = self.outp(out)
        return out, buf
