#!/usr/bin/env python
"""Streaming (chunked, bounded-left-context) transformer encoder.

Parity surface: /root/reference/aps/streaming_asr/transformer/encoder.py
(StreamingTransformerEncoder:19) + transformer/impl.py (chunked rel-pos
layers with per-layer caches).

TPU design: offline/training path runs the dense stack with a chunk/lctx
context mask; the `step` API consumes one chunk per call with an explicit
per-layer KV-cache pytree (see impl.py) — fixed shapes, jit-able, and
offline == chunked for any num_layers (asserted in tests/test_streaming.py).
"""

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.attention import padding_mask
from aps_tpu.asr.transformer.pose import get_xfmr_pose
from aps_tpu.asr.transformer.proj import get_xfmr_proj
from aps_tpu.asr.transformer.utils import prep_context_mask
from aps_tpu.streaming_asr.transformer.impl import \
    ApsStreamingTransformerEncoder


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
        self.encoder = ApsStreamingTransformerEncoder(
            arch=self.arch, num_layers=self.num_layers,
            lctx=self.lctx * self.chunk, arch_kwargs=arch_kwargs)
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
        enc_out = self.encoder(enc_inp, inj_pose, src_mask=src_mask,
                               src_key_padding_mask=src_pad_mask,
                               training=training)
        if self.outp is not None:
            enc_out = self.outp(enc_out)
        return enc_out, inp_len

    def init_step_state(self, batch: int):
        """Per-layer KV (+ conformer conv) caches + valid-frame counter."""
        return self.encoder.init_state(batch)

    def _rel_mat(self, num_queries: int):
        """Dense rel-pos matrix for one step: C x S x D, S = lctx*chunk + C.
        Query l sits at window index Lc + l, key s at window index s, so
        the relative offset is s - Lc - l (clipped by the pose layer)."""
        lc = self.lctx * self.chunk
        s = jnp.arange(lc + num_queries)
        l = jnp.arange(num_queries)
        return self.pose_layer(s[None, :] - lc - l[:, None], training=False)

    def step(self, chunk: jnp.ndarray, state=None, training: bool = False):
        """chunk: N x T x F raw features (when proj != none, feed enough
        frames for the conv front-end to emit `self.chunk` frames; linear
        proj works frame-wise). Returns (out N x chunk x D, state)."""
        if self.proj_layer is not None:
            chunk, _ = self.proj_layer(chunk, None, training=False)
        if state is None:
            state = self.encoder.init_state(chunk.shape[0])
        rel_mat = self._rel_mat(chunk.shape[1])
        out, state = self.encoder.step(chunk, rel_mat, state)
        if self.outp is not None:
            out = self.outp(out)
        return out, state
