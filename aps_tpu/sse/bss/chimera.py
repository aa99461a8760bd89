#!/usr/bin/env python
"""Chimera++ network (mask + deep-clustering embedding heads).

Parity surface: /root/reference/aps/sse/bss/chimera.py (Chimera:16
"sse@chimera++"). Functional change: dpcl_embed(mix) recomputes the shared
encoder (XLA CSE dedups it inside the jitted loss) instead of caching module
state."""

from typing import List, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.rnn import StackedRNN
from aps_tpu.libs import ApsRegisters
from aps_tpu.sse.base import MaskNonLinear, SSEBase, tf_masking


@ApsRegisters.sse.register("sse@chimera++")
class Chimera(SSEBase):
    input_size: int = 257
    input_proj: int = -1
    num_bins: int = 257
    num_spks: int = 2
    rnn: str = "lstm"
    num_layers: int = 3
    hidden: int = 512
    hidden_proj: int = -1
    dropout: float = 0.2
    dpcl_embed_size: int = 20
    bidirectional: bool = False
    mask_non_linear: str = "sigmoid"
    training_mode: str = "freq"

    def setup(self):
        assert self.enh_transform is not None
        assert self.num_spks >= 1
        self.encoder = StackedRNN(self.hidden,
                                  num_layers=self.num_layers,
                                  rnn_type=self.rnn,
                                  bidirectional=self.bidirectional,
                                  dropout=self.dropout,
                                  input_proj=self.input_proj,
                                  hidden_proj=self.hidden_proj)
        self.mask_proj = nn.Dense(self.num_spks * self.num_bins)
        self.dpcl_proj = nn.Dense(self.dpcl_embed_size * self.num_bins)
        self.mask_act = MaskNonLinear(self.mask_non_linear,
                                      enable="positive")

    def _encode(self, mix, training: bool):
        stft, _ = self.enh_transform.encode(mix, None)
        feats = self.enh_transform(stft, training=training)
        rnn_out = self.encoder(feats, training=training)
        return stft, rnn_out

    def dpcl_embed(self, mix: jnp.ndarray) -> jnp.ndarray:
        """mix: N x S -> unit-norm sigmoid embeddings N x FT x D."""
        _, rnn_out = self._encode(mix, False)
        N, T, _ = rnn_out.shape
        embed = self.dpcl_proj(rnn_out).reshape(N, T, -1,
                                                self.dpcl_embed_size)
        embed = embed / jnp.linalg.norm(embed, axis=-1, keepdims=True)
        # N x F x T x D -> N x FT x D
        embed = jnp.swapaxes(embed, 1, 2).reshape(N, -1,
                                                  self.dpcl_embed_size)
        return nn.sigmoid(embed)

    def _tf_mask(self, rnn_out, training: bool):
        masks = self.mask_proj(rnn_out)
        # N x S*F x T
        masks = jnp.swapaxes(masks, 1, 2)
        masks = jnp.stack(jnp.split(masks, self.num_spks, axis=-2))
        return self.mask_act(masks)

    def _infer(self, mix, mode: str, training: bool):
        stft, rnn_out = self._encode(mix, training)
        if self.is_initializing():
            # make sure the dpcl head gets initialized alongside the masks
            _ = self.dpcl_proj(rnn_out)
        masks = self._tf_mask(rnn_out, training)
        masks = [masks[s] for s in range(self.num_spks)]
        if mode == "freq":
            packed = masks
        else:
            bss_stft = [tf_masking(stft, m) for m in masks]
            packed = self.enh_transform.decode(bss_stft)
        return packed[0] if self.num_spks == 1 else packed

    def __call__(self, mix: jnp.ndarray, training: bool = False):
        self.check_args(mix, training=True, valid_dim=[2, 3])
        return self._infer(mix, self.training_mode, training)

    def infer(self, mix: jnp.ndarray, mode: str = "time"):
        self.check_args(mix, training=False, valid_dim=[1, 2])
        spk = self._infer(mix[None, ...], mode, False)
        return spk[0] if self.num_spks == 1 else [s[0] for s in spk]
