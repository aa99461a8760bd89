#!/usr/bin/env python
"""Toy RNN masking model for separation & enhancement.

Parity surface: /root/reference/aps/sse/toy.py (ToyRNN:28, registered
"sse@base_rnn"): feature pipeline -> stacked RNN -> per-speaker TF masks."""

from typing import List, Optional, Union

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.rnn import StackedRNN
from aps_tpu.libs import ApsRegisters
from aps_tpu.sse.base import MaskNonLinear, SSEBase, tf_masking


@ApsRegisters.sse.register("sse@base_rnn")
class ToyRNN(SSEBase):
    """RNN mask estimator. Training: mix N x (C) x S -> masks or waveforms;
    inference: (C) x S -> enhanced signal(s)."""
    input_size: int = 257
    input_proj: int = -1
    num_bins: int = 257
    num_spks: int = 2
    rnn: str = "lstm"
    num_layers: int = 3
    hidden: int = 512
    hidden_proj: int = -1
    dropout: float = 0.2
    bidirectional: bool = False
    mask_max_clip: Optional[float] = None
    mask_non_linear: str = "sigmoid"

    def setup(self):
        assert self.enh_transform is not None
        assert self.training_mode in ["freq", "time"]
        if self.num_spks == 1 and self.mask_non_linear == "softmax":
            raise ValueError("softmax mask invalid when num_spks == 1")
        self.encoder = StackedRNN(self.hidden,
                                  num_layers=self.num_layers,
                                  rnn_type=self.rnn,
                                  bidirectional=self.bidirectional,
                                  dropout=self.dropout,
                                  input_proj=self.input_proj,
                                  hidden_proj=self.hidden_proj)
        self.mask_out = nn.Dense(self.num_bins * self.num_spks)
        self.non_linear = MaskNonLinear(self.mask_non_linear,
                                        enable="positive",
                                        vmax=self.mask_max_clip)

    def _tf_mask(self, feats: jnp.ndarray, training: bool) -> jnp.ndarray:
        """feats: N x T x F -> masks: S x N x F x T"""
        out = self.encoder(feats, training=training)
        # N x T x S*F -> N x S*F x T
        masks = jnp.swapaxes(self.mask_out(out), 1, 2)
        masks = jnp.split(masks, self.num_spks, axis=-2)
        return self.non_linear(jnp.stack(masks))

    def _infer(self, mix: jnp.ndarray, mode: str, training: bool):
        stft, _ = self.enh_transform.encode(mix, None)
        feats = self.enh_transform(stft, training=training)
        masks = self._tf_mask(feats, training)
        masks = [masks[s] for s in range(self.num_spks)]
        if mode == "freq":
            packed = masks
        else:
            bss_stft = [tf_masking(stft, m) for m in masks]
            packed = self.enh_transform.decode(bss_stft)
        return packed[0] if self.num_spks == 1 else packed

    def __call__(self, mix: jnp.ndarray, training: bool = True):
        self.check_args(mix, training=True, valid_dim=[2, 3])
        return self._infer(mix, self.training_mode, training)

    def infer(self, mix: jnp.ndarray, mode: str = "time"):
        """mix: (C) x S -> enhanced signal(s) without batch dim."""
        self.check_args(mix, training=False, valid_dim=[1, 2])
        spk = self._infer(mix[None, ...], mode, False)
        return spk[0] if self.num_spks == 1 else [s[0] for s in spk]

    def mask_predict(self, feats: jnp.ndarray) -> jnp.ndarray:
        return self._tf_mask(feats, False)
