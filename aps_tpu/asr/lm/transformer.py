#!/usr/bin/env python
"""Transformer language model (parity: /root/reference/aps/asr/lm/
transformer.py, registered "asr@xfmr_lm"). hidden carries the embedded
prefix (N x T' x D) for incremental decoding."""

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.attention import padding_mask
from aps_tpu.asr.transformer.impl import get_xfmr_encoder
from aps_tpu.asr.transformer.pose import get_xfmr_pose
from aps_tpu.asr.transformer.utils import prep_sub_mask
from aps_tpu.libs import ApsRegisters


@ApsRegisters.asr.register("asr@xfmr_lm")
class TorchXfmrLM(nn.Module):
    vocab_size: int = 40
    num_layers: int = 6
    pose_kwargs: Dict = None
    arch_kwargs: Dict = None

    def setup(self):
        arch_kwargs = dict(self.arch_kwargs or {})
        att_dim = arch_kwargs["att_dim"]
        self.vocab_embed = nn.Embed(self.vocab_size, att_dim)
        self.abs_pos_enc = get_xfmr_pose("abs", att_dim,
                                         **(self.pose_kwargs or {}))
        self.encoder = get_xfmr_encoder("xfmr", "abs", self.num_layers,
                                        arch_kwargs)
        self.dist = nn.Dense(self.vocab_size)

    def __call__(self, token: jnp.ndarray, hidden=None, token_len=None,
                 training: bool = False):
        """token: N x T -> (logits N x T(+T') x V, hidden N x T+T' x D)."""
        t = 0 if hidden is None else hidden.shape[1]
        emb = self.abs_pos_enc(self.vocab_embed(token), t=t,
                               training=training)
        hidden = emb if hidden is None else jnp.concatenate([hidden, emb], 1)
        tgt_mask = prep_sub_mask(hidden.shape[1])
        pad_mask = None if token_len is None else padding_mask(
            token_len, hidden.shape[1])
        enc_out = self.encoder(hidden, src_mask=tgt_mask,
                               src_key_padding_mask=pad_mask,
                               training=training)
        return self.dist(enc_out), hidden
