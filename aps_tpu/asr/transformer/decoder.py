#!/usr/bin/env python
"""Transformer decoder (absolute positional encodings).

Parity surface: /root/reference/aps/asr/transformer/decoder.py
(TransformerDncoderLayer:16, TorchTransformerDecoder:101). Batch-first;
`step` supports incremental decoding by passing the already-embedded prefix
(pre_emb) and reading one output index."""

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.attention import padding_mask
from aps_tpu.asr.transformer.impl import (ApsMultiheadAttention, FeedForward)
from aps_tpu.asr.transformer.pose import get_xfmr_pose
from aps_tpu.asr.transformer.utils import prep_sub_mask


class TransformerDecoderLayer(nn.Module):
    """Self-attn -> cross-attn -> FFN (pre/post norm)."""
    att_dim: int
    nhead: int
    feedforward_dim: int = 2048
    pre_norm: bool = False
    att_dropout: float = 0.1
    ffn_dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, tgt, memory, tgt_mask=None, memory_mask=None,
                 tgt_key_padding_mask=None, memory_key_padding_mask=None,
                 training: bool = False):
        self_attn = ApsMultiheadAttention(self.att_dim, self.nhead,
                                          dropout=self.att_dropout,
                                          name="self_attn")
        cross_attn = ApsMultiheadAttention(self.att_dim, self.nhead,
                                           dropout=self.att_dropout,
                                           name="multihead_attn")
        ffn = FeedForward(self.att_dim, self.feedforward_dim,
                          dropout=self.ffn_dropout,
                          activation=self.activation, name="feedforward")
        norm1 = nn.LayerNorm(name="norm1")
        norm2 = nn.LayerNorm(name="norm2")
        norm3 = nn.LayerNorm(name="norm3")
        drop = lambda x: nn.Dropout(self.ffn_dropout,
                                    deterministic=not training,
                                    rng_collection="dropout")(x)

        skip = tgt
        if self.pre_norm:
            tgt = norm1(tgt)
        att, _ = self_attn(tgt, tgt, tgt, attn_mask=tgt_mask,
                           key_padding_mask=tgt_key_padding_mask,
                           training=training)
        tgt = skip + drop(att)
        if not self.pre_norm:
            tgt = norm1(tgt)

        skip = tgt
        if self.pre_norm:
            tgt = norm2(tgt)
        att, _ = cross_attn(tgt, memory, memory, attn_mask=memory_mask,
                            key_padding_mask=memory_key_padding_mask,
                            training=training)
        tgt = skip + drop(att)
        if not self.pre_norm:
            tgt = norm2(tgt)

        skip = tgt
        if self.pre_norm:
            tgt = norm3(tgt)
        tgt = skip + ffn(tgt, training=training)
        if not self.pre_norm:
            tgt = norm3(tgt)
        return tgt


class TorchTransformerDecoder(nn.Module):
    """Vanilla transformer decoder stack. Name kept for config parity."""
    vocab_size: int
    pose_kwargs: Dict = None
    arch_kwargs: Dict = None
    num_layers: int = 6

    def setup(self):
        arch_kwargs = dict(self.arch_kwargs or {})
        att_dim = arch_kwargs["att_dim"]
        self.att_dim = att_dim
        self.pre_norm = arch_kwargs.get("pre_norm", False)
        self.vocab_embed = nn.Embed(self.vocab_size, att_dim)
        self.abs_pos_enc = get_xfmr_pose("abs", att_dim,
                                         **(self.pose_kwargs or {}))
        self.layers = [
            TransformerDecoderLayer(name=f"layer_{i}", **arch_kwargs)
            for i in range(self.num_layers)
        ]
        self.final_norm = nn.LayerNorm() if self.pre_norm else None
        self.output = nn.Dense(self.vocab_size, use_bias=False)

    def step(self,
             enc_out: jnp.ndarray,
             tgt_pad: jnp.ndarray,
             enc_len=None,
             tgt_len=None,
             pre_emb: Optional[jnp.ndarray] = None,
             out_idx: Optional[int] = None,
             training: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """enc_out: N x Ti x D, tgt_pad: N x To ->
        (dec_out N x To(+T') x V or N x V, tgt_emb N x To+T' x D)."""
        offset = 0 if pre_emb is None else pre_emb.shape[1]
        mem_pad_mask = None if enc_len is None else padding_mask(
            enc_len, enc_out.shape[1])
        tgt_pad_mask = None if tgt_len is None else padding_mask(
            tgt_len, tgt_pad.shape[1])
        tgt_emb = self.vocab_embed(tgt_pad)
        tgt_emb = self.abs_pos_enc(tgt_emb, t=offset, training=training)
        if pre_emb is not None:
            tgt_emb = jnp.concatenate([pre_emb, tgt_emb], axis=1)
        tgt_mask = prep_sub_mask(tgt_emb.shape[1])
        out = tgt_emb
        for layer in self.layers:
            out = layer(out, enc_out, tgt_mask=tgt_mask,
                        tgt_key_padding_mask=tgt_pad_mask,
                        memory_key_padding_mask=mem_pad_mask,
                        training=training)
        if self.final_norm is not None:
            out = self.final_norm(out)
        if out_idx is not None:
            out = out[:, out_idx]
        return self.output(out), tgt_emb

    def __call__(self, enc_out, enc_len, tgt_pad, tgt_len,
                 training: bool = False) -> jnp.ndarray:
        """-> dec_out: N x To x V"""
        dec_out, _ = self.step(enc_out, tgt_pad, enc_len=enc_len,
                               tgt_len=tgt_len, training=training)
        return dec_out
