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

    def setup(self):
        self.self_attn = ApsMultiheadAttention(self.att_dim, self.nhead,
                                               dropout=self.att_dropout,
                                               name="self_attn")
        self.cross_attn = ApsMultiheadAttention(self.att_dim, self.nhead,
                                                dropout=self.att_dropout,
                                                name="multihead_attn")
        self.ffn = FeedForward(self.att_dim, self.feedforward_dim,
                               dropout=self.ffn_dropout,
                               activation=self.activation,
                               name="feedforward")
        self.norm1 = nn.LayerNorm(name="norm1")
        self.norm2 = nn.LayerNorm(name="norm2")
        self.norm3 = nn.LayerNorm(name="norm3")
        self.drop = nn.Dropout(self.ffn_dropout, rng_collection="dropout")

    def _cross_ffn(self, tgt, memory, memory_mask,
                   memory_key_padding_mask, training, memory_kv=None):
        drop = lambda x: self.drop(x, deterministic=not training)
        skip = tgt
        if self.pre_norm:
            tgt = self.norm2(tgt)
        att, _ = self.cross_attn(tgt, memory, memory,
                                 attn_mask=memory_mask,
                                 key_padding_mask=memory_key_padding_mask,
                                 training=training, kv_cache=memory_kv)
        tgt = skip + drop(att)
        if not self.pre_norm:
            tgt = self.norm2(tgt)

        skip = tgt
        if self.pre_norm:
            tgt = self.norm3(tgt)
        tgt = skip + self.ffn(tgt, training=training)
        if not self.pre_norm:
            tgt = self.norm3(tgt)
        return tgt

    def __call__(self, tgt, memory, tgt_mask=None, memory_mask=None,
                 tgt_key_padding_mask=None, memory_key_padding_mask=None,
                 training: bool = False, memory_kv=None):
        drop = lambda x: self.drop(x, deterministic=not training)
        skip = tgt
        if self.pre_norm:
            tgt = self.norm1(tgt)
        att, _ = self.self_attn(tgt, tgt, tgt, attn_mask=tgt_mask,
                                key_padding_mask=tgt_key_padding_mask,
                                training=training)
        tgt = skip + drop(att)
        if not self.pre_norm:
            tgt = self.norm1(tgt)
        return self._cross_ffn(tgt, memory, memory_mask,
                               memory_key_padding_mask, training,
                               memory_kv=memory_kv)

    def step_token(self, tok, hist, t, memory, memory_key_padding_mask,
                   memory_kv=None):
        """Incremental decode: process ONE token (N x 1 x D) against the
        layer-input history buffer hist (N x Lmax x D, positions [0, t]
        valid). Equivalent to __call__ on the prefix reading row t, but
        the FFN/cross-att run on a single position."""
        Lmax = hist.shape[1]
        pos_pad = jnp.arange(Lmax)[None, :] > t  # True = masked
        pos_pad = jnp.broadcast_to(pos_pad, hist.shape[:2])
        skip = tok
        if self.pre_norm:
            q = self.norm1(tok)
            kv = self.norm1(hist)
        else:
            q, kv = tok, hist
        att, _ = self.self_attn(q, kv, kv, key_padding_mask=pos_pad,
                                training=False)
        tgt = skip + att
        if not self.pre_norm:
            tgt = self.norm1(tgt)
        return self._cross_ffn(tgt, memory, None,
                               memory_key_padding_mask, False,
                               memory_kv=memory_kv)


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
             mem_kv=None,
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
        for i, layer in enumerate(self.layers):
            out = layer(out, enc_out, tgt_mask=tgt_mask,
                        tgt_key_padding_mask=tgt_pad_mask,
                        memory_key_padding_mask=mem_pad_mask,
                        training=training,
                        memory_kv=None if mem_kv is None else mem_kv[i])
        if self.final_norm is not None:
            out = self.final_norm(out)
        if out_idx is not None:
            out = out[:, out_idx]
        return self.output(out), tgt_emb

    def prep_memory_kv(self, memory: jnp.ndarray):
        """Per-layer cross-attention (K, V) for a fixed memory; compute
        once per utterance and pass to step/step_inc via mem_kv — inside
        a decode loop this hoists 2 x num_layers big matmuls per step."""
        return [
            layer.cross_attn.proj_kv(memory, memory)
            for layer in self.layers
        ]

    def init_cache(self, batch: int, max_len: int) -> jnp.ndarray:
        """Per-layer input-history buffers for incremental decoding:
        num_layers x N x Lmax x D."""
        return jnp.zeros((self.num_layers, batch, max_len, self.att_dim))

    def step_inc(self, enc_out, tok, cache, t, enc_len=None, mem_kv=None):
        """Incremental decode step: tok (N,) int token at position t,
        cache from init_cache -> (logits N x V, new cache). Equivalent to
        step(prefix)[.., t] but O(L) per step instead of O(L^2)."""
        mem_pad_mask = None if enc_len is None else padding_mask(
            enc_len, enc_out.shape[1])
        x = self.vocab_embed(tok[:, None])
        x = self.abs_pos_enc(x, t=t, training=False)
        hists = []
        for i, layer in enumerate(self.layers):
            hist = cache[i].at[:, t].set(x[:, 0])
            hists.append(hist)
            x = layer.step_token(
                x, hist, t, enc_out, mem_pad_mask,
                memory_kv=None if mem_kv is None else mem_kv[i])
        out = self.final_norm(x) if self.final_norm is not None else x
        return self.output(out[:, 0]), jnp.stack(hists)

    def __call__(self, enc_out, enc_len, tgt_pad, tgt_len,
                 training: bool = False) -> jnp.ndarray:
        """-> dec_out: N x To x V"""
        dec_out, _ = self.step(enc_out, tgt_pad, enc_len=enc_len,
                               tgt_len=tgt_len, training=training)
        return dec_out
