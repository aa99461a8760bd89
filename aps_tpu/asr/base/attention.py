#!/usr/bin/env python
"""Decoder attentions: dot/ctx/loc + multi-head variants.

Parity surface: /root/reference/aps/asr/base/attention.py (padding_mask:18,
LocAttention:77, CtxAttention:157, DotAttention:209, MHCtxAttention:266,
MHDotAttention:348, MHLocAttention:426).

TPU design: the reference caches encoder projections in module state
(self.enc_part, cleared per utterance). Functionally, each attention exposes
  prep(enc_pad)                  -> cache pytree (computed once per utterance)
  init_ali(N, T, enc_len)        -> initial alignment (uniform, masked)
  __call__(enc_pad, enc_len, dec_prev, ali_prev, cache) -> (ali, ctx)
so decode loops (lax.scan) carry (ali, cache) explicitly."""

from typing import Dict, Optional, Tuple

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.const import NEG_INF
from aps_tpu.libs import Register

AsrAtt = Register("asr_att")


def padding_mask(vec: jnp.ndarray, maxlen: int) -> jnp.ndarray:
    """N lengths -> N x maxlen bool mask (True = padding position)."""
    return jnp.arange(maxlen)[None, :] >= vec[:, None]


def att_instance(att_type: str, enc_dim: int, dec_dim: int,
                 **kwargs) -> nn.Module:
    if att_type not in AsrAtt:
        raise RuntimeError(f"Unknown attention type: {att_type}")
    return AsrAtt[att_type](enc_dim=enc_dim, dec_dim=dec_dim, **kwargs)


class Attention(nn.Module):
    enc_dim: int = 512
    dec_dim: int = 512
    att_dim: int = 512

    def _softmax(self, score, enc_len, heads: bool = False):
        if enc_len is None:
            return jax.nn.softmax(score, axis=-1)
        mask = padding_mask(enc_len, score.shape[-1])
        if heads:
            mask = mask[:, None]
        score = jnp.where(mask, NEG_INF, score)
        return jax.nn.softmax(score, axis=-1)

    def init_ali(self, batch: int, T: int, enc_len=None) -> jnp.ndarray:
        ali = jnp.ones((batch, T))
        if enc_len is not None:
            ali = jnp.where(padding_mask(enc_len, T), 0.0, ali)
            return ali / enc_len[:, None]
        return ali / T

    def prep(self, enc_pad: jnp.ndarray) -> Dict:
        return {}


@AsrAtt.register("dot")
class DotAttention(Attention):
    """Scaled dot attention (LAS-style)."""
    scaled: bool = True

    def setup(self):
        self.enc_proj = nn.Dense(self.att_dim)
        self.dec_proj = nn.Dense(self.att_dim)

    def prep(self, enc_pad):
        return {"enc": self.enc_proj(enc_pad)}

    def __call__(self, enc_pad, enc_len, dec_prev, ali_prev,
                 cache: Optional[Dict] = None):
        if cache is None:
            cache = self.prep(enc_pad)
        dec_part = self.dec_proj(dec_prev)
        score = jnp.einsum("ntd,nd->nt", cache["enc"], dec_part)
        if self.scaled:
            score = score / (self.att_dim**0.5)
        ali = self._softmax(score, enc_len)
        ctx = jnp.einsum("nt,ntd->nd", ali, enc_pad)
        return ali, ctx


@AsrAtt.register("ctx")
class CtxAttention(Attention):
    """Additive (Bahdanau) attention."""

    def setup(self):
        self.enc_proj = nn.Dense(self.att_dim)
        self.dec_proj = nn.Dense(self.att_dim, use_bias=False)
        self.w = nn.Dense(1, use_bias=False)

    def prep(self, enc_pad):
        return {"enc": self.enc_proj(enc_pad)}

    def __call__(self, enc_pad, enc_len, dec_prev, ali_prev,
                 cache: Optional[Dict] = None):
        if cache is None:
            cache = self.prep(enc_pad)
        dec_part = self.dec_proj(dec_prev)
        sum_part = jnp.tanh(cache["enc"] + dec_part[:, None])
        score = self.w(sum_part)[..., 0]
        ali = self._softmax(score, enc_len)
        ctx = jnp.einsum("nt,ntd->nd", ali, enc_pad)
        return ali, ctx


@AsrAtt.register("loc")
class LocAttention(Attention):
    """Location-aware attention (convolution over previous alignment)."""
    conv_channels: int = 10
    loc_context: int = 64

    def setup(self):
        self.enc_proj = nn.Dense(self.att_dim)
        self.dec_proj = nn.Dense(self.att_dim, use_bias=False)
        self.att = nn.Dense(self.att_dim, use_bias=False)
        self.F = nn.Conv(self.conv_channels, (self.loc_context * 2 + 1,),
                         padding=[(self.loc_context, self.loc_context)])
        self.w = nn.Dense(1, use_bias=False)

    def prep(self, enc_pad):
        return {"enc": self.enc_proj(enc_pad)}

    def __call__(self, enc_pad, enc_len, dec_prev, ali_prev,
                 cache: Optional[Dict] = None):
        if cache is None:
            cache = self.prep(enc_pad)
        if ali_prev is None:
            ali_prev = self.init_ali(enc_pad.shape[0], enc_pad.shape[1],
                                     enc_len)
        # N x T x 1 -> N x T x C -> N x T x D_att
        att_part = self.att(self.F(ali_prev[..., None]))
        dec_part = self.dec_proj(dec_prev)
        sum_part = jnp.tanh(att_part + dec_part[:, None] + cache["enc"])
        score = self.w(sum_part)[..., 0]
        ali = self._softmax(score, enc_len)
        ctx = jnp.einsum("nt,ntd->nd", ali, enc_pad)
        return ali, ctx


class MHAttentionBase(Attention):
    """Shared helpers for multi-head decoder attentions."""
    att_head: int = 4

    def init_ali(self, batch: int, T: int, enc_len=None) -> jnp.ndarray:
        ali = super(MHAttentionBase, self).init_ali(batch, T, enc_len)
        return jnp.tile(ali[:, None], (1, self.att_head, 1))

    def _mh_value(self, enc_pad):
        """N x T x (H*D) value projection -> N x H x T x D."""
        N, T, _ = enc_pad.shape
        v = self.enc_proj(enc_pad).reshape(N, T, self.att_head, self.att_dim)
        return jnp.swapaxes(v, 1, 2)

    def _mh_ctx(self, ali, value):
        """ali: N x H x T, value: N x H x T x D -> N x D_enc."""
        N = ali.shape[0]
        ctx = jnp.einsum("nht,nhtd->nhd", ali, value)
        return self.ctx_proj(ctx.reshape(N, -1))


@AsrAtt.register("mhdot")
class MHDotAttention(MHAttentionBase):
    scaled: bool = True

    def setup(self):
        self.enc_proj = nn.Dense(self.att_dim * self.att_head)
        self.key_proj = nn.Dense(self.att_dim * self.att_head, use_bias=False)
        self.dec_proj = nn.Dense(self.att_dim * self.att_head, use_bias=False)
        self.ctx_proj = nn.Dense(self.enc_dim)

    def prep(self, enc_pad):
        N, T, _ = enc_pad.shape
        key = self.key_proj(enc_pad).reshape(N, T, self.att_head,
                                             self.att_dim)
        return {"value": self._mh_value(enc_pad),
                "key": jnp.swapaxes(key, 1, 2)}

    def __call__(self, enc_pad, enc_len, dec_prev, ali_prev,
                 cache: Optional[Dict] = None):
        if cache is None:
            cache = self.prep(enc_pad)
        N = enc_pad.shape[0]
        q = self.dec_proj(dec_prev).reshape(N, self.att_head, self.att_dim)
        score = jnp.einsum("nhtd,nhd->nht", cache["key"], q)
        if self.scaled:
            score = score / (self.att_dim**0.5)
        ali = self._softmax(score, enc_len, heads=True)
        return ali, self._mh_ctx(ali, cache["value"])


@AsrAtt.register("mhctx")
class MHCtxAttention(MHAttentionBase):

    def setup(self):
        self.enc_proj = nn.Dense(self.att_dim * self.att_head)
        self.key_proj = nn.Dense(self.att_dim * self.att_head, use_bias=False)
        self.dec_proj = nn.Dense(self.att_dim * self.att_head, use_bias=False)
        self.ctx_proj = nn.Dense(self.enc_dim)
        # grouped 1x1 conv == per-head Dense(1)
        self.w = self.param(
            "w", nn.initializers.lecun_normal(),
            (self.att_head, self.att_dim))

    def prep(self, enc_pad):
        N, T, _ = enc_pad.shape
        key = self.key_proj(enc_pad).reshape(N, T, self.att_head,
                                             self.att_dim)
        return {"value": self._mh_value(enc_pad),
                "key": jnp.swapaxes(key, 1, 2)}

    def __call__(self, enc_pad, enc_len, dec_prev, ali_prev,
                 cache: Optional[Dict] = None):
        if cache is None:
            cache = self.prep(enc_pad)
        N = enc_pad.shape[0]
        q = self.dec_proj(dec_prev).reshape(N, self.att_head, self.att_dim)
        sum_part = jnp.tanh(cache["key"] + q[:, :, None])
        score = jnp.einsum("nhtd,hd->nht", sum_part, self.w)
        ali = self._softmax(score, enc_len, heads=True)
        return ali, self._mh_ctx(ali, cache["value"])


@AsrAtt.register("mhloc")
class MHLocAttention(MHAttentionBase):
    conv_channels: int = 10
    loc_context: int = 64

    def setup(self):
        self.enc_proj = nn.Dense(self.att_dim * self.att_head)
        self.key_proj = nn.Dense(self.att_dim * self.att_head, use_bias=False)
        self.dec_proj = nn.Dense(self.att_dim * self.att_head, use_bias=False)
        self.ctx_proj = nn.Dense(self.enc_dim)
        self.F = nn.Conv(self.conv_channels * self.att_head,
                         (self.loc_context * 2 + 1,),
                         feature_group_count=self.att_head,
                         padding=[(self.loc_context, self.loc_context)])
        self.att = nn.Dense(self.att_dim * self.att_head, use_bias=False)
        self.w = self.param(
            "w", nn.initializers.lecun_normal(),
            (self.att_head, self.att_dim))

    def prep(self, enc_pad):
        N, T, _ = enc_pad.shape
        key = self.key_proj(enc_pad).reshape(N, T, self.att_head,
                                             self.att_dim)
        return {"value": self._mh_value(enc_pad),
                "key": jnp.swapaxes(key, 1, 2)}

    def __call__(self, enc_pad, enc_len, dec_prev, ali_prev,
                 cache: Optional[Dict] = None):
        if cache is None:
            cache = self.prep(enc_pad)
        N, T, _ = enc_pad.shape
        if ali_prev is None:
            ali_prev = self.init_ali(N, T, enc_len)
        # N x H x T -> N x T x H -> conv -> N x T x (H*D_att)
        att_part = self.F(jnp.swapaxes(ali_prev, 1, 2))
        att_part = self.att(att_part).reshape(N, T, self.att_head,
                                              self.att_dim)
        att_part = jnp.swapaxes(att_part, 1, 2)
        q = self.dec_proj(dec_prev).reshape(N, self.att_head, self.att_dim)
        sum_part = jnp.tanh(cache["key"] + att_part + q[:, :, None])
        score = jnp.einsum("nhtd,hd->nht", sum_part, self.w)
        ali = self._softmax(score, enc_len, heads=True)
        return ali, self._mh_ctx(ali, cache["value"])
