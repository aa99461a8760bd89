#!/usr/bin/env python
"""Streaming transformer/conformer encoder layers with per-layer KV caches.

Parity surface: /root/reference/aps/streaming_asr/transformer/impl.py
(StreamingRelMultiheadAttention:18, StreamingTransformerRelEncoderLayer:85,
StreamingConformerRelEncoderLayer:139, ApsStreamingTransformerEncoder:233).

TPU design: the torch version mutates module buffers (cache_q/k/v) between
calls; here the cache is an explicit pytree threaded through `step` so the
whole chunk loop stays jit-able (fixed shapes, no Python state). Each
attention layer carries the last lctx*chunk projected key/value frames of
*its own input stream* — this is what makes step() == offline for stacked
layers: layer L's cached keys were computed when those frames were current,
with exactly the left context the offline chunk mask grants them. A ring
buffer of raw input features (recompute-within-window) is NOT equivalent
for num_layers > 1 because the lower layers' outputs for the cached frames
would be recomputed with a truncated window.

Offline (__call__) and streaming (step) paths live on the same flax module
and share parameters; equivalence is asserted in tests/test_streaming.py.
"""

from typing import Dict, Optional

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.const import MIN_F32
from aps_tpu.asr.transformer.impl import FeedForward
from aps_tpu.asr.transformer.utils import digit_shift, get_activation_fn


class StreamingRelMultiheadAttention(nn.Module):
    """Shaw-style relative-position MHSA, offline + cached-step paths.

    Offline: dense attention, inj_pose is the (2T-1) x D relative embedding
    vector (digit-shift trick), caller provides the chunk context mask.
    Step: queries are the C current frames; keys/values are [cache, chunk]
    (S = lctx*chunk + C); rel_mat is the dense C x S x D relative embedding
    matrix; `count` masks the not-yet-filled cache slots of early steps."""
    embed_dim: int
    num_heads: int
    lctx: int  # left context in FRAMES (= lctx_chunks * chunk)
    dropout: float = 0.0

    @property
    def head_dim(self):
        assert self.embed_dim % self.num_heads == 0
        return self.embed_dim // self.num_heads

    def setup(self):
        self.in_proj = nn.DenseGeneral(3 * self.embed_dim, name="in_proj")
        self.out_proj = nn.Dense(self.embed_dim, name="out_proj")
        self.attn_drop = nn.Dropout(self.dropout, rng_collection="dropout")

    def _qkv(self, inp):
        """inp: N x T x E -> q/k/v: N x T x H x D"""
        q, k, v = jnp.split(self.in_proj(inp), 3, axis=-1)
        split = lambda m: m.reshape(m.shape[0], m.shape[1], self.num_heads,
                                    self.head_dim)
        return split(q), split(k), split(v)

    def __call__(self, src, inj_pose, src_mask=None,
                 src_key_padding_mask=None, training: bool = False):
        """Offline path (same math as asr.transformer RelMultiheadAttention).
        src: N x T x E, inj_pose: (2T-1) x D."""
        q, k, v = self._qkv(src)
        term_a = jnp.einsum("nlhd,nshd->nhls", q, k)
        term_b = jnp.einsum("nlhd,sd->nhls", q, inj_pose)
        logit = (term_a + digit_shift(term_b)) / (self.head_dim**0.5)
        if src_key_padding_mask is not None:
            logit = jnp.where(src_key_padding_mask[:, None, None, :],
                              MIN_F32, logit)
        if src_mask is not None:
            logit = logit + src_mask[None, None]
        weight = jax.nn.softmax(logit, axis=-1)
        weight = self.attn_drop(weight, deterministic=not training)
        context = jnp.einsum("nhls,nshd->nlhd", weight, v)
        N, L = context.shape[:2]
        return self.out_proj(context.reshape(N, L, self.embed_dim))

    def init_cache(self, batch: int) -> Dict[str, jnp.ndarray]:
        shape = (batch, self.lctx, self.num_heads, self.head_dim)
        return {"k": jnp.zeros(shape), "v": jnp.zeros(shape)}

    def step(self, chunk, rel_mat, cache, count):
        """chunk: N x C x E, rel_mat: C x S x D (S = lctx + C),
        count: scalar int32 — number of valid cached frames (right-aligned).
        Returns (out N x C x E, new cache)."""
        q, k, v = self._qkv(chunk)
        k_full = jnp.concatenate([cache["k"], k], axis=1)
        v_full = jnp.concatenate([cache["v"], v], axis=1)
        S = k_full.shape[1]
        term_a = jnp.einsum("nlhd,nshd->nhls", q, k_full)
        term_b = jnp.einsum("nlhd,lsd->nhls", q, rel_mat)
        logit = (term_a + term_b) / (self.head_dim**0.5)
        # slots [0, lctx-count) are zeros from init — mask them out
        valid = jnp.arange(S) >= (self.lctx - count)
        logit = jnp.where(valid[None, None, None, :], logit, MIN_F32)
        weight = jax.nn.softmax(logit, axis=-1)
        context = jnp.einsum("nhls,nshd->nlhd", weight, v_full)
        N, C = context.shape[:2]
        out = self.out_proj(context.reshape(N, C, self.embed_dim))
        cache = {"k": k_full[:, S - self.lctx:],
                 "v": v_full[:, S - self.lctx:]}
        return out, cache


class StreamingTransformerRelEncoderLayer(nn.Module):
    """Pre/post-norm transformer encoder layer over the streaming MHSA."""
    att_dim: int
    nhead: int
    lctx: int  # frames
    feedforward_dim: int = 2048
    att_dropout: float = 0.1
    ffn_dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False

    def setup(self):
        self.self_attn = StreamingRelMultiheadAttention(
            self.att_dim, self.nhead, lctx=self.lctx,
            dropout=self.att_dropout, name="self_attn")
        self.norm1 = nn.LayerNorm(name="norm1")
        self.norm2 = nn.LayerNorm(name="norm2")
        self.feedforward = FeedForward(self.att_dim, self.feedforward_dim,
                                       dropout=self.ffn_dropout,
                                       activation=self.activation,
                                       name="feedforward")
        self.drop = nn.Dropout(self.ffn_dropout, rng_collection="dropout")

    def _post_attn(self, src, att, training):
        src = src + self.drop(att, deterministic=not training)
        if self.pre_norm:
            src = src + self.feedforward(self.norm2(src), training=training)
        else:
            src = self.norm1(src)
            src = self.norm2(src + self.feedforward(src, training=training))
        return src

    def __call__(self, src, inj_pose, src_mask=None,
                 src_key_padding_mask=None, training: bool = False):
        inp = self.norm1(src) if self.pre_norm else src
        att = self.self_attn(inp, inj_pose, src_mask=src_mask,
                             src_key_padding_mask=src_key_padding_mask,
                             training=training)
        return self._post_attn(src, att, training)

    def init_cache(self, batch: int):
        return self.self_attn.init_cache(batch)

    def step(self, chunk, rel_mat, cache, count):
        inp = self.norm1(chunk) if self.pre_norm else chunk
        att, cache = self.self_attn.step(inp, rel_mat, cache, count)
        return self._post_attn(chunk, att, False), cache


class StreamingConformerRelEncoderLayer(nn.Module):
    """Conformer block (macaron FFN -> MHSA -> causal conv -> FFN) with
    attention KV cache + depthwise-conv left-context cache."""
    att_dim: int
    nhead: int
    lctx: int  # frames
    feedforward_dim: int = 2048
    att_dropout: float = 0.1
    ffn_dropout: float = 0.1
    kernel_size: int = 15
    macaron: bool = True
    pre_norm: bool = True
    activation: str = "swish"

    def setup(self):
        self.self_attn = StreamingRelMultiheadAttention(
            self.att_dim, self.nhead, lctx=self.lctx,
            dropout=self.att_dropout, name="self_attn")
        if self.macaron:
            self.norm_ffn1 = nn.LayerNorm(name="norm_ffn1")
            self.feedforward1 = FeedForward(self.att_dim,
                                            self.feedforward_dim,
                                            dropout=self.ffn_dropout,
                                            activation=self.activation,
                                            name="feedforward1")
        self.norm_attn = nn.LayerNorm(name="norm_attn")
        self.norm_conv = nn.LayerNorm(name="norm_conv")
        self.norm_ffn2 = nn.LayerNorm(name="norm_ffn2")
        self.feedforward2 = FeedForward(self.att_dim, self.feedforward_dim,
                                        dropout=self.ffn_dropout,
                                        activation=self.activation,
                                        name="feedforward2")
        self.pconv1 = nn.Dense(self.att_dim * 2, name="pconv1")
        # causal depthwise conv: offline pads K-1 zeros on the left; the
        # step path carries the last K-1 GLU outputs instead (zeros at t=0
        # — identical to the offline padding)
        self.dconv = nn.Conv(self.att_dim, (self.kernel_size,),
                             feature_group_count=self.att_dim,
                             padding="VALID", name="dconv")
        self.bn = nn.BatchNorm(momentum=0.9, name="bn")
        self.pconv2 = nn.Dense(self.att_dim, name="pconv2")
        self.drop = nn.Dropout(self.ffn_dropout, rng_collection="dropout")

    def _conv_module(self, inp, conv_cache, training):
        """inp: N x T x D; conv_cache: N x K-1 x D GLU outputs or None
        (offline: left-pad zeros). Returns (out, new conv cache)."""
        act = get_activation_fn(self.activation)
        out = jax.nn.glu(self.pconv1(inp), axis=-1)
        if conv_cache is None:
            padded = jnp.pad(out, ((0, 0), (self.kernel_size - 1, 0),
                                   (0, 0)))
            new_cache = None
        else:
            padded = jnp.concatenate([conv_cache, out], axis=1)
            new_cache = padded[:, padded.shape[1] - (self.kernel_size - 1):]
        conv = self.dconv(padded)
        conv = self.bn(conv, use_running_average=not training)
        out = self.pconv2(act(conv))
        return self.drop(out, deterministic=not training), new_cache

    def _block(self, src, attn_fn, conv_cache, training):
        """Shared block wiring; attn_fn(normed_or_raw_src) -> (att, cache)."""
        factor = 0.5 if self.macaron else 1
        drop = lambda x: self.drop(x, deterministic=not training)
        # 1) macaron FFN
        if self.macaron:
            if self.pre_norm:
                src = self.feedforward1(self.norm_ffn1(src),
                                        training=training) * factor + src
            else:
                src = self.norm_ffn1(
                    self.feedforward1(src, training=training) * factor + src)
        # 2) MHSA
        inp = self.norm_attn(src) if self.pre_norm else src
        att, attn_cache = attn_fn(inp)
        src = src + drop(att)
        # 3) conv + FFN
        if self.pre_norm:
            conv, conv_cache = self._conv_module(self.norm_conv(src),
                                                 conv_cache, training)
            src = conv + src
            out = self.feedforward2(self.norm_ffn2(src),
                                    training=training) * factor + src
        else:
            conv, conv_cache = self._conv_module(self.norm_attn(src),
                                                 conv_cache, training)
            src = self.norm_conv(conv + src)
            out = self.norm_ffn2(
                self.feedforward2(src, training=training) * factor + src)
        return out, attn_cache, conv_cache

    def __call__(self, src, inj_pose, src_mask=None,
                 src_key_padding_mask=None, training: bool = False):
        attn_fn = lambda inp: (self.self_attn(
            inp, inj_pose, src_mask=src_mask,
            src_key_padding_mask=src_key_padding_mask,
            training=training), None)
        out, _, _ = self._block(src, attn_fn, None, training)
        return out

    def init_cache(self, batch: int):
        cache = self.self_attn.init_cache(batch)
        cache["conv"] = jnp.zeros((batch, self.kernel_size - 1,
                                   self.att_dim))
        return cache

    def step(self, chunk, rel_mat, cache, count):
        conv_cache = cache["conv"]
        attn_cache = {"k": cache["k"], "v": cache["v"]}
        attn_fn = lambda inp: self.self_attn.step(inp, rel_mat, attn_cache,
                                                  count)
        out, attn_cache, conv_cache = self._block(chunk, attn_fn,
                                                  conv_cache, False)
        return out, {"k": attn_cache["k"], "v": attn_cache["v"],
                     "conv": conv_cache}


class ApsStreamingTransformerEncoder(nn.Module):
    """Stack of streaming rel-pos transformer/conformer encoder layers."""
    arch: str  # xfmr | cfmr
    num_layers: int
    lctx: int  # frames
    arch_kwargs: Dict = None

    def setup(self):
        kwargs = dict(self.arch_kwargs or {})
        att_dim = kwargs.pop("att_dim")
        nhead = kwargs.pop("nhead")
        pre_norm = kwargs.pop("pre_norm", self.arch == "cfmr")
        common = dict(att_dim=att_dim, nhead=nhead, lctx=self.lctx,
                      pre_norm=pre_norm, **kwargs)
        layer_cls = StreamingTransformerRelEncoderLayer \
            if self.arch == "xfmr" else StreamingConformerRelEncoderLayer
        self.layers = tuple(
            layer_cls(name=f"layer_{i}", **common)
            for i in range(self.num_layers))
        self.norm = nn.LayerNorm(name="norm") if pre_norm else None

    def __call__(self, src, inj_pose, src_mask=None,
                 src_key_padding_mask=None, training: bool = False):
        out = src
        for layer in self.layers:
            out = layer(out, inj_pose, src_mask=src_mask,
                        src_key_padding_mask=src_key_padding_mask,
                        training=training)
        if self.norm is not None:
            out = self.norm(out)
        return out

    def init_state(self, batch: int):
        return {"count": jnp.zeros((), dtype=jnp.int32),
                "layers": tuple(l.init_cache(batch) for l in self.layers)}

    def step(self, chunk, rel_mat, state):
        count = state["count"]
        caches = []
        out = chunk
        for layer, cache in zip(self.layers, state["layers"]):
            out, cache = layer.step(out, rel_mat, cache, count)
            caches.append(cache)
        if self.norm is not None:
            out = self.norm(out)
        new_count = jnp.minimum(count + chunk.shape[1], self.lctx)
        return out, {"count": new_count, "layers": tuple(caches)}
