#!/usr/bin/env python
"""Multi-head attention variants & transformer/conformer encoder layers.

Parity surface: /root/reference/aps/asr/transformer/impl.py
(ApsMultiheadAttention:22, RelMultiheadAttention:225 [Shaw],
XlMultiheadAttention:299 [Transformer-XL], ApsTransformerEncoderLayer:377,
ApsConformerEncoderLayer:432, registered layers xfmr_{abs,rel,xl} &
cfmr_{abs,rel,xl}, ApsTransformerEncoder:718, get_xfmr_encoder:759).

TPU design: batch-first N x T x D; QKV is one fused (3E, E) matmul; the
scores/softmax/context chain is a single einsum program XLA maps onto the
MXU. Masks: key_padding_mask (N x S bool, True=pad) and additive attn_mask
(L x S). Note: the reference's XlMultiheadAttention.forward passes `value`
into dot_att where `query` is meant — we use `query` (fixing the slip)."""

from typing import Dict, Optional, Tuple

import jax.nn
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.const import MIN_F32
from aps_tpu.asr.transformer.utils import digit_shift, get_activation_fn
from aps_tpu.libs import Register
from aps_tpu.ops.pallas import flash_attention, flash_attention_rel

TransformerEncoderLayers = Register("xfmr_encoder_layer")


class ApsMultiheadAttention(nn.Module):
    """Standard MHSA. call(query N x L x E, key/value N x S x E) ->
    (context N x L x E, weight N x L x S).

    When the attention is a plain scaled-dot-product with (at most) a
    suffix key-padding mask — i.e. abs pose, no additive attn_mask, no
    active attention dropout — the math runs through the Pallas flash
    kernel (aps_tpu.ops.pallas.attention) on TPU, which never
    materializes the N x H x L x S score matrix in HBM. Other cases (rel/
    xl position terms, streaming chunk masks, attention dropout) use the
    dense einsum path. Set use_flash=False to force dense everywhere
    (e.g. when the per-head attention weights are needed)."""
    embed_dim: int
    num_heads: int
    dropout: float = 0
    use_flash: bool = True

    @property
    def head_dim(self):
        assert self.embed_dim % self.num_heads == 0
        return self.embed_dim // self.num_heads

    def setup(self):
        self.in_proj = nn.DenseGeneral(3 * self.embed_dim, name="in_proj")
        self.out_proj = nn.Dense(self.embed_dim, name="out_proj")
        self.attn_drop = nn.Dropout(self.dropout, rng_collection="dropout")
        self._setup_extra()

    def _setup_extra(self):
        pass

    def _split_heads(self, m):
        return m.reshape(m.shape[0], m.shape[1], self.num_heads,
                         self.head_dim)

    def inp_proj(self, query, key, value):
        """-> q/k/v: N x T x H x D"""
        E = self.embed_dim
        if query is key and key is value:
            q, k, v = jnp.split(self.in_proj(query), 3, axis=-1)
        else:
            # apply the shared projection on each input
            q = self.in_proj(query)[..., :E]
            k = self.in_proj(key)[..., E:2 * E]
            v = self.in_proj(value)[..., 2 * E:]
        return self._split_heads(q), self._split_heads(k), \
            self._split_heads(v)

    def proj_kv(self, key, value):
        """Project K/V only (N x S x H x D). Decoders call this ONCE on a
        fixed cross-attention memory and pass the result back through
        `kv_cache` each step — XLA does not hoist big loop-invariant
        matmuls out of while-loops on its own."""
        E = self.embed_dim
        k = self.in_proj(key)[..., E:2 * E]
        v = self.in_proj(value)[..., 2 * E:]
        return self._split_heads(k), self._split_heads(v)

    def dot_att(self, query, key, inj_pose=None):
        """q: N x L x H x D, k: N x S x H x D -> logit N x H x L x S"""
        return jnp.einsum("nlhd,nshd->nhls", query, key)

    def context_weight(self, logit, value, key_padding_mask=None,
                       attn_mask=None, training=False):
        """logit: N x H x L x S, value: N x S x H x D."""
        logit = logit / (self.head_dim**0.5)
        if key_padding_mask is not None:
            logit = jnp.where(key_padding_mask[:, None, None, :], MIN_F32,
                              logit)
        if attn_mask is not None:
            logit = logit + attn_mask[None, None]
        weight = jax.nn.softmax(logit, axis=-1)
        weight = self.attn_drop(weight, deterministic=not training)
        context = jnp.einsum("nhls,nshd->nlhd", weight, value)
        return context, weight

    def wrap_out(self, context, weight):
        N, L = context.shape[:2]
        context = self.out_proj(context.reshape(N, L, self.embed_dim))
        # mean over heads: N x L x S
        return context, jnp.mean(weight, axis=1)

    def _flash_eligible(self, q_len: int, inj_pose, attn_mask,
                        training) -> bool:
        # short queries lose with the blocked kernel: q pads up to the
        # kernel block, the custom call blocks XLA fusion/hoisting (the
        # decoder cross-attention inside the decode while-loop re-padded
        # its loop-invariant memory every step), and the dense score
        # matrix it avoids is small anyway. Measured on v5e the crossover
        # is between T=200 (dense wins the full train step by ~10%) and
        # T=768 (flash wins, BENCHMARKS.md); 512 also bounds the T x T
        # activation the dense path materializes.
        return (self.use_flash and type(self) is ApsMultiheadAttention
                and q_len >= 512
                and inj_pose is None and attn_mask is None
                and (self.dropout == 0 or not training))

    def _rel_flash(self, q, k, v, inj_pose, key_padding_mask, training):
        """Rel/xl-pose flash path (None -> caller uses the dense math).
        Overridden by the subclasses; the base class has no rel term."""
        return None

    def __call__(self, query, key, value, inj_pose=None,
                 key_padding_mask=None, attn_mask=None,
                 training: bool = False, kv_cache=None):
        """kv_cache may be BEAM-SHARED: (k, v) with batch Nk < the query
        batch Nq, Nq = Nk * G (G beams per utterance, utterance-major
        lanes). Cross-attention is position-independent, so the G beams
        are folded into the query-length axis and the shared memory is
        read ONCE per utterance — materializing the K/V per lane would
        multiply the decode loop's HBM traffic by G (the dominant cost
        at beam 8). In that mode the per-position attention weights are
        not returned (the decode path discards them)."""
        group = 1
        if kv_cache is not None:
            q = self._split_heads(
                self.in_proj(query)[..., :self.embed_dim])
            k, v = kv_cache
            if q.shape[0] != k.shape[0]:
                # hard contract, not a debug check (survives python -O):
                # beam-shared K/V requires whole beam groups and no
                # attn_mask (the fold changes the mask's query axis)
                if q.shape[0] % k.shape[0] != 0:
                    raise ValueError(
                        f"beam-shared kv_cache: query batch {q.shape[0]} "
                        f"not a multiple of kv batch {k.shape[0]}")
                if attn_mask is not None:
                    raise ValueError(
                        "beam-shared kv_cache does not support attn_mask")
                group = q.shape[0] // k.shape[0]
                L = q.shape[1]
                q = q.reshape(k.shape[0], group * L,
                              self.num_heads, self.head_dim)
                if key_padding_mask is not None:
                    # lanes of one utterance share the padding row
                    key_padding_mask = key_padding_mask[::group]
        else:
            q, k, v = self.inp_proj(query, key, value)
        if group == 1 and self._flash_eligible(query.shape[-2], inj_pose,
                                               attn_mask, training):
            k_len = None
            if key_padding_mask is not None:
                # suffix padding mask (True = pad) -> valid lengths
                k_len = jnp.sum(
                    jnp.logical_not(key_padding_mask), -1).astype(jnp.int32)
            # N x T x H x D -> N x H x T x D
            o = flash_attention(jnp.swapaxes(q, 1, 2),
                                jnp.swapaxes(k, 1, 2),
                                jnp.swapaxes(v, 1, 2),
                                k_len=k_len)
            context = jnp.swapaxes(o, 1, 2)
            N, L = context.shape[:2]
            return self.out_proj(context.reshape(N, L, self.embed_dim)), None
        if (group == 1 and inj_pose is not None and attn_mask is None
                and (self.dropout == 0 or not training)):
            context = self._rel_flash(q, k, v, inj_pose, key_padding_mask,
                                      training)
            if context is not None:
                N, L = context.shape[:2]
                return self.out_proj(
                    context.reshape(N, L, self.embed_dim)), None
        logit = self.dot_att(q, k, inj_pose)
        context, weight = self.context_weight(
            logit, v, key_padding_mask=key_padding_mask,
            attn_mask=attn_mask, training=training)
        if group > 1:
            # weights are intentionally dropped here (sentinel None, same
            # contract as the flash path above): the fold makes them
            # (Nk, H, G*L, T) — per-lane weights would need an un-fold a
            # coverage-penalty caller must request via group == 1
            N, GL = context.shape[:2]
            context = self.out_proj(
                context.reshape(N * group, GL // group, self.embed_dim))
            return context, None
        return self.wrap_out(context, weight)


# rel/xl flash crossover: like the abs kernel, short sequences lose to
# the dense path (block padding + the custom call blocking XLA fusion);
# measured on v5e the rel kernel wins fwd+bwd from T >= 512 (BENCHMARKS.md
# "Flash attention for rel/xl pose")
REL_FLASH_MIN_LEN = 512


def _suffix_klen(key_padding_mask):
    if key_padding_mask is None:
        return None
    return jnp.sum(jnp.logical_not(key_padding_mask), -1).astype(jnp.int32)


class RelMultiheadAttention(ApsMultiheadAttention):
    """MHSA with Shaw-style learnt relative-position keys.
    inj_pose: (2L-1) x D relative key embeddings."""

    def dot_att(self, query, key, inj_pose=None):
        assert inj_pose is not None
        term_a = jnp.einsum("nlhd,nshd->nhls", query, key)
        # N x H x L x 2L-1
        term_b = jnp.einsum("nlhd,sd->nhls", query, inj_pose)
        return term_a + digit_shift(term_b)

    def _rel_flash(self, q, k, v, inj_pose, key_padding_mask, training):
        """In-kernel Shaw rel scores: q_c = q_p = q, shared pose table."""
        L, S = q.shape[1], k.shape[1]
        if not (self.use_flash and L == S and L >= REL_FLASH_MIN_LEN
                and inj_pose.shape[0] == 2 * L - 1):
            return None
        qh = jnp.swapaxes(q, 1, 2)
        o = flash_attention_rel(qh, qh, jnp.swapaxes(k, 1, 2),
                                jnp.swapaxes(v, 1, 2), inj_pose[None],
                                k_len=_suffix_klen(key_padding_mask))
        return jnp.swapaxes(o, 1, 2)


class XlMultiheadAttention(ApsMultiheadAttention):
    """MHSA with Transformer-XL relative encodings (rel_u/rel_v biases).
    inj_pose: (2L-1) x E sinusoidal encodings."""
    tie_uv: Optional[Tuple] = None  # externally shared (rel_u, rel_v)

    def _setup_extra(self):
        self.rel_proj = nn.Dense(self.embed_dim, use_bias=False,
                                 name="rel_proj")
        if self.tie_uv is None:
            init = nn.initializers.xavier_uniform()
            self.rel_u = self.param("rel_u", init,
                                    (self.num_heads, self.head_dim))
            self.rel_v = self.param("rel_v", init,
                                    (self.num_heads, self.head_dim))
        else:
            self.rel_u, self.rel_v = self.tie_uv

    def dot_att(self, query, key, inj_pose=None):
        assert inj_pose is not None
        term_ac = jnp.einsum("nlhd,nshd->nhls", query + self.rel_u, key)
        rel_pos = self.rel_proj(inj_pose).reshape(-1, self.num_heads,
                                                  self.head_dim)
        term_bd = jnp.einsum("nlhd,shd->nhls", query + self.rel_v, rel_pos)
        return term_ac + digit_shift(term_bd)

    def _rel_flash(self, q, k, v, inj_pose, key_padding_mask, training):
        """In-kernel XL rel scores: rel_u/rel_v fold into the content/
        position queries, per-head projected sinusoid table."""
        L, S = q.shape[1], k.shape[1]
        if not (self.use_flash and L == S and L >= REL_FLASH_MIN_LEN
                and inj_pose.shape[0] == 2 * L - 1):
            return None
        pose = self.rel_proj(inj_pose).reshape(-1, self.num_heads,
                                               self.head_dim)
        o = flash_attention_rel(jnp.swapaxes(q + self.rel_u, 1, 2),
                                jnp.swapaxes(q + self.rel_v, 1, 2),
                                jnp.swapaxes(k, 1, 2),
                                jnp.swapaxes(v, 1, 2),
                                jnp.transpose(pose, (1, 0, 2)),
                                k_len=_suffix_klen(key_padding_mask))
        return jnp.swapaxes(o, 1, 2)


class FeedForward(nn.Module):
    """FFN: Linear -> act -> Dropout -> Linear -> Dropout."""
    att_dim: int
    feedforward_dim: int
    dropout: float = 0.1
    activation: str = "relu"

    @nn.compact
    def __call__(self, inp, training: bool = False):
        drop = lambda x: nn.Dropout(self.dropout,
                                    deterministic=not training,
                                    rng_collection="dropout")(x)
        out = nn.Dense(self.feedforward_dim)(inp)
        out = drop(get_activation_fn(self.activation)(out))
        return drop(nn.Dense(self.att_dim)(out))


class ApsTransformerEncoderLayer(nn.Module):
    """Transformer encoder layer (pre/post norm)."""
    att_dim: int
    self_attn: nn.Module
    feedforward_dim: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    pre_norm: bool = False

    @nn.compact
    def __call__(self, src, inj_pose=None, src_mask=None,
                 src_key_padding_mask=None, training: bool = False):
        norm1 = nn.LayerNorm(name="norm1")
        norm2 = nn.LayerNorm(name="norm2")
        ffn = FeedForward(self.att_dim, self.feedforward_dim,
                          dropout=self.dropout,
                          activation=self.activation, name="feedforward")
        drop = nn.Dropout(self.dropout, deterministic=not training,
                          rng_collection="dropout")
        inp = norm1(src) if self.pre_norm else src
        att, _ = self.self_attn(inp, inp, inp, inj_pose=inj_pose,
                                attn_mask=src_mask,
                                key_padding_mask=src_key_padding_mask,
                                training=training)
        src = src + drop(att)
        if self.pre_norm:
            src = src + ffn(norm2(src), training=training)
        else:
            src = norm1(src)
            src = norm2(src + ffn(src, training=training))
        return src


class ApsConformerEncoderLayer(nn.Module):
    """Conformer block: (macaron FFN) -> MHSA -> conv module -> FFN."""
    att_dim: int
    self_attn: nn.Module
    feedforward_dim: int = 2048
    dropout: float = 0.1
    kernel_size: int = 15
    macaron: bool = True
    pre_norm: bool = True
    casual_conv1d: bool = False
    activation: str = "swish"

    @nn.compact
    def __call__(self, src, inj_pose=None, src_mask=None,
                 src_key_padding_mask=None, training: bool = False):
        assert self.kernel_size % 2 == 1
        act = get_activation_fn(self.activation)
        drop = lambda x: nn.Dropout(self.dropout,
                                    deterministic=not training,
                                    rng_collection="dropout")(x)
        macaron_factor = 0.5 if self.macaron else 1

        def conv_module(inp):
            # pointwise -> GLU -> depthwise -> BN -> act -> pointwise
            out = nn.Dense(self.att_dim * 2, name="pconv1")(inp)
            out = jax.nn.glu(out, axis=-1)
            pad = [(self.kernel_size - 1, 0)] if self.casual_conv1d else \
                [((self.kernel_size - 1) // 2, (self.kernel_size - 1) // 2)]
            out = nn.Conv(self.att_dim, (self.kernel_size,),
                          feature_group_count=self.att_dim,
                          padding=pad, name="dconv")(out)
            out = nn.BatchNorm(use_running_average=not training,
                               momentum=0.9, name="bn")(out)
            out = nn.Dense(self.att_dim, name="pconv2")(act(out))
            return drop(out)

        # 1) macaron FFN
        if self.macaron:
            norm_ffn1 = nn.LayerNorm(name="norm_ffn1")
            ffn1 = FeedForward(self.att_dim, self.feedforward_dim,
                               dropout=self.dropout,
                               activation=self.activation,
                               name="feedforward1")
            if self.pre_norm:
                src = ffn1(norm_ffn1(src),
                           training=training) * macaron_factor + src
            else:
                src = norm_ffn1(ffn1(src, training=training) *
                                macaron_factor + src)
        # 2) MHSA
        norm_attn = nn.LayerNorm(name="norm_attn")
        inp = norm_attn(src) if self.pre_norm else src
        att, _ = self.self_attn(inp, inp, inp, inj_pose=inj_pose,
                                attn_mask=src_mask,
                                key_padding_mask=src_key_padding_mask,
                                training=training)
        src = src + drop(att)
        # 3) conv + FFN
        norm_conv = nn.LayerNorm(name="norm_conv")
        norm_ffn2 = nn.LayerNorm(name="norm_ffn2")
        ffn2 = FeedForward(self.att_dim, self.feedforward_dim,
                           dropout=self.dropout, activation=self.activation,
                           name="feedforward2")
        if self.pre_norm:
            src = conv_module(norm_conv(src)) + src
            out = ffn2(norm_ffn2(src), training=training) * \
                macaron_factor + src
        else:
            src = conv_module(norm_attn(src)) + src
            src = norm_conv(src)
            out = norm_ffn2(ffn2(src, training=training) *
                            macaron_factor + src)
        return out


def _make_attn(arch: str, pose: str, att_dim, nhead, att_dropout, tie_uv,
               name):
    if pose == "abs":
        return ApsMultiheadAttention(att_dim, nhead, dropout=att_dropout,
                                     name=name)
    if pose == "rel":
        return RelMultiheadAttention(att_dim, nhead, dropout=att_dropout,
                                     name=name)
    if pose == "xl":
        return XlMultiheadAttention(att_dim, nhead, dropout=att_dropout,
                                    tie_uv=tie_uv, name=name)
    raise ValueError(f"Unknown pose for encoder layer: {pose}")


for _arch in ("xfmr", "cfmr"):
    for _pose in ("abs", "rel", "xl"):
        TransformerEncoderLayers.register(f"{_arch}_{_pose}")(
            (ApsTransformerEncoderLayer if _arch == "xfmr" else
             ApsConformerEncoderLayer))


class ApsTransformerEncoder(nn.Module):
    """Stack of N transformer/conformer encoder layers."""
    arch: str  # xfmr | cfmr
    pose: str  # abs | rel | xl
    num_layers: int
    arch_kwargs: Dict = None
    final_norm: bool = False

    @nn.compact
    def __call__(self, src, inj_pose=None, src_mask=None,
                 src_key_padding_mask=None, training: bool = False):
        kwargs = dict(self.arch_kwargs or {})
        att_dim = kwargs.pop("att_dim")
        nhead = kwargs.pop("nhead")
        att_dropout = kwargs.pop("att_dropout", 0.1)
        ffn_dropout = kwargs.pop("ffn_dropout", 0.1)
        pre_norm = kwargs.pop("pre_norm", self.arch == "cfmr")
        # remat=true rematerializes each layer in the backward pass
        # (jax.checkpoint): activation memory drops from O(layers) to O(1)
        # layers' worth, trading ~30% extra forward FLOPs — the standard
        # TPU recipe for training bigger batches/longer utterances
        remat = kwargs.pop("remat", False)
        tie = kwargs.pop("tie", False)
        tie_uv = None
        if self.pose == "xl" and tie:
            init = nn.initializers.xavier_uniform()
            tie_uv = (self.param("rel_u", init, (nhead, att_dim // nhead)),
                      self.param("rel_v", init, (nhead, att_dim // nhead)))
        out = src
        layer_cls = ApsTransformerEncoderLayer if self.arch == "xfmr" \
            else ApsConformerEncoderLayer
        if remat:
            layer_cls = nn.remat(layer_cls, static_argnums=(5,),
                                 prevent_cse=False)
        for i in range(self.num_layers):
            attn = _make_attn(self.arch, self.pose, att_dim, nhead,
                              att_dropout, tie_uv, f"attn_{i}")
            layer = layer_cls(att_dim, attn, dropout=ffn_dropout,
                              pre_norm=pre_norm, name=f"layer_{i}",
                              **kwargs)
            if remat:
                out = layer(out, inj_pose, src_mask,
                            src_key_padding_mask, training)
            else:
                out = layer(out, inj_pose=inj_pose, src_mask=src_mask,
                            src_key_padding_mask=src_key_padding_mask,
                            training=training)
        if self.final_norm or pre_norm:
            out = nn.LayerNorm(name="norm")(out)
        return out


def get_xfmr_encoder(arch: str, pose: str, num_layers: int,
                     arch_kwargs: Dict) -> nn.Module:
    name = f"{arch}_{pose}"
    if name not in TransformerEncoderLayers:
        raise ValueError(f"Unknown type of the encoders: {name}")
    return ApsTransformerEncoder(arch=arch,
                                 pose=pose,
                                 num_layers=num_layers,
                                 arch_kwargs=arch_kwargs)
