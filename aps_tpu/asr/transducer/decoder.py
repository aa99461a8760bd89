#!/usr/bin/env python
"""Transducer prediction + joint networks.

Parity surface: /root/reference/aps/asr/transducer/decoder.py (DecoderBase
w/ joint:18, TorchRNNDecoder:56, TorchTransformerDecoder:130)."""

from typing import Dict, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.attention import padding_mask
from aps_tpu.asr.base.component import OneHotEmbedding
from aps_tpu.asr.base.rnn import StackedLSTMWithState
from aps_tpu.asr.transformer.impl import get_xfmr_encoder
from aps_tpu.asr.transformer.pose import get_xfmr_pose
from aps_tpu.asr.transformer.utils import prep_sub_mask


class DecoderBase(nn.Module):
    """Shared embed / enc-dec projections / joint network."""
    vocab_size: int
    embed_size: int = 512
    enc_dim: int = 512
    dec_dim: int = 512
    jot_dim: int = 512
    onehot_embed: bool = False

    def _embed_dim(self) -> int:
        return self.embed_size

    def _setup_base(self):
        if not self.onehot_embed:
            self.vocab_embed = nn.Embed(self.vocab_size, self._embed_dim())
        else:
            self.vocab_embed = OneHotEmbedding(self.vocab_size)
        self.enc_proj = nn.Dense(self.jot_dim, use_bias=False)
        self.dec_proj = nn.Dense(self.jot_dim)
        self.output = nn.Dense(self.vocab_size, use_bias=False)

    def joint(self, enc_proj_out, dec_proj_out):
        """enc: N x Ti x J (or N x J), dec: N x To+1 x J (or N x J) ->
        N x Ti x To+1 x V (or N x V)."""
        if enc_proj_out.ndim == 2:
            add_out = enc_proj_out + dec_proj_out
        else:
            add_out = enc_proj_out[:, :, None] + dec_proj_out[:, None]
        return self.output(jnp.tanh(add_out))


class TorchRNNDecoder(DecoderBase):
    """RNN prediction network + joint."""
    rnn: str = "lstm"
    num_layers: int = 3
    hidden: int = 512
    proj_size: int = -1
    add_ln: bool = False
    dropout: float = 0.0

    def setup(self):
        self._setup_base()
        self.decoder = StackedLSTMWithState(self.hidden,
                                            num_layers=self.num_layers,
                                            dropout=self.dropout,
                                            rnn_type=self.rnn,
                                            layer_norm=self.add_ln,
                                            proj_size=self.proj_size)

    def __call__(self, enc_out, tgt_pad, tgt_len=None,
                 training: bool = False):
        """enc_out: N x Ti x D, tgt_pad: N x To+1 (blank-prefixed) ->
        N x Ti x To+1 x V."""
        emb = self.vocab_embed(tgt_pad)
        dec_out, _ = self.decoder(emb, training=training)
        return self.joint(self.enc_proj(enc_out), self.dec_proj(dec_out))

    def pred(self, pred_prev, hidden=None):
        """One prediction-net step: pred_prev N x 1 -> (dec_out N x J,
        hidden)."""
        emb = self.vocab_embed(pred_prev)
        dec_out, hidden = self.decoder(emb, state=hidden, training=False)
        return self.dec_proj(dec_out[:, -1]), hidden

    def init_state(self, batch: int):
        return self.decoder.init_state(batch)


class TorchTransformerDecoder(DecoderBase):
    """Transformer prediction network + joint."""
    att_dim: int = 512
    pose_kwargs: Dict = None
    arch_kwargs: Dict = None
    num_layers: int = 6

    def _embed_dim(self) -> int:
        return self.att_dim

    def setup(self):
        self._setup_base()
        self.abs_pos_enc = get_xfmr_pose("abs", self.att_dim,
                                         **(self.pose_kwargs or {}))
        self.decoder = get_xfmr_encoder("xfmr", "abs", self.num_layers,
                                        dict(self.arch_kwargs or {}))

    def __call__(self, enc_out, tgt_pad, tgt_len=None,
                 training: bool = False):
        pad_mask = None if tgt_len is None else padding_mask(
            tgt_len, tgt_pad.shape[-1])
        tgt_mask = prep_sub_mask(tgt_pad.shape[-1])
        emb = self.abs_pos_enc(self.vocab_embed(tgt_pad), training=training)
        dec_out = self.decoder(emb, src_mask=tgt_mask,
                               src_key_padding_mask=pad_mask,
                               training=training)
        return self.joint(self.enc_proj(enc_out), self.dec_proj(dec_out))

    def pred(self, pred_prev, hidden=None):
        """pred_prev: N x 1; hidden: N x T' x E prefix embeddings."""
        t = 0 if hidden is None else hidden.shape[1]
        emb = self.abs_pos_enc(self.vocab_embed(pred_prev), t=t,
                               training=False)
        hidden = emb if hidden is None else jnp.concatenate([hidden, emb], 1)
        tgt_mask = prep_sub_mask(hidden.shape[1])
        dec_out = self.decoder(hidden, src_mask=tgt_mask, training=False)
        return self.dec_proj(dec_out[:, -1]), hidden

    def pred_fixed(self, tokens_buf, lengths):
        """Fixed-shape prediction for compiled search loops: rescore the
        whole (N x U) token buffer ([<blank> BOS, emissions...], blank-
        padded) under a causal mask and read the output at the last valid
        position (index `lengths`). Stateless: emission-count semantics
        come from `lengths` alone. -> N x J."""
        U = tokens_buf.shape[1]
        emb = self.abs_pos_enc(self.vocab_embed(tokens_buf),
                               training=False)
        dec_out = self.decoder(emb, src_mask=prep_sub_mask(U),
                               training=False)
        idx = lengths.astype(jnp.int32)[:, None, None]
        last = jnp.take_along_axis(
            dec_out, jnp.broadcast_to(idx, (dec_out.shape[0], 1,
                                            dec_out.shape[-1])), axis=1)
        return self.dec_proj(last[:, 0])
