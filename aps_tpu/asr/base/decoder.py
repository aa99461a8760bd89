#!/usr/bin/env python
"""Attention RNN decoder with input feeding & schedule sampling.

Parity surface: /root/reference/aps/asr/base/decoder.py (TorchRNNDecoder:69,
LayerNormRNN:18). Structural difference: the attention network is a CHILD of
the decoder here (fields att_type/att_kwargs) instead of a sibling passed per
call — this lets the whole teacher-forcing loop compile as one lax.scan
(nn.scan over time) with the attention's encoder projections hoisted out of
the loop. Schedule sampling draws per-step coins from the "ss" rng."""

from typing import Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.attention import att_instance
from aps_tpu.asr.base.component import OneHotEmbedding
from aps_tpu.asr.base.rnn import StackedLSTMWithState


class TorchRNNDecoder(nn.Module):
    """RNN decoder. enc_proj = encoder output dim."""
    enc_proj: int
    vocab_size: int
    att_type: str = "ctx"
    att_kwargs: Dict = None
    rnn: str = "lstm"
    add_ln: bool = False
    num_layers: int = 3
    proj_size: int = -1
    hidden: int = 512
    dropout: float = 0.0
    input_feeding: bool = False
    onehot_embed: bool = False

    def setup(self):
        if not self.onehot_embed:
            self.vocab_embed = nn.Embed(self.vocab_size, self.hidden)
        else:
            self.vocab_embed = OneHotEmbedding(self.vocab_size)
        self.decoder = StackedLSTMWithState(self.hidden,
                                            num_layers=self.num_layers,
                                            dropout=self.dropout,
                                            rnn_type=self.rnn,
                                            layer_norm=self.add_ln,
                                            proj_size=self.proj_size)
        self.att_net = att_instance(self.att_type, self.enc_proj,
                                    self.decoder.output_size,
                                    **(self.att_kwargs or {}))
        self.proj = nn.Dense(self.enc_proj)
        self.drop = nn.Dropout(self.dropout, rng_collection="dropout")
        self.pred = nn.Dense(self.vocab_size)

    # ------------------------------------------------------------------
    def init_carry(self, batch: int, T: int, enc_len=None):
        """(dec_hid, att_ctx, att_ali, proj, prev_logits)."""
        return (self.decoder.init_state(batch),
                jnp.zeros((batch, self.enc_proj)),
                self.att_net.init_ali(batch, T, enc_len),
                jnp.zeros((batch, self.enc_proj)),
                jnp.zeros((batch, self.vocab_size)))

    def step(self,
             out_pre: jnp.ndarray,
             enc_out: jnp.ndarray,
             att_ctx: jnp.ndarray,
             dec_hid=None,
             att_ali=None,
             proj=None,
             enc_len=None,
             att_cache=None,
             training: bool = False):
        """One prediction step (used by both training scan & beam search).
        Returns (pred N x V, att_ctx, dec_hid, att_ali, proj)."""
        emb_pre = self.vocab_embed(out_pre)
        feed = proj if self.input_feeding else att_ctx
        dec_in = jnp.concatenate([emb_pre, feed], -1)[:, None]
        dec_out, dec_hid = self.decoder(dec_in, state=dec_hid,
                                        training=training)
        dec_out = dec_out[:, 0]
        att_ali, att_ctx = self.att_net(enc_out, enc_len, dec_out, att_ali,
                                        cache=att_cache)
        proj = self.proj(jnp.concatenate([dec_out, att_ctx], -1))
        proj = self.drop(jax.nn.relu(proj), deterministic=not training)
        pred = self.pred(proj)
        return pred, att_ctx, dec_hid, att_ali, proj

    def __call__(self,
                 enc_pad: jnp.ndarray,
                 enc_len,
                 tgt_pad: jnp.ndarray,
                 schedule_sampling: float = 0,
                 training: bool = False) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Teacher-forcing loop.
        enc_pad: N x Ti x D, tgt_pad: N x To (sos-prefixed tokens)
        -> (outs N x To x V, alis N x To x ... x Ti)."""
        N, T, _ = enc_pad.shape
        To = tgt_pad.shape[-1]
        att_cache = self.att_net.prep(enc_pad)
        carry0 = self.init_carry(N, T, enc_len)

        def body(mdl, carry, xs):
            dec_hid, att_ctx, att_ali, proj, prev_logits = carry
            tok_t, t = xs
            if isinstance(schedule_sampling, (int, float)) and \
                    schedule_sampling == 0:
                tok = tok_t
            else:
                coin = jax.random.uniform(mdl.make_rng("ss"), ())
                use_pred = (coin < schedule_sampling) & (t > 0)
                tok = jnp.where(use_pred,
                                jnp.argmax(
                                    jax.lax.stop_gradient(prev_logits), -1),
                                tok_t)
            pred, att_ctx, dec_hid, att_ali, proj = mdl.step(
                tok, enc_pad, att_ctx, dec_hid=dec_hid, att_ali=att_ali,
                proj=proj, enc_len=enc_len, att_cache=att_cache,
                training=training)
            return (dec_hid, att_ctx, att_ali, proj, pred), (pred, att_ali)

        scan = nn.scan(body,
                       variable_broadcast="params",
                       split_rngs={"params": False, "ss": True,
                                   "dropout": True},
                       in_axes=0,
                       out_axes=1)
        xs = (jnp.swapaxes(tgt_pad, 0, 1), jnp.arange(To))
        _, (outs, alis) = scan(self, carry0, xs)
        return outs, alis
