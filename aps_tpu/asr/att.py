#!/usr/bin/env python
"""Attention-based encoder-decoder ASR models.

Parity surface: /root/reference/aps/asr/att.py (AttASR:50 "asr@att",
XfmrASR:216 "asr@xfmr"). Training __call__ mirrors
forward(x_pad, x_len, y_pad, y_len, ssr); decoding entry points live in
aps_tpu.asr.beam_search (functional, compiled lax loops) and use the
`decode_enc`/decoder step methods exposed here."""

from typing import Dict, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.decoder import TorchRNNDecoder
from aps_tpu.asr.ctc import ASREncoderBase, CtcASR
from aps_tpu.asr.transformer.decoder import TorchTransformerDecoder
from aps_tpu.libs import ApsRegisters


class ASREncoderDecoderBase(ASREncoderBase):
    """Base for encoder-decoder AMs."""
    sos: int = -1
    eos: int = -1
    ead: bool = True

    def _check_sos_eos(self):
        if self.eos < 0 or self.sos < 0:
            raise RuntimeError(f"Unsupported SOS/EOS: {self.sos}/{self.eos}")


@ApsRegisters.asr.register("asr@att")
class AttASR(ASREncoderDecoderBase):
    """(Non-)Transformer encoder + attention + RNN decoder."""
    att_type: str = "ctx"
    att_kwargs: Dict = None
    dec_type: str = "rnn"
    dec_dim: int = 512
    dec_kwargs: Dict = None

    def setup(self):
        self._check_sos_eos()
        if self.dec_type != "rnn":
            raise ValueError("AttASR: currently decoder must be rnn")
        super(AttASR, self).setup()
        dec_vocab = self.vocab_size - 1 if self.ctc else self.vocab_size
        self.decoder = TorchRNNDecoder(self.enc_out_dim,
                                       dec_vocab,
                                       att_type=self.att_type,
                                       att_kwargs=self.att_kwargs or {},
                                       **(self.dec_kwargs or {}))

    def __call__(self, x_pad, x_len, y_pad, y_len, ssr=0,
                 training: bool = False):
        """x_pad: N x Ti x D | N x S; y_pad: N x To (sos-prefixed) ->
        (dec_out N x To x V, enc_ctc, enc_len)."""
        enc_out, enc_ctc, enc_len = self._training_prep(x_pad, x_len,
                                                        training=training)
        dec_out, _ = self.decoder(enc_out, enc_len, y_pad,
                                  schedule_sampling=ssr, training=training)
        return dec_out, enc_ctc, enc_len

    # ------------------------------------------------------------------
    # decoding hooks (called through nnet.apply(..., method=...))
    # ------------------------------------------------------------------
    def decode_enc(self, x, x_len=None):
        """Encoder pass (+ctc branch) for beam search."""
        enc_out, enc_len = self._decoding_prep(x, x_len)
        ctc_out = self.ctc_head(enc_out) if self.ctc_head is not None \
            else None
        return enc_out, enc_len, ctc_out

    def decode_prep(self, enc_out, batch: int, enc_len=None):
        """Initial decoder carry + attention cache for the beam loop."""
        att_cache = self.decoder.att_net.prep(enc_out)
        carry = self.decoder.init_carry(batch, enc_out.shape[1], enc_len)
        return carry, att_cache

    def decode_step(self, tok, enc_out, carry, att_cache, enc_len=None):
        """One decoder step: tok N -> (logp-ready logits N x V, carry)."""
        dec_hid, att_ctx, att_ali, proj, _ = carry
        pred, att_ctx, dec_hid, att_ali, proj = self.decoder.step(
            tok, enc_out, att_ctx, dec_hid=dec_hid, att_ali=att_ali,
            proj=proj, enc_len=enc_len, att_cache=att_cache, training=False)
        return pred, (dec_hid, att_ctx, att_ali, proj, pred)


@ApsRegisters.asr.register("asr@xfmr")
class XfmrASR(ASREncoderDecoderBase):
    """(Non-)Transformer encoder + transformer decoder."""
    dec_type: str = "xfmr"
    dec_kwargs: Dict = None

    def setup(self):
        self._check_sos_eos()
        if self.dec_type != "xfmr":
            raise ValueError("XfmrASR: currently decoder must be xfmr")
        super(XfmrASR, self).setup()
        dec_vocab = self.vocab_size - 1 if self.ctc else self.vocab_size
        self.decoder = TorchTransformerDecoder(vocab_size=dec_vocab,
                                               **(self.dec_kwargs or {}))

    def __call__(self, x_pad, x_len, y_pad, y_len, ssr=0,
                 training: bool = False):
        """-> (dec_out N x To x V, enc_ctc, enc_len). ssr unused (no
        schedule sampling for transformer decoders, as in the reference)."""
        enc_out, enc_ctc, enc_len = self._training_prep(x_pad, x_len,
                                                        training=training)
        dec_out = self.decoder(enc_out, enc_len, y_pad, y_len,
                               training=training)
        return dec_out, enc_ctc, enc_len

    def decode_enc(self, x, x_len=None):
        enc_out, enc_len = self._decoding_prep(x, x_len)
        ctc_out = self.ctc_head(enc_out) if self.ctc_head is not None \
            else None
        return enc_out, enc_len, ctc_out

    def decode_init_cache(self, batch: int, max_len: int):
        """Incremental-decoding cache (see TorchTransformerDecoder)."""
        return self.decoder.init_cache(batch, max_len)

    def decode_prep_kv(self, enc_out):
        """Per-layer cross-attention K/V of the encoder memory — computed
        once per utterance, reused by every decode step."""
        return self.decoder.prep_memory_kv(enc_out)

    def decode_step_inc(self, enc_out, tok, cache, t, enc_len=None,
                        mem_kv=None):
        """One incremental decoder step at position t."""
        return self.decoder.step_inc(enc_out, tok, cache, t,
                                     enc_len=enc_len, mem_kv=mem_kv)

    def decode_step(self, enc_out, prefix, prefix_len=None, enc_len=None,
                    out_idx=None, mem_kv=None):
        """Score the whole prefix (N x U); out_idx selects ONE position's
        hidden state BEFORE the vocab projection (the search only needs
        position t — projecting all U positions to V every step costs
        U x the largest matmul in the loop)."""
        dec_out, _ = self.decoder.step(enc_out, prefix, enc_len=enc_len,
                                       tgt_len=prefix_len, out_idx=out_idx,
                                       mem_kv=mem_kv, training=False)
        return dec_out
