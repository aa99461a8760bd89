#!/usr/bin/env python
"""Encoder-only CTC ASR model.

Parity surface: /root/reference/aps/asr/ctc.py (ASREncoderBase:23,
CtcASR:137 "asr@ctc", beam_search/ctc_align hooks)."""

from typing import Dict, List, Optional, Tuple

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.encoder import BaseEncoder, encoder_instance
from aps_tpu.asr.transformer.encoder import TransformerEncoder
from aps_tpu.libs import ApsRegisters


class ASREncoderBase(nn.Module):
    """ASR encoder base: transform -> encoder (-> ctc head)."""
    input_size: int = 80
    vocab_size: int = 30
    ctc: bool = False
    ead: bool = False
    asr_transform: Optional[nn.Module] = None
    enc_type: str = "pytorch_rnn"
    enc_proj: int = -1
    enc_kwargs: Optional[Dict] = None

    def setup(self):
        assert self.ctc or self.ead
        ctc_only = self.ctc and not self.ead
        enc_kwargs = dict(self.enc_kwargs or {})
        if self.enc_type in ["xfmr", "cfmr"]:
            self.is_xfmr_encoder = True
            enc_kwargs["output_proj"] = self.vocab_size if ctc_only else -1
            self.encoder = TransformerEncoder(arch=self.enc_type,
                                              input_size=self.input_size,
                                              **enc_kwargs)
            self.enc_out_dim = enc_kwargs["arch_kwargs"]["att_dim"]
        else:
            self.is_xfmr_encoder = False
            self.encoder = encoder_instance(
                self.enc_type, self.input_size,
                self.vocab_size if ctc_only else self.enc_proj, enc_kwargs,
                BaseEncoder)
            self.enc_out_dim = self.enc_proj
        self.ctc_head = nn.Dense(self.vocab_size) if (self.ead and
                                                      self.ctc) else None

    def _training_prep(self, x_pad, x_len, training: bool = False):
        """-> (enc_out N x T x D, enc_ctc N x T x V or enc_out, enc_len)."""
        if self.asr_transform is not None:
            x_pad, x_len = self.asr_transform(x_pad, x_len,
                                              training=training)
        enc_out, enc_len = self.encoder(x_pad, x_len, training=training)
        enc_ctc = enc_out
        if self.ctc_head is not None:
            enc_ctc = self.ctc_head(enc_out)
        return enc_out, enc_ctc, enc_len

    def _decoding_prep(self, x, x_len=None):
        """Single/batch utterance encoder pass for decoding.
        x: N x S (wave) or N x T x F (feature) -> (enc_out N x T x D,
        enc_len)."""
        if self.asr_transform is not None:
            x, x_len = self.asr_transform(x, x_len, training=False)
        return self.encoder(x, x_len, training=False)


@ApsRegisters.asr.register("asr@ctc")
class CtcASR(ASREncoderBase):
    """Encoder trained with CTC loss."""
    ctc: bool = True
    ead: bool = False

    def __call__(self, x_pad, x_len, training: bool = False):
        """-> (enc_out, enc_ctc N x T x V, enc_len)."""
        return self._training_prep(x_pad, x_len, training=training)

    def ctc_logits(self, x, x_len=None):
        """Encoder + ctc head logits for decoding: N x T x V."""
        enc_out, enc_len = self._decoding_prep(x, x_len)
        if self.ctc_head is not None:
            enc_out = self.ctc_head(enc_out)
        return enc_out, enc_len
