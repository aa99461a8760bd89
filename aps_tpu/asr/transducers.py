#!/usr/bin/env python
"""Transducer ASR models.

Parity surface: /root/reference/aps/asr/transducers.py (TransducerASR:73
"asr@transducer", XfmrTransducerASR:123 "asr@xfmr_transducer");
blank = vocab_size - 1."""

from typing import Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.ctc import ASREncoderBase
from aps_tpu.asr.transducer.decoder import (TorchRNNDecoder,
                                            TorchTransformerDecoder)
from aps_tpu.libs import ApsRegisters


class ASRTransducerBase(ASREncoderBase):
    """Transducer base: encoder + prediction/joint network."""
    ctc: bool = False
    ead: bool = True

    @property
    def blank(self) -> int:
        return self.vocab_size - 1

    def decode_enc(self, x, x_len=None):
        enc_out, enc_len = self._decoding_prep(x, x_len)
        return enc_out, enc_len

    def decode_pred(self, pred_prev, hidden=None):
        """One prediction-network step for search loops."""
        return self.decoder.pred(pred_prev, hidden=hidden)

    def decode_pred_fixed(self, tokens_buf, lengths):
        """Fixed-shape (stateless) prediction for transformer prediction
        networks inside compiled search loops."""
        return self.decoder.pred_fixed(tokens_buf, lengths)

    def decode_joint(self, enc_frame, dec_out):
        """Joint logits: enc_frame N x D, dec_out N x J -> N x V."""
        return self.decoder.joint(self.decoder.enc_proj(enc_frame), dec_out)


@ApsRegisters.asr.register("asr@transducer")
class TransducerASR(ASRTransducerBase):
    """(Non-)Transformer encoder + RNN prediction network."""
    dec_type: str = "rnn"
    dec_kwargs: Dict = None

    def setup(self):
        if self.dec_type != "rnn":
            raise ValueError("TransducerASR: the decoder must be rnn")
        super(TransducerASR, self).setup()
        dec_kwargs = dict(self.dec_kwargs or {})
        dec_kwargs["enc_dim"] = self.enc_out_dim
        self.decoder = TorchRNNDecoder(self.vocab_size, **dec_kwargs)

    def __call__(self, x_pad, x_len, y_pad, y_len=None,
                 training: bool = False):
        """y_pad: N x To+1 (blank-prefixed) ->
        (enc_out, dec_out N x Ti x To+1 x V, enc_len)."""
        enc_out, _, enc_len = self._training_prep(x_pad, x_len,
                                                  training=training)
        dec_out = self.decoder(enc_out, y_pad, training=training)
        return enc_out, dec_out, enc_len


@ApsRegisters.asr.register("asr@xfmr_transducer")
class XfmrTransducerASR(ASRTransducerBase):
    """(Non-)Transformer encoder + transformer prediction network."""
    dec_type: str = "xfmr"
    dec_kwargs: Dict = None

    def setup(self):
        if self.dec_type != "xfmr":
            raise ValueError("XfmrTransducerASR: the decoder must be xfmr")
        super(XfmrTransducerASR, self).setup()
        dec_kwargs = dict(self.dec_kwargs or {})
        dec_kwargs["enc_dim"] = self.enc_out_dim
        self.decoder = TorchTransformerDecoder(self.vocab_size, **dec_kwargs)

    def __call__(self, x_pad, x_len, y_pad, y_len=None,
                 training: bool = False):
        enc_out, _, enc_len = self._training_prep(x_pad, x_len,
                                                  training=training)
        dec_out = self.decoder(enc_out, y_pad, tgt_len=y_len,
                               training=training)
        return enc_out, dec_out, enc_len
