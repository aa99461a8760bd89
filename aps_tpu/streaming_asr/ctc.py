#!/usr/bin/env python
"""Streaming ASR encoder + CTC model.

Parity surface: /root/reference/aps/streaming_asr/ctc.py
(StreamingASREncoder:20, CtcASR:116 "streaming_asr@ctc")."""

from typing import Dict, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.base.encoder import encoder_instance
from aps_tpu.libs import ApsRegisters
from aps_tpu.streaming_asr.base.encoder import StreamingBaseEncoder
from aps_tpu.streaming_asr.transformer.encoder import \
    StreamingTransformerEncoder


class StreamingASREncoder(nn.Module):
    """Streaming encoder base: transform -> (lctx/rctx pad) -> encoder."""
    input_size: int = 80
    vocab_size: int = 40
    ctc: bool = False
    ead: bool = False
    lctx: int = -1
    rctx: int = -1
    asr_transform: Optional[nn.Module] = None
    enc_type: str = "pytorch_rnn"
    enc_proj: int = -1
    enc_kwargs: Dict = None

    def setup(self):
        assert self.ctc or self.ead
        ctc_only = self.ctc and not self.ead
        enc_kwargs = dict(self.enc_kwargs or {})
        if self.enc_type in ["xfmr", "cfmr"]:
            self.encoder = StreamingTransformerEncoder(
                arch=self.enc_type,
                input_size=self.input_size,
                output_proj=self.vocab_size if ctc_only else -1,
                **enc_kwargs)
            self.enc_out_dim = enc_kwargs["arch_kwargs"]["att_dim"]
        else:
            self.encoder = encoder_instance(
                self.enc_type, self.input_size,
                self.vocab_size if ctc_only else self.enc_proj, enc_kwargs,
                StreamingBaseEncoder)
            self.enc_out_dim = self.enc_proj
        self.ctc_head = nn.Dense(self.vocab_size) if (self.ead and
                                                      self.ctc) else None

    def _pad_ctx(self, x_pad, x_len):
        if self.lctx + self.rctx > 0 and self.lctx >= 0 and self.rctx >= 0:
            x_pad = jnp.pad(x_pad, ((0, 0), (self.lctx, self.rctx), (0, 0)))
            if x_len is not None:
                x_len = x_len + self.lctx + self.rctx
        return x_pad, x_len

    def _training_prep(self, x_pad, x_len, training: bool = False):
        if self.asr_transform is not None:
            x_pad, x_len = self.asr_transform(x_pad, x_len,
                                              training=training)
        x_pad, x_len = self._pad_ctx(x_pad, x_len)
        enc_out, enc_len = self.encoder(x_pad, x_len, training=training)
        enc_ctc = enc_out
        if self.ctc_head is not None:
            enc_ctc = self.ctc_head(enc_out)
        return enc_out, enc_ctc, enc_len

    def _decoding_prep(self, x, x_len=None):
        if self.asr_transform is not None:
            x, x_len = self.asr_transform(x, x_len, training=False)
        x, x_len = self._pad_ctx(x, x_len)
        return self.encoder(x, x_len, training=False)


@ApsRegisters.asr.register("streaming_asr@ctc")
class CtcASR(StreamingASREncoder):
    """Streaming encoder trained with CTC."""
    ctc: bool = True
    ead: bool = False

    def __call__(self, x_pad, x_len, training: bool = False):
        return self._training_prep(x_pad, x_len, training=training)

    def step(self, chunk, state=None):
        """One streaming step through the encoder."""
        return self.encoder.step(chunk, state=state)

    def ctc_logits(self, x, x_len=None):
        enc_out, enc_len = self._decoding_prep(x, x_len)
        if self.ctc_head is not None:
            enc_out = self.ctc_head(enc_out)
        return enc_out, enc_len
