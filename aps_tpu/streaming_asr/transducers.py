#!/usr/bin/env python
"""Streaming transducer ASR (parity:
/root/reference/aps/streaming_asr/transducers.py, TransducerASR:18
"streaming_asr@transducer"; greedy/beam search via
aps_tpu.asr.beam_search.transducer)."""

from typing import Dict, Optional

from flax import linen as nn

from aps_tpu.asr.transducer.decoder import TorchRNNDecoder
from aps_tpu.libs import ApsRegisters
from aps_tpu.streaming_asr.ctc import StreamingASREncoder


@ApsRegisters.asr.register("streaming_asr@transducer")
class TransducerASR(StreamingASREncoder):
    """Streaming encoder + RNN prediction/joint network."""
    ctc: bool = False
    ead: bool = True
    dec_type: str = "rnn"
    dec_kwargs: Dict = None

    @property
    def blank(self) -> int:
        return self.vocab_size - 1

    def setup(self):
        super(TransducerASR, self).setup()
        dec_kwargs = dict(self.dec_kwargs or {})
        dec_kwargs["enc_dim"] = self.enc_out_dim
        self.decoder = TorchRNNDecoder(self.vocab_size, **dec_kwargs)

    def __call__(self, x_pad, x_len, y_pad, y_len=None,
                 training: bool = False):
        """y_pad: N x To+1 (blank-prefixed)."""
        enc_out, _, enc_len = self._training_prep(x_pad, x_len,
                                                  training=training)
        dec_out = self.decoder(enc_out, y_pad, training=training)
        return enc_out, dec_out, enc_len

    # hooks shared with the offline transducer beam search
    def decode_enc(self, x, x_len=None):
        return self._decoding_prep(x, x_len)

    def decode_pred(self, pred_prev, hidden=None):
        return self.decoder.pred(pred_prev, hidden=hidden)

    def decode_joint(self, enc_frame, dec_out):
        return self.decoder.joint(self.decoder.enc_proj(enc_frame), dec_out)
