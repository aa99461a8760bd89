#!/usr/bin/env python
"""Multi-channel enhancement front-end + attention-based AM.

Parity surface: /root/reference/aps/asr/enh_att.py (get_enh_net:16,
EnhASRBase:33, EnhAttASR:121 "asr@enh_att", EnhXfmrASR:175 "asr@enh_xfmr")."""

from typing import Dict, List, Optional

import jax.numpy as jnp
from flax import linen as nn

from aps_tpu.asr.att import AttASR, XfmrASR
from aps_tpu.asr.filter.conv import EnhFrontEnds
# register mvdr / google filters
import aps_tpu.asr.filter.mvdr  # noqa: F401
import aps_tpu.asr.filter.google  # noqa: F401
from aps_tpu.libs import ApsRegisters


def get_enh_net(enh_type: str,
                enh_kwargs: Dict,
                enh_input_size: Optional[int] = None) -> nn.Module:
    if enh_type not in EnhFrontEnds:
        raise ValueError(f"Unknown enhancement front-end: {enh_type}")
    enh_net_cls = EnhFrontEnds[enh_type]
    if enh_type[-4:] == "mvdr":
        if enh_input_size is None:
            enh_input_size = enh_kwargs["num_bins"]
        return enh_net_cls(enh_input_size=enh_input_size, **enh_kwargs)
    return enh_net_cls(**enh_kwargs)


class EnhASRMixin:
    """Shared enhancement path for enh_att/enh_xfmr models."""

    def _setup_enh(self):
        self.enh_net = get_enh_net(self.enh_type,
                                   dict(self.enh_kwargs or {}),
                                   enh_input_size=self.enh_input_size)

    def _enhance(self, x_pad, x_len, training: bool = False):
        """x_pad: N x C x S multi-channel wave -> enhanced features.
        Spectra stay in the packed `... x 2` real-pair layout end to end
        (no complex64 on device — see aps_tpu/ops/cplx_pair)."""
        packed, x_len = self.enh_transform.encode(x_pad, x_len)
        if self.enh_type[-4:] == "mvdr":
            feats = self.enh_transform(packed, training=training)
            x_enh = self.enh_net(feats, packed, inp_len=x_len,
                                 training=training)
        elif self.enh_type.startswith("time_") or \
                self.enh_type == "google_clp":
            x_enh = self.enh_net(packed, training=training)
        else:
            x_enh = self.enh_net(packed)
        # mvdr output is packed N x T x F x 2 -> magnitude features
        if x_enh.ndim == 4 and x_enh.shape[-1] == 2:
            x_enh = jnp.sqrt(x_enh[..., 0]**2 + x_enh[..., 1]**2 + 1e-10)
        if self.asr_transform is not None:
            x_enh, _ = self.asr_transform(x_enh, None, training=training)
        return x_enh, x_len


@ApsRegisters.asr.register("asr@enh_att")
class EnhAttASR(AttASR, EnhASRMixin):
    """AttASR with a multi-channel enhancement front-end."""
    asr_input_size: int = 80
    enh_input_size: Optional[int] = None
    enh_transform: Optional[nn.Module] = None
    enh_type: str = "google_clp"
    enh_kwargs: Optional[Dict] = None
    asr_cpt: str = ""

    def setup(self):
        super(EnhAttASR, self).setup()
        self._setup_enh()

    def __call__(self, x_pad, x_len, y_pad, y_len, ssr=0,
                 training: bool = False):
        """x_pad: N x C x S -> (dec_out, enc_ctc, enc_len)."""
        x_enh, x_len = self._enhance(x_pad, x_len, training=training)
        enc_out, enc_len = self.encoder(x_enh, x_len, training=training)
        enc_ctc = self.ctc_head(enc_out) if self.ctc_head is not None \
            else enc_out
        dec_out, _ = self.decoder(enc_out, enc_len, y_pad,
                                  schedule_sampling=ssr, training=training)
        return dec_out, enc_ctc, enc_len

    def decode_enc(self, x, x_len=None):
        x_enh, x_len = self._enhance(x, x_len, training=False)
        enc_out, enc_len = self.encoder(x_enh, x_len, training=False)
        ctc_out = self.ctc_head(enc_out) if self.ctc_head is not None \
            else None
        return enc_out, enc_len, ctc_out


@ApsRegisters.asr.register("asr@enh_xfmr")
class EnhXfmrASR(XfmrASR, EnhASRMixin):
    """XfmrASR with a multi-channel enhancement front-end."""
    asr_input_size: int = 80
    enh_input_size: Optional[int] = None
    enh_transform: Optional[nn.Module] = None
    enh_type: str = "google_clp"
    enh_kwargs: Optional[Dict] = None
    asr_cpt: str = ""

    def setup(self):
        super(EnhXfmrASR, self).setup()
        self._setup_enh()

    def __call__(self, x_pad, x_len, y_pad, y_len, ssr=0,
                 training: bool = False):
        x_enh, x_len = self._enhance(x_pad, x_len, training=training)
        enc_out, enc_len = self.encoder(x_enh, x_len, training=training)
        enc_ctc = self.ctc_head(enc_out) if self.ctc_head is not None \
            else enc_out
        dec_out = self.decoder(enc_out, enc_len, y_pad, y_len,
                               training=training)
        return dec_out, enc_ctc, enc_len

    def decode_enc(self, x, x_len=None):
        x_enh, x_len = self._enhance(x, x_len, training=False)
        enc_out, enc_len = self.encoder(x_enh, x_len, training=False)
        ctc_out = self.ctc_head(enc_out) if self.ctc_head is not None \
            else None
        return enc_out, enc_len, ctc_out
