#!/usr/bin/env python
"""ASR tasks: CTC, CTC+Xent hybrid, Transducer, LM cross-entropy.

Parity surface: /root/reference/aps/task/asr.py (CtcTask:133 "asr@ctc",
CtcXentHybridTask:172 "asr@ctc_xent", TransducerTask:259 "asr@transducer"
[torchaudio rnnt -> our jax rnnt kernel], LmXentTask:329 "asr@lm",
compute_accu:40, prep_asr_label:60, load_label_count:100)."""

import warnings
from typing import Dict, Optional, Tuple

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from aps_tpu.const import IGNORE_ID
from aps_tpu.libs import ApsRegisters
from aps_tpu.ops.rnnt import rnnt_loss
from aps_tpu.task.base import Task
from aps_tpu.task.objf import ce_objf, ctc_objf, ls_objf

__all__ = ["CtcTask", "CtcXentHybridTask", "TransducerTask", "LmXentTask"]


def compute_accu(dec_out: jnp.ndarray, tgt_pad: jnp.ndarray):
    """Frame-level accuracy over non-ignored positions -> (accu, total)."""
    pred = jnp.argmax(dec_out, axis=-1)
    mask = tgt_pad != IGNORE_ID
    num_correct = jnp.sum((pred == tgt_pad) & mask)
    total = jnp.sum(mask)
    return num_correct / total, total


def prep_asr_label(tgt_ori: jnp.ndarray,
                   tgt_len: jnp.ndarray,
                   pad_value: int,
                   sos_value: int = -1,
                   eos_value: int = -1):
    """(tgt_infer sos-prefixed input, tgt_refer eos-suffixed reference)."""
    if pad_value != IGNORE_ID:
        tgt_infer = jnp.where(tgt_ori == IGNORE_ID, pad_value, tgt_ori)
    else:
        tgt_infer = tgt_ori
    if sos_value >= 0:
        N = tgt_infer.shape[0]
        sos_col = jnp.full((N, 1), sos_value, dtype=tgt_infer.dtype)
        tgt_infer = jnp.concatenate([sos_col, tgt_infer], axis=-1)
    if eos_value >= 0:
        tgt_refer = jnp.pad(tgt_ori, ((0, 0), (0, 1)),
                            constant_values=IGNORE_ID)
        To = tgt_refer.shape[-1]
        onehot = jnp.arange(To)[None, :] == tgt_len[:, None]
        tgt_refer = jnp.where(onehot, eos_value, tgt_refer)
    else:
        tgt_refer = None
    return tgt_infer, tgt_refer


def load_label_count(label_count: str):
    if not label_count:
        return None
    counts = []
    with open(label_count, "r") as fd:
        for raw_line in fd:
            toks = raw_line.strip().split()
            if len(toks) not in (1, 2):
                raise RuntimeError(f"Label count format error: {raw_line}")
            counts.append(float(toks[0] if len(toks) == 1 else toks[1]))
    counts = np.asarray(counts)
    if np.sum(counts == 0):
        warnings.warn(f"Got {int(np.sum(counts == 0))} zero-count labels")
    return jnp.asarray(np.maximum(counts, 1))


class ASRTask(Task):
    reduction: str = "batchmean"

    def _check(self):
        if self.reduction not in ("mean", "batchmean"):
            raise ValueError(f"Unsupported reduction: {self.reduction}")


@ApsRegisters.task.register("asr@ctc")
class CtcTask(ASRTask):
    blank: int = 0

    def __call__(self, egs: Dict, training: bool = True) -> Dict:
        self._check()
        _, ctc_enc, enc_len = self.nnet(egs["src_pad"], egs["src_len"],
                                        training=training)
        loss = ctc_objf(ctc_enc, egs["tgt_pad"], enc_len, egs["tgt_len"],
                        blank=self.blank, reduction=self.reduction,
                        add_softmax=True)
        return {"loss": loss}


@ApsRegisters.task.register("asr@ctc_xent")
class CtcXentHybridTask(ASRTask):
    """CTC on the encoder + label-smoothed Xent on the decoder."""
    blank: int = 0
    lsm_factor: float = 0
    lsm_method: str = "uniform"
    ctc_weight: float = 0
    label_count: str = ""

    def __call__(self, egs: Dict, training: bool = True) -> Dict:
        self._check()
        if self.lsm_method == "unigram" and not self.label_count:
            raise RuntimeError("Missing label_count for unigram smoothing")
        tgt_infer, tgt_refer = prep_asr_label(egs["tgt_pad"],
                                              egs["tgt_len"],
                                              self.nnet.eos,
                                              sos_value=self.nnet.sos,
                                              eos_value=self.nnet.eos)
        ssr = egs.get("#ssr", 0)
        outs, ctc_enc, enc_len = self.nnet(egs["src_pad"], egs["src_len"],
                                           tgt_infer, egs["tgt_len"] + 1,
                                           ssr=ssr, training=training)
        if self.lsm_factor > 0:
            att_loss = ls_objf(outs, tgt_refer, method=self.lsm_method,
                               reduction=self.reduction,
                               lsm_factor=self.lsm_factor,
                               label_count=load_label_count(
                                   self.label_count))
        else:
            att_loss = ce_objf(outs, tgt_refer, reduction=self.reduction)
        stats = {}
        if self.ctc_weight > 0:
            ctc_loss = ctc_objf(ctc_enc, egs["tgt_pad"], enc_len,
                                egs["tgt_len"], blank=self.blank,
                                reduction=self.reduction, add_softmax=True)
            stats["@ctc"] = ctc_loss
            stats["xent"] = att_loss
        else:
            ctc_loss = 0
        loss = self.ctc_weight * ctc_loss + (1 - self.ctc_weight) * att_loss
        accu, _ = compute_accu(outs, tgt_refer)
        stats["accu"] = accu
        stats["loss"] = loss
        return stats


@ApsRegisters.task.register("asr@transducer")
class TransducerTask(ASRTask):
    """RNN-T objective (jax kernel, aps_tpu/ops/rnnt.py)."""
    blank: int = 0
    interface: str = "jax"

    def __call__(self, egs: Dict, training: bool = True) -> Dict:
        self._check()
        tgt_infer = prep_asr_label(egs["tgt_pad"], egs["tgt_len"],
                                   self.blank, sos_value=self.blank,
                                   eos_value=self.blank)[0]
        _, dec_out, enc_len = self.nnet(egs["src_pad"], egs["src_len"],
                                        tgt_infer, egs["tgt_len"] + 1,
                                        training=training)
        tgts = jnp.where(egs["tgt_pad"] == IGNORE_ID, self.blank,
                         egs["tgt_pad"])
        loss = rnnt_loss(dec_out, tgts, enc_len, egs["tgt_len"],
                         blank=self.blank, reduction="sum")
        denorm = jnp.sum(egs["tgt_len"]) if self.reduction == "mean" else \
            dec_out.shape[0]
        return {"loss": loss / denorm}


@ApsRegisters.task.register("asr@lm")
class LmXentTask(ASRTask):
    """LM cross-entropy; BPTT hidden-state carry is handled by keeping the
    state in egs (the dp trainer threads arrays transparently)."""
    bptt_mode: bool = False

    def __call__(self, egs: Dict, training: bool = True) -> Dict:
        self._check()
        hidden = egs.get("hidden", None) if self.bptt_mode else None
        pred, _ = self.nnet(egs["src"], hidden, egs.get("len", None),
                            training=training)
        loss = ce_objf(pred, egs["tgt"], reduction=self.reduction)
        accu, den = compute_accu(pred, egs["tgt"])
        ppl = loss if self.reduction == "mean" else \
            loss * pred.shape[0] / den
        return {"accu": accu, "loss": loss, "@ppl": ppl}
