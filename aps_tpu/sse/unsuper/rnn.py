#!/usr/bin/env python
"""Unsupervised ML enhancement RNN + permutation alignment utilities.

Parity surface: /root/reference/aps/sse/unsuper/rnn.py (norm_observation:31,
permu_aligner:42, RNNEnhML:88 "sse@rnn_enh_ml"). Complex STFT uses native
real-pair packed spectra (no complex64 on device)."""

from typing import Optional, Tuple, Union

import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from aps_tpu.asr.base.encoder import PyTorchRNNEncoder
from aps_tpu.const import EPSILON
from aps_tpu.libs import ApsRegisters
from aps_tpu.sse.base import SSEBase

supported_plan = {
    257: [[20, 70, 170], [2, 90, 190], [2, 50, 150], [2, 110, 210],
          [2, 30, 130], [2, 130, 230], [2, 0, 110], [2, 150, 257]],
    513: [[20, 100, 200], [2, 120, 220], [2, 80, 180], [2, 140, 240],
          [2, 60, 160], [2, 160, 260], [2, 40, 140], [2, 180, 280],
          [2, 0, 120], [2, 200, 300], [2, 220, 320], [2, 240, 340],
          [2, 260, 360], [2, 280, 380], [2, 300, 400], [2, 320, 420],
          [2, 340, 440], [2, 360, 460], [2, 380, 480], [2, 400, 513]]
}


def norm_observation(mat: np.ndarray, axis: int = -1,
                     eps: float = EPSILON) -> np.ndarray:
    denorm = np.linalg.norm(mat, axis=axis, keepdims=True)
    return mat / np.maximum(denorm, eps)


def permu_aligner(masks: np.ndarray, transpose: bool = False) -> np.ndarray:
    """Frequency-permutation alignment for clustering-style masks.
    masks: K x T x F -> aligned K x T x F."""
    from scipy.optimize import linear_sum_assignment
    if masks.ndim != 3:
        raise RuntimeError("Expect 3D TF-masks, K x T x F or K x F x T")
    if transpose:
        masks = np.transpose(masks, (0, 2, 1))
    K, _, F = masks.shape
    feature = norm_observation(masks, axis=1)
    mapping = np.stack([np.ones(F, dtype=np.int64) * k for k in range(K)])
    if F not in supported_plan:
        raise ValueError(f"Unsupported num_bins: {F}")
    for itr, beg, end in supported_plan[F]:
        for _ in range(itr):
            centroid = np.mean(feature[..., beg:end], axis=-1)
            centroid = norm_observation(centroid, axis=-1)
            go_on = False
            for f in range(beg, end):
                score = centroid @ norm_observation(feature[..., f],
                                                    axis=-1).T
                index, permu = linear_sum_assignment(score, maximize=True)
                if np.sum(permu != index) != 0:
                    feature[..., f] = feature[permu, :, f]
                    mapping[..., f] = mapping[permu, f]
                    go_on = True
            if not go_on:
                break
    permu_masks = np.zeros_like(masks)
    for f in range(F):
        permu_masks[..., f] = masks[mapping[..., f], :, f]
    return permu_masks


@ApsRegisters.sse.register("sse@rnn_enh_ml")
class RNNEnhML(SSEBase):
    """RNN for unsupervised (CACGMM-style ML) mask estimation."""
    input_size: int = 257
    num_bins: int = 257
    input_proj: int = -1
    rnn: str = "lstm"
    num_layers: int = 3
    hidden: int = 512
    dropout: float = 0.2
    bidirectional: bool = False
    training_mode: str = "freq"

    def setup(self):
        assert self.enh_transform is not None
        self.base_rnn = PyTorchRNNEncoder(inp_features=self.input_size,
                                          out_features=self.num_bins,
                                          rnn=self.rnn,
                                          input_proj=self.input_proj,
                                          num_layers=self.num_layers,
                                          hidden=self.hidden,
                                          dropout=self.dropout,
                                          bidirectional=self.bidirectional,
                                          non_linear="sigmoid")

    def _norm_abs(self, obs: jnp.ndarray) -> jnp.ndarray:
        """Magnitude-normalized STFT, packed: N x C x F x T x 2 ->
        N x C x F x T x 2. mag_norm * exp(i*angle) == z / ||z||_C, so the
        whole operation is a real division on the packed pair (no angle /
        complex dtype needed on device)."""
        mag = jnp.sqrt(obs[..., 0]**2 + obs[..., 1]**2)
        mag_norm = jnp.linalg.norm(mag, axis=1, keepdims=True)
        return obs / jnp.maximum(mag_norm, EPSILON)[..., None]

    def __call__(self, noisy: jnp.ndarray, training: bool = False):
        """noisy: N x C x S -> (normalized stft packed N x C x F x T x 2,
        masks N x T x F)."""
        self.check_args(noisy, training=True, valid_dim=[3])
        cstft, _ = self.enh_transform.encode(noisy, None)
        feats = self.enh_transform(cstft, training=training)
        masks, _ = self.base_rnn(feats, None, training=training)
        return self._norm_abs(cstft), masks

    def infer(self, noisy: jnp.ndarray, mode: str = "freq"):
        self.check_args(noisy, training=False, valid_dim=[2])
        _, masks = self.__call__(noisy[None, ...], training=False)
        return masks[0]
