#!/usr/bin/env python
"""SSE metrics: SiSNR / SNR (numpy) + PESQ/STOI/SDR (optional deps, gated).

Parity surface: /root/reference/aps/metric/sse.py (aps_sisnr:16, aps_pesq:43,
aps_stoi:50, permute_sse_metric:95)."""

from itertools import permutations
from typing import Callable, Optional, Tuple, Union

import numpy as np


def aps_sisnr(s: np.ndarray,
              x: np.ndarray,
              eps: float = 1e-8,
              remove_dc: bool = True,
              fs: Optional[int] = None) -> float:
    """SiSNR(reference s, estimate x) in dB."""

    def l2(v):
        return np.linalg.norm(v, 2)

    if remove_dc:
        x = x - np.mean(x)
        s = s - np.mean(s)
    t = np.inner(x, s) * s / (l2(s)**2 + eps)
    n = x - t
    return float(20 * np.log10(l2(t) / (l2(n) + eps) + eps))


def aps_snr(s: np.ndarray, x: np.ndarray, eps: float = 1e-8,
            fs: Optional[int] = None) -> float:
    return float(20 * np.log10(
        np.linalg.norm(s) / (np.linalg.norm(x - s) + eps) + eps))


def aps_pesq(ref: np.ndarray, est: np.ndarray, fs: int = 16000) -> float:
    try:
        from pypesq import pesq
    except ImportError as e:
        raise ImportError("PESQ requires the 'pypesq' package") from e
    return pesq(ref, est, fs=fs)


def aps_stoi(ref: np.ndarray, est: np.ndarray, fs: int = 16000) -> float:
    try:
        from pystoi import stoi
    except ImportError as e:
        raise ImportError("STOI requires the 'pystoi' package") from e
    return stoi(ref, est, fs_sig=fs)


def _permute_eval(eval_func: Callable, ref, est,
                  compute_permutation: bool = False,
                  fs: Optional[int] = None):

    def eval_sum(ref, est):
        return sum(eval_func(s, x, fs=fs) for s, x in zip(ref, est))

    if est.ndim == 1:
        return eval_func(ref, est, fs=fs)
    N = est.shape[0]
    if N != ref.shape[0]:
        raise RuntimeError("est/ref speaker-count mismatch")
    metric, perm = [], []
    for order in permutations(range(N)):
        est_permu = np.stack([est[n] for n in order])
        metric.append(eval_sum(ref, est_permu) / N)
        perm.append(order)
    if not compute_permutation:
        return max(metric)
    max_idx = int(np.argmax(metric))
    return max(metric), perm[max_idx]


def permute_sse_metric(name: str, ref, est,
                       compute_permutation: bool = False,
                       fs: Optional[int] = None):
    """name in {sisnr, snr, pesq, stoi, sdr}."""
    funcs = {"sisnr": aps_sisnr, "snr": aps_snr, "pesq": aps_pesq,
             "stoi": aps_stoi}
    if name in funcs:
        return _permute_eval(funcs[name], ref, est,
                             compute_permutation=compute_permutation, fs=fs)
    if name == "sdr":
        try:
            from museval.metrics import bss_eval_images
        except ImportError as e:
            raise ImportError("SDR requires the 'museval' package") from e
        if ref.ndim == 1:
            ref, est = ref[None, :], est[None, :]
        sdr, *_ , popt = bss_eval_images(ref[..., None], est[..., None])
        score = float(np.mean(sdr))
        return (score, popt) if compute_permutation else score
    raise ValueError(f"Unknown metric: {name}")
