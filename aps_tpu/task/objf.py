#!/usr/bin/env python
"""Objective-function primitives (pure jnp, all static-shaped & mask-based).

Parity surface: /root/reference/aps/task/objf.py (ce:13, ls:37, ctc:89,
sisnr:133, snr:166, dpcl:201, multiple:238, permu_invarint_objf:278,
hybrid:328). CTC uses optax.ctc_loss (XLA-fused forward-backward) instead of
torch's cudnn kernel. PIT enumerates permutations at trace time (<= S! small)
and reduces with jnp.min — one fused program, no host sync."""

from itertools import permutations
from typing import Any, Callable, List, Optional

import jax.nn
import jax.numpy as jnp
import optax

from aps_tpu.const import EPSILON, IGNORE_ID


def ce_objf(outs: jnp.ndarray,
            tgts: jnp.ndarray,
            reduction: str = "mean") -> jnp.ndarray:
    """Cross entropy with IGNORE_ID masking.
    outs: N x T x V logits, tgts: N x T -> scalar."""
    N, _, V = outs.shape
    mask = tgts != IGNORE_ID
    tgts_safe = jnp.clip(jnp.where(mask, tgts, 0), 0, V - 1)
    logp = jax.nn.log_softmax(outs, axis=-1)
    nll = -jnp.take_along_axis(logp, tgts_safe[..., None], axis=-1)[..., 0]
    loss = jnp.sum(nll * mask)
    K = jnp.sum(mask) if reduction == "mean" else N
    return loss / K


def ls_objf(outs: jnp.ndarray,
            tgts: jnp.ndarray,
            method: str = "uniform",
            reduction: str = "mean",
            lsm_factor: float = 0.1,
            label_count: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Label-smoothed KL loss. outs: N x T x V, tgts: N x T -> scalar."""
    if method not in ("uniform", "unigram"):
        raise ValueError(f"Unknown label smoothing method: {method}")
    N, _, V = outs.shape
    mask = tgts != IGNORE_ID
    tgts_safe = jnp.clip(jnp.where(mask, tgts, 0), 0, V - 1)
    if method == "uniform":
        dist = jnp.full(outs.shape, lsm_factor / (V - 1))
    else:
        if label_count.shape[-1] != V:
            raise RuntimeError("#label_count does not match #vocab_size")
        dist = jnp.broadcast_to(label_count, outs.shape)
        # zero out the target entry, renormalize to lsm_factor
        onehot = jax.nn.one_hot(tgts_safe, V)
        dist = dist * (1 - onehot)
        dist = dist * lsm_factor / jnp.sum(dist, -1, keepdims=True)
    onehot = jax.nn.one_hot(tgts_safe, V)
    dist = dist * (1 - onehot) + onehot * (1 - lsm_factor)
    logp = jax.nn.log_softmax(outs, axis=-1)
    # KL(dist || softmax(outs)) up to the constant entropy of dist
    kld = jnp.sum(dist * (jnp.log(jnp.maximum(dist, EPSILON)) - logp), -1)
    loss = jnp.sum(kld * mask)
    K = jnp.sum(mask) if reduction == "mean" else N
    return loss / K


def ctc_objf(outs: jnp.ndarray,
             tgts: jnp.ndarray,
             out_len: jnp.ndarray,
             tgt_len: jnp.ndarray,
             blank: int = 0,
             reduction: str = "mean",
             add_softmax: bool = True) -> jnp.ndarray:
    """CTC loss. outs: N x T x V logits, tgts: N x L (no blanks),
    out_len/tgt_len: N -> scalar."""
    N, T, V = outs.shape
    L = tgts.shape[1]
    logit_paddings = (jnp.arange(T)[None, :] >= out_len[:, None]).astype(
        jnp.float32)
    label_paddings = (jnp.arange(L)[None, :] >= tgt_len[:, None]).astype(
        jnp.float32)
    tgts_safe = jnp.where(tgts == IGNORE_ID, 0, tgts)
    # optax applies log_softmax internally
    per_utt = optax.ctc_loss(outs, logit_paddings, tgts_safe, label_paddings,
                             blank_id=blank)
    loss = jnp.sum(per_utt)
    return loss / (jnp.sum(tgt_len) if reduction == "mean" else N)


def _l2norm(mat, keepdim=False):
    return jnp.sqrt(jnp.sum(mat**2, axis=-1, keepdims=keepdim))


def sisnr_objf(x: jnp.ndarray,
               s: jnp.ndarray,
               eps: float = EPSILON,
               zero_mean: bool = True,
               non_nagetive: bool = False) -> jnp.ndarray:
    """Scale-invariant SNR in dB. x (estimate), s (reference): N x S -> N."""
    if x.shape != s.shape:
        raise RuntimeError(f"Shape mismatch in si-snr: {x.shape} vs {s.shape}")
    if zero_mean:
        x = x - jnp.mean(x, axis=-1, keepdims=True)
        s = s - jnp.mean(s, axis=-1, keepdims=True)
    t = jnp.sum(x * s, axis=-1, keepdims=True) * s / (
        _l2norm(s, keepdim=True)**2 + eps)
    snr_linear = _l2norm(t) / (_l2norm(x - t) + eps)
    if non_nagetive:
        return 10 * jnp.log10(1 + snr_linear**2)
    return 20 * jnp.log10(eps + snr_linear)


def snr_objf(x: jnp.ndarray,
             s: jnp.ndarray,
             eps: float = EPSILON,
             snr_max: float = -1,
             non_nagetive: bool = False) -> jnp.ndarray:
    """Plain SNR in dB (optionally thresholded). N x S -> N."""
    if x.shape != s.shape:
        raise RuntimeError(f"Shape mismatch in snr: {x.shape} vs {s.shape}")
    if snr_max > 0:
        threshold = 10**(-snr_max / 10)
        s_norm = _l2norm(s)**2
        x_s_norm = _l2norm(x - s)**2
        return 10 * jnp.log10(s_norm + eps) - 10 * jnp.log10(
            threshold * s_norm + x_s_norm + eps)
    snr_linear = _l2norm(s) / (_l2norm(x - s) + eps)
    if non_nagetive:
        return 10 * jnp.log10(1 + snr_linear**2)
    return 20 * jnp.log10(eps + snr_linear)


def dpcl_objf(net_embed: jnp.ndarray,
              classes: jnp.ndarray,
              weights: jnp.ndarray,
              num_spks: int = 2) -> jnp.ndarray:
    """Deep clustering loss. net_embed: N x FT x D,
    classes/weights: N x F x T -> N (per-frame loss)."""
    N, F, T = classes.shape
    ref_embed = jax.nn.one_hot(classes.reshape(N, F * T), num_spks)

    def affinity(v, y):
        z = jnp.einsum("nid,nie->nde", v, y)
        return jnp.sum(z**2, axis=(1, 2))

    w = jnp.sqrt(weights.reshape(N, F * T, 1))
    out = net_embed * w
    ref = ref_embed * w
    loss = affinity(out, out) + affinity(ref, ref) - 2 * affinity(out, ref)
    return loss / T


def multiple_objf(inp: List[Any],
                  ref: List[Any],
                  objf: Callable,
                  weight: Optional[List[float]] = None,
                  transform: Optional[Callable] = None,
                  batchmean: bool = False) -> jnp.ndarray:
    """Weighted sum of per-pair losses."""
    if len(inp) != len(ref):
        raise ValueError(f"#inp vs #ref: {len(inp)} vs {len(ref)}")
    num_tasks = len(inp)
    if weight is None:
        weight = [1 / num_tasks] * num_tasks
    if len(weight) != len(inp):
        raise RuntimeError(f"Missing weight ({len(weight)}) for {num_tasks}")
    if transform:
        inp = [transform(i) for i in inp]
        ref = [transform(r) for r in ref]
    loss = sum(s * objf(o, r) for s, o, r in zip(weight, inp, ref))
    return jnp.mean(loss) if batchmean else loss


def permu_invarint_objf(inp: List[Any],
                        ref: List[Any],
                        objf: Callable,
                        transform: Optional[Callable] = None,
                        batchmean: bool = False,
                        return_permutation: bool = False):
    """Permutation-invariant loss: min over speaker permutations (computed
    as one stacked P x N tensor, reduced on-device)."""
    num_spks = len(inp)
    if num_spks != len(ref):
        raise ValueError(f"#inp vs #ref: {num_spks} vs {len(ref)}")
    if transform:
        inp = [transform(i) for i in inp]
        ref = [transform(r) for r in ref]
    if num_spks == 1:
        return objf(inp[0], ref[0])

    def permu_objf(permu):
        return sum(objf(inp[s], ref[t]) for s, t in enumerate(permu)) / \
            len(permu)

    loss_mat = jnp.stack(
        [permu_objf(p) for p in permutations(range(num_spks))])
    loss = jnp.min(loss_mat, axis=0)
    index = jnp.argmin(loss_mat, axis=0)
    if batchmean:
        loss = jnp.mean(loss)
    if return_permutation:
        return loss, index
    return loss


# correctly-spelled alias
permutation_invariant_objf = permu_invarint_objf


def hybrid_permu_objf(out: List[Any],
                      ref: List[Any],
                      objf: Callable,
                      transform: Optional[Callable] = None,
                      weight: Optional[List[float]] = None,
                      permute: bool = True,
                      permu_num_spks: int = 2) -> jnp.ndarray:
    """PIT over the first permu_num_spks branches + plain weighted loss on
    the residual branches (e.g. a noise output)."""
    num_branch = len(out)
    if num_branch != len(ref):
        raise RuntimeError(f"{len(ref)} references vs {num_branch} outputs")
    if permute:
        loss = permu_invarint_objf(out[:permu_num_spks],
                                   ref[:permu_num_spks],
                                   objf,
                                   transform=transform)
        if num_branch > permu_num_spks:
            num_weight = num_branch - (permu_num_spks - 1)
            if weight is None:
                weight = [1 / num_weight] * num_weight
            other = multiple_objf(out[permu_num_spks:], ref[permu_num_spks:],
                                  objf, weight=weight[1:])
            loss = weight[0] * loss + other
    else:
        loss = multiple_objf(out, ref, objf, weight=weight,
                             transform=transform)
    return loss


class DpclObjfComputer(object):
    """DPCL loss from embeddings + per-speaker magnitudes."""

    def __call__(self,
                 embedding: jnp.ndarray,
                 magnitude_ref: jnp.ndarray,
                 magnitude_mix: jnp.ndarray,
                 mean: bool = True) -> jnp.ndarray:
        """embedding: N x FT x D, magnitude_ref: N x F x T x S,
        magnitude_mix: N x F x T."""
        num_spks = magnitude_ref.shape[-1]
        classes = jnp.argmax(magnitude_ref, -1)
        weights = magnitude_mix / jnp.sum(magnitude_mix, (-1, -2),
                                          keepdims=True)
        loss = dpcl_objf(embedding, classes, weights, num_spks=num_spks)
        return jnp.mean(loss) if mean else loss
