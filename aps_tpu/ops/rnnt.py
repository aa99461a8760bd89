#!/usr/bin/env python
"""RNN-Transducer loss in pure JAX.

Replaces the reference's external torchaudio/warp_rnnt dependency
(/root/reference/aps/task/asr.py:259 TransducerTask). Forward-variable
recursion runs as one lax.scan over T; the intra-row label recurrence
    alpha[t, u] = logaddexp(alpha[t-1, u] + blank, alpha[t, u-1] + label)
is closed-form via a log-cumsum-exp (associative scan over U), so each scan
step is fully parallel over (N, U) — no T*U sequential chain. Gradients come
from autodiff through the scan."""

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def _logcumsumexp(x: jnp.ndarray, axis: int = -1) -> jnp.ndarray:
    """Numerically-stable running logsumexp along axis."""
    return jax.lax.associative_scan(jnp.logaddexp, x, axis=axis)


def rnnt_loss(logits: jnp.ndarray,
              labels: jnp.ndarray,
              logit_lens: jnp.ndarray,
              label_lens: jnp.ndarray,
              blank: int = 0,
              reduction: str = "sum") -> jnp.ndarray:
    """Transducer loss.
    Args:
      logits: N x T x U+1 x V joint network outputs (pre-softmax)
      labels: N x U token ids (no blanks)
      logit_lens: N encoder lengths, label_lens: N label lengths
    Return: per-utterance negative log-likelihood (N) or reduced scalar."""
    N, T, U1, V = logits.shape
    U = U1 - 1
    logp = jax.nn.log_softmax(logits, axis=-1)
    # lp_blank: N x T x U+1 ; lp_label[n,t,u] = logp[n,t,u,labels[n,u]]
    lp_blank = logp[..., blank]
    labels_safe = jnp.clip(labels, 0, V - 1)
    lp_label = jnp.take_along_axis(
        logp[..., :U, :], labels_safe[:, None, :, None], axis=-1)[..., 0]
    # pad label transitions at u = U (cannot emit past the last label)
    lp_label = jnp.pad(lp_label, ((0, 0), (0, 0), (0, 1)),
                       constant_values=NEG_INF)
    # mask invalid u > label_len transitions
    u_idx = jnp.arange(U1)[None, :]
    label_valid = u_idx < label_lens[:, None]  # N x U+1
    lp_label = jnp.where(label_valid[:, None, :], lp_label, NEG_INF)

    # cumulative label scores per frame: C[n,t,u] = sum_{j<u} lp_label[n,t,j]
    shifted = jnp.concatenate(
        [jnp.zeros((N, T, 1)), lp_label[..., :-1]], axis=-1)
    C = jnp.cumsum(shifted, axis=-1)  # N x T x U+1

    # alpha[0, u] = sum_{j<u} lp_label[0, j]
    alpha0 = C[:, 0]

    def step(alpha_prev, inputs):
        lp_blank_t_1, C_t = inputs  # N x U+1 each
        # A[u] = alpha[t-1, u] + blank(t-1, u)
        A = alpha_prev + lp_blank_t_1
        # alpha[t, u] = logsumexp_{k<=u} (A[k] - C_t[k]) + C_t[u]
        alpha = _logcumsumexp(A - C_t, axis=-1) + C_t
        return alpha, None

    # scan over frames t = 1..T-1, keeping the trajectory so each utterance
    # can read alpha at its own last frame
    xs = (jnp.moveaxis(lp_blank[:, :-1], 1, 0), jnp.moveaxis(C[:, 1:], 1, 0))

    def step_keep(alpha_prev, inputs):
        alpha, _ = step(alpha_prev, inputs)
        return alpha, alpha

    _, alphas = jax.lax.scan(step_keep, alpha0, xs)
    t_last = jnp.clip(logit_lens - 1, 0, T - 1)
    u_last = jnp.clip(label_lens, 0, U)
    # T x N x U+1 with alpha0 prepended
    alphas = jnp.concatenate([alpha0[None], alphas], axis=0)
    alpha_last = alphas[t_last, jnp.arange(N), u_last]
    final_blank = lp_blank[jnp.arange(N), t_last, u_last]
    nll = -(alpha_last + final_blank)
    if reduction == "sum":
        return jnp.sum(nll)
    if reduction == "mean":
        return jnp.mean(nll)
    return nll
