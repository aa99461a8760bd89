#!/usr/bin/env python
"""Flash (block-wise, online-softmax) multi-head attention as a Pallas TPU
kernel, with a custom VJP so the N x H x T x T score/probability matrices
never touch HBM in either direction.

This is the TPU-native replacement for the reference's dense
``th.matmul(q, k^T) -> softmax -> th.matmul(p, v)`` attention math inside
aps/asr/transformer/impl.py (ApsMultiheadAttention.dot_att): same semantics
(scaled dot-product, key-padding mask, optional causal mask, optional
additive position bias shared across the batch), but blocked over the MXU
with running-max softmax accumulation in VMEM.

Layout: q/k/v are (B, H, T, D). An optional ``bias`` (H, Tq, Tk) is
streamed block-by-block — this carries the relative-position term of
xl/rel attention, so the conformer/transformer-rel encoders can use the
flash path too (the bias is batch-independent, so its HBM footprint is
H*T*T, not B*H*T*T, and it receives a gradient).

On non-TPU backends ``flash_attention`` transparently falls back to
``mha_reference`` (identical semantics) unless ``interpret=True`` forces
the kernel through the Pallas interpreter (used by unit tests).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = -1.0e30
_POS_BIG = 1.0e30
# m/l scratch rows are replicated across the 128-lane minor dimension to
# keep the layout natively tileable
_MIN_LANES = 128


def _compiler_params(nd_parallel: int, nd_total: int):
    sem = ("parallel",) * nd_parallel + ("arbitrary",) * (nd_total -
                                                          nd_parallel)
    try:
        return pltpu.CompilerParams(dimension_semantics=sem)
    except TypeError:  # older/newer jax naming
        return None


def _bcast_minor(vec: jnp.ndarray) -> jnp.ndarray:
    """(Bq,) -> (Bq, _MIN_LANES) replicated."""
    return jnp.broadcast_to(vec[:, None], (vec.shape[0], _MIN_LANES))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(klen_ref, q_ref, k_ref, v_ref, b_ref, o_ref, lse_ref,
                acc_ref, m_ref, l_ref, *, scale, block_q, block_k, causal,
                num_kb):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    # inputs stay in their (bf16) dtype on the MXU; accumulate in f32
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if b_ref is not None:
        s = s + b_ref[0].astype(jnp.float32)

    klen = klen_ref[bh]
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                  (block_q, block_k), 1)
    mask = col < klen
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        mask = jnp.logical_and(mask, col <= row)
    s = jnp.where(mask, s, _NEG_INF)

    m_prev = m_ref[:, 0]
    m_new = jnp.maximum(m_prev, jnp.max(s, axis=1))
    p = jnp.exp(s - m_new[:, None]) * mask.astype(jnp.float32)
    alpha = jnp.exp(m_prev - m_new)
    l_new = l_ref[:, 0] * alpha + jnp.sum(p, axis=1)
    acc_ref[...] = acc_ref[...] * alpha[:, None] + jax.lax.dot(
        p.astype(v.dtype), v, preferred_element_type=jnp.float32)
    m_ref[...] = _bcast_minor(m_new)
    l_ref[...] = _bcast_minor(l_new)

    @pl.when(ki == num_kb - 1)
    def _finish():
        l = l_ref[:, 0]
        alive = l > 0
        o = acc_ref[...] / jnp.where(alive, l, 1.0)[:, None]
        o_ref[0] = jnp.where(alive[:, None], o, 0.0).astype(o_ref.dtype)
        lse_ref[0, 0] = jnp.where(alive, m_ref[:, 0] + jnp.log(l),
                                  jnp.float32(_POS_BIG))


def _fwd(q, k, v, bias, klen, *, scale, causal, block_q, block_k,
         interpret):
    BH, Tq, D = q.shape
    Tk = k.shape[1]
    nq, nk = Tq // block_q, Tk // block_k
    grid = (BH, nq, nk)
    in_specs = [
        pl.BlockSpec((1, block_q, D), lambda b, i, j, *_: (b, i, 0)),
        pl.BlockSpec((1, block_k, D), lambda b, i, j, *_: (b, j, 0)),
        pl.BlockSpec((1, block_k, D), lambda b, i, j, *_: (b, j, 0)),
    ]
    args = [q, k, v]
    H = None
    if bias is not None:
        H = bias.shape[0]
        in_specs.append(
            pl.BlockSpec((1, block_q, block_k),
                         lambda b, i, j, *_, H=H: (b % H, i, j)))
        args.append(bias)
    kernel = functools.partial(_fwd_kernel,
                               scale=scale,
                               block_q=block_q,
                               block_k=block_k,
                               causal=causal,
                               num_kb=nk)
    if bias is None:
        kernel = _wrap_nobias(kernel, 3)
    kwargs = {}
    params = _compiler_params(2, 3)
    if params is not None:
        kwargs["compiler_params"] = params
    o, lse = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=in_specs,
            out_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i, j, *_: (b, i, 0)),
                pl.BlockSpec((1, 1, block_q),
                             lambda b, i, j, *_: (b, 0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_q, D), jnp.float32),
                pltpu.VMEM((block_q, _MIN_LANES), jnp.float32),
                pltpu.VMEM((block_q, _MIN_LANES), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tq, D), q.dtype),
            jax.ShapeDtypeStruct((BH, 1, Tq), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(flops=4 * BH * Tq * Tk * D,
                                      bytes_accessed=4 *
                                      (2 * q.size + k.size + v.size),
                                      transcendentals=BH * Tq * Tk),
        **kwargs,
    )(klen, *args)
    return o, lse


def _wrap_nobias(kernel, num_tensor_in):
    """Adapt a kernel expecting a bias ref to the no-bias call layout."""

    def wrapped(klen_ref, *refs):
        ins = refs[:num_tensor_in]
        rest = refs[num_tensor_in:]
        return kernel(klen_ref, *ins, None, *rest)

    return wrapped


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(klen_ref, q_ref, k_ref, v_ref, b_ref, do_ref, lse_ref,
               delta_ref, dq_ref, dq_acc, *, scale, block_q, block_k,
               causal, num_kb):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dq_acc[...] = jnp.zeros_like(dq_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if b_ref is not None:
        s = s + b_ref[0].astype(jnp.float32)
    klen = klen_ref[bh]
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                  (block_q, block_k), 1)
    mask = col < klen
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        mask = jnp.logical_and(mask, col <= row)
    p = jnp.exp(jnp.where(mask, s, _NEG_INF) -
                lse[:, None]) * mask.astype(jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta[:, None]) * scale
    dq_acc[...] += jax.lax.dot(ds.astype(k.dtype), k,
                               preferred_element_type=jnp.float32)

    @pl.when(ki == num_kb - 1)
    def _finish():
        dq_ref[0] = dq_acc[...].astype(dq_ref.dtype)


def _dkv_kernel(klen_ref, q_ref, k_ref, v_ref, b_ref, do_ref, lse_ref,
                delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *, scale,
                block_q, block_k, causal, num_qb):
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    if b_ref is not None:
        s = s + b_ref[0].astype(jnp.float32)
    klen = klen_ref[bh]
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                  (block_q, block_k), 1)
    mask = col < klen
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        mask = jnp.logical_and(mask, col <= row)
    p = jnp.exp(jnp.where(mask, s, _NEG_INF) -
                lse[:, None]) * mask.astype(jnp.float32)
    # dv += p^T @ do ; dk += ds^T @ q
    dv_acc[...] += jax.lax.dot_general(p.astype(do.dtype), do,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta[:, None]) * scale
    dk_acc[...] += jax.lax.dot_general(ds.astype(q.dtype), q,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

    @pl.when(qi == num_qb - 1)
    def _finish():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _dbias_kernel(klen_ref, q_ref, k_ref, v_ref, b_ref, do_ref, lse_ref,
                  delta_ref, db_ref, *, scale, block_q, block_k, causal,
                  num_heads):
    h = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    b = pl.program_id(3)

    @pl.when(b == 0)
    def _init():
        db_ref[...] = jnp.zeros_like(db_ref)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32) * scale
    s = s + b_ref[0].astype(jnp.float32)
    klen = klen_ref[b * num_heads + h]
    col = ki * block_k + jax.lax.broadcasted_iota(jnp.int32,
                                                  (block_q, block_k), 1)
    mask = col < klen
    if causal:
        row = qi * block_q + jax.lax.broadcasted_iota(
            jnp.int32, (block_q, block_k), 0)
        mask = jnp.logical_and(mask, col <= row)
    p = jnp.exp(jnp.where(mask, s, _NEG_INF) -
                lse[:, None]) * mask.astype(jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    # note: NO trailing * scale here — the bias is added after scaling
    db_ref[0] += p * (dp - delta[:, None])


def _bwd(q, k, v, bias, klen, o, lse, do, *, scale, causal, block_q,
         block_k, interpret):
    BH, Tq, D = q.shape
    Tk = k.shape[1]
    nq, nk = Tq // block_q, Tk // block_k
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)[:, None]  # BH x 1 x Tq

    H = bias.shape[0] if bias is not None else None

    def specs(order):
        """order: 'qk' -> grid (BH, nq, nk); 'kq' -> grid (BH, nk, nq)."""
        if order == "qk":
            qix = lambda b, i, j, *_: (b, i, 0)
            kix = lambda b, i, j, *_: (b, j, 0)
            bix = lambda b, i, j, *_, H=H: (b % H, i, j)
            lix = lambda b, i, j, *_: (b, 0, i)
        else:
            qix = lambda b, j, i, *_: (b, i, 0)
            kix = lambda b, j, i, *_: (b, j, 0)
            bix = lambda b, j, i, *_, H=H: (b % H, i, j)
            lix = lambda b, j, i, *_: (b, 0, i)
        sp = [
            pl.BlockSpec((1, block_q, D), qix),
            pl.BlockSpec((1, block_k, D), kix),
            pl.BlockSpec((1, block_k, D), kix),
        ]
        if bias is not None:
            sp.append(pl.BlockSpec((1, block_q, block_k), bix))
        sp += [
            pl.BlockSpec((1, block_q, D), qix),
            pl.BlockSpec((1, 1, block_q), lix),
            pl.BlockSpec((1, 1, block_q), lix),
        ]
        return sp

    args = ([q, k, v, bias] if bias is not None else [q, k, v]) + \
        [do, lse, delta]
    kwargs = {}
    params = _compiler_params(2, 3)
    if params is not None:
        kwargs["compiler_params"] = params

    dq_kernel = functools.partial(_dq_kernel,
                                  scale=scale,
                                  block_q=block_q,
                                  block_k=block_k,
                                  causal=causal,
                                  num_kb=nk)
    if bias is None:
        dq_kernel = _wrap_nobias(dq_kernel, 3)
    dq = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, nq, nk),
            in_specs=specs("qk"),
            out_specs=[
                pl.BlockSpec((1, block_q, D), lambda b, i, j, *_: (b, i, 0))
            ],
            scratch_shapes=[pltpu.VMEM((block_q, D), jnp.float32)],
        ),
        out_shape=[jax.ShapeDtypeStruct((BH, Tq, D), q.dtype)],
        interpret=interpret,
        **kwargs,
    )(klen, *args)[0]

    dkv_kernel = functools.partial(_dkv_kernel,
                                   scale=scale,
                                   block_q=block_q,
                                   block_k=block_k,
                                   causal=causal,
                                   num_qb=nq)
    if bias is None:
        dkv_kernel = _wrap_nobias(dkv_kernel, 3)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, nk, nq),
            in_specs=specs("kq"),
            out_specs=[
                pl.BlockSpec((1, block_k, D), lambda b, j, i, *_: (b, j, 0)),
                pl.BlockSpec((1, block_k, D), lambda b, j, i, *_: (b, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block_k, D), jnp.float32),
                pltpu.VMEM((block_k, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, Tk, D), k.dtype),
            jax.ShapeDtypeStruct((BH, Tk, D), v.dtype),
        ],
        interpret=interpret,
        **kwargs,
    )(klen, *args)

    dbias = None
    if bias is not None:
        B = BH // H
        db_kernel = functools.partial(_dbias_kernel,
                                      scale=scale,
                                      block_q=block_q,
                                      block_k=block_k,
                                      causal=causal,
                                      num_heads=H)
        bh_ix = lambda h, i, j, b, *_: (b * H + h, i, 0)
        kx_ix = lambda h, i, j, b, *_: (b * H + h, j, 0)
        ls_ix = lambda h, i, j, b, *_: (b * H + h, 0, i)
        dbias = pl.pallas_call(
            db_kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(H, nq, nk, B),
                in_specs=[
                    pl.BlockSpec((1, block_q, D), bh_ix),
                    pl.BlockSpec((1, block_k, D), kx_ix),
                    pl.BlockSpec((1, block_k, D), kx_ix),
                    pl.BlockSpec((1, block_q, block_k),
                                 lambda h, i, j, b, *_: (h, i, j)),
                    pl.BlockSpec((1, block_q, D), bh_ix),
                    pl.BlockSpec((1, 1, block_q), ls_ix),
                    pl.BlockSpec((1, 1, block_q), ls_ix),
                ],
                out_specs=[
                    pl.BlockSpec((1, block_q, block_k),
                                 lambda h, i, j, b, *_: (h, i, j))
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((H, Tq, Tk), jnp.float32)
            ],
            interpret=interpret,
            **({
                "compiler_params": _compiler_params(3, 4)
            } if _compiler_params(3, 4) is not None else {}),
        )(klen, *args)[0].astype(bias.dtype)
    return dq, dk, dv, dbias


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def mha_reference(q: jnp.ndarray,
                  k: jnp.ndarray,
                  v: jnp.ndarray,
                  bias: Optional[jnp.ndarray] = None,
                  k_len: Optional[jnp.ndarray] = None,
                  causal: bool = False,
                  softmax_scale: Optional[float] = None) -> jnp.ndarray:
    """Dense reference with identical semantics to flash_attention.
    q/k/v: B x H x T x D, bias: H x Tq x Tk, k_len: B (int32)."""
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    scale = softmax_scale if softmax_scale is not None else D**-0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    if bias is not None:
        s = s + bias.astype(jnp.float32)[None]
    mask = jnp.ones((B, 1, Tq, Tk), dtype=bool)
    if k_len is not None:
        mask = jnp.arange(Tk)[None, None, None, :] < k_len[:, None, None,
                                                           None]
    if causal:
        mask = jnp.logical_and(
            mask,
            (jnp.arange(Tk)[None, None, None, :] <=
             jnp.arange(Tq)[None, None, :, None]))
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m) * mask.astype(jnp.float32)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhqk,bhkd->bhqd", p / jnp.maximum(l, 1e-30), v.astype(
        jnp.float32))
    alive = (l > 0)
    return jnp.where(alive, o, 0.0).astype(q.dtype)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7, 8, 9))
def _flash(q, k, v, bias, klen, scale, causal, block_q, block_k,
           interpret):
    o, _ = _fwd(q, k, v, bias, klen, scale=scale, causal=causal,
                block_q=block_q, block_k=block_k, interpret=interpret)
    return o


def _flash_fwd(q, k, v, bias, klen, scale, causal, block_q, block_k,
               interpret):
    o, lse = _fwd(q, k, v, bias, klen, scale=scale, causal=causal,
                  block_q=block_q, block_k=block_k, interpret=interpret)
    return o, (q, k, v, bias, klen, o, lse)


def _flash_bwd(scale, causal, block_q, block_k, interpret, res, do):
    q, k, v, bias, klen, o, lse = res
    dq, dk, dv, dbias = _bwd(q, k, v, bias, klen, o, lse, do, scale=scale,
                             causal=causal, block_q=block_q,
                             block_k=block_k, interpret=interpret)
    return dq, dk, dv, dbias, None


_flash.defvjp(_flash_fwd, _flash_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6, 7, 8))
def _flash_nobias(q, k, v, klen, scale, causal, block_q, block_k,
                  interpret):
    o, _ = _fwd(q, k, v, None, klen, scale=scale, causal=causal,
                block_q=block_q, block_k=block_k, interpret=interpret)
    return o


def _flash_nobias_fwd(q, k, v, klen, scale, causal, block_q, block_k,
                      interpret):
    o, lse = _fwd(q, k, v, None, klen, scale=scale, causal=causal,
                  block_q=block_q, block_k=block_k, interpret=interpret)
    return o, (q, k, v, klen, o, lse)


def _flash_nobias_bwd(scale, causal, block_q, block_k, interpret, res, do):
    q, k, v, klen, o, lse = res
    dq, dk, dv, _ = _bwd(q, k, v, None, klen, o, lse, do, scale=scale,
                         causal=causal, block_q=block_q, block_k=block_k,
                         interpret=interpret)
    return dq, dk, dv, None


_flash_nobias.defvjp(_flash_nobias_fwd, _flash_nobias_bwd)


def flash_attention(q: jnp.ndarray,
                    k: jnp.ndarray,
                    v: jnp.ndarray,
                    bias: Optional[jnp.ndarray] = None,
                    k_len: Optional[jnp.ndarray] = None,
                    causal: bool = False,
                    softmax_scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    interpret: bool = False,
                    force: bool = False) -> jnp.ndarray:
    """Blocked softmax attention; see module docstring.

    Args:
        q, k, v: B x H x Tq|Tk x D
        bias: optional H x Tq x Tk additive bias (relative-position term),
            shared over the batch; receives a gradient
        k_len: optional B int32 valid key lengths (padding mask)
        causal: mask future keys
    Returns: B x H x Tq x D
    """
    if not (force or interpret) and jax.default_backend() not in ("tpu",):
        return mha_reference(q, k, v, bias=bias, k_len=k_len, causal=causal,
                             softmax_scale=softmax_scale)
    B, H, Tq, D = q.shape
    Tk = k.shape[2]
    scale = softmax_scale if softmax_scale is not None else D**-0.5
    if block_q is None:
        # measured on v5e: 256 wins for typical speech T, 512 for long T
        block_q = 512 if Tq >= 3072 else 256
    if block_k is None:
        block_k = 512 if Tk >= 3072 else 256
    block_q = min(block_q, _round_up(Tq, 128))
    block_k = min(block_k, _round_up(Tk, 128))
    Tqp, Tkp = _round_up(Tq, block_q), _round_up(Tk, block_k)
    if k_len is None:
        k_len = jnp.full((B,), Tk, dtype=jnp.int32)
    qp = jnp.pad(q, ((0, 0), (0, 0), (0, Tqp - Tq), (0, 0))).reshape(
        B * H, Tqp, D)
    kp = jnp.pad(k, ((0, 0), (0, 0), (0, Tkp - Tk), (0, 0))).reshape(
        B * H, Tkp, D)
    vp = jnp.pad(v, ((0, 0), (0, 0), (0, Tkp - Tk), (0, 0))).reshape(
        B * H, Tkp, D)
    klen = jnp.repeat(k_len.astype(jnp.int32), H)
    bp = None
    if bias is not None:
        bp = jnp.pad(bias, ((0, 0), (0, Tqp - Tq), (0, Tkp - Tk)))
    if bp is not None:
        o = _flash(qp, kp, vp, bp, klen, scale, causal, block_q, block_k,
                   interpret)
    else:
        o = _flash_nobias(qp, kp, vp, klen, scale, causal, block_q,
                          block_k, interpret)
    return o.reshape(B, H, Tqp, D)[:, :, :Tq]
