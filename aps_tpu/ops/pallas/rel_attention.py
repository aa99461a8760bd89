#!/usr/bin/env python
"""Flash attention with RELATIVE position scores computed in-kernel.

The abs-pose kernel (aps_tpu/ops/pallas/attention.py) takes an optional
precomputed (H, Tq, Tk) additive bias — fine for biases that are
batch-independent. Shaw-style rel attention and Transformer-XL attention
are NOT: their position term is ``digit_shift(q_pos @ pose^T)`` — a
function of q — so precomputing it would materialize a B x H x T x 2T-1
tensor in HBM, which is exactly the traffic flash attention exists to
avoid. This kernel instead keeps the (2T', D) position table VMEM-
resident per (batch*head) grid row, slices the 2-block band each
(q-block i, k-block j) tile needs, runs one extra MXU matmul
``q_pos @ band^T`` and realigns the result with log2(b) static lane
rotates (Mosaic has no per-row dynamic shift; the pad+reshape trick the
XLA path uses is an 'unsupported shape cast' in-kernel).

Semantics (parity with the dense paths in aps_tpu/asr/transformer/
impl.py::RelMultiheadAttention.dot_att / XlMultiheadAttention.dot_att,
reference aps/asr/transformer/impl.py:225-298):

    score[b,h,l,s] = (q_c[b,h,l] . k[b,h,s]
                      + q_p[b,h,l] . pose[hp, s - l + T - 1]) * scale

with hp = 0 (Shaw: one shared table) or hp = h (XL: per-head projected
sinusoids). Callers fold the XL rel_u/rel_v biases into q_c/q_p before
the call (q_c = q + rel_u, q_p = q + rel_v). Gradients flow to q_c, q_p,
k, v AND the pose table (training path). Self-attention only (Tq == Tk).
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from aps_tpu.ops.pallas.attention import (_NEG_INF, _POS_BIG, _MIN_LANES,
                                          _bcast_minor, _compiler_params,
                                          _round_up)

__all__ = ["flash_attention_rel", "rel_mha_reference"]


def _rel_shift(g: jnp.ndarray) -> jnp.ndarray:
    """(b, 2b) -> (b, 2b): rotate row r LEFT by (b - 1 - r) lanes, so
    out[r, c] = g[r, c - r + b - 1] for c < b (the digit shift). The
    per-row rotate decomposes into log2(b) static whole-tile rotates +
    masked selects — static rolls lower to single tpu.rotate ops."""
    b = g.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
    shift = b - 1 - row
    bit = 1
    while bit < b:
        g = jnp.where((shift & bit) != 0, jnp.roll(g, -bit, axis=1), g)
        bit *= 2
    return g


def _rel_unshift(ds: jnp.ndarray) -> jnp.ndarray:
    """(b, b) -> (b, 2b): the transpose scatter of _rel_shift,
    out[r, w] = ds[r, w - b + 1 + r] (zero outside [0, b)). Rows rotate
    RIGHT by (b - 1 - r); the wrap-around lands on the zero padding."""
    b = ds.shape[0]
    x = jnp.pad(ds, ((0, 0), (0, b)))
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    shift = b - 1 - row
    bit = 1
    while bit < b:
        x = jnp.where((shift & bit) != 0, jnp.roll(x, bit, axis=1), x)
        bit *= 2
    return x


def _band_base(qi, ki, block: int, T: int):
    """First pose-table row tile (qi, ki) needs: rows [base, base + 2b)
    cover offsets s - l + T - 1 for l in q-block qi, s in k-block ki."""
    return (ki - qi) * block + T - block


def _scores(q_c, q_p, k, pose_ref, qi, ki, *, block, T, scale):
    """(content + rel) * scale for one tile; f32 (b, b)."""
    s = jax.lax.dot_general(q_c, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    base = _band_base(qi, ki, block, T)
    band = pose_ref[0, pl.ds(base, 2 * block), :]
    g = jax.lax.dot_general(q_p, band, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return (s + _rel_shift(g)[:, :block]) * scale


def _tile_mask(klen, qi, ki, *, block, causal):
    col = ki * block + jax.lax.broadcasted_iota(jnp.int32, (block, block), 1)
    mask = col < klen
    if causal:
        row = qi * block + jax.lax.broadcasted_iota(jnp.int32,
                                                    (block, block), 0)
        mask = jnp.logical_and(mask, col <= row)
    return mask


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def _fwd_kernel(klen_ref, qc_ref, qp_ref, k_ref, v_ref, pose_ref, o_ref,
                lse_ref, acc_ref, m_ref, l_ref, *, scale, block, T, causal,
                num_kb):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        acc_ref[...] = jnp.zeros_like(acc_ref)
        m_ref[...] = jnp.full_like(m_ref, _NEG_INF)
        l_ref[...] = jnp.zeros_like(l_ref)

    v = v_ref[0]
    s = _scores(qc_ref[0], qp_ref[0], k_ref[0], pose_ref, qi, ki,
                block=block, T=T, scale=scale)
    mask = _tile_mask(klen_ref[bh], qi, ki, block=block, causal=causal)
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


def _fwd(q_c, q_p, k, v, pose, klen, *, scale, causal, block, interpret):
    BH, T, D = q_c.shape
    Hp, P2, _ = pose.shape
    n = T // block
    grid = (BH, n, n)
    qix = lambda b, i, j, *_: (b, i, 0)
    kix = lambda b, i, j, *_: (b, j, 0)
    pix = lambda b, i, j, *_, Hp=Hp: (b % Hp, 0, 0)
    in_specs = [
        pl.BlockSpec((1, block, D), qix),
        pl.BlockSpec((1, block, D), qix),
        pl.BlockSpec((1, block, D), kix),
        pl.BlockSpec((1, block, D), kix),
        pl.BlockSpec((1, P2, D), pix),
    ]
    kernel = functools.partial(_fwd_kernel, scale=scale, block=block, T=T,
                               causal=causal, num_kb=n)
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
                pl.BlockSpec((1, block, D), lambda b, i, j, *_: (b, i, 0)),
                pl.BlockSpec((1, 1, block), lambda b, i, j, *_: (b, 0, i)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block, D), jnp.float32),
                pltpu.VMEM((block, _MIN_LANES), jnp.float32),
                pltpu.VMEM((block, _MIN_LANES), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, D), q_c.dtype),
            jax.ShapeDtypeStruct((BH, 1, T), jnp.float32),
        ],
        interpret=interpret,
        cost_estimate=pl.CostEstimate(
            flops=6 * BH * T * T * D,
            bytes_accessed=4 * (3 * q_c.size + k.size + v.size),
            transcendentals=BH * T * T),
        **kwargs,
    )(klen, q_c, q_p, k, v, pose)
    return o, lse


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------


def _dq_kernel(klen_ref, qc_ref, qp_ref, k_ref, v_ref, pose_ref, do_ref,
               lse_ref, delta_ref, dqc_ref, dqp_ref, dqc_acc, dqp_acc, *,
               scale, block, T, causal, num_kb):
    bh = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)

    @pl.when(ki == 0)
    def _init():
        dqc_acc[...] = jnp.zeros_like(dqc_acc)
        dqp_acc[...] = jnp.zeros_like(dqp_acc)

    k = k_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]

    s = _scores(qc_ref[0], qp_ref[0], k, pose_ref, qi, ki, block=block,
                T=T, scale=scale)
    mask = _tile_mask(klen_ref[bh], qi, ki, block=block, causal=causal)
    p = jnp.exp(jnp.where(mask, s, _NEG_INF) -
                lse[:, None]) * mask.astype(jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta[:, None]) * scale
    dqc_acc[...] += jax.lax.dot(ds.astype(k.dtype), k,
                                preferred_element_type=jnp.float32)
    base = _band_base(qi, ki, block, T)
    band = pose_ref[0, pl.ds(base, 2 * block), :]
    dg = _rel_unshift(ds)
    dqp_acc[...] += jax.lax.dot(dg.astype(band.dtype), band,
                                preferred_element_type=jnp.float32)

    @pl.when(ki == num_kb - 1)
    def _finish():
        dqc_ref[0] = dqc_acc[...].astype(dqc_ref.dtype)
        dqp_ref[0] = dqp_acc[...].astype(dqp_ref.dtype)


def _dkv_kernel(klen_ref, qc_ref, qp_ref, k_ref, v_ref, pose_ref, do_ref,
                lse_ref, delta_ref, dk_ref, dv_ref, dk_acc, dv_acc, *,
                scale, block, T, causal, num_qb):
    bh = pl.program_id(0)
    ki = pl.program_id(1)
    qi = pl.program_id(2)

    @pl.when(qi == 0)
    def _init():
        dk_acc[...] = jnp.zeros_like(dk_acc)
        dv_acc[...] = jnp.zeros_like(dv_acc)

    q_c = qc_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]

    s = _scores(q_c, qp_ref[0], k_ref[0], pose_ref, qi, ki, block=block,
                T=T, scale=scale)
    mask = _tile_mask(klen_ref[bh], qi, ki, block=block, causal=causal)
    p = jnp.exp(jnp.where(mask, s, _NEG_INF) -
                lse[:, None]) * mask.astype(jnp.float32)
    dv_acc[...] += jax.lax.dot_general(p.astype(do.dtype), do,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta[:, None]) * scale
    dk_acc[...] += jax.lax.dot_general(ds.astype(q_c.dtype), q_c,
                                       (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)

    @pl.when(qi == num_qb - 1)
    def _finish():
        dk_ref[0] = dk_acc[...].astype(dk_ref.dtype)
        dv_ref[0] = dv_acc[...].astype(dv_ref.dtype)


def _dpose_kernel(klen_ref, qc_ref, qp_ref, k_ref, v_ref, pose_ref, do_ref,
                  lse_ref, delta_ref, dpose_ref, *, scale, block, T,
                  causal, num_heads, per_head):
    h = pl.program_id(0)
    qi = pl.program_id(1)
    ki = pl.program_id(2)
    g = pl.program_id(3)
    bh = g * num_heads + h if per_head else g

    @pl.when(jnp.logical_and(qi == 0, jnp.logical_and(ki == 0, g == 0)))
    def _init():
        dpose_ref[...] = jnp.zeros_like(dpose_ref)

    q_p = qp_ref[0]
    v = v_ref[0]
    do = do_ref[0]
    lse = lse_ref[0, 0]
    delta = delta_ref[0, 0]

    s = _scores(qc_ref[0], q_p, k_ref[0], pose_ref, qi, ki, block=block,
                T=T, scale=scale)
    mask = _tile_mask(klen_ref[bh], qi, ki, block=block, causal=causal)
    p = jnp.exp(jnp.where(mask, s, _NEG_INF) -
                lse[:, None]) * mask.astype(jnp.float32)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = p * (dp - delta[:, None]) * scale
    dg = _rel_unshift(ds)
    dband = jax.lax.dot_general(dg, q_p.astype(jnp.float32),
                                (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
    base = _band_base(qi, ki, block, T)
    rows = pl.ds(base, 2 * block)
    dpose_ref[0, rows, :] = dpose_ref[0, rows, :] + dband


def _bwd(q_c, q_p, k, v, pose, klen, o, lse, do, *, scale, causal, block,
         interpret):
    BH, T, D = q_c.shape
    Hp, P2, _ = pose.shape
    n = T // block
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)[:, None]  # BH x 1 x T

    def specs(order):
        if order == "qk":
            qix = lambda b, i, j, *_: (b, i, 0)
            kix = lambda b, i, j, *_: (b, j, 0)
            lix = lambda b, i, j, *_: (b, 0, i)
        else:
            qix = lambda b, j, i, *_: (b, i, 0)
            kix = lambda b, j, i, *_: (b, j, 0)
            lix = lambda b, j, i, *_: (b, 0, i)
        pix = lambda b, *_, Hp=Hp: (b % Hp, 0, 0)
        return [
            pl.BlockSpec((1, block, D), qix),
            pl.BlockSpec((1, block, D), qix),
            pl.BlockSpec((1, block, D), kix),
            pl.BlockSpec((1, block, D), kix),
            pl.BlockSpec((1, P2, D), pix),
            pl.BlockSpec((1, block, D), qix),
            pl.BlockSpec((1, 1, block), lix),
            pl.BlockSpec((1, 1, block), lix),
        ]

    args = [q_c, q_p, k, v, pose, do, lse, delta]
    kwargs = {}
    params = _compiler_params(2, 3)
    if params is not None:
        kwargs["compiler_params"] = params

    dq_kernel = functools.partial(_dq_kernel, scale=scale, block=block,
                                  T=T, causal=causal, num_kb=n)
    dqc, dqp = pl.pallas_call(
        dq_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, n, n),
            in_specs=specs("qk"),
            out_specs=[
                pl.BlockSpec((1, block, D), lambda b, i, j, *_: (b, i, 0)),
                pl.BlockSpec((1, block, D), lambda b, i, j, *_: (b, i, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block, D), jnp.float32),
                pltpu.VMEM((block, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, D), q_c.dtype),
            jax.ShapeDtypeStruct((BH, T, D), q_p.dtype),
        ],
        interpret=interpret,
        **kwargs,
    )(klen, *args)

    dkv_kernel = functools.partial(_dkv_kernel, scale=scale, block=block,
                                   T=T, causal=causal, num_qb=n)
    dk, dv = pl.pallas_call(
        dkv_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(BH, n, n),
            in_specs=specs("kq"),
            out_specs=[
                pl.BlockSpec((1, block, D), lambda b, j, i, *_: (b, j, 0)),
                pl.BlockSpec((1, block, D), lambda b, j, i, *_: (b, j, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((block, D), jnp.float32),
                pltpu.VMEM((block, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((BH, T, D), k.dtype),
            jax.ShapeDtypeStruct((BH, T, D), v.dtype),
        ],
        interpret=interpret,
        **kwargs,
    )(klen, *args)

    # dpose: the table is revisited by every (qi, ki, batch) step, so the
    # whole (1, 2T', D) f32 block stays VMEM-resident per h (constant
    # index_map) and each step accumulates its 2-block band
    per_head = Hp > 1
    H = Hp if per_head else 1
    G = BH // H
    bhix = (lambda h, i, j, g, *_: (g * H + h, i, 0)) if per_head else \
        (lambda h, i, j, g, *_: (g, i, 0))
    bkix = (lambda h, i, j, g, *_: (g * H + h, j, 0)) if per_head else \
        (lambda h, i, j, g, *_: (g, j, 0))
    blix = (lambda h, i, j, g, *_: (g * H + h, 0, i)) if per_head else \
        (lambda h, i, j, g, *_: (g, 0, i))
    dpose_kernel = functools.partial(_dpose_kernel, scale=scale,
                                     block=block, T=T, causal=causal,
                                     num_heads=H, per_head=per_head)
    dpose = pl.pallas_call(
        dpose_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Hp, n, n, G),
            in_specs=[
                pl.BlockSpec((1, block, D), bhix),
                pl.BlockSpec((1, block, D), bhix),
                pl.BlockSpec((1, block, D), bkix),
                pl.BlockSpec((1, block, D), bkix),
                pl.BlockSpec((1, P2, D), lambda h, i, j, g, *_: (h, 0, 0)),
                pl.BlockSpec((1, block, D), bhix),
                pl.BlockSpec((1, 1, block), blix),
                pl.BlockSpec((1, 1, block), blix),
            ],
            out_specs=[
                pl.BlockSpec((1, P2, D), lambda h, i, j, g, *_: (h, 0, 0)),
            ],
        ),
        out_shape=[jax.ShapeDtypeStruct((Hp, P2, D), jnp.float32)],
        interpret=interpret,
        **({"compiler_params": _compiler_params(1, 4)}
           if _compiler_params(1, 4) is not None else {}),
    )(klen, *args)[0].astype(pose.dtype)
    return dqc, dqp, dk, dv, dpose


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------


def rel_mha_reference(q_c: jnp.ndarray,
                      q_p: jnp.ndarray,
                      k: jnp.ndarray,
                      v: jnp.ndarray,
                      pose: jnp.ndarray,
                      k_len: Optional[jnp.ndarray] = None,
                      causal: bool = False,
                      softmax_scale: Optional[float] = None) -> jnp.ndarray:
    """Dense reference with identical semantics to flash_attention_rel.
    q_c/q_p/k/v: B x H x T x D, pose: Hp x 2T-1 x D (Hp in {1, H}),
    k_len: B (int32)."""
    from aps_tpu.asr.transformer.utils import digit_shift
    B, H, T, D = q_c.shape
    scale = softmax_scale if softmax_scale is not None else D**-0.5
    s = jnp.einsum("bhld,bhsd->bhls", q_c.astype(jnp.float32),
                   k.astype(jnp.float32))
    g = jnp.einsum("bhld,hpd->bhlp", q_p.astype(jnp.float32),
                   jnp.broadcast_to(pose, (H,) + pose.shape[1:]).astype(
                       jnp.float32))
    s = (s + digit_shift(g)) * scale
    mask = jnp.ones((B, 1, T, T), dtype=bool)
    if k_len is not None:
        mask = jnp.arange(T)[None, None, None, :] < k_len[:, None, None,
                                                          None]
    if causal:
        mask = jnp.logical_and(
            mask,
            (jnp.arange(T)[None, None, None, :] <=
             jnp.arange(T)[None, None, :, None]))
    s = jnp.where(mask, s, _NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m) * mask.astype(jnp.float32)
    l = jnp.sum(p, axis=-1, keepdims=True)
    o = jnp.einsum("bhls,bhsd->bhld", p / jnp.maximum(l, 1e-30),
                   v.astype(jnp.float32))
    return jnp.where(l > 0, o, 0.0).astype(q_c.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8, 9))
def _flash_rel(q_c, q_p, k, v, pose, klen, scale, causal, block, interpret):
    o, _ = _fwd(q_c, q_p, k, v, pose, klen, scale=scale, causal=causal,
                block=block, interpret=interpret)
    return o


def _flash_rel_fwd(q_c, q_p, k, v, pose, klen, scale, causal, block,
                   interpret):
    o, lse = _fwd(q_c, q_p, k, v, pose, klen, scale=scale, causal=causal,
                  block=block, interpret=interpret)
    return o, (q_c, q_p, k, v, pose, klen, o, lse)


def _flash_rel_bwd(scale, causal, block, interpret, res, do):
    q_c, q_p, k, v, pose, klen, o, lse = res
    dqc, dqp, dk, dv, dpose = _bwd(q_c, q_p, k, v, pose, klen, o, lse, do,
                                   scale=scale, causal=causal, block=block,
                                   interpret=interpret)
    return dqc, dqp, dk, dv, dpose, None


_flash_rel.defvjp(_flash_rel_fwd, _flash_rel_bwd)


def flash_attention_rel(q_c: jnp.ndarray,
                        q_p: jnp.ndarray,
                        k: jnp.ndarray,
                        v: jnp.ndarray,
                        pose: jnp.ndarray,
                        k_len: Optional[jnp.ndarray] = None,
                        causal: bool = False,
                        softmax_scale: Optional[float] = None,
                        block: Optional[int] = None,
                        interpret: bool = False,
                        force: bool = False) -> jnp.ndarray:
    """Blocked softmax attention with in-kernel relative-position scores.

    Args:
        q_c: B x H x T x D content query (XL: q + rel_u)
        q_p: B x H x T x D position query (XL: q + rel_v; Shaw: q)
        k, v: B x H x T x D (self-attention: Tq == Tk == T)
        pose: Hp x (2T-1) x D relative-position table, row p holding the
            embedding for offset s - l = p - (T-1); Hp is 1 (Shaw,
            shared) or H (XL, per head projected). Receives a gradient.
        k_len: optional B int32 valid key lengths (suffix padding)
        causal: mask future keys
    Returns: B x H x T x D
    """
    if not (force or interpret) and jax.default_backend() not in ("tpu",):
        return rel_mha_reference(q_c, q_p, k, v, pose, k_len=k_len,
                                 causal=causal, softmax_scale=softmax_scale)
    B, H, T, D = q_c.shape
    if k.shape[2] != T:
        raise ValueError("flash_attention_rel is self-attention only "
                         f"(Tq {T} != Tk {k.shape[2]})")
    Hp = pose.shape[0]
    if pose.shape[1] != 2 * T - 1:
        raise ValueError(f"pose table must be (Hp, 2T-1, D), got "
                         f"{pose.shape} for T={T}")
    scale = softmax_scale if softmax_scale is not None else D**-0.5
    if block is None:
        block = 512 if T >= 3072 else 256
    block = min(block, _round_up(T, 128))
    Tp = _round_up(T, block)
    if k_len is None:
        k_len = jnp.full((B,), T, dtype=jnp.int32)
    pad3 = ((0, 0), (0, 0), (0, Tp - T), (0, 0))
    qcp = jnp.pad(q_c, pad3).reshape(B * H, Tp, D)
    qpp = jnp.pad(q_p, pad3).reshape(B * H, Tp, D)
    kp = jnp.pad(k, pad3).reshape(B * H, Tp, D)
    vp = jnp.pad(v, pad3).reshape(B * H, Tp, D)
    klen = jnp.repeat(k_len.astype(jnp.int32), H)
    # re-center the table on the padded length: row p' of the padded
    # table holds offset s - l = p' - (Tp - 1); one extra zero row keeps
    # the last tile's static 2b-row band read in bounds
    posep = jnp.pad(pose, ((0, 0), (Tp - T, Tp - T + 1), (0, 0)))
    o = _flash_rel(qcp, qpp, kp, vp, posep, klen, scale, causal, block,
                   interpret)
    return o.reshape(B, H, Tp, D)[:, :, :T]
