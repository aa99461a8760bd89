#!/usr/bin/env python
"""Fused Conv-TasNet TCN block kernel (inference fast path).

One Pallas kernel executes a whole eval-mode TCN block
(1x1 conv -> PReLU -> BN -> dilated depthwise conv -> PReLU -> BN ->
1x1 conv -> residual, see aps_tpu/sse/bss/tcn.py::Conv1dBlock) with the
activations VMEM-resident: HBM sees one read and one write of the
N x T x B tensor per block instead of the ~5 passes XLA needs when the
depthwise conv splits the elementwise chain into separate fusions. The
TCN is HBM-bandwidth-bound at inference (BENCHMARKS.md), so cutting the
bytes is the whole game; both 1x1 convs run on the MXU inside the
kernel with f32 accumulation.

Only eval-mode "BN" blocks fold into this form: running-stat BatchNorm
is a per-channel affine, PReLU a two-slope affine, and the ScaleLinear
output scales fold into the dense kernels. Training mode or stat-full
norms (gLN over the whole utterance) need global reductions and stay on
the XLA path (aps_tpu/sse/bss/tcn.py::tcn_fused_eval falls back).

Grid: one step per batch row; the full T x B row is VMEM-resident and
the kernel sweeps time in static slabs so the f32 intermediates stay
small. The dilated taps read halo rows from the resident input — no
extra HBM traffic and no cross-block halo exchange.

Parity surface: /root/reference/aps/sse/bss/tcn.py:115 (Conv1dBlock) —
numerics match the reference block semantics in eval mode.
"""

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# pack row indices (all rows are H-wide f32)
_C1, _G1, _H1, _W0, _W1, _W2, _CB, _G2, _H2, _A1, _A2 = range(11)
PACK_ROWS = 11

# target VMEM working set per grid instance: the scoped limit is ~16 MB
# and the estimate below undercounts small compiler temps by a few
# hundred KB (observed 16.12 MB actual vs ~15.5 MB estimated at T=3907
# with the old fixed ~1024-row slabs), so budget with headroom
VMEM_BUDGET = 13 * 2 ** 20


def _resident_bytes(T: int, B: int, H: int, itemsize: int) -> int:
    """Per-instance VMEM that does NOT shrink with smaller slabs: the
    x/out rows (double-buffered across grid instances) + weights."""
    return (2 * 2 * T * B * itemsize  # x + out, double-buffered
            + 2 * B * H * itemsize  # k1 + k2
            + (PACK_ROWS + 1) * H * 4)  # pack + bias2


def _pick_slabs(T: int, B: int, H: int, dilation: int,
                itemsize: int) -> Optional[int]:
    """Slab count whose f32 temporaries keep the kernel inside
    VMEM_BUDGET, or None when even a 16-row slab cannot fit (the caller
    must fall back to the XLA fold)."""
    avail = VMEM_BUDGET - _resident_bytes(T, B, H, itemsize)
    # per slab: y ((step + 2d) x H), y2 + prelu temps (~2 step x H),
    # o + residual cast (~2 step x B) — all f32
    per_row = (3 * H + 2 * B) * 4
    halo = 2 * dilation * H * 4
    step = (avail - halo) // per_row
    step = min(T, (step // 16) * 16)
    if step < 16:
        return None
    return -(-T // step)


def tcn_fused_fits(T: int, B: int, H: int, max_dilation: int,
                   itemsize: int = 2) -> bool:
    """True when tcn_block_fused can run every block of a stack with
    time length T inside the VMEM budget (checked at the largest
    dilation, which has the biggest halo)."""
    return _pick_slabs(T, B, H, max_dilation, itemsize) is not None


def _prelu(x, slope_row):
    return jnp.where(x >= 0, x, slope_row * x)


def _tcn_block_kernel(x_ref, k1_ref, pack_ref, k2_ref, c2_ref, out_ref, *,
                      dilation: int, causal: bool, slabs: int):
    T = x_ref.shape[1]
    d = dilation
    pad_l = 2 * d if causal else d
    pad_r = 2 * d - pad_l
    x = x_ref[0]
    pack = pack_ref[...]
    c1, g1, h1 = pack[_C1], pack[_G1], pack[_H1]
    w0, w1, w2, cb = pack[_W0], pack[_W1], pack[_W2], pack[_CB]
    g2, h2, a1, a2 = pack[_G2], pack[_H2], pack[_A1], pack[_A2]
    H = pack.shape[1]
    # static slab bounds: 16-row aligned (bf16 sublane tile), last slab
    # carries the remainder of odd encoder frame counts
    step = -(-T // slabs)
    step = -(-step // 16) * 16
    for lo in range(0, T, step):
        hi = min(T, lo + step)
        L = hi - lo
        h_lo, h_hi = max(0, lo - pad_l), min(T, hi + pad_r)
        y = jnp.dot(x[h_lo:h_hi], k1_ref[...],
                    preferred_element_type=jnp.float32)
        y = _prelu(y + c1, a1) * g1 + h1
        nz_l = h_lo - (lo - pad_l)
        nz_r = (hi + pad_r) - h_hi
        if nz_l or nz_r:
            parts = [y]
            if nz_l:
                parts.insert(0, jnp.zeros((nz_l, H), jnp.float32))
            if nz_r:
                parts.append(jnp.zeros((nz_r, H), jnp.float32))
            y = jnp.concatenate(parts, axis=0)
        # y is exactly (L + 2d) x H: taps at 0 / d / 2d
        y2 = w0 * y[0:L] + w1 * y[d:d + L] + \
            w2 * y[2 * d:2 * d + L] + cb
        y2 = _prelu(y2, a2) * g2 + h2
        o = jnp.dot(y2.astype(k2_ref.dtype), k2_ref[...],
                    preferred_element_type=jnp.float32)
        o = o + c2_ref[0] + x[lo:hi].astype(jnp.float32)
        out_ref[0, lo:hi] = o.astype(out_ref.dtype)


def tcn_block_fused(x: jnp.ndarray,
                    kernel1: jnp.ndarray,
                    pack: jnp.ndarray,
                    kernel2: jnp.ndarray,
                    bias2: jnp.ndarray,
                    dilation: int,
                    causal: bool = False,
                    slabs: Optional[int] = None,
                    interpret: bool = False) -> jnp.ndarray:
    """One fused eval-mode TCN block.

    Args:
        x: N x T x B input (bf16 or f32)
        kernel1: B x H folded input 1x1 kernel (ScaleLinear scale applied)
        pack: PACK_ROWS x H f32 rows [c1, g1, h1, w0, w1, w2, cb, g2, h2,
            prelu1-slope, prelu2-slope] — biases/BN affines/depthwise taps,
            scalars broadcast to rows
        kernel2: H x B folded output 1x1 kernel
        bias2: 1 x B folded output bias
        dilation: depthwise dilation (static)
        causal: left-only padding when True
        slabs: time sub-tiles inside the kernel (bounds f32 temps);
            default picks the largest slab that keeps the instance
            inside VMEM_BUDGET and raises when none fits — call
            tcn_fused_fits() first to gate
    """
    N, T, B = x.shape
    H = kernel1.shape[1]
    if slabs is None:
        slabs = _pick_slabs(T, B, H, dilation, x.dtype.itemsize)
        if slabs is None:
            raise ValueError(
                f"fused TCN block does not fit VMEM at T={T} (B={B}, "
                f"H={H}, dilation={dilation}); gate the call with "
                "tcn_fused_fits() and fall back to the XLA fold")
    kfn = functools.partial(_tcn_block_kernel, dilation=dilation,
                            causal=causal, slabs=slabs)
    return pl.pallas_call(
        kfn,
        grid=(N,),
        in_specs=[
            pl.BlockSpec((1, T, B), lambda b: (b, 0, 0)),
            pl.BlockSpec((B, H), lambda b: (0, 0)),
            pl.BlockSpec((PACK_ROWS, H), lambda b: (0, 0)),
            pl.BlockSpec((H, B), lambda b: (0, 0)),
            pl.BlockSpec((1, B), lambda b: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, B), lambda b: (b, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((N, T, B), x.dtype),
        interpret=interpret,
    )(x, kernel1, pack, kernel2, bias2)
