#!/usr/bin/env python
"""Conv-TasNet (time & frequency domain).

Parity surface: /root/reference/aps/sse/bss/tcn.py (Conv1dBlock:115,
Conv1dRepeat:162, TimeConvTasNet:229 "sse@time_tcn", FreqConvTasNet:361
"sse@freq_tcn", signal_mix_consistency:14, GlobalChannelLayerNorm:33).

TPU layout: channel-last N x T x C internally (flax convs; keeps C on the
128-lane axis); N x F x T at the mask/STFT boundary for egs parity.
Note the reference's "cLN" (GroupNorm(1, C) over N x C x T) normalizes over
(C, T) jointly — numerically identical to gLN; we reproduce that behavior."""

from typing import List, Optional, Union

import jax
import jax.nn
import jax.numpy as jnp
from flax import linen as nn
from jax import lax

from aps_tpu.libs import ApsRegisters
from aps_tpu.sse.base import (MaskNonLinear, SSEBase, supported_nonlinear,
                              tf_masking)


def signal_mix_consistency(mix, sep: List, weight: Optional[List]) -> List:
    """Project separated signals so they sum to the mixture."""
    delta = mix - sum(sep)
    if weight is None:
        return [s + delta / len(sep) for s in sep]
    return [s + delta * w for s, w in zip(sep, weight)]


class GlobalChannelLayerNorm(nn.Module):
    """gLN over N x T x C (statistics over T and C)."""
    dim: int
    eps: float = 1e-5
    elementwise_affine: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mean = jnp.mean(x, (1, 2), keepdims=True)
        var = jnp.mean((x - mean)**2, (1, 2), keepdims=True)
        x = (x - mean) * jax.lax.rsqrt(var + self.eps)
        if self.elementwise_affine:
            gamma = self.param("gamma", nn.initializers.ones, (self.dim,))
            beta = self.param("beta", nn.initializers.zeros, (self.dim,))
            x = x * gamma + beta
        return x


class NormalizeLayer(nn.Module):
    """cLN | IN | gLN | BN over N x T x C."""
    norm: str
    num_channels: int

    @nn.compact
    def __call__(self, x: jnp.ndarray, training: bool = False) -> jnp.ndarray:
        if self.norm not in ["cLN", "IN", "gLN", "BN"]:
            raise RuntimeError(f"Unsupported normalize layer: {self.norm}")
        if self.norm in ("cLN", "gLN"):
            return GlobalChannelLayerNorm(self.num_channels)(x)
        if self.norm == "IN":
            mean = jnp.mean(x, 1, keepdims=True)
            var = jnp.var(x, 1, keepdims=True)
            return (x - mean) * jax.lax.rsqrt(var + 1e-5)
        return nn.BatchNorm(use_running_average=not training, axis=-1,
                            momentum=0.9)(x)


class ScaleLinear(nn.Module):
    """1x1 conv (Dense over channels) with a learnable output scale."""
    out_features: int
    use_bias: bool = True
    scale_param: float = 1.0

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        out = nn.Dense(self.out_features, use_bias=self.use_bias)(x)
        if self.scale_param:
            scale = self.param(
                "scale", lambda _: jnp.asarray(self.scale_param))
            out = out * scale
        return out


class Conv1dBlock(nn.Module):
    """TasNet TCN block: 1x1 -> PReLU/norm -> dconv -> PReLU/norm -> 1x1."""
    in_channels: int = 256
    conv_channels: int = 512
    kernel_size: int = 3
    dilation: int = 1
    norm: str = "cLN"
    scale_param: float = 0
    causal: bool = False

    @nn.compact
    def __call__(self, inp: jnp.ndarray, training: bool = False):
        """inp: N x T x C -> N x T x C"""
        pad = self.dilation * (self.kernel_size - 1)
        out = ScaleLinear(self.conv_channels,
                          scale_param=self.scale_param)(inp)
        out = nn.PReLU()(out)
        out = NormalizeLayer(self.norm, self.conv_channels)(
            out, training=training)
        padding = [(pad, 0)] if self.causal else [(pad // 2, pad - pad // 2)]
        out = nn.Conv(self.conv_channels, (self.kernel_size,),
                      kernel_dilation=(self.dilation,),
                      feature_group_count=self.conv_channels,
                      padding=padding)(out)
        out = nn.PReLU()(out)
        out = NormalizeLayer(self.norm, self.conv_channels)(
            out, training=training)
        out = ScaleLinear(self.in_channels,
                          scale_param=self.scale_param)(out)
        return out + inp


class Conv1dRepeat(nn.Module):
    """R repeats x X dilated blocks, optional cross-repeat skip residuals."""
    num_repeats: int
    blocks_per_repeat: int
    in_channels: int = 128
    conv_channels: int = 128
    kernel_size: int = 3
    norm: str = "BN"
    skip_residual: bool = True
    scaling_param: bool = False
    causal: bool = False

    @nn.compact
    def __call__(self, inp: jnp.ndarray, training: bool = False):
        outputs = [inp]
        skip_index = 0
        for r in range(self.num_repeats):
            if self.skip_residual:
                for i in range(r):
                    inp = inp + ScaleLinear(
                        self.in_channels, scale_param=1.0,
                        name=f"skip_{skip_index + i}")(outputs[i])
                skip_index += r
            for n in range(self.blocks_per_repeat):
                inp = Conv1dBlock(
                    in_channels=self.in_channels,
                    conv_channels=self.conv_channels,
                    kernel_size=self.kernel_size,
                    norm=self.norm,
                    causal=self.causal,
                    dilation=2**n,
                    scale_param=0 if self.scaling_param else 0.9**n,
                    name=f"block_{r}_{n}")(inp, training=training)
            if self.skip_residual:
                outputs.append(inp)
        return inp


@ApsRegisters.sse.register("sse@time_tcn")
class TimeConvTasNet(SSEBase):
    """Time-domain Conv-TasNet (Luo & Mesgarani 2019)."""
    L: int = 20
    N: int = 256
    X: int = 8
    R: int = 4
    B: int = 256
    H: int = 512
    P: int = 3
    norm: str = "BN"
    causal: bool = False
    num_spks: int = 2
    non_linear: str = "relu"
    scaling_param: bool = False
    skip_residual: bool = False
    mixture_consistency: str = "none"
    training_mode: str = "time"

    def setup(self):
        assert self.mixture_consistency in ["none", "fix", "mag", "learn"]
        self.mask_act = MaskNonLinear(self.non_linear,
                                      enable="positive_wo_softplus")
        self.encoder = nn.Conv(self.N, (self.L,), strides=(self.L // 2,),
                               padding="VALID")
        self.ln = NormalizeLayer("cLN", self.N)
        self.proj = nn.Dense(self.B)
        self.conv = Conv1dRepeat(self.R, self.X,
                                 in_channels=self.B,
                                 conv_channels=self.H,
                                 kernel_size=self.P,
                                 norm=self.norm,
                                 skip_residual=self.skip_residual,
                                 scaling_param=self.scaling_param,
                                 causal=self.causal)
        self.mask_prelu = nn.PReLU()
        self.mask_out = nn.Dense(self.num_spks * self.N)
        self.decoder = nn.ConvTranspose(1, (self.L,),
                                        strides=(self.L // 2,),
                                        padding="VALID")
        if self.mixture_consistency == "learn":
            self.mc_weight = nn.Dense(self.num_spks)

    def mix_consistency(self, out, mix, bss):
        if self.mixture_consistency == "fix":
            weight = None
        elif self.mixture_consistency == "mag":
            mix_sum = jnp.sum(mix, -1, keepdims=True)
            weight = [jnp.mean(s**2, -1, keepdims=True) / mix_sum
                      for s in bss]
        else:
            w = jax.nn.softmax(self.mc_weight(jnp.mean(out, 1)), -1)
            weight = [w[:, i:i + 1] for i in range(self.num_spks)]
        return signal_mix_consistency(mix, bss, weight)

    def __call__(self, mix: jnp.ndarray, training: bool = False):
        """mix: N x S -> [N x S', ...]"""
        self.check_args(mix, training=True, valid_dim=[2])
        # N x T x N_
        w = jax.nn.relu(self.encoder(mix[..., None]))
        y = self.proj(self.ln(w))
        y = self.conv(y, training=training)
        e = self.mask_prelu(y)
        e = self.mask_out(e)  # N x T x spks*N_
        m = jnp.stack(jnp.split(e, self.num_spks, axis=-1), axis=0)
        # softmax over speaker axis 0 (when chosen)
        m = self.mask_act(jnp.swapaxes(m, -1, -2))
        m = jnp.swapaxes(m, -1, -2)
        s = [w * m[n] for n in range(self.num_spks)]
        bss = [self.decoder(x)[..., 0] for x in s]
        if self.mixture_consistency != "none":
            bss = self.mix_consistency(e, mix, bss)
        return bss[0] if self.num_spks == 1 else bss

    def infer(self, mix: jnp.ndarray, mode: str = "time"):
        self.check_args(mix, training=False, valid_dim=[1])
        sep = self.__call__(mix[None, ...], training=False)
        return sep[0] if self.num_spks == 1 else [s[0] for s in sep]

    def make_fused_eval(self, variables, impl: str = "auto",
                        interpret: bool = False):
        """Folded inference fast path (see tcn_fused_eval); None when the
        configuration cannot be folded (then use the canonical apply)."""
        return tcn_fused_eval(self, variables, impl=impl,
                              interpret=interpret)


def _fold_eval_block(blk, stats, eps: float = 1e-5):
    """Fold one eval-mode Conv1dBlock into (kernel1, pack, kernel2, bias2)
    for ops.pallas.tcn.tcn_block_fused: ScaleLinear scales into the dense
    kernels, running-stat BatchNorm into per-channel affines, scalar PReLU
    slopes broadcast to pack rows."""
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    s1 = f32(blk["ScaleLinear_0"]["scale"])
    k1 = f32(blk["ScaleLinear_0"]["Dense_0"]["kernel"]) * s1
    c1 = f32(blk["ScaleLinear_0"]["Dense_0"]["bias"]) * s1
    bn1p = blk["NormalizeLayer_0"]["BatchNorm_0"]
    bn1s = stats["NormalizeLayer_0"]["BatchNorm_0"]
    g1 = f32(bn1p["scale"]) * lax.rsqrt(f32(bn1s["var"]) + eps)
    h1 = f32(bn1p["bias"]) - f32(bn1s["mean"]) * g1
    wk = f32(blk["Conv_0"]["kernel"])[:, 0, :]
    cb = f32(blk["Conv_0"]["bias"])
    bn2p = blk["NormalizeLayer_1"]["BatchNorm_0"]
    bn2s = stats["NormalizeLayer_1"]["BatchNorm_0"]
    g2 = f32(bn2p["scale"]) * lax.rsqrt(f32(bn2s["var"]) + eps)
    h2 = f32(bn2p["bias"]) - f32(bn2s["mean"]) * g2
    s2 = f32(blk["ScaleLinear_1"]["scale"])
    k2 = f32(blk["ScaleLinear_1"]["Dense_0"]["kernel"]) * s2
    b2 = f32(blk["ScaleLinear_1"]["Dense_0"]["bias"]) * s2
    H = g1.shape[0]
    row = lambda v: jnp.broadcast_to(jnp.reshape(f32(v), (-1,)), (H,))
    a1 = row(blk["PReLU_0"]["negative_slope"])
    a2 = row(blk["PReLU_1"]["negative_slope"])
    pack = jnp.stack([c1, g1, h1, wk[0], wk[1], wk[2], cb, g2, h2, a1, a2])
    return k1, pack, k2, b2[None, :]


def tcn_fused_eval(nnet: "TimeConvTasNet", variables, impl: str = "auto",
                   interpret: bool = False):
    """Build a jittable folded inference forward for ``sse@time_tcn``.

    The TCN stack is HBM-bandwidth-bound at inference; this path folds
    every eval-mode block (BN running stats, PReLU slopes, ScaleLinear
    scales) into dense+affine form and runs each block as ONE fused
    Pallas kernel (ops/pallas/tcn.py) — or as XLA shifted-add depthwise
    taps with ``impl="xla"`` (any backend; ~10% over the canonical path,
    the Pallas kernel is the fast one). Returns ``forward(mix: N x S) ->
    [N x S'] * num_spks`` computing exactly what ``nnet.apply(...,
    training=False)`` computes (conv precision: the fold evaluates the
    depthwise taps at f32 — at bf16 default matmul precision the
    canonical path deviates ~1e-3 relative from this, the fold is the
    more accurate one), or None when the config cannot be folded.

    Supported: norm="BN", P=3, no skip_residual (the time_tcn defaults);
    all mixture_consistency modes and mask non-linearities.
    """
    if (nnet.norm != "BN" or nnet.P != 3 or nnet.skip_residual
            or nnet.num_spks < 1):
        return None
    if impl == "auto":
        impl = "pallas" if jax.default_backend() == "tpu" else "xla"
    params = variables["params"]
    stats = variables.get("batch_stats", {})
    if "conv" not in params or "conv" not in stats:
        return None
    dtype = params["proj"]["kernel"].dtype
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    blocks = []
    dilations = []
    for r in range(nnet.R):
        for n in range(nnet.X):
            name = f"block_{r}_{n}"
            if name not in params["conv"]:
                return None
            k1, pack, k2, b2 = _fold_eval_block(params["conv"][name],
                                                stats["conv"][name])
            dilations.append(2 ** n)
            blocks.append((k1.astype(dtype), pack, k2.astype(dtype), b2))
    # one pytree of all folded weights: the compiled forward takes it as
    # an ARGUMENT rather than closing over it — closed-over device arrays
    # become MLIR constants, which (a) fetches every weight back to host
    # at trace time (minutes through a networked-device tunnel), (b)
    # bloats the serialized program (observed 66 MB HLO for a 17 MB
    # checkpoint) and (c) keys the persistent compilation cache on the
    # weight VALUES so no two checkpoints (or processes) ever share a
    # compile. Passing the pytree keeps the HLO weight-free.
    #
    # block weights are STACKED (R, X, ...): every repeat runs the same X
    # dilations over identically-shaped weights, so the block loop scans
    # over the repeat axis with only the X inner blocks (static dilation
    # each) unrolled. The traced program then contains X kernel instances
    # instead of R*X — measured on the tunneled bench chip, the unrolled
    # 32-block program costs ~12.5 s PER INPUT SHAPE even with a warm
    # compile cache (trace+lower 9 s, executable load 3.5 s, 37.8 MB
    # serialized); the scan cuts that ~R-fold with zero steady-state
    # change (same kernels, same schedule).
    folded = {
        "blocks": tuple(
            jnp.stack([
                jnp.stack([blocks[r * nnet.X + n][j]
                           for n in range(nnet.X)])
                for r in range(nnet.R)
            ]) for j in range(4)),
        "enc_k": params["encoder"]["kernel"],
        "enc_b": params["encoder"]["bias"],
        "ln_g": f32(params["ln"]["GlobalChannelLayerNorm_0"]["gamma"]),
        "ln_b": f32(params["ln"]["GlobalChannelLayerNorm_0"]["beta"]),
        "proj_k": params["proj"]["kernel"],
        "proj_b": params["proj"]["bias"],
        "mp": params["mask_prelu"]["negative_slope"],
        "mo_k": params["mask_out"]["kernel"],
        "mo_b": params["mask_out"]["bias"],
        "dec_k": params["decoder"]["kernel"],
        "dec_b": params["decoder"]["bias"],
        "mc_k": params.get("mc_weight", None),
    }
    dilations = tuple(dilations)
    act = supported_nonlinear[nnet.non_linear]
    spks, stride = nnet.num_spks, nnet.L // 2
    mc_mode = nnet.mixture_consistency

    def raw_forward(weights, mix: jnp.ndarray) -> List[jnp.ndarray]:
        """weights: the ``folded`` pytree; mix: N x S -> [N x S'] *
        num_spks (eval mode)."""
        enc_k, enc_b = weights["enc_k"], weights["enc_b"]
        ln_g, ln_b = weights["ln_g"], weights["ln_b"]
        proj_k, proj_b = weights["proj_k"], weights["proj_b"]
        mp = weights["mp"]
        mo_k, mo_b = weights["mo_k"], weights["mo_b"]
        dec_k, dec_b = weights["dec_k"], weights["dec_b"]
        mc_k = weights["mc_k"]
        w = jax.nn.relu(
            lax.conv_general_dilated(
                mix[..., None], enc_k, window_strides=(stride,),
                padding="VALID", dimension_numbers=("NWC", "WIO", "NWC"))
            + enc_b)
        mean = jnp.mean(f32(w), (1, 2), keepdims=True)
        var = jnp.mean((f32(w) - mean) ** 2, (1, 2), keepdims=True)
        y = (w - mean) * lax.rsqrt(var + 1e-5) * ln_g + ln_b
        y = (y @ proj_k + proj_b).astype(dtype)
        T = y.shape[1]
        # T is static under jit, so the pallas-vs-xla choice is made per
        # compiled shape: long inputs whose fused working set would blow
        # the ~16 MB scoped VMEM (observed at T>=3907 with B=256, H=512)
        # take the XLA fold instead of failing to compile
        use_pallas = impl == "pallas"
        if use_pallas:
            from aps_tpu.ops.pallas.tcn import tcn_fused_fits
            use_pallas = tcn_fused_fits(T, y.shape[2],
                                        weights["blocks"][1].shape[-1],
                                        max(dilations),
                                        y.dtype.itemsize)

        def one_repeat(y, rep):
            """One repeat: X blocks, dilation 2**n each (static)."""
            ks1, packs, ks2, bs2 = rep
            for n in range(nnet.X):
                k1, pack = ks1[n], packs[n]
                k2, b2 = ks2[n], bs2[n]
                d = dilations[n]
                if use_pallas:
                    from aps_tpu.ops.pallas.tcn import tcn_block_fused
                    y = tcn_block_fused(y, k1, pack, k2, b2, dilation=d,
                                        causal=nnet.causal,
                                        interpret=interpret)
                else:
                    c1, g1, h1 = pack[0], pack[1], pack[2]
                    w0, w1, w2, cb = pack[3], pack[4], pack[5], pack[6]
                    g2, h2, a1, a2 = pack[7], pack[8], pack[9], pack[10]
                    z = f32(y @ k1) + c1
                    z = jnp.where(z >= 0, z, a1 * z) * g1 + h1
                    pl_, pr = (2 * d, 0) if nnet.causal else (d, d)
                    zp = jnp.pad(z, ((0, 0), (pl_, pr), (0, 0)))
                    z2 = (w0 * zp[:, :T] + w1 * zp[:, d:T + d] +
                          w2 * zp[:, 2 * d:2 * d + T] + cb)
                    z2 = jnp.where(z2 >= 0, z2, a2 * z2) * g2 + h2
                    y = (z2.astype(dtype) @ k2 + b2 + y).astype(dtype)
            return y, None

        y, _ = lax.scan(one_repeat, y, weights["blocks"])
        e = jnp.where(y >= 0, y, mp * y) @ mo_k + mo_b
        m = jnp.stack(jnp.split(e, spks, axis=-1), axis=0)
        m = act(m)
        bss = []
        for n in range(spks):
            o = lax.conv_transpose(w * m[n], dec_k, strides=(stride,),
                                   padding="VALID",
                                   dimension_numbers=("NWC", "WIO", "NWC"))
            bss.append(o[..., 0] + dec_b)
        if mc_mode == "fix":
            bss = signal_mix_consistency(mix, bss, None)
        elif mc_mode == "mag":
            mix_sum = jnp.sum(mix, -1, keepdims=True)
            weight = [jnp.mean(s ** 2, -1, keepdims=True) / mix_sum
                      for s in bss]
            bss = signal_mix_consistency(mix, bss, weight)
        elif mc_mode == "learn":
            wgt = jax.nn.softmax(
                jnp.mean(e, 1) @ mc_k["kernel"] + mc_k["bias"], -1)
            bss = signal_mix_consistency(
                mix, bss, [wgt[:, i:i + 1] for i in range(spks)])
        return bss[0] if spks == 1 else bss

    def forward(mix: jnp.ndarray) -> List[jnp.ndarray]:
        """mix: N x S -> [N x S'] * num_spks (eval mode)."""
        return raw_forward(folded, mix)

    # expose the argument-passing form: jit ``forward.raw`` and call it
    # with ``forward.folded`` so the weights ride as runtime inputs
    # (zero-cost when already device-resident) instead of constants
    forward.raw = raw_forward
    forward.folded = folded
    return forward


@ApsRegisters.sse.register("sse@freq_tcn")
class FreqConvTasNet(SSEBase):
    """Frequency-domain Conv-TasNet (TCN masking on spectral features)."""
    in_features: int = 257
    B: int = 6
    K: int = 3
    N: int = 3
    conv_channels: int = 512
    proj_channels: int = 256
    norm: str = "BN"
    num_spks: int = 2
    num_bins: int = 257
    non_linear: str = "relu"
    causal: bool = False
    scaling_param: bool = False
    skip_residual: bool = False
    training_mode: str = "freq"

    def setup(self):
        assert self.enh_transform is not None
        self.proj = nn.Dense(self.proj_channels)
        self.conv = Conv1dRepeat(self.N, self.B,
                                 in_channels=self.proj_channels,
                                 conv_channels=self.conv_channels,
                                 kernel_size=self.K,
                                 causal=self.causal,
                                 scaling_param=self.scaling_param,
                                 skip_residual=self.skip_residual,
                                 norm=self.norm)
        self.mask_prelu = nn.PReLU()
        self.mask_out = nn.Dense(self.num_bins * self.num_spks)
        self.mask_act = MaskNonLinear(self.non_linear, enable="common")

    def _tf_mask(self, feats, training: bool) -> List[jnp.ndarray]:
        """feats: N x T x F -> [N x F x T, ...]"""
        x = self.proj(feats)
        x = self.conv(x, training=training)
        m = self.mask_out(self.mask_prelu(x))
        # N x T x S*F -> N x S*F x T
        masks = self.mask_act(jnp.swapaxes(m, -1, -2))
        return jnp.split(masks, self.num_spks, axis=-2)

    def _infer(self, mix, mode: str, training: bool):
        stft, _ = self.enh_transform.encode(mix, None)
        feats = self.enh_transform(stft, training=training)
        masks = self._tf_mask(feats, training)
        if mode == "time":
            bss_stft = [tf_masking(stft, m) for m in masks]
            bss = self.enh_transform.decode(bss_stft)
        else:
            bss = masks
        return bss[0] if self.num_spks == 1 else bss

    def __call__(self, mix: jnp.ndarray, training: bool = False):
        self.check_args(mix, training=True, valid_dim=[2, 3])
        return self._infer(mix, self.training_mode, training)

    def infer(self, mix: jnp.ndarray, mode: str = "time"):
        self.check_args(mix, training=False, valid_dim=[1, 2])
        sep = self._infer(mix[None, ...], mode, False)
        return sep[0] if self.num_spks == 1 else [s[0] for s in sep]
