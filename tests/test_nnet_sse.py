"""SSE network forward smoke tests (mirrors reference
tests/python/test_nnet_sse.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aps_tpu.libs import aps_sse_nnet
from aps_tpu.transform import EnhTransform

S = 16384  # (S - 512) % 256 == 0 so iSTFT round-trips exactly
TRANSFORM = EnhTransform(feats="spectrogram-log-cmvn", frame_len=512,
                         frame_hop=256)


def fwd(nnet, mix, training=True):
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "aug": jax.random.PRNGKey(2)}
    variables = nnet.init(rngs, mix, training=training)
    out = nnet.apply(variables, mix, training=training,
                     rngs={"dropout": rngs["dropout"], "aug": rngs["aug"]},
                     mutable=["batch_stats"])
    return out[0]


def check_wave_out(out, num_spks, N):
    if num_spks == 1:
        assert out.ndim == 2 and out.shape[0] == N
    else:
        assert len(out) == num_spks
        for o in out:
            assert o.shape[0] == N
            assert np.isfinite(np.asarray(o)).all()


def test_time_tcn(rng):
    nnet = aps_sse_nnet("sse@time_tcn")(L=20, N=64, X=2, R=2, B=64, H=128,
                                        num_spks=2, norm="cLN")
    mix = jnp.asarray(rng.standard_normal((2, S)) * 0.1, dtype=jnp.float32)
    out = fwd(nnet, mix)
    check_wave_out(out, 2, 2)


def test_freq_tcn(rng):
    nnet = aps_sse_nnet("sse@freq_tcn")(enh_transform=TRANSFORM,
                                        in_features=257, num_bins=257,
                                        B=2, K=3, N=2, conv_channels=64,
                                        proj_channels=64, num_spks=2,
                                        training_mode="time")
    mix = jnp.asarray(rng.standard_normal((2, S)) * 0.1, dtype=jnp.float32)
    out = fwd(nnet, mix)
    check_wave_out(out, 2, 2)


@pytest.mark.parametrize("name", ["sse@time_dprnn", "sse@freq_dprnn"])
@pytest.mark.medium
def test_dprnn(rng, name):
    kwargs = dict(num_spks=2, num_layers=2, rnn_hidden=32)
    if name == "sse@freq_dprnn":
        kwargs.update(enh_transform=TRANSFORM, num_bins=257, chunk_size=7,
                      training_mode="time")
    else:
        kwargs.update(num_bins=32, kernel=16, stride=8, chunk_size=64)
    nnet = aps_sse_nnet(name)(**kwargs)
    mix = jnp.asarray(rng.standard_normal((2, S)) * 0.1, dtype=jnp.float32)
    out = fwd(nnet, mix)
    check_wave_out(out, 2, 2)


@pytest.mark.parametrize("name", ["sse@time_sepformer", "sse@freq_sepformer"])
@pytest.mark.medium
def test_sepformer(rng, name):
    arch_kwargs = {"att_dim": 32, "nhead": 4, "feedforward_dim": 64}
    kwargs = dict(num_spks=2, num_blocks=1, num_layers=1,
                  arch_kwargs=arch_kwargs)
    if name == "sse@freq_sepformer":
        kwargs.update(enh_transform=TRANSFORM, num_bins=257, chunk_size=7,
                      training_mode="time")
    else:
        kwargs.update(num_bins=32, kernel=16, stride=8, chunk_size=64)
    nnet = aps_sse_nnet(name)(**kwargs)
    mix = jnp.asarray(rng.standard_normal((2, S)) * 0.1, dtype=jnp.float32)
    out = fwd(nnet, mix)
    check_wave_out(out, 2, 2)


@pytest.mark.parametrize("cplx", [True, False])
@pytest.mark.medium
def test_dccrn(rng, cplx):
    nnet = aps_sse_nnet("sse@dccrn")(
        enh_transform=TRANSFORM, cplx=cplx, num_spks=2,
        K="3,3;3,3;3,3", S="2,1;2,1;2,1", P="1,1,1", O="0,0,0",
        C="16,32,32",
        rnn_hidden=64, rnn_layers=1,
        rnn_resize=(4224 if cplx else 2112),
        training_mode="time")
    mix = jnp.asarray(rng.standard_normal((2, S)) * 0.1, dtype=jnp.float32)
    out = fwd(nnet, mix)
    check_wave_out(out, 2, 2)


@pytest.mark.parametrize("cplx", [True, False])
def test_dcunet(rng, cplx):
    nnet = aps_sse_nnet("sse@dcunet")(
        enh_transform=TRANSFORM, cplx=cplx, num_branch=1,
        non_linear="tanh" if cplx else "sigmoid",
        K="7,5;5,3;5,3", S="2,1;2,1;2,1", C="16,32,32", P="1,1,1",
        O="0,0,0")
    mix = jnp.asarray(rng.standard_normal((2, S)) * 0.1, dtype=jnp.float32)
    out = fwd(nnet, mix)
    assert out.shape[0] == 2
    assert np.isfinite(np.asarray(out)).all()


@pytest.mark.medium
def test_dense_unet(rng):
    nnet = aps_sse_nnet("sse@dense_unet")(
        enh_transform=TRANSFORM, num_spks=2,
        K="3,3;3,3;3,3;3,3", S="1,1;2,1;2,1;2,1", P="0,1;0,1;0,1;0,1",
        O="0,0,0,0",
        enc_channel="16,16,32,64", dec_channel="16,16,32,64",
        num_dense_blocks=2, rnn_hidden=64, rnn_layers=1, rnn_resize=2048,
        training_mode="time")
    mix = jnp.asarray(rng.standard_normal((2, S)) * 0.1, dtype=jnp.float32)
    out = fwd(nnet, mix)
    check_wave_out(out, 2, 2)


def test_chimera(rng):
    nnet = aps_sse_nnet("sse@chimera++")(enh_transform=TRANSFORM,
                                         input_size=257, num_bins=257,
                                         num_spks=2, hidden=64,
                                         num_layers=1,
                                         training_mode="time")
    mix = jnp.asarray(rng.standard_normal((2, S)) * 0.1, dtype=jnp.float32)
    out = fwd(nnet, mix)
    check_wave_out(out, 2, 2)
    # dpcl embeddings unit norm & bounded
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}
    variables = nnet.init(rngs, mix, training=False)
    embed = nnet.apply(variables, mix, method="dpcl_embed")
    assert embed.ndim == 3
    assert (np.asarray(embed) >= 0).all() and (np.asarray(embed) <= 1).all()


def test_freq_xfmr(rng):
    nnet = aps_sse_nnet("sse@freq_xfmr")(
        enh_transform=TRANSFORM, input_size=257, num_bins=257, num_spks=2,
        arch="xfmr", pose="abs", num_layers=2,
        arch_kwargs={"att_dim": 32, "nhead": 4, "feedforward_dim": 64},
        training_mode="time")
    mix = jnp.asarray(rng.standard_normal((2, S)) * 0.1, dtype=jnp.float32)
    out = fwd(nnet, mix)
    check_wave_out(out, 2, 2)


@pytest.mark.medium
def test_phasen(rng):
    nnet = aps_sse_nnet("sse@phasen")(enh_transform=TRANSFORM,
                                      channel_amp=6, channel_pha=4,
                                      num_tsbs=1, num_bins=257,
                                      lstm_hidden=32, linear_size=64,
                                      training_mode="time")
    mix = jnp.asarray(rng.standard_normal((2, S)) * 0.1, dtype=jnp.float32)
    out = fwd(nnet, mix)
    assert out.shape[0] == 2 and np.isfinite(np.asarray(out)).all()


def test_demucs(rng):
    nnet = aps_sse_nnet("sse@demucs")(channel=8, num_layers=2, rnn_layers=1)
    mix = jnp.asarray(rng.standard_normal((2, S)) * 0.1, dtype=jnp.float32)
    out = fwd(nnet, mix)
    assert out.shape[0] == 2 and np.isfinite(np.asarray(out)).all()


def test_sse_dfsmn(rng):
    nnet = aps_sse_nnet("sse@dfsmn")(enh_transform=TRANSFORM, dim=64,
                                     num_bins=257, num_branchs=1,
                                     num_layers=2, project=32,
                                     complex_mask=True,
                                     training_mode="time")
    mix = jnp.asarray(rng.standard_normal((2, S)) * 0.1, dtype=jnp.float32)
    out = fwd(nnet, mix)
    assert out.shape[0] == 2 and np.isfinite(np.asarray(out)).all()


def test_rnn_enh_ml(rng):
    transform = EnhTransform(feats="spectrogram-log-cmvn-ipd",
                             frame_len=512, frame_hop=256,
                             ipd_index="0,1;0,2")
    nnet = aps_sse_nnet("sse@rnn_enh_ml")(enh_transform=transform,
                                          input_size=257 * 3,
                                          num_bins=257, hidden=64,
                                          num_layers=1)
    mix = jnp.asarray(rng.standard_normal((2, 3, S)) * 0.1,
                      dtype=jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}
    variables = nnet.init(rngs, mix, training=True)
    cstft, masks = nnet.apply(variables, mix, training=True,
                              rngs=rngs, mutable=["batch_stats"])[0]
    assert masks.shape[0] == 2 and masks.shape[-1] == 257
    # real-pair packed spectra (no complex64 on the TPU runtime)
    assert cstft.dtype == jnp.float32 and cstft.shape[-1] == 2


def test_ml_task(rng):
    from aps_tpu.libs import aps_task
    transform = EnhTransform(feats="spectrogram-log-cmvn-ipd",
                             frame_len=512, frame_hop=256,
                             ipd_index="0,1;0,2")
    nnet = aps_sse_nnet("sse@rnn_enh_ml")(enh_transform=transform,
                                          input_size=257 * 3,
                                          num_bins=257, hidden=64,
                                          num_layers=1)
    task = aps_task("sse@enh_ml", nnet)
    egs = {"mix": jnp.asarray(rng.standard_normal((2, 3, S)) * 0.1,
                              dtype=jnp.float32)}
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}
    variables = task.init(rngs, egs, training=True)
    out = task.apply(variables, egs, training=True, rngs=rngs,
                     mutable=["batch_stats"])[0]
    assert np.isfinite(float(out["loss"]))
