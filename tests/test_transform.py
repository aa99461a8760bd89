"""Transform numerics tests (mirrors reference tests/python/test_transform.py:
STFT round-trips, parity against torch.stft, mel filters, composite pipelines).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aps_tpu.transform import AsrTransform, EnhTransform, StftCtx
from aps_tpu.transform.utils import (forward_stft, inverse_stft, init_window,
                                     mel_filter, num_frames, splice_feature)


def _rand_wav(rng, n=2, s=16000, c=0):
    shape = (n, s) if c == 0 else (n, c, s)
    return (rng.standard_normal(shape) * 0.1).astype(np.float32)


@pytest.mark.parametrize("wnd", ["hann", "hamm", "sqrthann", "blackman",
                                 "bartlett", "rect"])
def test_window_matches_torch(wnd):
    torch = pytest.importorskip("torch")
    ours = init_window(wnd, 400)
    tpl = {
        "hann": lambda: torch.hann_window(400, periodic=True),
        "sqrthann": lambda: torch.hann_window(400, periodic=True)**0.5,
        "hamm": lambda: torch.hamming_window(400, periodic=True),
        "blackman": lambda: torch.blackman_window(400, periodic=True),
        "bartlett": lambda: torch.bartlett_window(400, periodic=True),
        "rect": lambda: torch.ones(400),
    }
    ref = tpl[wnd]().numpy()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


@pytest.mark.parametrize("mode", ["librosa", "kaldi"])
@pytest.mark.parametrize("center", [False, True])
def test_stft_vs_torch(rng, mode, center):
    """Our rfft STFT must match torch.stft on the librosa framing mode and
    be self-consistent on kaldi mode."""
    torch = pytest.importorskip("torch")
    wav = _rand_wav(rng, n=2, s=8000)
    frame_len, frame_hop = 400, 160
    out = forward_stft(jnp.asarray(wav), frame_len, frame_hop, window="hann",
                       mode=mode, center=center)
    out = np.asarray(out)
    assert out.shape[1] == 257  # 512 // 2 + 1
    if mode == "librosa":
        win = torch.hann_window(400, periodic=True)
        win = torch.nn.functional.pad(win, (56, 56))
        ref = torch.stft(torch.from_numpy(wav), 512, hop_length=frame_hop,
                         win_length=512, window=win, center=center,
                         onesided=True, return_complex=True)
        np.testing.assert_allclose(out[..., 0], ref.real.numpy(), atol=1e-2)
        np.testing.assert_allclose(out[..., 1], ref.imag.numpy(), atol=1e-2)


@pytest.mark.parametrize("mode", ["librosa", "kaldi"])
@pytest.mark.parametrize("wnd", ["sqrthann", "hann"])
def test_stft_istft_roundtrip(rng, mode, wnd):
    wav = _rand_wav(rng, n=2, s=16000)
    frame_len, frame_hop = 512, 256
    stft = forward_stft(jnp.asarray(wav), frame_len, frame_hop, window=wnd,
                        mode=mode, center=True)
    rec = inverse_stft(stft, frame_len, frame_hop, window=wnd, mode=mode,
                       center=True)
    rec = np.asarray(rec)
    S = min(rec.shape[-1], wav.shape[-1])
    # boundary frames lack full overlap: compare the interior
    m = frame_len
    np.testing.assert_allclose(rec[:, m:S - m], wav[:, m:S - m], atol=1e-3)


@pytest.mark.parametrize("polar", [True, False])
def test_stft_polar_roundtrip(rng, polar):
    wav = _rand_wav(rng, n=1, s=8000)
    stft = forward_stft(jnp.asarray(wav), 512, 256, return_polar=polar,
                        center=True)
    rec = inverse_stft(stft, 512, 256, return_polar=polar, center=True)
    assert np.isfinite(np.asarray(rec)).all()


def test_mel_filter_properties():
    mel = mel_filter(400, num_mels=80, sr=16000)
    assert mel.shape == (80, 257)
    # triangular filters: non-negative, each band has support
    assert (mel >= 0).all()
    assert (mel.sum(-1) > 0).all()
    # band centers are increasing
    centers = mel.argmax(-1)
    assert (np.diff(centers) >= 0).all()


def test_num_frames_matches_output(rng):
    wav = _rand_wav(rng, n=3, s=16000)
    for mode in ["librosa", "kaldi"]:
        for center in [True, False]:
            out = forward_stft(jnp.asarray(wav), 400, 160, mode=mode,
                               center=center)
            nf = num_frames(np.array([16000, 16000, 16000]), 400, 160,
                            True, mode, center)
            assert out.shape[-2] == int(nf[0]), (mode, center)


def test_splice_feature():
    feats = jnp.arange(24, dtype=jnp.float32).reshape(1, 6, 4)
    spliced = splice_feature(feats, lctx=1, rctx=1)
    assert spliced.shape == (1, 6, 12)
    # first frame left context is clamped to frame 0
    np.testing.assert_allclose(spliced[0, 0, :4], spliced[0, 0, 4:8])


@pytest.mark.parametrize("feats,exp_dim", [
    ("fbank-log-cmvn", 80),
    ("spectrogram-log-cmvn", 257),
    ("mfcc", 13),
    ("fbank-log-cmvn-aug", 80),
    ("perturb-fbank-log-cmvn-aug", 80),
    ("fbank-log-cmvn-splice", 240),
    ("fbank-log-cmvn-delta", 240),
])
def test_asr_transform_shapes(rng, feats, exp_dim):
    wav = _rand_wav(rng, n=2, s=16000)
    trans = AsrTransform(feats=feats, frame_len=400, frame_hop=160,
                         window="hamm", aug_prob=0.5)
    lens = jnp.asarray([16000, 12000])
    variables = trans.init(jax.random.PRNGKey(0), jnp.asarray(wav), lens)
    out, nf = trans.apply(variables, jnp.asarray(wav), lens)
    assert out.shape[0] == 2 and out.shape[-1] == exp_dim
    assert trans.init(jax.random.PRNGKey(0), jnp.asarray(wav), lens) is not None
    assert int(nf[0]) >= int(nf[1])
    # training mode with rngs (specaug/perturb active)
    out_t, nf_t = trans.apply(variables, jnp.asarray(wav), lens,
                              training=True,
                              rngs={"aug": jax.random.PRNGKey(1)})
    assert out_t.shape == out.shape
    assert np.isfinite(np.asarray(out_t)).all()


def test_asr_transform_gcmvn_missing_file_warns(rng):
    wav = _rand_wav(rng, n=1, s=8000)
    with pytest.warns(UserWarning):
        trans = AsrTransform(feats="fbank-log-cmvn", frame_len=400,
                             frame_hop=160, gcmvn="/does/not/exist.npy")
        trans.init(jax.random.PRNGKey(0), jnp.asarray(wav), None)


@pytest.mark.parametrize("feats,ipd_index,exp_dim", [
    ("spectrogram-log-cmvn-ipd", "0,1;0,2", 257 * 3),
    ("spectrogram-log-cmvn", "", 257),
    ("ipd", "0,1", 257),
])
def test_enh_transform(rng, feats, ipd_index, exp_dim):
    wav = _rand_wav(rng, n=2, s=8000, c=3)
    trans = EnhTransform(feats=feats, frame_len=512, frame_hop=256,
                         ipd_index=ipd_index)
    variables = trans.init(jax.random.PRNGKey(0),
                           jnp.zeros((2, 3, 257, 30, 2)))
    packed, nf = trans.apply(variables, jnp.asarray(wav),
                             jnp.asarray([8000, 8000]), method="encode")
    assert packed.shape[:2] == (2, 3) and packed.shape[-1] == 2
    out = trans.apply(variables, packed)
    assert out.shape[0] == 2 and out.shape[-1] == exp_dim
    # decode back to waveform
    wavs = trans.apply(variables, [packed[:, 0]], method="decode")
    assert wavs[0].shape[0] == 2


def test_stft_ctx_api():
    ctx = StftCtx(frame_len=512, frame_hop=256)
    assert ctx.num_bins == 257
    wav = jnp.zeros((2, 8000))
    packed = ctx.forward(wav)
    assert packed.shape == (2, 257, int(ctx.num_frames(np.array([8000]))[0]), 2)
