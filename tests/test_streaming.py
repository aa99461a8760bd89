"""Streaming tests: streaming==offline STFT equivalence, streaming encoders,
streaming ASR/rt-SSE models (mirrors reference test_streaming_asr.py +
test_jit_transform.py invariants)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aps_tpu.libs import aps_asr_nnet, aps_sse_nnet
from aps_tpu.transform import AsrTransform, EnhTransform
from aps_tpu.transform.streaming import StreamingSTFT, StreamingiSTFT
from aps_tpu.transform.utils import forward_stft, inverse_stft


def test_streaming_stft_matches_offline(rng):
    wav = jnp.asarray(rng.standard_normal((2, 8192)) * 0.1,
                      dtype=jnp.float32)
    offline = forward_stft(wav, 512, 256, window="hann", mode="librosa")
    stream = StreamingSTFT(512, 256, window="hann")
    online = stream.forward(wav)
    np.testing.assert_allclose(np.asarray(online), np.asarray(offline),
                               atol=1e-4)


def test_streaming_istft_matches_offline(rng):
    wav = jnp.asarray(rng.standard_normal((1, 8192)) * 0.1,
                      dtype=jnp.float32)
    stft = forward_stft(wav, 512, 256, window="sqrthann")
    offline = inverse_stft(stft, 512, 256, window="sqrthann")
    stream = StreamingiSTFT(512, 256, window="sqrthann")
    online = stream.forward(stft)
    S = min(online.shape[-1], offline.shape[-1])
    np.testing.assert_allclose(np.asarray(online[:, 256:S - 512]),
                               np.asarray(offline[:, 256:S - 512]),
                               atol=1e-4)


def test_streaming_rnn_encoder_step_equivalence(rng):
    """Chunked step() output must equal offline forward (RNN encoder)."""
    from aps_tpu.streaming_asr.base.encoder import StreamingRNNEncoder
    enc = StreamingRNNEncoder(inp_features=16, out_features=8, hidden=16,
                              num_layers=2)
    inp = jnp.asarray(rng.standard_normal((2, 12, 16)), dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), inp, None)
    offline, _ = enc.apply(variables, inp, None)
    # chunked
    state = None
    outs = []
    for t in range(0, 12, 4):
        out, state = enc.apply(variables, inp[:, t:t + 4], state,
                               method="step")
        outs.append(out)
    online = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(online), np.asarray(offline),
                               atol=1e-5)


def test_streaming_ctc_asr(rng):
    transform = AsrTransform(feats="fbank-log-cmvn", frame_len=400,
                             frame_hop=160)
    nnet = aps_asr_nnet("streaming_asr@ctc")(
        input_size=80, vocab_size=20, asr_transform=transform,
        enc_type="pytorch_rnn",
        enc_kwargs={"hidden": 32, "num_layers": 1})
    x = jnp.asarray(rng.standard_normal((2, 8000)) * 0.1,
                    dtype=jnp.float32)
    x_len = jnp.asarray([8000, 8000])
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}
    variables = nnet.init(rngs, x, x_len, training=False)
    _, enc_ctc, _ = nnet.apply(variables, x, x_len, training=False)
    assert enc_ctc.shape[-1] == 20


def test_streaming_xfmr_ctc(rng):
    transform = AsrTransform(feats="fbank-log-cmvn", frame_len=400,
                             frame_hop=160)
    nnet = aps_asr_nnet("streaming_asr@ctc")(
        input_size=80, vocab_size=20, asr_transform=transform,
        enc_type="xfmr",
        enc_kwargs={"chunk": 4, "lctx": 2, "proj": "linear",
                    "num_layers": 2,
                    "arch_kwargs": {"att_dim": 32, "nhead": 4,
                                    "feedforward_dim": 64}})
    x = jnp.asarray(rng.standard_normal((2, 8000)) * 0.1,
                    dtype=jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}
    variables = nnet.init(rngs, x, None, training=False)
    _, enc_ctc, _ = nnet.apply(variables, x, None, training=False)
    assert enc_ctc.shape[-1] == 20
    assert np.isfinite(np.asarray(enc_ctc)).all()


def test_streaming_transducer(rng):
    transform = AsrTransform(feats="fbank-log-cmvn", frame_len=400,
                             frame_hop=160)
    nnet = aps_asr_nnet("streaming_asr@transducer")(
        input_size=80, vocab_size=20, asr_transform=transform,
        enc_type="pytorch_rnn", enc_proj=32,
        enc_kwargs={"hidden": 32, "num_layers": 1},
        dec_kwargs={"embed_size": 16, "jot_dim": 16, "hidden": 32,
                    "num_layers": 1})
    x = jnp.asarray(rng.standard_normal((2, 8000)) * 0.1,
                    dtype=jnp.float32)
    y = jnp.full((2, 5), 19, dtype=jnp.int32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}
    variables = nnet.init(rngs, x, None, y, training=False)
    _, dec_out, _ = nnet.apply(variables, x, None, y, training=False)
    assert dec_out.shape[-1] == 20
    # beam search works on the streaming model too
    from aps_tpu.asr.beam_search.transducer import greedy_search
    hyp = greedy_search(nnet, variables, x[0])
    assert len(hyp) == 1


@pytest.mark.parametrize("name", ["rt_sse@dfsmn", "rt_sse@freq_xfmr"])
def test_rt_sse_models(rng, name):
    transform = EnhTransform(feats="spectrogram-log-cmvn", frame_len=512,
                             frame_hop=256)
    if name == "rt_sse@dfsmn":
        nnet = aps_sse_nnet(name)(enh_transform=transform, dim=64,
                                  num_bins=257, num_layers=2, project=32,
                                  lctx=2, rctx=1, training_mode="time")
    else:
        nnet = aps_sse_nnet(name)(enh_transform=transform, num_bins=257,
                                  num_layers=2, chunk=4, lctx=2,
                                  arch_kwargs={"att_dim": 32, "nhead": 4,
                                               "feedforward_dim": 64},
                                  training_mode="time")
    mix = jnp.asarray(rng.standard_normal((2, 16384)) * 0.1,
                      dtype=jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}
    variables = nnet.init(rngs, mix, training=True)
    out = nnet.apply(variables, mix, training=True, rngs=rngs,
                     mutable=["batch_stats"])[0]
    assert out.shape[0] == 2
    assert np.isfinite(np.asarray(out)).all()


# ---------------------------------------------------------------------------
# offline == chunked-step equivalence for every streaming encoder family
# (the reference only smoke-tests these; per-layer caches make the xfmr/cfmr
# step path exactly reproduce the offline context-masked forward)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("arch,num_layers", [("xfmr", 3), ("cfmr", 2)])
def test_streaming_xfmr_step_equivalence(rng, arch, num_layers):
    from aps_tpu.streaming_asr.transformer.encoder import \
        StreamingTransformerEncoder
    chunk, lctx, T = 4, 2, 32
    arch_kwargs = {"att_dim": 32, "nhead": 4, "feedforward_dim": 64,
                   "att_dropout": 0.0, "ffn_dropout": 0.0}
    if arch == "cfmr":
        arch_kwargs["kernel_size"] = 7
    enc = StreamingTransformerEncoder(arch=arch, input_size=16,
                                      output_proj=8,
                                      num_layers=num_layers, chunk=chunk,
                                      lctx=lctx, proj="linear",
                                      arch_kwargs=arch_kwargs)
    inp = jnp.asarray(rng.standard_normal((2, T, 16)), dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), inp, None)
    offline, _ = enc.apply(variables, inp, None)
    state, outs = None, []
    for t in range(0, T, chunk):
        out, state = enc.apply(variables, inp[:, t:t + chunk], state,
                               method="step")
        outs.append(out)
    online = jnp.concatenate(outs, axis=1)
    np.testing.assert_allclose(np.asarray(online), np.asarray(offline),
                               atol=2e-5)


def test_streaming_fsmn_step_equivalence(rng):
    """Sliding-window step() == offline valid-conv forward (2-layer FSMN
    with memory residual)."""
    from aps_tpu.streaming_asr.base.encoder import StreamingFSMNEncoder
    lctx, rctx, L = 3, 1, 2
    enc = StreamingFSMNEncoder(inp_features=16, out_features=8, dim=32,
                               project=16, num_layers=L, lctx=lctx,
                               rctx=rctx, residual=True)
    T = 20
    inp = jnp.asarray(rng.standard_normal((2, T, 16)), dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), inp, None)
    offline, _ = enc.apply(variables, inp, None)
    # each step consumes a window covering the stacked receptive field and
    # emits one frame
    win = L * (lctx + rctx) + 1
    outs = []
    for t in range(T - win + 1):
        out, _ = enc.apply(variables, inp[:, t:t + win], None,
                           method="step")
        outs.append(out)
    online = jnp.concatenate(outs, axis=1)
    assert online.shape == offline.shape
    np.testing.assert_allclose(np.asarray(online), np.asarray(offline),
                               atol=2e-5)


@pytest.mark.parametrize("name", ["conv1d", "conv2d"])
def test_streaming_conv_step_equivalence(rng, name):
    """Sliding-window step() == offline valid-conv forward for the conv
    encoders (window/hop from compute_conv_context)."""
    from aps_tpu.streaming_asr.base.encoder import (StreamingConv1dEncoder,
                                                    StreamingConv2dEncoder)
    from aps_tpu.streaming_asr.utils import compute_conv_context
    L, kernel, stride = 2, 3, 2
    lctx, rctx, hop = compute_conv_context(L, kernel, stride)
    win = lctx + rctx + 1
    if name == "conv1d":
        enc = StreamingConv1dEncoder(inp_features=16, out_features=8,
                                     dim=32, num_layers=L, kernel=kernel,
                                     stride=stride)
    else:
        enc = StreamingConv2dEncoder(inp_features=16, out_features=-1,
                                     channel=4, num_layers=L, kernel=kernel,
                                     stride=stride)
    n_out = 4
    T = win + hop * (n_out - 1)
    inp = jnp.asarray(rng.standard_normal((2, T, 16)), dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), inp, None)
    offline, _ = enc.apply(variables, inp, None)
    outs = []
    for i in range(n_out):
        t = i * hop
        out, _ = enc.apply(variables, inp[:, t:t + win], None,
                           method="step")
        outs.append(out)
    online = jnp.concatenate(outs, axis=1)
    assert online.shape == offline.shape
    np.testing.assert_allclose(np.asarray(online), np.asarray(offline),
                               atol=2e-5)
