"""ASR network tests: forward smoke + shape checks over encoder/attention/
model combos (mirrors reference tests/python/test_nnet_asr.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aps_tpu.libs import aps_asr_nnet
from aps_tpu.transform import AsrTransform


def make_egs(rng, N=2, S=16000, To=8, vocab=20):
    x = jnp.asarray(rng.standard_normal((N, S)) * 0.1, dtype=jnp.float32)
    x_len = jnp.asarray([S, S - 1600])
    y = jnp.asarray(rng.integers(0, vocab - 1, (N, To)))
    y_len = jnp.asarray([To, To - 2])
    return x, x_len, y, y_len


TRANSFORM = AsrTransform(feats="fbank-log-cmvn", frame_len=400, frame_hop=160,
                         window="hamm")

RNN_ENC_KW = {"rnn": "lstm", "num_layers": 2, "hidden": 32,
              "bidirectional": True, "dropout": 0.1}
XFMR_ENC_KW = {
    "proj": "conv2d",
    "proj_kwargs": {"conv_channels": 8, "num_layers": 2},
    "pose": "abs",
    "pose_kwargs": {},
    "num_layers": 2,
    "arch_kwargs": {"att_dim": 32, "nhead": 4, "feedforward_dim": 64},
}


def init_and_apply(nnet, *args, method=None, **kwargs):
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "aug": jax.random.PRNGKey(2),
            "ss": jax.random.PRNGKey(3)}
    variables = nnet.init(rngs, *args, **kwargs)
    out = nnet.apply(variables, *args, **kwargs,
                     rngs={k: v for k, v in rngs.items() if k != "params"},
                     mutable=["batch_stats"])
    return out[0]


@pytest.mark.parametrize("enc_type,enc_kwargs", [
    ("pytorch_rnn", RNN_ENC_KW),
    ("jit_lstm", {"num_layers": 2, "hidden": 32, "bidirectional": False}),
    ("variant_rnn", {"hidden": 32, "num_layers": 2, "norm": "LN",
                     "pyramid_stack": True}),
    ("conv1d", {"dim": 32, "num_layers": 2, "norm": "BN"}),
    ("conv2d", {"channel": 8, "num_layers": 2, "kernel": 3, "stride": 2}),
    ("fsmn", {"dim": 32, "project": 16, "num_layers": 2}),
])
def test_encoders(rng, enc_type, enc_kwargs):
    from aps_tpu.asr.base.encoder import BaseEncoder, encoder_instance
    enc = encoder_instance(enc_type, 80, 32, enc_kwargs, BaseEncoder)
    inp = jnp.asarray(rng.standard_normal((2, 50, 80)), dtype=jnp.float32)
    inp_len = jnp.asarray([50, 40])
    out, out_len = init_and_apply(enc, inp, inp_len, training=True)
    assert out.shape[0] == 2 and out.shape[-1] == 32
    if out_len is not None:
        assert int(out_len[0]) == out.shape[1] or enc_type in (
            "conv1d", "conv2d", "variant_rnn")


def test_concat_encoder(rng):
    from aps_tpu.asr.base.encoder import BaseEncoder, encoder_instance
    enc_kwargs = {
        "conv2d": {"channel": 8, "num_layers": 2},
        "pytorch_rnn": {"hidden": 32, "num_layers": 1,
                        "bidirectional": False},
    }
    enc = encoder_instance("concat", 80, 32, enc_kwargs, BaseEncoder)
    inp = jnp.asarray(rng.standard_normal((2, 60, 80)), dtype=jnp.float32)
    out, out_len = init_and_apply(enc, inp, jnp.asarray([60, 50]),
                                  training=False)
    assert out.shape[0] == 2 and out.shape[-1] == 32


@pytest.mark.parametrize("att_type", ["dot", "ctx", "loc", "mhdot", "mhctx",
                                      "mhloc"])
def test_att_asr_forward(rng, att_type):
    x, x_len, y, y_len = make_egs(rng, vocab=20)
    nnet = aps_asr_nnet("asr@att")(
        input_size=80, vocab_size=20, sos=18, eos=19, ctc=True,
        asr_transform=TRANSFORM, att_type=att_type,
        att_kwargs={"att_dim": 16},
        enc_type="pytorch_rnn", enc_proj=32, enc_kwargs=RNN_ENC_KW,
        dec_dim=32, dec_kwargs={"hidden": 32, "num_layers": 1})
    dec_out, enc_ctc, enc_len = init_and_apply(nnet, x, x_len, y, y_len,
                                               training=True)
    assert dec_out.shape[:2] == (2, 8)
    assert dec_out.shape[-1] == 19  # vocab - 1 with ctc
    assert enc_ctc.shape[-1] == 20
    assert np.isfinite(np.asarray(dec_out)).all()


@pytest.mark.parametrize("arch,pose", [("xfmr", "abs"), ("xfmr", "rel"),
                                       ("xfmr", "xl"), ("cfmr", "abs"),
                                       ("cfmr", "rel"), ("cfmr", "xl"),
                                       ("xfmr", "conv1d")])
@pytest.mark.medium
def test_xfmr_asr_forward(rng, arch, pose):
    x, x_len, y, y_len = make_egs(rng, vocab=20)
    enc_kwargs = dict(XFMR_ENC_KW)
    enc_kwargs["pose"] = pose
    if pose == "conv1d":
        enc_kwargs["pose_kwargs"] = {"kernel": 9, "groups": 4}
    if arch == "cfmr":
        enc_kwargs["arch_kwargs"] = dict(enc_kwargs["arch_kwargs"],
                                         kernel_size=7)
    nnet = aps_asr_nnet("asr@xfmr")(
        input_size=80, vocab_size=20, sos=18, eos=19, ctc=True,
        asr_transform=TRANSFORM, enc_type=arch, enc_kwargs=enc_kwargs,
        dec_kwargs={"num_layers": 2,
                    "arch_kwargs": {"att_dim": 32, "nhead": 4,
                                    "feedforward_dim": 64}})
    dec_out, enc_ctc, enc_len = init_and_apply(nnet, x, x_len, y, y_len,
                                               training=True)
    assert dec_out.shape[:2] == (2, 8) and dec_out.shape[-1] == 19
    assert np.isfinite(np.asarray(dec_out)).all()


def test_ctc_asr(rng):
    x, x_len, _, _ = make_egs(rng)
    nnet = aps_asr_nnet("asr@ctc")(input_size=80, vocab_size=20,
                                   asr_transform=TRANSFORM,
                                   enc_type="pytorch_rnn", enc_proj=-1,
                                   enc_kwargs=RNN_ENC_KW)
    _, enc_ctc, enc_len = init_and_apply(nnet, x, x_len, training=True)
    assert enc_ctc.shape[-1] == 20


@pytest.mark.parametrize("name", ["asr@transducer", "asr@xfmr_transducer"])
def test_transducer_forward(rng, name):
    x, x_len, y, y_len = make_egs(rng, To=6, vocab=20)
    blank = 19
    y_blank = jnp.concatenate(
        [jnp.full((2, 1), blank, dtype=y.dtype), y], axis=-1)
    if name == "asr@transducer":
        dec_kwargs = {"embed_size": 16, "jot_dim": 16, "hidden": 32,
                      "num_layers": 1}
    else:
        dec_kwargs = {"jot_dim": 16, "att_dim": 32,
                      "arch_kwargs": {"att_dim": 32, "nhead": 4,
                                      "feedforward_dim": 64},
                      "num_layers": 1}
    nnet = aps_asr_nnet(name)(input_size=80, vocab_size=20,
                              asr_transform=TRANSFORM,
                              enc_type="pytorch_rnn", enc_proj=32,
                              enc_kwargs=RNN_ENC_KW,
                              dec_kwargs=dec_kwargs)
    enc_out, dec_out, enc_len = init_and_apply(nnet, x, x_len, y_blank,
                                               y_len + 1, training=True)
    assert dec_out.shape[:3] == (2, enc_out.shape[1], 7)
    assert dec_out.shape[-1] == 20


@pytest.mark.parametrize("name,kwargs", [
    ("asr@rnn_lm", {"embed_size": 16, "hidden_size": 32, "num_layers": 1}),
    ("asr@xfmr_lm", {"num_layers": 2,
                     "arch_kwargs": {"att_dim": 32, "nhead": 4,
                                     "feedforward_dim": 64}}),
])
def test_lm_forward(rng, name, kwargs):
    tok = jnp.asarray(rng.integers(0, 20, (4, 10)))
    nnet = aps_asr_nnet(name)(vocab_size=20, **kwargs)
    out, hidden = init_and_apply(nnet, tok, training=True)
    assert out.shape == (4, 10, 20)
    assert np.isfinite(np.asarray(out)).all()


def test_rnnt_loss_brute_force(rng):
    """Verify the scan-based rnnt loss against a naive DP."""
    from aps_tpu.ops.rnnt import rnnt_loss
    N, T, U, V, blank = 2, 5, 3, 6, 0
    logits = jnp.asarray(rng.standard_normal((N, T, U + 1, V)),
                         dtype=jnp.float32)
    labels = jnp.asarray(rng.integers(1, V, (N, U)))
    t_lens = jnp.asarray([T, T - 1])
    u_lens = jnp.asarray([U, U - 1])
    ours = rnnt_loss(logits, labels, t_lens, u_lens, blank=blank,
                     reduction="none")

    def naive(lp, lab, Tn, Un):
        import math
        alpha = {}
        def get(t, u):
            return alpha.get((t, u), -1e30)
        alpha[(0, 0)] = 0.0
        for t in range(Tn):
            for u in range(Un + 1):
                if t == 0 and u == 0:
                    continue
                cands = []
                if t > 0:
                    cands.append(get(t - 1, u) + lp[t - 1, u, blank])
                if u > 0:
                    cands.append(get(t, u - 1) + lp[t, u - 1, lab[u - 1]])
                m = max(cands)
                alpha[(t, u)] = m + math.log(
                    sum(math.exp(c - m) for c in cands))
        return -(get(Tn - 1, Un) + lp[Tn - 1, Un, blank])

    lp = np.asarray(jax.nn.log_softmax(logits, -1))
    for n in range(N):
        ref = naive(lp[n], np.asarray(labels[n]), int(t_lens[n]),
                    int(u_lens[n]))
        np.testing.assert_allclose(float(ours[n]), ref, rtol=1e-4)


@pytest.mark.parametrize("enh_type", ["google_clp", "rnn_mask_mvdr",
                                      "time_invar", "time_variant"])
@pytest.mark.medium
def test_enh_att_asr(rng, enh_type):
    from aps_tpu.transform import EnhTransform
    enh_transform = EnhTransform(feats="spectrogram-log-cmvn",
                                 frame_len=512, frame_hop=256)
    # input feature size to ASR depends on the front-end output
    if enh_type == "google_clp":
        enh_kwargs = {"num_bins": 257, "num_channels": 3,
                      "spatial_filters": 2, "spectra_filters": 40}
        asr_input = 2 * 40
    elif enh_type == "rnn_mask_mvdr":
        enh_kwargs = {"num_bins": 257, "hidden_size": 32, "num_layers": 1}
        asr_input = 257
    elif enh_type == "time_invar":
        enh_kwargs = {"num_bins": 257, "num_channels": 3,
                      "spatial_filters": 2, "spectra_filters": 40}
        asr_input = 2 * 40
    else:
        enh_kwargs = {"num_bins": 257, "num_channels": 3,
                      "time_reception": 3, "spatial_filters": 2,
                      "spectra_filters": 40}
        asr_input = 2 * 40
    nnet = aps_asr_nnet("asr@enh_att")(
        input_size=asr_input, vocab_size=20, sos=17, eos=18, ctc=True,
        enh_transform=enh_transform, enh_type=enh_type,
        enh_kwargs=enh_kwargs,
        att_type="dot", att_kwargs={"att_dim": 16},
        enc_type="pytorch_rnn", enc_proj=32,
        enc_kwargs={"hidden": 32, "num_layers": 1},
        dec_kwargs={"hidden": 32, "num_layers": 1})
    x = jnp.asarray(rng.standard_normal((2, 3, 16384)) * 0.1,
                    dtype=jnp.float32)
    x_len = jnp.asarray([16384, 16384])
    y = jnp.asarray(rng.integers(0, 16, (2, 6)))
    dec_out, enc_ctc, enc_len = init_and_apply(nnet, x, x_len, y,
                                               jnp.asarray([6, 5]),
                                               training=True)
    assert dec_out.shape[:2] == (2, 6)
    assert np.isfinite(np.asarray(dec_out)).all()


@pytest.mark.medium
def test_encoder_remat_gradients_match(rng):
    """remat=true rematerializes layers in backward: same values/grads."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from aps_tpu.asr.transformer.impl import get_xfmr_encoder

    kwargs = dict(att_dim=32, nhead=2, feedforward_dim=64,
                  att_dropout=0.0, ffn_dropout=0.0)
    enc = get_xfmr_encoder("xfmr", "abs", 2, dict(kwargs))
    enc_remat = get_xfmr_encoder("xfmr", "abs", 2,
                                 dict(kwargs, remat=True))
    x = jnp.asarray(rng.standard_normal((2, 32, 32)) * 0.1,
                    dtype=jnp.float32)
    variables = enc.init(jax.random.PRNGKey(0), x)

    def loss(params, module):
        out = module.apply(params, x, training=True,
                           rngs={"dropout": jax.random.PRNGKey(1)})
        return jnp.sum(out**2)

    v0, g0 = jax.value_and_grad(loss)(variables, enc)
    v1, g1 = jax.value_and_grad(loss)(variables, enc_remat)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=1e-5)
