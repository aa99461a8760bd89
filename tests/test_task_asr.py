"""ASR task tests: loss finiteness + gradient flow for ctc/ctc_xent/
transducer/lm tasks (mirrors reference tests/python/test_task_asr.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aps_tpu.const import IGNORE_ID
from aps_tpu.libs import aps_asr_nnet, aps_task
from aps_tpu.transform import AsrTransform

TRANSFORM = AsrTransform(feats="fbank-log-cmvn", frame_len=400,
                         frame_hop=160)
RNN_ENC_KW = {"rnn": "lstm", "num_layers": 2, "hidden": 32,
              "bidirectional": True, "dropout": 0.1}


def make_egs(rng, N=2, S=16000, To=8, vocab=20):
    tgt = rng.integers(0, vocab - 3, (N, To))
    tgt[1, To - 2:] = IGNORE_ID
    return {
        "#utt": N,
        "#tok": int(To + To - 2 + 2),
        "src_pad": jnp.asarray(rng.standard_normal((N, S)) * 0.1,
                               dtype=jnp.float32),
        "src_len": jnp.asarray([S, S - 1600]),
        "tgt_pad": jnp.asarray(tgt),
        "tgt_len": jnp.asarray([To, To - 2]),
    }


def run_loss_and_grad(task, egs):
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "aug": jax.random.PRNGKey(2),
            "ss": jax.random.PRNGKey(3)}
    variables = task.init(rngs, egs, training=True)
    params = variables["params"]

    def loss_fn(p):
        out, _ = task.apply({"params": p, **{k: v for k, v in
                                             variables.items()
                                             if k != "params"}},
                            egs, training=True,
                            rngs={k: v for k, v in rngs.items()
                                  if k != "params"},
                            mutable=["batch_stats"])
        return out["loss"], out

    (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
    gnorm = float(jnp.sqrt(sum(jnp.sum(g**2) for g in
                               jax.tree_util.tree_leaves(grads))))
    return float(loss), gnorm, out


@pytest.mark.medium
def test_ctc_task(rng):
    egs = make_egs(rng)
    nnet = aps_asr_nnet("asr@ctc")(input_size=80, vocab_size=20,
                                   asr_transform=TRANSFORM,
                                   enc_type="pytorch_rnn",
                                   enc_kwargs=RNN_ENC_KW)
    task = aps_task("asr@ctc", nnet, blank=19)
    loss, gnorm, _ = run_loss_and_grad(task, egs)
    assert np.isfinite(loss) and np.isfinite(gnorm) and gnorm > 0


@pytest.mark.parametrize("lsm,ctc_weight", [(0, 0), (0.1, 0), (0.1, 0.5)])
@pytest.mark.medium
def test_ctc_xent_task(rng, lsm, ctc_weight):
    egs = make_egs(rng)
    egs["#ssr"] = jnp.float32(0.2)
    nnet = aps_asr_nnet("asr@att")(
        input_size=80, vocab_size=20, sos=17, eos=18, ctc=ctc_weight > 0,
        asr_transform=TRANSFORM, att_type="ctx", att_kwargs={"att_dim": 16},
        enc_type="pytorch_rnn", enc_proj=32, enc_kwargs=RNN_ENC_KW,
        dec_kwargs={"hidden": 32, "num_layers": 1})
    task = aps_task("asr@ctc_xent", nnet, lsm_factor=lsm, blank=19,
                    ctc_weight=ctc_weight)
    loss, gnorm, out = run_loss_and_grad(task, egs)
    assert np.isfinite(loss) and gnorm > 0
    assert 0 <= float(out["accu"]) <= 1


@pytest.mark.medium
def test_transducer_task(rng):
    egs = make_egs(rng, To=6)
    nnet = aps_asr_nnet("asr@transducer")(
        input_size=80, vocab_size=20, asr_transform=TRANSFORM,
        enc_type="pytorch_rnn", enc_proj=32, enc_kwargs=RNN_ENC_KW,
        dec_kwargs={"embed_size": 16, "jot_dim": 16, "hidden": 32,
                    "num_layers": 1})
    task = aps_task("asr@transducer", nnet, blank=19)
    loss, gnorm, _ = run_loss_and_grad(task, egs)
    assert np.isfinite(loss) and loss > 0 and gnorm > 0


def test_lm_task(rng):
    egs = {
        "#utt": 4,
        "#tok": 4 * 10,
        "src": jnp.asarray(rng.integers(0, 20, (4, 10))),
        "tgt": jnp.asarray(rng.integers(0, 20, (4, 10))),
        "len": jnp.full((4,), 10),
    }
    nnet = aps_asr_nnet("asr@rnn_lm")(vocab_size=20, embed_size=16,
                                      hidden_size=32, num_layers=1)
    task = aps_task("asr@lm", nnet, reduction="mean")
    loss, gnorm, out = run_loss_and_grad(task, egs)
    assert np.isfinite(loss) and gnorm > 0
    # initial per-token xent should be close to log(V)
    assert abs(loss - np.log(20)) < 1.0
