"""SSE task-level tests: few fwd/bwd iterations, assert finite losses
(mirrors reference tests/python/test_task_sse.py:42-60 run_epochs)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aps_tpu.libs import aps_sse_nnet, aps_task
from aps_tpu.transform import EnhTransform


def build_toy(num_spks=2, training_mode="time", num_bins=257):
    transform = EnhTransform(feats="spectrogram-log-cmvn",
                             frame_len=512, frame_hop=256)
    nnet_cls = aps_sse_nnet("sse@base_rnn")
    return nnet_cls(enh_transform=transform,
                    input_size=num_bins,
                    num_bins=num_bins,
                    num_spks=num_spks,
                    hidden=64,
                    num_layers=1,
                    training_mode=training_mode)


def run_steps(task, egs, n=2):
    """A couple of grad steps with plain SGD, return losses."""
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "aug": jax.random.PRNGKey(2)}
    variables = task.init(rngs, egs, training=True)
    params = variables["params"]

    @jax.jit
    def step(params, egs, key):
        def loss_fn(p):
            out = task.apply({"params": p}, egs, training=True,
                             rngs={"dropout": key, "aug": key})
            return out["loss"], out
        (loss, out), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params = jax.tree_util.tree_map(lambda p, g: p - 1e-3 * g, params,
                                        grads)
        return params, loss

    losses = []
    for i in range(n):
        params, loss = step(params, egs, jax.random.PRNGKey(i))
        losses.append(float(loss))
    return losses


@pytest.mark.parametrize("task_name,kwargs", [
    ("sse@sisnr", {"num_spks": 2}),
    ("sse@snr", {"num_spks": 2}),
    ("sse@wa", {"num_spks": 2, "objf_name": "L1"}),
])
def test_time_domain_tasks(rng, task_name, kwargs):
    nnet = build_toy(num_spks=2, training_mode="time")
    task = aps_task(task_name, nnet, **kwargs)
    egs = {
        "mix": jnp.asarray(rng.standard_normal((4, 16384)),
                           dtype=jnp.float32),
        "ref": [jnp.asarray(rng.standard_normal((4, 16384)),
                            dtype=jnp.float32) for _ in range(2)],
    }
    losses = run_steps(task, egs)
    assert all(np.isfinite(l) for l in losses)


@pytest.mark.parametrize("task_name,kwargs", [
    ("sse@freq_linear_sa", {"num_spks": 2, "objf_name": "L2"}),
    ("sse@freq_linear_sa", {"num_spks": 2, "phase_sensitive": True,
                            "truncated": 1.0}),
    ("sse@freq_mel_sa", {"num_spks": 2, "num_bins": 257, "mel_log": True}),
])
def test_freq_sa_tasks(rng, task_name, kwargs):
    nnet = build_toy(num_spks=2, training_mode="freq")
    task = aps_task(task_name, nnet, **kwargs)
    egs = {
        "mix": jnp.asarray(rng.standard_normal((4, 16384)),
                           dtype=jnp.float32),
        "ref": [jnp.asarray(rng.standard_normal((4, 16384)),
                            dtype=jnp.float32) for _ in range(2)],
    }
    losses = run_steps(task, egs)
    assert all(np.isfinite(l) for l in losses)


@pytest.mark.parametrize("task_name,kwargs", [
    ("sse@time_linear_sa", {"num_spks": 2, "frame_len": 512,
                            "frame_hop": 256}),
    ("sse@time_mel_sa", {"num_spks": 2, "frame_len": 512, "frame_hop": 256,
                         "num_bins": 257}),
])
def test_time_sa_tasks(rng, task_name, kwargs):
    nnet = build_toy(num_spks=2, training_mode="time")
    task = aps_task(task_name, nnet, **kwargs)
    egs = {
        "mix": jnp.asarray(rng.standard_normal((4, 16384)),
                           dtype=jnp.float32),
        "ref": [jnp.asarray(rng.standard_normal((4, 16384)),
                            dtype=jnp.float32) for _ in range(2)],
    }
    losses = run_steps(task, egs)
    assert all(np.isfinite(l) for l in losses)


def test_pit_permutation_invariance(rng):
    """PIT loss must be invariant to reference ordering."""
    from aps_tpu.task.objf import permu_invarint_objf, sisnr_objf
    a = jnp.asarray(rng.standard_normal((3, 8192)), dtype=jnp.float32)
    b = jnp.asarray(rng.standard_normal((3, 8192)), dtype=jnp.float32)
    est = [a + 0.1, b - 0.1]
    objf = lambda x, s: -sisnr_objf(x, s)
    l1 = permu_invarint_objf(est, [a, b], objf)
    l2 = permu_invarint_objf(est, [b, a], objf)
    np.testing.assert_allclose(np.asarray(l1), np.asarray(l2), rtol=1e-5)
