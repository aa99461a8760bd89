"""Export invariants (the TPU analog of the reference's TorchScript
test_jit_*.py suite): jax.export StableHLO round trips must reproduce
eager outputs for the deployment-facing model functions."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aps_tpu.libs import aps_sse_nnet
from aps_tpu.transform import EnhTransform


@pytest.fixture(scope="module")
def rt_dfsmn():
    transform = EnhTransform(feats="spectrogram-log", frame_len=256,
                             frame_hop=128)
    nnet = aps_sse_nnet("rt_sse@dfsmn")(enh_transform=transform,
                                        dim=32,
                                        num_bins=129,
                                        num_layers=2,
                                        project=16,
                                        lctx=2,
                                        rctx=2,
                                        norm="LN",
                                        complex_mask=True)
    mix = jnp.zeros((1, 4096), dtype=jnp.float32)
    variables = nnet.init(jax.random.PRNGKey(0), mix, training=False)
    return nnet, variables


def test_export_stablehlo_roundtrip(rt_dfsmn, rng):
    from jax import export as jexport
    nnet, variables = rt_dfsmn
    W = 2 * 2 + 1 + 2 * 2  # lctx_total + 1 + rctx_total

    def fn(feats):
        return nnet.apply(variables, feats, method="mask_predict")

    exported = jexport.export(jax.jit(fn))(
        jax.ShapeDtypeStruct((1, W, 129), jnp.float32))
    blob = exported.serialize()
    assert len(blob) > 0
    reloaded = jexport.deserialize(bytearray(blob))
    feats = jnp.asarray(rng.standard_normal((1, W, 129)),
                        dtype=jnp.float32)
    np.testing.assert_allclose(np.asarray(reloaded.call(feats)),
                               np.asarray(fn(feats)), atol=1e-5)


def test_export_streaming_step_equals_offline(rt_dfsmn, rng):
    """The exported per-chunk function must agree with the offline padded
    forward on the center frame (the C++ runtime invariant)."""
    nnet, variables = rt_dfsmn
    W = 9
    T = 20
    feats = jnp.asarray(rng.standard_normal((1, T + 8, 129)) * 0.1,
                        dtype=jnp.float32)
    # offline: the full context-extended block in one pass (valid convs
    # consume the 8 context frames -> T mask frames)
    offline = nnet.apply(variables, feats, method="mask_predict")
    assert offline.shape[1] == T
    # streaming: sliding context windows, one frame per call
    outs = []
    for t in range(T):
        mask = nnet.apply(variables, feats[:, t:t + W],
                          method="mask_predict")
        assert mask.shape[1] == 1
        outs.append(mask[:, 0])
    stream = jnp.stack(outs, 1)
    np.testing.assert_allclose(np.asarray(stream), np.asarray(offline),
                               atol=1e-5)
