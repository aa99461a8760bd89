"""Registry / plug-in machinery tests (parity: reference
tests/python/test_function.py — dynamic_importlib against fake user code,
registry completeness)."""

import pathlib

import jax
import jax.numpy as jnp
import numpy as np
import pytest

DATA = pathlib.Path(__file__).parent / "data" / "external"


def test_dynamic_importlib_nnet():
    from aps_tpu.libs import dynamic_importlib
    cls = dynamic_importlib(f"{DATA / 'nnet.py'}:MyCustomNet")
    nnet = cls(input_size=16, output_size=4)
    x = jnp.zeros((2, 16))
    variables = nnet.init(jax.random.PRNGKey(0), x)
    out = nnet.apply(variables, x)
    assert out.shape == (2, 4)


def test_dynamic_importlib_task():
    from aps_tpu.libs import dynamic_importlib
    nnet_cls = dynamic_importlib(f"{DATA / 'nnet.py'}:MyCustomNet")
    task_cls = dynamic_importlib(f"{DATA / 'task.py'}:MyCustomTask")
    task = task_cls(nnet=nnet_cls(input_size=16, output_size=4))
    egs = {"x": jnp.zeros((2, 16)), "y": jnp.ones((2, 4))}
    variables = task.init(jax.random.PRNGKey(0), egs)
    out = task.apply(variables, egs)
    assert np.isfinite(float(out["loss"]))


def test_registry_contains_reference_model_names():
    """Registry parity: every model name published by the reference must
    resolve (SURVEY.md section 2 inventory)."""
    from aps_tpu.libs import (aps_asr_nnet, aps_sse_nnet, aps_task,
                              aps_dataloader, aps_trainer, aps_transform)
    for name in ("asr@ctc", "asr@att", "asr@xfmr", "asr@transducer",
                 "asr@xfmr_transducer", "asr@enh_att", "asr@enh_xfmr",
                 "asr@rnn_lm", "asr@xfmr_lm", "streaming_asr@ctc",
                 "streaming_asr@transducer"):
        assert aps_asr_nnet(name) is not None
    for name in ("sse@base_rnn", "sse@time_tcn", "sse@freq_tcn",
                 "sse@time_dprnn", "sse@freq_dprnn", "sse@time_sepformer",
                 "sse@freq_sepformer", "sse@dccrn", "sse@dcunet",
                 "sse@phasen", "sse@demucs", "sse@chimera++",
                 "sse@dense_unet", "sse@freq_xfmr", "sse@dfsmn",
                 "sse@rnn_enh_ml", "rt_sse@dfsmn", "rt_sse@freq_xfmr"):
        assert aps_sse_nnet(name) is not None
    from aps_tpu.libs import ApsModules, ApsRegisters, import_module_list
    import_module_list(ApsModules.task_submodules)
    import_module_list(ApsModules.loader_submodules)
    for name in ("asr@ctc", "asr@ctc_xent", "asr@transducer", "asr@lm",
                 "sse@sisnr", "sse@snr", "sse@wa", "sse@freq_linear_sa",
                 "sse@freq_mel_sa", "sse@time_linear_sa",
                 "sse@time_mel_sa", "sse@complex_mapping",
                 "sse@complex_masking", "sse@enh_ml", "sse@ts"):
        assert name in ApsRegisters.task
    for name in ("am@raw", "am@kaldi", "am@simu_cmd", "se@chunk",
                 "se@config", "se@simu_cmd", "lm@utt", "lm@bptt"):
        assert name in ApsRegisters.loader
    assert aps_trainer("dp") is not None
    assert aps_transform("asr") is not None
    assert aps_transform("enh") is not None


def test_unknown_name_raises():
    from aps_tpu.libs import aps_asr_nnet
    with pytest.raises(ValueError):
        aps_asr_nnet("asr@no_such_model")
