#!/usr/bin/env python
"""Toy streaming_asr@ctc checkpoint for demos/streaming_asr/rt_ctc.py."""
import os, pickle
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np, yaml
from aps_tpu.libs import aps_asr_nnet, aps_transform

import sys
cpt = sys.argv[1] if len(sys.argv) > 1 else "/tmp/stream_ctc_cpt"
os.makedirs(cpt, exist_ok=True)
tf_conf = dict(feats="fbank-log", frame_len=400, frame_hop=160,
               window="hamm", stft_mode="kaldi", audio_norm=True,
               num_mels=40)
nnet_conf = dict(input_size=40, vocab_size=32, lctx=6, rctx=6,
                 enc_type="fsmn", enc_proj=32,
                 enc_kwargs=dict(dim=48, project=24, num_layers=2,
                                 lctx=3, rctx=3, norm="LN"))
transform = aps_transform("asr")(**tf_conf)
nnet = aps_asr_nnet("streaming_asr@ctc")(asr_transform=transform,
                                         **nnet_conf)
wav = jnp.zeros((1, 16000), dtype=jnp.float32)
variables = nnet.init({"params": jax.random.PRNGKey(0),
                       "aug": jax.random.PRNGKey(1)}, wav, None,
                      training=False)
params = jax.device_get(variables["params"])
mstate = {k: jax.device_get(v) for k, v in variables.items()
          if k != "params"}
with open(os.path.join(cpt, "train.yaml"), "w") as f:
    yaml.dump({"nnet": "streaming_asr@ctc", "nnet_conf": nnet_conf,
               "asr_transform": tf_conf}, f)
with open(os.path.join(cpt, "best.ckpt"), "wb") as f:
    pickle.dump({"params": params, "mstate": mstate, "epoch": 0}, f)
print("wrote", cpt)
