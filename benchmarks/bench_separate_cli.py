"""Measure the FULL cmd/separate.py CLI RTF on chip (pipelined IO),
full-size Conv-TasNet, 4 s 8 kHz wavs, bf16, warm compile cache.
Two corpus sizes: 32 utts / batch 8 (the round-3 configuration — small
enough that the one-time first-dispatch cost dominates) and 256 utts /
batch 32 (the deployment-shaped number: startup amortized, steady state
~85 ms per 32-utt batch)."""
import pathlib as _pl
import sys as _sys

ROOT = str(_pl.Path(__file__).resolve().parent.parent)
_sys.path.insert(0, ROOT)

import os
import pickle
import pathlib
import subprocess
import sys

# the axon chip is single-tenant: keep the parent on CPU so the
# subprocess CLI owns the chip. sitecustomize force-registers the axon
# plugin and overrides jax_platforms, so the env var alone is not
# enough (tests/conftest.py note) — override the config after import.
CHIP_ENV = dict(os.environ)

import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import yaml

from aps_tpu.libs import aps_sse_nnet
from aps_tpu.io import write_audio

root = pathlib.Path("/tmp/sep_cli_bench")
root.mkdir(parents=True, exist_ok=True)
conf = {
    "nnet": "sse@time_tcn",
    "nnet_conf": {"L": 20, "N": 256, "X": 8, "R": 4, "B": 256, "H": 512,
                  "num_spks": 2, "non_linear": "relu"},
    "task": "sse@sisnr",
    "task_conf": {"num_spks": 2},
    "data_conf": {"fmt": "se@chunk", "loader": {}},
    "trainer_conf": {},
}
cpt = root / "cpt"
cpt.mkdir(exist_ok=True)
(cpt / "train.yaml").write_text(yaml.dump(conf))
nnet = aps_sse_nnet("sse@time_tcn")(**conf["nnet_conf"])
mix0 = jax.random.normal(jax.random.PRNGKey(0), (2, 32000)) * 0.1
variables = nnet.init({"params": jax.random.PRNGKey(0),
                       "dropout": jax.random.PRNGKey(1)}, mix0,
                      training=False)
with open(cpt / "best.ckpt", "wb") as fd:
    pickle.dump({"epoch": 1,
                 "params": jax.device_get(variables["params"]),
                 "mstate": jax.device_get(
                     {k: v for k, v in variables.items()
                      if k != "params"})}, fd)
rng = np.random.default_rng(0)
for n in (32, 256):
    with open(root / f"mix{n}.scp", "w") as fd:
        for i in range(n):
            if not (root / f"m{i}.wav").exists():
                wav = (0.1 * rng.standard_normal(32000)).astype(np.float32)
                write_audio(str(root / f"m{i}.wav"), wav, sr=8000)
            fd.write(f"utt{i} {root}/m{i}.wav\n")
# mixed-length corpus (0.5-13 s, wsj0-2mix-like spread): exercises the
# round-5 length planner — without it every occupied pad-grid point
# compiled its own program (~12.5 s fixed each through the tunnel)
with open(root / "mixvar256.scp", "w") as fd:
    for i in range(256):
        if not (root / f"v{i}.wav").exists():
            S = int(8000 * (0.5 + 12.5 * rng.random()))
            wav = (0.1 * rng.standard_normal(S)).astype(np.float32)
            write_audio(str(root / f"v{i}.wav"), wav, sr=8000)
        fd.write(f"utt{i} {root}/v{i}.wav\n")
# 2 runs per config (first 32-utt run also warms the compile cache):
# every subprocess pays the tunnel's first-host-fetch session stall
# (~2 min on a degraded day, probed 72-840+ s on 2026-08-20) in CLI
# setup — the data-plane warm-up in cmd/separate.py keeps it out of
# the logged RTF, but 3 repeats per config would burn an hour of wall
runs = [(32, 8), (32, 8), (256, 32), (256, 32),
        ("var256", 32), ("var256", 32)]
for i, (n, bs) in enumerate(runs):  # first run warms the compile cache
    # NOTE: PYTHONPATH=/root/repo breaks the axon plugin's registration
    # in the child (verified: even `python -c "import jax"` then fails to
    # see the backend) — insert the repo root at runtime instead
    argv = ["cmd/separate.py", str(root / f"mix{n}.scp"),
            str(root / f"out{i}"), "--checkpoint", str(cpt), "--sr",
            "8000", "--dtype", "bfloat16", "--batch-size", str(bs)]
    proc = subprocess.run(
        [sys.executable, "-c",
         f"import sys, runpy; sys.path.insert(0, {ROOT!r}); "
         f"sys.argv = {argv!r}; "
         f"runpy.run_path({ROOT + '/cmd/separate.py'!r}, "
         "run_name='__main__')"],
        capture_output=True, text=True, cwd=ROOT, env=CHIP_ENV)
    line = [ln for ln in (proc.stdout + proc.stderr).splitlines()
            if "RTF" in ln]
    print(f"run {i} (n={n} bs={bs}): rc={proc.returncode} {line[-1] if line else proc.stderr[-400:]}")
