"""Multi-host smoke tests: two real CPU processes through the distributed
facade (the reference had zero multi-process tests — SURVEY.md §4 lesson)."""

import os
import socket
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_CHILD = """
import sys
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np
import aps_tpu.distributed as distributed

pid = int(sys.argv[1])
distributed.init("jax", coordinator_address="127.0.0.1:{port}",
                 num_processes=2, process_id=pid)
assert distributed.rank() == pid
assert distributed.world_size() == 2
mean = distributed.all_reduce(np.asarray([float(pid + 1)]))
np.testing.assert_allclose(mean, [1.5])
total = distributed.all_reduce(np.asarray([float(pid + 1)]), average=False)
np.testing.assert_allclose(total, [3.0])
print("child", pid, "ok")
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def test_two_process_allreduce():
    env = dict(os.environ, JAX_PLATFORMS="cpu",
               PYTHONPATH=os.pathsep.join(
                   [REPO, os.environ.get("PYTHONPATH", "")]))
    env.pop("PALLAS_AXON_POOL_IPS", None)
    code = _CHILD.format(port=_free_port())
    procs = [
        subprocess.Popen([sys.executable, "-c", code, str(i)], env=env,
                         cwd=REPO, stdout=subprocess.PIPE,
                         stderr=subprocess.STDOUT, text=True)
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out = p.communicate()[0] or "TIMEOUT"
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out[-2000:]}"
        assert f"child {i} ok" in out


def test_sharded_batched_decode_matches_unsharded():
    """Data-parallel decoding: beam_search_batch(mesh=...) shards the
    batch over the 8-device mesh and must return exactly the same nbest
    lists as the single-device run (GSPMD runs one search per shard)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from aps_tpu.asr.beam_search import transformer as api
    from aps_tpu.libs import aps_asr_nnet
    from aps_tpu.parallel import build_mesh
    from aps_tpu.transform import AsrTransform

    V = 32
    nnet = aps_asr_nnet("asr@xfmr")(
        input_size=80, vocab_size=V, sos=V - 2, eos=V - 1, ctc=True,
        asr_transform=AsrTransform(feats="fbank-log", frame_len=400,
                                   frame_hop=160),
        enc_type="xfmr", enc_kwargs={
            "num_layers": 2, "pose": "abs",
            "arch_kwargs": {"att_dim": 32, "nhead": 2,
                            "feedforward_dim": 64},
        },
        dec_kwargs={"num_layers": 2,
                    "arch_kwargs": {"att_dim": 32, "nhead": 2,
                                    "feedforward_dim": 64}})
    rng = np.random.default_rng(5)
    rngs = {k: jax.random.PRNGKey(i) for i, k in enumerate(
        ["params", "dropout", "aug", "ss"])}
    S = 8000
    x0 = jnp.asarray(rng.standard_normal(S) * 0.1, dtype=jnp.float32)
    variables = nnet.init(rngs, x0[None], None,
                          jnp.zeros((1, 4), dtype=jnp.int32), None,
                          training=False)
    batch = [
        jnp.asarray(rng.standard_normal(S) * 0.1, dtype=jnp.float32)
        for _ in range(8)
    ]
    kwargs = dict(sos=V - 2, eos=V - 1, beam_size=4, nbest=2, max_len=6,
                  ctc_weight=0.3, allow_partial=True)
    plain = api.beam_search_batch(nnet, variables, batch, **kwargs)
    mesh = build_mesh()
    sharded = api.beam_search_batch(nnet, variables, batch, mesh=mesh,
                                    **kwargs)
    assert len(plain) == len(sharded) == 8
    for p, s in zip(plain, sharded):
        assert [h["trans"] for h in p] == [h["trans"] for h in s]
        np.testing.assert_allclose([h["score"] for h in p],
                                   [h["score"] for h in s], rtol=1e-5)
