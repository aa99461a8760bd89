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
    env = dict(os.environ, JAX_PLATFORMS="cpu")
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
