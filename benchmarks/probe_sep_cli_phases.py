"""Replicate the exact cmd/separate.py batch loop with per-batch
timers: read -> dispatch -> drain(fetch) -> write, over mix256.scp.
Prints per-batch dispatch/fetch seconds to show queue-blocking vs
steady-state on the time-shared bench chip."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import importlib.util

spec = importlib.util.spec_from_file_location("sepmod",
                                              "/root/repo/cmd/separate.py")
sep = importlib.util.module_from_spec(spec)
spec.loader.exec_module(sep)

from aps_tpu.eval.pipeline import AsyncWriter, prefetch_iter
from aps_tpu.io import AudioReader, write_audio
from aps_tpu.utils import enable_compilation_cache

enable_compilation_cache()
t_init = time.perf_counter()
s = sep.Separator("/tmp/sep_cli_bench/cpt", cpt_tag="best", device_id=0,
                  dtype="bfloat16", fused=True)
print(f"init {time.perf_counter()-t_init:.1f}s", flush=True)

reader = AudioReader("/tmp/sep_cli_bench/mix256.scp", sr=8000)
writer = AsyncWriter(workers=4)
import pathlib
out = pathlib.Path("/tmp/out_probe_loop")
(out / "spk1").mkdir(parents=True, exist_ok=True)
(out / "spk2").mkdir(parents=True, exist_ok=True)


def write_items(items):
    for path, sig in items:
        write_audio(str(path), np.asarray(sig), sr=8000)


t_all = time.perf_counter()
pending, inflight = [], None
tot_dur = 0.0
bi = 0
for key, mix in prefetch_iter(iter(reader), depth=64):
    tot_dur += mix.shape[-1] / 8000
    pending.append((key, mix))
    if len(pending) < 32:
        continue
    t0 = time.perf_counter()
    fetch = s.run_batch_async([m for _, m in pending], pad_grid=1.25)
    t1 = time.perf_counter()
    if inflight is not None:
        items, pf = inflight
        seps = pf()
        t2 = time.perf_counter()
        wi = []
        for (k, _), sp in zip(items, seps):
            for i, sg in enumerate(sp):
                wi.append((out / f"spk{i+1}" / f"{k}.wav", sg))
        writer.submit(write_items, wi)
        print(f"batch {bi}: dispatch {t1-t0:6.2f}s  fetch_prev "
              f"{t2-t1:6.2f}s", flush=True)
    else:
        print(f"batch {bi}: dispatch {t1-t0:6.2f}s  (first)", flush=True)
    inflight = (pending, fetch)
    pending = []
    bi += 1
items, pf = inflight
t1 = time.perf_counter()
seps = pf()
print(f"last fetch {time.perf_counter()-t1:6.2f}s", flush=True)
wi = []
for (k, _), sp in zip(items, seps):
    for i, sg in enumerate(sp):
        wi.append((out / f"spk{i+1}" / f"{k}.wav", sg))
writer.submit(write_items, wi)
writer.close()
cost = time.perf_counter() - t_all
print(f"TOTAL {cost:.1f}s for {tot_dur:.0f}s audio -> {tot_dur/cost:.1f}x "
      f"real time (RTF {cost/tot_dur:.4f})", flush=True)
