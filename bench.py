#!/usr/bin/env python
"""Benchmark entry. Prints ONE JSON line. The object carries the headline
metric {"metric","value","unit","vs_baseline"} plus an "extra" list with
the secondary metrics so one driver run records the whole picture.

Headline (the BASELINE.md north star): batched beam-search decode RTF of
the flagship full-size Conformer AED on one chip — audio seconds decoded
per wall-clock second, beam 8 with CTC fusion 0.4, batch 64 of 8 s
utterances, with the shipped --approx-topk pruning. Both topk configs are
measured: `value` is approx (the deployment path), `rtf_exact_topk` is the
full-vocab-sort search.

Comparison fields (separate semantics, VERDICT r02 weak #4):
  vs_baseline   — like-for-like ratio vs the ROUND-1 first implementation
                  (decode: exact-topk vs the exact-topk 210.48; train/
                  separate: same config as r01)
  vs_prev_round — ratio vs the best value of the previous round in the
                  SAME configuration (decode: approx vs approx)

Secondary metrics (also runnable alone via --metric):
  train    — Conformer AED ctc_xent train-step RTF (bf16 matmuls) + MFU:
             `mfu_analytic` from hand-counted matmul FLOPs (the honest
             number) and `mfu_xla_overcount` from XLA cost_analysis, which
             overestimates by ~50% and can exceed 1.0 (kept only to track
             compiler drift)
  separate — Conv-TasNet (sse@time_tcn) batched separation RTF (bf16);
             `value` is the deployment path (fused Pallas TCN blocks,
             separate.py default), `rtf_unfused` the canonical apply —
             vs_baseline compares canonical-vs-canonical (r01 had no
             fused path), vs_prev_round deployment-vs-deployment

Recorded history lives in BENCHMARKS.md."""

import argparse
import json
import time

# round-1 first-implementation values (BENCH_r01.json / BENCHMARKS.md):
# the fixed "baseline" this framework is measured against round over round
ROUND1 = {
    "decode_exact": 210.48,  # BENCH_r01.json (exact top_k)
    "train": 3303.0,  # BENCHMARKS.md train-step RTF, bf16 (r2 corrected)
    "separate": 2681.0,  # BENCHMARKS.md Conv-TasNet bf16 batch 32 x 4 s
}
# previous round's best (round 4, BENCHMARKS.md — BENCH_r04.json was lost
# to the driver timeout, so these are the builder-recorded values), same
# configuration per metric
PREV_ROUND = {
    "decode_approx": 2090.4,
    "train": 55560.0,
    "separate": 9314.86,
}
# TPU v5e bf16 peak (MXU): ~197 TFLOP/s; MFU is only estimated on TPU runs
V5E_BF16_PEAK = 197e12


def _best_wall(fn, iters: int, repeats: int) -> float:
    """Best-of-N wall time of `iters` calls (the chip may be time-shared)."""
    best = float("inf")
    for _ in range(repeats):
        beg = time.perf_counter()
        for _ in range(iters):
            out = fn()
        import jax
        jax.block_until_ready(out)
        best = min(best, time.perf_counter() - beg)
    return best


def bench_decode(on_tpu: bool):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from __graft_entry__ import _build_flagship
    from aps_tpu.asr.beam_search import transformer as api

    V = 4233 if on_tpu else 64
    nnet = _build_flagship(vocab_size=V, small=not on_tpu)
    rng = np.random.default_rng(0)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "aug": jax.random.PRNGKey(2), "ss": jax.random.PRNGKey(3)}
    secs = 8.0 if on_tpu else 1.0
    S = int(16000 * secs)
    x0 = jnp.asarray(rng.standard_normal(S) * 0.1, dtype=jnp.float32)
    variables = nnet.init(rngs, x0[None], None,
                          jnp.zeros((1, 8), dtype=jnp.int32), None,
                          training=False)
    B = 64 if on_tpu else 2
    utts = [jnp.asarray(rng.standard_normal(S) * 0.1, dtype=jnp.float32)
            for _ in range(B)]
    # both configs are measured, interleaved in one process so chip
    # contention hits them equally: approx_topk (the shipped --approx-topk
    # recall-0.99 candidate pruning) is the headline; exact top_k is kept
    # for the like-for-like r01 comparison and accuracy accounting
    kwargs = dict(sos=V - 3, eos=V - 2, beam_size=8, nbest=1,
                  max_len=40 if on_tpu else 8, ctc_weight=0.4,
                  ctc_beam_size=12)
    iters = 5 if on_tpu else 2
    # bf16 weights+activations are the deployment path (decode_batch.py
    # --dtype bfloat16); the tone quality gate pins transcript equality
    # vs f32 on a trained model (tests/test_quality_gates.py flagship
    # gate), so the speed is usable accuracy-free
    variables16 = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if hasattr(x, "dtype") and x.dtype == jnp.float32 else x, variables)
    configs = [("approx", variables, True), ("exact", variables, False),
               ("bf16", variables16, True)]
    best = {name: float("inf") for name, _, _ in configs}
    for _, v, approx in configs:  # compile all first
        api.beam_search_batch(nnet, v, utts, approx_topk=approx, **kwargs)
    for _ in range(3 if on_tpu else 1):
        for name, v, approx in configs:
            beg = time.perf_counter()
            for _ in range(iters):
                api.beam_search_batch(nnet, v, utts, approx_topk=approx,
                                      **kwargs)
            best[name] = min(best[name], time.perf_counter() - beg)
    rtf = B * secs * iters / best["approx"]
    rtf_exact = B * secs * iters / best["exact"]
    return {
        "metric": "conformer_aed_batched_decode_rtf",
        "value": round(rtf, 2),
        "unit": "audio_sec/sec",
        # exact-vs-exact: like-for-like against the r01 implementation
        "vs_baseline": round(rtf_exact / ROUND1["decode_exact"], 3),
        # approx-vs-approx: did this round get faster than the last one
        "vs_prev_round": round(rtf / PREV_ROUND["decode_approx"], 3),
        "rtf_exact_topk": round(rtf_exact, 2),
        "rtf_bf16": round(B * secs * iters / best["bf16"], 2),
        "utts_per_sec": round(B * iters / best["approx"], 2),
    }


def bench_train(on_tpu: bool):
    import jax
    import jax.numpy as jnp
    import optax

    from __graft_entry__ import _build_flagship
    from aps_tpu.libs import aps_task

    V = 4233 if on_tpu else 64
    nnet = _build_flagship(vocab_size=V, small=not on_tpu)
    task = aps_task("asr@ctc_xent", nnet, ctc_weight=0.2, blank=V - 1,
                    lsm_factor=0.1)
    N = 32 if on_tpu else 2
    secs = 8.0
    S = int(16000 * secs)
    To = 24 if on_tpu else 8
    rng = jax.random.PRNGKey(0)
    egs = {
        "src_pad": jax.random.normal(rng, (N, S)) * 0.1,
        "src_len": jnp.full((N,), S),
        "tgt_pad": jnp.zeros((N, To), dtype=jnp.int32),
        "tgt_len": jnp.full((N,), To),
    }
    rngs = {"params": rng, "dropout": rng, "aug": rng, "ss": rng}
    variables = task.init(rngs, egs, training=True)
    params = variables["params"]
    mstate = {k: v for k, v in variables.items() if k != "params"}
    tx = optax.chain(optax.clip_by_global_norm(5.0), optax.adam(1e-4))
    opt_state = tx.init(params)

    def step(params, mstate, opt_state, egs, rng):
        def loss_fn(p):
            with jax.default_matmul_precision("bfloat16"):
                out, new_mstate = task.apply(
                    {"params": p, **mstate}, egs, training=True,
                    rngs={"dropout": rng, "aug": rng, "ss": rng},
                    mutable=list(mstate.keys()))
            return out["loss"], new_mstate

        (loss, new_mstate), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, new_mstate, opt_state, loss

    # donate the train state like the real trainer does
    # (trainer/dp.py:270): without donation XLA inserts a params-sized
    # copy per step to keep the inputs alive
    jitted = jax.jit(step, donate_argnums=(0, 1, 2))
    # XLA's own FLOP count for the whole compiled step -> MFU
    step_flops = None
    try:
        cost = jitted.lower(params, mstate, opt_state, egs,
                            rng).compile().cost_analysis()
        if cost and "flops" in cost:
            step_flops = float(cost["flops"])
    except Exception:
        pass
    params, mstate, opt_state, loss = jitted(params, mstate, opt_state,
                                             egs, rng)
    jax.block_until_ready(loss)
    iters = 10 if on_tpu else 3
    wall = float("inf")
    for _ in range(3 if on_tpu else 1):  # best-of-3: chip is time-shared
        beg = time.perf_counter()
        for i in range(iters):
            params, mstate, opt_state, loss = jitted(
                params, mstate, opt_state, egs, jax.random.PRNGKey(i))
        jax.block_until_ready(loss)
        wall = min(wall, time.perf_counter() - beg)
    rtf = N * secs * iters / wall
    # per-step host sync cost: the same loop blocking on every step's
    # result — what the trainer pays with pipeline_depth=0 (and what it
    # paid before pipelined sync landed). The async loop above models
    # pipeline_depth>=1; the difference is the host->device round trip
    # plus the drained dispatch queue per step.
    wall_sync = float("inf")
    for _ in range(3 if on_tpu else 1):
        beg = time.perf_counter()
        for i in range(iters):
            params, mstate, opt_state, loss = jitted(
                params, mstate, opt_state, egs, jax.random.PRNGKey(i))
            jax.block_until_ready(loss)
        wall_sync = min(wall_sync, time.perf_counter() - beg)
    # NOTE a lax.scan-of-steps "device-pure" timing variant was tried
    # and REMOVED: on this runtime multi-step program bodies compile
    # pathologically slowly on the remote compile server (minutes) and
    # the compiled scan then RUNS ~12x slower per step than the same
    # step dispatched repeatedly (76 vs 6.0 ms measured back-to-back on
    # a quiet chip) — it burned the metric's time budget and measured
    # the runtime's scan pathology, not the model. The dispatch-loop
    # numbers below carry per-dispatch host/tunnel latency instead
    # (probed 0.06-77 ms per dispatch depending on host load), which is
    # why train RTF moves more across sessions than decode/separate.
    best_wall = wall
    out = {
        "metric": "conformer_aed_train_rtf",
        "value": round(rtf, 2),
        "unit": "audio_sec/sec",
        "vs_baseline": round(rtf / ROUND1["train"], 3),
        "vs_prev_round": round(rtf / PREV_ROUND["train"], 3),
        "utts_per_sec": round(N * iters / wall, 2),
        "steptime_pipelined_ms": round(1e3 * wall / iters, 3),
        "steptime_sync_ms": round(1e3 * wall_sync / iters, 3),
    }
    if on_tpu:
        # analytic matmul FLOPs (the defensible MFU, VERDICT r02 weak #1):
        # every weight participates in one MAC per sequence position, so
        # fwd matmul FLOPs = 2 * params * positions; backward costs ~2x
        # forward (grad wrt inputs + wrt weights) -> factor 3. Encoder
        # params see the subsampled frame count, decoder params the token
        # count. This undercounts attention score/context matmuls (small
        # vs the weight matmuls) — true MFU is slightly higher.
        import numpy as _np
        from jax import tree_util as tu
        enc_p = dec_p = 0
        for path, leaf in tu.tree_flatten_with_path(params)[0]:
            n = int(_np.prod(leaf.shape))
            if "decoder" in str(path):
                dec_p += n
            else:  # encoder + ctc head: applied per encoder frame
                enc_p += n
        t_enc = (S // 160) // 4  # 10 ms frames, conv2d 4x subsampling
        fwd = 2 * (enc_p * N * t_enc + dec_p * N * To)
        out["mfu_analytic"] = round(
            3 * fwd * iters / best_wall / V5E_BF16_PEAK, 4)
        if step_flops:
            # XLA's cost_analysis flop count: known to overcount (~50%,
            # can exceed 1.0); kept only to watch compiler drift
            out["mfu_xla_overcount"] = round(
                step_flops * iters / best_wall / V5E_BF16_PEAK, 4)
    return out


def bench_separate(on_tpu: bool):
    """Conv-TasNet batched separation forward (the WSJ0-2mix north star)."""
    import jax
    import jax.numpy as jnp

    from aps_tpu.libs import aps_sse_nnet

    nnet = aps_sse_nnet("sse@time_tcn")(
        num_spks=2, L=20, N=256, X=8 if on_tpu else 2,
        R=4 if on_tpu else 1, B=256, H=512)
    B = 32 if on_tpu else 2
    secs = 4.0
    S = int(8000 * secs)
    mix = jax.random.normal(jax.random.PRNGKey(0), (B, S)) * 0.1
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1)}
    variables = nnet.init(rngs, mix, training=False)
    # the deployment path (separate.py --dtype bfloat16): bf16 params AND
    # activations — the TCN is HBM-bandwidth-bound, so halving the
    # activation bytes nearly doubles throughput (BENCHMARKS.md)
    variables = jax.tree_util.tree_map(
        lambda x: x.astype(jnp.bfloat16)
        if x.dtype == jnp.float32 else x, variables)
    mix = mix.astype(jnp.bfloat16)

    @jax.jit
    def forward(mix):
        with jax.default_matmul_precision("bfloat16"):
            return nnet.apply(variables, mix, training=False)

    # deployment path (separate.py default): folded fused-eval forward,
    # one Pallas kernel per TCN block (~2.2x vs the canonical apply).
    # jit the weight-as-ARGUMENT form (forward.raw): the closure form
    # embeds the folded weights as program constants, which fetches them
    # back to host at trace time (minutes on the tunnel) and keys the
    # compilation cache on their values (BENCHMARKS.md round 4)
    fused = nnet.make_fused_eval(variables,
                                 impl="pallas" if on_tpu else "xla")
    if fused is not None and getattr(fused, "raw", None) is not None:
        folded = jax.device_put(fused.folded)
        raw = jax.jit(fused.raw)
        jit_fused = lambda m: raw(folded, m)
    elif fused is not None:
        jit_fused = jax.jit(fused)
    else:
        jit_fused = forward

    jax.block_until_ready(forward(mix))
    jax.block_until_ready(jit_fused(mix))
    iters = 20 if on_tpu else 2
    # interleave so chip contention hits both configs equally
    wall = {"canon": float("inf"), "fused": float("inf")}
    for _ in range(3 if on_tpu else 1):
        for name, fn in (("canon", forward), ("fused", jit_fused)):
            beg = time.perf_counter()
            for _ in range(iters):
                out = fn(mix)
            jax.block_until_ready(out)
            wall[name] = min(wall[name], time.perf_counter() - beg)
    rtf = B * secs * iters / wall["fused"]
    rtf_canon = B * secs * iters / wall["canon"]
    return {
        "metric": "conv_tasnet_batched_separate_rtf",
        "value": round(rtf, 2),
        "unit": "audio_sec/sec",
        # like-for-like: canonical apply vs the r01 canonical number
        "vs_baseline": round(rtf_canon / ROUND1["separate"], 3),
        "vs_prev_round": round(rtf / PREV_ROUND["separate"], 3),
        "rtf_unfused": round(rtf_canon, 2),
        "utts_per_sec": round(B * iters / wall["fused"], 2),
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--metric", default="all",
                        choices=["all", "decode", "train", "separate"])
    args = parser.parse_args()
    if args.metric != "all":
        import jax
        from aps_tpu.utils import enable_compilation_cache
        enable_compilation_cache()
        on_tpu = jax.devices()[0].platform not in ("cpu",)
        fns = {"decode": bench_decode, "train": bench_train,
               "separate": bench_separate}
        print(json.dumps(fns[args.metric](on_tpu)))
        return
    # each metric runs in a FRESH process: leftover device state from one
    # benchmark measurably slows the next (observed 15x on the train step
    # after the decode executables were resident), and a clean room per
    # metric also isolates failures
    import os
    import re
    import subprocess
    import sys

    # GLOBAL WALL-CLOCK DEADLINE (VERDICT r04 next #1): the driver runs
    # this script under its own hard timeout — BENCH_r03 (3 metrics)
    # finished inside it, BENCH_r04 (+ an unbounded 3000 s tpu tier) was
    # killed at rc 124 with nothing printed, losing every number the
    # round earned. Budget every stage off ONE deadline, shed stages that
    # no longer fit (recording per-stage `error` fields instead), and
    # always print the single JSON line with whatever finished.
    t0 = time.monotonic()
    deadline = float(os.environ.get("APS_BENCH_DEADLINE_SECS", "2100"))
    reserve = 15.0  # tail room to assemble + print the JSON

    def remaining() -> float:
        return deadline - (time.monotonic() - t0) - reserve

    # the bench chip sits behind a network tunnel that can be down for
    # hours (jax.devices() then blocks forever inside the plugin): probe
    # reachability in a bounded subprocess first so an outage yields a
    # fast, well-formed error JSON instead of a hang per metric
    try:
        probe = subprocess.run(
            [sys.executable, "-c",
             "import jax; print(jax.devices()[0].platform)"],
            capture_output=True, text=True,
            timeout=max(30.0, min(240.0, remaining())))
        reachable = probe.returncode == 0
    except subprocess.TimeoutExpired:
        reachable = False
    # chip health: the tunnel's FIRST device->host fetch of a process
    # stalls for session establishment — probed 0.1-71.5 s on a good
    # day, 72-840+ s on a degraded one (2026-08-20). The timed metric
    # loops below are fetch-free (block_until_ready only) and decode
    # absorbs its stall in the compile-all warm-up, but record the
    # latency so RTF variance across rounds can be attributed.
    first_fetch = None
    if reachable:
        try:
            fp = subprocess.run(
                [sys.executable, "-c",
                 "import time, jax, numpy as np\n"
                 "x = jax.numpy.ones((8, 8), jax.numpy.float32)\n"
                 "t = time.time()\n"
                 "np.asarray(x + 1)\n"
                 "print('FETCH', round(time.time() - t, 1))"],
                capture_output=True, text=True,
                timeout=max(60.0, min(120.0, remaining())))
            for ln in (fp.stdout or "").splitlines():
                if ln.startswith("FETCH"):
                    first_fetch = float(ln.split()[1])
        except subprocess.TimeoutExpired as exc:
            first_fetch = f">{exc.timeout:.0f}s (stalled)"
    if not reachable:
        print(json.dumps({
            "metric": "conformer_aed_batched_decode_rtf", "value": 0.0,
            "unit": "x_realtime", "vs_baseline": 0.0,
            "error": "device backend unreachable (TPU tunnel down?); "
                     "no measurement taken"
        }))
        return

    # per-metric soft caps: observed warm-cache wall times are minutes
    # (dominated by the tunnel's ~60-110 s device program load per
    # process); the cap only matters when a compile-cache miss or a
    # contended chip blows a metric up — then it is bounded so the
    # stages after it still run.
    # ORDER: train and separate run FIRST — their timed loops are
    # fetch-free (block_until_ready only), so they never pay the
    # tunnel's first-host-fetch session stall (72 s-20+ min on a
    # degraded day, see chip_first_fetch_secs) and bank their numbers
    # in ~200 s each. Decode — the headline — DOES fetch transcripts
    # and absorbs the stall in its compile-all warm-up, so it gets all
    # the budget that's left minus a small reserve for the tpu tier
    # (on 2026-08-20 a 900 s decode cap lost the headline to a >300 s
    # stall while train/separate sailed through).
    tier_reserve = 180.0
    caps = {"decode": None, "train": 700.0, "separate": 600.0}
    metric_names = {"decode": "conformer_aed_batched_decode_rtf",
                    "train": "conformer_aed_train_rtf",
                    "separate": "conv_tasnet_batched_separate_rtf"}

    results = {}
    timings = {}

    def run_metric(name: str, budget: float) -> dict:
        beg = time.monotonic()
        try:
            proc = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--metric", name],
                capture_output=True, text=True, timeout=budget)
            rc, stdout, stderr = proc.returncode, proc.stdout, proc.stderr
        except subprocess.TimeoutExpired as exc:
            rc, stdout = -1, ""
            stderr = f"timeout after {exc.timeout:.0f}s"
        timings[name] = round(timings.get(name, 0.0)
                              + time.monotonic() - beg, 1)
        line = ""
        for ln in reversed((stdout or "").strip().splitlines()):
            if ln.startswith("{"):
                line = ln
                break
        if rc == 0 and line:
            return json.loads(line)
        # keep the driver schema (value/unit/vs_baseline) even on
        # failure so the ONE output line always parses
        return {"metric": metric_names[name], "value": 0.0,
                "unit": "x_realtime", "vs_baseline": 0.0,
                "error": (stderr or "no output")[-200:]}

    for name in ("train", "separate", "decode"):
        cap = caps[name]
        if cap is None:
            cap = max(0.0, remaining() - tier_reserve)
        budget = min(cap, remaining())
        if budget < 90.0:
            results[name] = {"metric": metric_names[name], "value": 0.0,
                             "unit": "x_realtime", "vs_baseline": 0.0,
                             "error": "skipped: global deadline"}
            continue
        results[name] = run_metric(name, budget)

    # one retry for metrics lost to chip weather: the tunnel degrades in
    # windows of minutes, and back-to-back validation runs each lost a
    # DIFFERENT metric to a bad window while the others banked — a
    # single retry when budget allows recovers most of those
    for name in ("decode", "train", "separate"):
        if "error" not in results.get(name, {}):
            continue
        budget = min(caps[name] or float("inf"),
                     remaining() - tier_reserve)
        if budget < 180.0:
            continue
        retry = run_metric(name, budget)
        if "error" not in retry:
            results[name] = retry

    # on-chip correctness is part of the driver artifact (VERDICT r03
    # weak #3): run the real-chip test tier and record pass/fail counts
    # in the bench JSON — bounded by whatever deadline budget is left
    # (warm compile cache: the tier is minutes; a timeout still reports
    # the progressive counts seen so far instead of losing them)
    def run_tpu_tier(budget: float):
        tier = {"passed": 0, "failed": 0, "skipped": 0, "error": None}
        if budget < 120.0:
            tier["error"] = "skipped: global deadline"
            return tier
        stdout = ""
        try:
            proc = subprocess.run(
                [sys.executable, "-m", "pytest", "tests/tpu", "-q",
                 "--no-header", "-p", "no:cacheprovider"],
                env=dict(os.environ, APS_TPU_TEST="1"),
                capture_output=True, text=True, timeout=budget,
                cwd=os.path.dirname(os.path.abspath(__file__)))
            stdout = proc.stdout or ""
            rc = proc.returncode
        except subprocess.TimeoutExpired as exc:
            stdout = (exc.stdout or b"").decode(
                "utf-8", "replace") if isinstance(
                exc.stdout, bytes) else (exc.stdout or "")
            tier["error"] = f"tpu tier timeout after {budget:.0f}s"
            rc = -1
        tail = stdout.strip().splitlines()[-1:]
        summary = tail[0] if tail else ""
        got_summary = False
        for key in ("passed", "failed", "skipped"):
            m = re.search(rf"(\d+) {key}", summary)
            if m:
                tier[key] = int(m.group(1))
                got_summary = True
        if not got_summary:
            # killed mid-run: count the progressive -q dots/F/s seen so
            # far so partial progress still enters the record
            prog = "".join(re.findall(r"^[.FEsx]+", stdout, re.M))
            tier["passed"] = prog.count(".")
            tier["failed"] = prog.count("F") + prog.count("E")
            tier["skipped"] = prog.count("s")
        if rc not in (0, -1) and not tier["failed"]:
            tier["error"] = (stdout or "pytest error")[-200:]
        return tier

    result = results["decode"]
    result["extra"] = [results["train"], results["separate"]]
    # the tier gets whatever the deadline leaves (warm-cache metrics use
    # ~1000 s of the 2100 s budget, leaving ~1000 s — the full 19-test
    # tier fits warm; a cold cache sheds the tail and the progressive
    # dot-counting above still records how far it got)
    result["tpu_tier"] = run_tpu_tier(remaining())
    timings["total"] = round(time.monotonic() - t0, 1)
    result["wall_secs"] = timings
    if first_fetch is not None:
        result["chip_first_fetch_secs"] = first_fetch
    print(json.dumps(result))


if __name__ == "__main__":
    main()
