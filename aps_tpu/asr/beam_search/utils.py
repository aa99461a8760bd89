#!/usr/bin/env python
"""Beam search data structures shared across att/transformer/transducer.

Parity surface: /root/reference/aps/asr/beam_search/utils.py
(BeamSearchParam:21, BeamTracker:239, BatchBeamTracker:477).

TPU design: the reference's BeamTracker mutates python lists per step; here
the whole beam lives in ONE dense state pytree (BeamState) advanced inside a
compiled lax loop with fixed shapes:
  tokens  K x (L+1)  decoded ids (sos at column 0)
  score   K          accumulated log-prob (frozen once ended)
  done    K          ended-with-eos flags
  length  K          #emitted tokens (eos included once ended)
Finished hypotheses stay in the beam with a forced eos-only continuation, so
the final beam IS the nbest list — no host-side hypothesis pool."""

from dataclasses import dataclass
from typing import Dict, List, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np

from aps_tpu.const import MIN_F32, NEG_INF


@dataclass
class BeamSearchParam(object):
    """Knobs of the beam search (names match the reference)."""
    beam_size: int = 8
    sos: int = 1
    eos: int = 2
    unk: int = -1
    min_len: int = 1
    max_len: int = 1000
    lm_weight: float = 0
    eos_threshold: float = 0
    len_penalty: float = 0
    cov_method: str = "v1"
    cov_penalty: float = 0
    cov_threshold: float = 0.5
    len_norm: bool = True
    temperature: float = 1
    allow_partial: bool = False
    end_detect: bool = False
    ctc_weight: float = 0
    ctc_beam_size: int = 12
    # TPU top-k over the vocab is a full sort (~2.5 ms/step at V=4233);
    # approx_max_k (recall 0.99) replaces it with the TPU-native
    # partial-reduction kernel. Candidate pruning only — the K-way beam
    # selection stays exact.
    approx_topk: bool = False
    # run the CTC prefix-scorer step as one fused Pallas kernel
    # (ops/pallas/ctc_score.py); its custom_vmap rule folds the batched
    # search's utterance axis into the kernel lanes. Numerically the same
    # blocked recursions as the portable path.
    ctc_fused: bool = False


class BeamState(NamedTuple):
    tokens: jnp.ndarray   # K x L+1
    score: jnp.ndarray    # K
    done: jnp.ndarray     # K bool
    length: jnp.ndarray   # K int32
    coverage: jnp.ndarray  # K x T accumulated attention (or zeros)


def init_beam_state(beam_size: int, max_len: int, sos: int,
                    num_frames: int, num_utts: int = 1) -> BeamState:
    """Dense beam over num_utts * beam_size lanes (utterance-major: lane
    u*K+k is beam k of utterance u). num_utts=1 is the single search."""
    lanes = num_utts * beam_size
    tokens = jnp.full((lanes, max_len + 1), sos, dtype=jnp.int32)
    # only beam 0 of each utterance is alive at step 0 (all start identical)
    score = jnp.where(jnp.arange(lanes) % beam_size == 0, 0.0, MIN_F32)
    return BeamState(tokens=tokens,
                     score=score,
                     done=jnp.zeros((lanes,), dtype=bool),
                     length=jnp.zeros((lanes,), dtype=jnp.int32),
                     coverage=jnp.zeros((lanes, num_frames)))


def mask_finished_scores(fusion: jnp.ndarray, done: jnp.ndarray,
                         eos: int) -> jnp.ndarray:
    """Finished beams may only 'emit' eos with 0 added score (freeze)."""
    K, V = fusion.shape
    frozen = jnp.full((V,), MIN_F32).at[eos].set(0.0)
    return jnp.where(done[:, None], frozen[None, :], fusion)


def apply_eos_threshold(fusion: jnp.ndarray, eos: int,
                        eos_threshold: float) -> jnp.ndarray:
    """Disable eos when its score < threshold * best non-eos score."""
    if eos_threshold <= 0:
        return fusion
    eos_prob = fusion[:, eos]
    non_eos = fusion.at[:, eos].set(MIN_F32)
    best = jnp.max(non_eos, axis=-1)
    disable = eos_prob < best * eos_threshold
    return fusion.at[:, eos].set(jnp.where(disable, MIN_F32, eos_prob))


def disable_unk(fusion: jnp.ndarray, unk: int) -> jnp.ndarray:
    if unk < 0:
        return fusion
    return fusion.at[:, unk].set(MIN_F32)


def topk_candidates(am_prob: jnp.ndarray, C: int, approx: bool):
    """Top-C candidate tokens per beam: exact sort or approx_max_k."""
    import jax
    if approx and am_prob.shape[-1] > 2 * C:
        return jax.lax.approx_max_k(am_prob, C, recall_target=0.99)
    return jax.lax.top_k(am_prob, C)


def coverage_score(state: BeamState, param: BeamSearchParam):
    if param.cov_penalty <= 0:
        return 0.0
    if param.cov_method == "v2":
        cov = jnp.log(jnp.minimum(state.coverage, param.cov_threshold))
    else:
        cov = (state.coverage > param.cov_threshold).astype(jnp.float32)
    return param.cov_penalty * jnp.sum(cov, -1)


def extract_nbest(state: BeamState, param: BeamSearchParam, nbest: int,
                  final: bool = True) -> List[Dict]:
    """Build the nbest hypothesis list from the final beam (host side)."""
    tokens = np.asarray(state.tokens)
    score = np.asarray(state.score)
    done = np.asarray(state.done)
    length = np.asarray(state.length)
    cov = np.asarray(coverage_score(state, param)) \
        if param.cov_penalty > 0 else np.zeros_like(score)
    hyps = []
    for k in range(tokens.shape[0]):
        if score[k] <= MIN_F32 / 2:
            continue
        n = int(length[k])
        if not done[k]:
            # un-ended hypotheses are only emitted at final extraction when
            # --allow-partial is set (reference utils.py:462-468 semantics)
            if not (final and param.allow_partial):
                continue
        # trans = sos + tokens + eos
        seq = [int(t) for t in tokens[k, :n + 1]]
        if done[k]:
            pass  # eos included in count: tokens[:, n] == eos
        else:
            seq = seq + [param.eos]
        seq_len = max(len(seq) - 1, 1)
        if seq_len < param.min_len + 1:
            continue
        s = float(score[k]) + seq_len * param.len_penalty + float(
            np.atleast_1d(cov)[k] if param.cov_penalty > 0 else 0)
        hyps.append({
            "score": s / (seq_len if param.len_norm else 1),
            "trans": seq,
        })
    hyps = sorted(hyps, key=lambda h: h["score"], reverse=True)
    return hyps[:nbest]


class ExecutableCache(object):
    """Bounded LRU of jitted closures keyed (partly) by object identity.
    Each cached closure keeps its key objects (nnet/lm) alive, so Python
    can never hand a live entry's id() to a new object — the bound both
    caps memory in a long-running decode service and rules out stale-id
    aliasing after an eviction (the aliased entry is gone by then)."""

    def __init__(self, maxsize: int = 32):
        from collections import OrderedDict
        self._entries = OrderedDict()
        self._maxsize = maxsize

    def get(self, key, build):
        if key in self._entries:
            self._entries.move_to_end(key)
            return self._entries[key]
        if len(self._entries) >= self._maxsize:
            self._entries.popitem(last=False)
        fn = build()
        self._entries[key] = fn
        return fn


# jitted nnet.apply entry points, keyed by (model, method): decoders call
# the encoder once per utterance/bucket — eager dispatch costs a device
# round trip per op on remote-device setups
_APPLY_EXECUTABLES = ExecutableCache(maxsize=64)


def jit_apply(nnet, variables, *args, method: str):
    import jax

    # ambient matmul precision is baked in at trace time -> part of the key
    key = (id(nnet), method, jax.config.jax_default_matmul_precision)
    fn = _APPLY_EXECUTABLES.get(
        key, lambda: jax.jit(lambda v, *a: nnet.apply(v, *a, method=method)))
    return fn(variables, *args)


def stack_padded(batch: List, pad_to: int = -1):
    """Stack 1-D utterances zero-padded to a common length S.
    -> (x_pad N x S, lens list, S). Device-resident inputs are padded ON
    the device: on remote-device runtimes the np.asarray download +
    re-upload of a whole batch costs more than a search step."""
    import jax

    batch = [x if hasattr(x, "shape") else np.asarray(x) for x in batch]
    lens = [int(x.shape[-1]) for x in batch]
    S = max(max(lens), pad_to)
    if all(isinstance(x, jax.Array) and x.ndim == 1 for x in batch):
        x_pad = jnp.stack(
            [x if l == S else jnp.pad(x, (0, S - l))
             for x, l in zip(batch, lens)])
    else:
        x_pad = jnp.asarray(
            np.stack([
                np.pad(np.asarray(x), (0, S - l))
                for x, l in zip(batch, lens)
            ]))
    return x_pad, lens, S


SINGLE_BUCKET = 32  # encoder-frame grid for the single-utterance caches


def pad_enc_frames(enc_out, ctc_out=None, bucket: int = SINGLE_BUCKET):
    """Pad a T x D encoder output (and optional T x V CTC logits) up to a
    frame bucket so the single-utterance search compiles once per bucket
    instead of once per length (the per-utterance CLI decode used to
    retrace its whole search for EVERY utterance). Returns
    (enc_pad, ctc_pad, T, Tq). Padded CTC rows are blank-certain
    (logit 0 on the appended blank = V - 1, -1e9 elsewhere) so prefix
    scores are bit-unchanged; padded encoder rows are masked downstream
    via enc_len — the same scheme the batched search uses."""
    T = enc_out.shape[0]
    Tq = -(-T // bucket) * bucket
    if Tq == T:
        return enc_out, ctc_out, T, Tq
    enc_pad = jnp.pad(enc_out, ((0, Tq - T), (0, 0)))
    ctc_pad = None
    if ctc_out is not None:
        V = ctc_out.shape[-1]
        row = jnp.full((V,), -1e9).at[V - 1].set(0.0)
        ctc_pad = jnp.concatenate(
            [ctc_out, jnp.tile(row[None], (Tq - T, 1))], axis=0)
    return enc_pad, ctc_pad, T, Tq
