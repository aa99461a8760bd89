"""Beam search tests: greedy == beam(1), beam improves score, CTC prefix
search, viterbi align, transducer search, LM fusion."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from aps_tpu.libs import aps_asr_nnet
from aps_tpu.transform import AsrTransform

V, SOS, EOS = 20, 17, 18
TRANSFORM = AsrTransform(feats="fbank-log-cmvn", frame_len=400,
                         frame_hop=160)


@pytest.fixture(scope="module")
def att_model():
    nnet = aps_asr_nnet("asr@att")(
        input_size=80, vocab_size=V, sos=SOS, eos=EOS, ctc=True,
        asr_transform=TRANSFORM, att_type="ctx", att_kwargs={"att_dim": 16},
        enc_type="pytorch_rnn", enc_proj=32,
        enc_kwargs={"hidden": 32, "num_layers": 1, "bidirectional": True},
        dec_kwargs={"hidden": 32, "num_layers": 1})
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(8000) * 0.1, dtype=jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "aug": jax.random.PRNGKey(2), "ss": jax.random.PRNGKey(3)}
    y = jnp.zeros((1, 4), dtype=jnp.int32)
    variables = nnet.init(rngs, x[None], None, y, None, training=False)
    return nnet, variables, x


def test_greedy_equals_beam1(att_model):
    from aps_tpu.asr.beam_search.att import beam_search, greedy_search
    nnet, variables, x = att_model
    g = greedy_search(nnet, variables, x, sos=SOS, eos=EOS, max_len=16,
                      allow_partial=True)
    b = beam_search(nnet, variables, x, sos=SOS, eos=EOS, beam_size=1,
                    nbest=1, max_len=16, allow_partial=True)
    assert g[0]["trans"] == b[0]["trans"]
    np.testing.assert_allclose(g[0]["score"], b[0]["score"], rtol=1e-5)


def test_beam_improves_or_equals(att_model):
    from aps_tpu.asr.beam_search.att import beam_search
    nnet, variables, x = att_model
    b1 = beam_search(nnet, variables, x, sos=SOS, eos=EOS, beam_size=1,
                     nbest=1, max_len=16, len_norm=False,
                     allow_partial=True)
    b8 = beam_search(nnet, variables, x, sos=SOS, eos=EOS, beam_size=8,
                     nbest=8, max_len=16, len_norm=False,
                     allow_partial=True)
    assert len(b8) >= 1
    assert b8[0]["score"] >= b1[0]["score"] - 1e-4
    # hypotheses all start with sos and end with eos
    for h in b8:
        assert h["trans"][0] == SOS and h["trans"][-1] == EOS
    # scores sorted
    scores = [h["score"] for h in b8]
    assert scores == sorted(scores, reverse=True)


def test_beam_with_ctc_weight(att_model):
    from aps_tpu.asr.beam_search.att import beam_search
    nnet, variables, x = att_model
    hyp = beam_search(nnet, variables, x, sos=SOS, eos=EOS, beam_size=4,
                      nbest=2, max_len=16, ctc_weight=0.4, ctc_beam_size=8,
                      allow_partial=True)
    assert len(hyp) >= 1
    assert np.isfinite(hyp[0]["score"])


def test_beam_approx_topk_matches_exact(att_model):
    """--approx-topk candidate pruning: on CPU approx_max_k is exact, so
    the search must match; the flag must at minimum produce a valid,
    finite-scored nbest list everywhere."""
    from aps_tpu.asr.beam_search.att import beam_search
    nnet, variables, x = att_model
    kw = dict(sos=SOS, eos=EOS, beam_size=4, nbest=2, max_len=16,
              allow_partial=True,
              ctc_weight=0.4, ctc_beam_size=8)
    exact = beam_search(nnet, variables, x, **kw)
    approx = beam_search(nnet, variables, x, approx_topk=True, **kw)
    assert [h["trans"] for h in approx] == [h["trans"] for h in exact]
    np.testing.assert_allclose([h["score"] for h in approx],
                               [h["score"] for h in exact], rtol=1e-5)


def test_beam_disable_unk_under_ctc(att_model):
    """unk masking must hold in the joint CTC/attention branch too: ban
    the token the unconstrained search emitted and it must disappear."""
    from aps_tpu.asr.beam_search.att import beam_search
    nnet, variables, x = att_model
    kw = dict(sos=SOS, eos=EOS, beam_size=4, nbest=4, max_len=16,
              allow_partial=True,
              ctc_weight=0.4, ctc_beam_size=8)
    free = beam_search(nnet, variables, x, **kw)
    emitted = [t for h in free for t in h["trans"][1:-1]]
    assert emitted, "test needs a non-empty hypothesis"
    banned = emitted[0]
    hyp = beam_search(nnet, variables, x, unk=banned, **kw)
    for h in hyp:
        assert banned not in h["trans"][1:-1], \
            f"banned token {banned} emitted in {h['trans']}"


def test_beam_with_rnn_lm(att_model):
    from aps_tpu.asr.beam_search.att import beam_search
    from aps_tpu.asr.beam_search.lm import lm_adapter
    nnet, variables, x = att_model
    lm = aps_asr_nnet("asr@rnn_lm")(vocab_size=V - 1, embed_size=8,
                                    hidden_size=16, num_layers=1)
    lm_vars = lm.init({"params": jax.random.PRNGKey(5)},
                      jnp.zeros((1, 4), dtype=jnp.int32), training=False)
    adapter = lm_adapter(lm, lm_vars)
    hyp = beam_search(nnet, variables, x, lm=adapter, lm_weight=0.2,
                      sos=SOS, eos=EOS, beam_size=4, nbest=1, max_len=12,
                      allow_partial=True)
    assert np.isfinite(hyp[0]["score"])


def test_ctc_prefix_beam_search(rng):
    from aps_tpu.asr.beam_search.ctc import CtcApi
    T, vocab = 20, 8
    blank = vocab - 1
    logits = rng.standard_normal((T, vocab)).astype(np.float32) * 2
    api = CtcApi(blank)
    hyp = api.beam_search(logits, beam_size=4, nbest=2, sos=0, eos=1)
    assert len(hyp) >= 1
    assert hyp[0]["trans"][0] == 0 and hyp[0]["trans"][-1] == 1
    # greedy collapse should roughly match 1-best tokens
    assert np.isfinite(hyp[0]["score"])


def test_ctc_viterbi_align(rng):
    from aps_tpu.asr.beam_search.ctc import CtcApi
    T, vocab = 20, 8
    blank = vocab - 1
    logits = rng.standard_normal((T, vocab)).astype(np.float32)
    api = CtcApi(blank)
    out = api.viterbi_align(logits, np.asarray([2, 3, 2]))
    assert len(out["align"]) == T
    # collapsed alignment equals the reference sequence
    collapsed = []
    prev = None
    for a in out["align"]:
        if a != blank and a != prev:
            collapsed.append(a)
        prev = a
    assert collapsed == [2, 3, 2]


def test_ctc_scorer_matches_full_prefix(rng):
    """CtcScorer delta scores should sum to the CTC prefix probability."""
    from aps_tpu.asr.beam_search.ctc import CtcScorer
    T, vocab = 12, 6
    logits = jnp.asarray(rng.standard_normal((T, vocab)), dtype=jnp.float32)
    scorer = CtcScorer(logits, eos=1, beam_size=2)
    state = scorer.init_state()
    # extend prefix [] with token 2 for both beams
    last = jnp.asarray([0, 0])
    cand = jnp.asarray([[2, 3], [2, 3]])
    delta, newstate = scorer(state, last, cand, True)
    assert np.isfinite(np.asarray(delta)).all()
    # both beams identical -> identical scores
    np.testing.assert_allclose(np.asarray(delta[0]), np.asarray(delta[1]),
                               rtol=1e-5)


@pytest.fixture(scope="module")
def xfmr_model():
    nnet = aps_asr_nnet("asr@xfmr")(
        input_size=80, vocab_size=V, sos=SOS, eos=EOS, ctc=True,
        asr_transform=TRANSFORM, enc_type="pytorch_rnn", enc_proj=32,
        enc_kwargs={"hidden": 32, "num_layers": 1, "bidirectional": True},
        dec_kwargs={"num_layers": 1,
                    "arch_kwargs": {"att_dim": 32, "nhead": 4,
                                    "feedforward_dim": 64}})
    rng = np.random.default_rng(8)
    x = jnp.asarray(rng.standard_normal(8000) * 0.1, dtype=jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1),
            "aug": jax.random.PRNGKey(2), "ss": jax.random.PRNGKey(3)}
    y = jnp.zeros((1, 4), dtype=jnp.int32)
    variables = nnet.init(rngs, x[None], None, y, None, training=False)
    return nnet, variables, x


def test_xfmr_beam_search(xfmr_model):
    from aps_tpu.asr.beam_search.transformer import beam_search, greedy_search
    nnet, variables, x = xfmr_model
    g = greedy_search(nnet, variables, x, sos=SOS, eos=EOS, max_len=12,
                      allow_partial=True)
    b = beam_search(nnet, variables, x, sos=SOS, eos=EOS, beam_size=4,
                    nbest=2, max_len=12, len_norm=False,
                    allow_partial=True)
    assert g[0]["trans"][0] == SOS and g[0]["trans"][-1] == EOS
    b1 = beam_search(nnet, variables, x, sos=SOS, eos=EOS, beam_size=1,
                     nbest=1, max_len=12, len_norm=False,
                     allow_partial=True)
    assert b[0]["score"] >= b1[0]["score"] - 1e-4


def test_xfmr_beam_search_ctc(xfmr_model):
    from aps_tpu.asr.beam_search.transformer import beam_search
    nnet, variables, x = xfmr_model
    hyp = beam_search(nnet, variables, x, sos=SOS, eos=EOS, beam_size=4,
                      nbest=2, max_len=12, ctc_weight=0.3,
                      allow_partial=True)
    assert np.isfinite(hyp[0]["score"])


def test_transducer_search(rng):
    from aps_tpu.asr.beam_search.transducer import beam_search, greedy_search
    nnet = aps_asr_nnet("asr@transducer")(
        input_size=80, vocab_size=V, asr_transform=TRANSFORM,
        enc_type="pytorch_rnn", enc_proj=32,
        enc_kwargs={"hidden": 32, "num_layers": 1, "bidirectional": True},
        dec_kwargs={"embed_size": 16, "jot_dim": 16, "hidden": 32,
                    "num_layers": 1})
    x = jnp.asarray(rng.standard_normal(8000) * 0.1, dtype=jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}
    y = jnp.full((1, 5), V - 1, dtype=jnp.int32)
    variables = nnet.init(rngs, x[None], None, y, None, training=False)
    g = greedy_search(nnet, variables, x)
    b = beam_search(nnet, variables, x, beam_size=4, nbest=2,
                    len_norm=False)
    assert len(g) == 1 and len(b) >= 1
    b1 = beam_search(nnet, variables, x, beam_size=1, nbest=1,
                     len_norm=False)
    assert b[0]["score"] >= b1[0]["score"] - 1e-4


def test_beam_search_batch_matches_single(att_model):
    """The vmapped batched search must reproduce the per-utterance search
    (incl. CTC joint scoring with padded frames forced to blank)."""
    from aps_tpu.asr.beam_search.att import beam_search, beam_search_batch
    nnet, variables, x = att_model
    rng = np.random.default_rng(11)
    xs = [
        x,
        jnp.asarray(rng.standard_normal(6400) * 0.1, dtype=jnp.float32),
        jnp.asarray(rng.standard_normal(4800) * 0.1, dtype=jnp.float32),
    ]
    kwargs = dict(sos=SOS, eos=EOS, beam_size=4, nbest=2, max_len=12,
                  allow_partial=True,
                  ctc_weight=0.3)
    batched = beam_search_batch(nnet, variables, xs, **kwargs)
    assert len(batched) == len(xs)
    for x_i, hyps in zip(xs, batched):
        # encoder output length differs between padded/unpadded runs, so
        # compare against a single-utterance search on the padded length
        single = beam_search(nnet, variables, x_i, **kwargs)
        assert [h["trans"] for h in hyps[:1]] == \
            [h["trans"] for h in single[:1]]
        np.testing.assert_allclose(hyps[0]["score"], single[0]["score"],
                                   rtol=1e-4, atol=1e-4)


def test_xfmr_beam_search_batch(xfmr_model):
    from aps_tpu.asr.beam_search.transformer import (beam_search,
                                                     beam_search_batch)
    nnet, variables, x = xfmr_model
    rng = np.random.default_rng(13)
    xs = [x, jnp.asarray(rng.standard_normal(6400) * 0.1,
                         dtype=jnp.float32)]
    kwargs = dict(sos=SOS, eos=EOS, beam_size=4, nbest=2, max_len=10,
                  allow_partial=True)
    batched = beam_search_batch(nnet, variables, xs, **kwargs)
    single = beam_search(nnet, variables, xs[0], **kwargs)
    assert batched[0][0]["trans"] == single[0]["trans"]
    np.testing.assert_allclose(batched[0][0]["score"], single[0]["score"],
                               rtol=1e-4, atol=1e-4)
    assert batched[1][0]["trans"][0] == SOS
    assert batched[1][0]["trans"][-1] == EOS


def test_transducer_batch_and_lm_fusion(rng):
    from aps_tpu.asr.beam_search.lm import RnnLmAdapter
    from aps_tpu.asr.beam_search.transducer import (beam_search,
                                                    beam_search_batch)
    nnet = aps_asr_nnet("asr@transducer")(
        input_size=80, vocab_size=V, asr_transform=TRANSFORM,
        enc_type="pytorch_rnn", enc_proj=32,
        enc_kwargs={"hidden": 32, "num_layers": 1, "bidirectional": True},
        dec_kwargs={"embed_size": 16, "jot_dim": 16, "hidden": 32,
                    "num_layers": 1})
    x = jnp.asarray(rng.standard_normal(8000) * 0.1, dtype=jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}
    y = jnp.full((1, 5), V - 1, dtype=jnp.int32)
    variables = nnet.init(rngs, x[None], None, y, None, training=False)
    xs = [x, jnp.asarray(rng.standard_normal(6400) * 0.1,
                         dtype=jnp.float32)]
    kwargs = dict(beam_size=4, nbest=2, len_norm=False)
    batched = beam_search_batch(nnet, variables, xs, **kwargs)
    for x_i, hyps in zip(xs, batched):
        single = beam_search(nnet, variables, x_i, **kwargs)
        assert hyps[0]["trans"] == single[0]["trans"]
        np.testing.assert_allclose(hyps[0]["score"], single[0]["score"],
                                   rtol=1e-4, atol=1e-4)
    # shallow LM fusion changes scores but stays a valid search
    lm = aps_asr_nnet("asr@rnn_lm")(vocab_size=V - 1, embed_size=8,
                                    hidden_size=16, num_layers=1)
    lm_vars = lm.init(jax.random.PRNGKey(5),
                      jnp.zeros((1, 4), dtype=jnp.int32), None)
    adapter = RnnLmAdapter(lm, lm_vars)
    fused = beam_search(nnet, variables, x, lm=adapter, lm_weight=0.3,
                        **kwargs)
    assert len(fused) >= 1 and fused[0]["trans"][0] == V - 1


def test_xfmr_incremental_decode_matches_full(xfmr_model, rng):
    """decode_step_inc chained over a prefix == full-prefix decode_step."""
    nnet, variables, x = xfmr_model
    enc_out, enc_len, _ = nnet.apply(variables, x[None],
                                     method="decode_enc")
    K, L = 3, 6
    enc = jnp.tile(enc_out, (K, 1, 1))
    prefix = jnp.asarray(rng.integers(0, V - 1, size=(K, L)),
                         dtype=jnp.int32)
    # full prefix rescoring
    full = nnet.apply(variables, enc, prefix, method="decode_step")
    # incremental chain
    cache = nnet.apply(variables, K, L, method="decode_init_cache")
    incs = []
    for t in range(L):
        logits, cache = nnet.apply(variables, enc, prefix[:, t], cache,
                                   t, method="decode_step_inc")
        incs.append(logits)
    inc = jnp.stack(incs, 1)
    np.testing.assert_allclose(np.asarray(inc), np.asarray(full),
                               atol=2e-4)


def test_xfmr_transducer_search(rng):
    """Compiled search with a transformer prediction network (stateless
    fixed-buffer rescoring) + batched variant."""
    from aps_tpu.asr.beam_search.transducer import (beam_search,
                                                    beam_search_batch,
                                                    greedy_search)
    nnet = aps_asr_nnet("asr@xfmr_transducer")(
        input_size=80, vocab_size=V, asr_transform=TRANSFORM,
        enc_type="pytorch_rnn", enc_proj=32,
        enc_kwargs={"hidden": 32, "num_layers": 1, "bidirectional": True},
        dec_kwargs={"att_dim": 32, "jot_dim": 16, "num_layers": 1,
                    "arch_kwargs": {"att_dim": 32, "nhead": 2,
                                    "feedforward_dim": 64}})
    x = jnp.asarray(rng.standard_normal(8000) * 0.1, dtype=jnp.float32)
    rngs = {"params": jax.random.PRNGKey(0),
            "dropout": jax.random.PRNGKey(1), "aug": jax.random.PRNGKey(2)}
    y = jnp.full((1, 5), V - 1, dtype=jnp.int32)
    variables = nnet.init(rngs, x[None], None, y, None, training=False)
    g = greedy_search(nnet, variables, x)
    b = beam_search(nnet, variables, x, beam_size=4, nbest=2,
                    len_norm=False)
    assert len(g) == 1 and len(b) >= 1
    xs = [x, jnp.asarray(rng.standard_normal(6400) * 0.1,
                         dtype=jnp.float32)]
    batched = beam_search_batch(nnet, variables, xs, beam_size=4, nbest=2,
                                len_norm=False)
    single = beam_search(nnet, variables, xs[0], beam_size=4, nbest=2,
                         len_norm=False)
    assert batched[0][0]["trans"] == single[0]["trans"]


def test_beam_search_end_detect(att_model):
    """end_detect stops the loop early but keeps a valid best hypothesis."""
    from aps_tpu.asr.beam_search.att import beam_search
    nnet, variables, x = att_model
    full = beam_search(nnet, variables, x, sos=SOS, eos=EOS, beam_size=4,
                       nbest=1, max_len=16, allow_partial=True)
    early = beam_search(nnet, variables, x, sos=SOS, eos=EOS, beam_size=4,
                        nbest=1, max_len=16, end_detect=True,
                        allow_partial=True)
    assert early[0]["trans"][0] == SOS and early[0]["trans"][-1] == EOS
    assert np.isfinite(early[0]["score"]) and np.isfinite(full[0]["score"])
    # the early stop may truncate partial hypotheses; the best finished
    # prefix must still be a prefix the full search also explored
    assert len(early[0]["trans"]) <= len(full[0]["trans"]) + 16


def test_beam_with_xfmr_lm(att_model):
    """Shallow fusion with a transformer LM (ring-buffer adapter) inside
    the compiled search, single and batched."""
    from aps_tpu.asr.beam_search.att import beam_search, beam_search_batch
    from aps_tpu.asr.beam_search.lm import XfmrLmAdapter
    nnet, variables, x = att_model
    lm = aps_asr_nnet("asr@xfmr_lm")(
        vocab_size=V - 1, num_layers=1,
        arch_kwargs={"att_dim": 16, "nhead": 2, "feedforward_dim": 32})
    lm_vars = lm.init(jax.random.PRNGKey(9),
                      jnp.zeros((1, 4), dtype=jnp.int32), None)
    adapter = XfmrLmAdapter(lm, lm_vars, max_len=12, sos=SOS)
    hyp = beam_search(nnet, variables, x, lm=adapter, lm_weight=0.2,
                      sos=SOS, eos=EOS, beam_size=4, nbest=2, max_len=12,
                      allow_partial=True)
    assert hyp[0]["trans"][0] == SOS and hyp[0]["trans"][-1] == EOS
    batched = beam_search_batch(nnet, variables, [x], lm=adapter,
                                lm_weight=0.2, sos=SOS, eos=EOS,
                                beam_size=4, nbest=2, max_len=12,
                                allow_partial=True)
    assert batched[0][0]["trans"] == hyp[0]["trans"]


def test_single_search_cached_padded_matches_unpadded(xfmr_model):
    """beam_search now pads encoder frames to a 32-frame bucket and runs
    a cached executable (no per-utterance retrace); the result must be
    identical to the direct unpadded search core."""
    from aps_tpu.asr.beam_search import transformer as api
    nnet, variables, x = xfmr_model
    kwargs = dict(sos=SOS, eos=EOS, beam_size=4, nbest=2, max_len=12,
                  ctc_weight=0.3, allow_partial=True)
    hyps = api.beam_search(nnet, variables, x, **kwargs)
    # ground truth: unpadded eager core on the same encoder output
    enc_out, _, ctc_out = api.jit_apply(nnet, variables, x[None],
                                        method="decode_enc")
    assert enc_out.shape[1] % 32 != 0, "fixture no longer pads; adjust"
    param = api._param_from_kwargs(SOS, EOS, beam_size=4, ctc_weight=0.3,
                                   allow_partial=True)
    final = api._search_core(nnet, variables, enc_out[0], None,
                             ctc_out[0], None, param, 12)
    from aps_tpu.asr.beam_search.utils import extract_nbest
    ref = extract_nbest(jax.device_get(final), param, 2, final=True)
    assert [h["trans"] for h in hyps] == [h["trans"] for h in ref]
    np.testing.assert_allclose([h["score"] for h in hyps],
                               [h["score"] for h in ref], rtol=1e-5)
    # second call hits the executable cache (same bucket)
    again = api.beam_search(nnet, variables, x, **kwargs)
    assert [h["trans"] for h in again] == [h["trans"] for h in hyps]
