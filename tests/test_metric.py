"""Metric tests: WER edit distance, SiSNR, reporters."""

import numpy as np
import pytest

from aps_tpu.metric.asr import permute_wer, wer
from aps_tpu.metric.reporter import AverageReporter, WerReporter
from aps_tpu.metric.sse import aps_sisnr, permute_sse_metric


def test_wer_basic():
    assert wer("a b c".split(), "a b c".split()) == (0, 0, 0)
    # one substitution
    assert wer("a x c".split(), "a b c".split()) == (1, 0, 0)
    # one deletion from ref's perspective: hyp has extra token
    sub, ins, dele = wer("a b c d".split(), "a b c".split())
    assert (sub, ins, dele) == (0, 0, 1)
    # one insertion: hyp missing token
    sub, ins, dele = wer("a c".split(), "a b c".split())
    assert (sub, ins, dele) == (0, 1, 0)
    # total error rate
    sub, ins, dele = wer("x y".split(), "a b c".split())
    assert sub + ins + dele == 3


def test_permute_wer():
    h = ["a b c".split(), "d e f".split()]
    r = ["d e f".split(), "a b c".split()]
    assert sum(permute_wer(h, r)) == 0


def test_sisnr():
    rng = np.random.default_rng(0)
    s = rng.standard_normal(8000).astype(np.float32)
    # identical signals -> very high sisnr; scaled -> same (scale invariant)
    assert aps_sisnr(s, s) > 50
    assert aps_sisnr(s, s * 0.5) > 50
    noisy = s + 0.1 * rng.standard_normal(8000).astype(np.float32)
    v = aps_sisnr(s, noisy)
    assert 10 < v < 30


def test_permute_sse_metric():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(4000).astype(np.float32)
    b = rng.standard_normal(4000).astype(np.float32)
    ref = np.stack([a, b])
    est = np.stack([b, a])  # swapped
    v, perm = permute_sse_metric("sisnr", ref, est,
                                 compute_permutation=True)
    assert perm == (1, 0)
    assert v > 50


def test_reporters(capsys):
    rep = AverageReporter(name="SiSNR", unit="dB")
    rep.add("utt1", 10.0)
    rep.add("utt2", 12.0)
    rep.report()
    out = capsys.readouterr().out
    assert "11.000" in out
    wrep = WerReporter(name="WER", unit="%")
    wrep.add("utt1", (1, 0, 1), 10)
    wrep.report()
    out = capsys.readouterr().out
    assert "20.00%" in out
