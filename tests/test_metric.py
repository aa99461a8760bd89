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


def test_builtin_sdr_fallback():
    """The built-in BSS-eval SDR (no museval): a filtered reference scores
    near-perfect (distortion filter absorbs the FIR), noise at a known
    level scores close to the SNR, and permutation is recovered."""
    import numpy as np

    from aps_tpu.metric.sse import permute_sse_metric
    rng = np.random.default_rng(0)
    T = 8000
    a = rng.standard_normal(T).astype(np.float32)
    b = rng.standard_normal(T).astype(np.float32)
    # estimate = reference through a short FIR -> huge SDR
    fir = np.asarray([0.9, 0.05, -0.03])
    a_f = np.convolve(a, fir)[:T].astype(np.float32)
    sdr = permute_sse_metric("sdr", a[None], a_f[None])
    assert sdr > 40, sdr
    # noise at 10 dB below the signal -> SDR ~ 10 dB
    noise = rng.standard_normal(T).astype(np.float32)
    noisy = a + noise * (np.linalg.norm(a) / np.linalg.norm(noise)) * \
        10**(-10 / 20)
    sdr = permute_sse_metric("sdr", a[None], noisy[None])
    assert 8 < sdr < 12, sdr
    # permuted 2-speaker estimate: best permutation recovered
    ref = np.stack([a, b])
    est = np.stack([b, a])
    score, perm = permute_sse_metric("sdr", ref, est,
                                     compute_permutation=True)
    assert tuple(perm) == (1, 0) and score > 40


def test_arpa_ngram_scoring(tmp_path):
    """Pure-python ARPA backoff scorer (no kenlm): hand-checked logprobs
    incl. a backoff path, kenlm score() semantics (<s> conditions, </s>
    scored)."""
    import math

    from aps_tpu.asr.lm.ngram import NgramLM
    arpa = r"""
\data\
ngram 1=5
ngram 2=3

\1-grams:
-0.7	<s>	-0.3
-0.6	a	-0.2
-0.9	b	-0.4
-1.2	</s>
-2.0	<unk>

\2-grams:
-0.1	<s> a
-0.5	a b
-0.8	b </s>

\end\
""".strip() + "\n"
    path = tmp_path / "toy.arpa"
    path.write_text(arpa.replace("\\t", "\t"))
    vocab = {"a": 0, "b": 1}
    lm = NgramLM(str(path), vocab)
    # P(a|<s>) = -0.1 (bigram); P(b|a) = -0.5; P(</s>|b) = -0.8
    want = (-0.1 - 0.5 - 0.8) * math.log(10)
    got = lm.score([0, 1])
    assert abs(got - want) < 1e-6, (got, want)
    # backoff path: P(a|b) = backoff(b) + P(a) = -0.4 + -0.6
    want = (-0.1 + (-0.4 - 0.6) + (-0.2 - 1.2)) * math.log(10)
    # ^ <s> a (bigram), a after b via backoff... compute directly:
    # score([0, 0]) = P(a|<s>) + P(a|a) + P(</s>|a)
    # P(a|a): no bigram "a a" -> backoff(a) -0.2 + P(a) -0.6 = -0.8
    # P(</s>|a): no bigram "a </s>" -> backoff(a) -0.2 + P(</s>) -1.2
    want = (-0.1 + (-0.2 - 0.6) + (-0.2 - 1.2)) * math.log(10)
    got = lm.score([0, 0])
    assert abs(got - want) < 1e-6, (got, want)


def test_builtin_stoi():
    """The built-in STOI: a clean (modulated, speech-like) reference
    scores ~1 against itself, degrades monotonically with added noise,
    and routes through aps_stoi / permute_sse_metric."""
    import numpy as np

    from aps_tpu.metric.sse import aps_stoi, permute_sse_metric
    rng = np.random.default_rng(7)
    fs, dur = 16000, 3.0
    t = np.arange(int(fs * dur)) / fs
    # speech-like toy: broadband noise with 4 Hz energy modulation (all
    # 15 one-third-octave bands carry signal, unlike a pure-tone mix)
    x = rng.standard_normal(t.size) * (0.6 + 0.4 * np.sin(2 * np.pi * 4 * t))
    assert aps_stoi(x, x, fs=fs) > 0.99
    noise = rng.standard_normal(x.size)
    noise *= np.linalg.norm(x) / np.linalg.norm(noise)
    scores = [aps_stoi(x, x + noise * 10**(-snr / 20), fs=fs)
              for snr in (20, 5, -10)]
    assert scores[0] > scores[1] > scores[2], scores
    assert scores[0] > 0.9 and scores[2] < 0.7, scores
    # dispatch via the permuted-metric entry point
    s = permute_sse_metric("stoi", x, x + noise * 10**(-5 / 20), fs=fs)
    assert abs(s - scores[1]) < 1e-9


def test_builtin_bpe_tokenizer(tmp_path):
    """Built-in BPE: training learns frequent merges, encode/decode
    round-trips, JSON save/load preserves behavior, and the registered
    subword tokenizer uses the JSON backend transparently."""
    from aps_tpu.libs import aps_tokenizer
    from aps_tpu.tokenizer.bpe import BpeModel, train_bpe

    corpus = ["the cat sat on the mat",
              "the dog sat on the log",
              "cats and dogs and mats"] * 10
    mdl = train_bpe(corpus, vocab_size=60)
    assert len(mdl.merges) > 0
    pieces = mdl.encode("the cat sat")
    assert mdl.decode(pieces) == "the cat sat"
    # frequent word "the" becomes a single ▁-marked piece
    assert mdl.encode_word("the") == ["▁the"]
    path = str(tmp_path / "bpe.json")
    mdl.save(path)
    again = BpeModel.load(path)
    assert again.encode("dogs on the mat") == mdl.encode("dogs on the mat")
    tok = aps_tokenizer("subword")(spm=path)
    enc = tok.encode(["the", "cat", "sat"])
    assert tok.decode(enc) == ["the", "cat", "sat"]
    # unseen characters map to the <unk> surface (sentencepiece parity)
    assert "<unk>" in tok.encode("zebra+7")
