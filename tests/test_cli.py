"""End-to-end CLI tests: tiny train_ss/train_am runs + inference commands
(mirrors reference tests/python/check_cmds.sh / check_decoding.sh)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
# force CPU in subprocesses: clear the axon plugin trigger + set platform
ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           PYTHONPATH=os.pathsep.join(
               [REPO, os.environ.get("PYTHONPATH", "")]))
ENV.pop("PALLAS_AXON_POOL_IPS", None)

pytestmark = pytest.mark.slow  # subprocess CLI chains, minutes each


def run_cmd(args, **kwargs):
    proc = subprocess.run([sys.executable] + args, cwd=REPO, env=ENV,
                          capture_output=True, text=True, **kwargs)
    if proc.returncode != 0:
        raise RuntimeError(f"cmd failed: {' '.join(args)}\n"
                           f"stdout: {proc.stdout[-2000:]}\n"
                           f"stderr: {proc.stderr[-2000:]}")
    return proc


@pytest.fixture(scope="module")
def sse_workspace(tmp_path_factory):
    """Tiny 2-speaker separation corpus + yaml config."""
    from aps_tpu.io import write_audio
    root = tmp_path_factory.mktemp("sse_ws")
    rng = np.random.default_rng(1)
    sr, n_utt, S = 16000, 12, 16384
    for sub in ["tr", "cv"]:
        utts = range(n_utt if sub == "tr" else 4)
        with open(root / f"{sub}_mix.scp", "w") as m, \
             open(root / f"{sub}_spk1.scp", "w") as s1, \
             open(root / f"{sub}_spk2.scp", "w") as s2:
            for i in utts:
                t = np.linspace(0, 1, S)
                a = np.sin(2 * np.pi * rng.uniform(200, 400) * t)
                b = np.sin(2 * np.pi * rng.uniform(500, 800) * t)
                a = (a * 0.3).astype(np.float32)
                b = (b * 0.3).astype(np.float32)
                mix = a + b
                for name, sig, fd in [("mix", mix, m), ("spk1", a, s1),
                                      ("spk2", b, s2)]:
                    path = root / f"{sub}_{name}_{i}.wav"
                    write_audio(str(path), sig, sr=sr)
                    fd.write(f"utt{i} {path}\n")
    conf = {
        "nnet": "sse@base_rnn",
        "nnet_conf": {
            "input_size": 257, "num_bins": 257, "num_spks": 2,
            "hidden": 32, "num_layers": 1, "bidirectional": True,
            "training_mode": "time",
        },
        "enh_transform": {
            "feats": "spectrogram-log-cmvn", "frame_len": 512,
            "frame_hop": 256,
        },
        "task": "sse@sisnr",
        "task_conf": {"num_spks": 2},
        "data_conf": {
            "fmt": "se@chunk",
            "loader": {"chunk_size": 16384, "sr": 16000},
            "train": {
                "mix_scp": str(root / "tr_mix.scp"),
                "ref_scp": f"{root}/tr_spk1.scp,{root}/tr_spk2.scp",
            },
            "valid": {
                "mix_scp": str(root / "cv_mix.scp"),
                "ref_scp": f"{root}/cv_spk1.scp,{root}/cv_spk2.scp",
            },
        },
        "trainer_conf": {
            "optimizer": "adam",
            "optimizer_kwargs": {"lr": 1e-3},
            "lr_scheduler": "reduce_lr",
            "lr_scheduler_kwargs": {"factor": 0.5, "patience": 2},
            "clip_gradient": 5.0,
            "no_impr": 10,
            "report_metrics": ["loss"],
        },
    }
    conf_path = root / "1a.yaml"
    with open(conf_path, "w") as f:
        yaml.dump(conf, f)
    return root, conf_path


def test_train_ss_and_separate(sse_workspace, tmp_path):
    root, conf_path = sse_workspace
    cpt = tmp_path / "exp"
    # num-workers 3 routes through the ordered thread-pool prefetcher
    # (order-preserving, so training is bit-identical to inline loading)
    run_cmd(["cmd/train_ss.py", "--conf", str(conf_path),
             "--checkpoint", str(cpt), "--batch-size", "4",
             "--epochs", "2", "--num-workers", "3"])
    assert (cpt / "best.ckpt").exists()
    assert (cpt / "train.yaml").exists()
    # separation inference
    sep_dir = tmp_path / "sep"
    run_cmd(["cmd/separate.py", str(root / "cv_mix.scp"), str(sep_dir),
             "--checkpoint", str(cpt)])
    assert (sep_dir / "spk1" / "utt0.wav").exists()
    # metric against references
    with open(tmp_path / "sep1.scp", "w") as f1, \
         open(tmp_path / "sep2.scp", "w") as f2:
        for i in range(4):
            f1.write(f"utt{i} {sep_dir}/spk1/utt{i}.wav\n")
            f2.write(f"utt{i} {sep_dir}/spk2/utt{i}.wav\n")
    proc = run_cmd(["cmd/compute_ss_metric.py",
                    f"{tmp_path}/sep1.scp,{tmp_path}/sep2.scp",
                    f"{root}/cv_spk1.scp,{root}/cv_spk2.scp",
                    "--metric", "sisnr",
                    "--per-utt", f"{tmp_path}/sisnr_utt",
                    "--utt-ali", f"{tmp_path}/sisnr_ali"])
    assert "Total:" in proc.stdout
    assert len(open(tmp_path / "sisnr_utt").readlines()) == 4
    for line in open(tmp_path / "sisnr_ali"):
        assert sorted(line.split()[1:]) == ["0", "1"]
    # batched separation matches per-utterance (equal-length inputs)
    sep_b = tmp_path / "sep_batched"
    run_cmd(["cmd/separate.py", str(root / "cv_mix.scp"), str(sep_b),
             "--checkpoint", str(cpt), "--batch-size", "4"])
    from aps_tpu.io import read_audio
    a = read_audio(str(sep_dir / "spk1" / "utt0.wav"))
    b = read_audio(str(sep_b / "spk1" / "utt0.wav"))
    assert a.shape == b.shape
    np.testing.assert_allclose(a, b, atol=2e-4)
    # chunked inference + overlap stitching (reference --chunk-cfg
    # 'lctx,chunk,rctx' seconds): output length matches and the
    # mid-chunk samples agree with the whole-utterance separation
    sep_c = tmp_path / "sep_chunked"
    run_cmd(["cmd/separate.py", str(root / "cv_mix.scp"), str(sep_c),
             "--checkpoint", str(cpt), "--chunk-cfg", "0.1,0.3,0.1"])
    c = read_audio(str(sep_c / "spk1" / "utt0.wav"))
    assert c.shape == a.shape
    assert np.isfinite(c).all() and np.abs(c).max() > 0
    # the toy BiRNN is global over time, so stitched chunks legitimately
    # differ from the whole-utterance pass — shape/energy is the contract
    # freq mode dumps the TF masks as .npy (reference cmd/separate.py:113)
    sep_f = tmp_path / "sep_freq"
    run_cmd(["cmd/separate.py", str(root / "cv_mix.scp"), str(sep_f),
             "--checkpoint", str(cpt), "--mode", "freq"])
    masks = np.load(sep_f / "utt0.npy")
    assert masks.ndim == 3 and masks.shape[0] == 2  # num_spks x F x T
    assert np.all(masks >= 0)


@pytest.fixture(scope="module")
def am_workspace(tmp_path_factory):
    from aps_tpu.io import write_audio
    root = tmp_path_factory.mktemp("am_ws")
    rng = np.random.default_rng(2)
    sr = 16000
    vocab = {"<unk>": 0, "a": 1, "b": 2, "c": 3, "<sos>": 4, "<eos>": 5}
    with open(root / "dict", "w") as f:
        for k, v in vocab.items():
            f.write(f"{k} {v}\n")
    for sub, n in [("tr", 12), ("cv", 10)]:
        with open(root / f"{sub}_wav.scp", "w") as w, \
             open(root / f"{sub}_text", "w") as t, \
             open(root / f"{sub}_dur", "w") as d:
            for i in range(n):
                S = int(sr * rng.uniform(0.5, 1.0))
                wav = (rng.standard_normal(S) * 0.1).astype(np.float32)
                path = root / f"{sub}_{i}.wav"
                write_audio(str(path), wav, sr=sr)
                toks = " ".join(rng.choice(["a", "b", "c"],
                                           rng.integers(2, 6)))
                w.write(f"utt{i} {path}\n")
                t.write(f"utt{i} {toks}\n")
                d.write(f"utt{i} {S / sr}\n")
    conf = {
        "nnet": "asr@att",
        "nnet_conf": {
            "input_size": 40,
            "att_type": "ctx",
            "att_kwargs": {"att_dim": 16},
            "enc_type": "pytorch_rnn",
            "enc_proj": 32,
            "enc_kwargs": {"hidden": 32, "num_layers": 1,
                           "bidirectional": True},
            "dec_kwargs": {"hidden": 32, "num_layers": 1},
        },
        "asr_transform": {
            "feats": "fbank-log-cmvn", "frame_len": 400, "frame_hop": 160,
            "num_mels": 40, "window": "hamm",
        },
        "task": "asr@ctc_xent",
        "task_conf": {"ctc_weight": 0.2, "lsm_factor": 0.1},
        "data_conf": {
            "fmt": "am@raw",
            "loader": {"max_dur": 10, "min_dur": 0.1, "min_token_num": 1,
                       "tokenizer": "word"},
            "train": {
                "wav_scp": str(root / "tr_wav.scp"),
                "text": str(root / "tr_text"),
                "utt2dur": str(root / "tr_dur"),
            },
            "valid": {
                "wav_scp": str(root / "cv_wav.scp"),
                "text": str(root / "cv_text"),
                "utt2dur": str(root / "cv_dur"),
            },
        },
        "trainer_conf": {
            "optimizer": "adam",
            "optimizer_kwargs": {"lr": 1e-3},
            "lr_scheduler": "reduce_lr",
            "lr_scheduler_kwargs": {},
            "clip_gradient": 5.0,
            "no_impr": 10,
            "report_metrics": ["loss", "accu"],
        },
    }
    conf_path = root / "1a.yaml"
    with open(conf_path, "w") as f:
        yaml.dump(conf, f)
    return root, conf_path


def test_train_am_and_decode(am_workspace, tmp_path):
    root, conf_path = am_workspace
    cpt = tmp_path / "exp"
    run_cmd(["cmd/train_am.py", "--conf", str(conf_path),
             "--checkpoint", str(cpt), "--batch-size", "4",
             "--epochs", "1", "--dict", str(root / "dict"),
             "--num-workers", "0", "--dev-batch-factor", "2"])
    assert (cpt / "best.ckpt").exists()
    assert (cpt / "dict").exists()
    # decode (exercising the search-knob plumbing: --disable-unk masks the
    # <unk> id, --end-detect early-stops, --allow-partial keeps hypotheses)
    out = tmp_path / "hyp.text"
    run_cmd(["cmd/decode.py", str(root / "cv_wav.scp"), str(out),
             "--am", str(cpt), "--beam-size", "2", "--nbest", "1",
             "--max-len", "8", "--dict", str(cpt / "dict"),
             "--disable-unk", "true", "--end-detect", "true",
             "--allow-partial", "true"])
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 10
    assert all("<unk>" not in line for line in lines)
    # compute wer runs (+ per-utterance dump)
    per_utt = tmp_path / "per_utt"
    proc = run_cmd(["cmd/compute_wer.py", str(out),
                    str(root / "cv_text"), "--per-utt", str(per_utt)])
    assert "WER" in proc.stdout
    assert len(open(per_utt).readlines()) == 10


def test_cli_tools(am_workspace, tmp_path):
    """Functional smoke of the remaining data/eval tools: gmvn, wav
    archives, audio checks, durations, batched decode."""
    root, conf_path = am_workspace
    # global cmvn over transform output
    gmvn = tmp_path / "gmvn.npy"
    run_cmd(["cmd/compute_gmvn.py", str(root / "tr_wav.scp"), str(gmvn),
             "--conf", str(conf_path)])
    assert gmvn.exists()
    # wav archive round trip
    ark = tmp_path / "wav.ark"
    scp = tmp_path / "wav_ark.scp"
    run_cmd(["cmd/archive_wav.py", str(root / "tr_wav.scp"), str(ark),
             str(scp)])
    out_dir = tmp_path / "extracted"
    run_cmd(["cmd/extract_wav.py", str(scp), str(out_dir)])
    import numpy as np
    from aps_tpu.io import read_audio
    orig = dict(line.split() for line in open(root / "tr_wav.scp"))
    got = read_audio(str(out_dir / "utt0.wav"))
    ref = read_audio(orig["utt0"])
    assert got.shape == ref.shape
    np.testing.assert_allclose(got, ref, atol=1e-4)
    # sharded archive: 2 arks + merged scp, same audio back
    ark2 = tmp_path / "sh.ark"
    scp2 = tmp_path / "sh.scp"
    run_cmd(["cmd/archive_wav.py", str(root / "tr_wav.scp"), str(ark2),
             str(scp2), "--num-jobs", "2", "--num-arks", "2"])
    assert (tmp_path / "sh.0.ark").exists() and (tmp_path /
                                                 "sh.1.ark").exists()
    assert len(open(scp2).readlines()) == 12
    from aps_tpu.io import AudioReader
    np.testing.assert_allclose(AudioReader(str(scp2))["utt0"], ref,
                               atol=1e-4)
    # segments: extract slices named by segment key
    seg_file = tmp_path / "segments"
    with open(seg_file, "w") as fd:
        fd.write("utt0-a utt0 0.00 0.20\nutt0-b utt0 0.20 0.40\n")
    seg_dir = tmp_path / "seg_extracted"
    run_cmd(["cmd/extract_wav.py", str(root / "tr_wav.scp"), str(seg_dir),
             "--segment", str(seg_file)])
    a = read_audio(str(seg_dir / "utt0-a.wav"))
    assert a.shape[-1] == 3200
    np.testing.assert_allclose(a, ref[:3200], atol=1e-4)
    # audio sanity scan
    proc = run_cmd(["cmd/check_audio.py", str(root / "tr_wav.scp")])
    # durations
    dur = tmp_path / "utt2dur"
    run_cmd(["utils/wav_duration.py", str(root / "tr_wav.scp"), str(dur)])
    assert len(open(dur).readlines()) == 12


def test_align_and_lm_rescore(am_workspace, tmp_path):
    """CTC forced alignment + nbest LM rescoring end to end."""
    root, conf_path = am_workspace
    import yaml as _yaml
    conf = _yaml.safe_load(open(conf_path))
    # encoder-only CTC model for alignment
    conf["nnet"] = "asr@ctc"
    conf["nnet_conf"] = {
        "input_size": 40, "enc_type": "pytorch_rnn", "enc_proj": 32,
        "enc_kwargs": {"hidden": 32, "num_layers": 1,
                       "bidirectional": True},
    }
    conf["task"] = "asr@ctc"
    conf["task_conf"] = {}
    conf["trainer_conf"]["report_metrics"] = ["loss"]
    ctc_conf = tmp_path / "ctc.yaml"
    with open(ctc_conf, "w") as f:
        _yaml.dump(conf, f)
    cpt = tmp_path / "ctc_exp"
    run_cmd(["cmd/train_am.py", "--conf", str(ctc_conf),
             "--checkpoint", str(cpt), "--batch-size", "4",
             "--epochs", "1", "--dict", str(root / "dict"),
             "--num-workers", "0"])
    ali = tmp_path / "ali.text"
    run_cmd(["cmd/align.py", str(root / "cv_wav.scp"),
             str(root / "cv_text"), str(ali), "--am", str(cpt),
             "--dict", str(cpt / "dict")])
    assert len(open(ali).readlines()) == 10
    # CTC prefix beam search through decode.py (encoder-only model)
    hyp_ctc = tmp_path / "hyp_ctc.text"
    run_cmd(["cmd/decode.py", str(root / "cv_wav.scp"), str(hyp_ctc),
             "--am", str(cpt), "--beam-size", "2", "--nbest", "1",
             "--dict", str(cpt / "dict")])
    assert len(open(hyp_ctc).readlines()) == 10
    # train a tiny LM and rescore an nbest list
    lm_conf = {
        "nnet": "asr@rnn_lm",
        "nnet_conf": {"embed_size": 8, "hidden_size": 16, "num_layers": 1},
        "task": "asr@lm",
        "task_conf": {},
        "data_conf": {
            "fmt": "lm@utt",
            "loader": {"min_token_num": 1, "tokenizer": "word"},
            "train": {"text": str(root / "tr_text")},
            "valid": {"text": str(root / "cv_text")},
        },
        "trainer_conf": {
            "optimizer": "adam", "optimizer_kwargs": {"lr": 1e-3},
            "lr_scheduler": "reduce_lr", "lr_scheduler_kwargs": {},
            "report_metrics": ["loss", "@ppl"],
            "stop_criterion": "loss",
        },
    }
    lm_yaml = tmp_path / "lm.yaml"
    with open(lm_yaml, "w") as f:
        _yaml.dump(lm_conf, f)
    lm_cpt = tmp_path / "lm_exp"
    run_cmd(["cmd/train_lm.py", "--conf", str(lm_yaml),
             "--checkpoint", str(lm_cpt), "--batch-size", "4",
             "--epochs", "1", "--dict", str(root / "dict"),
             "--num-workers", "0"])
    # nbest file: header + per-utt blocks
    nbest = tmp_path / "nbest.text"
    with open(nbest, "w") as f:
        f.write("2\n")
        for i in range(4):
            f.write(f"utt{i}\n")
            f.write("-1.0 2 a b\n")
            f.write("-2.0 3 b c a\n")
    out = tmp_path / "rescored.text"
    run_cmd(["cmd/lm_rescore.py", str(nbest), str(out),
             "--lm", str(lm_cpt), "--lm-weight", "0.3",
             "--dict", str(root / "dict")])
    assert len(open(out).readlines()) == 4


def test_decode_batch_cli(am_workspace, tmp_path):
    """Bucketed batched decoding through the CLI."""
    root, conf_path = am_workspace
    cpt = tmp_path / "exp"
    run_cmd(["cmd/train_am.py", "--conf", str(conf_path),
             "--checkpoint", str(cpt), "--batch-size", "4",
             "--epochs", "1", "--dict", str(root / "dict"),
             "--num-workers", "0"])
    out = tmp_path / "hyp_batch.text"
    run_cmd(["cmd/decode_batch.py", str(root / "cv_wav.scp"), str(out),
             "--am", str(cpt), "--beam-size", "2", "--nbest", "1",
             "--max-len", "8", "--batch-size", "4",
             "--dict", str(cpt / "dict")])
    lines = open(out).read().strip().split("\n")
    assert len(lines) == 10
    # data-parallel: batches sharded over the 8-CPU mesh, same output
    out_dp = tmp_path / "hyp_dp.text"
    run_cmd(["cmd/decode_batch.py", str(root / "cv_wav.scp"), str(out_dp),
             "--am", str(cpt), "--beam-size", "2", "--nbest", "1",
             "--max-len", "8", "--batch-size", "8", "--data-parallel",
             "--dict", str(cpt / "dict")])
    hyp = dict(ln.split("\t") for ln in lines if "\t" in ln)
    for ln in open(out_dp).read().strip().split("\n"):
        if "\t" in ln:
            key, txt = ln.split("\t")
            assert hyp[key] == txt, f"{key}: dp '{txt}' != '{hyp[key]}'"


def test_decode_with_lm_fusion(am_workspace, tmp_path):
    """decode.py with shallow NN LM fusion + nbest dump + greedy mode."""
    root, conf_path = am_workspace
    cpt = tmp_path / "exp"
    run_cmd(["cmd/train_am.py", "--conf", str(conf_path),
             "--checkpoint", str(cpt), "--batch-size", "4",
             "--epochs", "1", "--dict", str(root / "dict"),
             "--num-workers", "0"])
    import yaml as _yaml
    lm_conf = {
        "nnet": "asr@rnn_lm",
        "nnet_conf": {"embed_size": 8, "hidden_size": 16, "num_layers": 1},
        "task": "asr@lm", "task_conf": {},
        "data_conf": {
            "fmt": "lm@utt",
            "loader": {"min_token_num": 1, "tokenizer": "word"},
            "train": {"text": str(root / "tr_text")},
            "valid": {"text": str(root / "cv_text")},
        },
        "trainer_conf": {
            "optimizer": "adam", "optimizer_kwargs": {"lr": 1e-3},
            "lr_scheduler": "reduce_lr", "lr_scheduler_kwargs": {},
            "report_metrics": ["loss", "@ppl"], "stop_criterion": "loss",
        },
    }
    lm_yaml = tmp_path / "lm.yaml"
    with open(lm_yaml, "w") as f:
        _yaml.dump(lm_conf, f)
    lm_cpt = tmp_path / "lm_exp"
    run_cmd(["cmd/train_lm.py", "--conf", str(lm_yaml),
             "--checkpoint", str(lm_cpt), "--batch-size", "4",
             "--epochs", "1", "--dict", str(root / "dict"),
             "--num-workers", "0"])
    out = tmp_path / "hyp_lm.text"
    nbest = tmp_path / "nbest.text"
    run_cmd(["cmd/decode.py", str(root / "cv_wav.scp"), str(out),
             "--am", str(cpt), "--lm", str(lm_cpt), "--lm-weight", "0.2",
             "--beam-size", "2", "--nbest", "2", "--max-len", "8",
             "--dump-nbest", str(nbest), "--dict", str(cpt / "dict")])
    assert len(open(out).readlines()) == 10
    from aps_tpu.io import NbestReader
    reader = NbestReader(str(nbest))
    assert len(reader) == 10
    # greedy mode
    out_g = tmp_path / "hyp_greedy.text"
    run_cmd(["cmd/decode.py", str(root / "cv_wav.scp"), str(out_g),
             "--am", str(cpt), "--function", "greedy_search",
             "--max-len", "8", "--dict", str(cpt / "dict")])
    assert len(open(out_g).readlines()) == 10
    # ngram (ARPA) fusion: decode.py switches to nbest-rescoring mode
    # through the built-in ARPA scorer (no kenlm needed)
    vocab = [ln.split()[0] for ln in open(root / "dict")]
    words = [w for w in vocab if not w.startswith("<")]
    lines = ["\\data\\", f"ngram 1={len(words) + 3}", "", "\\1-grams:",
             "-0.5\t<s>\t-0.3", "-1.0\t</s>", "-3.0\t<unk>"]
    lines += [f"-1.0\t{w}\t-0.5" for w in words]
    lines += ["", "\\end\\", ""]
    arpa = tmp_path / "lm.arpa"
    arpa.write_text("\n".join(lines))
    out_ng = tmp_path / "hyp_ngram.text"
    run_cmd(["cmd/decode.py", str(root / "cv_wav.scp"), str(out_ng),
             "--am", str(cpt), "--lm", str(arpa), "--lm-weight", "0.3",
             "--beam-size", "2", "--nbest", "1", "--max-len", "8",
             "--dict", str(cpt / "dict")])
    assert len(open(out_ng).readlines()) == 10


def test_average_checkpoint_and_export(tmp_path):
    """Parameter averaging over epoch checkpoints + StableHLO export CLI
    on a toy rt_sse model."""
    run_cmd(["demos/real_time_enhancement/python/make_toy_checkpoint.py",
             str(tmp_path / "cpt"), "--num-layers", "1", "--lctx", "1",
             "--rctx", "1"])
    # fake epoch checkpoints: copies of best.ckpt
    import shutil
    for n in (1, 2, 3):
        shutil.copy(tmp_path / "cpt" / "best.ckpt",
                    tmp_path / "cpt" / f"epoch.{n}.ckpt")
    avg = tmp_path / "cpt" / "avg.ckpt"
    run_cmd(["cmd/average_checkpoint.py", str(tmp_path / "cpt"), str(avg),
             "--beg", "1", "--end", "3"])
    assert avg.exists()
    # averaging identical checkpoints must reproduce the weights
    import pickle
    import numpy as np
    ref = pickle.load(open(tmp_path / "cpt" / "best.ckpt", "rb"))["params"]
    got = pickle.load(open(avg, "rb"))["params"]
    import jax
    for a, b in zip(jax.tree_util.tree_leaves(ref),
                    jax.tree_util.tree_leaves(got)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # StableHLO export
    out_dir = tmp_path / "export"
    run_cmd(["cmd/export.py", str(tmp_path / "cpt"), str(out_dir),
             "--function", "mask_predict", "--num-frames", "3",
             "--num-bins", "257"])
    assert (out_dir / "model.stablehlo").exists()
    assert (out_dir / "model.json").exists()


def test_utils_data_tools(tmp_path):
    """utils/{tokenizer,filter_scp,split_scp}.py (reference utils/ parity)."""
    text = tmp_path / "text"
    text.write_text("utt1 hello world\nutt2 foo bar\nutt3 baz qux\n"
                    "utt4 one two\n")
    # tokenizer: char units + vocab dump
    tok = tmp_path / "tok"
    vocab = tmp_path / "dict"
    run_cmd(["utils/tokenizer.py", str(text), str(tok), "--unit", "char",
             "--space", "<space>", "--dump-vocab", str(vocab),
             "--add-units", "<sos>,<eos>,<unk>"])
    lines = tok.read_text().strip().split("\n")
    assert lines[0].split("\t")[0] == "utt1"
    assert lines[0].split("\t")[1].split()[:6] == \
        ["h", "e", "l", "l", "o", "<space>"]
    units = dict(ln.split() for ln in vocab.read_text().strip().split("\n"))
    assert units["<sos>"] == "0" and units["<eos>"] == "1"
    assert "<space>" in units and "h" in units
    # filter_scp: keep & exclude
    ids = tmp_path / "ids"
    ids.write_text("utt1\nutt3\n")
    kept = run_cmd(["utils/filter_scp.py", str(ids), str(text)]).stdout
    assert [ln.split()[0] for ln in kept.strip().split("\n")] == \
        ["utt1", "utt3"]
    dropped = run_cmd(["utils/filter_scp.py", "--exclude", str(ids),
                       str(text)]).stdout
    assert [ln.split()[0] for ln in dropped.strip().split("\n")] == \
        ["utt2", "utt4"]
    # split_scp: 3-way split covers all lines, near-equal
    outs = [str(tmp_path / f"s{i}.scp") for i in range(3)]
    run_cmd(["utils/split_scp.py", str(text)] + outs)
    got = []
    for o in outs:
        part = open(o).read().strip().split("\n")
        assert len(part) in (1, 2)
        got += part
    assert sorted(ln.split()[0] for ln in got) == \
        ["utt1", "utt2", "utt3", "utt4"]
    # -j mode reproduces chunk 1
    run_cmd(["utils/split_scp.py", "-j", "3", "1", str(text),
             str(tmp_path / "j1.scp")])
    assert open(tmp_path / "j1.scp").read() == open(outs[1]).read()
    # --utt2spk keeps speakers together
    u2s = tmp_path / "utt2spk"
    u2s.write_text("utt1 A\nutt2 A\nutt3 B\nutt4 B\n")
    outs2 = [str(tmp_path / f"u{i}.scp") for i in range(2)]
    run_cmd(["utils/split_scp.py", f"--utt2spk={u2s}", str(text)] + outs2)
    assert [ln.split()[0] for ln in open(outs2[0]).read().split("\n")
            if ln] == ["utt1", "utt2"]


def test_text_tokenize_cli(tmp_path):
    """cmd/text_tokenize.py: kaldi/raw formats, unit filtering, vocab dump
    (parity: /root/reference/cmd/text_tokenize.py)."""
    text = tmp_path / "text"
    text.write_text("utt1 hello world\nutt2 foo foo bar\n")
    tok = tmp_path / "tok"
    vocab = tmp_path / "dict"
    # kaldi format + word units + vocab dump (default <unk> prefix,
    # <sos>/<eos> appended)
    run_cmd(["cmd/text_tokenize.py", str(text), str(tok), "--unit", "word",
             "--text-format", "kaldi", "--dump-vocab", str(vocab),
             "--filter-units", "bar"])
    lines = tok.read_text().strip().split("\n")
    assert lines[0].split()[0] == "utt1"
    assert lines[0].split()[1:] == ["hello", "world"]
    assert lines[1].split()[1:] == ["foo", "foo"]  # bar filtered out
    units = dict(ln.split() for ln in vocab.read_text().strip().split("\n"))
    assert units["<unk>"] == "0"
    assert units["foo"] == "1"  # most frequent corpus unit after prefix
    assert "bar" not in units
    assert int(units["<eos>"]) == int(units["<sos>"]) + 1
    # raw format + char units: no utterance keys in the output
    raw = tmp_path / "raw"
    raw.write_text("ab cd\n")
    tok2 = tmp_path / "tok2"
    run_cmd(["cmd/text_tokenize.py", str(raw), str(tok2), "--unit", "char",
             "--text-format", "raw", "--space", "<space>"])
    assert tok2.read_text().split() == ["a", "b", "<space>", "c", "d"]


def test_train_am_multichannel_mvdr_and_decode(tmp_path):
    """Multi-channel ASR end to end through the real CLI chain: a
    mask-based MVDR front-end (asr@enh_att, chime4-recipe shape) trains
    jointly with the AED back-end on 3-channel wavs, then decodes.
    Covers the aps/asr/enh_att.py + filter/mvdr.py capability as a CLI
    citizen, not just a unit forward."""
    from aps_tpu.io import write_audio
    root = tmp_path / "mc_ws"
    root.mkdir()
    rng = np.random.default_rng(5)
    sr, C = 16000, 3
    vocab = {"<unk>": 0, "a": 1, "b": 2, "c": 3, "<sos>": 4, "<eos>": 5}
    with open(root / "dict", "w") as f:
        for k, v in vocab.items():
            f.write(f"{k} {v}\n")
    for sub, n in [("tr", 12), ("cv", 10)]:
        with open(root / f"{sub}_wav.scp", "w") as w, \
             open(root / f"{sub}_text", "w") as t, \
             open(root / f"{sub}_dur", "w") as d:
            for i in range(n):
                S = int(sr * rng.uniform(0.5, 0.8))
                base = rng.standard_normal(S) * 0.1
                # simple delayed copies: gives the MVDR real spatial
                # structure without an RIR dependency
                chans = [np.roll(base, k) for k in range(C)]
                wav = np.stack(chans, axis=-1).astype(np.float32)  # S x C
                path = root / f"{sub}_{i}.wav"
                write_audio(str(path), wav, sr=sr)
                toks = " ".join(rng.choice(["a", "b", "c"],
                                           rng.integers(2, 5)))
                w.write(f"utt{i} {path}\n")
                t.write(f"utt{i} {toks}\n")
                d.write(f"utt{i} {S / sr}\n")
    conf = {
        "nnet": "asr@enh_att",
        "nnet_conf": {
            "input_size": 40,
            "enh_type": "rnn_mask_mvdr",
            "enh_kwargs": {"num_bins": 129, "hidden_size": 32,
                           "num_layers": 1},
            "att_type": "dot",
            "att_kwargs": {"att_dim": 16},
            "enc_type": "pytorch_rnn",
            "enc_proj": 32,
            "enc_kwargs": {"hidden": 32, "num_layers": 1,
                           "bidirectional": True},
            "dec_kwargs": {"hidden": 32, "num_layers": 1},
        },
        "enh_transform": {
            "feats": "spectrogram-log-cmvn", "frame_len": 256,
            "frame_hop": 128,
        },
        # no STFT here: the MVDR front-end already emits magnitude
        # spectra (reference uses abs-mel-... for enh_att back-ends)
        "asr_transform": {
            "feats": "abs-mel-log-cmvn", "frame_len": 256,
            "frame_hop": 128, "num_mels": 40,
        },
        "task": "asr@ctc_xent",
        "task_conf": {"ctc_weight": 0.2, "lsm_factor": 0.1},
        "data_conf": {
            "fmt": "am@raw",
            "loader": {"channel": -1, "max_dur": 10, "min_dur": 0.1,
                       "min_token_num": 1, "tokenizer": "word"},
            "train": {
                "wav_scp": str(root / "tr_wav.scp"),
                "text": str(root / "tr_text"),
                "utt2dur": str(root / "tr_dur"),
            },
            "valid": {
                "wav_scp": str(root / "cv_wav.scp"),
                "text": str(root / "cv_text"),
                "utt2dur": str(root / "cv_dur"),
            },
        },
        "trainer_conf": {
            "optimizer": "adam",
            "optimizer_kwargs": {"lr": 1e-3},
            "lr_scheduler": "reduce_lr",
            "lr_scheduler_kwargs": {},
            "clip_gradient": 5.0,
            "no_impr": 10,
            "report_metrics": ["loss", "accu"],
        },
    }
    conf_path = root / "1a.yaml"
    with open(conf_path, "w") as f:
        yaml.dump(conf, f)
    cpt = tmp_path / "exp_mc"
    run_cmd(["cmd/train_am.py", "--conf", str(conf_path),
             "--dict", str(root / "dict"), "--checkpoint", str(cpt),
             "--batch-size", "4", "--epochs", "2"])
    assert (cpt / "best.ckpt").exists()
    out = tmp_path / "mc_decode"
    run_cmd(["cmd/decode.py", str(root / "cv_wav.scp"), str(out),
             "--am", str(cpt), "--dict", str(root / "dict"),
             "--beam-size", "4", "--max-len", "8", "--channel", "-1",
             "--allow-partial", "true"])
    hyp = {ln.split(maxsplit=1)[0] for ln in open(out) if ln.strip()}
    assert hyp == {f"utt{i}" for i in range(10)}
