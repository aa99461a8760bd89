"""Dataloader tests on generated mini corpora (mirrors reference
tests/python/test_dataloader.py, fixtures built on the fly)."""

import numpy as np
import pytest

from aps_tpu.io.audio import read_audio, write_audio
from aps_tpu.libs import aps_dataloader
from aps_tpu.loader.kaldi_io import ArchiveWriter, ScriptReader
from aps_tpu.loader.utils import quantize_len


@pytest.fixture(scope="module")
def am_corpus(tmp_path_factory):
    """20 tiny utterances: wav.scp / text (int tokens) / utt2dur / dict."""
    root = tmp_path_factory.mktemp("am")
    rng = np.random.default_rng(0)
    sr = 16000
    with open(root / "wav.scp", "w") as wscp, \
         open(root / "text", "w") as text, \
         open(root / "utt2dur", "w") as dur:
        for i in range(20):
            n = int(sr * rng.uniform(0.5, 2.0))
            wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
            path = root / f"utt{i:02d}.wav"
            write_audio(str(path), wav, sr=sr)
            toks = rng.integers(0, 10, size=rng.integers(2, 12))
            wscp.write(f"utt{i:02d} {path}\n")
            text.write(f"utt{i:02d} " + " ".join(map(str, toks)) + "\n")
            dur.write(f"utt{i:02d} {n / sr}\n")
    return root


def test_wav_roundtrip(tmp_path, rng):
    wav = np.clip((rng.standard_normal(8000) * 0.3), -0.99,
                  0.99).astype(np.float32)
    write_audio(str(tmp_path / "a.wav"), wav, sr=16000)
    back = read_audio(str(tmp_path / "a.wav"), sr=16000)
    np.testing.assert_allclose(back, wav, atol=1 / 32000)
    # multi-channel
    wav2 = np.clip((rng.standard_normal((2, 8000)) * 0.3), -0.99,
                   0.99).astype(np.float32)
    write_audio(str(tmp_path / "b.wav"), wav2, sr=16000)
    back2 = read_audio(str(tmp_path / "b.wav"), sr=16000)
    assert back2.shape == (2, 8000)
    np.testing.assert_allclose(back2, wav2, atol=1 / 32000)
    # chunk read
    part = read_audio(str(tmp_path / "a.wav"), beg=1000, end=3000)
    np.testing.assert_allclose(part, back[1000:3000], atol=1e-6)


def test_kaldi_ark_roundtrip(tmp_path, rng):
    mats = {f"k{i}": rng.standard_normal(
        (10 + i, 13)).astype(np.float32) for i in range(5)}
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "f.scp")
    with ArchiveWriter(ark, scp) as w:
        for k, m in mats.items():
            w.write(k, m)
    reader = ScriptReader(scp)
    for k, m in mats.items():
        np.testing.assert_allclose(reader[k], m, atol=1e-6)


@pytest.mark.parametrize("batch_mode", ["adaptive", "constraint"])
def test_am_raw_loader(am_corpus, batch_mode):
    loader = aps_dataloader(fmt="am@raw",
                            wav_scp=str(am_corpus / "wav.scp"),
                            text=str(am_corpus / "text"),
                            utt2dur=str(am_corpus / "utt2dur"),
                            train=True,
                            max_dur=10,
                            min_dur=0.1,
                            min_token_num=1,
                            batch_mode=batch_mode,
                            max_batch_size=40 if batch_mode == "constraint"
                            else 8,
                            min_batch_size=1)
    loader.set_epoch(1)
    seen = 0
    for egs in loader:
        assert set(egs.keys()) >= {
            "#utt", "#tok", "src_pad", "tgt_pad", "src_len", "tgt_len"}
        n = egs["#utt"]
        assert egs["src_pad"].shape[0] == n
        assert egs["tgt_pad"].shape[0] == n
        assert (egs["src_len"] <= egs["src_pad"].shape[-1]).all()
        seen += n
    assert seen > 0


def test_am_loader_epoch_determinism(am_corpus):
    def orders(epoch):
        loader = aps_dataloader(fmt="am@raw",
                                wav_scp=str(am_corpus / "wav.scp"),
                                text=str(am_corpus / "text"),
                                utt2dur=str(am_corpus / "utt2dur"),
                                train=True, max_dur=10, min_dur=0.1,
                                min_token_num=1, max_batch_size=4,
                                min_batch_size=1)
        loader.set_epoch(epoch)
        return [egs["src_len"].tolist() for egs in loader]

    assert orders(3) == orders(3)
    assert orders(3) != orders(4)


def test_se_chunk_loader(tmp_path, rng):
    sr, n_utt = 16000, 6
    with open(tmp_path / "mix.scp", "w") as mscp, \
         open(tmp_path / "spk1.scp", "w") as s1, \
         open(tmp_path / "spk2.scp", "w") as s2:
        for i in range(n_utt):
            n = int(sr * rng.uniform(1.0, 3.0))
            for name, f in [("mix", mscp), ("spk1", s1), ("spk2", s2)]:
                wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
                path = tmp_path / f"{name}_{i}.wav"
                write_audio(str(path), wav, sr=sr)
                f.write(f"utt{i} {path}\n")
    loader = aps_dataloader(fmt="se@chunk",
                            mix_scp=str(tmp_path / "mix.scp"),
                            ref_scp=",".join(
                                [str(tmp_path / "spk1.scp"),
                                 str(tmp_path / "spk2.scp")]),
                            chunk_size=16000,
                            max_batch_size=4,
                            num_workers=0)
    batches = list(loader)
    assert len(batches) > 0
    for egs in batches:
        assert egs["mix"].shape == (4, 16000)
        assert len(egs["ref"]) == 2
        assert egs["ref"][0].shape == (4, 16000)


@pytest.mark.parametrize("fmt", ["lm@utt", "lm@bptt"])
def test_lm_loaders(tmp_path, rng, fmt):
    with open(tmp_path / "text", "w") as f:
        for i in range(50):
            toks = rng.integers(2, 40, size=rng.integers(3, 30))
            f.write(f"utt{i} " + " ".join(map(str, toks)) + "\n")
    kwargs = dict(text=str(tmp_path / "text"), sos=0, eos=1,
                  min_token_num=2, max_batch_size=8)
    if fmt == "lm@bptt":
        kwargs["bptt_size"] = 16
    loader = aps_dataloader(fmt=fmt, **kwargs)
    loader.set_epoch(0)
    count = 0
    for egs in loader:
        assert egs["src"].shape == egs["tgt"].shape
        count += 1
    assert count > 0


def test_quantize_len():
    assert quantize_len(100, floor=64, multiple=1, factor=2.0) == 128
    assert quantize_len(100, multiple=8, factor=1.0) == 104
    assert quantize_len(5, floor=64, multiple=1, factor=2.0) == 64
    # monotone & idempotent on grid points
    g = quantize_len(1234, floor=100, multiple=8, factor=1.3)
    assert g >= 1234 and quantize_len(g, floor=100, multiple=8, factor=1.3) == g


def test_simu_cmd(tmp_path, rng):
    sr = 16000
    for name in ["a", "b", "n"]:
        wav = (rng.standard_normal(sr) * 0.1).astype(np.float32)
        write_audio(str(tmp_path / f"{name}.wav"), wav, sr=sr)
    cfg = tmp_path / "simu.cfg"
    cfg.write_text(
        f"mix1 --src-spk {tmp_path}/a.wav,{tmp_path}/b.wav --src-sdr 2 "
        f"--point-noise {tmp_path}/n.wav --point-noise-snr 10\n")
    loader = aps_dataloader(fmt="se@simu_cmd", simu_cfg=str(cfg),
                            chunk_size=8000, max_batch_size=1,
                            num_workers=0)
    batches = list(loader)
    assert len(batches) >= 1
    assert batches[0]["mix"].shape == (1, 8000)
    assert len(batches[0]["ref"]) == 2


def test_se_config_loader(tmp_path, rng):
    """json-spec simulation loader (se@config): hdf5 speaker slices +
    sdr mixing per mixture spec (schema of the reference's
    aps/loader/se/config.py)."""
    import json
    import h5py
    from aps_tpu.const import MAX_INT16
    sr = 16000
    ark = tmp_path / "audio.h5"
    wav = (rng.standard_normal(2 * sr) * 0.1 * MAX_INT16).astype(
        np.float32)
    with h5py.File(ark, "w") as f:
        f.create_dataset("wav", data=wav)
    addr = lambda beg, end: f"{ark}:wav:{beg}:{end}"
    specs = []
    for i in range(3):
        specs.append({
            "key": f"mix{i}",
            "length": 8000,
            "num_channels": 1,
            "num_speakers": 2,
            "speakers": [
                {"utt": addr(0, 8000), "sdr": 0, "offset": 0},
                {"utt": addr(4000, 12000), "sdr": -2, "offset": 0},
            ],
        })
    cfg = tmp_path / "simu.json"
    cfg.write_text(json.dumps(specs))
    loader = aps_dataloader(fmt="se@config", simu_cfg=str(cfg),
                            single_channel=True, chunk_size=8000,
                            max_batch_size=2, num_workers=0)
    batches = list(loader)
    assert len(batches) >= 1
    egs = batches[0]
    assert egs["mix"].shape[-1] == 8000
    # 2 speaker references + the appended noise reference
    assert len(egs["ref"]) == 3
    assert np.isfinite(np.asarray(egs["mix"])).all()


def test_add_room_response(rng):
    """RIR convolution keeps shape and stays finite."""
    from aps_tpu.io.audio import add_room_response
    spk = (rng.standard_normal(4000) * 0.1).astype(np.float32)
    rir = np.zeros((2, 256), dtype=np.float32)
    rir[:, 0] = 1.0
    rir[:, 100] = 0.4
    revb, early, p = add_room_response(spk, rir, sr=16000)
    assert revb.shape == (2, 4000)
    assert np.isfinite(revb).all() and np.isfinite(p)


def test_simu_cmd_rir_and_noise(tmp_path, rng):
    """Full simulation surface: multi-channel RIRs, repeated point noise,
    isotropic noise, SNR scaling."""
    from aps_tpu.loader.simu import make_argparse, run_simu
    sr = 16000
    for name, n in [("a", sr), ("b", sr), ("n", sr // 4)]:
        wav = (rng.standard_normal(n) * 0.1).astype(np.float32)
        write_audio(str(tmp_path / f"{name}.wav"), wav, sr=sr)
    iso = (rng.standard_normal((2, 2 * sr)) * 0.1).astype(np.float32)
    write_audio(str(tmp_path / "iso.wav"), iso, sr=sr)
    rir = np.zeros((2, 128), dtype=np.float32)
    rir[:, 0] = 1.0
    rir[1, 64] = 0.3
    write_audio(str(tmp_path / "rir.wav"), rir, sr=sr)
    args = make_argparse().parse_args([
        "--src-spk", f"{tmp_path}/a.wav,{tmp_path}/b.wav",
        "--src-rir", f"{tmp_path}/rir.wav,{tmp_path}/rir.wav",
        "--src-sdr", "2",
        "--src-begin", "0,4000",
        "--point-noise", f"{tmp_path}/n.wav",
        "--point-noise-rir", f"{tmp_path}/rir.wav",
        "--point-noise-snr", "5",
        "--point-noise-repeat", "true",
        "--isotropic-noise", f"{tmp_path}/iso.wav",
        "--isotropic-noise-snr", "10",
        "--sr", str(sr),
    ])
    mix, refs, noise = run_simu(args)
    assert mix.shape == (2, sr + 4000)
    assert len(refs) == 2 and all(r.shape == (sr + 4000,) for r in refs)
    assert noise.shape == (sr + 4000,)
    assert np.isfinite(mix).all()
    # normalization contract: peak of the mixture == norm factor
    np.testing.assert_allclose(np.max(np.abs(mix)), 0.9, rtol=1e-5)


@pytest.mark.parametrize("method", ["CM", "CM2", "CM3"])
def test_kaldi_compressed_roundtrip(tmp_path, rng, method):
    """Kaldi CompressedMatrix codec (real feats dumps use
    copy-feats --compress=true): write -> read stays within the
    quantization step of each format."""
    mats = {f"k{i}": (rng.standard_normal((20 + i, 13)) * 3).astype(
        np.float32) for i in range(3)}
    ark, scp = str(tmp_path / "c.ark"), str(tmp_path / "c.scp")
    with ArchiveWriter(ark, scp, compress=method) as w:
        for k, m in mats.items():
            w.write(k, m)
    reader = ScriptReader(scp)
    for k, m in mats.items():
        out = reader[k]
        assert out.shape == m.shape
        rng_m = float(m.max() - m.min())
        # quantization step: 255 levels (CM3), 65535 (CM2), ~64 per
        # percentile segment (CM)
        tol = {"CM": rng_m / 40, "CM2": rng_m / 30000,
               "CM3": rng_m / 120}[method]
        np.testing.assert_allclose(out, m, atol=tol)


def test_am_kaldi_loader_compressed(tmp_path, rng):
    """am@kaldi end-to-end over a compressed feats.scp."""
    from aps_tpu.libs import aps_dataloader
    ark, scp = str(tmp_path / "f.ark"), str(tmp_path / "feats.scp")
    text = tmp_path / "text"
    dur = tmp_path / "utt2num_frames"
    lines_t, lines_d = [], []
    with ArchiveWriter(ark, scp, compress="CM") as w:
        for i in range(12):
            T = 80 + 5 * i
            w.write(f"utt{i}", rng.standard_normal((T, 13)).astype(
                np.float32))
            lines_t.append(f"utt{i} a b c")
            lines_d.append(f"utt{i} {T}")
    text.write_text("\n".join(lines_t) + "\n")
    dur.write_text("\n".join(lines_d) + "\n")
    vocab = {"a": 0, "b": 1, "c": 2}
    loader = aps_dataloader(fmt="am@kaldi", feats_scp=scp, text=str(text),
                            utt2num_frames=str(dur), vocab_dict=vocab,
                            max_batch_size=3, num_workers=0,
                            min_batch_size=1)
    batches = list(loader)
    assert len(batches) >= 2
    egs = batches[0]
    assert egs["src_pad"].ndim == 3 and egs["src_pad"].shape[-1] == 13
    assert np.isfinite(egs["src_pad"]).all()


@pytest.mark.parametrize("num_workers", [1, 2, 4])
def test_loader_worker_pool_ordered(num_workers):
    """The prefetching loader must yield the same batches in the same
    order for every worker count, and propagate worker exceptions."""
    import time

    from aps_tpu.loader.utils import SimpleDataLoader

    data = list(range(37))
    batches = [list(range(i, min(i + 5, 37))) for i in range(0, 37, 5)]

    def collate(items):
        time.sleep(0.001 * (items[0] % 3))  # jitter completion order
        return [v * 2 for v in items]

    ref = list(SimpleDataLoader(data, batches, collate, num_workers=0))
    got = list(SimpleDataLoader(data, batches, collate,
                                num_workers=num_workers))
    assert got == ref

    def bad_collate(items):
        if items[0] >= 20:
            raise RuntimeError("boom")
        return items

    with pytest.raises(RuntimeError, match="boom"):
        list(SimpleDataLoader(data, batches, bad_collate,
                              num_workers=num_workers))
