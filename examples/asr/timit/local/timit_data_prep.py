#!/usr/bin/env python
"""TIMIT data preparation: phone recognition sets with the standard
60 -> 48 (train) and 48 -> 39 (score) phone foldings and the standard
dev(50 spk)/core-test(24 spk) speaker splits. TIMIT ships NIST sphere
audio; wav.scp uses sph2pipe pipes unless the corpus was converted to
RIFF (then plain paths are emitted).

Outputs per set: wav.scp, text (48-phone tokens), utt2dur. The 39-phone
scoring map is written to <out>/phones.map for compute_wer folding."""

import argparse
import glob
import os

# Lee & Hon (1989) foldings used by the standard kaldi/espnet recipes:
# 60 -> 48 for training (q dropped), 48 -> 39 for scoring.
FOLD_48 = {
    "ao": "ao", "ax-h": "ax", "axr": "er", "hv": "hh", "ix": "ix",
    "el": "el", "em": "m", "en": "en", "eng": "ng", "nx": "n",
    "pau": "sil", "h#": "sil", "#h": "sil", "ux": "uw", "q": "",
    "bcl": "vcl", "dcl": "vcl", "gcl": "vcl",
    "pcl": "cl", "tcl": "cl", "kcl": "cl",
}
FOLD_39 = {
    "cl": "sil", "vcl": "sil", "epi": "sil", "el": "l", "en": "n",
    "zh": "sh", "ao": "aa", "ix": "ih", "ax": "ah",
}

# standard 24-speaker core test set
CORE_TEST = {
    "mdab0", "mwbt0", "felc0", "mtas1", "mwew0", "fpas0", "mjmp0",
    "mlnt0", "fpkt0", "mlll0", "mtls0", "fjlm0", "mbpm0", "mklt0",
    "fnlp0", "mcmj0", "mjdh0", "fmgd0", "mgrt0", "mnjm0", "fdhc0",
    "mjln0", "mpam0", "fmld0",
}
# standard 50-speaker development set
DEV = {
    "faks0", "fdac1", "fjem0", "mgwt0", "mjar0", "mmdb1", "mmdm2",
    "mpdf0", "fcmh0", "fkms0", "mbdg0", "mbwm0", "mcsh0", "fadg0",
    "fdms0", "fedw0", "mgjf0", "mglb0", "mrtk0", "mtaa0", "mthc0",
    "mwjg0", "fnmr0", "frew0", "fsem0", "mbns0", "mmjr0", "mdls0",
    "mdlf0", "mdvc0", "mers0", "fmah0", "fdrw0", "mrcs0", "mrjm4",
    "fcal1", "mmwh0", "fjsj0", "majc0", "mjsw0", "mreb0", "fgjd0",
    "fjmg0", "mroa0", "mteb0", "mjfc0", "mrjr0", "fmml0", "mrws1",
    "fcrh0",
}


def fold(phone: str, to39: bool = False) -> str:
    p = FOLD_48.get(phone, phone)
    if to39 and p:
        p = FOLD_39.get(p, p)
    return p


def read_phn(path: str):
    phones = []
    with open(path, "r") as fd:
        for line in fd:
            tokens = line.split()
            if len(tokens) == 3:
                p = fold(tokens[2].lower())
                if p:
                    phones.append(p)
    return phones


def sph_duration(path: str) -> float:
    """Duration from the NIST sphere header (plain-text key/value pairs in
    the first 1 kB), or the RIFF header for corpora already converted to
    plain wav."""
    with open(path, "rb") as fd:
        magic = fd.read(4)
    if magic == b"RIFF":
        import wave
        try:
            with wave.open(path, "rb") as w:
                return w.getnframes() / w.getframerate()
        except Exception:
            return -1.0
    with open(path, "rb") as fd:
        head = fd.read(1024).decode("latin-1", errors="replace")
    fields = dict()
    for line in head.splitlines():
        tokens = line.split()
        if len(tokens) == 3:
            fields[tokens[0]] = tokens[2]
    try:
        return int(fields["sample_count"]) / int(fields["sample_rate"])
    except (KeyError, ValueError):
        return -1.0


def main():
    parser = argparse.ArgumentParser(
        description="Prepare TIMIT phone-recognition sets",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("timit_dir", help="TIMIT root (holds train/ test/)")
    parser.add_argument("out_dir")
    parser.add_argument("--sph2pipe", default="sph2pipe")
    args = parser.parse_args()

    sets = {"train": [], "dev": [], "test": []}
    for split in ("train", "test"):
        for phn in glob.glob(f"{args.timit_dir}/{split}/**/*.phn",
                             recursive=True) + \
                glob.glob(f"{args.timit_dir}/{split.upper()}/**/*.PHN",
                          recursive=True):
            base = os.path.splitext(phn)[0]
            spk = os.path.basename(os.path.dirname(phn)).lower()
            sent = os.path.basename(base).lower()
            if sent.startswith("sa"):  # dialect sentences excluded
                continue
            if split == "train":
                name = "train"
            elif spk in CORE_TEST:
                name = "test"
            elif spk in DEV:
                name = "dev"
            else:
                continue
            wav = None
            for ext in (".wav", ".WAV"):
                if os.path.exists(base + ext):
                    wav = base + ext
                    break
            if wav is None:
                continue
            sets[name].append((f"{spk}_{sent}", wav, read_phn(phn)))

    os.makedirs(args.out_dir, exist_ok=True)
    with open(f"{args.out_dir}/phones.map", "w") as fd:
        for p48, p39 in sorted(FOLD_39.items()):
            fd.write(f"{p48} {p39}\n")
    for name, utts in sets.items():
        out = f"{args.out_dir}/{name}"
        os.makedirs(out, exist_ok=True)
        with open(f"{out}/wav.scp", "w") as wscp, \
                open(f"{out}/text", "w") as txt, \
                open(f"{out}/utt2dur", "w") as dur:
            for key, wav, phones in sorted(utts):
                with open(wav, "rb") as fd:
                    riff = fd.read(4) == b"RIFF"
                value = wav if riff else f"{args.sph2pipe} -f wav {wav} |"
                wscp.write(f"{key} {value}\n")
                txt.write(f"{key} " + " ".join(phones) + "\n")
                secs = sph_duration(wav)
                if secs > 0:
                    dur.write(f"{key} {secs:.2f}\n")
        print(f"{name}: {len(utts)} utts")


if __name__ == "__main__":
    main()
