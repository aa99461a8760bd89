#!/usr/bin/env python
"""WSJ (WSJ0+WSJ1) data preparation: walks the LDC discs for .wv1/.wav
audio and .dot transcription files, builds wav.scp/text/utt2dur for
train_si284, dev93 (si_dt_20) and eval92 (si_et_20).

.wv1 (NIST sphere) entries are emitted as sph2pipe pipes; plain .wav
files are referenced directly. Counterpart of the reference's
kaldi-derived local/*_data_prep.sh scripts."""

import argparse
import glob
import os
import re
import wave

SETS = {
    "train_si284": ["si_tr_s", "sd_tr_s", "si_tr_l"],
    "dev93": ["si_dt_20"],
    "eval92": ["si_et_20"],
}


def load_dot_files(root: str):
    """utt-id -> normalized transcription from every *.dot under root."""
    text = {}
    for dot in glob.glob(f"{root}/**/*.dot", recursive=True):
        with open(dot, "r", encoding="utf-8", errors="replace") as fd:
            for line in fd:
                m = re.match(r"^(.*)\((\S+)\)\s*$", line.strip())
                if not m:
                    continue
                words, key = m.group(1).strip().upper(), m.group(2).lower()
                # drop verbal punctuation / noise markers
                words = re.sub(r"[.~]|\\|\[[^]]*\]|<[^>]*>", " ", words)
                words = re.sub(r"\s+", " ", words).strip()
                if words:
                    text[key] = words
    return text


def wav_seconds(path: str):
    try:
        with wave.open(path, "rb") as w:
            return w.getnframes() / w.getframerate()
    except Exception:
        return None


def main():
    parser = argparse.ArgumentParser(
        description="Prepare WSJ wav.scp/text/utt2dur",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    parser.add_argument("wsj_dirs", nargs="+",
                        help="LDC disc roots (wsj0, wsj1)")
    parser.add_argument("--out-dir", required=True)
    parser.add_argument("--sph2pipe", default="sph2pipe",
                        help="sph2pipe binary for .wv1 sphere files")
    args = parser.parse_args()

    text = {}
    for root in args.wsj_dirs:
        text.update(load_dot_files(root))
    if not text:
        raise SystemExit("no .dot transcriptions found")

    for name, patterns in SETS.items():
        out = os.path.join(args.out_dir, name)
        os.makedirs(out, exist_ok=True)
        utts = {}
        for root in args.wsj_dirs:
            for pat in patterns:
                hits = glob.glob(f"{root}/**/{pat}/**/*.w[av]1",
                                 recursive=True)
                hits += glob.glob(f"{root}/**/{pat}/**/*.wav",
                                  recursive=True)
                for path in hits:
                    key = os.path.splitext(os.path.basename(path))[0].lower()
                    if key not in text:
                        continue
                    if path.endswith(".wv1"):
                        value = f"{args.sph2pipe} -f wav {path} |"
                        secs = -1.0  # sphere header: rely on utt2dur pass
                    else:
                        value = path
                        secs = wav_seconds(path)
                    utts[key] = (value, secs)
        with open(f"{out}/wav.scp", "w") as wscp, \
                open(f"{out}/text", "w") as txt, \
                open(f"{out}/utt2dur", "w") as dur:
            for key in sorted(utts):
                value, secs = utts[key]
                wscp.write(f"{key} {value}\n")
                txt.write(f"{key} {text[key]}\n")
                if secs and secs > 0:
                    dur.write(f"{key} {secs:.2f}\n")
        print(f"{name}: {len(utts)} utts")
        if any(s is None or s <= 0 for _, s in utts.values()):
            print(f"  NOTE: fill {name}/utt2dur for sphere files with "
                  "cmd/check_audio.py or utils/wav_duration.py")


if __name__ == "__main__":
    main()
