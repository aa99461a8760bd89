#!/usr/bin/env bash
# Train a subword model and encode a text corpus (counterpart of the
# reference's utils/subword.sh). Uses the `spm_train` / `spm_encode`
# binaries or the sentencepiece python package when available, otherwise
# the built-in pure-python BPE (aps_tpu/tokenizer/bpe.py, JSON model at
# ${model_prefix}.json).
set -eu

mode="train"          # train | encode
vocab_size=6000
model_type="unigram"  # unigram | bpe | char | word
model_prefix="subword"

. "$(dirname "$0")/../scripts/parse_options.sh" 2>/dev/null || true

[ $# -ne 1 ] && echo "Usage: $0 [--mode train|encode] <text>" && exit 1
text=$1

if command -v spm_train >/dev/null 2>&1; then
  if [ "$mode" = "train" ]; then
    cut -d' ' -f2- "$text" > "$model_prefix.corpus"
    spm_train --input="$model_prefix.corpus" \
      --model_prefix="$model_prefix" \
      --vocab_size=$vocab_size --model_type=$model_type \
      --unk_surface="<unk>"
    rm -f "$model_prefix.corpus"
  else
    paste -d' ' <(cut -d' ' -f1 "$text") \
      <(cut -d' ' -f2- "$text" | spm_encode --model="$model_prefix.model")
  fi
else
  python - "$mode" "$text" "$model_prefix" "$vocab_size" "$model_type" <<'EOF'
import sys
mode, text, prefix, vocab, mtype = sys.argv[1:6]
try:
    import sentencepiece as spm
except ImportError:
    spm = None
if spm is not None:
    if mode == "train":
        with open(text) as fd, open(prefix + ".corpus", "w") as out:
            for line in fd:
                out.write(line.split(maxsplit=1)[1])
        spm.SentencePieceTrainer.train(
            input=prefix + ".corpus", model_prefix=prefix,
            vocab_size=int(vocab), model_type=mtype, unk_surface="<unk>")
    else:
        sp = spm.SentencePieceProcessor(model_file=prefix + ".model")
        with open(text) as fd:
            for line in fd:
                key, sent = line.split(maxsplit=1)
                print(key, " ".join(sp.encode(sent.strip(), out_type=str)))
else:
    # built-in BPE fallback (JSON model, ▁-marked pieces)
    from aps_tpu.tokenizer.bpe import BpeModel, train_bpe
    if mode == "train":
        with open(text) as fd:
            lines = [ln.split(maxsplit=1)[1].strip() for ln in fd
                     if len(ln.split(maxsplit=1)) == 2]
        train_bpe(lines, vocab_size=int(vocab)).save(prefix + ".json")
        print(f"trained built-in BPE model: {prefix}.json",
              file=sys.stderr)
    else:
        mdl = BpeModel.load(prefix + ".json")
        with open(text) as fd:
            for line in fd:
                key, sent = line.split(maxsplit=1)
                print(key, " ".join(mdl.encode(sent.strip())))
EOF
fi
