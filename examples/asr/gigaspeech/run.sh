#!/usr/bin/env bash
# GigaSpeech recipe (counterpart of the reference's examples/asr/gigaspeech):
# Conformer AED + CTC on the XL subset with BPE-5k units; validates every
# eval_interval steps (the large-data loop).
set -eu

data=/scratch/gigaspeech
stage="1-4"
dataset="gigaspeech"
subset=XL

am_exp=1a
seed=888
epochs=8
batch_size=256
eval_interval=2500
prog_interval=250

vocab_size=5000

beam_size=8
nbest=8
ctc_weight=0.2
len_norm=true
test_sets="dev test"

. ../../../scripts/parse_options.sh 2>/dev/null || true

repo=$(cd ../../.. && pwd)
data_dir=data/$dataset
exp_dir=exp/$dataset/$am_exp
train_set=train_$(echo $subset | tr 'A-Z' 'a-z')

beg=$(echo $stage | awk -F '-' '{print $1}')
end=$(echo $stage | awk -F '-' '{print $2}')
[ -z "$end" ] && end=$beg

if [ $end -ge 1 ] && [ $beg -le 1 ]; then
  echo "Stage 1: preparing data ($subset) ..."
  python local/gigaspeech_data_prep.py $data $data_dir --subset $subset
  # BPE subword units
  mkdir -p $data_dir/bpe && (cd $data_dir/bpe && bash $repo/utils/subword.sh \
    --mode train --vocab-size $vocab_size --model-type bpe \
    --model-prefix bpe ../../../$data_dir/$train_set/text)
  for name in $train_set dev; do
    python $repo/cmd/text_tokenize.py \
      $data_dir/$name/text $data_dir/$name/token \
      --unit subword --spm $data_dir/bpe/bpe.model \
      $([ $name = $train_set ] && echo "--dump-vocab $data_dir/dict \
         --add-sos-eos true")
  done
fi

if [ $end -ge 2 ] && [ $beg -le 2 ]; then
  echo "Stage 2: training AM (eval every $eval_interval steps) ..."
  python $repo/cmd/train_am.py \
    --conf conf/$am_exp.yaml \
    --dict $data_dir/dict \
    --checkpoint $exp_dir \
    --batch-size $batch_size \
    --epochs $epochs \
    --eval-interval $eval_interval \
    --seed $seed \
    --prog-interval $prog_interval
fi

if [ $end -ge 3 ] && [ $beg -le 3 ]; then
  echo "Stage 3: decoding ..."
  for name in $test_sets; do
    python $repo/cmd/decode_batch.py \
      $data_dir/$name/wav.scp \
      $exp_dir/$name.decode \
      --am $exp_dir \
      --dict $data_dir/dict \
      --beam-size $beam_size \
      --nbest $nbest \
      --ctc-weight $ctc_weight \
      --len-norm $len_norm \
      --max-len 120 \
      --spm $data_dir/bpe/bpe.model
  done
fi

if [ $end -ge 4 ] && [ $beg -le 4 ]; then
  echo "Stage 4: scoring ..."
  for name in $test_sets; do
    python $repo/cmd/compute_wer.py \
      $exp_dir/$name.decode $data_dir/$name/text
  done
fi
