#!/usr/bin/env bash
# TIMIT phone recognition recipe (counterpart of the reference's
# examples/asr/timit): RNN AED (location-aware attention) + ctc 0.4,
# 48-phone training, 39-phone scoring -> PER dev/test.
set -eu

data=/scratch/timit
stage="1-4"
dataset="timit"

am_exp=1a
seed=777
epochs=60
batch_size=32
prog_interval=50

beam_size=8
nbest=4
ctc_weight=0.4
len_norm=true
max_len=80
test_sets="dev test"
# overridable workspace roots (CI runs the pipeline against a synthetic
# corpus in a tmpdir: --data-dir/--exp-dir/--conf-dir)
data_dir=""
exp_dir=""
conf_dir=conf

. ../../../scripts/parse_options.sh 2>/dev/null || true

repo=$(cd ../../.. && pwd)
[ -z "$data_dir" ] && data_dir=data/$dataset
[ -z "$exp_dir" ] && exp_dir=exp/$dataset/$am_exp

beg=$(echo $stage | awk -F '-' '{print $1}')
end=$(echo $stage | awk -F '-' '{print $2}')
[ -z "$end" ] && end=$beg

if [ $end -ge 1 ] && [ $beg -le 1 ]; then
  echo "Stage 1: preparing data (48-phone training sets) ..."
  python local/timit_data_prep.py $data $data_dir
  # phones are already the modeling unit: word tokenizer + vocab dump
  for name in train dev test; do
    python $repo/utils/tokenizer.py \
      $data_dir/$name/text $data_dir/$name/token \
      --unit word \
      $([ $name = train ] && echo "--dump-vocab $data_dir/dict \
         --add-units <sos>,<eos>,<unk>")
  done
fi

if [ $end -ge 2 ] && [ $beg -le 2 ]; then
  echo "Stage 2: training AM ..."
  python $repo/cmd/train_am.py \
    --conf $conf_dir/$am_exp.yaml \
    --dict $data_dir/dict \
    --checkpoint $exp_dir \
    --batch-size $batch_size \
    --epochs $epochs \
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
      --max-len $max_len
  done
fi

if [ $end -ge 4 ] && [ $beg -le 4 ]; then
  echo "Stage 4: scoring PER (48 -> 39 phone folding) ..."
  for name in $test_sets; do
    python local/fold_phones.py $exp_dir/$name.decode \
      $data_dir/phones.map > $exp_dir/$name.decode.39
    python local/fold_phones.py $data_dir/$name/text \
      $data_dir/phones.map > $exp_dir/$name.text.39
    python $repo/cmd/compute_wer.py \
      $exp_dir/$name.decode.39 $exp_dir/$name.text.39
  done
fi
