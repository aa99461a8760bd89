#!/usr/bin/env bash
# AISHELL-2 recipe (counterpart of the reference's examples/asr/aishell_v2):
# Conformer AED + CTC, char units, ~1000 h Mandarin -> CER dev/test (iOS).
set -eu

train_data=/scratch/aishell2/iOS/data
devtest_data=/scratch/aishell2/AISHELL-DEV-TEST-SET/iOS
stage="1-4"
dataset="aishell_v2"

am_exp=1a
seed=888
epochs=60
batch_size=128
eval_interval=2500   # large corpus: validate every N steps
prog_interval=100

beam_size=8
nbest=8
ctc_weight=0.2
len_norm=true
test_sets="dev test"

. ../../../scripts/parse_options.sh 2>/dev/null || true

repo=$(cd ../../.. && pwd)
data_dir=data/$dataset
exp_dir=exp/$dataset/$am_exp

beg=$(echo $stage | awk -F '-' '{print $1}')
end=$(echo $stage | awk -F '-' '{print $2}')
[ -z "$end" ] && end=$beg

if [ $end -ge 1 ] && [ $beg -le 1 ]; then
  echo "Stage 1: preparing data ..."
  python local/aishell2_data_prep.py $train_data $devtest_data $data_dir
  for name in train dev; do
    python $repo/utils/tokenizer.py \
      $data_dir/$name/text $data_dir/$name/token \
      --unit char \
      $([ $name = train ] && echo "--dump-vocab $data_dir/dict \
         --add-units <sos>,<eos>,<unk>")
  done
fi

if [ $end -ge 2 ] && [ $beg -le 2 ]; then
  echo "Stage 2: training AM ..."
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
      --max-len 60
  done
fi

if [ $end -ge 4 ] && [ $beg -le 4 ]; then
  echo "Stage 4: scoring CER ..."
  for name in $test_sets; do
    python $repo/cmd/compute_wer.py \
      $exp_dir/$name.decode $data_dir/$name/text --cer true
  done
fi
