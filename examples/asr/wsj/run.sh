#!/usr/bin/env bash
# WSJ recipe (counterpart of the reference's examples/asr/wsj):
# RNN AED + ctc 0.2 trained on si284, char RNN LM, beam 16 decode with
# fusion 0.6 -> WER on dev93/eval92.
set -eu

wsj0=/scratch/wsj0
wsj1=/scratch/wsj1
stage="1-5"
dataset="wsj"

am_exp=1a
lm_exp=1a

seed=888
epochs=100
batch_size=64
prog_interval=100

lm_epochs=60
lm_batch_size=16

beam_size=16
nbest=8
ctc_weight=0.4
lm_weight=0.6
len_norm=true
test_sets="dev93 eval92"

. ../../../scripts/parse_options.sh 2>/dev/null || true

repo=$(cd ../../.. && pwd)
data_dir=data/$dataset
exp_dir=exp/$dataset/$am_exp
lm_dir=exp/$dataset/nnlm/$lm_exp

beg=$(echo $stage | awk -F '-' '{print $1}')
end=$(echo $stage | awk -F '-' '{print $2}')
[ -z "$end" ] && end=$beg

if [ $end -ge 1 ] && [ $beg -le 1 ]; then
  echo "Stage 1: preparing data ..."
  python local/wsj_data_prep.py $wsj0 $wsj1 --out-dir $data_dir
  for name in train_si284 dev93; do
    python $repo/utils/tokenizer.py \
      $data_dir/$name/text $data_dir/$name/token \
      --unit char --space "<space>" \
      $([ $name = train_si284 ] && echo "--dump-vocab $data_dir/dict \
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
    --seed $seed \
    --prog-interval $prog_interval
fi

if [ $end -ge 3 ] && [ $beg -le 3 ]; then
  echo "Stage 3: training char RNN LM ..."
  python $repo/cmd/train_lm.py \
    --conf conf/nnlm/$lm_exp.yaml \
    --dict $data_dir/dict \
    --checkpoint $lm_dir \
    --batch-size $lm_batch_size \
    --epochs $lm_epochs \
    --seed $seed \
    --prog-interval $prog_interval
fi

if [ $end -ge 4 ] && [ $beg -le 4 ]; then
  echo "Stage 4: decoding ..."
  for name in $test_sets; do
    python $repo/cmd/decode_batch.py \
      $data_dir/$name/wav.scp \
      $exp_dir/$name.decode \
      --am $exp_dir \
      --dict $data_dir/dict \
      --beam-size $beam_size \
      --nbest $nbest \
      --ctc-weight $ctc_weight \
      --lm $lm_dir \
      --lm-weight $lm_weight \
      --len-norm $len_norm \
      --max-len 220 \
      --space "<space>"
  done
fi

if [ $end -ge 5 ] && [ $beg -le 5 ]; then
  echo "Stage 5: scoring ..."
  for name in $test_sets; do
    python $repo/cmd/compute_wer.py \
      $exp_dir/$name.decode $data_dir/$name/text
  done
fi
