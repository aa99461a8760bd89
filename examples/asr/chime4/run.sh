#!/usr/bin/env bash
# CHiME-4 recipe (counterpart of the reference's examples/asr/chime4):
# 1a = single-channel transformer AED on the isolated 1ch track;
# 1b = multi-channel mask-MVDR + conformer AED on the 6ch track.
set -eu

data=/scratch/CHiME4        # official corpus root
stage="1-5"
dataset="chime4"

am_exp=1a                   # conf/$am_exp.yaml (1a = 1ch, 1b = 6ch)
lm_exp=1a

seed=888
epochs=60
batch_size=32
prog_interval=100

lm_epochs=60
lm_batch_size=16

beam_size=16
nbest=8
ctc_weight=0.4
lm_weight=0.2
len_norm=true
test_sets="dev et05_real et05_simu"

. ../../../scripts/parse_options.sh 2>/dev/null || true

repo=$(cd ../../.. && pwd)
data_dir=data/$dataset
exp_dir=exp/$dataset/$am_exp
lm_dir=exp/$dataset/nnlm/$lm_exp

track=1ch
suffix=""
if [ "$am_exp" = "1b" ]; then
  track=6ch
  suffix="_6ch"
fi

beg=$(echo $stage | awk -F '-' '{print $1}')
end=$(echo $stage | awk -F '-' '{print $2}')
[ -z "$end" ] && end=$beg

if [ $end -ge 1 ] && [ $beg -le 1 ]; then
  echo "Stage 1: preparing data ($track track) ..."
  python local/chime4_data_prep.py $data $data_dir --track $track
  # char tokens (+ <space>), filtering the WSJ noise markers
  for name in train dev; do
    python $repo/utils/tokenizer.py \
      $data_dir/$name$suffix/text $data_dir/$name$suffix/token \
      --unit char --space "<space>" \
      --filter-units "<*IN*>,<*MR.*>,<NOISE>" \
      $([ $name = train ] && echo "--dump-vocab $data_dir/dict \
         --add-units <sos>,<eos>,<unk>")
  done
fi

if [ $end -ge 2 ] && [ $beg -le 2 ]; then
  echo "Stage 2: training AM ($am_exp) ..."
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
      $data_dir/$name$suffix/wav.scp \
      $exp_dir/$name.decode \
      --am $exp_dir \
      --dict $data_dir/dict \
      --beam-size $beam_size \
      --nbest $nbest \
      --ctc-weight $ctc_weight \
      --lm $lm_dir \
      --lm-weight $lm_weight \
      --len-norm $len_norm \
      --max-len 200 \
      --space "<space>"
  done
fi

if [ $end -ge 5 ] && [ $beg -le 5 ]; then
  echo "Stage 5: scoring ..."
  for name in $test_sets; do
    python $repo/cmd/compute_wer.py \
      $exp_dir/$name.decode $data_dir/$name$suffix/text
  done
fi
