#!/usr/bin/env bash
# AISHELL-1 Conformer AED recipe (counterpart of the reference's
# examples/asr/aishell_v1/run.sh): data prep -> dict -> AM training ->
# LM training -> batched beam-search decoding -> CER scoring.
set -eu

data=/scratch/aishell_v1   # extracted data_aishell directory
stage="1-5"
dataset="aishell_v1"

am_exp=1a                  # conf/$am_exp.yaml
lm_exp=1a                  # conf/nnlm/$lm_exp.yaml

seed=777
epochs=80
batch_size=64
prog_interval=100

lm_epochs=30
lm_batch_size=32

beam_size=16
nbest=8
ctc_weight=0.4
lm_weight=0.2
len_norm=false
max_len=50
test_sets="dev test"
# overridable workspace roots (CI runs the pipeline against a synthetic
# corpus in a tmpdir: --data-dir/--exp-dir/--conf-dir)
data_dir=""
exp_dir=""
lm_dir=""
conf_dir=conf

. ../../../scripts/parse_options.sh 2>/dev/null || true

repo=$(cd ../../.. && pwd)
[ -z "$data_dir" ] && data_dir=data/$dataset
[ -z "$exp_dir" ] && exp_dir=exp/$dataset/$am_exp
[ -z "$lm_dir" ] && lm_dir=exp/$dataset/nnlm/$lm_exp

beg=$(echo $stage | awk -F '-' '{print $1}')
end=$(echo $stage | awk -F '-' '{print $2}')
[ -z "$end" ] && end=$beg

if [ $end -ge 1 ] && [ $beg -le 1 ]; then
  echo "Stage 1: preparing data ..."
  python local/aishell_data_prep.py $data $data_dir
  # char-level tokens + dict (adds <sos>/<eos>/<unk> reserved entries)
  python $repo/cmd/text_tokenize.py \
    $data_dir/train/text $data_dir/train/token \
    --unit char --dump-vocab $data_dir/dict --add-sos-eos true
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
  echo "Stage 3: training RNN LM ..."
  python $repo/cmd/train_lm.py \
    --conf $conf_dir/nnlm/$lm_exp.yaml \
    --dict $data_dir/dict \
    --checkpoint $lm_dir \
    --batch-size $lm_batch_size \
    --epochs $lm_epochs \
    --seed $seed \
    --prog-interval $prog_interval
fi

if [ $end -ge 4 ] && [ $beg -le 4 ]; then
  echo "Stage 4: decoding (batched beam search) ..."
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
      --max-len $max_len
  done
fi

if [ $end -ge 5 ] && [ $beg -le 5 ]; then
  echo "Stage 5: scoring ..."
  for name in $test_sets; do
    python $repo/cmd/compute_wer.py \
      $exp_dir/$name.decode $data_dir/$name/text --cer true
  done
fi
