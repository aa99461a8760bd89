#!/usr/bin/env bash
# multi_cn recipe (counterpart of the reference's examples/asr/multi_cn):
# Conformer AED trained on the merged open Mandarin corpora; CER evaluated
# per held-out test set. Each corpus is prepared by its own recipe first
# (e.g. ../aishell_v1/local/aishell_data_prep.py), then merged here.
set -eu

stage="1-4"
dataset="multi_cn"
# name:path pairs of PREPARED data dirs (wav.scp/text/utt2dur)
train_dirs="aishell:../aishell_v1/data/aishell_v1/train"
dev_dirs="aishell:../aishell_v1/data/aishell_v1/dev"
test_dirs="aishell:../aishell_v1/data/aishell_v1/test"

am_exp=1a
seed=888
epochs=60
batch_size=128
eval_interval=2500
prog_interval=100

beam_size=8
nbest=8
ctc_weight=0.2
len_norm=true

. ../../../scripts/parse_options.sh 2>/dev/null || true

repo=$(cd ../../.. && pwd)
data_dir=data/$dataset
exp_dir=exp/$dataset/$am_exp

beg=$(echo $stage | awk -F '-' '{print $1}')
end=$(echo $stage | awk -F '-' '{print $2}')
[ -z "$end" ] && end=$beg

if [ $end -ge 1 ] && [ $beg -le 1 ]; then
  echo "Stage 1: merging corpora ..."
  python local/merge_corpora.py $data_dir/train $train_dirs
  python local/merge_corpora.py $data_dir/dev $dev_dirs
  python local/merge_corpora.py $data_dir/test $test_dirs
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
  python $repo/cmd/decode_batch.py \
    $data_dir/test/wav.scp \
    $exp_dir/test.decode \
    --am $exp_dir \
    --dict $data_dir/dict \
    --beam-size $beam_size \
    --nbest $nbest \
    --ctc-weight $ctc_weight \
    --len-norm $len_norm \
    --max-len 60
fi

if [ $end -ge 4 ] && [ $beg -le 4 ]; then
  echo "Stage 4: scoring CER ..."
  python $repo/cmd/compute_wer.py \
    $exp_dir/test.decode $data_dir/test/text --cer true
fi
