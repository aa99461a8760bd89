#!/usr/bin/env bash
# Unsupervised multi-channel enhancement on CHiME-4 (counterpart of the
# reference's examples/sse/chime4_ml): BLSTM masks trained by CACGMM-style
# maximum likelihood on unlabeled 6ch audio, then used for separation /
# a beamforming front-end.
set -eu

data=/scratch/CHiME4
stage="1-3"
dataset="chime4_unsuper"

exp=1a
seed=777
epochs=50
batch_size=16
prog_interval=100

. ../../../scripts/parse_options.sh 2>/dev/null || true

repo=$(cd ../../.. && pwd)
data_dir=data/$dataset
exp_dir=exp/$dataset/$exp

beg=$(echo $stage | awk -F '-' '{print $1}')
end=$(echo $stage | awk -F '-' '{print $2}')
[ -z "$end" ] && end=$beg

if [ $end -ge 1 ] && [ $beg -le 1 ]; then
  echo "Stage 1: preparing multi-channel scps ..."
  python local/prepare_scp.py $data $data_dir
fi

if [ $end -ge 2 ] && [ $beg -le 2 ]; then
  echo "Stage 2: ML training (unsupervised) ..."
  python $repo/cmd/train_ss.py \
    --conf conf/$exp.yaml \
    --checkpoint $exp_dir \
    --batch-size $batch_size \
    --epochs $epochs \
    --seed $seed \
    --prog-interval $prog_interval
fi

if [ $end -ge 3 ] && [ $beg -le 3 ]; then
  echo "Stage 3: enhancing dev set ..."
  python $repo/cmd/separate.py \
    $data_dir/dev.scp \
    $exp_dir/enhan \
    --checkpoint $exp_dir \
    --sr 16000
fi
