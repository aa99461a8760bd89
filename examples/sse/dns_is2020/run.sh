#!/usr/bin/env bash
# DNS-Challenge (IS2020) denoising recipe (counterpart of the reference's
# examples/sse/dns_is2020): DEMUCS waveform U-net + L1 loss.
set -eu

data=/scratch/DNS-Challenge/training_set_synthesized
stage="1-3"
dataset="dns_is2020"

exp=1a
seed=777
epochs=60
batch_size=32
prog_interval=100

. ../../../scripts/parse_options.sh 2>/dev/null || true

repo=$(cd ../../.. && pwd)
data_dir=data/$dataset
exp_dir=exp/$dataset/$exp

beg=$(echo $stage | awk -F '-' '{print $1}')
end=$(echo $stage | awk -F '-' '{print $2}')
[ -z "$end" ] && end=$beg

if [ $end -ge 1 ] && [ $beg -le 1 ]; then
  echo "Stage 1: preparing noisy/clean scps ..."
  python local/prepare_scp.py $data $data_dir
fi

if [ $end -ge 2 ] && [ $beg -le 2 ]; then
  echo "Stage 2: training DEMUCS ..."
  python $repo/cmd/train_ss.py \
    --conf conf/$exp.yaml \
    --checkpoint $exp_dir \
    --batch-size $batch_size \
    --epochs $epochs \
    --seed $seed \
    --prog-interval $prog_interval
fi

if [ $end -ge 3 ] && [ $beg -le 3 ]; then
  echo "Stage 3: enhancing + scoring the dev split ..."
  python $repo/cmd/separate.py \
    $data_dir/dev/noisy.scp \
    $exp_dir/enhan \
    --checkpoint $exp_dir \
    --sr 16000
  python $repo/cmd/compute_ss_metric.py \
    --metric sisnr \
    $exp_dir/enhan \
    $data_dir/dev/clean.scp
fi
