#!/usr/bin/env bash
# WSJ0-2mix Conv-TasNet recipe (counterpart of the reference's
# examples/sse/wsj0_2mix/run.sh): scp prep -> training -> separation ->
# SiSNR scoring.
set -eu

data=/scratch/wsj0_2mix/wav8k/min   # tr/cv/tt with mix,s1,s2
stage="1-4"
dataset="wsj0_2mix"

exp=1a                 # conf/$exp.yaml
seed=777
epochs=100
batch_size=32
prog_interval=100
sr=8000
# overridable workspace roots (CI runs the pipeline against a synthetic
# corpus in a tmpdir: --data-dir/--exp-dir/--conf-dir)
data_dir=""
exp_dir=""
conf_dir=conf

. ../../../scripts/parse_options.sh 2>/dev/null || true

repo=$(cd ../../.. && pwd)
[ -z "$data_dir" ] && data_dir=data/$dataset
[ -z "$exp_dir" ] && exp_dir=exp/$dataset/$exp

beg=$(echo $stage | awk -F '-' '{print $1}')
end=$(echo $stage | awk -F '-' '{print $2}')
[ -z "$end" ] && end=$beg

if [ $end -ge 1 ] && [ $beg -le 1 ]; then
  echo "Stage 1: preparing scps ..."
  python local/prepare_scp.py $data $data_dir
fi

if [ $end -ge 2 ] && [ $beg -le 2 ]; then
  echo "Stage 2: training ..."
  python $repo/cmd/train_ss.py \
    --conf $conf_dir/$exp.yaml \
    --checkpoint $exp_dir \
    --batch-size $batch_size \
    --epochs $epochs \
    --seed $seed \
    --prog-interval $prog_interval
fi

if [ $end -ge 3 ] && [ $beg -le 3 ]; then
  echo "Stage 3: separating tt ..."
  python $repo/cmd/separate.py \
    $data_dir/tt/mix.scp \
    $exp_dir/separated \
    --checkpoint $exp_dir \
    --sr $sr
fi

if [ $end -ge 4 ] && [ $beg -le 4 ]; then
  echo "Stage 4: SiSNR scoring ..."
  python $repo/cmd/compute_ss_metric.py \
    --metric sisnr \
    --sr $sr \
    $exp_dir/separated/spk1.scp,$exp_dir/separated/spk2.scp \
    $data_dir/tt/spk1.scp,$data_dir/tt/spk2.scp
fi
