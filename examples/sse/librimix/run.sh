#!/usr/bin/env bash
# LibriMix Conv-TasNet recipe (counterpart of the reference's
# examples/sse/librimix): scp prep -> training -> separation -> SiSNR
# scoring. --exp 1a trains on clean mixtures, 1b on noisy (mix_both).
set -eu

data=/scratch/Libri2Mix/wav16k/min   # train-360/dev/test with mix_*,s1,s2
stage="1-4"
dataset="librimix"

exp=1a                 # conf/$exp.yaml
seed=777
epochs=100
batch_size=32
prog_interval=100
sr=16000

. ../../../scripts/parse_options.sh 2>/dev/null || true

repo=$(cd ../../.. && pwd)
data_dir=data/$dataset/2spk_16k_min
exp_dir=exp/$dataset/$exp

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
    --conf conf/$exp.yaml \
    --checkpoint $exp_dir \
    --batch-size $batch_size \
    --epochs $epochs \
    --seed $seed \
    --prog-interval $prog_interval
fi

case $exp in
  1b*) mix=mix_both ;;
  *) mix=mix_clean ;;
esac

if [ $end -ge 3 ] && [ $beg -le 3 ]; then
  echo "Stage 3: separating test ($mix) ..."
  python $repo/cmd/separate.py \
    $data_dir/test/$mix.scp \
    $exp_dir/separated \
    --checkpoint $exp_dir \
    --sr $sr
fi

if [ $end -ge 4 ] && [ $beg -le 4 ]; then
  echo "Stage 4: SiSNR scoring ..."
  python $repo/cmd/compute_ss_metric.py \
    --metric sisnr \
    $exp_dir/separated/spk1.scp,$exp_dir/separated/spk2.scp \
    $data_dir/test/s1.scp,$data_dir/test/s2.scp
fi
