#!/usr/bin/env bash
# Train a DCUNet checkpoint, build the native runtime, and enhance a wav
# offline through the C++ binary (see README.md). Counterpart of the
# reference's examples/sse/torchscript_dcunet, which traced the model for
# libtorch; here the checkpoint runs in the embedded deployment executor.
set -eu

stage="1-3"
exp=1a
epochs=60
batch_size=16
prog_interval=100
# stage 3: wav file to enhance with the native binary
noisy_wav=

. ../../../scripts/parse_options.sh 2>/dev/null || true

repo=$(cd ../../.. && pwd)
exp_dir=exp/export_dcunet/$exp

beg=$(echo $stage | awk -F '-' '{print $1}')
end=$(echo $stage | awk -F '-' '{print $2}')
[ -z "$end" ] && end=$beg

if [ $end -ge 1 ] && [ $beg -le 1 ]; then
  echo "Stage 1: training DCUNet (edit conf/$exp.yaml to point at your" \
       "noisy/clean scps, e.g. from the dns_is2020 prep) ..."
  python $repo/cmd/train_ss.py \
    --conf conf/$exp.yaml \
    --checkpoint $exp_dir \
    --batch-size $batch_size \
    --epochs $epochs \
    --prog-interval $prog_interval
fi

if [ $end -ge 2 ] && [ $beg -le 2 ]; then
  echo "Stage 2: building the native runtime ..."
  (cd $repo && cmake -B build -G Ninja && ninja -C build dcunet_enhan)
fi

if [ $end -ge 3 ] && [ $beg -le 3 ]; then
  [ -z "$noisy_wav" ] && echo "$0: give --noisy-wav to enhance" && exit 0
  $repo/build/dcunet_enhan "$noisy_wav" enhan.wav --checkpoint $exp_dir
fi
