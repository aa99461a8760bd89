#!/usr/bin/env bash
# LibriSpeech Conformer AED recipe: data prep -> subword units -> AM
# training -> batched decoding -> WER (counterpart of the reference's
# examples/asr/librispeech/run.sh).
set -eu

data=/scratch/LibriSpeech
stage="1-5"
dataset="librispeech"

am_exp=1a
seed=777
epochs=120
batch_size=64
prog_interval=250

vocab_size=6000          # sentencepiece units

beam_size=8
nbest=8
ctc_weight=0.3
test_sets="test_clean test_other"

. ../../../scripts/parse_options.sh 2>/dev/null || true

repo=$(cd ../../.. && pwd)
data_dir=data/$dataset
exp_dir=exp/$dataset/$am_exp

beg=$(echo $stage | awk -F '-' '{print $1}')
end=$(echo $stage | awk -F '-' '{print $2}')
[ -z "$end" ] && end=$beg

if [ $end -ge 1 ] && [ $beg -le 1 ]; then
  echo "Stage 1: preparing data ..."
  python local/librispeech_data_prep.py $data $data_dir
  for s in train_clean_100 train_clean_360 train_other_500; do
    [ -d $data_dir/$s ] || continue
  done
  # merge the train subsets
  mkdir -p $data_dir/train $data_dir/dev
  cat $data_dir/train_*/wav.scp > $data_dir/train/wav.scp
  cat $data_dir/train_*/text > $data_dir/train/text
  cp $data_dir/dev_clean/wav.scp $data_dir/dev/wav.scp
  cp $data_dir/dev_clean/text $data_dir/dev/text
  for s in train dev; do
    python $repo/utils/wav_duration.py $data_dir/$s/wav.scp \
      $data_dir/$s/utt2dur
  done
fi

if [ $end -ge 2 ] && [ $beg -le 2 ]; then
  echo "Stage 2: subword units ..."
  $repo/utils/subword.sh --mode train --vocab_size $vocab_size \
    --model_prefix $data_dir/spm $data_dir/train/text
  for s in train dev; do
    python $repo/cmd/text_tokenize.py $data_dir/$s/text \
      $data_dir/$s/token --unit subword --spm $data_dir/spm.model \
      $([ $s = train ] && echo "--dump-vocab $data_dir/dict") \
      --add-sos-eos true
  done
fi

if [ $end -ge 3 ] && [ $beg -le 3 ]; then
  echo "Stage 3: training AM ..."
  python $repo/cmd/train_am.py \
    --conf conf/$am_exp.yaml \
    --dict $data_dir/dict \
    --checkpoint $exp_dir \
    --batch-size $batch_size \
    --epochs $epochs \
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
      --spm $data_dir/spm.model \
      --max-len 120
  done
fi

if [ $end -ge 5 ] && [ $beg -le 5 ]; then
  echo "Stage 5: scoring ..."
  for name in $test_sets; do
    python $repo/cmd/compute_wer.py \
      $exp_dir/$name.decode $data_dir/$name/text
  done
fi
