#!/usr/bin/env bash
# wham recipe: scp prep -> train -> separate -> SiSNR (see
# examples/sse/wsj0_2mix/run.sh for the staged pattern; scp files are
# plain "key path" lists over the corpus wavs).
set -eu
echo "Prepare data/wham/... scps (key path lists), then:"
echo "  python \$REPO/cmd/train_ss.py --conf conf/1a_bss_c_16k_max.yaml --checkpoint exp/wham/1a ..."
echo "  python \$REPO/cmd/separate.py ... --dtype bfloat16 --batch-size 8"
echo "  python \$REPO/cmd/compute_ss_metric.py ... --metric sisnr"
