#!/usr/bin/env bash
# Decode a test set (parity: reference scripts/decode.sh).
# Usage: scripts/decode.sh <exp-dir> <wav-scp> <out-dir> [decode args...]
set -eu
[ $# -lt 3 ] && echo "Usage: $0 <exp-dir> <wav-scp> <out-dir> [args...]" && exit 1
exp=$1; scp=$2; out=$3; shift 3
mkdir -p "$out"
python cmd/decode.py "$scp" "$out/hyp.text" --am "$exp" \
  --dict "$exp/dict" "$@" 2>&1 | tee "$out/decode.log"
