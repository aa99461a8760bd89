#!/usr/bin/env bash
# Split the scp into N jobs and decode in parallel (parity:
# reference scripts/decode_parallel.sh).
set -eu
nj=4
[ $# -lt 3 ] && echo "Usage: $0 <exp-dir> <wav-scp> <out-dir> [args...]" && exit 1
exp=$1; scp=$2; out=$3; shift 3
mkdir -p "$out/split"
total=$(wc -l < "$scp")
split -n l/$nj -d "$scp" "$out/split/scp."
for part in "$out"/split/scp.*; do
  idx=${part##*.}
  python cmd/decode.py "$part" "$out/hyp.$idx" --am "$exp" \
    --dict "$exp/dict" "$@" > "$out/decode.$idx.log" 2>&1 &
done
wait
cat "$out"/hyp.* | sort > "$out/hyp.text"
