#!/usr/bin/env bash
# End-to-end real-time enhancement demo:
#   1. build the native runtime        (cmake + ninja)
#   2. make a toy rt_sse@dfsmn model   (or point --checkpoint at a real one)
#   3. enhance a wav with the C++ and the python streaming loops
# Usage: ./run_demo.sh <noisy.wav> [workdir]
set -eu

noisy=${1:?"need a noisy wav"}
work=${2:-/tmp/rt_enh_demo}
repo=$(cd "$(dirname "$0")/../.." && pwd)

mkdir -p "$work"
cmake -S "$repo" -B "$repo/build" -G Ninja
ninja -C "$repo/build"

export JAX_PLATFORMS=cpu
python "$repo/demos/real_time_enhancement/python/make_toy_checkpoint.py" \
  "$work/cpt" --num-layers 2 --lctx 2 --rctx 2

"$repo/build/rt_enh_dfsmn" "$noisy" "$work/enhan_cpp.wav" \
  --checkpoint "$work/cpt" --num-layers 2 --lctx 2 --rctx 2
python "$repo/demos/real_time_enhancement/python/rt_enh_dfsmn.py" \
  "$noisy" "$work/enhan_py.wav" --checkpoint "$work/cpt"

echo "outputs in $work"
