#!/usr/bin/env bash
# End-to-end native-runtime parity check (optional — needs a built tree
# and an importable aps_tpu): toy checkpoint -> C++ rt_enh_dfsmn and the
# python streaming loop -> compare outputs to one int16 LSB.
# Usage: tests/csrc/run_e2e.sh [build_dir] (default: ./build)
set -eu

repo=$(cd "$(dirname "$0")/../.." && pwd)
build=${1:-$repo/build}
work=$(mktemp -d)
trap 'rm -rf "$work"' EXIT

export JAX_PLATFORMS=cpu

python "$repo/demos/real_time_enhancement/python/make_toy_checkpoint.py" \
  "$work/cpt" --num-layers 2 --lctx 2 --rctx 2

python - "$work/noisy.wav" <<'EOF'
import sys
import numpy as np
from aps_tpu.io import write_audio
rng = np.random.default_rng(0)
sr = 16000
t = np.arange(sr * 2) / sr
x = 0.4 * np.sin(2 * np.pi * 440 * t) + 0.05 * rng.standard_normal(sr * 2)
write_audio(sys.argv[1], x.astype(np.float32), sr=sr)
EOF

"$build/rt_enh_dfsmn" "$work/noisy.wav" "$work/enh_cpp.wav" \
  --checkpoint "$work/cpt" --num-layers 2 --lctx 2 --rctx 2
python "$repo/demos/real_time_enhancement/python/rt_enh_dfsmn.py" \
  "$work/noisy.wav" "$work/enh_py.wav" --checkpoint "$work/cpt"

python - "$work/enh_cpp.wav" "$work/enh_py.wav" <<'EOF'
import sys
import numpy as np
from aps_tpu.io import read_audio
a, b = read_audio(sys.argv[1]), read_audio(sys.argv[2])
n = min(a.shape[-1], b.shape[-1])
err = np.abs(a[:n] - b[:n]).max()
print(f"C++ vs python max err: {err:.2e}")
assert err <= 2.0 / 32768, f"parity broken: {err}"
print("e2e parity OK")
EOF
