#!/usr/bin/env bash
# Train AM/LM/SS models on a TPU host (parity: reference scripts/train.sh).
# Usage: scripts/train.sh <am|lm|ss> <data-name> <exp-id> [extra args...]
set -eu
[ $# -lt 3 ] && echo "Usage: $0 <am|lm|ss> <data> <exp-id> [args...]" && exit 1
task=$1; data=$2; exp_id=$3; shift 3
# conf/exp/data live in the CURRENT workspace (kaldi-style); the cmd/
# entries resolve against the repo this script ships in, so a training
# workspace does not need to be the repo checkout itself.
# exec: the trainer replaces this shell, so signals sent to the
# launcher (schedulers, tests) reach the python process directly
repo=$(cd "$(dirname "$0")/.." && pwd)
conf=conf/$data/$exp_id.yaml
cpt=exp/$data/$exp_id
[ ! -f "$conf" ] && echo "$0: missing config $conf" && exit 1
case $task in
  am) exec python "$repo/cmd/train_am.py" --conf "$conf" --checkpoint "$cpt" \
        --dict data/$data/dict "$@" ;;
  lm) exec python "$repo/cmd/train_lm.py" --conf "$conf" --checkpoint "$cpt" \
        --dict data/$data/dict "$@" ;;
  ss) exec python "$repo/cmd/train_ss.py" --conf "$conf" --checkpoint "$cpt" "$@" ;;
  *) echo "Unknown task: $task" && exit 1 ;;
esac
