#!/usr/bin/env bash
# Multi-host training launcher (parity: reference scripts/distributed_train.sh).
# On TPU pods each host runs the same command; jax.distributed wires them up:
#   scripts/distributed_train.sh <am|lm|ss> <data> <exp-id> \
#       --distributed jax --coordinator-address host0:1234 \
#       --num-processes N --process-id $I [extra args...]
set -eu
exec "$(dirname "$0")/train.sh" "$@"
