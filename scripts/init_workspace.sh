#!/usr/bin/env bash
# Create the recipe workspace layout (parity: reference scripts/init_workspace.sh)
set -eu
[ $# -ne 1 ] && echo "Usage: $0 <data-name>" && exit 1
data=$1
mkdir -p data/$data conf/$data exp/$data
echo "Initialized workspace for $data (data/, conf/, exp/)"
