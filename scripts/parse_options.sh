#!/usr/bin/env bash
# Parse --key value command line options into shell variables (kaldi-style):
# "--am-exp 1b" sets am_exp=1b. Variables must already be declared with a
# default before sourcing this file.
while true; do
  [ -z "${1:-}" ] && break
  case "$1" in
    --help | -h)
      echo "Usage: $0 [--option value]..."
      exit 0
      ;;
    --*)
      name=$(echo "$1" | sed 's/^--//; s/-/_/g')
      if ! eval "[ -n \"\${$name+x}\" ]"; then
        echo "$0: unknown option $1" >&2
        exit 1
      fi
      [ -z "${2:-}" ] && echo "$0: missing value for $1" >&2 && exit 1
      eval "$name=\"\$2\""
      shift 2
      ;;
    *) break ;;
  esac
done
true
