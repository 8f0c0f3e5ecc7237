#!/bin/sh
# Run the flake-tpu benchmark matrix and, when present, the reference
# binary's matrix on the same WAV for comparison.
# Reference analogue: util/all-test.sh.
#
# usage: all-test.sh <file.wav>

if [ -z "$1" ]; then
  echo "usage: $0 <file.wav>"
  exit 1
fi
DIR=$(dirname "$0")

echo "== flake-tpu =="
sh "$DIR/flake-test.sh" "$1" 0 12

REF="$DIR/../.refbuild/flake"
if [ -x "$REF" ]; then
  echo ""
  echo "== reference flake (C) =="
  echo "level  time(s)  size(bytes)"
  for lvl in $(seq 0 12); do
    OUT="/tmp/ref-test-$lvl.flac"
    T0=$(date +%s.%N)
    "$REF" -q "-$lvl" "$1" -o "$OUT" || exit 1
    T1=$(date +%s.%N)
    printf "%5s  %7s  %11s\n" "$lvl" "$(echo "$T1 - $T0" | bc)" \
      "$(wc -c < "$OUT")"
  done
fi
