#!/bin/sh
# Per-level benchmark matrix for the *FLAC reference encoder* (`flac`),
# as a comparison baseline for flake-tpu — the analogue of the
# reference's util/flac-test.sh. Requires a `flac` binary on PATH
# (levels 0-8; flac has no 9-12).
#
# usage: flac-test.sh <file.wav> [min_level] [max_level]

if [ -z "$1" ]; then
  echo "usage: $0 <file.wav> [min_level] [max_level]"
  exit 1
fi
if ! command -v flac >/dev/null 2>&1; then
  echo "flac binary not found on PATH; install flac to run this matrix"
  exit 1
fi
WAV="$1"
MIN="${2:-0}"
MAX="${3:-8}"
DIR=$(dirname "$0")

DATA=$(python -m flake_tpu.wavinfo "$WAV" | awk '/Data Size:/ {print $3}')
SECS=$(python -m flake_tpu.wavinfo "$WAV" | awk '/Playing Time:/ \
  {gsub("h","*3600+",$3); gsub("m","*60+",$4); gsub("s","",$5); \
   print $3 $4 $5}' | bc 2>/dev/null)

echo "level  enc(s)  speed(x)  size(bytes)  ratio   kbps   dec(s)"
for lvl in $(seq "$MIN" "$MAX"); do
  OUT="/tmp/flac-test-$lvl.flac"
  T0=$(date +%s.%N)
  flac -f -s "-$lvl" -P 0 --no-seektable "$WAV" -o "$OUT" || exit 1
  T1=$(date +%s.%N)
  ENC=$(echo "$T1 - $T0" | bc)
  SIZE=$(wc -c < "$OUT")
  RATIO=$(echo "scale=4; $SIZE / $DATA" | bc)
  SPEED=$(echo "scale=1; $SECS / $ENC" | bc)
  KBPS=$(echo "scale=1; $SIZE * 8 / 1000 / $SECS" | bc)
  T2=$(date +%s.%N)
  flac -t -s "$OUT" || exit 1
  T3=$(date +%s.%N)
  DEC=$(echo "$T3 - $T2" | bc)
  printf "%5s  %6s  %8s  %11s  %6s  %5s   %6s\n" \
    "$lvl" "$ENC" "$SPEED" "$SIZE" "$RATIO" "$KBPS" "$DEC"
done
