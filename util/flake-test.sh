#!/bin/sh
# Per-level encode benchmark + decode verification for flake-tpu.
# Reference analogue: util/flake-test.sh — encode at each level, verify
# the stream (our independent decoder stands in for `flac -t`), report
# time, speed (x realtime), size, ratio, kbps.
#
# usage: flake-test.sh <file.wav> [min_level] [max_level]

if [ -z "$1" ]; then
  echo "usage: $0 <file.wav> [min_level] [max_level]"
  exit 1
fi
WAV="$1"
MIN="${2:-0}"
MAX="${3:-12}"

DATA=$(python -m flake_tpu.wavinfo "$WAV" | awk '/Data Size:/ {print $3}')
SECS=$(python -m flake_tpu.wavinfo "$WAV" | awk '/Playing Time:/ \
  {gsub("h","*3600+",$3); gsub("m","*60+",$4); gsub("s","",$5); \
   print $3 $4 $5}' | bc 2>/dev/null)

echo "level  time(s)  speed(x)  size(bytes)  ratio   kbps   verify"
for lvl in $(seq "$MIN" "$MAX"); do
  OUT="/tmp/flake-test-$lvl.flac"
  T0=$(date +%s.%N)
  python -m flake_tpu.cli -q "-$lvl" "$WAV" -o "$OUT" || exit 1
  T1=$(date +%s.%N)
  ENC=$(echo "$T1 - $T0" | bc)
  SIZE=$(wc -c < "$OUT")
  RATIO=$(echo "scale=4; $SIZE / $DATA" | bc)
  SPEED=$(echo "scale=1; $SECS / $ENC" | bc)
  KBPS=$(echo "scale=1; $SIZE * 8 / 1000 / $SECS" | bc)
  VERIFY=$(python -c "
import pathlib
from flake_tpu.decoder import decode_stream
try:
    d = decode_stream(pathlib.Path('$OUT').read_bytes())
    print('ok' if d.md5_ok else 'MD5-FAIL')
except Exception as e:
    print('FAIL')" )
  printf "%5s  %7s  %8s  %11s  %6s  %5s   %s\n" \
    "$lvl" "$ENC" "$SPEED" "$SIZE" "$RATIO" "$KBPS" "$VERIFY"
done
