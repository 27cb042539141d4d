#!/bin/sh
# Capture the reference's in-memory lattice-layer behavior (bestpath,
# posteriors, N-best) as goldens.  Builds the two oracle tools in
# tools/ref_oracle/ against the reference build and runs them on
# goforward + turtle.  See tests/golden/goforward/decode_oracle.txt.
set -e
BUILD=${1:-/root/ref-build}
REF=${2:-/root/reference}
HERE=$(dirname "$0")
OUT=$HERE/../tests/golden
gcc -o /tmp/decode_oracle "$HERE/ref_oracle/decode_oracle.c" \
    -I"$REF/include" -I"$BUILD/include" -I"$REF/src" -L"$BUILD" -lpocketsphinx -lm
/tmp/decode_oracle "$REF/model/en-us/en-us" "$REF/test/data/turtle.lm.bin" \
    "$REF/test/data/turtle.dic" "$REF/test/data/goforward.raw" \
    2>/dev/null > "$OUT/goforward/decode_oracle.txt"
echo "wrote $OUT/goforward/decode_oracle.txt"
