#!/bin/sh
# Capture golden oracle artifacts from the reference pocketsphinx build.
# Usage: tools/make_golden.sh [ref_build_dir] [reference_dir]
# The artifacts under tests/golden/ are *outputs of running the reference
# binary* on its own bundled test data; they are the parity oracle for the
# TPU implementation (SURVEY.md §7 M0).
set -e
BUILD=${1:-/root/ref-build}
REF=${2:-/root/reference}
OUT=$(dirname "$0")/../tests/golden
MODEL=$REF/model/en-us/en-us
DICT=$REF/test/data/turtle.dic
LM=$REF/test/data/turtle.lm.bin
PS=$BUILD/pocketsphinx

mkdir -p "$OUT/goforward"
# Full decode with per-frame MFCC dump and ALL-senone score dump
# (-compallsen makes scores independent of the search's active lists).
$PS -hmm "$MODEL" -lm "$LM" -dict "$DICT" -compallsen yes \
    -mfclogdir "$OUT/goforward" -senlogdir "$OUT/goforward" \
    single "$REF/test/data/goforward.raw" \
    > "$OUT/goforward/hyp.json" 2> "$OUT/goforward/log.txt"

# Forced alignment with phone and state level output.
$PS -hmm "$MODEL" -dict "$DICT" -phone_align yes \
    align "$REF/test/data/goforward.raw" "go forward ten meters" \
    > "$OUT/goforward/align.json" 2>> "$OUT/goforward/log.txt"
$PS -hmm "$MODEL" -dict "$DICT" -state_align yes \
    align "$REF/test/data/goforward.raw" "go forward ten meters" \
    > "$OUT/goforward/align_state.json" 2>> "$OUT/goforward/log.txt"

# LibriVox corpus decodes (the reference regression anchor, test-main.sh),
# default en-us dictionary; no LM available in-tree for large-vocab, so we
# use the turtle LM only for goforward and capture align-mode JSON for the
# librivox clips (they have transcripts in .lab files).
mkdir -p "$OUT/librivox"
for wav in "$REF"/test/data/librivox/*.wav; do
    base=$(basename "$wav" .wav)
    txt="$REF/test/data/librivox/$base.txt"
    [ -f "$txt" ] || continue
    $PS -hmm "$MODEL" -dict "$REF/model/en-us/cmudict-en-us.dict" \
        -phone_align yes align "$wav" "$(cat "$txt")" \
        > "$OUT/librivox/$base.align.json" 2>/dev/null
done

echo "golden artifacts written to $OUT"
