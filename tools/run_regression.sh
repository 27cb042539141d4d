#!/bin/sh
# Regression harness mirroring the reference's test/regression suite:
# runs the installed CLI on the reference test data and compares outputs
# against goldens captured from the reference binary (tests/golden/).
# Usage: tools/run_regression.sh [reference_dir]
set -e
REF=${1:-${PS_REFERENCE:-/root/reference}}
HERE=$(cd "$(dirname "$0")/.." && pwd)
GOLD=$HERE/tests/golden
M=$REF/model/en-us/en-us
D=$REF/test/data
TMP=$(mktemp -d)
export PS_TPU_DEVICE=${PS_TPU_DEVICE:-}
pass=0; fail=0

check() {
    name=$1; mine=$2; gold=$3; ttol=${4:-0.05}; ptol=${5:-1.0}
    if python "$HERE/tools/compare_json.py" "$mine" "$gold" "$ttol" "$ptol" \
        > "$TMP/$name.diff" 2>&1; then
        echo "PASS $name"; pass=$((pass+1))
    else
        echo "FAIL $name (see $TMP/$name.diff)"; fail=$((fail+1))
    fi
}

# test-main equivalent: single decode of goforward
python -m pocketsphinx_tpu.cli -hmm "$M" -lm "$D/turtle.lm.bin" \
    -dict "$D/turtle.dic" single "$D/goforward.raw" \
    > "$TMP/goforward.json" 2>/dev/null
check goforward-single "$TMP/goforward.json" "$GOLD/goforward/hyp.json" 0.05

# test-main-align equivalent
python -m pocketsphinx_tpu.cli -hmm "$M" -dict "$D/turtle.dic" \
    -phone_align yes align "$D/goforward.raw" "go forward ten meters" \
    > "$TMP/align.json" 2>/dev/null
check goforward-align "$TMP/align.json" "$GOLD/goforward/align.json" 0.05

# test-cards equivalent (batch decode, exact hypothesis lines)
cat > "$TMP/cards.ctl" <<EOF
001
002
003
004
005
EOF
python -m pocketsphinx_tpu.cli_batch -hmm "$M" -jsgf "$D/cards/cards.gram" \
    -dict "$REF/model/en-us/cmudict-en-us.dict" -ctl "$TMP/cards.ctl" \
    -adcin yes -cepdir "$D/cards" -cepext .wav -hyp "$TMP/cards.hyp" \
    2>/dev/null
if diff <(sed 's/ *(.*//' "$TMP/cards.hyp") \
        <(sed 's/ *(.*//' "$D/cards/cards.hyp") > "$TMP/cards.diff"; then
    echo "PASS cards-batch"; pass=$((pass+1))
else
    echo "FAIL cards-batch"; fail=$((fail+1))
fi

echo "== $pass passed, $fail failed =="
[ "$fail" -eq 0 ]
