#!/bin/bash
# Measure the reference CPU baseline on the bench.py scene and record it.
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
bash "$HERE/build_reference.sh"
OUT=${OUT:-/tmp/ref_build}
# Scene must match bench.py: 40x5x5 beam, NeoHookean, 10 admm iters.
"$OUT/ref_driver" 40 5 5 10 20 1 | tee "$HERE/BASELINE_MEASURED.json"
