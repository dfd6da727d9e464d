#!/bin/bash
# Measure the reference CPU baseline across the scene x size grid
# (VERDICT r1 item 2: every headline number needs a measured denominator).
# Writes JSON lines to benchmarks/BASELINE_MATRIX.json; each line gains a
# "label" used by benchmarks/matrix.py to pair ours-vs-ref.
#
# Reference self-timing basis: src/Solver.cpp:309-319 (we time whole steps
# around solver.step() in ref_driver.cpp, same quantity).
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
bash "$HERE/build_reference.sh"
OUT=${OUT:-/tmp/ref_build}
RES="$HERE/BASELINE_MATRIX.json"
: > "$RES"

run() { # label args...
  local label="$1"; shift
  echo "== $label: $*" >&2
  "$OUT/ref_driver" "$@" | sed "s/^{/{\"label\": \"$label\", /" | tee -a "$RES"
}

# Beam (NeoHookean, pinned -x face, LDLT): 5k / 40k / 160k tets.
run beam-nh-5k    40 5 5   10 20 1
run beam-nh-40k   80 10 10 10 8  1
run beam-nh-160k  80 20 20 10 3  1
# Floor-contact beam (no pins, gravity drop onto y=-1): GS and Uzawa.
run beam-floor-gs-5k     40 5 5 10 20 1 "" 1 -1.0
run beam-floor-uzawa-5k  40 5 5 10 20 1 "" 2 -1.0
# Large hard-contact Uzawa (the bigcontact scene class, 67.5k / 160k tets).
run beam-floor-uzawa-67k 60 15 15 10 3 0 "" 2 -1.0
run beam-floor-uzawa-160k 80 20 20 10 2 0 "" 2 -1.0
# Cloth + wind (40x40 sheet, pinned -x edge, strain limits off). Gentle
# wind + zero gravity: the reference WindForce kick has no mass division
# and diverges for stronger wind (see tests/test_parity.py wind note).
run cloth-wind-40 40 40 0 10 20 3 "" 0 9999.0 -100 100 0.05 0.1 0.02 0
# Cloth with hard strain limits [0.95, 1.05].
run cloth-limit-40 40 40 0 10 20 3 "" 0 9999.0 0.95 1.05
# Boxes self-collision (two stacked boxes + floor, NCMCGS): 270 / 2160 tets.
run boxes-gs-n3 3 0 0 10 25 4 "" 1 -0.5
run boxes-gs-n6 6 0 0 10 25 4 "" 1 -0.5

# Torus (model 6: NH, ring s=0 pinned — an IRREGULAR mesh for the solver
# until the wrap-aware ring stencil; nx = n_ring, ny = n_sec).
run torus-nh-20k  64 8 0 10 8 6
run torus-nh-160k 128 16 0 10 3 6

# Mesh obstacle at scale (model 5: soft body dropped onto the tet-meshed
# 6x2x6 slab through the reference's exact PassiveMesh narrow phase,
# Uzawa contact). Caveat like the boxes rows: the real mclscene BVH
# submodule is absent upstream, so the shim's exact brute-force scan
# stands in — at this slab size (~360 tets / ~200 surface tris) a BVH
# would gain at most ~10x on the narrow phase.
run mesh-obstacle-20k  40 10 10 10 8 5 "" 2 9999
run mesh-obstacle-160k 80 20 20 10 2 5 "" 2 9999

# North-star sizes (BASELINE.json configs 2/4: ~500k-tet solid, ~50k-tri
# cloth). Heavy: the 512k-tet LDLT factor alone runs many minutes on this
# box, so these only run with BIG=1 in the environment.
if [ -n "$BIG" ]; then
  run beam-nh-500k     100 32 32 10 2 1
  run beam-floor-uzawa-500k 100 32 32 10 1 0 "" 2 -1.0
  run cloth-limit-160  160 160 0 10 3 3 "" 0 9999.0 0.95 1.05
  run torus-nh-500k 400 16 0 10 2 6
  run mesh-obstacle-500k 100 32 32 10 1 5 "" 2 9999
fi
echo "wrote $RES" >&2
