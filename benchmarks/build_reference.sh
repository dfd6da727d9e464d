#!/bin/bash
# Build the unmodified reference library from /root/reference as the CPU
# baseline oracle. Sources are compiled in place (read-only) into /tmp;
# nothing is copied into this repo. The missing mcloptlib/mclscene
# submodule API surface comes from benchmarks/mcl_shim (our own code).
set -e
REF=${REF:-/root/reference}
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT=${OUT:-/tmp/ref_build}
mkdir -p "$OUT"

CXXFLAGS="-O3 -std=c++11 -fopenmp -DNDEBUG -I$REF/src -I$REF/deps/Eigen3 -I$HERE/mcl_shim"

for f in Solver TetEnergyTerm TriEnergyTerm ExplicitForce; do
  if [ ! -f "$OUT/$f.o" ] || [ "$REF/src/$f.cpp" -nt "$OUT/$f.o" ]; then
    g++ $CXXFLAGS -c "$REF/src/$f.cpp" -o "$OUT/$f.o"
  fi
done

g++ $CXXFLAGS "$HERE/ref_driver.cpp" "$OUT"/*.o -o "$OUT/ref_driver" -fopenmp
echo "built $OUT/ref_driver"
