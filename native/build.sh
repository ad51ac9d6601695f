#!/usr/bin/env bash
# Build the native helpers (C++ BVH builder; CPU oracle when present).
set -euo pipefail
cd "$(dirname "$0")"

CXX=${CXX:-g++}
# Fixed -march (x86-64-v3: AVX2/FMA, 2015+ hosts) instead of -march=native
# so CI/bench hosts build the SAME oracle — parity RMSE gates are then
# reproducible across machines (VERDICT r02 weak #8). Override with
# MPT_NATIVE_ARCH=native for local tuning.
ARCH=${MPT_NATIVE_ARCH:-x86-64-v3}
FLAGS="-O3 -march=$ARCH -fPIC -shared -std=c++17 -Wall"
echo "flags: $FLAGS"

$CXX $FLAGS bvh_builder.cpp -o libbvh_builder.so
echo "built libbvh_builder.so"

if [[ -f cpu_oracle.cpp ]]; then
    $CXX $FLAGS -pthread cpu_oracle.cpp bvh_builder.cpp -o libcpu_oracle.so
    echo "built libcpu_oracle.so"
fi

CC=${CC:-gcc}
if [[ -f mikktspace/mikktspace.c ]]; then
    $CC -O2 -fPIC -shared tangentgen.c mikktspace/mikktspace.c \
        -o libtangentgen.so -lm
    echo "built libtangentgen.so"
fi
