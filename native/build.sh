#!/usr/bin/env bash
# Build the native helpers (C++ BVH builder; CPU oracle when present).
set -euo pipefail
cd "$(dirname "$0")"

CXX=${CXX:-g++}
FLAGS="-O3 -march=native -fPIC -shared -std=c++17 -Wall"

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
