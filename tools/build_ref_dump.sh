#!/bin/bash
# Build the reference-table dump oracle (test-only tooling).
# Requires the reference mount at $REF (default /root/reference) and an
# out-of-tree build of it at $REFBUILD (default /tmp/refbuild):
#   cmake -S $REF -B $REFBUILD -DASTCENC_ISA_NATIVE=ON -DASTCENC_WERROR=OFF \
#         -DCMAKE_BUILD_TYPE=Release -G Ninja && ninja -C $REFBUILD
set -e
REF=${REF:-/root/reference}
REFBUILD=${REFBUILD:-/tmp/refbuild}
HERE=$(dirname "$0")
g++ -O2 -march=native -std=c++17 -ffp-contract=off -flto=auto -pthread \
    -I "$REF/Source" "$HERE/dump_ref_tables.cpp" \
    "$REFBUILD/Source/libastcenc-native-static.a" \
    -o "${OUT:-/tmp/dump_ref_tables}"
