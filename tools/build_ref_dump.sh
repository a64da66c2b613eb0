#!/bin/bash
# Build the reference-table dump oracle (test-only tooling).
# Requires the reference mount at $REF (default /root/reference) and an
# out-of-tree build of it at $REFBUILD (default /tmp/refbuild):
#   cmake -S $REF -B $REFBUILD -DASTCENC_ISA_AVX2=ON -DASTCENC_WERROR=OFF \
#         -DCMAKE_BUILD_TYPE=Release -G Ninja && ninja -C $REFBUILD
#   cp $REFBUILD/Source/astcenc-avx2 $REFBUILD/Source/astcenc-native
#   cp $REFBUILD/Source/libastcenc-avx2-static.a \
#      $REFBUILD/Source/libastcenc-native-static.a
#
# IMPORTANT: do NOT build the oracle with -DASTCENC_ISA_NATIVE=ON on an
# AVX-512 host. GCC 12.2 with -march=native miscompiles the reference's
# rgba_delta_unpack (astcenc_color_unquantize.cpp:61-82): the NOT-fold of
# the (input0 & 0x20) != 0 mask into vpblendvb drops the operand swap, so
# the sign-extension of delta values is applied to exactly the wrong lanes.
# The resulting binary decodes endpoint formats 9/13 (RGB/RGBA delta)
# non-conformantly and is useless as a decode oracle. tests/conftest.py
# checks a canary block and skips oracle-dependent tests if the binary is
# miscompiled.
set -e
REF=${REF:-/root/reference}
REFBUILD=${REFBUILD:-/tmp/refbuild}
HERE=$(dirname "$0")
g++ -O2 -march=native -std=c++17 -ffp-contract=off -flto=auto -pthread \
    -I "$REF/Source" "$HERE/dump_ref_tables.cpp" \
    "$REFBUILD/Source/libastcenc-native-static.a" \
    -o "${OUT:-/tmp/dump_ref_tables}"
