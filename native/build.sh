#!/bin/sh
# Build the native host runtime (see astc_host.cpp). Python falls back to
# the numpy path when libastc_host.so is absent, so this is optional.
set -e
cd "$(dirname "$0")"
${CXX:-g++} -O3 -fPIC -shared -std=c++17 -o libastc_host.so astc_host.cpp
echo "built $(pwd)/libastc_host.so"
