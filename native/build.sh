#!/bin/sh
# Build the native runtime library (see cpt_native.cpp).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libcpt_native.so cpt_native.cpp -lz
echo "built $(pwd)/libcpt_native.so"
