#!/usr/bin/env bash
# Build the native host-side ops library. Python binds via ctypes
# (gaussian_splatting_tpu/utils/native.py) and falls back to scipy when the
# library is absent.
set -euo pipefail
cd "$(dirname "$0")"
g++ -O3 -march=native -std=c++17 -shared -fPIC -pthread \
    pointops.cpp -o libpointops.so
echo "built $(pwd)/libpointops.so"
