#!/bin/sh
# Build the native host-side libraries (ctypes-loaded; no pybind11).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libocrf_nms.so nms.cpp
echo "built $(pwd)/libocrf_nms.so"
