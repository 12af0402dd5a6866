#!/bin/sh
# Build the native host library (see vidcap_native.cpp header).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -std=c++17 \
    vidcap_native.cpp -o libvidcap_native.so
echo "built $(pwd)/libvidcap_native.so"
