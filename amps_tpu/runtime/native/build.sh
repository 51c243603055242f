#!/bin/sh
# Build libampsrt.so (host-side native runtime).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -fPIC -shared -Wall -Wextra -std=c++17 \
    -o libampsrt.so ampsrt.cc
echo "built $(pwd)/libampsrt.so"
