#!/bin/sh
# Build libtileio.so next to this script.
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -std=c++17 tileio.cpp -o libtileio.so -lpng -ljpeg -lz -lpthread
echo "built $(pwd)/libtileio.so"
