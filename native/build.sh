#!/bin/sh
# Build the native IO runtime -> native/libvstpu_io.so
set -e
cd "$(dirname "$0")"
g++ -O2 -fPIC -shared -std=c++17 -Wall \
    vstpu_io.cpp -o libvstpu_io.so \
    -lpng -ljpeg -lz -lpthread
echo "built $(pwd)/libvstpu_io.so"
