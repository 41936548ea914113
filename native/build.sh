#!/bin/sh
# Build the native runtime components -> native/lib/
set -e
cd "$(dirname "$0")"
mkdir -p lib
g++ -O2 -shared -fPIC -std=c++17 -o lib/libeao_loader.so eao_loader.cpp \
    -lpng -ljpeg -lpthread
echo "built native/lib/libeao_loader.so"
