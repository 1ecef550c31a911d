#!/bin/sh
# Build the native host library for the tracker (libdat_host.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -shared -fPIC -std=c++17 -o libdat_host.so hungarian.cpp
echo "built $(pwd)/libdat_host.so"
