#!/bin/sh
# Build the native forest core -> native/libt8forest.so
set -e
cd "$(dirname "$0")"
g++ -O3 -std=c++17 -fPIC -shared -Wall -Wextra -o libt8forest.so forest.cc
echo "built $(pwd)/libt8forest.so"
