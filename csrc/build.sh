#!/usr/bin/env bash
# Build libaimdecode.so (FFmpeg-based random-access decoder).
set -euo pipefail
cd "$(dirname "$0")"
mkdir -p build
CXX=${CXX:-g++}
FLAGS=$(pkg-config --cflags --libs libavformat libavcodec libswscale libswresample libavutil)
$CXX -O3 -fPIC -shared -std=c++17 aimdecode.cpp aimaudio.cpp aimmv.cpp -o build/libaimdecode.so $FLAGS
echo "built csrc/build/libaimdecode.so"
