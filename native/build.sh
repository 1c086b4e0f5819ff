#!/usr/bin/env bash
# Build the first-party native IO library into the Python package.
set -euo pipefail
cd "$(dirname "$0")"
OUT_DIR="../audio_processor_tpu/io/_native"
mkdir -p "$OUT_DIR"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    audioio.cpp vorbis.cpp -o "$OUT_DIR/libaudioio.so"
echo "built $OUT_DIR/libaudioio.so"
