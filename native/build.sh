#!/usr/bin/env bash
# Build the first-party native IO library into the Python package.
set -euo pipefail
cd "$(dirname "$0")"
OUT_DIR="../audio_processor_tpu/io/_native"
mkdir -p "$OUT_DIR"
g++ -O3 -march=native -fPIC -shared -std=c++17 -pthread \
    audioio.cpp vorbis.cpp flac.cpp -o "$OUT_DIR/libaudioio.so"
echo "built $OUT_DIR/libaudioio.so"

# Regenerate the serving protobuf message stubs (committed; protoc is
# only needed when serving.proto changes). No grpc plugin required —
# the service uses generic method handlers (grpc_serving.py).
if command -v protoc >/dev/null 2>&1; then
    protoc --python_out=../audio_processor_tpu/protos \
        --proto_path=../audio_processor_tpu/protos serving.proto \
        && echo "regenerated audio_processor_tpu/protos/serving_pb2.py" \
        || true
fi
