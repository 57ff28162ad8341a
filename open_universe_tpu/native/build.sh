#!/bin/sh
# Build the native audio runtime (libouniv_audio.so).
set -e
cd "$(dirname "$0")"
g++ -O3 -march=native -shared -fPIC -o libouniv_audio.so audio_io.cpp -lm
echo "built $(pwd)/libouniv_audio.so"
